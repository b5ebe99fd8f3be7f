"""Deterministic synthetic source-code corpus (BASELINE.json input_hint shape).

Produces ``(repo, path, commit, lang, content, sha256)`` rows per the
FIXTURES.md generation rules, entirely from Spark-native expressions over
``spark.range`` — no driver-side loops, no Python UDFs — so the same
generator scales from 1k test rows to bench-scale without code change.
Determinism comes from ``xxhash64(id, salt)`` streams (fixed seed 42),
so the corpus is identical across runs, partition counts, and
parallelism levels (required for resume/rank-identity tests).

Reference analog: the PRG XML source the reference's build stage consumes
(``xml_parsers.py:303-447``); the per-row invariant column is
``sha256(content)`` (input_hint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
VOCAB_SIZE = 5000
MIN_TOKENS = 20
MAX_TOKENS = 400
HOT_TERM = "the_hot_term"
HOT_DOC_PCT = 35  # % of docs containing the hot term (skew driver)

# Identifier-shaped tokens to exercise the camelCase/snake_case tokenizer.
_IDENTIFIERS = (
    "camelCaseFoo",
    "snake_case_bar",
    "parseHttpResponse",
    "XmlReaderImpl",
    "load_data_frame",
    "getUserById",
)


def _u01(*cols) -> F.Column:
    """Deterministic uniform [0,1) from xxhash64 of the given columns."""
    h = F.xxhash64(*cols, F.lit(SEED))
    return (F.pmod(h, F.lit(1_000_000_007)).cast("double")) / F.lit(1_000_000_007.0)


def synth_corpus(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """Generate the corpus table: (repo, path, commit, lang, content, sha256).

    Token stream per doc: ``len`` tokens drawn from a Zipf-ish 5000-term
    vocabulary (``term_0001``..), with identifier tokens and punctuation
    mixed in, plus the hot term injected into ~35% of docs (hot-term skew
    per FIXTURES.md §1 / north_rule skew handling).
    """
    partitions = partitions or max(8, n_docs // 50_000)
    df = spark.range(0, n_docs, 1, partitions).withColumnRenamed("id", "i")
    i = F.col("i")

    ext = (
        F.when(F.col("lang") == "py", "py")
        .when(F.col("lang") == "java", "java")
        .when(F.col("lang") == "c", "c")
        .when(F.col("lang") == "go", "go")
        .otherwise("js")
    )

    # doc length in [MIN_TOKENS, MAX_TOKENS]
    n_tok = (
        F.lit(MIN_TOKENS)
        + F.pmod(F.xxhash64(i, F.lit(1), F.lit(SEED)), F.lit(MAX_TOKENS - MIN_TOKENS + 1))
    ).cast("int")

    # Zipf-ish term rank: rank = floor(V^u)  (p(rank) ~ 1/rank)
    def token_at(j):
        u = _u01(i, j, F.lit(7))
        rank = F.least(
            F.lit(VOCAB_SIZE),
            F.greatest(F.lit(1), F.floor(F.pow(F.lit(float(VOCAB_SIZE)), u)).cast("int")),
        )
        base = F.concat(F.lit("term_"), F.lpad(rank.cast("string"), 4, "0"))
        # ~6% of positions: identifier token; ~4%: token with punctuation glued on
        sel = F.pmod(F.xxhash64(i, j, F.lit(11), F.lit(SEED)), F.lit(100))
        ident = F.array(*[F.lit(x) for x in _IDENTIFIERS])[
            F.pmod(F.xxhash64(i, j, F.lit(13), F.lit(SEED)), F.lit(len(_IDENTIFIERS))).cast("int")
        ]
        return (
            F.when(sel < 6, ident)
            .when(sel < 8, F.concat(base, F.lit("(),;")))
            .when(sel < 10, F.concat(F.lit('"'), base, F.lit('".')))
            .otherwise(base)
        )

    body = F.array_join(F.transform(F.sequence(F.lit(1), n_tok), token_at), " ")
    hot = F.pmod(F.xxhash64(i, F.lit(2), F.lit(SEED)), F.lit(100)) < F.lit(HOT_DOC_PCT)
    content = F.when(hot, F.concat(body, F.lit(" " + HOT_TERM + " " + HOT_TERM))).otherwise(body)

    out = (
        df.withColumn("lang", _lang(i))
        .withColumn("repo", F.concat(F.lit("org"), F.pmod(i, F.lit(7)), F.lit("/repo"), F.pmod(i, F.lit(53))))
        .withColumn("commit", F.sha1(F.concat(F.lit("commit"), i.cast("string"))))
        .withColumn("content", content)
        .withColumn(
            "path",
            F.concat(F.lit("src/mod"), F.pmod(i, F.lit(97)), F.lit("/file"), i, F.lit("."), ext),
        )
        .withColumn("sha256", F.sha2(F.col("content"), 256))
        .select("repo", "path", "commit", "lang", "content", "sha256")
    )
    return out


def _lang(i) -> F.Column:
    sel = F.pmod(F.xxhash64(i, F.lit(3), F.lit(SEED)), F.lit(10))
    return (
        F.when(sel < 4, "py")
        .when(sel < 6, "java")
        .when(sel < 8, "c")
        .when(sel < 9, "go")
        .otherwise("js")
    )
