"""Deduplication operators for training-data pipelines: exact, n-gram
Jaccard, MinHash+LSH, SimHash.

Every algorithm is deterministic (fixed literal hash parameters, md5-derived
base hashes) so a DuckDB oracle can replicate it bit-for-bit — the driver's
correctness gate then checks real algorithm output, not just row counts.

Scale notes (100 TB):
- candidate generation is always *blocked* (LSH band buckets / simhash
  bands / shared shingles), never a cross join;
- shared-shingle joins cap shingle df (``max_shingle_df``) to defuse the
  hot-shingle quadratic blowup — the same skew lesson as hot terms;
- verification joins happen only on candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize

# ---- shared deterministic base hash (md5 -> 60-bit int) --------------------
# DuckDB twin: ('0x' || substring(md5(s), 1, 15))::BIGINT  (see oracle_sql)


def md5_hash60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# ---- exact dedup ------------------------------------------------------------


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content hash; keeps the min doc_id.

    Returns (doc_id, n_dups): one row per distinct content, n_dups = group
    size. Plain hash-groupBy — map-side combine makes it skew-safe.
    """
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("_h"))
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dups"))
        .select(id_col, "n_dups")
    )


# ---- n-gram Jaccard ---------------------------------------------------------


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct n-token shingles per doc: (doc_id, shingle).

    Arrow pandas kernel — the column-expression formulation (transform +
    slice + array_join HOFs) runs interpreted per element in Spark and
    measured ~10x slower; the python kernel also reuses the exact tokenizer
    spec (tokenize_py) the oracle replicates.
    """
    from collections.abc import Iterator

    import pandas as pd

    from ..functions.tokenize import tokenize_py

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, shs = [], []
            for doc_id, text in zip(pdf[id_col].to_numpy(), pdf[text_col]):
                toks = tokenize_py(text)
                uniq = set(
                    " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                )
                ids.append(np.full(len(uniq), doc_id, dtype=np.int64))
                shs.extend(uniq)
            if not ids:
                continue
            yield pd.DataFrame({id_col: np.concatenate(ids), "shingle": shs})

    return docs.select(id_col, text_col).mapInPandas(
        fn, schema=f"{id_col} long, shingle string"
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | str | None = "auto",
    n_docs: int | None = None,
) -> DataFrame:
    """Near-dup pairs (doc_a < doc_b, jaccard >= threshold) over n-gram
    shingle sets. Candidates = docs sharing >=1 shingle (equi-join on the
    shingle — the blocked/partition-pruned pattern, never a cross join).

    ``max_shingle_df`` drops shingles shared by more than that many docs
    before pairing (hot-key cap; identical semantics as long as surviving
    pairs still share a rarer shingle — at threshold>=0.5 near-dups always
    do in practice; the oracle applies the same cap).

    The cap is ON BY DEFAULT (VERDICT r04 #7): ``"auto"`` resolves to
    max(64, 1% of the corpus) — a boilerplate shingle shared by >1% of docs
    contributes O((0.01·N)²) candidate pairs, the quadratic trap this
    operator exists to avoid, while threshold≥0.5 survivors share many
    rarer shingles. Uncapped pairing (the provably-lossless but
    scale-unsafe variant) now requires an EXPLICIT ``max_shingle_df=None``.
    """
    # "auto" cap resolution costs ZERO extra jobs (VERDICT r05 #6): the
    # caller can hand in n_docs; otherwise the corpus count rides the main
    # query as a broadcast 1-row aggregate feeding the hot filter (the old
    # eager docs.count() was a full extra job per invocation).
    auto_cap_col = None
    if max_shingle_df == "auto":
        if n_docs is not None:
            max_shingle_df = max(64, n_docs // 100)
        else:
            auto_cap_col = F.greatest(
                F.lit(64), F.floor(F.col("_n_docs") / 100)
            )
    # persist: the shingle relation feeds sizes + both join sides (3 uses);
    # without it each use re-runs tokenization
    sh = shingles(docs, n, text_col, id_col).persist()
    if auto_cap_col is not None:
        ndocs_df = docs.groupBy().agg(F.count(F.lit(1)).alias("_n_docs"))
        hot = (
            sh.groupBy("shingle")
            .count()
            .crossJoin(F.broadcast(ndocs_df))  # 1-row broadcast, not a cartesian
            .filter(F.col("count") > auto_cap_col)
        )
        sh = sh.join(hot.select("shingle"), "shingle", "left_anti")
    elif max_shingle_df:
        hot = sh.groupBy("shingle").count().filter(F.col("count") > max_shingle_df)
        sh = sh.join(hot.select("shingle"), "shingle", "left_anti")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---- MinHash + LSH ----------------------------------------------------------

MINHASH_P = 1_000_000_007
# fixed (a, b) parameter pairs — 16 hash functions, 4 bands x 4 rows
MINHASH_PARAMS: tuple[tuple[int, int], ...] = (
    (472882049, 926566121), (268435399, 334214467), (786433001, 741456713),
    (104857601, 282475249), (553105253, 622729787), (715827883, 358831373),
    (926566121, 472882049), (334214467, 268435399), (741456713, 786433001),
    (282475249, 104857601), (622729787, 553105253), (358831373, 715827883),
    (179424673, 899809363), (899809363, 179424673), (613651369, 500000003),
    (500000003, 613651369),
)
LSH_ROWS_PER_BAND = 4


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash-LSH near-dup pairs: shingle -> 16 minhashes -> 4 bands of 4 ->
    band-bucket equi-join -> exact-Jaccard verification >= threshold.

    Fully deterministic; the oracle replicates signatures, banding, and
    verification, so results hash-match exactly.
    """
    sh = shingles(docs, n, text_col, id_col).persist()
    # r6: the 16 minhashes compute as 16 MIN aggregate COLUMNS of one
    # groupBy(doc) instead of exploding a 16-row params array per shingle
    # and re-aggregating — same math ((a*x+b) mod p per shingle, min per
    # doc), but the 16x row blowup, its shuffle, and the second
    # (doc, band) collect_list+sort shuffle all disappear: bands are just
    # string concatenations of the aggregate columns, exploded 4-per-doc
    # map-side. Identical signatures, identical pairs (oracle unchanged).
    hx = sh.select(id_col, (md5_hash60(F.col("shingle")) % MINHASH_P).alias("x"))
    mins = hx.groupBy(id_col).agg(
        *[
            F.min((F.lit(a) * F.col("x") + F.lit(b)) % MINHASH_P).alias(f"_h{i}")
            for i, (a, b) in enumerate(MINHASH_PARAMS)
        ]
    )
    n_bands = len(MINHASH_PARAMS) // LSH_ROWS_PER_BAND
    band_arr = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.concat_ws(
                    "_",
                    *[
                        F.col(f"_h{band * LSH_ROWS_PER_BAND + r}").cast("string")
                        for r in range(LSH_ROWS_PER_BAND)
                    ],
                ).alias("sig"),
            )
            for band in range(n_bands)
        ]
    )
    bands = mins.select(id_col, F.explode(band_arr).alias("_b")).select(
        id_col, F.col("_b.band").alias("band"), F.col("_b.sig").alias("sig")
    )
    a = bands.select(F.col(id_col).alias("doc_a"), "band", "sig")
    b = bands.select(F.col(id_col).alias("doc_b"), "band", "sig")
    cand = (
        a.join(b, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _jaccard_for_pairs(sh, cand, threshold, id_col)


def _jaccard_for_pairs(
    sh: DataFrame, cand: DataFrame, threshold: float, id_col: str = "doc_id"
) -> DataFrame:
    """Exact Jaccard for the given candidate pairs only — the verify step
    never touches non-candidate pairs (candidate count << all pairs)."""
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---- SimHash ----------------------------------------------------------------

SIMHASH_BITS = 60
SIMHASH_BAND_BITS = 15  # 4 bands -> guarantees recall for hamming <= 3


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """60-bit tf-weighted SimHash per doc, as a long.

    bit_j(doc) = 1 iff sum_t tf(t) * (bit_j(H(t)) ? +1 : -1) > 0.
    Pure column expressions (explode over 60 bit positions).
    """
    toks = docs.select(F.col(id_col), F.explode(tokenize(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    th = tf.withColumn("h", md5_hash60(F.col("term")))
    bits = th.select(
        id_col, "tf", "h", F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("j")
    )
    # F.shiftright only takes a literal shift count; the SQL expression form
    # accepts a column
    contrib = bits.withColumn(
        "c",
        F.when(F.expr("shiftright(h, j)").bitwiseAND(F.lit(1)) == 1, F.col("tf"))
        .otherwise(-F.col("tf")),
    )
    return (
        contrib.groupBy(id_col, "j")
        .agg(F.sum("c").alias("s"))
        .withColumn("bit", F.when(F.col("s") > 0, F.lit(1)).otherwise(F.lit(0)))
        .groupBy(id_col)
        .agg(F.sum(F.col("bit").cast("long") * F.pow(F.lit(2.0), F.col("j")).cast("long")).alias("simhash"))
    )


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Banded candidate generation (4 bands of 15 bits): pigeonhole guarantees
    any pair within hamming 3 shares at least one identical band, so the
    banded result equals the brute-force oracle exactly.
    """
    sh = simhash(docs, text_col, id_col)
    bands = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bnd).alias("band"),
                    F.shiftright(F.col("simhash"), bnd * SIMHASH_BAND_BITS)
                    .bitwiseAND(F.lit((1 << SIMHASH_BAND_BITS) - 1))
                    .alias("key"),
                )
                for bnd in range(SIMHASH_BITS // SIMHASH_BAND_BITS)
            ])
        ).alias("bk"),
    ).select(id_col, "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = bands.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sim_a"), "band", "key")
    b = bands.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sim_b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))
    )
