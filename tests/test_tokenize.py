import duckdb
import pytest

from geocoderpl_spark.functions.tokenize import duckdb_tokenize_sql, tokenize
from tests.oracle import tokenize_py

CASES = [
    ("the fast key", ["the", "fast", "key"]),
    ("camelCaseFoo bar", ["camel", "case", "foo", "bar"]),
    ("snake_case_bar stays", ["snake_case_bar", "stays"]),
    ("term_0001, term_0002;", ["term_0001", "term_0002"]),
    ('x = "parseHttpResponse(y)"', ["x", "parse", "http", "response", "y"]),
    ("", []),
    ("   ", []),
    ("UPPER Lower", ["upper", "lower"]),
    ("XmlReaderImpl", ["xml", "reader", "impl"]),
    ("a1b2C3", ["a1b2", "c3"]),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_tokenize_python_spec(raw, expected):
    assert tokenize_py(raw) == expected


def test_tokenize_spark_matches_spec(spark):
    df = spark.createDataFrame([(i, c) for i, (c, _) in enumerate(CASES)], "i int, t string")
    got = {r["i"]: r["toks"] for r in df.select("i", tokenize("t").alias("toks")).collect()}
    for i, (_, expected) in enumerate(CASES):
        assert got[i] == expected, CASES[i]


def test_tokenize_duckdb_matches_spec():
    for raw, expected in CASES:
        sql = "select " + duckdb_tokenize_sql("?") + " as toks"
        got = duckdb.sql(sql, params=[raw]).fetchone()[0]
        assert got == expected, raw


def test_tokenize_arrow_matches_spec():
    """4th implementation (Arrow RE2 path inside term_frequencies_arrow /
    docstats_arrow) must match the spec token-for-token."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from geocoderpl_spark.functions.tokenize import CAMEL_BOUNDARY, NON_TOKEN

    arr = pa.array([c for c, _ in CASES])
    spaced = pc.replace_substring_regex(arr, pattern=CAMEL_BOUNDARY, replacement=r"\1 \2")
    toks = pc.split_pattern_regex(pc.utf8_lower(spaced), pattern=NON_TOKEN)
    for (raw, expected), got in zip(CASES, toks.to_pylist()):
        assert [t for t in got if t] == expected, raw


def test_tf_and_docstats_kernels_identical(spark):
    """arrow and pandas kernels must be row-identical on a real corpus
    (the build may run either, per GRAFT_TF_KERNEL)."""
    from geocoderpl_spark.operators.docids import assign_doc_ids
    from geocoderpl_spark.operators.postings import (
        docstats_arrow,
        docstats_pandas,
        term_frequencies_arrow,
        term_frequencies_pandas,
    )
    from geocoderpl_spark.sources.corpus import synth_corpus

    docs = assign_doc_ids(synth_corpus(spark, 800), ["repo", "path", "commit"], 8)
    a = term_frequencies_pandas(docs).toPandas().sort_values(["term", "doc_id"]).reset_index(drop=True)
    b = term_frequencies_arrow(docs).toPandas().sort_values(["term", "doc_id"]).reset_index(drop=True)
    assert a.equals(b)
    meta = ["repo", "path", "commit", "lang"]
    da = docstats_pandas(docs, meta).toPandas().sort_values("doc_id").reset_index(drop=True)
    db = docstats_arrow(docs, meta).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert da.equals(db)


def test_fused_tf_sha_kernels(spark):
    """with_sha=True (the single-pass build, VERDICT r02 #7): arrow and
    pandas fused kernels agree; the sidecar rows reproduce the standalone
    docstats kernel exactly (one sha per doc, term-NULL sentinels for
    zero-token docs); stripping the sidecar recovers plain tf."""
    from pyspark.sql import functions as F

    from geocoderpl_spark.operators.postings import (
        docstats_arrow,
        term_frequencies_arrow,
        term_frequencies_pandas,
        term_positions_arrow,
    )

    docs = spark.createDataFrame(
        [(0, "FooBar foo"), (1, ""), (2, "--- ;; .."), (3, "x y x")],
        "doc_id long, content string",
    )

    def norm(df):
        return (
            df.toPandas()
            .sort_values(["doc_id", "term"], na_position="first")
            .reset_index(drop=True)
        )

    a = norm(term_frequencies_arrow(docs, with_sha=True))
    b = norm(term_frequencies_pandas(docs, with_sha=True))
    assert a.equals(b)
    c = norm(term_positions_arrow(docs, with_sha=True).drop("positions"))
    assert a.equals(c)

    # exactly one sha per doc, including the zero-token docs 1 and 2
    per_doc = a[a["sha256"].notna()]
    assert sorted(per_doc["doc_id"]) == [0, 1, 2, 3]
    sentinels = a[a["term"].isna()]
    assert sorted(sentinels["doc_id"]) == [1, 2]
    assert (sentinels["doclen"] == 0).all() and (sentinels["tf"] == 0).all()

    # (doc_id, doclen, sha256) == the standalone docstats kernel's output
    want = docstats_arrow(docs, []).toPandas().sort_values("doc_id").reset_index(drop=True)
    got = per_doc[["doc_id", "doclen", "sha256"]].sort_values("doc_id").reset_index(drop=True)
    assert got.equals(want[["doc_id", "doclen", "sha256"]])

    # sentinel-stripped fused tf == plain tf
    plain = norm(term_frequencies_arrow(docs))
    fused_tf = (
        a[a["term"].notna()][["term", "doc_id", "doclen", "tf"]]
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    assert fused_tf.equals(
        plain.sort_values(["doc_id", "term"]).reset_index(drop=True)
    )


def test_tokenize_fuzz_four_way_parity():
    """Hypothesis fuzz: spec (python re), DuckDB, and Arrow RE2 agree on
    arbitrary printable+unicode strings."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from geocoderpl_spark.functions.tokenize import (
        CAMEL_BOUNDARY,
        NON_TOKEN,
        TOKEN_RUN,
        tokenize_py,
    )

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=80))
    def check(raw):
        expected = tokenize_py(raw)
        sql = "select " + duckdb_tokenize_sql("?") + " as toks"
        got_duck = duckdb.sql(sql, params=[raw]).fetchone()[0]
        assert got_duck == expected, raw
        arr = pa.array([raw])
        spaced = pc.replace_substring_regex(arr, pattern=CAMEL_BOUNDARY, replacement=r"\1 \2")
        low = pc.utf8_lower(spaced)
        got_arrow = [t for t in pc.split_pattern_regex(low, pattern=NON_TOKEN).to_pylist()[0] if t]
        assert got_arrow == expected, raw
        # doclen shortcut (count of maximal token runs) == len(tokens)
        assert pc.count_substring_regex(low, pattern=TOKEN_RUN).to_pylist()[0] == len(expected), raw

    check()
