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
