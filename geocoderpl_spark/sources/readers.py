"""Multi-format corpus readers: the same input_hint-shaped corpus table
``(repo, path, commit, lang, content[, sha256])`` from parquet, CSV, or
JSONL — the index build is source-format-agnostic (S-family widening;
reference analog: its ingest reads zipped GML/XML plus CSV dictionaries,
``xml_parsers.py``, SURVEY §2.1).

All readers take an explicit schema (never inferSchema — a second pass over
100 TB just to guess types) and return an identical logical shape, so
``build_index`` output is byte-identical across formats (asserted in
tests/test_index.py::test_build_identical_across_source_formats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, sha256 string"
)
CORPUS_COLS = ("repo", "path", "commit", "lang", "content", "sha256")


def read_corpus(spark: SparkSession, src: str, fmt: str = "parquet") -> DataFrame:
    """Load a corpus table from ``src`` in the given format.

    - parquet: plain columnar read (predicate pushdown / column pruning).
    - jsonl:   one JSON object per line; explicit schema, PERMISSIVE mode
      (malformed lines become all-null rows and are dropped on content).
    - csv:     header-less, explicit schema, quoted multiline content
      (``multiLine`` so embedded newlines in code survive round-trips).
    """
    if fmt == "parquet":
        df = spark.read.parquet(src)
    elif fmt == "jsonl":
        df = spark.read.schema(CORPUS_SCHEMA).json(src)
    elif fmt == "csv":
        df = (
            spark.read.schema(CORPUS_SCHEMA)
            .option("header", "false")
            .option("multiLine", "true")
            .option("quote", '"')
            .option("escape", '"')
            .csv(src)
        )
    else:
        raise ValueError(f"unknown corpus format: {fmt}")
    present = [c for c in CORPUS_COLS if c in df.columns]
    return df.select(*present).filter(F.col("content").isNotNull())


def write_corpus(df: DataFrame, dst: str, fmt: str) -> None:
    """Round-trip writer used by tests/fixtures (CSV quotes + escapes content
    so multiline code survives)."""
    cols = [c for c in CORPUS_COLS if c in df.columns]
    w = df.select(*cols).write.mode("overwrite")
    if fmt == "parquet":
        w.parquet(dst)
    elif fmt == "jsonl":
        w.json(dst)
    elif fmt == "csv":
        w.option("header", "false").option("quote", '"').option("escape", '"').csv(dst)
    else:
        raise ValueError(f"unknown corpus format: {fmt}")
