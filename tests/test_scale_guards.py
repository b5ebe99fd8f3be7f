"""Scale-design guards (SURVEY.md §7.4): hot-term skew is actually split
across tasks, and no row-at-a-time Python ever enters the engine."""

from __future__ import annotations

import re
from pathlib import Path

from pyspark.sql import functions as F

ENGINE_ROOT = Path(__file__).resolve().parent.parent / "geocoderpl_spark"


def test_hot_term_postings_split_across_partitions(spark, tmp_path):
    """north_rule: 'salted repartition by term hash to defuse hot-term skew'.
    Our salt is the doc-range slice: a hot term's postings must land in
    multiple shuffle partitions, not gather on one reducer."""
    from geocoderpl_spark.operators.postings import (
        build_postings,
        build_terms,
        term_frequencies_pandas,
    )
    from geocoderpl_spark.operators.docids import assign_doc_ids
    from geocoderpl_spark.sources.corpus import HOT_TERM, synth_corpus

    docs = assign_doc_ids(synth_corpus(spark, 2000), ["repo", "path", "commit"], 8)
    tf = term_frequencies_pandas(docs)
    terms = build_terms(tf)
    blocks = build_postings(tf, terms, 220.0, n_buckets=8, partitions=16, n_docs=2000)
    with_pid = blocks.withColumn("pid", F.spark_partition_id())
    hot_id = terms.filter(F.col("term") == HOT_TERM).collect()[0]["term_id"]
    hot = with_pid.filter(F.col("term_id") == hot_id).select("pid").distinct().count()
    assert hot >= 3, f"hot term postings produced in only {hot} partition(s)"


def test_no_row_at_a_time_python_udfs():
    """input_hint: 'vectorized pandas/Arrow UDFs (no per-row Python)
    throughout'. Greps the engine source for the slow-path constructs."""
    banned = [
        re.compile(r"F\.udf\("),
        re.compile(r"@udf\b"),
        re.compile(r"\.rdd\b"),
        re.compile(r"functions\.udf\("),
    ]
    offenders = []
    for py in ENGINE_ROOT.rglob("*.py"):
        text = py.read_text()
        for pat in banned:
            for m in pat.finditer(text):
                line = text[: m.start()].count("\n") + 1
                offenders.append(f"{py.relative_to(ENGINE_ROOT.parent)}:{line} {pat.pattern}")
    assert not offenders, offenders
