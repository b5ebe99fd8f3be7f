"""Smoke tests for the spark-submit query entrypoint (jobs/query_job.py):
the CLI surface a reference user actually runs — free-text, boolean, and
faceted modes must produce the same rows as the library calls they wrap."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from geocoderpl_spark.plans.build import build_index
from geocoderpl_spark.sources.corpus import synth_corpus


@pytest.fixture(scope="module")
def job_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("jobidx"))
    return build_index(spark, synth_corpus(spark, 400), out, n_buckets=8, partitions=8)


def _run(argv, capsys):
    from jobs.query_job import main

    assert main(argv) == 0
    out = capsys.readouterr().out
    return [json.loads(line) for line in out.splitlines() if line.startswith("{")]


def test_query_job_freetext_matches_library(spark, job_index, capsys):
    rows = _run(["--index", job_index.root, "--query", "term_0001 term_0002",
                 "--k", "5", "--serve"], capsys)
    assert len(rows) == 5 and [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    q = spark.createDataFrame(
        [(0, "term_0001 term_0002", 5)], "query_id long, query_text string, k int"
    )
    want = {(r["doc_id"], r["rank"]) for r in job_index.topk(q, "exact").collect()}
    assert {(r["doc_id"], r["rank"]) for r in rows} == want


def test_query_job_boolean_and_filter_modes(spark, job_index, capsys):
    rows = _run(["--index", job_index.root, "--query", "term_0001 term_0002",
                 "--exclude", "term_0003", "--k", "50"], capsys)
    bq = spark.createDataFrame(
        [(0, "term_0001 term_0002", "term_0003", 50)],
        "query_id long, must string, must_not string, k int",
    )
    want = {(r["doc_id"], r["rank"]) for r in job_index.topk_boolean(bq).collect()}
    assert want and {(r["doc_id"], r["rank"]) for r in rows} == want

    rows = _run(["--index", job_index.root, "--query", "term_0001",
                 "--filter", "doc_id % 2 = 0", "--k", "10", "--fetch", "lang"], capsys)
    assert rows and all(r["doc_id"] % 2 == 0 for r in rows)
    assert all("lang" in r for r in rows)

    # boolean AND facet compose (the filter must not be silently dropped)
    rows = _run(["--index", job_index.root, "--query", "term_0001",
                 "--exclude", "term_0003", "--filter", "doc_id % 2 = 0",
                 "--k", "50"], capsys)
    assert rows and all(r["doc_id"] % 2 == 0 for r in rows)
    cq = spark.createDataFrame(
        [(0, "term_0001", "term_0003", 50)],
        "query_id long, must string, must_not string, k int",
    )
    allowed = job_index.docstats.filter("doc_id % 2 = 0")
    want = {(r["doc_id"], r["rank"])
            for r in job_index.topk_boolean(cq, allowed_docs=allowed).collect()}
    assert {(r["doc_id"], r["rank"]) for r in rows} == want
