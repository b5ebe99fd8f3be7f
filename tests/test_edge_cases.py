"""Edge/boundary hardening: tokenizer 3-way fuzz, empty corpus, partial-write
resume (FIXTURES.md §4 boundary_cases + §5)."""

from __future__ import annotations

import os
import random
import string

import duckdb
import pytest

from geocoderpl_spark.functions.tokenize import duckdb_tokenize_sql, tokenize, tokenize_py


def _random_strings(n: int, seed: int = 42) -> list[str]:
    rng = random.Random(seed)
    alphabet = (
        string.ascii_letters + string.digits + "_ .,;:()[]{}<>/\\|@#$%^&*-+=~`'\"\t\n"
        + "éüñßÉÜÑ中文ابと🎉"
    )
    out = []
    for _ in range(n):
        ln = rng.randint(0, 60)
        out.append("".join(rng.choice(alphabet) for _ in range(ln)))
    return out


def test_tokenizer_three_way_fuzz(spark):
    """The python kernel, the Spark column expression, and the DuckDB oracle
    twin must tokenize identically on arbitrary (incl. unicode) input —
    oracle comparability depends on it."""
    cases = _random_strings(300)
    expected = [tokenize_py(c) for c in cases]

    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i int, t string")
    got_spark = {r["i"]: r["toks"] for r in df.select("i", tokenize("t").alias("toks")).collect()}
    for i, exp in enumerate(expected):
        assert got_spark[i] == exp, (i, cases[i])

    con = duckdb.connect()
    sql = "select " + duckdb_tokenize_sql("?") + " as toks"
    for i, c in enumerate(cases):
        assert con.sql(sql, params=[c]).fetchone()[0] == expected[i], (i, c)


def test_empty_corpus_build_and_query(spark, tmp_path):
    from geocoderpl_spark.plans.build import build_index

    corpus = spark.createDataFrame(
        [], "repo string, path string, commit string, lang string, content string"
    )
    idx = build_index(spark, corpus, str(tmp_path / "empty"), n_buckets=4, partitions=2)
    assert idx.n_docs == 0 and idx.avgdl == 0.0
    q = spark.createDataFrame([(0, "anything", 5)], "query_id long, query_text string, k int")
    assert idx.topk(q, "exact").count() == 0
    assert idx.topk(q, "pruned").count() == 0


def test_partial_write_resume(spark, tmp_path):
    """A stage dir without _SUCCESS (killed mid-write) must be rebuilt, not
    trusted (reference analog: build-once guard, __main__.py:17)."""
    from geocoderpl_spark.operators.postings import decode_postings
    from geocoderpl_spark.plans.build import build_index
    from geocoderpl_spark.sources.corpus import synth_corpus

    out = str(tmp_path / "idx")
    idx = build_index(spark, synth_corpus(spark, 200), out, n_buckets=4, partitions=4)
    good = (
        decode_postings(idx.postings).toPandas()
        .sort_values(["term_id", "doc_id"]).reset_index(drop=True)
    )
    # simulate kill mid-write: remove _SUCCESS, corrupt the dir
    os.remove(os.path.join(out, "postings", "_SUCCESS"))
    with open(os.path.join(out, "postings", "junk.tmp"), "w") as f:
        f.write("partial garbage")
    idx2 = build_index(spark, synth_corpus(spark, 200), out, n_buckets=4, partitions=4)
    redone = (
        decode_postings(idx2.postings).toPandas()
        .sort_values(["term_id", "doc_id"]).reset_index(drop=True)
    )
    assert redone.equals(good)
    assert not os.path.exists(os.path.join(out, "postings", "junk.tmp"))


def test_grouped_postings_resume_byte_identical(spark, tmp_path):
    """postings_groups=4: (a) a grouped build's postings are byte-identical
    to an ungrouped build; (b) killing after some groups (markers missing,
    partial bucket dirs on disk) and resuming rebuilds ONLY the unfinished
    groups and lands byte-identical to a clean build."""
    import shutil

    from geocoderpl_spark.plans.build import build_index
    from geocoderpl_spark.sources.corpus import synth_corpus

    def blocks_pdf(ix):
        return (
            ix.postings.toPandas()
            .sort_values(["term_id", "block_id"]).reset_index(drop=True)
        )

    plain = build_index(spark, synth_corpus(spark, 300), str(tmp_path / "plain"),
                        n_buckets=8, partitions=4)
    out = str(tmp_path / "grp")
    grouped = build_index(spark, synth_corpus(spark, 300), out,
                          n_buckets=8, partitions=4, postings_groups=4)
    assert blocks_pdf(grouped).equals(blocks_pdf(plain))  # incl. binary cols

    # simulate a kill after groups 0,1: groups 2,3 lose their markers, group
    # 3 additionally has a half-written bucket dir
    pdir = os.path.join(out, "postings")
    os.remove(os.path.join(pdir, "_SUCCESS"))
    os.remove(os.path.join(pdir, "_group_2_SUCCESS"))
    os.remove(os.path.join(pdir, "_group_3_SUCCESS"))
    victims = [d for d in os.listdir(pdir) if d.startswith("bucket=")
               and int(d.split("=")[1]) % 4 == 3]
    shutil.rmtree(os.path.join(pdir, victims[0]))
    os.makedirs(os.path.join(pdir, victims[0]))  # half-written dir w/ garbage
    with open(os.path.join(pdir, victims[0], "junk.tmp"), "w") as f:
        f.write("partial garbage")

    # record group-0/1 file inventory: resume must not touch them
    keep = {
        d: sorted(os.listdir(os.path.join(pdir, d)))
        for d in os.listdir(pdir)
        if d.startswith("bucket=") and int(d.split("=")[1]) % 4 in (0, 1)
    }
    resumed = build_index(spark, synth_corpus(spark, 300), out,
                          n_buckets=8, partitions=4, postings_groups=4)
    assert blocks_pdf(resumed).equals(blocks_pdf(plain))
    assert not os.path.exists(os.path.join(pdir, victims[0], "junk.tmp"))
    for d, files in keep.items():
        assert sorted(os.listdir(os.path.join(pdir, d))) == files
