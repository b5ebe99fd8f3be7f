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


def test_watermarked_windowed_rollup_drops_late_events(spark, tmp_path):
    """Structured Streaming watermark semantics: tumbling windows emit once
    the watermark passes them (append mode), a too-late event is dropped,
    and emitted rows equal the batch recomputation over on-time events
    restricted to closed windows."""
    import time as _time

    from pyspark.sql import functions as F

    from geocoderpl_spark.streaming.windowed import (
        EVENTS_SCHEMA,
        start_windowed_rollup,
        windowed_rollup,
    )

    sdir, odir = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(sdir)
    base = "2024-01-01 {h:02d}:{m:02d}:00"

    def ev(i, h, m, typ, val):
        return (i, i % 7, typ, base.format(h=h, m=m), float(val), "{}")

    drops = [
        # hours 0-2
        [ev(1, 0, 10, "click", 1.5), ev(2, 0, 40, "view", 2.0),
         ev(3, 1, 5, "click", 3.0), ev(4, 2, 59, "view", 4.25)],
        # hours 3-4 (watermark passes hours 0-2)
        [ev(5, 3, 30, "click", 5.0), ev(6, 4, 45, "view", 6.5)],
        # hour 5 + a LATE hour-0 event (must be dropped, hour 0 already final)
        [ev(7, 5, 0, "click", 7.0), ev(8, 0, 20, "click", 99.0)],
    ]
    for i, rows in enumerate(drops):
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts string, value double, props string"
        ).withColumn("ts", F.to_timestamp("ts"))
        df.coalesce(1).write.mode("overwrite").parquet(f"{sdir}/t.tmp")
        import glob
        import shutil

        f = glob.glob(f"{sdir}/t.tmp/*.parquet")[0]
        shutil.move(f, f"{sdir}/drop_{i}.parquet")
        shutil.rmtree(f"{sdir}/t.tmp")
        _time.sleep(1.1)  # distinct mtimes -> deterministic batch order

    q = start_windowed_rollup(spark, sdir, odir, watermark="30 minutes",
                              window="1 hour", max_files_per_trigger=1)
    q.awaitTermination(300)

    got = (
        spark.read.parquet(odir).toPandas()
        .sort_values(["window_start", "event_type"]).reset_index(drop=True)
    )
    ontime = [r for d in drops for r in d if r[0] != 8]  # event 8 is the late one
    batch = spark.createDataFrame(
        ontime, "event_id long, user_id long, event_type string, ts string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    exp = (
        windowed_rollup(batch)
        .filter(F.col("window_end") <= F.lit("2024-01-01 04:00:00").cast("timestamp"))
        .toPandas()
        .sort_values(["window_start", "event_type"]).reset_index(drop=True)
    )
    assert len(got) > 0
    assert got.equals(exp), (got, exp)
    # the late event's value (99.0) must appear nowhere
    assert not (got.sum_value > 90).any()


def test_stateful_sessionize_state_carries_across_batches(spark, tmp_path):
    """applyInPandasWithState sessionization: state (last_ts, counters) must
    carry across micro-batches — a session spanning the batch boundary is
    NOT double-counted; final counts equal the batch operator."""
    import glob
    import shutil
    import time as _time

    from pyspark.sql import functions as F

    from geocoderpl_spark.streaming.stateful import stateful_sessionize

    rows = [
        # user 1: events 10 min apart straddling the batch split -> 1 session
        (1, 1, "c", "2024-01-01 00:00:00", 0.0, "{}"),
        (2, 1, "c", "2024-01-01 00:10:00", 0.0, "{}"),
        (3, 1, "c", "2024-01-01 01:10:00", 0.0, "{}"),   # 60min gap -> new session
        # user 2: both events in different batches, 10s apart -> 1 session
        (4, 2, "c", "2024-01-01 00:20:00", 0.0, "{}"),
        (5, 2, "c", "2024-01-01 00:20:10", 0.0, "{}"),
    ]
    schema = "event_id long, user_id long, event_type string, ts string, value double, props string"
    sdir = str(tmp_path / "in")
    os.makedirs(sdir)
    batches = [[rows[0], rows[3]], [rows[1], rows[2], rows[4]]]
    for i, rs in enumerate(batches):
        df = spark.createDataFrame(rs, schema).withColumn("ts", F.to_timestamp("ts"))
        df.coalesce(1).write.mode("overwrite").parquet(f"{sdir}/t.tmp")
        f = glob.glob(f"{sdir}/t.tmp/*.parquet")[0]
        shutil.move(f, f"{sdir}/drop_{i}.parquet")
        shutil.rmtree(f"{sdir}/t.tmp")
        _time.sleep(1.1)
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, ts timestamp, value double, props string"
        ).option("maxFilesPerTrigger", 1).parquet(sdir)
    )
    q = (
        stateful_sessionize(stream)
        .writeStream.outputMode("update").format("memory").queryName("sess_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in spark.table("sess_t").withColumn("rn", F.row_number().over(w))
        .filter("rn = 1").collect()
    }
    assert final[1] == (2, 3)   # boundary-straddling session not double-counted
    assert final[2] == (1, 2)


def _two_segments(spark, root, n_docs=120):
    from pyspark.sql import functions as F

    from geocoderpl_spark.operators.docids import assign_doc_ids
    from geocoderpl_spark.plans.snapshots import commit_snapshot

    corpus = synth_corpus(spark, n_docs)
    base = 0
    names = []
    for i in range(2):
        part = assign_doc_ids(
            corpus.filter(F.pmod(F.xxhash64("path"), F.lit(2)) == i),
            ["repo", "path", "commit"],
        ).withColumn("doc_id", F.col("doc_id") + F.lit(base))
        name = f"seg_{i:05d}"
        build_index(spark, part, os.path.join(root, name), n_buckets=4, id_col="doc_id")
        base += part.count()
        names.append(name)
        commit_snapshot(root, names[: i + 1], op=f"append:{name}")
    return names


def test_expired_snapshot_raises_not_partial(spark, tmp_path):
    """Pinning a snapshot whose segments were GC'd by compaction must fail
    loudly (Iceberg 'snapshot expired'), never silently serve a subset."""
    from geocoderpl_spark.streaming.incremental import compact_segments

    root = str(tmp_path / "idx")
    os.makedirs(root)
    _two_segments(spark, root)
    assert compact_segments(spark, root, max_segments=1, n_buckets=4)
    # latest view fine
    assert SegmentedIndex(spark, root).global_stats()[0] == 120
    # pre-compaction snapshot now references GC'd dirs -> raise
    with pytest.raises(FileNotFoundError, match="expired"):
        SegmentedIndex(spark, root, snapshot_id=2).segments()


def test_gc_orphan_segments_heals_crashed_compaction(spark, tmp_path):
    """Crash after the compaction snapshot commit but before input GC leaks
    the consumed dirs; gc_orphan_segments (run by the next compact_segments
    call) must remove exactly them and change no query result."""
    import json

    from geocoderpl_spark.plans.snapshots import commit_snapshot
    from geocoderpl_spark.streaming.incremental import (
        compact_segments,
        gc_orphan_segments,
    )

    root = str(tmp_path / "idx")
    os.makedirs(root)
    names = _two_segments(spark, root)
    merged = os.path.join(root, "seg_00000-00001m")
    merge_segments(spark, root, merged, n_buckets=4)
    with open(os.path.join(merged, "merged_from.json"), "w") as f:
        json.dump(names, f)
    commit_snapshot(root, [os.path.basename(merged)], op="compact")
    # crash here: inputs never deleted
    assert all(os.path.exists(os.path.join(root, n)) for n in names)
    q = spark.createDataFrame(
        [(0, "term_0001", 5)], "query_id long, query_text string, k int"
    )
    before = [tuple(r) for r in SegmentedIndex(spark, root).topk(q).collect()]
    removed = gc_orphan_segments(root)
    assert sorted(removed) == names
    assert not any(os.path.exists(os.path.join(root, n)) for n in names)
    after = [tuple(r) for r in SegmentedIndex(spark, root).topk(q).collect()]
    assert before == after
    # idempotent + no-op through the compaction entry point
    assert gc_orphan_segments(root) == []
    assert compact_segments(spark, root, max_segments=4, n_buckets=4) is False


def test_sessionize_kernel_sorts_across_chunks():
    """applyInPandasWithState may deliver one group as several unordered
    Arrow chunks; the kernel must concatenate-then-sort, not sort per chunk
    (ADVICE r02). Feed chunks whose concatenation is out of order and assert
    the gap logic sees the globally sorted stream."""
    import pandas as pd

    from geocoderpl_spark.streaming.stateful import SESSION_GAP_S, _sessionize_group

    class FakeState:
        exists = False

        def __init__(self):
            self.stored = None

        @property
        def get(self):
            return self.stored

        def update(self, v):
            self.stored = v

    t0 = 1_700_000_000
    # chunk2 holds the EARLIEST event; sorted stream has one gap > threshold
    c1 = pd.DataFrame({
        "user_id": [1, 1],
        "event_id": [2, 3],
        "ts": pd.to_datetime([t0 + 10, t0 + SESSION_GAP_S + 100], unit="s"),
    })
    c2 = pd.DataFrame({
        "user_id": [1],
        "event_id": [1],
        "ts": pd.to_datetime([t0], unit="s"),
    })
    st = FakeState()
    (out,) = list(_sessionize_group((1,), iter([c1, c2]), st))
    # globally sorted: t0, t0+10 (same session), t0+gap+100 (new session)
    assert out["n_sessions"].iloc[0] == 2
    assert out["n_events"].iloc[0] == 3
    assert st.stored == (t0 + SESSION_GAP_S + 100, 2, 3)


def test_segmented_pruned_topk_rank_identical(spark, streamed, tmp_path):
    """VERDICT r02 #3: the serving-grade segmented path (per-segment pruned
    block scans -> one MaxScore kernel pass, remapped term ids, rescaled
    bounds) must be rank-identical to (a) the exact segment-union path and
    (b) a merged single index queried exactly."""
    index_root, corpus = streamed
    q = spark.createDataFrame(
        [(0, "term_0001 term_0002", 10), (1, "term_0003", 5),
         (2, "zzznope", 5), (3, "term_0001 the_hot_term", 10)],
        "query_id long, query_text string, k int",
    )
    seg = SegmentedIndex(spark, index_root)
    assert len(seg.segments()) >= 2  # genuinely multi-segment
    exact = sorted(tuple(r) for r in seg.topk(q).collect())
    pruned = sorted(tuple(r) for r in seg.topk_pruned(q).collect())
    assert pruned == exact

    merged_dir = str(tmp_path / "one")
    merged = merge_segments(spark, index_root, merged_dir)
    one = sorted(tuple(r) for r in merged.topk(q, "exact").collect())
    assert pruned == one


def test_segmented_pruned_hot_term_routes_to_exact(spark, streamed, monkeypatch):
    """A term whose GLOBAL df exceeds the serving cap must push its query to
    the exact path while cold queries stay on the kernel — and the mixed
    result must be rank-identical to all-exact."""
    from pyspark.sql import functions as F

    from geocoderpl_spark.operators import topk as topkmod
    from geocoderpl_spark.sources.corpus import HOT_TERM

    index_root, corpus = streamed
    seg = SegmentedIndex(spark, index_root)
    q = spark.createDataFrame(
        [(0, f"{HOT_TERM} term_0001", 10), (1, "term_0002 term_0003", 10)],
        "query_id long, query_text string, k int",
    )
    exact = sorted(tuple(r) for r in seg.topk(q).collect())
    # threshold between df(term_000x) (a handful) and the hot term's global
    # df (~35% of 300 docs) -> query 0 routes, query 1 stays pruned
    monkeypatch.setattr(topkmod, "_hot_df_threshold", lambda mb: 50)
    # precondition: the hot term really is above, the cold ones below
    hot_df = sum(
        r["df"] for s in seg.segments()
        for r in s.terms.filter(F.col("term") == HOT_TERM).collect()
    )
    assert hot_df > 50
    pruned = sorted(tuple(r) for r in seg.topk_pruned(q).collect())
    assert pruned == exact
    assert any(r[0] == 0 for r in pruned) and any(r[0] == 1 for r in pruned)


def test_merge_segments_mixed_generation(spark, tmp_path):
    """Compaction must handle an LSM root whose segments span the fusion
    change: one segment's tf checkpoint in the pre-fusion format (no sha256
    column, no sentinel rows) unioned with a fused-format segment — and the
    merged index must still answer identically to the segment union."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from geocoderpl_spark.plans.build import build_index
    from geocoderpl_spark.sources.corpus import synth_corpus

    root = str(tmp_path / "lsm")
    os.makedirs(root)
    docs = synth_corpus(spark, 300)
    ids = docs.select(
        F.abs(F.xxhash64("path")).alias("doc_id"), "content"
    ).withColumn("doc_id", F.pmod("doc_id", F.lit(10**6)))
    for i in range(2):
        part = ids.filter(F.pmod("doc_id", F.lit(2)) == i)
        build_index(spark, part, os.path.join(root, f"seg_{i:05d}"),
                    n_buckets=4, id_col="doc_id", content_col="content")

    # downgrade seg_00000's tf checkpoint to the pre-fusion schema
    tfdir = os.path.join(root, "seg_00000", "tf")
    old = (
        spark.read.parquet(tfdir)
        .filter(F.col("term").isNotNull())
        .select("term", "doc_id", "doclen", "tf")
    )
    tmp_out = str(tmp_path / "oldtf")
    old.write.mode("overwrite").parquet(tmp_out)
    shutil.rmtree(tfdir)
    shutil.move(tmp_out, tfdir)
    assert "sha256" not in spark.read.parquet(tfdir).columns

    seg = SegmentedIndex(spark, root)
    q = spark.createDataFrame(
        [(0, "term_0001 term_0002", 10)], "query_id long, query_text string, k int"
    )
    union = sorted(tuple(r) for r in seg.topk(q).collect())
    merged = merge_segments(spark, root, str(tmp_path / "one"))
    one = sorted(tuple(r) for r in merged.topk(q, "exact").collect())
    assert one == union and len(one) == 10


def test_merge_segments_rejects_positional_mix(spark, tmp_path):
    """Positional + plain segments must fail compaction loudly, not
    NULL-fill positions into the encode kernel."""
    import pytest
    from pyspark.sql import functions as F

    from geocoderpl_spark.plans.build import build_index
    from geocoderpl_spark.sources.corpus import synth_corpus

    root = str(tmp_path / "mix")
    os.makedirs(root)
    ids = synth_corpus(spark, 120).select(
        F.pmod(F.abs(F.xxhash64("path")), F.lit(10**6)).alias("doc_id"), "content"
    )
    build_index(spark, ids.filter("doc_id % 2 = 0"), os.path.join(root, "seg_00000"),
                n_buckets=4, id_col="doc_id", content_col="content")
    build_index(spark, ids.filter("doc_id % 2 = 1"), os.path.join(root, "seg_00001"),
                n_buckets=4, id_col="doc_id", content_col="content", positional=True)
    with pytest.raises(ValueError, match="positional"):
        merge_segments(spark, root, str(tmp_path / "out"))
