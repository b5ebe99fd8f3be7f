"""File-level stats manifest for posting segments (VERDICT r02 #6) — the
Iceberg manifest-file idea: every posting parquet file is recorded with its
bucket and term_id min/max at build time, so a term-scoped query enumerates
exactly the files that can contain its terms WITHOUT listing directories.

Why it matters at 100 TB: `bucket IN (...)` partition pruning still has to
LIST the surviving bucket directories (10^5+ files per bucket at 10^12
docs); with the manifest the driver goes straight from term_ids to a file
list. Under the hot-term-salted layout (hash on (bucket, doc-slice)) each
file's [tid_min, tid_max] spans most of its bucket — the manifest's win is
listing-free enumeration plus the bucket cut; WITHIN each file the blocks
are re-sorted term_id-contiguous (postings.py), so Parquet row-group
min/max stats do the fine-grained skipping.

Reference analog: the reference opens one SQLite file per query
(``geo_gui.py:42-43``); the manifest is the distributed version of "know
exactly which file to open".

Format: one JSON object per line in ``<root>/manifest/postings_manifest.jsonl``
(written atomically via rename): {"file","bucket","tid_min","tid_max","n_blocks"}.
File paths are stored relative to the postings dir, so the index stays
relocatable. At larger-than-driver manifests this becomes a parquet table
keyed by bucket — same contract, bigger container.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_FILE = "postings_manifest.jsonl"


def _manifest_path(index_root: str) -> str:
    return os.path.join(index_root, "manifest", MANIFEST_FILE)


def write_postings_manifest(spark: SparkSession | None, index_root: str) -> int:
    """Per-file manifest from the Parquet FOOTERS of the freshly written
    postings: term_id min/max comes from row-group statistics, bucket from
    the partition directory name — no Spark job, no data scan, just one
    footer read per file (the same metadata a query's row-group skipping
    uses, so the recorded ranges are exactly what pruning can exploit).
    Returns the number of files recorded. Idempotent (atomic rename).

    At cluster scale (10^5-10^6 files) the footer reads distribute: map the
    file list through a Spark job doing the same per-file footer read —
    the contract (one JSONL/parquet row per file) is unchanged. The driver
    loop here is right for single-box file counts.
    """
    import glob as _glob

    import pyarrow.parquet as pq

    pdir = os.path.join(index_root, "postings")
    entries = []
    for bdir in sorted(_glob.glob(os.path.join(pdir, "bucket=*"))):
        bucket = int(os.path.basename(bdir).split("=", 1)[1])
        for fp in sorted(_glob.glob(os.path.join(bdir, "*.parquet"))):
            md = pq.ParquetFile(fp).metadata
            ci = {md.schema.column(i).name: i for i in range(md.num_columns)}["term_id"]
            tid_min = tid_max = None
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(ci).statistics
                if st is None or not st.has_min_max:  # pragma: no cover
                    # stats missing -> widest range (file never wrongly skipped)
                    tid_min, tid_max = 0, (1 << 62)
                    break
                tid_min = st.min if tid_min is None else min(tid_min, st.min)
                tid_max = st.max if tid_max is None else max(tid_max, st.max)
            if tid_min is None:  # zero-row file
                continue
            entries.append({
                "file": os.path.join(os.path.basename(bdir), os.path.basename(fp)),
                "bucket": bucket,
                "tid_min": int(tid_min), "tid_max": int(tid_max),
                "n_blocks": int(md.num_rows),
            })
    if not entries:
        return 0  # flat empty write (zero-doc index): nothing to manifest
    os.makedirs(os.path.join(index_root, "manifest"), exist_ok=True)
    tmp = _manifest_path(index_root) + ".tmp"
    with open(tmp, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    os.replace(tmp, _manifest_path(index_root))
    return len(entries)


def load_postings_manifest(index_root: str) -> list[dict] | None:
    """Manifest entries, or None when absent (pre-manifest index -> caller
    falls back to directory-listing scans)."""
    p = _manifest_path(index_root)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return [json.loads(line) for line in f if line.strip()]


def select_files(
    entries: list[dict], term_ids: list[int], n_buckets: int | None = None
) -> list[str]:
    """Relative posting files that can contain any of the query's term_ids:
    the file's bucket must be the term's hash bucket AND its [tid_min,
    tid_max] range must cover the id (binary search per file — O(F log T)).
    Without the bucket check, another bucket's sparse id range would
    spuriously match (ids are hashed across buckets, so ranges overlap)."""
    import bisect

    if n_buckets:
        from ..operators.topk import tid_bucket

        by_bucket: dict[int, list[int]] = {}
        for t in term_ids:
            by_bucket.setdefault(tid_bucket(t, n_buckets), []).append(t)
        for v in by_bucket.values():
            v.sort()
    else:
        by_bucket = {None: sorted(term_ids)}
    out = []
    for e in entries:
        tids = by_bucket.get(e["bucket"] if n_buckets else None)
        if not tids:
            continue
        i = bisect.bisect_left(tids, e["tid_min"])
        if i < len(tids) and tids[i] <= e["tid_max"]:
            out.append(e["file"])
    return out


def manifest_scan(
    spark: SparkSession,
    index_root: str,
    entries: list[dict],
    term_ids: list[int],
    n_buckets: int | None = None,
) -> DataFrame:
    """Posting scan that enumerates files from the manifest instead of
    listing bucket directories, then applies the same literal filters (the
    term_id IN (...) still prunes row groups *within* each opened file).
    Returns the same rows as ``_pruned_scan`` on the full table."""
    pdir = os.path.join(index_root, "postings")
    files = select_files(entries, term_ids, n_buckets)
    if not files:
        return spark.read.parquet(pdir).filter(F.lit(False))
    reader = spark.read.option("basePath", pdir)
    df = reader.parquet(*[os.path.join(pdir, f) for f in files])
    cond = F.col("term_id").isin(term_ids)
    if n_buckets:
        # bucket is functionally determined by term_id, but keeping the
        # partition filter lets Spark skip partitions of multi-bucket reads
        from ..operators.topk import tid_bucket

        buckets = sorted({tid_bucket(t, n_buckets) for t in term_ids})
        cond = F.col("bucket").isin(buckets) & cond
    return df.filter(cond)
