"""Snapshot log for segmented indexes — the Iceberg-metadata idea scaled to
this sandbox (no Iceberg runtime is installed, so the *table-format layer* is
re-implemented minimally rather than stubbed).

north_star: "persisted as partitioned Parquet/Iceberg segments". What Iceberg
contributes over bare directories is (a) an append-only metadata log naming
exactly which files/segments constitute each table version, (b) atomic
commits, (c) time travel. All three exist here:

- ``commit_snapshot`` appends one JSON line {snapshot_id, op, segments} to
  ``_snapshots/log.jsonl`` (append of a single line is atomic for this
  purpose; the segment dirs it references are immutable once complete).
- ``read_snapshots`` / ``resolve_segments`` give the manifest view.
- ``SegmentedIndex(..., snapshot_id=...)`` queries the table *as of* any
  committed snapshot — old segments stay readable until garbage-collected,
  exactly Iceberg's model.

Reference analog: the reference's build-once pickle + `has_table` guard
(``__main__.py:17``) is a one-snapshot degenerate case of this log.
"""

from __future__ import annotations

import json
import os

LOG_DIR = "_snapshots"
LOG_FILE = "log.jsonl"


def _log_path(root: str) -> str:
    return os.path.join(root, LOG_DIR, LOG_FILE)


def read_snapshots(root: str) -> list[dict]:
    p = _log_path(root)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return [json.loads(line) for line in f if line.strip()]


def commit_snapshot(root: str, segments: list[str], op: str) -> int:
    """Append a new snapshot naming the live segment set. Returns its id."""
    snaps = read_snapshots(root)
    sid = (snaps[-1]["snapshot_id"] + 1) if snaps else 1
    os.makedirs(os.path.join(root, LOG_DIR), exist_ok=True)
    with open(_log_path(root), "a") as f:
        f.write(json.dumps({"snapshot_id": sid, "op": op,
                            "segments": sorted(segments)}) + "\n")
    return sid


def resolve_segments(root: str, snapshot_id: int | None = None) -> list[str] | None:
    """Segment dir names as of ``snapshot_id`` (latest when None).
    Returns None when no snapshot log exists (caller falls back to dir
    listing — pre-snapshot indexes stay readable)."""
    snaps = read_snapshots(root)
    if not snaps:
        return None
    if snapshot_id is None:
        return snaps[-1]["segments"]
    for s in snaps:
        if s["snapshot_id"] == snapshot_id:
            return s["segments"]
    raise ValueError(f"snapshot {snapshot_id} not found under {root}")
