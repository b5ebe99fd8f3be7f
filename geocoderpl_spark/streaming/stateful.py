"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState`` (arbitrary stateful processing over a grouped
stream — the Spark-native replacement for hand-rolled stateful UDFs).

State per user: (last_ts epoch, n_sessions, n_events). Each micro-batch the
kernel sorts the user's new events by (ts, event_id), continues the gap
logic from the stored state, emits the updated running totals (update
output mode), and stores the new state. After the backlog is replayed in
event-time order, the final row per user equals the batch sessionize
(``relational.events_sessionize`` / its SQL oracle) exactly — asserted in
tests and by the driver gate ``stream_sessionize``.

Scale notes: state is 3 longs per user, hash-partitioned by user_id in the
state store; per-batch work is one grouped Arrow kernel — the same shape
the engine uses everywhere else. At 100 TB/day this runs on a kafka source
with RocksDB state store, unchanged.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800

OUT_SCHEMA = "user_id long, n_sessions long, n_events long"
STATE_SCHEMA = "last_ts long, n_sessions long, n_events long"


def _sessionize_group(key, pdfs, state: GroupState):
    import numpy as np

    (user_id,) = key
    last_ts, n_sessions, n_events = state.get if state.exists else (None, 0, 0)
    # applyInPandasWithState may deliver one group as several Arrow chunks
    # with no cross-chunk ordering guarantee — concatenate first, sort once,
    # then run the gap logic over the whole batch.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        # floored epoch seconds regardless of the incoming datetime64 unit —
        # identical to the batch op's cast("long") (relational.py:172)
        ts = pdf["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
        prev = np.concatenate([[last_ts if last_ts is not None else np.iinfo(np.int64).min // 2], ts[:-1]])
        n_sessions += int((ts - prev > SESSION_GAP_S).sum())
        n_events += int(ts.size)
        last_ts = int(ts[-1])
    state.update((last_ts, n_sessions, n_events))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_sessions": [n_sessions], "n_events": [n_events]}
    )


def stateful_sessionize(events: DataFrame) -> DataFrame:
    """Grouped stateful map over a *streaming* events frame. Emits the
    running (user_id, n_sessions, n_events) every micro-batch (update mode);
    the latest row per user is the current sessionization."""
    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
