"""Watermarked windowed aggregation over an event stream — the Structured
Streaming surface for late data (readStream -> withWatermark -> window ->
agg -> append sink).

Semantics: events are grouped into tumbling event-time windows per
event_type; a window is emitted (append mode) only once the watermark
passes its end, and events later than ``watermark`` behind the max seen
event time are dropped. Equivalent batch computation over the same files,
restricted to closed windows, must match row-for-row — asserted in
tests/test_streaming.py.

Scale notes: the windowed groupBy is a standard streaming state-store
aggregation keyed by (window, event_type) — uniform keys, partial
aggregation before the shuffle; the watermark bounds state size (windows
older than watermark are finalized and evicted). At 100 TB/day the same
plan runs unchanged with kafka sources and a real checkpoint location.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = "event_id long, user_id long, event_type string, ts timestamp, value double, props string"


def windowed_rollup(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Shared shape for both the streaming and the batch (oracle) side:
    tumbling-window count + decimal-exact value sum per event_type."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def start_windowed_rollup(
    spark: SparkSession,
    stream_dir: str,
    out_dir: str,
    watermark: str = "30 minutes",
    window: str = "1 hour",
    schema: str = EVENTS_SCHEMA,
    max_files_per_trigger: int | None = None,
):
    """readStream over event parquet drops -> watermarked tumbling-window
    rollup -> append-mode parquet sink. Returns the StreamingQuery.

    ``max_files_per_trigger`` splits a backlog into multiple micro-batches —
    the watermark only advances BETWEEN batches, so replaying history as one
    giant batch would apply no lateness filtering at all."""
    src = spark.readStream.schema(schema)
    if max_files_per_trigger:
        src = src.option("maxFilesPerTrigger", max_files_per_trigger)
    src = src.parquet(stream_dir)
    agg = windowed_rollup(src.withWatermark("ts", watermark), window)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", out_dir + "_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
