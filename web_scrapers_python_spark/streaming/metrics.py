"""Structured-Streaming analogs of the crawl-stats layer.

The reference's only time-windowed artifact is the hourly
``crawl_stats`` counter table (cassandra_manager.py:173-181, 422-434);
its batch port is operators/… A1/A2. This module is the streaming
spelling of the same aggregation for live-crawl deployments: a file
(or Iceberg) stream of events -> event-time tumbling windows with a
watermark for late data -> append-mode counts.

At scale: the aggregation state is keyed (window, event_type) — small
and bounded by the watermark horizon; shuffle is one exchange on the
group keys, identical to the batch rollup plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def stream_events(spark: SparkSession, path: str,
                  max_files_per_trigger: int | None = None) -> DataFrame:
    """Parquet file-stream source over an events directory (schema is
    declared, never inferred — SURVEY §1.5). ``max_files_per_trigger``
    bounds per-batch work; the default (no bound) is right for
    availableNow backfills — static parquet dumps are not time-ordered
    across files, so per-file triggers would advance the watermark
    mid-backfill and drop in-range events as late."""
    r = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time counts per event_type with late-data
    watermark — the streaming twin of the A1/A2 hourly rollup."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events", "sum_value")
    )


def sliding_event_counts(events: DataFrame, window: str = "30 minutes",
                         slide: str = "15 minutes",
                         watermark: str = "2 hours") -> DataFrame:
    """Sliding (hopping) event-time counts per event_type: each event
    lands in window/slide overlapping windows (epoch-aligned, same as
    the tumbling grid). State per (window, event_type) is bounded by
    the watermark horizon exactly as in the tumbling case — the only
    scale delta is the window/slide output multiplier, which is a
    constant. ``withWatermark`` is a no-op on a batch frame, so the
    same function is the batch twin the oracle checks."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events", "sum_value")
    )


def session_event_counts(events: DataFrame, gap: str = "30 minutes",
                         watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows (``F.session_window``): events closer
    than ``gap`` merge; session end = last event + gap. The native
    session operator keeps state per OPEN session keyed by user — at
    10^10 events the state is bounded by (active users x watermark
    horizon), and the shuffle is one exchange on user_id. Works
    identically on a batch frame (watermark no-op), which is what the
    DuckDB gaps-and-islands twin verifies."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"),
             F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "user_id", "n_events", "sum_value")
    )


def run_to_memory(spark: SparkSession, src_path: str, table: str,
                  window: str = "1 hour", watermark: str = "2 hours",
                  output_mode: str = "append"):
    """Drive the stream with availableNow into an in-memory sink
    (test/bench harness): processes all present files then stops.

    Default is append mode — the documented production semantics, where
    the watermark finalizes and evicts window state. Note the watermark
    only advances to max(event_time) - watermark_delay, so windows that
    overlap the trailing watermark interval are NOT finalized and never
    emit in append mode (they stay in state when the availableNow run
    stops). A full backfill must either append a sentinel event at
    least ``watermark`` past the last real event (what the tests do) or
    use ``output_mode='complete'``, which snapshots every window
    including unfinalized ones."""
    q = (
        windowed_event_counts(stream_events(spark, src_path),
                              window, watermark)
        .writeStream.format("memory").queryName(table)
        .outputMode(output_mode).trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.table(table)
