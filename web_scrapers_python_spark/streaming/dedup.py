"""Streaming URL-seen dedup — the J1 anti-join as a custom stateful
Structured-Streaming operator (`applyInPandasWithState`).

A live deployment of the crawl engine consumes discovered-URL events
as a stream; the seen-set check must then be continuous rather than
per-round. State is keyed by ``host_bucket`` (the same partitioning as
the batch engine's bloom layout, SURVEY §4.2.1) and holds the set of
url_hashes seen so far in that bucket; each micro-batch emits ONLY
first occurrences, in the exact first-enqueue-wins semantics of the
batch `first_wins` + anti-join composite (J1/J2).

Scale notes:
- state per key = one url_hash set per host_bucket; buckets bound the
  per-executor state exactly like the bloom layout (10^10 design point:
  swap the exact set for the same serialized bloom + exact-suffix
  check; the operator shape is identical).
- `applyInPandasWithState` receives Arrow batches per key — the
  processing is vectorized pandas, never per-row Python.
- timeouts: NoTimeout — a crawl seen-set never expires. A TTL'd
  variant (re-crawl after N days) is `GroupStateTimeout.ProcessingTimeTimeout`
  plus a round-stamp per hash.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = "url_hash string, url string, host_bucket int, seq long"
OUT_SCHEMA = "url_hash string, url string, host_bucket int, seq long"
STATE_SCHEMA = "seen array<string>"


def _first_seen(key: Tuple[Any, ...],
                batches: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    (seen_list,) = state.get if state.exists else ([],)
    seen = set(seen_list)
    for b in batches:
        # within-batch first-wins: keep min-seq row per url_hash, in
        # deterministic seq order (J2), then drop already-seen keys (J1)
        b = b.sort_values("seq", kind="mergesort")
        b = b[~b["url_hash"].duplicated(keep="first")]
        fresh = b[~b["url_hash"].isin(seen)]
        if len(fresh):
            seen.update(fresh["url_hash"].tolist())
            yield fresh
    state.update((sorted(seen),))


def stream_first_seen(events: DataFrame) -> DataFrame:
    """events: streaming DataFrame with EVENT_SCHEMA columns. Returns
    the first-occurrence-only stream (exactly-once per url_hash across
    the life of the query, checkpoint-durable)."""
    return (
        events.groupBy("host_bucket")
        .applyInPandasWithState(
            _first_seen, OUT_SCHEMA, STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_stream_dedup(spark, src_path: str, table: str,
                     checkpoint: str) -> DataFrame:
    """availableNow harness: file-stream the events directory through
    the stateful dedup into a memory sink."""
    events = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)      # several micro-batches →
        .parquet(src_path)                    # state actually carries over
    )
    q = (
        stream_first_seen(events)
        .writeStream.format("memory").queryName(table)
        .option("checkpointLocation", checkpoint)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return spark.table(table)
