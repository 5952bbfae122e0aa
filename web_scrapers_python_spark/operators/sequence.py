"""Deterministic global FIFO sequencing (SURVEY §2.6 O1, §4.2.3).

The reference frontier is a FIFO queue: seeds in file order, then
discovered links in (parent fetch order, link position) order. The
distributed equivalent needs a dense, deterministic, global sequence
for each round's newly discovered batch — NOT
``monotonically_increasing_id`` (partition-dependent) and NOT a
single-partition global window (driver-size bottleneck at 10^10).

``assign_global_seq`` is a zipWithIndex-style two-pass plan:
range-repartition by the order key, sort within partitions, count per
partition (tiny aggregate → driver), then add the broadcast partition
offsets in a mapInPandas stage. One range shuffle; no global sort on a
single task.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_global_seq(df: DataFrame, order_by: list[str], start: int = 0,
                      out_col: str = "seq",
                      num_partitions: int | None = None) -> DataFrame:
    """Add ``out_col`` = start + 0-based dense rank of the row in the
    global (order_by) ordering. order_by must be a unique composite key
    for determinism."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = (
        df.repartitionByRange(parts, *[F.col(c) for c in order_by])
        .sortWithinPartitions(*[F.col(c) for c in order_by])
        .withColumn("_pid", F.spark_partition_id())
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in ordered.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    # partition ids from repartitionByRange are ordered by range bounds,
    # so cumulative counts give each partition's global offset.
    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    schema = ordered.drop("_pid").schema.add(out_col, "long")

    def number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for b in batches:
            if len(b) == 0:
                continue
            pid = int(b["_pid"].iloc[0])
            b = b.drop(columns=["_pid"])
            b[out_col] = offsets[pid] + local + pd.RangeIndex(len(b))
            local += len(b)
            yield b

    return ordered.mapInPandas(number, schema)
