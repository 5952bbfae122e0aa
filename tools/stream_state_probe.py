#!/usr/bin/env python
"""Streaming seen-state probe (round-4 VERDICT item 3 done-criterion):
show that the bloom+suffix state layout keeps per-micro-batch cost
bounded by BATCH size while the exact-set layout pays O(|seen|) per
touched bucket.

Protocol, per (variant, |seen|) cell:
  1. pre-seed the state with S synthetic url_hash events (one
     availableNow query — untimed; this is crawl age, not workload);
  2. append a fixed measure batch of B fresh events and run a new
     availableNow query on the same checkpoint — timed; repeat
     REPEATS times with fresh keys each (median reported; single runs
     on this box are unreadable, round-3/4 standard).

The workload (B rows) is IDENTICAL across cells; only state size
varies, so t(10S)/t(S) isolates the state-rewrite cost: ~1.0 for the
bloom layout (constant-size filter + bounded suffix), >>1 for the
exact layout (the whole per-bucket key set is deserialized, probed,
and rewritten). Writes STREAM_STATE_PROBE.json.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_BUCKETS = 8
S_SMALL = int(os.environ.get("PROBE_SEEN_SMALL", "250000"))
SCALE = 10
B_MEASURE = int(os.environ.get("PROBE_BATCH", "40000"))
REPEATS = int(os.environ.get("PROBE_REPEATS", "3"))


def synth_events(spark, start: int, n: int):
    return spark.range(start, start + n).select(
        F.substring(F.sha2(F.concat(F.lit("sp-"),
                                    F.col("id").cast("string")), 256),
                    1, 16).alias("url_hash"),
        F.concat(F.lit("https://s.example.com/"),
                 F.col("id").cast("string")).alias("url"),
        F.pmod(F.col("id"), F.lit(N_BUCKETS)).cast("int")
        .alias("host_bucket"),
        F.col("id").alias("seq"))


def run_cell(spark, variant: str, s_seen: int) -> dict:
    from web_scrapers_python_spark.streaming.dedup import (
        EVENT_SCHEMA, stream_first_seen, stream_first_seen_bloom)
    root = tempfile.mkdtemp(prefix=f"ssp-{variant}-")
    src = os.path.join(root, "events")
    ckpt = os.path.join(root, "ckpt")
    sink = os.path.join(root, "out")
    # capacity sized for the BIG cell so both cells run the same filter
    # geometry (the point is constant-size state, so make it constant)
    cap_per_bucket = (S_SMALL * SCALE) // N_BUCKETS + B_MEASURE

    def one_pass() -> dict:
        # file sink, not memory: the memory sink cannot RESUME from a
        # checkpoint, and resuming is the whole probe (state carried
        # across availableNow queries)
        events = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
        dedup = (stream_first_seen_bloom(events, capacity=cap_per_bucket,
                                         fp_rate=1e-4)
                 if variant == "bloom" else stream_first_seen(events))
        q = (dedup.writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        prog = q.lastProgress
        st = {}
        if prog and prog.get("stateOperators"):
            so = prog["stateOperators"][0]
            st = {k: so.get(k) for k in
                  ("numRowsTotal", "numRowsUpdated",
                   "stateMemory", "memoryUsedBytes") if k in so}
        return st

    try:
        synth_events(spark, 0, s_seen).coalesce(N_BUCKETS) \
            .write.mode("append").parquet(src)
        t0 = time.time()
        one_pass()                                  # pre-seed (untimed)
        t_seed = round(time.time() - t0, 3)
        runs, state = [], {}
        for rep in range(REPEATS):
            start = s_seen + rep * B_MEASURE        # fresh keys each rep
            synth_events(spark, start, B_MEASURE).coalesce(1) \
                .write.mode("append").parquet(src)
            t0 = time.time()
            state = one_pass()                      # measured
            runs.append(round(time.time() - t0, 3))
        return {"seen": s_seen, "batch": B_MEASURE, "t_seed_sec": t_seed,
                "t_batch_runs_sec": runs,
                "t_batch_median_sec": round(statistics.median(runs), 3),
                "state": state}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("stream-state-probe")
             .config("spark.sql.shuffle.partitions", str(N_BUCKETS))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEM", "8g"))
             .getOrCreate())
    out = {"protocol": {
        "n_buckets": N_BUCKETS, "seen_small": S_SMALL,
        "seen_big": S_SMALL * SCALE, "measure_batch": B_MEASURE,
        "repeats": REPEATS,
        "note": "t_batch = wall sec of one availableNow micro-batch of "
                "`batch` fresh events against pre-seeded state; median "
                "of interleaved repeats"}}
    try:
        # interleave variants and sizes so box drift spreads across
        # cells: (exact,S) (bloom,S) (exact,10S) (bloom,10S)
        for s in (S_SMALL, S_SMALL * SCALE):
            for variant in ("exact", "bloom"):
                cell = run_cell(spark, variant, s)
                out.setdefault(variant, {})[
                    "small" if s == S_SMALL else "big"] = cell
                print(f"[probe] {variant} seen={s}: "
                      f"median {cell['t_batch_median_sec']}s "
                      f"runs {cell['t_batch_runs_sec']}", file=sys.stderr)
        for variant in ("exact", "bloom"):
            v = out[variant]
            v["ratio_10x_seen"] = round(
                v["big"]["t_batch_median_sec"]
                / v["small"]["t_batch_median_sec"], 3)
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "STREAM_STATE_PROBE.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps({
            "exact_ratio_10x_seen": out["exact"]["ratio_10x_seen"],
            "bloom_ratio_10x_seen": out["bloom"]["ratio_10x_seen"],
            "detail": path}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
