"""Quiet-box A/B for bench queries whose single-shot times drifted
between rounds (r04 verdict item #5: x6_date_parse 1.75→2.17 s,
x7_engagement_numbers 1.88→2.15 s, text_langid 0.93→1.18 s r3→r4 on
code paths the r4 diff never touched). Runs each named query
``--repeats`` times INTERLEAVED (whole list per pass, so background
drift spreads across queries, not repeats) on the bench's own Spark
build, and reports per-query medians + min/max spread against the
recorded r3/r4 single-shots. Medians within ±10% of r3 ⇒ the r4
upticks were box noise, as suspected.

Usage: python tools/query_ab.py [--repeats 5] [--out QUERY_AB.json]
       [--queries x6_date_parse,x7_engagement_numbers,text_langid]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# single-shot seconds recorded in BENCH_r03.json / BENCH_r04.json
RECORDED = {
    "x6_date_parse": {"r3": 1.75, "r4": 2.17},
    "x7_engagement_numbers": {"r3": 1.88, "r4": 2.15},
    "text_langid": {"r3": 0.93, "r4": 1.18},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--queries", default=",".join(RECORDED))
    ap.add_argument("--out", default="QUERY_AB.json")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    names = args.queries.split(",")

    from bench import build_spark
    import __spark_entry__ as E

    cpus = int(os.environ.get(
        "SPARK_GRAFT_CPUS", str(max(2, (os.cpu_count() or 32) // 2))))
    spark = build_spark(cpus)
    qs = E.queries()

    # one untimed warm pass (codegen + parquet footer cache), then the
    # interleaved timed passes
    for name in names:
        qs[name](spark, args.sf_dir).write.format("noop") \
            .mode("overwrite").save()

    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.repeats):
        for name in names:
            t0 = time.time()
            qs[name](spark, args.sf_dir).write.format("noop") \
                .mode("overwrite").save()
            runs[name].append(round(time.time() - t0, 3))

    report = {"repeats": args.repeats, "cpus": cpus,
              "sf_dir": args.sf_dir, "queries": {}}
    for name in names:
        med = round(statistics.median(runs[name]), 3)
        rec = RECORDED.get(name, {})
        entry = {"median": med, "min": min(runs[name]),
                 "max": max(runs[name]), "runs": runs[name], **rec}
        if "r3" in rec:
            entry["vs_r3"] = round(med / rec["r3"], 3)
            # the r4 drift was UPWARD; a quiet-box median at or below
            # r3+10% rules out a real regression (a median far BELOW
            # r3 additionally indicts the r3 single-shot as noisy-high)
            entry["regression_ruled_out"] = med <= rec["r3"] * 1.10
        report["queries"][name] = entry
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["queries"], indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
