"""Standalone runner for the O(delta) probes (bench.py pending/state).

Usage: python tools/probe_once.py [pending|state|both] [repeats]

Runs the same interleaved-median protocol bench.py uses, outside the
bench budget, so a probe change can be measured without paying for the
whole bench. Prints the probe dict as JSON.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "pending"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get(
        "SPARK_GRAFT_CPUS", str(max(2, (os.cpu_count() or 32) // 2))))
    spark = bench.build_spark(cpus)
    try:
        out = {}
        if which in ("pending", "both"):
            out["pending_probe"] = bench.run_pending_probe(spark, repeats=repeats)
        if which in ("state", "both"):
            out["state_probe"] = bench.run_state_probe(spark, repeats=repeats)
        print(json.dumps(out, indent=1))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
