"""ANN crossover measurement (round-4 VERDICT item 2): where does an
index path start beating exact brute-force wall-time at recall >= 0.8?

BASELINE.md's structural claim — at 2k vectors exact search is ONE
broadcast cross-join stage while any index path pays >= 5 stages of
fixed cost, so the index's candidate-generation shape only wins at
scale — is testable in this sandbox. This tool synthesizes clustered
embedding corpora at 100k and 1M vectors (deterministic splitmix64,
no RNG state — same pure-function-of-(seed,i) recipe as
sources/datagen.py), then times brute_topk vs lsh_topk vs ivf_topk on
the SAME queries, interleaved repeats, medians reported. Recall@k for
the index paths is measured against the brute result (exact by
construction). Planted structure matters: near-duplicate web text and
embedding corpora cluster; the round-3 sweep showed structure-FREE
random vectors force 50-83%% candidate fractions for recall 0.8,
bounding any index win — that is a property of the data, not the
operators.

Writes ANN_SCALE.json. Usage:
    python tools/ann_scale.py [--sizes 100000,1000000] [--repeats 3]
~10-15 min at the default sizes on local[16].
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
N_CLUSTERS = 64
NOISE = 0.3           # E[||noise||] ~ NOISE vs unit centers -> in-cluster
                      # cosine ~ 0.92, the near-dup regime
N_QUERIES = 200
K = 5
MASK = np.uint64(0xFFFFFFFFFFFFFFFF)
CACHE = "/tmp/spark_graft_ann_scale"


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based uniform hash: deterministic for any partitioning
    (no RNG stream to seed per batch)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & MASK
    z = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9) & MASK
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB) & MASK
    return z ^ (z >> np.uint64(31))


def _uniform(counters: np.ndarray) -> np.ndarray:
    """splitmix64 -> [-1, 1)."""
    return (_splitmix64(counters) >> np.uint64(11)).astype(np.float64) \
        / float(1 << 53) * 2.0 - 1.0


def centers(seed: int, n_clusters: int = N_CLUSTERS,
            dim: int = DIM) -> np.ndarray:
    grid = (np.arange(n_clusters, dtype=np.uint64)[:, None]
            * np.uint64(dim)
            + np.arange(dim, dtype=np.uint64)[None, :]
            + (np.uint64(seed) << np.uint64(33)))
    C = _uniform(grid)
    return C / np.linalg.norm(C, axis=1, keepdims=True)


def gen_vectors(spark, n: int, seed: int = 42, dim: int = DIM,
                n_clusters: int = N_CLUSTERS, noise: float = NOISE):
    """(vec_id long, embedding array<float>): vec = unit cluster
    center (vec_id %% n_clusters) + noise with E[norm]=``noise``.
    Pure function of (seed, vec_id) — stable across partitionings."""
    C = centers(seed, n_clusters, dim)
    scale = noise / np.sqrt(dim / 3.0)   # Var U[-1,1) = 1/3

    def gen(batches):
        import pandas as pd
        for b in batches:
            ids = b["id"].to_numpy().astype(np.uint64)
            grid = (ids[:, None] * np.uint64(dim)
                    + np.arange(dim, dtype=np.uint64)[None, :]
                    + (np.uint64(seed) << np.uint64(32)))
            vec = C[(ids % np.uint64(n_clusters)).astype(np.int64)] \
                + scale * _uniform(grid)
            yield pd.DataFrame({
                "vec_id": ids.astype(np.int64),
                "embedding": list(vec.astype(np.float32)),
            })

    return spark.range(n).mapInPandas(
        gen, "vec_id long, embedding array<float>")


def materialize(spark, n: int, seed: int = 42) -> str:
    """Parquet-cache the corpus so scans (not generation) are what the
    timed paths read — same discipline as bench.cached_pages."""
    path = os.path.join(CACHE, f"n{n}-s{seed}-d{DIM}-c{N_CLUSTERS}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        gen_vectors(spark, n, seed).write.mode("overwrite").parquet(path)
    return path


def recall_at_k(got: dict, truth: dict) -> float:
    hits = sum(len(got.get(q, set()) & nb) for q, nb in truth.items())
    return hits / (len(truth) * K)


def topk_sets(rows) -> dict:
    out: dict = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def run_size(spark, n: int, repeats: int, lsh_radius: int,
             nlist: int, nprobe: int) -> dict:
    from pyspark.sql import functions as F

    from web_scrapers_python_spark.operators.similarity import (
        brute_topk, ivf_topk, lsh_topk)

    corpus = spark.read.parquet(materialize(spark, n))
    stride = n // N_QUERIES
    queries = corpus.where(F.col("vec_id") % stride == 0) \
                    .where(F.col("vec_id") < stride * N_QUERIES)
    paths = {
        "brute": lambda: brute_topk(queries, corpus, k=K),
        "lsh": lambda: lsh_topk(queries, corpus, DIM, k=K,
                                probe_radius=lsh_radius),
        "ivf": lambda: ivf_topk(queries, corpus, DIM, k=K,
                                nlist=nlist, nprobe=nprobe),
    }
    rows: dict = {}
    times: dict = {name: [] for name in paths}
    for name, mk in paths.items():          # warm-up + result capture
        rows[name] = mk().collect()
    for _ in range(repeats):                # interleaved timed repeats
        for name, mk in paths.items():
            t0 = time.time()
            mk().collect()
            times[name].append(round(time.time() - t0, 3))
    truth = topk_sets(rows["brute"])
    med = {name: round(statistics.median(ts), 3)
           for name, ts in times.items()}
    out = {
        "n_vectors": n, "n_queries": N_QUERIES, "k": K, "dim": DIM,
        "n_clusters": N_CLUSTERS, "noise": NOISE,
        "knobs": {"lsh_probe_radius": lsh_radius,
                  "ivf_nlist": nlist, "ivf_nprobe": nprobe},
        "runs_sec": times,
        "median_sec": med,
        "recall_at_5": {
            "brute": 1.0,
            "lsh": round(recall_at_k(topk_sets(rows["lsh"]), truth), 4),
            "ivf": round(recall_at_k(topk_sets(rows["ivf"]), truth), 4),
        },
        "speedup_vs_brute": {
            "lsh": round(med["brute"] / med["lsh"], 3),
            "ivf": round(med["brute"] / med["ivf"], 3),
        },
    }
    print(f"[ann_scale] n={n}: {json.dumps(out['median_sec'])} "
          f"recall={json.dumps(out['recall_at_5'])}", file=sys.stderr)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="100000,1000000")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--lsh-radius", type=int, default=1)
    ap.add_argument("--nlist", type=int, default=32)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get(
                        "SPARK_GRAFT_CPUS",
                        str(max(2, (os.cpu_count() or 32) // 2)))))
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    import bench
    spark = bench.build_spark(args.cpus)
    try:
        results = [run_size(spark, n, args.repeats, args.lsh_radius,
                            args.nlist, args.nprobe) for n in sizes]
    finally:
        spark.stop()

    big = results[-1]
    out = {
        "protocol": {
            "corpus": "planted-cluster synthetic (splitmix64, "
                      "deterministic): unit centers + noise, "
                      "in-cluster cosine ~0.92",
            "timing": "interleaved repeats x%d per size, medians; "
                      "brute result is the recall ground truth"
                      % args.repeats,
            "cpus": args.cpus,
        },
        "sizes": results,
        "crossover": {
            "criterion": "index faster than brute at recall >= 0.8",
            "lsh_wins_at_largest":
                big["speedup_vs_brute"]["lsh"] > 1.0
                and big["recall_at_5"]["lsh"] >= 0.8,
            "ivf_wins_at_largest":
                big["speedup_vs_brute"]["ivf"] > 1.0
                and big["recall_at_5"]["ivf"] >= 0.8,
        },
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ANN_SCALE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["crossover"]))
    print(f"[ann_scale] -> {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
