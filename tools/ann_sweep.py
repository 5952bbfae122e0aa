"""Reproducible ANN knob sweep: recall@5 and candidate fraction for the
LSH (planes/band-bits/probe-radius) and IVF (nlist/nprobe) families on
the driver testdata embeddings — pure numpy/duckdb, no Spark, exactly
the integer-quantized hash family the operators use
(operators/similarity.py), so the numbers here ARE the operators'
recall (verified against bench.run_ann_recall).

Usage: python tools/ann_sweep.py [sf_dir ...]
"""

from __future__ import annotations

import sys
from collections import defaultdict

import duckdb
import numpy as np

KNUTH = 2_654_435_761
QUANT = 1 << 20
PIVOT_MOD = 1_000_003

LSH_GRID = [(20, 5, 2), (20, 5, 1), (20, 4, 1), (16, 4, 1), (12, 4, 1),
            (12, 4, 0)]
IVF_GRID = [(16, 4), (16, 8), (16, 10), (16, 12), (32, 16)]


def load(sf_dir: str):
    df = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id").df()
    ids = df["vec_id"].to_numpy()
    V = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return ids, V


def planes_int(n: int, dim: int) -> np.ndarray:
    return np.array([[2 * ((p * dim + d) * KNUTH % 1000) - 999
                      for d in range(dim)] for p in range(n)],
                    dtype=np.int64)


def exact_topk(ids, V, qmask, k=5):
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn[qmask] @ Vn.T
    out = {}
    for i, qi in enumerate(ids[qmask]):
        s = S[i].copy()
        s[np.where(ids == qi)[0][0]] = -2
        out[qi] = set(ids[np.lexsort((ids, -s))[:k]])
    return out


def lsh_point(ids, V, qmask, exact, n_planes, bb, radius, k=5):
    P = planes_int(n_planes, V.shape[1])
    sig = ((np.floor(V * QUANT).astype(np.int64) @ P.T) >= 0).astype(np.int8)
    nb = n_planes // bb
    codes = np.zeros((len(ids), nb), dtype=np.int64)
    for b in range(nb):
        for i in range(bb):
            codes[:, b] = codes[:, b] * 2 + sig[:, b * bb + i]
    buckets = defaultdict(list)
    for idx in range(len(ids)):
        for b in range(nb):
            buckets[(b, codes[idx, b])].append(idx)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    qidx = np.where(qmask)[0]
    hits = cand_total = 0
    for qi in qidx:
        cand = set()
        for b in range(nb):
            c = codes[qi, b]
            pcs = [c]
            if radius >= 1:
                pcs += [c ^ (1 << i) for i in range(bb)]
            if radius >= 2:
                pcs += [c ^ (1 << i) ^ (1 << j)
                        for i in range(bb) for j in range(i + 1, bb)]
            for pc in pcs:
                cand.update(buckets.get((b, pc), ()))
        cand.discard(qi)
        cand_total += len(cand)
        if not cand:
            continue
        cl = np.array(sorted(cand))
        s = Vn[qi] @ Vn[cl].T
        got = set(ids[cl][np.lexsort((ids[cl], -s))[:k]])
        hits += len(got & exact[ids[qi]])
    return (hits / (len(qidx) * k),
            cand_total / (len(qidx) * len(ids)))


def ivf_point(ids, V, qmask, exact, nlist, nprobe, k=5):
    key = ((ids.astype(np.int64) % PIVOT_MOD) * KNUTH) % PIVOT_MOD
    piv = np.lexsort((ids, key))[:nlist]
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    A = Vn @ Vn[piv].T
    assign = A.argmax(axis=1)
    cells = [np.where(assign == c)[0] for c in range(nlist)]
    qidx = np.where(qmask)[0]
    hits = cand_total = 0
    for qi in qidx:
        pr = np.argsort(-A[qi], kind="stable")[:nprobe]
        cand = np.concatenate([cells[c] for c in pr])
        cand = cand[cand != qi]
        cand_total += len(cand)
        s = Vn[qi] @ Vn[cand].T
        got = set(ids[cand][np.lexsort((ids[cand], -s))[:k]])
        hits += len(got & exact[ids[qi]])
    return (hits / (len(qidx) * k),
            cand_total / (len(qidx) * len(ids)))


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    for sf_dir in dirs:
        ids, V = load(sf_dir)
        qmask = ids % 25 == 0
        exact = exact_topk(ids, V, qmask)
        print(f"== {sf_dir}: n={len(ids)} queries={int(qmask.sum())}")
        for n_planes, bb, r in LSH_GRID:
            rec, frac = lsh_point(ids, V, qmask, exact, n_planes, bb, r)
            print(f"  lsh planes={n_planes} bits={bb} radius={r}: "
                  f"recall@5={rec:.3f} cand_frac={frac:.3f}")
        for nlist, nprobe in IVF_GRID:
            rec, frac = ivf_point(ids, V, qmask, exact, nlist, nprobe)
            print(f"  ivf nlist={nlist} nprobe={nprobe}: "
                  f"recall@5={rec:.3f} cand_frac={frac:.3f}")


if __name__ == "__main__":
    main()
