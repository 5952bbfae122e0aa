"""Pure-CPU scaling control for the sandbox box (no Spark).

Measures how the MACHINE itself scales an embarrassingly parallel
CPU-bound workload (sha256 over distinct buffers) across N worker
processes. This bounds any engine's achievable scaling efficiency on
this box: the 32 advertised cores are SMT-logical on ~16 physical
cores with a constant background load, so e.g. 2→8 workers cannot
reach 4.0x even for perfect code. Engine efficiency should be read
against this ceiling, not against an ideal 4.0x.

Usage: python tools/cpu_control.py [N ...]   (default: 1 2 4 8 16 32)
Prints one JSON line: {"workers": {N: hashes_per_sec}, "pairs":
{"NvM": efficiency}}.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import sys
import time

CHUNK = 64 * 1024
REPS = 3000


def _worker(seed: int) -> int:
    buf = bytes((seed + i) & 0xFF for i in range(CHUNK))
    n = 0
    for i in range(REPS):
        h = hashlib.sha256(buf)
        h.update(i.to_bytes(4, "big"))
        h.digest()
        n += 1
    return n


def rate(workers: int) -> float:
    with mp.Pool(workers) as pool:
        t0 = time.time()
        pool.map(_worker, range(workers))
        dt = time.time() - t0
    return workers * REPS / dt


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8, 16, 32]
    rates = {}
    for n in sorted(set(levels)):
        rates[n] = round(rate(n), 1)
    pairs = {}
    for lo in rates:
        hi = lo * 4
        if hi in rates:
            pairs[f"{lo}v{hi}"] = round(rates[hi] / (4 * rates[lo]), 3)
    print(json.dumps({"workers": rates, "pairs": pairs}))


if __name__ == "__main__":
    main()
