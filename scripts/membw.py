"""Aggregate memory-bandwidth curve for this box (scaling-evidence aid).

A bandwidth-bound Spark stage cannot scale past the point where the box's
aggregate copy bandwidth saturates; this measures that point so
BENCH/BASELINE.md can separate "the plan stops scaling" from "the machine
stops scaling".

Usage: python scripts/membw.py [proc_counts ...]
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time

import numpy as np


def stream(args):
    mb, reps = args
    src = np.frombuffer(np.random.bytes(mb * 1024 * 1024), dtype=np.uint8).copy()
    dst = np.empty_like(src)
    t0 = time.perf_counter()
    for _ in range(reps):
        np.copyto(dst, src)
        src[::4096] += 1  # defeat copy elision
    return 2 * mb * reps / (time.perf_counter() - t0)  # MB/s read+write


def main():
    counts = [int(a) for a in sys.argv[1:]] or [1, 4, 8, 16, 32]
    for nproc in counts:
        with mp.Pool(nproc) as p:
            res = p.map(stream, [(256, 40)] * nproc)
        total = sum(res)
        print(
            f"nproc={nproc:3d}: {total / 1024:6.1f} GB/s aggregate, "
            f"{total / 1024 / nproc:5.2f} GB/s per proc"
        )


if __name__ == "__main__":
    main()
