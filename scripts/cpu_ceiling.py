#!/usr/bin/env python
"""Measure this box's raw multiprocessing scaling ceiling.

Runs identical per-process tokenization work at 1, N, 4N processes (no
Spark, no I/O). The per-process slowdown at higher concurrency (all-core
turbo, shared memory bandwidth, hypervisor) bounds ANY engine's
achievable N->4N scaling efficiency on this machine; BENCH/BASELINE.md
cites this to normalize the engine's measured efficiency.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def work(_):
    from cuely_spark.tokenizer import tokenize

    n = 0
    for i in range(60000):
        n += len(tokenize(
            f"the quick brown fox jumps over lazy dog number {i} and more"))
    return n


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    out = {}
    for procs in (1, lo, hi):
        times = []
        for _ in range(2):
            with mp.Pool(procs) as p:
                t0 = time.time()
                p.map(work, range(procs))
                times.append(time.time() - t0)
        out[procs] = min(times)
    thr_lo = lo / out[lo]
    thr_hi = hi / out[hi]
    ceiling = thr_hi / (hi / lo * thr_lo)
    print(json.dumps({
        "per_proc_sec": out,
        "throughput_lo": round(thr_lo, 2),
        "throughput_hi": round(thr_hi, 2),
        "hardware_ceiling_efficiency": round(ceiling, 3),
    }))


if __name__ == "__main__":
    main()
