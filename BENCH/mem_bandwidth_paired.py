"""Paired DRAM-bandwidth calibration (r03 companion to
cpu_ceiling_paired.py).

The L1-resident CPU probe can scale ~1.0 from 2 to 8 busy cores while a
real job scales at 0.6 on the same day: when the neighbor load is
memory-bandwidth-heavy, compute-only probes miss the contended
resource.  This probe streams a working set far beyond LLC per process
(elementwise fused multiply-add over 128 MB of float64), so its paired
2->8 per-process-time ratio bounds the scaling of any bandwidth-bound
stage (parquet decompression, Arrow transfer, PCM decode) under the
SAME-DAY neighbor load.

Run: python BENCH/mem_bandwidth_paired.py [rounds]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from multiprocessing import Pool

import numpy as np

_N = 16 * 1024 * 1024  # 128 MB of float64 per process


def _stream(reps: int) -> float:
    a = np.ones(_N)
    b = np.full(_N, 0.5)
    t0 = time.time()
    for _ in range(reps):
        np.multiply(a, 1.0000001, out=a)
        np.add(a, b, out=a)
        np.subtract(a, b, out=a)
    return time.time() - t0


def per_proc_time(procs: int, reps: int = 12) -> float:
    with Pool(procs) as p:
        res = p.map(_stream, [reps] * procs)
    return sum(res) / len(res)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    pairs = []
    for i in range(rounds):
        t2 = per_proc_time(2)
        t8 = per_proc_time(8)
        pairs.append(round(t2 / t8, 3))
        print(f"round {i + 1}: t2={t2:.3f}s t8={t8:.3f}s ratio={pairs[-1]}",
              file=sys.stderr)
    print(json.dumps({
        "paired_bandwidth_ceiling_2_to_8": pairs,
        "median": round(statistics.median(pairs), 3),
        "min": min(pairs),
        "max": max(pairs),
        "rounds": rounds,
    }))


if __name__ == "__main__":
    main()
