"""Paired-interleaved hardware calibration (r03).

The one-shot BENCH/cpu_ceiling.py probe compares parallelism levels
run sequentially, so on days when the hypervisor's throttle waves are
large (r03: 2.7x wall swings between back-to-back identical runs) its
level-vs-level ratio is swamped by whichever wave each ~6s probe lands
in — observed same-day readings of the "2->8 ceiling" ranged 0.81 to
1.21.  This version applies the SAME fix the job campaign uses: the
two levels run back-to-back inside each round, the per-round ratio is
the estimate, and the median over many rounds is the headline, with
the spread published next to it.

Run: python BENCH/cpu_ceiling_paired.py [rounds]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from multiprocessing import Pool

import numpy as np


def _burn(n_iters: int) -> float:
    x = np.arange(2_000, dtype=np.float64)  # 16KB: L1-resident
    out = np.empty_like(x)
    t0 = time.time()
    for _ in range(n_iters):
        np.sin(x, out=out)
    return time.time() - t0


def per_core_time(procs: int, iters: int = 200_000) -> float:
    """~5s of sustained all-core load per process; mean busy time."""
    with Pool(procs) as p:
        res = p.map(_burn, [iters] * procs)
    return sum(res) / len(res)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    pairs = []
    for i in range(rounds):
        t2 = per_core_time(2)
        t8 = per_core_time(8)
        # efficiency ceiling for 2->8 = per-core throughput ratio: if a
        # core slows from t2 to t8 busy-seconds per unit work when 8
        # cores are busy instead of 2, no job can scale better than
        # t2/t8 between those levels
        pairs.append(round(t2 / t8, 3))
        print(f"round {i + 1}: t2={t2:.3f}s t8={t8:.3f}s ratio={pairs[-1]}",
              file=sys.stderr)
    out = {
        "paired_ceiling_2_to_8": pairs,
        "median": round(statistics.median(pairs), 3),
        "min": min(pairs),
        "max": max(pairs),
        "rounds": rounds,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
