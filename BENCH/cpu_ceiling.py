"""Hardware calibration: per-core throughput vs busy-core count.

This VM throttles aggregate CPU: a fixed, L1-cache-resident, zero-IO
numpy workload per process slows down as more cores go busy.  The
measured ratio per_core(N) / per_core(4N) is the HARD CEILING on the
throughput scaling efficiency any job — ours or anyone's — can show
between local[N] and local[4N] on this box.  It motivates the choice
of N=2 → 4N=8 as the primary scaling pair in BENCH/BASELINE.md.

Run: python BENCH/cpu_ceiling.py
"""

from __future__ import annotations

import json
import time

import numpy as np
from multiprocessing import Pool


def _burn(n_iters: int) -> float:
    x = np.arange(2_000, dtype=np.float64)  # 16KB: L1-resident
    out = np.empty_like(x)
    t0 = time.time()
    for _ in range(n_iters):
        np.sin(x, out=out)
    return time.time() - t0


def per_core_time(procs: int, iters: int = 120_000, trials: int = 2) -> float:
    """~3s of sustained load per process.

    Sustained (not burst) duration matters: short bursts slip through
    the hypervisor's throttling window and overestimate the ceiling —
    measured 8->32 burst ceiling 0.97 vs sustained per-core times that
    show the box saturating near 8-16 effective cores.
    """
    best = float("inf")
    for _ in range(trials):
        with Pool(procs) as p:
            res = p.map(_burn, [iters] * procs)
        best = min(best, sum(res) / len(res))
    return best


def main() -> None:
    levels = [1, 2, 4, 8, 16, 32]
    t = {k: round(per_core_time(k), 4) for k in levels}
    ceilings = {
        f"{n}->{4*n}": round(t[n] / t[4 * n], 3)
        for n in (1, 2, 4, 8)
    }
    print(json.dumps({"per_core_busy_time_s": t, "efficiency_ceiling": ceilings}))


if __name__ == "__main__":
    main()
