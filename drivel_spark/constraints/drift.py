"""Distribution-drift statistics between two profiles.

KS statistic from two KLL sketch CDFs (evaluated on the union of their
retained items) and PSI from either categorical frequency maps or
baseline-decile numeric buckets.  Both run driver-side over O(KB)
sketches — the data itself is never rescanned, which is the point at
10^12 rows: drift is a profile-vs-profile comparison, not a data pass
(BASELINE.json north_star: "KS-statistic and PSI against a baseline
profile").
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np

from ..sketches import KLL, SpaceSaving

PSI_EPS = 1e-6


def ks_statistic(a: KLL, b: KLL) -> float:
    """sup_x |F_a(x) − F_b(x)| over the union of sketch support points."""
    pts_a, _ = a._weighted_items()
    pts_b, _ = b._weighted_items()
    pts = np.unique(np.concatenate([pts_a, pts_b]))
    if pts.size == 0:
        return 0.0
    return float(np.max(np.abs(a.cdf(pts) - b.cdf(pts))))


def psi_categorical(base: SpaceSaving, batch: SpaceSaving) -> float:
    """Population Stability Index over the union of tracked keys; counts
    outside the tracked top-K pool into an OTHER bucket."""
    tot_a = sum(base.counts.values())
    tot_b = sum(batch.counts.values())
    if tot_a == 0 or tot_b == 0:
        return 0.0
    keys = set(base.counts) | set(batch.counts)
    psi = 0.0
    other_a, other_b = tot_a, tot_b
    for k in keys:
        pa = base.counts.get(k, 0) / tot_a
        pb = batch.counts.get(k, 0) / tot_b
        other_a -= base.counts.get(k, 0)
        other_b -= batch.counts.get(k, 0)
        pa, pb = max(pa, PSI_EPS), max(pb, PSI_EPS)
        psi += (pb - pa) * math.log(pb / pa)
    pa = max(other_a / tot_a, PSI_EPS)
    pb = max(other_b / tot_b, PSI_EPS)
    psi += (pb - pa) * math.log(pb / pa)
    return float(psi)


def psi_numeric(base: KLL, batch: KLL, n_buckets: int = 10) -> float:
    """PSI over baseline-decile buckets (standard scorecard formulation)."""
    if base.n == 0 or batch.n == 0:
        return 0.0
    edges = np.unique([base.quantile(q) for q in np.linspace(0, 1, n_buckets + 1)[1:-1]])
    if edges.size == 0:
        return 0.0
    cdf_a = np.concatenate([base.cdf(edges), [1.0]])
    cdf_b = np.concatenate([batch.cdf(edges), [1.0]])
    pa = np.diff(np.concatenate([[0.0], cdf_a]))
    pb = np.diff(np.concatenate([[0.0], cdf_b]))
    pa = np.maximum(pa, PSI_EPS)
    pb = np.maximum(pb, PSI_EPS)
    return float(np.sum((pb - pa) * np.log(pb / pa)))


def drift_column(base_acc, batch_acc) -> dict[str, Any]:
    """Drift metrics for one column given its two accumulators."""
    out: dict[str, Any] = {"column": base_acc.name}
    if base_acc.kind == "numeric" and batch_acc.kind == "numeric":
        out["ks"] = ks_statistic(base_acc.kll, batch_acc.kll)
        out["psi"] = psi_numeric(base_acc.kll, batch_acc.kll)
    elif base_acc.kind == "string" and batch_acc.kind == "string":
        out["psi"] = psi_categorical(base_acc.freq, batch_acc.freq)
        out["ks"] = None
    else:
        out["ks"] = out["psi"] = None
    return out


def drift_report(baseline_profile, batch_profile, columns=None) -> list[dict[str, Any]]:
    cols = columns or [
        c for c in baseline_profile.columns() if c in set(batch_profile.columns())
    ]
    return [
        drift_column(baseline_profile.column(c), batch_profile.column(c)) for c in cols
    ]
