"""t-digest quantile sketch (Dunning & Ertl, "Computing extremely
accurate quantiles using t-digests", the MERGING-digest variant).

Mergeable, O(delta) space, deterministic — no RNG: buffered points are
sorted and greedily merged under the k1 scale-function size bound, so
the same inputs in the same order reproduce bit-identically.  Like any
merging digest, different partitionings give results that agree only
within the approximation bound (KLL has the same property).

Complements KLL (BASELINE.json north_star: "KLL/t-digest quantile
sketches over dur_ms and sr_hz"): KLL's rank error is uniform in q,
while the t-digest concentrates accuracy at the tails (centroid size
bound ∝ q(1-q)) — the right tool for p99-style duration checks.
Enable in the profiler with ProfilerOptions(tdigest_delta=...).
"""

from __future__ import annotations

import pickle

import numpy as np


class TDigest:
    __slots__ = ("delta", "means", "weights", "n", "_buf")

    #: flush the raw-value buffer into centroids at this size
    BUF = 2048

    def __init__(self, delta: int = 200):
        self.delta = int(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.n = 0
        self._buf: list[np.ndarray] = []

    # ------------------------------------------------------------------
    def _k(self, q: float) -> float:
        """k1 scale function: k(q) = δ/(2π)·asin(2q−1)."""
        return self.delta / (2.0 * np.pi) * float(np.arcsin(2.0 * min(max(q, 0.0), 1.0) - 1.0))

    def update(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.n += int(v.size)
        self._buf.append(v)
        if sum(x.size for x in self._buf) >= self.BUF:
            self._flush()

    def _flush(self) -> None:
        if not self._buf:
            return
        m = np.concatenate([self.means] + self._buf)
        w = np.concatenate(
            [self.weights] + [np.ones(x.size, dtype=np.float64) for x in self._buf]
        )
        self._buf = []
        self.means, self.weights = self._compress(m, w)

    def _compress(self, m: np.ndarray, w: np.ndarray):
        order = np.argsort(m, kind="stable")
        m, w = m[order], w[order]
        total = float(w.sum())
        if total == 0.0:
            return np.empty(0), np.empty(0)
        out_m: list[float] = []
        out_w: list[float] = []
        cur_m, cur_w = float(m[0]), float(w[0])
        q_left = 0.0  # cumulative weight strictly before the current centroid
        k_left = self._k(0.0)
        for i in range(1, m.size):
            wi = float(w[i])
            q_right = (q_left + cur_w + wi) / total
            if self._k(q_right) - k_left <= 1.0:
                cur_m += (float(m[i]) - cur_m) * (wi / (cur_w + wi))
                cur_w += wi
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                q_left += cur_w
                k_left = self._k(q_left / total)
                cur_m, cur_w = float(m[i]), wi
        out_m.append(cur_m)
        out_w.append(cur_w)
        return np.asarray(out_m), np.asarray(out_w)

    # ------------------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        self._flush()
        other._flush()
        out = TDigest(delta=max(self.delta, other.delta))
        out.n = self.n + other.n
        m = np.concatenate([self.means, other.means])
        w = np.concatenate([self.weights, other.weights])
        if m.size:
            out.means, out.weights = out._compress(m, w)
        return out

    # ------------------------------------------------------------------
    def quantile(self, q: float) -> float:
        """Value at rank q, interpolating between centroid centers."""
        self._flush()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = min(max(q, 0.0), 1.0) * float(self.weights.sum())
        return float(np.interp(target, cum, self.means))

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    def cdf(self, points) -> np.ndarray:
        """Approximate P(X <= x) per point (for KS-style comparisons)."""
        self._flush()
        pts = np.asarray(points, dtype=np.float64)
        if self.means.size == 0:
            return np.full(pts.shape, np.nan)
        cum = np.cumsum(self.weights) - self.weights / 2.0
        total = float(self.weights.sum())
        return np.interp(pts, self.means, cum / total, left=0.0, right=1.0)

    # ------------------------------------------------------------------
    def to_bytes(self) -> bytes:
        self._flush()
        return pickle.dumps(
            {"delta": self.delta, "means": self.means, "weights": self.weights, "n": self.n},
            protocol=4,
        )

    @staticmethod
    def from_bytes(b: bytes) -> "TDigest":
        d = pickle.loads(b)
        td = TDigest(delta=d["delta"])
        td.means, td.weights, td.n = d["means"], d["weights"], d["n"]
        return td
