"""KLL quantile sketch (Karnin, Lang, Liberty, FOCS 2016).

Mergeable, O(k log(n/k)) space, numpy-vectorized compaction.  Used for
dur_ms / sr_hz quantiles and as the distribution snapshot that the
KS-statistic drift check compares (BASELINE.json north_star).

Levels: level i holds items each representing 2^i input items.  A
compaction sorts a level, keeps every other item (random offset), and
promotes the survivors to level i+1.  Deterministic per seed.
"""

from __future__ import annotations

import io
import pickle

import numpy as np


class KLL:
    __slots__ = ("k", "levels", "n", "_rng")

    def __init__(self, k: int = 200, seed: int = 42):
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._rng = np.random.default_rng(seed)

    # capacity of level i (geometric decay c^(H-i) * k, c = 2/3)
    def _capacity(self, level: int) -> int:
        height = len(self.levels)
        cap = int(np.ceil(self.k * (2.0 / 3.0) ** (height - 1 - level)))
        return max(cap, 2)

    def update(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.n += int(v.size)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if self.levels[i].size > self._capacity(i) + self.k:
                self._compact(i)
                i = 0  # capacities change with height; restart scan
            else:
                i += 1

    def _compact(self, i: int) -> None:
        arr = np.sort(self.levels[i])
        if arr.size < 2:
            return
        if arr.size % 2 == 1:  # odd: one unpaired item stays at level i
            leftover, arr = arr[-1:], arr[:-1]
        else:
            leftover = np.empty(0, dtype=np.float64)
        offset = int(self._rng.integers(2))
        promoted = arr[offset::2]  # one survivor per pair, now weight 2^(i+1)
        self.levels[i] = leftover
        if i + 1 >= len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])

    def merge(self, other: "KLL") -> "KLL":
        out = KLL(self.k, seed=(self.n * 2654435761 + other.n) % (2**31))
        height = max(len(self.levels), len(other.levels))
        out.levels = []
        for i in range(height):
            a = self.levels[i] if i < len(self.levels) else np.empty(0, dtype=np.float64)
            b = other.levels[i] if i < len(other.levels) else np.empty(0, dtype=np.float64)
            out.levels.append(np.concatenate([a, b]))
        out.n = self.n + other.n
        out._compress()
        return out

    def _weighted_items(self):
        items, weights = [], []
        for i, arr in enumerate(self.levels):
            if arr.size:
                items.append(arr)
                weights.append(np.full(arr.size, 1 << i, dtype=np.int64))
        if not items:
            return np.empty(0), np.empty(0, dtype=np.int64)
        it = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], w[order]

    def quantile(self, q: float) -> float:
        items, weights = self._weighted_items()
        if items.size == 0:
            return float("nan")
        cum = np.cumsum(weights)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(items[min(idx, items.size - 1)])

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    def cdf(self, points: np.ndarray) -> np.ndarray:
        """Empirical CDF at the given points (for KS drift)."""
        items, weights = self._weighted_items()
        if items.size == 0:
            return np.zeros(len(points))
        cum = np.cumsum(weights).astype(np.float64)
        idx = np.searchsorted(items, points, side="right")
        out = np.where(idx > 0, cum[np.maximum(idx - 1, 0)], 0.0)
        return out / cum[-1]

    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        pickle.dump({"k": self.k, "n": self.n, "levels": self.levels}, buf, protocol=4)
        return buf.getvalue()

    @staticmethod
    def from_bytes(b: bytes) -> "KLL":
        d = pickle.loads(b)
        out = KLL(d["k"])
        out.levels = d["levels"]
        out.n = d["n"]
        return out
