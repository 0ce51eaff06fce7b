"""Bounded frequency sketches.

* :class:`SpaceSaving` — Metwally et al. 2005 top-K heavy-hitters map.
  Exact when the number of distinct keys ≤ capacity (which makes
  small-scale unit tests byte-exact); at scale it degrades gracefully
  with a tracked error bound.  Batch updates aggregate per batch with
  pandas ``value_counts`` first, so there is no per-row Python.
* :class:`BottomK` — deterministic value sample: keeps the K values with
  the smallest stable hash.  Unlike a random reservoir it is mergeable
  AND deterministic (union → keep K smallest), so partition order can
  never change the profile.  Replaces the reference's unbounded
  ``strings_seen`` evidence (/root/reference/src/infer.rs:56-57) at
  scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .hashing import hash64


class SpaceSaving:
    __slots__ = ("capacity", "counts", "errors")

    def __init__(self, capacity: int = 64):
        self.capacity = capacity
        self.counts: dict = {}
        self.errors: dict = {}

    def update_counts(self, counts: dict) -> None:
        for key, c in counts.items():
            if key in self.counts:
                self.counts[key] += c
            elif len(self.counts) < self.capacity:
                self.counts[key] = c
                self.errors[key] = 0
            else:
                # evict the current minimum, inherit its count as error
                mkey = min(self.counts, key=self.counts.get)
                mcount = self.counts.pop(mkey)
                self.errors.pop(mkey, None)
                self.counts[key] = mcount + c
                self.errors[key] = mcount

    def update(self, values: pd.Series) -> None:
        vc = values.dropna().value_counts()
        self.update_counts(vc.to_dict())

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        out = SpaceSaving(self.capacity)
        out.counts = dict(self.counts)
        out.errors = dict(self.errors)
        for key, c in other.counts.items():
            if key in out.counts:
                out.counts[key] += c
                out.errors[key] = out.errors.get(key, 0) + other.errors.get(key, 0)
            else:
                out.counts[key] = c
                out.errors[key] = other.errors.get(key, 0)
        if len(out.counts) > out.capacity:
            top = sorted(out.counts.items(), key=lambda kv: (-kv[1], str(kv[0])))
            dropped_max = max(c for _, c in top[out.capacity:])
            out.counts = dict(top[: out.capacity])
            out.errors = {k: out.errors.get(k, 0) + dropped_max for k in out.counts}
        return out

    def top(self, n: int = 10) -> list[tuple]:
        return sorted(self.counts.items(), key=lambda kv: (-kv[1], str(kv[0])))[:n]

    @property
    def is_exact(self) -> bool:
        return all(e == 0 for e in self.errors.values())


class BottomK:
    __slots__ = ("k", "hashes", "values")

    def __init__(self, k: int = 64):
        self.k = k
        self.hashes = np.empty(0, dtype=np.uint64)
        self.values: list = []

    def update(self, values: pd.Series) -> None:
        vals = values.dropna()
        if len(vals) == 0:
            return
        uniq = vals.unique()
        h = hash64(uniq)
        all_h = np.concatenate([self.hashes, h])
        all_v = self.values + list(uniq)
        self._shrink(all_h, all_v)

    def merge(self, other: "BottomK") -> "BottomK":
        out = BottomK(self.k)
        out._shrink(
            np.concatenate([self.hashes, other.hashes]), self.values + other.values
        )
        return out

    def _shrink(self, h: np.ndarray, v: list) -> None:
        # dedupe by hash, keep k smallest
        order = np.argsort(h, kind="stable")
        seen: set = set()
        keep_h, keep_v = [], []
        for i in order:
            hv = int(h[i])
            if hv in seen:
                continue
            seen.add(hv)
            keep_h.append(hv)
            keep_v.append(v[i])
            if len(keep_h) >= self.k:
                break
        self.hashes = np.array(keep_h, dtype=np.uint64)
        self.values = keep_v

    def sample(self) -> list:
        return list(self.values)
