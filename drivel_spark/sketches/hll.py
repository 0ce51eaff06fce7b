"""HyperLogLog distinct-count sketch (Flajolet et al. 2007, with the
small-range correction from the original paper and the bias-free
estimator regime switches used by practical implementations).

Mergeable (elementwise register max), O(2^p) bytes, numpy-vectorized
batch updates — the distributed analog of the reference's unbounded
exact distinct set (/root/reference/src/infer.rs:264-269), which cannot
survive 10^12 rows (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np

from .hashing import hash64


class HyperLogLog:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def update_hashes(self, h: np.ndarray) -> None:
        if h.size == 0:
            return
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of remaining 64-p bits + 1
        # compute via bit_length of the top bits
        lz = np.uint64(64) - _bit_length_u64(rest)
        rank = (lz + np.uint64(1)).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def update(self, values) -> None:
        self.update_hashes(hash64(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        regs = self.registers.astype(np.float64)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        raw = alpha * m * m / np.sum(np.exp2(-regs))
        zeros = float(np.count_nonzero(self.registers == 0))
        if raw <= 2.5 * m and zeros > 0:
            return m * np.log(m / zeros)  # linear counting, small range
        if raw > (1 << 32) / 30.0:
            return -(2.0**64) * np.log1p(-raw / 2.0**64)
        return float(raw)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @staticmethod
    def from_bytes(b: bytes) -> "HyperLogLog":
        p = b[0]
        return HyperLogLog(p, np.frombuffer(b[1:], dtype=np.uint8).copy())


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (position of highest set bit)."""
    hi = (x >> np.uint64(32)).astype(np.uint32)
    lo = x.astype(np.uint32)  # truncates to low 32
    hi_f = np.where(hi != 0, hi, 1).astype(np.float64)
    lo_f = np.where(lo != 0, lo, 1).astype(np.float64)
    bl_hi = np.where(hi != 0, np.floor(np.log2(hi_f)).astype(np.uint64) + 1, 0).astype(np.uint64)
    bl_lo = np.where(lo != 0, np.floor(np.log2(lo_f)).astype(np.uint64) + 1, 0).astype(np.uint64)
    return np.where(hi != 0, bl_hi + np.uint64(32), bl_lo).astype(np.uint64)
