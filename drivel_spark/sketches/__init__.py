"""Mergeable, bounded sketch accumulators (numpy-vectorized):
HyperLogLog distinct counts, KLL quantiles, space-saving top-K
frequency maps, deterministic bottom-k value samples."""

from .freq import BottomK, SpaceSaving
from .hashing import hash64
from .hll import HyperLogLog
from .kll import KLL
from .tdigest import TDigest

__all__ = ["HyperLogLog", "KLL", "TDigest", "SpaceSaving", "BottomK", "hash64"]
