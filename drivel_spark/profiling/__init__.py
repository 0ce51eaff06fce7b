"""Distributed profiling: per-column mergeable accumulators, one-scan
mapInPandas seqOp, tree combine, TableProfile result object."""

from .accumulator import ProfilerOptions, TableAccumulator, make_column_acc
from .profiler import (
    TableProfile,
    partition_accumulators,
    profile,
    profile_json_column,
    tree_combine,
)

__all__ = [
    "ProfilerOptions",
    "TableAccumulator",
    "make_column_acc",
    "TableProfile",
    "partition_accumulators",
    "profile",
    "profile_json_column",
    "tree_combine",
]
