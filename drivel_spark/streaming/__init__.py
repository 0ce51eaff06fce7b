"""Structured-Streaming front-end: incremental row-constraint
validation with exactly-once file tracking (checkpointLocation)."""

from .validate_stream import cumulative_passfail, validate_stream

__all__ = ["validate_stream", "cumulative_passfail"]
