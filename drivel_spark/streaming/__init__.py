"""Structured-Streaming front-end: incremental row-constraint
validation and incremental profile (schema/stats) inference, both
with exactly-once file tracking (checkpointLocation)."""

from .cusum_stream import CUSUM_STATE_FIELDS, streaming_cusum
from .profile_stream import load_stream_profile, profile_stream
from .screen_stream import SCREEN_REPORT_SCHEMA, cumulative_screen, screen_stream
from .stateful import latest_stats, running_stats, running_stats_stream
from .validate_stream import cumulative_passfail, validate_stream
from .windows import (
    dedup_stream,
    load_windowed_stats,
    session_stats,
    windowed_stats,
    windowed_stats_stream,
)

__all__ = [
    "validate_stream",
    "cumulative_passfail",
    "profile_stream",
    "load_stream_profile",
    "running_stats",
    "streaming_cusum",
    "CUSUM_STATE_FIELDS",
    "running_stats_stream",
    "latest_stats",
    "windowed_stats",
    "windowed_stats_stream",
    "load_windowed_stats",
    "session_stats",
    "dedup_stream",
    "screen_stream",
    "cumulative_screen",
    "SCREEN_REPORT_SCHEMA",
]
