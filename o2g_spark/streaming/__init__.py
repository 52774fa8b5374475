"""Streaming-shaped operators (SURVEY.md §2.B B16).

The north rule's "resumable from checkpoint" is batch snapshotting
(plans.checkpoint), not Structured Streaming; these operators cover the
time-windowed analytics the `events` table enables, written so the SAME
code path serves batch DataFrames and `readStream` inputs.
"""

from .windows import (  # noqa: F401
    sessionize,
    sliding_counts,
    stream_tumbling_counts,
    tumbling_agg,
)
