"""Structured Streaming surface over the events table.

The reference is pure batch (SURVEY §6: no streaming operator to map), so
this package is engine-native breadth, not parity: the same event
analytics the batch catalog serves (tumbling windows, dedup, sessions)
expressed once and runnable over an unbounded file stream — plus a
custom stateful operator (sessionize_stateful) for the semantics the
built-in operators can't express incrementally.
"""

from .sink import stream_to_tablestore
from .events import (
    EVENT_SCHEMA,
    dedup_stream,
    followup_pairs,
    materialize_stream,
    read_event_stream,
    session_aggregate,
    sessionize_stateful,
    sliding_counts,
    windowed_counts,
)

__all__ = [
    "EVENT_SCHEMA",
    "dedup_stream",
    "followup_pairs",
    "materialize_stream",
    "read_event_stream",
    "session_aggregate",
    "sessionize_stateful",
    "sliding_counts",
    "windowed_counts",
    "stream_to_tablestore",
]
