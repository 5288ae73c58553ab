from .demo import (
    read_events_stream,
    streaming_dedup,
    streaming_tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "streaming_tumbling_counts",
    "streaming_dedup",
]
