from .jobs import (
    stream_dedup,
    stream_ingest,
    stream_session_windows,
    stream_tumbling_counts,
)

__all__ = [
    "stream_dedup",
    "stream_ingest",
    "stream_session_windows",
    "stream_tumbling_counts",
]
