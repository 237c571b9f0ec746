from .stateful import running_stats
from .events import (
    dedup_within_watermark,
    session_windows,
    sliding_value_sums,
    stream_stream_join,
    windowed_counts,
)

__all__ = [
    "dedup_within_watermark",
    "running_stats",
    "session_windows",
    "sliding_value_sums",
    "stream_stream_join",
    "windowed_counts",
]
