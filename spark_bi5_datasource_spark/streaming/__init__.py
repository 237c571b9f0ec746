from .stateful import running_stats
from .events import (
    dedup_within_watermark,
    session_windows,
    sliding_value_sums,
    windowed_counts,
)

__all__ = [
    "dedup_within_watermark",
    "running_stats",
    "session_windows",
    "sliding_value_sums",
    "windowed_counts",
]
