from .stateful import running_stats
from .events import (
    dedup_within_watermark,
    session_windows,
    sliding_value_sums,
    stream_static_enrich,
    stream_stream_join,
    streaming_ohlc,
    windowed_counts,
)
from .bi5_stream import stream_bi5_writer
from .bucketed_sink import stream_bucketed_append_writer
from .crawl import stream_corpus_build_writer, stream_crawl_dedup_writer
from .upsert_sink import latest_per_key, stream_upsert_writer

__all__ = [
    "dedup_within_watermark",
    "latest_per_key",
    "running_stats",
    "session_windows",
    "sliding_value_sums",
    "stream_bi5_writer",
    "stream_bucketed_append_writer",
    "stream_crawl_dedup_writer",
    "stream_corpus_build_writer",
    "stream_static_enrich",
    "stream_stream_join",
    "stream_upsert_writer",
    "streaming_ohlc",
    "windowed_counts",
]
