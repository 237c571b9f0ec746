"""Structured Streaming pipelines over event streams (SURVEY §2
Streaming tier).

The reference is batch-only (``ReadSupport`` is its single capability,
DS24:26-27); this module is the Spark-native extension the survey
mandates: tumbling/sliding windows, session windows, watermark-driven
late-data handling, and stateful streaming dedup — all Structured
Streaming built-ins, no custom state stores.

Each function maps a *streaming* DataFrame to a transformed streaming
DataFrame, so the same code serves any source (file stream over a
growing parquet/bi5 tree, Kafka, rate source).  Batch twins of these
aggregations live in plans/relational.py (events_daily_windows,
events_sessionize) — correctness is checked by comparing stream
output (availableNow, full replay) against the batch plan in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "windowed_counts",
    "sliding_value_sums",
    "session_windows",
    "dedup_within_watermark",
    "stream_stream_join",
    "stream_static_enrich",
]


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window count + value sum per key; late rows beyond the
    watermark are dropped (enables state cleanup at scale)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
        )
        .select(F.col("w.start").alias("window_start"), key_col, "cnt", "value_sum")
    )


def sliding_value_sums(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding windows (overlapping buckets)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "cnt",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows: activity bursts per user separated by ``gap``
    of inactivity (the streaming twin of events_sessionize)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("s"), key_col)
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_ohlc(
    events: DataFrame,
    duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    price_col: str = "value",
    by=("event_type",),
) -> DataFrame:
    """Continuously-maintained OHLC partial bars — the streaming head
    of the continuous-aggregate pipeline: this keeps an hourly partial
    table fresh, and ``functions.ohlc.merge_ohlc_bars`` derives any
    coarser resolution from the partials without touching raw events
    (losslessness proven by the events_ohlc_rollup oracle)."""
    from ..functions.ohlc import ohlc_bars

    return ohlc_bars(
        events.withWatermark(ts_col, watermark),
        duration,
        ts_col=ts_col,
        price_col=price_col,
        volume_col=None,
        by=by,
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Stateful streaming dedup with bounded state: duplicates of the
    same key within the watermark horizon are dropped; state for
    expired windows is reclaimed automatically."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: each left row matches right rows
    with the same ``key`` whose event time falls in
    ``[left_ts - horizon, left_ts]``.

    Both sides carry watermarks and the join condition bounds event
    time in BOTH directions — the two requirements that let the state
    store evict buffered rows instead of growing forever (unbounded
    stream-stream joins are rejected by Spark for append mode).  Outer
    variants emit nulls only once the watermark passes the horizon, so
    results are eventually complete."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {horizon}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    )
    return l.join(r, cond, how)


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    key: str = "event_type",
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich a stream with a (small) static
    dimension table.  The static side is pinned broadcast, so each
    micro-batch joins map-side — no state store, no watermark
    requirement (unlike stream-stream joins), and the dim is re-read
    per trigger, so slowly-changing dimensions pick up updates at
    batch boundaries.  This is the standard enrichment stage in front
    of every streaming aggregate."""
    return stream.join(F.broadcast(dim), key, how)
