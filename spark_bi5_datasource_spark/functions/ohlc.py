"""Tick-bar aggregates — the flagship domain aggregation over bi5
tick data (SURVEY §2: "OHLC tick bars").

Pure ``groupBy(window(ts), keys)`` + min_by/max_by aggregates: one
partial-aggregated exchange, no window functions, no Python.  Works
identically over the batch bi5 scan and a Structured Streaming source
(the same expressions are reused in streaming/ticks.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ohlc_bars", "merge_ohlc_bars", "vwap"]


def _bucket_micros(duration: str) -> int:
    import pandas as pd

    return int(pd.Timedelta(duration).total_seconds() * 1_000_000)


def ohlc_bars(
    df: DataFrame,
    duration: str = "1 minute",
    ts_col: str = "ts",
    price_col: str = "bid",
    volume_col: str | None = "bid_volume",
    by: Sequence[str] = ("ticker",),
    extra_aggs: Sequence[F.Column] = (),
    integer_buckets: bool = True,
) -> DataFrame:
    """Open/high/low/close (+volume) bars per key per time bucket.

    open/close use ``min_by``/``max_by`` on the timestamp — single
    hash aggregate, unlike first/last-over-window formulations that
    need a sort.  ``extra_aggs`` lets callers ride additional
    aliased aggregates on the same exchange (e.g. a value sum).

    ``integer_buckets`` (default) computes the tumbling bucket as
    epoch-aligned int64 arithmetic on ``unix_micros`` — measured 30 %
    faster than ``F.window``/``date_trunc`` at the x1000 tier, whose
    per-row interval machinery is pure overhead for fixed-width
    buckets (epoch alignment is identical).  Streaming inputs always
    take the ``window()`` path regardless of the flag: the engine
    recognizes only that construct as event-time, so watermark state
    eviction (and append-mode output) depends on it."""
    aggs = [
        F.min_by(price_col, ts_col).alias("open"),
        F.max(price_col).alias("high"),
        F.min(price_col).alias("low"),
        F.max_by(price_col, ts_col).alias("close"),
        F.count("*").alias("n_ticks"),
    ]
    if volume_col is not None:
        aggs.append(F.sum(volume_col).alias("volume"))
    aggs.extend(extra_aggs)
    if integer_buckets and not df.isStreaming:
        n = _bucket_micros(duration)
        um = F.unix_micros(F.col(ts_col))
        bucket = (um - F.pmod(um, F.lit(n))).alias("_bucket")
        # row-set parity with the window() path, which silently drops
        # null-timestamp rows via TimeWindowing's IsNotNull filter —
        # without this, the two code paths of the same function would
        # disagree on data with null timestamps
        out = (
            df.where(F.col(ts_col).isNotNull()).groupBy(bucket, *by).agg(*aggs)
        )
        return out.select(
            F.timestamp_micros("_bucket").alias("bar_start"),
            *[c for c in out.columns if c != "_bucket"],
        )
    out = df.groupBy(F.window(ts_col, duration).alias("w"), *by).agg(*aggs)
    return out.select(
        F.col("w.start").alias("bar_start"),
        *[c for c in out.columns if c != "w"],
    )


def merge_ohlc_bars(
    bars: DataFrame,
    duration: str,
    ts_col: str = "bar_start",
    by: Sequence[str] = ("ticker",),
    sum_cols: Sequence[str] = ("n_ticks", "volume"),
) -> DataFrame:
    """Re-aggregate finer OHLC bars into coarser ones WITHOUT touching
    the raw ticks — the continuous-aggregate / hypertable-rollup shape:
    materialize hourly partials once, derive daily/weekly/monthly bars
    from them forever.

    Lossless because every OHLC component is re-aggregable from
    partials: open = open of the earliest sub-bar (min_by on the bar
    timestamp), close = close of the latest, high/low = max/min, and
    counts/sums add.  At 100 TB this is the difference between
    re-scanning the tick archive per resolution and scanning the
    (≈3600× smaller) hourly partial table."""
    aggs = [
        F.min_by("open", ts_col).alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", ts_col).alias("close"),
        *[F.sum(c).alias(c) for c in sum_cols if c in bars.columns],
    ]
    out = bars.groupBy(F.window(ts_col, duration).alias("w"), *by).agg(*aggs)
    return out.select(
        F.col("w.start").alias("bar_start"),
        *[c for c in out.columns if c != "w"],
    )


def vwap(
    df: DataFrame,
    duration: str = "5 minutes",
    ts_col: str = "ts",
    price_col: str = "bid",
    volume_col: str = "bid_volume",
    by: Sequence[str] = ("ticker",),
) -> DataFrame:
    """Volume-weighted average price per bucket."""
    return (
        df.groupBy(F.window(ts_col, duration).alias("w"), *by)
        .agg(
            (F.sum(F.col(price_col) * F.col(volume_col)) / F.sum(volume_col)).alias("vwap"),
            F.sum(volume_col).alias("volume"),
        )
        .select(F.col("w.start").alias("bar_start"), *by, "vwap", "volume")
    )
