"""Time-series regularization: dense time grids and gap filling.

The hypertable-style continuous aggregate (functions/ohlc.py,
events_ohlc_rollup) answers "aggregate what happened"; this module
answers the complementary "materialize the slots where NOTHING
happened" — the prerequisite for forecasting windows, SLA gap
audits, and any model that consumes a regular time grid.

Spark-first shape: the grid is generated with ``sequence()`` per key
(one row per key → explode, no driver loop), densified via a right
join onto the observed buckets, and gaps are forward-filled with
``last(value, ignorenulls=True)`` over an unbounded-preceding window
— all Catalyst operators, no UDF.

Scale note: the window partitions by series key, so state per task is
one series' grid (bounded by time range / bucket width, not by input
rows).  Series count provides the parallelism — the classic
wide-and-short layout of telemetry at fleet scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["gap_fill", "gap_fill_linear"]


def _dense_grid(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket: str,
    agg: str,
) -> DataFrame:
    """Shared grid machinery: bucket + aggregate observations, then
    left-join them onto the full [min, max] per-key grid.  Returns
    ``_k, _t, _obs`` (``_obs`` NULL on gap slots)."""
    bucketed = (
        df.select(
            F.col(key_col).alias("_k"),
            F.window(F.col(ts_col), bucket).start.alias("_t"),
            F.col(value_col).alias("_v"),
        )
        .groupBy("_k", "_t")
        .agg(F.expr(f"{agg}(_v)").alias("_obs"))
    )

    # one global [min, max] grid (sequence per key, exploded) — the
    # min/max agg is a single tiny row, joined as a literal-ish
    # broadcast onto the key list
    bounds = bucketed.agg(
        F.min("_t").alias("_lo"), F.max("_t").alias("_hi")
    )
    keys = bucketed.select("_k").distinct()
    grid = keys.crossJoin(F.broadcast(bounds)).select(
        "_k",
        F.explode(
            F.sequence("_lo", "_hi", F.expr(f"INTERVAL {bucket}"))
        ).alias("_t"),
    )
    return grid.join(bucketed, ["_k", "_t"], "left")


def gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket: str = "1 hour",
    agg: str = "avg",
) -> DataFrame:
    """Bucket ``ts_col`` per ``key_col``, densify to the full
    [min, max] grid of the whole frame, and forward-fill missing
    buckets with the last observed aggregate.

    Returns ``{key}, bucket_ts, value (forward-filled), is_gap``.
    Leading buckets before a key's first observation stay NULL (there
    is nothing to carry forward) with ``is_gap = true``.
    """
    dense = _dense_grid(df, key_col, ts_col, value_col, bucket, agg)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dense.withColumn("is_gap", F.col("_obs").isNull())
        .withColumn("value", F.last("_obs", ignorenulls=True).over(w))
        .select(
            F.col("_k").alias(key_col),
            F.col("_t").alias("bucket_ts"),
            "value",
            "is_gap",
        )
    )


def gap_fill_linear(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket: str = "1 hour",
    agg: str = "avg",
) -> DataFrame:
    """Like :func:`gap_fill` but interior gaps are *linearly
    interpolated* between the surrounding observations (time-weighted,
    exact µs arithmetic); boundary gaps — before the first or after
    the last observation of a key — stay NULL (strict interpolation
    never extrapolates).

    Two window passes (last-non-null looking back, first-non-null
    looking forward) carry ``(t, v)`` structs, so state per task is
    one struct per direction regardless of gap length.
    """
    dense = _dense_grid(df, key_col, ts_col, value_col, bucket, agg)
    obs_pt = F.when(
        F.col("_obs").isNotNull(),
        F.struct(F.col("_t").alias("t"), F.col("_obs").alias("v")),
    )
    wb = (
        Window.partitionBy("_k")
        .orderBy("_t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("_k")
        .orderBy("_t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev, nxt = F.col("_prev"), F.col("_next")
    frac = (
        F.unix_micros(F.col("_t")) - F.unix_micros(prev["t"])
    ) / (F.unix_micros(nxt["t"]) - F.unix_micros(prev["t"]))
    interpolated = (
        F.when(F.col("_obs").isNotNull(), F.col("_obs"))
        .when(
            prev.isNotNull() & nxt.isNotNull(),
            prev["v"] + (nxt["v"] - prev["v"]) * frac,
        )
    )
    return (
        dense.withColumn("_prev", F.last(obs_pt, ignorenulls=True).over(wb))
        .withColumn("_next", F.first(obs_pt, ignorenulls=True).over(wf))
        .select(
            F.col("_k").alias(key_col),
            F.col("_t").alias("bucket_ts"),
            interpolated.alias("value"),
            F.col("_obs").isNull().alias("is_gap"),
        )
    )
