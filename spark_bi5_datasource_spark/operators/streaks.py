"""Gaps-and-islands consecutive-day streak detection.

The classic sessionize-by-calendar-day analytic: distinct active days
per key, island id = epoch_day − row_number() (constant within a run
of consecutive days), then one count per island and a rollup per key.

Scale shape: the distinct, the window, and both aggregations are all
keyed by the entity column — one hash partitioning carries the whole
plan; no global window, no single-partition exchange.  Reference
parity note: the reference (spark-2.4/src/main/scala/be/salvania/
BI5DataSource.scala) is a scan connector; this is beyond-reference
query surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["user_streaks"]

_EPOCH = "1970-01-01"


def user_streaks(
    df: DataFrame, key_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Per-key longest run of consecutive active days.

    Returns one row per key: ``max_streak`` (longest consecutive-day
    run), ``n_streaks`` (number of maximal runs), ``active_days``
    (distinct active days).  Null timestamps are ignored.
    """
    d = (
        df.filter(F.col(ts_col).isNotNull())
        .select(key_col, F.col(ts_col).cast("date").alias("__day"))
        .distinct()
    )
    w = Window.partitionBy(key_col).orderBy("__day")
    g = d.select(
        key_col,
        (
            F.datediff("__day", F.lit(_EPOCH).cast("date"))
            - F.row_number().over(w)
        ).alias("__grp"),
    )
    s = g.groupBy(key_col, "__grp").agg(
        F.count("*").cast("bigint").alias("__len")
    )
    return s.groupBy(key_col).agg(
        F.max("__len").cast("bigint").alias("max_streak"),
        F.count("*").cast("bigint").alias("n_streaks"),
        F.sum("__len").cast("bigint").alias("active_days"),
    )
