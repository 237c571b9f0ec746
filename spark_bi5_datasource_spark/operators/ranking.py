"""Parallel exact global ranking.

A window over a global ORDER BY (``row_number() OVER (ORDER BY ...)``,
``ntile(k) OVER (ORDER BY ...)``) plans as Exchange SinglePartition —
every row through one task, the canonical scale killer.  But an exact
global rank doesn't need a single partition: range-partition on the
order key, rank WITHIN each sorted partition (parallel windows), and
add per-partition offsets (a partition-count-sized list — bounded
driver state, like any broadcast).  Same numbers, no serial stage.

``ntile_expr`` reproduces SQL NTILE's bucket assignment (first
``N % k`` buckets take one extra row) from the global rank, so
exact equal-frequency binning runs fully parallel too.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["with_global_rank", "ntile_expr", "global_running_sum"]


def with_global_rank(
    df: DataFrame,
    order_cols: Sequence[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a 1-based dense global row number ordered by
    ``order_cols`` (include a unique tie-break column for a
    deterministic total order), computed with parallel partition-local
    windows + driver-side offsets instead of a single-partition
    window."""
    cols = [F.col(c) for c in order_cols]
    p = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(p, *cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    # one pass over the range-shuffled data; persisted so the count
    # job and the output job share the materialization
    parts = parts.persist()
    try:
        counts = {
            r["__pid"]: r["cnt"]
            for r in parts.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
        }
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        off = F.element_at(
            F.array(*[F.lit(offsets.get(i, 0)) for i in range(max(counts, default=0) + 1)]),
            F.col("__pid") + 1,
        )
        w = Window.partitionBy("__pid").orderBy(*cols)
        out = parts.withColumn(
            rank_col, (F.row_number().over(w) + off).cast("bigint")
        ).drop("__pid")
        # materialize before unpersist so callers get the cached lineage
        return out
    finally:
        # deferred: the persisted block lives for the session; callers
        # doing one-shot ranking can unpersist via the returned plan's
        # source. (Blocks are LRU-evicted under memory pressure.)
        pass


def global_running_sum(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    sum_col: str = "running",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach the prefix sum of ``value_col`` over the global ORDER BY
    ``order_cols`` (which must form a deterministic total order) —
    the parallel twin of ``sum(x) OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING)``, which would otherwise plan as Exchange
    SinglePartition.

    Same scheme as ``with_global_rank``: range-partition on the order
    key, partition-local running sums (parallel windows), then add
    per-partition base offsets — a partition-count-sized list of
    partial sums, bounded driver state.  The classic two-phase
    parallel prefix sum, as a DataFrame plan."""
    cols = [F.col(c) for c in order_cols]
    p = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(p, *cols)
        .withColumn("__pid", F.spark_partition_id())
    ).persist()
    totals = {
        r["__pid"]: r["s"]
        for r in parts.groupBy("__pid")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid] or 0
    off = F.element_at(
        F.array(
            *[F.lit(offsets.get(i, 0)) for i in range(max(totals, default=0) + 1)]
        ),
        F.col("__pid") + 1,
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return parts.withColumn(
        sum_col, F.sum(value_col).over(w) + off
    ).drop("__pid")


def ntile_expr(rank_col: str, n_rows: int, k: int) -> Column:
    """SQL NTILE(k) bucket (1-based) from a 1-based global rank over
    ``n_rows`` rows: the first ``n_rows % k`` buckets hold
    ``n_rows // k + 1`` rows, the rest ``n_rows // k``."""
    base, rem = divmod(n_rows, k)
    big = rem * (base + 1)  # rows covered by the larger buckets
    r = F.col(rank_col)
    if base == 0:
        return r.cast("int")  # fewer rows than buckets: bucket == rank
    return (
        F.when(r <= big, (r - 1) / (base + 1))
        .otherwise(rem + (r - big - 1) / base)
        .cast("int")
        + 1
    )
