"""Incremental view maintenance (IVM) for distributive aggregates —
apply a signed delta batch to a materialized GROUP BY view without
re-scanning the base table.

The maintained view holds per-group counters (COUNT, SUMs).  A delta
batch carries inserts (+1) and retractions (-1); because COUNT/SUM
are distributive, the new view is

    mv ⟗ aggregate(delta · sign)   (full outer on the group keys)

with counters added and groups dropped when their row count reaches
zero — the classic counting algorithm from the deferred-maintenance
literature (Gupta/Mumick), expressed as two DataFrame ops.

Scale shape: the delta aggregation shuffles O(|delta groups|) rows;
the merge join shuffles the VIEW (O(|groups|)), never the base fact
table — the whole point.  At 100 TB the view would live bucketed on
its group keys so the merge is exchange-free on the view side, and
the delta agg output (typically tiny) broadcasts.  Correctness does
not depend on delta batch order beyond the usual additive-commute
rules; retracting a row that was never inserted is the caller's
contract violation (counts would go negative — surfaced, not
silently clamped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["delta_agg_apply"]


def delta_agg_apply(
    mv: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sums: dict[str, str],
    count_col: str = "cnt",
    sign_col: str = "_sign",
) -> DataFrame:
    """Apply a signed delta to a materialized count/sum view.

    ``mv`` has columns ``keys + [count_col] + list(sums)``; ``sums``
    maps view sum-column -> source measure column.  ``delta`` has
    ``keys + measure columns + sign_col`` (+1 insert / -1 retract).
    Returns the maintained view with the same schema as ``mv``;
    groups whose maintained count is 0 disappear (and fully-retracted
    groups never present in the delta pass through untouched).
    """
    d = delta.groupBy(*keys).agg(
        F.sum(sign_col).alias("_dc"),
        *[
            F.sum(F.col(src) * F.col(sign_col)).alias(f"_d_{dst}")
            for dst, src in sums.items()
        ],
    )
    merged = mv.join(d, keys, "full_outer")
    out_cols = [
        (F.coalesce(F.col(count_col), F.lit(0)) + F.coalesce("_dc", F.lit(0)))
        .alias(count_col)
    ] + [
        (
            F.coalesce(F.col(dst), F.lit(0))
            + F.coalesce(f"_d_{dst}", F.lit(0))
        ).alias(dst)
        for dst in sums
    ]
    return (
        merged.select(*keys, *out_cols)
        .filter(F.col(count_col) != 0)
    )
