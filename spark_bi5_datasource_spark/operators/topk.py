"""Top-k operators (SURVEY §2 Tier B3 generalized).

Global top-k is ``orderBy().limit(k)`` — Spark plans it as
TakeOrderedAndProject (per-partition heap + driver merge, no full
sort/shuffle).  Per-group top-k is the standard row_number window +
filter; one exchange on the group keys, heap-friendly via the
window's sort.  Always pass a deterministic tie-break for
reproducible results at scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["top_k", "top_k_per_group"]


def top_k(df: DataFrame, order_by: Sequence[Column | str], k: int) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (no global sort)."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_by: Sequence[str] | str,
    order_by: Sequence[Column | str],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """k best rows per group by the given ordering."""
    if isinstance(group_by, str):
        group_by = [group_by]
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)
