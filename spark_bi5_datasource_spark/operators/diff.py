"""Table diff / reconciliation — classify every key as added,
removed, or changed between two snapshots of a keyed table (the
migration-validation tool: "did the rewrite produce the same rows?").

One full outer join on the key columns; change detection is direct
null-safe column comparison (``<=>``), so no hashing scheme has to be
reproduced cross-engine and NULL-vs-NULL compares equal.  Unchanged
keys are dropped before anything else happens to them, so the output
is proportional to the DELTA, not the table.

Scale shape: one co-partitioned join on the key — with both
snapshots bucketed on the key (the layout contract) it runs
exchange-free; the comparison itself is a codegen projection.  For
wide tables at 100 TB, pass a narrowed ``compare`` list (or a
precomputed digest column) to keep the shuffle rows slim.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["table_diff"]


def table_diff(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    compare: list[str] | None = None,
) -> DataFrame:
    """Diff snapshot ``b`` against baseline ``a``.

    Returns ``keys + [status]`` with status ``added`` (key only in
    ``b``), ``removed`` (only in ``a``), or ``changed`` (present in
    both, any compared column differs under null-safe equality).
    Unchanged keys are omitted.  ``compare`` defaults to all shared
    non-key columns.
    """
    if compare is None:
        compare = [c for c in a.columns if c in set(b.columns) and c not in keys]
    la = a.select(
        *[F.col(k).alias(f"_ka_{k}") for k in keys],
        *[F.col(c).alias(f"_a_{c}") for c in compare],
    )
    lb = b.select(
        *[F.col(k).alias(f"_kb_{k}") for k in keys],
        *[F.col(c).alias(f"_b_{c}") for c in compare],
    )
    cond = reduce(
        lambda x, y: x & y,
        [F.col(f"_ka_{k}") == F.col(f"_kb_{k}") for k in keys],
    )
    j = la.join(lb, cond, "full_outer")
    in_a = F.col(f"_ka_{keys[0]}").isNotNull()
    in_b = F.col(f"_kb_{keys[0]}").isNotNull()
    same = (
        reduce(
            lambda x, y: x & y,
            [F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}")) for c in compare],
        )
        if compare
        else F.lit(True)
    )
    status = (
        F.when(~in_a, F.lit("added"))
        .when(~in_b, F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"_ka_{k}"), F.col(f"_kb_{k}")).alias(k)
                for k in keys
            ],
            "status",
        )
    )
