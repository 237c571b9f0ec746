"""As-of join — latest right-hand row at or before each left timestamp.

The reference's tick data model makes this the canonical tick query
("the quote in force at event time"), but neither the reference (which
delegates everything to Spark, SURVEY §2 Tier C) nor the DataFrame API
has a built-in.  This is a **composition, not a custom physical
operator** (SURVEY §2: "union + last-value window"):

    union(left, right) → window over (by, ts) → last_value(ignore nulls)

Why this shape at scale: a naive range-join (``l.ts >= r.ts`` +
row_number) explodes to |L|×|R| per key before pruning; the union plan
is one exchange on the ``by`` keys + one sort — linear in |L|+|R|,
skew handled by AQE.  Same strategy as pandas ``merge_asof`` but
distributed.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] | str = (),
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """Join each left row to the closest right row at-or-before
    (``backward``, default) or at-or-after (``forward``) its ``on``
    time, matching within ``by`` keys.

    Right value columns (everything except ``on``/``by``) are appended
    to the left row; unmatched left rows get nulls.

    ``tolerance``: optional INTERVAL string (e.g. ``'90 days'``) — a
    match older (backward) than ``on - tolerance`` is discarded.

    When multiple right rows share the winning timestamp, the one with
    the greatest xxhash64 of its value struct wins — an arbitrary but
    **deterministic** choice (stable across runs/partitionings), so
    results are reproducible even on tied tick data.
    """
    if isinstance(by, str):
        by = [by]
    by = list(by)
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward', or 'nearest'"
        )

    if direction == "nearest":
        # pandas merge_asof(direction='nearest') semantics: the global
        # minimum |left.on - right.on| is provably at one of the two
        # directional matches, so compose backward + forward passes
        # and pick per row (ties -> the EARLIER right row, matching
        # the convention of a (distance ASC, on ASC) rank).  Each pass
        # carries a duplicate of the right ``on`` value so distances
        # compare without re-joining; the cast to double is exact for
        # microsecond timestamps (spacing 2^-22 s << 1e-6 s).
        value_cols = [c for c in right.columns if c != on and c not in by]
        rb = right.select(
            *by,
            on,
            *[F.col(c).alias(f"{c}__b") for c in value_cols],
            F.col(on).alias("__bt"),
        )
        rf = right.select(
            *by,
            on,
            *[F.col(c).alias(f"{c}__f") for c in value_cols],
            F.col(on).alias("__ft"),
        )
        b = asof_join(
            left, rb, on=on, by=by, direction="backward", tolerance=tolerance
        )
        bf = asof_join(
            b, rf, on=on, by=by, direction="forward", tolerance=tolerance
        )
        td = F.col(on).cast("double")
        db = td - F.col("__bt").cast("double")
        df_ = F.col("__ft").cast("double") - td
        pick_b = F.col("__ft").isNull() | (
            F.col("__bt").isNotNull() & (db <= df_)
        )
        return bf.select(
            *left.columns,
            *[
                F.when(pick_b, F.col(f"{c}__b"))
                .otherwise(F.col(f"{c}__f"))
                .alias(c)
                for c in value_cols
            ],
        )

    value_cols = [c for c in right.columns if c != on and c not in by]
    if not value_cols:
        # The match bookkeeping rides in a struct of the right value
        # columns; with zero value columns that struct would be empty
        # (never null even for "no match yet"), silently breaking the
        # matched/unmatched distinction — and the join would return
        # nothing useful anyway.  Fail loudly instead.
        raise ValueError(
            "asof_join: right side has no value columns beyond "
            f"on={on!r} and by={by!r}; add at least one column to "
            "carry (e.g. the right timestamp itself, aliased)"
        )
    left_cols = left.columns

    # Tag and align the two sides on a common shape; right rows carry a
    # struct of their values, left rows carry their original payload.
    r = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__t"),
        F.lit(0).alias("__src"),  # right sorts before left at equal ts → inclusive match
        F.struct(*[F.col(c) for c in value_cols]).alias("__vals"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in by and c != on],
    )
    l = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__t"),
        F.lit(1).alias("__src"),
        F.lit(None).cast(r.schema["__vals"].dataType).alias("__vals"),
        *[F.col(c) for c in left_cols if c not in by and c != on],
    )
    unioned = r.unionByName(l)

    ts_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    # At equal __t the right row must be visible to the left row, so
    # right (__src=0) always sorts first; among tied right rows the
    # struct-hash order makes last() deterministic.
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_order, F.col("__src").asc(), F.xxhash64("__vals").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "__matched", F.last("__vals", ignorenulls=True).over(w)
    ).withColumn(
        "__matched_t", F.last(F.when(F.col("__src") == 0, F.col("__t")), ignorenulls=True).over(w)
    )

    out = matched.filter(F.col("__src") == 1)
    if tolerance is not None:
        bound = (
            F.col("__t") - F.expr(f"INTERVAL {tolerance}")
            if direction == "backward"
            else F.col("__t") + F.expr(f"INTERVAL {tolerance}")
        )
        in_range = (
            (F.col("__matched_t") >= bound)
            if direction == "backward"
            else (F.col("__matched_t") <= bound)
        )
        out = out.withColumn(
            "__matched", F.when(in_range, F.col("__matched"))
        )

    result = out.select(
        *[F.col(c) for c in by],
        F.col("__t").alias(on),
        *[F.col(c) for c in left_cols if c not in by and c != on],
        *[F.col("__matched")[c].alias(c) for c in value_cols],
    )
    # Restore the left column order, appending right values.
    return result.select(*left_cols, *value_cols)
