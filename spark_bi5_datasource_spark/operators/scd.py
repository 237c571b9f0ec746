"""SCD Type-2 historization: turn a keyed change log into versioned
dimension rows with validity intervals.

Given one row per (key, version-ordering) change event, emit each row
with ``valid_from`` = its ordering value, ``valid_to`` = the next
change's ordering value for that key (null while current), and an
``is_current`` flag — the standard slowly-changing-dimension build
that warehouse loads run after every CDC batch.

Scale shape: exactly one hash exchange on the key (the window
partition); the interval assignment is a single ``lead`` pass within
each key's sorted run — no self-join (the naive SQL formulation pays
an extra join of the table to itself)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_build"]


def scd2_build(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Attach ``valid_from`` / ``valid_to`` / ``is_current`` to a
    change log keyed by ``keys`` and versioned by ``order_col``.
    ``tiebreak`` columns make same-timestamp changes deterministic."""
    if not keys:
        raise ValueError("scd2_build requires at least one key column")
    order = [F.col(order_col).asc(), *(F.col(c).asc() for c in tiebreak)]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("valid_from", F.col(order_col))
        .withColumn("valid_to", F.lead(order_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull().cast("int"))
    )
