"""MERGE/upsert: apply a keyed delta to a target table in one pass.

The lakehouse ``MERGE INTO`` shape (matched → update, not-matched →
insert) expressed as a composition Catalyst can optimize instead of a
row-at-a-time writer:

    result = source ∪ (target ⟕anti source on keys)

Scale shape: the delta is normally orders of magnitude smaller than
the target, so the anti-join broadcasts the source's key set and the
target is NEVER shuffled — the whole merge is one map-side pass over
the target plus a union.  When the delta is fact-sized the same plan
degrades gracefully to a shuffled anti-join on the keys (the exact
cost floor of any keyed merge).  Compare Delta/Iceberg merge, which
adds copy-on-write file rewriting on top of this same logical plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["merge_upsert", "cdc_apply"]


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    broadcast_source: bool = True,
) -> DataFrame:
    """Upsert ``source`` rows into ``target`` on ``keys``.

    Matched target rows are replaced by their source row (update);
    unmatched source rows are appended (insert); unmatched target
    rows pass through.  Column sets must match.  ``source`` must be
    unique per key (checked lazily by the deterministic semantics of
    the anti-join, not a runtime scan — callers with multi-version
    deltas should pre-collapse with a latest-wins window).

    ``broadcast_source=True`` (default) pins the delta-sized merge
    plan: broadcast-anti-join, zero target shuffle.
    """
    if not keys:
        raise ValueError("merge_upsert requires at least one key column")
    missing = [k for k in keys if k not in target.columns or k not in source.columns]
    if missing:
        raise ValueError(f"key column(s) {missing} absent from both sides")
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"column sets differ: target {sorted(target.columns)} "
            f"vs source {sorted(source.columns)}"
        )
    src = source.select(*target.columns)  # align column order for union
    probe = F.broadcast(src) if broadcast_source else src
    kept = target.join(probe.select(*keys), on=list(keys), how="left_anti")
    return kept.unionByName(src)


def cdc_apply(
    target: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    seq_col: str = "seq",
    broadcast_changes: bool = True,
) -> DataFrame:
    """Apply a full CDC batch (inserts/updates/deletes) to ``target``.

    ``changes`` carries the target's columns plus ``op_col`` ∈
    {'I','U','D'} and a monotonically increasing ``seq_col``.  Per
    key, the LATEST change wins (seq desc, op desc as tiebreak so a
    same-seq D beats its own U deterministically): a final D removes
    the key; a final I/U replaces-or-inserts the row.  Same plan
    class as merge_upsert — one anti-join keyed by the batch's keys
    (broadcast by default) over a never-shuffled target, plus the
    collapsed batch itself; deletes cost nothing extra (they simply
    don't union back).  This is the batch twin of
    streaming/upsert_sink's foreachBatch apply."""
    if not keys:
        raise ValueError("cdc_apply requires at least one key column")
    data_cols = [c for c in target.columns]
    # same-seq tiebreak: a delete outranks its own insert/update
    # (explicit priority — 'D' < 'U' lexically, so op desc would
    # invert the intent)
    del_first = F.when(F.col(op_col) == "D", 1).otherwise(0)
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(), del_first.desc()
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    probe = F.broadcast(latest) if broadcast_changes else latest
    kept = target.join(probe.select(*keys), on=list(keys), how="left_anti")
    live = latest.filter(F.col(op_col) != "D").select(*data_cols)
    return kept.unionByName(live)
