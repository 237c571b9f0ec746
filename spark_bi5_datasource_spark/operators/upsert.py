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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_upsert"]


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
