"""Heavy hitters at scale: Misra-Gries candidate sketch + exact
recount — top-k frequent values WITHOUT shuffling the full key
universe.

The exact formulation (groupBy(value).count() → top-k) shuffles one
record per DISTINCT value; at corpus scale the token/url/entity
universe is billions of keys and the shuffle dwarfs the answer.  The
classic cure (Misra-Gries '82; the "summary then verify" shape
SpaceSaving/CMS engines use — public literature) is:

1. **Sketch pass**: each partition maintains a width-w Misra-Gries
   summary (at most w counters) over its local stream via
   ``mapInPandas`` (one pandas ``value_counts`` per Arrow batch —
   vectorized, not per-row).  The MG guarantee: any value with local
   frequency > local_n/w survives in the summary; undercounts are
   bounded by local_n/w.
2. **Candidate union**: the per-partition summaries (≤ w·partitions
   tiny rows) are unioned and reduced to a candidate set.  Any value
   with GLOBAL frequency > n/w must appear in at least one partition
   summary (if it beats the threshold globally, it beats it in some
   partition), so the union is a superset of every global
   heavy hitter at that threshold.
3. **Exact recount**: one more scan counts ONLY the candidates
   (broadcast semi-join — no full-universe shuffle), giving exact
   counts for the final top-k.

The result equals the exact top-k whenever the k-th frequency
exceeds n/w — choose w ≥ k·(skew headroom); the pytest oracle sweeps
widths and pins equality, and the catalog query's driver oracle is
the EXACT SQL, so a hash match certifies the sketch lost nothing on
the fixture distribution.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["top_k_sketch"]


def _mg_merge(counts: dict, pdf_counts: pd.Series, width: int) -> None:
    """Fold one batch's value counts into a Misra-Gries summary."""
    for val, cnt in pdf_counts.items():
        if val in counts:
            counts[val] += cnt
        else:
            counts[val] = cnt
            if len(counts) > width:
                # decrement-all step, batched: subtract the smallest
                # counter value from everyone and evict zeros
                dec = min(counts.values())
                for v in list(counts):
                    counts[v] -= dec
                    if counts[v] <= 0:
                        del counts[v]


def top_k_sketch(
    df: DataFrame,
    value_col: str,
    k: int = 100,
    width: int | None = None,
) -> DataFrame:
    """Exact-verified top-k frequent values of ``value_col``.

    Returns ``{value_col}, cnt, rank`` (rank 1..k by count desc,
    value asc — deterministic).  Candidates come from per-partition
    Misra-Gries summaries; counts come from an exact recount of the
    candidates only.
    """
    w = width or max(4 * k, 64)
    col = value_col

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        for pdf in batches:
            _mg_merge(counts, pdf[col].value_counts(), w)
        if counts:
            yield pd.DataFrame({col: list(counts.keys())})

    field = df.schema[col]
    cand = (
        df.select(col)
        .mapInPandas(sketch, schema=f"`{col}` {field.dataType.simpleString()}")
        .distinct()
    )
    counted = (
        df.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )
    rank_w = Window.orderBy(F.col("cnt").desc(), F.col(col).asc())
    return (
        counted.withColumn("rank", F.row_number().over(rank_w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(col, "cnt", "rank")
    )
