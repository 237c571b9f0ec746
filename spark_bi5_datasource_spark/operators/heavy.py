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


def _mg_merge(counts: pd.Series, pdf_counts: pd.Series, width: int) -> pd.Series:
    """Fold one batch's value counts into a width-bounded summary.

    This is the MERGE operation of the mergeable-summaries
    formulation of Misra-Gries (Agarwal et al., PODS'12): add the two
    summaries, then restore the width bound by subtracting the
    (width+1)-th largest counter from everyone and dropping the
    non-positives.  Identical guarantee to item-at-a-time MG
    (undercount ≤ n/width), but every step is a vectorized Series op
    — the first cut's per-item dict loop re-scanned all ``width``
    counters on every eviction (O(n·width) worst case; measured 2.2 s
    vs 0.7 s for the EXACT path at x10, i.e. the sketch tier lost to
    the shuffle it exists to avoid)."""
    merged = counts.add(pdf_counts, fill_value=0) if len(counts) else pdf_counts
    if len(merged) > width:
        thresh = merged.nlargest(width + 1).iloc[-1]
        merged = merged[merged > thresh] - thresh
    return merged


def top_k_sketch(
    df: DataFrame,
    value_col: str,
    k: int = 100,
    width: int | None = None,
    sketch_input: DataFrame | None = None,
    extract_counts=None,
) -> DataFrame:
    """Exact-verified top-k frequent values of ``value_col``.

    Returns ``{value_col}, cnt, rank`` (rank 1..k by count desc,
    value asc — deterministic).  Candidates come from per-partition
    Misra-Gries summaries; counts come from an exact recount of the
    candidates only.

    When the value stream is DERIVED (e.g. tokens exploded from
    documents), pass the pre-explosion table as ``sketch_input`` and
    a ``extract_counts(pdf) -> pd.Series`` (value -> batch count):
    the candidate pass then ships one source row — not one value
    occurrence — across Arrow, and extraction runs at C speed in the
    worker (measured: 1.4 s -> 0.9 s on a 2.5 M-token corpus where
    the JVM explode + per-token Arrow row overhead dominated).  The
    exact recount below always runs on ``df`` itself, so the result
    is identical either way.
    """
    w = width or max(4 * k, 64)
    col = value_col

    src = sketch_input if sketch_input is not None else df.select(col)
    batch_counts = (
        extract_counts
        if extract_counts is not None
        else (lambda pdf: pdf[col].value_counts())
    )

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts = pd.Series(dtype="int64")
        for pdf in batches:
            counts = _mg_merge(counts, batch_counts(pdf), w)
        if len(counts):
            yield pd.DataFrame({col: counts.index})

    field = df.schema[col]
    cand = (
        src
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
