"""Bin-blocked interval-overlap join.

The naive overlap join (``a.s < b.e AND b.s < a.e``) is a theta join —
Spark (like every shuffle engine) can only execute it as a cross
product per equi-key, which dies at scale.  The standard rewrite bins
time into fixed buckets: every interval is exploded to the buckets it
covers, candidates meet on the (key, bucket) EQUI-join, duplicate
pairs (intervals sharing several buckets) collapse, and the exact
overlap predicate verifies each candidate — filter-and-verify, the
same discipline as the q-gram fuzzy join and the trigram grep.

Shuffle is ∝ Σ interval-length/bucket instead of |A|x|B|; the bucket
width trades replication (long intervals touch many buckets) against
candidate fan-in (hot buckets pair many intervals).  Pick it near the
median interval length; a hot bucket (one loaded hour) degrades to
that bucket's local cross product and can borrow the salted-join
escape hatch (operators/skew.py).

Overlap semantics are half-open [s, e): touching intervals (a.e ==
b.s) do NOT overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOUR_US = 3_600_000_000


def _bin(df: DataFrame, s: str, e: str, bucket_us: int) -> DataFrame:
    return df.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                # integer division: FP division + truncation can land
                # off-by-one at exact bucket boundaries
                F.expr(f"{s} div {bucket_us}"),
                # half-open end: an interval ending exactly on a bucket
                # boundary does not occupy that next bucket
                F.expr(f"({e} - 1) div {bucket_us}"),
            )
        ),
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    on: list[str],
    s: str = "s",
    e: str = "e",
    bucket_us: int = HOUR_US,
    b_prefix: str = "b_",
) -> DataFrame:
    """All pairs (a-row, b-row) sharing the ``on`` keys whose
    [s, e) intervals (integer microseconds) overlap.  Returns a's
    columns unchanged plus b's columns renamed ``{b_prefix}{col}``.

    Both inputs must carry integral ``s``/``e`` columns with s < e;
    rows violating that are dropped (empty intervals overlap nothing).
    """
    a = a.filter(F.col(s) < F.col(e))
    b = b.filter(F.col(s) < F.col(e))
    ab = _bin(a, s, e, bucket_us)
    bb = _bin(b, s, e, bucket_us).select(
        F.col("_bkt").alias(f"{b_prefix}_bkt"),
        *[F.col(c).alias(f"{b_prefix}{c}") for c in b.columns],
    )
    cond = F.col("_bkt") == F.col(f"{b_prefix}_bkt")
    for k in on:
        cond = cond & (F.col(k) == F.col(f"{b_prefix}{k}"))
    verified = (
        ab.join(bb, cond)
        .filter(
            (F.col(s) < F.col(f"{b_prefix}{e}"))
            & (F.col(f"{b_prefix}{s}") < F.col(e))
        )
        .drop("_bkt", f"{b_prefix}_bkt")
        .distinct()
    )
    return verified
