"""Mergeable distinct-count sketches (Apache DataSketches HLL,
Spark built-ins).

``approx_count_distinct`` answers one query; the MERGEABLE workflow
is what scales a metrics platform: build small per-bucket sketches
once (per day / per partition / per source), persist them, and answer
any coarser rollup later by UNIONING sketches — never re-scanning the
raw events.  This is the distinct-count twin of the OHLC
continuous-aggregate pipeline (functions/ohlc.py merge_ohlc_bars):
partials + lossless merge.

Union of HLL sketches built over disjoint row sets is EXACTLY the
sketch of the union (same registers, deterministic), so the merged
estimate equals the direct estimate — pinned by
tests/test_round4_ops.py, not approximately but bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bucket_distinct_sketches", "merge_distinct_sketches"]


def bucket_distinct_sketches(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "day",
    lg_k: int = 12,
) -> DataFrame:
    """Per-bucket HLL sketch of ``key_col`` plus the bucket's own
    estimate.  One hash aggregation; each output row carries a
    ~2^lg_k-byte binary sketch regardless of input volume."""
    return (
        events.groupBy(F.date_trunc(bucket, ts_col).alias("bucket_ts"))
        .agg(F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sketch"))
        .select(
            "bucket_ts",
            "sketch",
            F.hll_sketch_estimate("sketch").alias("bucket_estimate"),
        )
    )


def merge_distinct_sketches(partials: DataFrame) -> DataFrame:
    """Distinct estimate over ALL buckets by unioning the stored
    sketches — the raw table is never touched again.  Returns one row
    ``(merged_estimate bigint)``."""
    return partials.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "merged_estimate"
        )
    )
