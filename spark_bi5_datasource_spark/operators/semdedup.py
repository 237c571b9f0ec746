"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication" — public arXiv 2303.09540): cluster embeddings with
k-means, compare pairs only WITHIN a cluster, and drop every vector
that has a sufficiently-cosine-similar lower-id neighbor, keeping one
representative per semantic duplicate group.

Spark-first shape:

* cells come from ``operators.ivf.kmeans_centroids`` — the same
  deterministic, RNG-free Lloyd trainer the IVF ANN tier uses (k ×
  dim floats of driver state, shipped like a broadcast);
* the intra-cell pair enumeration is an equi-join on the cell id —
  the corpus shuffles ONCE by cell, pairs never cross cells, so the
  quadratic blow-up is bounded per cell (SemDeDup's whole point: at
  fixed cluster granularity the per-cell population is corpus-scale /
  nlist, and nlist grows with the corpus);
* scoring reuses the exact dot/norm expressions of the ANN tier
  (operators/similarity.py), JVM-side higher-order functions;
* the keep rule is deterministic: a vector is dropped iff some
  LOWER-id vector in its cell has cosine ≥ τ (the stable
  representative is the minimum id of each duplicate chain — no RNG,
  no ordering ambiguity across engines/partitionings).

Exact mode (``nlist=1``) puts every vector in one cell, making the
output provably equal to the all-pairs answer — the catalog's hash
gate rides that point (same provably-exact-at-a-point trick as
``sim_ivf_exact`` / ``sim_lsh_exact``); the production mode
(``nlist>1``) is approximate by construction (cross-cell duplicates
are missed) and is pinned by a recall-vs-exact pytest instead.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ivf import _nearest_cells_udf, kmeans_centroids
from .similarity import _DOT, with_norm

__all__ = ["semantic_dedup"]


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    nlist: int = 1,
    iters: int = 3,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Per-vector semantic-duplicate verdict.

    Returns ``(id_col, cell, n_dups_lower, max_cos_ppm, is_kept)``:
    the number of lower-id same-cell vectors with cosine ≥
    ``threshold``, the best such cosine in half-up integer ppm (null
    if none — integer-space rounding, the catalog's cross-engine
    convention for derived floats), and the SemDeDup keep flag (kept
    iff no lower-id near-duplicate).
    Zero-norm vectors are dropped (cosine undefined), as in the ANN
    tier.
    """
    base = with_norm(df, vec_col).filter(F.col("norm") > 0)
    if nlist <= 1:
        c = base.withColumn("cell", F.lit(0))
    else:
        cents = (
            centroids
            if centroids is not None
            else kmeans_centroids(df, vec_col, nlist, iters, id_col)
        )
        cell1 = _nearest_cells_udf(cents, 1)
        c = base.withColumn(
            "__u", F.expr("transform(__v, x -> x / norm)")
        ).withColumn("cell", cell1(F.col("__u"))[0]).drop("__u")
    left = c.select(
        F.col(id_col).alias("__ida"),
        F.col("__v").alias("__va"),
        F.col("norm").alias("__na"),
        "cell",
    )
    right = c.select(
        F.col(id_col).alias("__idb"),
        F.col("__v").alias("__vb"),
        F.col("norm").alias("__nb"),
        "cell",
    )
    hits = (
        left.join(right, "cell")
        .where(F.col("__ida") < F.col("__idb"))
        .withColumn(
            "cosine",
            F.expr(_DOT.format(a="__va", b="__vb"))
            / (F.col("__na") * F.col("__nb")),
        )
        .where(F.col("cosine") >= threshold)
        .groupBy(F.col("__idb").alias(id_col))
        .agg(
            F.count("*").cast("bigint").alias("n_dups_lower"),
            F.expr(
                "CAST(max(cosine) * 1000000D + 0.5D AS BIGINT)"
            ).alias("max_cos_ppm"),
        )
    )
    return (
        c.select(id_col, "cell")
        .join(hits, id_col, "left")
        .select(
            id_col,
            "cell",
            F.coalesce("n_dups_lower", F.lit(0))
            .cast("bigint")
            .alias("n_dups_lower"),
            "max_cos_ppm",
            F.col("max_cos_ppm").isNull().alias("is_kept"),
        )
    )
