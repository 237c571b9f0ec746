"""Exact K-nearest-neighbor GRAPH over an embedding column — every
vector's top-k cosine neighbors among all the others.

``ann_topk_gemm`` (operators/ann_shard.py) handles the serving shape
(small query set, collected and broadcast); a KNN *graph* has query
set == corpus, so nothing may be collected.  This operator runs the
O(n²) pairing fully distributed with the block-pair plan:

1. Each vector is assigned a block ``b = pmod(xxhash64(id), B)``.
2. Every (i, j) block pair must meet once.  Rows are replicated B
   times, tagged with the pair key they serve: block-i rows carry
   (i, j) for all j as the "corpus" side, block-j rows carry (i, j)
   for all i as the "query" side.  One shuffle of 2·B·n rows
   co-locates every pair.
3. ``applyInPandas`` per pair key: one NumPy GEMM (corpus-block ×
   query-blockᵀ), per-query local top-k via ``argpartition``.
4. A global per-query window merges the B partial top-k lists into
   the exact graph (ties broken by neighbor id — deterministic).

Scale shape: shuffle volume is 2·B·n rows (choose B ≈ √cluster
parallelism; the B² pair tasks are embarrassingly parallel), each
task is one dense GEMM over (n/B)² pairs — the arithmetic-intensity
sweet spot for a vectorized kernel.  No driver-side collect at any
size.  For corpora where O(n²) flops are genuinely unaffordable the
approximate tiers (operators/ivf.py, rp_lsh_topk) are the documented
escape hatch; this operator is their exact-recall referee.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["knn_graph"]


def knn_graph(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    blocks: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbor graph (self-pairs excluded).

    Returns ``query_id, nbr_id, cosine (6 dp), rank`` — one row per
    (vector, neighbor) with rank 1..k.  Zero-norm vectors have no
    defined cosine and are dropped from both roles.
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(blocks)).alias("_b"),
    )
    other = F.explode(F.sequence(F.lit(0), F.lit(blocks - 1))).alias("_o")
    # corpus role: block i rows meet every j → key (i=_b, j=_o)
    corpus = base.select(
        "_id", "_v", F.col("_b").alias("_i"), other
    ).withColumnsRenamed({"_o": "_j"}).withColumn("_role", F.lit(0))
    # query role: block j rows meet every i → key (i=_o, j=_b)
    queries = base.select(
        "_id", "_v", other, F.col("_b").alias("_j")
    ).withColumnsRenamed({"_o": "_i"}).withColumn("_role", F.lit(1))
    tagged = corpus.select("_i", "_j", "_role", "_id", "_v").unionByName(
        queries.select("_i", "_j", "_role", "_id", "_v")
    )

    kk = k

    def pair_topk(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        c = pdf[pdf["_role"] == 0]
        q = pdf[pdf["_role"] == 1]
        if c.empty or q.empty:
            return pd.DataFrame(
                {"query_id": [], "nbr_id": [], "cosine": []}
            ).astype({"query_id": "int64", "nbr_id": "int64", "cosine": "float64"})
        c_ids = c["_id"].to_numpy()
        q_ids = q["_id"].to_numpy()
        cm = np.asarray(c["_v"].tolist(), dtype=np.float64)
        qm = np.asarray(q["_v"].tolist(), dtype=np.float64)
        cn = np.linalg.norm(cm, axis=1)
        qn = np.linalg.norm(qm, axis=1)
        ck, qk = cn > 0, qn > 0
        c_ids, cm, cn = c_ids[ck], cm[ck], cn[ck]
        q_ids, qm, qn = q_ids[qk], qm[qk], qn[qk]
        if c_ids.size == 0 or q_ids.size == 0:
            return pd.DataFrame(
                {"query_id": [], "nbr_id": [], "cosine": []}
            ).astype({"query_id": "int64", "nbr_id": "int64", "cosine": "float64"})
        sims = (cm @ qm.T) / cn[:, None] / qn[None, :]
        sims[c_ids[:, None] == q_ids[None, :]] = -np.inf  # self-pairs
        top = min(kk, sims.shape[0])
        part = np.argpartition(-sims, top - 1, axis=0)[:top]
        out_q, out_n, out_s = [], [], []
        for col in range(sims.shape[1]):
            rows = part[:, col]
            out_q.extend([q_ids[col]] * len(rows))
            out_n.extend(c_ids[rows])
            out_s.extend(sims[rows, col])
        return pd.DataFrame({"query_id": out_q, "nbr_id": out_n, "cosine": out_s})

    local = tagged.groupBy("_i", "_j").applyInPandas(
        pair_topk, schema="query_id long, nbr_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return (
        local.filter(F.col("cosine") != float("-inf"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "nbr_id",
            F.round("cosine", 6).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
