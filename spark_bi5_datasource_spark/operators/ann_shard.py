"""Sharded exact ANN via Arrow-batched matrix kernels — the third
similarity tier (SURVEY §2 north star: brute-force baseline → LSH
buckets → sharded GEMM).

``cosine_topk`` (expression path) evaluates one dot product per
corpus×query pair inside codegen; fine for small query sets but the
per-pair expression overhead dominates when |Q| grows.  This operator
instead runs one NumPy GEMM per corpus partition per Arrow batch
(``mapInPandas``): the broadcast query block is a (q×d) matrix, each
corpus batch a (b×d) matrix, similarity = one ``B @ Q.T``.  Per-
partition top-k (local heap) then a global per-query top-k window
merges shard results — the classic scatter-gather ANN serving plan,
expressed in two Spark operators.

Scale shape: corpus stays partitioned (no shuffle of the big side);
only |partitions|·k·|Q| candidate rows reach the final window.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ann_topk_gemm"]


def ann_topk_gemm(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors computed shard-wise with NumPy.

    Same results as ``cosine_topk`` (deterministic: unique neighbor
    ids break ties) with GEMM throughput.  The query side is collected
    to the driver and closed over (it must be the small side — same
    constraint as a broadcast join).
    """
    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        schema = "query_id long, nbr_id long, cosine double, rank int"
        return corpus.sparkSession.createDataFrame([], schema)
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    # zero-norm vectors have undefined cosine: drop them from both
    # sides, matching cosine_topk (and the DuckDB oracle) exactly
    keep_q = q_norm > 0
    q_ids, q_mat, q_norm = q_ids[keep_q], q_mat[keep_q], q_norm[keep_q]
    if q_ids.size == 0:
        schema = "query_id long, nbr_id long, cosine double, rank int"
        return corpus.sparkSession.createDataFrame([], schema)

    def shard_topk(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if mat.size == 0:
                continue
            norms = np.linalg.norm(mat, axis=1)
            keep = norms > 0
            if not keep.all():
                ids, mat, norms = ids[keep], mat[keep], norms[keep]
            if mat.shape[0] == 0:
                continue
            sims = (mat @ q_mat.T) / norms[:, None] / q_norm[None, :]
            if not include_self:
                sims[ids[:, None] == q_ids[None, :]] = -np.inf
            kk = min(k, sims.shape[0])
            # local top-k per query (argpartition = heap, not full sort)
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]
            out_q, out_n, out_s = [], [], []
            for j in range(sims.shape[1]):
                rows = top[:, j]
                out_q.extend([q_ids[j]] * len(rows))
                out_n.extend(ids[rows])
                out_s.extend(sims[rows, j])
            yield pd.DataFrame(
                {"query_id": out_q, "nbr_id": out_n, "cosine": out_s}
            )

    local = corpus.select(id_col, vec_col).mapInPandas(
        shard_topk, schema="query_id long, nbr_id long, cosine double"
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
