"""Grouped-map (``groupBy().applyInPandas``) operators: per-group
algorithms that need the WHOLE group as one matrix — the fourth cell
of the Python-boundary matrix (scalar pandas_udf / mapInPandas /
UDTF / grouped map), all Arrow-batched, never row-at-a-time.

ZCA whitening per label is the canonical example: each group's
covariance eigendecomposition can't be expressed as SQL aggregates,
but fits comfortably in one executor when groups are label-sized.
Scale shape: one exchange on the group key (the same shuffle any
per-group agg pays); each group must fit an executor's memory — the
right tool for per-label/per-segment model prep, NOT for corpus-wide
transforms (use emb_standardize's broadcast-stats shape there).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["whiten_per_group"]


def whiten_per_group(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    eps: float = 1e-6,
) -> DataFrame:
    """ZCA-whiten vectors within each group: center on the group mean
    and rotate/scale so the group covariance becomes (regularized)
    identity.  Deterministic: ``eigh`` on a symmetric matrix with
    rows ordered by ``id_col``."""
    schema = StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("label", IntegerType(), True),
            StructField("white", ArrayType(DoubleType()), True),
        ]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        mu = X.mean(axis=0)
        Xc = X - mu
        n, d = X.shape
        cov = Xc.T @ Xc / max(n - 1, 1) + eps * np.eye(d)
        w, v = np.linalg.eigh(cov)
        zca = v @ np.diag(1.0 / np.sqrt(w)) @ v.T
        out = Xc @ zca
        return pd.DataFrame(
            {
                "vec_id": pdf[id_col].to_numpy(),
                "label": pdf[group_col].to_numpy(),
                "white": list(out),
            }
        )

    return df.groupBy(group_col).applyInPandas(fn, schema=schema)
