"""Global PCA over an embedding column — dimensionality reduction as
a two-job plan: one distributed moment-accumulation pass, one
Arrow-batched projection pass.

Fit: each partition emits its (count, Σx, ΣxxT) — a single row of
1 + d + d² numbers per partition via ``mapInPandas`` (one NumPy GEMM
per Arrow batch).  The driver combines the partials (p rows of
bounded size — same driver-state class as a broadcast), forms the
covariance, and eigendecomposes the d×d matrix locally: d is the
embedding width (64 here, ≤ a few thousand in practice), so the
eigen problem is always driver-sized no matter how many rows the
corpus has.  Components get a deterministic sign convention (largest-
magnitude coordinate positive) so repeated fits agree exactly.

Project: mean-center + one (b×d)·(d×m) GEMM per Arrow batch.

This is the linear twin of the IVF training loop (operators/ivf.py):
train once, the model (mean + components) is a tiny broadcastable
array, application is embarrassingly parallel.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pca_fit", "pca_project"]


def pca_fit(
    df: DataFrame, vec_col: str = "embedding", m: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit PCA on ``vec_col``; returns ``(mean[d], components[m, d],
    explained_variance[m])``.  One pass over the data."""

    def moments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, ss = 0, None, None
        for pdf in batches:
            mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if mat.size == 0:
                continue
            n += mat.shape[0]
            s = mat.sum(0) if s is None else s + mat.sum(0)
            g = mat.T @ mat
            ss = g if ss is None else ss + g
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
            )

    parts = (
        df.select(vec_col)
        .mapInPandas(moments, schema="n long, s array<double>, ss array<double>")
        .collect()
    )
    if not parts:
        raise ValueError("pca_fit: empty input")
    n = sum(r["n"] for r in parts)
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    ss = np.sum([np.asarray(r["ss"]) for r in parts], axis=0)
    d = s.shape[0]
    mean = s / n
    cov = ss.reshape(d, d) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:m]
    comps = evecs[:, order].T  # (m, d)
    # deterministic sign: largest-|coordinate| entry made positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


def pca_project(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Append ``out_col`` = the m-dim projection of ``vec_col``."""
    mean = np.asarray(mean, dtype=np.float64)
    comps = np.asarray(components, dtype=np.float64)

    @F.pandas_udf("array<double>")
    def proj(v: pd.Series) -> pd.Series:
        mat = np.asarray(v.tolist(), dtype=np.float64)
        if mat.size == 0:
            return pd.Series([], dtype=object)
        out = (mat - mean) @ comps.T
        return pd.Series(list(out))

    return df.withColumn(out_col, proj(F.col(vec_col)))
