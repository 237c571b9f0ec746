"""Int8 embedding quantization via ``mapInArrow`` — symmetric linear
scalar quantization, the standard memory tier for large ANN corpora
(a 64-dim float32 vector shrinks 4x; at 100 TB of embeddings that is
the difference between spilling and fitting the working set).

Per vector: ``scale = max |x_i|``; ``q_i = floor(x_i * 127 / scale
+ 0.5)`` — half-up rounding written as ``floor(x + 0.5)`` so any
engine (NumPy here, DuckDB in the oracle) reproduces it bit-for-bit
on IEEE doubles; ``np.round``'s half-even would not.  A zero vector
quantizes to zeros with ``scale = 0``.

Spark-first shape: ``mapInArrow`` is the *zero-copy* Python boundary
— the batch arrives as Arrow buffers, the kernel reshapes the flat
value buffer into an (n, dim) matrix and quantizes it in one
vectorized pass, and the output list column is rebuilt from the same
offsets.  No per-row Python, no pandas materialization (this is the
one Python-boundary flavor ``functions/pandas_udfs.py`` /
``multimodal.py`` don't already cover — completing the matrix:
pandas_udf, mapInPandas, applyInPandas, applyInPandasWithState,
UDTF, mapInArrow).

Scale: embarrassingly parallel per batch; no shuffle, no state, no
driver traffic.  Dequantized recall loss is the documented SQ8
trade; exact re-ranking on the float tier (operators/similarity.py)
is the companion step.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["quantize_int8"]


def _quantize_matrix(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, d) float64 -> (scale[n], q[n, d] int32), half-up rounding."""
    scale = np.abs(mat).max(axis=1) if mat.size else np.zeros(len(mat))
    safe = np.where(scale > 0, scale, 1.0)
    # keep the exact evaluation order of the SQL twin: (x * 127.0) / s
    q = np.floor(mat * 127.0 / safe[:, None] + 0.5).astype(np.int32)
    q[scale == 0.0, :] = 0
    return scale, q


def quantize_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """``id, vec`` -> ``id, scale (double), qvec (array<int>)``."""
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("scale", DoubleType()),
            StructField("qvec", ArrayType(IntegerType())),
        ]
    )

    def kernel(batches):
        for batch in batches:
            ids = batch.column(0)
            lst = batch.column(1)
            n = len(lst)
            if n == 0:
                continue
            lens = np.asarray(pc.list_value_length(lst))
            flat = np.asarray(lst.flatten(), dtype=np.float64)
            if n and lens.min() == lens.max() and lens[0] > 0:
                scale, q = _quantize_matrix(flat.reshape(n, lens[0]))
                qflat = q.ravel()
            else:  # ragged / empty rows: per-row fallback, same math
                scale = np.zeros(n)
                qflat = np.zeros(len(flat), dtype=np.int32)
                pos = 0
                for i, ln in enumerate(lens):
                    row = flat[pos : pos + ln]
                    if ln:
                        s, q = _quantize_matrix(row[None, :])
                        scale[i] = s[0]
                        qflat[pos : pos + ln] = q[0]
                    pos += ln
            offsets = np.concatenate(([0], np.cumsum(lens)))
            qvec = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(qflat, type=pa.int32()),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    ids.cast(pa.int64()),
                    pa.array(scale, type=pa.float64()),
                    qvec,
                ],
                names=[id_col, "scale", "qvec"],
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(vec_col)
    ).mapInArrow(kernel, out_schema)
