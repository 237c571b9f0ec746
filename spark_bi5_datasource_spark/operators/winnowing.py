"""Winnowing document fingerprints (MOSS-style local fingerprinting).

Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for Document
Fingerprinting" (SIGMOD 2004, public): hash every k-char-gram of a
document, slide a window of w consecutive gram hashes, keep the
minimum of each window, and the distinct kept hashes are the
document's fingerprint set — any shared substring of length
>= w + k - 1 between two documents is GUARANTEED to surface as a
shared fingerprint, while storing only ~2/(w+1) of the gram hashes.
The clone-detection complement of the shingle-based dedup family
(operators/dedup.py): shingles sample the token space, winnowing
samples the raw character stream with a locality guarantee.

Engine-portable hashing: the gram hash is an explicit base-B
polynomial over character CODEPOINTS mod a 31-bit prime, folded
left-to-right with a mod after every step —
``h = fold(c_j: (h * B + c_j) % P)`` — so a SQL twin can reproduce it
bit-for-bit with ``ascii(substr(text, i + j, 1))`` and nested ``%``
(no engine hash function is trusted across engines; same policy as
the polynomial fingerprints in functions/text.py).

Scale shape: the kernel is a pure per-document map (NumPy rolling
hash + sliding-window min, Arrow-batched) behind the row-group
fan-out gate — no shuffle at all until the caller aggregates the
fingerprint sets; at 100 TB the per-doc work partitions linearly and
the output is ~2/(w+1) · grams rows of bounded width.
"""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.text import _fanout

__all__ = ["winnow_fingerprint_stats", "winnow_fingerprints", "winnow_py"]


def winnow_py(
    text: str, k: int = 8, w: int = 4, base: int = 131,
    mod: int = 1_000_000_007,
) -> list[int]:
    """Pure-Python reference (test oracle): sorted distinct winnowed
    fingerprints of ``text``.  Documents with fewer than ``w`` gram
    hashes contribute one window spanning all grams."""
    m = len(text)
    n = m - k + 1
    if n <= 0:
        return []
    hs = []
    for i in range(n):
        h = 0
        for j in range(k):
            h = (h * base + ord(text[i + j])) % mod
        hs.append(h)
    if n < w:
        return [min(hs)]
    return sorted({min(hs[p : p + w]) for p in range(n - w + 1)})


def winnow_fingerprint_stats(
    df: DataFrame, id_col: str, text_col: str, k: int = 8, w: int = 4,
    base: int = 131, mod: int = 1_000_000_007,
) -> DataFrame:
    """Per-document winnowing fingerprint statistics:
    ``(id, n_grams, n_fp, fp_xor)`` where ``n_fp`` counts the
    distinct winnowed fingerprints and ``fp_xor`` is their bitwise
    XOR — an order-independent set digest that pins the EXACT
    fingerprint set against the SQL twin without materializing the
    per-fingerprint fan-out.  Null/short texts yield
    ``n_grams = 0, n_fp = 0, fp_xor = NULL``."""
    import numpy as np

    out_schema = (
        f"{id_col} long, n_grams long, n_fp long, fp_xor long"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ngs, nfs, xs = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                ids.append(did)
                m = len(text) if isinstance(text, str) else 0
                n = m - k + 1
                if n <= 0:
                    ngs.append(0), nfs.append(0), xs.append(None)
                    continue
                codes = np.fromiter(map(ord, text), np.int64, count=m)
                h = np.zeros(n, np.int64)
                for j in range(k):
                    h = (h * base + codes[j : j + n]) % mod
                if n < w:
                    fps = np.array([h.min()])
                else:
                    fps = np.unique(
                        np.lib.stride_tricks.sliding_window_view(
                            h, w
                        ).min(axis=1)
                    )
                ngs.append(n)
                nfs.append(len(fps))
                xs.append(int(np.bitwise_xor.reduce(fps)))
            yield pd.DataFrame(
                {
                    id_col: pd.array(ids, dtype="Int64"),
                    "n_grams": pd.array(ngs, dtype="Int64"),
                    "n_fp": pd.array(nfs, dtype="Int64"),
                    "fp_xor": pd.array(xs, dtype="Int64"),
                }
            )

    return _fanout(df.select(id_col, text_col)).mapInPandas(
        kernel, out_schema
    )


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 8, w: int = 4,
    base: int = 131, mod: int = 1_000_000_007,
) -> DataFrame:
    """Exploded per-document fingerprint rows ``(id, fp)`` — one row
    per DISTINCT winnowed fingerprint — for inverted-index consumers
    (near-dup pair detection).  Same selection as
    winnow_fingerprint_stats; documents with no grams emit nothing."""
    import numpy as np

    out_schema = f"{id_col} long, fp long"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                m = len(text) if isinstance(text, str) else 0
                n = m - k + 1
                if n <= 0:
                    continue
                codes = np.fromiter(map(ord, text), np.int64, count=m)
                h = np.zeros(n, np.int64)
                for j in range(k):
                    h = (h * base + codes[j : j + n]) % mod
                if n < w:
                    sel = np.array([h.min()])
                else:
                    sel = np.unique(
                        np.lib.stride_tricks.sliding_window_view(
                            h, w
                        ).min(axis=1)
                    )
                ids.extend([did] * len(sel))
                fps.extend(int(x) for x in sel)
            yield pd.DataFrame(
                {
                    id_col: pd.array(ids, dtype="Int64"),
                    "fp": pd.array(fps, dtype="Int64"),
                }
            )

    return _fanout(df.select(id_col, text_col)).mapInPandas(
        kernel, out_schema
    )
