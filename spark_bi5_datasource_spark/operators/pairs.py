"""Vectorized unordered-pair unfold from per-row sorted arrays.

The "basket pattern" second half: after a ``collect_set`` groupBy has
keyed the baskets, every row's sorted member array must unfold to its
C(size, 2) ordered pairs (u < v).  Catalyst's higher-order-function
chain (``flatten(transform(..., transform(slice(...))))``) evaluates
interpreted — no codegen — and measured as the most expensive stage
of the sf0.1 pair pipelines (r13: ~0.3 s vs ~0.14 s for this kernel
on the co-purchase unfold).  The kernel unfolds pair (i, j) from its
rank via the closed-form inverse of the lexicographic triangular
numbering, entirely in NumPy.

Shared by ``_copurchase_pairs`` (plans/round4_ops.py) and the
winnowing inverted-index pair generation (dedup_winnow_pairs); the
pure-Catalyst twins remain next to each call site as parity oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["unfold_sorted_pairs"]


def unfold_sorted_pairs(
    df: DataFrame,
    list_col: str,
    out_u: str = "u",
    out_v: str = "v",
) -> DataFrame:
    """(u, v) rows for every in-array pair with index i < j, in
    lexicographic pair order per row — byte-identical to the HOF
    unfold ``flatten(transform(xs, (x, i) -> transform(slice(xs,
    i + 2, size(xs)), y -> struct(x, y))))``.

    ``df`` is projected to ``list_col`` only (the kernel is opaque to
    Catalyst, so anything else would be shipped for nothing).  List
    elements must be non-null (collect_set output always is); null or
    empty lists contribute no pairs, mirroring the HOF explode."""
    elem_t = df.schema[list_col].dataType.elementType.simpleString()

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            lst = b.column(list_col)
            pa_elem = lst.type.value_type
            offs = lst.offsets.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            vals = lst.values.to_numpy(zero_copy_only=False)[: offs[-1]]
            sizes = offs[1:] - offs[:-1]
            if lst.null_count:
                sizes = np.where(
                    lst.is_valid().to_numpy(zero_copy_only=False), sizes, 0
                )
            npairs = sizes * (sizes - 1) // 2
            total = int(npairs.sum())
            if total == 0:
                e = pa.array([], type=pa_elem)
                yield pa.RecordBatch.from_arrays([e, e], [out_u, out_v])
                continue
            bidx = np.repeat(np.arange(sizes.size), npairs)
            prank = np.arange(total) - np.repeat(
                np.concatenate(([0], np.cumsum(npairs)))[:-1], npairs
            )
            s = sizes[bidx]
            # rank -> (i, j): count r of pairs at or after this rank
            # determines i (rows shrink by one as i grows), then j
            # follows from the row offset
            r = npairs[bidx] - 1 - prank
            jj = np.floor((np.sqrt(8.0 * r + 1) - 1) / 2).astype(np.int64)
            i = s - 2 - jj
            j = prank - (i * (2 * s - i - 1)) // 2 + i + 1
            base = offs[:-1][bidx]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(vals[base + i], type=pa_elem),
                    pa.array(vals[base + j], type=pa_elem),
                ],
                [out_u, out_v],
            )

    return df.select(list_col).mapInArrow(
        kernel, f"`{out_u}` {elem_t}, `{out_v}` {elem_t}"
    )
