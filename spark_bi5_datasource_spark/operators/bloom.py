"""Bloom-filter semi-join pruning — the runtime-filter pattern as an
explicit, engine-portable composition.

Motivation: ``large ⋉ small`` at warehouse scale shuffles every large
row whose key *might* match.  Engines inject bloom runtime filters to
cut that shuffle (Spark's own InjectRuntimeFilter does this only for
a narrow shape family, and its `bloom_filter_agg` is not a public
function).  This operator builds the same machinery from public
primitives:

1. **Build** (distributed): each build-side key contributes k hash
   positions (``xxhash64(key, seed)``); positions fold into an
   m-bit bitmap via ``bit_or`` over 64-bit words — a groupBy over at
   most m/64 rows.
2. **Collect** the bitmap to the driver: m/64 longs (128 KiB for
   m = 2²⁰) — the same bounded-driver-state class as any broadcast.
3. **Probe** (codegen): the bitmap becomes ONE array literal; the
   membership test is ``element_at(words, pos/64+1) & (1<<pos%64)``
   per hash — pure JVM expressions ahead of the join, so pruned rows
   never reach the shuffle.
4. **Exact verify**: the surviving rows still pass through the real
   semi-join — bloom false positives never reach the output, so the
   result is EXACTLY ``large ⋉ small`` (the driver oracle is the
   plain semi-join SQL).

Scale shape: build cost is one pass over the (small) build side;
probe cost is a handful of codegen ops per large row; the payoff is
shuffle volume ∝ selectivity instead of ∝ |large|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_semi_join"]


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(m_bits))
        for seed in range(k)
    ]


def bloom_semi_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    m_bits: int = 1 << 20,
    k: int = 2,
) -> DataFrame:
    """``large ⋉ small`` on column ``on`` with a bloom pre-filter.

    Exact semantics (false positives are removed by the final
    semi-join); the bloom only decides how many large-side rows reach
    the shuffle.  ``m_bits`` must be a multiple of 64.
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    key = F.col(on)
    pos = _positions(key, m_bits, k)
    words = (
        small.select(F.explode(F.array(*pos)).alias("p"))
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, cast(p % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    arr = [0] * (m_bits // 64)
    for r in words:
        arr[r["w"]] = r["bits"]
    lit_words = F.lit(arr)

    def hit(p: Column) -> Column:
        w = (p / 64).cast("int")
        b = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        return (
            F.element_at(lit_words, w + 1).bitwiseAND(b) != F.lit(0).cast("long")
        )

    cond = hit(pos[0])
    for p in pos[1:]:
        cond = cond & hit(p)
    pruned = large.filter(cond)
    return pruned.join(
        F.broadcast(small.select(on).distinct()), on, "left_semi"
    )
