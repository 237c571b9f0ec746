"""Skew-handling join utilities (SURVEY "Partitioning & shuffle:
skewed keys hurt … salting for skew").

AQE's skew-join split handles most sort-merge skew automatically, but
only at shuffle-block granularity and only for supported join shapes.
``salted_join`` is the explicit version for pathological hot keys: the
build side replicates R ways, the probe side scatters each hot key
uniformly across the R replicas, so one hot key occupies R tasks
instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    replicas: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salt-scattered keys.

    ``large`` gets a per-row pseudorandom salt in [0, replicas);
    ``small`` is exploded ``replicas``× (one copy per salt).  The join
    key becomes (key, salt) — a hot key's rows now spread over
    ``replicas`` reducers.  Use when the small side fits ``replicas``×
    in memory/shuffle but a broadcast is still too big.

    The salt is derived from xxhash64 of the whole large-side row's
    key + a spark partition id, keeping it deterministic per run
    without a Python UDF.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        # right/full outer would emit `replicas` copies of each
        # unmatched small-side row (it was exploded) — reject early.
        raise ValueError(
            "salted_join supports inner/left/left_semi/left_anti joins; "
            f"got {how!r}"
        )
    salted_large = large.withColumn(
        "__salt", (F.pmod(F.xxhash64(F.col(on), F.spark_partition_id()), F.lit(replicas))).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.expr(f"sequence(0, {replicas - 1})"))
    )
    out = salted_large.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")
