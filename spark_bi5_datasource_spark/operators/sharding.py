"""Training-data delivery: deterministic sharding with a hash-order
pseudo-shuffle, and small-file compaction.

The last step of a 100-TB curation pipeline is writing the corpus as
N shards whose within-shard order is RANDOM-LOOKING but REPRODUCIBLE
(training wants decorrelated batches; reproducibility wants the same
byte stream on every rebuild).  A global ``orderBy(rand())`` is a
full sort with an RNG in the plan — wrong on both counts.  The
hash-order idiom gives both properties with one exchange:

* shard  = first-8-hex-digits of md5(salt || id) mod n_shards —
  uniform, engine-portable (md5 exists everywhere; xxhash64 does
  not), stable under re-partitioning;
* within-shard order = the full md5 hex — a deterministic permutation
  that is indistinguishable from a shuffle for training purposes
  (documents with adjacent ids land far apart).

``write_training_shards`` materializes one directory per shard with
rows in hash order: a single hash-partition exchange + per-partition
sort, no global sort, no skew (shards are hash-uniform by
construction).

Compaction (``compact_parquet``): the other half of delivery —
curation jobs leave thousands of small files per directory; readers
want few large ones.  Rows are re-binned by size into
ceil(bytes / target) files.  Also content-preserving and
deterministic (round-robin on a hash order, not on input split
order).

Reference parity: no counterpart — the reference ends at the scan;
these are north-star pipeline operators (SURVEY §2 Tier C).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "assign_training_shards",
    "write_training_shards",
    "compact_parquet",
]


def _hash_cols(id_col: str, n_shards: int, salt: str):
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    shard = (
        F.conv(h.substr(1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")
    return shard, h


def assign_training_shards(
    df: DataFrame, id_col: str, n_shards: int, salt: str = ""
) -> DataFrame:
    """Add ``shard`` (int) and ``shuffle_key`` (md5 hex) columns.

    Both are pure column expressions — stable across runs, engines,
    and partitionings; changing ``salt`` produces an independent
    permutation (a new training epoch order without rewriting data).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    shard, h = _hash_cols(id_col, n_shards, salt)
    return df.withColumn("shard", shard).withColumn("shuffle_key", h)


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    salt: str = "",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as ``shard=K/`` directories, rows in hash order.

    One exchange (hash-partition on the shard column) + a
    per-partition sort; the per-shard row stream is byte-identical
    on every rebuild with the same salt."""
    out = assign_training_shards(df, id_col, n_shards, salt)
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_key")
        .write.partitionBy("shard")
        .format(fmt)
        .mode("overwrite")
        .save(path)
    )


def compact_parquet(
    spark,
    src: str,
    dest: str,
    target_mb: int = 512,
    id_col: str | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_mb``-sized files;
    returns the output file count.

    File count = ceil(input_bytes / target): computed from the
    source listing, not row counts, so compressed width is respected.
    With ``id_col`` the rewrite orders rows by the column first
    (range-partitioned — gives min/max file statistics for scan
    pruning, the poor man's clustering); otherwise rows keep
    arbitrary grouping via round-robin repartition."""
    import os

    total = 0
    for root, _dirs, files in os.walk(src):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(src)
    if id_col is not None:
        df = df.repartitionByRange(n_files, F.col(id_col))
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(dest)
    return n_files
