"""Streaming MERGE sink: apply a keyed change stream to a materialized
target with upsert semantics (the CDC-apply / streaming-materialized-
view shape) via ``foreachBatch`` + ``operators.upsert.merge_upsert``.

Per micro-batch: collapse the batch to latest-per-key (a change stream
may carry several versions of one key per batch), merge into the
current target (broadcast-anti-join — the target is scanned once,
never shuffled), and atomically republish.

Exactly-once: ``merge_upsert`` is idempotent (re-applying the same
delta yields the same table), so a batch replayed after a crash
converges rather than duplicating — the ``_applied_batch`` marker only
skips redundant work.  The parquet rewrite-and-swap stands in for a
table-format commit; at warehouse scale the same ``apply`` body
targets Delta/Iceberg ``MERGE`` where the manifest swap is the atomic
commit and only touched files rewrite.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.upsert import merge_upsert

__all__ = ["latest_per_key", "stream_upsert_writer"]


def latest_per_key(
    df: DataFrame, keys: Sequence[str], order_col: str
) -> DataFrame:
    """Collapse a multi-version change set to one row per key: highest
    ``order_col`` wins, deterministic."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), *[F.col(k) for k in keys]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _publish(df: DataFrame, target_dir: str, batch_id: int) -> None:
    staging = f"{target_dir}.staging-{batch_id}"
    df.write.mode("overwrite").parquet(staging)
    old = f"{target_dir}.old-{batch_id}"
    if os.path.exists(target_dir):
        os.rename(target_dir, old)
    os.rename(staging, target_dir)
    shutil.rmtree(old, ignore_errors=True)
    with open(f"{target_dir}/_applied_batch", "w") as f:
        f.write(str(batch_id))


def stream_upsert_writer(
    stream: DataFrame,
    target_dir: str,
    keys: Sequence[str],
    order_col: str,
    checkpoint_dir: str,
):
    """``writeStream`` writer that upserts each micro-batch into the
    parquet table at ``target_dir``.  Caller picks the trigger
    (``availableNow`` for catch-up replay, processing-time for live)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(target_dir, "_applied_batch")
        if os.path.exists(marker):
            with open(marker) as f:
                if batch_id <= int(f.read().strip() or -1):
                    return  # replayed batch already merged (marker fast-path)
        delta = latest_per_key(batch_df, keys, order_col)
        spark = batch_df.sparkSession
        if os.path.exists(target_dir):
            target = spark.read.parquet(target_dir)
            # version arbitration across batch boundaries: an
            # out-of-order replay must not regress a newer target row,
            # so the target row wins unless the delta is >= on order_col
            merged = merge_upsert(
                target,
                delta.join(
                    target.select(*keys, F.col(order_col).alias("__cur")),
                    on=list(keys),
                    how="left",
                )
                .filter(
                    F.col("__cur").isNull()
                    | (F.col(order_col) >= F.col("__cur"))
                )
                .drop("__cur"),
                keys,
            )
        else:
            merged = delta
        # staging is fully written while the old target still exists
        # (the lazy read resolves during the staging write), so the
        # swap never races the scan
        _publish(merged, target_dir, batch_id)

    return (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
