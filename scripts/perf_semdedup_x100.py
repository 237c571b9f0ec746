#!/usr/bin/env python
"""r8: the PRODUCTION SemDeDup path at scale (Spark-only — no SQL
twin exists for Lloyd-trained cells; the catalog's nlist=1 entry is
the fixture-scale exactness pin and is excluded from scaled probes by
the all-pairs rule, see BENCH_X1000_R12.json exclusions).

semantic_dedup(nlist=64, iters=2) over the x100 embeddings tier
(200K vectors, 64-dim): k-means cells bound the pair stream to
Σ C(|cell|, 2) instead of C(N, 2).  Prints the wall time and the
realized pair-stream size (the number the cell bound controls).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from bench import SF_DIR, build_spark, synth_scaled_dir  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    scaled = synth_scaled_dir(SF_DIR, 100, ["embeddings"])
    spark = build_spark()
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    from spark_bi5_datasource_spark.operators.semdedup import semantic_dedup

    emb = spark.read.parquet(os.path.join(scaled, "embeddings.parquet"))
    t0 = time.perf_counter()
    out = semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.3, nlist=64, iters=2
    )
    kept = out.where("is_kept").count()
    total = out.count()
    wall = round(time.perf_counter() - t0, 1)
    # realized pair volume: sum of C(cell_size, 2) over the cells
    # (re-derives the assignment — ~the cheap half of the run)
    from spark_bi5_datasource_spark.operators.ivf import (
        _nearest_cells_udf,
        kmeans_centroids,
    )
    from spark_bi5_datasource_spark.operators.similarity import with_norm

    cents = kmeans_centroids(emb, "embedding", 64, 2, "vec_id")
    cell1 = _nearest_cells_udf(cents, 1)
    cells = (
        with_norm(emb, "embedding")
        .filter(F.col("norm") > 0)
        .withColumn("__u", F.expr("transform(__v, x -> x / norm)"))
        .select(cell1(F.col("__u"))[0].alias("cell"))
        .groupBy("cell")
        .count()
    )
    pairs = cells.agg(
        F.sum(F.expr("count * (count - 1) / 2")).alias("p")
    ).first().p
    n = emb.count()
    print(
        f"x100 semantic_dedup(nlist=64, iters=2): {wall}s, "
        f"kept {kept}/{total}; pair stream {int(pairs):,} vs "
        f"all-pairs {n * (n - 1) // 2:,} "
        f"({round(pairs / (n * (n - 1) / 2) * 100, 2)}%)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
