#!/usr/bin/env python
"""Fresh-JVM legs for the r12 x1000 probe (perf_x1000_round18.py).

Modes:
* ``entry:<name>`` — time the catalog entry (plan built once outside
  timing, warm min-of-N — the standard probe discipline).
* ``cobucket_plain`` — the layout_cobucketed_docs_emb audit join over
  PLAIN parquet reads (no bucketed layout): the ad-hoc-landing-zone
  twin, same rows, pays the doc⋈emb exchange+sort per run.

Prints one JSON line on stdout.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from bench import build_spark, timed  # noqa: E402


def cobucket_plain(spark, scaled):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(scaled, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(scaled, "embeddings.parquet"))
    j = docs.where("source IS NOT NULL").join(
        emb, docs.doc_id == emb.vec_id, "left"
    )
    return (
        j.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count("vec_id").cast("bigint").alias("n_vecs"),
            F.sum(F.size("embedding")).cast("bigint").alias("dim_cells"),
            F.sum(
                F.when(F.col("label").isNotNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_labeled"),
        )
        .orderBy("source")
    )


def main() -> None:
    mode, scaled = sys.argv[1:3]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    spark = build_spark()
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
    )
    if mode == "cobucket_plain":
        df = cobucket_plain(spark, scaled)
    elif mode.startswith("entry:"):
        from spark_bi5_datasource_spark import plans

        df = plans.CATALOG[mode.split(":", 1)[1]][0](spark, scaled)
    else:
        raise SystemExit(f"unknown mode {mode}")
    sec = timed(df, runs=runs)
    print(json.dumps({"mode": mode, "sec": sec}))
    spark.stop()


if __name__ == "__main__":
    main()
