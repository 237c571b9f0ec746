#!/usr/bin/env python
"""Race two shapes for events_wau_sliding at x1000 (100M events).

Current shape (explode-distinct): dedup to (day,user), explode 7 day
offsets (700M contribution rows), COUNT(DISTINCT user) per target day.
The distinct over 700M rows is the dominant shuffle.

Candidate (interval sweep): per-user coverage intervals — consecutive
activity days <=6 apart merge into one [start, end+6] WAU-coverage
interval (lag window per user, no explode) — then +1/-1 boundary
deltas, aggregated per day (map-side combinable to ~|days| rows), and
one running sum over that tiny series.  Replaces the 700M-row distinct
with a 100M-row per-user sort plus an O(|days|) prefix sum.

Verifies exact equality of the two results before timing.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from bench import SF_DIR, build_spark, synth_scaled_dir, timed


def _du(spark: SparkSession, d: str) -> DataFrame:
    ev = spark.read.parquet(os.path.join(d, "events.parquet"))
    return (
        ev.where(F.col("ts").isNotNull())
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )


def wau_explode(spark: SparkSession, d: str) -> DataFrame:
    du = _du(spark, d)
    days = du.select("day").distinct().withColumnRenamed("day", "t")
    contrib = du.select(
        F.explode(F.expr("sequence(0, 6)")).alias("i"), "day", "user_id"
    ).select(F.expr("date_add(day, i)").alias("t"), "user_id")
    wau = (
        contrib.join(F.broadcast(days), "t")
        .groupBy("t")
        .agg(F.count_distinct("user_id").cast("bigint").alias("wau"))
    )
    dau = du.groupBy("day").agg(F.count("*").cast("bigint").alias("dau"))
    return (
        wau.withColumnRenamed("t", "day")
        .join(dau, "day")
        .select(
            "day", "dau", "wau",
            F.expr("dau * 1000000 div wau").cast("bigint").alias("stickiness_ppm"),
        )
        .orderBy("day")
    )


def wau_sweep(spark: SparkSession, d: str) -> DataFrame:
    du = _du(spark, d)
    wu = Window.partitionBy("user_id").orderBy("day")
    iv = (
        du.withColumn(
            "new_iv",
            F.when(F.datediff("day", F.lag("day").over(wu)) > 6, 1).otherwise(0),
        )
        .withColumn(
            "grp",
            F.sum("new_iv").over(
                wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "grp")
        .agg(F.min("day").alias("s"), F.max("day").alias("e"))
    )
    days = du.select("day").distinct()
    deltas = (
        iv.select(F.col("s").alias("day"), F.lit(1).alias("d"))
        .unionAll(iv.select(F.date_add("e", 7).alias("day"), F.lit(-1).alias("d")))
        .unionAll(days.select("day", F.lit(0).alias("d")))
        .groupBy("day")
        .agg(F.sum("d").alias("d"))
    )
    ws = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wau = deltas.withColumn("wau", F.sum("d").over(ws).cast("bigint")).drop("d")
    dau = du.groupBy("day").agg(F.count("*").cast("bigint").alias("dau"))
    return (
        wau.join(dau, "day")  # inner join keeps only observed days
        .select(
            "day", "dau", "wau",
            F.expr("dau * 1000000 div wau").cast("bigint").alias("stickiness_ppm"),
        )
        .orderBy("day")
    )


def main() -> None:
    scaled = synth_scaled_dir(SF_DIR, 1000, ["events"])
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")

    a = wau_explode(spark, scaled)
    b = wau_sweep(spark, scaled)
    diff = a.exceptAll(b).unionAll(b.exceptAll(a)).count()
    print(f"# equality diff rows: {diff}")
    assert diff == 0, "sweep disagrees with explode shape"

    for name, fn in [("explode", wau_explode), ("sweep", wau_sweep)]:
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, scaled).collect()
            runs.append(time.time() - t0)
        print(f"{name}: min {min(runs):.2f}s  runs {['%.2f' % r for r in runs]}")


if __name__ == "__main__":
    main()
