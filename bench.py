#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline catalog
queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is measured with a noop sink (full pipeline runs, nothing
is collected to the driver) so timings reflect the distributed plan,
not result pickling.  A bi5-scan micro-benchmark against the
reference's fixture tree is included when that tree is present —
the only like-for-like number the reference offers (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REFERENCE_BI5 = "/root/reference/spark-2.4/src/test/resources/EURUSD"


def build_spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("spark-bi5-bench")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from spark_bi5_datasource_spark import plans, register

    spark = build_spark()
    register(spark)

    # Warm the JVM/codegen/parquet-footer caches so the first timed
    # query doesn't absorb session startup costs.
    warm = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    warm.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name, fn in plans.bench_queries().items():
        df = fn(spark, SF_DIR)
        t0 = time.perf_counter()
        run_noop(df)
        timings[name] = round(time.perf_counter() - t0, 3)

    if os.path.isdir(REFERENCE_BI5):
        df = (
            spark.read.format("bi5")
            .option("digits", 5)
            .load(REFERENCE_BI5)
        )
        t0 = time.perf_counter()
        run_noop(df)
        timings["bi5_scan"] = round(time.perf_counter() - t0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
