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


def timed(df, runs: int = 2) -> float:
    """Min of N runs — steady-state plan time, not first-run JIT/
    footer-cache warmup (query results are deterministic; warm runs
    are what a resident cluster observes)."""
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        run_noop(df)
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def synth_bi5_tree(root: str, n_files: int = 24, recs_per_file: int = 20_000) -> str:
    """Deterministic synthetic tick tree (~480k rows) for a scan
    throughput number at a meaningful size; cached across runs."""
    import lzma
    import struct

    done = os.path.join(root, ".complete")
    if os.path.exists(done):
        return root
    for h in range(n_files):
        d = os.path.join(root, "EURUSD", "2020", str(h % 12), str(h % 27 + 1))
        os.makedirs(d, exist_ok=True)
        recs = b"".join(
            struct.pack(
                ">3I2f",
                (i * 180_000) // recs_per_file * 20 + i % 20,
                112000 + (i * 7 + h) % 500,
                111990 + (i * 5 + h) % 500,
                float(i % 10) + 0.5,
                float(i % 7) + 0.25,
            )
            for i in range(recs_per_file)
        )
        with open(os.path.join(d, f"{h % 24:02d}h_ticks.bi5"), "wb") as f:
            f.write(lzma.compress(recs, format=lzma.FORMAT_ALONE))
    with open(done, "w") as f:
        f.write("ok")
    return root


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
        timings[name] = timed(fn(spark, SF_DIR))

    if os.path.isdir(REFERENCE_BI5):
        # like-for-like vs the reference's own fixture tree (BASELINE.md)
        df = spark.read.format("bi5").option("digits", 5).load(REFERENCE_BI5)
        # scans spawn a fresh python-worker cohort on first touch; use a
        # third run so min-of-N reflects the resident steady state
        timings["bi5_scan"] = timed(df, runs=3)

    # scan throughput at a non-trivial size (480k rows, 24 files)
    tree = synth_bi5_tree("/tmp/spark_bi5_bench_tree")
    big = spark.read.format("bi5").option("digits", 5).load(tree)
    timings["bi5_scan_480k"] = timed(big, runs=3)

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
