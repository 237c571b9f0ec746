#!/usr/bin/env python
"""r14 VERDICT item 1a: A/B `spark.io.compression.codec` (lz4 default
vs zstd) on the shuffle-heaviest x100 queries.  The codec is a core
conf fixed at SparkContext creation, so each invocation runs ONE codec
in a fresh JVM; alternate invocations (lz4, zstd, lz4, zstd) and read
the pairs against their sentinel legs.

    python scripts/r14_codec_ab.py --codec lz4  --tag a1
    python scripts/r14_codec_ab.py --codec zstd --tag b1
    ...

Appends one JSON line per invocation to R14_CODEC_AB.jsonl.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = ["basket_association_lift", "sql_tpch_q21", "dedup_winnow_pairs"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--codec", required=True, choices=["lz4", "zstd", "snappy"])
    ap.add_argument("--tag", default="")
    ap.add_argument("--x", type=int, default=100)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--queries", default=",".join(QUERIES))
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_MEM", "32g")
    d = bench.synth_scaled_dir(
        SRC, args.x,
        tables=["documents", "lineitem", "events", "embeddings", "orders",
                "customer", "supplier", "nation", "region", "part"],
    ) if args.x > 1 else SRC

    # same session as bench.build_spark() plus the codec under test
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{bench.CPUS}]")
        .appName(f"r14-codec-{args.codec}")
        .config("spark.io.compression.codec", args.codec)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", bench.CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "16g"))
        .config("spark.sql.files.maxPartitionBytes", str(512 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from spark_bi5_datasource_spark import plans, register

    register(spark)
    qs = {n: fn for n, (fn, _s, _b) in plans.CATALOG.items()}

    out: dict = {"codec": args.codec, "tag": args.tag, "x": args.x,
                 "loadavg": os.getloadavg()}
    out["sentinel_start"] = bench.scan_sentinel(spark, d)
    timings: dict[str, float] = {}
    for name in args.queries.split(","):
        spark.sparkContext.setJobDescription(f"r14-codec-{args.codec}:{name}")
        timings[name] = bench.timed(qs[name](spark, d), runs=args.runs)
        print(f"{name}: {timings[name]}", flush=True)
    out["sentinel_end"] = bench.scan_sentinel(spark, d)
    out["queries"] = timings
    with open(os.path.join(REPO, "R14_CODEC_AB.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
