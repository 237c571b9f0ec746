#!/usr/bin/env python
"""Knob sweep over the two remaining constant-factor scan+agg gaps at
x1000 (b5_groupby_count 3.84x, events_daily_ohlc 3.56x vs DuckDB on
identical files; q1 rides along at 1.64x as the control).

The plans are already minimal — single columnar scan, pruned to the
grouped/aggregated columns, one partial+final hash aggregate — so any
remaining win must come from scan/decode/agg engine constants.  Knobs:

  A  baseline (bench.py build_spark config)
  B  columnarReaderBatchSize 4096 -> 16384 (fewer per-batch crossings)
  C  files.maxPartitionBytes 128m -> 512m  (fewer tasks, less overhead)
  D  off-heap columnar reading (offHeap 8g + columnVector.offheap)
  E  B + C combined

Each config gets a fresh JVM (configs are session-start-only), 1 warm
+ 2 timed runs, min reported.  Results land in SCALE_NOTES.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CPUS, SF_DIR, synth_scaled_dir, timed  # noqa: E402

QUERIES = ["b5_groupby_count", "q1_pricing_summary", "events_daily_ohlc"]

CONFIGS: dict[str, dict[str, str]] = {
    "A_baseline": {},
    "B_batch16k": {"spark.sql.parquet.columnarReaderBatchSize": "16384"},
    "C_part512m": {"spark.sql.files.maxPartitionBytes": str(512 * 1024 * 1024)},
    "D_offheap": {
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "8g",
        "spark.sql.columnVector.offheap.enabled": "true",
    },
    "E_batch16k_part512m": {
        "spark.sql.parquet.columnarReaderBatchSize": "16384",
        "spark.sql.files.maxPartitionBytes": str(512 * 1024 * 1024),
    },
}


def build(conf: dict[str, str]):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("exp-agg-constants")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in conf.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> None:
    from spark_bi5_datasource_spark import plans

    scaled = synth_scaled_dir(SF_DIR, 1000, ["lineitem", "events"])
    qs = {n: fn for n, (fn, _s, _b) in plans.CATALOG.items()}

    out: dict[str, dict[str, float]] = {}
    for cname, conf in CONFIGS.items():
        spark = build(conf)
        out[cname] = {}
        for q in QUERIES:
            out[cname][q] = timed(qs[q](spark, scaled), runs=2)
            print(f"# {cname} {q}: {out[cname][q]}", file=sys.stderr, flush=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
