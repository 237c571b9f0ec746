#!/usr/bin/env python
"""x100 probe: scan parallelism vs maxPartitionBytes.

The DuckDB-written scaled tables are one parquet file each (events
108 MB, lineitem 1.3 GB); at the default 128 MB maxPartitionBytes a
single-file table scans on ONE core.  Measure the floor queries under
different split sizes, bucketed and plain.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark, synth_scaled_dir, timed  # noqa: E402

QUERIES = ["events_daily_ohlc", "q1_pricing_summary", "b5_groupby_count", "q3_top_revenue_orders"]


def main() -> None:
    from spark_bi5_datasource_spark import plans, register
    from spark_bi5_datasource_spark.plans.tables import ensure_bucketed_layout

    spark = build_spark()
    register(spark)
    scaled = synth_scaled_dir(
        "/root/testdata/sf0.1", 100, ["lineitem", "orders", "customer", "events"]
    )
    qs = {n: fn for n, (fn, _s, _b) in plans.CATALOG.items()}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))

    out: dict[str, dict[str, float]] = {q: {} for q in QUERIES}

    def sweep(tag: str) -> None:
        for q in QUERIES:
            out[q][tag] = timed(qs[q](spark, scaled), runs=3)

    # plain parquet first
    spark.conf.set("spark.bi5.bucketedDir", "")
    for mb in (128, 32, 8):
        spark.conf.set("spark.sql.files.maxPartitionBytes", f"{mb}m")
        sweep(f"plain_{mb}m")

    ensure_bucketed_layout(spark, scaled)
    for mb in (128, 16):
        spark.conf.set("spark.sql.files.maxPartitionBytes", f"{mb}m")
        sweep(f"bucket_{mb}m")

    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
