#!/usr/bin/env python
"""One-off probe: did the round-3 scaled-tier changes (bucketed layout
+ 64 MB broadcast threshold) regress the non-join x10 queries?

Times each query three ways at x10:
  plain      — plain parquet, default 10 MB broadcast threshold (r2 setup)
  bcast64    — plain parquet, 64 MB threshold
  bucketed   — bucketed layout + 64 MB threshold (r3 setup)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark, synth_scaled_dir, timed  # noqa: E402

QUERIES = [
    "q1_pricing_summary",
    "b5_groupby_count",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "join_asof_events_orders",
    "events_daily_ohlc",
    "text_stats",
]


def main() -> None:
    from spark_bi5_datasource_spark import plans, register
    from spark_bi5_datasource_spark.plans.tables import ensure_bucketed_layout

    spark = build_spark()
    register(spark)
    scaled = synth_scaled_dir("/root/testdata/sf0.1", 10)
    qs = {n: fn for n, (fn, _s, _b) in plans.CATALOG.items()}

    out: dict[str, dict[str, float]] = {q: {} for q in QUERIES}

    # warm
    spark.read.parquet(f"{scaled}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().write.format("noop").mode("overwrite").save()

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
    spark.conf.set("spark.bi5.bucketedDir", "")
    for q in QUERIES:
        out[q]["plain"] = timed(qs[q](spark, scaled), runs=3)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    for q in QUERIES:
        out[q]["bcast64"] = timed(qs[q](spark, scaled), runs=3)

    ensure_bucketed_layout(spark, scaled)
    for q in QUERIES:
        out[q]["bucketed"] = timed(qs[q](spark, scaled), runs=3)

    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
