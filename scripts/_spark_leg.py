#!/usr/bin/env python
"""Fresh-JVM single-query Spark timing leg (r10 drift protocol).

The round-9 drift finding (SCALE_NOTES "box shuffle-I/O drift")
showed identical plans degrade monotonically WITHIN a Spark session
(blockmgr accumulation + dirty-page backlog) and a fresh JVM resets
the clock.  Every probe that quotes a ratio therefore runs its Spark
leg in a subprocess of this runner — one JVM, one query, warm
min-of-N, exit — with the DuckDB leg timed by the parent immediately
after (same box state, minutes apart).

Usage: _spark_leg.py QUERY SCALED_DIR BUCKET_TABLES_CSV RUNS [SHUF]
Prints one JSON line {"query": ..., "sec": ...} on stdout.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from bench import build_spark, timed  # noqa: E402


def main() -> None:
    query, scaled, btabs, runs = sys.argv[1:5]
    shuf = sys.argv[5] if len(sys.argv) > 5 else "128"

    from spark_bi5_datasource_spark import plans
    from spark_bi5_datasource_spark.plans.tables import (
        ensure_bucketed_layout,
    )

    spark = build_spark()
    spark.conf.set("spark.sql.shuffle.partitions", shuf)
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
    )
    if btabs:
        ensure_bucketed_layout(spark, scaled, tables=btabs.split(","))
    fn = plans.CATALOG[query][0]
    sec = timed(fn(spark, scaled), runs=int(runs))
    print(json.dumps({"query": query, "sec": sec}))
    spark.stop()


if __name__ == "__main__":
    main()
