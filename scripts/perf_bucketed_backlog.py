#!/usr/bin/env python
"""r9: extend the bucketed-layout measurement to
orders_backlog_aging (the same orderkey-keyed fact-fact shape that gave
dq_order_reconciliation 5.4x at x100).

Method mirrors the r7 reconciliation measurement: x100 tier (60M
lineitem / 15M orders), min-of-2 warm runs, plain parquet vs the
CLUSTERED BY(orderkey) SORTED layout (tables.ensure_bucketed_layout);
exchange count read off the executed plan string.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from bench import SF_DIR, build_spark, synth_scaled_dir, timed  # noqa: E402

QUERY = "orders_backlog_aging"
TABLES = ["lineitem", "orders"]


def exchanges(df) -> int:
    p = df._jdf.queryExecution().executedPlan().toString()
    return p.count("Exchange hashpartitioning")


def main() -> None:
    from spark_bi5_datasource_spark import plans

    scaled = synth_scaled_dir(SF_DIR, 100, TABLES)
    spark = build_spark()
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    fn = plans.CATALOG[QUERY][0]

    plain_df = fn(spark, scaled)
    plain = timed(plain_df, runs=2)
    plain_ex = exchanges(plain_df)
    print(f"# plain: {plain}s, {plain_ex} hash exchanges", file=sys.stderr)

    from spark_bi5_datasource_spark.plans.tables import (
        ensure_bucketed_layout,
    )

    ensure_bucketed_layout(spark, scaled)
    buck_df = fn(spark, scaled)
    buck = timed(buck_df, runs=2)
    buck_ex = exchanges(buck_df)
    print(f"# bucketed: {buck}s, {buck_ex} hash exchanges", file=sys.stderr)

    out = {
        "query": QUERY,
        "x": 100,
        "plain_sec": plain,
        "plain_hash_exchanges": plain_ex,
        "bucketed_sec": buck,
        "bucketed_hash_exchanges": buck_ex,
        "speedup": round(plain / buck, 2) if buck else None,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
