#!/usr/bin/env python
"""Probe: do q5/sessionize/asof converge under 2x vs DuckDB at x100
(60M lineitem / 10M events) like the four queries already in the
bench's x100 section?"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "24")

from bench import CPUS, SF_DIR, build_spark, synth_scaled_dir, timed  # noqa: E402

QUERIES = ["q5_region_revenue", "events_sessionize", "join_asof_events_orders"]
TABLES = ["lineitem", "orders", "customer", "supplier", "nation", "region", "events"]


def main() -> None:
    import duckdb

    from spark_bi5_datasource_spark import plans, register
    from spark_bi5_datasource_spark.plans.tables import ensure_bucketed_layout

    spark = build_spark()
    register(spark)
    scaled = synth_scaled_dir(SF_DIR, 100, TABLES)
    ensure_bucketed_layout(spark, scaled)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(256 * 1024 * 1024))
    qs = {n: fn for n, (fn, _s, _b) in plans.CATALOG.items()}
    out = {}
    for q in QUERIES:
        out[q] = {"spark": timed(qs[q](spark, scaled), runs=3)}

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={CPUS}")
    for tb in TABLES:
        con.execute(f"CREATE VIEW {tb} AS FROM '{scaled}/{tb}.parquet'")
    oracles = plans.oracle_sql()
    for q in QUERIES:
        con.execute(oracles[q]).fetchall()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(oracles[q]).fetchall()
            best = min(best, time.perf_counter() - t0)
        out[q]["duckdb"] = round(best, 3)
        out[q]["ratio"] = round(out[q]["spark"] / best, 2)
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
