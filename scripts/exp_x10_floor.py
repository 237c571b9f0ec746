#!/usr/bin/env python
"""Decompose the x10 'floor tax': how much of each sub-second query is
the fixed per-job cost (scheduling, plan, codegen cache hits, noop
commit) versus actual data compute?

Method: run each floor-bound query twice — once on the x10 tables,
once on EMPTY twins with identical schemas.  The empty-twin time is
the pure per-query floor for that exact plan shape (same number of
stages, same codegen, zero rows).  data_compute = t(x10) - t(empty).
If data_compute is comparable to DuckDB's total time, the x10 ratio
gap is the floor, not the plans.

Also A/Bs spark.sql.shuffle.partitions 32 vs 8 at x10 (AQE coalesce
already on) to answer the verdict's tuning question.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CPUS, SF_DIR, build_spark, synth_scaled_dir, timed  # noqa: E402

FLOOR_QUERIES = [
    "b5_groupby_count",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "events_daily_ohlc",
]
TABLES = ["lineitem", "orders", "customer", "nation", "region", "events"]


def make_empty_twin(scaled: str) -> str:
    """Write 0-row parquet twins with the same schemas."""
    import duckdb

    out = "/tmp/spark_bi5_bench_empty_twin"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for tb in TABLES:
        dst = os.path.join(out, f"{tb}.parquet")
        if os.path.exists(dst):
            continue
        con.execute(
            f"COPY (SELECT * FROM '{scaled}/{tb}.parquet' LIMIT 0) "
            f"TO '{dst}' (FORMAT PARQUET)"
        )
    con.close()
    return out


def main() -> None:
    import duckdb

    from spark_bi5_datasource_spark import plans, register

    scaled = synth_scaled_dir(SF_DIR, 10)
    empty = make_empty_twin(scaled)

    spark = build_spark()
    register(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    qs = {n: fn for n, (fn, _s, _b) in plans.CATALOG.items()}

    print("query                 x10(32sp)  x10(8sp)  empty-twin  data-compute")
    rows = []
    for q in FLOOR_QUERIES:
        t32 = timed(qs[q](spark, scaled), runs=3)
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        t8 = timed(qs[q](spark, scaled), runs=3)
        spark.conf.set("spark.sql.shuffle.partitions", CPUS)
        tempty = timed(qs[q](spark, empty), runs=3)
        rows.append((q, t32, t8, tempty))
        print(f"{q:22s} {t32:8.3f} {t8:9.3f} {tempty:10.3f} {t32 - tempty:11.3f}",
              flush=True)

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={CPUS}")
    for tb in TABLES + ["supplier", "part", "documents", "embeddings"]:
        p = f"{scaled}/{tb}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tb} AS FROM '{p}'")
    oracles = plans.oracle_sql()
    import time as _t

    print("\nquery                 duckdb     spark-data-compute  compute-ratio")
    for q, t32, _t8, tempty in rows:
        con.execute(oracles[q]).fetchall()
        best = float("inf")
        for _ in range(3):
            s = _t.perf_counter()
            con.execute(oracles[q]).fetchall()
            best = min(best, _t.perf_counter() - s)
        dc = t32 - tempty
        print(f"{q:22s} {best:8.3f} {dc:17.3f} {dc / best if best else 0:14.2f}",
              flush=True)
    con.close()
    spark.stop()


if __name__ == "__main__":
    main()
