#!/usr/bin/env python
"""x1000 probe for the round-8 governance/corpus ops (cached scaled
dir from perf_x1000_probe.py: 600M lineitem / 150M orders / 100M
events / 5M documents, ~29 GB parquet).

Same method as perf_x1000_probe.py — Spark local[32] vs DuckDB
threads=32 on the identical files, min of 2 runs after warm-up —
restricted to the new ops so the incremental probe stays minutes, not
the full ladder.  Results → BENCH_X1000_R8.json + SCALE_NOTES.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# dq_expectations unions six branches (two 600M/150M-key anti-joins +
# whole-table distinct aggs) into ONE job, so their shuffle-map stages
# run concurrently: at 16g the 32 parallel SMJ sorts starve the unified
# memory pool (UNABLE_TO_ACQUIRE_MEMORY, observed).  The probe gets the
# q5-rule heap (a quarter of the 128 GiB box was "conservative" for one
# SMJ; six concurrent stages get half) — a cluster gives each of these
# stages its own executors, so this is a local-harness artifact, not a
# plan defect.
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from bench import CPUS, SF_DIR, build_spark, synth_scaled_dir, timed  # noqa: E402

TABLES = [
    "lineitem", "orders", "customer", "supplier", "nation", "region",
    "events", "documents",
]
QUERIES = [
    "dq_expectations",
    "dq_k_anonymity",
    "tok_zipf_profile",
    "text_source_diversity",
    "events_top_paths",
    "events_wau_sliding",
    "window_bollinger_bands",
    "text_boilerplate_spans",
]


def main() -> None:
    import duckdb

    from spark_bi5_datasource_spark import plans, register

    t0 = time.time()
    scaled = synth_scaled_dir(SF_DIR, 1000, TABLES)
    print(f"# generation/cache: {time.time() - t0:.0f}s", file=sys.stderr)

    spark = build_spark()
    register(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    # finer map-side sorts under concurrent union branches: 128 initial
    # shuffle partitions keep each SMJ sort ~5M rows so spilling stays
    # incremental; AQE coalesces the small ones back after the fact
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    qs = {n: fn for n, (fn, _s, _b) in plans.CATALOG.items()}
    oracles = plans.oracle_sql()

    spark_t: dict[str, float] = {}
    for q in QUERIES:
        spark_t[q] = timed(qs[q](spark, scaled), runs=2)
        print(f"# spark {q}: {spark_t[q]}", file=sys.stderr)
    spark.stop()

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={CPUS}")
    for tb in TABLES:
        con.execute(f"CREATE VIEW {tb} AS FROM '{scaled}/{tb}.parquet'")
    duck_t: dict[str, float] = {}
    for q in QUERIES:
        con.execute(oracles[q]).fetchall()
        best = float("inf")
        for _ in range(2):
            s = time.perf_counter()
            con.execute(oracles[q]).fetchall()
            best = min(best, time.perf_counter() - s)
        duck_t[q] = round(best, 3)
        print(f"# duckdb {q}: {duck_t[q]}", file=sys.stderr)
    con.close()

    s_total = round(sum(spark_t.values()), 3)
    d_total = round(sum(duck_t.values()), 3)
    out = {
        "x": 1000,
        "spark": spark_t,
        "duckdb": duck_t,
        "per_query_ratio": {
            q: (round(spark_t[q] / duck_t[q], 2) if duck_t[q] else None)
            for q in QUERIES
        },
        "spark_total": s_total,
        "duckdb_total": d_total,
        "ratio": round(s_total / d_total, 2) if d_total else None,
    }
    line = json.dumps(out)
    print(line)
    with open(
        os.path.join(os.path.dirname(__file__), "..", "BENCH_X1000_R8.json"),
        "w",
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
