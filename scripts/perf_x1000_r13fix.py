#!/usr/bin/env python
"""r9: re-pin the two round-13-straggler rewrites at x1000 with SAME-
SESSION DuckDB legs, plus a dq_duplicate_event_audit re-measurement —
the r9 box-I/O drift finding (SCALE_NOTES) means cross-day ratios are
not comparable, so each Spark number here is bracketed by its DuckDB
twin minutes apart on the same box state.

* orders_backlog_aging — the EXISTS-split rewrite (no 150M-group
  max-agg; scripts/exp_backlog_variants.py sweep: 84.1 shipped →
  32.0 exists-split).
* dq_doc_embedding_coverage — the one-pass full-outer rewrite
  (4.97 → 3.67 in scripts/exp_coverage_variants.py).
* dq_duplicate_event_audit — unchanged plan; re-pinned because the
  r12 4.74 s record predates the I/O drift.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from bench import CPUS, SF_DIR, build_spark, synth_scaled_dir, timed  # noqa: E402

QUERIES = {
    "orders_backlog_aging": ["lineitem", "orders"],
    "dq_doc_embedding_coverage": ["documents", "embeddings"],
    "dq_duplicate_event_audit": ["events"],
}


def main() -> None:
    import duckdb

    from spark_bi5_datasource_spark import plans

    tables = sorted({tb for ts in QUERIES.values() for tb in ts})
    scaled = synth_scaled_dir(SF_DIR, 1000, tables)

    spark = build_spark()
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    qs = {n: fn for n, (fn, _s, _b) in plans.CATALOG.items()}
    oracles = plans.oracle_sql()

    spark_t = {}
    for q in QUERIES:
        spark_t[q] = timed(qs[q](spark, scaled), runs=2)
        print(f"# spark {q}: {spark_t[q]}", file=sys.stderr)
    spark.stop()

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={CPUS}")
    for tb in tables:
        con.execute(f"CREATE VIEW {tb} AS FROM '{scaled}/{tb}.parquet'")
    duck_t = {}
    for q in QUERIES:
        sql = oracles[q]
        con.execute(sql).fetchall()
        best = float("inf")
        for _ in range(2):
            s = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - s)
        duck_t[q] = round(best, 3)
        print(f"# duckdb {q}: {duck_t[q]}", file=sys.stderr)
    con.close()

    out = {
        "x": 1000,
        "spark": spark_t,
        "duckdb": duck_t,
        "per_query_ratio": {
            q: round(spark_t[q] / duck_t[q], 2) for q in QUERIES
        },
        "note": (
            "same-box-state re-pin after the r9 shuffle-I/O drift "
            "finding; supersedes the BENCH_X1000_R13 rows for these "
            "queries"
        ),
    }
    line = json.dumps(out)
    print(line)
    with open(
        os.path.join(
            os.path.dirname(__file__), "..", "BENCH_X1000_R13FIX.json"
        ),
        "w",
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
