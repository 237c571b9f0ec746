#!/usr/bin/env python
"""x1000 probe for the round-11 catalog additions (cached scaled dir:
600M lineitem / 150M orders / 100M events / 5M documents / 2M
embeddings, ~29 GB parquet).

Same method as perf_x1000_round8/9.py — Spark local[32] vs DuckDB
threads=32 on identical files, min of 2 after warm-up.  Exclusions by
design (the jaccard rule, SCALE_NOTES "graph pair-counting"):
`basket_association_lift` / `graph_degree_distribution` ride the same
1.2B-row co-purchase pair stream whose DuckDB twin disk-died at
x100/x1000 — they stay on the x10 roster.
`dedup_winnowing_fingerprints` is probed Spark-only at x1000 (the SQL
twin unnests every char position — ~5B gram rows at this tier — and
exists as a fixture-scale correctness pin, not a scaled engine) plus
a head-to-head at x10 where the twin is feasible.

Results → BENCH_X1000_R11.json + SCALE_NOTES.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from bench import CPUS, SF_DIR, build_spark, synth_scaled_dir, timed  # noqa: E402

TABLES = [
    "lineitem", "orders", "customer", "supplier", "nation", "region",
    "events", "documents", "embeddings",
]
QUERIES = [
    "window_aroon",
    "window_obv_daily",
    "window_ichimoku",
    "events_burst_hours",
    "dq_null_profile",
    "dq_order_reconciliation",
    "orders_ship_latency",
    "text_readability_scores",
    "dedup_prefix_clusters",
    "corpus_lang_mix",
    "sim_norm_histogram",
    "corpus_quality_prune_curve",
]
WINNOW = "dedup_winnowing_fingerprints"


def duck_sweep(con, oracles, queries):
    out = {}
    for q in queries:
        con.execute(oracles[q]).fetchall()
        best = float("inf")
        for _ in range(2):
            s = time.perf_counter()
            con.execute(oracles[q]).fetchall()
            best = min(best, time.perf_counter() - s)
        out[q] = round(best, 3)
        print(f"# duckdb {q}: {out[q]}", file=sys.stderr)
    return out


def main() -> None:
    import duckdb

    from spark_bi5_datasource_spark import plans, register

    t0 = time.time()
    scaled = synth_scaled_dir(SF_DIR, 1000, TABLES)
    scaled10 = synth_scaled_dir(SF_DIR, 10, ["documents"])
    print(f"# generation/cache: {time.time() - t0:.0f}s", file=sys.stderr)

    spark = build_spark()
    register(spark)
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
    )
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    qs = {n: fn for n, (fn, _s, _b) in plans.CATALOG.items()}
    oracles = plans.oracle_sql()

    spark_t: dict[str, float] = {}
    for q in QUERIES:
        spark_t[q] = timed(qs[q](spark, scaled), runs=2)
        print(f"# spark {q}: {spark_t[q]}", file=sys.stderr)
    winnow_spark_x1000 = timed(qs[WINNOW](spark, scaled), runs=2)
    print(f"# spark winnow x1000: {winnow_spark_x1000}", file=sys.stderr)
    winnow_spark_x10 = timed(qs[WINNOW](spark, scaled10), runs=2)
    spark.stop()

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={CPUS}")
    for tb in TABLES:
        con.execute(f"CREATE VIEW {tb} AS FROM '{scaled}/{tb}.parquet'")
    duck_t = duck_sweep(con, oracles, QUERIES)
    con.close()

    con10 = duckdb.connect()
    con10.execute(f"PRAGMA threads={CPUS}")
    con10.execute(f"CREATE VIEW documents AS FROM '{scaled10}/documents.parquet'")
    winnow_duck_x10 = duck_sweep(con10, oracles, [WINNOW])[WINNOW]
    con10.close()

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
        "winnow": {
            "spark_x1000": winnow_spark_x1000,
            "spark_x10": winnow_spark_x10,
            "duckdb_x10": winnow_duck_x10,
            "ratio_x10": (
                round(winnow_spark_x10 / winnow_duck_x10, 2)
                if winnow_duck_x10 else None
            ),
        },
    }
    line = json.dumps(out)
    print(line)
    with open(
        os.path.join(os.path.dirname(__file__), "..", "BENCH_X1000_R11.json"),
        "w",
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
