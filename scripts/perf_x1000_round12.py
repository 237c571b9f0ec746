#!/usr/bin/env python
"""r8 ask #6: x1000 probe of the round-11 stragglers + refresh rows
for the two r8-rewritten ops.

Same method as perf_x1000_round11.py — Spark local[32] vs DuckDB
threads=32 on identical files (600M lineitem / 100M events / 5M
documents / 2M embeddings), min of 2 after warm-up.

Exclusions are recorded IN the output JSON (the r7 verdict asked for
them in the bench file, not only SCALE_NOTES):
- basket_association_lift / graph_degree_distribution ride the same
  1.2B-row co-purchase pair stream whose DuckDB twin disk-died at
  x100/x1000 (the jaccard pair-counting rule) — they stay on the x10
  roster.
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
    "corpus_langid_confusion",
    "dq_duplicate_event_audit",
    "agg_count_min_exact",
    # r8 rewrites, refreshed:
    "events_new_vs_returning",
    "text_url_email_stats",
]
# corpus-sized distinct ops: ONE cold execution each (a warm
# min-of-2 would triple a ~8-min pass for no extra information)
HEAVY = ["text_contamination_matrix"]
EXCLUSIONS = {
    "basket_association_lift": (
        "1.2B-row co-purchase pair stream; DuckDB twin disk-died at "
        "x100/x1000 (jaccard pair-counting rule) — x10 roster only"
    ),
    "graph_degree_distribution": (
        "same pair stream as basket_association_lift — x10 roster only"
    ),
    "dedup_semantic_semdedup": (
        "the catalog entry is the nlist=1 EXACT mode (its intra-cell "
        "pair set IS the all-pairs set — C(2M,2) ~ 2e12 scored pairs "
        "at x1000; the provably-exact fixture-scale pin, not a scaled "
        "engine).  The production path, semantic_dedup(nlist>1), is "
        "measured Spark-only at x100 in SCALE_NOTES (r8)"
    ),
}


def main() -> None:
    import duckdb

    from spark_bi5_datasource_spark import plans, register

    t0 = time.time()
    scaled = synth_scaled_dir(SF_DIR, 1000, TABLES)
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
    import time as _t
    from bench import run_noop
    cold: dict[str, float] = {}
    for q in HEAVY:
        t0 = _t.perf_counter()
        run_noop(qs[q](spark, scaled))
        cold[q] = round(_t.perf_counter() - t0, 3)
        print(f"# spark {q} (cold x1): {cold[q]}", file=sys.stderr)
    spark.stop()

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={CPUS}")
    for tb in TABLES:
        con.execute(f"CREATE VIEW {tb} AS FROM '{scaled}/{tb}.parquet'")
    duck_t: dict[str, float] = {}
    for q in QUERIES + HEAVY:
        if q not in oracles:
            continue
        runs = 1 if q in HEAVY else 2
        if q not in HEAVY:
            con.execute(oracles[q]).fetchall()  # warm-up
        best = float("inf")
        for _ in range(runs):
            s = time.perf_counter()
            con.execute(oracles[q]).fetchall()
            best = min(best, time.perf_counter() - s)
        duck_t[q] = round(best, 3)
        print(f"# duckdb {q}: {duck_t[q]}", file=sys.stderr)
    con.close()

    out = {
        "x": 1000,
        "spark": spark_t,
        "spark_cold_single_run": cold,
        "duckdb": duck_t,
        "per_query_ratio": {
            **{q: (round(spark_t[q] / duck_t[q], 2) if duck_t.get(q) else None)
               for q in QUERIES},
            **{q: (round(cold[q] / duck_t[q], 2) if duck_t.get(q) else None)
               for q in HEAVY},
        },
        "exclusions": EXCLUSIONS,
    }
    line = json.dumps(out)
    print(line)
    with open(
        os.path.join(os.path.dirname(__file__), "..", "BENCH_X1000_R12.json"),
        "w",
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
