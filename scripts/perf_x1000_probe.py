#!/usr/bin/env python
"""x1000 probe: sf100-equivalent (600M lineitem / 150M orders / 100M
events — ~28 GB parquet), the third 10x step of the scale ladder.

One-off (not part of bench.py: generation is tens of minutes and the
driver's per-round bench must stay fast).  Replicates the sf0.1
tables 1000x with per-replica key strides, then times Spark vs DuckDB
(threads=32) on the identical files for the aggregate-shaped headline
queries plus the q3/q5 join shapes.  Results are recorded in
SCALE_NOTES.md.

Spark reads the multi-file tables with default maxPartitionBytes
(files this size split naturally).  The join shapes (q3/q5) are then
re-timed on the co-located bucketed layout (ensure_bucketed_layout, a
one-time ~7-minute build cached beside the data): at 600M x 150M the
unbucketed shuffle spills/GC-thrashes, and the bucketed rerun is the
deployment-contract number — both are reported.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CPUS, SF_DIR, build_spark, synth_scaled_dir, timed  # noqa: E402

TABLES = [
    "lineitem", "orders", "customer", "supplier", "nation", "region",
    "events", "documents",
]
QUERIES = [
    "b5_groupby_count",
    "q1_pricing_summary",
    "events_daily_ohlc",
    "events_sessionize",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    # LLM-pipeline shape with a twin at this scale: exact token-count
    # vocabulary over 5M documents (the sketch tier is deliberately NOT
    # probed here — on the fixture's 29-token universe the sketch pass
    # is pure overhead by design; see SCALE_NOTES round-4).
    "tok_vocab_topk",
]
# Spark-only shapes: timed and reported without a DuckDB twin.
# join_asof: DuckDB's ASOF JOIN was already 14 s at x100 and degrades
# superlinearly — at x1000 it would dominate the probe wall-clock
# without adding information (the x100 tier pins the ratio), but the
# Spark-side absolute at 100M events is recorded here.
# dedup_minhash: at 5M documents (every doc has 1000 exact copies —
# the ×1000 replication is itself the crawl-duplication pathology) the
# exact shingle-join oracle is quadratic in the duplication factor:
# DuckDB exhausts 48 GB of spill disk and aborts, while the Spark plan
# (exact-dup collapse first, then banded LSH) finishes in ~2.3 s.
SPARK_ONLY = ["join_asof_events_orders", "dedup_minhash"]


def main() -> None:
    import duckdb

    from spark_bi5_datasource_spark import plans, register

    t0 = time.time()
    scaled = synth_scaled_dir(SF_DIR, 1000, TABLES)
    print(f"# generation/cache: {time.time() - t0:.0f}s", file=sys.stderr)

    spark = build_spark()
    register(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    qs = {n: fn for n, (fn, _s, _b) in plans.CATALOG.items()}
    oracles = plans.oracle_sql()

    spark_t: dict[str, float] = {}
    for q in QUERIES:
        spark_t[q] = timed(qs[q](spark, scaled), runs=2)
        print(f"# spark {q}: {spark_t[q]}", file=sys.stderr)
    spark_only_t: dict[str, float] = {}
    for q in SPARK_ONLY:
        spark_only_t[q] = timed(qs[q](spark, scaled), runs=2)
        print(f"# spark (no duck twin) {q}: {spark_only_t[q]}", file=sys.stderr)
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

    # join shapes again, on the bucketed layout (one-time build, cached)
    spark = build_spark()
    register(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    from spark_bi5_datasource_spark.plans.tables import ensure_bucketed_layout

    t0 = time.time()
    ensure_bucketed_layout(spark, scaled)
    print(f"# bucketed layout (cached after first run): {time.time() - t0:.0f}s",
          file=sys.stderr)
    bucketed_t: dict[str, float] = {}
    for q in ("q3_top_revenue_orders", "q5_region_revenue"):
        bucketed_t[q] = timed(qs[q](spark, scaled), runs=2)
        print(f"# spark bucketed {q}: {bucketed_t[q]}", file=sys.stderr)
    spark.stop()

    s_total = round(sum(spark_t.values()), 3)
    d_total = round(sum(duck_t.values()), 3)
    sb_total = round(
        sum(bucketed_t.get(q, spark_t[q]) for q in QUERIES), 3
    )
    out = {
        "x": 1000,
        "spark": spark_t,
        "spark_only_no_duckdb_twin": spark_only_t,
        "spark_bucketed_joins": bucketed_t,
        "duckdb": duck_t,
        "per_query_ratio": {
            q: (round(spark_t[q] / duck_t[q], 2) if duck_t[q] else None)
            for q in QUERIES
        },
        "spark_total": s_total,
        "spark_total_bucketed_layout": sb_total,
        "duckdb_total": d_total,
        "ratio": round(s_total / d_total, 2) if d_total else None,
        "ratio_bucketed_layout": (
            round(sb_total / d_total, 2) if d_total else None
        ),
    }
    line = json.dumps(out)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_X1000.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(line)


if __name__ == "__main__":
    main()
