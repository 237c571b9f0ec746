#!/usr/bin/env python
"""x1000 probe for the round-9/round-10 ops (cached scaled dir from
perf_x1000_probe.py: 600M lineitem / 150M orders / 100M events / 5M
documents / 10M embeddings, ~29 GB parquet).

Same method as perf_x1000_round8.py — Spark local[32] vs DuckDB
threads=32 on identical files, min of 2 after warm-up — restricted to
the new ops.  Results → BENCH_X1000_R9.json + SCALE_NOTES.md.

Deliberately EXCLUDED:

* dedup_ngram_containment (and its jaccard twin) — the scaled corpus
  replicates every text 1000×, so the TRUE answer contains C(1000,2)
  ≈ 500k pairs per duplicated text (≈2.5B output rows).  That is
  output cardinality, not plan cost: the inverted index collapses to
  the ~5k distinct texts and stays cheap, but materializing the
  member fan-out is the query's own answer.  At real scale the
  within-group leg is the one a user thresholds or collapses to
  cluster ids (dedup_components / dedup_cluster_sizes are the
  linear-output variants probed elsewhere).
* graph_neighbor_jaccard — probed separately (SCALE_NOTES.md "graph
  pair-counting" entry): the 600M-row co-purchase pair stream is
  ~1.2B rows, Spark ≈260 s, and the DuckDB oracle twin exhausted a
  48 GB disk mid-GROUP BY on this box (and DNF in 9 min at x100,
  where Spark takes 87 s).  Including it would make the probe a
  disk-survival test, not a timing."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# multi-branch jobs (cuped's moment frames, benford's totals) share the
# probe-wide heap rule from perf_x1000_round8.py
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from bench import CPUS, SF_DIR, build_spark, synth_scaled_dir, timed  # noqa: E402

TABLES = [
    "lineitem", "orders", "customer", "supplier", "nation", "region",
    "events", "documents", "embeddings",
]
QUERIES = [
    # round 9
    "window_rsi_cutler",
    "window_atr_bands",
    "dq_distribution_drift",
    "events_ab_cuped",
    "events_forecast_snaive",
    "corpus_epoch_plan",
    "tok_fertility_by_lang",
    "sim_mrl_prefix_recall",
    # round 10
    "window_stochastic_osc",
    "window_donchian_channels",
    "dq_benford_first_digit",
    "corpus_source_gini",
    "events_ab_srm_check",
    "tok_ttr_by_source",
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
        os.path.join(os.path.dirname(__file__), "..", "BENCH_X1000_R9.json"),
        "w",
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
