#!/usr/bin/env python
"""Stress probe of the round-13 catalog additions (builder r9) plus
the re-shipped dq_duplicate_event_audit two-pass — run the round they
land so no straggler backlog accumulates (the perf_x1000_round12
method; exclusions recorded in the output).

Tier choices:
* dedup_band_index_merge — x100 Spark-only cold (the
  replica-adversarial rationale of dedup_incremental_delta applies
  QUADRATICALLY here: at x1000 every increment doc meets ~999
  byte-identical stride-twins in every probed bucket, so the exact
  no-cap catalog config must VERIFY ~5e8 candidate pairs by
  construction — a first x1000 attempt ran >45 min before being
  cut; at x100 the same pipeline verifies ~5e6 pairs, which is the
  largest tier where the exact config's quadratic-by-construction
  candidate stream stays probe-sized.  Production crawls set
  max_bucket to cap exactly this.  DuckDB twin falls to the jaccard
  pair-counting rule beyond x10, so x10 is the head-to-head.
* dedup_media_phash — x1000 Spark warm (the synth+decode+dHash Arrow
  kernels are the honest cost), DuckDB head-to-head at x100 (the
  twin's 72-cell UNNEST join is 3.6 G rows at x1000 — the
  pair-counting-rule class).
* dq_duplicate_event_audit — full x1000 head-to-head (the r9
  two-pass replaces the r8 number on the books).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from bench import CPUS, SF_DIR, build_spark, run_noop, synth_scaled_dir, timed  # noqa: E402

EXCLUSIONS = {
    "dedup_band_index_merge": (
        "x1000 excluded entirely: the exact no-cap catalog config is "
        "quadratic-by-construction on the stride-replica tier (every "
        "increment doc meets ~999 byte-identical twins per probed "
        "bucket => ~5e8 verify pairs; a first x1000 attempt ran >45 "
        "min before being cut — production crawls cap this with "
        "max_bucket).  Spark-only cold x100 below proves the "
        "build+merge+write+probe pipeline at 500K docs (~5e6 verify "
        "pairs); x10 is the meaningful head-to-head (the "
        "dedup_incremental_delta rule; the DuckDB twin falls to the "
        "jaccard pair-counting rule beyond it)."
    ),
    "dedup_media_phash": (
        "DuckDB x1000 twin excluded: the oracle's per-pixel UNNEST "
        "join materializes 72 rows/doc = 360M g-rows self-joined "
        "(~3.6G join probes) — the pair-counting rule.  Spark x1000 "
        "warm measured (the kernels are the product path); "
        "head-to-head at x100."
    ),
}


def main() -> None:
    import duckdb

    from spark_bi5_datasource_spark import plans, register

    x1000_docs = synth_scaled_dir(SF_DIR, 1000, ["documents"])
    x1000_ev = synth_scaled_dir(SF_DIR, 1000, ["events"])
    x100 = synth_scaled_dir(SF_DIR, 100, ["documents"])
    x10 = synth_scaled_dir(SF_DIR, 10, ["documents"])

    spark = build_spark()
    register(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    qs = {n: fn for n, (fn, _s, _b) in plans.CATALOG.items()}
    oracles = plans.oracle_sql()

    out: dict = {"x": 1000, "exclusions": EXCLUSIONS}

    t0 = time.perf_counter()
    run_noop(qs["dedup_band_index_merge"](spark, x100))
    bidx_cold = round(time.perf_counter() - t0, 3)
    print(f"# spark dedup_band_index_merge x100 cold: {bidx_cold}",
          file=sys.stderr)
    phash_x1000 = timed(qs["dedup_media_phash"](spark, x1000_docs), runs=2)
    print(f"# spark dedup_media_phash x1000: {phash_x1000}", file=sys.stderr)
    dup_x1000 = timed(qs["dq_duplicate_event_audit"](spark, x1000_ev), runs=2)
    print(f"# spark dq_duplicate_event_audit x1000: {dup_x1000}",
          file=sys.stderr)
    bidx_x10 = timed(qs["dedup_band_index_merge"](spark, x10), runs=2)
    phash_x100 = timed(qs["dedup_media_phash"](spark, x100), runs=2)
    print(f"# spark band_index x10: {bidx_x10}, phash x100: {phash_x100}",
          file=sys.stderr)
    spark.stop()

    def duck_time(view_dir: str, q: str) -> float:
        con = duckdb.connect()
        con.execute(f"PRAGMA threads={CPUS}")
        con.execute(
            f"CREATE VIEW documents AS FROM '{view_dir}/documents.parquet'"
        )
        if q == "dq_duplicate_event_audit":
            con.execute(
                f"CREATE VIEW events AS FROM '{view_dir}/events.parquet'"
            )
        sql = oracles[q]
        con.execute(sql).fetchall()
        best = float("inf")
        for _ in range(2):
            s = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - s)
        con.close()
        return round(best, 3)

    duck_dup = duck_time(x1000_ev, "dq_duplicate_event_audit")
    duck_bidx_x10 = duck_time(x10, "dedup_band_index_merge")
    duck_phash_x100 = duck_time(x100, "dedup_media_phash")
    print(f"# duckdb dup x1000: {duck_dup}, band_index x10: {duck_bidx_x10},"
          f" phash x100: {duck_phash_x100}", file=sys.stderr)

    out.update(
        {
            "spark_cold_single_run_x100": {
                "dedup_band_index_merge": bidx_cold
            },
            "spark": {
                "dedup_media_phash": phash_x1000,
                "dq_duplicate_event_audit": dup_x1000,
            },
            "duckdb": {"dq_duplicate_event_audit": duck_dup},
            "per_query_ratio": {
                "dq_duplicate_event_audit": round(dup_x1000 / duck_dup, 2)
            },
            "band_index_x10": {
                "spark": bidx_x10,
                "duckdb": duck_bidx_x10,
                "ratio": round(bidx_x10 / duck_bidx_x10, 2),
            },
            "phash_x100": {
                "spark": phash_x100,
                "duckdb": duck_phash_x100,
                "ratio": round(phash_x100 / duck_phash_x100, 2),
            },
        }
    )
    line = json.dumps(out)
    print(line)
    with open(
        os.path.join(os.path.dirname(__file__), "..", "BENCH_X1000_R14.json"),
        "w",
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
