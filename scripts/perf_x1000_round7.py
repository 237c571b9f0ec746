#!/usr/bin/env python
"""x1000 probe for the round-7 perf asks (cached scaled dir from
perf_x1000_probe.py: 600M lineitem / 150M orders / 100M events / 5M
documents, ~29 GB parquet).

Measures, Spark local[32] vs DuckDB threads=32 on identical files,
min of 2 after warm-up:

* the six-indicator daily-bar family, BOTH per-query uncached (the
  old posture: every indicator pays its own fact scan) and as a
  FUSED SWEEP (plans/daily_bars.cache_daily_bars: the OHLC bars and
  the daily revenue series are each built+persisted once, then all
  six indicators ride the cached ≤|types|·|days| aggregate) — the
  DuckDB twins have no shared-scan option, so the sweep comparison
  is family total vs family total;
* tok_fertility_by_lang after the term_count_partials kernel move;
* events_ab_srm_check after the marker-row single-chain fusion.

Results → BENCH_X1000_R7FIX.json + SCALE_NOTES.md.
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
INDICATORS = [
    "window_rsi_cutler",
    "window_bollinger_bands",
    "window_atr_bands",
    "window_stochastic_osc",
    "window_donchian_channels",
    "window_pivot_points",
]
SINGLES = ["tok_fertility_by_lang", "events_ab_srm_check"]


def main() -> None:
    import duckdb

    from spark_bi5_datasource_spark import plans, register
    from spark_bi5_datasource_spark.plans.daily_bars import (
        cache_daily_bars,
        uncache_daily_bars,
    )

    t0 = time.time()
    scaled = synth_scaled_dir(SF_DIR, 1000, TABLES)
    print(f"# generation/cache: {time.time() - t0:.0f}s", file=sys.stderr)

    spark = build_spark()
    register(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    qs = {n: fn for n, (fn, _s, _b) in plans.CATALOG.items()}
    oracles = plans.oracle_sql()

    spark_uncached: dict[str, float] = {}
    for q in INDICATORS + SINGLES:
        spark_uncached[q] = timed(qs[q](spark, scaled), runs=2)
        print(f"# spark uncached {q}: {spark_uncached[q]}", file=sys.stderr)

    # fused sweep: bars built+persisted once, family rides the cache
    t0 = time.time()
    cache_daily_bars(spark, scaled)
    bar_build = round(time.time() - t0, 3)
    print(f"# bar build+persist: {bar_build}", file=sys.stderr)
    spark_cached: dict[str, float] = {}
    for q in INDICATORS:
        spark_cached[q] = timed(qs[q](spark, scaled), runs=2)
        print(f"# spark cached {q}: {spark_cached[q]}", file=sys.stderr)
    uncache_daily_bars(spark, scaled)
    spark.stop()

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={CPUS}")
    for tb in TABLES:
        con.execute(f"CREATE VIEW {tb} AS FROM '{scaled}/{tb}.parquet'")
    duck_t: dict[str, float] = {}
    for q in INDICATORS + SINGLES:
        con.execute(oracles[q]).fetchall()
        best = float("inf")
        for _ in range(2):
            s = time.perf_counter()
            con.execute(oracles[q]).fetchall()
            best = min(best, time.perf_counter() - s)
        duck_t[q] = round(best, 3)
        print(f"# duckdb {q}: {duck_t[q]}", file=sys.stderr)
    con.close()

    fam_sweep = round(bar_build + sum(spark_cached.values()), 3)
    fam_duck = round(sum(duck_t[q] for q in INDICATORS), 3)
    out = {
        "x": 1000,
        "spark_uncached": spark_uncached,
        "bar_build_s": bar_build,
        "spark_cached": spark_cached,
        "duckdb": duck_t,
        "family_sweep_spark": fam_sweep,
        "family_duckdb": fam_duck,
        "family_sweep_ratio": round(fam_sweep / fam_duck, 2),
        "singles_ratio": {
            q: round(spark_uncached[q] / duck_t[q], 2) for q in SINGLES
        },
    }
    line = json.dumps(out)
    print(line)
    with open(
        os.path.join(
            os.path.dirname(__file__), "..", "BENCH_X1000_R7FIX.json"
        ),
        "w",
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
