#!/usr/bin/env python
"""r13 verdict ask #1: pin the three BENCH_r12 sf0.1 spikes
(`sim_quantize_int8` 0.359→2.059 s, `events_active_users`
0.536→1.381 s, `dedup_winnow_pairs` 1.278→2.831 s) plus the two
small-absolute watch entries from BENCH_TRIAGE_r12.

Protocol (the r12_q3_pin template): ONE FRESH JVM PER QUERY — a
spike that only reproduces with 35 other queries' JVM state behind it
is a bench-window artifact, not a plan property — each leg warmed +
min-of-5 and bracketed by scan-floor sentinels; the DuckDB twin runs
adjacently in the same window.  Output: BENCH_PINS_R13.json in the
shape bench_triage.py --pins consumes, plus per-leg detail.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

QUERIES = [
    "sim_quantize_int8",
    "events_active_users",
    "dedup_winnow_pairs",
    "dq_referential_integrity",
    "events_ohlc_rollup",
]


def duck_leg(sf_dir: str, sql: str, runs: int = 5) -> tuple[float, float]:
    import duckdb

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={bench.CPUS}")
    for t in bench._SHIFT_COLS:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS FROM '{p}'")
    best = bench.duck_timed(con, sql, runs)
    sent = bench.duckdb_sentinel(con)
    con.close()
    return best, sent


def pin_one(name: str, sf_dir: str) -> dict:
    """Fresh JVM, sentinel → warmup+min-of-5 → sentinel, then the
    DuckDB twin adjacently."""
    from spark_bi5_datasource_spark import plans, register

    spark = bench.build_spark()
    register(spark)
    fn = plans.CATALOG[name][0]
    sql = plans.oracle_sql().get(name)
    out = {"query": name, "loadavg_1m": round(os.getloadavg()[0], 2)}
    out["sentinel_start"] = bench.scan_sentinel(spark, sf_dir)
    out["spark"] = bench.timed(fn(spark, sf_dir), runs=5)
    out["sentinel_end"] = bench.scan_sentinel(spark, sf_dir)
    spark.stop()
    if sql:
        out["duckdb"], out["duckdb_sentinel"] = duck_leg(sf_dir, sql)
        out["ratio_vs_duckdb"] = round(out["spark"] / out["duckdb"], 2)
    return out


def main() -> None:
    sf_dir = bench.SF_DIR
    detail = [pin_one(q, sf_dir) for q in QUERIES]
    for d in detail:
        print(f"# {d['query']}: spark={d['spark']} "
              f"sentinels={d['sentinel_start']}/{d['sentinel_end']} "
              f"duckdb={d.get('duckdb')}", file=sys.stderr)
    out = {
        "sf_dir": sf_dir,
        "protocol": "one fresh JVM per query; warmup + min-of-5; "
                    "sentinel-bracketed; adjacent DuckDB twin",
        "queries": {d["query"]: d["spark"] for d in detail},
        "detail": detail,
    }
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_PINS_R13.json",
    )
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"wrote": os.path.basename(dst),
                      "queries": out["queries"]}))


if __name__ == "__main__":
    main()
