#!/usr/bin/env python
"""r10: window_macd re-pinned 6.4 s vs DuckDB 0.62 s at x1000
(perf_x1000_round16 same-window).  Decompose where the 6.4 s lives —
the op is one events-scan bar reduction + three tiny frame windows:

* scan_floor  — events scan of (event_type, ts, value) + count
* cents_floor — + the half-adjust cents expression
* bars        — + the (event_type, day) OHLC groupBy (daily_ohlc_bars)
* full        — the catalog window_macd
* duck_bars / duck_full — the DuckDB twins of bars / full, same window

Also A/B: shuffle partitions 128 (probe default) vs 32 for the bar
exchange, and bars via max_by vs struct-max.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from bench import CPUS, SF_DIR, build_spark, synth_scaled_dir, timed  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from spark_bi5_datasource_spark import plans
    from spark_bi5_datasource_spark.plans.daily_bars import daily_ohlc_bars
    from spark_bi5_datasource_spark.plans.fastmoney import (
        HALF_ADJUST_CENTS as _HA,
    )
    from spark_bi5_datasource_spark.plans.tables import t

    scaled = synth_scaled_dir(SF_DIR, 1000, ["events"])
    spark = build_spark()
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    out: dict = {"x": 1000}

    ev = t(spark, scaled, "events").where(
        "ts IS NOT NULL AND value IS NOT NULL"
    )
    out["scan_floor"] = timed(
        ev.select("event_type", "ts", "value").agg(
            F.count("*").alias("n"), F.sum("value").alias("s")
        ),
        runs=2,
    )
    print(f"# scan_floor: {out['scan_floor']}", file=sys.stderr)

    out["cents_floor"] = timed(
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.expr(_HA.format(x="value", m="100")).alias("cents"),
        ).agg(F.sum("cents").alias("s")),
        runs=2,
    )
    print(f"# cents_floor: {out['cents_floor']}", file=sys.stderr)

    out["bars_128"] = timed(daily_ohlc_bars(spark, scaled), runs=2)
    print(f"# bars(128): {out['bars_128']}", file=sys.stderr)

    spark.conf.set("spark.sql.shuffle.partitions", str(CPUS))
    out["bars_shuf_cpus"] = timed(daily_ohlc_bars(spark, scaled), runs=2)
    print(f"# bars({CPUS}): {out['bars_shuf_cpus']}", file=sys.stderr)

    fn = plans.CATALOG["window_macd"][0]
    out["full_shuf_cpus"] = timed(fn(spark, scaled), runs=2)
    print(f"# full({CPUS}): {out['full_shuf_cpus']}", file=sys.stderr)
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    out["full_128"] = timed(fn(spark, scaled), runs=2)
    print(f"# full(128): {out['full_128']}", file=sys.stderr)

    # DuckDB same-window legs
    import duckdb

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={CPUS}")
    con.execute(f"CREATE VIEW events AS FROM '{scaled}/events.parquet'")
    duck_bars_sql = """
        SELECT event_type, CAST(ts AS DATE) AS day,
          max(CAST(round(value * 100) AS BIGINT)) AS hi,
          min(CAST(round(value * 100) AS BIGINT)) AS lo,
          arg_max(CAST(round(value * 100) AS BIGINT), ts) AS cl
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY event_type, day
    """
    full_sql = plans.oracle_sql()["window_macd"]
    for tag, sql in (("duck_bars", duck_bars_sql), ("duck_full", full_sql)):
        con.execute(sql).fetchall()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        out[tag] = round(best, 3)
        print(f"# {tag}: {out[tag]}", file=sys.stderr)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
