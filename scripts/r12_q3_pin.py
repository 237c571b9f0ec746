"""r12 verdict ask #1: settle the q3_top_revenue_orders r10→r11 moves
(sf0.1 0.578→1.252 s; x100 ratio 0.68→0.94) with same-window
fresh-JVM Spark+DuckDB pairs bracketed by scan-floor sentinels.

Protocol (SCALE_NOTES drift discipline): one fresh JVM per tier, the
Spark leg and the DuckDB leg of each pair run adjacently inside one
window, sentinels before/after pin the box state.  Output: one JSON
blob to stdout for SCALE_NOTES.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def duck_leg(sf_dir: str, sql: str, runs: int = 3) -> tuple[float, float]:
    """Returns (query best-of-N, post-query DuckDB scan sentinel)."""
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


def tier(name: str, sf_dir: str, bucketed: bool) -> dict:
    from spark_bi5_datasource_spark import plans, register

    spark = bench.build_spark()
    register(spark)
    if bucketed:
        from spark_bi5_datasource_spark.plans.tables import (
            ensure_bucketed_layout,
        )

        ensure_bucketed_layout(spark, sf_dir)
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    fn = plans.CATALOG["q3_top_revenue_orders"][0]
    sql = plans.oracle_sql()["q3_top_revenue_orders"]

    out = {"tier": name, "sf_dir": sf_dir}
    out["sentinel_start"] = bench.scan_sentinel(spark, sf_dir)
    out["spark_q3"] = bench.timed(fn(spark, sf_dir), runs=3)
    out["sentinel_mid"] = bench.scan_sentinel(spark, sf_dir)
    spark.stop()
    out["duckdb_q3"], out["duckdb_sentinel"] = duck_leg(sf_dir, sql)
    out["ratio"] = round(out["spark_q3"] / out["duckdb_q3"], 2)
    return out


def main() -> None:
    results = [tier("sf0.1", bench.SF_DIR, bucketed=False)]
    x100 = bench.synth_scaled_dir(bench.SF_DIR, 100, bench._X100_TABLES)
    results.append(tier("x100", x100, bucketed=True))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
