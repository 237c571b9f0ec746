#!/usr/bin/env python
"""Decompose the round-7 perf asks at x1000 (cached scaled dir).

Pieces measured (min of 2 after warm-up, exclusive box):

1. bare-scan floors: sum over events.value (100M rows) and
   orders.o_totalprice (150M) with no grouping — the JVM per-scan
   constant every events/orders aggregate pays;
2. daily-bar build pieces: OHLC aggregate alone, revenue aggregate
   alone, and the persist+materialize step;
3. SRM variants: (A) marker fan-out distinct [shipped], (C) per-user
   collect_set(day) + marker explode [no 2x distinct stream],
   (D) distinct (day,user) persisted + two cheap rollups;
4. tok_fertility_by_lang on the new count kernel
   (token_count_partials) vs the term-partials formulation.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from bench import SF_DIR, build_spark, synth_scaled_dir, timed  # noqa: E402

TABLES = ["orders", "events", "documents"]


def main() -> None:
    from pyspark.sql import functions as F

    from spark_bi5_datasource_spark import plans, register
    from spark_bi5_datasource_spark.plans.daily_bars import (
        _build_ohlc,
        _build_rev,
    )

    scaled = synth_scaled_dir(SF_DIR, 1000, TABLES)
    spark = build_spark()
    register(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    qs = {n: fn for n, (fn, _s, _b) in plans.CATALOG.items()}

    ev = spark.read.parquet(f"{scaled}/events.parquet")
    od = spark.read.parquet(f"{scaled}/orders.parquet")

    r = {}
    r["scan_events_sum"] = timed(ev.agg(F.sum("value")), runs=2)
    r["scan_orders_sum"] = timed(od.agg(F.sum("o_totalprice")), runs=2)
    r["ohlc_build"] = timed(_build_ohlc(spark, scaled), runs=2)
    r["rev_build"] = timed(_build_rev(spark, scaled), runs=2)
    t0 = time.time()
    ohlc_p = _build_ohlc(spark, scaled).persist()
    ohlc_p.count()
    rev_p = _build_rev(spark, scaled).persist()
    rev_p.count()
    r["persist_both_cold"] = round(time.time() - t0, 3)
    ohlc_p.unpersist(); rev_p.unpersist()

    # --- SRM variants
    r["srm_A_marker_fanout"] = timed(qs["events_ab_srm_check"](spark, scaled), runs=2)

    def srm_C():
        per_user = (
            ev.where(F.col("ts").isNotNull())
            .groupBy("user_id")
            .agg(F.collect_set(F.to_date("ts")).alias("days"))
        )
        fan = per_user.select(
            "user_id",
            F.explode(
                F.concat("days", F.array(F.lit("1900-01-01").cast("date")))
            ).alias("day"),
        )
        daily = fan.groupBy("day").agg(
            F.count_if(F.expr("user_id % 2 = 0")).cast("bigint").alias("n_a"),
            F.count_if(F.expr("user_id % 2 = 1")).cast("bigint").alias("n_b"),
        )
        return (
            daily.where("n_a + n_b > 0")
            .select(
                "day", "n_a", "n_b",
                F.expr(
                    "CAST((n_a - n_b) * (n_a - n_b) * 1000 div (n_a + n_b) AS BIGINT)"
                ).alias("chi2_milli"),
                F.expr("(n_a - n_b) * (n_a - n_b) * 1000 > 3841 * (n_a + n_b)").alias("srm"),
            )
            .orderBy("day")
        )

    r["srm_C_per_user_sets"] = timed(srm_C(), runs=2)

    def srm_D_run():
        du = (
            ev.where(F.col("ts").isNotNull())
            .select(F.to_date("ts").alias("day"), "user_id")
            .distinct()
            .persist()
        )
        daily = du.groupBy("day").agg(
            F.count_if(F.expr("user_id % 2 = 0")).cast("bigint").alias("n_a"),
            F.count_if(F.expr("user_id % 2 = 1")).cast("bigint").alias("n_b"),
        )
        overall = du.agg(
            F.lit("1900-01-01").cast("date").alias("day"),
            F.count_distinct(F.when(F.expr("user_id % 2 = 0"), F.col("user_id"))).cast("bigint").alias("n_a"),
            F.count_distinct(F.when(F.expr("user_id % 2 = 1"), F.col("user_id"))).cast("bigint").alias("n_b"),
        )
        out = daily.unionByName(overall).where("n_a + n_b > 0").count()
        du.unpersist()
        return out

    srm_D_run()
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        srm_D_run()
        best = min(best, time.time() - t0)
    r["srm_D_persist_du"] = round(best, 3)

    # --- fertility on the count kernel (current catalog impl)
    r["fertility_count_kernel"] = timed(qs["tok_fertility_by_lang"](spark, scaled), runs=2)

    for k, v in r.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
