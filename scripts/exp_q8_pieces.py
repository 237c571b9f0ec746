#!/usr/bin/env python
"""Piecewise q8 cost decomposition at x100 (the round-5 verdict's one
regressed ratio: 5.0x vs DuckDB, up from 3.83x with no plan change).

Pieces (bucketed layout unless noted):
  t_scan   lineitem 3-col scan + trivial agg — the floor any join tree pays
  t_part   + part(PROMO) broadcast join
  t_supp   + supplier broadcast join
  t_ord    + orders (date-filtered) join  [the SMJ in the full plan]
  t_full   full q8
  t_plain  full q8 on the un-bucketed parquet (512m-split interaction probe)
  t_bloom  full q8 with runtime bloom-filter injection enabled/disabled

DuckDB twin timings come from BENCH_DETAIL.json (0.34 s at x100).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import build_spark, timed  # noqa: E402

SCALED = "/tmp/spark_bi5_bench_scaled_x100_v2_sf0.1"


def main() -> None:
    from spark_bi5_datasource_spark import plans, register
    from spark_bi5_datasource_spark.plans.tables import (
        ensure_bucketed_layout,
        t,
    )

    spark = build_spark()
    register(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    ensure_bucketed_layout(spark, SCALED)
    qs = {n: fn for n, (fn, _s, _b) in plans.CATALOG.items()}

    li = t(spark, SCALED, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    part = (
        t(spark, SCALED, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    supp = t(spark, SCALED, "supplier").select("s_suppkey", "s_nationkey")
    orders = (
        t(spark, SCALED, "orders")
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    rev = F.sum(
        F.expr(
            "CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)"
        )
    ).alias("v")

    out: dict[str, float] = {}
    out["t_scan"] = timed(li.groupBy().agg(rev), runs=3)
    j1 = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    out["t_part"] = timed(j1.groupBy().agg(rev), runs=3)
    j2 = j1.join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
    out["t_supp"] = timed(j2.groupBy("s_nationkey").agg(rev), runs=3)
    j3 = j2.join(orders, F.col("l_orderkey") == orders.o_orderkey)
    out["t_ord"] = timed(
        j3.groupBy(F.year("o_orderdate").alias("y")).agg(rev), runs=3
    )
    out["t_ord_bcast"] = timed(
        j2.join(F.broadcast(orders), F.col("l_orderkey") == orders.o_orderkey)
        .groupBy(F.year("o_orderdate").alias("y"))
        .agg(rev),
        runs=3,
    )
    out["t_full"] = timed(qs["sql_tpch_q8"](spark, SCALED), runs=3)

    conf = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    prior = spark.conf.get(conf, "false")
    for val in ("true", "false"):
        spark.conf.set(conf, val)
        out[f"t_full_bloom_{val}"] = timed(
            qs["sql_tpch_q8"](spark, SCALED), runs=3
        )
    spark.conf.set(conf, prior)

    # plain-parquet twin: does the bucketed lineitem scan (32 files,
    # no 512m splits) pay more than the plain one here?
    spark.conf.set("spark.bi5.bucketedDir", "")
    out["t_full_plain"] = timed(qs["sql_tpch_q8"](spark, SCALED), runs=3)
    spark.conf.unset("spark.bi5.bucketedDir")

    import json

    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
