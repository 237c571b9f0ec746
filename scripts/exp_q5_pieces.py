#!/usr/bin/env python
"""Piecewise q5 cost decomposition at x1000 (bucketed layout), fresh
JVM per run recommended (VARIANT env picks one).

p0  SMJ + customer-on-orders + tiny agg on c_nationkey (NO supplier
    probe, no filter) — isolates the fact-fact join + one broadcast.
p1  full current q5 (v1 shape).
p2  pre-agg variant: after the SMJ, partial-agg by (l_suppkey,
    c_nationkey) BEFORE the supplier probe — probes 25M agg rows
    instead of 600M stream rows, at the cost of one 25M-row exchange.
p3  full q5 but WITHOUT the post-agg nation/region label joins —
    isolates their (expected ~0) cost.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark, timed  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

SCALED = "/tmp/spark_bi5_bench_scaled_x1000_v2_sf0.1"


def _dsum(expr: str, digits: int, alias: str):
    s = 10 ** digits
    return (
        F.sum(F.expr(f"CAST(round(({expr}) * {s}) AS BIGINT)")).cast("double") / s
    ).alias(alias)


def main() -> None:
    from spark_bi5_datasource_spark import register
    from spark_bi5_datasource_spark.plans.tables import ensure_bucketed_layout, t

    spark = build_spark()
    register(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    ensure_bucketed_layout(spark, SCALED)

    c = t(spark, SCALED, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, SCALED, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, SCALED, "nation")
    r = t(spark, SCALED, "region")

    def o2():
        o = t(spark, SCALED, "orders").select("o_orderkey", "o_custkey")
        return (
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .select("o_orderkey", "c_nationkey")
            .hint("merge")
        )

    def li():
        return t(spark, SCALED, "lineitem")

    def finish(agg):
        return (
            agg.join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .select("r_name", "n_name", "revenue")
        )

    def p0():
        x = li().join(o2(), F.col("l_orderkey") == F.col("o_orderkey"))
        return x.groupBy("c_nationkey").agg(
            _dsum("l_extendedprice * (1 - l_discount)", 6, "revenue")
        )

    def p1():
        x = (
            li()
            .join(o2(), F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
            .filter((F.col("s_nationkey") - F.col("c_nationkey")) == 0)
            .groupBy("s_nationkey")
            .agg(_dsum("l_extendedprice * (1 - l_discount)", 6, "revenue"))
        )
        return finish(x)

    def p2():
        pre = (
            li()
            .join(o2(), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_suppkey", "c_nationkey")
            .agg(_dsum("l_extendedprice * (1 - l_discount)", 6, "rev"))
        )
        x = (
            pre.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
            .filter((F.col("s_nationkey") - F.col("c_nationkey")) == 0)
            .groupBy("s_nationkey")
            .agg(F.sum("rev").alias("revenue"))
        )
        return finish(x)

    def p3():
        return (
            li()
            .join(o2(), F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
            .filter((F.col("s_nationkey") - F.col("c_nationkey")) == 0)
            .groupBy("s_nationkey")
            .agg(_dsum("l_extendedprice * (1 - l_discount)", 6, "revenue"))
        )

    pieces = {"p0": p0, "p1": p1, "p2": p2, "p3": p3}
    pick = os.environ.get("VARIANT")
    todo = pieces.items() if pick is None else [(pick, pieces[pick])]
    for name, fn in todo:
        t0 = time.time()
        sec = timed(fn(), runs=2)
        print(f"{name}: {sec:.2f}s  wall={time.time()-t0:.0f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
