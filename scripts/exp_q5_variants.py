#!/usr/bin/env python
"""Experiment: q5 plan variants at x1000 on the bucketed layout.

v0  catalog plan as of r4: broadcast customer (15M rows at this scale)
    probed on the 600M-row lineitem⋈orders stream.  OOMs an 8g heap
    intermittently — the forced F.broadcast(c) builds a ~600MB
    LongHashedRelation regardless of scale.
v1  broadcast customer onto ORDERS before the merge join: 150M probes
    instead of 600M; broadcast join preserves orders' bucketed
    partitioning so the SMJ stays exchange-free.  Same broadcast build.
v3  NO forced hint on customer: AQE + the 64MB threshold pick
    broadcast at x10 and a shuffle join at x1000 (orders⋈customer on
    custkey, narrow columns, then re-exchange on o_orderkey for the
    SMJ) — trades a bounded 2-col shuffle for the unbounded broadcast.
"""
from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_spark, timed  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

SCALED = os.environ.get("EXP_DIR", "/tmp/spark_bi5_bench_scaled_x1000_v2_sf0.1")


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

    def finish(agg):
        return (
            agg.join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .select("r_name", "n_name", "revenue")
        )

    def tail(joined):
        return finish(
            joined.filter((F.col("s_nationkey") - F.col("c_nationkey")) == 0)
            .groupBy("s_nationkey")
            .agg(_dsum("l_extendedprice * (1 - l_discount)", 6, "revenue"))
        )

    def v0():
        o = t(spark, SCALED, "orders").hint("merge")
        li = t(spark, SCALED, "lineitem")
        return tail(
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        )

    def v1():
        o = t(spark, SCALED, "orders").select("o_orderkey", "o_custkey")
        o2 = (
            o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .select("o_orderkey", "c_nationkey")
            .hint("merge")
        )
        li = t(spark, SCALED, "lineitem")
        return tail(
            li.join(o2, li.l_orderkey == o2.o_orderkey)
            .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        )

    def v3():
        o = t(spark, SCALED, "orders").select("o_orderkey", "o_custkey")
        o2 = (
            o.join(c, o.o_custkey == c.c_custkey)
            .select("o_orderkey", "c_nationkey")
            .hint("merge")
        )
        li = t(spark, SCALED, "lineitem")
        return tail(
            li.join(o2, li.l_orderkey == o2.o_orderkey)
            .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        )

    variants = {"v0": v0, "v1": v1, "v3": v3}
    # one variant per process (env VARIANT): a prior variant's broadcast
    # relations would otherwise still occupy the heap
    pick = os.environ.get("VARIANT")
    for name, fn in variants.items() if pick is None else [(pick, variants[pick])]:
        try:
            df = fn()
            plan = df._jdf.queryExecution().executedPlan().toString()
            nex = plan.count("Exchange")
            t0 = time.time()
            sec = timed(df, runs=2)
            print(
                f"{name}: {sec:.2f}s  exchanges(initial)={nex}  "
                f"wall={time.time()-t0:.0f}s",
                flush=True,
            )
        except Exception:
            print(f"{name}: FAILED", flush=True)
            traceback.print_exc()
    spark.stop()


if __name__ == "__main__":
    main()
