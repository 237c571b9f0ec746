#!/usr/bin/env python
"""r14 VERDICT item 1c: basket_association_lift pre-exchange singleton
filter A/B.

The (u,v) pair exchange is the query's dominant scale cost (3.6 GiB at
x100) and 99.7% of distinct pairs are singletons (n_uv = 1, measured
sf0.1: 3,573 of 1,196,000 survive n_uv >= 2) that the post-exchange
HAVING throws away.  Candidate shape (guide §8 "decide with small
rows" / §2.3 "shuffle keys instead of payloads"):

  pass A: shuffle only xxhash64(u, v) with a count — finds the hash
          values that occur >= 2 times (16 B/row vs 24 B/row, and the
          downstream agg is a cheap long count, not a pair groupBy);
  pass B: re-unfold the pairs (the lineitem exchange is reused via
          ReuseExchange; only the collect_set agg + Arrow unfold
          re-execute), drop rows whose hash is not in the surviving
          set (broadcast semi join — false positives only, the exact
          post-exchange count still applies n_uv >= 2), and run the
          original (u,v) groupBy on the ~0.6% survivors.

Result-identical by construction: hash collisions can only ADD rows to
pass B's input, never remove a true survivor, and the final HAVING is
unchanged.  This script A/Bs old vs new interleaved in one session and
checks exact result equality first.

    python scripts/exp_r14_basket_prefilter.py [--x 100] [--reps 2]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def lift_prefiltered(spark, sf: str):
    """basket_association_lift with the pass-A/pass-B singleton
    prefilter ahead of the (u,v) exchange."""
    from spark_bi5_datasource_spark.operators.pairs import unfold_sorted_pairs
    from spark_bi5_datasource_spark.plans.tables import t

    li = t(spark, sf, "lineitem")
    ex = li.select("l_orderkey", "l_partkey").repartition("l_orderkey")
    dli = ex.distinct()
    n = dli.agg(F.countDistinct("l_orderkey").cast("bigint").alias("n_orders"))
    deg = dli.groupBy("l_partkey").agg(
        F.count("*").cast("bigint").alias("n_item")
    )
    baskets = (
        ex.groupBy("l_orderkey")
        .agg(F.expr("sort_array(collect_set(l_partkey))").alias("parts"))
        .where(F.expr("size(parts) >= 2"))
    )
    raw = unfold_sorted_pairs(baskets, "parts")
    surv = (
        raw.select(F.xxhash64("u", "v").alias("ph"))
        .groupBy("ph")
        .agg(F.count("*").alias("c"))
        .where("c >= 2")
        .select("ph")
    )
    pairs = (
        raw.withColumn("ph", F.xxhash64("u", "v"))
        .join(F.broadcast(surv), "ph", "left_semi")
        .groupBy("u", "v")
        .agg(F.count("*").cast("bigint").alias("n_uv"))
        .where("n_uv >= 2")
    )
    du = deg.select(F.col("l_partkey").alias("u"), F.col("n_item").alias("n_u"))
    dv = deg.select(F.col("l_partkey").alias("v"), F.col("n_item").alias("n_v"))
    return (
        pairs.join(du, "u")
        .join(dv, "v")
        .crossJoin(F.broadcast(n))
        .select(
            "u", "v", "n_uv", "n_u", "n_v",
            F.expr(
                "CAST((n_uv * 1000000 div n_u) * n_orders div n_v"
                " AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "u", "v")
        .limit(500)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--x", type=int, default=100)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--skip-equality", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_MEM", "32g")
    d = bench.synth_scaled_dir(
        SRC, args.x, tables=["lineitem"]
    ) if args.x > 1 else SRC

    from spark_bi5_datasource_spark import plans, register

    spark = bench.build_spark()
    register(spark)
    old_fn = plans.CATALOG["basket_association_lift"][0]

    old_df = old_fn(spark, d)
    new_df = lift_prefiltered(spark, d)

    if not args.skip_equality:
        a = [tuple(r) for r in old_df.collect()]
        b = [tuple(r) for r in new_df.collect()]
        assert a == b, f"RESULT MISMATCH: {len(a)} vs {len(b)} rows"
        print(f"results equal: {len(a)} rows", flush=True)

    out = {"x": args.x, "loadavg": os.getloadavg(),
           "sentinel_start": bench.scan_sentinel(spark, d)}
    olds, news = [], []
    for rep in range(args.reps):
        spark.sparkContext.setJobDescription(f"basket-old:{rep}")
        olds.append(bench.timed(old_df, runs=args.runs))
        spark.sparkContext.setJobDescription(f"basket-prefilter:{rep}")
        news.append(bench.timed(new_df, runs=args.runs))
        print(f"rep {rep}: old={olds[-1]} new={news[-1]}", flush=True)
    out["sentinel_end"] = bench.scan_sentinel(spark, d)
    out.update(old=olds, new=news)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
