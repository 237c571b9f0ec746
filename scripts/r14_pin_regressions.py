#!/usr/bin/env python
"""r14 VERDICT item 2: pin the three r13-touched queries whose driver
numbers regressed (sql_tpch_q21, sim_mrl_prefix_recall,
tok_zipf_profile) with a fresh-JVM, sentinel-bracketed, INTERLEAVED
old-shape vs new-shape A/B at sf0.1.

"old" reconstructs the r12 shape in-place:
  * q21  — the oracle's literal EXISTS/NOT EXISTS text run through
           Spark (same view mechanism the catalog uses);
  * zipf — the rank/cumsum window over the WHOLE vocabulary (no
           distributed TakeOrdered prefix);
  * mrl  — the overlap join without the explicit broadcast hint.

Each (query, shape) is timed with the bench discipline (warm-up +
min-of-N noop) in alternating order old,new,old,new,... so box drift
hits both shapes equally.  Writes R14_PIN_<tag>.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def q21_old(spark, sf):
    from spark_bi5_datasource_spark.plans.fastmoney import spark_fast_sql
    from spark_bi5_datasource_spark.plans.tables import t
    from spark_bi5_datasource_spark.plans.tpch_pack import _Q21_SQL

    for tb in ("supplier", "lineitem", "orders", "nation", "region"):
        t(spark, sf, tb).createOrReplaceTempView(f"q21old_{tb}")
    return spark.sql(spark_fast_sql(_Q21_SQL).format(p="q21old_"))


def zipf_old(spark, sf):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_bi5_datasource_spark.functions.text import term_count_partials
    from spark_bi5_datasource_spark.plans.tables import t

    c = (
        term_count_partials(t(spark, sf, "documents"))
        .groupBy("term")
        .agg(F.sum("cnt").cast("bigint").alias("freq"))
    )
    wo = Window.orderBy(F.desc("freq"), "term")
    r = c.select(
        "term",
        "freq",
        F.row_number().over(wo).cast("bigint").alias("rk"),
        F.sum("freq")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cumfreq"),
    )
    tot = c.agg(F.sum("freq").cast("bigint").alias("total"))
    dbl = r.select(F.col("rk").alias("drk"), F.col("freq").alias("dfreq"))
    return (
        r.where("rk <= 50")
        .crossJoin(F.broadcast(tot))
        .withColumn("rk2", F.expr("rk * 2"))
        .join(F.broadcast(dbl), F.col("drk") == F.col("rk2"), "left")
        .select(
            "rk",
            "term",
            "freq",
            F.expr("freq * 1000000 div total").cast("bigint").alias("share_ppm"),
            F.expr("cumfreq * 1000000 div total").cast("bigint").alias("cum_ppm"),
            F.expr("dfreq * 1000000 div freq").cast("bigint").alias("doubling_ppm"),
        )
        .orderBy("rk")
    )


def mrl_old(spark, sf):
    from pyspark.sql import functions as F

    from spark_bi5_datasource_spark.operators.similarity import cosine_topk
    from spark_bi5_datasource_spark.plans.tables import t

    emb = t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    full_k = cosine_topk(emb, queries, k=5).select("query_id", "nbr_id")
    pre = emb.select("vec_id", F.expr("slice(embedding, 1, 16)").alias("embedding"))
    pre_k = cosine_topk(pre, pre.filter(F.col("vec_id") < 10), k=5).select(
        "query_id", "nbr_id", F.lit(1).alias("hit")
    )
    return (
        full_k.join(pre_k, ["query_id", "nbr_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").cast("bigint").alias("n_overlap"),
            F.expr("CAST(count(hit) * 1000000 div 5 AS BIGINT)").alias("recall_ppm"),
        )
        .orderBy("query_id")
    )


OLD = {
    "sql_tpch_q21": q21_old,
    "tok_zipf_profile": zipf_old,
    "sim_mrl_prefix_recall": mrl_old,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="sf01")
    ap.add_argument("--reps", type=int, default=3, help="A/B alternations")
    ap.add_argument("--runs", type=int, default=3, help="min-of-N per timing")
    args = ap.parse_args()

    from spark_bi5_datasource_spark import plans, register

    spark = bench.build_spark()
    register(spark)
    qs = {n: fn for n, (fn, _s, _b) in plans.CATALOG.items()}

    warm = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    warm.groupBy("l_returnflag").count().write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict = {"tag": args.tag, "sf_dir": SF_DIR, "loadavg": os.getloadavg()}
    out["sentinel_start"] = bench.scan_sentinel(spark, SF_DIR)
    res: dict[str, dict] = {}
    for name, old_fn in OLD.items():
        new_df = qs[name](spark, SF_DIR)
        old_df = old_fn(spark, SF_DIR)
        olds, news = [], []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"r14-pin:{name}:old:{rep}")
            olds.append(bench.timed(old_df, runs=args.runs))
            spark.sparkContext.setJobDescription(f"r14-pin:{name}:new:{rep}")
            news.append(bench.timed(new_df, runs=args.runs))
        res[name] = {"old": olds, "new": news,
                     "old_min": min(olds), "new_min": min(news)}
        print(f"{name}: old={olds} new={news}", flush=True)
    out["sentinel_end"] = bench.scan_sentinel(spark, SF_DIR)
    out["results"] = res
    path = os.path.join(REPO, f"R14_PIN_{args.tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "results"}))
    spark.stop()


if __name__ == "__main__":
    main()
