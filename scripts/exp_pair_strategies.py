#!/usr/bin/env python
"""Head-to-head of co-purchase pair-generation strategies at scale.

The downstream consumer is identical (groupBy (u, v) count → edges
with c ≥ 2), so the probe times exactly that reduction over each
generator on the x1000 lineitem (600M rows, ~1.2B pairs):

  A. self-join + post-join 3-col distinct   (shipped in rounds 4-5)
  B. pre-join (order, part) distinct, join output distinct by
     construction (no post-join distinct)
  C. basket: collect_set groupBy + array-HOF unfold (no join at all)

Single cold-ish run each (order rotated by the CLI arg if given), one
Spark session, edge counts asserted equal.  Results land in
SCALE_NOTES.md "graph pair-counting".
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from pyspark.sql import functions as F  # noqa: E402

from bench import SF_DIR, build_spark, synth_scaled_dir  # noqa: E402
from spark_bi5_datasource_spark.plans.tables import t as T  # noqa: E402


def pairs_a(li):
    b = li.toDF("l_orderkey", "b_partkey")
    return (
        li.join(b, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("b_partkey"))
        .select(
            "l_orderkey",
            F.col("l_partkey").alias("u"),
            F.col("b_partkey").alias("v"),
        )
        .distinct()
        .select("u", "v")
    )


def pairs_b(li):
    d = li.distinct()
    b = d.toDF("l_orderkey", "b_partkey")
    return (
        d.join(b, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("b_partkey"))
        .select(F.col("l_partkey").alias("u"), F.col("b_partkey").alias("v"))
    )


def pairs_c(li):
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.expr("sort_array(collect_set(l_partkey))").alias("parts"))
        .where(F.expr("size(parts) >= 2"))
    )
    return baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (x, i) ->"
                " transform(slice(parts, i + 2, size(parts)),"
                " y -> struct(x AS u, y AS v))))"
            )
        ).alias("p")
    ).select("p.u", "p.v")


def main() -> None:
    x = int(os.environ.get("PAIR_X", "1000"))
    scaled = synth_scaled_dir(SF_DIR, x, ["lineitem"])
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    li = T(spark, scaled, "lineitem").select("l_orderkey", "l_partkey")

    results = {}
    order = sys.argv[1:] or ["a", "b", "c"]
    for key in order:
        gen = {"a": pairs_a, "b": pairs_b, "c": pairs_c}[key]
        edges = (
            gen(li)
            .groupBy("u", "v")
            .agg(F.count("*").alias("c"))
            .filter("c >= 2")
        )
        t0 = time.time()
        n = edges.count()
        dt = round(time.time() - t0, 1)
        results[key] = (dt, n)
        print(f"strategy {key}: {dt}s edges={n}", flush=True)
    counts = {n for _, n in results.values()}
    assert len(counts) == 1, f"edge counts diverge: {results}"
    spark.stop()


if __name__ == "__main__":
    main()
