#!/usr/bin/env python
"""Wedge-skew guard measurement (r6 verdict ask #5).

Synthetic power-law co-occurrence graph: two planted hubs of degree
8,000 over a 1M-edge random background.  The common-neighbor wedge
join fans each hub into C(8000, 2) ≈ 32M wedge rows that all share
ONE shuffle key — the skew the guard exists for.  Measures the plain
equi-join vs _salted_wedge_join (hub_cap 4096, salts 16) on the same
frame, checks the aggregated outputs are identical, prints both
timings for SCALE_NOTES.md.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from bench import build_spark  # noqa: E402

HUB_DEG = 8000
BG_EDGES = 1_000_000
NODES = 200_000


def main() -> None:
    from pyspark.sql import functions as F

    from spark_bi5_datasource_spark.plans.round4_ops import _salted_wedge_join

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "128")

    # background: pseudo-random sparse edges (deterministic xxhash mix)
    bg = (
        spark.range(BG_EDGES)
        .select(
            (F.abs(F.xxhash64("id")) % NODES).alias("u"),
            (F.abs(F.xxhash64("id", F.lit(1))) % NODES).alias("v"),
        )
        .where("u < v")
    )
    hubs = spark.range(HUB_DEG).select(
        F.lit(1_000_000).alias("u"), (F.col("id") + 10).alias("v")
    ).unionAll(
        spark.range(HUB_DEG).select(
            F.lit(1_000_001).alias("u"), (F.col("id") + 5000).alias("v")
        )
    )
    e = bg.unionAll(hubs)
    adj = e.select(
        F.col("u").alias("node"), F.col("v").alias("nbr")
    ).unionAll(e.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
    adj = adj.persist()
    n_adj = adj.count()
    print(f"# adjacency rows: {n_adj}", file=sys.stderr)

    x = adj.toDF("u", "nbr")
    y = adj.toDF("v", "nbr")

    def checksum(pairs):
        # order-independent fingerprint of the (u, v, com) multiset
        return pairs.groupBy("u", "v").agg(
            F.count("*").alias("com")
        ).agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v, com))").alias("h"),
        ).collect()[0]

    res = {}
    for name, joined in (
        ("plain", x.join(y, "nbr")),
        ("salted", _salted_wedge_join(x, y, "nbr", "u")),
    ):
        wedges = joined.filter(F.col("u") < F.col("v"))
        t0 = time.time()
        row = checksum(wedges)
        res[name] = (round(time.time() - t0, 1), row["n"], row["h"])
        print(f"# {name}: {res[name]}", file=sys.stderr)

    assert res["plain"][1:] == res["salted"][1:], res
    print(
        f"wedge skew x-graph (2 hubs deg {HUB_DEG}, {BG_EDGES} bg edges): "
        f"plain {res['plain'][0]}s vs salted {res['salted'][0]}s, "
        f"outputs identical ({res['plain'][1]} pairs)"
    )
    adj.unpersist()


if __name__ == "__main__":
    main()
