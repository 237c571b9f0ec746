#!/usr/bin/env python
"""r9: decompose orders_backlog_aging's 353 s x1000 probe number
(BENCH_X1000_R13: 2.55x vs DuckDB 138.7 s) and race the candidate
rewrites, min-of-2 warm each:

* pieces: the lineitem max-shipdate aggregate alone, then + the
  orders join, then the shipped plan.
* variants: 256/512 shuffle partitions (spill check), a shuffle-hash
  join hint on the agg-orders join (skip the SMJ sorts), an
  indicator aggregate (max(shipdate > d) boolean instead of the date
  max — narrower exchange), and the EXISTS split (semi on the 27%
  shipdate > d slice + anti for line-less orders; measured because
  the semi build is 99M distinct keys — likely not a win, recorded
  either way).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from bench import SF_DIR, build_spark, run_noop, synth_scaled_dir, timed  # noqa: E402

D = "2000-01-01"


def main() -> None:
    from pyspark.sql import functions as F

    from spark_bi5_datasource_spark import plans

    scaled = synth_scaled_dir(SF_DIR, 1000, ["lineitem", "orders"])
    spark = build_spark()
    spark.conf.set("spark.sql.shuffle.partitions", "128")

    li = spark.read.parquet(f"{scaled}/lineitem.parquet")
    o = spark.read.parquet(f"{scaled}/orders.parquet").select(
        "o_orderkey",
        F.expr("CAST(o_orderdate AS DATE)").alias("od"),
    )
    out: dict = {"x": 1000}

    agg = li.groupBy("l_orderkey").agg(
        F.max(F.expr("CAST(l_shipdate AS DATE)")).alias("mx")
    )
    out["p1_agg_alone"] = timed(agg, runs=2)
    print(f"# p1 agg alone: {out['p1_agg_alone']}", file=sys.stderr)

    def shipped():
        open_o = (
            o.join(agg, o.o_orderkey == agg.l_orderkey, "left")
            .where(f"od <= DATE'{D}' AND (mx IS NULL OR mx > DATE'{D}')")
            .select("od")
        )
        return open_o.groupBy(
            F.expr(f"least(datediff(DATE'{D}', od) div 30, 12)").alias("b")
        ).agg(F.count("*").alias("n"))

    out["p2_shipped_shape"] = timed(shipped(), runs=2)
    print(f"# p2 shipped shape: {out['p2_shipped_shape']}", file=sys.stderr)

    for parts in (256, 512):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        out[f"v_parts_{parts}"] = timed(shipped(), runs=2)
        print(f"# parts={parts}: {out[f'v_parts_{parts}']}", file=sys.stderr)
    spark.conf.set("spark.sql.shuffle.partitions", "128")

    def shj():
        a = agg.hint("shuffle_hash")
        open_o = (
            o.join(a, o.o_orderkey == a.l_orderkey, "left")
            .where(f"od <= DATE'{D}' AND (mx IS NULL OR mx > DATE'{D}')")
            .select("od")
        )
        return open_o.groupBy(
            F.expr(f"least(datediff(DATE'{D}', od) div 30, 12)").alias("b")
        ).agg(F.count("*").alias("n"))

    out["v_shj_hint"] = timed(shj(), runs=2)
    print(f"# shj hint: {out['v_shj_hint']}", file=sys.stderr)

    def indicator():
        a = li.groupBy("l_orderkey").agg(
            F.max(
                F.expr(f"CAST(CAST(l_shipdate AS DATE) > DATE'{D}' AS INT)")
            ).alias("open_i")
        ).hint("shuffle_hash")
        open_o = (
            o.join(a, o.o_orderkey == a.l_orderkey, "left")
            .where(f"od <= DATE'{D}' AND (open_i IS NULL OR open_i = 1)")
            .select("od")
        )
        return open_o.groupBy(
            F.expr(f"least(datediff(DATE'{D}', od) div 30, 12)").alias("b")
        ).agg(F.count("*").alias("n"))

    out["v_indicator_shj"] = timed(indicator(), runs=2)
    print(f"# indicator+shj: {out['v_indicator_shj']}", file=sys.stderr)

    def exists_split():
        ok = o.where(f"od <= DATE'{D}'")
        late = li.where(f"CAST(l_shipdate AS DATE) > DATE'{D}'").select(
            F.col("l_orderkey").alias("k")
        )
        allk = li.select(F.col("l_orderkey").alias("k"))
        semi = ok.join(late, ok.o_orderkey == late.k, "left_semi")
        anti = ok.join(allk, ok.o_orderkey == allk.k, "left_anti")
        open_o = semi.unionByName(anti).select("od")
        return open_o.groupBy(
            F.expr(f"least(datediff(DATE'{D}', od) div 30, 12)").alias("b")
        ).agg(F.count("*").alias("n"))

    out["v_exists_split"] = timed(exists_split(), runs=2)
    print(f"# exists split: {out['v_exists_split']}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
