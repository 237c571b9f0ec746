#!/usr/bin/env python
"""r14: interleaved A/B of the two installed shapes vs their r13
predecessors, in one session.

  * sql_tpch_q21 — r13 two-aggregate shape WITHOUT the late-CTE
    isnotnull(l_suppkey) alignment (three lineitem exchanges) vs the
    installed aligned shape (ReusedExchange, two).
  * dedup_winnow_pairs — r13 collect_set-then-band shape vs the
    installed count-band-then-collect_set two-pass.

    python scripts/exp_r14_q21_winnow_ab.py [--x 100] [--reps 2]
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

_Q21_R13_SQL = """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM {p}lineitem l
      JOIN {p}orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    ), ordsupp AS (
      SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp
      FROM {p}lineitem GROUP BY l_orderkey
    ), latesupp AS (
      SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_late
      FROM late GROUP BY l_orderkey
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN ordsupp os ON os.l_orderkey = l1.l_orderkey AND os.n_supp >= 2
    JOIN latesupp ls ON ls.l_orderkey = l1.l_orderkey AND ls.n_late = 1
    JOIN {p}supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN {p}nation n ON s.s_nationkey = n.n_nationkey
    JOIN {p}region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
"""


def q21_r13(spark, sf):
    from spark_bi5_datasource_spark.plans.fastmoney import spark_fast_sql
    from spark_bi5_datasource_spark.plans.tables import t

    for tb in ("supplier", "lineitem", "orders", "nation", "region"):
        t(spark, sf, tb).createOrReplaceTempView(f"q21r13_{tb}")
    return spark.sql(spark_fast_sql(_Q21_R13_SQL).format(p="q21r13_"))


def winnow_r13(spark, sf):
    from spark_bi5_datasource_spark.operators.pairs import unfold_sorted_pairs
    from spark_bi5_datasource_spark.operators.winnowing import (
        winnow_fingerprints,
    )
    from spark_bi5_datasource_spark.plans.tables import t

    docs = t(spark, sf, "documents")
    fps = winnow_fingerprints(docs, "doc_id", "text")
    inv = (
        fps.groupBy("fp")
        .agg(F.expr("sort_array(collect_set(doc_id))").alias("ds"))
        .where("size(ds) BETWEEN 2 AND 50")
    )
    pairs = unfold_sorted_pairs(inv, "ds", "doc_a", "doc_b")
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .where("n_shared >= 2")
        .orderBy(F.desc("n_shared"), "doc_a", "doc_b")
        .limit(200)
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
        SRC, args.x,
        tables=["documents", "lineitem", "orders", "supplier", "nation",
                "region"],
    ) if args.x > 1 else SRC

    from spark_bi5_datasource_spark import plans, register

    spark = bench.build_spark()
    register(spark)
    cases = {
        "sql_tpch_q21": (q21_r13(spark, d),
                         plans.CATALOG["sql_tpch_q21"][0](spark, d)),
        "dedup_winnow_pairs": (winnow_r13(spark, d),
                               plans.CATALOG["dedup_winnow_pairs"][0](spark, d)),
    }
    if not args.skip_equality:
        for name, (old_df, new_df) in cases.items():
            a = [tuple(r) for r in old_df.collect()]
            b = [tuple(r) for r in new_df.collect()]
            assert a == b, f"{name} RESULT MISMATCH"
            print(f"{name}: results equal ({len(a)} rows)", flush=True)

    out = {"x": args.x, "loadavg": os.getloadavg(),
           "sentinel_start": bench.scan_sentinel(spark, d), "results": {}}
    for name, (old_df, new_df) in cases.items():
        olds, news = [], []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name}-r13:{rep}")
            olds.append(bench.timed(old_df, runs=args.runs))
            spark.sparkContext.setJobDescription(f"{name}-r14:{rep}")
            news.append(bench.timed(new_df, runs=args.runs))
            print(f"{name} rep {rep}: r13={olds[-1]} r14={news[-1]}",
                  flush=True)
        out["results"][name] = {"r13": olds, "r14": news}
    out["sentinel_end"] = bench.scan_sentinel(spark, d)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
