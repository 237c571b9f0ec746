#!/usr/bin/env python
"""r14 VERDICT item 3: sql_tpch_q21 — share ONE l_orderkey exchange
between the two count-DISTINCT branches and the late-rows join.

Today's Spark-side restructure (two per-order count(DISTINCT
l_suppkey) aggregates) re-shuffles lineitem-scale rows on l_orderkey
in each branch on the plain layout.  A REPARTITION(l_orderkey) hint on
the shared lineitem projection makes every consumer (ordsupp's
two-phase distinct agg, the late join, latesupp via the join output's
partitioning) reuse one exchange — the measured-win pattern from
basket r13 §9 (HashPartitioning([ok]) satisfies ClusteredDistribution
for every (ok, ...) clustering downstream).

A/Bs current vs shared-exchange interleaved in one session, checks
exact result equality first, and dumps both final plans.

    python scripts/exp_r14_q21_sharedex.py [--x 100] [--sf] [--bucketed]
"""
from __future__ import annotations

import argparse
import io
import json
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_Q21_SHARED_SQL = """
    WITH lx AS (
      SELECT /*+ REPARTITION(l_orderkey) */ l_orderkey, l_suppkey, l_shipdate
      FROM {p}lineitem
    ), late AS (
      SELECT lx.l_orderkey, lx.l_suppkey
      FROM lx
      JOIN {p}orders o ON o.o_orderkey = lx.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND lx.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    ), ordsupp AS (
      SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp
      FROM lx GROUP BY l_orderkey
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


def q21_shared(spark, sf):
    from spark_bi5_datasource_spark.plans.fastmoney import spark_fast_sql
    from spark_bi5_datasource_spark.plans.tables import t

    for tb in ("supplier", "lineitem", "orders", "nation", "region"):
        t(spark, sf, tb).createOrReplaceTempView(f"q21_{tb}")
    return spark.sql(spark_fast_sql(_Q21_SHARED_SQL).format(p="q21_"))


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--x", type=int, default=100)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--bucketed", action="store_true")
    ap.add_argument("--skip-equality", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_MEM", "32g")
    d = bench.synth_scaled_dir(
        SRC, args.x,
        tables=["lineitem", "orders", "supplier", "nation", "region"],
    ) if args.x > 1 else SRC

    from spark_bi5_datasource_spark import plans, register

    spark = bench.build_spark()
    register(spark)
    if args.bucketed:
        from spark_bi5_datasource_spark.plans.tables import (
            ensure_bucketed_layout,
        )

        ensure_bucketed_layout(spark, d)
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    old_df = plans.CATALOG["sql_tpch_q21"][0](spark, d)
    new_df = q21_shared(spark, d)

    if not args.skip_equality:
        a = [tuple(r) for r in old_df.collect()]
        b = [tuple(r) for r in new_df.collect()]
        assert a == b, f"RESULT MISMATCH: {a[:3]} vs {b[:3]}"
        print(f"results equal: {len(a)} rows", flush=True)

    tagb = "bucketed" if args.bucketed else "plain"
    with open(f"/tmp/q21_shared_{tagb}_x{args.x}.txt", "w") as f:
        f.write(explain_str(new_df))
    with open(f"/tmp/q21_current_{tagb}_x{args.x}.txt", "w") as f:
        f.write(explain_str(old_df))

    out = {"x": args.x, "bucketed": args.bucketed,
           "loadavg": os.getloadavg(),
           "sentinel_start": bench.scan_sentinel(spark, d)}
    olds, news = [], []
    for rep in range(args.reps):
        spark.sparkContext.setJobDescription(f"q21-current:{rep}")
        olds.append(bench.timed(old_df, runs=args.runs))
        spark.sparkContext.setJobDescription(f"q21-shared:{rep}")
        news.append(bench.timed(new_df, runs=args.runs))
        print(f"rep {rep}: current={olds[-1]} shared={news[-1]}", flush=True)
    out["sentinel_end"] = bench.scan_sentinel(spark, d)
    out.update(current=olds, shared=news)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
