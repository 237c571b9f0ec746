#!/usr/bin/env python
"""r14: sql_tpch_q21 — materialize the late CTE once via a
REPARTITION(l_orderkey) hint on its output, so the two inlined copies
(l1 rows + latesupp) canonicalize to ONE exchange and the whole
lineitem⋈orders join subtree deduplicates via ReuseExchange.

Plain layout: saves one SMJ re-execution over the (already shared)
lineitem/orders shuffles.  Bucketed layout (the driver's x100
contract): saves a full bucketed lineitem+orders scan AND the join —
there is no exchange below the join there, so today nothing reuses.
Cost on both: one exchange of the late rows themselves (the join is
selective: status F x >30-day-late).

    python scripts/exp_r14_q21_latex.py [--x 100] [--bucketed] [--reps 3]
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

_Q21_LATEX_SQL = """
    WITH late AS (
      SELECT /*+ REPARTITION(l_orderkey) */ l.l_orderkey, l.l_suppkey
      FROM {p}lineitem l
      JOIN {p}orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
        AND l.l_suppkey IS NOT NULL
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


def q21_latex(spark, sf):
    from spark_bi5_datasource_spark.plans.fastmoney import spark_fast_sql
    from spark_bi5_datasource_spark.plans.tables import t

    for tb in ("supplier", "lineitem", "orders", "nation", "region"):
        t(spark, sf, tb).createOrReplaceTempView(f"q21lx_{tb}")
    return spark.sql(spark_fast_sql(_Q21_LATEX_SQL).format(p="q21lx_"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--x", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
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
    cur_df = plans.CATALOG["sql_tpch_q21"][0](spark, d)
    new_df = q21_latex(spark, d)

    if not args.skip_equality:
        a = [tuple(r) for r in cur_df.collect()]
        b = [tuple(r) for r in new_df.collect()]
        assert a == b, "RESULT MISMATCH"
        print(f"results equal ({len(a)} rows)", flush=True)

    tagb = "bucketed" if args.bucketed else "plain"
    new_df.collect()
    buf = io.StringIO()
    with redirect_stdout(buf):
        new_df.explain("formatted")
    with open(f"/tmp/q21_latex_{tagb}_x{args.x}.txt", "w") as f:
        f.write(buf.getvalue())
    final = buf.getvalue().split("== Initial Plan ==")[0]
    print("latex final plan: ReusedExchange:", final.count("ReusedExchange"),
          flush=True)

    out = {"x": args.x, "bucketed": args.bucketed, "loadavg": os.getloadavg(),
           "sentinel_start": bench.scan_sentinel(spark, d)}
    cur, new = [], []
    for rep in range(args.reps):
        spark.sparkContext.setJobDescription(f"q21-current:{rep}")
        cur.append(bench.timed(cur_df, runs=args.runs))
        spark.sparkContext.setJobDescription(f"q21-latex:{rep}")
        new.append(bench.timed(new_df, runs=args.runs))
        print(f"rep {rep}: current={cur[-1]} latex={new[-1]}", flush=True)
    out["sentinel_end"] = bench.scan_sentinel(spark, d)
    out.update(current=cur, latex=new)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
