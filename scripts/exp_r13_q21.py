#!/usr/bin/env python
"""r13 A/B: q21 single-pass restructure.

Current Spark shape (_Q21_SPARK_SQL): late fact rows + two separate
per-order count(DISTINCT l_suppkey) aggregates (all / late), joined
back to the late rows — two lineitem scans, three heavy branches.

Candidate: ONE lineitem JOIN orders pass computing per order
  n_supp   = count(DISTINCT sk)
  n_late   = count(DISTINCT CASE WHEN late THEN sk END)
  late_sk  = max(CASE WHEN late THEN sk END)   -- THE late supplier when n_late=1
  n_late_rows = count(CASE WHEN late THEN 1 END)
then filter n_supp >= 2 AND n_late = 1 and join the per-order frame
straight to supplier/nation/region; numwait = sum(n_late_rows).
Orders with status <> 'F' get n_late = 0 and drop out, so the status
filter lives only inside the late predicate — same semantics as the
EXISTS/NOT EXISTS original.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_ONEPASS = """
    WITH counts AS (
      SELECT l.l_orderkey,
        count(DISTINCT l.l_suppkey) AS n_supp,
        count(DISTINCT CASE WHEN o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
          THEN l.l_suppkey END) AS n_late,
        max(CASE WHEN o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
          THEN l.l_suppkey END) AS late_sk,
        count(CASE WHEN o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
          THEN 1 END) AS n_late_rows
      FROM {p}lineitem l
      JOIN {p}orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY l.l_orderkey
    )
    SELECT s.s_name, CAST(sum(n_late_rows) AS BIGINT) AS numwait
    FROM counts c
    JOIN {p}supplier s ON s.s_suppkey = c.late_sk
    JOIN {p}nation n ON s.s_nationkey = n.n_nationkey
    JOIN {p}region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND c.n_supp >= 2 AND c.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
"""


def main() -> None:
    from spark_bi5_datasource_spark import register
    from spark_bi5_datasource_spark.plans.tables import t

    spark = bench.build_spark()
    register(spark)
    for tbl in ("lineitem", "orders", "supplier", "nation", "region"):
        t(spark, SF, tbl).createOrReplaceTempView(tbl)

    import __spark_entry__ as e

    cur = e.queries()["sql_tpch_q21"](spark, SF)
    new = spark.sql(_ONEPASS.format(p=""))
    ra = [tuple(r) for r in cur.collect()]
    rb = [tuple(r) for r in new.collect()]
    print("equal:", ra == rb, len(ra), len(rb), flush=True)
    if ra != rb:
        diff = [(x, y) for x, y in zip(ra, rb) if x != y][:5]
        print("DIFF:", diff)
        return
    for tag, df in [("cur", cur), ("one", new)] * 2:
        spark.sparkContext.setJobDescription(f"exp-q21:{tag}")
        print(tag, bench.timed(df, runs=3), flush=True)


if __name__ == "__main__":
    main()
