#!/usr/bin/env python
"""r14 optimization round: per-query baseline profile of the sf0.1
bench roster.

For every bench-roster entry (same set bench.py times), in ONE session
with the exact bench session config:
  * capture .explain("formatted") -> plans/r14/<name>_<tag>.txt
  * time it with the bench discipline (warm-up + min-of-N noop)
Sentinel scan legs bracket the window (drift protocol, bench.py).

Usage: python scripts/r14_profile.py [--tag before|after] [--queries a,b,c]
Writes R14_PROFILE_<tag>.json next to the repo root.
"""
from __future__ import annotations

import argparse
import io
import json
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (bench session config + timing discipline)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--queries", default="")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from spark_bi5_datasource_spark import plans, register

    spark = bench.build_spark()
    register(spark)

    plan_dir = os.path.join(REPO, "plans", "r14")
    os.makedirs(plan_dir, exist_ok=True)

    roster = plans.bench_queries()
    if args.queries:
        want = args.queries.split(",")
        roster = {n: f for n, f in roster.items() if n in want}

    # same warm-up as bench.main()
    warm = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    warm.groupBy("l_returnflag").count().write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict = {"tag": args.tag, "sf_dir": SF_DIR, "loadavg": os.getloadavg()}
    out["sentinel_start"] = bench.scan_sentinel(spark, SF_DIR)
    timings: dict[str, float] = {}
    for name, fn in roster.items():
        spark.sparkContext.setJobDescription(f"r14-profile:{name}")
        df = fn(spark, SF_DIR)
        with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"), "w") as f:
            f.write(explain_str(df))
        timings[name] = bench.timed(df, runs=args.runs)
        print(f"{name}: {timings[name]}", flush=True)
    out["sentinel_end"] = bench.scan_sentinel(spark, SF_DIR)
    out["queries"] = timings
    out["total"] = round(sum(timings.values()), 3)
    path = os.path.join(REPO, f"R14_PROFILE_{args.tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))
    spark.stop()


if __name__ == "__main__":
    main()
