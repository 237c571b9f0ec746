#!/usr/bin/env python
"""r14: x100 scale probe of the round's target queries (fresh JVM,
sentinel-bracketed, min-of-N noop timing — the bench discipline).

Usage: python scripts/r14_x100_probe.py [--tag before|after] [--queries a,b,c] [--runs N]
Writes R14_X100_<tag>.json at the repo root.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = (
    "basket_association_lift,sql_tpch_q21,dedup_winnow_pairs,"
    "dedup_winnowing_fingerprints,dedup_minhash,tok_zipf_profile"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--queries", default=DEFAULT)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--bucketed", action="store_true",
                    help="use the driver's warehouse layout (bucketed "
                         "fact tables + 64m broadcast threshold, as "
                         "bench.run_scaled does)")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_MEM", "32g")
    t0 = time.time()
    d = bench.synth_scaled_dir(
        SRC, 100,
        tables=["documents", "lineitem", "events", "embeddings", "orders",
                "customer", "supplier", "nation", "region", "part"],
    )
    print(f"scaled dir ready in {time.time() - t0:.1f}s -> {d}", flush=True)

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
    qs = {n: fn for n, (fn, _s, _b) in plans.CATALOG.items()}

    out: dict = {"tag": args.tag, "x": 100, "bucketed": args.bucketed,
                 "loadavg": os.getloadavg()}
    out["sentinel_start"] = bench.scan_sentinel(spark, d)
    timings: dict[str, float] = {}
    for name in args.queries.split(","):
        spark.sparkContext.setJobDescription(f"r14-x100:{name}")
        df = qs[name](spark, d)
        timings[name] = bench.timed(df, runs=args.runs)
        print(f"{name}: {timings[name]}", flush=True)
    out["sentinel_end"] = bench.scan_sentinel(spark, d)
    out["queries"] = timings
    out["total"] = round(sum(timings.values()), 3)
    path = os.path.join(REPO, f"R14_X100_{args.tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
