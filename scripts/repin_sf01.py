#!/usr/bin/env python
"""Idle-box sf0.1 headline re-pin (r6 verdict ask #8).

Runs the bench roster at SPARK_GRAFT_SF_DIR with min-of-5 timing
(one warm-up + 5 timed runs per query — the q5 re-pin protocol from
round 5) so the committed sf0.1 column has an idle-box anchor that
round-over-round BENCH_rN deltas can be read against.  Writes
BENCH_SF01_IDLE.json {query: sec} plus the load average observed.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF_DIR, build_spark, timed  # noqa: E402


def main() -> None:
    from spark_bi5_datasource_spark import plans, register

    spark = build_spark()
    register(spark)
    warm = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    warm.groupBy("l_returnflag").count().write.format("noop").mode(
        "overwrite"
    ).save()

    timings = {}
    for name, fn in plans.bench_queries().items():
        timings[name] = timed(fn(spark, SF_DIR), runs=5)
        print(f"# {name}: {timings[name]}", file=sys.stderr)

    out = {
        "sf_dir": SF_DIR,
        "protocol": "warmup + min-of-5",
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "total": round(sum(timings.values()), 3),
        "queries": timings,
    }
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "BENCH_SF01_IDLE.json"), "w"
    ) as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"total": out["total"], "n": len(timings)}))


if __name__ == "__main__":
    main()
