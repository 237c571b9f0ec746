#!/usr/bin/env python
"""Does starting AQE fine-grained stabilize the x1000 unbucketed SMJ?

The unbucketed q3/q5 at x1000 sort-merge 600M x 150M through 32
shuffle partitions (~19M rows each) — the sort spills, and the probe
numbers swing 30-40 % run-to-run.  AQE's coalescePartitions can start
from a much larger initialPartitionNum and merge down where cheap, so
the sort partitions shrink without hurting small stages.  Sweep
initialPartitionNum x {32 (baseline), 128, 256} over the join shapes,
fresh JVM per config; bucketed reruns ride along to confirm the knob
is neutral for the co-located layout.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF_DIR, synth_scaled_dir, timed  # noqa: E402
from scripts.exp_agg_constants import build  # noqa: E402

QUERIES = ["q3_top_revenue_orders", "q5_region_revenue"]
CONFIGS = {
    "A_init32": {},
    "B_init128": {"spark.sql.adaptive.coalescePartitions.initialPartitionNum": "128"},
    "C_init256": {"spark.sql.adaptive.coalescePartitions.initialPartitionNum": "256"},
}


def main() -> None:
    from spark_bi5_datasource_spark import plans, register
    from spark_bi5_datasource_spark.plans.tables import ensure_bucketed_layout

    scaled = synth_scaled_dir(SF_DIR, 1000, [
        "lineitem", "orders", "customer", "supplier", "nation", "region",
    ])
    qs = {n: fn for n, (fn, _s, _b) in plans.CATALOG.items()}

    out: dict[str, dict[str, float]] = {}
    for cname, conf in CONFIGS.items():
        conf = dict(conf)
        conf["spark.sql.files.maxPartitionBytes"] = str(512 * 1024 * 1024)
        spark = build(conf)
        register(spark)
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        out[cname] = {}
        for q in QUERIES:
            out[cname][q] = timed(qs[q](spark, scaled), runs=2)
            print(f"# {cname} {q}: {out[cname][q]}", file=sys.stderr, flush=True)
        ensure_bucketed_layout(spark, scaled)
        for q in QUERIES:
            out[cname][f"{q}_bucketed"] = timed(qs[q](spark, scaled), runs=2)
            print(
                f"# {cname} {q} bucketed: {out[cname][f'{q}_bucketed']}",
                file=sys.stderr, flush=True,
            )
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
