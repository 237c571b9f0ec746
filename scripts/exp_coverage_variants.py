#!/usr/bin/env python
"""r9: dq_doc_embedding_coverage probed 3.5 s vs DuckDB 0.11 s at
x1000 (BENCH_X1000_R13, 30.8x — worst ratio on the books).  The
shipped plan runs TWO separate id joins over the same 5M x 5M frames
(per-source left join + orphan left_anti), i.e. two scans of each
table and two id exchanges.  Race it against:

* one FULL OUTER id join feeding one per-source aggregate, with the
  orphan count read off the NULL-source group (one scan of each
  table, one id exchange, one 21-row second-level agg), and
* the scan floor: count(*) + a cheap agg over each table alone — the
  irreducible cost any formulation pays.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from bench import SF_DIR, build_spark, synth_scaled_dir, timed  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from spark_bi5_datasource_spark import plans

    scaled = synth_scaled_dir(SF_DIR, 1000, ["documents", "embeddings"])
    spark = build_spark()
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    out: dict = {"x": 1000}

    fn = plans.CATALOG["dq_doc_embedding_coverage"][0]
    out["shipped_two_join"] = timed(fn(spark, scaled), runs=2)
    print(f"# shipped: {out['shipped_two_join']}", file=sys.stderr)

    d = spark.read.parquet(f"{scaled}/documents.parquet").select(
        "doc_id", "source"
    )
    e = spark.read.parquet(f"{scaled}/embeddings.parquet").select("vec_id")

    def full_outer():
        f = d.join(e, d.doc_id == e.vec_id, "full_outer")
        per = f.groupBy("source").agg(
            F.count("doc_id").cast("bigint").alias("n_docs"),
            F.sum(
                F.expr(
                    "CASE WHEN doc_id IS NOT NULL AND vec_id IS NOT NULL"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("n_with_vec"),
            F.sum(
                F.expr("CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END")
            )
            .cast("bigint")
            .alias("n_orph"),
        )
        orph = per.agg(
            F.sum("n_orph").cast("bigint").alias("orphan_vectors")
        )
        return (
            per.where("source IS NOT NULL")
            .crossJoin(F.broadcast(orph))
            .select(
                "source",
                "n_docs",
                "n_with_vec",
                F.expr(
                    "CAST(n_with_vec * 1000000 div n_docs AS BIGINT)"
                ).alias("coverage_ppm"),
                "orphan_vectors",
            )
            .orderBy("source")
        )

    out["v_full_outer_onepass"] = timed(full_outer(), runs=2)
    print(f"# full outer: {out['v_full_outer_onepass']}", file=sys.stderr)

    floor = d.groupBy("source").agg(F.count("*").alias("n")).unionByName(
        e.groupBy(F.lit("__e").alias("source")).agg(
            F.count("vec_id").alias("n")
        )
    )
    out["scan_floor_both_tables"] = timed(floor, runs=2)
    print(f"# scan floor: {out['scan_floor_both_tables']}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
