#!/usr/bin/env python
"""r13 A/B: dedup_minhash exact-pre-pass + frame-width restructure.

Current shape: exact_dedup (window row_number over text, full frame)
-> _minhash_dedup_once carries survivors' full frame to the final
anti-join.  Candidate shape: run the whole pipeline on a projected
(id, text) frame, exact pre-pass as groupBy(text).agg(min(id))
(map-side partial agg, no sort), and re-attach the query's extra
columns (lang, source) with ONE final left-semi join on id.

Checks survivor-id-set equality first; timing only meaningful on an
idle box.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from spark_bi5_datasource_spark import register
    from spark_bi5_datasource_spark.operators.dedup import (
        _minhash_dedup_once,
        exact_dedup,
    )
    from spark_bi5_datasource_spark.plans.tables import t

    spark = bench.build_spark()
    register(spark)

    docs = t(spark, SF, "documents")

    # A: current installed shape
    def variant_a():
        out = exact_dedup(docs, ["text"], "doc_id")
        out = _minhash_dedup_once(out, "doc_id", "text", 3, 32, 8, 0.5)
        return out.select("doc_id", "lang", "source")

    # B: narrow pipeline + groupBy exact pass + final semi-join
    def variant_b():
        ids = docs.select("doc_id", "text")
        out = ids.groupBy("text").agg(
            F.min("doc_id").alias("doc_id")
        ).select("doc_id", "text")
        out = _minhash_dedup_once(out, "doc_id", "text", 3, 32, 8, 0.5)
        return docs.join(out.select("doc_id"), "doc_id", "left_semi").select(
            "doc_id", "lang", "source"
        )

    a, b = variant_a(), variant_b()
    ra = {r.doc_id for r in a.select("doc_id").collect()}
    rb = {r.doc_id for r in b.select("doc_id").collect()}
    print(f"survivors A={len(ra)} B={len(rb)} equal={ra == rb}", flush=True)
    if ra != rb:
        print("DIFF sample:", sorted(ra ^ rb)[:10])
        return

    # interleaved timing, min-of-3 per arm
    for tag, fn in [("A", variant_a), ("B", variant_b)] * 2:
        spark.sparkContext.setJobDescription(f"exp-exact:{tag}")
        print(tag, bench.timed(fn(), runs=3), flush=True)


if __name__ == "__main__":
    main()
