#!/usr/bin/env python
"""Fresh-JVM composite legs for the r11 probe (perf_x1000_round17).

Modes (argv[1]):
* coverage_pair QUERYDIR SHUF — ask #2's settle-the-discrepancy leg:
  in ONE JVM, enable the documents/embeddings bucketed layout, PRINT
  the is_bucketed booleans for both tables (the r10 verdict's
  verification demand), then time dq_doc_embedding_coverage and its
  own two-table scan floor BACK-TO-BACK (same JVM, seconds apart) so
  the two numbers can no longer disagree across box states.
* encoding_floor QUERYDIR SHUF — text_encoding_audit's minimal
  decode floor: one scan computing sum(octet_length)/sum(char
  length) over documents.text — the cheapest plan that still
  materializes every string, i.e. the floor no rewrite of the audit
  can go below.

Prints one JSON line on stdout.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from bench import build_spark, timed  # noqa: E402


def main() -> None:
    mode, scaled, shuf = sys.argv[1:4]
    from pyspark.sql import functions as F

    from spark_bi5_datasource_spark import plans
    from spark_bi5_datasource_spark.plans.tables import (
        ensure_bucketed_layout,
        is_bucketed,
        t,
    )

    spark = build_spark()
    spark.conf.set("spark.sql.shuffle.partitions", shuf)
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
    )
    out: dict = {"mode": mode, "shuf": shuf}

    if mode == "coverage_pair":
        ensure_bucketed_layout(
            spark, scaled, tables=["documents", "embeddings"]
        )
        out["is_bucketed_documents"] = is_bucketed(
            spark, scaled, "documents"
        )
        out["is_bucketed_embeddings"] = is_bucketed(
            spark, scaled, "embeddings"
        )
        fn = plans.CATALOG["dq_doc_embedding_coverage"][0]
        out["entry_sec"] = timed(fn(spark, scaled), runs=3)
        d = t(spark, scaled, "documents").select("doc_id", "source")
        e = t(spark, scaled, "embeddings").select(
            F.col("vec_id").alias("doc_id"),
            F.lit(None).cast("string").alias("source"),
        )
        out["scan_floor_sec"] = timed(
            d.unionByName(e).agg(F.count("*").alias("n")), runs=3
        )
    elif mode == "encoding_floor":
        docs = t(spark, scaled, "documents")
        out["decode_floor_sec"] = timed(
            docs.agg(
                F.sum(F.octet_length("text")).alias("b"),
                F.sum(F.length("text")).alias("c"),
            ),
            runs=3,
        )
    else:
        raise SystemExit(f"unknown mode {mode}")

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
