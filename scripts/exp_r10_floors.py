#!/usr/bin/env python
"""r10 floor decompositions for the same-window >2x survivors of
BENCH_X1000_R16 whose plans are already minimal — establish how much
of each gap is the engine scan/shuffle constant (the
text_url_email_stats discipline) vs addressable plan cost.  x1000,
one session, Spark legs then DuckDB legs minutes apart.

* text_encoding_audit  — decode floor (one octet_length pass, zero
  string ops) vs +instr vs +the two replaces (the full op).
* dedup_band_tuning_monitor — the doc_id<200 slice-scan floor (what
  pushdown leaves) vs the full 3-band tuning table.
* dq_doc_embedding_coverage — the two-table id-scan floor vs the
  bucketed full-outer (BENCH_X1000_R16's 0.74 s leg), under the
  bucketed layout so the join itself is exchange-free.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from bench import CPUS, SF_DIR, build_spark, synth_scaled_dir, timed  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from spark_bi5_datasource_spark import plans
    from spark_bi5_datasource_spark.plans.tables import (
        ensure_bucketed_layout,
        t,
    )

    scaled = synth_scaled_dir(SF_DIR, 1000, ["documents", "embeddings"])
    spark = build_spark()
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    out: dict = {"x": 1000}

    docs = t(spark, scaled, "documents").where("text IS NOT NULL")

    # ---- encoding audit decomposition
    out["enc_decode_floor"] = timed(
        docs.groupBy("source").agg(
            F.sum(F.octet_length("text")).alias("b")
        ),
        runs=2,
    )
    out["enc_plus_instr"] = timed(
        docs.groupBy("source").agg(
            F.sum(F.octet_length("text")).alias("b"),
            F.sum(F.expr("instr(text, 'é')")).alias("i"),
        ),
        runs=2,
    )
    fn = plans.CATALOG["text_encoding_audit"][0]
    out["enc_full"] = timed(fn(spark, scaled), runs=2)
    print(
        f"# enc: decode={out['enc_decode_floor']} "
        f"+instr={out['enc_plus_instr']} full={out['enc_full']}",
        file=sys.stderr,
    )

    # ---- tuning-monitor decomposition
    sl = docs.where("doc_id < 200")
    out["tune_slice_floor"] = timed(
        sl.agg(F.count("*").alias("n"), F.sum(F.length("text")).alias("c")),
        runs=2,
    )
    p = (
        sl.agg(F.count("*").alias("n"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    out["tune_pushdown"] = "PushedFilters: [" in p and "LessThan(doc_id,200)" in p
    fn = plans.CATALOG["dedup_band_tuning_monitor"][0]
    out["tune_full"] = timed(fn(spark, scaled), runs=2)
    print(
        f"# tune: slice={out['tune_slice_floor']} full={out['tune_full']} "
        f"pushdown={out['tune_pushdown']}",
        file=sys.stderr,
    )

    # ---- coverage decomposition (bucketed layout)
    ensure_bucketed_layout(spark, scaled, tables=["documents", "embeddings"])
    d = t(spark, scaled, "documents").select("doc_id", "source")
    e = t(spark, scaled, "embeddings").select("vec_id")
    out["cov_scan_floor"] = timed(
        d.groupBy("source").agg(F.count("*").alias("n")).unionByName(
            e.groupBy(F.lit("__e").alias("source")).agg(
                F.count("vec_id").alias("n")
            )
        ),
        runs=2,
    )
    fn = plans.CATALOG["dq_doc_embedding_coverage"][0]
    out["cov_full_bucketed"] = timed(fn(spark, scaled), runs=2)
    print(
        f"# cov: scan={out['cov_scan_floor']} "
        f"full_bucketed={out['cov_full_bucketed']}",
        file=sys.stderr,
    )

    # ---- DuckDB same-window legs
    import duckdb

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={CPUS}")
    for tb in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {tb} AS FROM '{scaled}/{tb}.parquet'")
    legs = {
        "duck_enc_decode_floor": (
            "SELECT source, sum(strlen(text)) FROM documents "
            "WHERE text IS NOT NULL GROUP BY source"
        ),
        "duck_enc_full": plans.oracle_sql()["text_encoding_audit"],
        "duck_tune_slice_floor": (
            "SELECT count(*), sum(length(text)) FROM documents "
            "WHERE text IS NOT NULL AND doc_id < 200"
        ),
        "duck_tune_full": plans.oracle_sql()["dedup_band_tuning_monitor"],
        "duck_cov_scan_floor": (
            "SELECT source, count(*) FROM documents GROUP BY source "
            "UNION ALL SELECT '__e', count(vec_id) FROM embeddings"
        ),
        "duck_cov_full": plans.oracle_sql()["dq_doc_embedding_coverage"],
    }
    for tag, sql in legs.items():
        con.execute(sql).fetchall()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        out[tag] = round(best, 3)
        print(f"# {tag}: {out[tag]}", file=sys.stderr)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
