#!/usr/bin/env python
"""r10 ask #3b: dedup_media_phash is ~3x at x100 head-to-head.  The
gap is undecomposed — DuckDB's twin recomputes the hash ARITHMETICALLY
from token lengths (no pixels), while Spark synthesizes a real PPM
payload and decodes it back through the pure-Python raster stack.
Decompose the Spark side the way text_url_email_stats got its floor
proof, at x100, with a same-window DuckDB leg:

* scan_floor   — documents scan + token split + count (what ANY
                 formulation pays to read the texts)
* synth_floor  — + the PPM payload synthesis kernel (Arrow
                 mapInPandas; payload byte sum so the kernel can't be
                 pruned)
* hash_floor   — + payload decode + dHash (extract_phash; hash sum)
* full         — the catalog entry (hash + identical-collapse +
                 banded join + hamming verify + anti join)
* arith_spark  — the DuckDB-shaped ARITHMETIC hash in pure Catalyst
                 (no pixels, no Python): what Spark pays when given
                 the same shortcut the oracle takes
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
    from spark_bi5_datasource_spark.functions.multimodal import (
        documents_as_ppm_media,
        extract_phash,
    )
    from spark_bi5_datasource_spark.plans.tables import fanout, t

    scaled = synth_scaled_dir(SF_DIR, 100, ["documents"])
    spark = build_spark()
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    out: dict = {"x": 100}

    docs = t(spark, scaled, "documents").where("text IS NOT NULL")

    out["scan_floor"] = timed(
        docs.select(F.size(F.split("text", " ")).alias("n")).agg(
            F.sum("n").alias("s")
        ),
        runs=2,
    )
    print(f"# scan_floor: {out['scan_floor']}", file=sys.stderr)

    out["synth_floor"] = timed(
        documents_as_ppm_media(docs).select(
            F.sum(F.octet_length("payload")).alias("s")
        ),
        runs=2,
    )
    print(f"# synth_floor: {out['synth_floor']}", file=sys.stderr)

    out["hash_floor"] = timed(
        extract_phash(documents_as_ppm_media(docs)).agg(
            F.avg("phash").alias("s")  # avg: int64 sum of 64-bit hashes overflows ANSI
        ),
        runs=2,
    )
    print(f"# hash_floor: {out['hash_floor']}", file=sys.stderr)

    fn = plans.CATALOG["dedup_media_phash"][0]
    out["full"] = timed(fn(spark, scaled), runs=2)
    print(f"# full: {out['full']}", file=sys.stderr)

    # the oracle's arithmetic shortcut, expressed in Catalyst: gray(i)
    # = (len(tok[i % n]) * 7) % 128 over i in 0..71, dHash bits from
    # neighbor comparisons — no payload, no Python
    g = (
        "transform(sequence(0, 71), i -> "
        "(length(element_at(tks, (i % size(tks)) + 1)) * 7) % 128)"
    )
    bits = (
        "aggregate(sequence(0, 70), 0L, (acc, i) -> CASE "
        "WHEN i % 9 < 8 AND element_at(__g, i + 1) >"
        " element_at(__g, i + 2) "
        "THEN acc + shiftleft(1L, CAST((i div 9) * 8 + (i % 9) AS INT)) "
        "ELSE acc END)"
    )
    arith = (
        fanout(docs.select("doc_id", "text"))
        .withColumn("tks", F.split("text", " "))
        .withColumn("__g", F.expr(g))
        .select("doc_id", F.expr(bits).alias("phash"))
        .agg(F.avg("phash").alias("s"))
    )
    out["arith_spark"] = timed(arith, runs=2)
    print(f"# arith_spark: {out['arith_spark']}", file=sys.stderr)

    # DuckDB same-window leg (the full oracle)
    import duckdb

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={CPUS}")
    con.execute(f"CREATE VIEW documents AS FROM '{scaled}/documents.parquet'")
    sql = plans.oracle_sql()["dedup_media_phash"]
    con.execute(sql).fetchall()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    out["duckdb_full"] = round(best, 3)
    out["kernel_cost"] = round(out["hash_floor"] - out["scan_floor"], 3)
    out["join_cost"] = round(out["full"] - out["hash_floor"], 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
