#!/usr/bin/env python
"""r10 ask #3a: dedup_incremental_delta measured 5.45x at x10
(BENCH_X1000_R13, cross-state).  Backlog-style variant sweep at x10,
same-window DuckDB leg, plus the irreducible floor:

* shipped          — the catalog entry as-is
* no_cand_distinct — skip the (inc, corp) candidate dropDuplicates
                     (the idempotence distinct; near-dups collide in
                     most bands, so it trades an exchange against
                     duplicated verify work)
* capped_200       — max_bucket=200 pre-filter on the corpus index
                     side (the production posture; at x10 buckets are
                     ~10 docs so results are identical)
* shuf_32          — shuffle.partitions 32 instead of 128 (the probe
                     default oversizes tiny x10 exchanges)
* sig_floor        — minhash signatures of corpus + increment alone
                     (count agg, no join): the cost any banded
                     formulation pays before candidates exist
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
    from spark_bi5_datasource_spark.operators.dedup import (
        _banded,
        minhash_delta_dedup,
        minhash_signatures,
    )
    from spark_bi5_datasource_spark.plans.tables import t

    scaled = synth_scaled_dir(SF_DIR, 10, ["documents"])
    spark = build_spark()
    out: dict = {"x": 10}

    def docs_split():
        docs = t(spark, scaled, "documents")
        corpus = docs.where("doc_id % 10 <> 0")
        inc = docs.where("doc_id % 10 = 0")
        return corpus, inc

    # shipped entry (fresh plan each timing)
    fn = plans.CATALOG["dedup_incremental_delta"][0]
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    out["shipped_128"] = timed(fn(spark, scaled), runs=2)
    print(f"# shipped(128): {out['shipped_128']}", file=sys.stderr)

    spark.conf.set("spark.sql.shuffle.partitions", str(CPUS))
    out["shipped_shuf_cpus"] = timed(fn(spark, scaled), runs=2)
    print(f"# shipped(shuf={CPUS}): {out['shipped_shuf_cpus']}", file=sys.stderr)
    spark.conf.set("spark.sql.shuffle.partitions", "128")

    corpus, inc = docs_split()
    out["capped_200"] = timed(
        minhash_delta_dedup(
            corpus, inc, "doc_id", "text", threshold=0.5, max_bucket=200
        ),
        runs=2,
    )
    print(f"# capped_200: {out['capped_200']}", file=sys.stderr)

    # no_cand_distinct: the shipped shape minus the candidate
    # dropDuplicates (duplicated verify work instead of one exchange)
    def no_cand_distinct():
        from spark_bi5_datasource_spark.operators.dedup import with_shingles

        sc = minhash_signatures(corpus, "doc_id", "text", 3, 32)
        bc = _banded(sc, "doc_id", 32, 16).select(
            F.col("doc_id").alias("__cid"), "band", "bucket"
        )
        si = minhash_signatures(inc, "doc_id", "text", 3, 32)
        bi = _banded(si, "doc_id", 32, 16).select(
            F.col("doc_id").alias("__iid"), "band", "bucket"
        )
        cand = (
            bi.hint("shuffle_hash")
            .join(bc, ["band", "bucket"])
            .select("__iid", "__cid")
        )
        ti = inc.select(
            F.col("doc_id").alias("__iid"), F.col("text").alias("__it")
        )
        tc = corpus.select(
            F.col("doc_id").alias("__cid"), F.col("text").alias("__ct")
        )
        pairs = cand.join(ti, "__iid").join(tc, "__cid")
        verified = (
            with_shingles(pairs, "__it", 3, "__si")
            .transform(lambda d: with_shingles(d, "__ct", 3, "__sc"))
            .withColumn(
                "jaccard",
                F.size(F.array_intersect("__si", "__sc"))
                / F.size(F.array_union("__si", "__sc")),
            )
            .filter(F.col("jaccard") >= 0.5)
        )
        losers = verified.select(F.col("__iid").alias("doc_id")).distinct()
        return inc.join(losers, "doc_id", "left_anti")

    out["no_cand_distinct"] = timed(no_cand_distinct(), runs=2)
    print(f"# no_cand_distinct: {out['no_cand_distinct']}", file=sys.stderr)

    # signature floor: both sides' signatures, no banding join
    def sig_floor():
        sc = minhash_signatures(corpus, "doc_id", "text", 3, 32)
        si = minhash_signatures(inc, "doc_id", "text", 3, 32)
        # avg, not sum: signature values are ~2^61 and an int64 sum
        # over 450K docs overflows under ANSI mode
        return sc.select(
            F.avg(F.element_at("signature", 1)).alias("s")
        ).unionByName(si.select(F.avg(F.element_at("signature", 1)).alias("s")))

    out["sig_floor"] = timed(sig_floor(), runs=2)
    print(f"# sig_floor: {out['sig_floor']}", file=sys.stderr)

    # banding floor: signatures + both band frames, still no join
    def band_floor():
        sc = minhash_signatures(corpus, "doc_id", "text", 3, 32)
        si = minhash_signatures(inc, "doc_id", "text", 3, 32)
        bc = _banded(sc, "doc_id", 32, 16)
        bi = _banded(si, "doc_id", 32, 16)
        # avg(bucket) so the bucket-hash expression cannot be pruned
        # out from under the count
        return bc.select(F.avg("bucket").alias("n")).unionByName(
            bi.select(F.avg("bucket").alias("n"))
        )

    out["band_floor"] = timed(band_floor(), runs=2)
    print(f"# band_floor: {out['band_floor']}", file=sys.stderr)

    # DuckDB same-window leg
    import duckdb

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={CPUS}")
    con.execute(f"CREATE VIEW documents AS FROM '{scaled}/documents.parquet'")
    sql = plans.oracle_sql()["dedup_incremental_delta"]
    con.execute(sql).fetchall()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        best = min(best, time.perf_counter() - t0)
    out["duckdb"] = round(best, 3)
    out["best_ratio"] = round(
        min(out["shipped_128"], out["shipped_shuf_cpus"], out["capped_200"])
        / out["duckdb"],
        2,
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
