#!/usr/bin/env python
"""r10: text_contamination_matrix is the last big-absolute >2x item
(x1000: Spark ~511 s vs DuckDB 154 s in R12, 3.31x — both engines pay
a ~1e9-gram distinct).  Variants, x100 first for iteration speed
(x1000 re-pin only for the winner):

* shipped — distinct (source, shingle-string), then two consumers
  (per-source sizes + the shingle->sources inverted index): the
  distinct's exchange is reused across branches, but the inverted
  index pays a SECOND full-size exchange of string keys.
* single_agg — skip the standalone distinct: build the inverted index
  directly from the raw exploded grams (collect_set dedups sources
  per shingle anyway), and derive per-source distinct counts FROM the
  index (explode of the source-set) — one full-size exchange total.
* hashed — single_agg with xxhash64(shingle) as the key: 8-byte
  shuffle keys instead of ~25-byte strings.  Exact absent 64-bit
  collisions (expected collisions ~n^2/2^65 — ~0.03 at 1e9 grams);
  the fixture-scale oracle remains hash-green.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from bench import CPUS, SF_DIR, build_spark, synth_scaled_dir, timed  # noqa: E402


def variants(spark, scaled):
    from pyspark.sql import functions as F

    from spark_bi5_datasource_spark.operators.dedup import with_shingles
    from spark_bi5_datasource_spark.plans.tables import t

    docs = t(spark, scaled, "documents").select("source", "text")

    def finish(inter, sz):
        za = sz.select(F.col("source").alias("sa"), F.col("sz").alias("sz_a"))
        zb = sz.select(F.col("source").alias("sb"), F.col("sz").alias("sz_b"))
        return (
            inter.join(F.broadcast(za), "sa")
            .join(F.broadcast(zb), "sb")
            .select(
                F.col("sa").alias("source_a"),
                F.col("sb").alias("source_b"),
                "n_common",
                "sz_a",
                "sz_b",
                F.expr("CAST(n_common * 1000000 div sz_a AS BIGINT)").alias(
                    "contain_a_ppm"
                ),
                F.expr("CAST(n_common * 1000000 div sz_b AS BIGINT)").alias(
                    "contain_b_ppm"
                ),
            )
            .orderBy("source_a", "source_b")
        )

    def pairs_from(inv):
        return (
            inv.where(F.expr("size(ss) >= 2"))
            .select(
                F.explode(
                    F.expr(
                        "flatten(transform(ss, (x, i) ->"
                        " transform(slice(ss, i + 2, size(ss)),"
                        " y -> struct(x AS sa, y AS sb))))"
                    )
                ).alias("p")
            )
            .select("p.sa", "p.sb")
            .groupBy("sa", "sb")
            .agg(F.count("*").cast("bigint").alias("n_common"))
        )

    def single_agg(key_expr):
        raw = with_shingles(docs, "text", 3).select(
            "source", F.explode("shingles").alias("shingle")
        )
        inv = raw.select("source", key_expr).groupBy("g").agg(
            F.expr("sort_array(collect_set(source))").alias("ss")
        )
        sz = (
            inv.select(F.explode("ss").alias("source"))
            .groupBy("source")
            .agg(F.count("*").cast("bigint").alias("sz"))
        )
        return finish(pairs_from(inv), sz)

    def bitmask(key_expr):
        from pyspark.sql import Window

        raw = with_shingles(docs, "text", 3).select(
            "source", F.explode("shingles").alias("shingle")
        )
        sdim = (
            docs.select("source")
            .distinct()
            .withColumn(
                "idx",
                F.row_number().over(Window.partitionBy().orderBy("source"))
                - 1,
            )
        )
        masks = (
            raw.select("source", key_expr)
            .join(F.broadcast(sdim), "source")
            .groupBy("g")
            .agg(F.expr("bit_or(shiftleft(1L, idx))").alias("mask"))
            .groupBy("mask")
            .agg(F.count("*").cast("bigint").alias("cnt"))
        )
        bits = "filter(sequence(0, 31), b -> (mask >> b) & 1 = 1)"
        inter = (
            masks.select(
                "cnt",
                F.explode(
                    F.expr(
                        f"flatten(transform({bits}, (x, i) ->"
                        f" transform(slice({bits}, i + 2, size({bits})),"
                        " y -> struct(x AS ia, y AS ib))))"
                    )
                ).alias("p"),
            )
            .groupBy("p.ia", "p.ib")
            .agg(F.sum("cnt").cast("bigint").alias("n_common"))
            .join(
                F.broadcast(
                    sdim.select(F.col("idx").alias("ia"), F.col("source").alias("sa"))
                ),
                "ia",
            )
            .join(
                F.broadcast(
                    sdim.select(F.col("idx").alias("ib"), F.col("source").alias("sb"))
                ),
                "ib",
            )
            .select("sa", "sb", "n_common")
        )
        sz = (
            masks.select("cnt", F.explode(F.expr(bits)).alias("idx"))
            .groupBy("idx")
            .agg(F.sum("cnt").cast("bigint").alias("sz"))
            .join(F.broadcast(sdim), "idx")
            .select("source", "sz")
        )
        return finish(inter, sz)

    from pyspark.sql import functions as F2

    return {
        "single_agg": lambda: single_agg(F2.col("shingle").alias("g")),
        "hashed": lambda: single_agg(F2.xxhash64("shingle").alias("g")),
        "bitmask": lambda: bitmask(F2.col("shingle").alias("g")),
        "bitmask_hashed": lambda: bitmask(F2.xxhash64("shingle").alias("g")),
    }


def main() -> None:
    x = int(os.environ.get("CONTAM_X", "100"))
    which = os.environ.get("CONTAM_VARIANTS", "shipped,single_agg,hashed,duck")
    scaled = synth_scaled_dir(SF_DIR, x, ["documents"])
    spark = build_spark()
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    out: dict = {"x": x}

    from spark_bi5_datasource_spark import plans

    vs = variants(spark, scaled)
    if "shipped" in which:
        fn = plans.CATALOG["text_contamination_matrix"][0]
        out["shipped"] = timed(fn(spark, scaled), runs=2)
        print(f"# shipped: {out['shipped']}", file=sys.stderr)
    for name in ("single_agg", "hashed", "bitmask", "bitmask_hashed"):
        if name in which:
            out[name] = timed(vs[name](), runs=2)
            print(f"# {name}: {out[name]}", file=sys.stderr)

    # equality spot-check of the winners against the shipped shape
    eq_target = os.environ.get("CONTAM_EQ", "hashed")
    if eq_target in which and "shipped" in which:
        fn = plans.CATALOG["text_contamination_matrix"][0]
        a = [tuple(r) for r in fn(spark, scaled).collect()]
        b = [tuple(r) for r in vs[eq_target]().collect()]
        out[f"{eq_target}_equals_shipped"] = a == b
        print(f"# equal({eq_target}): {a == b}", file=sys.stderr)

    if "duck" in which:
        import duckdb

        con = duckdb.connect()
        con.execute(f"PRAGMA threads={CPUS}")
        con.execute(
            f"CREATE VIEW documents AS FROM '{scaled}/documents.parquet'"
        )
        sql = plans.oracle_sql()["text_contamination_matrix"]
        con.execute(sql).fetchall()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        out["duckdb"] = round(best, 3)
        print(f"# duckdb: {out['duckdb']}", file=sys.stderr)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
