#!/usr/bin/env python
"""r13 A/B probes:

1. dedup_winnow_pairs: HOF pair unfold vs the shared Arrow kernel
   (operators/pairs.unfold_sorted_pairs), with exact multiset-equality
   verification of the resulting pair counts.
2. dedup_minhash: current text-carrying banding vs an ids-only banding
   + text join-back variant, with exact survivor-set equality.

Run on an idle box; sentinel legs bracket each window.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_bi5_datasource_spark import register
    from spark_bi5_datasource_spark.operators.pairs import unfold_sorted_pairs
    from spark_bi5_datasource_spark.operators.winnowing import (
        winnow_fingerprints,
    )
    from spark_bi5_datasource_spark.plans.tables import t

    spark = bench.build_spark()
    register(spark)
    out: dict = {}

    warm = spark.read.parquet(f"{SF}/lineitem.parquet")
    warm.groupBy("l_returnflag").count().write.format("noop").mode(
        "overwrite"
    ).save()
    out["sentinel_start"] = bench.scan_sentinel(spark, SF)

    docs = t(spark, SF, "documents")

    # ---------------- winnow pair unfold A/B
    fps = winnow_fingerprints(docs, "doc_id", "text")
    inv = (
        fps.groupBy("fp")
        .agg(F.expr("sort_array(collect_set(doc_id))").alias("ds"))
        .where("size(ds) BETWEEN 2 AND 50")
    )

    def finish(pairs):
        return (
            pairs.groupBy("doc_a", "doc_b")
            .agg(F.count("*").cast("bigint").alias("n_shared"))
            .where("n_shared >= 2")
            .orderBy(F.desc("n_shared"), "doc_a", "doc_b")
            .limit(200)
        )

    hof_pairs = inv.select(
        F.explode(
            F.expr(
                "flatten(transform(ds, (x, i) ->"
                " transform(slice(ds, i + 2, size(ds)),"
                " y -> struct(x AS doc_a, y AS doc_b))))"
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    k_pairs = unfold_sorted_pairs(inv, "ds", "doc_a", "doc_b")

    spark.sparkContext.setJobDescription("r13:winnow_hof")
    out["winnow_hof"] = bench.timed(finish(hof_pairs), runs=3)
    spark.sparkContext.setJobDescription("r13:winnow_kernel")
    out["winnow_kernel"] = bench.timed(finish(k_pairs), runs=3)

    a = sorted(map(tuple, finish(hof_pairs).collect()))
    b = sorted(map(tuple, finish(k_pairs).collect()))
    out["winnow_equal"] = a == b
    print("winnow:", json.dumps(out), flush=True)

    # ---------------- dedup_minhash ids-only banding variant
    from spark_bi5_datasource_spark.operators.dedup import (
        _banded,
        exact_dedup,
        minhash_signatures,
        with_shingles,
    )

    base = exact_dedup(docs, ["text"], "doc_id")

    def current(df):
        sigs = minhash_signatures(
            df.select("doc_id", "text"), "doc_id", "text", 3, 32
        )
        banded = _banded(sigs, "doc_id", 32, 8, carry=("text",))
        w = Window.partitionBy("band", "bucket")
        cand = (
            banded.withColumn(
                "__rep",
                F.min(F.struct(F.col("doc_id"), F.col("text"))).over(w),
            )
            .filter(F.col("doc_id") > F.col("__rep.doc_id"))
            .select(
                F.col("__rep.doc_id").alias("id_a"),
                F.col("__rep.text").alias("__ta"),
                F.col("doc_id").alias("id_b"),
                F.col("text").alias("__tb"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
        verified = (
            with_shingles(cand, "__ta", 3, "__sa")
            .transform(lambda d: with_shingles(d, "__tb", 3, "__sb"))
            .withColumn(
                "jaccard",
                F.size(F.array_intersect("__sa", "__sb"))
                / F.size(F.array_union("__sa", "__sb")),
            )
            .filter(F.col("jaccard") >= 0.5)
        )
        losers = verified.select(F.col("id_b").alias("doc_id")).distinct()
        return df.join(losers, "doc_id", "left_anti")

    def ids_only(df):
        texts = df.select("doc_id", "text")
        sigs = minhash_signatures(texts, "doc_id", "text", 3, 32)
        banded = _banded(sigs, "doc_id", 32, 8)
        w = Window.partitionBy("band", "bucket")
        cand = (
            banded.withColumn("__rep", F.min(F.col("doc_id")).over(w))
            .filter(F.col("doc_id") > F.col("__rep"))
            .select(
                F.col("__rep").alias("id_a"),
                F.col("doc_id").alias("id_b"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
        ta = texts.select(
            F.col("doc_id").alias("id_a"), F.col("text").alias("__ta")
        )
        tb = texts.select(
            F.col("doc_id").alias("id_b"), F.col("text").alias("__tb")
        )
        step1 = ta.join(F.broadcast(cand), "id_a")
        withtext = tb.join(F.broadcast(step1), "id_b")
        verified = (
            with_shingles(withtext, "__ta", 3, "__sa")
            .transform(lambda d: with_shingles(d, "__tb", 3, "__sb"))
            .withColumn(
                "jaccard",
                F.size(F.array_intersect("__sa", "__sb"))
                / F.size(F.array_union("__sa", "__sb")),
            )
            .filter(F.col("jaccard") >= 0.5)
        )
        losers = verified.select(F.col("id_b").alias("doc_id")).distinct()
        return df.join(losers, "doc_id", "left_anti")

    cur = current(base).select("doc_id", "lang", "source")
    ido = ids_only(base).select("doc_id", "lang", "source")
    spark.sparkContext.setJobDescription("r13:mh_current")
    out["mh_current"] = bench.timed(cur, runs=3)
    spark.sparkContext.setJobDescription("r13:mh_ids_only")
    out["mh_ids_only"] = bench.timed(ido, runs=3)
    a = sorted(map(tuple, cur.collect()))
    b = sorted(map(tuple, ido.collect()))
    out["mh_equal"] = a == b

    out["sentinel_end"] = bench.scan_sentinel(spark, SF)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
