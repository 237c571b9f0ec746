#!/usr/bin/env python
"""r13: stage decomposition probes for the slowest sf0.1 roster
entries — times each pipeline prefix with the bench noop discipline so
the cost lands on the stage that owns it."""
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
    from spark_bi5_datasource_spark.operators.dedup import (
        _banded,
        exact_dedup,
        minhash_signatures,
    )
    from spark_bi5_datasource_spark.operators.winnowing import (
        winnow_fingerprints,
    )
    from spark_bi5_datasource_spark.plans.round4_ops import _copurchase_pairs
    from spark_bi5_datasource_spark.plans.tables import t

    spark = bench.build_spark()
    register(spark)
    out: dict[str, float] = {}

    def leg(name, df, runs=3):
        spark.sparkContext.setJobDescription(f"r13-decomp:{name}")
        out[name] = bench.timed(df, runs=runs)
        print(f"{name}: {out[name]}", flush=True)

    warm = spark.read.parquet(f"{SF}/lineitem.parquet")
    warm.groupBy("l_returnflag").count().write.format("noop").mode(
        "overwrite"
    ).save()
    out["sentinel_start"] = bench.scan_sentinel(spark, SF)

    # ---------------- dedup_minhash pipeline prefixes
    docs = t(spark, SF, "documents")
    leg("mh_scan", docs)
    dd = exact_dedup(docs, ["text"], "doc_id")
    leg("mh_exact_dedup", dd)
    sigs = minhash_signatures(dd, "doc_id", "text", 3, 32)
    leg("mh_signatures", sigs)
    banded = _banded(sigs, "doc_id", 32, 8, carry=("text",))
    leg("mh_banded", banded)
    w = Window.partitionBy("band", "bucket")
    cand = (
        banded.withColumn(
            "__rep", F.min(F.struct(F.col("doc_id"), F.col("text"))).over(w)
        )
        .filter(F.col("doc_id") > F.col("__rep.doc_id"))
        .select(
            F.col("__rep.doc_id").alias("id_a"),
            F.col("__rep.text").alias("__ta"),
            F.col("doc_id").alias("id_b"),
            F.col("text").alias("__tb"),
        )
    )
    leg("mh_cand_prededup", cand)
    cand2 = cand.dropDuplicates(["id_a", "id_b"])
    leg("mh_cand", cand2)
    from spark_bi5_datasource_spark.operators.dedup import with_shingles

    verified = (
        with_shingles(cand2, "__ta", 3, "__sa")
        .transform(lambda d: with_shingles(d, "__tb", 3, "__sb"))
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("__sa", "__sb"))
            / F.size(F.array_union("__sa", "__sb")),
        )
        .filter(F.col("jaccard") >= 0.5)
    )
    leg("mh_verified", verified)

    # ---------------- basket_association_lift prefixes
    li = t(spark, SF, "lineitem")
    dli = li.select("l_orderkey", "l_partkey").distinct()
    leg("bal_dli_distinct", dli)
    pairs = _copurchase_pairs(li)
    leg("bal_pairs", pairs)
    pc = (
        pairs.groupBy("u", "v")
        .agg(F.count("*").cast("bigint").alias("n_uv"))
        .where("n_uv >= 2")
    )
    leg("bal_pair_counts", pc)

    # ---------------- winnow prefixes
    fps = winnow_fingerprints(docs, "doc_id", "text")
    leg("win_fps_kernel", fps)
    inv = (
        fps.groupBy("fp")
        .agg(F.expr("sort_array(collect_set(doc_id))").alias("ds"))
        .where("size(ds) BETWEEN 2 AND 50")
    )
    leg("win_inv", inv)

    # fanout ingredient: how long does the repartition of documents take
    from spark_bi5_datasource_spark.functions.text import _fanout

    leg("docs_fanout", _fanout(docs.select("doc_id", "text")))

    # ---------------- q5 prefixes
    o = t(spark, SF, "orders")
    c = t(spark, SF, "customer")
    s = t(spark, SF, "supplier")
    n = t(spark, SF, "nation")
    r = t(spark, SF, "region")
    lo = li.join(o, li.l_orderkey == o.o_orderkey)
    leg("q5_li_join_o", lo)
    loc = lo.join(c, o.o_custkey == c.c_custkey)
    leg("q5_li_o_c", loc)
    locs = loc.join(
        s,
        (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
    )
    leg("q5_li_o_c_s", locs)
    full = locs.join(n, c.c_nationkey == n.n_nationkey).join(
        r, n.n_regionkey == r.r_regionkey
    )
    leg("q5_all_joins", full)

    out["sentinel_end"] = bench.scan_sentinel(spark, SF)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
