#!/usr/bin/env python
"""Second round-7 decomposition: rev-build expression variants, SRM
cardinalities, fertility JVM-vs-Arrow variants — x1000, exclusive."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from bench import SF_DIR, build_spark, synth_scaled_dir, timed  # noqa: E402

TABLES = ["orders", "events", "documents"]


def main() -> None:
    from pyspark.sql import functions as F

    from spark_bi5_datasource_spark import register

    scaled = synth_scaled_dir(SF_DIR, 1000, TABLES)
    spark = build_spark()
    register(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "128")

    od = spark.read.parquet(f"{scaled}/orders.parquet")
    ev = spark.read.parquet(f"{scaled}/events.parquet")
    docs = spark.read.parquet(f"{scaled}/documents.parquet")

    r = {}
    # rev-build variants (orders 150M)
    r["rev_plain_sum_by_day"] = timed(
        od.groupBy("o_orderdate").agg(F.sum("o_totalprice")), runs=2
    )
    r["rev_ha_case"] = timed(
        od.groupBy("o_orderdate").agg(
            F.sum(F.expr(
                "CAST((o_totalprice) * 100 + CASE WHEN (o_totalprice) >= 0"
                " THEN 0.5D ELSE -0.5D END AS BIGINT)"))
        ), runs=2,
    )
    r["rev_ha_nocase"] = timed(
        od.groupBy("o_orderdate").agg(
            F.sum(F.expr("CAST(o_totalprice * 100 + 0.5D AS BIGINT)"))
        ), runs=2,
    )
    r["orders_min_price"] = od.agg(F.min("o_totalprice")).collect()[0][0]

    # OHLC pieces (events 100M)
    r["ohlc_no_maxby"] = timed(
        ev.where("ts IS NOT NULL AND value IS NOT NULL")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.max("value"), F.min("value")), runs=2,
    )
    r["events_min_value"] = ev.agg(F.min("value")).collect()[0][0]

    # SRM cardinalities
    du = ev.where("ts IS NOT NULL").select(
        F.to_date("ts").alias("day"), "user_id")
    r["events_rows"] = ev.count()
    r["du_distinct"] = du.distinct().count()
    r["users_distinct"] = du.select("user_id").distinct().count()

    # fertility formulation variants (documents 5M)
    r["fert_jvm_regexp_extract"] = timed(
        docs.groupBy("lang").agg(
            F.count("*"),
            F.sum(F.expr("size(regexp_extract_all(lower(text), '[a-z]+', 0))")),
            F.sum("n_chars")), runs=2,
    )
    r["fert_jvm_split_filter"] = timed(
        docs.groupBy("lang").agg(
            F.count("*"),
            F.sum(F.expr(
                "size(filter(split(lower(text), '[^a-z]+'), x -> x != ''))")),
            F.sum("n_chars")), runs=2,
    )

    for k, v in r.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
