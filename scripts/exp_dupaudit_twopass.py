#!/usr/bin/env python
"""dq_duplicate_event_audit re-attack (r8 verdict ask #7): key the
first pass on xxhash64 of the tuple ALONE (8-byte exchange instead of
the ~40-byte full tuple), broadcast the (rare) duplicated hashes, and
re-group EXACTLY only the matching rows.  Compare against the shipped
one-pass complete aggregate and DuckDB at x1000.

The r8-rejected variant kept full tuples through the prefilter pass
(measured 5.7 s vs 6.7 s shipped); this one shrinks the first
exchange ~4× by carrying only the hash.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import CPUS, SF_DIR, build_spark, synth_scaled_dir, timed  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def two_pass(spark, sf: str):
    from spark_bi5_datasource_spark.plans.tables import t

    ev = t(spark, sf, "events").select(
        "event_type", "user_id", "ts", "value"
    )
    n = spark.sparkContext.defaultParallelism
    h = F.xxhash64("event_type", "user_id", "ts", "value")
    dup_h = (
        ev.select(h.alias("__h"))
        .repartition(n, "__h")
        .groupBy("__h")
        .agg(F.count("*").alias("__hc"))
        .filter("__hc > 1")
        .select("__h")
    )
    dups = (
        ev.withColumn("__h", h)
        .join(F.broadcast(dup_h), "__h")
        .groupBy("event_type", "user_id", "ts", "value")
        .agg(F.count("*").cast("bigint").alias("c"))
        .filter("c > 1")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_dup_groups"),
            F.sum(F.expr("c - 1")).cast("bigint").alias("n_extra_rows"),
        )
    )
    totals = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events")
    )
    return (
        totals.join(dups, "event_type", "left")
        .select(
            "event_type",
            "n_events",
            F.coalesce("n_dup_groups", F.lit(0)).cast("bigint").alias(
                "n_dup_groups"
            ),
            F.coalesce("n_extra_rows", F.lit(0)).cast("bigint").alias(
                "n_extra_rows"
            ),
            F.expr(
                "CAST(coalesce(n_extra_rows, 0) * 1000000 div n_events"
                " AS BIGINT)"
            ).alias("extra_ppm"),
        )
        .orderBy("event_type")
    )


def main() -> None:
    import duckdb

    from spark_bi5_datasource_spark import plans

    scaled = synth_scaled_dir(SF_DIR, 1000, ["events"])
    spark = build_spark()
    spark.conf.set("spark.sql.shuffle.partitions", "128")

    fn = {n: f for n, (f, _s, _b) in plans.CATALOG.items()}[
        "dq_duplicate_event_audit"
    ]
    cur = timed(fn(spark, scaled), runs=2)
    print(f"shipped one-pass: {cur:.2f}s")
    new = timed(two_pass(spark, scaled), runs=2)
    print(f"hash-first two-pass: {new:.2f}s")
    # sanity: identical results at sf0.1
    a = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    b = sorted(map(tuple, two_pass(spark, SF_DIR).collect()))
    print("results equal at sf0.1:", a == b)
    spark.stop()

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={CPUS}")
    con.execute(f"CREATE VIEW events AS FROM '{scaled}/events.parquet'")
    sql = plans.oracle_sql()["dq_duplicate_event_audit"]
    con.execute(sql).fetchall()
    t0 = time.perf_counter()
    con.execute(sql).fetchall()
    duck = time.perf_counter() - t0
    print(f"duckdb: {duck:.2f}s  ratios: shipped {cur/duck:.2f}x, "
          f"two-pass {new/duck:.2f}x")


if __name__ == "__main__":
    main()
