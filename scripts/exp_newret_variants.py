#!/usr/bin/env python
"""x1000 shape experiment for events_new_vs_returning (r8 ask #3).

Current: (day,user) distinct -> user-window min -> day rollup
         (two wide shuffles over the 100M-pair frame).
Variant B: ONE user-keyed aggregate collect_set(day) (map-side
         partial dedups days per user inside each task), then
         first_day = array_min, explode back to (day, is_new) and
         a map-side-combinable day rollup — a single wide shuffle.
Variant C: like B but via two aggregates sharing one shuffle:
         groupBy(user) -> (first_day, days) without arrays?  (B is
         the candidate; C kept for reference: count_distinct day
         per user cannot reconstruct per-day activity, so skipped.)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_MEM", "32g")

from bench import SF_DIR, build_spark, synth_scaled_dir, timed  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def cur(spark, sf):
    from spark_bi5_datasource_spark import plans
    fn = plans.CATALOG["events_new_vs_returning"][0]
    return fn(spark, sf)


def variant_b(spark, sf):
    ev = spark.read.parquet(os.path.join(sf, "events.parquet"))
    per_user = (
        ev.where("ts IS NOT NULL")
        .groupBy("user_id")
        .agg(F.collect_set(F.to_date("ts")).alias("days"))
    )
    j = per_user.select(
        F.array_min("days").alias("first_day"),
        F.explode("days").alias("day"),
    )
    return (
        j.groupBy("day")
        .agg(
            F.count("*").cast("bigint").alias("active_users"),
            F.sum(F.expr("CAST(day = first_day AS INT)"))
            .cast("bigint")
            .alias("new_users"),
        )
        .select(
            "day",
            "active_users",
            "new_users",
            (F.col("active_users") - F.col("new_users"))
            .cast("bigint")
            .alias("returning_users"),
            F.expr(
                "CAST(new_users * 1000000 div active_users AS BIGINT)"
            ).alias("new_share_ppm"),
        )
        .orderBy("day")
    )


def main() -> None:
    scaled = synth_scaled_dir(SF_DIR, 1000, ["events"])
    spark = build_spark()
    spark.conf.set("spark.sql.shuffle.partitions", "128")

    # correctness first at sf0.1
    a = cur(spark, SF_DIR).collect()
    b = variant_b(spark, SF_DIR).collect()
    assert a == b, "variant B mismatch at sf0.1"
    print("# sf0.1 hash-equal: OK", file=sys.stderr)

    for name, fn in [("current", cur), ("variant_b", variant_b)]:
        t = timed(fn(spark, scaled), runs=2)
        print(f"{name}: {t}s")
    spark.stop()


if __name__ == "__main__":
    main()


def variant_mask(spark, sf):
    """Per-user day-bitmask: one primitive bit_or HashAggregate over
    user_id, then the 30-bit mask is exploded post-agg and rolled up
    per day.  Anchor = global min day (tiny scalar pre-job)."""
    ev = spark.read.parquet(os.path.join(sf, "events.parquet")).where(
        "ts IS NOT NULL"
    )
    dmin, dmax = ev.agg(
        F.min(F.to_date("ts")), F.max(F.to_date("ts"))
    ).first()
    span = (dmax - dmin).days
    assert span <= 63, span
    masks = (
        ev.select(
            "user_id",
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT),"
                f" datediff(CAST(ts AS DATE), DATE'{dmin}'))"
            ).alias("bit"),
        )
        .groupBy("user_id")
        .agg(F.expr("bit_or(bit)").alias("mask"))
    )
    j = masks.select(
        F.expr(
            "filter(sequence(0, 63), k -> ((mask >> k) & 1) = 1)"
        ).alias("bits")
    ).select(
        F.element_at("bits", 1).alias("first_k"),
        F.explode("bits").alias("k"),
    )
    return (
        j.groupBy(F.expr(f"date_add(DATE'{dmin}', k)").alias("day"))
        .agg(
            F.count("*").cast("bigint").alias("active_users"),
            F.sum(F.expr("CAST(k = first_k AS INT)"))
            .cast("bigint")
            .alias("new_users"),
        )
        .select(
            "day",
            "active_users",
            "new_users",
            (F.col("active_users") - F.col("new_users"))
            .cast("bigint")
            .alias("returning_users"),
            F.expr(
                "CAST(new_users * 1000000 div active_users AS BIGINT)"
            ).alias("new_share_ppm"),
        )
        .orderBy("day")
    )


def main2() -> None:
    scaled = synth_scaled_dir(SF_DIR, 1000, ["events"])
    spark = build_spark()
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    a = cur(spark, SF_DIR).collect()
    m = variant_mask(spark, SF_DIR).collect()
    assert a == m, "variant mask mismatch at sf0.1"
    print("# sf0.1 hash-equal (mask): OK", file=sys.stderr)
    for name, fn in [("current", cur), ("variant_mask", variant_mask)]:
        t = timed(fn(spark, scaled), runs=2)
        print(f"{name}: {t}s")
    spark.stop()


def _day_bounds_stats(path):
    """(min_day, max_day) of non-null ts from parquet footer
    statistics — no row scan. Returns None if stats are absent."""
    import glob as g

    import pyarrow.parquet as pq

    files = (
        [path]
        if os.path.isfile(path)
        else sorted(g.glob(os.path.join(path, "*.parquet")))
    )
    lo = hi = None
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if "ts" not in idx:
            return None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx["ts"]).statistics
            if st is None or not st.has_min_max:
                return None
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    if lo is None:
        return None
    return lo.date(), hi.date()


def variant_mask2(spark, sf):
    ev = spark.read.parquet(os.path.join(sf, "events.parquet")).where(
        "ts IS NOT NULL"
    )
    b = _day_bounds_stats(os.path.join(sf, "events.parquet"))
    if b is None:
        dmin, dmax = ev.agg(
            F.min(F.to_date("ts")), F.max(F.to_date("ts"))
        ).first()
    else:
        dmin, dmax = b
    assert (dmax - dmin).days <= 63
    masks = (
        ev.select(
            "user_id",
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT),"
                f" datediff(CAST(ts AS DATE), DATE'{dmin}'))"
            ).alias("bit"),
        )
        .groupBy("user_id")
        .agg(F.expr("bit_or(bit)").alias("mask"))
    )
    j = masks.select(
        F.expr(
            "filter(sequence(0, 63), k -> ((mask >> k) & 1) = 1)"
        ).alias("bits")
    ).select(
        F.element_at("bits", 1).alias("first_k"),
        F.explode("bits").alias("k"),
    )
    return (
        j.groupBy(F.expr(f"date_add(DATE'{dmin}', k)").alias("day"))
        .agg(
            F.count("*").cast("bigint").alias("active_users"),
            F.sum(F.expr("CAST(k = first_k AS INT)"))
            .cast("bigint")
            .alias("new_users"),
        )
        .select(
            "day", "active_users", "new_users",
            (F.col("active_users") - F.col("new_users"))
            .cast("bigint").alias("returning_users"),
            F.expr(
                "CAST(new_users * 1000000 div active_users AS BIGINT)"
            ).alias("new_share_ppm"),
        )
        .orderBy("day")
    )


def main3() -> None:
    scaled = synth_scaled_dir(SF_DIR, 1000, ["events"])
    spark = build_spark()
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    a = cur(spark, SF_DIR).collect()
    m = variant_mask2(spark, SF_DIR).collect()
    assert a == m, "variant mask2 mismatch at sf0.1"
    print("# sf0.1 hash-equal (mask2): OK", file=sys.stderr)
    print("stats bounds:", _day_bounds_stats(
        os.path.join(scaled, "events.parquet")), file=sys.stderr)
    for name, fn in [("variant_mask2", variant_mask2)]:
        t = timed(fn(spark, scaled), runs=2)
        print(f"{name}: {t}s")
    spark.stop()
