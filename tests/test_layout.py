"""Partitioned-layout pruning and one-pass observation metrics
(sources/layout.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import TESTDATA_SF, has_testdata

pytestmark = pytest.mark.skipif(
    not has_testdata(), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def part_dir(spark, tmp_path_factory):
    from spark_bi5_datasource_spark.sources.layout import write_partitioned

    out = str(tmp_path_factory.mktemp("events_by_day"))
    ev = spark.read.parquet(os.path.join(TESTDATA_SF, "events.parquet"))
    write_partitioned(
        ev.withColumn("day", F.to_date("ts")), out, ["day"]
    )
    return out


class TestPartitionPruning:
    def test_filter_reaches_partition_filters(self, spark, part_dir):
        df = spark.read.parquet(part_dir).filter(
            F.col("day") == "2024-01-03"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert "2024-01-03" in plan.split("PartitionFilters")[1][:200]

    def test_pruned_scan_touches_one_partition(self, spark, part_dir):
        def files_read(df):
            # post-execution scan metric: the number of files the
            # pruned scan actually planned (inputFiles() reports the
            # relation BEFORE pruning, so it can't certify this)
            df.collect()
            leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
            total = 0
            for i in range(leaves.size()):
                m = leaves.apply(i).metrics()
                if m.contains("numFiles"):
                    total += m.apply("numFiles").value()
            return total

        full = files_read(spark.read.parquet(part_dir))
        pruned = files_read(
            spark.read.parquet(part_dir).filter(F.col("day") == "2024-01-03")
        )
        assert pruned >= 1 and pruned < full

    def test_values_survive_partitioned_roundtrip(self, spark, part_dir):
        ev = spark.read.parquet(os.path.join(TESTDATA_SF, "events.parquet"))
        day = ev.filter(F.to_date("ts") == "2024-01-03")
        back = spark.read.parquet(part_dir).filter(
            F.col("day") == "2024-01-03"
        )
        assert back.count() == day.count()
        assert (
            back.agg(F.sum("event_id")).first()[0]
            == day.agg(F.sum("event_id")).first()[0]
        )


class TestObservedWrite:
    def test_metrics_computed_in_one_pass(self, spark):
        from spark_bi5_datasource_spark.sources.layout import observed_write

        ev = spark.read.parquet(os.path.join(TESTDATA_SF, "events.parquet"))
        got = observed_write(
            ev,
            {
                "rows": F.count(F.lit(1)),
                "null_values": F.sum(F.col("value").isNull().cast("long")),
                "max_ts": F.max("ts"),
            },
        )
        assert got["rows"] == ev.count()
        assert got["null_values"] == ev.filter(F.col("value").isNull()).count()
        assert got["max_ts"] == ev.agg(F.max("ts")).first()[0]

    def test_custom_action(self, spark, tmp_path):
        from spark_bi5_datasource_spark.sources.layout import observed_write

        ev = spark.read.parquet(
            os.path.join(TESTDATA_SF, "events.parquet")
        ).limit(100)
        out = str(tmp_path / "out.parquet")
        got = observed_write(
            ev,
            {"rows": F.count(F.lit(1))},
            action=lambda d: d.write.mode("overwrite").parquet(out),
        )
        assert got["rows"] == 100
        assert spark.read.parquet(out).count() == 100
