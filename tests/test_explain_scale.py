"""explain_scale (plans/scale_audit.py): the PLAN_AUDIT rulebook as a
user-facing API.  Each severity class is pinned with a plan that
provably exhibits it, and a real catalog entry's audit must agree
with what the plan-shape tests already assert about it.
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import TESTDATA_SF


def _props(audit) -> dict[str, list]:
    rows = audit.collect()
    out: dict[str, list] = {}
    for r in rows:
        out.setdefault(r.property, []).append(r)
    return out


class TestExplainScale:
    def test_cartesian_flagged_as_killer(self, spark):
        from spark_bi5_datasource_spark.plans.scale_audit import (
            explain_scale,
        )

        a = spark.range(10)
        b = spark.range(10).withColumnRenamed("id", "id2")
        # defeat broadcast so the plan is a true CartesianProduct
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            p = _props(explain_scale(a.crossJoin(b)))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert p["join.cartesian"][0].severity == "scale_killer"

    def test_row_at_a_time_python_flagged(self, spark):
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        from spark_bi5_datasource_spark.plans.scale_audit import (
            explain_scale,
        )

        slow = F.udf(lambda x: x + 1, LongType())
        p = _props(explain_scale(spark.range(10).select(slow("id"))))
        assert p["python.row_at_a_time"][0].severity == "scale_killer"

    def test_scalar_agg_single_partition_is_ok(self, spark):
        from pyspark.sql import functions as F

        from spark_bi5_datasource_spark.plans.scale_audit import (
            explain_scale,
        )

        p = _props(
            explain_scale(spark.range(100).agg(F.sum("id").alias("s")))
        )
        assert "exchange.single_partition.scalar_agg" in p
        assert p["exchange.single_partition.scalar_agg"][0].severity == "ok"
        # and the unbounded variant is NOT reported for this plan
        assert "exchange.single_partition" not in p

    def test_unbounded_single_partition_flagged_for_review(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from spark_bi5_datasource_spark.plans.scale_audit import (
            explain_scale,
        )

        w = Window.orderBy("id")  # global window: all rows, one task
        p = _props(
            explain_scale(
                spark.range(100).select("id", F.row_number().over(w))
            )
        )
        assert p["exchange.single_partition"][0].severity == "review"

    def test_catalog_entry_agrees_with_plan_shape_pins(self, spark):
        """q5_region_revenue: the plan-shape suite pins broadcast dims
        + hash exchanges; explain_scale must report the same facts."""
        if not os.path.isdir(TESTDATA_SF):
            pytest.skip(f"no fixture at {TESTDATA_SF}")
        from spark_bi5_datasource_spark import plans
        from spark_bi5_datasource_spark.plans.scale_audit import (
            explain_scale,
        )

        df = plans.CATALOG["q5_region_revenue"][0](spark, TESTDATA_SF)
        p = _props(explain_scale(df))
        assert "broadcast.exchange" in p
        assert "exchange.hash" in p
        assert "join.cartesian" not in p
        assert "python.row_at_a_time" not in p
        scans = p.get("scan.multiplicity", [])
        assert scans and all(r.severity == "ok" for r in scans)

    def test_arrow_boundary_reported_for_review(self, spark):
        if not os.path.isdir(TESTDATA_SF):
            pytest.skip(f"no fixture at {TESTDATA_SF}")
        from spark_bi5_datasource_spark import plans
        from spark_bi5_datasource_spark.plans.scale_audit import (
            explain_scale,
        )

        df = plans.CATALOG["sim_quantize_int8"][0](spark, TESTDATA_SF)
        p = _props(explain_scale(df))
        assert p["python.arrow_boundary"][0].severity == "review"

    def test_pushed_filters_counted(self, spark, tmp_path):
        from spark_bi5_datasource_spark.plans.scale_audit import (
            explain_scale,
        )

        path = str(tmp_path / "t")
        spark.range(1000).selectExpr(
            "id", "id % 7 as k"
        ).write.parquet(path)
        df = spark.read.parquet(path).where("k = 3").select("id")
        p = _props(explain_scale(df))
        assert p["scan.pushed_filters"][0]["count"] >= 1
