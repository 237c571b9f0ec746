"""Bucket-spec sidecar + layout validator (r12): registration no
longer trusts folklore parameters, and the hash→bucket invariant the
exchange-free plans depend on is checkable after the fact.
"""

from __future__ import annotations

import os
import shutil

import pytest


def _write(spark, path, table, buckets=4):
    from spark_bi5_datasource_spark.sources.layout import write_bucketed

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    write_bucketed(
        spark.createDataFrame(
            [(i, f"d{i}") for i in range(200)], "k long, v string"
        ),
        path, table, "k", buckets=buckets,
    )


class TestBucketSpecSidecar:
    def test_write_creates_spec_and_roundtrip(self, spark, tmp_path):
        from spark_bi5_datasource_spark.sources.layout import (
            read_bucket_spec,
        )

        p = str(tmp_path / "t")
        table = "bi5_test_spec_rt"
        try:
            _write(spark, p, table)
            assert read_bucket_spec(p) == {
                "key": "k", "buckets": 4, "sort": True, "version": 1,
            }
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")

    def test_register_resolves_from_sidecar(self, spark, tmp_path):
        from spark_bi5_datasource_spark.sources.layout import (
            register_bucketed,
        )

        p = str(tmp_path / "t")
        table = "bi5_test_spec_reg"
        try:
            _write(spark, p, table)
            # simulate the restart: catalog forgets, directory stays
            spark.sql(f"DROP TABLE {table}")
            register_bucketed(spark, p, table)  # no params needed
            assert spark.table(table).count() == 200
            ddl = spark.sql(f"DESCRIBE EXTENDED {table}").collect()
            txt = "\n".join(f"{r.col_name} {r.data_type}" for r in ddl)
            assert "k" in txt and "4" in txt  # clustered metadata there
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")

    def test_contradicting_params_raise(self, spark, tmp_path):
        from spark_bi5_datasource_spark.sources.layout import (
            register_bucketed,
        )

        p = str(tmp_path / "t")
        table = "bi5_test_spec_bad"
        try:
            _write(spark, p, table)
            spark.sql(f"DROP TABLE {table}")
            with pytest.raises(ValueError, match="contradicts"):
                register_bucketed(spark, p, table, "k", buckets=8)
            with pytest.raises(ValueError, match="contradicts"):
                register_bucketed(spark, p, table, "v")
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")

    def test_no_sidecar_requires_explicit_params(self, spark, tmp_path):
        from spark_bi5_datasource_spark.sources.layout import (
            register_bucketed,
        )

        p = str(tmp_path / "t")
        table = "bi5_test_spec_legacy"
        try:
            _write(spark, p, table)
            spark.sql(f"DROP TABLE {table}")
            os.remove(os.path.join(p, "_bucket_spec.json"))  # pre-r12 dir
            with pytest.raises(ValueError, match="explicitly"):
                register_bucketed(spark, p, table)
            register_bucketed(spark, p, table, "k", buckets=4)
            assert spark.table(table).count() == 200
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")


class TestValidateBucketed:
    def test_healthy_layout_all_ok(self, spark, tmp_path):
        from spark_bi5_datasource_spark.sources.layout import (
            validate_bucketed,
        )

        p = str(tmp_path / "t")
        table = "bi5_test_val_ok"
        try:
            _write(spark, p, table)
            rows = validate_bucketed(spark, p).collect()
            assert rows and all(r.ok for r in rows)
            assert sum(r.n_rows for r in rows) == 200
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")

    def test_foreign_file_flagged(self, spark, tmp_path):
        """A plain parquet file dropped into the directory (the
        generic-compactor / manual-copy accident) carries no bucket id
        — the validator must flag it, because the planner would read
        it as part of whichever bucket list it lands in."""
        from spark_bi5_datasource_spark.sources.layout import (
            validate_bucketed,
        )

        p = str(tmp_path / "t")
        table = "bi5_test_val_foreign"
        try:
            _write(spark, p, table)
            plain = str(tmp_path / "plain")
            spark.createDataFrame(
                [(9999, "intruder")], "k long, v string"
            ).coalesce(1).write.parquet(plain)
            src = next(
                f for f in os.listdir(plain)
                if f.endswith(".parquet") and f.startswith("part-")
            )
            shutil.copy(
                os.path.join(plain, src),
                os.path.join(p, "part-intruder.snappy.parquet"),
            )
            bad = [
                r for r in validate_bucketed(spark, p).collect()
                if not r.ok
            ]
            assert len(bad) == 1 and bad[0].bucket_id is None
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")

    def test_misfiled_rows_flagged(self, spark, tmp_path):
        """A bucket file renamed to another bucket's id (restore from
        backup gone wrong) — every row inside now violates the
        invariant and the validator must count them."""
        from spark_bi5_datasource_spark.sources.layout import (
            validate_bucketed,
        )

        p = str(tmp_path / "t")
        table = "bi5_test_val_misfile"
        try:
            _write(spark, p, table)
            f0 = next(
                f for f in os.listdir(p)
                if f.startswith("part-") and "_00000.c000" in f
            )
            os.rename(
                os.path.join(p, f0),
                os.path.join(p, f0.replace("_00000.c000", "_00002.c000")),
            )
            res = validate_bucketed(spark, p).collect()
            bad = [r for r in res if not r.ok]
            assert bad and all(r.n_misplaced > 0 for r in bad)
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")

    @pytest.mark.parametrize("buckets", [1, 2, 7])
    def test_degenerate_bucket_counts(self, spark, tmp_path, buckets):
        """buckets=1 (everything in one file), odd counts — the
        validator and spec round-trip must hold at the corners."""
        from spark_bi5_datasource_spark.sources.layout import (
            read_bucket_spec,
            validate_bucketed,
            write_bucketed,
        )

        p = str(tmp_path / f"t{buckets}")
        table = f"bi5_test_val_deg_{buckets}"
        try:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            write_bucketed(
                spark.createDataFrame(
                    [(i, f"d{i}") for i in range(50)],
                    "k long, v string",
                ),
                p, table, "k", buckets=buckets,
            )
            assert read_bucket_spec(p)["buckets"] == buckets
            rows = validate_bucketed(spark, p).collect()
            assert rows and all(r.ok for r in rows)
            assert sum(r.n_rows for r in rows) == 50
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")

    def test_skewed_single_bucket_layout(self, spark, tmp_path):
        """Every row carries the SAME key: one bucket holds the whole
        table, the others have no file at all.  Validation must pass
        (absent buckets are legal) and selective compaction must
        handle the lone mega-bucket."""
        from pyspark.sql import functions as F

        from spark_bi5_datasource_spark.sources.layout import (
            compact_buckets_selective,
            validate_bucketed,
            write_bucketed,
        )

        p = str(tmp_path / "t")
        table = "bi5_test_val_skew"
        try:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            write_bucketed(
                spark.createDataFrame(
                    [(7, f"d{i}") for i in range(100)],
                    "k long, v string",
                ),
                p, table, "k", buckets=4,
            )
            (
                spark.createDataFrame(
                    [(7, f"e{i}") for i in range(50)],
                    "k long, v string",
                )
                .repartition(4, F.col("k"))
                .write.bucketBy(4, "k")
                .sortBy("k")
                .mode("append")
                .saveAsTable(table)
            )
            spark.catalog.refreshTable(table)
            rows = validate_bucketed(spark, p).collect()
            assert len(rows) == 2 and all(r.ok for r in rows)
            done = compact_buckets_selective(spark, table, p)
            assert len(done) == 1  # the one real bucket
            assert spark.table(table).count() == 150
            rows2 = validate_bucketed(spark, p).collect()
            assert len(rows2) == 1 and rows2[0].ok
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")

    def test_no_spec_no_params_raises(self, spark, tmp_path):
        from spark_bi5_datasource_spark.sources.layout import (
            validate_bucketed,
        )

        p = str(tmp_path / "t")
        table = "bi5_test_val_nospec"
        try:
            _write(spark, p, table)
            os.remove(os.path.join(p, "_bucket_spec.json"))
            with pytest.raises(ValueError, match="explicitly"):
                validate_bucketed(spark, p)
            # explicit params still work
            rows = validate_bucketed(spark, p, "k", 4).collect()
            assert all(r.ok for r in rows)
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
