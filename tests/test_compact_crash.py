"""Crash/concurrency drills for sources/layout.compact_bucketed's
r12 swap ordering: an interrupted swap must be auto-recoverable, and
``keep_old`` must preserve the pre-compaction snapshot for callers
draining concurrent readers.
"""

from __future__ import annotations

import os


def _bucketed_table(spark, tmp_path, table: str, frags: int = 3):
    """A bucketed table fragmented by ``frags`` append batches."""
    from pyspark.sql import functions as F

    from spark_bi5_datasource_spark.sources.layout import write_bucketed

    path = str(tmp_path / "tbl")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    write_bucketed(
        spark.createDataFrame(
            [(i, f"d{i}") for i in range(0, 40)],
            "doc_id long, text string",
        ),
        path, table, "doc_id", buckets=4,
    )
    for k in range(1, frags):
        (
            spark.createDataFrame(
                [(i, f"d{i}") for i in range(k * 40, k * 40 + 40)],
                "doc_id long, text string",
            )
            .repartition(4, F.col("doc_id"))
            .write.bucketBy(4, "doc_id")
            .sortBy("doc_id")
            .mode("append")
            .saveAsTable(table)
        )
    spark.catalog.refreshTable(table)
    return path


class TestCompactCrashSafety:
    def test_interrupted_swap_auto_recovers(self, spark, tmp_path):
        """Crash point: between ``rename(path, old)`` and
        ``rename(staging, path)`` — path is momentarily absent.  The
        next compact_bucketed call must restore from .old and finish
        normally (the r11-advice manual-recovery scenario made
        automatic)."""
        import shutil

        from spark_bi5_datasource_spark.sources.layout import (
            compact_bucketed,
        )

        table = "bi5_test_compact_crash"
        path = _bucketed_table(spark, tmp_path, table)
        try:
            # simulate the mid-swap crash state by hand: data moved to
            # .old, nothing at path, catalog stale
            spark.sql(f"DROP TABLE {table}")
            os.rename(path, f"{path}.old")
            assert not os.path.exists(path)

            n = compact_bucketed(spark, table, path, "doc_id", buckets=4)
            assert n <= 4
            got = sorted(r.doc_id for r in spark.table(table).collect())
            assert got == list(range(120))  # nothing lost
            assert not os.path.exists(f"{path}.old")  # cleaned up
            shutil.rmtree(f"{path}.compacting", ignore_errors=True)
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")

    def test_full_compact_recovers_interrupted_selective_cycle(
        self, spark, tmp_path
    ):
        """Review finding (r12): a selective cycle crashed between the
        new-file rename and the retired deletes leaves a bucket
        duplicated on disk with the manifest as the only record.  A
        subsequent FULL compaction must run selective recovery first —
        otherwise it bakes the duplicates in permanently (and its row
        guard, counting the same duplicates on both sides, passes)."""
        import json as _json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from spark_bi5_datasource_spark.sources.layout import (
            compact_bucketed,
        )

        table = "bi5_test_compact_selrec"
        path = _bucketed_table(spark, tmp_path, table)
        try:
            b0 = [
                f for f in os.listdir(path)
                if f.startswith("part-") and "_00000." in f
            ]
            assert len(b0) >= 2
            merged = pa.concat_tables(
                [pq.read_table(os.path.join(path, f)) for f in b0]
            )
            newname = (
                "part-00000-compactcrash_00000.c000.snappy.parquet"
            )
            pq.write_table(merged, os.path.join(path, newname))
            with open(
                os.path.join(path, "_compact_manifest_crash_0.json"),
                "w",
            ) as fh:
                _json.dump(
                    {"bucket": 0, "retired": b0, "new": newname}, fh
                )
            # bucket 0 currently holds every row twice on disk; the
            # full compaction must finish the interrupted deletes
            # before reading
            n = compact_bucketed(spark, table, path)
            assert n <= 4
            got = sorted(r.doc_id for r in spark.table(table).collect())
            assert got == list(range(120))  # no duplicates baked in
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")

    def test_stray_staging_dir_does_not_block_full_compact(
        self, spark, tmp_path
    ):
        """Review finding (r12): a leftover .compact_stage_* dir is
        invisible to Spark's reader but was counted by the footer
        row-guard, spuriously refusing a healthy compaction."""
        from spark_bi5_datasource_spark.sources.layout import (
            compact_bucketed,
        )

        table = "bi5_test_compact_stray"
        path = _bucketed_table(spark, tmp_path, table)
        try:
            stray = os.path.join(path, ".compact_stage_dead")
            os.makedirs(stray)
            # a parquet file Spark will never read but os.walk finds
            import pyarrow as pa
            import pyarrow.parquet as pq

            pq.write_table(
                pa.table({"doc_id": [1], "text": ["x"]}),
                os.path.join(stray, "part-ghost.parquet"),
            )
            n = compact_bucketed(spark, table, path)  # must not raise
            assert n <= 4
            assert spark.table(table).count() == 120
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")

    def test_spec_contradiction_refused(self, spark, tmp_path):
        """compact_bucketed now enforces the sidecar contract like
        register_bucketed: compacting a 4-bucket table 'as 32' (the
        old silent default) must raise, and sidecar-resolved
        no-param compaction must work."""
        import pytest as _pytest

        from spark_bi5_datasource_spark.sources.layout import (
            compact_bucketed,
        )

        table = "bi5_test_compact_spec"
        path = _bucketed_table(spark, tmp_path, table)
        try:
            with _pytest.raises(ValueError, match="contradicts"):
                compact_bucketed(
                    spark, table, path, "doc_id", buckets=32
                )
            n = compact_bucketed(spark, table, path)  # sidecar params
            assert n <= 4
            assert spark.table(table).count() == 120
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")

    def test_rowcount_guard_refuses_bad_rewrite(
        self, spark, tmp_path, monkeypatch
    ):
        """A partial/corrupt staging rewrite must never replace the
        snapshot: fake a row-count mismatch and assert the swap is
        refused with the table fully intact."""
        import pytest

        from spark_bi5_datasource_spark.sources import layout

        table = "bi5_test_compact_guard"
        path = _bucketed_table(spark, tmp_path, table)
        real = layout._footer_rows

        def lying(p):
            n = real(p)
            return n - 1 if p.endswith(".compacting") else n

        monkeypatch.setattr(layout, "_footer_rows", lying)
        try:
            with pytest.raises(RuntimeError, match="refusing to swap"):
                layout.compact_bucketed(
                    spark, table, path, "doc_id", buckets=4
                )
            # nothing was swapped or dropped
            got = sorted(r.doc_id for r in spark.table(table).collect())
            assert got == list(range(120))
            assert os.path.isdir(path)
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")

    def test_keep_old_preserves_snapshot(self, spark, tmp_path):
        import shutil

        from spark_bi5_datasource_spark.sources.layout import (
            compact_bucketed,
        )

        table = "bi5_test_compact_keepold"
        path = _bucketed_table(spark, tmp_path, table)
        try:
            n_before = sum(
                1 for f in os.listdir(path) if f.startswith("part-")
            )
            assert n_before > 4  # fragmentation is real
            compact_bucketed(
                spark, table, path, "doc_id", buckets=4, keep_old=True
            )
            old = f"{path}.old"
            assert os.path.isdir(old)  # caller owns the purge
            old_rows = spark.read.parquet(old).count()
            assert old_rows == 120  # full pre-compaction snapshot
            got = sorted(r.doc_id for r in spark.table(table).collect())
            assert got == list(range(120))
            shutil.rmtree(old)
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
