"""Enforced cleanup for the two documented resource-retention sites
(r11 verdict ask #5): pagerank's persisted invariants + checkpoint
blocks, and daily_bars' driver-side bar cache.  The docstring
contracts ("call clearCache() between runs") become APIs with tests:
``storage_scope`` returns executor storage to baseline, and the bar
cache evicts stale-session entries and caps its size.
"""

from __future__ import annotations

import pytest


def _persisted(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


class TestStorageScope:
    def _edges(self, spark):
        rows = [(i, (i * 3 + 1) % 40) for i in range(40)] + [
            (i, (i * 7 + 2) % 40) for i in range(40)
        ]
        return spark.createDataFrame(rows, "src long, dst long")

    def test_pagerank_storage_returns_to_baseline(self, spark):
        from spark_bi5_datasource_spark.operators import (
            pagerank,
            storage_scope,
        )

        spark.catalog.clearCache()
        baseline = _persisted(spark)
        with storage_scope(spark):
            ranks = pagerank(self._edges(spark), iters=4)
            got = ranks.collect()
            assert len(got) == 40
            inside = _persisted(spark)
            # the drill is real: invariants + checkpoint blocks exist
            assert len(inside - baseline) >= 3
        assert _persisted(spark) == baseline

    def test_preexisting_caches_untouched(self, spark):
        from pyspark.sql import functions as F

        from spark_bi5_datasource_spark.operators import storage_scope

        keep = spark.range(100).select(
            F.col("id"), (F.col("id") * 2).alias("x")
        ).persist()
        keep.count()  # materialize the cache
        held = _persisted(spark)
        try:
            with storage_scope(spark):
                tmp = spark.range(50).persist()
                tmp.count()
            after = _persisted(spark)
            assert held <= after  # keep's RDD survived
            assert keep.count() == 100
            # and the scoped persist is gone
            assert after == held
        finally:
            keep.unpersist()

    def test_cleanup_runs_on_exception(self, spark):
        from spark_bi5_datasource_spark.operators import storage_scope

        spark.catalog.clearCache()
        baseline = _persisted(spark)
        with pytest.raises(RuntimeError, match="boom"):
            with storage_scope(spark):
                d = spark.range(10).persist()
                d.count()
                raise RuntimeError("boom")
        assert _persisted(spark) == baseline


class TestDailyBarsCacheEviction:
    @pytest.fixture()
    def sf_dir(self):
        from tests.conftest import TESTDATA_SF

        return TESTDATA_SF

    def test_stale_session_entries_evicted(self, spark, sf_dir):
        import os

        if not os.path.isdir(sf_dir):
            pytest.skip(f"no fixture at {sf_dir}")
        from spark_bi5_datasource_spark.plans import daily_bars as db

        class _Dead:
            @property
            def sparkSession(self):
                raise RuntimeError("session is gone")

        db._CACHE.clear()
        db._CACHE[("dead-app", "sf", "ohlc")] = _Dead()
        try:
            db.cache_daily_bars(spark, sf_dir)
            assert ("dead-app", "sf", "ohlc") not in db._CACHE
            # the live entries were created and are usable
            assert db.daily_ohlc_bars(spark, sf_dir).count() > 0
        finally:
            db._CACHE.clear()

    def test_fifo_cap_bounds_cache(self, spark, sf_dir):
        import os

        if not os.path.isdir(sf_dir):
            pytest.skip(f"no fixture at {sf_dir}")
        from spark_bi5_datasource_spark.plans import daily_bars as db

        db._CACHE.clear()
        try:
            app = spark.sparkContext.applicationId
            # simulate a long sweep: many prior sf dirs, LIVE session
            for i in range(db._CACHE_MAX + 4):
                df = spark.createDataFrame([(i,)], "x long")
                db._CACHE[(app, f"/fake/sf{i}", "ohlc")] = df
            db.cache_daily_bars(spark, sf_dir)
            assert len(db._CACHE) <= db._CACHE_MAX
            # the entries just built for THIS call survived the cap
            assert (app, sf_dir, "ohlc") in db._CACHE
            assert (app, sf_dir, "rev") in db._CACHE
        finally:
            db._CACHE.clear()
