"""Crash drills for the streaming effectively-once sinks.

The docstrings in streaming/crawl.py and streaming/bucketed_sink.py
make specific recovery CLAIMS — index-before-docs append ordering
means "any crash point replays to the same corpus"; the bucketed
append sink is at-least-once between append and marker and must
survive a session restart without wiping prior ingest.  These tests
stop reasoning and PROVE each claim by injecting the crash:

* a fault hook raises inside ``foreachBatch`` between the two appends
  (index committed, docs not, marker absent) and the stream is resumed
  with the SAME checkpoint — Spark replays the failed epoch and the
  final corpus must equal the batch-mode fold;
* a deleted marker (crash after appends, before the marker write) is
  replayed with a fresh checkpoint — the crawl writers must CONVERGE
  (a re-applied batch self-dedups against the corpus that already
  holds it), the bucketed append sink must show its documented
  at-least-once duplication;
* a restarted session (empty in-memory catalog, table directory
  intact) resuming a checkpointed stream must APPEND to the existing
  bucketed table, never overwrite-create it.
"""

from __future__ import annotations

import os

import pytest


BASE = "the quick brown fox jumps over the lazy dog near town"
OTHER = "spark catalyst optimizes declarative query plans into stages"

CRAWL_BATCHES = [
    [(1, BASE), (2, OTHER)],
    [(10, BASE.replace("town", "city")),
     (11, "fresh page about gardening tools and soil preparation")],
    [(20, OTHER),  # exact dup of kept doc 2
     (21, "completely new cooking pasta with garlic butter page")],
]
CRAWL_KEPT = [1, 2, 11, 21]  # the pinned batch-fold result


def _write_increments(spark, sdir: str, batches) -> None:
    """One parquet file per batch, mtime-ascending so maxFilesPerTrigger=1
    discovers them in batch order (same rig as test_streaming.py)."""
    import time as _time

    os.makedirs(sdir, exist_ok=True)
    t0 = _time.time()
    for k, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        df.coalesce(1).write.mode("append").parquet(sdir)
        for f in sorted(
            f for f in os.listdir(sdir) if f.endswith(".parquet")
        ):
            p = os.path.join(sdir, f)
            if os.path.getmtime(p) > t0 + k:
                os.utime(p, (t0 + k, t0 + k))


def _read_stream(spark, sdir: str):
    return (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(sdir)
    )


def _corpus_ids(spark, cdir: str) -> list[int]:
    return sorted(
        r.doc_id
        for r in spark.read.parquet(os.path.join(cdir, "docs")).collect()
    )


def _markers(cdir: str) -> set[str]:
    return {
        f for f in os.listdir(cdir) if f.startswith("_applied_batch_")
    }


class _DocsAppendCrash:
    """Fault hook: patch DataFrameWriter.parquet to raise on the
    corpus-docs append once ``after_markers`` batches have committed —
    the exact crash point between the index append (already done) and
    the docs append.  ``disarm()`` restores the real writer."""

    def __init__(self, cdir: str, after_markers: int):
        from pyspark.sql.readwriter import DataFrameWriter

        self._cls = DataFrameWriter
        self._orig = DataFrameWriter.parquet
        cdir_docs = os.path.join(cdir, "docs")

        def crashing(wself, path, *a, **kw):
            if (
                str(path).rstrip("/") == cdir_docs
                and os.path.isdir(cdir)
                and len(_markers(cdir)) >= after_markers
            ):
                raise RuntimeError(
                    "injected crash: between index and docs appends"
                )
            return self._orig(wself, path, *a, **kw)

        DataFrameWriter.parquet = crashing

    def disarm(self):
        self._cls.parquet = self._orig


class TestCrawlCrashBetweenAppends:
    """Crash point: index appended, docs NOT, marker absent — the
    crash ordering streaming/crawl.py:93 chose deliberately.  Resume
    with the SAME checkpoint must replay the epoch and land on the
    batch-fold corpus; the orphan index rows must be absorbed."""

    def _drill(self, spark, tmp_path, make_writer):
        sdir = str(tmp_path / "inc")
        cdir, idir = str(tmp_path / "corpus"), str(tmp_path / "index")
        ckpt = str(tmp_path / "ckpt")
        _write_increments(spark, sdir, CRAWL_BATCHES)

        hook = _DocsAppendCrash(cdir, after_markers=2)
        try:
            q = make_writer(_read_stream(spark, sdir), cdir, idir, ckpt)
            with pytest.raises(Exception, match="injected crash"):
                q.awaitTermination()
        finally:
            hook.disarm()

        # crashed-state invariants: batches 0,1 committed; batch 2's
        # band rows are in the index (orphans), its docs are not, and
        # its marker was never written
        assert _markers(cdir) == {"_applied_batch_0", "_applied_batch_1"}
        assert _corpus_ids(spark, cdir) == [1, 2, 11]
        idx_ids = {
            r.doc_id
            for r in spark.read.parquet(
                os.path.join(idir, "bands")
            ).select("doc_id").distinct().collect()
        }
        assert 21 in idx_ids  # the orphan rows exist — the drill is real

        # recovery: SAME checkpoint → Spark replays the failed epoch
        q2 = make_writer(_read_stream(spark, sdir), cdir, idir, ckpt)
        q2.awaitTermination()
        assert _corpus_ids(spark, cdir) == CRAWL_KEPT
        # the index is consistent with the corpus modulo duplicates
        # (replay re-appends band rows; candidate dropDuplicates and
        # the verify join-back absorb them — pinned here)
        from spark_bi5_datasource_spark.operators.band_index import (
            minhash_band_index,
        )

        idx = (
            spark.read.parquet(os.path.join(idir, "bands"))
            .dropDuplicates(["doc_id", "band", "bucket"])
        )
        fresh = minhash_band_index(
            spark.read.parquet(os.path.join(cdir, "docs")),
            "doc_id", "text",
        )
        assert sorted(map(tuple, idx.collect())) == sorted(
            map(tuple, fresh.collect())
        )

    def test_crawl_dedup_recovers(self, spark, tmp_path):
        from spark_bi5_datasource_spark.streaming import (
            stream_crawl_dedup_writer,
        )

        self._drill(
            spark,
            tmp_path,
            lambda s, c, i, k: stream_crawl_dedup_writer(
                s, c, i, threshold=0.4, checkpoint_dir=k
            ),
        )

    def test_corpus_build_recovers(self, spark, tmp_path):
        from spark_bi5_datasource_spark.streaming import (
            stream_corpus_build_writer,
        )

        # no quality/contam stages: this drill targets the append
        # ordering, and with both None the stage chain reduces to the
        # crawl loop — same batch-fold expectation
        self._drill(
            spark,
            tmp_path,
            lambda s, c, i, k: stream_corpus_build_writer(
                s, c, i, threshold=0.4, checkpoint_dir=k
            ),
        )


class TestCrawlCrashBeforeMarker:
    """Crash point: BOTH appends committed, marker not yet written.
    A replay re-applies the batch against a corpus that already holds
    it — every doc is a jaccard-1.0 near-dup of itself, so the replay
    must append NOTHING (convergence, not duplication)."""

    def test_crawl_dedup_converges(self, spark, tmp_path):
        from spark_bi5_datasource_spark.streaming import (
            stream_crawl_dedup_writer,
        )

        sdir = str(tmp_path / "inc")
        cdir, idir = str(tmp_path / "corpus"), str(tmp_path / "index")
        _write_increments(spark, sdir, CRAWL_BATCHES)
        q = stream_crawl_dedup_writer(
            _read_stream(spark, sdir), cdir, idir, threshold=0.4,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        q.awaitTermination()
        assert _corpus_ids(spark, cdir) == CRAWL_KEPT

        # simulate the crash: batch 2's marker vanishes; a fresh
        # checkpoint replays every file, markers skip 0,1, batch 2
        # re-applies for real
        os.remove(os.path.join(cdir, "_applied_batch_2"))
        q2 = stream_crawl_dedup_writer(
            _read_stream(spark, sdir), cdir, idir, threshold=0.4,
            checkpoint_dir=str(tmp_path / "ckpt2"),
        )
        q2.awaitTermination()
        assert _corpus_ids(spark, cdir) == CRAWL_KEPT  # no growth
        assert "_applied_batch_2" in _markers(cdir)  # marker restored


class TestBucketedSinkCrash:
    """streaming/bucketed_sink.py restart + replay drills."""

    def _files(self, spark, sdir: str, batches_rows, start_t=None):
        import time as _time

        os.makedirs(sdir, exist_ok=True)
        t0 = start_t if start_t is not None else _time.time()
        existing = len(
            [f for f in os.listdir(sdir) if f.endswith(".parquet")]
        )
        for k, rows in enumerate(batches_rows):
            df = spark.createDataFrame(rows, "doc_id long, text string")
            df.coalesce(1).write.mode("append").parquet(sdir)
            for f in sorted(
                f for f in os.listdir(sdir) if f.endswith(".parquet")
            ):
                p = os.path.join(sdir, f)
                if os.path.getmtime(p) > t0 + existing + k:
                    os.utime(
                        p, (t0 + existing + k, t0 + existing + k)
                    )
        return t0

    def test_restart_appends_instead_of_wiping(self, spark, tmp_path):
        """The r11-advice data-loss scenario: a NEW session (empty
        in-memory catalog) resumes a checkpointed stream over a table
        directory that already holds committed data.  The first
        post-restart batch has no marker and no catalog entry; it must
        re-attach and APPEND — before the fix it overwrite-created and
        destroyed all prior ingest."""
        from spark_bi5_datasource_spark.streaming import (
            stream_bucketed_append_writer,
        )

        table = "bi5_test_crash_restart"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        sdir = str(tmp_path / "inc")
        tdir = str(tmp_path / "tbl")
        ckpt = str(tmp_path / "ckpt")
        try:
            t0 = self._files(
                spark, sdir,
                [[(i, f"doc {i}") for i in range(0, 40)],
                 [(i, f"doc {i}") for i in range(40, 80)]],
            )
            q = stream_bucketed_append_writer(
                self._stream(spark, sdir), tdir, table, "doc_id",
                buckets=8, checkpoint_dir=ckpt,
            )
            q.awaitTermination()
            assert spark.table(table).count() == 80

            # session restart: the in-memory catalog forgets the table;
            # the directory and the checkpoint survive
            spark.sql(f"DROP TABLE {table}")
            # a NEW batch arrives after the restart
            self._files(
                spark, sdir,
                [[(i, f"doc {i}") for i in range(80, 120)]],
                start_t=t0,
            )
            q2 = stream_bucketed_append_writer(
                self._stream(spark, sdir), tdir, table, "doc_id",
                buckets=8, checkpoint_dir=ckpt,
            )
            q2.awaitTermination()
            got = sorted(r.doc_id for r in spark.table(table).collect())
            assert got == list(range(120))  # appended, nothing wiped
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")

    def test_marker_crash_is_at_least_once(self, spark, tmp_path):
        """Documented contract (bucketed_sink.py module docstring): a
        crash between append and marker re-appends the batch — an
        append is not idempotent, so this is at-least-once, visibly."""
        from spark_bi5_datasource_spark.streaming import (
            stream_bucketed_append_writer,
        )

        table = "bi5_test_crash_marker"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        sdir = str(tmp_path / "inc")
        tdir = str(tmp_path / "tbl")
        try:
            self._files(
                spark, sdir,
                [[(i, f"doc {i}") for i in range(0, 40)],
                 [(i, f"doc {i}") for i in range(40, 80)]],
            )
            q = stream_bucketed_append_writer(
                self._stream(spark, sdir), tdir, table, "doc_id",
                buckets=8, checkpoint_dir=str(tmp_path / "ckpt"),
            )
            q.awaitTermination()
            assert spark.table(table).count() == 80

            os.remove(os.path.join(f"{tdir}.markers", "_applied_batch_1"))
            q2 = stream_bucketed_append_writer(
                self._stream(spark, sdir), tdir, table, "doc_id",
                buckets=8, checkpoint_dir=str(tmp_path / "ckpt2"),
            )
            q2.awaitTermination()
            # batch 0 skipped by its marker; batch 1 re-appended
            assert spark.table(table).count() == 120
            from pyspark.sql import functions as F

            dup = (
                spark.table(table).groupBy("doc_id")
                .agg(F.count("*").alias("n"))
                .where("n = 2").count()
            )
            assert dup == 40  # exactly batch 1 duplicated, nothing else
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")

    def _stream(self, spark, sdir: str):
        return _read_stream(spark, sdir)
