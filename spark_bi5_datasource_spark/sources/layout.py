"""Storage layout helpers: hive-partitioned writes and one-pass
pipeline metrics.

Three layout tools now cover the three pruning axes a 100-TB
warehouse needs (each validated by plan tests):

* **partition pruning** (this module): ``write_partitioned`` lays
  data out as ``col=value/`` directories; an equality/IN filter on
  the partition column never touches non-matching files — the plan
  shows it under ``PartitionFilters`` and the scan's file list
  shrinks before any task launches.  Right for low-cardinality,
  always-filtered columns (day, tenant, source).
* **file skipping** (operators/zorder.py): range-clusters the rows
  so min/max footer stats prune *within* a partition — right for
  high-cardinality or multi-dimension predicates.
* **co-located joins** (plans/tables.py): hash-bucketed layout so
  recurring fact-fact joins run with no exchange at all.

``observed_write`` rides the ``df.observe`` API: audit counters
(row counts, null counts, min/max freshness) computed during the
one write pass — no second scan for the "how much did we just
write" dashboard, which at 100 TB would double the job cost.
"""

from __future__ import annotations

import os

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Observation


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` hive-partitioned by ``partition_cols``.

    Partition columns should be low-cardinality derivations (a date
    bucket, a source tag) — one directory per distinct combination;
    a high-cardinality partition key is the classic small-files
    failure.  ``max_records_per_file`` caps file size inside hot
    partitions without an extra repartition pass."""
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    path: str,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> str:
    """Write ``df`` hash-bucketed (and by default sorted) on ``key``
    into ``path`` and register it as ``table`` — the co-located-join
    write path, generalized from the fixture-layout helper
    (plans/tables.ensure_bucketed_layout) to ANY frame a pipeline
    materializes.

    Two frames written with the same ``buckets`` count, each on ITS
    join key, join with NO exchange and (when ``sort``) NO sort: the
    100-TB contract for recurring fact⋈fact and doc⋈embedding joins.
    The pre-write ``repartition`` on the key means each task holds
    exactly one bucket's rows — one file per bucket, which is what
    lets the scan expose the sort order (enable
    ``spark.sql.legacy.bucketedTableScan.outputOrdering`` on the
    reading session).  Returns ``table``."""
    from pyspark.sql import functions as F

    w = (
        df.repartition(buckets, F.col(key))
        .write.bucketBy(buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.option("path", path).mode(mode).saveAsTable(table)
    return table


def enable_sorted_bucketed_scans(spark) -> None:
    """Session-setup switch for the bucketed layout contract: lets a
    one-file-per-bucket scan report its per-bucket sort order so SMJ
    plans elide the Sort as well as the Exchange.  Idempotent and
    row-neutral (it only lets the planner TRUST an ordering the
    ``write_bucketed`` layout genuinely provides).  Call it once at
    session setup — NOT from inside individual timed operations — so
    plan shapes are uniform across a session rather than dependent on
    which entry ran first (bench.py sets it at session build;
    ``ensure_bucketed_layout`` and the co-bucketed fixtures route
    through here)."""
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
    )


def register_bucketed(
    spark,
    path: str,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
) -> str:
    """Re-attach an existing ``write_bucketed`` directory as
    ``table`` in a NEW session (the default catalog is in-memory, so
    bucketing metadata does not survive a restart) — DDL only, no
    data movement.  The caller owns parameter consistency: ``key``/
    ``buckets`` must match what the directory was written with, or
    the planner will trust wrong co-location.  Returns ``table``."""
    sch = spark.read.parquet(path).schema
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in sch.fields
    )
    sorted_by = f"SORTED BY ({key}) " if sort else ""
    spark.sql(
        f"CREATE TABLE {table} ({cols}) USING PARQUET "
        f"CLUSTERED BY ({key}) {sorted_by}"
        f"INTO {buckets} BUCKETS LOCATION '{path}'"
    )
    return table


def compact_bucketed(
    spark,
    table: str,
    path: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
    keep_old: bool = False,
) -> int:
    """Compact a bucketed table back to ONE file per bucket after
    streaming appends have fragmented it (each appended micro-batch
    adds up to ``buckets`` files).

    A generic directory compactor (operators/sharding.compact_parquet)
    would merge files ACROSS buckets and silently corrupt the
    bucket→file mapping the exchange-free join contract depends on —
    bucketed compaction must re-run the bucketed WRITE path.  This
    rewrites the table snapshot through ``write_bucketed`` into a
    staging directory (same key, same bucket count — the rewrite is
    one hash repartition), then swaps directories and re-registers.

    Concurrency contract: compaction assumes NO concurrent readers of
    the pre-compaction snapshot — an in-flight query holding the old
    DataFrame will fail with FileNotFoundException once the old files
    are removed.  Pass ``keep_old=True`` to leave the pre-compaction
    snapshot at ``<path>.old`` for the caller to purge after draining
    readers (the caller owns the eventual ``shutil.rmtree``).

    Crash safety: the swap is two directory renames; a crash between
    them leaves both snapshots intact on disk (``<path>.old`` = full
    pre-compaction data, ``<path>.compacting`` = full compacted data)
    and the NEXT ``compact_bucketed`` call on the same path
    auto-recovers by restoring ``.old`` before starting over.  The
    catalog entry for ``table`` is dropped only AFTER the data swap
    completes, so at every crash point either the directory or the
    prior registration is recoverable.  Returns the data-file count
    after compaction (== buckets touched)."""
    import shutil

    old = f"{path}.old"
    # recover from a crash mid-swap in a PRIOR run: path missing but
    # the pre-compaction snapshot survives at .old — restore it and
    # redo the compaction from scratch
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)

    tmp_table = f"{table}_compacting"
    staging = f"{path}.compacting"
    shutil.rmtree(staging, ignore_errors=True)
    spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")
    # read the DIRECTORY, not the table: the bucketed scan already
    # reports HashPartitioning(key, buckets), so EnsureRequirements
    # elides write_bucketed's repartition and every fragment file
    # passes through as its own task → its own output file (measured:
    # a 19-file table "compacted" to 19 files).  A plain parquet scan
    # carries no partitioning, forcing the real one-task-per-bucket
    # shuffle.
    write_bucketed(
        spark.read.parquet(path), staging, tmp_table, key, buckets,
        sort=sort,
    )
    # external tables: DROP removes metadata only, files stay put
    spark.sql(f"DROP TABLE {tmp_table}")
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(staging, path)
    # catalog swap only after the data swap is complete: a crash
    # before this line leaves the old registration pointing at a
    # fully-populated ``path`` (now holding the compacted snapshot,
    # same rows), never at a hole
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    register_bucketed(spark, path, table, key, buckets, sort=sort)
    if not keep_old:
        shutil.rmtree(old, ignore_errors=True)
    return sum(
        1
        for f in os.listdir(path)
        if f.endswith(".parquet") or f.startswith("part-")
    )


def observed_write(
    df: DataFrame,
    metrics: dict[str, Column],
    action: Callable[[DataFrame], None] | None = None,
    name: str = "pipeline_metrics",
) -> dict:
    """Attach observation ``metrics`` (aggregate Columns over the
    full frame) to ``df``, run ``action`` (default: a noop-sink
    write, i.e. full execution), and return the realized metric
    values.  One scan: the metrics are accumulated by the tasks that
    execute the action, not by a second job."""
    obs = Observation(name)
    named = [c.alias(n) for n, c in metrics.items()]
    observed = df.observe(obs, *named)
    if action is None:
        observed.write.format("noop").mode("overwrite").save()
    else:
        action(observed)
    return obs.get
