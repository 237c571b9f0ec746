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

import json
import os

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Observation

_SPEC_FILE = "_bucket_spec.json"


def write_bucket_spec(
    path: str, key: str, buckets: int, sort: bool
) -> None:
    """Persist the bucketing parameters as a sidecar inside the table
    directory (next to ``_SUCCESS`` — non-Spark readers ignore both).
    The in-memory catalog forgets bucket DDL across sessions, and a
    ``register_bucketed`` with the WRONG key/buckets makes the planner
    trust wrong co-location (silently wrong joins elided of their
    exchange); the sidecar makes the directory self-describing so
    re-attachment never depends on the caller remembering."""
    spec = {"key": key, "buckets": int(buckets), "sort": bool(sort),
            "version": 1}
    tmp = os.path.join(path, _SPEC_FILE + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(spec, fh)
    os.replace(tmp, os.path.join(path, _SPEC_FILE))


def read_bucket_spec(path: str) -> dict | None:
    """Read the ``_bucket_spec.json`` sidecar; None if absent (pre-r12
    directories, or trees written by other tools)."""
    p = os.path.join(path, _SPEC_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


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
    write_bucket_spec(path, key, buckets, sort)
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
    key: str | None = None,
    buckets: int | None = None,
    sort: bool | None = None,
) -> str:
    """Re-attach an existing ``write_bucketed`` directory as
    ``table`` in a NEW session (the default catalog is in-memory, so
    bucketing metadata does not survive a restart) — DDL only, no
    data movement.

    Parameter consistency is ENFORCED, not trusted (r12): directories
    written by ``write_bucketed`` carry a ``_bucket_spec.json``
    sidecar; omitted parameters resolve from it, and explicit
    parameters that CONTRADICT it raise — a wrong key/bucket-count
    registration would make the planner elide exchanges that are
    actually needed (silently wrong joins).  Pre-sidecar directories
    still accept explicit parameters unchecked (the caller owns them,
    as before; ``validate_bucketed`` can audit the claim).  Returns
    ``table``."""
    spec = read_bucket_spec(path)
    if spec is not None:
        for name, given in (("key", key), ("buckets", buckets),
                            ("sort", sort)):
            if given is not None and given != spec[name]:
                raise ValueError(
                    f"register_bucketed: {name}={given!r} contradicts "
                    f"the directory's _bucket_spec.json ({name}="
                    f"{spec[name]!r} at {path}) — registering with "
                    "wrong bucketing corrupts co-located join plans"
                )
        key = spec["key"] if key is None else key
        buckets = spec["buckets"] if buckets is None else buckets
        sort = spec["sort"] if sort is None else sort
    else:
        if key is None or buckets is None:
            raise ValueError(
                "register_bucketed: no _bucket_spec.json at "
                f"{path} — key= and buckets= must be given explicitly"
            )
        sort = True if sort is None else sort
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


def validate_bucketed(
    spark,
    path: str,
    key: str | None = None,
    buckets: int | None = None,
) -> DataFrame:
    """Audit a bucketed directory's layout INVARIANT: every row in
    bucket file ``b`` must satisfy ``pmod(murmur3(key), buckets) == b``
    (the contract the exchange-free join plans trust).  Returns one
    row per data file: ``file, bucket_id, n_rows, n_misplaced, ok`` —
    ``ok=false`` marks a file with misplaced rows OR a file whose name
    carries no bucket id at all (e.g. a plain parquet file appended by
    a non-bucketed writer, which silently breaks the whole mapping).

    Parameters default from the ``_bucket_spec.json`` sidecar.  One
    scan of the key column; Spark's bucket id is
    ``Pmod(Murmur3Hash(key), n)`` which is exactly ``F.pmod(F.hash(
    key), n)`` (verified empirically against the ``_NNNNN`` file-name
    suffix).  Run it after manual surgery on a table directory, or on
    a directory whose spec sidecar is missing and the registration
    parameters are folklore."""
    from pyspark.sql import functions as F

    spec = read_bucket_spec(path)
    if spec is not None:
        # mirror register_bucketed: an audit run with a key/buckets
        # claim that contradicts the directory's own sidecar would
        # silently audit the CALLER'S wrong parameters — flag it
        for name, given in (("key", key), ("buckets", buckets)):
            if given is not None and given != spec[name]:
                raise ValueError(
                    f"validate_bucketed: {name}={given!r} contradicts "
                    f"_bucket_spec.json ({name}={spec[name]!r} at "
                    f"{path}) — auditing against the wrong layout "
                    "claim proves nothing; pass no explicit params to "
                    "audit the sidecar's, or fix the sidecar first"
                )
        key = spec["key"] if key is None else key
        buckets = spec["buckets"] if buckets is None else buckets
    if key is None or buckets is None:
        raise ValueError(
            "validate_bucketed: no _bucket_spec.json at "
            f"{path} — pass key= and buckets= explicitly"
        )
    # an audit must see the CURRENT directory, not the session's
    # cached file listing (the damage being audited — renamed or
    # injected files — is exactly what the FileStatusCache hides)
    spark.catalog.refreshByPath(path)
    df = (
        spark.read.parquet(path)
        .select(
            F.element_at(F.split(F.input_file_name(), "/"), -1)
            .alias("file"),
            F.pmod(F.hash(F.col(key)), F.lit(buckets)).alias("__b"),
        )
        .withColumn(
            # ANSI-safe: regexp_extract yields '' on no match, which
            # a plain cast rejects — try_cast maps it to null, which
            # is exactly the "no bucket id in the name" signal
            "bucket_id",
            F.expr(
                r"try_cast(regexp_extract(file, '_(\\d{5})\\.', 1) "
                "AS INT)"
            ),
        )
    )
    return (
        df.groupBy("file", "bucket_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(
                F.when(
                    F.col("bucket_id").isNull()
                    | (F.col("__b") != F.col("bucket_id")),
                    1,
                ).otherwise(0)
            ).alias("n_misplaced"),
        )
        .withColumn(
            "ok",
            F.col("bucket_id").isNotNull() & (F.col("n_misplaced") == 0),
        )
        .orderBy("file")
    )


def _footer_rows(path: str) -> int:
    """Exact row count of a parquet tree from file-footer metadata —
    no Spark job, no data read beyond the footers.  Dot-prefixed
    subdirectories are pruned to MATCH Spark's reader (which hides
    them): counting a leftover ``.compact_stage_*`` dir that Spark
    ignores would make the compaction row guard disagree with what a
    scan actually sees."""
    import pyarrow.parquet as pq

    total = 0
    for root, dirs, files in os.walk(path):
        dirs[:] = sorted(
            d for d in dirs if not (d.startswith(".") or d.startswith("_"))
        )
        for f in sorted(files):
            if f.endswith(".parquet") and not f.startswith("."):
                total += pq.ParquetFile(
                    os.path.join(root, f)
                ).metadata.num_rows
    return total


def compact_bucketed(
    spark,
    table: str,
    path: str,
    key: str | None = None,
    buckets: int | None = None,
    sort: bool | None = None,
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
    auto-recovers by restoring ``.old`` before starting over.  A
    row-count guard (parquet footer metadata, no scan) refuses the
    swap when the staging rewrite does not hold exactly the
    snapshot's rows — a partial or corrupt rewrite can never replace
    good data.  The
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
    # finish/undo any interrupted SELECTIVE cycle first: a crashed
    # compact_buckets_selective can leave a bucket holding both its
    # compacted file and the retired originals — reading that state
    # here would bake the duplicate rows into the full rewrite (and
    # pass the row guard, which counts the same duplicates)
    _recover_selective(path, spark=spark, table=table)

    # parameter consistency, same contract as register_bucketed: the
    # sidecar wins; contradicting explicit params raise rather than
    # silently re-bucketing the table away from its co-located twins
    spec = read_bucket_spec(path)
    if spec is not None:
        for name, given in (("key", key), ("buckets", buckets),
                            ("sort", sort)):
            if given is not None and given != spec[name]:
                raise ValueError(
                    f"compact_bucketed: {name}={given!r} contradicts "
                    f"_bucket_spec.json ({name}={spec[name]!r} at "
                    f"{path}) — compacting with wrong bucketing would "
                    "silently change the table's layout"
                )
        key = spec["key"] if key is None else key
        buckets = spec["buckets"] if buckets is None else buckets
        sort = spec["sort"] if sort is None else sort
    else:
        if key is None or buckets is None:
            raise ValueError(
                "compact_bucketed: no _bucket_spec.json at "
                f"{path} — key= and buckets= must be given explicitly"
            )
        sort = True if sort is None else sort

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
    # pre-swap guard: the rewrite must hold exactly the snapshot's
    # rows before it may REPLACE the snapshot.  Parquet footer
    # metadata only (pyarrow num_rows per file) — no scan job, so the
    # guard is ~free even on a TB-sized table
    n_src, n_stage = _footer_rows(path), _footer_rows(staging)
    if n_src != n_stage:
        spark.sql(f"DROP TABLE {tmp_table}")
        raise RuntimeError(
            f"compact_bucketed: staging rewrite holds {n_stage} rows "
            f"but the table snapshot holds {n_src} — refusing to swap "
            f"(staging left at {staging} for inspection)"
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


def compact_buckets_selective(
    spark,
    table: str,
    path: str,
    min_files: int = 2,
    key: str | None = None,
    buckets: int | None = None,
    sort: bool | None = None,
) -> dict[int, int]:
    """Compact ONLY the buckets fragmented into ``min_files``-or-more
    files — the incremental counterpart of ``compact_bucketed``.

    A streaming append fragments just the buckets its batch touched;
    rewriting the WHOLE table per maintenance cycle is O(table) when
    the damage is O(recent ingest).  This pass inventories the
    directory by the bucket id encoded in each file name, and for each
    fragmented bucket rewrites its files into one file (sorted within
    the bucket when ``sort``) named with the SAME bucket id — the
    hash→bucket invariant is untouched (same rows, same bucket), which
    ``validate_bucketed`` can confirm, and a 1-file bucket makes the
    sorted-scan contract hold again.  Untouched buckets' files are not
    read, written, or renamed: the cost is O(fragmented data).

    The rewrite is ONE Spark job regardless of how many buckets are
    fragmented: every fragmented bucket's files are read together and
    re-bucketed through the bucketed write path into an invisible
    staging subdirectory — the same keys hash to the same bucket ids,
    so staging produces exactly one correctly-named file per
    fragmented bucket, in parallel across the cluster.  (The first cut
    ran one coalesce(1) job PER bucket; at 32 fragmented buckets the
    sequential job overhead made it 6× slower than the full rewrite —
    measured, see SCALE_NOTES r12.)

    Crash safety is manifest-based (the standard lake-format pattern,
    scaled down): per bucket, a ``_compact_manifest_<run>.json``
    records {bucket, retired files, new file} BEFORE anything becomes
    visible, then new-file rename → retired-file deletes → manifest
    delete.  ``_recover_selective`` (run automatically at entry) rolls
    an interrupted cycle forward (new file visible: finish the
    deletes) or back (not visible: drop the staging) — every crash
    point lands on exactly-the-old or exactly-the-new bucket contents.
    A footer-metadata row-count guard refuses the swap when staging
    does not hold exactly the fragmented buckets' rows.  Like
    ``compact_bucketed``, the visible-duplicate window between rename
    and deletes assumes no concurrent readers.

    Parameters default from the ``_bucket_spec.json`` sidecar.
    Returns ``{bucket_id: file_count_before}`` for compacted buckets
    (empty dict = nothing fragmented enough)."""
    import re
    import shutil
    import uuid

    from pyspark.sql import functions as F

    spec = read_bucket_spec(path)
    if spec is not None:
        # same contract as register_bucketed/compact_bucketed: the
        # sidecar wins; contradicting explicit params raise
        for name, given in (("key", key), ("buckets", buckets),
                            ("sort", sort)):
            if given is not None and given != spec[name]:
                raise ValueError(
                    f"compact_buckets_selective: {name}={given!r} "
                    f"contradicts _bucket_spec.json ({name}="
                    f"{spec[name]!r} at {path}) — compacting with "
                    "wrong bucketing would corrupt the layout"
                )
        key = spec["key"] if key is None else key
        buckets = spec["buckets"] if buckets is None else buckets
        sort = spec["sort"] if sort is None else sort
    if key is None or buckets is None:
        raise ValueError(
            "compact_buckets_selective: no _bucket_spec.json at "
            f"{path} — pass key= and buckets= explicitly"
        )
    sort = True if sort is None else sort
    _recover_selective(path, spark=spark, table=table)

    pat = re.compile(r"_(\d{5})\.")
    by_bucket: dict[int, list[str]] = {}
    for f in os.listdir(path):
        if not (f.startswith("part-") and f.endswith(".parquet")):
            continue
        m = pat.search(f)
        if m:
            by_bucket.setdefault(int(m.group(1)), []).append(f)
    targets = {
        b: sorted(fs) for b, fs in by_bucket.items()
        if len(fs) >= min_files
    }
    if not targets:
        return {}

    # ---- one parallel rewrite of ALL fragmented buckets
    run = uuid.uuid4().hex[:8]
    stage_dir = os.path.join(path, f".compact_stage_{run}")
    tmp_table = f"{table}_selcompact_{run}"
    frag_files = [
        os.path.join(path, f) for fs in targets.values() for f in fs
    ]
    df = spark.read.parquet(*frag_files).repartition(
        buckets, F.col(key)
    )
    w = df.write.bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.option("path", stage_dir).mode("overwrite").saveAsTable(tmp_table)
    spark.sql(f"DROP TABLE {tmp_table}")  # external: files stay

    # A bucket may stage MORE than one file (e.g. the session has
    # spark.sql.files.maxRecordsPerFile set and the bucket's rows
    # split into c000/c001) — collect per-bucket LISTS; treating the
    # mapping as one-file-per-bucket here silently dropped the extra
    # files (r12 data-loss bug, fixed r13)
    staged: dict[int, list[str]] = {}
    for f in os.listdir(stage_dir):
        if f.startswith("part-") and f.endswith(".parquet"):
            m = pat.search(f)
            if m:
                staged.setdefault(int(m.group(1)), []).append(f)
    staged = {b: sorted(fs) for b, fs in staged.items()}
    # per-bucket row guard (stronger than the old aggregate total,
    # which could not see rows migrating between buckets)
    if set(staged) != set(targets) or any(
        _footer_rows_files(stage_dir, staged[b])
        != _footer_rows_files(path, targets[b])
        for b in targets
    ):
        shutil.rmtree(stage_dir, ignore_errors=True)
        raise RuntimeError(
            "compact_buckets_selective: staging rewrite does not "
            f"match the fragmented buckets (staged {sorted(staged)} "
            f"vs targets {sorted(targets)}, or per-bucket row counts "
            "differ) — refusing to swap"
        )

    # ---- per-bucket manifest swap (tiny, file-ops only)
    done: dict[int, int] = {}
    for bid, fs in sorted(targets.items()):
        newnames = []
        for i, sf in enumerate(staged[bid]):
            nn = (
                f"part-{bid:05d}-compact{run}_{bid:05d}"
                f".c{i:03d}.snappy.parquet"
            )
            # park invisibly BEFORE the manifest exists: a crash here
            # leaves only dot-prefixed strays (rolled back at next
            # entry), nothing visible changed
            os.replace(
                os.path.join(stage_dir, sf),
                os.path.join(path, f".{nn}.inprogress"),
            )
            newnames.append(nn)
        # the write-ahead record: once this exists, recovery can
        # always finish or undo the swap below
        manifest = os.path.join(path, f"_compact_manifest_{run}_{bid}.json")
        mtmp = manifest + ".tmp"
        with open(mtmp, "w") as fh:
            json.dump({"bucket": bid, "retired": fs, "new": newnames}, fh)
        os.replace(mtmp, manifest)
        for nn in newnames:  # become visible
            os.rename(
                os.path.join(path, f".{nn}.inprogress"),
                os.path.join(path, nn),
            )
        for f in fs:
            os.remove(os.path.join(path, f))
        os.remove(manifest)
        done[bid] = len(fs)
    shutil.rmtree(stage_dir, ignore_errors=True)

    spark.catalog.refreshByPath(path)
    if spark.catalog.tableExists(table):
        spark.catalog.refreshTable(table)
    return done


def _footer_rows_files(path: str, files: list[str]) -> int:
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
        for f in files
    )


def bucket_fragmentation(spark, path: str) -> DataFrame:
    """Per-bucket maintenance signal for a bucketed directory: file
    count, total bytes, and footer row count per bucket id — the input
    to the "compact now or later?" decision that
    ``compact_buckets_selective`` acts on.  Directory metadata + file
    footers only: no Spark job, no data read; the returned frame is a
    tiny local DataFrame (≤ buckets rows).  A bucketed table is
    healthy at 1 file/bucket; the sorted-scan plan contract degrades
    the moment any bucket holds 2."""
    import re

    import pyarrow.parquet as pq

    pat = re.compile(r"_(\d{5})\.")
    acc: dict[int, list[int]] = {}
    for f in sorted(os.listdir(path)):
        if not (f.startswith("part-") and f.endswith(".parquet")):
            continue
        m = pat.search(f)
        if not m:
            continue
        bid = int(m.group(1))
        full = os.path.join(path, f)
        n_files, n_bytes, n_rows = acc.setdefault(bid, [0, 0, 0])
        acc[bid] = [
            n_files + 1,
            n_bytes + os.path.getsize(full),
            n_rows + pq.ParquetFile(full).metadata.num_rows,
        ]
    rows = [
        (b, v[0], v[1], v[2], v[0] > 1) for b, v in sorted(acc.items())
    ]
    return spark.createDataFrame(
        rows or [(None, 0, 0, 0, False)][:0],
        "bucket_id int, n_files int, n_bytes bigint, n_rows bigint, "
        "fragmented boolean",
    )


def _recover_selective(
    path: str, spark=None, table: str | None = None
) -> None:
    """Finish or undo an interrupted ``compact_buckets_selective``
    cycle.  Per leftover manifest (``new`` may be a list — a bucket
    can stage several files under ``maxRecordsPerFile`` — or a bare
    string from a pre-r13 manifest):

    * roll FORWARD when every new file became visible (the retired
      delete phase only starts after the last rename, so this is
      exactly the committed states): delete the remaining retired
      files;
    * roll BACK otherwise (swap not fully visible ⇒ no retired file
      was deleted yet): remove the partially-visible new files and
      their invisible staging twins — the originals carry the data.

    Stray staging artifacts without a manifest are rolled back —
    nothing of theirs was ever visible.  When ``spark``/``table`` are
    given, stray ``<table>_selcompact_*`` catalog entries from a crash
    between ``saveAsTable`` and ``DROP`` are dropped too (files were
    already recovered above; the catalog name was the one leak)."""
    import glob as _glob
    import shutil

    if spark is not None and table is not None:
        for t in spark.catalog.listTables():
            if t.name.startswith(f"{table}_selcompact_"):
                spark.sql(f"DROP TABLE IF EXISTS {t.name}")
    if not os.path.isdir(path):
        return
    for mpath in sorted(
        _glob.glob(os.path.join(path, "_compact_manifest_*.json"))
    ):
        with open(mpath) as fh:
            m = json.load(fh)
        news = m["new"] if isinstance(m["new"], list) else [m["new"]]
        visible = [
            n for n in news if os.path.exists(os.path.join(path, n))
        ]
        if len(visible) == len(news):
            # FORWARD: the swap committed; clear the retired set
            for f in m["retired"]:
                p = os.path.join(path, f)
                if os.path.exists(p):
                    os.remove(p)
        else:
            # BACK: originals all intact; drop whatever of the new
            # generation leaked into visibility plus the parked rest
            for n in news:
                for p in (
                    os.path.join(path, n),
                    os.path.join(path, f".{n}.inprogress"),
                ):
                    if os.path.exists(p):
                        os.remove(p)
        os.remove(mpath)
    for stray in _glob.glob(os.path.join(path, ".compact_stage_*")):
        shutil.rmtree(stray, ignore_errors=True)
    for stray in _glob.glob(os.path.join(path, ".part-*.inprogress")):
        os.remove(stray)
    for stray in _glob.glob(
        os.path.join(path, "_compact_manifest_*.json.tmp")
    ):
        os.remove(stray)


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
