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
