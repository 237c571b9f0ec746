"""Query catalog: every implemented operator exposed as a named query
with (where expressible) a DuckDB oracle — the driver-contract surface
(__spark_entry__.py)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .llm_ops import LLM_OPS
from .relational import RELATIONAL

# name -> (fn, oracle_sql | None, in_bench)
CATALOG: dict[str, tuple] = {**RELATIONAL, **LLM_OPS}


def _utc(fn: Callable[[SparkSession, str], DataFrame]):
    """Pin the session timezone for catalog queries: timestamp values
    must agree with the (timezone-naive) DuckDB oracle regardless of
    the caller's session defaults.

    Session-mutation contract: the UTC ``timeZone`` conf is left set
    on the caller's session — timestamp expressions resolve their
    zone during analysis, but the query is *executed* later (by the
    driver / bench harness), so the conf must still read UTC then.
    The parquet ``inferTimestampNTZ`` toggle, by contrast, only
    matters while ``fn`` builds the DataFrame (parquet schema
    inference is eager at ``spark.read`` time), so it is restored
    before returning."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .. import ship_package

        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # fixture parquet may carry NTZ-flavored timestamps (no
        # isAdjustedToUTC); read them as TIMESTAMP so time arithmetic
        # (unix_micros etc.) resolves and values agree with the
        # timezone-naive DuckDB oracle under the UTC session
        ntz_conf = "spark.sql.parquet.inferTimestampNTZ.enabled"
        prior = spark.conf.get(ntz_conf, None)
        spark.conf.set(ntz_conf, "false")
        ship_package(spark)  # mapInPandas/UDF closures need the package on workers
        try:
            return fn(spark, sf_dir)
        finally:
            if prior is None:
                spark.conf.unset(ntz_conf)
            else:
                spark.conf.set(ntz_conf, prior)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _utc(fn) for name, (fn, _sql, _b) in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql, _b) in CATALOG.items() if sql is not None}


def bench_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql, b) in CATALOG.items() if b}
