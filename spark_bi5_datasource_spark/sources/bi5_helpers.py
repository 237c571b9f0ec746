"""Convenience loader for bi5 trees (SURVEY §4: "a thin helper
load_bi5(spark, path, where=...) that prunes before constructing the
reader")."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["load_bi5"]


def load_bi5(
    spark: SparkSession,
    path: str,
    digits: int,
    january: int = 0,
    tickers: list[str] | str | None = None,
    start: str | None = None,
    end: str | None = None,
    partitioning: str = "file",
) -> DataFrame:
    """Read a bi5 tree with driver-side file pruning baked into the
    reader options (complementing the automatic pushFilters pruning
    that WHERE clauses trigger)."""
    r = (
        spark.read.format("bi5")
        .option("digits", digits)
        .option("january", january)
        .option("partitioning", partitioning)
    )
    if tickers:
        if not isinstance(tickers, str):
            tickers = ",".join(tickers)
        r = r.option("tickers", tickers)
    if start:
        r = r.option("start", start)
    if end:
        r = r.option("end", end)
    return r.load(path)
