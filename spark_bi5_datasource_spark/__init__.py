"""PySpark-native analytics engine with the capabilities of
svaningelgem/spark_bi5_datasource, rebuilt Spark-first.

Components:
    sources    — bi5 DataSource (batch + streaming) and helpers
    operators  — composed operators Spark lacks (as-of join, dedup,
                 similarity search, per-group top-k)
    functions  — domain column expressions (OHLC, text analysis, ...)
    plans      — the query catalog exported through __spark_entry__
    streaming  — Structured Streaming pipelines
"""

from __future__ import annotations

from pyspark.sql import SparkSession

__version__ = "0.1.0"


def register(spark: SparkSession) -> None:
    """Register all custom data sources on a session (the Python
    DataSource analogue of the reference's META-INF ServiceLoader
    registration)."""
    from .sources.bi5_datasource import Bi5DataSource

    # Bi5Reader implements pushFilters() (scan-level partition pruning);
    # Spark refuses to plan such a reader unless this conf is on.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(Bi5DataSource)
