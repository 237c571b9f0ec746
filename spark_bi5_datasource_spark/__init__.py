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

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

__version__ = "0.1.0"

_shipped_sessions: set[int] = set()


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers
    regardless of the driver's cwd/PYTHONPATH.

    Worker-executed code (the bi5 reader instance, mapInPandas
    closures) is pickled **by module reference**, so workers must be
    able to ``import spark_bi5_datasource_spark``.  Inside the repo
    that works via cwd; from anywhere else it doesn't.  Shipping a
    zip via ``addPyFile`` covers local and cluster mode alike (a real
    deployment would install the wheel; this keeps the repo
    self-contained).
    """
    key = id(spark)
    if key in _shipped_sessions:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"spark_bi5_datasource_spark_{__version__}.zip"
    )
    if not os.path.exists(zpath):
        tmp = zpath + f".{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for dirpath, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(dirpath, fn)
                        z.write(full, os.path.relpath(full, root))
        os.replace(tmp, zpath)
    spark.sparkContext.addPyFile(zpath)
    _shipped_sessions.add(key)


def register(spark: SparkSession) -> None:
    """Register all custom data sources on a session (the Python
    DataSource analogue of the reference's META-INF ServiceLoader
    registration)."""
    from .sources.bi5_datasource import Bi5DataSource

    ship_package(spark)
    # Bi5Reader implements pushFilters() (scan-level partition pruning);
    # Spark refuses to plan such a reader unless this conf is on.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(Bi5DataSource)
