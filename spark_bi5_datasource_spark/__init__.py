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
import threading
import zipfile

from pyspark.sql import SparkSession

__version__ = "0.1.0"

_ship_lock = threading.Lock()
_zip_path: str | None = None  # built once per process → never stale
_shipped_apps: set[str] = set()  # keyed by Spark applicationId


def _build_zip() -> str:
    """Zip the package source into a fresh private per-process temp
    dir (mkdtemp ⇒ mode 0700, unique): no stale cache across source
    edits, no cross-user /tmp sharing, no same-path write races."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    out_dir = tempfile.mkdtemp(prefix="spark_bi5_pkg_")
    zpath = os.path.join(out_dir, "spark_bi5_datasource_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    return zpath


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers
    regardless of the driver's cwd/PYTHONPATH.

    Worker-executed code (the bi5 reader instance, mapInPandas
    closures, the bi5_decode UDTF) is pickled **by module
    reference**, so workers must be able to
    ``import spark_bi5_datasource_spark``.  Inside the repo that
    works via cwd; from anywhere else it doesn't.  Shipping a zip via
    ``addPyFile`` covers local and cluster mode alike (a real
    deployment would install the wheel; this keeps the repo
    self-contained).
    """
    global _zip_path
    with _ship_lock:
        app_id = spark.sparkContext.applicationId
        if app_id in _shipped_apps:
            return
        if _zip_path is None:
            _zip_path = _build_zip()
        spark.sparkContext.addPyFile(_zip_path)
        _shipped_apps.add(app_id)


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
