"""Driver-gate simulation: run every __spark_entry__ query vs its DuckDB
oracle and report row/schema/value-hash matches per query.

Usage: python scripts/verify_oracle.py [only_query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01)
"""
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize: round floats, stringify, sort rows
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    rows = sorted(df.astype(str).itertuples(index=False, name=None))
    return hashlib.md5(repr(rows).encode()).hexdigest()


def main():
    only = set(sys.argv[1:])
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS FROM '{SF}/{t}.parquet'")

    failures = []
    for i, (name, fn) in enumerate(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF)
            spdf = sdf.toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"{i:3d} {name:32s} SPARK-ERROR {type(ex).__name__}: {ex}")
            continue
        if name not in os_:
            print(f"{i:3d} {name:32s} rows={len(spdf):6d} no_oracle           {time.time()-t0:5.1f}s")
            continue
        try:
            odf = con.sql(os_[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"{i:3d} {name:32s} ORACLE-ERROR {type(ex).__name__}: {ex}")
            continue
        rows_ok = len(spdf) == len(odf)
        schema_ok = sorted(spdf.columns) == sorted(odf.columns)
        hash_ok = rows_ok and schema_ok and canon(spdf) == canon(odf)
        status = "OK  " if hash_ok else "FAIL"
        if not hash_ok:
            failures.append(name)
        print(
            f"{i:3d} {name:32s} rows={len(spdf):6d}/{len(odf):6d} "
            f"r={int(rows_ok)} s={int(schema_ok)} h={int(hash_ok)} {status} {time.time()-t0:5.1f}s"
        )
        if not schema_ok:
            print(f"      spark cols: {sorted(spdf.columns)}")
            print(f"      oracle cols: {sorted(odf.columns)}")
    print(f"\n{'ALL GREEN' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
