"""Replicates the driver's correctness gate locally: every catalog
query runs on Spark and (when an oracle exists) on DuckDB over the
same parquet, compared by row count, column names, and
order-insensitive values — so CORRECTNESS_r{N} surprises surface
here first.  Runs at sf0.001 for speed (driver uses sf0.01)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from tests.conftest import TESTDATA_SF, has_testdata

pytestmark = pytest.mark.skipif(
    not has_testdata(), reason="driver testdata not present"
)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for tb in TABLES:
        path = os.path.join(TESTDATA_SF, f"{tb}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {tb} AS FROM '{path}'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _rowset(rows):
    normed = [tuple(_norm(v) for v in r) for r in rows]
    return sorted(normed, key=lambda r: tuple((v is None, str(v)) for v in r))


def _all_query_names():
    import __spark_entry__ as entry_mod

    return sorted(entry_mod.queries())


@pytest.mark.parametrize("name", _all_query_names())
def test_query_matches_oracle(spark, oracle, name):
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()[name]
    sdf = q(spark, TESTDATA_SF)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        # rows-only contract: must run and produce a stable schema
        assert isinstance(spark_rows, list)
        return

    ddf = oracle.sql(sql)
    duck_cols = [c for c in ddf.columns]
    duck_rows = ddf.fetchall()

    assert spark_cols == duck_cols, f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    s_sorted, d_sorted = _rowset(spark_rows), _rowset(duck_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_sorted, d_sorted)) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["r_name", "n_name", "revenue"]
