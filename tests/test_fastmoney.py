"""The spark_fast_sql rewrite must transform exactly the
``CAST(round(E) AS BIGINT)`` idiom — nothing else — and the half-adjust
it emits must agree with round-half-away-from-zero on the money domain
(the value contract the 168-query oracle run pins end-to-end)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from spark_bi5_datasource_spark.plans.fastmoney import (
    HALF_ADJUST_CENTS,
    spark_fast_sql,
)


def test_rewrites_the_idiom():
    got = spark_fast_sql(
        "sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000)"
        " AS BIGINT))"
    )
    assert "round(" not in got
    assert got.count("l_extendedprice * (1 - l_discount) * 1000000") == 2
    assert "CASE WHEN" in got and "AS BIGINT)" in got


def test_leaves_non_idiom_rounds_alone():
    for sql in (
        "round(x, 6) AS y",                       # two-arg display round
        "round(CAST(sq AS DOUBLE) / n) / 10000",  # bare round, no cast
        "CAST(round(x) AS DOUBLE)",               # different cast target
        "CAST(round(a, 2) AS BIGINT)",            # two-arg inside cast
    ):
        assert spark_fast_sql(sql) == sql


def test_nested_and_multiple_occurrences():
    sql = (
        "sum(CAST(round(a) AS BIGINT) - CAST(round(b * 2) AS BIGINT)),"
        " (CAST(round(value * 100) AS BIGINT) % 3600 + 60)"
    )
    got = spark_fast_sql(sql)
    assert "round(" not in got
    assert got.count("CASE WHEN") == 3


def test_idiom_inside_idiom_reaches_fixpoint():
    inner = "CAST(round(x) AS BIGINT)"
    sql = f"CAST(round({inner} / 7) AS BIGINT)"
    got = spark_fast_sql(sql)
    assert "round(" not in got


@given(st.integers(-10_000_000, 10_000_000), st.integers(0, 999_999))
@settings(max_examples=300, deadline=None)
def test_half_adjust_matches_round_half_away(units, micros):
    """cast-truncate(x*m ± 0.5) — what the emitted SQL computes —
    equals C-style round (half away from zero, DuckDB's round) on the
    same double, across both signs."""
    x = units + (micros / 1_000_000.0 if units >= 0 else -micros / 1_000_000.0)
    scaled = x * 1_000_000
    # the emitted expression: truncate-toward-zero of the half-adjusted value
    got = math.trunc(scaled + (0.5 if x >= 0 else -0.5))
    # reference C round: floor(v+0.5) for v>=0, ceil(v-0.5) for v<0
    want = (
        math.floor(scaled + 0.5) if scaled >= 0 else math.ceil(scaled - 0.5)
    )
    assert got == want


def test_half_adjust_template_shape():
    e = HALF_ADJUST_CENTS.format(x="value", m=100)
    assert e == (
        "CAST((value) * 100 + CASE WHEN (value) >= 0 THEN 0.5D"
        " ELSE -0.5D END AS BIGINT)"
    )
