"""Hypothesis properties for the round-6-session additions: the Arrow
repetition kernel must equal a pure-Python reference on arbitrary
text (empty docs, 1-2-token docs, punctuation runs, repeats); the
streak operator must equal a brute-force gaps-and-islands fold; the
nearest as-of direction must pick the true minimum-distance match
with ties to the earlier right row.
"""

from __future__ import annotations

import datetime as dt
import re
from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

pytestmark = pytest.mark.usefixtures("spark")


# ------------------------------------------------ repetition kernel

# small alphabet + separators so repeats actually occur
text_st = st.lists(
    st.text(alphabet="ab .!x2", min_size=0, max_size=40),
    min_size=1,
    max_size=12,
)


def _ref_repetition(text: str):
    toks = [t for t in re.split(r"[^a-z]+", text.lower()) if t]
    n = len(toks)
    bgs = Counter(zip(toks, toks[1:]))
    tgs = Counter(zip(toks, toks[1:], toks[2:]))
    bg_mx = max(bgs.values()) if bgs else 0
    tg_dup = sum(c for c in tgs.values() if c >= 2)
    return n, bg_mx, tg_dup


class TestRepetitionKernelProperties:
    @given(text_st)
    @settings(max_examples=10, deadline=None)
    def test_matches_python_reference(self, spark, texts):
        from spark_bi5_datasource_spark.functions.text import (
            repetition_counts_arrow,
        )

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["n_tokens"], r["bg_mx"], r["tg_dup"])
            for r in repetition_counts_arrow(df).collect()
        }
        assert set(got) == set(range(len(texts)))
        for i, t in enumerate(texts):
            assert got[i] == _ref_repetition(t), (i, t)


# ------------------------------------------------ streak operator

days_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.integers(min_value=0, max_value=40),  # day offset
    ),
    min_size=1,
    max_size=60,
)


def _ref_streaks(pairs):
    byu = {}
    for u, d in pairs:
        byu.setdefault(u, set()).add(d)
    out = {}
    for u, ds in byu.items():
        ds = sorted(ds)
        runs = []
        cur = 1
        for a, b in zip(ds, ds[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        out[u] = (max(runs), len(runs), len(ds))
    return out


class TestStreakProperties:
    @given(days_st)
    @settings(max_examples=10, deadline=None)
    def test_matches_python_reference(self, spark, pairs):
        from spark_bi5_datasource_spark.operators.streaks import user_streaks

        base = dt.datetime(2024, 1, 1)
        rows = [
            (u, base + dt.timedelta(days=d, hours=u % 3)) for u, d in pairs
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {
            r["user_id"]: (r["max_streak"], r["n_streaks"], r["active_days"])
            for r in user_streaks(df).collect()
        }
        assert got == _ref_streaks(pairs)


# ------------------------------------------------ nearest as-of

asof_st = st.tuples(
    st.lists(  # left: (id, t)
        st.integers(min_value=0, max_value=100), min_size=1, max_size=15
    ),
    st.lists(  # right: t values
        st.integers(min_value=0, max_value=100), min_size=0, max_size=15
    ),
)


class TestNearestAsofProperties:
    @given(asof_st)
    @settings(max_examples=10, deadline=None)
    def test_minimum_distance_tie_to_earlier(self, spark, data):
        from spark_bi5_datasource_spark.operators import asof_join

        lts, rts = data
        rts = sorted(set(rts))
        left = spark.createDataFrame(
            [(i, t) for i, t in enumerate(lts)], "lid long, t long"
        )
        right = spark.createDataFrame(
            [(t, t) for t in rts], "t long, rt long"
        )
        out = {
            r["lid"]: r["rt"]
            for r in asof_join(
                left, right, on="t", direction="nearest"
            ).collect()
        }
        for i, t in enumerate(lts):
            if not rts:
                assert out[i] is None
                continue
            best = min(rts, key=lambda r: (abs(r - t), r))
            assert out[i] == best, (t, rts)
