"""Property tests for round-8 additions: the as-of join tolerance
bound is pinned against pandas ``merge_asof(tolerance=...)`` — the
semantics the operator docstring promises (match older than the
window -> nulled, row kept)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

tol_st = st.tuples(
    st.lists(  # left: day offsets
        st.integers(min_value=0, max_value=100), min_size=1, max_size=15
    ),
    st.lists(  # right: day offsets (also the carried value)
        st.integers(min_value=0, max_value=100), min_size=1, max_size=15
    ),
    st.integers(min_value=1, max_value=20),  # tolerance, days
)


class TestAsofToleranceProperties:
    @given(tol_st)
    @settings(max_examples=10, deadline=None)
    def test_matches_pandas_merge_asof(self, spark, data):
        from spark_bi5_datasource_spark.operators import asof_join

        lts, rts, tol = data
        rts = sorted(set(rts))
        base = dt.datetime(2024, 1, 1)
        left = spark.createDataFrame(
            [(i, base + dt.timedelta(days=t)) for i, t in enumerate(lts)],
            "lid long, t timestamp",
        )
        right = spark.createDataFrame(
            [(base + dt.timedelta(days=t), t) for t in rts],
            "t timestamp, rv long",
        )
        out = {
            r["lid"]: r["rv"]
            for r in asof_join(
                left, right, on="t", tolerance=f"{tol} DAY"
            ).collect()
        }

        lp = pd.DataFrame(
            {
                "lid": range(len(lts)),
                "t": [base + dt.timedelta(days=t) for t in lts],
            }
        ).sort_values("t")
        rp = pd.DataFrame(
            {
                "t": [base + dt.timedelta(days=t) for t in rts],
                "rv": rts,
            }
        )
        m = pd.merge_asof(lp, rp, on="t", tolerance=pd.Timedelta(days=tol))
        assert len(out) == len(lts)
        for _, row in m.iterrows():
            exp = None if pd.isna(row["rv"]) else int(row["rv"])
            assert out[int(row["lid"])] == exp, (lts, rts, tol)

    def test_unbounded_vs_bounded_disagree_only_on_stale(self, spark):
        from spark_bi5_datasource_spark.operators import asof_join

        base = dt.datetime(2024, 1, 1)
        left = spark.createDataFrame(
            [(0, base + dt.timedelta(days=2)), (1, base + dt.timedelta(days=40))],
            "lid long, t timestamp",
        )
        right = spark.createDataFrame(
            [(base, 7)], "t timestamp, rv long"
        )
        bounded = {
            r["lid"]: r["rv"]
            for r in asof_join(
                left, right, on="t", tolerance="30 DAY"
            ).collect()
        }
        # lid 0 is 2 days after the match (inside), lid 1 is 40 days
        # after (stale -> nulled, row kept)
        assert bounded == {0: 7, 1: None}


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
