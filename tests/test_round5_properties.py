"""Hypothesis properties for the round-5 operators: training-shard
assignment must be a stable partition of the id set; the deterministic
mode composition must equal a reference Python mode with the same
tie-break; the exact-moment corr/cov assembly must match NumPy.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

pytestmark = pytest.mark.usefixtures("spark")

ids_st = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60, unique=True
)


class TestShardingProperties:
    @given(ids_st, st.sampled_from([1, 3, 8]), st.sampled_from(["", "s1"]))
    @settings(max_examples=8, deadline=None)
    def test_partition_and_stability(self, spark, ids, n, salt):
        from spark_bi5_datasource_spark.operators import assign_training_shards

        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        a = assign_training_shards(df, "doc_id", n, salt=salt).collect()
        # partition: every id exactly once, shard within range
        assert sorted(r.doc_id for r in a) == sorted(ids)
        assert all(0 <= r.shard < n for r in a)
        # stability: same inputs -> identical assignment
        b = assign_training_shards(df, "doc_id", n, salt=salt).collect()
        assert {(r.doc_id, r.shard, r.shuffle_key) for r in a} == {
            (r.doc_id, r.shard, r.shuffle_key) for r in b
        }


vals_st = st.lists(
    st.tuples(
        st.sampled_from(["A", "B"]), st.integers(min_value=0, max_value=9)
    ),
    min_size=1,
    max_size=50,
)


class TestModeProperties:
    @given(vals_st)
    @settings(max_examples=8, deadline=None)
    def test_mode_matches_reference(self, spark, pairs):
        from collections import Counter

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        df = spark.createDataFrame(pairs, "g string, v long")
        counts = df.groupBy("g", "v").agg(F.count("*").alias("c"))
        w = Window.partitionBy("g").orderBy(F.col("c").desc(), F.col("v").asc())
        got = {
            r.g: (r.v, r.c)
            for r in counts.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .collect()
        }
        for g in {p[0] for p in pairs}:
            cnt = Counter(v for gg, v in pairs if gg == g)
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            assert got[g] == best


arr_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),
        st.integers(min_value=1, max_value=10_000),
    ),
    min_size=3,
    max_size=60,
)


class TestCorrMomentProperties:
    @given(arr_st)
    @settings(max_examples=8, deadline=None)
    def test_corr_matches_numpy(self, spark, pts):
        """The DECIMAL-moment Pearson assembly must equal NumPy's
        corrcoef on integer data (both exact until the final double
        step)."""
        from pyspark.sql import functions as F

        xs = np.array([p[0] for p in pts], dtype=np.float64)
        ys = np.array([p[1] for p in pts], dtype=np.float64)
        if np.all(xs == xs[0]) or np.all(ys == ys[0]):
            return  # zero variance: corr undefined
        df = spark.createDataFrame(
            [(int(x), int(y)) for x, y in pts], "x long, y long"
        )
        d38 = "decimal(38,0)"
        m = df.agg(
            F.count("*").alias("n"),
            F.sum(F.col("x").cast(d38)).alias("sx"),
            F.sum(F.col("y").cast(d38)).alias("sy"),
            F.sum((F.col("x") * F.col("x")).cast(d38)).alias("sxx"),
            F.sum((F.col("y") * F.col("y")).cast(d38)).alias("syy"),
            F.sum((F.col("x") * F.col("y")).cast(d38)).alias("sxy"),
        ).collect()[0]
        n, sx, sy = float(m.n), float(m.sx), float(m.sy)
        sxx, syy, sxy = float(m.sxx), float(m.syy), float(m.sxy)
        got = (n * sxy - sx * sy) / np.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        want = np.corrcoef(xs, ys)[0, 1]
        assert got == pytest.approx(want, abs=1e-9)
