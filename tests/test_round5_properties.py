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


edges_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    ),
    min_size=1,
    max_size=25,
)


class TestBfsProperties:
    @given(edges_st, st.integers(min_value=0, max_value=12),
           st.sampled_from([2, 4, 8]))
    @settings(max_examples=8, deadline=None)
    def test_matches_reference_bfs(self, spark, edges, source, max_depth):
        """Frontier-expansion depths == a pure-Python BFS on the same
        (undirected) graph, including unreachable-node absence and the
        depth cap."""
        from collections import deque

        from spark_bi5_datasource_spark.operators.bfs import bfs_depths

        adj: dict[int, set] = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        expect = {source: 0}
        dq = deque([source])
        while dq:
            n = dq.popleft()
            if expect[n] >= max_depth:
                continue
            for m in adj.get(n, ()):  # noqa: B909
                if m not in expect:
                    expect[m] = expect[n] + 1
                    dq.append(m)

        e = spark.createDataFrame(edges, "src long, dst long")
        s = spark.createDataFrame([(source,)], "node long")
        got = {
            r.node: r.depth
            for r in bfs_depths(e, s, max_depth=max_depth).collect()
        }
        assert got == expect


mv_st = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c", "d"]),
              st.integers(min_value=-50, max_value=50)),
    min_size=0, max_size=30,
)


class TestIvmProperties:
    @given(mv_st, mv_st, mv_st)
    @settings(max_examples=8, deadline=None)
    def test_maintained_equals_recompute(self, spark, base, inserts, retract_idx):
        """For any base set, insert batch, and retraction subset, the
        maintained view == the view recomputed from scratch over the
        post-delta row multiset."""
        from spark_bi5_datasource_spark.operators.ivm import delta_agg_apply
        import pyspark.sql.functions as F

        # retractions must be rows that exist: take them from base
        retracts = base[: len(retract_idx) % (len(base) + 1)]
        post = [r for r in base] + inserts
        for r in retracts:
            post.remove(r)

        def agg(rows):
            out: dict = {}
            for k, v in rows:
                c, t = out.get(k, (0, 0))
                out[k] = (c + 1, t + v)
            return {k: v for k, v in out.items() if v[0] != 0}

        if base:
            mv = spark.createDataFrame(
                [(k, c, t) for k, (c, t) in agg(base).items()],
                "k string, cnt long, total long",
            )
        else:
            mv = spark.createDataFrame([], "k string, cnt long, total long")
        delta_rows = [(k, v, 1) for k, v in inserts] + [
            (k, v, -1) for k, v in retracts
        ]
        if not delta_rows:
            delta_rows = [("zz", 0, 1)]  # keep schema inference happy
            post.append(("zz", 0))
        d = spark.createDataFrame(delta_rows, "k string, v long, _sign int")
        got = {
            r.k: (r.cnt, r.total)
            for r in delta_agg_apply(mv, d, keys=["k"], sums={"total": "v"}).collect()
        }
        assert got == agg(post)


rows_st = st.lists(
    st.tuples(st.integers(min_value=0, max_value=15),
              st.sampled_from(["a", "b", None]),
              st.integers(min_value=0, max_value=3)),
    min_size=0, max_size=20,
)


class TestTableDiffProperties:
    @given(rows_st, rows_st)
    @settings(max_examples=8, deadline=None)
    def test_matches_set_arithmetic(self, spark, a_rows, b_rows):
        """Diff classification == plain dict/set arithmetic over the
        same keyed snapshots (last write wins on duplicate keys in
        the generator, so dedup first)."""
        from spark_bi5_datasource_spark.operators.diff import table_diff

        a_map = {k: (v, w) for k, v, w in a_rows}
        b_map = {k: (v, w) for k, v, w in b_rows}
        expect = {}
        for k in a_map.keys() | b_map.keys():
            if k not in a_map:
                expect[k] = "added"
            elif k not in b_map:
                expect[k] = "removed"
            elif a_map[k] != b_map[k]:
                expect[k] = "changed"

        schema = "k long, v string, w long"
        a = spark.createDataFrame(
            [(k, v, w) for k, (v, w) in a_map.items()], schema
        )
        b = spark.createDataFrame(
            [(k, v, w) for k, (v, w) in b_map.items()], schema
        )
        got = {
            r.k: r.status for r in table_diff(a, b, keys=["k"]).collect()
        }
        assert got == expect


class TestPatternFunnelProperties:
    @given(st.lists(st.sampled_from("vcpse"), min_size=0, max_size=30))
    @settings(max_examples=8, deadline=None)
    def test_matches_python_regex(self, spark, chars):
        """Per-user funnel counting == Python's re on the same
        total-ordered sequence string."""
        import re

        import pyspark.sql.functions as F

        types = {"v": "view", "c": "click", "p": "purchase",
                 "s": "signup", "e": "error"}
        rows = [
            (i, f"2024-01-01 00:{i:02d}:00", 1, types[ch])
            for i, ch in enumerate(chars)
        ]
        expect = len(re.findall("vcp", "".join(chars)))

        if not rows:
            return
        e = spark.createDataFrame(
            rows, "event_id long, ts_s string, user_id long, event_type string"
        ).select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
            "user_id", "event_type",
        )
        seqs = e.groupBy("user_id").agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "ts", "event_id",
                                F.substring("event_type", 1, 1).alias("ch"),
                            )
                        )
                    ),
                    lambda s: s.ch,
                ),
            ).alias("seq")
        )
        got = seqs.select(
            F.regexp_count("seq", F.lit("vcp")).alias("n")
        ).collect()[0].n
        assert got == expect
