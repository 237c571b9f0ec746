"""Invariant tests for the round-9 batch-2 ops.

``ngram_containment_pairs`` is pinned against a brute-force Python
shingle-set twin (every pair, both directions, floor ppm) and against
the direction-flip contract the duplicate collapse must honor: the
containment values are ASYMMETRIC, so when the least/greatest id
normalization swaps which duplicate-group supplies ``id_a``, the two
ppm columns must swap with it.  ``sim_mrl_prefix_recall`` is pinned on
its recall identity (per-query oracle hashes live in
test_queries_oracle.py).
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _shingles(text: str, n: int = 3) -> frozenset:
    tk = text.split(" ")
    if len(tk) < n:
        return frozenset({" ".join(tk)})
    return frozenset(" ".join(tk[i : i + n]) for i in range(len(tk) - n + 1))


@pytest.fixture(scope="module")
def contain_docs(spark):
    long = (
        "the quick brown fox jumps over the lazy dog while the band "
        "plays a slow waltz under the fading summer light"
    )
    inner = "fox jumps over the lazy dog while the band plays"
    rows = [
        (1, long),
        (2, inner),          # every shingle of 2 appears in 1
        (3, inner),          # exact dup of 2 — exercises the collapse
        (4, "totally unrelated text about compilers and register allocation"),
        (9, long),           # exact dup of 1
    ]
    return rows, spark.createDataFrame(rows, "doc_id int, text string")


class TestNgramContainment:
    def _run(self, df, threshold_ppm=500_000):
        from spark_bi5_datasource_spark.operators import ngram_containment_pairs

        return {
            (r.id_a, r.id_b): (r.cont_ab_ppm, r.cont_ba_ppm)
            for r in ngram_containment_pairs(
                df, "doc_id", "text", n=3, threshold_ppm=threshold_ppm
            ).collect()
        }

    def test_matches_bruteforce_all_pairs(self, spark, contain_docs):
        rows, df = contain_docs
        sh = {i: _shingles(t) for i, t in rows}
        want = {}
        ids = sorted(sh)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                inter = len(sh[a] & sh[b])
                c_ab = inter * 1_000_000 // len(sh[a])
                c_ba = inter * 1_000_000 // len(sh[b])
                if max(c_ab, c_ba) >= 500_000:
                    want[(a, b)] = (c_ab, c_ba)
        assert self._run(df) == want

    def test_asymmetry_and_flip(self, spark, contain_docs):
        rows, df = contain_docs
        got = self._run(df)
        # inner doc fully contained: cont(inner→long)=1e6, reverse < 1e6
        assert got[(1, 2)][1] == 1_000_000
        assert got[(1, 2)][0] < 1_000_000
        # duplicate of the inner doc inherits the SAME directional pair
        assert got[(1, 3)] == got[(1, 2)]
        # duplicate of the LONG doc sits on the id_a side of (9, ...)?
        # no — least/greatest puts 9 after 2 and 3, so the long doc is
        # now id_b and the directional values must be flipped
        assert got[(2, 9)] == (got[(1, 2)][1], got[(1, 2)][0])
        assert got[(3, 9)] == (got[(1, 2)][1], got[(1, 2)][0])
        # exact dups are mutual full containment
        assert got[(2, 3)] == (1_000_000, 1_000_000)
        assert got[(1, 9)] == (1_000_000, 1_000_000)

    def test_threshold_filters_on_larger_direction(self, spark, contain_docs):
        rows, df = contain_docs
        got = self._run(df, threshold_ppm=1_000_000)
        # only full containments survive a 1.0 threshold
        assert set(got) == {(1, 2), (1, 3), (2, 3), (1, 9), (2, 9), (3, 9)}
        for (a, b), (c_ab, c_ba) in got.items():
            assert max(c_ab, c_ba) == 1_000_000


class TestMrlPrefixRecall:
    def test_recall_identity(self, spark):
        import __spark_entry__ as entry_mod

        rows = entry_mod.queries()["sim_mrl_prefix_recall"](spark, SF).collect()
        assert len(rows) == 10
        assert sorted(r["query_id"] for r in rows) == list(range(10))
        for r in rows:
            assert 0 <= r["n_overlap"] <= 5
            assert r["recall_ppm"] == r["n_overlap"] * 1_000_000 // 5
