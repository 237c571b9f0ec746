"""Property tests for the duplicate-pathology collapses.

Every near-dup operator collapses exact duplicates (identical texts /
hashes / vectors) to one representative before its quadratic-ish join
and expands pairs back afterwards — the optimization that keeps
crawl-shaped corpora (heavy exact replication) from blowing up bucket
sizes.  These tests pin the equivalence claims on random corpora with
random duplication factors, against oracles computed independently in
plain Python:

* ``ngram_jaccard_pairs``  — vs the exact all-pairs shingle-set
  Jaccard (full-op oracle: the collapse must be invisible).
* ``simhash_pairs``        — vs all pairs at hamming ≤ 3 of the
  collected per-doc hashes (pigeonhole over 4×16-bit chunks makes the
  banded join exact at ≤ 3, so the oracle is total).
* ``cosine_pairs``         — expansion consistency: the full-corpus
  output must equal the distinct-corpus output expanded through the
  duplicate groups in Python (identical vectors ⇒ identical
  signatures, so collapse+expand == the uncollapsed join).

Spark jobs per example are real; example counts are kept small.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel"]

# a corpus: list of (text, duplication_factor)
corpus_st = st.lists(
    st.tuples(
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(" ".join),
        st.integers(1, 3),
    ),
    min_size=1,
    max_size=12,
)


def _expand(corpus):
    """[(text, dup)] → [(doc_id, text)] with ids interleaved so
    duplicate groups are never contiguous id runs."""
    rows = []
    i = 0
    for text, dup in corpus:
        for _ in range(dup):
            rows.append((i, text))
            i += 7  # stride: group members far apart in id space
    return rows


def _shingles(text: str, n: int = 3) -> frozenset:
    tk = text.split(" ")
    if len(tk) < n:
        return frozenset([" ".join(tk)])
    return frozenset(" ".join(tk[i : i + n]) for i in range(len(tk) - n + 1))


class TestNgramJaccardCollapse:
    @given(corpus_st)
    @settings(max_examples=8, deadline=None)
    def test_matches_python_all_pairs(self, spark, corpus):
        from spark_bi5_datasource_spark.operators import ngram_jaccard_pairs

        rows = _expand(corpus)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in ngram_jaccard_pairs(
                df, "doc_id", "text", n=3, threshold=0.3
            ).collect()
        }
        expect = {}
        for i, (ida, ta) in enumerate(rows):
            for idb, tb in rows[i + 1 :]:
                sa, sb = _shingles(ta), _shingles(tb)
                j = len(sa & sb) / len(sa | sb)
                if j >= 0.3:
                    expect[(min(ida, idb), max(ida, idb))] = j
        assert set(got) == set(expect)
        for k, v in expect.items():
            assert math.isclose(got[k], v, rel_tol=0, abs_tol=1e-12), (k, got[k], v)


class TestSimhashCollapse:
    @given(corpus_st)
    @settings(max_examples=8, deadline=None)
    def test_matches_python_hamming_pairs(self, spark, corpus):
        from spark_bi5_datasource_spark.operators import simhash, simhash_pairs

        rows = _expand(corpus)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        hashed = simhash(df, "text")
        hs = {r.doc_id: r.simhash for r in hashed.collect()}
        got = {
            (r.id_a, r.id_b): r.hamming
            for r in simhash_pairs(hashed, "doc_id", max_hamming=3).collect()
        }
        ids = sorted(hs)
        expect = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                d = bin((hs[a] ^ hs[b]) & (2**64 - 1)).count("1")
                if d <= 3:  # pigeonhole over 4 chunks: banding is exact here
                    expect[(a, b)] = d
        assert got == expect


vec_corpus_st = st.lists(
    st.tuples(
        st.lists(
            st.integers(-3, 3).map(float), min_size=4, max_size=4
        ),
        st.integers(1, 3),
    ),
    min_size=1,
    max_size=10,
)


class TestCosinePairsCollapse:
    @given(vec_corpus_st)
    @settings(max_examples=8, deadline=None)
    def test_full_equals_distinct_expanded(self, spark, corpus):
        """cosine_pairs(full corpus) == python-expand(cosine_pairs(one
        representative per distinct vector)) — the collapse+expansion
        must be invisible relative to running on distinct vectors."""
        from spark_bi5_datasource_spark.operators import cosine_pairs

        rows = _expand([(tuple(v), d) for v, d in corpus])
        df = spark.createDataFrame(
            [(i, list(v)) for i, v in rows], "vec_id long, embedding array<double>"
        )
        kw = dict(threshold=0.5, dim=4, n_planes=3, n_bands=4, seed=7)
        full = {
            (r.id_a, r.id_b): r.cosine for r in cosine_pairs(df, **kw).collect()
        }

        groups: dict[tuple, list[int]] = {}
        for i, v in rows:
            groups.setdefault(v, []).append(i)
        reps = {v: min(ids) for v, ids in groups.items()}
        rep_df = spark.createDataFrame(
            [(rid, list(v)) for v, rid in reps.items()],
            "vec_id long, embedding array<double>",
        )
        rep_pairs = {
            (r.id_a, r.id_b): r.cosine
            for r in cosine_pairs(rep_df, **kw).collect()
        }
        rep_to_members = {reps[v]: ids for v, ids in groups.items()}
        expect: dict[tuple, float] = {}
        for (ra, rb), cos in rep_pairs.items():
            for ia in rep_to_members[ra]:
                for ib in rep_to_members[rb]:
                    expect[(min(ia, ib), max(ia, ib))] = cos
        # within-group pairs: cosine(v, v) ≥ threshold unless the norm
        # is zero (zero vectors are dropped); always 1.0 after rounding
        for v, ids in groups.items():
            if len(ids) > 1 and any(x != 0.0 for x in v):
                for i, ia in enumerate(ids):
                    for ib in ids[i + 1 :]:
                        expect[(min(ia, ib), max(ia, ib))] = 1.0
        assert set(full) == set(expect)
        for k in expect:
            assert math.isclose(full[k], expect[k], abs_tol=1e-6), (
                k,
                full[k],
                expect[k],
            )


class TestFuzzyJoinProperties:
    """Hypothesis: the blocked q-gram fuzzy join equals the naive
    cross-join + levenshtein baseline on random corpora with random
    duplication."""

    @given(
        st.lists(
            st.text(alphabet="abcde ", min_size=1, max_size=14),
            min_size=2,
            max_size=14,
        ),
        st.integers(min_value=1, max_value=2),
    )
    @settings(max_examples=10, deadline=None)
    def test_blocked_equals_naive(self, strings, k):
        from spark_bi5_datasource_spark.operators.fuzzy_join import (
            edit_distance_join,
        )

        spark = self.spark
        rows = [(i, s) for i, s in enumerate(strings)]
        df = spark.createDataFrame(rows, "pid long, name string")
        got = {
            (r.id_a, r.id_b, r.dist)
            for r in edit_distance_join(df, "pid", "name", k=k).collect()
        }
        df.createOrReplaceTempView("fzprop")
        expect = {
            (r.id_a, r.id_b, r.dist)
            for r in spark.sql(
                f"""
                SELECT a.pid AS id_a, b.pid AS id_b,
                       levenshtein(a.name, b.name) AS dist
                FROM fzprop a JOIN fzprop b ON a.pid < b.pid
                WHERE levenshtein(a.name, b.name) BETWEEN 1 AND {k}
                """
            ).collect()
        }
        assert got == expect

    @pytest.fixture(autouse=True)
    def _bind_spark(self, spark):
        self.spark = spark
