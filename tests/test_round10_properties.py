"""Invariant tests for the round-10 ops, on the sf0.001 fixtures.

Per-query oracle hashes live in test_queries_oracle.py; these pin the
ALGEBRAIC contracts the docstrings promise — oscillator bounds and the
%D mean identity, Donchian channel ordering and breakout definitions,
Benford share/deviation accounting against the pinned constants, the
Gini rank formula vs a Python recomputation, the χ² SRM identity, the
neighbor-Jaccard inclusion-exclusion bound, and TTR ratio identities."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    import __spark_entry__ as entry_mod

    return entry_mod.queries()[name](spark, SF).collect()


class TestStochastic:
    def test_bounds_and_d_mean(self, spark):
        rows = _rows(spark, "window_stochastic_osc")
        assert rows
        by_series = {}
        for r in rows:
            assert 0 <= r["k_ppm"] <= 1_000_000
            assert 0 <= r["d_ppm"] <= 1_000_000
            assert r["overbought"] == (r["k_ppm"] > 800_000)
            assert r["oversold"] == (r["k_ppm"] < 200_000)
            by_series.setdefault(r["event_type"], []).append(r)
        # %D of the i-th emitted row is the mean of k over rows that
        # include the two k values BEFORE the emission threshold, so
        # only check rows whose two predecessors were also emitted
        for series in by_series.values():
            series.sort(key=lambda r: r["day"])
            for i in range(2, len(series)):
                ks = [series[j]["k_ppm"] for j in (i - 2, i - 1, i)]
                assert series[i]["d_ppm"] == sum(ks) // 3


class TestDonchian:
    def test_channel_ordering(self, spark):
        rows = _rows(spark, "window_donchian_channels")
        assert rows
        by_series = {}
        for r in rows:
            assert r["lower_cents"] <= r["close_cents"] <= r["upper_cents"]
            assert (
                r["lower_cents"]
                <= r["mid_cents"]
                <= r["upper_cents"]
            )
            assert r["mid_cents"] == (r["upper_cents"] + r["lower_cents"]) // 2
            by_series.setdefault(r["event_type"], []).append(r)
        # from the second emitted row on, the lagged channel IS the
        # previous output row's channel — pin the flags against it
        for series in by_series.values():
            series.sort(key=lambda r: r["day"])
            for prev, cur in zip(series, series[1:]):
                assert cur["breakout_up"] == (
                    cur["close_cents"] > prev["upper_cents"]
                )
                assert cur["breakout_down"] == (
                    cur["close_cents"] < prev["lower_cents"]
                )


class TestBenford:
    def test_constants_and_accounting(self, spark):
        rows = _rows(spark, "dq_benford_first_digit")
        want = {
            d: math.floor(math.log10(1 + 1 / d) * 1_000_000)
            for d in range(1, 10)
        }
        digits = [r for r in rows if r["digit"] >= 1]
        summary = [r for r in rows if r["digit"] == -1]
        assert len(summary) == 1
        s = summary[0]
        for r in digits:
            assert r["benford_ppm"] == want[r["digit"]]
            assert r["dev_ppm"] == abs(r["share_ppm"] - r["benford_ppm"])
        assert s["n"] == sum(r["n"] for r in digits)
        assert s["dev_ppm"] == sum(r["dev_ppm"] for r in digits)
        # floor shares sum to <= 1e6 and within 9 ppm of it
        assert 1_000_000 - 9 <= s["share_ppm"] <= 1_000_000


class TestGini:
    def test_rank_formula_and_lorenz(self, spark):
        rows = sorted(_rows(spark, "corpus_source_gini"), key=lambda r: r["rank"])
        assert rows
        chars = [r["chars"] for r in rows]
        assert chars == sorted(chars)  # ascending Lorenz order
        n, t = len(rows), sum(chars)
        rx = sum(i * x for i, x in enumerate(chars, start=1))
        gini = (2 * rx - (n + 1) * t) * 1_000_000 // (n * t)
        cum = 0
        for r in rows:
            assert r["gini_ppm"] == gini >= 0
            cum += r["chars"]
            assert r["cum_share_ppm"] == cum * 1_000_000 // t
        assert rows[-1]["cum_share_ppm"] == 1_000_000


class TestSrm:
    def test_chi2_identity_and_marker(self, spark):
        rows = _rows(spark, "events_ab_srm_check")
        markers = [r for r in rows if str(r["day"]) == "1900-01-01"]
        dailies = [r for r in rows if str(r["day"]) != "1900-01-01"]
        assert len(markers) == 1 and dailies
        for r in rows:
            na, nb = r["n_a"], r["n_b"]
            assert r["chi2_milli"] == (na - nb) ** 2 * 1000 // (na + nb)
            assert r["srm"] == ((na - nb) ** 2 * 1000 > 3841 * (na + nb))
        # marker counts are distinct users, bounded by the day sums
        m = markers[0]
        assert m["n_a"] <= sum(r["n_a"] for r in dailies)
        assert m["n_b"] <= sum(r["n_b"] for r in dailies)


class TestNeighborJaccard:
    def test_bounds_and_inclusion_exclusion(self, spark):
        rows = _rows(spark, "graph_neighbor_jaccard")
        assert rows
        for r in rows:
            assert r["u"] < r["v"]
            # common excludes the endpoints, degrees include each other
            assert 1 <= r["common_nbrs"] <= min(r["deg_u"], r["deg_v"])
            union = r["deg_u"] + r["deg_v"] - r["common_nbrs"]
            assert r["jaccard_ppm"] == r["common_nbrs"] * 1_000_000 // union
            assert 0 < r["jaccard_ppm"] <= 1_000_000


class TestTtr:
    def test_ratio_identities(self, spark):
        rows = _rows(spark, "tok_ttr_by_source")
        assert rows
        for r in rows:
            assert 1 <= r["distinct_tokens"] <= r["total_tokens"]
            assert 0 <= r["hapax_tokens"] <= r["distinct_tokens"]
            assert (
                r["ttr_ppm"]
                == r["distinct_tokens"] * 1_000_000 // r["total_tokens"]
            )
            assert (
                r["hapax_share_ppm"]
                == r["hapax_tokens"] * 1_000_000 // r["distinct_tokens"]
            )


class TestPivotPoints:
    def test_level_ordering_and_reflection(self, spark):
        rows = _rows(spark, "window_pivot_points")
        assert rows
        for r in rows:
            p, r1, s1 = r["pivot_cents"], r["r1_cents"], r["s1_cents"]
            r2, s2 = r["r2_cents"], r["s2_cents"]
            # S2 <= S1 <= P <= R1 <= R2 (range and reflections nest);
            # the range extensions are symmetric about the pivot and
            # twice the reflection spread (R1-S1 = prevH-prevL)
            assert s2 <= s1 <= p <= r1 <= r2
            assert r2 + s2 == 2 * p
            assert r2 - s2 == 2 * (r1 - s1)


class TestOov:
    def test_share_identity_and_vocab_coverage(self, spark):
        rows = _rows(spark, "tok_oov_by_source")
        assert rows
        for r in rows:
            assert 0 <= r["oov_tokens"] <= r["total_tokens"]
            assert (
                r["oov_ppm"]
                == r["oov_tokens"] * 1_000_000 // r["total_tokens"]
            )
        # a 20-term closed vocabulary over a >20-term corpus must
        # leave some OOV mass somewhere
        assert any(r["oov_tokens"] > 0 for r in rows)


class TestDedupInflation:
    def test_accounting(self, spark):
        rows = _rows(spark, "corpus_dedup_inflation")
        assert rows
        for r in rows:
            assert r["distinct_texts"] >= 1
            assert r["n_docs"] >= r["distinct_texts"]
            assert r["dup_docs"] == r["n_docs"] - r["distinct_texts"]
            assert (
                r["dup_share_ppm"]
                == r["dup_docs"] * 1_000_000 // r["n_docs"]
            )
            assert (
                r["inflation_ppk"]
                == r["n_docs"] * 1000 // r["distinct_texts"]
            )
            assert r["inflation_ppk"] >= 1000


class TestDiffInDiff:
    def test_cells_and_did_identity(self, spark):
        rows = _rows(spark, "events_diff_in_diff")
        cells = {
            (r["variant"], r["period"]): r for r in rows if r["variant"] >= 0
        }
        summary = [r for r in rows if r["variant"] == -1]
        assert len(summary) == 1 and len(cells) == 4
        s = summary[0]
        assert s["period"] == "did"
        assert s["n"] == sum(c["n"] for c in cells.values())
        assert s["cents"] == sum(c["cents"] for c in cells.values())
        for c in cells.values():
            assert c["mean_mc"] == c["cents"] * 1000 // c["n"]
        want = (
            cells[(1, "post")]["mean_mc"] - cells[(1, "pre")]["mean_mc"]
        ) - (cells[(0, "post")]["mean_mc"] - cells[(0, "pre")]["mean_mc"])
        assert s["mean_mc"] == want
