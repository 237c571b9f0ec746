"""Invariant tests for the round-9 ops, on the sf0.001 fixtures.

The per-query oracle hashes live in test_queries_oracle.py; these pin
the ALGEBRAIC contracts the docstrings promise — RSI bounds and flag
consistency, ATR band symmetry, drift-share accounting, the CUPED
mean-preservation identity, and the epoch-plan cap — the properties
that must survive any future reshaping of the plans."""

from __future__ import annotations

from fractions import Fraction

import pytest

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    import __spark_entry__ as entry_mod

    return entry_mod.queries()[name](spark, SF).collect()


class TestRsi:
    def test_bounds_and_flags(self, spark):
        rows = _rows(spark, "window_rsi_cutler")
        assert rows, "RSI needs >=14 days of history"
        for r in rows:
            assert 0 <= r["rsi_ppm"] <= 1_000_000
            tot = r["sum_gain"] + r["sum_loss"]
            if tot:
                frac = Fraction(r["sum_gain"], tot)
                assert r["overbought"] == (frac > Fraction(7, 10))
                assert r["oversold"] == (frac < Fraction(3, 10))
                # ppm is the floor of the exact ratio
                assert r["rsi_ppm"] == (r["sum_gain"] * 1_000_000) // tot


class TestAtrBands:
    def test_band_symmetry(self, spark):
        rows = _rows(spark, "window_atr_bands")
        assert rows
        for r in rows:
            assert r["atr_cents"] >= 0
            assert r["upper_cents"] - r["close_cents"] == 2 * r["atr_cents"]
            assert r["close_cents"] - r["lower_cents"] == 2 * r["atr_cents"]


class TestDistributionDrift:
    def test_share_accounting(self, spark):
        rows = _rows(spark, "dq_distribution_drift")
        summary = [r for r in rows if r["bucket"] == -1]
        buckets = [r for r in rows if r["bucket"] >= 0]
        assert len(summary) == 1 and buckets
        s = summary[0]
        assert s["n_a"] == sum(r["n_a"] for r in buckets)
        assert s["n_b"] == sum(r["n_b"] for r in buckets)
        assert s["drift_ppm"] == sum(r["drift_ppm"] for r in buckets)
        for r in buckets:
            assert 0 <= r["share_a_ppm"] <= 1_000_000
            assert r["drift_ppm"] == abs(r["share_a_ppm"] - r["share_b_ppm"])
        # floor'd ppm shares sum to at most exactly 1e6
        assert sum(r["share_a_ppm"] for r in buckets) <= 1_000_000


class TestCuped:
    def test_mean_preservation(self, spark):
        """CUPED shifts variant means but cannot move the pooled
        mean: sum_v n_v * (adj_v - raw_v) = -theta * sum_v n_v *
        (mean_x_v - mean_x) = 0."""
        rows = _rows(spark, "events_ab_cuped")
        assert len(rows) == 2
        shift = sum(r["n_users"] * (r["adj_mean_y"] - r["raw_mean_y"]) for r in rows)
        scale = sum(r["n_users"] * abs(r["raw_mean_y"]) for r in rows) or 1.0
        assert abs(shift) / scale < 1e-9

    def test_raw_mean_exact(self, spark):
        for r in _rows(spark, "events_ab_cuped"):
            assert r["raw_mean_y"] == pytest.approx(r["sum_y"] / r["n_users"])


class TestSnaive:
    def test_error_bounds(self, spark):
        rows = _rows(spark, "events_forecast_snaive")
        assert rows
        for r in rows:
            assert r["n_days"] > 0
            assert abs(r["bias"]) <= r["sum_abs_err"]
            assert r["wape_ppm"] >= 0


class TestEpochPlan:
    def test_cap_and_volume(self, spark):
        rows = _rows(spark, "corpus_epoch_plan")
        assert rows
        for r in rows:
            assert 0 < r["epochs_x1000"] <= 4000
            assert r["planned_chars"] == r["chars"] * r["epochs_x1000"] // 1000
        assert sum(r["weight_ppm"] for r in rows) <= 1_000_000


class TestFertility:
    def test_ratio_consistency(self, spark):
        rows = _rows(spark, "tok_fertility_by_lang")
        assert rows
        for r in rows:
            assert r["n_tokens"] >= r["n_docs"]  # every doc has >=1 token
            assert (
                r["chars_per_token_ppk"]
                == r["sum_chars"] * 1000 // r["n_tokens"]
            )
            assert (
                r["tokens_per_doc_ppk"] == r["n_tokens"] * 1000 // r["n_docs"]
            )
