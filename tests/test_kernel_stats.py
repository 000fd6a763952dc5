"""Kernel parity: stats / rolling / higher-order / misc fixtures.

Golden values ported from the reference's own pytest suite
(reference: tests/test_stats.py, tests/test_rolling_stats.py,
tests/test_misc.py, tests/test_higherorder.py). Exact equality where
the reference is deterministic.
"""

import math

import numpy as np
import pytest

from chronoxtract_spark.kernel import higherorder, misc, rolling, stats


CANONICAL = np.array([1.0, 2.0, 2.0, 3.0, 4.0, 5.0])


class TestSummary:
    def test_canonical_fixture(self):
        # reference: tests/test_stats.py:5-20
        s = stats.time_series_summary(CANONICAL)
        assert s["mean"] == 2.8333333333333335
        assert s["median"] == 2.5
        assert s["mode"] == 2.0
        # bit-exact with the reference's raw-moment formula
        # (m2 - m1*m1, src/stats/mod.rs:46); the published fixture value
        # 1.8055555555555556 is numpy's two-pass result — the reference's
        # own test asserts with np.isclose (tests/test_stats.py:12)
        assert s["variance"] == 1.8055555555555554
        assert s["variance"] == pytest.approx(1.8055555555555556)
        assert s["std_dev"] == pytest.approx(1.343709624584882)
        assert s["skewness"] == pytest.approx(0.3053162697580514, rel=1e-9)
        assert s["kurtosis"] == pytest.approx(-1.151715976331361, rel=1e-9)
        assert s["min"] == 1.0
        assert s["max"] == 5.0
        assert s["range"] == 4.0
        assert s["sum"] == 17.0
        assert s["absolute_energy"] == 59.0

    def test_mean_median_mode(self):
        # reference: tests/test_stats.py:27-33
        x = np.array([1.0, 1.0, 2.0, 3.0, 4.0, 5.0])
        assert stats.mean(x) == 2.6666666666666665
        assert stats.median_and_quantiles(x)[0] == 2.5
        assert stats.mode(x) == 1.0

    def test_single_element(self):
        # reference: tests/test_stats.py:57-72
        s = stats.time_series_summary(np.array([5.0]))
        assert s["variance"] == 0.0
        assert s["std_dev"] == 0.0
        assert "skewness" not in s
        assert "kurtosis" not in s

    def test_constant_series(self):
        # reference: tests/test_stats.py:74-89
        s = stats.time_series_summary(np.array([3.0, 3.0, 3.0, 3.0]))
        assert s["variance"] == 0.0
        assert "skewness" not in s
        assert "kurtosis" not in s

    def test_nan_rejected(self):
        # reference: tests/test_stats.py:91-94
        with pytest.raises(ValueError):
            stats.time_series_summary(np.array([1.0, 2.0, np.nan, 3.0]))

    def test_empty_rejected(self):
        with pytest.raises(ValueError):
            stats.time_series_summary(np.array([]))

    def test_quantile_interpolation(self):
        # pos = q*(n-1) linear interpolation (src/stats/mod.rs:98-111)
        x = np.arange(1.0, 6.0)  # [1..5]
        qs = stats.quantiles(x)
        np.testing.assert_allclose(qs, [1.2, 2.0, 4.0, 4.8], atol=1e-15)

    def test_quantiles_match_numpy_linear(self):
        rng = np.random.default_rng(7)
        x = rng.normal(size=101)
        qs = stats.quantiles(x)
        expect = np.quantile(x, [0.05, 0.25, 0.75, 0.95])
        np.testing.assert_allclose(qs, expect, rtol=1e-12)


class TestRolling:
    def test_rolling_mean(self):
        # reference: tests/test_rolling_stats.py:5-10
        out = rolling.rolling_mean(np.array([1.0, 2, 3, 4, 5]), 3)
        np.testing.assert_allclose(out, [2.0, 3.0, 4.0], atol=1e-15)

    def test_rolling_variance(self):
        # reference: tests/test_rolling_stats.py:12-17
        out = rolling.rolling_variance(np.array([1.0, 2, 3, 4, 5]), 3)
        np.testing.assert_allclose(out, [2 / 3, 2 / 3, 2 / 3], atol=1e-15)

    def test_expanding_sum(self):
        # reference: tests/test_rolling_stats.py:19-23
        out = rolling.expanding_sum(np.array([1.0, 2, 3, 4, 5]))
        np.testing.assert_allclose(out, [1, 3, 6, 10, 15], atol=0)

    def test_ema(self):
        # reference: tests/test_rolling_stats.py:25-30
        out = rolling.exponential_moving_average(np.array([1.0, 2, 3, 4, 5]), 0.5)
        np.testing.assert_allclose(out, [1.0, 1.5, 2.25, 3.125, 4.0625], atol=0)

    def test_sliding_window_entropy(self):
        # reference: tests/test_rolling_stats.py:32-39
        out = rolling.sliding_window_entropy(
            np.array([1.0, 1, 1, 2, 2, 2]), 3, 2
        )
        np.testing.assert_allclose(
            out, [0.0, 0.91829583, 0.91829583, 0.0], atol=1e-8
        )

    def test_sliding_window_entropy_b3(self):
        # reference: tests/test_rolling_stats.py:74-80
        out = rolling.sliding_window_entropy(
            np.array([1.0, 1, 1, 2, 2, 2, 3, 3, 3]), 3, 3
        )
        np.testing.assert_allclose(
            out,
            [0.0, 0.91829583, 0.91829583, 0.0, 0.91829583, 0.91829583, 0.0],
            atol=1e-8,
        )

    def test_window_larger_than_series(self):
        # reference: tests/test_rolling_stats.py:48-59
        assert rolling.rolling_mean(np.array([1.0, 2.0]), 5).size == 0
        assert rolling.rolling_variance(np.array([1.0, 2.0]), 5).size == 0


class TestHigherOrder:
    def test_hjorth_activity(self):
        # reference: tests/test_higherorder.py:20-26
        assert higherorder.hjorth_activity(np.array([1.0, 2, 3, 4, 5])) == 2.0

    def test_hjorth_constant(self):
        # reference: tests/test_higherorder.py:45-53
        x = np.full(10, 5.0)
        assert higherorder.hjorth_activity(x) == 0.0
        assert higherorder.hjorth_mobility(x) == 0.0
        assert higherorder.hjorth_complexity(x) == 1.0

    def test_hjorth_sine(self):
        # reference: tests/test_higherorder.py:5-18
        x = np.sin(np.linspace(0, 4 * np.pi, 100))
        a, m, c = higherorder.hjorth_parameters(x)
        assert a > 0 and m > 0
        assert abs(c - 1.0) < 0.5

    def test_higher_moments_gaussian(self):
        # reference: tests/test_higherorder.py:84-103
        rng = np.random.RandomState(42)
        x = rng.normal(0, 1, 1000)
        m5, m6, m7, m8 = higherorder.higher_moments(x)
        assert 10 < m6 < 20
        assert 80 < m8 < 130

    def test_linear_moments_exact(self):
        x = np.array([1.0, 2, 3, 4, 5])
        # symmetric around mean 3 -> odd central moments are 0
        assert higherorder.central_moment(x, 5) == 0.0
        assert higherorder.central_moment(x, 7) == 0.0


class TestMisc:
    def test_fvar_canonical(self):
        # reference: tests/test_misc.py:5-21
        flux = np.array([100.0, 120, 110, 105, 95])
        err = np.ones(5)
        assert misc.fractional_variability(flux, err) == pytest.approx(
            0.090241183, abs=1e-5
        )
        assert misc.fractional_variability_error(flux, err) == pytest.approx(
            0.0042163702, abs=1e-4
        )

    def test_fvar_zero_flux(self):
        # reference: tests/test_misc.py:34-38
        assert math.isnan(
            misc.fractional_variability(np.zeros(3), np.ones(3))
        )

    def test_fvar_negative_rejected(self):
        # reference: tests/test_misc.py:40-44
        with pytest.raises(ValueError):
            misc.fractional_variability(
                np.array([-10.0, -20.0, -15.0]), np.ones(3)
            )

    def test_fvar_noise_dominated(self):
        flux = np.array([100.0, 100.001, 99.999, 100.0])
        err = np.full(4, 10.0)
        assert misc.fractional_variability(flux, err) == 0.0

    def test_rolling_fvar_shape(self):
        flux = np.array([100.0, 120, 110, 105, 95])
        err = np.ones(5)
        fv, fe = misc.rolling_fractional_variability(flux, err, 3)
        assert fv.shape == (3,) and fe.shape == (3,)
        assert fv[0] == misc.fractional_variability(flux[:3], err[:3])

    def test_variability_timescale(self):
        t = np.array([0.0, 1.0, 2.0])
        f = np.array([100.0, 200.0, 100.0])
        e = np.array([1.0, 1.0, 1.0])
        tau = misc.variability_timescale(t, f, e)
        assert tau == pytest.approx(1.0 / abs(np.log(2.0)), rel=1e-12)

    def test_variability_statistics_counts(self):
        t = np.arange(5.0)
        f = np.array([100.0, 200, 100, 200, 100])
        e = np.ones(5)
        st = misc.variability_statistics(t, f, e)
        assert st["count"] == 4
        assert st["min"] == pytest.approx(1.0 / np.log(2.0))
