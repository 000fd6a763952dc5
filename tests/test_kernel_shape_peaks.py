"""Kernel parity: shape, peaks, matrices, entropy, seasonality, fda,
correlation fixtures (reference: tests/test_shape.py, tests/test_misc.py,
tests/test_matrices.py, tests/test_entropy.py, tests/test_seasonality.py,
tests/test_fda.py, tests/test_correlation.py)."""

import numpy as np
import pytest

from chronoxtract_spark.kernel import (
    correlation,
    entropy,
    fda,
    matrices,
    peaks,
    seasonality,
    shape,
)


class TestShape:
    def test_zcr_alternating(self):
        # reference: tests/test_shape.py:5-13
        x = np.array([1.0, -1, 1, -1, 1, -1])
        assert shape.zero_crossing_rate(x) == 1.0

    def test_zcr_constant(self):
        # reference: tests/test_shape.py:15-21
        assert shape.zero_crossing_rate(np.full(10, 1.0)) == 0.0

    def test_zcr_zero_positive_convention(self):
        # 0 is treated as positive (src/shape/mod.rs:187)
        x = np.array([-1.0, 0.0, -1.0])
        assert shape.zero_crossing_rate(x) == 1.0

    def test_slope_linear(self):
        # reference: tests/test_shape.py:57-65
        m, v, mx = shape.slope_features(np.array([1.0, 2, 3, 4, 5]))
        assert m == 1.0 and v == 0.0 and mx == 1.0

    def test_turning_points(self):
        x = np.array([0.0, 1.0, 0.0, 1.0, 0.0])
        cnt, rate = shape.turning_points(x)
        assert cnt == 3 and rate == 1.0

    def test_variability_features_index_quartiles(self):
        # sorted-index quartiles (src/shape/mod.rs:412-418)
        x = np.arange(8.0)  # sorted already
        cv, qcd, mad, iqr = shape.variability_features(x)
        # q1 = x[2]=2, q3 = x[6]=6
        assert iqr == 4.0
        assert qcd == pytest.approx((6 - 2) / (6 + 2))

    def test_energy_distribution_flat(self):
        ent, norm, conc = shape.energy_distribution(np.zeros(5))
        assert ent == 0.0 and norm == 0.0 and conc == 0.0

    def test_energy_distribution_spike(self):
        x = np.zeros(10)
        x[3] = 2.0
        ent, norm, conc = shape.energy_distribution(x)
        assert ent == 0.0  # single nonzero -> p=1 -> entropy 0
        assert norm == pytest.approx(0.4)
        assert conc == 1.0

    def test_enhanced_peak_stats_basic(self):
        x = np.array([0.0, 1.0, 0.0, 3.0, 0.0, 2.0, 0.0])
        n, mean_prom, mean_spacing, mean_width, max_p2p, density = (
            shape.enhanced_peak_stats(x)
        )
        assert n == 3
        assert mean_prom == pytest.approx((1 + 3 + 2) / 3)
        assert mean_spacing == 2.0
        assert density == pytest.approx(3 / 7)

    def test_peak_to_peak(self):
        x = np.array([0.0, 1.0, 0.0, 3.0, 0.0, 2.0, 0.0])
        mx, mean, std = shape.peak_to_peak_amplitude(x)
        # amplitudes between consecutive peaks: max(1,3)=3, max(3,2)=3
        assert mx == 3.0 and mean == 3.0 and std == 0.0


class TestPeaks:
    def test_find_peaks_height(self):
        # reference: tests/test_misc.py:23-26
        x = np.array([0.0, 1.0, 0.0, 2.0, 0.0, 3.0, 0.0])
        np.testing.assert_array_equal(
            peaks.find_peaks(x, height=1.5), [3, 5]
        )

    def test_find_peaks_plateau(self):
        # reference: tests/test_misc.py:46-49
        x = np.array([0.0, 1.0, 1.0, 1.0, 0.0])
        np.testing.assert_array_equal(peaks.find_peaks(x, height=0.5), [2])

    def test_find_peaks_distance(self):
        x = np.array([0.0, 2.0, 0.0, 2.0, 0.0, 2.0, 0.0])
        np.testing.assert_array_equal(peaks.find_peaks(x, distance=3), [1, 5])

    def test_prominence(self):
        # reference: tests/test_misc.py:28-32
        x = np.array([0.0, 1.0, 0.0, 3.0, 0.0, 2.0, 0.0])
        np.testing.assert_allclose(
            peaks.peak_prominence(x, np.array([1, 3, 5])), [1.0, 3.0, 2.0]
        )

    def test_prominence_boundary(self):
        # reference: tests/test_misc.py:56-60
        x = np.array([2.0, 1.0, 0.0, 3.0, 0.0, 2.0, 0.0])
        np.testing.assert_allclose(
            peaks.peak_prominence(x, np.array([0, 3, 5])), [2.0, 3.0, 2.0]
        )

    def test_edge_plateau_not_peak(self):
        x = np.array([0.0, 1.0, 1.0])
        assert peaks.find_peaks(x).size == 0


class TestMatrices:
    def test_hankel(self):
        # reference: tests/test_matrices.py:30-36
        h = matrices.time_delay_embedding(np.array([1.0, 2, 3, 4]), 3)
        np.testing.assert_array_equal(h, [[1, 2, 3], [2, 3, 4]])

    def test_gasf_constant(self):
        # reference: tests/test_matrices.py:57-63 — degenerate range
        # normalizes to 0 -> G = 0*0 - 1*1 = -1 everywhere
        g = matrices.gramian_angular_summation_field(np.array([5.0, 5, 5]))
        np.testing.assert_allclose(g, -np.ones((3, 3)))

    def test_mtf_checkerboard(self):
        # reference: tests/test_matrices.py:66-79
        m = matrices.markov_transition_field(np.array([0.0, 1, 0, 1]), 2)
        # transitions 0->1, 1->0, 0->1: P[0,1]=1, P[1,0]=1
        expect = np.array(
            [[0, 1, 0, 1], [1, 0, 1, 0], [0, 1, 0, 1], [1, 0, 1, 0]],
            dtype=float,
        )
        np.testing.assert_allclose(m, expect)

    def test_nonfinite_rejected(self):
        with pytest.raises(ValueError):
            matrices.time_delay_embedding(np.array([1.0, np.inf]), 1)


class TestEntropy:
    def test_sample_entropy_positive(self):
        # reference: tests/test_entropy.py:22-29
        rng = np.random.RandomState(42)
        x = rng.normal(size=100)
        se = entropy.sample_entropy(x, 2, 0.2)
        assert np.isfinite(se) and se > 0

    def test_approx_entropy_positive(self):
        rng = np.random.RandomState(42)
        x = rng.normal(size=100)
        ae = entropy.approximate_entropy(x, 2, 0.2)
        assert np.isfinite(ae)

    def test_permutation_entropy_known(self):
        # monotone series has a single ordinal pattern -> entropy 0
        x = np.arange(10.0)
        assert entropy.permutation_entropy(x, 3, 1) == 0.0

    def test_random_gt_periodic_permutation(self):
        # reference: tests/test_entropy.py:99-132
        rng = np.random.RandomState(42)
        rand = rng.normal(size=200)
        periodic = np.sin(np.linspace(0, 20 * np.pi, 200))
        assert entropy.permutation_entropy(rand, 3, 1) > (
            entropy.permutation_entropy(periodic, 3, 1)
        )

    def test_lzc_periodic(self):
        x = np.array([1.0, 2, 1, 2, 1, 2])
        c = entropy.lempel_ziv_complexity(x, 1.5)
        assert c > 0 and np.isfinite(c)

    def test_sampen_apen_fused_bitexact(self):
        # the fused pair path must reproduce the separate kernels bit
        # for bit (integer match counts -> identical float arithmetic),
        # including tie-heavy series, tiny n, and degenerate r edges
        rng = np.random.RandomState(7)
        for n in (4, 5, 10, 64, 333, 1440):
            for mode in ("normal", "ties", "flat"):
                x = rng.normal(size=n)
                if mode == "ties":
                    x = np.round(x, 1)
                elif mode == "flat":
                    x = np.full(n, 2.5)
                for r in (0.2, 0.2 * max(float(np.std(x)), 1e-12)):
                    se, ae = entropy.sampen_apen(x, 2, r)
                    se_ref = entropy.sample_entropy(x, 2, r)
                    ae_ref = entropy.approximate_entropy(x, 2, r)
                    assert repr(se) == repr(se_ref), (n, mode, r)
                    assert repr(ae) == repr(ae_ref), (n, mode, r)

    def test_mse_scale1_equals_sampen(self):
        # reference: tests/test_entropy.py:123-132
        rng = np.random.RandomState(123)
        x = rng.normal(size=100)
        mse = entropy.multiscale_entropy(x, 2, 0.2, 3)
        se = entropy.sample_entropy(x, 2, 0.2)
        assert abs(mse[0] - se) < 1e-10

    def test_coarse_grain(self):
        cg = entropy._coarse_grain(np.array([1.0, 2, 3, 4, 5, 6]), 2)
        np.testing.assert_allclose(cg, [1.5, 3.5, 5.5])


class TestSeasonality:
    def test_stl_reconstruction(self):
        # reference: tests/test_seasonality.py:47-64
        t = np.arange(60, dtype=float)
        rng = np.random.RandomState(0)
        x = 0.05 * t + np.sin(2 * np.pi * t / 12) + 0.01 * rng.randn(60)
        trend, seasonal, remainder = seasonality.simple_stl_decomposition(x, 12)
        np.testing.assert_allclose(trend + seasonal + remainder, x, rtol=1e-10)

    def test_seasonal_strength(self):
        # reference: tests/test_seasonality.py:21-32
        t = np.arange(50, dtype=float)
        x = np.sin(2 * np.pi * t / 10)
        assert seasonality.seasonal_strength(x, 10) > 0.3

    def test_trend_strength(self):
        # reference: tests/test_seasonality.py:34-45
        rng = np.random.RandomState(1)
        t = np.arange(50, dtype=float)
        x = 0.2 * t + 0.1 * rng.rand(50)
        assert seasonality.trend_strength(x, 10) > 0.3

    def test_detect_seasonality(self):
        # reference: tests/test_seasonality.py:66-79
        t = np.arange(50, dtype=float)
        x = np.sin(2 * np.pi * t / 10)
        assert seasonality.detect_seasonality(x, 10, 0.3)

    def test_dfa_white_noise(self):
        rng = np.random.RandomState(42)
        x = rng.normal(size=512)
        alpha = seasonality.detrended_fluctuation_analysis(x, 4, 128, 10)
        assert 0.3 < alpha < 0.7  # white noise alpha ~ 0.5


class TestFda:
    def test_fft_pow2(self):
        # reference: tests/test_fda.py:5-13
        x = np.array([1.0, 1, 1, 1, 0, 0, 0, 0])
        np.testing.assert_allclose(fda.perform_fft(x), np.fft.fft(x))

    def test_fft_odd_and_prime(self):
        # reference: tests/test_fda.py:15-25
        for x in ([1.0, 1, 1, 0, 0], [1.0, 1, 1, 0, 0, 1, 0]):
            x = np.asarray(x)
            np.testing.assert_allclose(fda.perform_fft(x), np.fft.fft(x))

    def test_fft_f32_mode(self):
        x = np.sin(np.linspace(0, 10, 64))
        out = fda.perform_fft(x, dtype="float32")
        np.testing.assert_allclose(out, np.fft.fft(x), atol=1e-3)

    def test_lomb_scargle_recovers_frequency(self):
        t = np.linspace(0, 10, 200)
        y = np.sin(2 * np.pi * 1.5 * t)
        freqs = np.linspace(0.1, 3.0, 100)
        p = fda.lomb_scargle(t, y, freqs)
        assert freqs[np.argmax(p)] == pytest.approx(1.5, abs=0.05)

    def test_welch_peak_frequency(self):
        t = np.arange(1024, dtype=float)
        y = np.sin(2 * np.pi * 0.1 * t)
        psd = fda.welch_power(y, nperseg=128)
        f = np.fft.rfftfreq(128)
        assert f[np.argmax(psd)] == pytest.approx(0.1, abs=0.01)


class TestCorrelation:
    def test_dcf_recovers_lag(self):
        # reference: tests/test_correlation.py:5-52
        t = np.linspace(0, 100, 100)
        v1 = np.sin(t)
        lag = 10.0
        v2 = np.sin(t - lag)
        out = correlation.dcf(t, v1, t, v2, -20.0, 20.0, 0.5)
        best = out["lags"][np.argmax(out["correlations"])]
        assert best == pytest.approx(10.0, abs=0.5)

    def test_acf_recovers_period(self):
        t = np.linspace(0, 100, 100)
        v = np.sin(2 * np.pi * t / 20.0)
        out = correlation.acf(t, v, 1.0, 40.0, 1.0)
        pos = out["lags"][np.argmax(out["correlations"])]
        assert pos == pytest.approx(20.0, abs=1.5)

    def test_dcf_zero_lag_self(self):
        t = np.arange(50, dtype=float)
        rng = np.random.RandomState(3)
        v = rng.normal(size=50)
        out = correlation.acf(t, v, -0.5, 0.5, 1.0)
        # mean zero-lag UDCF = var_pop / var_samp = (n-1)/n
        assert out["correlations"][0] == pytest.approx(49 / 50, rel=1e-9)
