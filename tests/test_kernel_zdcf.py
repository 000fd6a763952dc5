"""ZDCF kernel tests (reference: tests/test_correlation.py:54-95 style:
lag recovery within tolerance; binning invariants from zdcf.rs)."""

import numpy as np
import pytest

from chronoxtract_spark.kernel import zdcf as Z


class TestFisher:
    def test_fisher_e_zero_r(self):
        # r=0: z = 0 + 0 (term2=0) -> 0
        assert Z.fisher_e(0.0, 20) == 0.0

    def test_fisher_s_positive(self):
        assert Z.fisher_s(0.5, 20) > 0

    def test_fisher_e_monotone_in_r(self):
        assert Z.fisher_e(0.8, 30) > Z.fisher_e(0.4, 30)


class TestAlcbin:
    def test_no_reuse_within_bin(self):
        t = np.arange(20.0)
        bins = Z.alcbin(t, t, 5)
        for b in bins:
            i_idx = [p[0] for p in b]
            j_idx = [p[1] for p in b]
            assert len(set(i_idx)) == len(i_idx)
            assert len(set(j_idx)) == len(j_idx)

    def test_min_population(self):
        t = np.arange(15.0)
        bins = Z.alcbin(t, t, 4)
        assert all(len(b) >= 4 for b in bins)

    def test_bins_ordered_by_lag(self):
        t = np.arange(12.0)
        bins = Z.alcbin(t, t, 3)
        lags = [np.mean([t[j] - t[i] for i, j in b]) for b in bins]
        assert lags == sorted(lags)


class TestZdcf:
    def test_recovers_injected_lag(self):
        rng = np.random.RandomState(0)
        t = np.sort(rng.uniform(0, 100, 120))
        sig = np.sin(2 * np.pi * t / 25.0)
        lag = 5.0
        t2 = np.sort(rng.uniform(0, 100, 120))
        sig2 = np.sin(2 * np.pi * (t2 - lag) / 25.0)
        e = np.full(120, 0.05)
        out = Z.zdcf(t, sig, e, t2, sig2, e, min_points=11, num_mc=40, seed=1)
        near = np.abs(out["lags"] - lag) < 3.0
        assert out["correlations"][near].max() > 0.7

    def test_seeded_deterministic(self):
        rng = np.random.RandomState(3)
        t = np.sort(rng.uniform(0, 50, 60))
        v = np.sin(t)
        e = np.full(60, 0.1)
        a = Z.zdcf(t, v, e, t, v, e, num_mc=20, seed=42)
        b = Z.zdcf(t, v, e, t, v, e, num_mc=20, seed=42)
        np.testing.assert_array_equal(a["correlations"], b["correlations"])

    def test_errors_positive_and_bounded(self):
        rng = np.random.RandomState(5)
        t = np.sort(rng.uniform(0, 50, 50))
        v = rng.normal(size=50)
        e = np.full(50, 0.1)
        out = Z.zdcf(t, v, e, t, v, e, num_mc=20, seed=2)
        assert np.all(out["errors"] > 0)
        assert np.all(out["errors"] < 1.5)

    def test_too_short_rejected(self):
        with pytest.raises(ValueError):
            Z.zdcf([1.0], [1.0], [0.1], [1.0], [1.0], [0.1])
