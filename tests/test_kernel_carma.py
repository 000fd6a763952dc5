"""CARMA kernel tests, mirroring the reference's own inline-Rust and
Python CARMA tests (reference: src/carma/math.rs:369-434,
src/carma/kalman.rs:391-455, tests/test_carma_validated.py)."""

import math

import numpy as np
import pytest

from chronoxtract_spark.kernel import carma as K


def _sim_car1(n=200, tau=2.0, sigma=1.0, seed=7):
    """Exact discretized CAR(1) (Ornstein-Uhlenbeck) simulation."""
    rng = np.random.RandomState(seed)
    t = np.cumsum(rng.rand(n) * 0.5 + 0.05)
    x = np.empty(n)
    lam = 1.0 / tau
    x[0] = rng.normal(0, sigma / math.sqrt(2 * lam))
    for i in range(1, n):
        dt = t[i] - t[i - 1]
        rho = math.exp(-lam * dt)
        sd = sigma / math.sqrt(2 * lam) * math.sqrt(1 - rho * rho)
        x[i] = rho * x[i - 1] + rng.normal(0, sd)
    err = np.full(n, 0.05)
    y = x + rng.normal(0, 0.05, n)
    return t, y, err


class TestRootsAndCriteria:
    def test_ar1_root(self):
        # reference: src/carma/math.rs:375-382 — root of s + a = -a
        roots = K.compute_ar_roots([2.0])
        assert roots[0] == pytest.approx(-2.0)

    def test_ar2_roots(self):
        # s^2 + 3s + 2 = (s+1)(s+2)
        roots = sorted(K.compute_ar_roots([3.0, 2.0]).real)
        np.testing.assert_allclose(roots, [-2.0, -1.0], atol=1e-10)

    def test_information_criteria(self):
        # reference: src/carma/math.rs:418-428
        aic, aicc, bic = K.information_criteria(-100.0, 3, 50)
        assert aic == pytest.approx(206.0)
        assert aicc > aic
        assert bic == pytest.approx(3.0 * math.log(50.0) + 200.0)

    def test_validate_rejects(self):
        with pytest.raises(K.CarmaError):
            K.validate_time_series([], [])
        with pytest.raises(K.CarmaError):
            K.validate_time_series([0, 1, 2], [1, 2])
        with pytest.raises(K.CarmaError):
            K.validate_time_series([0, 1, 1.0], [1, 2, 3])  # non-ascending
        with pytest.raises(K.CarmaError):
            K.validate_time_series([0, 1, 2], [1, 2, 3], [0.1, -1, 0.1])

    def test_order_validation(self):
        with pytest.raises(K.CarmaError):
            K.CarmaParams(0, 0)
        with pytest.raises(K.CarmaError):
            K.CarmaParams(2, 2)


class TestStateSpace:
    def test_car1_stationary_variance(self):
        # CAR(1) with root -1/tau: stationary var = sigma^2 * tau / 2
        params = K.CarmaParams(1, 0, ar_coeffs=[0.5], ma_coeffs=[1.0], sigma=1.0)
        ss = K.StateSpace(params)
        assert ss.stationary_cov[0, 0] == pytest.approx(1.0 / (2 * 0.5))

    def test_transition_is_exp(self):
        # reference: src/carma/math.rs:430-441
        params = K.CarmaParams(2, 0, ar_coeffs=[3.0, 2.0], ma_coeffs=[1.0])
        ss = K.StateSpace(params)
        phi = ss.transition(1.0)
        np.testing.assert_allclose(
            sorted(np.diag(phi)), sorted([math.exp(-1.0), math.exp(-2.0)]), atol=1e-10
        )

    def test_nonstationary_rejected(self):
        params = K.CarmaParams(1, 0, ar_coeffs=[-0.5], ma_coeffs=[1.0])
        with pytest.raises(K.CarmaError):
            K.StateSpace(params)


class TestKalman:
    def test_loglik_finite_car1(self):
        t, y, e = _sim_car1()
        params = K.CarmaParams(1, 0, ar_coeffs=[0.5], ma_coeffs=[1.0], sigma=1.0)
        ll = K.kalman_loglikelihood(params, t, y, e)
        assert np.isfinite(ll)

    def test_true_params_beat_bad_params(self):
        t, y, e = _sim_car1(tau=2.0, sigma=1.0)
        good = K.CarmaParams(1, 0, ar_coeffs=[0.5], ma_coeffs=[1.0], sigma=1.0)
        bad = K.CarmaParams(1, 0, ar_coeffs=[5.0], ma_coeffs=[1.0], sigma=0.1)
        assert K.kalman_loglikelihood(good, t, y, e) > (
            K.kalman_loglikelihood(bad, t, y, e)
        )

    def test_kalman_filter_output_shapes(self):
        t, y, e = _sim_car1(n=50)
        params = K.CarmaParams(1, 0, ar_coeffs=[0.5], ma_coeffs=[1.0], sigma=1.0)
        out = K.kalman_filter(params, t, y, e)
        assert out["innovations"].shape == (50,)
        assert out["filtered_means"].shape == (50, 1)
        assert np.all(out["innovation_variances"] > 0)

    def test_car1_matches_closed_form(self):
        """CAR(1) Kalman loglik equals the closed-form OU Gaussian
        likelihood — an independent oracle."""
        t, y, e = _sim_car1(n=80, tau=2.0, sigma=1.0)
        lam = 0.5
        sigma = 1.0
        params = K.CarmaParams(1, 0, ar_coeffs=[lam], ma_coeffs=[1.0], sigma=sigma)
        ll = K.kalman_loglikelihood(params, t, y, e)
        # closed-form sequential OU predictive density
        var_st = sigma**2 / (2 * lam)
        mean, var = 0.0, var_st
        ll2 = 0.0
        for i in range(t.size):
            if i > 0:
                dt = t[i] - t[i - 1]
                rho = math.exp(-lam * dt)
                mean = rho * mean
                var = rho * rho * var + var_st * (1 - rho * rho)
            s = var + e[i] ** 2
            innov = y[i] - mean
            ll2 += -0.5 * (innov * innov / s + math.log(s) + 2 * math.log(math.pi))
            gain = var / s
            mean = mean + gain * innov
            var = (1 - gain) * var
        assert ll == pytest.approx(ll2, rel=1e-9)


class TestMle:
    def test_mle_recovers_car1_scale(self):
        t, y, e = _sim_car1(n=300, tau=2.0, sigma=1.0, seed=11)
        res = K.carma_mle(t, y, e, 1, 0, n_starts=16)
        assert np.isfinite(res["loglikelihood"])
        assert res["aicc"] > res["aic"]
        # recovered decay rate within a loose band of the true 0.5
        assert 0.05 < res["params"].ar_coeffs[0] < 5.0

    def test_choose_order_grid_shape(self):
        t, y, e = _sim_car1(n=120, seed=3)
        res = K.carma_choose_order(t, y, e, 2, 1)
        assert res["aicc_grid"].shape == (2, 2)
        assert res["best_p"] in (1, 2)

    def test_psd_positive_decreasing(self):
        params = K.CarmaParams(1, 0, ar_coeffs=[0.5], ma_coeffs=[1.0], sigma=1.0)
        f = np.array([0.01, 0.1, 1.0, 10.0])
        psd = K.carma_psd(params, f)
        assert np.all(psd > 0)
        assert psd[0] > psd[-1]  # red-noise slope


class TestMcmc:
    def test_mcmc_runs_and_is_seeded(self):
        t, y, e = _sim_car1(n=80, seed=5)
        r1 = K.carma_mcmc(t, y, e, 1, 0, n_samples=100, n_burn=100, n_chains=2, seed=42)
        r2 = K.carma_mcmc(t, y, e, 1, 0, n_samples=100, n_burn=100, n_chains=2, seed=42)
        np.testing.assert_array_equal(r1["samples"], r2["samples"])
        assert r1["samples"].shape == (100, 3)
        assert np.isfinite(r1["log_posteriors"]).all()
        assert (r1["ess"] > 0).all()

    def test_mcmc_pinned_init_and_draw_stream(self):
        # init_vec pins the start (skipping the MLE multistart) and the
        # accept uniform is drawn unconditionally per proposal, so the
        # chain is a pure function of (seed, init_vec, n_iters) — the
        # property the carma_mcmc_fold SQL oracle replays
        t, y, e = _sim_car1(n=60, seed=7)
        init = np.array([0.5, 1.0, 0.0])
        r1 = K.carma_mcmc(t, y, e, 1, 0, n_samples=40, n_burn=10,
                          n_chains=2, seed=202, init_vec=init,
                          init_prop_scale=0.05)
        r2 = K.carma_mcmc(t, y, e, 1, 0, n_samples=40, n_burn=10,
                          n_chains=2, seed=202, init_vec=init,
                          init_prop_scale=0.05)
        np.testing.assert_array_equal(r1["samples"], r2["samples"])
        with pytest.raises(K.CarmaError):
            K.carma_mcmc(t, y, e, 1, 0, n_samples=10, n_burn=5,
                         init_vec=np.array([0.5, 1.0]))

    def test_mcmc_params_surface(self):
        # mirrors src/carma/types.rs:185-224: defaults, order validation,
        # positional to_carma_params mapping with ma_coeffs[0] pinned to 1
        with pytest.raises(K.CarmaError):
            K.McmcParams(0, 0)
        with pytest.raises(K.CarmaError):
            K.McmcParams(2, 2)
        mp = K.McmcParams(3, 1)
        assert mp.ysigma == 1.0 and mp.measerr_scale == 1.0 and mp.mu == 0.0
        assert len(mp.ar_params) == 3 and len(mp.ma_params) == 1
        mp.ysigma = 2.5
        mp.ar_params = np.array([0.4, 0.3, 0.2])
        mp.ma_params = np.array([0.7])
        carma = mp.to_carma_params()
        assert carma.sigma == 2.5
        np.testing.assert_array_equal(carma.ar_coeffs, [0.4, 0.3, 0.2])
        np.testing.assert_array_equal(carma.ma_coeffs, [1.0, 0.7])
        assert repr(mp) == "McmcParams(p=3, q=1, ysigma=2.5000, mu=0.0000)"


def test_negative_q_rejected_with_carma_error():
    with pytest.raises(K.CarmaError):
        K.CarmaParams(1, -1)
    with pytest.raises(K.CarmaError):
        K.McmcParams(1, -1)


class TestPredict:
    """carma_predict (src/carma/predict.rs:22-58): reference-parity
    placeholder mode + the engine's real one-sided Kalman forecast."""

    def _params(self):
        return K.CarmaParams(
            p=1, q=0, ar_coeffs=np.array([0.5]),
            ma_coeffs=np.array([1.0]), sigma=1.0,
        )

    def test_reference_mode_mirrors_placeholder_constants(self):
        # predict.rs:43-48: zeros / ones / ±1.96, for ANY confidence
        # level and regardless of params or data (quirk preserved)
        t = np.array([0.0, 1.0, 3.0])
        v = np.array([5.0, -2.0, 7.0])
        e = np.full(3, 0.1)
        r = K.carma_predict(
            self._params(), t, v, e, [3.5, 10.0], confidence_level=0.8
        )
        np.testing.assert_array_equal(r["times"], [3.5, 10.0])
        np.testing.assert_array_equal(r["means"], [0.0, 0.0])
        np.testing.assert_array_equal(r["std_devs"], [1.0, 1.0])
        np.testing.assert_array_equal(r["lower_bounds"], [-1.96, -1.96])
        np.testing.assert_array_equal(r["upper_bounds"], [1.96, 1.96])
        assert r["confidence_level"] == 0.8

    def test_forecast_matches_closed_form_ou(self):
        # CARMA(1,0), near-zero measurement error: the one-sided
        # forecast collapses to m = v_last e^{-a dt},
        # s^2 = statvar (1 - e^{-2 a dt}) with statvar = b0^2 s^2/(4a^2)
        a = 0.5
        t = np.array([0.0, 1.0, 2.5, 4.0])
        v = np.array([1.0, 0.3, -0.4, 0.8])
        e = np.full(4, 1e-9)
        params = self._params()
        statvar = float(K.StateSpace(params).stationary_cov[0, 0])
        pred = [4.5, 6.0, 0.5, -1.0]
        f = K.carma_predict(params, t, v, e, pred, mode="forecast")
        for j, tp in enumerate(pred):
            if tp <= t[0]:
                em, ev = 0.0, statvar
            else:
                idx = int(np.searchsorted(t, tp, side="left")) - 1
                dt = tp - t[idx]
                em = v[idx] * math.exp(-a * dt)
                ev = statvar * (1 - math.exp(-2 * a * dt))
            assert abs(f["means"][j] - em) < 1e-7
            assert abs(f["std_devs"][j] - math.sqrt(ev)) < 1e-7
        # central bounds at the requested level
        from statistics import NormalDist

        z = NormalDist().inv_cdf(0.975)
        np.testing.assert_allclose(
            f["upper_bounds"], f["means"] + z * f["std_devs"], rtol=0, atol=0
        )

    def test_forecast_is_one_sided(self):
        # an observation AFTER the pred time must not inform it
        params = self._params()
        t = np.array([0.0, 1.0, 1.5, 5.0])
        v = np.array([1.0, 0.5, 0.8, 100.0])
        e = np.full(4, 1e-9)
        f_with = K.carma_predict(params, t, v, e, [2.0], mode="forecast")
        f_wo = K.carma_predict(
            params, t[:3], v[:3], e[:3], [2.0], mode="forecast"
        )
        assert f_with["means"][0] == f_wo["means"][0]
        assert f_with["std_devs"][0] == f_wo["std_devs"][0]

    def test_bad_inputs_raise(self):
        params = self._params()
        t = np.array([0.0, 1.0])
        v = np.array([1.0, 2.0])
        e = np.array([0.1, 0.1])
        with pytest.raises(K.CarmaError):
            K.carma_predict(params, t, v, e, [2.0], confidence_level=1.5)
        with pytest.raises(K.CarmaError):
            K.carma_predict(params, t, v, e, [2.0], mode="smoother")
