"""CARMA(p,q) model kernels: state-space setup, Kalman likelihood,
multistart MLE, AICc order selection, adaptive-Metropolis MCMC with
parallel tempering, and the model PSD.

Numpy mirrors of the reference CARMA subsystem (reference: src/carma/).
Semantics preserved:

- rotated (diagonal) state space from AR companion-matrix roots
  (src/carma/math.rs:22-64; src/carma/types.rs:393-445)
- process noise ``sigma^2 / (2|Re lambda_i|)`` diagonal and Lyapunov
  stationary covariance ``-Q[i,j]/(Re(lambda_i + conj(lambda_j)))``
  (src/carma/math.rs:118-190)
- the reference's Kalman path only supports **real** AR roots (its
  diagonal matrix exponential raises on complex eigenvalues,
  src/carma/math.rs:196-224) — we raise identically, and the MLE
  multistart simply skips such candidates (src/carma/mle.rs:60-74)
- Gaussian loglik accumulation per observation (src/carma/kalman.rs:195-203)
- MLE is a seeded random multistart *search*, not an optimizer
  (src/carma/mle.rs:18-19 TODO), evaluated per start; AIC/AICc/BIC per
  src/carma/math.rs:345-367
- MCMC: adaptive Metropolis within parallel tempering, ladder
  1.0 + 0.5*i (src/carma/mcmc.rs:228-231), swaps every 10, covariance
  adaptation every 100, seeded (default 42)

On Spark these run per-series inside applyInPandas — the distribution
axis is series × (starts | grid cells), never inside the recursion
(SURVEY.md §3.3).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

__all__ = [
    "CarmaParams",
    "StateSpace",
    "kalman_loglikelihood",
    "kalman_filter",
    "carma_mle",
    "carma_choose_order",
    "carma_mcmc",
    "carma_psd",
    "validate_time_series",
    "information_criteria",
]


class CarmaError(ValueError):
    pass


@dataclass
class CarmaParams:
    """CARMA(p,q): AR poly s^p + a1 s^(p-1) + ... + ap, MA poly
    b0 + b1 s + ... + bq s^q (src/carma/types.rs:52-74)."""

    p: int
    q: int
    ar_coeffs: np.ndarray = field(default=None)
    ma_coeffs: np.ndarray = field(default=None)
    sigma: float = 1.0

    def __post_init__(self):
        # q is usize in the reference (can't be negative); the Python
        # surface must reject it explicitly or np.zeros(q) fails later
        # with a raw ValueError instead of the CarmaError contract
        if self.p <= 0 or self.q < 0 or self.q >= self.p:
            raise CarmaError(f"Invalid model order: p={self.p}, q={self.q}")
        if self.ar_coeffs is None:
            self.ar_coeffs = np.zeros(self.p)
        if self.ma_coeffs is None:
            self.ma_coeffs = np.zeros(self.q + 1)
        self.ar_coeffs = np.asarray(self.ar_coeffs, dtype=np.float64)
        self.ma_coeffs = np.asarray(self.ma_coeffs, dtype=np.float64)

    def validate(self):
        if len(self.ar_coeffs) != self.p:
            raise CarmaError("AR coefficients length != p")
        if len(self.ma_coeffs) != self.q + 1:
            raise CarmaError("MA coefficients length != q+1")
        if self.sigma <= 0:
            raise CarmaError("sigma must be positive")
        if not self.is_stationary():
            raise CarmaError("Model is not stationary")

    def ar_roots(self) -> np.ndarray:
        return compute_ar_roots(self.ar_coeffs)

    def is_stationary(self) -> bool:
        return bool(np.all(self.ar_roots().real < 0))


@dataclass
class McmcParams:
    """MCMC parameterization of a CARMA model (src/carma/types.rs:150-224):
    ysigma replaces sigma for scaling, measerr_scale multiplies the
    measurement errors, mu is the series mean, ar_params holds the
    quadratic-factor AR parameterization. Field defaults, the
    p==0/q>=p validation, and the to_carma_params mapping (ar_params
    copied positionally into ar_coeffs, ma_coeffs[0] pinned to 1.0,
    ma_params shifted up one slot) mirror types.rs:185-218 exactly —
    including that the quadratic→polynomial conversion is the
    reference's own simple positional mapping, not a root expansion."""

    p: int
    q: int
    ysigma: float = 1.0
    measerr_scale: float = 1.0
    mu: float = 0.0
    ar_params: np.ndarray = field(default=None)
    ma_params: np.ndarray = field(default=None)

    def __post_init__(self):
        if self.p <= 0 or self.q < 0 or self.q >= self.p:
            raise CarmaError(f"Invalid model order: p={self.p}, q={self.q}")
        if self.ar_params is None:
            self.ar_params = np.zeros(self.p)
        if self.ma_params is None:
            self.ma_params = np.zeros(self.q)
        self.ar_params = np.asarray(self.ar_params, dtype=np.float64)
        self.ma_params = np.asarray(self.ma_params, dtype=np.float64)

    def to_carma_params(self) -> "CarmaParams":
        carma = CarmaParams(self.p, self.q)
        carma.sigma = self.ysigma
        n_ar = min(self.p, len(self.ar_params))
        carma.ar_coeffs[:n_ar] = self.ar_params[:n_ar]
        carma.ma_coeffs[0] = 1.0
        n_ma = min(self.q, len(self.ma_params))
        carma.ma_coeffs[1:n_ma + 1] = self.ma_params[:n_ma]
        return carma

    def __repr__(self) -> str:
        return (
            f"McmcParams(p={self.p}, q={self.q}, "
            f"ysigma={self.ysigma:.4f}, mu={self.mu:.4f})"
        )


def compute_ar_roots(ar_coeffs: np.ndarray) -> np.ndarray:
    """Companion-matrix eigenvalues of s^p + a1 s^(p-1) + ... + ap
    (src/carma/math.rs:22-64)."""
    a = np.asarray(ar_coeffs, dtype=np.float64)
    p = a.size
    if p == 0:
        raise CarmaError("Empty AR coefficients")
    if p == 1:
        return np.array([-a[0] + 0j])
    companion = np.zeros((p, p))
    companion[np.arange(p - 1), np.arange(1, p)] = 1.0
    companion[p - 1, :] = -a[::-1]
    return np.linalg.eigvals(companion)


def validate_time_series(times, values, errors=None):
    """(src/carma/math.rs:281-334)."""
    t = np.asarray(times, dtype=np.float64)
    v = np.asarray(values, dtype=np.float64)
    if t.size == 0 or v.size == 0:
        raise CarmaError("Empty time series")
    if t.size != v.size:
        raise CarmaError("Time and value arrays have different lengths")
    if errors is not None:
        e = np.asarray(errors, dtype=np.float64)
        if e.size != t.size:
            raise CarmaError("Error array length mismatch")
        if np.any(e <= 0) or not np.isfinite(e).all():
            raise CarmaError("All measurement errors must be positive and finite")
    if not np.isfinite(t).all() or not np.isfinite(v).all():
        raise CarmaError("Non-finite values in time series")
    if np.any(np.diff(t) <= 0):
        raise CarmaError("Times must be strictly ascending")
    if t.size < 3:
        raise CarmaError("Need at least 3 data points for CARMA fitting")


class StateSpace:
    """Rotated state-space model (src/carma/types.rs:393-445)."""

    def __init__(self, params: CarmaParams):
        lam = compute_ar_roots(params.ar_coeffs)
        if np.any(lam.real >= 0):
            raise CarmaError("Model is not stationary")
        p = params.p
        # observation vector: Re(MA poly at each root) (math.rs:77-113)
        powers = lam[:, None] ** np.arange(params.ma_coeffs.size)[None, :]
        self.observation = (powers @ params.ma_coeffs).real
        # diagonal process noise sigma^2/(2|Re lambda|) (math.rs:118-147)
        var = params.sigma**2
        self.process_noise_cov = np.diag(var / (2.0 * np.abs(lam.real)))
        # Lyapunov stationary covariance (math.rs:152-190)
        denom = lam[:, None] + np.conj(lam)[None, :]
        if np.any(np.abs(denom) < 1e-12):
            raise CarmaError("Singular denominator in Lyapunov equation")
        self.stationary_cov = -self.process_noise_cov / denom.real
        self.lam = lam
        self.p = p

    def transition(self, dt: float) -> np.ndarray:
        """diag(exp(lambda*dt)); raises on materially complex entries,
        matching the reference (math.rs:196-224)."""
        e = np.exp(self.lam * dt)
        if np.any(np.abs(e.imag) > 1e-12):
            raise CarmaError("Complex eigenvalues require special handling")
        return np.diag(e.real)

    def step_noise(self, dt: float) -> np.ndarray:
        """Integrated process noise for one step.

        Correct integral of the rotated Lyapunov ODE:
        ``Q_step[i,j] = -Qc[i,j] * (1 - exp((li+conj(lj)) dt)) / (li+conj(lj))``
        so that ``phi P_inf phi* + Q_step == P_inf`` (the stationary
        covariance is a fixed point). NOTE: the reference
        (src/carma/kalman.rs:216-239) drops the minus sign that its own
        stationary-covariance solver applies (src/carma/math.rs:174-183),
        which makes covariances drift negative and the filter abort with
        "Non-positive innovation variance" on moderately spaced data —
        a sign bug we deliberately fix rather than reproduce.
        """
        s = self.lam[:, None] + np.conj(self.lam)[None, :]
        small = np.abs(s) < 1e-12
        with np.errstate(all="ignore"):
            integ = np.where(
                small, dt, (-(1.0 - np.exp(s * dt)) / np.where(small, 1, s)).real
            )
        return self.process_noise_cov @ integ


def _kalman_core(params: CarmaParams, t, v, e, keep_path: bool):
    ss = StateSpace(params)
    p = ss.p
    h = ss.observation
    mean = np.zeros(p)
    cov = ss.stationary_cov.copy()
    total = 0.0
    preds = np.empty(t.size)
    innovs = np.empty(t.size)
    ivars = np.empty(t.size)
    means_path = np.empty((t.size, p)) if keep_path else None
    prev = None
    eye = np.eye(p)
    for i in range(t.size):
        if prev is not None:
            dt = t[i] - prev
            if dt > 0:
                phi = ss.transition(dt)
                mean = phi @ mean
                cov = phi @ cov @ phi.T + ss.step_noise(dt)
        pred = float(h @ mean)
        innov = v[i] - pred
        ivar = float(h @ cov @ h) + e[i] * e[i]
        if ivar <= 0:
            raise CarmaError("Non-positive innovation variance")
        gain = (cov @ h) / ivar
        mean = mean + gain * innov
        cov = (eye - np.outer(gain, h)) @ cov
        total += -0.5 * (innov * innov / ivar + math.log(ivar) + 2.0 * math.log(math.pi))
        preds[i], innovs[i], ivars[i] = pred, innov, ivar
        if keep_path:
            means_path[i] = mean
        prev = t[i]
    return total, preds, innovs, ivars, means_path


def kalman_loglikelihood(params: CarmaParams, times, values, errors) -> float:
    """Gaussian loglik via the rotated Kalman recursion
    (src/carma/kalman.rs:261-331)."""
    validate_time_series(times, values, errors)
    t = np.asarray(times, dtype=np.float64)
    v = np.asarray(values, dtype=np.float64)
    e = np.asarray(errors, dtype=np.float64)
    return _kalman_core(params, t, v, e, keep_path=False)[0]


def kalman_filter(params: CarmaParams, times, values, errors) -> dict:
    """Full filter output (src/carma/kalman.rs:357-389)."""
    validate_time_series(times, values, errors)
    t = np.asarray(times, dtype=np.float64)
    v = np.asarray(values, dtype=np.float64)
    e = np.asarray(errors, dtype=np.float64)
    total, preds, innovs, ivars, means = _kalman_core(params, t, v, e, True)
    return {
        "loglikelihood": total,
        "predicted_observations": preds,
        "innovations": innovs,
        "innovation_variances": ivars,
        "filtered_means": means,
    }


def carma_predict(
    params: CarmaParams,
    times,
    values,
    errors,
    pred_times,
    confidence_level: float = 0.95,
    mode: str = "reference",
) -> dict:
    """CARMA prediction (src/carma/predict.rs:22-58).

    ``mode='reference'`` mirrors the reference's SHIPPED behavior: its
    carma_predict is an acknowledged placeholder ("TODO: Implement
    proper Kalman filter-based prediction", predict.rs:39-40) that
    ignores params and the training data and returns ``means=0,
    std_devs=1, lower=-1.96, upper=+1.96`` for every pred time — the
    bounds stay ±1.96 even when confidence_level != 0.95 (quirk
    preserved; predict.rs:44-48). Inputs are validated the same way
    the reference's slice conversions would reject them.

    ``mode='forecast'`` is this engine's implementation of the
    reference's TODO: a ONE-SIDED Kalman forecast. The filter runs
    over the observations strictly before each pred time (same
    rotated-state recursion as kalman_filter), the state is propagated
    by the exact transition/step-noise pair, and (mean, std, central
    confidence bounds at the requested level) of the latent process
    come from the propagated predictive distribution. Pred times
    before the first observation answer with the stationary
    distribution; observations at/after a pred time never inform it
    (filtering forecast, not a smoother).
    """
    validate_time_series(times, values, errors)
    if not 0.0 < confidence_level < 1.0:
        raise CarmaError("confidence_level must be in (0, 1)")
    pt = np.asarray(pred_times, dtype=np.float64)
    if mode == "reference":
        n = pt.size
        return {
            "times": pt.copy(),
            "means": np.zeros(n),
            "std_devs": np.ones(n),
            "lower_bounds": np.full(n, -1.96),
            "upper_bounds": np.full(n, 1.96),
            "confidence_level": float(confidence_level),
        }
    if mode != "forecast":
        raise CarmaError(f"unknown carma_predict mode: {mode!r}")
    from statistics import NormalDist

    z = NormalDist().inv_cdf(0.5 + confidence_level / 2.0)
    t = np.asarray(times, dtype=np.float64)
    v = np.asarray(values, dtype=np.float64)
    e = np.asarray(errors, dtype=np.float64)
    order = np.argsort(pt, kind="stable")
    ss = StateSpace(params)
    h = ss.observation
    eye = np.eye(ss.p)
    mean = np.zeros(ss.p)
    cov = ss.stationary_cov.copy()
    prev = None  # time the current (mean, cov) is conditioned up to
    means = np.empty(pt.size)
    stds = np.empty(pt.size)
    i = 0  # next observation to absorb
    for j in order:
        tp = pt[j]
        # absorb every observation strictly before this pred time
        while i < t.size and t[i] < tp:
            if prev is not None and t[i] > prev:
                phi = ss.transition(t[i] - prev)
                mean = phi @ mean
                cov = phi @ cov @ phi.T + ss.step_noise(t[i] - prev)
            innov = v[i] - float(h @ mean)
            ivar = float(h @ cov @ h) + e[i] * e[i]
            if ivar <= 0:
                raise CarmaError("Non-positive innovation variance")
            gain = (cov @ h) / ivar
            mean = mean + gain * innov
            cov = (eye - np.outer(gain, h)) @ cov
            prev = t[i]
            i += 1
        if prev is None or tp <= prev:
            m_f, c_f = mean, cov
        else:
            phi = ss.transition(tp - prev)
            m_f = phi @ mean
            c_f = phi @ cov @ phi.T + ss.step_noise(tp - prev)
        means[j] = float(h @ m_f)
        stds[j] = math.sqrt(max(float(h @ c_f @ h), 0.0))
    return {
        "times": pt.copy(),
        "means": means,
        "std_devs": stds,
        "lower_bounds": means - z * stds,
        "upper_bounds": means + z * stds,
        "confidence_level": float(confidence_level),
    }


def information_criteria(loglik: float, n_params: int, n_data: int):
    """(AIC, AICc, BIC) (src/carma/math.rs:345-367)."""
    k, n = float(n_params), float(n_data)
    aic = 2 * k - 2 * loglik
    aicc = aic + (2 * k * (k + 1)) / (n - k - 1) if n > k + 1 else float("inf")
    bic = k * math.log(n) - 2 * loglik
    return aic, aicc, bic


def _random_start(p: int, q: int, seed: int) -> CarmaParams:
    """Seeded random candidate (src/carma/mle.rs:117-137); numpy RNG
    stands in for the reference's StdRng — same distributional shape,
    different stream (the reference's own tests don't pin values)."""
    rng = np.random.RandomState(seed % (2**32))
    params = CarmaParams(p, q)
    params.ar_coeffs = rng.normal(0, 1, p) * 0.3
    ma = rng.normal(0, 1, q + 1) * 0.3
    ma[0] = 1.0
    params.ma_coeffs = ma
    params.sigma = max(abs(rng.normal()) + 0.1, 0.01)
    return params


def carma_mle(
    times, values, errors, p: int, q: int, n_starts: int = 8, max_iter: int = 1000
) -> dict:
    """Multistart random-search MLE (src/carma/mle.rs:32-114): evaluate
    n_starts seeded candidates, keep the best finite likelihood."""
    validate_time_series(times, values, errors)
    if p == 0 or q >= p:
        raise CarmaError(f"Invalid model order: p={p}, q={q}")
    best = None
    best_ll = -np.inf
    for i in range(n_starts):
        cand = _random_start(p, q, i)
        try:
            cand.validate()
            ll = kalman_loglikelihood(cand, times, values, errors)
        except (CarmaError, np.linalg.LinAlgError):
            continue
        if np.isfinite(ll) and ll > best_ll:
            best_ll, best = ll, cand
    if best is None:
        raise CarmaError("All parameter evaluations failed")
    n_params = p + (q + 1) + 1
    aic, aicc, bic = information_criteria(best_ll, n_params, len(times))
    return {
        "params": best,
        "loglikelihood": best_ll,
        "aic": aic,
        "aicc": aicc,
        "bic": bic,
        "converged": True,
        "iterations": 1,
    }


def carma_choose_order(times, values, errors, max_p: int, max_q: int) -> dict:
    """AICc grid over valid (p,q) (src/carma/selection.rs:24-95)."""
    grid = np.full((max_p, max_q + 1), np.nan)
    best = (1, 0, float("inf"))
    for p in range(1, max_p + 1):
        for q in range(0, min(p, max_q + 1)):
            try:
                res = carma_mle(times, values, errors, p, q, n_starts=4, max_iter=500)
            except CarmaError:
                continue
            grid[p - 1, q] = res["aicc"]
            if res["aicc"] < best[2]:
                best = (p, q, res["aicc"])
    return {
        "best_p": best[0],
        "best_q": best[1],
        "best_aicc": best[2],
        "aicc_grid": grid,
        "p_values": np.arange(1, max_p + 1),
        "q_values": np.arange(0, max_q + 1),
    }


def carma_psd(params: CarmaParams, frequencies) -> np.ndarray:
    """Model PSD sigma^2 |beta(2πif)|^2 / |alpha(2πif)|^2
    (src/carma/math.rs:232-268)."""
    f = np.asarray(frequencies, dtype=np.float64)
    s = 2j * np.pi * f
    ar = s ** params.p
    for k, c in enumerate(params.ar_coeffs):
        ar = ar + c * s ** (params.p - 1 - k)
    ma = np.zeros_like(s)
    for k, c in enumerate(params.ma_coeffs):
        ma = ma + c * s**k
    ar_mag = np.abs(ar) ** 2
    if np.any(ar_mag < 1e-15):
        raise CarmaError("AR polynomial evaluates to zero")
    return params.sigma**2 * np.abs(ma) ** 2 / ar_mag


# ---------------------------------------------------------------------------
# MCMC: adaptive Metropolis within parallel tempering
# (src/carma/mcmc.rs:17-371,387-501)


def _params_to_vector(params: CarmaParams) -> np.ndarray:
    return np.concatenate(
        [params.ar_coeffs, params.ma_coeffs, [math.log(params.sigma)]]
    )


def _vector_to_params(vec: np.ndarray, p: int, q: int) -> CarmaParams:
    params = CarmaParams(p, q)
    params.ar_coeffs = vec[:p].copy()
    params.ma_coeffs = vec[p : p + q + 1].copy()
    params.sigma = float(np.exp(vec[p + q + 1]))
    return params


def _log_posterior(vec, p, q, t, v, e):
    """Loglik + weak Gaussian prior on the parameter vector; -inf for
    invalid / non-stationary candidates (mirrors the chain's reject
    behavior for failed likelihood evaluations)."""
    try:
        params = _vector_to_params(vec, p, q)
        params.validate()
        ll = kalman_loglikelihood(params, t, v, e)
    except (CarmaError, np.linalg.LinAlgError, OverflowError):
        return -np.inf
    if not np.isfinite(ll):
        return -np.inf
    logprior = -0.5 * float(vec @ vec) / 100.0  # N(0, 10^2) iid
    return ll + logprior


def carma_mcmc(
    times,
    values,
    errors,
    p: int,
    q: int,
    n_samples: int = 1000,
    n_burn: int = 500,
    n_chains: int = 4,
    seed: int = 42,
    init_vec=None,
    init_prop_scale: float = 0.1,
) -> dict:
    """Parallel-tempering adaptive Metropolis (src/carma/mcmc.rs:387-501).

    Temperature ladder 1.0 + 0.5*i (mcmc.rs:228-231); per-chain seeded
    RNG (seed + 1000*i, mcmc.rs:237); swap proposals every 10
    iterations; proposal-covariance adaptation every 100 during burn-in;
    cold-chain samples returned with R-hat / ESS diagnostics.

    The accept uniform is drawn UNCONDITIONALLY per proposal. This is a
    DELIBERATE kernel-side determinism guarantee, not reference
    behavior: the reference's step() propagates invalid-proposal errors
    with ``?`` before accept_proposal (mcmc.rs:155) ever draws, so its
    RNG stream is data-dependent on chains that hit a non-finite
    proposal. Here each chain's stream is a fixed function of
    (seed, n_iters) — 3 normals + 1 uniform per step — which is what
    lets the ``carma_mcmc_fold`` oracle replay the whole Metropolis
    fold in SQL over pre-generated draws; outputs diverge from the
    reference only on chains that hit an invalid proposal.

    ``init_vec`` pins the start vector (skipping the carma_mle
    multistart); ``init_prop_scale`` sets the pre-adaptation proposal
    scale (reference default 0.1, mcmc.rs:120).
    """
    validate_time_series(times, values, errors)
    t = np.asarray(times, dtype=np.float64)
    v = np.asarray(values, dtype=np.float64)
    e = np.asarray(errors, dtype=np.float64)

    if init_vec is None:
        init = carma_mle(t, v, e, p, q, n_starts=4)["params"]
        init_arr = _params_to_vector(init)
    else:
        init_arr = np.asarray(init_vec, dtype=np.float64)
        if init_arr.size != p + q + 2:
            raise CarmaError("init_vec length != p+q+2")
    dim = p + q + 2
    temps = 1.0 + 0.5 * np.arange(n_chains)
    rngs = [np.random.RandomState((seed + 1000 * i) % 2**32) for i in range(n_chains)]
    state = [
        {
            "vec": init_arr.copy(),
            "cov_scale": np.full(dim, float(init_prop_scale)),
            "accepted": 0,
            "proposed": 0,
        }
        for _ in range(n_chains)
    ]
    lp = [(_log_posterior(s["vec"], p, q, t, v, e)) for s in state]
    swap_rng = np.random.RandomState(seed % 2**32)

    history: list[list[np.ndarray]] = [[] for _ in range(n_chains)]
    cold_samples = []
    cold_logposts = []
    n_swap_acc = n_swap_att = 0

    def step(i):
        nonlocal lp
        s = state[i]
        prop = s["vec"] + rngs[i].normal(0, 1, dim) * s["cov_scale"]
        # drawn before the validity check on purpose: the reference's
        # accept_proposal consumes its uniform unconditionally
        # (mcmc.rs:155), keeping the RNG stream data-independent
        u = rngs[i].rand()
        new_lp = _log_posterior(prop, p, q, t, v, e)
        s["proposed"] += 1
        log_alpha = (new_lp - lp[i]) / temps[i]
        if np.isfinite(new_lp) and math.log(max(u, 1e-300)) < log_alpha:
            s["vec"] = prop
            lp[i] = new_lp
            s["accepted"] += 1

    total_iters = n_burn + n_samples
    for it in range(total_iters):
        for i in range(n_chains):
            step(i)
            history[i].append(state[i]["vec"].copy())
        if it % 10 == 0 and n_chains > 1:
            # adjacent-pair swap proposals (mcmc.rs:290-312)
            for i in range(n_chains - 1):
                beta_i, beta_j = 1.0 / temps[i], 1.0 / temps[i + 1]
                log_a = (beta_i - beta_j) * (lp[i + 1] - lp[i])
                n_swap_att += 1
                if math.log(max(swap_rng.rand(), 1e-300)) < log_a:
                    state[i]["vec"], state[i + 1]["vec"] = (
                        state[i + 1]["vec"],
                        state[i]["vec"],
                    )
                    lp[i], lp[i + 1] = lp[i + 1], lp[i]
                    n_swap_acc += 1
        if it < n_burn and it > 0 and it % 100 == 0:
            # adapt proposal scales toward ~30% acceptance (mcmc.rs:169-196)
            for i in range(n_chains):
                s = state[i]
                rate = s["accepted"] / max(s["proposed"], 1)
                factor = 1.2 if rate > 0.3 else 0.8
                recent = np.asarray(history[i][-100:])
                spread = recent.std(axis=0)
                s["cov_scale"] = np.where(
                    spread > 1e-8, spread * 2.38 / math.sqrt(dim), s["cov_scale"]
                ) * factor
                s["accepted"] = s["proposed"] = 0
        if it >= n_burn:
            cold_samples.append(state[0]["vec"].copy())
            cold_logposts.append(lp[0])

    samples = np.asarray(cold_samples)
    rhat = _split_rhat(samples)
    ess = _effective_sample_size(samples)
    best_idx = int(np.argmax(cold_logposts))
    return {
        "samples": samples,
        "log_posteriors": np.asarray(cold_logposts),
        "map_params": _vector_to_params(samples[best_idx], p, q),
        "acceptance_rate": state[0]["accepted"] / max(state[0]["proposed"], 1),
        "swap_acceptance": n_swap_acc / max(n_swap_att, 1),
        "rhat": rhat,
        "ess": ess,
    }


def _split_rhat(samples: np.ndarray) -> np.ndarray:
    """Split-chain R-hat per dimension (mcmc.rs:504-540 analogue)."""
    n = samples.shape[0]
    if n < 4:
        return np.full(samples.shape[1], np.nan)
    half = n // 2
    a, b = samples[:half], samples[half : 2 * half]
    means = np.stack([a.mean(0), b.mean(0)])
    vars_ = np.stack([a.var(0, ddof=1), b.var(0, ddof=1)])
    w = vars_.mean(0)
    bvar = half * means.var(0, ddof=1)
    var_plus = (half - 1) / half * w + bvar / half
    with np.errstate(all="ignore"):
        return np.where(w > 0, np.sqrt(var_plus / w), 1.0)


def _effective_sample_size(samples: np.ndarray) -> np.ndarray:
    """Initial-positive-sequence autocorrelation ESS per dimension
    (mcmc.rs:542-566 analogue)."""
    n, d = samples.shape
    out = np.empty(d)
    for j in range(d):
        x = samples[:, j] - samples[:, j].mean()
        denom = float(x @ x)
        if denom == 0:
            out[j] = float(n)
            continue
        rho_sum = 0.0
        for lag in range(1, min(n // 2, 200)):
            rho = float(x[:-lag] @ x[lag:]) / denom
            if rho <= 0:
                break
            rho_sum += rho
        out[j] = n / (1.0 + 2.0 * rho_sum)
    return out
