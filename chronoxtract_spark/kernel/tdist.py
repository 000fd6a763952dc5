"""Driver-side distribution quantiles (Student-t, standard normal)
for operators whose thresholds are closed-form critical values — the
generalized-ESD lambda ladder (anomaly.py) and the SAX Gaussian
breakpoints (symbolic.py).

These run ONCE on the driver to produce float literals that are
embedded identically in both the Spark plan and the DuckDB oracle SQL,
so no executor ever evaluates them and engine parity is by
construction. scipy is not available in this environment; the
incomplete-beta continued fraction below is the standard Lentz
evaluation (Numerical Recipes betacf shape, public-domain algorithm),
accurate to ~1e-14, and the quantiles come from bisection on the CDF
— plenty for thresholds compared against data-derived statistics.
"""

from __future__ import annotations

import math

_FPMIN = 1e-300
_EPS = 3e-14


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz)."""
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _FPMIN:
        d = _FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, 300):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log1p(-x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def t_cdf(t: float, df: float) -> float:
    """Student-t CDF."""
    if t == 0.0:
        return 0.5
    tail = 0.5 * betainc_reg(df / 2.0, 0.5, df / (df + t * t))
    return 1.0 - tail if t > 0 else tail


def t_ppf(p: float, df: float) -> float:
    """Student-t quantile via bisection (p in (0, 1))."""
    if not 0.0 < p < 1.0:
        raise ValueError("p must be in (0, 1)")
    if p == 0.5:
        return 0.0
    lo, hi = -1e6, 1e6
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if t_cdf(mid, df) < p:
            lo = mid
        else:
            hi = mid
        if hi - lo < 1e-12 * max(1.0, abs(mid)):
            break
    return 0.5 * (lo + hi)


def norm_ppf(p: float) -> float:
    """Standard normal quantile via bisection on math.erf."""
    if not 0.0 < p < 1.0:
        raise ValueError("p must be in (0, 1)")
    if p == 0.5:
        return 0.0
    lo, hi = -40.0, 40.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if 0.5 * (1.0 + math.erf(mid / math.sqrt(2.0))) < p:
            lo = mid
        else:
            hi = mid
        if hi - lo < 1e-13:
            break
    return 0.5 * (lo + hi)


def esd_lambdas(n: int, k: int, alpha: float = 0.05) -> list[float]:
    """Critical values for the generalized ESD test (Rosner 1983):
    ``lambda_i = (n - i) * t_p / sqrt((df + t_p^2) * (n - i + 1))``
    with ``df = n - i - 1`` and ``t_p`` the ``1 - alpha/(2(n-i+1))``
    Student-t quantile, for i = 1..k."""
    out = []
    for i in range(1, k + 1):
        df = n - i - 1
        if df < 1:
            raise ValueError(f"series too short for round {i} (n={n})")
        p = 1.0 - alpha / (2.0 * (n - i + 1))
        tp = t_ppf(p, df)
        out.append(
            (n - i) * tp / math.sqrt((df + tp * tp) * (n - i + 1.0))
        )
    return out


def sax_breakpoints(alphabet: int) -> list[float]:
    """The ``alphabet - 1`` equiprobable N(0,1) breakpoints SAX uses."""
    if alphabet < 2:
        raise ValueError("alphabet must be >= 2")
    return [norm_ppf(i / alphabet) for i in range(1, alphabet)]
