"""Seasonality / trend kernels.

Numpy mirrors of the reference seasonality module
(reference: src/seasonality/mod.rs). The STL here is the reference's
"simple" decomposition: centered edge-truncated moving-average trend of
window ``int(period * 1.5)``, per-phase seasonal means, remainder.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "moving_average",
    "simple_stl_decomposition",
    "seasonal_trend_strength",
    "seasonal_strength",
    "trend_strength",
    "autocorrelation",
    "detect_seasonality",
    "detrended_fluctuation_analysis",
]


def _var_pop(x: np.ndarray) -> float:
    if x.size == 0:
        return 0.0
    return float(np.var(x, ddof=0))


def moving_average(x: np.ndarray, window_size: int) -> np.ndarray:
    """Centered, edge-truncated moving average with half window
    ``window_size // 2`` (src/seasonality/mod.rs:215-230)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    half = window_size // 2
    c = np.concatenate(([0.0], np.cumsum(x)))
    idx = np.arange(n)
    start = np.maximum(idx - half, 0)
    end = np.minimum(idx + half + 1, n)
    return (c[end] - c[start]) / (end - start)


def simple_stl_decomposition(
    x: np.ndarray, period: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(trend, seasonal, remainder) (src/seasonality/mod.rs:172-213)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if period == 0 or period > n:
        raise ValueError("Period must be positive and not larger than the series")
    window_size = int(period * 1.5)
    trend = moving_average(x, window_size)
    detrended = x - trend
    phase = np.arange(n) % period
    pattern = np.zeros(period)
    counts = np.bincount(phase, minlength=period)
    sums = np.bincount(phase, weights=detrended, minlength=period)
    nz = counts > 0
    pattern[nz] = sums[nz] / counts[nz]
    seasonal = pattern[phase]
    remainder = x - trend - seasonal
    return trend, seasonal, remainder


def seasonal_trend_strength(x: np.ndarray, period: int) -> tuple[float, float]:
    """(seasonal_strength, trend_strength) from variance ratios, clamped
    >= 0 (src/seasonality/mod.rs:148-170)."""
    trend, seasonal, remainder = simple_stl_decomposition(x, period)
    var_rem = _var_pop(remainder)
    var_sr = _var_pop(seasonal + remainder)
    var_tr = _var_pop(trend + remainder)
    s = 1.0 - max(var_rem / var_sr, 0.0) if var_sr > 0.0 else 0.0
    t = 1.0 - max(var_rem / var_tr, 0.0) if var_tr > 0.0 else 0.0
    return max(s, 0.0), max(t, 0.0)


def seasonal_strength(x: np.ndarray, period: int) -> float:
    return seasonal_trend_strength(x, period)[0]


def trend_strength(x: np.ndarray, period: int) -> float:
    return seasonal_trend_strength(x, period)[1]


def autocorrelation(x: np.ndarray, lag: int) -> float:
    """Normalized autocovariance at one lag (src/seasonality/mod.rs:238-265)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if lag >= n:
        return 0.0
    mu = float(np.mean(x)) if n else 0.0
    c = x - mu
    num = float(np.sum(c[: n - lag] * c[lag:]))
    den = float(np.sum(c * c))
    return num / den if den > 0.0 else 0.0


def detect_seasonality(x: np.ndarray, period: int, threshold: float = 0.3) -> bool:
    """|ACF(period)| > threshold (src/seasonality/mod.rs:232-236)."""
    return abs(autocorrelation(x, period)) > threshold


def _linear_fit(y: np.ndarray) -> tuple[float, float]:
    """Closed-form OLS over the implicit index 0..n-1
    (src/seasonality/mod.rs:334-347)."""
    n = y.size
    nf = float(n)
    sum_x = nf * (nf - 1.0) / 2.0
    sum_y = float(np.sum(y))
    sum_xx = nf * (nf - 1.0) * (2.0 * nf - 1.0) / 6.0
    sum_xy = float(np.sum(np.arange(n) * y))
    slope = (nf * sum_xy - sum_x * sum_y) / (nf * sum_xx - sum_x * sum_x)
    intercept = (sum_y - slope * sum_x) / nf
    return slope, intercept


def detrended_fluctuation_analysis(
    x: np.ndarray,
    min_window: int = 4,
    max_window: int | None = None,
    num_windows: int = 10,
) -> float:
    """DFA scaling exponent alpha: integrate the centered series,
    per-window OLS detrend -> RMS fluctuation over log-spaced windows,
    log-log OLS slope (src/seasonality/mod.rs:267-366)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if max_window is None:
        max_window = n // 4
    if num_windows < 3:
        raise ValueError("num_windows must be at least 3")
    integrated = np.cumsum(x - float(np.mean(x)))

    log_min = np.log(min_window)
    log_max = np.log(max_window)
    log_step = (log_max - log_min) / (num_windows - 1)

    sizes: list[int] = []
    flucts: list[float] = []
    for i in range(num_windows):
        ws = int(round(np.exp(log_min + i * log_step)))
        if min_window <= ws <= max_window:
            sizes.append(ws)
            flucts.append(_fluctuation(integrated, ws))
    return _loglog_slope(np.asarray(sizes, dtype=np.float64), np.asarray(flucts))


def _fluctuation(integrated: np.ndarray, window_size: int) -> float:
    """Mean detrended variance over non-overlapping windows, sqrt'd
    (src/seasonality/mod.rs:311-332). All windows detrended at once:
    the closed-form OLS vectorizes over the (k, window) matrix."""
    n = integrated.size
    k = n // window_size
    if k == 0:
        return 0.0
    ws = window_size
    y = integrated[: k * ws].reshape(k, ws)
    idx = np.arange(ws, dtype=np.float64)
    nf = float(ws)
    sum_x = nf * (nf - 1.0) / 2.0
    sum_xx = nf * (nf - 1.0) * (2.0 * nf - 1.0) / 6.0
    sum_y = y.sum(axis=1)
    sum_xy = y @ idx
    slope = (nf * sum_xy - sum_x * sum_y) / (nf * sum_xx - sum_x * sum_x)
    intercept = (sum_y - slope * sum_x) / nf
    resid = y - (slope[:, None] * idx[None, :] + intercept[:, None])
    total = (resid * resid).sum(axis=1) / ws
    return float(np.sqrt(total.sum() / k))


def _loglog_slope(xs: np.ndarray, ys: np.ndarray) -> float:
    if xs.size != ys.size or xs.size < 2:
        return 0.0
    lx = np.log(xs)
    ly = np.log(ys)
    n = float(lx.size)
    sx, sy = float(np.sum(lx)), float(np.sum(ly))
    sxx = float(np.sum(lx * lx))
    sxy = float(np.sum(lx * ly))
    return (n * sxy - sx * sy) / (n * sxx - sx * sx)
