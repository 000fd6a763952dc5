"""Rolling / expanding window kernels.

Numpy mirrors of the reference rolling-statistics module
(reference: src/rollingstats/mod.rs). All rolling ops emit only
complete trailing windows: output length ``n - w + 1``, first output
covering rows ``[0, w)`` (src/rollingstats/mod.rs:10-16).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "rolling_mean",
    "rolling_variance",
    "expanding_sum",
    "exponential_moving_average",
    "sliding_window_entropy",
]


def _windows(x: np.ndarray, w: int) -> np.ndarray:
    """All complete trailing windows as a (n-w+1, w) strided view."""
    return np.lib.stride_tricks.sliding_window_view(x, w)


def rolling_mean(x: np.ndarray, window: int) -> np.ndarray:
    """Sliding mean over complete windows (src/rollingstats/mod.rs:6-19)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if window <= 0 or window > n:
        return np.empty(0)
    c = np.concatenate(([0.0], np.cumsum(x)))
    return (c[window:] - c[:-window]) / window


def rolling_variance(x: np.ndarray, window: int) -> np.ndarray:
    """Per-window population variance (ddof=0)
    (src/rollingstats/mod.rs:23-35)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if window <= 0 or window > n:
        return np.empty(0)
    w = _windows(x, window)
    return w.var(axis=1, ddof=0)


def expanding_sum(x: np.ndarray) -> np.ndarray:
    """Cumulative sum (src/rollingstats/mod.rs:39-48)."""
    return np.cumsum(np.asarray(x, dtype=np.float64))


def exponential_moving_average(x: np.ndarray, alpha: float) -> np.ndarray:
    """EMA recurrence ``ema_i = a*x_i + (1-a)*ema_{i-1}``, seeded with x0
    (src/rollingstats/mod.rs:52-64)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n == 0:
        return np.empty(0)
    out = np.empty(n)
    out[0] = x[0]
    # sequential recurrence; per-window series are short (<= 1440 points
    # at rollup tiers) so a Python loop inside the Arrow batch is fine,
    # but vectorize via pandas ewm when available for larger windows.
    prev = x[0]
    a = float(alpha)
    for i in range(1, n):
        prev = a * x[i] + (1.0 - a) * prev
        out[i] = prev
    return out


def sliding_window_entropy(x: np.ndarray, window: int, bins: int) -> np.ndarray:
    """Shannon entropy (log2) of an equal-width histogram over each
    trailing window's own min/max; flat windows yield 0
    (src/rollingstats/mod.rs:68-104)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if window <= 0 or window > n or bins <= 0:
        return np.empty(0)
    w = _windows(x, window)  # (m, window)
    mn = w.min(axis=1, keepdims=True)
    mx = w.max(axis=1, keepdims=True)
    rng = mx - mn
    flat = (rng == 0.0).ravel()
    safe_rng = np.where(rng == 0.0, 1.0, rng)
    idx = np.floor((w - mn) / safe_rng * bins).astype(np.int64)
    np.clip(idx, 0, bins - 1, out=idx)
    m = w.shape[0]
    # per-row histogram via bincount on offset bin ids
    offset = idx + (np.arange(m)[:, None] * bins)
    counts = np.bincount(offset.ravel(), minlength=m * bins).reshape(m, bins)
    p = counts / float(window)
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = np.where(p > 0, -p * np.log2(np.where(p > 0, p, 1.0)), 0.0)
    ent = terms.sum(axis=1)
    ent[flat] = 0.0
    return ent
