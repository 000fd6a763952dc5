"""Matrix-representation kernels: Hankel embedding, GASF, MTF.

Numpy mirrors of the reference matrices module
(reference: src/matrices/mod.rs). The reference's rayon thresholds
(>=512 / >=128 rows) become Spark task parallelism over groups; these
kernels are plain vectorized numpy.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "time_delay_embedding",
    "gramian_angular_summation_field",
    "markov_transition_field",
]


def _validate(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    if x.size == 0:
        raise ValueError("Input time series cannot be empty")
    if not np.isfinite(x).all():
        raise ValueError("Input time series must contain only finite values")
    return x


def _degenerate_range(mn: float, mx: float) -> bool:
    """Relative-epsilon degenerate-range test (src/matrices/mod.rs:26-29)."""
    scale = max(abs(mn), abs(mx), 1.0)
    return abs(mx - mn) <= 1e-12 * scale


def time_delay_embedding(x: np.ndarray, window_length: int) -> np.ndarray:
    """Hankel matrix H[i,j] = x[i+j], shape (n-L+1, L)
    (src/matrices/mod.rs:52-97)."""
    x = _validate(x)
    if window_length == 0:
        raise ValueError("window_length must be greater than 0")
    if window_length > x.size:
        raise ValueError(
            "window_length must be less than or equal to time series length"
        )
    return np.lib.stride_tricks.sliding_window_view(x, window_length).copy()


def gramian_angular_summation_field(x: np.ndarray) -> np.ndarray:
    """GASF G = x'x'^T - sqrt(1-x'^2) sqrt(1-x'^2)^T over the [-1,1]
    min-max normalized series; degenerate range -> zeros normalization
    (src/matrices/mod.rs:122-171)."""
    x = _validate(x)
    mn, mx = float(np.min(x)), float(np.max(x))
    if _degenerate_range(mn, mx):
        norm = np.zeros(x.size)
    else:
        norm = np.clip(2.0 * (x - mn) / (mx - mn) - 1.0, -1.0, 1.0)
    sin_c = np.sqrt(np.maximum(1.0 - norm * norm, 0.0))
    return np.outer(norm, norm) - np.outer(sin_c, sin_c)


def markov_transition_field(x: np.ndarray, num_bins: int) -> np.ndarray:
    """MTF M[i,j] = P[q_i, q_j] from the row-normalized first-order
    transition matrix over Q equal-width bins (src/matrices/mod.rs:197-269)."""
    x = _validate(x)
    if num_bins < 2:
        raise ValueError("num_bins must be at least 2")
    n = x.size
    mn, mx = float(np.min(x)), float(np.max(x))
    if _degenerate_range(mn, mx):
        bins = np.zeros(n, dtype=np.int64)
    else:
        scaled = np.clip((x - mn) / (mx - mn), 0.0, 1.0)
        bins = np.minimum(
            np.floor(scaled * num_bins).astype(np.int64), num_bins - 1
        )
    trans = np.zeros((num_bins, num_bins))
    np.add.at(trans, (bins[:-1], bins[1:]), 1.0)
    row_sums = trans.sum(axis=1, keepdims=True)
    nz = row_sums.ravel() > 0
    trans[nz] /= row_sums[nz]
    return trans[np.ix_(bins, bins)]
