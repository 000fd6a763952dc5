"""Discrete correlation kernels (DCF / ACF).

Numpy mirrors of the reference correlation module
(reference: src/correlation/dcf.rs, src/correlation/acf.rs). The
Spark-side distributed variant is a range self-join
(chronoxtract_spark.operators.dcf); this kernel is the parity oracle
and the per-group applyInPandas implementation.

sigma is the **sample** std (divide by n-1, src/correlation/dcf.rs:37-38);
bins are ``[bin_min, bin_max)`` built by repeated addition of the bin
width from lag_min (so the last partial bin is dropped exactly like the
reference's ``windows(2)`` over the bin-edge list); empty bins are
skipped.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["dcf", "acf"]


def _bin_edges(lag_min: float, lag_max: float, width: float) -> np.ndarray:
    """Edges by repeated addition, matching the reference's accumulation
    loop (src/correlation/dcf.rs:40-45) including its float drift."""
    edges = []
    cur = lag_min
    while cur <= lag_max:
        edges.append(cur)
        cur += width
    return np.asarray(edges)


def dcf(
    t1: np.ndarray,
    v1: np.ndarray,
    t2: np.ndarray,
    v2: np.ndarray,
    lag_min: float,
    lag_max: float,
    lag_bin_width: float,
) -> dict:
    """Edelson & Krolik (1988) discrete correlation function
    (src/correlation/dcf.rs:25-75).

    Returns dict of lags / correlations / errors, skipping empty bins.
    """
    t1 = np.asarray(t1, dtype=np.float64)
    v1 = np.asarray(v1, dtype=np.float64)
    t2 = np.asarray(t2, dtype=np.float64)
    v2 = np.asarray(v2, dtype=np.float64)
    if t1.size < 2 or t2.size < 2:
        raise ValueError("Time series must have at least 2 points")

    n1, n2 = v1.size, v2.size
    mean1 = float(np.sum(v1)) / n1
    mean2 = float(np.sum(v2)) / n2
    std1 = math.sqrt(float(np.sum((v1 - mean1) ** 2)) / (n1 - 1))
    std2 = math.sqrt(float(np.sum((v2 - mean2) ** 2)) / (n2 - 1))

    # all pairwise lags and UDCF values (vectorized outer products)
    lags = t2[None, :] - t1[:, None]  # (n1, n2)
    udcf = (v1[:, None] - mean1) * (v2[None, :] - mean2) / (std1 * std2)
    lags = lags.ravel()
    udcf = udcf.ravel()

    edges = _bin_edges(lag_min, lag_max, lag_bin_width)
    out_lags: list[float] = []
    out_corr: list[float] = []
    out_err: list[float] = []
    for lo, hi in zip(edges[:-1], edges[1:]):
        sel = (lags >= lo) & (lags < hi)
        vals = udcf[sel]
        if vals.size == 0:
            continue
        n = vals.size
        m = float(np.sum(vals)) / n
        if n > 1:
            se = math.sqrt(float(np.sum((vals - m) ** 2)) / (n - 1)) / math.sqrt(n)
        else:
            se = float("nan")  # matches the reference's 0/0 for n=1
        out_lags.append((lo + hi) / 2.0)
        out_corr.append(m)
        out_err.append(se)
    return {
        "lags": np.asarray(out_lags),
        "correlations": np.asarray(out_corr),
        "errors": np.asarray(out_err),
    }


def acf(
    t: np.ndarray,
    v: np.ndarray,
    lag_min: float,
    lag_max: float,
    lag_bin_width: float,
) -> dict:
    """DCF of a series with itself (src/correlation/acf.rs:5-12)."""
    return dcf(t, v, t, v, lag_min, lag_max, lag_bin_width)
