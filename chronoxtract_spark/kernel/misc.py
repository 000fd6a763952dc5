"""Fractional variability & variability-timescale kernels.

Numpy mirrors of the reference misc module (reference: src/misc/frac.rs,
src/misc/var.rs). Fvar uses **sample** variance (divide by n-1,
src/misc/frac.rs:31-35) — unlike the stats module's population variance.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "fractional_variability",
    "fractional_variability_error",
    "rolling_fractional_variability",
    "variability_timescale",
    "variability_statistics",
]


def _fvar_parts(flux: np.ndarray, flux_err: np.ndarray):
    if flux.size == 0 or flux_err.size != flux.size:
        raise ValueError("Input arrays are empty or have mismatched lengths.")
    if np.any(flux < 0.0):
        raise ValueError("Flux values cannot be negative.")
    n = flux.size
    mean_flux = float(np.sum(flux)) / n
    if mean_flux == 0.0:
        return None  # NaN result downstream
    if n < 2:
        raise ValueError("Input arrays must have at least two elements.")
    var = float(np.sum((flux - mean_flux) ** 2)) / (n - 1)
    mean_err_sq = float(np.sum(flux_err**2)) / n
    return n, mean_flux, var, mean_err_sq


def fractional_variability(flux: np.ndarray, flux_err: np.ndarray) -> float:
    """Fvar = sqrt(S^2 - <err^2>) / <x>; 0 when noise dominates, NaN for
    zero mean flux (src/misc/frac.rs:12-47)."""
    flux = np.asarray(flux, dtype=np.float64)
    flux_err = np.asarray(flux_err, dtype=np.float64)
    parts = _fvar_parts(flux, flux_err)
    if parts is None:
        return float("nan")
    n, mean_flux, var, mean_err_sq = parts
    if var <= mean_err_sq:
        return 0.0
    return math.sqrt(var - mean_err_sq) / mean_flux


def fractional_variability_error(flux: np.ndarray, flux_err: np.ndarray) -> float:
    """Vaughan et al. (2003) error propagation (src/misc/frac.rs:49-89)."""
    flux = np.asarray(flux, dtype=np.float64)
    flux_err = np.asarray(flux_err, dtype=np.float64)
    parts = _fvar_parts(flux, flux_err)
    if parts is None:
        return float("nan")
    n, mean_flux, var, mean_err_sq = parts
    if var <= mean_err_sq:
        return 0.0
    fvar = math.sqrt(var - mean_err_sq) / mean_flux
    term1 = math.sqrt(1.0 / (2.0 * n)) * mean_err_sq / (mean_flux * mean_flux * fvar)
    term2 = math.sqrt(mean_err_sq / n) / mean_flux
    return math.sqrt(term1 * term1 + term2 * term2)


def rolling_fractional_variability(
    flux: np.ndarray, flux_err: np.ndarray, window_size: int
) -> tuple[np.ndarray, np.ndarray]:
    """Fvar + error per complete trailing window (src/misc/frac.rs:95-115)."""
    flux = np.asarray(flux, dtype=np.float64)
    flux_err = np.asarray(flux_err, dtype=np.float64)
    if (
        flux.size == 0
        or flux_err.size != flux.size
        or window_size == 0
        or flux.size < window_size
    ):
        raise ValueError("Invalid input for rolling fractional variability.")
    m = flux.size - window_size + 1
    fv = np.empty(m)
    fe = np.empty(m)
    for i in range(m):
        fv[i] = fractional_variability(
            flux[i : i + window_size], flux_err[i : i + window_size]
        )
        fe[i] = fractional_variability_error(
            flux[i : i + window_size], flux_err[i : i + window_size]
        )
    return fv, fe


def _tau_values(
    time: np.ndarray, flux: np.ndarray, flux_err: np.ndarray
) -> np.ndarray:
    """Adjacent-pair variability timescales tau = dt / |ln(f2/f1)| over
    significant, positive, time-increasing pairs (src/misc/var.rs:7-47)."""
    dt = time[1:] - time[:-1]
    f1, f2 = flux[:-1], flux[1:]
    with np.errstate(divide="ignore", invalid="ignore"):
        dlnf = np.abs(np.log(np.where((f1 > 0) & (f2 > 0), f2 / f1, 1.0)))
    combined_err = np.sqrt(flux_err[:-1] ** 2 + flux_err[1:] ** 2)
    ok = (
        (dt > 0.0)
        & (f1 > 0.0)
        & (f2 > 0.0)
        & (dlnf != 0.0)
        & (np.abs(f2 - f1) >= combined_err)
    )
    return dt[ok] / dlnf[ok]


def variability_timescale(
    time: np.ndarray, flux: np.ndarray, flux_err: np.ndarray
) -> float | None:
    """Minimum tau over significant adjacent pairs (src/misc/var.rs:7-47)."""
    time = np.asarray(time, dtype=np.float64)
    flux = np.asarray(flux, dtype=np.float64)
    flux_err = np.asarray(flux_err, dtype=np.float64)
    if time.size < 2 or flux.size < 2 or flux_err.size < 2:
        return None
    taus = _tau_values(time, flux, flux_err)
    if taus.size == 0:
        return None
    return float(np.min(taus))


def variability_statistics(
    time: np.ndarray, flux: np.ndarray, flux_err: np.ndarray
) -> dict:
    """min/max/mean/median/std(÷n)/count over the tau population
    (src/misc/var.rs:62-150)."""
    time = np.asarray(time, dtype=np.float64)
    flux = np.asarray(flux, dtype=np.float64)
    flux_err = np.asarray(flux_err, dtype=np.float64)
    empty = {
        "min": None,
        "max": None,
        "mean": None,
        "median": None,
        "std_dev": None,
        "count": 0,
    }
    if time.size < 2 or flux.size < 2 or flux_err.size < 2:
        return empty
    taus = np.sort(_tau_values(time, flux, flux_err))
    n = taus.size
    if n == 0:
        return empty
    mean = float(np.sum(taus)) / n
    median = (
        (taus[n // 2 - 1] + taus[n // 2]) / 2.0 if n % 2 == 0 else taus[n // 2]
    )
    std = math.sqrt(float(np.sum((taus - mean) ** 2)) / n)
    return {
        "min": float(taus[0]),
        "max": float(taus[-1]),
        "mean": mean,
        "median": float(median),
        "std_dev": std,
        "count": int(n),
    }
