"""Hjorth parameters and higher central moments.

Numpy mirrors of the reference higher-order module
(reference: src/higherorder/mod.rs). All variances divide by n
(population) per src/higherorder/mod.rs:115-118,175-183.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "hjorth_activity",
    "hjorth_mobility",
    "hjorth_complexity",
    "hjorth_parameters",
    "central_moment",
    "higher_moments",
]


def _var_pop(x: np.ndarray) -> float:
    if x.size == 0:
        return 0.0
    return float(np.var(x, ddof=0))


def hjorth_activity(x: np.ndarray) -> float:
    """Population variance of the signal (src/higherorder/mod.rs:115-118)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size == 0:
        raise ValueError("Input time series cannot be empty")
    return _var_pop(x)


def hjorth_mobility(x: np.ndarray) -> float:
    """sqrt(var(diff(x)) / var(x)); 0 for flat signals
    (src/higherorder/mod.rs:120-139)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size < 2:
        raise ValueError("Time series must have at least 2 points for mobility")
    act = _var_pop(x)
    if act <= 0.0:
        return 0.0
    dvar = _var_pop(np.diff(x))
    return math.sqrt(dvar / act)


def hjorth_complexity(x: np.ndarray) -> float:
    """mobility(diff(x)) / mobility(x); 1.0 for degenerate signals
    (src/higherorder/mod.rs:141-173)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size < 3:
        raise ValueError("Time series must have at least 3 points for complexity")
    d1 = np.diff(x)
    d2 = np.diff(d1)
    v1 = _var_pop(d1)
    v2 = _var_pop(d2)
    if v1 <= 0.0:
        return 1.0
    mob = hjorth_mobility(x)
    if mob <= 0.0:
        return 1.0
    return math.sqrt(v2 / v1) / mob


def hjorth_parameters(x: np.ndarray) -> tuple[float, float, float]:
    x = np.asarray(x, dtype=np.float64)
    if x.size < 3:
        raise ValueError(
            "Time series must have at least 3 points for Hjorth parameters"
        )
    return hjorth_activity(x), hjorth_mobility(x), hjorth_complexity(x)


def central_moment(x: np.ndarray, order: int) -> float:
    """Two-pass central moment Σ(x-μ)^k / n
    (src/higherorder/mod.rs:192-203)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size == 0:
        return 0.0
    mu = float(np.sum(x)) / x.size
    return float(np.sum((x - mu) ** order)) / x.size


def higher_moments(x: np.ndarray) -> tuple[float, float, float, float]:
    """(m5, m6, m7, m8) central moments (src/higherorder/mod.rs:63-71)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size == 0:
        raise ValueError("Input time series cannot be empty")
    return tuple(central_moment(x, k) for k in (5, 6, 7, 8))
