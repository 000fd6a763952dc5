"""Summary-statistics kernels.

Numpy mirrors of the reference's fused-moment statistics engine
(reference: src/stats/mod.rs:21-130). Each function takes a 1-D float64
array and returns scalars / dicts with the reference's exact semantics:

- variance/std are **population** (divide by n)             [src/stats/mod.rs:46]
- skewness / excess kurtosis come from raw power sums and are
  ``None`` when std <= 1e-9                                 [src/stats/mod.rs:49-64]
- median is the sorted midpoint (even n averaged)           [src/stats/mod.rs:91-95]
- quantiles interpolate linearly at ``pos = q*(n-1)``       [src/stats/mod.rs:98-111]
- mode counts bit-exact f64 values; the reference's tie-break is
  HashMap iteration order (nondeterministic) — we use the smallest
  value among the most frequent, a documented divergence    [src/stats/mod.rs:116-130]

These kernels are the parity oracle for the Spark aggregate layer, and
are also executed directly inside applyInPandas for per-window feature
rows.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "summary_statistics",
    "time_series_summary",
    "median_and_quantiles",
    "mode",
    "mean",
    "variance",
    "std_dev",
    "skewness",
    "kurtosis",
    "min_max_range",
    "quantiles",
    "series_sum",
    "absolute_energy",
    "validate_series",
    "EPS_STD",
]

# Degenerate-spread guard under which skew/kurt are undefined
# (reference: src/stats/mod.rs:49).
EPS_STD = 1e-9

QUANTILE_PROBS = (0.05, 0.25, 0.75, 0.95)


def validate_series(x: np.ndarray, name: str = "time_series") -> np.ndarray:
    """Reject empty or NaN-bearing input (reference: src/lib.rs:63-69)."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim != 1:
        raise ValueError(f"{name} must be 1-D")
    if x.size == 0:
        raise ValueError(f"Input {name} cannot be empty")
    if np.isnan(x).any():
        raise ValueError(f"Input {name} cannot contain NaN values")
    return x


def summary_statistics(x: np.ndarray) -> dict:
    """Fused one-pass moment engine (reference: src/stats/mod.rs:21-79).

    Returns raw-moment-derived mean/variance/std/skew/kurt plus
    min/max/range/sum/energy. skewness & kurtosis are None when the
    population std is <= 1e-9.
    """
    x = np.asarray(x, dtype=np.float64)
    n = float(x.size)
    x2 = x * x
    s1 = float(np.sum(x))
    s2 = float(np.sum(x2))
    s3 = float(np.sum(x2 * x))
    s4 = float(np.sum(x2 * x2))
    mn = float(np.min(x))
    mx = float(np.max(x))

    m1 = s1 / n
    m2 = s2 / n
    m3 = s3 / n
    m4 = s4 / n

    var = m2 - m1 * m1
    std = math.sqrt(var) if var > 0 else 0.0

    skew = kurt = None
    if std > EPS_STD:
        mu3 = m3 - 3.0 * m1 * m2 + 2.0 * m1 ** 3
        mu4 = m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2 - 3.0 * m1 ** 4
        skew = mu3 / var ** 1.5
        kurt = mu4 / (var * var) - 3.0

    return {
        "mean": m1,
        "variance": var,
        "std_dev": std,
        "skewness": skew,
        "kurtosis": kurt,
        "min": mn,
        "max": mx,
        "range": mx - mn,
        "sum": s1,
        "energy": s2,
    }


def median_and_quantiles(x: np.ndarray) -> tuple[float, np.ndarray]:
    """Sorted-midpoint median + linearly interpolated quantiles
    (reference: src/stats/mod.rs:81-114)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n == 0:
        return float("nan"), np.full(4, np.nan)
    s = np.sort(x)
    if n % 2 == 0:
        med = (s[n // 2 - 1] + s[n // 2]) / 2.0
    else:
        med = s[n // 2]
    qs = np.empty(len(QUANTILE_PROBS))
    for k, q in enumerate(QUANTILE_PROBS):
        pos = q * (n - 1)
        lo = math.floor(pos)
        hi = math.ceil(pos)
        if lo == hi:
            qs[k] = s[lo]
        else:
            frac = pos - lo
            qs[k] = s[lo] * (1.0 - frac) + s[hi] * frac
    return float(med), qs


def mode(x: np.ndarray) -> float:
    """Most frequent bit-exact f64 (reference: src/stats/mod.rs:116-130).

    The reference's tie-break is HashMap iteration order and therefore
    nondeterministic; we deterministically return the smallest value
    among the most frequent.
    """
    x = np.asarray(x, dtype=np.float64)
    bits = x.view(np.uint64)
    uniq_bits, counts = np.unique(bits, return_counts=True)
    winners = uniq_bits[counts == counts.max()]
    return float(np.min(winners.view(np.float64)))


def time_series_summary(x: np.ndarray) -> dict:
    """The flagship 16-key feature dict (reference: src/lib.rs:58-99)."""
    x = validate_series(x)
    stats = summary_statistics(x)
    med, qs = median_and_quantiles(x)
    out = {
        "mean": stats["mean"],
        "median": med,
        "mode": mode(x),
        "variance": stats["variance"],
        "std_dev": stats["std_dev"],
        "min": stats["min"],
        "max": stats["max"],
        "range": stats["range"],
        "q05": float(qs[0]),
        "q25": float(qs[1]),
        "q75": float(qs[2]),
        "q95": float(qs[3]),
        "sum": stats["sum"],
        "absolute_energy": stats["energy"],
    }
    # skew/kurt conditionally present, mirroring the reference's dict
    if stats["skewness"] is not None:
        out["skewness"] = stats["skewness"]
    if stats["kurtosis"] is not None:
        out["kurtosis"] = stats["kurtosis"]
    return out


def mean(x: np.ndarray) -> float:
    return summary_statistics(validate_series(x))["mean"]


def variance(x: np.ndarray) -> float:
    return summary_statistics(validate_series(x))["variance"]


def std_dev(x: np.ndarray) -> float:
    return summary_statistics(validate_series(x))["std_dev"]


def skewness(x: np.ndarray):
    return summary_statistics(validate_series(x))["skewness"]


def kurtosis(x: np.ndarray):
    return summary_statistics(validate_series(x))["kurtosis"]


def min_max_range(x: np.ndarray) -> tuple[float, float, float]:
    s = summary_statistics(validate_series(x))
    return s["min"], s["max"], s["range"]


def quantiles(x: np.ndarray) -> np.ndarray:
    return median_and_quantiles(validate_series(x))[1]


def series_sum(x: np.ndarray) -> float:
    return summary_statistics(validate_series(x))["sum"]


def absolute_energy(x: np.ndarray) -> float:
    return summary_statistics(validate_series(x))["energy"]
