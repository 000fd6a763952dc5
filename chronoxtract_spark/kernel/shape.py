"""Shape-feature kernels.

Numpy mirrors of the reference shape module (reference: src/shape/mod.rs).
Notable reference semantics preserved here:

- zero crossings treat 0 as positive (``x >= 0``)        [src/shape/mod.rs:180-194]
- ``variability_features`` quartiles are plain sorted-index
  ``sorted[n/4] / sorted[n/2] / sorted[3n/4]`` — a different quantile
  method than the stats module                            [src/shape/mod.rs:392-437]
- ``enhanced_peak_stats`` uses strict local maxima and a *global*
  left/right-minimum prominence, different from
  peaks.peak_prominence                                   [src/shape/mod.rs:224-304]
- energy entropy uses natural log                         [src/shape/mod.rs:461-498]
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "zero_crossing_rate",
    "slope_features",
    "turning_points",
    "variability_features",
    "energy_distribution",
    "enhanced_peak_stats",
    "peak_to_peak_amplitude",
]


def zero_crossing_rate(x: np.ndarray) -> float:
    """Sign changes (0 counted positive) / (n-1) (src/shape/mod.rs:180-194)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size < 2:
        raise ValueError("Time series must have at least 2 points")
    pos = x >= 0.0
    crossings = int(np.count_nonzero(pos[1:] != pos[:-1]))
    return crossings / (x.size - 1)


def slope_features(x: np.ndarray) -> tuple[float, float, float]:
    """(mean slope, population slope variance, max |slope|) over first
    differences (src/shape/mod.rs:196-222)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size < 2:
        raise ValueError("Time series must have at least 2 points")
    d = np.diff(x)
    m = float(np.mean(d))
    v = float(np.var(d, ddof=0))
    mx = float(np.max(np.abs(d))) if d.size else 0.0
    return m, v, mx


def turning_points(x: np.ndarray) -> tuple[int, float]:
    """Count of strict local extrema; rate over (n-2)
    (src/shape/mod.rs:439-459)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n < 3:
        raise ValueError("Time series must have at least 3 points")
    mid, left, right = x[1:-1], x[:-2], x[2:]
    is_max = (mid > left) & (mid > right)
    is_min = (mid < left) & (mid < right)
    cnt = int(np.count_nonzero(is_max | is_min))
    return cnt, cnt / (n - 2)


def variability_features(x: np.ndarray) -> tuple[float, float, float, float]:
    """(cv, qcd, mad, iqr) with sorted-index quartiles
    (src/shape/mod.rs:392-437)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n == 0:
        raise ValueError("Input time series cannot be empty")
    mu = float(np.mean(x))
    std = math.sqrt(float(np.var(x, ddof=0)))
    cv = std / abs(mu) if mu != 0.0 else 0.0
    s = np.sort(x)
    q1 = float(s[n // 4])
    q2 = float(s[n // 2])
    q3 = float(s[3 * n // 4])
    qcd = (q3 - q1) / (q3 + q1) if (q1 + q3) != 0.0 else 0.0
    dev = np.sort(np.abs(x - q2))
    mad = float(dev[dev.size // 2])
    return cv, qcd, mad, q3 - q1


def energy_distribution(x: np.ndarray) -> tuple[float, float, float]:
    """(energy entropy ln, normalized energy, top-10% concentration)
    (src/shape/mod.rs:461-498)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n == 0:
        raise ValueError("Input time series cannot be empty")
    e = x * x
    tot = float(np.sum(e))
    if tot == 0.0:
        return 0.0, 0.0, 0.0
    p = e[e > 0.0] / tot
    entropy = float(-np.sum(p * np.log(p)))
    normalized = tot / n
    k = math.ceil(n * 0.1)
    top = np.sort(e)[::-1][:k]
    concentration = float(np.sum(top)) / tot
    return entropy, normalized, concentration


def _prominence_arrays(x: np.ndarray):
    """Prefix/suffix minima enabling O(1) global-prominence lookups."""
    n = x.size
    prefix = np.minimum.accumulate(x)
    suffix = np.minimum.accumulate(x[::-1])[::-1]
    return prefix, suffix


def _strict_peaks_with_prominence(
    x: np.ndarray, min_prominence: float, min_distance: int
) -> list[int]:
    """Strict local maxima filtered by global-minima prominence, then a
    greedy min-distance pass (src/shape/mod.rs:258-320). Candidates and
    prominences vectorize over prefix/suffix minima."""
    n = x.size
    if n < 3:
        return []
    mid = x[1:-1]
    cand = np.flatnonzero((mid > x[:-2]) & (mid > x[2:])) + 1
    if cand.size == 0:
        return []
    prefix, suffix = _prominence_arrays(x)
    left = np.minimum(prefix[cand - 1], x[cand])
    right = np.minimum(suffix[cand + 1], x[cand])
    prom = x[cand] - np.maximum(left, right)
    peaks = [int(i) for i in cand[prom >= min_prominence]]
    if len(peaks) <= 1:
        return peaks
    filtered = [peaks[0]]
    for p in peaks[1:]:
        if p - filtered[-1] >= min_distance:
            filtered.append(p)
    return filtered


def _global_prominence(x: np.ndarray, i: int) -> float:
    """Peak minus max(global left min, global right min), each side
    defaulting to the peak value at array edges (src/shape/mod.rs:289-304)."""
    pv = x[i]
    left = float(np.min(x[:i])) if i > 0 else pv
    right = float(np.min(x[i + 1 :])) if i + 1 < x.size else pv
    left = min(left, pv)
    right = min(right, pv)
    return pv - max(left, right)


def _peak_amplitudes(x: np.ndarray, peaks: list[int]) -> tuple[float, list[float]]:
    """Consecutive-peak amplitudes vs the min between them
    (src/shape/mod.rs:354-390)."""
    amps: list[float] = []
    for a, b in zip(peaks, peaks[1:]):
        between = float(np.min(x[a : b + 1]))
        amps.append(max(x[a] - between, x[b] - between))
    mx = max(amps) if amps else 0.0
    return max(mx, 0.0), amps


def enhanced_peak_stats(
    x: np.ndarray,
    min_prominence: float | None = None,
    min_distance: int | None = None,
) -> tuple[int, float, float, float, float, float]:
    """(n_peaks, mean prominence, mean spacing, mean half-prominence
    width, max p2p amplitude, peak density) (src/shape/mod.rs:224-352)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size < 3:
        raise ValueError("Time series must have at least 3 points")
    prom = 0.1 if min_prominence is None else float(min_prominence)
    dist = 1 if min_distance is None else int(min_distance)
    peaks = _strict_peaks_with_prominence(x, prom, dist)
    if not peaks:
        return 0, 0.0, 0.0, 0.0, 0.0, 0.0
    prefix, suffix = _prominence_arrays(x)
    pk = np.asarray(peaks)
    proms = (
        x[pk]
        - np.maximum(
            np.minimum(prefix[pk - 1], x[pk]), np.minimum(suffix[pk + 1], x[pk])
        )
    ).tolist()
    mean_prom = sum(proms) / len(proms)
    spacings = [float(b - a) for a, b in zip(peaks, peaks[1:])]
    mean_spacing = sum(spacings) / len(spacings) if spacings else 0.0
    # half-prominence width walk (src/shape/mod.rs:322-352)
    total_w = 0.0
    for p, pr_v in zip(peaks, proms):
        level = x[p] - pr_v / 2.0
        li = p
        while li > 0 and x[li] > level:
            li -= 1
        ri = p
        while ri < x.size - 1 and x[ri] > level:
            ri += 1
        total_w += ri - li
    mean_width = total_w / len(peaks)
    max_p2p, _ = _peak_amplitudes(x, peaks)
    density = len(peaks) / x.size
    return len(peaks), mean_prom, mean_spacing, mean_width, max_p2p, density


def peak_to_peak_amplitude(x: np.ndarray) -> tuple[float, float, float]:
    """(max, mean, std÷n) of consecutive-peak amplitudes using the
    strict-peak finder at prominence 0.01 (src/shape/mod.rs:354-390)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size < 3:
        raise ValueError("Time series must have at least 3 points")
    peaks = _strict_peaks_with_prominence(x, 0.01, 1)
    mx, amps = _peak_amplitudes(x, peaks)
    if not amps:
        return 0.0, 0.0, 0.0
    a = np.asarray(amps)
    m = float(np.mean(a))
    return mx, m, math.sqrt(float(np.var(a, ddof=0)))
