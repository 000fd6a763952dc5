"""Peak detection kernels.

Numpy/python mirrors of the reference peak functions
(reference: src/peaks/peak_func.rs). ``find_peaks`` keeps the
reference's left-to-right greedy scan with plateau-midpoint handling;
``peak_prominence`` keeps the take-while contiguous-run semantics
(stop at the first value strictly above the peak).
"""

from __future__ import annotations

import numpy as np

__all__ = ["find_peaks", "peak_prominence"]


def find_peaks(
    data: np.ndarray,
    height: float | None = None,
    distance: int | None = None,
) -> np.ndarray:
    """Local maxima with plateau midpoints, optional min height and greedy
    min-distance filtering (src/peaks/peak_func.rs:1-40).

    A candidate starts where ``x[i] > x[i-1]`` and ``x[i] >= x[i+1]``;
    plateaus of equal values collapse to their midpoint; the run must
    drop on the right to count as a peak.
    """
    x = np.asarray(data, dtype=np.float64)
    n = x.size
    peaks: list[int] = []
    if n < 3:
        return np.asarray(peaks, dtype=np.int64)
    i = 1
    while i < n - 1:
        if x[i] > x[i - 1] and x[i] >= x[i + 1]:
            plateau_start = i
            plateau_end = i
            while plateau_end < n - 1 and x[plateau_end] == x[plateau_end + 1]:
                plateau_end += 1
            # must fall off on the right (a plateau running to the array
            # edge has no right neighbor and is not a peak)
            if plateau_end + 1 < n and x[plateau_start] > x[plateau_end + 1]:
                peak_pos = (plateau_start + plateau_end) // 2
                ok = True
                if height is not None and x[peak_pos] < height:
                    ok = False
                if ok and distance is not None and peaks:
                    if peak_pos - peaks[-1] < distance:
                        ok = False
                if ok:
                    peaks.append(peak_pos)
            i = plateau_end + 1
        else:
            i += 1
    return np.asarray(peaks, dtype=np.int64)


def peak_prominence(data: np.ndarray, peaks: np.ndarray) -> np.ndarray:
    """Per-peak prominence with take-while contiguous-run base search
    (src/peaks/peak_func.rs:42-63).

    Walking outward from the peak, only values <= the peak value are
    considered; the walk stops at the first strictly higher value. The
    base is the max of the two side minima (or the available one).
    """
    x = np.asarray(data, dtype=np.float64)
    out = np.empty(len(peaks))
    for k, p in enumerate(np.asarray(peaks, dtype=np.int64)):
        pv = x[p]
        left_min = None
        for j in range(p - 1, -1, -1):
            if x[j] > pv:
                break
            left_min = x[j] if left_min is None else min(left_min, x[j])
        right_min = None
        for j in range(p + 1, x.size):
            if x[j] > pv:
                break
            right_min = x[j] if right_min is None else min(right_min, x[j])
        if left_min is not None and right_min is not None:
            base = max(left_min, right_min)
        elif left_min is not None:
            base = left_min
        elif right_min is not None:
            base = right_min
        else:
            base = pv
        out[k] = pv - base
    return out
