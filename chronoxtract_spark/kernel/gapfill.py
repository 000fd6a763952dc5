"""Numpy twin of the Spark gap-fill (operators.gapfill.gap_fill_minutes).

The dense gap-filled series is a pure function of the observed
(minute, count) points, so kernels that need the dense series (chunk
encoding, window features) can regenerate it from the observed rows
instead of shipping the ~1000x larger dense table through the shuffle
and the Arrow boundary. The arithmetic below uses the exact same
floating-point operation order as the Spark expression
(``prev + (next - prev) * ((t - pt) / (nt - pt))``), so regenerated
values are bit-identical to the materialized 1m tier — asserted by
tests/test_rollup_pipeline.py's chunk round-trip.
"""

from __future__ import annotations

import numpy as np

__all__ = ["dense_from_observed"]

MINUTE = 60


def dense_from_observed(
    t_obs: np.ndarray, v_obs: np.ndarray, interpolate: str = "linear"
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(t_dense, rate, turns, observed_mask) for one conversation.

    ``t_obs``: sorted epoch-second minute buckets; ``v_obs``: per-minute
    counts. The dense spine covers [t_obs[0], t_obs[-1]] at 1-minute
    steps; observed minutes carry their count, gaps interpolate linearly
    between the surrounding observations (time-weighted), matching
    operators.gapfill.gap_fill_minutes bit for bit.
    """
    t_obs = np.asarray(t_obs, dtype=np.int64)
    v_obs = np.asarray(v_obs, dtype=np.float64)
    t0, t1 = int(t_obs[0]), int(t_obs[-1])
    n = (t1 - t0) // MINUTE + 1
    t_dense = t0 + MINUTE * np.arange(n, dtype=np.int64)

    seg = np.searchsorted(t_obs, t_dense, side="right") - 1
    pt = t_obs[seg]
    pv = v_obs[seg]
    is_obs = t_dense == pt
    turns = np.where(is_obs, pv, 0.0)
    if interpolate == "zero":
        rate = np.where(is_obs, pv, 0.0)
        return t_dense, rate, turns, is_obs

    nxt = np.minimum(seg + 1, t_obs.size - 1)
    nt = t_obs[nxt]
    nv = v_obs[nxt]
    denom = (nt - pt).astype(np.float64)
    frac = (t_dense - pt).astype(np.float64) / np.where(denom == 0, 1.0, denom)
    rate = np.where(is_obs, pv, pv + (nv - pv) * frac)
    return t_dense, rate, turns, is_obs
