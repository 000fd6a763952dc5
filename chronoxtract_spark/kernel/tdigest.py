"""Mergeable t-digest quantile sketch (Dunning & Ertl,
"Computing Extremely Accurate Quantiles Using t-Digests",
arXiv:1902.04023) — the north star names this sketch explicitly for
rolling quantiles at the rollup tiers ("rolling quantiles via t-digest
sketches", BASELINE.json:north_star).

Construction: k-space bucketing. Points (or incoming centroids) are
sorted, each gets its mid-weight quantile ``q_i = (cumw_i - w_i/2)/W``,
and clusters are formed by flooring the scale function:
``bucket_i = floor(k1(q_i))`` with ``k1(q) = (d/(2*pi)) * asin(2q-1)``.
Everything inside one bucket merges into a single centroid (weight sum,
weighted mean). This is the paper's §2.1 cluster-assignment form of the
size bound; unlike the sequential accumulate-while-fits loop it is
expressible as pure numpy array ops (argsort, cumsum, arcsin, floor,
reduceat) — no per-point Python, which is what lets the same kernel run
inside an Arrow batch UDF at production scale.

Determinism (required for cross-engine oracles and replay-idempotent
streaming): ties in the sort are broken by (mean, weight); all
reductions are fixed-order numpy ufuncs; there is no RNG anywhere.
Same input (as a multiset, same order after the pinned sort) in, same
centroid array out — bit-for-bit.

Singleton-regime closed form (the oracle validity bound, same pattern
as ivf_ann's train-sample bound): when ``compression`` is large enough
that ``k1(q_{i+1}) - k1(q_i) > 1`` for all adjacent points, every
bucket holds exactly one point, the digest stores every value as a
singleton centroid, and ``quantile()`` reduces to mid-point
interpolation over order statistics at position ``q*n - 0.5`` — the
Hazen / R-5 estimator, which plain SQL can replay exactly. At
production scale the same code path compresses to O(compression)
centroids with the paper's error bound; the accuracy-vs-exact contract
is pinned by tests instead of the oracle.

Digest state is two aligned float64 arrays (means ascending, weights)
— directly storable as Spark ``array<double>`` columns, mergeable by
concatenation + one more bucketing pass.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "tdigest_build",
    "tdigest_merge",
    "tdigest_quantile",
    "tdigest_quantiles",
]


def _k1(q: np.ndarray, compression: float) -> np.ndarray:
    # clip to the open interval: asin(±1) is finite but q==0/1 can
    # arrive as exact endpoints after cumsum rounding
    qc = np.clip(q, 0.0, 1.0)
    return (compression / (2.0 * math.pi)) * np.arcsin(2.0 * qc - 1.0)


def _bucket_merge(
    means: np.ndarray, weights: np.ndarray, compression: float
) -> tuple[np.ndarray, np.ndarray]:
    """One k-space bucketing pass over (mean, weight) pairs.
    Inputs need not be sorted; output means are ascending."""
    if means.size == 0:
        return means.astype(np.float64), weights.astype(np.float64)
    order = np.lexsort((weights, means))  # mean asc, weight asc tie-pin
    m = means[order].astype(np.float64)
    w = weights[order].astype(np.float64)
    total = float(w.sum())
    qmid = (np.cumsum(w) - w / 2.0) / total
    buckets = np.floor(_k1(qmid, compression))
    # merge runs of equal bucket id: reduceat over run starts
    starts = np.flatnonzero(np.r_[True, buckets[1:] != buckets[:-1]])
    wsum = np.add.reduceat(w, starts)
    msum = np.add.reduceat(w * m, starts)
    return msum / wsum, wsum


def tdigest_build(
    values: np.ndarray, compression: float = 100.0
) -> tuple[np.ndarray, np.ndarray]:
    """Build a digest from raw values. Returns (means, weights),
    means ascending. NaNs are rejected (callers filter upstream)."""
    v = np.asarray(values, dtype=np.float64)
    if np.isnan(v).any():
        raise ValueError("tdigest_build: NaN values not allowed")
    return _bucket_merge(v, np.ones_like(v), float(compression))


def tdigest_merge(
    digests: list[tuple[np.ndarray, np.ndarray]], compression: float = 100.0
) -> tuple[np.ndarray, np.ndarray]:
    """Merge digests by centroid concatenation + one bucketing pass.
    Order-insensitive by construction (the pass re-sorts by mean)."""
    if not digests:
        return np.empty(0), np.empty(0)
    means = np.concatenate([np.asarray(d[0], dtype=np.float64) for d in digests])
    weights = np.concatenate([np.asarray(d[1], dtype=np.float64) for d in digests])
    return _bucket_merge(means, weights, float(compression))


def tdigest_quantile(
    means: np.ndarray, weights: np.ndarray, q: float
) -> float:
    """Estimate the q-quantile: linear interpolation between adjacent
    centroid mid-weight positions (Dunning's reference interpolation),
    clamped to the extreme centroid means at the tails. For an
    all-singleton digest this is exactly the Hazen / R-5 order
    statistic at position q*n - 0.5."""
    m = np.asarray(means, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    if m.size == 0:
        return float("nan")
    if m.size == 1:
        return float(m[0])
    W = float(w.sum())
    t = q * W
    mids = np.cumsum(w) - w / 2.0
    if t <= mids[0]:
        return float(m[0])
    if t >= mids[-1]:
        return float(m[-1])
    j = int(np.searchsorted(mids, t, side="left"))  # mids[j-1] < t <= mids[j]
    if mids[j] == t:
        return float(m[j])
    lo, hi = j - 1, j
    frac = (t - mids[lo]) / (mids[hi] - mids[lo])
    return float(m[lo] + frac * (m[hi] - m[lo]))


def tdigest_quantiles(
    means: np.ndarray, weights: np.ndarray, qs: list[float]
) -> list[float]:
    return [tdigest_quantile(means, weights, q) for q in qs]
