"""Entropy / information kernels.

Numpy mirrors of the reference entropy module (reference:
src/entropy/mod.rs). All whole-series algorithms; executed per
(conv_id, window) group inside applyInPandas. Window sizes at rollup
tiers are bounded (<= 1440 points), keeping the O(n^2) template
matching cheap per Arrow batch.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "sample_entropy",
    "approximate_entropy",
    "sampen_apen",
    "permutation_entropy",
    "lempel_ziv_complexity",
    "multiscale_entropy",
]


_BLOCK = 512  # pair-matrix block edge: memory stays O(BLOCK * k * m)


def _chebyshev_match_counts(x: np.ndarray, m: int, r: float) -> int:
    """Count of i<j template pairs of length m within Chebyshev distance r
    (src/entropy/mod.rs:200-222). Vectorized in row blocks so memory is
    O(BLOCK·k·m) regardless of series length."""
    n = x.size
    k = n - m + 1
    if k <= 1:
        return 0
    emb = np.lib.stride_tricks.sliding_window_view(x, m)
    total = 0
    for s in range(0, k, _BLOCK):
        blk = emb[s : s + _BLOCK]  # (b, m)
        # strict upper triangle only: compare block rows to all later rows
        d = np.abs(blk[:, None, :] - emb[None, s:, :]).max(axis=2)
        b = blk.shape[0]
        mask = np.arange(d.shape[1])[None, :] > np.arange(b)[:, None]
        total += int(np.count_nonzero((d <= r) & mask))
    return total


def sample_entropy(x: np.ndarray, m: int = 2, r: float = 0.2) -> float:
    """-ln(A/B) from m+1 vs m template matches, excluding self-matches;
    inf when no matches (src/entropy/mod.rs:139-158)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n < m + 1:
        raise ValueError("Time series too short for given pattern length")
    if r <= 0.0:
        raise ValueError("Tolerance r must be positive")
    a = _chebyshev_match_counts(x, m + 1, r)
    b = _chebyshev_match_counts(x, m, r)
    if b == 0:
        return float("inf")
    phi_m = b / (n - m)
    if n - m - 1 == 0:
        return float("nan")  # reference's 0/0 -> NaN path
    phi_m1 = a / (n - m - 1)
    if phi_m1 == 0.0:
        return float("inf")
    return -math.log(phi_m1 / phi_m)


def _phi(x: np.ndarray, m: int, r: float) -> float:
    """Mean log match-fraction including self-matches
    (src/entropy/mod.rs:160-193)."""
    n = x.size
    k = n - m + 1
    emb = np.lib.stride_tricks.sliding_window_view(x, m)
    matches = np.zeros(k, dtype=np.int64)
    for s in range(0, k, _BLOCK):
        blk = emb[s : s + _BLOCK]
        d = np.abs(blk[:, None, :] - emb[None, :, :]).max(axis=2)
        matches[s : s + blk.shape[0]] = (d <= r).sum(axis=1)  # includes self
    frac = matches / k
    nz = frac > 0
    return float(np.sum(np.log(frac[nz]))) / k


def approximate_entropy(x: np.ndarray, m: int = 2, r: float = 0.2) -> float:
    """phi(m) - phi(m+1) (src/entropy/mod.rs:160-166)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size < m + 1:
        raise ValueError("Time series too short for given pattern length")
    if r <= 0.0:
        raise ValueError("Tolerance r must be positive")
    return _phi(x, m, r) - _phi(x, m + 1, r)


def sampen_apen(x: np.ndarray, m: int = 2, r: float = 0.2) -> tuple[float, float]:
    """Fused ``(sample_entropy, approximate_entropy)`` for the same
    ``(m, r)`` — the whole-series battery calls both with identical
    parameters, and all four template-match counts (SampEn's m / m+1
    strict-pair counts, ApEn's per-template counts incl. self) derive
    from ONE pairwise Chebyshev adjacency: ``D0[i,j] = |x_i - x_j| <= r``
    and the m-length match matrix is the AND of m diagonal-shifted
    copies. Exactly the counts of ``_chebyshev_match_counts`` / ``_phi``
    (integers, so bit-identical results) at ~1/30 the cost — the
    separate paths each rebuild m-dim distance blocks (guide §1.2
    per-task work: measured 0.36 s -> 0.012 s per 1440-point window).
    """
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n < m + 1:
        raise ValueError("Time series too short for given pattern length")
    if r <= 0.0:
        raise ValueError("Tolerance r must be positive")
    d0 = np.empty((n, n), dtype=bool)
    for s in range(0, n, _BLOCK):
        blk = x[s : s + _BLOCK]
        np.less_equal(
            np.abs(blk[:, None] - x[None, :]), r, out=d0[s : s + blk.size]
        )
    mm = d0
    mats = {1: d0}
    for t in range(1, m + 1):
        mm = mm[:-1, :-1] & d0[t:, t:]
        mats[t + 1] = mm
    m_m, m_m1 = mats[m], mats[m + 1]
    k_m, k_m1 = n - m + 1, n - m
    # strict-pair counts: matrices are symmetric, so (total - diagonal)/2.
    # The diagonal is not assumed all-True: a NaN-poisoned r gives an
    # all-False matrix exactly as the separate kernels see it.
    b = (int(m_m.sum()) - int(np.trace(m_m))) // 2
    a = (int(m_m1.sum()) - int(np.trace(m_m1))) // 2
    if b == 0:
        se = float("inf")
    else:
        phi_b = b / (n - m)
        if n - m - 1 == 0:
            se = float("nan")  # reference's 0/0 -> NaN path
        else:
            phi_a = a / (n - m - 1)
            se = float("inf") if phi_a == 0.0 else -math.log(phi_a / phi_b)

    def phi(mat: np.ndarray, k: int) -> float:
        frac = mat.sum(axis=1) / k
        nz = frac > 0
        return float(np.sum(np.log(frac[nz]))) / k

    ae = phi(m_m, k_m) - phi(m_m1, k_m1)
    return se, ae


def permutation_entropy(x: np.ndarray, m: int = 3, delay: int = 1) -> float:
    """Ordinal-pattern Shannon entropy (natural log); ties broken by the
    stable sort of (value, position) pairs (src/entropy/mod.rs:224-256)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n < m * delay:
        raise ValueError(
            "Time series too short for given embedding dimension and delay"
        )
    if m < 2:
        raise ValueError("Embedding dimension must be at least 2")
    if delay < 1:
        raise ValueError("Delay must be at least 1")
    span = (m - 1) * delay
    count = n - span
    # (count, m) embedding with the given delay
    idx = np.arange(count)[:, None] + np.arange(m)[None, :] * delay
    emb = x[idx]
    # stable argsort by value == sort of (value, position) with position
    # tie-break, matching the reference's pair sort
    patterns = np.argsort(emb, axis=1, kind="stable")
    # hash each ordinal pattern into a single integer base m
    basis = m ** np.arange(m)
    codes = (patterns * basis[None, :]).sum(axis=1)
    _, counts = np.unique(codes, return_counts=True)
    p = counts / count
    return float(-np.sum(p * np.log(p)))


def lempel_ziv_complexity(x: np.ndarray, threshold: float | None = None) -> float:
    """LZ76-style new-substring count over the binarized series;
    default threshold is the sorted-index median ``sorted[n/2]``
    (src/entropy/mod.rs:258-303)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size == 0:
        raise ValueError("Input time series cannot be empty")
    if threshold is None:
        threshold = float(np.sort(x)[x.size // 2])
    bits = (x >= threshold).astype(np.uint8).tobytes()
    n = len(bits)
    complexity = 0
    i = 0
    while i < n:
        j = 1
        # longest prefix of bits[i:] that already appears in bits[:i]
        while i + j <= n and bits[i : i + j] in bits[:i]:
            j += 1
        complexity += 1
        i += max(j, 1)
    return float(complexity)


def _coarse_grain(x: np.ndarray, scale: int) -> np.ndarray:
    """Non-overlapping scale-length means (src/entropy/mod.rs:326-339)."""
    n = x.size
    m = n // scale
    if m == 0:
        return np.empty(0)
    return x[: m * scale].reshape(m, scale).mean(axis=1)


def multiscale_entropy(
    x: np.ndarray, m: int = 2, r: float = 0.2, max_scale: int = 10
) -> np.ndarray:
    """SampEn of coarse-grained series per scale 1..max_scale; NaN when
    too short (src/entropy/mod.rs:305-324)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size < (m + 1) * max_scale:
        raise ValueError("Time series too short for given parameters")
    if r <= 0.0:
        raise ValueError("Tolerance r must be positive")
    if max_scale < 1:
        raise ValueError("Max scale must be at least 1")
    out = np.empty(max_scale)
    for s in range(1, max_scale + 1):
        cg = _coarse_grain(x, s)
        # reference gate (src/entropy/mod.rs:313-320)
        if cg.size >= m + 1:
            out[s - 1] = sample_entropy(cg, m, r)
        else:
            out[s - 1] = float("nan")
    return out
