"""Alexander (1997) z-transformed discrete correlation function (ZDCF).

Numpy mirror of the reference ZDCF (reference: src/correlation/zdcf.rs):
equal-population lag bins built greedily outward from the median lag
with no data point reused within a bin (``alcbin``, zdcf.rs:84-180),
per-bin Pearson r over Monte-Carlo perturbed values, Fisher-z
small-sample mean/sigma (Kendall & Stuart approximations,
zdcf.rs:7-26).

Determinism: the reference draws its MC perturbations from an
**unseeded** ``thread_rng`` (zdcf.rs:189), so its outputs are
irreproducible by design (SURVEY.md §7.3). This kernel takes an
explicit seed (default 42); parity with the reference is defined on the
deterministic substructure (binning, Fisher-z algebra) and
distributionally on the MC error bars.
"""

from __future__ import annotations

import numpy as np

__all__ = ["zdcf", "alcbin", "fisher_e", "fisher_s"]


def fisher_s(r: float, n: float) -> float:
    """Small-sample approximation of s(z) (zdcf.rs:7-15)."""
    r2 = r * r
    nm1 = n - 1.0
    term = (1.0 / nm1) * (
        1.0
        + (4.0 - r2) / (2.0 * nm1)
        + (22.0 - 6.0 * r2 - 3.0 * r2 * r2) / (6.0 * nm1 * nm1)
    )
    return float(np.sqrt(max(term, 0.0)))


def fisher_e(r: float, n: float) -> float:
    """Small-sample approximation of E(z) (zdcf.rs:17-26)."""
    r2 = r * r
    nm1 = n - 1.0
    term1 = 0.5 * np.log((1.0 + r) / (1.0 - r))
    term2 = r / (2.0 * nm1)
    term3 = 1.0 + (5.0 + r2) / (4.0 * nm1)
    term4 = (11.0 + 2.0 * r2 + 3.0 * r2 * r2) / (8.0 * nm1 * nm1)
    return float(term1 + term2 * (term3 + term4))


def alcbin(t1: np.ndarray, t2: np.ndarray, min_points: int) -> list[list[tuple]]:
    """Equal-population binning of all n1*n2 lag pairs, greedy outward
    from the median lag, no reused data point within a bin
    (zdcf.rs:84-180)."""
    n1, n2 = t1.size, t2.size
    lags = (t2[None, :] - t1[:, None]).ravel()
    ii, jj = np.unravel_index(np.arange(n1 * n2), (n1, n2))
    order = np.argsort(lags, kind="stable")
    ii, jj = ii[order], jj[order]
    n_pairs = lags.size
    median_idx = n_pairs // 2

    def collect(start: int, step: int, stop: int) -> list[list[tuple]]:
        out = []
        pos = start
        while (pos >= 0 if step < 0 else pos < stop):
            cur: list[tuple] = []
            used1 = np.zeros(n1, dtype=bool)
            used2 = np.zeros(n2, dtype=bool)
            p = pos
            while (p >= 0 if step < 0 else p < stop) and len(cur) < min_points:
                a, b = ii[p], jj[p]
                if not used1[a] and not used2[b]:
                    cur.append((a, b))
                    used1[a] = True
                    used2[b] = True
                p += step
            if len(cur) >= min_points:
                out.append(cur)
                pos = p
            else:
                break
        return out

    negative = collect(median_idx - 1, -1, n_pairs)
    positive = collect(median_idx, +1, n_pairs)
    negative.reverse()
    return negative + positive


def zdcf(
    t1: np.ndarray,
    v1: np.ndarray,
    e1: np.ndarray,
    t2: np.ndarray,
    v2: np.ndarray,
    e2: np.ndarray,
    min_points: int = 11,
    num_mc: int = 100,
    seed: int = 42,
) -> dict:
    """ZDCF of two (t, v, err) series (zdcf.rs:182-239).

    Returns dict of lags / correlations / errors / n_per_bin.
    """
    t1 = np.asarray(t1, dtype=np.float64)
    v1 = np.asarray(v1, dtype=np.float64)
    e1 = np.asarray(e1, dtype=np.float64)
    t2 = np.asarray(t2, dtype=np.float64)
    v2 = np.asarray(v2, dtype=np.float64)
    e2 = np.asarray(e2, dtype=np.float64)
    if t1.size < 2 or t2.size < 2:
        raise ValueError("Time series must have at least 2 points")

    bins = alcbin(t1, t2, min_points)
    if not bins:
        return {
            "lags": np.empty(0),
            "correlations": np.empty(0),
            "errors": np.empty(0),
            "n_per_bin": np.empty(0, dtype=np.int64),
        }
    rng = np.random.RandomState(seed)

    # precompute per-bin index arrays and true lags
    bin_i = [np.fromiter((p[0] for p in b), dtype=np.int64) for b in bins]
    bin_j = [np.fromiter((p[1] for p in b), dtype=np.int64) for b in bins]
    lag_true = [float(np.mean(t2[j] - t1[i])) for i, j in zip(bin_i, bin_j)]

    # Monte Carlo over measurement errors (vectorized across MC draws)
    r_acc = np.zeros(len(bins))
    for _ in range(num_mc):
        s1 = v1 + rng.normal(size=v1.size) * e1
        s2 = v2 + rng.normal(size=v2.size) * e2
        for k, (i, j) in enumerate(zip(bin_i, bin_j)):
            x1, x2 = s1[i], s2[j]
            n = x1.size
            m1, m2 = x1.mean(), x2.mean()
            var1 = (x1 * x1).mean() - m1 * m1
            var2 = (x2 * x2).mean() - m2 * m2
            cov = (x1 * x2).mean() - m1 * m2
            r_acc[k] += (
                cov / np.sqrt(var1 * var2) if var1 > 0 and var2 > 0 else 0.0
            )
    r_mean = r_acc / num_mc

    lags = np.asarray(lag_true)
    errors = np.empty(len(bins))
    for k, b in enumerate(bins):
        n_bin = float(len(b))
        r_cl = float(np.clip(r_mean[k], -1.0 + 1e-7, 1.0 - 1e-7))
        z = fisher_e(r_cl, n_bin)
        s = fisher_s(r_cl, n_bin)
        err_neg = r_cl - np.tanh(z - s)
        err_pos = np.tanh(z + s) - r_cl
        errors[k] = (err_neg + err_pos) / 2.0
    return {
        "lags": lags,
        "correlations": r_mean,
        "errors": errors,
        "n_per_bin": np.asarray([len(b) for b in bins], dtype=np.int64),
    }
