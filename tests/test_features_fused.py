"""The r6 fused window-kernel paths must reproduce the naive forms bit
for bit: the tier oracles hash every output column, so a single ulp of
drift in shannon_entropy / spectral_* / the state columns is a
regression. The reference implementations below are the pre-fusion
bodies verbatim (operators/features.py @ r6 batch 4)."""

import numpy as np
import pytest

from chronoxtract_spark.operators.features import (
    _gather_windows,
    core_features_batch,
    window_state_batch,
)


def naive_core_features_batch(X: np.ndarray) -> dict:
    n, w = X.shape
    out: dict = {}
    bins = 16
    mn = X.min(axis=1, keepdims=True)
    mx = X.max(axis=1, keepdims=True)
    rng = mx - mn
    flat = (rng == 0.0).ravel()
    safe = np.where(rng == 0.0, 1.0, rng)
    idx = np.clip(
        np.floor((X - mn) / safe * bins).astype(np.int64), 0, bins - 1
    )
    offset = idx + np.arange(n)[:, None] * bins
    counts = np.bincount(offset.ravel(), minlength=n * bins).reshape(n, bins)
    p = counts / float(w)
    with np.errstate(all="ignore"):
        terms = np.where(p > 0, -p * np.log2(np.where(p > 0, p, 1.0)), 0.0)
    ent = terms.sum(axis=1)
    ent[flat] = 0.0
    out["shannon_entropy"] = ent

    win = np.hanning(w)
    with np.errstate(all="ignore"):
        scale = 1.0 / (win * win).sum()
    seg = (X - X.mean(axis=1, keepdims=True)) * win[None, :]
    spec = np.fft.rfft(seg, axis=1)
    with np.errstate(all="ignore"):
        psd = (spec.real**2 + spec.imag**2) * scale
    if w % 2 == 0:
        psd[:, 1:-1] *= 2.0
    else:
        psd[:, 1:] *= 2.0
    freqs = np.fft.rfftfreq(w)
    tot = psd.sum(axis=1)
    out["spectral_power_total"] = tot
    out["spectral_peak_freq"] = freqs[np.argmax(psd, axis=1)]
    with np.errstate(all="ignore"):
        pn = psd / np.where(tot == 0, 1.0, tot)[:, None]
        se = np.where(
            pn > 0, -pn * np.log(np.where(pn > 0, pn, 1.0)), 0.0
        ).sum(axis=1)
    se[tot == 0] = float("nan")
    out["spectral_entropy"] = se
    return out


def _pathological(rng, n, w):
    X = rng.rand(n, w) * 10
    X[0] = 3.7  # flat (entropy must pin 0)
    X[1] = 0.0  # all-zero (tot == 0 -> nan spectral entropy)
    if w > 3:
        X[2] = 0.0
        X[2, 1] = 5.0  # single spike (mass in few bins)
    X[3] = np.round(X[3])  # tie-heavy
    return X


class TestFusedBitExact:
    @pytest.mark.parametrize(
        "w,n", [(60, 2000), (1440, 64), (7, 40), (1, 8), (2, 8), (61, 321)]
    )
    def test_core_features_batch_fused_bitexact(self, w, n):
        rng = np.random.RandomState(7)
        X = _pathological(rng, n, w)
        ref = naive_core_features_batch(X)
        Xc = X.copy()
        got = core_features_batch(X)
        assert np.array_equal(X, Xc), "input matrix mutated"
        for k, rv in ref.items():
            assert rv.tobytes() == got[k].tobytes(), k

    def test_core_features_batch_shared_minmax_bitexact(self):
        rng = np.random.RandomState(11)
        X = _pathological(rng, 500, 60)
        mnk = X.min(axis=1, keepdims=True)
        mxk = X.max(axis=1, keepdims=True)
        a = core_features_batch(X)
        b = core_features_batch(X, mn=mnk, mx=mxk)
        for k in a:
            assert a[k].tobytes() == b[k].tobytes(), k
        s0 = window_state_batch(X)
        s1 = window_state_batch(X, mn=mnk.ravel(), mx=mxk.ravel())
        for k in s0:
            assert s0[k].tobytes() == s1[k].tobytes(), k

    @pytest.mark.parametrize("w", [1, 2, 7, 60, 1440])
    def test_gather_windows_equals_stack(self, w):
        rng = np.random.RandomState(5)
        x = rng.rand(100_000)
        # scattered starts (runs of length 1) + tiling starts (one run)
        scattered = np.sort(
            rng.choice(100_000 - w, size=400, replace=False)
        ).astype(np.int64)
        tiling = np.arange(0, (100_000 // w) * w, w, dtype=np.int64)
        # mixed: partial-window boundaries like real conv/bucket breaks
        mixed = np.concatenate([tiling[:5], scattered[:7], tiling[10:14]])
        for starts in (scattered, tiling, mixed, np.array([], dtype=np.int64)):
            ref = (
                np.stack([x[s : s + w] for s in starts])
                if starts.size
                else np.empty((0, w))
            )
            got = _gather_windows(x, starts, w)
            assert ref.shape == got.shape
            assert ref.tobytes() == got.tobytes()

    def test_entropy_lut_covers_full_count_range(self):
        # every count 0..w must gather the exact -p*log2(p) the naive
        # matrix form produced, including the -0.0 at c == w
        w = 16
        X = np.vstack(
            [np.full(w, 1.0)]  # flat -> all mass one bin (c == w)
            + [np.linspace(0, 1, w)]
        )
        ref = naive_core_features_batch(X)
        got = core_features_batch(X)
        assert ref["shannon_entropy"].tobytes() == got["shannon_entropy"].tobytes()
