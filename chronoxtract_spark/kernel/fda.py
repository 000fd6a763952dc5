"""Frequency-domain kernels: FFT, Welch spectral power, Lomb-Scargle.

Numpy mirrors of the reference fda module (reference: src/fda/mod.rs,
src/fda/fft.rs, src/fda/lombscargle.rs). The reference computes its FFT
in f32 (src/fda/mod.rs:36-39) — ``perform_fft(dtype="float32")``
reproduces that round-trip; the default is f64 (the reference's own
tests only assert allclose vs numpy f64, tests/test_fda.py:5-25).
"""

from __future__ import annotations

import numpy as np

__all__ = ["perform_fft", "fft_power", "welch_power", "lomb_scargle"]


def perform_fft(x: np.ndarray, dtype: str = "float64") -> np.ndarray:
    """Full complex DFT of a real series (src/fda/mod.rs:32-48)."""
    x = np.asarray(x, dtype=np.float64)
    if dtype == "float32":
        # mirror the reference's f64 -> f32 -> f64 round trip
        out = np.fft.fft(x.astype(np.float32).astype(np.complex64))
        return out.astype(np.complex128)
    return np.fft.fft(x)


def fft_power(x: np.ndarray) -> np.ndarray:
    """|FFT|^2 power spectrum (derived; used by the rollup feature set)."""
    f = perform_fft(x)
    return (f.real**2 + f.imag**2)


def welch_power(
    x: np.ndarray, nperseg: int = 64, noverlap: int | None = None
) -> np.ndarray:
    """Welch PSD: mean of |FFT(segment * hann)|^2 over 50%-overlapping
    segments, one-sided, normalized by the window energy.

    The reference has no Welch implementation; this is the north-star
    "Welch/FFT spectral power per window" feature (BASELINE.json:north_star),
    implemented to match scipy.signal.welch's density convention with
    fs=1.
    """
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    nperseg = min(nperseg, n)
    if noverlap is None:
        noverlap = nperseg // 2
    step = nperseg - noverlap
    if step <= 0 or n < nperseg:
        segs = x[None, :nperseg]
    else:
        k = (n - nperseg) // step + 1
        idx = np.arange(k)[:, None] * step + np.arange(nperseg)[None, :]
        segs = x[idx]
    win = np.hanning(nperseg)
    scale = 1.0 / (win * win).sum()
    segs = (segs - segs.mean(axis=1, keepdims=True)) * win
    spec = np.fft.rfft(segs, axis=1)
    psd = (spec.real**2 + spec.imag**2) * scale
    # one-sided doubling except DC and Nyquist
    if nperseg % 2 == 0:
        psd[:, 1:-1] *= 2.0
    else:
        psd[:, 1:] *= 2.0
    return psd.mean(axis=0)


def lomb_scargle(t: np.ndarray, y: np.ndarray, freqs: np.ndarray) -> np.ndarray:
    """Classic Lomb-Scargle periodogram with per-frequency tau correction
    (src/fda/lombscargle.rs:31-74), vectorized over frequencies."""
    t = np.asarray(t, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    freqs = np.asarray(freqs, dtype=np.float64)
    if t.size != y.size:
        raise ValueError("t and y must have the same length.")
    omega = 2.0 * np.pi * freqs  # (F,)
    # tau per frequency
    arg = 2.0 * omega[:, None] * t[None, :]  # (F, n)
    sum_sin = np.sin(arg).sum(axis=1)
    sum_cos = np.cos(arg).sum(axis=1)
    eps = np.finfo(float).eps
    # the reference uses atan(sum_sin/sum_cos), not atan2 — match it
    with np.errstate(divide="ignore", invalid="ignore"):
        tau = np.where(
            np.abs(omega) > eps,
            0.5 * np.arctan(sum_sin / sum_cos) / np.where(omega == 0, 1.0, omega),
            0.0,
        )
    phi = omega[:, None] * (t[None, :] - tau[:, None])
    c = np.cos(phi)
    s = np.sin(phi)
    sum_yc = (y[None, :] * c).sum(axis=1)
    sum_ys = (y[None, :] * s).sum(axis=1)
    sum_c2 = (c * c).sum(axis=1)
    sum_s2 = (s * s).sum(axis=1)
    pc = np.where(np.abs(sum_c2) > eps, sum_yc**2 / np.where(sum_c2 == 0, 1, sum_c2), 0.0)
    ps = np.where(np.abs(sum_s2) > eps, sum_ys**2 / np.where(sum_s2 == 0, 1, sum_s2), 0.0)
    return 0.5 * (pc + ps)
