"""spectral_summary must equal a numpy+fold replay over the same
quantized kernel PSD, and land the signal-theory limits: a pure tone
entropy ~0 with its bin dominant, white noise entropy/flatness ~1,
sub-segment keys absent."""

import math
import random
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

from chronoxtract_spark.kernel import fda as k_fda
from chronoxtract_spark.operators.spectral import spectral_summary, welch_psd_frame


def _r6(x):
    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _ref(values, nperseg=64):
    x = np.asarray(values, dtype=np.float64)
    if x.size < nperseg:
        return None
    psd = [
        _r6(p) for p in k_fda.welch_power(x, nperseg=nperseg)
    ][1:]  # quantized, DC excluded — exactly what the operator folds
    m = len(psd)
    s = 0.0
    plnp = 0.0
    lsum = 0.0
    for p in psd:  # k-sorted fold
        s += p
        if p > 0.0:
            plnp += p * math.log(p)
            lsum += math.log(p)
    if s <= 0.0:
        return {"n_bins": m, "spectral_entropy": None,
                "spectral_flatness": None, "dominant_k": None,
                "dominant_share": None}
    ent = (math.log(s) - plnp / s) / math.log(float(m))
    flat = (math.exp(lsum / m) / (s / m)) if min(psd) > 0.0 else 0.0
    dom = min(range(m), key=lambda i: (-psd[i], i))
    return {
        "n_bins": m,
        "spectral_entropy": _r6(ent),
        "spectral_flatness": _r6(flat),
        "dominant_k": dom + 1,
        "dominant_share": _r6(psd[dom] / s),
    }


def _df(spark, series, repartition=None):
    rows = [
        (k, i, i, float(v))
        for k, vals in series.items()
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts long, event_id long, value double"
    )
    return df.repartition(repartition) if repartition else df


def _check(spark, series, repartition=None):
    got = {r.event_type: r.asDict()
           for r in spectral_summary(_df(spark, series, repartition)).collect()}
    for k, vals in series.items():
        want = _ref(vals)
        if want is None:
            assert k not in got, got.get(k)
            continue
        for col, exp in want.items():
            assert got[k][col] == exp, (k, col, got[k][col], exp)


def test_crafted(spark):
    rng = np.random.default_rng(3)
    t = np.arange(512)
    _check(spark, {
        # pure tone at bin 8 of 64 (freq 8/64): near-zero entropy
        "tone": list(np.sin(2 * np.pi * 8 / 64 * t)),
        "noise": list(rng.normal(size=2048)),
        # constant: every PSD bin 0 -> all-null stats
        "const": [5.0] * 128,
        # shorter than one segment: no row at all
        "short": list(rng.normal(size=63)),
        # tone + noise mixture
        "mix": list(np.sin(2 * np.pi * 4 / 64 * t) + 0.3 * rng.normal(size=512)),
    })


def test_theory_limits(spark):
    rng = np.random.default_rng(17)
    t = np.arange(4096)
    series = {
        "tone": list(np.sin(2 * np.pi * 8 / 64 * t)),
        "noise": list(rng.normal(size=4096)),
    }
    got = {r.event_type: r for r in spectral_summary(_df(spark, series)).collect()}
    # the Hann main lobe spreads a pure tone over ~3 bins, so the
    # floor is lobe-shaped, not zero: share ~ 2/3, entropy ~ 0.25
    assert got["tone"].spectral_entropy < 0.35, got["tone"]
    assert got["tone"].dominant_k == 8
    assert got["tone"].dominant_share > 0.55
    assert got["noise"].spectral_entropy > 0.85, got["noise"]
    assert got["noise"].spectral_flatness > 0.4
    assert got["tone"].spectral_flatness < 0.01


def test_psd_frame_matches_kernel(spark):
    rng = np.random.default_rng(5)
    vals = list(rng.normal(size=300))
    got = {r.k: r.psd for r in welch_psd_frame(
        _df(spark, {"k": vals})).collect()}
    want = k_fda.welch_power(np.asarray(vals), nperseg=64)
    assert sorted(got) == list(range(33))
    for k, p in enumerate(want):
        assert got[k] == _r6(p), (k, got[k], p)


def test_randomized_matches_replay(spark):
    rng = random.Random(20260819)
    nprng = np.random.default_rng(20260819)
    series = {}
    for ki in range(12):
        n = rng.randrange(40, 500)
        mode = ki % 3
        if mode == 0:
            vals = list(nprng.normal(size=n))
        elif mode == 1:
            f = rng.randrange(1, 31)
            vals = list(np.sin(2 * np.pi * f / 64 * np.arange(n))
                        + 0.2 * nprng.normal(size=n))
        else:
            vals = list(np.cumsum(nprng.normal(size=n)))
        series[f"u{ki}"] = vals
    _check(spark, series)


def test_partitioning_invariance(spark):
    rng = np.random.default_rng(7)
    _check(spark, {"k": list(rng.normal(size=400))}, repartition=7)
