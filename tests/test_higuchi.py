"""higuchi_ladder / higuchi_fd must equal a plain-Python replay of
the stride-class decomposition (exact integer sums, one float
division per sub-curve, m-ordered fold) on crafted and randomized
streams, and land the textbook dimensions: white noise ~2, random
walk ~1.5, a smooth ramp ~1."""

import math
import random
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

from chronoxtract_spark.operators.structure import (
    HIGUCHI_KS,
    higuchi_fd,
    higuchi_ladder,
)

KS = HIGUCHI_KS  # (1, 2, 3, 4, 5, 6)


def _r6(x):
    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _ref_ladder(cents, ks=KS):
    v = [int(c) for c in cents]
    n = len(v)
    out = {}
    for k in ks:
        lm = {}
        for m in range(1, k + 1):
            a = 0
            n_m = 0
            j = m + k  # 1-based position of the first differenced sample
            while j <= n:
                a += abs(v[j - 1] - v[j - 1 - k])
                n_m += 1
                j += k
            if n_m:
                lm[m] = float(a * (n - 1)) / float(n_m * k * k)
        if lm:
            acc = 0.0
            for m in sorted(lm):
                acc += lm[m]
            out[k] = {
                "n_offsets": len(lm),
                "l_k": _r6(acc / float(k)),
                "_raw": acc / float(k),
            }
    return out


def _ref_fd(cents, ks=KS):
    lad = _ref_ladder(cents, ks)
    pts = [
        (math.log(float(k)), math.log(lad[k]["_raw"]))
        for k in ks
        if k in lad and lad[k]["_raw"] > 0
    ]
    n = float(len(pts))
    if n < 2:
        return len(pts), None
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    den = n * sxx - sx * sx
    if den <= 0:
        return len(pts), None
    return len(pts), _r6(-((n * sxy - sx * sy) / den))


def _df(spark, series, repartition=None):
    rows = [
        (k, i, int(s), c / 100.0)
        for k, pts in series.items()
        for i, (s, c) in enumerate(pts)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, value double"
    )
    return df.repartition(repartition) if repartition else df


def _check(spark, series, repartition=None):
    df = _df(spark, series, repartition)
    got = {}
    for r in higuchi_ladder(df).collect():
        got.setdefault(r.conv_id, {})[r.k] = r.asDict()
    goth = {r.conv_id: r.asDict() for r in higuchi_fd(df).collect()}
    for k, pts in series.items():
        cents = [c for _, c in sorted(pts)]
        want = _ref_ladder(cents)
        assert set(got.get(k, {})) == set(want), (k, got.get(k), sorted(want))
        for kk, cols in want.items():
            for col in ("n_offsets", "l_k"):
                assert got[k][kk][col] == cols[col], (
                    k, kk, col, got[k][kk][col], cols[col])
        n_r, fd = _ref_fd(cents)
        if want:
            assert goth[k]["n_rungs"] == n_r, (k, goth[k], n_r)
            assert goth[k]["hfd"] == fd, (k, goth[k]["hfd"], fd)
        else:
            assert k not in goth


def test_crafted(spark):
    _check(spark, {
        # constant: every |dx| = 0, ladder all zeros -> fd null
        "const": [(i, 500) for i in range(30)],
        # ramp: |dx| = s*k exactly, L(k) ~ k^-1 -> fd ~ 1
        "ramp": [(i, 7 * i) for i in range(60)],
        # alternation: stride parity splits the sub-curves
        "alt": [(i, 100 if i % 2 else -100) for i in range(40)],
        # shorter than the deepest stride: rungs 1..n-1 only
        "tiny": [(0, 10), (1, 900), (2, 20)],
        "single": [(0, 42)],
        # short enough that some offsets are unpopulated
        "n8": [(i, (i * 37) % 211 - 100) for i in range(8)],
    })


def test_theory_bands(spark):
    rng = np.random.default_rng(31)
    series = {
        "noise": [(i, int(c)) for i, c in
                  enumerate(rng.integers(-900, 900, 4000))],
        "walk": [(i, int(c)) for i, c in
                 enumerate(np.cumsum(rng.integers(-60, 61, 4000)))],
        "ramp": [(i, 5 * i) for i in range(4000)],
    }
    got = {r.conv_id: r.hfd for r in higuchi_fd(_df(spark, series)).collect()}
    assert got["noise"] > 1.85, got["noise"]
    assert 1.35 < got["walk"] < 1.65, got["walk"]
    assert got["ramp"] < 1.1, got["ramp"]


def test_ramp_closed_form(spark):
    """On a slope-s ramp every |lag-k diff| is exactly s*k, so every
    sub-curve has L_m(k) = s*k*n_m*(N-1)/(n_m k^2) = s(N-1)/k and the
    mean over the k offsets is L(k) = s(N-1)/k exactly — slope -1 on
    the log-log line, the FD -> 1 smooth-curve limit."""
    s, n = 3, 61
    df = _df(spark, {"k": [(i, s * i) for i in range(n)]})
    got = {r.k: r.l_k for r in higuchi_ladder(df).collect()}
    for k in KS:
        assert got[k] == _r6(s * (n - 1) / float(k)), (k, got[k])
    fd = higuchi_fd(df).collect()[0]
    assert fd.hfd == 1.0, fd


def test_randomized_matches_replay(spark):
    rng = random.Random(20260818)
    series = {}
    for ki in range(24):
        n = rng.randrange(1, 200)
        pts, t = [], 0
        for _ in range(n):
            t += rng.randrange(1, 30)
            pts.append((t, rng.randrange(-800, 900)))
        rng.shuffle(pts)
        series[f"u{ki}"] = pts
    _check(spark, series)


def test_partitioning_invariance(spark):
    rng = random.Random(7)
    series = {"k": [(t, rng.randrange(-300, 300)) for t in range(300)]}
    _check(spark, series, repartition=7)
