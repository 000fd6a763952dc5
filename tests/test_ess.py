"""ess_autocorr must equal a sequential-fold replay of the
integrated-autocorrelation-time chain (position-sorted mean and lag
folds, initial-positive truncation) on crafted and randomized
streams, and land the textbook readings: white noise tau ~ 1,
strongly persistent series tau >> 1 with n_eff collapsing."""

import random
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

from chronoxtract_spark.operators.armodel import ess_autocorr

K = 10


def _r6(x):
    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _ref(values, max_lag=K):
    xs = [float(v) for v in values]
    n = len(xs)
    if n < 2:
        return None
    acc = 0.0
    for x in xs:
        acc += x
    mu = acc / float(n)
    def fold(terms):
        a = 0.0
        for t in terms:
            a += t
        return a
    c0 = fold((x - mu) * (x - mu) for x in xs) / float(n)
    out = {"n": n, "n_lags_used": None, "tau_int": None, "n_eff": None}
    if c0 == 0.0:
        return out
    c = {
        k: fold(
            ((xs[i] - mu) * (xs[i + k] - mu) if i + k < n else 0.0)
            for i in range(n)
        ) / float(n)
        for k in range(1, max_lag + 1)
    }
    s, used, alive = 0.0, 0, True
    for k in range(1, max_lag + 1):
        rho = c[k] / c0
        alive = alive and rho > 0.0
        if alive:
            s += rho
            used += 1
    tau = 1.0 + 2.0 * s
    out.update(n_lags_used=used, tau_int=_r6(tau),
               n_eff=_r6(float(n) / tau))
    return out


def _df(spark, series, repartition=None):
    rows = [
        (k, i, int(s), float(v))
        for k, pts in series.items()
        for i, (s, v) in enumerate(pts)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, value double"
    )
    return df.repartition(repartition) if repartition else df


def _check(spark, series, repartition=None):
    got = {r.conv_id: r.asDict()
           for r in ess_autocorr(_df(spark, series, repartition)).collect()}
    for k, pts in series.items():
        want = _ref([v for _, v in sorted(pts)])
        if want is None:
            assert k not in got, got.get(k)
            continue
        for col, exp in want.items():
            assert got[k][col] == exp, (k, col, got[k][col], exp)


def test_crafted(spark):
    _check(spark, {
        # constant: c0 exactly 0 (mean exactly representable) -> null
        "const": [(i, 3.25) for i in range(30)],
        # alternation: rho1 < 0, truncation stops at lag 0
        "alt": [(i, 1.0 if i % 2 else -1.0) for i in range(40)],
        # n = 1 keys emit nothing
        "single": [(0, 4.2)],
        "pair": [(0, 1.0), (1, 5.0)],
        # smooth ramp: every rho positive, all 10 lags used
        "ramp": [(i, float(i)) for i in range(60)],
    })


def test_theory_bands(spark):
    rng = np.random.default_rng(7)
    noise = rng.normal(size=5000)
    # AR(1) phi = 0.9: tau_true = (1+phi)/(1-phi) = 19
    ar = np.zeros(5000)
    for i in range(1, 5000):
        ar[i] = 0.9 * ar[i - 1] + rng.normal()
    series = {
        "noise": [(i, float(v)) for i, v in enumerate(noise)],
        "ar9": [(i, float(v)) for i, v in enumerate(ar)],
    }
    got = {r.conv_id: r for r in ess_autocorr(_df(spark, series)).collect()}
    assert got["noise"].tau_int < 1.5, got["noise"]
    assert got["noise"].n_eff > 3000
    assert got["ar9"].tau_int > 8.0, got["ar9"]
    assert got["ar9"].n_eff < got["noise"].n_eff / 4


def test_truncation_stops_at_first_nonpositive(spark):
    """rho alternating +,- from lag 2 on: only lag 1 contributes."""
    rng = random.Random(5)
    # MA-like: x_i = e_i + e_{i-1} gives rho1 = 0.5, rho_k ~ 0 beyond
    e = [rng.gauss(0, 1) for _ in range(3001)]
    xs = [e[i] + e[i + 1] for i in range(3000)]
    got = ess_autocorr(
        _df(spark, {"k": list(enumerate(xs))})
    ).collect()[0]
    want = _ref(xs)
    assert got.n_lags_used == want["n_lags_used"]
    assert got.tau_int == want["tau_int"]
    # MA(1) truth: rho1 = 0.5, tau = 2.0; later rhos are noise-level
    # and may stay positive by chance but contribute ~nothing
    assert 1.6 < got.tau_int < 2.6, got.tau_int


def test_max_lag_parameter(spark):
    rng = random.Random(3)
    xs = []
    acc = 0.0
    for _ in range(400):
        acc = 0.8 * acc + rng.gauss(0, 1)
        xs.append(acc)
    got = ess_autocorr(
        _df(spark, {"k": list(enumerate(xs))}), max_lag=4
    ).collect()[0]
    want = _ref(xs, max_lag=4)
    assert got.tau_int == want["tau_int"]
    assert got.n_lags_used <= 4


def test_randomized_matches_replay(spark):
    rng = random.Random(20260819)
    series = {}
    for ki in range(25):
        n = rng.randrange(1, 200)
        mode = ki % 3
        pts, t, acc = [], 0, 0.0
        for _ in range(n):
            t += rng.randrange(1, 30)
            if mode == 0:
                acc = 0.7 * acc + rng.gauss(0, 1)
                pts.append((t, acc))
            elif mode == 1:
                pts.append((t, rng.gauss(0, 5)))
            else:
                pts.append((t, float(rng.randrange(-3, 4))))
        rng.shuffle(pts)
        series[f"u{ki}"] = pts
    _check(spark, series)


def test_partitioning_invariance(spark):
    rng = random.Random(7)
    pts = [(t, rng.gauss(0, 2)) for t in range(400)]
    _check(spark, {"k": pts}, repartition=7)
