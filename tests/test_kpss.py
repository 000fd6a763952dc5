"""kpss_test must equal an exact arbitrary-precision replay of the
n-scaled partial-sum statistic (Python ints stand in for
decimal(38,0)) on crafted and randomized streams, and land the
textbook verdicts: white noise accepted as stationary, random walks
and ramps rejected, constants an exact 0/0 null."""

import random
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

from chronoxtract_spark.operators.armodel import KPSS_CRIT_5PCT, kpss_test

L = 4


def _r6(x):
    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _ref(cents, lags=L):
    v = [int(c) for c in cents]
    n = len(v)
    s_tot = sum(v)
    cum = 0
    ns, ne = [], []
    for t, x in enumerate(v, start=1):
        cum += x
        ns.append(n * cum - t * s_tot)
        ne.append(n * x - s_tot)
    a = sum(z * z for z in ns)
    g = [sum(ne[t] * ne[t + l] for t in range(n - l)) if n > l else 0
         for l in range(lags + 1)]
    b = (lags + 1) * g[0] + 2 * sum((lags + 1 - l) * g[l]
                                    for l in range(1, lags + 1))
    if b <= 0:
        return {"n": n, "lrv": None, "eta": None, "stationary": None}
    lp1 = float(lags + 1)
    eta = lp1 * float(a) / (float(n) * float(b))
    lrv = float(b) / (lp1 * n * n * n)
    return {
        "n": n,
        "lrv": _r6(lrv),
        "eta": _r6(eta),
        "stationary": eta < KPSS_CRIT_5PCT,
    }


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
    got = {
        r.conv_id: r.asDict()
        for r in kpss_test(_df(spark, series, repartition)).collect()
    }
    for k, pts in series.items():
        want = _ref([c for _, c in sorted(pts)])
        for col, exp in want.items():
            assert got[k][col] == exp, (k, col, got[k][col], exp)


def test_crafted(spark):
    rng = np.random.default_rng(5)
    noise = [int(c) for c in rng.integers(-400, 400, 300)]
    _check(spark, {
        "noise": [(i, c) for i, c in enumerate(noise)],
        "walk": [(i, int(c)) for i, c in
                 enumerate(np.cumsum(rng.integers(-50, 51, 300)))],
        "ramp": [(i, 10 * i) for i in range(200)],
        "const": [(i, 777) for i in range(50)],
        "single": [(0, 42)],
        "pair": [(0, 10), (1, 900)],
        "short": [(i, (i * 31) % 97) for i in range(6)],
    })


def test_verdicts(spark):
    """The joint ADF/KPSS classification must come out right on the
    canonical pair: iid noise stationary, a random walk not, and a
    deterministic ramp rejected (level KPSS reads trend as drift)."""
    rng = np.random.default_rng(17)
    series = {
        "noise": [(i, int(c)) for i, c in
                  enumerate(rng.integers(-500, 500, 1000))],
        "walk": [(i, int(c)) for i, c in
                 enumerate(np.cumsum(rng.integers(-60, 61, 1000)))],
        "ramp": [(i, 3 * i) for i in range(1000)],
    }
    got = {r.conv_id: r for r in kpss_test(_df(spark, series)).collect()}
    assert got["noise"].stationary is True, got["noise"]
    assert got["walk"].stationary is False, got["walk"]
    assert got["ramp"].stationary is False, got["ramp"]
    assert got["walk"].eta > got["noise"].eta


def test_degenerate_nulls(spark):
    """Constant series is an exact 0/0: every statistic null rather
    than NaN, the same guard discipline as adf_test."""
    df = _df(spark, {"c": [(i, -250) for i in range(40)]})
    row = kpss_test(df).collect()[0]
    assert row.n == 40
    assert row.lrv is None and row.eta is None and row.stationary is None


def test_lags_parameter(spark):
    """A different truncation changes the Bartlett weights; replay at
    L=2 must still match exactly."""
    rng = random.Random(3)
    cents = [rng.randrange(-300, 300) for _ in range(120)]
    df = _df(spark, {"k": list(enumerate(cents))})
    row = kpss_test(df, lags=2).collect()[0]
    want = _ref(cents, lags=2)
    assert row.eta == want["eta"] and row.lrv == want["lrv"]


def test_randomized_matches_replay(spark):
    rng = random.Random(20260818)
    series = {}
    for ki in range(25):
        n = rng.randrange(1, 250)
        drift = rng.choice([0, 0, 3])
        pts, t, acc = [], 0, 0
        for j in range(n):
            t += rng.randrange(1, 30)
            acc += rng.randrange(-100, 101)
            pts.append((t, rng.randrange(-400, 400) + drift * j
                        + (acc if ki % 3 == 0 else 0)))
        rng.shuffle(pts)
        series[f"u{ki}"] = pts
    _check(spark, series)


def test_partitioning_invariance(spark):
    rng = random.Random(7)
    series = {"k": [(t, rng.randrange(-300, 300)) for t in range(400)]}
    _check(spark, series, repartition=7)
