"""adf_test must equal a plain-Python replay of the closed-form DF
regression on exact integer moments, and its verdicts must separate
white noise / mean-reverting AR(1) (reject the unit root) from a
random walk (fail to reject)."""

import math
import random
from decimal import ROUND_HALF_UP, Decimal

from chronoxtract_spark.operators.armodel import ADF_CRIT_5PCT, adf_test


def _r6(x):
    return float(
        Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP)
    )


def _ref(cents):
    v = [int(c) for c in cents]
    pairs = [(v[i - 1], v[i] - v[i - 1]) for i in range(1, len(v))]
    m = len(pairs)
    out = {"n_obs": len(v), "beta": None, "t_stat": None,
           "stationary": None}
    if m == 0:
        return out
    sz = sum(z for z, _ in pairs)
    sy = sum(y for _, y in pairs)
    szz = sum(z * z for z, _ in pairs)
    szy = sum(z * y for z, y in pairs)
    syy = sum(y * y for _, y in pairs)
    num, den, yy = m * szy - sz * sy, m * szz - sz * sz, m * syy - sy * sy
    if den > 0:
        beta = float(num) / float(den)
        out["beta"] = _r6(beta)
        if m > 2:
            se2 = (float(yy) - beta * float(num)) / (
                float(m - 2) * float(den)
            )
            if se2 > 0.0:
                t = beta / math.sqrt(se2)
                out["t_stat"] = _r6(t)
                out["stationary"] = t < ADF_CRIT_5PCT
    return out


def _check(spark, series):
    rows = [
        (k, i, int(s), c / 100.0)
        for k, pts in series.items()
        for i, (s, c) in enumerate(pts)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, value double"
    )
    got = {r.conv_id: r.asDict() for r in adf_test(df).collect()}
    assert set(got) == set(series)
    for k, pts in series.items():
        want = _ref([c for _, c in sorted(pts)])
        for col, exp in want.items():
            assert got[k][col] == exp, (k, col, got[k][col], exp)


def test_crafted_edges(spark):
    _check(spark, {
        # constant: den = 0 -> everything null
        "const": [(i, 700) for i in range(20)],
        # two points: m = 1, beta defined? den = 1*z^2 - z^2 = 0 -> null
        "pair": [(0, 100), (1, 200)],
        # exact AR(1) deterministic decay toward 0: perfect fit,
        # se2 = 0 -> t/verdict null, beta = phi - 1 = -0.5 exactly
        "decay": [(i, int(6400 * (0.5 ** i))) for i in range(8)],
        # seesaw: strongly mean-reverting
        "seesaw": [(i, 500 if i % 2 else -500) for i in range(30)],
    })


def test_decay_beta_exact(spark):
    rows = [("k", i, i, int(6400 * (0.5 ** i)) / 100.0) for i in range(8)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, value double"
    )
    got = adf_test(df).collect()[0]
    assert got.beta == -0.5
    assert got.t_stat is None and got.stationary is None


def test_verdicts_discriminate(spark):
    # seed picked so the walk draw behaves like its null (the DF test
    # has a genuine ~5% false-rejection rate under the unit root)
    rng = random.Random(70)
    noise = [rng.randrange(-500, 500) for _ in range(400)]
    walk, x = [], 0
    for _ in range(400):
        x += rng.randrange(-300, 301)
        walk.append(x)
    phi, ar1, x = 0.6, [], 0
    for _ in range(400):
        x = int(phi * x) + rng.randrange(-200, 201)
        ar1.append(x)
    series = {"noise": noise, "walk": walk, "ar1": ar1}
    rows = [(k, i, i, c / 100.0) for k, pts in series.items()
            for i, c in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, value double"
    )
    got = {r.conv_id: r for r in adf_test(df).collect()}
    assert got["noise"].stationary is True
    assert got["ar1"].stationary is True
    assert got["walk"].stationary is False
    # beta estimates: noise ~ -1, AR(1) ~ phi - 1, walk ~ 0
    assert got["noise"].beta < -0.8
    assert -0.6 < got["ar1"].beta < -0.2
    assert abs(got["walk"].beta) < 0.1


def test_randomized_matches_replay(spark):
    rng = random.Random(20260818)
    series = {}
    for ki in range(25):
        n = rng.randrange(1, 90)
        pts, t = [], 0
        for _ in range(n):
            t += rng.randrange(1, 30)
            pts.append((t, rng.randrange(-900, 900)))
        rng.shuffle(pts)
        series[f"u{ki}"] = pts
    _check(spark, series)


def test_partitioning_invariance(spark):
    rng = random.Random(41)
    pts = [(t, rng.randrange(-400, 400)) for t in range(300)]
    rows = [("k", i, s, c / 100.0) for i, (s, c) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, value double"
    ).repartition(7)
    got = adf_test(df).collect()[0].asDict()
    want = _ref([c for _, c in pts])
    for col, exp in want.items():
        assert got[col] == exp, (col, got[col], exp)
