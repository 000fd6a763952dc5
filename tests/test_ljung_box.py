"""ljung_box must equal a plain-Python replay of the exact-integer
autocovariance ratios and the fixed left-associated Q fold, and its
verdicts must discriminate iid noise from serially correlated series."""

import random
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

from chronoxtract_spark.operators.randomness import CHI2_CRIT_5PCT, ljung_box


def _r6(x):
    return float(
        Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP)
    )


def _ref(cents, m=8):
    v = [int(c) for c in cents]
    n = len(v)
    sv = sum(v)
    u = [n * x - sv for x in v]
    a0 = sum(x * x for x in u)  # python ints: exact like decimal(38,0)
    rho1 = None if a0 == 0 else _r6(u_dot(u, 1) / a0)
    if n <= m or a0 == 0:
        return {"n_obs": n, "lb_df": m, "rho1": rho1,
                "q_stat": None, "white_noise": None}
    chain = 0.0
    for k in range(1, m + 1):
        rk = u_dot(u, k) / a0
        chain = chain + (rk * rk) / (float(n) - float(k))
    q = float(n) * (float(n) + 2.0) * chain
    return {
        "n_obs": n,
        "lb_df": m,
        "rho1": rho1,
        "q_stat": _r6(q),
        "white_noise": q <= CHI2_CRIT_5PCT[m],
    }


def u_dot(u, k):
    return sum(a * b for a, b in zip(u, u[k:]))


def _check(spark, series, m=8):
    rows = [
        (k, i, int(s), c / 100.0)
        for k, pts in series.items()
        for i, (s, c) in enumerate(pts)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, value double"
    )
    got = {
        r.conv_id: r.asDict() for r in ljung_box(df, m_lags=m).collect()
    }
    assert set(got) == set(series)
    for k, pts in series.items():
        want = _ref([c for _, c in sorted(pts)], m)
        for col, exp in want.items():
            assert got[k][col] == exp, (k, col, got[k][col], exp)


def test_crafted(spark):
    _check(spark, {
        # constant: a0 = 0 -> everything null
        "const": [(i, 400) for i in range(30)],
        # too short for m=8: q null, rho1 still defined
        "short": [(i, i * 7 % 50) for i in range(8)],
        # strong positive serial correlation: a slow ramp
        "ramp": [(i, 10 * i) for i in range(40)],
        # period-2 alternation: rho1 near -1
        "alt": [(i, 200 if i % 2 else -200) for i in range(40)],
    })


def test_verdicts_discriminate(spark):
    """iid noise passes (Q small), a ramp and an alternation fail."""
    rng = np.random.default_rng(3)
    series = {
        "noise": [(i, int(c)) for i, c in
                  enumerate(rng.integers(-500, 500, size=300))],
        "ramp": [(i, 5 * i) for i in range(300)],
        "alt": [(i, 300 if i % 2 else -300) for i in range(300)],
    }
    rows = [(k, i, s, c / 100.0) for k, pts in series.items()
            for i, (s, c) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, value double"
    )
    got = {r.conv_id: r for r in ljung_box(df).collect()}
    assert got["noise"].white_noise is True
    assert got["ramp"].white_noise is False
    assert got["alt"].white_noise is False
    assert got["ramp"].rho1 > 0.8
    assert got["alt"].rho1 < -0.8


def test_chi2_null_acceptance_rate(spark):
    """Under the iid null the 5% test should accept ~95% of keys —
    check the acceptance rate over 200 independent noise series sits
    in a generous binomial band (99.9% CI half-width ~5%)."""
    rng = np.random.default_rng(11)
    rows = []
    for ki in range(200):
        for i, c in enumerate(rng.integers(-1000, 1000, size=120)):
            rows.append((f"u{ki}", i, i, int(c) / 100.0))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, value double"
    )
    got = ljung_box(df).collect()
    acc = sum(1 for r in got if r.white_noise) / len(got)
    assert 0.88 <= acc <= 1.0, acc


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
    rng = random.Random(13)
    pts = [(t, rng.randrange(-400, 400)) for t in range(350)]
    rows = [("k", i, s, c / 100.0) for i, (s, c) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, value double"
    ).repartition(7)
    got = ljung_box(df).collect()[0].asDict()
    want = _ref([c for _, c in pts])
    for col, exp in want.items():
        assert got[col] == exp, (col, got[col], exp)
