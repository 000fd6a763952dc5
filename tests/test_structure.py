"""structure_function must equal a plain-numpy replay of the
index-lag increment ladder (exact integer cents) on crafted and
randomized streams, including the drop of rungs longer than the
series."""

import random
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

from chronoxtract_spark.operators.structure import structure_function

LAGS = (1, 2, 4, 8, 16)


def _r6(x):
    """Spark's round(col, 6): HALF_UP on the double's shortest decimal
    repr (python round() is half-even and disagrees on exact halves)."""
    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _ref(cents, lags=LAGS):
    v = np.asarray(cents, dtype=np.int64)
    out = {}
    for h in lags:
        if len(v) <= h:
            continue
        d = v[h:] - v[:-h]
        n = len(d)
        sf2 = _r6(int((d * d).sum()) / (n * 10000.0))
        out[h] = {
            "n_pairs": n,
            "sf1": _r6(int(np.abs(d).sum()) / (n * 100.0)),
            "sf2": sf2,
            "gamma": sf2 * 0.5,
        }
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
    got = {}
    for r in structure_function(df).collect():
        got.setdefault(r.conv_id, {})[r.lag] = r.asDict()
    for k, pts in series.items():
        want = _ref([c for _, c in sorted(pts)])
        assert set(got.get(k, {})) == set(want), (k, got.get(k), want)
        for h, cols in want.items():
            for col, exp in cols.items():
                assert got[k][h][col] == exp, (k, h, col, got[k][h][col], exp)


def test_crafted(spark):
    _check(spark, {
        # constant: every rung exactly 0
        "const": [(i, 300) for i in range(20)],
        # linear ramp slope 1 cent/step: SF1(h)=h cents, SF2(h)=h^2
        "ramp": [(i, i) for i in range(40)],
        # alternation +-a: odd lags see 2a jumps, even lags see 0
        "alt": [(i, 100 if i % 2 else -100) for i in range(24)],
        # shorter than the deepest rung: lag-16 row must be absent
        "short": [(i, i * i) for i in range(10)],
        "single": [(0, 42)],
    })


def test_ramp_closed_form(spark):
    """On the slope-s ramp the ladder is exactly quadratic:
    sf2(h) = (s*h)^2 with zero scatter, gamma its half."""
    s = 3  # cents per step
    rows = [("k", i, i, (s * i) / 100.0) for i in range(50)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, value double"
    )
    got = {r.lag: r for r in structure_function(df).collect()}
    for h in LAGS:
        exp2 = round((s * h) ** 2 / 10000.0, 6)
        assert got[h].sf1 == round(s * h / 100.0, 6)
        assert got[h].sf2 == exp2
        assert got[h].gamma == exp2 * 0.5
        assert got[h].n_pairs == 50 - h


def test_white_noise_flat_ladder(spark):
    """For iid noise SF2(h) is flat at 2*Var: every rung must sit
    within a loose band of twice the empirical variance."""
    rng = np.random.default_rng(9)
    cents = rng.integers(-500, 500, size=4000)
    rows = [("k", i, i, int(c) / 100.0) for i, c in enumerate(cents)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, value double"
    )
    got = {r.lag: r.sf2 for r in structure_function(df).collect()}
    var = float(np.var(cents / 100.0))
    for h in LAGS:
        assert abs(got[h] - 2 * var) < 0.25 * var, (h, got[h], 2 * var)


def test_randomized_matches_replay(spark):
    rng = random.Random(20260818)
    series = {}
    for ki in range(25):
        n = rng.randrange(1, 90)
        pts, t = [], 0
        for _ in range(n):
            t += rng.randrange(1, 30)
            pts.append((t, rng.randrange(-800, 900)))
        rng.shuffle(pts)
        series[f"u{ki}"] = pts
    _check(spark, series)


def test_partitioning_invariance(spark):
    rng = random.Random(7)
    pts = [(t, rng.randrange(-300, 300)) for t in range(400)]
    rows = [("k", i, s, c / 100.0) for i, (s, c) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, value double"
    ).repartition(7)
    got = {r.lag: r.asDict() for r in structure_function(df).collect()}
    want = _ref([c for _, c in pts])
    for h, cols in want.items():
        for col, exp in cols.items():
            assert got[h][col] == exp, (h, col, got[h][col], exp)
