"""variance_ratio must equal an exact arbitrary-precision replay of
the Lo-MacKinlay rational (Python ints standing in for HUGEINT) on
crafted and randomized streams, and land the textbook verdicts: a
random walk reads random_walk at every rung, iid LEVELS read
mean-reverting (increments are negatively autocorrelated), a trending
walk reads persistent."""

import math
import random
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

from chronoxtract_spark.operators.armodel import VR_LADDER, variance_ratio

QS = VR_LADDER  # (2, 4, 8)


def _r6(x):
    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _ref(cents, qs=QS):
    x = [int(c) for c in cents]
    n = len(x)
    t_ = n - 1
    out = {}
    r_ = (x[-1] - x[0]) if n else 0
    a = {}
    for q in sorted({1, *qs}):
        if t_ >= q:
            a[q] = sum(
                (t_ * (x[i] - x[i - q]) - q * r_) ** 2 for i in range(q, n)
            )
    for q in qs:
        vr = z = verdict = None
        if t_ >= q + 1 and a.get(1, 0) > 0:
            num = a[q] * (t_ - 1) * t_
            den = q * (t_ - q + 1) * (t_ - q) * a[1]
            vr_f = float(num) / float(den)
            c_q = 2.0 * (2 * q - 1) * (q - 1) / (3.0 * q)
            z_f = (vr_f - 1.0) / math.sqrt(c_q / float(t_))
            verdict = (
                "random_walk" if abs(z_f) <= 1.96
                else "persistent" if vr_f > 1.0 else "mean_reverting"
            )
            vr, z = _r6(vr_f), _r6(z_f)
        out[q] = {"n_incr": t_, "vr": vr, "z": z, "verdict": verdict}
    return out


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
    got = {}
    for r in variance_ratio(_df(spark, series, repartition)).collect():
        got.setdefault(r.conv_id, {})[r.q] = r.asDict()
    for k, pts in series.items():
        want = _ref([c for _, c in sorted(pts)])
        assert set(got[k]) == set(want), (k, sorted(got[k]), sorted(want))
        for q, cols in want.items():
            for col, exp in cols.items():
                assert got[k][q][col] == exp, (k, q, col, got[k][q][col], exp)


def test_crafted(spark):
    rng = np.random.default_rng(13)
    _check(spark, {
        # pure random walk
        "walk": [(i, int(c)) for i, c in
                 enumerate(np.cumsum(rng.integers(-80, 81, 400)))],
        # iid levels: one-period increments anti-correlated
        "iid": [(i, int(c)) for i, c in
                enumerate(rng.integers(-500, 500, 400))],
        # constant: a1 = 0, every rung null
        "const": [(i, 300) for i in range(50)],
        # exactly linear: increments all equal -> a1 = 0 -> null
        "lin": [(i, 7 * i) for i in range(60)],
        # too short for the q=8 rung only
        "short": [(i, (i * 37) % 211) for i in range(9)],
        "single": [(0, 42)],
        "pair": [(0, 10), (1, 900)],
    })


def test_verdicts(spark):
    rng = np.random.default_rng(29)
    steps = rng.integers(-80, 81, 2000)
    smooth = np.convolve(steps, np.ones(6), mode="full")[:2000]
    series = {
        "walk": [(i, int(c)) for i, c in enumerate(np.cumsum(steps))],
        "iid": [(i, int(c)) for i, c in
                enumerate(rng.integers(-500, 500, 2000))],
        # positively autocorrelated increments -> persistent
        "trendy": [(i, int(c)) for i, c in
                   enumerate(np.cumsum(smooth))],
    }
    got = {}
    for r in variance_ratio(_df(spark, series)).collect():
        got.setdefault(r.conv_id, {})[r.q] = r
    for q in QS:
        assert got["walk"][q].verdict == "random_walk", got["walk"][q]
        assert got["iid"][q].verdict == "mean_reverting", got["iid"][q]
        assert got["iid"][q].vr < 0.7
        assert got["trendy"][q].verdict == "persistent", got["trendy"][q]
        assert got["trendy"][q].vr > 1.5


def test_qs_parameter(spark):
    rng = random.Random(3)
    cents = [int(c) for c in np.cumsum([rng.randrange(-50, 51) for _ in range(150)])]
    df = _df(spark, {"k": list(enumerate(cents))})
    got = {r.q: r for r in variance_ratio(df, qs=(3, 5)).collect()}
    want = _ref(cents, qs=(3, 5))
    assert set(got) == {3, 5}
    for q in (3, 5):
        assert got[q].vr == want[q]["vr"] and got[q].z == want[q]["z"]


def test_randomized_matches_replay(spark):
    rng = random.Random(20260818)
    series = {}
    for ki in range(25):
        n = rng.randrange(1, 220)
        pts, t, acc = [], 0, 0
        for _ in range(n):
            t += rng.randrange(1, 30)
            if ki % 3 == 0:
                acc += rng.randrange(-60, 61)
                pts.append((t, acc))
            else:
                pts.append((t, rng.randrange(-600, 600)))
        rng.shuffle(pts)
        series[f"u{ki}"] = pts
    _check(spark, series)


def test_partitioning_invariance(spark):
    rng = random.Random(7)
    series = {"k": [(t, rng.randrange(-300, 300)) for t in range(400)]}
    _check(spark, series, repartition=7)
