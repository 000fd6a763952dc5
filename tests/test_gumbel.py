"""gumbel_blocks must equal an exact arbitrary-precision replay of
the n-scaled moment fit on crafted and randomized streams, and the
fitted return level must calibrate on actual Gumbel draws: the
100-block level exceeded roughly once per 100 blocks."""

import math
import random
from decimal import ROUND_HALF_UP, Decimal

from chronoxtract_spark.operators.extremes import EULER_GAMMA, gumbel_blocks

BLOCK = 86400
SQRT6_PI = math.sqrt(6.0) / math.pi
TQ100 = -math.log(-math.log(1.0 - 1.0 / 100.0))


def _r6(x):
    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _ref(points, block_s=BLOCK, return_blocks=100):
    maxima = {}
    for s, c in points:
        b = s // block_s
        maxima[b] = max(maxima.get(b, c), c)
    m = list(maxima.values())
    n = len(m)
    s_, ss = sum(m), sum(x * x for x in m)
    mean = float(s_) / (float(n) * 100.0)
    out = {"n_blocks": n, "block_max_mean": _r6(mean),
           "gumbel_mu": None, "gumbel_beta": None, "rl": None}
    vn = n * ss - s_ * s_
    if n < 2 or vn <= 0:
        return out
    sd = math.sqrt(float(vn) / (float(n) * (float(n) - 1.0))) / 100.0
    beta = sd * SQRT6_PI
    mu = mean - EULER_GAMMA * beta
    tq = -math.log(-math.log(1.0 - 1.0 / float(return_blocks)))
    out.update(
        gumbel_mu=_r6(mu), gumbel_beta=_r6(beta), rl=_r6(mu + beta * tq)
    )
    return out


def _df(spark, series, repartition=None):
    rows = [
        (k, int(s), c / 100.0)
        for k, pts in series.items()
        for s, c in pts
    ]
    df = spark.createDataFrame(rows, "event_type string, ts long, value double")
    return df.repartition(repartition) if repartition else df


def _check(spark, series, repartition=None):
    got = {r.event_type: r.asDict()
           for r in gumbel_blocks(_df(spark, series, repartition)).collect()}
    for k, pts in series.items():
        want = _ref(pts)
        for col, exp in want.items():
            assert got[k][col] == exp, (k, col, got[k][col], exp)


def test_crafted(spark):
    day = BLOCK
    _check(spark, {
        # constant block maxima: zero variance -> null fit
        "const": [(i * day + j, 500) for i in range(10) for j in (0, 99)],
        # single block
        "one": [(5, 100), (10, 900), (50, 200)],
        # two blocks, exact arithmetic
        "two": [(0, 100), (day, 300)],
        # in-block noise must not leak: only the max per day counts
        "noisy": [(i * day + j, (i * 37) % 500 + (j % 7))
                  for i in range(8) for j in range(20)],
    })


def test_calibration(spark):
    """On 5000 true Gumbel(50, 10) daily maxima the fitted mu/beta
    land near truth and the 100-day return level is exceeded ~1% of
    blocks (loose band: binomial sd ~ 0.14%)."""
    rng = random.Random(11)
    pts = []
    for i in range(5000):
        g = 50.0 - 10.0 * math.log(-math.log(rng.random()))
        pts.append((i * BLOCK, int(round(g * 100))))
    got = gumbel_blocks(_df(spark, {"g": pts})).collect()[0]
    assert abs(got.gumbel_mu - 50.0) < 1.0, got
    assert abs(got.gumbel_beta - 10.0) < 0.7, got
    exceed = sum(1 for _, c in pts if c / 100.0 > got.rl) / 5000.0
    assert 0.004 < exceed < 0.02, (exceed, got.rl)


def test_return_blocks_parameter(spark):
    rng = random.Random(3)
    pts = [(i * BLOCK, rng.randrange(0, 10**5)) for i in range(200)]
    got = gumbel_blocks(_df(spark, {"k": pts}), return_blocks=365).collect()[0]
    want = _ref(pts, return_blocks=365)
    assert got.rl == want["rl"]
    # a rarer event needs a higher level
    got100 = gumbel_blocks(_df(spark, {"k": pts})).collect()[0]
    assert got.rl > got100.rl


def test_randomized_matches_replay(spark):
    rng = random.Random(20260819)
    series = {}
    for ki in range(20):
        n = rng.randrange(1, 400)
        t0 = rng.randrange(0, 10**6)
        series[f"u{ki}"] = [
            (t0 + i * rng.randrange(1000, 200000),
             rng.randrange(-10**4, 10**5))
            for i in range(n)
        ]
    _check(spark, series)


def test_partitioning_invariance(spark):
    rng = random.Random(7)
    pts = [(i * 3600, rng.randrange(0, 10**5)) for i in range(700)]
    _check(spark, {"k": pts}, repartition=7)
