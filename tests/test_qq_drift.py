"""qq_drift must equal an order-statistics replay of the per-half
decile cuts on crafted and randomized streams, and read the
signature shapes: location shifts move every rung equally, tail
blow-ups move only the top, variance growth fans the ladder out."""

import random
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

from chronoxtract_spark.operators.drift import qq_drift

BINS = 10


def _r6(x):
    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _ref(cents, n_bins=BINS):
    n = len(cents)
    half = n // 2
    ref, cur = sorted(cents[:half]), sorted(cents[half:])
    out = {}
    if not ref or not cur:
        return out
    for k in range(1, n_bins):
        vr = ref[-(-k * len(ref) // n_bins) - 1]
        vc = cur[-(-k * len(cur) // n_bins) - 1]
        out[k] = {
            "q_ref": _r6(vr / 100.0),
            "q_cur": _r6(vc / 100.0),
            "shift": _r6((vc - vr) / 100.0),
        }
    return out


def _df(spark, series, repartition=None):
    rows = [
        (k, i, i, c / 100.0)
        for k, cents in series.items()
        for i, c in enumerate(cents)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, value double"
    )
    return df.repartition(repartition) if repartition else df


def _check(spark, series, repartition=None):
    got = {}
    for r in qq_drift(_df(spark, series, repartition)).collect():
        got.setdefault(r.conv_id, {})[r.decile] = r.asDict()
    for k, cents in series.items():
        want = _ref(cents)
        assert set(got.get(k, {})) == set(want), (k, got.get(k), sorted(want))
        for dk, cols in want.items():
            for col, exp in cols.items():
                assert got[k][dk][col] == exp, (k, dk, col, got[k][dk][col], exp)


def test_crafted(spark):
    _check(spark, {
        # identical halves: every shift exactly 0
        "same": list(range(0, 5000, 100)) * 2,
        # pure +10.00 location shift
        "loc": list(range(0, 5000, 100)) + list(range(1000, 6000, 100)),
        # single point: empty reference half, no rows
        "single": [42],
        # tiny halves: dup ranks collapse deciles onto few values
        "tiny": [100, 900, 200, 800],
        # heavy ties
        "ties": [500] * 20 + [500] * 10 + [700] * 10,
    })


def test_signature_shapes(spark):
    rng = np.random.default_rng(23)
    base = rng.integers(0, 10000, 2000)
    series = {
        "loc": [int(c) for c in base] + [int(c) + 500 for c in base],
        "tail": [int(c) for c in base]
        + [int(c) if c < 8000 else int(c) * 3 for c in base],
        "fan": [int(c) for c in base] + [int(2 * c - 5000) for c in base],
    }
    got = {}
    for r in qq_drift(_df(spark, series)).collect():
        got.setdefault(r.conv_id, {})[r.decile] = r
    # location: every rung shifts ~ +5.00
    loc_shifts = [got["loc"][k].shift for k in range(1, 10)]
    assert all(abs(s - 5.0) < 1.0 for s in loc_shifts), loc_shifts
    # tail: bottom rungs still, top rung flies
    assert abs(got["tail"][1].shift) < 1.0
    assert got["tail"][9].shift > 50.0
    # fan: monotone-increasing shift crossing zero near the median
    fan = [got["fan"][k].shift for k in range(1, 10)]
    assert fan == sorted(fan)
    assert fan[0] < -20.0 < 20.0 < fan[-1]


def test_randomized_matches_replay(spark):
    rng = random.Random(20260819)
    series = {}
    for ki in range(25):
        n = rng.randrange(1, 250)
        shift = rng.choice([0, 0, 300])
        series[f"u{ki}"] = [
            rng.randrange(-500, 500) + (shift if j >= n // 2 else 0)
            for j in range(n)
        ]
    _check(spark, series)


def test_partitioning_invariance(spark):
    rng = random.Random(7)
    _check(
        spark,
        {"k": [rng.randrange(-400, 400) for _ in range(300)]},
        repartition=7,
    )
