"""circadian_stats must equal a plain-Python replay of the binned
circular moment (same literal weights, same fold order) and its
Rayleigh limits must pin: concentration -> resultant 1 / z = n,
balance -> resultant 0, wrap-around mean direction at midnight."""

import math
import random
from decimal import ROUND_HALF_UP, Decimal

from chronoxtract_spark.operators.cadence import (
    RAYLEIGH_ALPHA,
    circadian_stats,
)

B = 24


def _r6(x):
    return float(
        Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP)
    )


def _ref(secs, n_bins=B):
    wcos = [math.cos(2.0 * math.pi * (b + 0.5) / n_bins) for b in range(n_bins)]
    wsin = [math.sin(2.0 * math.pi * (b + 0.5) / n_bins) for b in range(n_bins)]
    per = 86400 // n_bins
    cnt = [0] * n_bins
    for s in secs:
        cnt[(s % 86400) // per] += 1
    n = len(secs)
    cc = ss = None
    for b in range(n_bins):
        tc, ts = float(cnt[b]) * wcos[b], float(cnt[b]) * wsin[b]
        cc = tc if cc is None else cc + tc
        ss = ts if ss is None else ss + ts
    res = math.sqrt(cc * cc + ss * ss) / float(n)
    z = float(n) * res * res
    p = min(1.0, math.exp(-z) * (1.0 + (2.0 * z - z * z) / (4.0 * float(n))))
    hr = math.atan2(ss, cc) / (2.0 * math.pi) * 24.0
    return {
        "n_obs": n,
        "resultant": _r6(res),
        "mean_hour": _r6(hr + 24.0 if hr < 0 else hr),
        "rayleigh_z": _r6(z),
        "p_uniform": _r6(p),
        "uniform": p > RAYLEIGH_ALPHA,
    }


def _run(spark, series):
    rows = [(k, int(s)) for k, secs in series.items() for s in secs]
    df = spark.createDataFrame(rows, "conv_id string, ts long")
    return {
        r.conv_id: r.asDict() for r in circadian_stats(df).collect()
    }


def _check(spark, series):
    got = _run(spark, series)
    assert set(got) == set(series)
    for k, secs in series.items():
        want = _ref(secs)
        for col, exp in want.items():
            assert got[k][col] == exp, (k, col, got[k][col], exp)


def test_concentrated_key(spark):
    """All events inside one hour bin: resultant exactly 1 (round6),
    z = n, mean hour = the bin center, decisively non-uniform."""
    secs = [9 * 3600 + 60 * i for i in range(40)]  # all in hour 9
    got = _run(spark, {"k": secs})["k"]
    assert got["resultant"] == 1.0
    assert got["rayleigh_z"] == 40.0
    assert got["mean_hour"] == 9.5  # bin center
    assert got["uniform"] is False


def test_balanced_key_resultant_zero(spark):
    """Equal mass in two opposite bins (hours 3 and 15): the circular
    moment cancels to ~0 and the test calls it uniform."""
    secs = [3 * 3600 + i for i in range(20)] + [
        15 * 3600 + i for i in range(20)
    ]
    got = _run(spark, {"k": secs})["k"]
    assert got["resultant"] < 1e-9
    assert got["uniform"] is True


def test_midnight_wraparound(spark):
    """Equal mass at 23h and 0h: the mean direction is midnight, not
    11.5 — the circular mean respects the wrap."""
    secs = [23 * 3600 + i for i in range(15)] + [i for i in range(15)]
    got = _run(spark, {"k": secs})["k"]
    # mean of bin centers 23.5h and 0.5h around the circle = 0h (24h)
    assert got["mean_hour"] in (0.0, 24.0) or got["mean_hour"] < 1e-6 \
        or got["mean_hour"] > 23.999999
    assert got["uniform"] is False


def test_uniform_spread_accepts(spark):
    """One event in every hour of the day: p ~ 1."""
    secs = [h * 3600 + 1800 for h in range(24)] * 3
    got = _run(spark, {"k": secs})["k"]
    assert got["resultant"] < 1e-9
    assert got["p_uniform"] == 1.0
    assert got["uniform"] is True


def test_randomized_matches_replay(spark):
    rng = random.Random(20260818)
    series = {}
    for ki in range(25):
        n = rng.randrange(1, 120)
        base_day = rng.randrange(0, 30) * 86400
        series[f"u{ki}"] = [
            base_day + rng.randrange(0, 86400) for _ in range(n)
        ]
    _check(spark, series)


def test_partitioning_invariance(spark):
    rng = random.Random(31)
    secs = [rng.randrange(0, 86400 * 7) for _ in range(600)]
    rows = [("k", s) for s in secs]
    df = spark.createDataFrame(rows, "conv_id string, ts long").repartition(7)
    got = circadian_stats(df).collect()[0].asDict()
    want = _ref(secs)
    for col, exp in want.items():
        assert got[col] == exp, (col, got[col], exp)
