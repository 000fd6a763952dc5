"""fano_factor must equal an exact arbitrary-precision replay of the
bucket-count dispersion rational (empty buckets analytic through the
span B) on crafted and randomized arrival streams, and land the
textbook point-process verdicts: Poisson arrivals ~1, burst trains
clustered, a metronome regular."""

import math
import random
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

from chronoxtract_spark.operators.cadence import FANO_LADDER_S, fano_factor

WS = FANO_LADDER_S  # (60, 600, 3600)


def _r6(x):
    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _ref(secs, ws=WS):
    out = {}
    n = len(secs)
    for w in ws:
        cnt = Counter(s // w for s in secs)
        bmin, bmax = min(cnt), max(cnt)
        b = bmax - bmin + 1
        q = sum(c * c for c in cnt.values())
        fano = float(b * q - n * n) / float(n * b)
        z = verdict = None
        if b >= 2:
            z_f = (fano - 1.0) / math.sqrt(2.0 / float(b - 1))
            verdict = ("poisson" if abs(z_f) <= 1.96
                       else "clustered" if fano > 1.0 else "regular")
            z = _r6(z_f)
        out[w] = {
            "n_events": n, "n_buckets": b,
            "mean_count": _r6(n / b), "fano": _r6(fano),
            "z": z, "verdict": verdict,
        }
    return out


def _df(spark, series, repartition=None):
    rows = [(k, int(s)) for k, secs in series.items() for s in secs]
    df = spark.createDataFrame(rows, "event_type string, ts long")
    return df.repartition(repartition) if repartition else df


def _check(spark, series, repartition=None):
    got = {}
    for r in fano_factor(_df(spark, series, repartition)).collect():
        got.setdefault(r.event_type, {})[r.w_s] = r.asDict()
    for k, secs in series.items():
        want = _ref(secs)
        assert set(got[k]) == set(want)
        for w, cols in want.items():
            for col, exp in cols.items():
                assert got[k][w][col] == exp, (k, w, col, got[k][w][col], exp)


def test_crafted(spark):
    _check(spark, {
        # all events inside one base bucket at every w: B=1, F exact 0
        "burst1": [7, 12, 33, 50, 59],
        # metronome at exactly one per bucket: F = 0 (B buckets, all 1)
        "metro": [w * 60 + 30 for w in range(40)],
        # single event
        "single": [1234],
        # two events a span apart: empty middle buckets via B only
        "gap": [0, 36000],
        # same-second pileup
        "pile": [100] * 20 + [7000],
    })


def test_verdicts(spark):
    # seed pinned so the Poisson draw sits inside the 5% band at
    # every rung (any seed is in-band ~86% of the time; this one is)
    rng = np.random.default_rng(21)
    # homogeneous Poisson, ~1 event / 30 s over ~2 days
    pois = np.cumsum(rng.exponential(30.0, 6000)).astype(np.int64)
    # bursty: Poisson cluster process — sparse parents, tight clusters
    parents = np.cumsum(rng.exponential(1800.0, 100)).astype(np.int64)
    bursts = np.concatenate(
        [p + rng.integers(0, 120, 60) for p in parents]
    )
    # metronome with jitter well under a bucket
    metro = np.arange(4000, dtype=np.int64) * 60 + rng.integers(0, 5, 4000)
    series = {
        "pois": [int(s) for s in pois],
        "burst": [int(s) for s in bursts],
        "metro": [int(s) for s in metro],
    }
    got = {}
    for r in fano_factor(_df(spark, series)).collect():
        got.setdefault(r.event_type, {})[r.w_s] = r
    for w in WS:
        assert got["burst"][w].verdict == "clustered", got["burst"][w]
    assert got["metro"][60].verdict == "regular", got["metro"][60]
    assert got["pois"][60].verdict == "poisson", got["pois"][60]
    assert abs(got["pois"][60].fano - 1.0) < 0.1
    # clustering grows with window for the burst train
    assert got["burst"][3600].fano > got["burst"][60].fano


def test_nesting_validation(spark):
    df = _df(spark, {"k": [1, 2, 3]})
    import pytest

    with pytest.raises(ValueError):
        fano_factor(df, windows_s=(60, 90))


def test_randomized_matches_replay(spark):
    rng = random.Random(20260818)
    series = {}
    for ki in range(25):
        n = rng.randrange(1, 300)
        mode = ki % 3
        secs, t = [], rng.randrange(0, 10**6)
        for _ in range(n):
            t += (rng.randrange(1, 10) if mode == 0
                  else rng.randrange(1, 2000) if mode == 1
                  else rng.choice([1, 1, 1, 5000]))
            secs.append(t)
        rng.shuffle(secs)
        series[f"u{ki}"] = secs
    _check(spark, series)


def test_partitioning_invariance(spark):
    rng = random.Random(7)
    secs, t = [], 0
    for _ in range(500):
        t += rng.randrange(1, 400)
        secs.append(t)
    _check(spark, {"k": secs}, repartition=7)
