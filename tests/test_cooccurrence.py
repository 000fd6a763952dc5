"""cooccurrence_mi must equal an exact set-algebra replay of the 2x2
presence table on crafted and randomized streams, and read the three
canonical relationships: always-together pairs at high MI and phi 1,
independent pairs near 0, mutually exclusive pairs at negative phi."""

import math
import random
from decimal import ROUND_HALF_UP, Decimal

from chronoxtract_spark.operators.cohort import cooccurrence_mi

BUCKET = 3600


def _r6(x):
    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _ref(series, bucket_s=BUCKET):
    sets = {k: {s // bucket_s for s in secs} for k, secs in series.items()}
    all_b = set().union(*sets.values())
    h = max(all_b) - min(all_b) + 1
    out = {}
    for a in sorted(sets):
        for b in sorted(sets):
            if a >= b:
                continue
            sa, sb = len(sets[a]), len(sets[b])
            n11 = len(sets[a] & sets[b])
            n10, n01 = sa - n11, sb - n11
            n00 = h - sa - sb + n11
            mi = 0.0
            for nij, ri, cj in ((n11, sa, sb), (n10, sa, h - sb),
                                (n01, h - sa, sb), (n00, h - sa, h - sb)):
                if nij > 0:
                    mi += (nij / h) * math.log((h * nij) / (ri * cj))
            den = sa * (h - sa) * sb * (h - sb)
            phi = (
                _r6((n11 * n00 - n10 * n01) / math.sqrt(float(den)))
                if den > 0 else None
            )
            out[(a, b)] = {
                "n_buckets": h, "n_a": sa, "n_b": sb, "n_both": n11,
                "mi_nats": _r6(mi), "phi": phi,
            }
    return out


def _df(spark, series, repartition=None):
    rows = [(k, int(s)) for k, secs in series.items() for s in secs]
    df = spark.createDataFrame(rows, "event_type string, ts long")
    return df.repartition(repartition) if repartition else df


def _check(spark, series, repartition=None):
    got = {
        (r.name_a, r.name_b): r.asDict()
        for r in cooccurrence_mi(_df(spark, series, repartition)).collect()
    }
    want = _ref(series)
    assert set(got) == set(want), (sorted(got), sorted(want))
    for pair, cols in want.items():
        for col, exp in cols.items():
            assert got[pair][col] == exp, (pair, col, got[pair][col], exp)


def test_crafted(spark):
    h = BUCKET
    _check(spark, {
        # a and b share every hour; c avoids them; d fills the span
        "a": [0, h, 2 * h, 99, h + 5],
        "b": [10, h + 1, 2 * h + 7],
        "c": [3 * h, 4 * h],
        "d": [i * h + 30 for i in range(5)],
    })


def test_relationships(spark):
    h = BUCKET
    rng = random.Random(7)
    even = [i * h for i in range(0, 200, 2)]
    odd = [i * h for i in range(1, 200, 2)]
    inda = [i * h for i in range(200) if rng.random() < 0.5]
    indb = [i * h for i in range(200) if rng.random() < 0.5]
    series = {
        "e1": even, "e2": [s + 9 for s in even],   # identical presence
        "o1": odd,                                  # exclusive vs e1
        "ra": inda, "rb": indb,                     # independent
    }
    got = {(r.name_a, r.name_b): r
           for r in cooccurrence_mi(_df(spark, series)).collect()}
    assert got[("e1", "e2")].phi == 1.0
    assert got[("e1", "e2")].mi_nats > 0.69  # ~ln 2
    assert got[("e1", "o1")].phi == -1.0
    assert got[("e1", "o1")].n_both == 0
    assert abs(got[("ra", "rb")].phi) < 0.15
    assert got[("ra", "rb")].mi_nats < 0.02


def test_degenerate_full_presence(spark):
    """A name active in EVERY span bucket has a zero-variance
    indicator: phi null, MI exactly 0 against anything."""
    h = BUCKET
    series = {
        "full": [i * h for i in range(10)],
        "some": [0, h, 5 * h],
    }
    got = cooccurrence_mi(_df(spark, series)).collect()[0]
    assert got.phi is None
    assert got.mi_nats == 0.0


def test_randomized_matches_replay(spark):
    rng = random.Random(20260819)
    series = {}
    for ki in range(8):
        n = rng.randrange(1, 150)
        secs, t = [], rng.randrange(0, 10**6)
        for _ in range(n):
            t += rng.randrange(1, 3 * BUCKET)
            secs.append(t)
        series[f"u{ki}"] = secs
    _check(spark, series)


def test_partitioning_invariance(spark):
    rng = random.Random(7)
    series = {
        k: [rng.randrange(0, 100 * BUCKET) for _ in range(80)]
        for k in ("p", "q", "r")
    }
    _check(spark, series, repartition=7)
