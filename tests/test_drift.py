"""distribution_drift must equal a plain-Python replay of the exact
integer KS walk and the reference-decile PSI fold on crafted and
randomized streams, land the textbook verdicts (identical halves
stable, shifted halves drifted), honor split_col, and survive
repartitioning."""

import math
import random
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

from chronoxtract_spark.operators.drift import distribution_drift

BINS = 10


def _r6(x):
    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _ref(cents_ref, cents_cur):
    """Exact replay: int64 ECDF-gap walk; type-1 decile edges of the
    reference; Laplace-smoothed PSI folded in ascending bin order."""
    na, nb = len(cents_ref), len(cents_cur)
    if na == 0 or nb == 0:
        return {"n_ref": na, "n_cur": nb, "ks_d": None, "psi": None,
                "psi_verdict": None}
    from collections import Counter
    fa, fb = Counter(cents_ref), Counter(cents_cur)
    cum_a = cum_b = 0
    ks_int = 0
    for v in sorted(set(cents_ref) | set(cents_cur)):
        cum_a += fa.get(v, 0)
        cum_b += fb.get(v, 0)
        ks_int = max(ks_int, abs(cum_a * nb - cum_b * na))
    srt = sorted(cents_ref)
    edges = [srt[-(-k * na // BINS) - 1] for k in range(1, BINS)]

    def bin_of(v):
        return sum(1 for e in edges if v > e)

    ca, cb = Counter(map(bin_of, cents_ref)), Counter(map(bin_of, cents_cur))
    psi = 0.0
    for b in sorted(set(ca) | set(cb)):
        p = (ca.get(b, 0) + 0.5) / (na + 5.0)
        q = (cb.get(b, 0) + 0.5) / (nb + 5.0)
        psi += (p - q) * math.log(p / q)
    verdict = ("drifted" if psi > 0.2 else
               "moderate" if psi > 0.1 else "stable")
    return {"n_ref": na, "n_cur": nb, "ks_d": _r6(ks_int / (na * nb)),
            "psi": _r6(psi), "psi_verdict": verdict}


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
        for r in distribution_drift(_df(spark, series, repartition)).collect()
    }
    for k, pts in series.items():
        cents = [c for _, c in sorted(pts)]
        want = _ref(cents[: len(cents) // 2], cents[len(cents) // 2 :])
        for col, exp in want.items():
            assert got[k][col] == exp, (k, col, got[k][col], exp)


def test_crafted(spark):
    rng = np.random.default_rng(3)
    base = [int(c) for c in rng.integers(-500, 500, 60)]
    _check(spark, {
        # both halves the same multiset: KS 0, PSI ~0, stable
        "same": [(i, base[i % 60]) for i in range(120)],
        # late half shifted far right: verdict must read drifted
        "shift": [(i, base[i % 60] + (0 if i < 60 else 2000))
                  for i in range(120)],
        # constant stream: single bin, zero KS, stable
        "const": [(i, 250) for i in range(40)],
        # heavy ties across the split boundary
        "ties": [(i, (i * 7) % 3 * 100) for i in range(31)],
        # single point: empty reference half, null stats
        "single": [(0, 42)],
        "pair": [(0, 10), (1, 900)],
    })


def test_verdict_bands(spark):
    """Same-distribution halves sit under 0.1; a mean shift of one
    full spread crosses 0.2."""
    rng = np.random.default_rng(11)
    a = [int(c) for c in rng.integers(0, 1000, 400)]
    b = [int(c) for c in rng.integers(0, 1000, 400)]
    series = {
        "stable": [(i, v) for i, v in enumerate(a + b)],
        "drift": [(i, v) for i, v in enumerate(a + [v + 1000 for v in b])],
    }
    got = {r.conv_id: r for r in distribution_drift(_df(spark, series)).collect()}
    assert got["stable"].psi_verdict == "stable", got["stable"]
    assert got["drift"].psi_verdict == "drifted", got["drift"]
    assert got["drift"].ks_d > 0.9
    assert got["stable"].ks_d < 0.15


def test_split_col_override(spark):
    """An explicit boolean split column replaces the time split."""
    rows = [("k", i, i, float(v), v >= 50) for i, v in enumerate(range(100))]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx long, ts long, value double, newer boolean",
    )
    got = distribution_drift(df, split_col="newer").collect()[0]
    want = _ref(list(range(0, 5000, 100)), list(range(5000, 10000, 100)))
    assert got.n_ref == 50 and got.n_cur == 50
    assert got.ks_d == want["ks_d"] == 1.0  # disjoint supports
    assert got.psi == want["psi"]
    assert got.psi_verdict == "drifted"


def test_randomized_matches_replay(spark):
    rng = random.Random(20260818)
    series = {}
    for ki in range(24):
        n = rng.randrange(1, 200)
        shift = rng.choice([0, 0, 150, 600])
        pts, t = [], 0
        for j in range(n):
            t += rng.randrange(1, 30)
            pts.append((t, rng.randrange(-400, 400) + (shift if j >= n // 2 else 0)))
        rng.shuffle(pts)
        series[f"u{ki}"] = pts
    _check(spark, series)


def test_partitioning_invariance(spark):
    rng = random.Random(7)
    series = {"k": [(t, rng.randrange(-300, 300) + (200 if t > 150 else 0))
                    for t in range(300)]}
    _check(spark, series, repartition=7)
