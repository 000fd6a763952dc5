"""survival_curve must equal a sequential Kaplan-Meier replay (with
right-censoring and Greenwood SE) on crafted and randomized cohorts."""

import math
import random
from collections import Counter

from chronoxtract_spark.operators.survival import survival_curve


def _ref(lifetimes, censor_flags):
    """Sequential KM over (t, censored) pairs."""
    deaths = Counter(t for t, c in zip(lifetimes, censor_flags) if not c)
    cens = Counter(t for t, c in zip(lifetimes, censor_flags) if c)
    times = sorted(set(deaths) | set(cens))
    n = len(lifetimes)
    s = 1.0
    lnsum = 0.0
    gw = 0.0
    out = {}
    for t in times:
        d, c = deaths.get(t, 0), cens.get(t, 0)
        if d > 0:
            if d < n:
                lnsum += math.log(1.0 - d / n)
                gw += d / (n * (n - d))
                s = math.exp(lnsum)
            else:
                s = 0.0
            out[t] = {
                "n_risk": n,
                "n_deaths": d,
                "n_censored": c,
                "survival": s,
                "greenwood_se": s * math.sqrt(gw),
            }
        n -= d + c
    return out


def _run(spark, rows, censor_window_s):
    """rows: [(key, ts)]"""
    df = spark.createDataFrame(rows, "conv_id string, ts long")
    got = survival_curve(
        df, censor_window_s=censor_window_s, round_digits=None
    ).collect()
    return {r.lifetime_s: r.asDict() for r in got}


def _lifetimes(rows, censor_window_s):
    first, last = {}, {}
    for k, s in rows:
        first[k] = min(first.get(k, s), s)
        last[k] = max(last.get(k, s), s)
    t_end = max(last.values())
    lts = [last[k] - first[k] for k in first]
    cf = [last[k] > t_end - censor_window_s for k in first]
    return lts, cf


def _check(spark, rows, censor_window_s):
    got = _run(spark, rows, censor_window_s)
    lts, cf = _lifetimes(rows, censor_window_s)
    want = _ref(lts, cf)
    assert set(got) == set(want)
    for t, w in want.items():
        g = got[t]
        for col, exp in w.items():
            assert math.isclose(g[col], exp, rel_tol=1e-12, abs_tol=1e-15), (
                t, col, g[col], exp)


def test_hand_computed(spark):
    # 4 keys: lifetimes 10 (dead), 10 (dead), 20 (dead), 25 (censored:
    # ends at horizon 100 with window 30 -> last > 70)
    rows = [
        ("a", 0), ("a", 10),
        ("b", 50), ("b", 60),
        ("c", 10), ("c", 30),
        ("d", 75), ("d", 100),
    ]
    got = _run(spark, rows, censor_window_s=30)
    # t=10: n=4, d=2 -> S = 1/2 ; t=20: n=2, d=1 -> S = 1/4
    assert got[10]["n_risk"] == 4 and got[10]["n_deaths"] == 2
    assert math.isclose(got[10]["survival"], 0.5, rel_tol=1e-12)
    assert got[20]["n_risk"] == 2 and got[20]["n_deaths"] == 1
    assert math.isclose(got[20]["survival"], 0.25, rel_tol=1e-12)
    assert 25 not in got  # censored-only time emits no curve row
    _check(spark, rows, 30)


def test_no_censoring_is_empirical_cdf(spark):
    # window 0: nothing censored except... nothing (t1 > t_end never) ->
    # S(t) = fraction of lifetimes > t
    rows = []
    lts = [0, 5, 5, 9, 14, 14, 14, 30]
    for i, lt in enumerate(lts):
        rows += [(f"k{i}", 1000), (f"k{i}", 1000 + lt)]
    got = _run(spark, rows, censor_window_s=0)
    n = len(lts)
    for t, g in got.items():
        frac = sum(1 for x in lts if x > t) / n
        assert math.isclose(g["survival"], frac, rel_tol=1e-12), (t, g, frac)
    _check(spark, rows, 0)


def test_randomized(spark):
    rng = random.Random(20260818)
    rows = []
    for i in range(400):
        start = rng.randrange(0, 50000)
        dur = rng.randrange(0, 40000)
        k = f"u{i}"
        rows.append((k, start))
        rows.append((k, start + dur))
        for _ in range(rng.randrange(0, 4)):
            rows.append((k, start + rng.randrange(0, dur + 1)))
    _check(spark, rows, censor_window_s=20000)
    # and a survival sanity: S is nonincreasing in t
    got = _run(spark, rows, 20000)
    ts = sorted(got)
    for a, b in zip(ts, ts[1:]):
        assert got[b]["survival"] <= got[a]["survival"] + 1e-15
