"""robust_location must equal an exact integer replay of the
doubled-median machinery on crafted and randomized streams, and
demonstrate the point: one wild outlier drags the mean but leaves
every robust statistic untouched."""

import random
from decimal import ROUND_HALF_UP, Decimal

from chronoxtract_spark.operators.robust import robust_location


def _r6(x):
    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _med2(vals):
    """2 * median as the exact integer sum of the two middles."""
    s = sorted(vals)
    n = len(s)
    lo, hi = (n + 1) // 2, (n + 2) // 2
    return s[lo - 1] + s[hi - 1] if hi != lo else 2 * s[lo - 1]


def _ref(cents, trim_frac=10, z_cut=3.5):
    v = sorted(int(c) for c in cents)
    n = len(v)
    m2 = _med2(v)
    d2 = [abs(2 * x - m2) for x in v]
    mad4 = _med2(d2)
    k = min(n // trim_frac, (n - 1) // 2)
    mid = v[k: n - k]
    trimmed = sum(mid) / (len(mid) * 100.0)
    winsor = (sum(mid) + k * (v[k] + v[n - k - 1])) / (n * 100.0)
    n_out = (
        sum(1 for x in d2 if 2.0 * 0.6745 * float(x) > z_cut * float(mad4))
        if mad4 > 0 else None
    )
    return {
        "n": n,
        "median": _r6(m2 / 200.0),
        "mad": _r6(mad4 / 400.0),
        "trimmed_mean": _r6(trimmed),
        "winsor_mean": _r6(winsor),
        "n_outliers": n_out,
    }


def _df(spark, series, repartition=None):
    rows = [(k, c / 100.0) for k, cents in series.items() for c in cents]
    df = spark.createDataFrame(rows, "conv_id string, value double")
    return df.repartition(repartition) if repartition else df


def _check(spark, series, repartition=None):
    got = {r.conv_id: r.asDict()
           for r in robust_location(_df(spark, series, repartition)).collect()}
    for k, cents in series.items():
        want = _ref(cents)
        for col, exp in want.items():
            assert got[k][col] == exp, (k, col, got[k][col], exp)


def test_crafted(spark):
    _check(spark, {
        # constant: MAD exactly 0, outliers null
        "const": [500] * 25,
        "single": [42],
        "pair": [100, 900],
        # even/odd medians, both middle-average cases
        "odd": [10, 20, 30, 40, 50],
        "even": [10, 20, 30, 41],
        # more than half at the median: degenerate MAD
        "half": [700] * 6 + [100, 200, 300, 9000],
        # n=2 with trim_frac=2 semantics guarded by the (n-1)//2 cap
        "tiny": [100, 300],
    })


def test_outlier_immunity(spark):
    rng = random.Random(11)
    base = [rng.randrange(900, 1100) for _ in range(499)]
    clean = dict(zip(("clean", "dirty"), (base, base + [10**7])))
    got = {r.conv_id: r for r in robust_location(_df(spark, clean)).collect()}
    c, d = got["clean"], got["dirty"]
    assert abs(c.median - d.median) < 0.02
    assert abs(c.mad - d.mad) < 0.02
    assert abs(c.trimmed_mean - d.trimmed_mean) < 0.05
    assert abs(c.winsor_mean - d.winsor_mean) < 0.05
    assert d.n_outliers == (c.n_outliers or 0) + 1
    # and the plain mean would have moved ~200x more
    mean_c = sum(base) / len(base) / 100.0
    mean_d = (sum(base) + 10**7) / (len(base) + 1) / 100.0
    assert abs(mean_d - mean_c) > 100 * abs(d.winsor_mean - c.winsor_mean)


def test_trim_frac_parameter(spark):
    cents = [100, 200, 300, 400, 500, 600, 700, 800, 900, 10**6]
    got = robust_location(_df(spark, {"k": cents}), trim_frac=5).collect()[0]
    want = _ref(cents, trim_frac=5)
    assert got.trimmed_mean == want["trimmed_mean"]
    # 20% trim drops the 1e6 spike entirely
    assert got.trimmed_mean < 10.0


def test_randomized_matches_replay(spark):
    rng = random.Random(20260819)
    series = {}
    for ki in range(25):
        n = rng.randrange(1, 250)
        spikes = [rng.randrange(-10**6, 10**6)
                  for _ in range(rng.randrange(0, 3))]
        series[f"u{ki}"] = [rng.randrange(-500, 500)
                            for _ in range(n)] + spikes
    _check(spark, series)


def test_partitioning_invariance(spark):
    rng = random.Random(7)
    _check(
        spark,
        {"k": [rng.randrange(-400, 400) for _ in range(301)]},
        repartition=7,
    )
