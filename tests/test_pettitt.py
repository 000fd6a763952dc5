"""pettitt must equal an integer-arithmetic replay of the U-statistic
scan (V row sums, telescoping cumulative U, earliest-argmax K, the
2exp(-6K^2/(n^3+n^2)) significance) on crafted level shifts and
randomized series, and detect an obvious shift a trendless series
lacks."""

import math
import random

from chronoxtract_spark.operators.anomaly import pettitt


def _ref(values):
    n = len(values)
    if n < 2:
        return None
    sign = lambda d: (d > 0) - (d < 0)
    # the classic left-minus-right orientation: positive U_t means the
    # left segment tends higher
    us = []
    for t in range(n - 1):
        u = 0
        for i in range(t + 1):
            for jj in range(t + 1, n):
                u += sign(values[i] - values[jj])
        us.append(u)
    k = max(abs(u) for u in us)
    t_best = min(t for t, u in enumerate(us) if abs(u) == k)
    u_best = us[t_best]
    p = min(1.0, 2.0 * math.exp(-6.0 * k * k / (n**3 + n**2)))
    return {
        "n": n,
        "split_idx": t_best + 1,
        "u_at_k": u_best,
        "k_stat": k,
        "p_value": p,
        "significant": p < 0.05,
    }


def _run(spark, series):
    rows = [
        (k, i, float(v))
        for k, vals in series.items()
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    got = pettitt(
        df, keys="k", order_col="i", value_col="v", round_digits=None
    ).collect()
    return {r.k: r.asDict() for r in got}


def test_crafted_and_randomized(spark):
    rng = random.Random(1979)
    series = {
        # clean downward level shift after index 11: maximal |U|,
        # p ~ 2exp(-6*144^2/(24^3+24^2)) << 0.05
        "shift": [10.0] * 12 + [1.0] * 12,
        "const": [5.0] * 24,  # K = 0, p = 1 (capped), insignificant
        "single": [3.0],  # n < 2 -> dropped
    }
    for i in range(8):
        series[f"r{i}"] = [
            float(rng.randrange(0, 9)) for _ in range(rng.randrange(2, 30))
        ]
    got = _run(spark, series)
    assert "single" not in got
    for k, vals in series.items():
        want = _ref(vals)
        if want is None:
            continue
        g = got[k]
        for col, wv in want.items():
            if col == "p_value":
                # JVM Math.exp vs CPython math.exp may differ by 1 ulp
                assert math.isclose(g[col], wv, rel_tol=1e-14), (k, g[col], wv)
            elif col == "significant":
                # derive from the engine's own p to dodge the ulp edge
                assert g[col] == (g["p_value"] < 0.05), (k, g[col])
            else:
                assert g[col] == wv, (k, col, g[col], wv)

    sh = got["shift"]
    assert sh["split_idx"] == 12 and sh["k_stat"] == 144
    assert sh["u_at_k"] == 144  # left segment higher -> positive
    # p = 2 exp(-6*144^2 / (24^3 + 24^2)) = 2 exp(-8.64) ~ 3.5e-4
    assert sh["significant"] and sh["p_value"] < 1e-3
    c = got["const"]
    assert c["k_stat"] == 0 and c["p_value"] == 1.0 and not c["significant"]
    assert c["split_idx"] == 1  # earliest-boundary tie pin


def test_trend_vs_shift_contrast(spark):
    # Pettitt fires on a level SHIFT; a pure linear trend also moves it
    # (known behavior), but white noise must stay insignificant
    # seeds picked for clearly-interior p (replay p = 0.34 / 0.52 /
    # 0.45 — seed 3 is excluded: its draw drifts and tests at 0.008,
    # the honest 5%-false-positive face of the test)
    series = {}
    for seed in (1, 2, 5):
        rng = random.Random(seed)
        series[f"noise{seed}"] = [rng.gauss(0.0, 1.0) for _ in range(24)]
    got = _run(spark, series)
    for k in series:
        assert not got[k]["significant"], k
