"""mann_kendall must equal an integer-arithmetic replay of Kendall's
tie-corrected test (S, Var(S), continuity-corrected z, tau-b, 5%
verdict) on crafted monotone/tied/constant series and randomized
streams — exact for the integers, bit-exact for the derived floats."""

import math
import random

from chronoxtract_spark.operators.robust import mann_kendall


def _ref(values):
    n = len(values)
    s = 0
    for i in range(n):
        for jj in range(i + 1, n):
            if values[jj] > values[i]:
                s += 1
            elif values[jj] < values[i]:
                s -= 1
    groups = {}
    for v in values:
        groups[v] = groups.get(v, 0) + 1
    tvar = sum(t * (t - 1) * (2 * t + 5) for t in groups.values())
    tx2 = sum(t * (t - 1) for t in groups.values())
    varnum = n * (n - 1) * (2 * n + 5) - tvar
    d2 = n * (n - 1)
    var_s = varnum / 18.0
    if s > 0:
        z = (float(s) - 1.0) / math.sqrt(varnum / 18.0)
    elif s < 0:
        z = (float(s) + 1.0) / math.sqrt(varnum / 18.0)
    else:
        z = 0.0
    den = math.sqrt(((d2 - tx2) / 2.0) * (d2 / 2.0))
    tau_b = float(s) / den if den != 0.0 else None
    trend = (
        "increasing" if z > 1.959964
        else "decreasing" if z < -1.959964
        else "none"
    )
    return {
        "n": n,
        "n_pairs": n * (n - 1) // 2,
        "s_stat": s,
        "var_s": var_s,
        "tau_b": tau_b,
        "z": z,
        "trend": trend,
    }


def _run(spark, series):
    rows = [
        (k, i, float(v))
        for k, vals in series.items()
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    got = mann_kendall(
        df, keys="k", order_col="i", value_col="v", round_digits=None
    ).collect()
    return {r.k: r.asDict() for r in got}


def test_crafted_and_randomized(spark):
    rng = random.Random(1896)  # Mann-Kendall's S goes back to Kendall 1938
    series = {
        "inc": list(range(24)),  # S = D = 276, strongly increasing
        "dec": list(range(24, 0, -1)),
        "const": [7.0] * 24,  # all tied: S=0, Var=0, z=0, tau null
        "steps": [0, 0, 1, 1, 1, 2, 2, 3] * 3,  # heavy ties, mixed order
    }
    for i in range(8):
        series[f"r{i}"] = [
            float(rng.randrange(0, 6)) for _ in range(rng.randrange(2, 40))
        ]
    got = _run(spark, series)
    for k, vals in series.items():
        want = _ref(vals)
        g = got[k]
        for col, wv in want.items():
            if wv is None:
                assert g[col] is None, (k, col)
            else:
                assert g[col] == wv, (k, col, g[col], wv)

    assert got["inc"]["s_stat"] == 276 and got["inc"]["trend"] == "increasing"
    assert got["dec"]["trend"] == "decreasing"
    c = got["const"]
    assert (
        c["s_stat"] == 0
        and c["var_s"] == 0.0
        and c["z"] == 0.0
        and c["tau_b"] is None
        and c["trend"] == "none"
    )
    # tie-corrected variance is strictly below the untied formula
    n = 24
    assert got["steps"]["var_s"] < n * (n - 1) * (2 * n + 5) / 18.0


def test_matches_theil_sen_direction(spark):
    # on a noisy-but-trending series the two robust-trend operators
    # must agree in sign: positive Theil-Sen slope <-> S > 0
    from chronoxtract_spark.operators.robust import theil_sen

    rng = random.Random(5)
    vals = [0.3 * i + rng.gauss(0.0, 1.0) for i in range(24)]
    rows = [("k", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    mk = mann_kendall(df, keys="k", order_col="i", value_col="v").collect()[0]
    ts = theil_sen(df, keys="k", order_col="i", value_col="v").collect()[0]
    assert mk.s_stat > 0 and ts.slope > 0
    assert mk.trend == "increasing"
