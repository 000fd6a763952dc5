"""forecast_eval must equal a plain-Python replay of the four
baseline backtests exactly on integer-valued series (where every sum
is an exact integer-valued double), and the closed-form faces must
hold: snaive scores MAE 0 on a pure seasonal series, naive scores 0
on a constant, drift is exact on a pure linear ramp, and MASE is 1 by
definition for the naive row."""

import random

from chronoxtract_spark.operators.holt import forecast_eval


def _ref(values, m=24):
    n = len(values)
    y = [float(v) for v in values]
    methods = {}
    for name in ("naive", "snaive", "drift", "mean"):
        errs = []
        for t in range(n):
            if name == "naive" and t >= 1:
                f = y[t - 1]
            elif name == "snaive" and t >= m:
                f = y[t - m]
            elif name == "drift" and t >= 2:
                f = y[t - 1] + (y[t - 1] - y[0]) / (float(t) - 1.0)
            elif name == "mean" and t >= 1:
                f = sum(y[:t]) / float(t)
            else:
                continue
            errs.append((t, y[t] - f))
        if not errs:
            continue
        ne = len(errs)
        sa = 0.0
        ss = 0.0
        for _, e in errs:  # origin order == sorted order
            sa += abs(e)
            ss += e * e
        methods[name] = {
            "n_evals": ne,
            "mae": sa / ne,
            "rmse": (ss / ne) ** 0.5,
        }
    nmae = methods["naive"]["mae"]
    for name in methods:
        methods[name]["mase"] = (
            methods[name]["mae"] / nmae if nmae != 0.0 else None
        )
    return methods


def _run(spark, series, m=24):
    rows = [
        (k, i, float(v))
        for k, vals in series.items()
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    got = forecast_eval(
        df, key_col="k", order_col="i", value_col="v",
        period=m, round_digits=None,
    ).collect()
    out = {}
    for r in got:
        out.setdefault(r.k, {})[r.method] = r.asDict()
    return out


def test_closed_forms_and_replay(spark):
    rng = random.Random(1982)  # Hyndman's MASE era... M-competition
    pat = [(5 * j) % 7 for j in range(24)]
    series = {
        "seasonal": pat * 4,  # snaive is perfect, naive is not
        "const": [3] * 60,  # every method perfect, MASE null (0/0)
        "ramp": list(range(60)),  # drift is perfect from t=2
    }
    for i in range(6):
        series[f"r{i}"] = [
            rng.randrange(0, 50) for _ in range(rng.randrange(30, 120))
        ]
    got = _run(spark, series)
    for k, vals in series.items():
        want = _ref(vals)
        assert set(got[k]) == set(want), k
        for meth, w in want.items():
            g = got[k][meth]
            for col, wv in w.items():
                if wv is None:
                    assert g[col] is None, (k, meth, col)
                else:
                    assert g[col] == wv, (k, meth, col, g[col], wv)

    assert got["seasonal"]["snaive"]["mae"] == 0.0
    assert got["seasonal"]["snaive"]["mase"] == 0.0
    assert got["seasonal"]["naive"]["mase"] == 1.0
    assert got["seasonal"]["naive"]["mae"] > 0.0
    assert got["const"]["naive"]["mae"] == 0.0
    assert got["const"]["naive"]["mase"] is None  # 0/0 guarded to null
    assert got["ramp"]["drift"]["mae"] == 0.0
    assert got["ramp"]["naive"]["mae"] == 1.0  # every step is +1
    # per-method origin sets differ by design
    assert got["ramp"]["naive"]["n_evals"] == 59
    assert got["ramp"]["snaive"]["n_evals"] == 36
    assert got["ramp"]["drift"]["n_evals"] == 58
