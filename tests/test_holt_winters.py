"""holt_winters_forecast must equal a plain-Python replay of the
additive ETS(A,A,A) recurrence bit-for-bit, and on exactly-modeled
inputs (pure seasonal pattern, linear trend + seasonal pattern with
dyadic slope) must achieve SSE == 0.0 with the trend recovered
exactly — the closed-form faces of the recurrence."""

import random

import pytest

from chronoxtract_spark.operators.holt import holt_winters_forecast


def _ref(values, a=0.3, b=0.1, g=0.2, m=24, hz=24):
    n = len(values)
    if n < 2 * m:
        return None
    acc1 = 0.0
    for t in range(m):
        acc1 = acc1 + float(values[t])
    acc2 = 0.0
    for t in range(m, 2 * m):
        acc2 = acc2 + float(values[t])
    l0 = acc1 / float(m)
    trd = (acc2 / float(m) - l0) / float(m)
    half = (m - 1) / 2.0
    lev = l0 + trd * half
    s = [float(values[j]) - (l0 + (j - half) * trd) for j in range(m)]
    sse = 0.0
    for t in range(m, n):
        j = t % m
        err = float(values[t]) - (lev + trd + s[j])
        sse = sse + err * err
        nl = a * (float(values[t]) - s[j]) + (1.0 - a) * (lev + trd)
        trd = b * (nl - lev) + (1.0 - b) * trd
        s[j] = g * (float(values[t]) - nl) + (1.0 - g) * s[j]
        lev = nl
    return {
        h: {
            "forecast": lev + h * trd + s[(n + h - 1) % m],
            "level": lev,
            "trend": trd,
            "sse": sse,
        }
        for h in range(1, hz + 1)
    }


def _run(spark, series, **kw):
    rows = [
        (k, i, float(v))
        for k, vals in series.items()
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    got = holt_winters_forecast(
        df, key_col="k", order_col="i", value_col="v",
        alpha=0.3, beta=0.1, gamma=0.2, **kw
    ).collect()
    out = {}
    for r in got:
        out.setdefault(r.key, {})[r.h] = r.asDict()
    return out


def test_exactly_modeled_series(spark):
    pat = [float((7 * j * j + 3) % 11) for j in range(24)]
    series = {
        # pure seasonal: the states are a fixed point of the
        # recurrence up to float cancellation noise (l0 = mean over 24
        # is inexact, so s_j = pat_j - l0 reconstructs pat_j only to
        # ~1 ulp) — SSE stays at squared-ulp scale, trend at exactly 0
        "seasonal": pat * 4,
        # linear trend + seasonal: the detrended init fits this series
        # exactly in real arithmetic — the slope is recovered and
        # every one-step prediction cancels to ulp scale (the naive
        # undetrended init left SSE at ~700 here)
        "trended": [0.5 * t + pat[t % 24] for t in range(96)],
        "short": pat[:30],  # n < 48 -> no rows
    }
    got = _run(spark, series)
    assert "short" not in got
    for k in ("seasonal", "trended"):
        want = _ref(series[k])
        for h, w in want.items():
            gg = got[k][h]
            for col, wv in w.items():
                assert gg[col] == wv, (k, h, col, gg[col], wv)
    sea = got["seasonal"]
    assert sea[1]["sse"] < 1e-24 and sea[1]["trend"] == 0.0
    n = len(series["seasonal"])
    for h in range(1, 25):
        assert abs(sea[h]["forecast"] - pat[(n + h - 1) % 24]) < 1e-10
    tr = got["trended"]
    assert tr[1]["sse"] < 1e-18 and abs(tr[1]["trend"] - 0.5) < 1e-10
    for h in (1, 24):
        want_f = 0.5 * (96 + h - 1) + pat[(96 + h - 1) % 24]
        assert abs(tr[h]["forecast"] - want_f) < 1e-8


def test_randomized_replay_and_validation(spark):
    rng = random.Random(1960)  # Winters 1960
    series = {
        f"r{i}": [
            10.0 + 3.0 * ((t % 24) in (8, 9, 10)) + rng.gauss(0.0, 0.5)
            for t in range(rng.randrange(48, 120))
        ]
        for i in range(5)
    }
    got = _run(spark, series)
    for k, vals in series.items():
        want = _ref(vals)
        for h, w in want.items():
            gg = got[k][h]
            for col, wv in w.items():
                assert gg[col] == wv, (k, h, col, gg[col], wv)

    with pytest.raises(ValueError):
        holt_winters_forecast(
            None, key_col="k", order_col="i", value_col="v",
            alpha=0.0, beta=0.1, gamma=0.2,
        )
