"""randomness_tests must equal a plain-Python replay of the three
whiteness tests (median-excluded runs, difference-sign,
turning-point) exactly — sqrt is correctly-rounded IEEE so even the z
scores compare bit-for-bit — and the crafted failure patterns must
diagnose structure: oscillation fails runs+turning but passes
difference-sign, a ramp fails all three, noise passes."""

import math
import random

from chronoxtract_spark.operators.randomness import randomness_tests

CRIT = 1.959964


def _ref(values):
    n = len(values)
    if n < 3:
        return None
    sv = sorted(values)
    lo, hi = (n + 1) // 2, (n + 2) // 2
    med = sv[lo - 1] if lo == hi else (sv[lo - 1] + sv[hi - 1]) / 2.0
    out = {"n": n, "median": med}
    signs = [v > med for v in values if v != med]
    n1 = sum(1 for s in signs if s)
    n2 = len(signs) - n1
    runs = 0
    prev = None
    for s in signs:
        if prev is None or s != prev:
            runs += 1
        prev = s
    out.update({"n_above": n1, "n_below": n2, "runs": runs})
    m = n1 + n2
    if m == 0:
        out["runs_z"] = None
        out["runs_pass"] = None
    else:
        mu = 2.0 * n1 * n2 / m + 1.0
        var = (
            2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
            / (m * m * (m - 1.0))
        )
        if var <= 0.0:
            out["runs_z"] = None
            out["runs_pass"] = None
        else:
            z = (runs - mu) / math.sqrt(var)
            out["runs_z"] = z
            out["runs_pass"] = abs(z) <= CRIT
    dp = sum(1 for i in range(n - 1) if values[i + 1] > values[i])
    dz = (dp - (n - 1.0) / 2.0) / math.sqrt((n + 1.0) / 12.0)
    tp = sum(
        1
        for i in range(1, n - 1)
        if (values[i] > values[i - 1] and values[i] > values[i + 1])
        or (values[i] < values[i - 1] and values[i] < values[i + 1])
    )
    tz = (tp - 2.0 * (n - 2.0) / 3.0) / math.sqrt((16.0 * n - 29.0) / 90.0)
    out.update(
        {
            "diff_pos": dp,
            "diff_z": dz,
            "turning_points": tp,
            "tp_z": tz,
            "diff_pass": abs(dz) <= CRIT,
            "tp_pass": abs(tz) <= CRIT,
        }
    )
    return out


def _run(spark, series):
    rows = [
        (k, i, 1000 + i, float(v))
        for k, vals in series.items()
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, value double"
    )
    return {
        r.conv_id: r.asDict()
        for r in randomness_tests(df, round_digits=None).collect()
    }


def test_replay_and_diagnosis_patterns(spark):
    rng = random.Random(1940)  # Wald & Wolfowitz
    series = {
        "osc": [1.0 if i % 2 == 0 else 2.0 for i in range(20)],
        "ramp": [float(i) for i in range(20)],
        "const": [4.0] * 20,
        "short": [1.0, 2.0],
    }
    for i in range(8):
        series[f"r{i}"] = [
            rng.gauss(0.0, 1.0) for _ in range(rng.randrange(3, 80))
        ]
    got = _run(spark, series)
    assert "short" not in got
    for k, vals in series.items():
        want = _ref(vals)
        if want is None:
            continue
        g = got[k]
        for col, wv in want.items():
            if wv is None:
                assert g[col] is None, (k, col, g[col])
            else:
                assert g[col] == wv, (k, col, g[col], wv)

    # oscillation: maximal runs + turning points (fails both), but the
    # up/down counts are balanced (difference-sign passes)
    osc = got["osc"]
    assert osc["runs"] == 20 and not osc["runs_pass"]
    assert osc["turning_points"] == 18 and not osc["tp_pass"]
    assert osc["diff_pass"]
    # ramp: 2 runs, zero turns, all-ups — fails all three
    ramp = got["ramp"]
    assert ramp["runs"] == 2 and not ramp["runs_pass"]
    assert ramp["diff_pos"] == 19 and not ramp["diff_pass"]
    assert ramp["turning_points"] == 0 and not ramp["tp_pass"]
    # constant: runs test undefined (every value ties the median),
    # and the documented continuous-law boundary: no strict increases
    c = got["const"]
    assert c["runs_pass"] is None and c["n_above"] == 0
    assert not c["diff_pass"] and not c["tp_pass"]


def test_white_noise_passes(spark):
    # a long pinned gaussian draw should pass all three at 5%
    rng = random.Random(12)
    vals = [rng.gauss(0.0, 1.0) for _ in range(400)]
    want = _ref(vals)
    assert want["runs_pass"] and want["diff_pass"] and want["tp_pass"]
    got = _run(spark, {"w": vals})["w"]
    assert got["runs_pass"] and got["diff_pass"] and got["tp_pass"]
