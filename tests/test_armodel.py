"""yule_walker must equal a plain-Python left-fold replay of the
closed-form Yule-Walker estimator exactly, recover known AR(2)
coefficients from simulated chains, and guard degenerate keys by
predicates (drop n < 3, null out c0 = 0 and |r1| = 1) rather than
emitting NaN."""

import math
import random

from chronoxtract_spark.operators.armodel import yule_walker


def _ref(values):
    n = len(values)
    if n < 3:
        return None
    mu = sum(values) / float(n)  # left fold, start 0 — matches F.aggregate
    c = []
    for k in range(3):
        acc = 0.0
        for t in range(n):
            term = (
                (values[t] - mu) * (values[t + k] - mu) if t + k < n else 0.0
            )
            acc += term
        c.append(acc / n)
    c0, c1, c2 = c
    out = {"n": n, "mean": mu, "var0": c0}
    if c0 == 0.0:
        out.update(
            dict.fromkeys(
                [
                    "acf1",
                    "acf2",
                    "ar1_phi",
                    "ar1_sigma2",
                    "ar2_phi1",
                    "ar2_phi2",
                    "ar2_sigma2",
                ]
            )
        )
        return out
    r1, r2 = c1 / c0, c2 / c0
    out["acf1"] = out["ar1_phi"] = r1
    out["acf2"] = r2
    out["ar1_sigma2"] = c0 * (1.0 - r1 * r1)
    den = 1.0 - r1 * r1
    if den == 0.0:
        out["ar2_phi1"] = out["ar2_phi2"] = out["ar2_sigma2"] = None
    else:
        phi1 = r1 * (1.0 - r2) / den
        phi2 = (r2 - r1 * r1) / den
        out["ar2_phi1"] = phi1
        out["ar2_phi2"] = phi2
        out["ar2_sigma2"] = c0 * (1.0 - phi1 * r1 - phi2 * r2)
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
        for r in yule_walker(df, round_digits=None).collect()
    }


def test_replay_and_guards(spark):
    rng = random.Random(272)
    series = {
        f"g{i}": [rng.gauss(0.0, 1.0) for _ in range(rng.randrange(3, 120))]
        for i in range(8)
    }
    series["const"] = [2.0] * 50  # mean exactly representable -> c0 == 0
    series["short"] = [1.0, 2.0]  # n < 3 -> dropped
    got = _run(spark, series)
    assert "short" not in got
    for k, vals in series.items():
        want = _ref(vals)
        if want is None:
            continue
        g = got[k]
        for col, wv in want.items():
            assert (g[col] is None) == (wv is None), (k, col, g[col], wv)
            if wv is not None:
                assert g[col] == wv, (k, col, g[col], wv)
    # the constant key exercises the c0 == 0 predicate path
    assert got["const"]["var0"] == 0.0 and got["const"]["acf1"] is None


def test_ar2_parameter_recovery(spark):
    rng = random.Random(99)
    phi1_true, phi2_true = 0.5, -0.3
    x = [rng.gauss(0.0, 1.0), rng.gauss(0.0, 1.0)]
    for _ in range(4000):
        x.append(
            phi1_true * x[-1] + phi2_true * x[-2] + rng.gauss(0.0, 1.0)
        )
    got = _run(spark, {"sim": x[500:]})["sim"]
    assert abs(got["ar2_phi1"] - phi1_true) < 0.08
    assert abs(got["ar2_phi2"] - phi2_true) < 0.08
    # innovation variance should recover ~1 and be below the raw c0
    assert abs(got["ar2_sigma2"] - 1.0) < 0.15
    assert got["ar2_sigma2"] < got["var0"]
    # for an AR(1)-misfit of an AR(2) truth the lag-2 pacf is far from 0
    assert abs(got["ar2_phi2"]) > 0.2


def test_ar1_matches_ou_discretization(spark):
    # AR(1) simulated chain: fitted phi ~ exp(-dt/tau) under the OU
    # correspondence the docstring claims (dt=1, tau = -1/ln(phi))
    rng = random.Random(7)
    phi_true = math.exp(-1.0 / 3.0)  # tau = 3 samples
    x = [0.0]
    for _ in range(6000):
        x.append(phi_true * x[-1] + rng.gauss(0.0, 1.0))
    got = _run(spark, {"ou": x[500:]})["ou"]
    assert abs(got["ar1_phi"] - phi_true) < 0.05
    tau_hat = -1.0 / math.log(got["ar1_phi"])
    assert abs(tau_hat - 3.0) < 0.6
