"""interarrival_stats must equal a plain-numpy replay of the
Goh-Barabási battery (CV, burstiness, lag-1 memory, hourly Fano with
empty bins included) on crafted and randomized irregular series."""

import math
import random

import numpy as np
import pytest

from chronoxtract_spark.operators.cadence import interarrival_stats


def _ref(ts, bin_s=3600):
    """Reference: direct numpy on the sorted integer-second series."""
    s = np.array(sorted(ts), dtype=np.int64)
    out = {"n_events": len(s)}
    gaps = np.diff(s).astype(np.float64)
    out["n_gaps"] = len(gaps)
    if len(gaps):
        mu = gaps.mean()
        sig = gaps.std()  # population
        out["mean_gap_s"] = mu
        out["sigma_gap_s"] = sig
        out["cv"] = sig / mu if mu != 0 else None
        out["burstiness"] = (sig - mu) / (sig + mu) if sig + mu != 0 else None
    else:
        out["mean_gap_s"] = out["sigma_gap_s"] = None
        out["cv"] = out["burstiness"] = None
    if len(gaps) >= 2:
        a, b = gaps[:-1], gaps[1:]
        den = a.std() * b.std()
        out["memory_coef"] = (
            ((a * b).mean() - a.mean() * b.mean()) / den if den != 0 else None
        )
    else:
        out["memory_coef"] = None
    hrs = s // bin_s
    span = int(hrs.max() - hrs.min() + 1)
    counts = np.zeros(span, dtype=np.int64)
    for h in hrs:
        counts[int(h - hrs.min())] += 1
    mc = counts.mean()
    out["fano_hourly"] = counts.var() / mc  # var is population; mc >= 1/span > 0
    return out


def _run(spark, series, bin_s=3600):
    rows = [
        (k, i, int(t))
        for k, pts in series.items()
        for i, t in enumerate(pts)
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx long, ts long")
    got = interarrival_stats(df, bin_s=bin_s, round_digits=None).collect()
    return {r.conv_id: r.asDict() for r in got}


def _check(got, want):
    for k, w in want.items():
        g = got[k]
        assert set(g) == {
            "conv_id", "n_events", "n_gaps", "mean_gap_s", "sigma_gap_s",
            "cv", "burstiness", "memory_coef", "fano_hourly",
        }
        for col, exp in w.items():
            val = g[col]
            if exp is None:
                assert val is None, (k, col, val)
            else:
                assert val is not None and math.isclose(
                    val, exp, rel_tol=1e-12, abs_tol=1e-12
                ), (k, col, val, exp)


def test_edges(spark):
    series = {
        "single": [7200],
        "pair": [0, 100],
        # perfectly periodic: sigma=0 -> cv 0, B=-1, memory null
        "periodic": [i * 600 for i in range(12)],
        # same-second tie broken by turn_idx -> one zero gap
        "tied": [0, 50, 50, 200],
    }
    got = _run(spark, series)
    _check(got, {k: _ref(v) for k, v in series.items()})
    p = got["periodic"]
    assert p["cv"] == 0.0 and p["burstiness"] == -1.0
    assert p["memory_coef"] is None
    s = got["single"]
    assert s["n_gaps"] == 0 and s["mean_gap_s"] is None
    assert s["fano_hourly"] == 0.0  # one hour, one event: var 0
    assert got["pair"]["burstiness"] == -1.0  # single gap: sigma 0


def test_fano_counts_empty_hours(spark):
    # 3 events in hour 0, 1 in hour 4; hours 1-3 are empty but spanned.
    ts = [10, 20, 30, 4 * 3600 + 5]
    got = _run(spark, {"k": ts})
    counts = np.array([3, 0, 0, 0, 1], dtype=np.float64)
    want = counts.var() / counts.mean()
    assert math.isclose(got["k"]["fano_hourly"], want, rel_tol=1e-12)
    _check(got, {"k": _ref(ts)})


def test_randomized_matches_numpy(spark):
    rng = random.Random(20260818)
    series = {}
    for ki in range(25):
        n = rng.randrange(2, 60)
        t = 0
        pts = []
        for _ in range(n):
            t += rng.randrange(0, 5000)
            pts.append(t)
        rng.shuffle(pts)  # input order must not matter
        series[f"u{ki}"] = pts
    got = _run(spark, series)
    _check(got, {k: _ref(v) for k, v in series.items()})


def test_bursty_vs_regular_signs(spark):
    rng = random.Random(7)
    # heavy-tailed gaps -> B > 0; jittered-periodic -> B < 0
    bursty, t = [], 0
    for _ in range(200):
        t += int(math.exp(rng.uniform(0, 9))) + 1
        bursty.append(t)
    regular, t = [], 0
    for _ in range(200):
        t += 600 + rng.randrange(-30, 31)
        regular.append(t)
    got = _run(spark, {"b": bursty, "r": regular})
    assert got["b"]["burstiness"] > 0.3
    assert -1.0 <= got["r"]["burstiness"] < -0.7
    assert got["b"]["cv"] > 1.0 > got["r"]["cv"]


# ---------------- allan_variance ----------------

from chronoxtract_spark.operators.cadence import allan_variance  # noqa: E402


def _ref_avar(ts, m, tau0=60):
    s = np.array(sorted(ts), dtype=np.int64)
    b = s // (m * tau0)
    lo, hi = int(b.min()), int(b.max())
    x = np.zeros(hi - lo + 1, dtype=np.int64)
    for v in b:
        x[int(v - lo)] += 1
    out = {"n_bins": len(x), "n_events": len(s),
           "mean_per_bin": len(s) / len(x)}
    if len(x) >= 2:
        d = np.diff(x).astype(np.float64)
        out["avar"] = float((d * d).sum()) / (2.0 * (len(x) - 1))
    else:
        out["avar"] = None
    return out


def _run_avar(spark, series, ladder=(1, 4, 16)):
    rows = [(k, int(t)) for k, pts in series.items() for t in pts]
    df = spark.createDataFrame(rows, "event_type string, ts long")
    got = allan_variance(
        df, key_col="event_type", ladder=ladder, round_digits=None
    ).collect()
    return {(r.event_type, r.m): r.asDict() for r in got}


def test_allan_crafted(spark):
    # exactly one event per minute: x_k == 1 at m=1 -> AVAR 0; at m=4
    # every bin holds 4 -> AVAR 0 again (perfectly stable rate)
    periodic = [i * 60 + 30 for i in range(64)]
    # single burst: everything lands in one m=16 bin -> n_bins 1, null
    burst = [i for i in range(50)]
    got = _run_avar(spark, {"p": periodic, "b": burst})
    assert got[("p", 1)]["avar"] == 0.0 and got[("p", 4)]["avar"] == 0.0
    assert got[("b", 16)]["n_bins"] == 1 and got[("b", 16)]["avar"] is None
    assert got[("b", 1)]["n_bins"] == 1  # 50 s < one minute
    for (k, m), g in got.items():
        want = _ref_avar({"p": periodic, "b": burst}[k], m)
        for col, exp in want.items():
            if exp is None:
                assert g[col] is None, (k, m, col)
            else:
                assert math.isclose(g[col], exp, rel_tol=1e-12), (
                    k, m, col, g[col], exp)


def test_allan_empty_bins_counted(spark):
    # events in minutes 0 and 10 only: m=1 grid spans 11 bins with 9
    # zeros; diffs are [-3, 0x8, 5]
    ts = [1, 2, 3, 600, 601, 602, 603, 604]
    got = _run_avar(spark, {"k": ts}, ladder=(1,))
    g = got[("k", 1)]
    assert g["n_bins"] == 11
    want = (3 * 3 + 5 * 5) / (2.0 * 10)
    assert math.isclose(g["avar"], want, rel_tol=1e-12)


def test_allan_randomized(spark):
    rng = random.Random(99)
    series = {}
    for ki in range(8):
        n = rng.randrange(5, 300)
        t = rng.randrange(0, 1000)
        pts = []
        for _ in range(n):
            t += rng.randrange(1, 900)
            pts.append(t)
        series[f"g{ki}"] = pts
    got = _run_avar(spark, series)
    for (k, m), g in got.items():
        want = _ref_avar(series[k], m)
        for col, exp in want.items():
            if exp is None:
                assert g[col] is None, (k, m, col)
            else:
                assert math.isclose(g[col], exp, rel_tol=1e-12), (
                    k, m, col, g[col], exp)
        assert g["tau_s"] == m * 60


# ---------------- phase_fold_search ----------------

from chronoxtract_spark.operators.cadence import phase_fold_search  # noqa: E402


def _ref_fold(ts, p, nbins=16):
    s = np.array(sorted(ts), dtype=np.int64)
    b = ((s % p) * nbins) // p
    c = np.bincount(b, minlength=nbins)
    n = len(s)
    chi2 = nbins * float((c.astype(np.int64) ** 2).sum()) / n - n
    peak = int(np.argmax(c))  # argmax returns first (smallest bin) on ties
    return {
        "n": n, "chi2": chi2, "chi2_red": chi2 / (nbins - 1),
        "peak_bin": peak, "peak_count": int(c[peak]),
    }


def _run_fold(spark, series, periods):
    rows = [(k, int(t)) for k, pts in series.items() for t in pts]
    df = spark.createDataFrame(rows, "event_type string, ts long")
    got = phase_fold_search(
        df, periods_s=periods, round_digits=None
    ).collect()
    return {(r.event_type, r.period_s): r.asDict() for r in got}


def test_fold_detects_periodicity(spark):
    # strictly periodic at 3600s: at trial 3600 everything lands in one
    # bin -> chi2 = N(B-1); at an INCOMMENSURATE trial (5413 shares no
    # factor with 3600) the phases walk the whole circle and the
    # profile flattens. (A commensurate trial like 5400 = 1.5x3600
    # would still concentrate phases onto 3 values — folding detects
    # every rational harmonic, which is the physics, not a bug.)
    periodic = [k * 3600 + 100 for k in range(96)]
    got = _run_fold(spark, {"p": periodic}, periods=(3600, 5413))
    g = got[("p", 3600)]
    assert g["chi2"] == 96.0 * 15
    assert g["peak_count"] == 96
    flat = got[("p", 5413)]
    assert flat["chi2"] < g["chi2"] / 4


def test_fold_matches_numpy(spark):
    rng = random.Random(20260818)
    series = {}
    for ki in range(6):
        t = rng.randrange(0, 100000)
        pts = []
        for _ in range(rng.randrange(3, 400)):
            t += rng.randrange(1, 7000)
            pts.append(t)
        series[f"g{ki}"] = pts
    periods = (3600, 21600, 86400)
    got = _run_fold(spark, series, periods)
    for (k, p), g in got.items():
        want = _ref_fold(series[k], p)
        for col, exp in want.items():
            if isinstance(exp, float):
                assert math.isclose(g[col], exp, rel_tol=1e-12), (k, p, col)
            else:
                assert g[col] == exp, (k, p, col, g[col], exp)
