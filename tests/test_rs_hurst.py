"""rs_ladder / hurst_rs must equal a plain-numpy replay of the
windowed rescaled-range recurrence (exact integer cents: walk range
and variance moment in int64, one float division per window), drop
rungs the series can't fill, count degenerate windows, and land the
textbook Hurst readings on ramp / iid / alternating series."""

import math
import random
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

from chronoxtract_spark.operators.structure import RS_LADDER, hurst_rs, rs_ladder

WINDOWS = RS_LADDER  # (8, 16, 32, 64)


def _r6(x):
    """Spark's round(col, 6): HALF_UP on the double's shortest repr."""
    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _ref_ladder(cents, windows=WINDOWS):
    """Exact replay: per window u-walk Z_j = ws*cumsum - (j+1)*S in
    int64, R_u = max Z - min Z, D = ws*SS - S^2; rs = R_u/sqrt(D);
    per-rung mean is the wi-ordered left float fold over valid rs."""
    v = np.asarray(cents, dtype=np.int64)
    out = {}
    for ws in windows:
        m = len(v) // ws
        if m == 0:
            continue
        rs_vals, degen = [], 0
        for wi in range(m):
            w = v[wi * ws : (wi + 1) * ws]
            s, ss = int(w.sum()), int((w * w).sum())
            z = ws * np.cumsum(w) - (np.arange(1, ws + 1, dtype=np.int64)) * s
            r_u = int(z.max() - z.min())
            d = ws * ss - s * s
            if d > 0:
                rs_vals.append(r_u / math.sqrt(float(d)))
            else:
                degen += 1
        acc = 0.0
        for r in rs_vals:  # wi order, left-associated like F.aggregate
            acc += r
        out[ws] = {
            "n_windows": m,
            "n_degenerate": degen,
            "rs_mean": _r6(acc / len(rs_vals)) if rs_vals else None,
            "_raw_mean": (acc / len(rs_vals)) if rs_vals else None,
        }
    return out


def _ref_hurst(cents, windows=WINDOWS):
    lad = _ref_ladder(cents, windows)
    pts = [
        (math.log(float(ws)), math.log(lad[ws]["_raw_mean"]))
        for ws in windows
        if ws in lad and lad[ws]["_raw_mean"] is not None and lad[ws]["_raw_mean"] > 0
    ]
    n = float(len(pts))
    if n < 2:
        return len(pts), None
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    den = n * sxx - sx * sx
    if den <= 0:
        return len(pts), None
    return len(pts), _r6((n * sxy - sx * sy) / den)


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
    df = _df(spark, series, repartition)
    got = {}
    for r in rs_ladder(df).collect():
        got.setdefault(r.conv_id, {})[r.ws] = r.asDict()
    goth = {r.conv_id: r.asDict() for r in hurst_rs(df).collect()}
    for k, pts in series.items():
        cents = [c for _, c in sorted(pts)]
        want = _ref_ladder(cents)
        assert set(got.get(k, {})) == set(want), (k, sorted(got.get(k, {})), sorted(want))
        for ws, cols in want.items():
            for col in ("n_windows", "n_degenerate", "rs_mean"):
                assert got[k][ws][col] == cols[col], (k, ws, col, got[k][ws][col], cols[col])
        n_r, h = _ref_hurst(cents)
        if want:  # key produced at least one rung -> a hurst row exists
            assert goth[k]["n_rungs"] == n_r, (k, goth[k], n_r)
            assert goth[k]["hurst"] == h, (k, goth[k]["hurst"], h)
        else:
            assert k not in goth, (k, goth.get(k))


def test_crafted(spark):
    _check(spark, {
        # constant: every window degenerate, rs_mean null on all rungs
        "const": [(i, 300) for i in range(70)],
        # one window per top rung, partial tails dropped
        "n20": [(i, (i * 37) % 211 - 100) for i in range(20)],
        # shorter than the shallowest rung: NO rows at all
        "short": [(i, i * i) for i in range(7)],
        "single": [(0, 42)],
        # alternation: bounded walk, identical windows per rung
        "alt": [(i, 150 if i % 2 else -150) for i in range(64)],
        # constant-then-step inside each 8-window: mixed degenerate
        "mix": [(i, 100 if (i // 8) % 2 else (200 if i % 8 == 7 else 100))
                for i in range(48)],
    })


def test_ladder_rung_presence(spark):
    """n=20 fills ws=8 (2 windows) and ws=16 (1) only; n=7 fills none."""
    df = _df(spark, {"n20": [(i, i) for i in range(20)],
                     "n7": [(i, i) for i in range(7)]})
    got = {(r.conv_id, r.ws): r for r in rs_ladder(df).collect()}
    assert {k for k in got} == {("n20", 8), ("n20", 16)}
    assert got[("n20", 8)].n_windows == 2
    assert got[("n20", 16)].n_windows == 1
    # single populated positive rung still yields a hurst row (null H)
    h = {r.conv_id: r for r in hurst_rs(df).collect()}
    assert set(h) == {"n20"}
    assert h["n20"].n_rungs == 2 and h["n20"].hurst is not None


def test_constant_all_degenerate(spark):
    df = _df(spark, {"c": [(i, 777) for i in range(128)]})
    for r in rs_ladder(df).collect():
        assert r.n_degenerate == r.n_windows and r.rs_mean is None
    h = hurst_rs(df).collect()
    assert len(h) == 1 and h[0].n_rungs == 0 and h[0].hurst is None


def test_theory_bands(spark):
    """Ramp -> persistent walk, H near 1; iid noise -> H near 0.5;
    alternation -> strongly anti-persistent, H well below 0.5."""
    rng = np.random.default_rng(41)
    series = {
        "ramp": [(i, 5 * i) for i in range(512)],
        "iid": [(i, int(c)) for i, c in enumerate(rng.integers(-900, 900, 4096))],
        "alt": [(i, 200 if i % 2 else -200) for i in range(512)],
    }
    got = {r.conv_id: r.hurst for r in hurst_rs(_df(spark, series)).collect()}
    assert got["ramp"] > 0.9, got["ramp"]
    assert 0.35 < got["iid"] < 0.65, got["iid"]
    assert got["alt"] < 0.25, got["alt"]


def test_randomized_matches_replay(spark):
    rng = random.Random(20260818)
    series = {}
    for ki in range(24):
        n = rng.randrange(1, 220)
        pts, t = [], 0
        for _ in range(n):
            t += rng.randrange(1, 30)
            pts.append((t, rng.randrange(-800, 900)))
        rng.shuffle(pts)
        series[f"u{ki}"] = pts
    _check(spark, series)


def test_partitioning_invariance(spark):
    rng = random.Random(7)
    series = {"k": [(t, rng.randrange(-300, 300)) for t in range(300)]}
    _check(spark, series, repartition=7)
