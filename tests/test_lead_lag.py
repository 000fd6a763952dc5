"""lead_lag must find an exact r = 1.0 at the true shift for a
time-shifted copy of a series (and the mirrored negative lag for the
reversed pair), keep self-pairs' lag-0 r at exactly 1, null out
constant series by predicate, and equal a plain-Python replay of the
five-integer-sum Pearson formula on randomized grids."""

import math
import random

from chronoxtract_spark.operators.paired import lead_lag


def _mk_events(series, bin_s=60):
    """series: key -> {hour_index: count}; one row per count unit."""
    rows = []
    for k, hist in series.items():
        for h, c in hist.items():
            for j in range(c):
                rows.append((k, h * bin_s + j % bin_s))
    return rows


def _replay(series, pair, lag, h0, h1):
    a, b = pair
    ax = [series[a].get(h, 0) for h in range(h0, h1 + 1)]
    bx = [series[b].get(h, 0) for h in range(h0, h1 + 1)]
    xs, ys = [], []
    for i, h in enumerate(range(h0, h1 + 1)):
        t = h + lag
        if h0 <= t <= h1:
            xs.append(ax[i])
            ys.append(bx[t - h0])
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    num = n * sxy - sx * sy
    den = math.sqrt(
        (float(n) * sxx - float(sx) * sx) * (float(n) * syy - float(sy) * sy)
    )
    return (n, num / den if den != 0.0 else None)


def _run(spark, series, max_lag=3):
    df = spark.createDataFrame(
        _mk_events(series), "event_type string, ts long"
    )
    got = lead_lag(
        df, bin_s=60, max_lag=max_lag, round_digits=None
    ).collect()
    return {(r.key_a, r.key_b, r.lag): r.asDict() for r in got}


def test_shifted_copy_and_self(spark):
    rng = random.Random(21)
    pat = {h: rng.randrange(1, 9) for h in range(10)}
    series = {
        "a": pat,
        "b": {h + 2: c for h, c in pat.items()},  # a shifted +2 bins
        "flat": {h: 4 for h in range(12)},  # constant once zero-filled? no:
        # flat has count 4 on 0..11 == whole span -> truly constant
    }
    got = _run(spark, series)
    ab = [v for (ka, kb, _), v in got.items() if ka == "a" and kb == "b"]
    best_ab = [v for v in ab if v["is_best"]][0]
    assert best_ab["lag"] == 2 and best_ab["r"] == 1.0
    ba_best = [
        v
        for (ka, kb, _), v in got.items()
        if ka == "b" and kb == "a" and v["is_best"]
    ][0]
    assert ba_best["lag"] == -2 and ba_best["r"] == 1.0
    # self-pair: lag 0 is exact 1 and wins
    aa0 = got[("a", "a", 0)]
    assert aa0["r"] == 1.0 and aa0["is_best"]
    # constant series: every r involving flat is null, is_best still
    # lands deterministically on one row per pair (the lag -3 pin)
    flat_rows = [v for (ka, _, _), v in got.items() if ka == "flat"]
    assert all(v["r"] is None for v in flat_rows)
    for kb in series:
        pins = [
            v
            for (ka, kb2, _), v in got.items()
            if ka == "flat" and kb2 == kb and v["is_best"]
        ]
        assert len(pins) == 1 and pins[0]["lag"] == -3


def test_randomized_replay(spark):
    rng = random.Random(77)
    series = {
        k: {h: rng.randrange(0, 7) for h in range(rng.randrange(6, 15))}
        for k in ("x", "y", "z")
    }
    all_h = [h for hist in series.values() for h in hist]
    h0, h1 = min(all_h), max(all_h)
    got = _run(spark, series, max_lag=2)
    assert len(got) == 9 * 5  # 3^2 pairs x 5 lags
    for (ka, kb, lag), v in got.items():
        n, r = _replay(series, (ka, kb), lag, h0, h1)
        assert v["n_overlap"] == n, (ka, kb, lag)
        if r is None:
            assert v["r"] is None, (ka, kb, lag)
        else:
            assert v["r"] == r, (ka, kb, lag, v["r"], r)
