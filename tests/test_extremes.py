"""drawdown_stats must equal a sequential plain-Python replay of the
running-peak battery (exact integer cents) on crafted and randomized
value streams."""

import random

from chronoxtract_spark.operators.extremes import drawdown_stats


def _ref(rows):
    """rows: [(s, cents)] in intended order (pre-sorted by caller)."""
    cum = 0
    runmax = None
    prev_runmax = None
    n_rec = 0
    max_dd = 0
    max_len = cur_len = 0
    peak = None
    for _, v in rows:
        cum += v
        prev_runmax = runmax
        runmax = cum if runmax is None else max(runmax, cum)
        if prev_runmax is None or cum > prev_runmax:
            n_rec += 1
        dd = runmax - cum
        max_dd = max(max_dd, dd)
        if dd > 0:
            cur_len += 1
            max_len = max(max_len, cur_len)
        else:
            cur_len = 0
        peak = runmax
    return {
        "n_obs": len(rows),
        "n_records": n_rec,
        "max_drawdown": max_dd / 100.0,
        "max_drawdown_len": max_len,
        "final_cum": cum / 100.0,
        "peak_cum": peak / 100.0,
    }


def _run(spark, series):
    rows = [
        (k, i, int(s), cents / 100.0)
        for k, pts in series.items()
        for i, (s, cents) in enumerate(pts)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, value double"
    )
    got = drawdown_stats(df).collect()
    return {r.conv_id: r.asDict() for r in got}


def _check(spark, series):
    got = _run(spark, series)
    assert set(got) == set(series)
    for k, pts in series.items():
        want = _ref(sorted(pts))
        g = got[k]
        for col, exp in want.items():
            assert g[col] == exp, (k, col, g[col], exp)


def test_crafted(spark):
    _check(spark, {
        "single": [(0, 500)],
        # monotone up: every row a record, zero drawdown
        "up": [(i, 100) for i in range(10)],
        # monotone down: one record (first), drawdown grows to 9
        "down": [(i, -1) for i in range(10)],
        # peak, trough, recovery, new peak
        "vee": [(0, 1000), (1, -300), (2, -400), (3, 600), (4, 200)],
        # flat: cum never strictly exceeds the first peak -> 1 record,
        # dd stays 0 (cum == runmax)
        "flat": [(i, 0) for i in range(5)],
    })


def test_randomized_matches_replay(spark):
    rng = random.Random(20260818)
    series = {}
    for ki in range(30):
        n = rng.randrange(1, 80)
        pts, t = [], 0
        for _ in range(n):
            t += rng.randrange(1, 40)  # unique ts: tie order is the
            pts.append((t, rng.randrange(-500, 700)))  # operator's own
        rng.shuffle(pts)
        series[f"u{ki}"] = pts
    _check(spark, series)


def test_partitioning_invariance(spark):
    rng = random.Random(3)
    pts = [(t, rng.randrange(-100, 120)) for t in range(500)]
    series = {"k": pts}
    rows = [("k", i, int(s), c / 100.0) for i, (s, c) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, value double"
    ).repartition(7)
    got = {r.conv_id: r.asDict() for r in drawdown_stats(df).collect()}
    want = _ref(sorted(pts))
    for col, exp in want.items():
        assert got["k"][col] == exp, (col, got["k"][col], exp)
