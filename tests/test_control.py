"""cusum_stats must equal a sequential plain-Python replay of the
clamped Page recurrence (exact n-scaled integer cents) on crafted and
randomized value streams — the window-algebra identity
S_t = Q_t - min(0, running_min(Q)) is exercised against the literal
max(0, S+d) loop it replaces."""

import random

from chronoxtract_spark.operators.control import cusum_stats


def _ref(rows, k_allowance, h_threshold):
    """rows: [(s, cents)] pre-sorted; replay the literal recurrence."""
    vi = [v for _, v in rows]
    n = len(vi)
    sv = sum(vi)
    ku = int(round(k_allowance * 100))
    hu = int(round(h_threshold * 100))
    sp = sn = spm = snm = 0
    tap = tan = None
    for t, v in enumerate(vi, 1):
        sp = max(0, sp + (n * v - sv - n * ku))
        sn = max(0, sn + (sv - n * v - n * ku))
        spm, snm = max(spm, sp), max(snm, sn)
        if tap is None and sp > n * hu:
            tap = t
        if tan is None and sn > n * hu:
            tan = t
    return {
        "n_obs": n,
        "cusum_pos_max": round(spm / (n * 100.0), 6),
        "cusum_neg_max": round(snm / (n * 100.0), 6),
        "t_alarm_pos": tap,
        "t_alarm_neg": tan,
        "alarm_pos": tap is not None,
        "alarm_neg": tan is not None,
    }


def _check(spark, series, k_allowance=0.5, h_threshold=3.0):
    rows = [
        (k, i, int(s), cents / 100.0)
        for k, pts in series.items()
        for i, (s, cents) in enumerate(pts)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, value double"
    )
    got = {
        r.conv_id: r.asDict()
        for r in cusum_stats(
            df, k_allowance=k_allowance, h_threshold=h_threshold
        ).collect()
    }
    assert set(got) == set(series)
    for k, pts in series.items():
        want = _ref(sorted(pts), k_allowance, h_threshold)
        for col, exp in want.items():
            assert got[k][col] == exp, (k, col, got[k][col], exp)


def test_crafted(spark):
    _check(spark, {
        # constant stream: every deviation is exactly -n*k, both
        # charts stay clamped at 0, no alarm
        "const": [(i, 250) for i in range(8)],
        "single": [(0, 500)],
        # step change half-way: positive chart climbs after the step
        "step_up": [(i, 0) for i in range(10)]
        + [(10 + i, 600) for i in range(10)],
        # mirrored step down
        "step_dn": [(i, 600) for i in range(10)]
        + [(10 + i, 0) for i in range(10)],
        # alternating around the mean: clamp keeps both sides small
        "alt": [(i, 100 if i % 2 else -100) for i in range(12)],
    })


def test_step_alarm_index(spark):
    """A 0->6.0 step at t=11 with k=0.5, h=3.0 alarms on BOTH sides
    at hand-computable indices: against the retrospective full-series
    mean (3.0) the leading zeros run 2.5/row below it (negative chart
    crosses 3.0 on its second row) and the post-step rows run 2.5/row
    above it (positive chart crosses on the second post-step row)."""
    pts = [(i, 0) for i in range(10)] + [(10 + i, 600) for i in range(10)]
    rows = [("k", i, s, c / 100.0) for i, (s, c) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, value double"
    )
    got = cusum_stats(df, k_allowance=0.5, h_threshold=3.0).collect()[0]
    want = _ref(pts, 0.5, 3.0)
    assert got.alarm_pos and got.alarm_neg
    assert got.t_alarm_pos == want["t_alarm_pos"] == 12
    assert got.t_alarm_neg == want["t_alarm_neg"] == 2


def test_zero_allowance_equals_drawdown_mirror(spark):
    """With k=0 the positive CUSUM max equals the maximum 'draw-UP'
    of the mean-centered cumulative path — cross-checked against a
    direct cumulative computation."""
    rng = random.Random(11)
    pts = [(t, rng.randrange(-400, 500)) for t in range(60)]
    rows = [("k", i, s, c / 100.0) for i, (s, c) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, value double"
    )
    got = cusum_stats(df, k_allowance=0.0, h_threshold=1e9).collect()[0]
    vi = [c for _, c in pts]
    n, sv = len(vi), sum(vi)
    q = 0
    qmin = 0
    best = 0
    for v in vi:
        q += n * v - sv
        best = max(best, q - qmin)
        qmin = min(qmin, q)
    assert got.cusum_pos_max == round(best / (n * 100.0), 6)
    assert not got.alarm_pos and got.t_alarm_pos is None


def test_randomized_matches_replay(spark):
    rng = random.Random(20260818)
    series = {}
    for ki in range(30):
        n = rng.randrange(1, 80)
        pts, t = [], 0
        for _ in range(n):
            t += rng.randrange(1, 40)
            pts.append((t, rng.randrange(-500, 700)))
        rng.shuffle(pts)
        series[f"u{ki}"] = pts
    _check(spark, series, k_allowance=0.25, h_threshold=2.0)


def test_partitioning_invariance(spark):
    rng = random.Random(5)
    pts = [(t, rng.randrange(-100, 160)) for t in range(500)]
    rows = [("k", i, s, c / 100.0) for i, (s, c) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, value double"
    ).repartition(7)
    got = cusum_stats(df, k_allowance=0.1, h_threshold=4.0).collect()[0]
    want = _ref(pts, 0.1, 4.0)
    for col, exp in want.items():
        assert got.asDict()[col] == exp, (col, got.asDict()[col], exp)
