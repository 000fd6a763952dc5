"""The irregular-interval EWMA's window-algebra closed form must equal
the sequential recurrence it replaces — verified by replaying the
recurrence in plain Python on crafted and randomized series."""

import math
import random
from datetime import datetime, timedelta

from chronoxtract_spark.operators.decay import ewma_irregular

T0 = datetime(2024, 1, 1)


def _recurrence(rows, tau):
    """Reference: the sequential y_i = (1-a_i) y_{i-1} + a_i x_i."""
    out = []
    y = None
    prev_t = None
    for t, x in rows:
        if y is None:
            y = x
        else:
            a = 1.0 - math.exp(-((t - prev_t) / tau))
            y = (1.0 - a) * y + a * x
        prev_t = t
        out.append(y)
    return out


def _run(spark, series, tau):
    """series: {key: [(t_seconds, x), ...]} -> {key: [ewma...]} in
    time order, unrounded for direct float comparison."""
    rows = [
        (k, i, T0 + timedelta(seconds=t), float(x))
        for k, pts in series.items()
        for i, (t, x) in enumerate(pts)
    ]
    df = spark.createDataFrame(
        rows, "key string, i long, ts timestamp, value double"
    )
    got = ewma_irregular(
        df, keys="key", ts_col="ts", value_col="value", tau_s=tau,
        tie_cols=["i"], round_digits=None,
    ).collect()
    out = {}
    for r in sorted(got, key=lambda r: (r.key, r.i)):
        out.setdefault(r.key, []).append(r.ewma)
    return out


class TestEwmaIrregular:
    def test_first_sample_is_identity(self, spark):
        got = _run(spark, {"a": [(0, 42.0)]}, tau=60.0)
        assert got["a"] == [42.0]

    def test_matches_sequential_recurrence(self, spark):
        pts = [(0, 10.0), (30, 20.0), (45, 5.0), (300, 100.0),
               (301, 0.0), (5000, 50.0)]
        got = _run(spark, {"a": pts}, tau=120.0)
        want = _recurrence(pts, 120.0)
        for g, w in zip(got["a"], want):
            assert abs(g - w) < 1e-9 * max(1.0, abs(w))

    def test_randomized_series_and_key_isolation(self, spark):
        rng = random.Random(7)
        series = {}
        for k in range(5):
            tu, pts = 0, []
            for _ in range(40):
                # integer microseconds: timestamps are micro-quantized
                # in Spark, so the Python replay must see identical dt
                tu += max(1, int(rng.expovariate(1 / 90.0) * 1e6))
                pts.append((tu / 1e6, rng.uniform(-50, 150)))
            series[f"k{k}"] = pts
        got = _run(spark, series, tau=300.0)
        for k, pts in series.items():
            want = _recurrence(pts, 300.0)
            assert len(got[k]) == len(want)
            for g, w in zip(got[k], want):
                assert abs(g - w) < 1e-8 * max(1.0, abs(w))

    def test_multi_block_matches_recurrence(self, spark):
        # tau = 2 s with a ~400 s span crosses ~5 blocks of 45*tau:
        # exercises the within-block sums AND the 2-lag chain carry
        rng = random.Random(11)
        tu, pts = 0, []
        for _ in range(200):
            tu += max(1, int(rng.expovariate(1 / 2.0) * 1e6))
            pts.append((tu / 1e6, rng.uniform(-50, 150)))
        got = _run(spark, {"a": pts}, tau=2.0)
        want = _recurrence(pts, 2.0)
        for g, w in zip(got["a"], want):
            assert abs(g - w) < 1e-8 * max(1.0, abs(w))

    def test_zero_dt_sample_has_zero_weight(self, spark):
        # a duplicate timestamp contributes a_i = 0: y unchanged
        got = _run(spark, {"a": [(0, 10.0), (60, 30.0), (60, 999.0)]},
                   tau=60.0)
        assert abs(got["a"][2] - got["a"][1]) < 1e-12

    def test_decay_limits(self, spark):
        # dt >> tau: y snaps to the new sample; dt << tau: y barely moves
        got = _run(spark, {"a": [(0, 10.0), (100000, 77.0)]}, tau=10.0)
        assert abs(got["a"][1] - 77.0) < 1e-9
        got = _run(spark, {"a": [(0, 10.0), (1, 77.0)]}, tau=1e6)
        assert abs(got["a"][1] - 10.0) < 0.01
