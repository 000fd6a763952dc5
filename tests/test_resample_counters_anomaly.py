"""Tests: resample (interpolate/TWA), counter/state/heartbeat
aggregates, anomaly (Hampel/change-point), and the bigram-LM scorer —
each checked against a hand-computed or numpy-recomputed reference on
small inputs with known structure."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def _ts(s):
    return f"2024-01-01 00:00:{s:02d}"


class TestInterpolateGrid:
    def test_linear_midpoints(self, spark):
        from chronoxtract_spark.operators.resample import interpolate_grid

        # obs at t=0s (v=0) and t=10s (v=100): 1s grid -> v = 10*t
        df = spark.createDataFrame(
            [("a", _ts(0), 0.0), ("a", _ts(10), 100.0)],
            "k string, ts string, v double",
        )
        out = {
            r.grid_ts.second: r.value
            for r in interpolate_grid(df, "k", "ts", "v", step_s=1).collect()
        }
        assert sorted(out) == list(range(11))
        for s in range(11):
            assert out[s] == pytest.approx(10.0 * s, abs=0)

    def test_coinciding_grid_point_exact(self, spark):
        from chronoxtract_spark.operators.resample import interpolate_grid

        # obs exactly on a grid instant must be reproduced bit-exactly
        df = spark.createDataFrame(
            [("a", _ts(0), 1.0), ("a", _ts(5), 0.3333333333333333),
             ("a", _ts(10), 2.0)],
            "k string, ts string, v double",
        )
        out = {
            r.grid_ts.second: r.value
            for r in interpolate_grid(df, "k", "ts", "v", step_s=5).collect()
        }
        assert out[5] == 0.3333333333333333

    def test_no_extrapolation_and_dup_ts_min(self, spark):
        from chronoxtract_spark.operators.resample import interpolate_grid

        # span [3s, 7s] on a 5s grid -> only t=5 inside; duplicate ts
        # at 3s collapses to its min value 1.0
        df = spark.createDataFrame(
            [("a", _ts(3), 9.0), ("a", _ts(3), 1.0), ("a", _ts(7), 5.0)],
            "k string, ts string, v double",
        )
        rows = interpolate_grid(df, "k", "ts", "v", step_s=5).collect()
        assert len(rows) == 1 and rows[0].grid_ts.second == 5
        # lerp between (3s, 1.0) and (7s, 5.0) at t=5: 1 + 4*(2/4) = 3
        assert rows[0].value == pytest.approx(3.0)


class TestTimeWeightedAvg:
    def test_trapezoid(self, spark):
        from chronoxtract_spark.operators.resample import time_weighted_avg

        # v: 0@0s, 10@10s, 10@20s -> integral = 50 + 100 = 150,
        # twa = 150/20 = 7.5
        df = spark.createDataFrame(
            [("a", _ts(0), 0.0), ("a", _ts(10), 10.0), ("a", _ts(20), 10.0)],
            "k string, ts string, v double",
        )
        r = time_weighted_avg(df, "k", "ts", "v").collect()[0]
        assert r.n_obs == 3
        assert r.duration_s == pytest.approx(20.0)
        assert r.integral == pytest.approx(150.0)
        assert r.twa == pytest.approx(7.5)

    def test_single_obs_point_mass(self, spark):
        from chronoxtract_spark.operators.resample import time_weighted_avg

        df = spark.createDataFrame(
            [("a", _ts(4), 42.5)], "k string, ts string, v double"
        )
        r = time_weighted_avg(df, "k", "ts", "v").collect()[0]
        assert (r.n_obs, r.duration_s, r.integral, r.twa) == (1, 0.0, 0.0, 42.5)


class TestCounterAgg:
    def test_reset_detection(self, spark):
        from chronoxtract_spark.operators.counters import counter_agg

        # 5 -> 9 (+4) -> 2 (reset: +2) -> 7 (+5) => total 11, 1 reset
        df = spark.createDataFrame(
            [("c", _ts(0), 5.0), ("c", _ts(1), 9.0),
             ("c", _ts(2), 2.0), ("c", _ts(3), 7.0)],
            "k string, ts string, v double",
        )
        r = counter_agg(df, "k", "ts", "v").collect()[0]
        assert (r.n_obs, r.n_resets) == (4, 1)
        assert r.total_delta == pytest.approx(11.0)
        assert (r.first_value, r.last_value, r.max_value) == (5.0, 7.0, 9.0)

    def test_monotone_no_resets(self, spark):
        from chronoxtract_spark.operators.counters import counter_agg

        df = spark.createDataFrame(
            [("c", _ts(i), float(i * i)) for i in range(5)],
            "k string, ts string, v double",
        )
        r = counter_agg(df, "k", "ts", "v").collect()[0]
        assert r.n_resets == 0 and r.total_delta == pytest.approx(16.0)


class TestStateDurations:
    def test_intervals_and_open_end(self, spark):
        from chronoxtract_spark.operators.counters import state_durations

        # e1: run(0..10) idle(10..15) run(15..?) -- last open, dropped
        # e2: idle(2..8) -- then open
        df = spark.createDataFrame(
            [("e1", "run", _ts(0)), ("e1", "idle", _ts(10)),
             ("e1", "run", _ts(15)), ("e2", "idle", _ts(2)),
             ("e2", "run", _ts(8))],
            "entity string, state string, ts string",
        )
        out = {r.state: r for r in
               state_durations(df, "entity", "state", "ts").collect()}
        assert out["run"].n_intervals == 1
        assert out["run"].total_s == pytest.approx(10.0)
        assert out["idle"].n_intervals == 2
        assert out["idle"].total_s == pytest.approx(5.0 + 6.0)
        assert out["idle"].mean_s == pytest.approx(5.5)
        assert out["idle"].max_s == pytest.approx(6.0)


class TestHeartbeatAgg:
    def test_islands_and_gap(self, spark):
        from chronoxtract_spark.operators.counters import heartbeat_agg

        # liveness 5s: hb at 0,3 merge (island 0..8); hb at 20 is its
        # own island (20..25). uptime = 8 + 5 = 13; gap = 20 - 8 = 12
        df = spark.createDataFrame(
            [("h", _ts(0)), ("h", _ts(3)), ("h", _ts(20))],
            "k string, ts string",
        )
        r = heartbeat_agg(df, "k", "ts", liveness_s=5).collect()[0]
        assert (r.n_heartbeats, r.n_live_segments) == (3, 2)
        assert r.uptime_s == pytest.approx(13.0)
        assert r.max_gap_s == pytest.approx(12.0)

    def test_single_island_zero_gap(self, spark):
        from chronoxtract_spark.operators.counters import heartbeat_agg

        df = spark.createDataFrame(
            [("h", _ts(0)), ("h", _ts(2))], "k string, ts string"
        )
        r = heartbeat_agg(df, "k", "ts", liveness_s=5).collect()[0]
        assert r.n_live_segments == 1 and r.max_gap_s == 0.0
        assert r.uptime_s == pytest.approx(7.0)


class TestHampel:
    def test_flags_spike_only(self, spark):
        from chronoxtract_spark.operators.anomaly import hampel_outliers

        vals = [10.0] * 10
        vals[5] = 100.0
        df = spark.createDataFrame(
            [("s", i, v) for i, v in enumerate(vals)],
            "k string, idx long, v double",
        )
        rows = hampel_outliers(df, "k", "idx", "v", half_window=3, k=3.0).collect()
        # MAD = 0 in every window; only the spike deviates from median
        assert [r.idx for r in rows] == [5]
        assert rows[0].window_median == 10.0 and rows[0].window_mad == 0.0

    def test_matches_numpy_reference(self, spark):
        from chronoxtract_spark.operators.anomaly import hampel_outliers

        rng = np.random.RandomState(7)
        v = rng.randint(0, 50, size=60).astype(float)
        half, k = 4, 2.5
        expect = set()
        for i in range(60):
            win = v[max(0, i - half): i + half + 1]
            med = float(np.median(win))
            mad = float(np.median(np.abs(win - med)))
            dev = abs(v[i] - med)
            if (mad == 0.0 and dev > 0.0) or dev > k * 1.4826 * mad:
                expect.add(i)
        df = spark.createDataFrame(
            [("s", i, float(x)) for i, x in enumerate(v)],
            "k string, idx long, v double",
        )
        got = {r.idx for r in
               hampel_outliers(df, "k", "idx", "v", half, k).collect()}
        assert got == expect


class TestChangePoints:
    def test_level_shift_found(self, spark):
        from chronoxtract_spark.operators.anomaly import change_points

        vals = [2.0] * 8 + [9.0] * 7
        df = spark.createDataFrame(
            [("s", i, v) for i, v in enumerate(vals)],
            "k string, idx long, v double",
        )
        r = change_points(df, "k", "idx", "v").collect()[0]
        assert (r.n, r.split_idx, r.split_at) == (15, 8, 7)
        assert r.left_mean == pytest.approx(2.0)
        assert r.right_mean == pytest.approx(9.0)
        # gain == total SSE (both segments are constant -> SSE 0)
        mu = np.mean(vals)
        assert r.gain == pytest.approx(float(np.sum((np.array(vals) - mu) ** 2)))

    def test_matches_numpy_argmin(self, spark):
        from chronoxtract_spark.operators.anomaly import change_points

        rng = np.random.RandomState(11)
        v = rng.randint(0, 20, size=40).astype(float)

        def sse(a):
            return float(np.sum((a - a.mean()) ** 2)) if len(a) else 0.0

        scores = [sse(v[:k]) + sse(v[k:]) for k in range(1, 40)]
        best = int(np.argmin(scores)) + 1  # ties -> earlier (argmin does)
        df = spark.createDataFrame(
            [("s", i, float(x)) for i, x in enumerate(v)],
            "k string, idx long, v double",
        )
        r = change_points(df, "k", "idx", "v").collect()[0]
        assert r.split_idx == best
        assert r.gain == pytest.approx(sse(v) - scores[best - 1], rel=1e-9)

    def test_short_series_no_row(self, spark):
        from chronoxtract_spark.operators.anomaly import change_points

        df = spark.createDataFrame(
            [("s", 0, 1.0)], "k string, idx long, v double"
        )
        assert change_points(df, "k", "idx", "v").count() == 0


class TestBigramLm:
    def test_matches_numpy_reference(self, spark):
        from chronoxtract_spark.operators.corpus_stats import bigram_lm_bits

        docs = [(1, "abab"), (2, "abba"), (3, "zzzz"), (4, "a")]
        # add-one bigram LM over the whole corpus
        from collections import Counter

        big = Counter()
        uni = Counter()
        chars = set()
        for _, t in docs:
            chars.update(t)
            for i in range(len(t) - 1):
                big[t[i: i + 2]] += 1
                uni[t[i]] += 1
        V = len(chars)

        def score(t):
            bits = [
                -math.log2((big[t[i:i+2]] + 1) / (uni[t[i]] + V))
                for i in range(len(t) - 1)
            ]
            return sum(bits) / len(bits)

        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = {r.doc_id: r for r in bigram_lm_bits(df).collect()}
        assert 4 not in out  # <2 chars -> no row
        for d, t in docs[:3]:
            assert out[d].n_bigrams == len(t) - 1
            assert out[d].bits_per_gram == pytest.approx(score(t), abs=1e-6)

    def test_atypical_doc_scores_higher(self, spark):
        from chronoxtract_spark.operators.corpus_stats import bigram_lm_bits

        normal = "the quick brown fox jumps over the lazy dog and runs"
        docs = [(i, normal) for i in range(10)] + [(99, "qxqzqjqxqzqjqx")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = {r.doc_id: r.bits_per_gram for r in bigram_lm_bits(df).collect()}
        assert out[99] > out[0]


class TestNullObservationRegression:
    def test_interpolate_ignores_null_values(self, spark):
        """A null-valued row is no observation: it must not become a
        bracket timestamp (which would desync bracket time from the
        ignorenulls-carried value and 'reproduce' a stale value)."""
        from chronoxtract_spark.operators.resample import interpolate_grid

        df = spark.createDataFrame(
            [("a", "2024-01-01 00:00:00", 10.0),
             ("a", "2024-01-01 00:02:00", None),
             ("a", "2024-01-01 00:04:00", 30.0)],
            "k string, ts string, v double",
        )
        out = {r.grid_ts.minute: r.value
               for r in interpolate_grid(df, "k", "ts", "v", 60).collect()}
        # lerp between the two REAL observations: 10 + (30-10)*m/4
        assert out[2] == pytest.approx(20.0)
        assert out[1] == pytest.approx(15.0)

    def test_locf_ignores_null_values(self, spark):
        from chronoxtract_spark.operators.resample import locf_grid

        df = spark.createDataFrame(
            [("a", "2024-01-01 00:00:00", 7.0),
             ("a", "2024-01-01 00:02:00", None),
             ("a", "2024-01-01 00:03:30", 2.0)],
            "k string, ts string, v double",
        )
        out = {r.grid_ts.minute: r.value
               for r in locf_grid(df, "k", "ts", "v", 60).collect()}
        assert out == {0: 7.0, 1: 7.0, 2: 7.0, 3: 7.0}
