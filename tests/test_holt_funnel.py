"""Tests: Holt linear-trend smoothing and ordered funnel analysis."""

import numpy as np
import pytest


def _holt_reference(y, a, b):
    lev, trd, sse = float(y[0]), float(y[1]) - float(y[0]), 0.0
    for t in range(1, len(y)):
        err = float(y[t]) - (lev + trd)
        sse += err * err
        new_lev = a * float(y[t]) + (1 - a) * (lev + trd)
        trd = b * (new_lev - lev) + (1 - b) * trd
        lev = new_lev
    return lev, trd, sse


class TestHolt:
    def test_perfect_linear_series(self, spark):
        from chronoxtract_spark.operators.holt import holt_forecast

        df = spark.createDataFrame(
            [("s", i, 10.0 + 2.0 * i) for i in range(12)],
            "k string, i long, v double",
        )
        out = sorted(
            holt_forecast(df, "k", "i", "v", alpha=0.5, beta=0.25,
                          horizon=3).collect(),
            key=lambda r: r.h,
        )
        assert len(out) == 3
        # linear data fits exactly: sse 0, forecasts continue the line
        assert out[0].sse == 0.0
        assert out[0].trend == pytest.approx(2.0)
        for r in out:
            assert r.forecast == pytest.approx(10.0 + 2.0 * (11 + r.h))

    def test_matches_reference_loop(self, spark):
        from chronoxtract_spark.operators.holt import holt_forecast

        rng = np.random.RandomState(31)
        rows, expect = [], {}
        for s in range(8):
            y = rng.randint(0, 50, size=24).astype(float)
            expect[f"s{s}"] = _holt_reference(y, 0.5, 0.25)
            rows += [(f"s{s}", i, float(v)) for i, v in enumerate(y)]
        df = spark.createDataFrame(rows, "k string, i long, v double")
        out = holt_forecast(df, "k", "i", "v", 0.5, 0.25, horizon=1).collect()
        assert len(out) == 8
        for r in out:
            lev, trd, sse = expect[r.key]
            assert r.level == lev and r.trend == trd and r.sse == sse
            assert r.forecast == lev + 1 * trd

    def test_short_series_dropped_and_validation(self, spark):
        from chronoxtract_spark.operators.holt import holt_forecast

        df = spark.createDataFrame(
            [("s", 0, 1.0)], "k string, i long, v double"
        )
        assert holt_forecast(df, "k", "i", "v", 0.5, 0.25).count() == 0
        with pytest.raises(ValueError):
            holt_forecast(df, "k", "i", "v", alpha=0.0, beta=0.5)


class TestFunnel:
    def test_strict_ordering_and_counts(self, spark):
        from chronoxtract_spark.operators.funnel import funnel_steps

        rows = [
            # u1 completes a->b->c in order
            (1, "a", "2024-01-01 00:00:00"),
            (1, "b", "2024-01-01 00:00:10"),
            (1, "c", "2024-01-01 00:00:30"),
            # u2 does b BEFORE a -> b does not count; no c
            (2, "b", "2024-01-01 00:00:00"),
            (2, "a", "2024-01-01 00:00:05"),
            # u3 a then b; c before b -> c does not count
            (3, "a", "2024-01-01 00:00:00"),
            (3, "c", "2024-01-01 00:00:01"),
            (3, "b", "2024-01-01 00:00:02"),
            # u4 never does a
            (4, "c", "2024-01-01 00:00:00"),
        ]
        df = spark.createDataFrame(rows, "u long, t string, ts string")
        out = {r.step: r for r in
               funnel_steps(df, "u", "t", "ts", ["a", "b", "c"]).collect()}
        assert out[1].n_reached == 3
        assert out[2].n_reached == 2  # u1, u3
        assert out[3].n_reached == 1  # u1
        assert out[1].conversion == 1.0
        assert out[2].conversion == pytest.approx(2 / 3)
        assert out[3].conversion == pytest.approx(1 / 3)
        assert out[3].mean_s_from_first == pytest.approx(30.0)
        assert out[2].mean_s_from_first == pytest.approx((10 + 2) / 2)

    def test_earliest_qualifying_times(self, spark):
        from chronoxtract_spark.operators.funnel import funnel_steps

        # repeat events: the earliest qualifying occurrence counts
        rows = [
            (1, "a", "2024-01-01 00:00:00"),
            (1, "a", "2024-01-01 00:01:00"),
            (1, "b", "2024-01-01 00:02:00"),
            (1, "b", "2024-01-01 00:03:00"),
        ]
        df = spark.createDataFrame(rows, "u long, t string, ts string")
        out = {r.step: r for r in
               funnel_steps(df, "u", "t", "ts", ["a", "b"]).collect()}
        assert out[2].mean_s_from_first == pytest.approx(120.0)

    def test_validation(self, spark):
        from chronoxtract_spark.operators.funnel import funnel_steps

        df = spark.createDataFrame([(1, "a", "2024-01-01")],
                                   "u long, t string, ts string")
        with pytest.raises(ValueError):
            funnel_steps(df, "u", "t", "ts", ["a"])
