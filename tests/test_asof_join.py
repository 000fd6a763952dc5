"""Unit tests for the as-of join operator (most-recent-match
alignment). Cross-engine parity at sf0.01 lives in the oracle registry
(`asof_join`); these pin the semantics on crafted micro-cases."""

from datetime import datetime, timedelta

import pytest

from chronoxtract_spark.operators.asof import asof_join

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _t(s):
    return T0 + timedelta(seconds=s)


def _frames(spark, left_rows, right_rows):
    l = spark.createDataFrame(left_rows, "id long, key string, ts timestamp")
    r = spark.createDataFrame(
        right_rows, "key string, ts timestamp, value double"
    )
    return l, r


def _run(spark, left_rows, right_rows, **kw):
    l, r = _frames(spark, left_rows, right_rows)
    out = asof_join(l, r, on="key", ts_col="ts", value_cols=["value"], **kw)
    return {row.id: (row.ts_matched, row.value_matched)
            for row in out.collect()}


class TestAsofJoin:
    def test_most_recent_at_or_before(self, spark):
        got = _run(
            spark,
            [(1, "a", _t(100)), (2, "a", _t(10)), (3, "a", _t(0))],
            [("a", _t(5), 5.0), ("a", _t(50), 50.0), ("a", _t(200), 200.0)],
        )
        assert got[1] == (_t(50), 50.0)   # 200 is in the future
        assert got[2] == (_t(5), 5.0)
        assert got[3] == (None, None)     # nothing at or before t=0

    def test_same_instant_is_eligible(self, spark):
        got = _run(spark, [(1, "a", _t(10))], [("a", _t(10), 7.0)])
        assert got[1] == (_t(10), 7.0)

    def test_equal_ts_tie_takes_max_value(self, spark):
        got = _run(
            spark,
            [(1, "a", _t(20))],
            [("a", _t(10), 3.0), ("a", _t(10), 9.0), ("a", _t(10), 6.0)],
        )
        assert got[1] == (_t(10), 9.0)

    def test_keys_do_not_leak(self, spark):
        got = _run(
            spark,
            [(1, "a", _t(100)), (2, "b", _t(100))],
            [("a", _t(10), 1.0)],
        )
        assert got[1] == (_t(10), 1.0)
        assert got[2] == (None, None)

    def test_tolerance_nulls_stale_matches(self, spark):
        got = _run(
            spark,
            [(1, "a", _t(100)), (2, "a", _t(5000))],
            [("a", _t(10), 1.0)],
            tolerance_s=3600,
        )
        assert got[1] == (_t(10), 1.0)       # 90 s old: inside 1 h
        assert got[2] == (None, None)        # 4990 s old: stale
        # boundary: exactly tolerance_s old still matches (inclusive)
        got = _run(
            spark, [(1, "a", _t(3610))], [("a", _t(10), 1.0)],
            tolerance_s=3600,
        )
        assert got[1] == (_t(10), 1.0)

    def test_left_columns_pass_through(self, spark):
        l, r = _frames(spark, [(1, "a", _t(10))], [("a", _t(5), 2.0)])
        out = asof_join(l, r, on="key", ts_col="ts", value_cols=["value"])
        assert out.columns == ["id", "key", "ts", "ts_matched",
                               "value_matched"]

    def test_rejects_empty_payload(self, spark):
        l, r = _frames(spark, [(1, "a", _t(10))], [("a", _t(5), 2.0)])
        with pytest.raises(ValueError, match="value columns"):
            asof_join(l, r.select("key", "ts"), on="key", ts_col="ts")

    def test_single_shuffle_plan(self, spark):
        # the whole point vs a range join: one exchange on the key,
        # no cartesian / nested-loop join anywhere
        l, r = _frames(spark, [(1, "a", _t(10))], [("a", _t(5), 2.0)])
        plan = asof_join(
            l, r, on="key", ts_col="ts", value_cols=["value"]
        )._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
