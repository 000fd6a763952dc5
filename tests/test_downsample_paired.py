"""Tests: M4 / LTTB downsampling and paired-series rolling stats."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _ts(m, s=0):
    return f"2024-01-01 00:{m:02d}:{s:02d}"


class TestM4:
    def test_extremes_and_ties(self, spark):
        from chronoxtract_spark.operators.downsample import m4_downsample

        # one 60s bucket; min value 1.0 attained twice -> earliest ts
        df = spark.createDataFrame(
            [("a", _ts(0, 5), 3.0), ("a", _ts(0, 10), 1.0),
             ("a", _ts(0, 20), 1.0), ("a", _ts(0, 30), 9.0),
             ("a", _ts(0, 50), 4.0)],
            "k string, ts string, v double",
        )
        r = m4_downsample(df, "k", "ts", "v", bucket_s=60).collect()[0]
        assert r.n == 5
        assert (r.t_first.second, r.v_first) == (5, 3.0)
        assert (r.t_last.second, r.v_last) == (50, 4.0)
        assert (r.t_min.second, r.v_min) == (10, 1.0)  # earliest of the tie
        assert (r.t_max.second, r.v_max) == (30, 9.0)

    def test_bucket_split(self, spark):
        from chronoxtract_spark.operators.downsample import m4_downsample

        df = spark.createDataFrame(
            [("a", _ts(0, 10), 1.0), ("a", _ts(1, 10), 2.0),
             ("a", _ts(2, 10), 3.0)],
            "k string, ts string, v double",
        )
        out = m4_downsample(df, "k", "ts", "v", bucket_s=60).collect()
        assert len(out) == 3 and all(r.n == 1 for r in out)


class TestLttb:
    def test_passthrough_short_series(self, spark):
        from chronoxtract_spark.operators.downsample import lttb_downsample

        df = spark.createDataFrame(
            [("a", _ts(i), float(i)) for i in range(5)],
            "k string, ts string, v double",
        )
        out = lttb_downsample(df, "k", "ts", "v", n_out=10).collect()
        assert len(out) == 5
        assert [r.sel_idx for r in sorted(out, key=lambda r: r.sel_idx)] == \
            list(range(5))

    def test_keeps_endpoints_and_spike(self, spark):
        from chronoxtract_spark.operators.downsample import lttb_downsample

        # flat series with one big spike: the spike's bucket must pick it
        vals = [0.0] * 30
        vals[17] = 100.0
        df = spark.createDataFrame(
            [("a", _ts(i), v) for i, v in enumerate(vals)],
            "k string, ts string, v double",
        )
        out = sorted(
            lttb_downsample(df, "k", "ts", "v", n_out=6).collect(),
            key=lambda r: r.sel_idx,
        )
        assert len(out) == 6
        assert out[0].ts.minute == 0 and out[-1].ts.minute == 29
        assert any(r.value == 100.0 for r in out)

    def test_matches_reference_implementation(self, spark):
        from chronoxtract_spark.operators.downsample import lttb_downsample

        rng = np.random.RandomState(3)
        v = rng.randint(0, 100, size=200).astype(float)
        n_out, nb = 20, 18
        t = np.arange(200, dtype=np.int64) * 60_000_000 + 1_700_000_000_000_000

        # independent straight-loop LTTB
        n = 200
        j = np.arange(n - 2)
        b = (j * nb) // (n - 2)
        sel = [0]
        for i in range(nb):
            idxs = np.nonzero(b == i)[0] + 1
            if i < nb - 1:
                nxt = np.nonzero(b == i + 1)[0] + 1
                tb = float(int(np.sum(t[nxt]))) / len(nxt)
                vb = float(np.sum(v[nxt])) / len(nxt)
            else:
                tb, vb = float(t[-1]), float(v[-1])
            ta, va = float(t[sel[-1]]), float(v[sel[-1]])
            areas = np.abs((ta - tb) * (v[idxs] - va)
                           - (ta - t[idxs]) * (vb - va))
            sel.append(int(idxs[int(np.argmax(areas))]))
        sel.append(n - 1)

        df = spark.createDataFrame(
            [("a", int(ti), float(vi)) for ti, vi in zip(t, v)],
            "k string, t_us long, v double",
        ).select("k", F.timestamp_micros("t_us").alias("ts"), "v")
        out = sorted(
            lttb_downsample(df, "k", "ts", "v", n_out=n_out).collect(),
            key=lambda r: r.sel_idx,
        )
        got_t = [int(r.ts.timestamp() * 1e6) for r in out]
        assert got_t == [int(t[i]) for i in sel]
        assert [r.value for r in out] == [float(v[i]) for i in sel]

    def test_duplicate_ts_collapses_to_min(self, spark):
        from chronoxtract_spark.operators.downsample import lttb_downsample

        df = spark.createDataFrame(
            [("a", _ts(0), 5.0), ("a", _ts(0), 2.0), ("a", _ts(1), 3.0)],
            "k string, ts string, v double",
        )
        out = sorted(
            lttb_downsample(df, "k", "ts", "v", n_out=3).collect(),
            key=lambda r: r.sel_idx,
        )
        assert len(out) == 2 and out[0].value == 2.0


class TestAlignedRollingCorr:
    def test_aligned_dense_zeros(self, spark):
        from chronoxtract_spark.operators.paired import aligned_counts

        df = spark.createDataFrame(
            [("d", _ts(0), "a"), ("d", _ts(0), "a"), ("d", _ts(2), "b")],
            "day string, ts string, side string",
        )
        out = {
            r.grid_ts.minute: (r.x, r.y)
            for r in aligned_counts(
                df, "day", "ts", "side", "a", "b", step_s=60
            ).collect()
        }
        assert out == {0: (2, 0), 1: (0, 0), 2: (0, 1)}

    def test_perfect_and_anti_correlation(self, spark):
        from chronoxtract_spark.operators.paired import rolling_corr

        rows = [("d", i, i + 1, 2 * (i + 1)) for i in range(8)]
        df = spark.createDataFrame(rows, "day string, i long, x long, y long")
        out = rolling_corr(df, "day", "i", "x", "y", window=4).collect()
        assert len(out) == 5  # full windows only
        assert all(r.corr == pytest.approx(1.0) for r in out)
        assert all(r.beta == pytest.approx(2.0) for r in out)

        df2 = spark.createDataFrame(
            [("d", i, i, 100 - i) for i in range(8)],
            "day string, i long, x long, y long",
        )
        out2 = rolling_corr(df2, "day", "i", "x", "y", window=4).collect()
        assert all(r.corr == pytest.approx(-1.0) for r in out2)

    def test_constant_side_null_and_numpy_match(self, spark):
        from chronoxtract_spark.operators.paired import rolling_corr

        rng = np.random.RandomState(5)
        x = rng.randint(0, 10, 20)
        y = rng.randint(0, 10, 20)
        df = spark.createDataFrame(
            [("d", i, int(x[i]), int(y[i])) for i in range(20)],
            "day string, i long, x long, y long",
        )
        out = {r.i: r for r in
               rolling_corr(df, "day", "i", "x", "y", window=5).collect()}
        for i in range(4, 20):
            wx, wy = x[i - 4: i + 1], y[i - 4: i + 1]
            if wx.std() == 0 or wy.std() == 0:
                assert out[i].corr is None
            else:
                assert out[i].corr == pytest.approx(
                    float(np.corrcoef(wx, wy)[0, 1]), rel=1e-12
                )
                assert out[i].cov == pytest.approx(
                    float(np.cov(wx, wy, bias=True)[0, 1]), rel=1e-12
                )

        dfc = spark.createDataFrame(
            [("d", i, 7, i) for i in range(6)],
            "day string, i long, x long, y long",
        )
        for r in rolling_corr(dfc, "day", "i", "x", "y", window=3).collect():
            assert r.corr is None and r.beta is None


class TestOhlc:
    def test_candle(self, spark):
        from chronoxtract_spark.operators.downsample import ohlc_bars

        df = spark.createDataFrame(
            [("a", _ts(0, 5), 3.0), ("a", _ts(0, 10), 9.0),
             ("a", _ts(0, 20), 1.0), ("a", _ts(0, 50), 4.0)],
            "k string, ts string, v double",
        )
        r = ohlc_bars(df, "k", "ts", "v", bar_s=60).collect()[0]
        assert (r.open, r.high, r.low, r.close) == (3.0, 9.0, 1.0, 4.0)
        assert r.n == 4 and r.sum_v == pytest.approx(17.0)


class TestLocf:
    def test_carries_forward(self, spark):
        from chronoxtract_spark.operators.resample import locf_grid

        df = spark.createDataFrame(
            [("a", "2024-01-01 00:00:03", 7.0),
             ("a", "2024-01-01 00:00:21", 2.0)],
            "k string, ts string, v double",
        )
        out = {r.grid_ts.second: r.value
               for r in locf_grid(df, "k", "ts", "v", step_s=5).collect()}
        # grid 5..20; 7.0 carries until the 21s obs (after the span end)
        assert out == {5: 7.0, 10: 7.0, 15: 7.0, 20: 7.0}

    def test_exact_instant_takes_observation(self, spark):
        from chronoxtract_spark.operators.resample import locf_grid

        df = spark.createDataFrame(
            [("a", "2024-01-01 00:00:00", 1.0),
             ("a", "2024-01-01 00:00:05", 9.0),
             ("a", "2024-01-01 00:00:07", 3.0)],
            "k string, ts string, v double",
        )
        out = {r.grid_ts.second: r.value
               for r in locf_grid(df, "k", "ts", "v", step_s=5).collect()}
        assert out[5] == 9.0  # the coinciding observation, not 1.0


class TestLttbOverflowRegression:
    def test_large_bucket_centroid_exact(self, spark):
        """int64 sums of epoch-us timestamps wrap past ~5400 elements;
        the split-sum centroid must agree with a Python-int reference
        on a 6000-point bucket (raw sum ~1e19 > int64 max)."""
        from chronoxtract_spark.operators.downsample import lttb_downsample

        n, n_out = 12002, 4  # nb=2 -> bucket 1 has ~6000 points
        rng = np.random.RandomState(13)
        v = rng.randint(0, 1000, size=n).astype(float)
        t0 = 1_700_000_000_000_000
        t = t0 + np.arange(n, dtype=np.int64) * 60_000_000

        nb = n_out - 2
        j = np.arange(n - 2)
        b = (j * nb) // (n - 2)
        sel = [0]
        for i in range(nb):
            idxs = np.nonzero(b == i)[0] + 1
            if i < nb - 1:
                nxt = np.nonzero(b == i + 1)[0] + 1
                assert int(sum(int(x) for x in t[nxt])) > 2**63  # overflow zone
                tb = float(sum(int(x) for x in t[nxt])) / len(nxt)
                vb = float(np.sum(v[nxt])) / len(nxt)
            else:
                tb, vb = float(t[-1]), float(v[-1])
            ta, va = float(t[sel[-1]]), float(v[sel[-1]])
            areas = np.abs((ta - tb) * (v[idxs] - va)
                           - (ta - t[idxs]) * (vb - va))
            sel.append(int(idxs[int(np.argmax(areas))]))
        sel.append(n - 1)

        df = spark.createDataFrame(
            [("a", int(ti), float(vi)) for ti, vi in zip(t, v)],
            "k string, t_us long, v double",
        ).select("k", F.timestamp_micros("t_us").alias("ts"), "v")
        out = sorted(
            lttb_downsample(df, "k", "ts", "v", n_out=n_out).collect(),
            key=lambda r: r.sel_idx,
        )
        assert [int(r.ts.timestamp() * 1e6) for r in out] == \
            [int(t[i]) for i in sel]
