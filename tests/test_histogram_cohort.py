"""Tests: value histograms, exact heavy hitters, cohort retention,
correlation matrices."""

import numpy as np
import pytest


class TestHistogram:
    def test_bins_and_clipping(self, spark):
        from chronoxtract_spark.operators.histogram import value_histogram

        vals = [0.0, 0.5, 9.99, 10.0, 25.0, -1.0, 100.0]  # last two clip
        df = spark.createDataFrame(
            [("k", v) for v in vals], "k string, v double"
        )
        out = {r.bin: r for r in
               value_histogram(df, "k", "v", 0.0, 100.0, 10).collect()}
        assert out[0].n == 3 and out[1].n == 1 and out[2].n == 1
        assert out[0].bin_lo == 0.0 and out[0].bin_hi == 10.0
        assert sum(r.n for r in out.values()) == 5  # -1 and 100 clipped

    def test_matches_numpy(self, spark):
        from chronoxtract_spark.operators.histogram import value_histogram

        rng = np.random.RandomState(17)
        v = rng.uniform(0, 50, 500)
        df = spark.createDataFrame(
            [("k", float(x)) for x in v], "k string, v double"
        )
        out = {r.bin: r.n for r in
               value_histogram(df, "k", "v", 0.0, 50.0, 10).collect()}
        ref, _ = np.histogram(v, bins=10, range=(0, 50))
        for i, n in enumerate(ref):
            assert out.get(i, 0) == n

    def test_validation(self, spark):
        from chronoxtract_spark.operators.histogram import value_histogram

        df = spark.createDataFrame([("k", 1.0)], "k string, v double")
        with pytest.raises(ValueError):
            value_histogram(df, "k", "v", 5.0, 5.0, 10)


class TestTopItems:
    def test_rank_and_ties(self, spark):
        from chronoxtract_spark.operators.histogram import top_items

        rows = [("g", x) for x in
                ["a"] * 5 + ["b"] * 3 + ["c"] * 3 + ["d"] * 1]
        df = spark.createDataFrame(rows, "g string, item string")
        out = sorted(top_items(df, "g", "item", k=3).collect(),
                     key=lambda r: r.rank)
        assert [(r.item, r.n) for r in out] == [("a", 5), ("b", 3), ("c", 3)]


class TestCohort:
    def test_retention_matrix(self, spark):
        from chronoxtract_spark.operators.cohort import cohort_retention

        rows = [
            # cohort 01-01: u1 (days 0, 1), u2 (day 0 only)
            (1, "2024-01-01 10:00:00"), (1, "2024-01-02 09:00:00"),
            (2, "2024-01-01 23:59:59"),
            # cohort 01-02: u3 (days 0 and 2)
            (3, "2024-01-02 01:00:00"), (3, "2024-01-04 01:00:00"),
            # duplicate activity same day must not double count
            (1, "2024-01-01 11:00:00"),
        ]
        df = spark.createDataFrame(rows, "u long, ts string")
        out = {(r.cohort_day, r.day_offset): r for r in
               cohort_retention(df, "u", "ts").collect()}
        assert out[("2024-01-01", 0)].n_active == 2
        assert out[("2024-01-01", 0)].cohort_size == 2
        assert out[("2024-01-01", 1)].n_active == 1
        assert out[("2024-01-01", 1)].retention == pytest.approx(0.5)
        assert out[("2024-01-02", 2)].n_active == 1
        assert ("2024-01-02", 1) not in out

    def test_max_offset(self, spark):
        from chronoxtract_spark.operators.cohort import cohort_retention

        rows = [(1, "2024-01-01 10:00:00"), (1, "2024-03-01 10:00:00")]
        df = spark.createDataFrame(rows, "u long, ts string")
        out = cohort_retention(df, "u", "ts", max_offset=7).collect()
        assert {r.day_offset for r in out} == {0}


class TestCorrMatrix:
    def test_pairs_and_values(self, spark):
        from chronoxtract_spark.operators.cohort import corr_matrix

        # a fires every minute 0-9; b fires with a (perfect corr);
        # c fires only when a doesn't (anti)
        rows = []
        for m in range(10):
            n_a = 3 if m % 2 == 0 else 1
            for _ in range(n_a):
                rows.append(("a", f"2024-01-01 00:{m:02d}:00"))
                rows.append(("b", f"2024-01-01 00:{m:02d}:30"))
            for _ in range(4 - n_a):
                rows.append(("c", f"2024-01-01 00:{m:02d}:10"))
        df = spark.createDataFrame(rows, "name string, ts string")
        out = {(r.name1, r.name2): r for r in
               corr_matrix(df, "name", "ts", step_s=60).collect()}
        assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
        assert all(r.n == 10 for r in out.values())
        assert out[("a", "b")].corr == pytest.approx(1.0)
        assert out[("a", "c")].corr == pytest.approx(-1.0)

    def test_constant_series_null(self, spark):
        from chronoxtract_spark.operators.cohort import corr_matrix

        rows = []
        for m in range(5):
            rows.append(("x", f"2024-01-01 00:{m:02d}:00"))  # constant 1
            for _ in range(m + 1):
                rows.append(("y", f"2024-01-01 00:{m:02d}:00"))
        df = spark.createDataFrame(rows, "name string, ts string")
        r = corr_matrix(df, "name", "ts", step_s=60).collect()[0]
        assert r.corr is None



class TestSpearmanMatrix:
    def _counts_df(self, spark, series):
        """series: name -> list of per-minute counts (shared grid)."""
        rows = []
        for name, counts in series.items():
            for m, c in enumerate(counts):
                for _ in range(c):
                    rows.append((name, f"2024-01-01 00:{m:02d}:00"))
        return spark.createDataFrame(rows, "name string, ts string")

    def test_monotone_transform_invariance(self, spark):
        from chronoxtract_spark.operators.cohort import (
            corr_matrix, spearman_matrix,
        )

        # b is a convex monotone transform of a: Spearman must be
        # exactly 1 while Pearson is strictly below 1
        a = [1, 2, 3, 4, 5, 6, 7, 8]
        b = [x * x for x in a]
        c = a[::-1]  # anti-monotone: Spearman exactly -1
        df = self._counts_df(spark, {"a": a, "b": b, "c": c})
        rho = {(r.name1, r.name2): r.rho for r in
               spearman_matrix(df, "name", "ts", step_s=60).collect()}
        cor = {(r.name1, r.name2): r.corr for r in
               corr_matrix(df, "name", "ts", step_s=60).collect()}
        assert rho[("a", "b")] == pytest.approx(1.0)
        assert cor[("a", "b")] < 0.999
        assert rho[("a", "c")] == pytest.approx(-1.0)
        assert rho[("b", "c")] == pytest.approx(-1.0)

    def test_matches_pandas_with_ties(self, spark):
        import pandas as pd

        from chronoxtract_spark.operators.cohort import spearman_matrix

        rng = __import__("random").Random(29)
        series = {
            name: [rng.randrange(0, 5) for _ in range(40)]
            for name in ("a", "b", "c")
        }
        df = self._counts_df(spark, series)
        got = {(r.name1, r.name2): r.rho for r in
               spearman_matrix(df, "name", "ts", step_s=60).collect()}
        pdf = pd.DataFrame(series)
        want = pdf.corr(method="spearman")
        for (n1, n2), rho in got.items():
            assert rho == pytest.approx(want.loc[n1, n2], abs=1e-12), (n1, n2)

    def test_constant_series_null_and_burst_robust(self, spark):
        from chronoxtract_spark.operators.cohort import (
            corr_matrix, spearman_matrix,
        )

        # x constant -> null rho; y/z monotone except one mega burst
        # that wrecks Pearson but moves Spearman only one rank step
        y = [1, 2, 3, 4, 5, 6, 7, 100]
        z = [2, 3, 4, 5, 6, 7, 8, 9]
        df = self._counts_df(spark, {"x": [1] * 8, "y": y, "z": z})
        rho = {(r.name1, r.name2): r.rho for r in
               spearman_matrix(df, "name", "ts", step_s=60).collect()}
        assert rho[("x", "y")] is None and rho[("x", "z")] is None
        assert rho[("y", "z")] == pytest.approx(1.0)
        cor = {(r.name1, r.name2): r.corr for r in
               corr_matrix(df, "name", "ts", step_s=60).collect()}
        assert cor[("y", "z")] < 0.9


class TestSkewReport:
    def test_uniform_keys(self, spark):
        from chronoxtract_spark.operators.skew import skew_report

        rows = [(f"k{i}", j) for i in range(10) for j in range(4)]
        df = spark.createDataFrame(rows, "k string, x long")
        r = skew_report(df, "k", top_k=2).collect()[0]
        assert (r.n_rows, r.n_keys, r.max_key_rows) == (40, 10, 4)
        assert r.top_share == pytest.approx(8 / 40)
        assert r.p50_key_rows == 4 and r.p99_key_rows == 4
        assert r.gini == pytest.approx(0.0)

    def test_mega_key(self, spark):
        from chronoxtract_spark.operators.skew import skew_report

        rows = [("mega", j) for j in range(96)]
        rows += [(f"k{i}", 0) for i in range(4)]
        df = spark.createDataFrame(rows, "k string, x long")
        r = skew_report(df, "k", top_k=1).collect()[0]
        assert r.max_key_rows == 96
        assert r.top_share == pytest.approx(0.96)
        # gini vs a straight-loop reference
        sizes = sorted([96, 1, 1, 1, 1])
        n, tot = len(sizes), sum(sizes)
        swx = sum((i + 1) * c for i, c in enumerate(sizes))
        assert r.gini == pytest.approx(2 * swx / (n * tot) - (n + 1) / n)
