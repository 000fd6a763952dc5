"""Tests: PMI pairs, Zipf fit, seasonal-profile baselining."""

import math

import numpy as np
import pytest


class TestPmi:
    def test_perfect_collocation_tops(self, spark):
        from chronoxtract_spark.operators.corpus_lm import pmi_pairs

        # "alpha beta" always co-occur (5 docs); filler terms everywhere
        docs = [(i, "alpha beta common stuff") for i in range(5)]
        docs += [(10 + i, "common stuff other words") for i in range(15)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = pmi_pairs(df, vocab_k=50, min_pair_docs=5, top_k=10).collect()
        top = sorted(out, key=lambda r: r.rank)[0]
        assert {top.t1, top.t2} == {"alpha", "beta"}
        # PMI = ln(N * n_ab / (df_a * df_b)) = ln(20*5/25)
        assert top.pmi == pytest.approx(round(math.log(20 * 5 / 25), 6))
        assert top.n_docs_pair == 5 and top.df1 == 5 and top.df2 == 5

    def test_min_pair_docs_filter(self, spark):
        from chronoxtract_spark.operators.corpus_lm import pmi_pairs

        docs = [(1, "rare1 rare2")] + [(i, "a b") for i in range(2, 12)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = pmi_pairs(df, vocab_k=50, min_pair_docs=5, top_k=10).collect()
        pairs = {(r.t1, r.t2) for r in out}
        assert ("rare1", "rare2") not in pairs
        assert ("a", "b") in pairs


class TestZipf:
    def test_exact_zipf_corpus(self, spark):
        from chronoxtract_spark.operators.corpus_lm import zipf_fit

        # construct counts freq(r) = 2^(10 - r) for r = 1..8: a perfect
        # power law in rank -> slope = -10 ln2 / ... no: ln f = (10-r)ln2
        # is linear in r, not ln r. Instead freq(r) = 1000 // r.
        words = []
        for r in range(1, 9):
            words += [f"w{r:02d}"] * (1000 // r)
        df = spark.createDataFrame(
            [(0, " ".join(words))], "doc_id long, text string"
        )
        r = zipf_fit(df, top_n=8).collect()[0]
        # reference OLS on (ln rank, ln floor(1000/rank))
        xs = np.log(np.arange(1, 9))
        ys = np.log(np.array([1000 // k for k in range(1, 9)]))
        slope, intercept = np.polyfit(xs, ys, 1)
        assert r.n_terms == 8
        assert r.total_tokens == sum(1000 // k for k in range(1, 9))
        assert r.slope == pytest.approx(slope, abs=1e-5)
        assert r.intercept == pytest.approx(intercept, abs=1e-5)
        assert r.r2 > 0.999  # floor() makes it near-perfect, not exact

    def test_rank_tie_pin(self, spark):
        from chronoxtract_spark.operators.corpus_lm import zipf_fit

        df = spark.createDataFrame(
            [(0, "b b a a c")], "doc_id long, text string"
        )
        r = zipf_fit(df, top_n=2).collect()[0]
        # a and b tie at 2; rank pin is term ASC -> both kept anyway
        assert r.n_terms == 2 and r.total_tokens == 4


class TestSeasonalBaseline:
    def test_profile_stats(self, spark):
        from chronoxtract_spark.operators.baseline import seasonal_profile

        rows = [("k", 0, d, v) for d, v in enumerate([4, 6, 5, 5])]
        df = spark.createDataFrame(rows, "k string, hr int, day long, c long")
        p = seasonal_profile(df, "k", "hr", "c").collect()[0]
        assert p.n_obs == 4 and p.mean == 5.0
        assert p.std == pytest.approx(math.sqrt(0.5))

    def test_flags_only_slot_outliers(self, spark):
        from chronoxtract_spark.operators.baseline import seasonal_anomalies

        rng = np.random.RandomState(2)
        rows = []
        for day in range(30):
            for hr in range(4):
                base = 10 * (hr + 1)
                rows.append(("k", hr, day, base + int(rng.randint(0, 3))))
        # day 7 hour 2: huge spike vs slot profile, normal globally
        rows = [r if not (r[2] == 7 and r[1] == 2) else ("k", 2, 7, 300)
                for r in rows]
        df = spark.createDataFrame(rows, "k string, hr int, day long, c long")
        out = seasonal_anomalies(df, "k", "hr", "day", "c",
                                 z_threshold=3.0).collect()
        assert any(r.slot == 2 and r.day == 7 for r in out)
        # nothing else remotely close to that deviation is flagged
        assert all(r.value == 300.0 for r in out if r.slot == 2)

    def test_zero_variance_slot_never_flags(self, spark):
        from chronoxtract_spark.operators.baseline import seasonal_anomalies

        rows = [("k", 0, d, 5) for d in range(10)]
        df = spark.createDataFrame(rows, "k string, hr int, day long, c long")
        assert seasonal_anomalies(df, "k", "hr", "day", "c").count() == 0


class TestTheilSen:
    def test_clean_line_with_outlier(self, spark):
        from chronoxtract_spark.operators.robust import theil_sen

        # y = 3x + 2 with one mega-outlier: Theil-Sen shrugs it off
        vals = [3.0 * x + 2.0 for x in range(12)]
        vals[6] = 500.0
        df = spark.createDataFrame(
            [("s", i, v) for i, v in enumerate(vals)],
            "k string, i long, v double",
        )
        r = theil_sen(df, "k", "i", "v").collect()[0]
        assert r.n == 12
        assert r.slope == pytest.approx(3.0)
        assert r.intercept == pytest.approx(2.0)

    def test_matches_reference_loop(self, spark):
        from chronoxtract_spark.operators.robust import theil_sen

        rng = np.random.RandomState(41)
        y = rng.randint(0, 40, size=15).astype(float)
        slopes = sorted(
            (y[j] - y[i]) / (j - i)
            for i in range(15) for j in range(i + 1, 15)
        )
        m = len(slopes)
        med = (slopes[(m - 1) // 2] + slopes[m // 2]) / 2
        resid = sorted(y[i] - med * i for i in range(15))
        med_i = (resid[7] + resid[7]) / 2  # odd count: middle element
        df = spark.createDataFrame(
            [("s", i, float(v)) for i, v in enumerate(y)],
            "k string, i long, v double",
        )
        r = theil_sen(df, "k", "i", "v").collect()[0]
        assert r.slope == pytest.approx(med, abs=0)
        assert r.intercept == pytest.approx(med_i, abs=0)

    def test_single_point_no_row(self, spark):
        from chronoxtract_spark.operators.robust import theil_sen

        df = spark.createDataFrame([("s", 0, 1.0)],
                                   "k string, i long, v double")
        assert theil_sen(df, "k", "i", "v").count() == 0
