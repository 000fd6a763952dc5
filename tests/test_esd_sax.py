"""Tests: t/normal quantile helpers, generalized ESD, SAX words."""

import math

import numpy as np
import pytest


class TestTdist:
    def test_t_ppf_table_values(self):
        from chronoxtract_spark.kernel.tdist import t_ppf

        # published t-table values
        assert t_ppf(0.975, 10) == pytest.approx(2.2281388520, abs=1e-8)
        assert t_ppf(0.95, 5) == pytest.approx(2.0150483733, abs=1e-8)
        assert t_ppf(0.975, 24) == pytest.approx(2.0638985616, abs=1e-8)
        assert t_ppf(0.995, 1) == pytest.approx(63.656741, rel=1e-6)
        assert t_ppf(0.25, 7) == pytest.approx(-t_ppf(0.75, 7), abs=1e-12)

    def test_norm_ppf(self):
        from chronoxtract_spark.kernel.tdist import norm_ppf

        assert norm_ppf(0.975) == pytest.approx(1.959963985, abs=1e-8)
        assert norm_ppf(0.25) == pytest.approx(-0.6744897502, abs=1e-8)

    def test_esd_lambda_rosner_example(self):
        from chronoxtract_spark.kernel.tdist import esd_lambdas

        # Rosner (1983) Technometrics example: n=54, alpha=0.05
        lams = esd_lambdas(54, 3, 0.05)
        assert lams[0] == pytest.approx(3.158, abs=2e-3)
        assert lams[1] == pytest.approx(3.151, abs=2e-3)

    def test_sax_breakpoints(self):
        from chronoxtract_spark.kernel.tdist import sax_breakpoints

        bps = sax_breakpoints(4)
        assert bps[1] == 0.0
        assert bps[0] == pytest.approx(-0.67448975, abs=1e-8)
        assert bps == sorted(bps)


def _esd_reference(v, k, lams):
    """Straight-loop generalized ESD: returns list of (idx, R_i)."""
    active = list(range(len(v)))
    removed = []
    for i in range(k):
        vals = np.array([v[j] for j in active], dtype=float)
        m = len(vals)
        mean = vals.sum() / m
        std = math.sqrt(
            (np.sum(vals * vals) - vals.sum() ** 2 / m) / (m - 1)
        )
        if std == 0:
            break
        devs = np.abs(vals - mean)
        pos = int(np.argmax(devs))  # first max = earliest index
        removed.append((active[pos], devs[pos] / std))
        active.pop(pos)
    n_out = 0
    for i, (_, r) in enumerate(removed, 1):
        if r > lams[i - 1]:
            n_out = i
    return removed[:n_out]


class TestEsd:
    def test_obvious_spikes(self, spark):
        from chronoxtract_spark.operators.anomaly import esd_outliers

        vals = [5.0] * 24
        vals[3], vals[17] = 50.0, 40.0
        # some mild noise so std > 0 after removals
        for j in (1, 8, 12, 20):
            vals[j] = 6.0
        df = spark.createDataFrame(
            [("s", i, v) for i, v in enumerate(vals)],
            "k string, idx long, v double",
        )
        out = esd_outliers(df, "k", "idx", "v", series_n=24, k=3).collect()
        got = {(r.idx, r.round) for r in out}
        assert (3, 1) in got and (17, 2) in got
        assert all(r.r_stat > r.lam for r in out)

    def test_matches_reference_loop(self, spark):
        from chronoxtract_spark.kernel.tdist import esd_lambdas
        from chronoxtract_spark.operators.anomaly import esd_outliers

        rng = np.random.RandomState(23)
        rows, expect = [], set()
        lams = esd_lambdas(24, 3, 0.05)
        for s in range(20):
            v = rng.randint(0, 8, size=24).astype(float)
            if s % 3 == 0:
                v[rng.randint(24)] += rng.randint(20, 60)
            ref = _esd_reference(list(v), 3, lams)
            expect |= {(f"s{s}", int(i)) for i, _ in ref}
            rows += [(f"s{s}", i, float(x)) for i, x in enumerate(v)]
        df = spark.createDataFrame(rows, "k string, idx long, v double")
        got = {(r.k, r.idx) for r in
               esd_outliers(df, "k", "idx", "v", series_n=24, k=3).collect()}
        assert got == expect

    def test_constant_series_no_rows(self, spark):
        from chronoxtract_spark.operators.anomaly import esd_outliers

        df = spark.createDataFrame(
            [("s", i, 4.0) for i in range(24)], "k string, idx long, v double"
        )
        assert esd_outliers(df, "k", "idx", "v", series_n=24).count() == 0

    def test_wrong_length_series_dropped(self, spark):
        from chronoxtract_spark.operators.anomaly import esd_outliers

        df = spark.createDataFrame(
            [("s", i, float(i == 3) * 99) for i in range(10)],
            "k string, idx long, v double",
        )
        assert esd_outliers(df, "k", "idx", "v", series_n=24).count() == 0


def _sax_reference(v, word_len, alphabet, bps):
    v = np.asarray(v, dtype=float)
    n = len(v)
    seg_len = n // word_len
    mean = v.sum() / n
    std = math.sqrt((np.sum(v * v) - v.sum() ** 2 / n) / n)
    letters = []
    for s in range(word_len):
        paa = v[s * seg_len:(s + 1) * seg_len].sum() / seg_len
        z = (paa - mean) / std if std > 0 else 0.0
        idx = sum(1 for b in bps if b < z)
        letters.append("abcdefghijklmnopqrstuvwxyz"[idx])
    return "".join(letters)


class TestSax:
    def test_ramp_word(self, spark):
        from chronoxtract_spark.operators.symbolic import sax_words

        df = spark.createDataFrame(
            [("s", i, float(i)) for i in range(16)],
            "k string, idx long, v double",
        )
        r = sax_words(df, "k", "idx", "v", series_n=16, word_len=4,
                      alphabet=4).collect()[0]
        assert r.word == "abcd"  # monotone ramp spans the alphabet

    def test_constant_series_middle_letter(self, spark):
        from chronoxtract_spark.operators.symbolic import sax_words

        df = spark.createDataFrame(
            [("s", i, 7.0) for i in range(16)], "k string, idx long, v double"
        )
        r = sax_words(df, "k", "idx", "v", 16, 4, alphabet=4).collect()[0]
        # z = 0 everywhere; one breakpoint (-0.674) strictly below -> 'b'
        assert r.word == "bbbb" and r.std == 0.0

    def test_matches_reference(self, spark):
        from chronoxtract_spark.kernel.tdist import sax_breakpoints
        from chronoxtract_spark.operators.symbolic import sax_words

        rng = np.random.RandomState(9)
        bps = sax_breakpoints(6)
        rows, expect = [], {}
        for s in range(15):
            v = rng.randint(0, 30, size=24).astype(float)
            expect[f"s{s}"] = _sax_reference(v, 8, 6, bps)
            rows += [(f"s{s}", i, float(x)) for i, x in enumerate(v)]
        df = spark.createDataFrame(rows, "k string, idx long, v double")
        got = {r.k: r.word for r in
               sax_words(df, "k", "idx", "v", 24, 8, alphabet=6).collect()}
        assert got == expect

    def test_validation(self, spark):
        from chronoxtract_spark.operators.symbolic import sax_words

        df = spark.createDataFrame([("s", 0, 1.0)],
                                   "k string, idx long, v double")
        with pytest.raises(ValueError):
            sax_words(df, "k", "idx", "v", 10, 3)
        with pytest.raises(ValueError):
            sax_words(df, "k", "idx", "v", 10, 5, alphabet=1)
