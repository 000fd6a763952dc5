"""Unit tests for the corpus-statistics operators: repetition signals,
TF-IDF keyword extraction, and temperature mixture resampling.

Hand-computed expectations on tiny crafted corpora; the sf0.01
cross-engine parity lives in the oracle registry
(tools/check_oracle.py: repetition_stats / tfidf_terms / lang_mixture).
"""

import math

import pytest

from chronoxtract_spark.operators.corpus_stats import (
    repetition_stats,
    tfidf_terms,
)
from chronoxtract_spark.operators.sampling import (
    U60,
    hash_u60,
    temperature_mixture,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestRepetitionStats:
    def test_hand_computed(self, spark):
        # "a b a b c a b": 13 chars, 7 words
        # bigrams: [a b, b a, a b, b c, c a, a b] -> "a b" x3 (top &
        # dup), "b a"/"b c"/"c a" x1 -> top2 = dup2 = 3*3/13
        # trigrams: all 5 distinct -> top3 = 5/13, dup3 = 0
        # 4-grams: all distinct -> top4 = 7/13 ("a b a b" smallest)
        row = repetition_stats(
            _docs(spark, [(1, "a b a b c a b")])
        ).collect()[0]
        assert row.n_words == 7
        assert row.max_run == 1
        assert row.top2_char_frac == pytest.approx(9 / 13, abs=0)
        assert row.dup2_char_frac == pytest.approx(9 / 13, abs=0)
        assert row.top3_char_frac == pytest.approx(5 / 13, abs=0)
        assert row.dup3_char_frac == 0.0
        assert row.top4_char_frac == pytest.approx(7 / 13, abs=0)

    def test_top_gram_tie_breaks_lexicographically(self, spark):
        # "b a b a": bigrams [b a, a b, b a] -> "b a" x2 wins on count
        # despite "a b" sorting first
        row = repetition_stats(_docs(spark, [(1, "b a b a")])).collect()[0]
        assert row.top2_char_frac == pytest.approx(2 * 3 / 7, abs=0)

    def test_max_consecutive_run(self, spark):
        rows = {
            r.doc_id: r
            for r in repetition_stats(
                _docs(
                    spark,
                    [
                        (1, "x x x y x x z"),
                        (2, "a b c d"),
                        (3, "q"),
                    ],
                )
            ).collect()
        }
        assert rows[1].max_run == 3
        assert rows[2].max_run == 1
        assert rows[3].max_run == 1
        # a 1-word doc has no n-grams at all: every fraction is 0
        assert rows[3].top2_char_frac == 0.0
        assert rows[3].dup2_char_frac == 0.0

    def test_degenerate_doc_flagged(self, spark):
        # the signal the filter exists for: a fully repeated document
        # saturates the dup fraction, a diverse one stays low
        rows = {
            r.doc_id: r
            for r in repetition_stats(
                _docs(
                    spark,
                    [(1, "spam spam spam spam spam spam"),
                     (2, "one two three four five six")],
                )
            ).collect()
        }
        assert rows[1].dup2_char_frac > 1.5  # overlapping occurrences
        assert rows[1].max_run == 6
        assert rows[2].dup2_char_frac == 0.0


class TestTfidfTerms:
    def test_hand_computed(self, spark):
        df = _docs(
            spark,
            [
                (1, "apple apple banana"),
                (2, "banana cherry"),
                (3, "cherry cherry cherry durian"),
            ],
        )
        out = {
            (r.doc_id, r.term): r for r in tfidf_terms(df, k=3).collect()
        }
        # every term has df: apple 1, banana 2, cherry 2, durian 1; N=3
        idf1 = math.log(4 / 2) + 1  # df=1
        idf2 = math.log(4 / 3) + 1  # df=2
        r = out[(1, "apple")]
        assert r.tf == 2 and r.doc_freq == 1
        assert r.score == pytest.approx(round(2 * idf1, 6), abs=0)
        assert r.rank == 1
        assert out[(3, "cherry")].rank == 1
        assert out[(3, "cherry")].score == pytest.approx(
            round(3 * idf2, 6), abs=0
        )
        # doc 2: banana and cherry tie exactly (tf=1, df=2) ->
        # term-ascending tie-break
        assert out[(2, "banana")].rank == 1
        assert out[(2, "cherry")].rank == 2

    def test_k_bounds_output(self, spark):
        df = _docs(spark, [(1, "a b c d e f g h")])
        assert tfidf_terms(df, k=3).count() == 3


class TestTemperatureMixture:
    def _corpus(self, spark, sizes):
        rows = []
        i = 0
        for lang, n in sizes.items():
            for _ in range(n):
                rows.append((i, lang))
                i += 1
        return spark.createDataFrame(rows, "doc_id long, lang string")

    def test_flattens_skew_within_budget(self, spark):
        sizes = {"en": 800, "de": 100, "fr": 100}
        df = self._corpus(spark, sizes)
        kept = temperature_mixture(
            df, "doc_id", "lang", alpha=0.5, budget_frac=0.5
        )
        got = {r[0]: r[1] for r in kept.groupBy("lang").count().collect()}
        # expected rates from the spec arithmetic
        denom = 0.0
        for lang in sorted(sizes):
            denom += math.sqrt(sizes[lang])
        n_tgt = math.floor(0.5 * sum(sizes.values()))
        for lang, c in sizes.items():
            rate = min(1.0, ((math.sqrt(c) / denom) * n_tgt) / c)
            # kept count concentrates around rate * c (hash-uniform)
            assert abs(got.get(lang, 0) - rate * c) < 4 * math.sqrt(c)
        # the dominant stratum is downsampled hardest
        assert got["en"] / sizes["en"] < got["de"] / sizes["de"]

    def test_membership_is_exact_integer_threshold(self, spark):
        sizes = {"en": 60, "de": 20}
        df = self._corpus(spark, sizes)
        kept = {r.doc_id for r in temperature_mixture(
            df, "doc_id", "lang", alpha=0.5, budget_frac=0.6
        ).collect()}
        # recompute every decision independently from the spec
        denom = math.sqrt(sizes["de"]) + math.sqrt(sizes["en"])
        n_tgt = math.floor(0.6 * 80)
        u = {
            r.doc_id: r.u
            for r in df.select(
                "doc_id", hash_u60("doc_id", "mixture").alias("u")
            ).collect()
        }
        expect = set()
        for r in df.collect():
            c = sizes[r.lang]
            rate = min(1.0, ((math.sqrt(c) / denom) * n_tgt) / c)
            if u[r.doc_id] < math.floor(rate * U60):
                expect.add(r.doc_id)
        assert kept == expect

    def test_rejects_bad_budget(self, spark):
        df = self._corpus(spark, {"en": 5})
        with pytest.raises(ValueError, match="budget_frac"):
            temperature_mixture(df, "doc_id", "lang", budget_frac=0.0)
