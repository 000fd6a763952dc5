"""benford_test must equal a plain-Python replay of the exact digit
counts and the pinned chi-square fold, conform on a genuinely
Benford-distributed sample, and flag fabricated/capped data."""

import math
import random
from decimal import ROUND_HALF_UP, Decimal

from chronoxtract_spark.operators.profile import (
    BENFORD_CHI2_CRIT_5PCT,
    benford_test,
)

PROBS = [math.log10(1.0 + 1.0 / d) for d in range(1, 10)]


def _r6(x):
    return float(
        Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP)
    )


def _ref(values):
    cents = [int(round(v * 100)) for v in values if v is not None]
    digits = [int(str(abs(c))[0]) for c in cents if c != 0]
    n = len(digits)
    n_exc = len(cents) - n
    out = {"n_obs": n, "n_excluded": n_exc, "d1_frac": None,
           "chi2": None, "conforms": None}
    if n == 0:
        return out
    o = [digits.count(d) for d in range(1, 10)]
    chain = None
    for i in range(9):
        e = float(n) * PROBS[i]
        term = (float(o[i]) - e) * (float(o[i]) - e) / e
        chain = term if chain is None else chain + term
    out["d1_frac"] = _r6(o[0] / float(n))
    out["chi2"] = _r6(chain)
    out["conforms"] = chain <= BENFORD_CHI2_CRIT_5PCT
    return out


def _check(spark, series):
    rows = [(k, v) for k, vals in series.items() for v in vals]
    df = spark.createDataFrame(rows, "k string, value double")
    got = {r.k: r.asDict() for r in benford_test(df, "k").collect()}
    assert set(got) == set(series)
    for k, vals in series.items():
        want = _ref(vals)
        for col, exp in want.items():
            assert got[k][col] == exp, (k, col, got[k][col], exp)


def test_crafted(spark):
    _check(spark, {
        # all zeros: everything excluded, null stats
        "zeros": [0.0] * 10,
        # all values lead with 9 (the least likely digit): hard fail
        "nines": [9.0 + i / 100.0 for i in range(60)],
        # negative values use |.|: -2xx leads with 2
        "negs": [-(2.0 + i / 100.0) for i in range(30)],
        # mixed decades: digit read from cents is scale-invariant
        "decades": [0.01, 0.1, 1.0, 10.0, 100.0, 0.02, 0.2, 2.0],
    })


def test_benford_sample_conforms(spark):
    """Log-uniform magnitudes over an INTEGER decade span follow
    Benford by construction (a fractional span does not), kept above
    1.0 so cent quantization can't warp the small-value digits —
    the verdict must be conforms=True."""
    rng = random.Random(5)
    vals = [10 ** rng.uniform(0.0, 4.0) for _ in range(3000)]
    rows = [("k", v) for v in vals]
    df = spark.createDataFrame(rows, "k string, value double")
    got = benford_test(df, "k").collect()[0]
    assert got.conforms is True
    assert abs(got.d1_frac - PROBS[0]) < 0.03


def test_capped_data_flagged(spark):
    """Values truncated at a 4.99 cap (a classic approval-threshold
    artifact) pile first digits onto 1-4 and must be flagged."""
    rng = random.Random(6)
    vals = [min(4.99, 10 ** rng.uniform(-0.5, 2.0)) for _ in range(2000)]
    rows = [("k", v) for v in vals]
    df = spark.createDataFrame(rows, "k string, value double")
    got = benford_test(df, "k").collect()[0]
    assert got.conforms is False


def test_digit_is_scale_invariant(spark):
    """Multiplying every value by 10 permutes nothing: same digits,
    same chi2 (the decimal-string digit ignores the decade)."""
    rng = random.Random(8)
    vals = [10 ** rng.uniform(0.0, 3.0) for _ in range(500)]
    a = spark.createDataFrame([("k", v) for v in vals],
                              "k string, value double")
    b = spark.createDataFrame([("k", v * 10) for v in vals],
                              "k string, value double")
    ga = benford_test(a, "k").collect()[0]
    gb = benford_test(b, "k").collect()[0]
    assert ga.chi2 == gb.chi2 and ga.d1_frac == gb.d1_frac


def test_randomized_matches_replay(spark):
    rng = random.Random(20260818)
    series = {}
    for ki in range(20):
        n = rng.randrange(1, 150)
        series[f"u{ki}"] = [
            rng.choice([0.0, rng.uniform(-500, 500)]) for _ in range(n)
        ]
    _check(spark, series)
