"""mix_drift must equal an exact arbitrary-precision replay of the
cleared chi-square cell terms on crafted and randomized streams, and
land the effect-size verdicts: an unchanged mix none, a full category
swap strong."""

import math
import random
from decimal import ROUND_HALF_UP, Decimal

from chronoxtract_spark.operators.drift import mix_drift


def _r6(x):
    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _ref(cats):
    n = len(cats)
    half = n // 2
    ref, cur = cats[:half], cats[half:]
    c_ref, c_cur = len(ref), len(cur)
    types = sorted(set(cats))
    out = {"n": n, "n_cats": len(types), "chi2": None,
           "cramers_v": None, "verdict": None}
    if c_ref == 0 or c_cur == 0 or len(types) < 2:
        return out
    chi2 = 0.0
    for c in types:
        o_ref = sum(1 for x in ref if x == c)
        o_cur = sum(1 for x in cur if x == c)
        r = o_ref + o_cur
        for o, ch in ((o_ref, c_ref), (o_cur, c_cur)):
            num = n * o - r * ch
            chi2 += float(num * num) / float(n * r * ch)
    v = math.sqrt(chi2 / float(n))
    out.update(
        chi2=_r6(chi2),
        cramers_v=_r6(v),
        verdict="none" if v < 0.1 else "weak" if v < 0.3 else "strong",
    )
    return out


def _df(spark, series, repartition=None):
    rows = [
        (k, i, i, c)
        for k, cats in series.items()
        for i, c in enumerate(cats)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, event_type string"
    )
    return df.repartition(repartition) if repartition else df


def _check(spark, series, repartition=None):
    got = {r.conv_id: r.asDict()
           for r in mix_drift(_df(spark, series, repartition)).collect()}
    for k, cats in series.items():
        want = _ref(cats)
        for col, exp in want.items():
            assert got[k][col] == exp, (k, col, got[k][col], exp)


def test_crafted(spark):
    _check(spark, {
        # identical halves: chi2 exactly 0
        "same": ["a", "b", "c"] * 10 + ["a", "b", "c"] * 10,
        # complete category swap across the split
        "swap": ["a"] * 20 + ["b"] * 20,
        # single category: no test
        "mono": ["x"] * 15,
        # single event: empty reference half
        "single": ["a"],
        # category present in one half only (zero cell still counted)
        "lonely": ["a", "a", "b", "a", "a", "a"],
        # odd length: late half one longer
        "odd": ["a", "b", "a", "b", "b"],
    })


def test_verdicts(spark):
    rng = random.Random(13)
    stable = [rng.choice("abcd") for _ in range(2000)]
    swapped = (["a"] * 500 + ["b"] * 500) + (["c"] * 500 + ["d"] * 500)
    tilt = ([rng.choice("aab") for _ in range(1000)]
            + [rng.choice("abb") for _ in range(1000)])
    got = {r.conv_id: r for r in mix_drift(_df(spark, {
        "stable": stable, "swap": swapped, "tilt": tilt,
    })).collect()}
    assert got["stable"].verdict == "none", got["stable"]
    assert got["swap"].verdict == "strong", got["swap"]
    assert got["swap"].cramers_v > 0.9
    assert got["tilt"].verdict in ("weak", "strong"), got["tilt"]
    assert got["stable"].cramers_v < got["tilt"].cramers_v


def test_chi2_exact_zero_on_identical_halves(spark):
    got = mix_drift(_df(spark, {"k": ["x", "y"] * 8})).collect()[0]
    assert got.chi2 == 0.0 and got.cramers_v == 0.0
    assert got.verdict == "none"


def test_randomized_matches_replay(spark):
    rng = random.Random(20260819)
    series = {}
    for ki in range(25):
        n = rng.randrange(1, 250)
        k_cats = rng.randrange(1, 6)
        alphabet = "abcdef"[:k_cats]
        shift = rng.random() < 0.4
        cats = []
        for j in range(n):
            if shift and j >= n // 2:
                cats.append(rng.choice(alphabet[: max(1, k_cats // 2)]))
            else:
                cats.append(rng.choice(alphabet))
        series[f"u{ki}"] = cats
    _check(spark, series)


def test_partitioning_invariance(spark):
    rng = random.Random(7)
    cats = [rng.choice("abc") for _ in range(400)]
    _check(spark, {"k": cats}, repartition=7)
