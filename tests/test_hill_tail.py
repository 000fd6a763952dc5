"""hill_tail must equal a plain-Python replay of the rank-pinned
log-sum fold on crafted and randomized corpora, and recover the tail
index of exact Pareto samples within the estimator's own error."""

import math
import random
from decimal import ROUND_HALF_UP, Decimal

from chronoxtract_spark.operators.corpus_stats import hill_tail


def _r6(x):
    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _ref(sizes, tail_frac=10):
    xs = sorted(
        [(x, i) for i, x in enumerate(sizes) if x >= 1],
        key=lambda p: (-p[0], p[1]),
    )
    n = len(xs)
    if n == 0:
        return None
    k = min(max(1, n // tail_frac), n - 1)
    out = {"n_docs": n, "k_tail": k,
           "x_threshold": xs[k][0] if k < n else None,
           "hill_alpha": None}
    if n < 2:
        return out
    acc = 0.0
    for x, _ in xs[:k]:
        acc += math.log(float(x))
    denom = acc - float(k) * math.log(float(xs[k][0]))
    if denom > 0.0:
        out["hill_alpha"] = _r6(float(k) / denom)
    return out


def _df(spark, corpus, repartition=None):
    rows = [
        (sl, i, int(x))
        for sl, sizes in corpus.items()
        for i, x in enumerate(sizes)
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_chars long")
    return df.repartition(repartition) if repartition else df


def _check(spark, corpus, repartition=None):
    got = {r.source: r.asDict()
           for r in hill_tail(_df(spark, corpus, repartition)).collect()}
    for sl, sizes in corpus.items():
        want = _ref(sizes)
        if want is None:
            assert sl not in got, got.get(sl)
            continue
        for col, exp in want.items():
            assert got[sl][col] == exp, (sl, col, got[sl][col], exp)


def test_crafted(spark):
    _check(spark, {
        # constant sizes: zero log sum -> null alpha
        "const": [500] * 40,
        # exact powers of 2 tail: alpha = k / (k terms of ln 2 sums)
        "dyadic": [2 ** i for i in range(1, 13)],
        "single": [123],
        "pair": [10, 1000],
        # non-positive sizes excluded before anything
        "zeros": [0, 0, 7, 70, 700],
        "allzero": [0, 0],
        # heavy ties at the threshold
        "ties": [100] * 5 + [200] * 5 + [300] * 5,
    })


def test_pareto_recovery(spark):
    """Hill on an exact inverse-CDF Pareto sample must land near the
    true alpha for both a heavy and a light tail."""
    rng = random.Random(42)
    corpus = {}
    for name, alpha in (("heavy", 1.2), ("light", 3.0)):
        corpus[name] = [
            max(1, int(50.0 * (1.0 - rng.random()) ** (-1.0 / alpha)))
            for _ in range(20000)
        ]
    got = {r.source: r for r in hill_tail(_df(spark, corpus)).collect()}
    assert abs(got["heavy"].hill_alpha - 1.2) < 0.15, got["heavy"]
    assert abs(got["light"].hill_alpha - 3.0) < 0.4, got["light"]
    assert got["heavy"].hill_alpha < 2.0 < got["light"].hill_alpha


def test_tail_frac_parameter(spark):
    rng = random.Random(3)
    sizes = [rng.randrange(1, 10**6) for _ in range(500)]
    got = hill_tail(_df(spark, {"k": sizes}), tail_frac=4).collect()[0]
    want = _ref(sizes, tail_frac=4)
    assert got.k_tail == want["k_tail"] == 125
    assert got.hill_alpha == want["hill_alpha"]


def test_randomized_matches_replay(spark):
    rng = random.Random(20260819)
    corpus = {}
    for si in range(20):
        n = rng.randrange(1, 400)
        corpus[f"s{si}"] = [
            int(20.0 * (1.0 - rng.random()) ** (-1.0 / 1.5))
            if rng.random() < 0.9 else rng.randrange(0, 3)
            for _ in range(n)
        ]
    _check(spark, corpus)


def test_partitioning_invariance(spark):
    rng = random.Random(7)
    _check(
        spark,
        {"k": [rng.randrange(1, 10**5) for _ in range(600)]},
        repartition=7,
    )
