"""lexical_stats must equal a Counter-based replay of the exact
count-distribution moments on crafted and randomized corpora, and
separate organic text from a template mill."""

import random
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from chronoxtract_spark.operators.corpus_stats import lexical_stats


def _r6(x):
    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _tokens(text):
    return [t for t in " ".join(text.strip().lower().split()).split(" ") if t]


def _ref(docs):
    cnt = Counter(t for d in docs for t in _tokens(d))
    if not cnt:
        return None
    n = sum(cnt.values())
    v = len(cnt)
    hapax = sum(1 for c in cnt.values() if c == 1)
    s2 = sum(c * c for c in cnt.values())
    rep = sum(c * (c - 1) for c in cnt.values())
    return {
        "n_tokens": n,
        "n_types": v,
        "ttr": _r6(v / n),
        "hapax_share": _r6(hapax / v),
        "simpson": _r6(rep / (n * (n - 1))) if n >= 2 else None,
        "yule_k": _r6(10000.0 * float(s2 - n) / float(n * n)),
    }


def _df(spark, corpus, repartition=None):
    rows = [(sl, d) for sl, docs in corpus.items() for d in docs]
    df = spark.createDataFrame(rows, "source string, text string")
    return df.repartition(repartition) if repartition else df


def _check(spark, corpus, repartition=None):
    got = {r.source: r.asDict()
           for r in lexical_stats(_df(spark, corpus, repartition)).collect()}
    for sl, docs in corpus.items():
        want = _ref(docs)
        if want is None:
            assert sl not in got, got.get(sl)
            continue
        for col, exp in want.items():
            assert got[sl][col] == exp, (sl, col, got[sl][col], exp)


def test_crafted(spark):
    _check(spark, {
        # all-distinct: ttr 1, hapax 1, simpson exactly 0, yule 0
        "uniq": ["alpha beta gamma", "delta epsilon"],
        # one type repeated: ttr -> 0, simpson exactly 1
        "mono": ["spam spam spam spam spam"],
        # single token: simpson null (n < 2)
        "one": ["hello"],
        # whitespace mess and case fold into shared normalization
        "ws": ["  The THE the ", "the"],
        # empty slice: no row
        "empty": ["", "  "],
    })


def test_separation(spark):
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(5000)]
    organic = [" ".join(rng.choice(vocab) for _ in range(50))
               for _ in range(100)]
    mill = ["click here to win a prize now " * 8 for _ in range(100)]
    got = {r.source: r for r in lexical_stats(_df(spark, {
        "organic": organic, "mill": mill,
    })).collect()}
    assert got["organic"].ttr > 0.4
    assert got["organic"].hapax_share > 0.4
    assert got["mill"].n_types == 7
    assert got["mill"].ttr < 0.01
    assert got["mill"].simpson > 0.1
    assert got["mill"].yule_k > got["organic"].yule_k * 50


def test_exact_closed_forms(spark):
    """mono slice: simpson = 1 exactly; uniq slice: simpson = 0."""
    got = {r.source: r for r in lexical_stats(_df(spark, {
        "mono": ["x x x x"], "uniq": ["a b c d"],
    })).collect()}
    assert got["mono"].simpson == 1.0
    assert got["uniq"].simpson == 0.0
    assert got["uniq"].yule_k == _r6(10000.0 * 0.0)  # s2 = n


def test_randomized_matches_replay(spark):
    rng = random.Random(20260819)
    corpus = {}
    for si in range(12):
        zipfy = [f"t{min(int(1.0 / max(rng.random(), 1e-9)), 200)}"
                 for _ in range(rng.randrange(1, 800))]
        docs, i = [], 0
        while i < len(zipfy):
            step = rng.randrange(1, 40)
            docs.append(" ".join(zipfy[i:i + step]))
            i += step
        corpus[f"s{si}"] = docs
    _check(spark, corpus)


def test_partitioning_invariance(spark):
    rng = random.Random(7)
    vocab = [f"v{i}" for i in range(80)]
    docs = [" ".join(rng.choice(vocab) for _ in range(25))
            for _ in range(150)]
    _check(spark, {"k": docs}, repartition=7)
