"""vocab_overlap must equal a Counter-based replay of the pinned
top-k set algebra (count DESC, term ASC) on crafted and randomized
corpora, including the zero-overlap row, sub-k slices, and the shared
whitespace normalization."""

import random
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from chronoxtract_spark.operators.divergence import vocab_overlap


def _r6(x):
    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _tokens(text):
    return [t for t in " ".join(text.strip().lower().split()).split(" ") if t]


def _ref(corpus, top_k):
    tops = {}
    for sl, docs in corpus.items():
        cnt = Counter(t for d in docs for t in _tokens(d))
        if not cnt:
            continue
        ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        tops[sl] = {t for t, _ in ordered[:top_k]}
    out = {}
    slices = sorted(tops)
    for i, a in enumerate(slices):
        for b in slices[i + 1:]:
            inter = len(tops[a] & tops[b])
            ka, kb = len(tops[a]), len(tops[b])
            out[(a, b)] = {
                "k_a": ka, "k_b": kb, "n_common": inter,
                "jaccard": _r6(inter / float(ka + kb - inter)),
                "overlap": _r6(inter / float(min(ka, kb))),
            }
    return out


def _df(spark, corpus, repartition=None):
    rows = [(sl, d) for sl, docs in corpus.items() for d in docs]
    df = spark.createDataFrame(rows, "source string, text string")
    return df.repartition(repartition) if repartition else df


def _check(spark, corpus, top_k=200, repartition=None):
    got = {
        (r.slice_a, r.slice_b): r.asDict()
        for r in vocab_overlap(
            _df(spark, corpus, repartition), top_k=top_k
        ).collect()
    }
    want = _ref(corpus, top_k)
    assert set(got) == set(want), (sorted(got), sorted(want))
    for pair, cols in want.items():
        for col, exp in cols.items():
            assert got[pair][col] == exp, (pair, col, got[pair][col], exp)


def test_crafted(spark):
    _check(spark, {
        "a": ["the cat sat", "the dog sat", "THE  Cat   naps"],
        "b": ["the dog ran", "a dog barked"],
        # completely disjoint vocabulary: zero row must still appear
        "c": ["zebra quagga okapi", "zebra zebra"],
        # empty/whitespace docs: slice drops entirely
        "d": ["", "   "],
        # sub-top_k slice
        "e": ["one two"],
    }, top_k=4)


def test_identical_slices(spark):
    docs = ["alpha beta gamma delta", "alpha beta"]
    got = vocab_overlap(_df(spark, {"x": docs, "y": list(docs)})).collect()
    assert len(got) == 1
    r = got[0]
    assert r.jaccard == 1.0 and r.overlap == 1.0
    assert r.n_common == r.k_a == r.k_b == 4


def test_topk_tie_pinning(spark):
    """At equal counts the k cut must take terms in ascending order
    in BOTH the operator and the replay."""
    corpus = {
        "x": ["b a c d e"],     # all counts 1 -> top-3 is {a, b, c}
        "y": ["c d e"],         # top-3 is {c, d, e}
    }
    got = vocab_overlap(_df(spark, corpus), top_k=3).collect()[0]
    assert got.n_common == 1  # only 'c'
    _check(spark, corpus, top_k=3)


def test_count_beats_alphabet(spark):
    corpus = {"x": ["zz zz zz aa"], "y": ["zz mm zz"]}
    got = vocab_overlap(_df(spark, corpus), top_k=1).collect()[0]
    assert got.n_common == 1  # zz outranks aa despite sorting later
    _check(spark, corpus, top_k=1)


def test_randomized_matches_replay(spark):
    rng = random.Random(20260819)
    vocab = [f"w{i}" for i in range(120)]
    corpus = {}
    for si in range(8):
        docs = []
        for _ in range(rng.randrange(1, 25)):
            n = rng.randrange(1, 30)
            docs.append(" ".join(rng.choice(vocab) for _ in range(n)))
        corpus[f"s{si}"] = docs
    _check(spark, corpus, top_k=30)
    _check(spark, corpus, top_k=500)  # k above every vocab: full sets


def test_partitioning_invariance(spark):
    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(60)]
    corpus = {
        sl: [" ".join(rng.choice(vocab) for _ in range(20))
             for _ in range(30)]
        for sl in ("p", "q", "r")
    }
    _check(spark, corpus, top_k=25, repartition=7)
