"""boilerplate_prefixes must equal a Counter-based replay of the
prefix concentration report (pinned argmax, one-fold entropy
identity) on crafted and randomized corpora, and separate a
templated slice from an organic one."""

import math
import random
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from chronoxtract_spark.operators.corpus_stats import boilerplate_prefixes


def _r6(x):
    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _prefix(text, k=8):
    toks = [t for t in " ".join(text.strip().lower().split()).split(" ") if t]
    return " ".join(toks[:k])


def _ref(docs, k=8):
    cnt = Counter(_prefix(d, k) for d in docs)
    n = len(docs)
    top_p, top_c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    clnc = 0.0
    for p in sorted(cnt):
        c = cnt[p]
        clnc += float(c) * math.log(float(c))
    return {
        "n_docs": n,
        "n_prefixes": len(cnt),
        "top_prefix": top_p,
        "top_share": _r6(float(top_c) / float(n)),
        "prefix_entropy": _r6(math.log(float(n)) - clnc / float(n)),
    }


def _df(spark, corpus, repartition=None):
    rows = [(sl, d) for sl, docs in corpus.items() for d in docs]
    df = spark.createDataFrame(rows, "source string, text string")
    return df.repartition(repartition) if repartition else df


def _check(spark, corpus, repartition=None):
    got = {
        r.source: r.asDict()
        for r in boilerplate_prefixes(_df(spark, corpus, repartition)).collect()
    }
    for sl, docs in corpus.items():
        want = _ref(docs)
        for col, exp in want.items():
            assert got[sl][col] == exp, (sl, col, got[sl][col], exp)


def test_crafted(spark):
    _check(spark, {
        # one template: entropy exactly 0, share 1
        "tmpl": ["dear user thank you for your order today x" + str(i)
                 for i in range(10)],
        # all unique openings: entropy exactly ln n
        "uniq": [f"doc number {i} starts differently here now ok"
                 for i in range(8)],
        # short docs (< 8 tokens) use the whole doc as prefix
        "short": ["a b", "a b", "c"],
        # whitespace mess normalizes into the same prefix
        "ws": ["  Hello   World  foo", "hello world foo"],
        # empty docs fall into the '' prefix bucket
        "empty": ["", "   ", "x y z"],
        "single": ["only one document here"],
    })


def test_verdict_separation(spark):
    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(200)]
    organic = [" ".join(rng.choice(vocab) for _ in range(20))
               for _ in range(300)]
    template = ["subscribe to our newsletter for more great deals "
                + " ".join(rng.choice(vocab) for _ in range(12))
                for _ in range(300)]
    got = {r.source: r for r in boilerplate_prefixes(_df(spark, {
        "organic": organic, "template": template,
    })).collect()}
    assert got["template"].top_share == 1.0
    assert got["template"].prefix_entropy == 0.0
    assert got["organic"].top_share < 0.05
    assert got["organic"].prefix_entropy > 5.0


def test_prefix_tokens_parameter(spark):
    docs = ["a b c d", "a b x y", "a b c z"]
    got2 = boilerplate_prefixes(
        _df(spark, {"k": docs}), prefix_tokens=2
    ).collect()[0]
    assert got2.n_prefixes == 1 and got2.top_prefix == "a b"
    got3 = boilerplate_prefixes(
        _df(spark, {"k": docs}), prefix_tokens=3
    ).collect()[0]
    assert got3.n_prefixes == 2 and got3.top_prefix == "a b c"
    assert got3.top_share == _r6(2.0 / 3.0)


def test_randomized_matches_replay(spark):
    rng = random.Random(20260819)
    vocab = [f"t{i}" for i in range(40)]
    corpus = {}
    for si in range(10):
        docs = []
        n_templates = rng.randrange(1, 5)
        templates = [
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 12)))
            for _ in range(n_templates)
        ]
        for _ in range(rng.randrange(1, 60)):
            body = " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 15)))
            docs.append((rng.choice(templates) + " " + body).strip())
        corpus[f"s{si}"] = docs
    _check(spark, corpus)


def test_partitioning_invariance(spark):
    rng = random.Random(7)
    vocab = [f"v{i}" for i in range(30)]
    docs = [" ".join(rng.choice(vocab) for _ in range(10)) for _ in range(200)]
    _check(spark, {"k": docs}, repartition=7)
