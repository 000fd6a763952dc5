"""charclass_profile must equal a plain-Python replay of the exact
class counts and the pinned entropy chain on crafted and randomized
corpora, and separate prose / base64 / code-ish / non-ASCII slices."""

import math
import random
import string
from decimal import ROUND_HALF_UP, Decimal

from chronoxtract_spark.operators.text import charclass_profile

LETTER = set(string.ascii_letters)
DIGIT = set(string.digits)
SPACE = set(" \t\n\r")
PUNCT = {c for c in map(chr, range(0x21, 0x7F))
         if c not in LETTER and c not in DIGIT}
NAMES = ("letter", "digit", "space", "punct", "other")


def _r6(x):
    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _classify(ch):
    if ch in LETTER:
        return "letter"
    if ch in DIGIT:
        return "digit"
    if ch in SPACE:
        return "space"
    if ch in PUNCT:
        return "punct"
    return "other"


def _ref(docs):
    counts = dict.fromkeys(NAMES, 0)
    n = 0
    for d in docs:
        for ch in d:
            counts[_classify(ch)] += 1
            n += 1
    out = {"n_chars": n, "class_entropy": None}
    for name in NAMES:
        out[f"{name}_share"] = _r6(counts[name] / n) if n > 0 else None
    if n > 0:
        ent = 0.0
        for name in NAMES:  # pinned class order, zero classes skip
            c = counts[name]
            if c > 0:
                ent += (c / n) * math.log(c / n)
        out["class_entropy"] = _r6(-ent)
    return out


def _df(spark, corpus, repartition=None):
    rows = [(sl, d) for sl, docs in corpus.items() for d in docs]
    df = spark.createDataFrame(rows, "source string, text string")
    return df.repartition(repartition) if repartition else df


def _check(spark, corpus, repartition=None):
    got = {
        r.source: r.asDict()
        for r in charclass_profile(_df(spark, corpus, repartition)).collect()
    }
    for sl, docs in corpus.items():
        want = _ref(docs)
        for col, exp in want.items():
            assert got[sl][col] == exp, (sl, col, got[sl][col], exp)


def test_crafted(spark):
    _check(spark, {
        "prose": ["The cat sat on the mat.", "A dog, barking twice!"],
        "b64": ["aGVsbG8gd29ybGQhIQ==", "QmFzZTY0IQ=="],
        "digits": ["123456 7890", "000"],
        # all classes degenerate to one: entropy exactly 0
        "mono": ["aaaaaa", "bbb"],
        # empty slice text: all-null shares
        "empty": ["", ""],
        # non-ASCII lands in 'other' by design
        "cjk": ["你好世界", "héllo wörld"],
        # tabs/newlines/CR in the explicit space class
        "ws": ["a\tb\nc\rd e"],
    })


def test_separation(spark):
    rng = random.Random(9)
    b64alpha = string.ascii_letters + string.digits + "+/="
    corpus = {
        "prose": ["the quick brown fox jumps over the lazy dog " * 20],
        "b64": ["".join(rng.choice(b64alpha) for _ in range(800))],
        "code": ["x = (a[i] + b[j]) * {'k': v};  # 42 " * 30],
    }
    got = {r.source: r for r in charclass_profile(_df(spark, corpus)).collect()}
    assert got["prose"].letter_share > 0.75
    assert got["b64"].space_share == 0.0
    assert got["b64"].letter_share + got["b64"].digit_share > 0.9
    assert got["code"].punct_share > got["prose"].punct_share * 3
    assert got["prose"].other_share == 0.0


def test_mono_entropy_zero(spark):
    got = charclass_profile(_df(spark, {"m": ["abcdef"]})).collect()[0]
    assert got.class_entropy == 0.0 and got.letter_share == 1.0


def test_randomized_matches_replay(spark):
    rng = random.Random(20260819)
    pool = (string.ascii_letters + string.digits + string.punctuation
            + " \t\n\r" + "日本語αβ€")
    corpus = {}
    for si in range(12):
        docs = ["".join(rng.choice(pool)
                        for _ in range(rng.randrange(0, 200)))
                for _ in range(rng.randrange(1, 20))]
        corpus[f"s{si}"] = docs
    _check(spark, corpus)


def test_partitioning_invariance(spark):
    rng = random.Random(7)
    docs = ["".join(rng.choice(string.printable)
                    for _ in range(100)) for _ in range(60)]
    _check(spark, {"k": docs}, repartition=7)
