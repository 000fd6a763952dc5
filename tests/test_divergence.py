"""slice_divergence must equal a plain-Python replay of the
closed-vocabulary JS/TV drift computation, including the <other>
lumping and top-k tie-breaks."""

import math
import random
from collections import Counter

from chronoxtract_spark.operators.divergence import slice_divergence


def _ref(docs, vocab_k):
    """docs: [(slice, text)]. Returns {slice: (jsd, tv, n_l, n_vocab)}."""
    per = {}
    glob = Counter()
    for sl, text in docs:
        toks = [t for t in " ".join(text.lower().split()).split(" ") if t]
        per.setdefault(sl, Counter()).update(toks)
        glob.update(toks)
    vocab = {
        t for t, _ in sorted(glob.items(), key=lambda kv: (-kv[1], kv[0]))[
            :vocab_k]
    }

    def lump(cnt):
        out = Counter()
        for t, c in cnt.items():
            out[t if t in vocab else "< other >"] += c
        return out

    per2 = {sl: lump(c) for sl, c in per.items()}
    glob2 = lump(glob)
    n_tot = sum(glob2.values())
    out = {}
    for sl, cnt in per2.items():
        n_l = sum(cnt.values())
        n_r = n_tot - n_l
        js = tv = 0.0
        for t in sorted(glob2):
            c = cnt.get(t, 0)
            ct = glob2[t]
            p = c / n_l
            q = (ct - c) / n_r if n_r else None
            if q is None:
                js = tv = None
                break
            m = (p + q) / 2.0
            a = p * math.log(p / m) if c > 0 else 0.0
            b = q * math.log(q / m) if ct > c else 0.0
            js += 0.5 * (a + b)
            tv += 0.5 * abs(p - q)
        out[sl] = (js, tv, n_l, len(glob2))
    return out


def _run(spark, docs, vocab_k):
    df = spark.createDataFrame(docs, "lang string, text string")
    got = slice_divergence(df, vocab_k=vocab_k, round_digits=None).collect()
    return {r.lang: r.asDict() for r in got}


def _check(spark, docs, vocab_k):
    got = _run(spark, docs, vocab_k)
    want = _ref(docs, vocab_k)
    assert set(got) == set(want)
    for sl, (js, tv, n_l, nv) in want.items():
        g = got[sl]
        assert g["n_tokens"] == n_l and g["n_vocab"] == nv, (sl, g)
        if js is None:
            assert g["jsd_nats"] is None and g["tv_dist"] is None
        else:
            assert math.isclose(g["jsd_nats"], js, rel_tol=1e-12, abs_tol=1e-15)
            assert math.isclose(g["tv_dist"], tv, rel_tol=1e-12, abs_tol=1e-15)


def test_disjoint_and_identical(spark):
    docs = [
        ("aa", "x x y z"), ("aa", "y x"),
        ("bb", "p q r p"), ("bb", "q p"),
        ("cc", "x x y z y x"),  # same distribution shape vs aa? not quite
    ]
    _check(spark, docs, vocab_k=100)
    got = _run(spark, docs, 100)
    # aa and bb share no terms with each other, but cc overlaps aa;
    # bb's rest is fully disjoint -> JS = ln 2, TV = 1
    assert math.isclose(got["bb"]["jsd_nats"], math.log(2), rel_tol=1e-12)
    assert math.isclose(got["bb"]["tv_dist"], 1.0, rel_tol=1e-12)


def test_single_slice_undefined(spark):
    got = _run(spark, [("only", "a b c a")], 10)
    assert got["only"]["jsd_nats"] is None
    assert got["only"]["tv_dist"] is None


def test_other_lumping(spark):
    # vocab_k=2 keeps the two globally-dominant terms; everything else
    # lumps into <other> (n_vocab == 3)
    docs = [
        ("aa", "top top top second rare1 rare2"),
        ("bb", "top second second rare3"),
    ]
    _check(spark, docs, vocab_k=2)
    got = _run(spark, docs, 2)
    assert got["aa"]["n_vocab"] == 3


def test_randomized(spark):
    rng = random.Random(20260818)
    words = [f"w{i}" for i in range(60)]
    docs = []
    for sl in ("de", "en", "fr", "pt"):
        bias = rng.randrange(0, 40)
        for _ in range(rng.randrange(3, 30)):
            n = rng.randrange(1, 50)
            docs.append(
                (sl, " ".join(
                    words[(bias + rng.randrange(0, 25)) % 60]
                    for _ in range(n)))
            )
    for k in (10, 1000):
        _check(spark, docs, vocab_k=k)
