"""embedding_audit must equal an exact replay of the
quantize-then-integer pipeline (left-fold norm, HALF_UP micro-unit
rounding, arbitrary-precision sums) on crafted and randomized
corpora, and the cohesion identity must agree with the brute-force
mean pairwise dot of the same quantized vectors."""

import math
import random
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

from chronoxtract_spark.operators.similarity import embedding_audit

Q = 10**6


def _r6(x):
    return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def _quant(vec):
    acc = 0.0
    for x in vec:
        acc += x * x
    if acc <= 0:
        return None
    nrm = math.sqrt(acc)
    return [
        int(Decimal(repr(x / nrm * float(Q))).quantize(
            Decimal(1), ROUND_HALF_UP))
        for x in vec
    ]


def _ref(corpus):
    """corpus: {label: [vec, ...]} -> expected rows dict."""
    qs = {
        l: [q for q in (map(_quant, vecs)) if q is not None]
        for l, vecs in corpus.items()
    }
    qs = {l: v for l, v in qs.items() if v}
    sums = {l: [sum(col) for col in zip(*v)] for l, v in qs.items()}
    out = {}
    for l, vecs in qs.items():
        n = len(vecs)
        ssq = sum(s * s for s in sums[l])
        selfsum = sum(sum(y * y for y in q) for q in vecs)
        cohesion = (
            _r6(float(ssq - selfsum) / (float(n * (n - 1)) * float(Q) * float(Q)))
            if n >= 2 else None
        )
        best = None
        for lb, sb in sums.items():
            if lb == l or ssq == 0 or sum(s * s for s in sb) == 0:
                continue
            ssab = sum(a * b for a, b in zip(sums[l], sb))
            ssqb = sum(s * s for s in sb)
            cos = float(ssab) / math.sqrt(float(ssq) * float(ssqb))
            key = (-cos, lb)
            if best is None or key < best[0]:
                best = (key, lb, cos)
        out[l] = {
            "n_vecs": n,
            "centroid_norm": _r6(math.sqrt(float(ssq)) / (float(n) * float(Q))),
            "cohesion": cohesion,
            "nearest_label": best[1] if best else None,
            "nearest_cos": _r6(best[2]) if best else None,
        }
    return out


def _df(spark, corpus):
    rows = [
        (int(l), [float(x) for x in v])
        for l, vecs in corpus.items()
        for v in vecs
    ]
    return spark.createDataFrame(rows, "label int, embedding array<float>")


def _check(spark, corpus):
    got = {r.label: r.asDict() for r in embedding_audit(_df(spark, corpus)).collect()}
    want = _ref({l: [list(np.asarray(v, dtype=np.float32).astype(float))
                     for v in vecs]
                 for l, vecs in corpus.items()})
    assert set(got) == set(want), (sorted(got), sorted(want))
    for l, cols in want.items():
        for col, exp in cols.items():
            assert got[l][col] == exp, (l, col, got[l][col], exp)


def test_crafted(spark):
    _check(spark, {
        # identical members: cohesion 1, unit centroid
        0: [[1.0, 0.0, 0.0, 0.0]] * 4,
        # antipodal pair: cohesion -1, centroid collapses to 0
        1: [[0.0, 2.0, 0.0, 0.0], [0.0, -2.0, 0.0, 0.0]],
        # orthogonal to label 0's axis
        2: [[0.0, 0.0, 3.0, 0.1], [0.0, 0.0, 3.0, -0.1]],
        # single member: null cohesion, still ranked for nearest
        3: [[0.5, 0.5, 0.5, 0.5]],
        # zero vector excluded, survivor carries the label
        4: [[0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 0.0, 0.0]],
    })


def test_semantics(spark):
    got = {r.label: r for r in embedding_audit(_df(spark, {
        0: [[1.0, 0.0], [1.0, 0.0], [1.0, 0.0]],
        1: [[0.0, 1.0], [0.0, 1.0]],
        2: [[1.0, 1.0], [1.0, 1.0]],
    })).collect()}
    assert got[0].cohesion == 1.0 and got[0].centroid_norm == 1.0
    # label 2 sits at 45 degrees: nearest to both axes at cos ~ 0.707
    assert got[0].nearest_label == 2
    assert abs(got[0].nearest_cos - math.sqrt(0.5)) < 1e-6
    # axes are orthogonal: 0's confuser is 2, never 1
    assert got[1].nearest_label == 2


def test_single_label_corpus(spark):
    got = embedding_audit(_df(spark, {7: [[1.0, 2.0], [2.0, 1.0]]})).collect()
    assert len(got) == 1
    assert got[0].nearest_label is None and got[0].nearest_cos is None
    assert got[0].cohesion is not None


def test_all_zero_label_dropped(spark):
    got = embedding_audit(_df(spark, {
        0: [[0.0, 0.0]],
        1: [[1.0, 0.0], [0.9, 0.1]],
    })).collect()
    assert {r.label for r in got} == {1}


def test_randomized_matches_replay(spark):
    rng = np.random.default_rng(20260818)
    corpus = {}
    for l in range(8):
        center = rng.normal(size=16)
        n = int(rng.integers(1, 40))
        corpus[l] = [
            list(center + rng.normal(scale=0.3, size=16)) for _ in range(n)
        ]
    _check(spark, corpus)


def test_cohesion_is_mean_pairwise_dot(spark):
    """The sum-vector identity must equal the brute-force pairwise
    mean on the same quantized vectors."""
    rng = np.random.default_rng(9)
    vecs = [list(rng.normal(size=8)) for _ in range(12)]
    got = embedding_audit(_df(spark, {0: vecs})).collect()[0]
    qs = [_quant(list(np.asarray(v, dtype=np.float32).astype(float)))
          for v in vecs]
    dots = [
        sum(a * b for a, b in zip(qs[i], qs[j]))
        for i in range(len(qs)) for j in range(len(qs)) if i != j
    ]
    brute = float(sum(dots)) / (float(len(dots)) * float(Q) * float(Q))
    assert got.cohesion == _r6(brute)
