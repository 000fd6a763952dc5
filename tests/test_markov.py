"""transition_entropy must equal a plain-Python replay of the
first-order Markov entropy battery on crafted and randomized
categorical sequences."""

import math
import random
from collections import Counter

from chronoxtract_spark.operators.markov import transition_entropy


def _ref(states):
    pairs = list(zip(states, states[1:]))
    if not pairs:
        return None
    n = len(pairs)
    cij = Counter(pairs)
    ci = Counter(a for a, _ in pairs)
    sum_cond = 0.0
    for (a, b), c in sorted(cij.items()):
        sum_cond += c * math.log(c / ci[a])
    sum_marg = 0.0
    for a, c in sorted(ci.items()):
        sum_marg += c * math.log(c / n)
    hc, hm = -sum_cond / n, -sum_marg / n
    return {
        "n_transitions": n,
        "n_from_states": len(ci),
        "entropy_rate_nats": hc,
        "marginal_entropy_nats": hm,
        "predictability_gain_nats": hm - hc,
    }


def _run(spark, series):
    rows = [
        (k, i, i * 7, st)
        for k, sts in series.items()
        for i, st in enumerate(sts)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts long, role string"
    )
    got = transition_entropy(df, round_digits=None).collect()
    return {r.conv_id: r.asDict() for r in got}


def _check(spark, series):
    got = _run(spark, series)
    expected_keys = {k for k, sts in series.items() if len(sts) >= 2}
    assert set(got) == expected_keys
    for k in expected_keys:
        want = _ref(series[k])
        g = got[k]
        for col, exp in want.items():
            assert math.isclose(g[col], exp, rel_tol=1e-12, abs_tol=1e-12), (
                k, col, g[col], exp)


def test_crafted(spark):
    series = {
        # deterministic alternation: rate 0, full gain
        "cycle": list("ABABABABAB"),
        # constant: every entropy 0
        "const": list("AAAAAA"),
        # one transition
        "pair": list("AB"),
        # single event: no transitions -> absent from output
        "lone": list("A"),
        # mixed structure
        "mix": list("AABBAACABCA"),
    }
    _check(spark, series)
    got = _run(spark, series)
    assert got["cycle"]["entropy_rate_nats"] == 0.0
    assert math.isclose(
        got["cycle"]["predictability_gain_nats"],
        got["cycle"]["marginal_entropy_nats"], rel_tol=1e-12)
    assert got["const"]["marginal_entropy_nats"] == 0.0
    assert got["pair"]["n_transitions"] == 1


def test_randomized(spark):
    rng = random.Random(20260818)
    series = {}
    for ki in range(25):
        alpha = "ABCDE"[: rng.randrange(1, 6)]
        series[f"u{ki}"] = [
            rng.choice(alpha) for _ in range(rng.randrange(2, 120))
        ]
    _check(spark, series)


def test_iid_gain_near_zero(spark):
    rng = random.Random(5)
    seq = [rng.choice("ABCD") for _ in range(5000)]
    got = _run(spark, {"k": seq})
    # empirical gain of an i.i.d. stream concentrates near
    # (|S|-1)^2 / 2N nats (chi-square/G-test limit) — tiny
    assert 0 <= got["k"]["predictability_gain_nats"] < 0.01
    assert got["k"]["marginal_entropy_nats"] > 1.3  # ~ln(4)
