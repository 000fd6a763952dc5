"""haar_energy must equal a plain-Python left-fold replay of the
unnormalized Haar ladder (half-block sums folded in sample order,
d = (S_left - S_right) / 2h, energies folded in position order) on
crafted closed-form series and randomized streams — exactly, not
approximately, because every float in the operator is a sequential
fold or a fixed expression tree over folds."""

import random

from chronoxtract_spark.operators.wavelet import haar_energy

LEVELS = ((1, 1), (2, 2), (3, 4), (4, 8))


def _ref(values):
    """Left-fold replay of the documented definition."""
    out = {}
    for lvl, h in LEVELS:
        n_pairs = len(values) // (2 * h)
        if n_pairs == 0:
            continue
        details = []
        for p in range(n_pairs):
            se = sum(values[2 * p * h : (2 * p + 1) * h])  # left fold, start 0
            so = sum(values[(2 * p + 1) * h : (2 * p + 2) * h])
            details.append((se - so) / (2.0 * h))
        energy = sum(d * d for d in details)
        out[lvl] = {
            "half_width": h,
            "pair_width": 2 * h,
            "n_pairs": n_pairs,
            "energy": energy,
            "wavelet_var": energy / float(n_pairs),
        }
    tot = sum(out[lvl]["energy"] for lvl in sorted(out))
    for lvl in out:
        out[lvl]["energy_frac"] = out[lvl]["energy"] / tot if tot != 0.0 else None
    return out


def _run(spark, series):
    rows = [
        (k, i, 1000 + i, float(v))
        for k, vals in series.items()
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, ts long, value double"
    )
    got = haar_energy(df, round_digits=None).collect()
    res = {}
    for r in got:
        res.setdefault(r.event_type, {})[r.level] = r.asDict()
    return res


def _check(got_k, want_k, key):
    assert set(got_k) == set(want_k), f"{key}: levels {set(got_k)} != {set(want_k)}"
    for lvl, w in want_k.items():
        g = got_k[lvl]
        for col, wv in w.items():
            gv = g[col]
            if wv is None:
                assert gv is None, f"{key} L{lvl} {col}: {gv} != None"
            else:
                assert gv == wv, f"{key} L{lvl} {col}: {gv} != {wv}"


def test_crafted_closed_forms(spark):
    series = {
        # constant: zero detail energy at every level, fraction null
        "const": [3.5] * 32,
        # alternating +/-1: all energy at level 1 (8 pairs of d=1),
        # exact zero above
        "alt": [1.0 if i % 2 == 0 else -1.0 for i in range(16)],
        # linear ramp x_i = i: d_p = -h/2 at every level, so
        # wavelet_var = h^2/4 exactly
        "ramp": [float(i) for i in range(16)],
        # n=13 truncation: pairs 6/3/1 and NO level-4 row
        "trunc": [float(i * i % 7) for i in range(13)],
    }
    got = _run(spark, series)
    for k, vals in series.items():
        _check(got[k], _ref(vals), k)

    # closed forms, independently of the replay
    const = got["const"]
    assert all(const[l]["energy"] == 0.0 for l in const)
    assert all(const[l]["energy_frac"] is None for l in const)
    alt = got["alt"]
    assert alt[1]["energy"] == 8.0 and alt[1]["energy_frac"] == 1.0
    assert alt[2]["energy"] == 0.0 and alt[3]["energy"] == 0.0
    ramp = got["ramp"]
    for lvl, h in ((1, 1), (2, 2), (3, 4)):
        assert ramp[lvl]["wavelet_var"] == h * h / 4.0
    trunc = got["trunc"]
    assert {l: trunc[l]["n_pairs"] for l in sorted(trunc)} == {1: 6, 2: 3, 3: 1}
    assert 4 not in trunc


def test_randomized_replay(spark):
    rng = random.Random(414)
    series = {
        f"r{i}": [rng.gauss(0.0, 1.0) for _ in range(rng.randrange(5, 200))]
        for i in range(10)
    }
    # plus an edge below every pair width
    series["tiny"] = [1.0]
    got = _run(spark, series)
    assert "tiny" not in got  # no level has a complete pair
    for k, vals in series.items():
        if k == "tiny":
            continue
        _check(got[k], _ref(vals), k)


def test_order_ties_break_by_event_id(spark):
    # all rows share one timestamp: ordering must fall back to
    # event_id, so the series is [0,1,2,3] -> ramp closed form, not
    # an engine-dependent shuffle order
    rows = [("k", i, 7777, float(i)) for i in range(4)]
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, ts long, value double"
    )
    got = {
        r.level: r.asDict()
        for r in haar_energy(df, round_digits=None).collect()
    }
    assert got[1]["energy"] == 0.5  # two pairs, each d=-1/2
    assert got[2]["wavelet_var"] == 1.0  # h=2 ramp: (h/2)^2
