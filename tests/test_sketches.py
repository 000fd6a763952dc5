"""Misra-Gries / SpaceSaving heavy-hitters summary (operators/sketches).

Three contracts:
- lossless regime (budget ≥ per-partition distinct): result equals the
  exact top-k, err_ub ≡ 0 — the documented oracle validity bound;
- truncation regime (tiny budget): the lb/ub sandwich
  lb ≤ true ≤ lb + err_ub holds for every reported term, and terms
  whose lb beats the (k+1)-th ub are guaranteed true top-k members;
- merge correctness: the summary exchange stays ≤ budget+1 rows per
  partition no matter how skewed or wide the partition vocabulary is.
"""

import pytest
from pyspark.sql import functions as F

from chronoxtract_spark.operators.sketches import heavy_hitters, term_summaries


def _corpus(spark, rows, n_parts=4):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    ).repartition(n_parts)


def _exact_counts(rows):
    from collections import Counter

    c = Counter()
    for t in rows:
        c.update(w for w in t.strip().lower().split() if w)
    return c


def test_lossless_matches_exact_topk(spark):
    rows = [
        "alpha beta gamma alpha", "beta beta delta", "alpha zeta",
        "gamma gamma gamma beta", "eta theta alpha beta", "iota kappa",
    ] * 7
    out = heavy_hitters(_corpus(spark, rows), k=5, budget=1 << 10).collect()
    exact = _exact_counts(rows)
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["term"], r["freq"]) for r in out] == want
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]
    assert all(r["err_ub"] == 0 for r in out)


def test_truncated_bounds_sandwich(spark):
    # 40 distinct terms, heavy skew, budget far below distinct count
    rows = []
    for i in range(40):
        rows += [f"term{i:02d}"] * (200 if i < 3 else (40 - i))
    df = _corpus(spark, rows, n_parts=6)
    out = heavy_hitters(df, k=10, budget=8).collect()
    exact = _exact_counts(rows)
    assert out, "truncated summary must still report"
    for r in out:
        true = exact[r["term"]]
        assert r["freq"] <= true <= r["freq"] + r["err_ub"], (
            r["term"], r["freq"], r["err_ub"], true)
    # the three mega-terms dominate every partition, so they must
    # survive truncation and be reported in the true order
    assert [r["term"] for r in out[:3]] == ["term00", "term01", "term02"]
    # guarantee check: lb above the (k+1)-th ub ⇒ certified top-k;
    # with k=10 covering all reported rows use the weakest reported ub
    ubs = sorted((r["freq"] + r["err_ub"] for r in out), reverse=True)
    kth_ub = ubs[min(len(ubs) - 1, 9)]
    certified = [r["term"] for r in out if r["freq"] > kth_ub]
    true_top = {t for t, _ in sorted(
        exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]}
    assert set(certified) <= true_top


def test_summary_rows_capped_per_partition(spark):
    # one partition, 100 distinct terms, budget 16 → ≤ 17 summary rows
    rows = [f"w{i}" for i in range(100)] * 2
    df = _corpus(spark, rows, n_parts=1)
    summ = term_summaries(df, budget=16)
    assert summ.count() <= 17
    meta = summ.where(F.col("term").isNull()).collect()
    assert len(meta) == 1 and meta[0]["thr"] > 0
    # survivor rows carry the partition threshold for the tight bound
    kept = summ.where(F.col("term").isNotNull()).select("thr").distinct().collect()
    assert [r["thr"] for r in kept] == [meta[0]["thr"]]


def test_empty_and_whitespace_docs(spark):
    rows = ["", "   ", "solo", "\t\n"]
    out = heavy_hitters(_corpus(spark, rows, n_parts=2), k=5, budget=64).collect()
    assert [(r["term"], r["freq"], r["err_ub"]) for r in out] == [("solo", 1, 0)]
