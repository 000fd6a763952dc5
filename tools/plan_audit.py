"""Physical-plan audit across the driver query registry.

Writes BENCH/PLANS.md: for every registered query, the shuffle count
(Exchange nodes), whether the parquet scan carries pushed filters and
a pruned ReadSchema, and any scale red-flags (CartesianProduct /
BroadcastNestedLoopJoin / per-row Python UDF in the plan). This is the ".explain and iterate" loop captured as
a committed artifact, so plan regressions show up in review diffs
rather than in production.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: queries that run the full pipeline inside (write side effects /
#: minutes of work) — audited structurally elsewhere, skipped here
SKIP = {"retention_expiry"}

RED_FLAGS = ("CartesianProduct", "BroadcastNestedLoopJoin")

#: flags that are deliberate design, with the reason a reviewer needs.
#: anything NOT listed here that trips a red flag stays red.
EXPECTED_FLAGS = {
    "heavy_hitters": "BNLJ = broadcast of the 1-row Σthr scalar (the "
    "global Misra-Gries overcount budget) onto the ≤ budget·P merged "
    "summary rows — the standard scalar-attach pattern; the summary "
    "merge itself is one sum-by-key exchange",
    "dcf_cross": "BNLJ = broadcast of the 1-row series mu/sigma scalar "
    "(dcf.py _series_stats attach); the pair join is the t2 equi-join",
    "acf_eventcount": "same 1-row mu/sigma broadcast as dcf_cross",
    "knn_brute": "brute-force ANN baseline by definition: one corpus "
    "scan matmul'd against the broadcast query matrix (since the r4 "
    "kernel rework the plan is mapInPandas + a small rank window — no "
    "BNLJ should appear; this entry remains only so a regression back "
    "to a join-shaped brute plan is flagged with context)",
    "carma_order": "broadcast of the tiny fixed (p,q) candidate grid "
    "(6 rows) against per-series data",
    "carma_order_p1": "same tiny fixed candidate-grid broadcast as "
    "carma_order, restricted to the closed-form p=1 cells the oracle "
    "covers",
    "carma_order_p2": "same tiny fixed candidate-grid broadcast as "
    "carma_order (3 cells at max_p=2, max_q=1) against per-series "
    "data; the per-cell multistart runs inside the Arrow stage",
    "tfidf_terms": "BNLJ = broadcast of the 1-row corpus-size scalar "
    "(N for the idf denominator) onto the tf table; the term "
    "document-frequency join is a broadcast hash equi-join",
    "bigram_lm": "BNLJ = broadcast of the 1-row corpus vocabulary-size "
    "scalar (V for add-one smoothing) onto the vocab-sized bigram "
    "model; the bigram joins are broadcast hash equi-joins",
    "bm25": "BNLJ = broadcast of the 1-row (N, avgdl) corpus-stats "
    "scalar onto matched tf rows; query terms and doc freqs are "
    "broadcast hash equi-joins",
    "pmi": "BNLJ = broadcast of the 1-row corpus-size scalar (N in "
    "the PMI numerator) onto the bounded pair-count table",
    "corr_matrix": "BNLJ = broadcast of the 1-row global (g_lo, g_hi) "
    "span onto the handful of series names to build the dense spine; "
    "the pair moments come from a time-key hash equi-join",
    "spearman_matrix": "BNLJ = the same 1-row global-span spine "
    "attach as corr_matrix (names x broadcast span); the doubled-rank "
    "pair moments ride the identical time-key hash equi-join",
    "cooccurrence_mi": "BNLJ/cross = the 1-row global-span scalar "
    "attach (corr_matrix pattern) plus the bounded names x names "
    "pair grid (non-equi a < b over per-name distinct-bucket SIZES "
    "— zero-co-occurrence pairs must still emit); the event-sized "
    "work is one distinct projection and n11 is a bucket hash "
    "equi-join between bounded distinct sets",
    "vocab_overlap": "BNLJ = the deliberate bounded slices x slices "
    "pair grid (non-equi a < b over per-slice top-k SIZES, "
    "<= |slices|^2 rows by construction — zero-overlap pairs must "
    "still emit); the corpus-sized work is the single (slice, term) "
    "count exchange and the top-k intersection is a term hash "
    "equi-join",
    "survival": "BNLJ = broadcast of the 1-row observation-horizon "
    "scalar (max ts, the censoring cutoff) onto the per-key lifetime "
    "table — the standard scalar-attach pattern; everything else is "
    "groupBys + the single-partition curve window (bounded by "
    "distinct lifetimes)",
    "lang_divergence": "BNLJ/cross = the deliberate bounded union "
    "grid: slices x closed top-k vocabulary (≤ (k+1)·|slices| rows by "
    "construction) plus the 1-row grand-total scalar attach; the "
    "corpus-sized work is the single (slice, term) count exchange",
    "lead_lag": "BNLJ = broadcast of the 1-row global (h0, h1) bin "
    "span onto the distinct key list to build the shared dense spine "
    "(the corr_matrix pattern); the pair-lag correlation itself is "
    "the single hour-equi hash join over the exploded lag ladder",
    "holt_winters": "BNLJ = the same 1-row global-span scalar attach "
    "building the dense hourly spine as lead_lag/corr_matrix; the "
    "recurrence itself is one applyInPandas kernel on the key shuffle",
    "forecast_eval": "BNLJ = the same 1-row global-span spine attach "
    "as lead_lag/holt_winters, plus the 1-row-per-key broadcast "
    "MASE-denominator join; all backtest forecasts are window "
    "expressions on one key shuffle",
}


def explain(df, mode: str = "formatted") -> str:
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return jqe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def audit_one(name: str, df) -> dict:
    plan = explain(df)
    # count physical nodes by their details-section headers "(id) Op" —
    # formatted explain prints every node TWICE (tree + details), and
    # "\bExchange\b" also matches inside ReusedExchange, so naive
    # counting doubles and then mis-subtracts. A ReusedExchange is a
    # pointer to an already-counted shuffle, reported separately.
    exchanges = len(set(re.findall(r"\((\d+)\) Exchange\b", plan)))
    reused = len(set(re.findall(r"\((\d+)\) ReusedExchange\b", plan)))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    read_schema = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    scan_cols = min(
        (len([c for c in rs.split(",") if c]) for rs in read_schema),
        default=None,
    )
    flags = [f for f in RED_FLAGS if f in plan]
    if re.search(r"BatchEvalPython", plan):
        flags.append("row-at-a-time PythonUDF")
    return {
        "name": name,
        "exchanges": exchanges,
        "reused": reused,
        "pushed_filters": any(p.strip() for p in pushed),
        "scan_cols": scan_cols,
        "arrow_python": bool(
            re.search(r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas", plan)
        ),
        "flags": flags,
        "plan": plan,
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from chronoxtract_spark.session import get_spark

    import __spark_entry__ as m

    spark = get_spark(app_name="cx_plan_audit", master="local[8]",
                      shuffle_partitions=8)
    rows, red = [], []
    audited = {}
    for name, fn in sorted(m.queries().items()):
        if name in SKIP:
            continue
        try:
            r = audit_one(name, fn(spark, sf_dir))
            audited[name] = r
        except Exception as e:  # plan-time only; execution not attempted
            rows.append(f"| {name} | — | — | — | — | build error: {e} |")
            red.append(name)
            continue
        note = []
        if r["arrow_python"]:
            note.append("Arrow-batched Python stage")
        if r["flags"]:
            if name in EXPECTED_FLAGS:
                note.append(
                    f"{', '.join(r['flags'])} — expected: "
                    + EXPECTED_FLAGS[name]
                )
            else:
                note.append("**" + ", ".join(r["flags"]) + "**")
                red.append(name)
        rows.append(
            f"| {name} | {r['exchanges']}"
            + (f" (+{r['reused']} reused)" if r["reused"] else "")
            + " | "
            + ("yes" if r["pushed_filters"] else "—")
            + f" | {r['scan_cols'] if r['scan_cols'] is not None else '—'} | "
            + ("; ".join(note) or "—")
            + " |"
        )
    flagship = audited.get("rollup_tiers") or {"plan": "(rollup_tiers failed to build)"}
    md = f"""# BENCH/PLANS — physical-plan audit of the query registry

Generated by tools/plan_audit.py at {sf_dir} (plan construction only —
plans are scale-independent; AQE may further coalesce at runtime).

Columns: **exch** = distinct physical Exchange nodes (shuffles), with
ReusedExchange pointers reported separately (the AQE initial plan —
runtime coalescing can only reduce it; whole-stage-codegen spans are
inserted after AQE replanning and so are not visible in a
pre-execution explain);
**pushdown** = parquet scan carries PushedFilters;
**scan cols** = narrowest scan's ReadSchema width (column pruning);
notes flag Arrow-batched Python stages (the sanctioned slow path) and
scale red-flags (cartesian / nested-loop joins, row-at-a-time Python).

| query | exch | pushdown | scan cols | notes |
| --- | --- | --- | --- | --- |
""" + "\n".join(rows) + f"""

Red-flagged queries: {', '.join(red) if red else 'none'}.

## Flagship plan (rollup_tiers, formatted)

```
{flagship['plan'].strip()}
```
"""
    out = os.path.join(REPO, "BENCH", "PLANS.md")
    with open(out, "w") as f:
        f.write(md)
    print(f"wrote {out}; red flags: {red or 'none'}")
    spark.stop()


if __name__ == "__main__":
    main()
