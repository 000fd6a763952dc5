"""Declarative data-quality expectations — the pipeline gate.

``check_expectations`` evaluates a list of declarative rules against a
DataFrame and returns one row per rule: the measured metric, the
threshold, and a pass flag — the Deequ/Great-Expectations shape a
training-data pipeline puts in front of every ingest. Complements
``profile_table`` (operators/profile.py), which DESCRIBES a table;
this JUDGES it against a contract.

Rules (each a dict with ``type`` plus arguments):

- ``{"type": "min_rows", "n": 1000}`` — row count floor.
- ``{"type": "not_null", "col": c, "min_frac": 0.99}`` — non-null
  fraction floor.
- ``{"type": "unique", "cols": [c1, c2], "min_frac": 1.0}`` — fraction
  of rows whose key is unique (exact duplicate detection).
- ``{"type": "in_range", "col": c, "lo": 0, "hi": 10, "min_frac": f}``
  — fraction of NON-NULL values inside [lo, hi] (nulls are judged by
  a not_null rule, not double-counted here).
- ``{"type": "accepted_values", "col": c, "values": [...],
  "min_frac": f}`` — fraction of non-null values in the accepted set.
- ``{"type": "matches", "col": c, "pattern": r, "min_frac": f}`` —
  fraction of non-null strings matching an RE2-style regex.

Scale shape: every row-level rule compiles to ONE conditional
aggregate in a SINGLE aggregation pass over the table (one scan, no
shuffle beyond the final partial-agg reduce); only ``unique`` rules
add a groupBy on their key columns (the unavoidable shuffle — exact
uniqueness IS a group-by). Metrics are exact int64 count ratios
rounded to 6, so a DuckDB oracle computing the same conditional sums
matches bit-for-bit. The result is a tiny DataFrame (one row per
rule) — collect it, gate the pipeline, write it next to the lineage
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _rule_name(r: dict) -> str:
    t = r["type"]
    if t == "min_rows":
        return f"min_rows({r['n']})"
    if t == "not_null":
        return f"not_null({r['col']})"
    if t == "unique":
        return "unique({})".format(",".join(r["cols"]))
    if t == "in_range":
        return f"in_range({r['col']},{r['lo']},{r['hi']})"
    if t == "accepted_values":
        return f"accepted_values({r['col']})"
    if t == "matches":
        return f"matches({r['col']})"
    raise ValueError(f"unknown expectation type: {t}")


def check_expectations(
    df: DataFrame, rules: list[dict], round_digits: int = 6
) -> DataFrame:
    """One row per rule: rule, metric, threshold, passed."""
    aggs = [F.count("*").cast("long").alias("_n")]
    for i, r in enumerate(rules):
        t = r["type"]
        if t == "not_null":
            aggs.append(
                F.sum(
                    F.when(F.col(r["col"]).isNotNull(), 1).otherwise(0)
                ).cast("long").alias(f"_m{i}")
            )
        elif t == "in_range":
            c = F.col(r["col"])
            aggs.append(
                F.sum(
                    F.when((c >= F.lit(r["lo"])) & (c <= F.lit(r["hi"])), 1)
                    .otherwise(0)
                ).cast("long").alias(f"_m{i}")
            )
            aggs.append(
                F.sum(F.when(c.isNotNull(), 1).otherwise(0))
                .cast("long").alias(f"_d{i}")
            )
        elif t == "accepted_values":
            c = F.col(r["col"])
            aggs.append(
                F.sum(
                    F.when(c.isin(list(r["values"])), 1).otherwise(0)
                ).cast("long").alias(f"_m{i}")
            )
            aggs.append(
                F.sum(F.when(c.isNotNull(), 1).otherwise(0))
                .cast("long").alias(f"_d{i}")
            )
        elif t == "matches":
            c = F.col(r["col"])
            aggs.append(
                F.sum(
                    F.when(c.rlike(r["pattern"]), 1).otherwise(0)
                ).cast("long").alias(f"_m{i}")
            )
            aggs.append(
                F.sum(F.when(c.isNotNull(), 1).otherwise(0))
                .cast("long").alias(f"_d{i}")
            )
        elif t in ("min_rows", "unique"):
            pass
        else:
            raise ValueError(f"unknown expectation type: {t}")
    base = df.agg(*aggs).collect()[0]

    uniq = {}
    for i, r in enumerate(rules):
        if r["type"] == "unique":
            cols = list(r["cols"])
            gc = (
                df.groupBy(*cols)
                .agg(F.count("*").cast("long").alias("c"))
                .agg(
                    F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
                    .cast("long").alias("u"),
                    F.sum("c").cast("long").alias("t"),
                )
                .collect()[0]
            )
            uniq[i] = (gc["u"] or 0, gc["t"] or 0)

    spark = df.sparkSession
    n = base["_n"]
    out = []
    for i, r in enumerate(rules):
        t = r["type"]
        if t == "min_rows":
            metric, thr = float(n), float(r["n"])
            passed = n >= r["n"]
        elif t == "not_null":
            thr = float(r.get("min_frac", 1.0))
            metric = (base[f"_m{i}"] / n) if n else 1.0
            passed = metric >= thr
        elif t == "unique":
            thr = float(r.get("min_frac", 1.0))
            u, tot = uniq[i]
            metric = (u / tot) if tot else 1.0
            passed = metric >= thr
        else:  # in_range / accepted_values / matches: non-null basis
            thr = float(r.get("min_frac", 1.0))
            d = base[f"_d{i}"]
            metric = (base[f"_m{i}"] / d) if d else 1.0
            passed = metric >= thr
        out.append(
            (_rule_name(r), round(metric, round_digits), thr, bool(passed))
        )
    return spark.createDataFrame(
        out, "rule string, metric double, threshold double, passed boolean"
    )


def expect_or_raise(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Gate form: raises ``ValueError`` listing every failed rule, else
    returns the result frame. The one-liner a pipeline puts between
    ingest and the expensive stages."""
    res = check_expectations(df, rules)
    failed = [r for r in res.collect() if not r["passed"]]
    if failed:
        msg = "; ".join(
            f"{r['rule']}: {r['metric']} < {r['threshold']}" for r in failed
        )
        raise ValueError(f"expectations failed: {msg}")
    return res
