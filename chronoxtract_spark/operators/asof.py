"""As-of join: align each left-side event with the most recent
right-side row at or before it (per key, optionally within a
tolerance) — the standard time-series alignment primitive (pandas
``merge_asof``, kdb ``aj``) that Spark has no built-in operator for.

Spark-first plan instead of a range join: a naive formulation
(``l JOIN r ON key AND r.ts BETWEEN l.ts - tol AND l.ts`` + argmax)
explodes into O(|l| x |r| / key) intermediate pairs. Here both sides
are UNIONED and sorted once per key, and the match is carried forward
with ``last(..., ignorenulls=True)`` over an unbounded-preceding
window — ONE shuffle on the join key, O(n log n) per key, zero
intermediate blow-up, no UDF. Skewed keys follow the same
salted-repartition guidance as the rollup engine (a mega-key is a
single window partition; pre-split by time range if one key dominates).

Determinism at equal timestamps is pinned: right rows at exactly
``l.ts`` ARE eligible (backward join, inclusive), and among right rows
sharing one timestamp the one with the greatest ``value_col`` wins
(sort order right-before-left, then value ascending, so the window's
``last`` sees the max last). An oracle can restate the whole semantics
as a correlated ``ORDER BY ts DESC, value DESC LIMIT 1`` lateral —
a genuinely different formulation of the same spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_s: int | None = None,
    suffix: str = "_matched",
) -> DataFrame:
    """Backward as-of join: every ``left`` row gains
    ``<ts_col><suffix>`` (the matched right timestamp) and
    ``<v><suffix>`` for each of ``value_cols``, from the latest
    ``right`` row with ``r.ts <= l.ts`` on the same key(s); matches
    older than ``tolerance_s`` seconds are nulled out. Left rows and
    columns pass through unchanged.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in keys and c != ts_col
        ]
    if not value_cols:
        raise ValueError("right side has no value columns to attach")

    # union layout: keys, ts, side (0 = right so it sorts BEFORE a left
    # row at the same instant and is eligible for it), right payload as
    # ONE struct — carried atomically by a single last(ignorenulls), so
    # the matched columns always come from the same right row even if
    # some payload fields are null — and left payload struct
    lpay = F.struct(*[F.col(c) for c in left.columns]).alias("_l")
    rpay = F.struct(
        F.col(ts_col).alias("_m_ts"),
        *[F.col(c).alias(c) for c in value_cols],
    ).alias("_r")
    r_u = right.select(
        *keys, F.col(ts_col).alias("_ts"), F.lit(0).alias("_side"), rpay,
    )
    l_u = left.select(
        *keys, F.col(ts_col).alias("_ts"), F.lit(1).alias("_side"),
        F.lit(None).cast(r_u.schema["_r"].dataType).alias("_r"),
        lpay,
    )
    r_u = r_u.select(
        "*", F.lit(None).cast(l_u.schema["_l"].dataType).alias("_l")
    )
    # equal-instant right rows: payload-ascending sort (struct order =
    # ts, then value_cols lexicographically) makes last() pick the
    # max-value row — the pinned tie-break (see module docstring)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l_u.unionByName(r_u)
    out = (
        u.select(
            "*", F.last("_r", ignorenulls=True).over(w).alias("_m")
        )
        .where(F.col("_side") == 1)
        .withColumn("_m_ts", F.col("_m._m_ts"))
    )
    keep = (
        F.lit(True)
        if tolerance_s is None
        else (
            F.col("_m_ts").isNotNull()
            & (
                # cast: parquet NTZ timestamps aren't accepted by
                # unix_micros; the NTZ->LTZ shift cancels in the diff
                F.unix_micros(F.col("_ts").cast("timestamp"))
                - F.unix_micros(F.col("_m_ts").cast("timestamp"))
                <= F.lit(int(tolerance_s) * 1_000_000)
            )
        )
    )
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        F.when(keep, F.col("_m_ts")).alias(f"{ts_col}{suffix}"),
        *[
            F.when(keep, F.col(f"_m.{c}")).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
