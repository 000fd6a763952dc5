"""Gap-fill: dense minute spine + interpolation.

The north rule's gap-fill stage (BASELINE.json:north_star): per
conversation, generate the dense 1-minute spine between the first and
last observed minute with ``sequence()`` + ``explode``, left-join the
observed per-minute aggregates, and interpolate missing values — all in
window SQL, no Python.

Scale notes: the spine explode produces rows proportional to each
conversation's wall-clock span, partitioned with the same conv_id hash
as the observed side, so the join co-locates after one shuffle each.
Interpolation uses two bounded window passes (last-notnull backward,
first-notnull forward) — no self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def turn_rate_1m(
    df: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-conversation turns/minute series: the base series of the
    rollup pipeline (north_star step 2)."""
    minute = F.date_trunc("minute", F.col(ts_col))
    return df.groupBy(F.col(conv_col), minute.alias("minute_ts")).agg(
        F.count("*").alias("turns")
    )


def gap_fill_minutes(
    observed: DataFrame,
    conv_col: str = "conv_id",
    minute_col: str = "minute_ts",
    value_cols: tuple[str, ...] = ("turns",),
    interpolate: str = "linear",
) -> DataFrame:
    """Left-join the dense per-conversation minute spine against the
    observed minutes; missing counts become 0 and an interpolated
    ``rate`` column carries the linear time-weighted blend
    (SURVEY.md §7.1 step 5).

    interpolate: 'zero' (missing minutes = 0 turns), 'linear'
    (time-weighted blend between the surrounding observations; zeros
    still recorded in ``turns``).
    """
    spine = (
        observed.groupBy(conv_col)
        .agg(
            F.min(minute_col).alias("_t0"),
            F.max(minute_col).alias("_t1"),
        )
        .select(
            conv_col,
            F.explode(
                F.sequence(
                    F.col("_t0"), F.col("_t1"), F.expr("interval 1 minute")
                )
            ).alias(minute_col),
        )
    )
    filled = spine.join(observed, [conv_col, minute_col], "left")

    main = value_cols[0]
    filled = filled.withColumn("observed", F.col(main).isNotNull())
    for c in value_cols:
        filled = filled.withColumn(c, F.coalesce(F.col(c), F.lit(0)))

    if interpolate == "zero":
        return filled.withColumn("rate", F.col(main).cast("double"))

    w = Window.partitionBy(conv_col).orderBy(minute_col)
    prev_w = w.rowsBetween(Window.unboundedPreceding, 0)
    next_w = w.rowsBetween(0, Window.unboundedFollowing)

    raw = F.when(F.col("observed"), F.col(main).cast("double"))
    ts_s = F.unix_timestamp(minute_col)
    prev_val = F.last(raw, ignorenulls=True).over(prev_w)
    prev_ts = F.last(F.when(F.col("observed"), ts_s), ignorenulls=True).over(prev_w)
    next_val = F.first(raw, ignorenulls=True).over(next_w)
    next_ts = F.first(F.when(F.col("observed"), ts_s), ignorenulls=True).over(next_w)

    frac = (ts_s - prev_ts) / (next_ts - prev_ts)
    rate = (
        F.when(F.col("observed"), raw)
        .when(prev_val.isNull(), next_val)
        .when(next_val.isNull(), prev_val)
        .otherwise(prev_val + (next_val - prev_val) * frac)
    )
    return filled.withColumn("rate", rate)
