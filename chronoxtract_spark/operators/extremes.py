"""Running-extreme statistics: drawdown and record counts per key.

The classic running-peak battery over a cumulative series (finance
drawdown, reliability "time under water", record statistics from
extreme-value theory):

- ``max_drawdown`` — largest peak-to-trough drop of the running
  cumulative value sum.
- ``max_drawdown_len`` — most consecutive observations spent strictly
  below the running peak (the longest "under-water" run, in
  observation counts — robust to irregular sampling).
- ``n_records`` — number of strict new highs of the cumulative series
  (first observation counts as a record).
- ``final_cum`` / ``peak_cum`` — terminal and maximal cumulative sums.

The reference repo has no cumulative-extreme operator; this is
engine-native stream analytics like the cadence battery
(operators/cadence.py), characterizing the PATH of a per-key value
stream where the summary battery characterizes its marginal
distribution.

Exactness: values are fixed to integer micro-units (``scale`` decimal
digits, default 2) BEFORE accumulation, so the cumulative sum, running
max, every drawdown, and both counters are exact int64 arithmetic with
no float accumulation order anywhere — a DuckDB oracle over the same
integer stream matches bit-for-bit, and re-partitioning cannot change
a single bit. Only the final re-scaling to value units divides.

Spark-first shape: ONE window pass per key (cumulative sum, running
max, record flag as a self-comparison of the running max against its
lag) + the gaps-and-islands run numbering for the under-water length,
then one partial-aggregated groupBy — all whole-stage-codegen column
expressions, no UDF. Two window functions share one (key, ts) sort;
the only shuffle is the key partitioning every other per-key operator
uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ._util import epoch_seconds


def drawdown_stats(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("turn_idx",),
    scale: int = 2,
    round_digits: int | None = 6,
) -> DataFrame:
    """One row per key: n_obs, n_records, max_drawdown,
    max_drawdown_len, final_cum, peak_cum (value units)."""
    unit = 10 ** scale
    d = df.select(
        F.col(key_col).alias("_k"),
        epoch_seconds(df, ts_col).alias("_s"),
        F.round(F.col(value_col) * F.lit(unit), 0).cast("long").alias("_v"),
        *[F.col(c) for c in order_cols],
    )

    w = Window.partitionBy("_k").orderBy("_s", *order_cols)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = d.select(
        "_k",
        "_s",
        *order_cols,
        F.sum("_v").over(wrun).alias("cum"),
    )
    c = c.select(
        "_k",
        "_s",
        *order_cols,
        "cum",
        F.max("cum").over(wrun).alias("runmax"),
    )
    # record high: cum strictly above the previous running max (the
    # first row has no previous max and counts as a record); under
    # water: cum strictly below the current running max. The
    # under-water run length is gaps-and-islands over the dry rows.
    c = c.select(
        "_k",
        "cum",
        "runmax",
        F.row_number().over(w).alias("rn"),
        (F.col("runmax") - F.col("cum")).alias("dd"),
        F.when(F.lag("runmax").over(w).isNull(), F.lit(1))
        .when(F.col("cum") > F.lag("runmax").over(w), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_record"),
        F.sum(F.when(F.col("cum") >= F.col("runmax"), 1).otherwise(0))
        .over(wrun)
        .alias("dry_run_id"),
    )
    per_run = (
        c.where(F.col("dd") > 0)
        .groupBy("_k", "dry_run_id")
        .agg(F.count("*").cast("long").alias("run_len"))
        .groupBy("_k")
        .agg(F.max("run_len").alias("max_dd_len"))
    )
    agg = c.groupBy("_k").agg(
        F.count("*").cast("long").alias("n_obs"),
        F.sum("is_record").cast("long").alias("n_records"),
        F.max("dd").alias("max_dd_u"),
        F.max("cum").alias("peak_u"),
        F.max_by("cum", "rn").alias("final_u"),
    )
    j = agg.join(per_run, "_k", "left")

    def rnd(col):
        x = col.cast("double") / F.lit(float(unit))
        return F.round(x, round_digits) if round_digits is not None else x

    return j.select(
        F.col("_k").alias(key_col),
        "n_obs",
        "n_records",
        rnd(F.col("max_dd_u")).alias("max_drawdown"),
        F.coalesce(F.col("max_dd_len"), F.lit(0)).cast("long").alias(
            "max_drawdown_len"
        ),
        rnd(F.col("final_u")).alias("final_cum"),
        rnd(F.col("peak_u")).alias("peak_cum"),
    )
