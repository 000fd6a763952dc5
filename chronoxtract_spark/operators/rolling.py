"""Rolling / expanding window operators, SQL-native.

Spark mirrors of the reference rolling-statistics module
(reference: src/rollingstats/mod.rs) over grouped, ordered series.
The reference emits only complete trailing windows (n-w+1 rows,
src/rollingstats/mod.rs:10-16); Spark's ``rowsBetween(-(w-1), 0)``
emits n rows, so every operator here filters ``row_number() >= w``.

All of these run inside WindowExec after a single shuffle+sort on the
group key — the per-frame running aggregates (sum/avg/var) are
maintained incrementally by Spark, matching the reference's
incremental sliding-sum optimization for free (SURVEY.md §4.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _w(group_col: str, order_cols: list[str]):
    return Window.partitionBy(group_col).orderBy(*order_cols)


def _complete_windows(
    df: DataFrame, base, expr: Column, out: str, window: int
) -> DataFrame:
    rn = F.row_number().over(base)
    return (
        df.withColumn(out, expr)
        .withColumn("_rn", rn)
        .filter(F.col("_rn") >= window)
        .drop("_rn")
    )


def rolling_mean(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str = "value",
    window: int = 3,
    out: str = "rolling_mean",
) -> DataFrame:
    """Trailing-window mean (src/rollingstats/mod.rs:6-19)."""
    base = _w(group_col, order_cols)
    frame = base.rowsBetween(-(window - 1), 0)
    return _complete_windows(df, base, F.avg(value_col).over(frame), out, window)


def rolling_variance(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str = "value",
    window: int = 3,
    out: str = "rolling_variance",
) -> DataFrame:
    """Trailing-window population variance (src/rollingstats/mod.rs:23-35)."""
    base = _w(group_col, order_cols)
    frame = base.rowsBetween(-(window - 1), 0)
    return _complete_windows(df, base, F.var_pop(value_col).over(frame), out, window)


def expanding_sum(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str = "value",
    out: str = "expanding_sum",
) -> DataFrame:
    """Cumulative sum (src/rollingstats/mod.rs:39-48)."""
    frame = _w(group_col, order_cols).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out, F.sum(value_col).over(frame))


def centered_moving_average(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str = "value",
    window_size: int = 15,
    out: str = "trend",
) -> DataFrame:
    """Centered, edge-truncated moving average — the reference's STL
    trend extractor (src/seasonality/mod.rs:215-230). Spark truncates
    frames at partition edges identically."""
    half = window_size // 2
    frame = _w(group_col, order_cols).rowsBetween(-half, half)
    return df.withColumn(out, F.avg(value_col).over(frame))


def exponential_moving_average(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str = "value",
    alpha: float = 0.5,
    out: str = "ema",
) -> DataFrame:
    """EMA recurrence via the SQL ``aggregate`` higher-order function
    over the per-row prefix (src/rollingstats/mod.rs:52-64).

    The recurrence ``ema_i = a*x_i + (1-a)*ema_{i-1}`` telescopes into a
    fold over collected prefix values — still JVM-side. For long series
    prefer the kernel path (pandas ``ewm`` inside applyInPandas, see
    operators.features); this SQL form exists for oracle-checkable
    parity and short rollup windows.
    """
    frame = _w(group_col, order_cols).rowsBetween(Window.unboundedPreceding, 0)
    prefix = F.collect_list(value_col).over(frame)
    ema = F.aggregate(
        prefix,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(
            F.lit(alpha) * x + F.lit(1.0 - alpha) * acc
        ),
    )
    return df.withColumn(out, ema)


def rolling_fvar(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    flux_col: str = "flux",
    err_col: str = "err",
    window: int = 5,
) -> DataFrame:
    """Rolling fractional variability + error over trailing windows
    (src/misc/frac.rs:95-115): sample variance, mean squared error and
    mean flux over the same rows frame, then the Fvar when-chain."""
    base = _w(group_col, order_cols)
    frame = base.rowsBetween(-(window - 1), 0)
    f, e = F.col(flux_col), F.col(err_col)
    n = F.count(flux_col).over(frame)
    mean_f = F.avg(flux_col).over(frame)
    var_s = F.var_samp(flux_col).over(frame)
    mean_e2 = F.avg(e * e).over(frame)
    excess = var_s - mean_e2
    fvar = (
        F.when(mean_f == 0, F.lit(float("nan")))
        .when(excess <= 0, F.lit(0.0))
        .otherwise(F.sqrt(excess) / mean_f)
    )
    t1 = F.sqrt(1.0 / (2 * n)) * mean_e2 / (mean_f * mean_f * (F.sqrt(excess) / mean_f))
    t2 = F.sqrt(mean_e2 / n) / mean_f
    fvar_err = (
        F.when(mean_f == 0, F.lit(float("nan")))
        .when(excess <= 0, F.lit(0.0))
        .otherwise(F.sqrt(t1 * t1 + t2 * t2))
    )
    rn = F.row_number().over(base)
    return (
        df.withColumn("fvar", fvar)
        .withColumn("fvar_err", fvar_err)
        .withColumn("_rn", rn)
        .filter(F.col("_rn") >= window)
        .drop("_rn")
    )
