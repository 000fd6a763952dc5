"""Holt linear-trend (double) exponential smoothing with h-step
forecasts — the level+trend recurrence every capacity-planning tier
runs over its rollup series (Holt 1957; the ETS(A,A,N) shape).

The reference repo's EMA (kernel/rolling.py) is the single-state
version; Holt adds the coupled trend state, which makes the recurrence
a 2-state linear system:

    l_t = alpha*y_t + (1-alpha)*(l_{t-1} + b_{t-1})
    b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}

with the standard init l_1 = y_1, b_1 = y_2 - y_1, and forecast
``l_n + h*b_n``.

Scale shape: the recurrence is irreducibly sequential PER SERIES (the
ewma_irregular blocked-prefix trick does not extend to the coupled
2x2 system with two distinct decay rates), so it runs as a per-series
Arrow kernel via ``applyInPandas`` — one key shuffle, a float loop
over the series inside the batch, O(series length) state. Series are
bounded by construction (fixed-length rollup windows), which is the
honest precondition: an unbounded series would need the block-matrix
scan treatment.

Oracle determinism: the kernel applies the update expressions in
EXACTLY the order the oracle's recursive-CTE replay does (one shared
IEEE tree per state update); inputs are integer counts, so l/b stay
short float chains and both engines produce identical doubles. The
one-step-ahead SSE accumulates in the same sequential order in both.
Outputs are left unrounded.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)


def holt_forecast(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float,
    beta: float,
    horizon: int = 3,
) -> DataFrame:
    """Fit Holt's linear method per series and emit ``horizon``
    forecast rows per key plus the fitted terminal state.

    Series shorter than 2 points yield no rows (the init needs two).
    Returns ``key, h, forecast, level, trend, sse`` — ``h`` in
    ``1..horizon``; ``level``/``trend``/``sse`` repeat the terminal
    fit on every row (flat columns beat a second output shape).
    """
    if not (0.0 < alpha <= 1.0 and 0.0 <= beta <= 1.0):
        raise ValueError("alpha in (0,1], beta in [0,1]")

    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("h", LongType()),
            StructField("forecast", DoubleType()),
            StructField("level", DoubleType()),
            StructField("trend", DoubleType()),
            StructField("sse", DoubleType()),
        ]
    )
    a, bt, hz = float(alpha), float(beta), int(horizon)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ord", kind="mergesort")
        y = pdf["v"].to_numpy(dtype=float)
        if len(y) < 2:
            return pd.DataFrame(
                columns=["key", "h", "forecast", "level", "trend", "sse"]
            ).astype(
                {"key": str, "h": "int64", "forecast": float,
                 "level": float, "trend": float, "sse": float}
            )
        key = pdf["key"].iloc[0]
        # update order mirrored verbatim in the oracle's recursive CTE
        lev = float(y[0])
        trd = float(y[1]) - float(y[0])
        sse = 0.0
        for t in range(1, len(y)):
            pred = lev + trd
            err = float(y[t]) - pred
            sse = sse + err * err
            new_lev = a * float(y[t]) + (1.0 - a) * (lev + trd)
            trd = bt * (new_lev - lev) + (1.0 - bt) * trd
            lev = new_lev
        rows = [
            {"key": key, "h": h, "forecast": lev + h * trd,
             "level": lev, "trend": trd, "sse": sse}
            for h in range(1, hz + 1)
        ]
        return pd.DataFrame(rows)

    base = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(order_col).alias("ord"),
        F.col(value_col).cast("double").alias("v"),
    )
    return base.groupBy("key").applyInPandas(kernel, out_schema)


def holt_winters_forecast(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float,
    beta: float,
    gamma: float,
    period: int = 24,
    horizon: int = 24,
) -> DataFrame:
    """Additive Holt-Winters (triple) exponential smoothing per series
    — the ETS(A,A,A) shape that closes the forecasting family: EMA
    (one state) -> Holt (level+trend) -> Holt-Winters (level + trend +
    an m-slot seasonal vector), the model a capacity tier actually
    wants for daily-periodic hourly load.

    Recurrence (standard additive form, season slot j = t mod m):

        l_t = alpha*(y_t - s_j) + (1-alpha)*(l_{t-1} + b_{t-1})
        b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}
        s_j = gamma*(y_t - l_t) + (1-gamma)*s_j

    Init (two-season scheme with DETRENDED seasonals, needs
    n >= 2*period): b = (mean of season 2 - mean of season 1)/m; the
    level is advanced to the END of season 1, l = mean1 + b*(m-1)/2;
    s_j = y_j - (mean1 + (j - (m-1)/2)*b), i.e. deviations from the
    fitted trendline rather than from the raw mean — without the
    detrend, a linear-plus-seasonal series double-counts its
    within-season trend as seasonality and the first predictions are
    biased by ~b*m/2 (caught by the exactly-modeled test: the naive
    init left SSE at 700 on a series this init fits exactly). The
    recurrence starts at point m+1. Forecast
    ``l_n + h*b_n + s_(n+h-1 mod m)``; ``sse`` accumulates one-step
    errors from point m+1 on.

    Scale + oracle shape inherited from ``holt_forecast``: the coupled
    recurrence is irreducibly sequential per series, so it runs as a
    per-series Arrow kernel over bounded series; the oracle is a
    recursive CTE carrying the seasonal vector as a LIST column, the
    slot update spliced by list slicing, and every update bound ONCE
    per step via CROSS JOIN LATERAL — the same single-evaluation
    discipline as the kernel's local variables, so both engines walk
    identical IEEE trees. Init means are in-order sequential folds
    (list_sum of ORDER BY lists). Outputs left unrounded.

    Returns ``key, h, forecast, level, trend, sse`` for h in
    ``1..horizon``; series shorter than 2*period yield no rows.
    """
    if not (0.0 < alpha <= 1.0 and 0.0 <= beta <= 1.0 and 0.0 <= gamma <= 1.0):
        raise ValueError("alpha in (0,1], beta in [0,1], gamma in [0,1]")
    m = int(period)
    if m < 2:
        raise ValueError("period >= 2")

    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("h", LongType()),
            StructField("forecast", DoubleType()),
            StructField("level", DoubleType()),
            StructField("trend", DoubleType()),
            StructField("sse", DoubleType()),
        ]
    )
    a, bt, g, hz = float(alpha), float(beta), float(gamma), int(horizon)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ord", kind="mergesort")
        y = pdf["v"].to_numpy(dtype=float)
        n = len(y)
        if n < 2 * m:
            return pd.DataFrame(
                columns=["key", "h", "forecast", "level", "trend", "sse"]
            ).astype(
                {"key": str, "h": "int64", "forecast": float,
                 "level": float, "trend": float, "sse": float}
            )
        key = pdf["key"].iloc[0]
        # in-order sequential folds, mirrored by the oracle's
        # list_sum(list(... ORDER BY ...)) over the same slices
        acc1 = 0.0
        for t in range(m):
            acc1 = acc1 + float(y[t])
        acc2 = 0.0
        for t in range(m, 2 * m):
            acc2 = acc2 + float(y[t])
        l0 = acc1 / float(m)
        trd = (acc2 / float(m) - l0) / float(m)
        half = (m - 1) / 2.0
        lev = l0 + trd * half
        s = [float(y[j]) - (l0 + (j - half) * trd) for j in range(m)]
        sse = 0.0
        for t in range(m, n):
            j = t % m
            err = float(y[t]) - (lev + trd + s[j])
            sse = sse + err * err
            new_lev = a * (float(y[t]) - s[j]) + (1.0 - a) * (lev + trd)
            trd = bt * (new_lev - lev) + (1.0 - bt) * trd
            s[j] = g * (float(y[t]) - new_lev) + (1.0 - g) * s[j]
            lev = new_lev
        rows = [
            {"key": key, "h": h, "forecast": lev + h * trd + s[(n + h - 1) % m],
             "level": lev, "trend": trd, "sse": sse}
            for h in range(1, hz + 1)
        ]
        return pd.DataFrame(rows)

    base = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(order_col).alias("ord"),
        F.col(value_col).cast("double").alias("v"),
    )
    return base.groupBy("key").applyInPandas(kernel, out_schema)


def forecast_eval(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    period: int = 24,
    round_digits: int | None = 6,
) -> DataFrame:
    """Rolling-origin one-step backtest of the four M-competition
    baseline forecasters every serious method must beat, per series:

    - ``naive``      f_t = y_{t-1}
    - ``snaive``     f_t = y_{t-m}            (seasonal naive)
    - ``drift``      f_t = y_{t-1} + (y_{t-1} - y_0)/(t-1)
    - ``mean``       f_t = mean(y_0..y_{t-1}) (expanding mean)

    Each method is scored over the origins where it is defined
    (``n_evals`` differs: naive/drift/mean start at t=1 vs t=m for
    snaive — drift needs t >= 2) with MAE, RMSE and MASE — the
    Hyndman-Koehler scale-free standard, MAE / MAE_naive over the SAME
    origin set as the method, so methods are comparable across keys
    and a MASE < 1 literally reads "beats naive". Pair this with
    ``holt_winters_forecast``/``holt_forecast``: a model whose SSE
    does not beat snaive's here is not earning its states.

    Exactness: every forecast is a window expression over the ordered
    series (lags, an exact int64 expanding sum for the mean) and every
    metric is a sequential fold over origin-sorted error arrays (the
    proven sorted-fold contract) wrapped in fixed float expressions —
    DuckDB-oracle bit-exact before round(6). One key-window pass, one
    per-key groupBy, a broadcast-size per-key join for the MASE
    denominator; no UDF; one row per (key, method).
    """
    m = int(period)
    w = Window.partitionBy("_k").orderBy("_i")
    wc = w.rowsBetween(Window.unboundedPreceding, -1)
    base = df.select(
        F.col(key_col).cast("string").alias("_k"),
        F.col(order_col).alias("_ord"),
        F.col(value_col).cast("double").alias("_y"),
    ).select(
        "_k",
        (F.row_number().over(
            Window.partitionBy("_k").orderBy("_ord")
        ) - 1).cast("long").alias("_i"),
        "_y",
    )
    feat = base.select(
        "_k",
        "_i",
        "_y",
        F.lag("_y", 1).over(w).alias("_l1"),
        F.lag("_y", m).over(w).alias("_lm"),
        F.first("_y").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("_y0"),
        F.sum("_y").over(wc).alias("_csum"),
        F.count("_y").over(wc).cast("long").alias("_cnt"),
    )

    id_ = F.col("_i").cast("double")
    methods = {
        "naive": F.col("_l1"),
        "snaive": F.col("_lm"),
        "drift": F.when(
            F.col("_i") >= 2,
            F.col("_l1")
            + (F.col("_l1") - F.col("_y0")) / (id_ - F.lit(1.0)),
        ),
        "mean": F.when(
            F.col("_cnt") >= 1, F.col("_csum") / F.col("_cnt").cast("double")
        ),
    }
    errs = feat.select(
        "_k",
        "_i",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("method"),
                        (F.col("_y") - fc).alias("e"),
                    )
                    for name, fc in methods.items()
                ]
            )
        ).alias("me"),
    ).select(
        "_k", "_i", F.col("me.method").alias("method"), F.col("me.e").alias("e")
    ).where(F.col("e").isNotNull())

    agg = errs.groupBy("_k", "method").agg(
        F.count("*").cast("long").alias("n_evals"),
        F.array_sort(
            F.collect_list(F.struct("_i", F.abs(F.col("e")).alias("ae")))
        ).alias("arr_a"),
        F.array_sort(
            F.collect_list(F.struct("_i", (F.col("e") * F.col("e")).alias("se")))
        ).alias("arr_s"),
    ).select(
        "_k",
        "method",
        "n_evals",
        (
            F.aggregate("arr_a", F.lit(0.0), lambda acc, x: acc + x["ae"])
            / F.col("n_evals").cast("double")
        ).alias("_mae"),
        F.sqrt(
            F.aggregate("arr_s", F.lit(0.0), lambda acc, x: acc + x["se"])
            / F.col("n_evals").cast("double")
        ).alias("_rmse"),
    )
    naive_mae = agg.where(F.col("method") == "naive").select(
        "_k", F.col("_mae").alias("_nmae")
    )
    j = agg.join(F.broadcast(naive_mae), "_k")

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return j.select(
        F.col("_k").alias(key_col),
        "method",
        "n_evals",
        rnd(F.col("_mae")).alias("mae"),
        rnd(F.col("_rmse")).alias("rmse"),
        rnd(F.col("_mae") / F.nullif(F.col("_nmae"), F.lit(0.0))).alias("mase"),
    )
