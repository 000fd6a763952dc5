"""Distributed CARMA fitting.

The reference parallelizes MLE starts / order-grid cells with rayon
inside one process (src/carma/mle.rs:49-60, src/carma/selection.rs:44-58).
Spark-first, the parallel axis is **series × work-item**: each
(series, fit) runs as one applyInPandas group task; the sequential
Kalman recursion stays inside the numpy kernel (SURVEY.md §3.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from chronoxtract_spark.kernel import carma as K

MLE_SCHEMA = (
    "series_id string, p int, q int, loglikelihood double, aic double, "
    "aicc double, bic double, sigma double, ar_coeffs array<double>, "
    "ma_coeffs array<double>, converged boolean, n_obs long"
)


def carma_mle_per_series(
    df: DataFrame,
    series_col: str = "series_id",
    t_col: str = "t",
    v_col: str = "v",
    e_col: str = "e",
    p: int = 1,
    q: int = 0,
    n_starts: int = 8,
) -> DataFrame:
    """Multistart CARMA MLE per series. One shuffle on the series key;
    each group fits independently in its Arrow batch."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(t_col, kind="mergesort")
        t = pdf[t_col].to_numpy(np.float64)
        v = pdf[v_col].to_numpy(np.float64)
        e = pdf[e_col].to_numpy(np.float64)
        sid = pdf[series_col].iloc[0]
        try:
            res = K.carma_mle(t, v, e, p, q, n_starts=n_starts)
            row = {
                "series_id": sid,
                "p": p,
                "q": q,
                "loglikelihood": res["loglikelihood"],
                "aic": res["aic"],
                "aicc": res["aicc"],
                "bic": res["bic"],
                "sigma": res["params"].sigma,
                "ar_coeffs": res["params"].ar_coeffs.tolist(),
                "ma_coeffs": res["params"].ma_coeffs.tolist(),
                "converged": bool(res["converged"]),
                "n_obs": len(t),
            }
        except (K.CarmaError, ValueError):
            row = {
                "series_id": sid,
                "p": p,
                "q": q,
                "loglikelihood": float("nan"),
                "aic": float("nan"),
                "aicc": float("nan"),
                "bic": float("nan"),
                "sigma": float("nan"),
                "ar_coeffs": [],
                "ma_coeffs": [],
                "converged": False,
                "n_obs": len(t),
            }
        return pd.DataFrame([row])

    return df.groupBy(series_col).applyInPandas(fit, schema=MLE_SCHEMA)


def carma_order_grid(
    df: DataFrame,
    series_col: str = "series_id",
    t_col: str = "t",
    v_col: str = "v",
    e_col: str = "e",
    max_p: int = 2,
    max_q: int = 1,
    n_starts: int = 4,
) -> DataFrame:
    """Distributed order selection: the (series × p × q) grid fans out
    via a crossJoin with the literal grid so every cell is its own task
    — the Spark analogue of the reference's rayon grid
    (src/carma/selection.rs:44-58). Pick the winner with a min_by on
    AICc downstream."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    cells = [(pp, qq) for pp in range(1, max_p + 1) for qq in range(0, min(pp, max_q + 1))]
    grid = spark.createDataFrame(cells, "p int, q int")
    expanded = df.crossJoin(F.broadcast(grid))

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(t_col, kind="mergesort")
        t = pdf[t_col].to_numpy(np.float64)
        v = pdf[v_col].to_numpy(np.float64)
        e = pdf[e_col].to_numpy(np.float64)
        sid = pdf[series_col].iloc[0]
        pp, qq = int(pdf["p"].iloc[0]), int(pdf["q"].iloc[0])
        try:
            res = K.carma_mle(t, v, e, pp, qq, n_starts=n_starts)
            ll, aic, aicc, bic = (
                res["loglikelihood"],
                res["aic"],
                res["aicc"],
                res["bic"],
            )
            sig = res["params"].sigma
            ar = res["params"].ar_coeffs.tolist()
            ma = res["params"].ma_coeffs.tolist()
            conv = True
        except (K.CarmaError, ValueError):
            ll = aic = aicc = bic = sig = float("nan")
            ar, ma, conv = [], [], False
        return pd.DataFrame(
            [
                {
                    "series_id": sid,
                    "p": pp,
                    "q": qq,
                    "loglikelihood": ll,
                    "aic": aic,
                    "aicc": aicc,
                    "bic": bic,
                    "sigma": sig,
                    "ar_coeffs": ar,
                    "ma_coeffs": ma,
                    "converged": conv,
                    "n_obs": len(t),
                }
            ]
        )

    return expanded.groupBy(series_col, "p", "q").applyInPandas(
        fit, schema=MLE_SCHEMA
    )


def best_order_per_series(grid_results: DataFrame) -> DataFrame:
    """AICc argmin per series over the fitted grid."""
    from pyspark.sql import functions as F

    ok = grid_results.filter(F.col("converged") & ~F.isnan("aicc"))
    return ok.groupBy("series_id").agg(
        F.min_by(F.struct("p", "q", "aicc"), "aicc").alias("best")
    ).select(
        "series_id",
        F.col("best.p").alias("best_p"),
        F.col("best.q").alias("best_q"),
        F.col("best.aicc").alias("best_aicc"),
    )
