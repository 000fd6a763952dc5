"""Page CUSUM control chart per key — sequential drift detection
distributed as pure window algebra.

The classic two-sided CUSUM (Page 1954) monitors a stream for a
sustained shift of the mean: with deviations ``d_t = x_t - target - k``
(``k`` the allowance / slack), the one-sided statistics are the
clamped recurrences

    S+_t = max(0, S+_{t-1} + d_t)        (upward shift)
    S-_t = max(0, S-_{t-1} - (x_t - target) - k)   (downward)

and an alarm fires when either exceeds the decision threshold ``h``.
The recurrence looks inherently sequential, but the clamp telescopes:
with prefix sums ``Q_t = sum_{i<=t} d_i`` (``Q_0 = 0``),

    S+_t = Q_t - min(0, min_{j<=t} Q_j)

(induction: ``max(0, Q_{t-1} - m_{t-1} + d_t) = Q_t - min(m_{t-1},
Q_t)`` and the running floor absorbs the 0 clamp), so the whole chart
is ONE ordered window pass per key — cumulative sum + running min —
with no UDF and no per-row Python. This is the same
sequential-to-window transformation the drawdown battery uses
(drawdown IS the mirrored un-clamped case), where the EWMA operator
needed blocked telescoping because its recurrence multiplies.

Exactness contract (the drawdown/cadence contract): values are fixed
to integer units of ``10^-scale`` BEFORE any arithmetic, and the
self-calibrated target (the key's own mean, the standard retrospective
CUSUM) is cleared of division by scaling every deviation by ``n``:

    d+_t = n*v_t - S_n - n*k_u      (all int64)

so cumulative sums, running minima, maxima and threshold comparisons
(``S+_t > n*h_u``) are exact integer arithmetic in BOTH engines and
repartitioning cannot move a bit; floats appear only in the final
unit rescale (one division by ``n * 10^scale``). Overflow bound:
``n^2 * max|v_u| < 2^63`` — a 10^6-row key with 10^6 integer units of
amplitude stays two decades inside int64.

The reference repo has no control-chart operator; this is
engine-native stream analytics alongside Pettitt (a retrospective
single change-point TEST) — CUSUM gives the alarm *time* and the
excursion magnitudes a monitoring pipeline pages on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ._util import epoch_seconds


def cusum_stats(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("turn_idx",),
    k_allowance: float = 0.0,
    h_threshold: float = 5.0,
    scale: int = 2,
    round_digits: int | None = 6,
) -> DataFrame:
    """One row per key: ``n_obs, cusum_pos_max, cusum_neg_max`` (value
    units, the largest one-sided excursions against the key's own
    mean), ``t_alarm_pos / t_alarm_neg`` (1-based observation index of
    the FIRST threshold crossing, null if none) and the boolean
    ``alarm`` verdicts at ``h_threshold``.
    """
    unit = 10 ** scale
    k_u = int(round(k_allowance * unit))
    h_u = int(round(h_threshold * unit))

    d = df.select(
        F.col(key_col).alias("_k"),
        epoch_seconds(df, ts_col).alias("_s"),
        F.round(F.col(value_col) * F.lit(unit), 0).cast("long").alias("_v"),
        *[F.col(c) for c in order_cols],
    )

    w = Window.partitionBy("_k").orderBy("_s", *order_cols)
    wall = Window.partitionBy("_k")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    # per-key totals ride the same partitioning as the ordered pass
    c = d.select(
        "_k",
        "_s",
        *order_cols,
        "_v",
        F.count("*").over(wall).alias("n"),
        F.sum("_v").over(wall).alias("sv"),
    )
    # n-scaled deviations: d+ = n*v - S - n*k ; d- = S - n*v - n*k
    c = c.select(
        "_k",
        "_s",
        *order_cols,
        "n",
        F.row_number().over(w).alias("rn"),
        F.sum(
            F.col("n") * F.col("_v") - F.col("sv") - F.col("n") * F.lit(k_u)
        ).over(wrun).alias("qp"),
        F.sum(
            F.col("sv") - F.col("n") * F.col("_v") - F.col("n") * F.lit(k_u)
        ).over(wrun).alias("qn"),
    )
    # clamp via the running floor (min over the prefix, capped at 0)
    c = c.select(
        "_k",
        "n",
        "rn",
        (F.col("qp") - F.least(F.lit(0), F.min("qp").over(wrun))).alias("sp"),
        (F.col("qn") - F.least(F.lit(0), F.min("qn").over(wrun))).alias("sn"),
    )
    agg = c.groupBy("_k").agg(
        F.max("n").alias("n_obs"),
        F.max("sp").alias("sp_max"),
        F.max("sn").alias("sn_max"),
        F.min(
            F.when(F.col("sp") > F.col("n") * F.lit(h_u), F.col("rn"))
        ).alias("t_alarm_pos"),
        F.min(
            F.when(F.col("sn") > F.col("n") * F.lit(h_u), F.col("rn"))
        ).alias("t_alarm_neg"),
    )

    def rnd(col):
        x = col.cast("double") / (
            F.col("n_obs").cast("double") * F.lit(float(unit))
        )
        return F.round(x, round_digits) if round_digits is not None else x

    return agg.select(
        F.col("_k").alias(key_col),
        F.col("n_obs").cast("long").alias("n_obs"),
        rnd(F.col("sp_max")).alias("cusum_pos_max"),
        rnd(F.col("sn_max")).alias("cusum_neg_max"),
        F.col("t_alarm_pos").cast("long").alias("t_alarm_pos"),
        F.col("t_alarm_neg").cast("long").alias("t_alarm_neg"),
        F.col("t_alarm_pos").isNotNull().alias("alarm_pos"),
        F.col("t_alarm_neg").isNotNull().alias("alarm_neg"),
    )
