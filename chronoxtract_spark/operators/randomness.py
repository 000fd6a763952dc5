"""Classical randomness tests per key: is this series i.i.d. noise?

``randomness_tests`` runs three nonparametric whiteness checks over
each key's ordered value series and reports each statistic with its
normal-approximation z score and 5% two-sided verdict:

- **Wald-Wolfowitz runs test** about the exact median: values equal
  to the median are excluded (the classic treatment), the remaining
  above/below sequence is segmented into runs;
  E[R] = 2 n1 n2 / (n1 + n2) + 1,
  Var[R] = 2 n1 n2 (2 n1 n2 - n1 - n2) / ((n1+n2)^2 (n1+n2-1)).
  Too FEW runs = trending/clustered, too MANY = oscillating.
- **Difference-sign test**: D = #{t : x_{t+1} > x_t} among the n - 1
  consecutive pairs; E[D] = (n - 1)/2, Var[D] = (n + 1)/12. Detects
  monotone trend; tied consecutive values count as non-increases (the
  statistic assumes a continuous law — ties bias it toward
  "decreasing", which is the documented boundary).
- **Turning-point test**: T = #{strict interior local extrema};
  E[T] = 2(n - 2)/3, Var[T] = (16n - 29)/90. Detects both
  over-smoothness (too few turns) and over-oscillation (too many).

A battery, not one verdict: white noise passes all three; a trend
fails difference-sign and runs but can pass turning-point; a
deterministic oscillation passes difference-sign but fails the other
two — the pattern of failures is the diagnosis.

Exactness: every statistic is a pure int64 count off one key-window
pass (runs segmentation is the gaps-and-islands lag trick on the
median-excluded subsequence); the exact median is the mean of the two
middle order statistics (identical doubles both engines); each z is
one fixed float expression over (count, n1, n2, n) — the DuckDB
oracle matches bit-for-bit before round(6). Degenerate keys guard by
predicates: n < 3 dropped, all-equal-to-median series null the runs z
(n1 = n2 = 0 -> nullif), Var terms nullif-guarded, never NaN.

Spark-first shape: one row_number + lag/lead window pass on the shared
key shuffle, one filtered second lag for runs, the median from a rank
pass on the same shuffle key, then one per-key conditional-count
groupBy. No UDF, no collect, bounded output (one row per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ._util import epoch_seconds

#: two-sided 5% normal critical value, shared with the oracle SQL
RAND_Z_CRIT = 1.959964


def randomness_tests(
    df: DataFrame,
    key_col: str = "conv_id",
    value_col: str = "value",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("turn_idx",),
    round_digits: int | None = 6,
) -> DataFrame:
    w = Window.partitionBy(key_col).orderBy(
        epoch_seconds(df, ts_col).asc(), *[F.col(c).asc() for c in order_cols]
    )
    base = df.select(
        F.col(key_col).alias("_k"),
        (F.row_number().over(w) - 1).cast("long").alias("_i"),
        F.col(value_col).cast("double").alias("_x"),
    )

    # exact median: mean of the two middle order statistics
    wv = Window.partitionBy("_k").orderBy(F.col("_x").asc(), F.col("_i").asc())
    ranked = base.select(
        "_k",
        "_x",
        F.row_number().over(wv).alias("_rn"),
        F.count("*").over(Window.partitionBy("_k")).alias("_n"),
    )
    med = (
        ranked.where(
            (F.col("_rn") == F.floor((F.col("_n") + 1) / 2))
            | (F.col("_rn") == F.floor((F.col("_n") + 2) / 2))
        )
        .groupBy("_k")
        .agg((F.sum("_x") / F.count("*")).alias("_med"))
    )

    wi = Window.partitionBy("_k").orderBy("_i")
    seq = base.join(F.broadcast(med), "_k").select(
        "_k",
        "_i",
        "_x",
        "_med",
        F.lead("_x", 1).over(wi).alias("_nx"),
        F.lag("_x", 1).over(wi).alias("_px"),
    )

    # runs segmentation over the median-excluded subsequence
    nomed = seq.where(F.col("_x") != F.col("_med")).select(
        "_k",
        "_i",
        (F.col("_x") > F.col("_med")).alias("_above"),
    )
    wr = Window.partitionBy("_k").orderBy("_i")
    runs_rows = nomed.select(
        "_k",
        "_above",
        F.when(
            F.lag("_above").over(wr).isNull()
            | (F.lag("_above").over(wr) != F.col("_above")),
            1,
        )
        .otherwise(0)
        .alias("_new_run"),
    )
    runs_agg = runs_rows.groupBy("_k").agg(
        F.sum(F.when(F.col("_above"), 1).otherwise(0)).cast("long").alias("n_above"),
        F.sum(F.when(F.col("_above"), 0).otherwise(1)).cast("long").alias("n_below"),
        F.sum("_new_run").cast("long").alias("runs"),
    )

    per_key = seq.groupBy("_k").agg(
        F.count("*").cast("long").alias("n"),
        F.max("_med").alias("median"),
        F.sum(F.when(F.col("_nx") > F.col("_x"), 1).otherwise(0))
        .cast("long")
        .alias("diff_pos"),
        F.sum(
            F.when(
                F.col("_px").isNotNull()
                & F.col("_nx").isNotNull()
                & (
                    ((F.col("_x") > F.col("_px")) & (F.col("_x") > F.col("_nx")))
                    | ((F.col("_x") < F.col("_px")) & (F.col("_x") < F.col("_nx")))
                ),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("turning_points"),
    ).where(F.col("n") >= 3)

    j = per_key.join(runs_agg, "_k", "left").select(
        "_k",
        "n",
        "median",
        F.coalesce("n_above", F.lit(0)).cast("long").alias("n_above"),
        F.coalesce("n_below", F.lit(0)).cast("long").alias("n_below"),
        F.coalesce("runs", F.lit(0)).cast("long").alias("runs"),
        "diff_pos",
        "turning_points",
    )

    n1 = F.col("n_above").cast("double")
    n2 = F.col("n_below").cast("double")
    m = n1 + n2
    runs_mu = F.lit(2.0) * n1 * n2 / F.nullif(m, F.lit(0.0)) + F.lit(1.0)
    runs_var = (
        F.lit(2.0)
        * n1
        * n2
        * (F.lit(2.0) * n1 * n2 - n1 - n2)
        / F.nullif(m * m * (m - F.lit(1.0)), F.lit(0.0))
    )
    runs_z = (F.col("runs").cast("double") - runs_mu) / F.nullif(
        F.sqrt(runs_var), F.lit(0.0)
    )

    nd = F.col("n").cast("double")
    diff_z = (F.col("diff_pos").cast("double") - (nd - F.lit(1.0)) / F.lit(2.0)) / F.sqrt(
        (nd + F.lit(1.0)) / F.lit(12.0)
    )
    tp_z = (
        F.col("turning_points").cast("double")
        - F.lit(2.0) * (nd - F.lit(2.0)) / F.lit(3.0)
    ) / F.sqrt((F.lit(16.0) * nd - F.lit(29.0)) / F.lit(90.0))

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    def verdict(z):
        return F.when(F.abs(z) > F.lit(RAND_Z_CRIT), F.lit(False)).otherwise(
            F.lit(True)
        )

    return j.select(
        F.col("_k").alias(key_col),
        "n",
        rnd(F.col("median")).alias("median"),
        "n_above",
        "n_below",
        "runs",
        rnd(runs_z).alias("runs_z"),
        "diff_pos",
        rnd(diff_z).alias("diff_z"),
        "turning_points",
        rnd(tp_z).alias("tp_z"),
        F.when(runs_z.isNull(), F.lit(None).cast("boolean"))
        .otherwise(verdict(runs_z))
        .alias("runs_pass"),
        verdict(diff_z).alias("diff_pass"),
        verdict(tp_z).alias("tp_pass"),
    )


#: chi-square 0.95 quantiles by degrees of freedom (standard table),
#: shared with the oracle SQL — the Ljung-Box 5% critical values.
CHI2_CRIT_5PCT = {
    1: 3.841459, 2: 5.991465, 3: 7.814728, 4: 9.487729,
    5: 11.070498, 6: 12.591587, 7: 14.067140, 8: 15.507313,
    9: 16.918978, 10: 18.307038, 11: 19.675138, 12: 21.026070,
}


def ljung_box(
    df: DataFrame,
    key_col: str = "conv_id",
    value_col: str = "value",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("turn_idx",),
    m_lags: int = 8,
    scale: int = 2,
    round_digits: int | None = 6,
) -> DataFrame:
    """Ljung-Box portmanteau whiteness test per key:

        Q(m) = n (n + 2) * sum_{k=1..m} rho_k^2 / (n - k)

    with ``rho_k`` the lag-k sample autocorrelations about the key's
    own mean — the JOINT test of the first ``m`` autocorrelations that
    the per-lag randomness battery can't give (Q ~ chi^2_m under the
    iid null; Ljung & Box 1978). Complements ``randomness_tests``:
    those three order statistics see trend/oscillation shape, Q sees
    any linear serial correlation at all.

    Exactness: deviations clear the mean division by n-scaling
    (u = n*v - S in integer cents, the CUSUM trick), and every
    autocovariance numerator ``A_k = sum u_i u_{i+k}`` is an exact
    integer sum carried in decimal(38,0) — int64 would cap the series
    length near 10^3 at full amplitude, 38 digits hold to ~10^9 rows
    per key (the DuckDB oracle carries HUGEINT, exact to 10^38).
    ``rho_k = A_k/A_0`` divides two exact integers as doubles; Q folds
    the m terms in a FIXED left-associated chain both engines share.

    Q is null (and the verdict null) when ``n <= m`` (the statistic
    needs n - m positive weights) or ``A_0 = 0`` (constant series).
    One window pass (m fixed-offset leads on the shared key sort) +
    one groupBy; no UDF. Returns ``key, n_obs, lb_df, rho1, q_stat,
    white_noise`` (True = fail to reject iid at 5%).
    """
    if m_lags not in CHI2_CRIT_5PCT:
        raise ValueError(
            f"m_lags={m_lags} has no tabulated 5% critical value "
            f"(supported: {sorted(CHI2_CRIT_5PCT)})"
        )
    unit = 10 ** scale
    crit = CHI2_CRIT_5PCT[m_lags]

    d = df.select(
        F.col(key_col).alias("_k"),
        epoch_seconds(df, ts_col).alias("_s"),
        F.round(F.col(value_col) * F.lit(unit), 0).cast("long").alias("_v"),
        *[F.col(c) for c in order_cols],
    )
    w = Window.partitionBy("_k").orderBy("_s", *order_cols)
    wall = Window.partitionBy("_k")
    c = d.select(
        "_k",
        "_s",
        *order_cols,
        (
            F.count("*").over(wall) * F.col("_v")
            - F.sum("_v").over(wall)
        ).alias("u"),
        F.count("*").over(wall).alias("n"),
    )
    dec = lambda col: col.cast("decimal(19,0)")  # noqa: E731
    leads = c.select(
        "_k",
        "n",
        "u",
        *[F.lead("u", k).over(w).alias(f"u{k}") for k in range(1, m_lags + 1)],
    )
    agg = leads.groupBy("_k").agg(
        F.max("n").alias("n"),
        F.sum(dec(F.col("u")) * dec(F.col("u"))).alias("a0"),
        *[
            F.sum(dec(F.col("u")) * dec(F.col(f"u{k}"))).alias(f"a{k}")
            for k in range(1, m_lags + 1)
        ],
    )
    nd = F.col("n").cast("double")
    a0 = F.col("a0").cast("double")
    rho = {
        k: F.col(f"a{k}").cast("double") / a0 for k in range(1, m_lags + 1)
    }
    q_chain = None
    for k in range(1, m_lags + 1):
        term = (rho[k] * rho[k]) / (nd - F.lit(float(k)))
        q_chain = term if q_chain is None else q_chain + term
    q = F.when(
        (F.col("n") > F.lit(m_lags)) & (F.col("a0") > F.lit(0)),
        nd * (nd + F.lit(2.0)) * q_chain,
    )

    def rnd(col):
        return F.round(col, round_digits) if round_digits is not None else col

    return agg.select(
        F.col("_k").alias(key_col),
        F.col("n").cast("long").alias("n_obs"),
        F.lit(m_lags).cast("long").alias("lb_df"),
        rnd(
            F.when(F.col("a0") > F.lit(0), rho[1])
        ).alias("rho1"),
        rnd(q).alias("q_stat"),
        F.when(q.isNotNull(), q <= F.lit(crit)).alias("white_noise"),
    )
