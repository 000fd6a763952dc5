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
