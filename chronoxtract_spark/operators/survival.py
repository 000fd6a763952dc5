"""Kaplan-Meier survival estimation over keyed event streams.

``survival_curve`` estimates the distribution of per-key LIFETIMES
(first event -> last event) with proper right-censoring at the
observation horizon: a key whose last event falls within
``censor_window_s`` of the table's maximum timestamp may still be
alive — we only know its lifetime exceeds what we saw — so treating
it as complete would bias lifetimes down (the classic churn-analysis
mistake). This is the product-limit estimator

    S(t) = prod_{t_i <= t} (1 - d_i / n_i)

with d_i deaths at lifetime t_i and n_i the at-risk count (every key
with observed lifetime >= t_i, dead or censored), plus the Greenwood
standard error. The reference repo has no survival machinery; this is
engine-native cohort analytics alongside cohort_retention
(operators/cohort.py), which tracks calendar re-appearance; this
estimates the lifetime law itself, censoring-corrected.

Exactness strategy: d_i, c_i and the at-risk suffix counts are exact
int64. The product limit is exp of the ordered cumulative sum of
ln(1 - d_i/n_i) — a running window sum in lifetime order, the same
deterministic-sequential-accumulation contract the engine's other
ordered float recurrences rely on. Greenwood rides the identical
window with terms d_i/(n_i (n_i - d_i)).

Spark-first shape: one (key) groupBy to lifetimes, a global max
timestamp attached as a broadcast 1-row scalar (the deliberate
scalar-attach BNLJ every other horizon-relative operator uses), one
(lifetime) groupBy to the death/censor tallies, and one window pass
ordered by lifetime for the suffix risk counts and both cumulative
sums. Output is one row per distinct death time — bounded by distinct
lifetimes, not keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ._util import epoch_seconds


def survival_curve(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    censor_window_s: int = 7 * 86400,
    round_digits: int | None = 6,
) -> DataFrame:
    """One row per distinct death lifetime t: n_risk, n_deaths,
    n_censored (censored AT exactly t), survival S(t), Greenwood
    standard error. Lifetimes are whole seconds."""
    lives = df.select(F.col(key_col).alias("_k"), epoch_seconds(df, ts_col).alias("_s")).groupBy(
        "_k"
    ).agg(
        F.min("_s").alias("t0"),
        F.max("_s").alias("t1"),
    )
    horizon = lives.agg(F.max("t1").alias("t_end"))
    lv = lives.join(F.broadcast(horizon)).select(
        (F.col("t1") - F.col("t0")).alias("t"),
        (F.col("t1") > F.col("t_end") - F.lit(int(censor_window_s)))
        .cast("int")
        .alias("censored"),
    )
    tally = lv.groupBy("t").agg(
        F.sum(F.lit(1) - F.col("censored")).cast("long").alias("d"),
        F.sum("censored").cast("long").alias("c"),
    )
    # at-risk: every key with lifetime >= t  ==  suffix sum over
    # descending t of (d + c)
    wdesc = (
        Window.orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = tally.select(
        "t", "d", "c", F.sum(F.col("d") + F.col("c")).over(wdesc).alias("n")
    )
    wasc = (
        Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nd = F.col("d").cast("double")
    nn = F.col("n").cast("double")
    # d == n (risk set fully dies) can only happen at the maximal
    # lifetime — no key outlives it — so S there is exactly 0 and the
    # ln term would be ln(0); branch instead of feeding log a zero
    # (Spark's log would return NULL and the window sum would silently
    # SKIP the step, freezing S at its previous value).
    lnterm = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n")),
        F.log(F.lit(1.0) - nd / nn),
    ).otherwise(F.lit(0.0))
    gwterm = F.when(
        (F.col("d") > 0) & (F.col("n") > F.col("d")),
        nd / (nn * (nn - nd)),
    ).otherwise(F.lit(0.0))
    curve = r.select(
        "t",
        "n",
        "d",
        "c",
        F.when(F.col("d") == F.col("n"), F.lit(0.0))
        .otherwise(F.exp(F.sum(lnterm).over(wasc)))
        .alias("s"),
        F.sum(gwterm).over(wasc).alias("gw"),
    ).where(F.col("d") > 0)

    def rnd(col):
        return F.round(col, round_digits) if round_digits is not None else col

    return curve.select(
        F.col("t").alias("lifetime_s"),
        F.col("n").alias("n_risk"),
        F.col("d").alias("n_deaths"),
        F.col("c").alias("n_censored"),
        rnd(F.col("s")).alias("survival"),
        rnd(F.col("s") * F.sqrt(F.col("gw"))).alias("greenwood_se"),
    )
