"""Robust trend estimation: the Theil–Sen slope — the median of all
pairwise slopes — per series, with its intercept (median of
``y - slope*x``). The breakdown-resistant alternative to the OLS
slope the repo already serves (kernel/shape.py slope features,
paired.py rolling beta): a single mega-spike moves OLS arbitrarily
but shifts Theil–Sen by one rank.

Scale shape: the pairwise slope set is O(n^2) PER SERIES by
definition, so the operator is bounded to fixed-length series (the
tier's rollup windows — 24h days, 60m hours), where n^2 is a
constant: one series-key shuffle, a self-join co-located on that key,
and an exact-median rank pass. For unbounded series you would swap in
the repeated-median or a sampled estimator; that trade-off is the
documented boundary.

Oracle determinism: x is the integer order index and y integer
counts, so every pairwise slope is ONE division of exact integers —
identical doubles in both engines. The exact median (sorted, mean of
the two middles on even counts) compares and averages those identical
doubles: bit-exact, no rounding. Slope ties are harmless (equal
values, any order) and the median-of-intercepts reuses the same
machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chronoxtract_spark.operators._util import keylist as _keylist

#: two-sided 5% normal critical value shared with the oracle SQL
MK_Z_CRIT = 1.959964


def _exact_median(df: DataFrame, keys: list[str], val: str) -> DataFrame:
    """Exact median of ``val`` per key: sorted rank pass, middle
    element or mean of the two middles."""
    w = Window.partitionBy(*keys).orderBy(F.asc(val))
    ranked = df.select(
        *keys, F.col(val),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy(*keys)).alias("n"),
    )
    lo = (F.col("n") + 1) / 2
    hi = (F.col("n") + 2) / 2
    picked = ranked.where(
        (F.col("rn") == F.floor(lo)) | (F.col("rn") == F.floor(hi))
    )
    return picked.groupBy(*keys).agg(
        (F.sum(val) / F.count("*")).alias(f"med_{val}")
    )


def theil_sen(
    df: DataFrame,
    keys: list[str] | str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Theil–Sen estimator per series: ``slope`` = exact median of
    ``(y_j - y_i) / (x_j - x_i)`` over all pairs ``x_j > x_i`` (x =
    the dense 0-based order index), ``intercept`` = exact median of
    ``y_i - slope * x_i``. Series need >= 2 points.

    Returns ``keys..., n, slope, intercept``.
    """
    keys = _keylist(keys)
    wo = Window.partitionBy(*keys).orderBy(order_col)
    base = df.select(
        *keys,
        (F.row_number().over(wo) - 1).alias("x"),
        F.col(value_col).cast("double").alias("y"),
    )
    a = base.select(*keys, F.col("x").alias("xi"), F.col("y").alias("yi"))
    b = base.select(*keys, F.col("x").alias("xj"), F.col("y").alias("yj"))
    pairs = a.join(b, keys).where(F.col("xj") > F.col("xi")).select(
        *keys,
        ((F.col("yj") - F.col("yi"))
         / (F.col("xj") - F.col("xi")).cast("double")).alias("s"),
    )
    slopes = _exact_median(pairs, keys, "s")
    n = base.groupBy(*keys).agg(F.count("*").cast("long").alias("n"))
    resid = base.join(slopes, keys).select(
        *keys,
        (F.col("y") - F.col("med_s") * F.col("x").cast("double"))
        .alias("r"),
    )
    intercepts = _exact_median(resid, keys, "r")
    return (
        n.join(slopes, keys)
        .join(intercepts, keys)
        .where(F.col("n") >= 2)
        .select(
            *keys, "n",
            F.col("med_s").alias("slope"),
            F.col("med_r").alias("intercept"),
        )
    )


def mann_kendall(
    df: DataFrame,
    keys: list[str] | str,
    order_col: str,
    value_col: str,
    round_digits: int | None = 6,
) -> DataFrame:
    """Mann-Kendall trend test per series: the significance companion
    to ``theil_sen`` (same pair set, same bounded-series boundary).
    S = sum over ordered pairs of sign(y_j - y_i); the tie-corrected
    variance Var(S) = [n(n-1)(2n+5) - sum_g t_g(t_g-1)(2t_g+5)] / 18
    (Kendall 1975); the continuity-corrected normal score
    z = (S -/+ 1)/sqrt(Var(S)) for S >/< 0 and exactly 0 at S = 0;
    Kendall's tau-b = S / sqrt((D - T_x) D) with D = n(n-1)/2 and
    T_x = sum_g t_g(t_g-1)/2 (the order index is dense, so time has no
    ties); and the 5% two-sided verdict
    ``trend in {increasing, decreasing, none}``.

    Exactness: S, D, the tie sums and the variance numerator are pure
    int64 arithmetic — partition-order-free with no fold contract
    needed — and every emitted float is one fixed expression over
    those integers, so the DuckDB oracle matches bit-for-bit before
    round(6). All-tied series score S = 0, Var = 0, z = 0 exactly and
    null tau-b (nullif, never NaN); series need >= 2 points.

    Returns ``keys..., n, n_pairs, s_stat, var_s, tau_b, z, trend``.
    """
    keys = _keylist(keys)
    wo = Window.partitionBy(*keys).orderBy(order_col)
    base = df.select(
        *keys,
        (F.row_number().over(wo) - 1).alias("x"),
        F.col(value_col).cast("double").alias("y"),
    )
    a = base.select(*keys, F.col("x").alias("xi"), F.col("y").alias("yi"))
    b = base.select(*keys, F.col("x").alias("xj"), F.col("y").alias("yj"))
    s = (
        a.join(b, keys)
        .where(F.col("xj") > F.col("xi"))
        .groupBy(*keys)
        .agg(
            F.sum(
                F.when(F.col("yj") > F.col("yi"), 1)
                .when(F.col("yj") < F.col("yi"), -1)
                .otherwise(0)
            ).cast("long").alias("s_stat"),
            F.count("*").cast("long").alias("n_pairs"),
        )
    )
    nk = base.groupBy(*keys).agg(F.count("*").cast("long").alias("n"))
    t = F.col("t")
    ties = (
        base.groupBy(*keys, "y")
        .agg(F.count("*").cast("long").alias("t"))
        .groupBy(*keys)
        .agg(
            F.sum(t * (t - 1) * (2 * t + 5)).cast("long").alias("tvar"),
            F.sum(t * (t - 1)).cast("long").alias("tx2"),
        )
    )
    j = nk.join(s, keys).join(ties, keys)

    n = F.col("n")
    varnum = n * (n - 1) * (2 * n + 5) - F.col("tvar")  # 18 * Var(S)
    d2 = n * (n - 1)  # 2 * D
    var_s = varnum.cast("double") / F.lit(18.0)
    sd = F.col("s_stat").cast("double")
    z = (
        F.when(F.col("s_stat") > 0, (sd - 1.0) / F.sqrt(var_s))
        .when(F.col("s_stat") < 0, (sd + 1.0) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    tau_b = sd / F.nullif(
        F.sqrt(
            ((d2 - F.col("tx2")).cast("double") / F.lit(2.0))
            * (d2.cast("double") / F.lit(2.0))
        ),
        F.lit(0.0),
    )

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return j.select(
        *keys,
        "n",
        "n_pairs",
        "s_stat",
        rnd(var_s).alias("var_s"),
        rnd(tau_b).alias("tau_b"),
        rnd(z).alias("z"),
        F.when(z > F.lit(MK_Z_CRIT), F.lit("increasing"))
        .when(z < F.lit(-MK_Z_CRIT), F.lit("decreasing"))
        .otherwise(F.lit("none"))
        .alias("trend"),
    )
