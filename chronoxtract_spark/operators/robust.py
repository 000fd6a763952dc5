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


def robust_location(
    df: DataFrame,
    key_col: str = "conv_id",
    value_col: str = "value",
    trim_frac: int = 10,
    z_cut: float = 3.5,
    scale: int = 2,
    round_digits: int | None = 6,
) -> DataFrame:
    """Classical robust-location battery per key — the outlier-proof
    siblings of the mean/stddev the tier tables carry: exact median,
    MAD (median absolute deviation), the 1/``trim_frac``-trimmed and
    winsorized means, and the count of modified-z outliers
    (|0.6745 (x - med) / MAD| > ``z_cut``, the Iglewicz-Hoaglin
    screen). One bursty order can drag a mean and explode a stddev;
    none of these move.

    Exactness — the doubled-median trick, twice: with integer cents,
    m2 = 2*median is ALWAYS an integer (odd n: 2 x_mid; even n:
    x_a + x_b), so d2_i = |2 x_i - m2| = 2|x_i - med| is exact int64,
    and mad4 = 2*median(d2) is again exact — median and MAD carry NO
    float until the final unit rescale. The trimmed mean drops
    k = min(n // trim_frac, (n-1) // 2) ranks from each end (capped so
    the kept middle is never empty; exact integer sum over the kept
    ranks, one division); the winsorized mean clamps them to
    the surviving boundary order statistics x_(k+1) / x_(n-k) (exact
    integer sum identity: middle + k*(x_(k+1) + x_(n-k))). The
    outlier test clears its divisions: z > cut iff
    2*0.6745*d2 > cut*mad4, two shared literals on exact integers —
    identical booleans in both engines. MAD = 0 (over half the values
    at the median) nulls the outlier count, the standard degeneracy.

    One rank window on the key shuffle, one derived-rank window for
    the MAD median, one aggregate. No UDF. Returns ``key, n, median,
    mad, trimmed_mean, winsor_mean, n_outliers``.
    """
    if trim_frac < 2:
        raise ValueError(f"trim_frac must be >= 2, got {trim_frac}")
    unit = 10 ** scale
    d = df.select(
        F.col(key_col).alias("_k"),
        F.round(F.col(value_col) * F.lit(unit), 0).cast("long").alias("_v"),
    )
    w = Window.partitionBy("_k").orderBy("_v")
    wall = Window.partitionBy("_k")
    ranked = d.select(
        "_k",
        "_v",
        F.row_number().over(w).cast("long").alias("r"),
        F.count("*").over(wall).alias("n"),
    )

    def med2(vcol, rcol, ncol):
        """2 * median as conditional sums over ranked rows."""
        lo = (F.col(ncol) + F.lit(1)) / F.lit(2)
        hi = (F.col(ncol) + F.lit(2)) / F.lit(2)
        lo = lo.cast("long")
        hi = hi.cast("long")
        return F.sum(
            F.when(F.col(rcol) == lo, F.col(vcol)).otherwise(F.lit(0))
            + F.when(
                (F.col(rcol) == hi) & (hi != lo), F.col(vcol)
            ).otherwise(F.lit(0))
            + F.when(
                (F.col(rcol) == lo) & (hi == lo), F.col(vcol)
            ).otherwise(F.lit(0))
        )

    # k is capped at (n-1)//2 so the kept middle is never empty
    k_ = F.least(
        (F.col("n") / F.lit(trim_frac)).cast("long"),
        ((F.col("n") - F.lit(1)) / F.lit(2)).cast("long"),
    )
    stats = ranked.groupBy("_k").agg(
        F.max("n").alias("n"),
        med2("_v", "r", "n").alias("m2"),
        F.max(k_).alias("kk"),
        F.sum(
            F.when(
                (F.col("r") > k_) & (F.col("r") <= F.col("n") - k_),
                F.col("_v"),
            ).otherwise(F.lit(0))
        ).alias("mid_sum"),
        F.max(F.when(F.col("r") == k_ + F.lit(1), F.col("_v"))).alias(
            "x_lo"
        ),
        F.max(
            F.when(F.col("r") == F.col("n") - k_, F.col("_v"))
        ).alias("x_hi"),
    )
    d2 = ranked.join(stats.select("_k", "m2"), "_k").select(
        "_k",
        "_v",
        F.abs(F.lit(2) * F.col("_v") - F.col("m2")).alias("d2"),
    )
    w2 = Window.partitionBy("_k").orderBy("d2")
    ranked2 = d2.select(
        "_k",
        "d2",
        F.row_number().over(w2).cast("long").alias("r"),
        F.count("*").over(Window.partitionBy("_k")).alias("n"),
    )
    madagg = ranked2.groupBy("_k").agg(med2("d2", "r", "n").alias("mad4"))
    # outlier count: z > cut  <=>  2*0.6745*d2 > cut*mad4
    outs = (
        d2.join(madagg, "_k")
        .groupBy("_k")
        .agg(
            F.max("mad4").alias("mad4"),
            F.sum(
                F.when(
                    F.lit(2.0 * 0.6745) * F.col("d2").cast("double")
                    > F.lit(float(z_cut)) * F.col("mad4").cast("double"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_out"),
        )
    )
    uf = F.lit(float(unit))
    nd = F.col("n").cast("double")
    kept = (F.col("n") - F.lit(2) * F.col("kk")).cast("double")
    trimmed = F.col("mid_sum").cast("double") / (kept * uf)
    winsor = (
        F.col("mid_sum")
        + F.col("kk") * (F.col("x_lo") + F.col("x_hi"))
    ).cast("double") / (nd * uf)

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return (
        stats.join(outs, "_k")
        .select(
            F.col("_k").alias(key_col),
            "n",
            rnd(F.col("m2").cast("double") / (F.lit(2.0) * uf)).alias(
                "median"
            ),
            rnd(
                F.col("mad4").cast("double") / (F.lit(4.0) * uf)
            ).alias("mad"),
            rnd(trimmed).alias("trimmed_mean"),
            rnd(winsor).alias("winsor_mean"),
            F.when(F.col("mad4") > 0, F.col("n_out")).alias("n_outliers"),
        )
    )
