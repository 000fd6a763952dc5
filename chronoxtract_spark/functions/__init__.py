"""Spark Column expression builders for the SQL-native feature set.

Everything here stays JVM-side (whole-stage codegen, partial+final
hash aggregation) — no Python in the hot path. Each builder mirrors a
reference kernel exactly (citations in docstrings); the kernels in
``chronoxtract_spark.kernel`` are the parity oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: degenerate-spread guard for skew/kurt (reference: src/stats/mod.rs:49)
EPS_STD = 1e-9


def summary_agg_exprs(c: str = "value", exact_quantiles: bool = True) -> list[Column]:
    """The 16-column ``time_series_summary`` feature vector as one
    aggregation pass (reference: src/lib.rs:58-99, src/stats/mod.rs:21-114).

    - variance/std are population (÷n)            [src/stats/mod.rs:46]
    - skew / excess kurt nulled when std <= 1e-9  [src/stats/mod.rs:49-64]
    - median & quantiles: exact ``percentile`` (same linear interpolation
      at q*(n-1) as the reference) when ``exact_quantiles``, else
      t-digest ``approx_percentile`` for mergeable rollup tiers
    - mode is computed separately (``mode_agg``) — it needs a value-level
      pre-aggregation to get the deterministic smallest-value tie-break

    Returns a list of aliased Columns for ``df.groupBy(...).agg(*cols)``.
    """
    col = F.col(c)
    std = F.stddev_pop(col)
    guard = std > EPS_STD
    if exact_quantiles:
        med = F.percentile(col, F.lit(0.5))
        qs = F.percentile(col, F.array(*[F.lit(q) for q in (0.05, 0.25, 0.75, 0.95)]))
    else:
        med = F.percentile_approx(col, F.lit(0.5), F.lit(10000))
        qs = F.percentile_approx(
            col, F.array(*[F.lit(q) for q in (0.05, 0.25, 0.75, 0.95)]), F.lit(10000)
        )
    return [
        F.avg(col).alias("mean"),
        med.alias("median"),
        F.var_pop(col).alias("variance"),
        std.alias("std_dev"),
        F.when(guard, F.skewness(col)).alias("skewness"),
        F.when(guard, F.kurtosis(col)).alias("kurtosis"),
        F.min(col).alias("min"),
        F.max(col).alias("max"),
        (F.max(col) - F.min(col)).alias("range"),
        qs[0].alias("q05"),
        qs[1].alias("q25"),
        qs[2].alias("q75"),
        qs[3].alias("q95"),
        F.sum(col).alias("sum"),
        F.sum(col * col).alias("absolute_energy"),
        F.count(col).alias("n"),
    ]


def moment_state_exprs(c: str = "value") -> list[Column]:
    """Mergeable raw-moment state ``(n, s1..s4, min, max)`` mirroring the
    reference's fused single-pass accumulator (src/stats/mod.rs:25-43).

    1m-tier rows carry these; 1h/1d tiers re-derive every moment feature
    by *summing* them — plain column arithmetic, no re-scan of the base
    data (SURVEY.md §4.3).
    """
    return moment_state_exprs_for(F.col(c))


def moment_state_exprs_for(col: Column) -> list[Column]:
    """Same mergeable state over an arbitrary column expression (used
    by the streaming tier, where the value may be a literal weight)."""
    return [
        F.count(col).alias("n"),
        F.sum(col).alias("s1"),
        F.sum(col * col).alias("s2"),
        F.sum(col * col * col).alias("s3"),
        F.sum(col * col * col * col).alias("s4"),
        F.min(col).alias("min"),
        F.max(col).alias("max"),
    ]


def moments_from_state(prefix: str = "") -> dict[str, Column]:
    """Derive mean/variance/std/skew/kurt/range/sum/energy from (possibly
    re-summed) raw-moment state columns (src/stats/mod.rs:40-64)."""
    n = F.col(f"{prefix}n")
    m1 = F.col(f"{prefix}s1") / n
    m2 = F.col(f"{prefix}s2") / n
    m3 = F.col(f"{prefix}s3") / n
    m4 = F.col(f"{prefix}s4") / n
    var = m2 - m1 * m1
    std = F.sqrt(var)
    mu3 = m3 - 3 * m1 * m2 + 2 * F.pow(m1, 3)
    mu4 = m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * F.pow(m1, 4)
    guard = std > EPS_STD
    return {
        "mean": m1,
        "variance": var,
        "std_dev": std,
        "skewness": F.when(guard, mu3 / F.pow(var, 1.5)),
        "kurtosis": F.when(guard, mu4 / (var * var) - 3.0),
        "min": F.col(f"{prefix}min"),
        "max": F.col(f"{prefix}max"),
        "range": F.col(f"{prefix}max") - F.col(f"{prefix}min"),
        "sum": F.col(f"{prefix}s1"),
        "absolute_energy": F.col(f"{prefix}s2"),
    }


def mode_agg(df, group_cols: list[str], c: str = "value", out: str = "mode"):
    """Deterministic mode: most frequent value, smallest value on ties
    (reference src/stats/mod.rs:116-130 counts bit-exact values but its
    tie-break is HashMap order — we pin smallest-value, SURVEY.md §7.3).

    Two-stage aggregation (value-level count, then max_by on
    (count, -value)) — both stages are partial-aggregable, so the
    shuffle volume is bounded by distinct values per group.
    """
    counted = df.groupBy(*group_cols, c).agg(F.count("*").alias("_cnt"))
    pick = F.max_by(
        F.col(c), F.struct(F.col("_cnt"), (-F.col(c)).alias("_neg"))
    ).alias(out)
    return counted.groupBy(*group_cols).agg(pick)


def hjorth_agg_exprs(d1: str = "_d1", d2: str = "_d2", c: str = "value") -> list[Column]:
    """Hjorth activity/mobility/complexity from precomputed first/second
    difference columns (reference: src/higherorder/mod.rs:115-173).

    ``d1``/``d2`` come from ``with_diff_columns``; var is population.
    Degenerate guards: mobility 0 when activity<=0; complexity 1 when
    the difference variance or mobility is <=0.
    """
    act = F.var_pop(F.col(c))
    v1 = F.var_pop(F.col(d1))
    v2 = F.var_pop(F.col(d2))
    mobility = F.when(act > 0, F.sqrt(v1 / act)).otherwise(F.lit(0.0))
    complexity = (
        F.when(v1 <= 0, F.lit(1.0))
        .when(mobility <= 0, F.lit(1.0))
        .otherwise(F.sqrt(v2 / v1) / mobility)
    )
    return [
        act.alias("hjorth_activity"),
        mobility.alias("hjorth_mobility"),
        complexity.alias("hjorth_complexity"),
    ]


def slope_agg_exprs(d1: str = "_d1") -> list[Column]:
    """(mean_slope, slope_variance ÷n, max |slope|) over first differences
    (reference: src/shape/mod.rs:196-222)."""
    d = F.col(d1)
    return [
        F.avg(d).alias("mean_slope"),
        F.var_pop(d).alias("slope_variance"),
        F.max(F.abs(d)).alias("max_slope"),
    ]


def zero_crossing_agg_exprs(c: str = "value", prev: str = "_prev") -> list[Column]:
    """Sign changes with the 0-is-positive convention / (n-1)
    (reference: src/shape/mod.rs:180-194)."""
    cur_pos = F.col(c) >= 0
    prev_pos = F.col(prev) >= 0
    crossings = F.sum(
        F.when(F.col(prev).isNotNull() & (cur_pos != prev_pos), 1).otherwise(0)
    )
    return [(crossings / (F.count(c) - 1)).alias("zero_crossing_rate")]


def turning_points_agg_exprs(
    c: str = "value", prev: str = "_prev", nxt: str = "_next"
) -> list[Column]:
    """Strict local extrema count and rate ÷(n-2)
    (reference: src/shape/mod.rs:439-459)."""
    mid, left, right = F.col(c), F.col(prev), F.col(nxt)
    is_tp = (
        left.isNotNull()
        & right.isNotNull()
        & (((mid > left) & (mid > right)) | ((mid < left) & (mid < right)))
    )
    cnt = F.sum(F.when(is_tp, 1).otherwise(0))
    return [
        cnt.alias("num_turning_points"),
        (cnt / (F.count(c) - 2)).alias("turning_point_rate"),
    ]


def fvar_agg_exprs(flux: str = "flux", err: str = "err") -> list[Column]:
    """Fractional variability + Vaughan et al. (2003) error as pure
    column expressions (reference: src/misc/frac.rs:12-89).

    S^2 is the **sample** variance (÷ n-1, src/misc/frac.rs:31-35).
    Branches: NaN when mean flux is 0; 0 when noise dominates.
    """
    f, e = F.col(flux), F.col(err)
    n = F.count(f)
    mean_f = F.avg(f)
    var_s = F.var_samp(f)
    mean_e2 = F.avg(e * e)
    excess = var_s - mean_e2
    fvar = F.sqrt(excess) / mean_f
    fvar_expr = (
        F.when(mean_f == 0, F.lit(float("nan")))
        .when(excess <= 0, F.lit(0.0))
        .otherwise(fvar)
    )
    term1 = F.sqrt(1.0 / (2 * n)) * mean_e2 / (mean_f * mean_f * fvar)
    term2 = F.sqrt(mean_e2 / n) / mean_f
    err_expr = (
        F.when(mean_f == 0, F.lit(float("nan")))
        .when(excess <= 0, F.lit(0.0))
        .otherwise(F.sqrt(term1 * term1 + term2 * term2))
    )
    return [fvar_expr.alias("fvar"), err_expr.alias("fvar_err")]


def with_diff_columns(df, group_col: str, order_cols: list[str], c: str = "value"):
    """Attach lag/lead/difference helper columns (_prev, _next, _d1, _d2)
    via one window pass — the Spark mirror of every ``x[i]-x[i-1]`` loop
    in the reference (SURVEY.md §2.5 ranking note)."""
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col).orderBy(*order_cols)
    df = (
        df.withColumn("_prev", F.lag(c).over(w))
        .withColumn("_next", F.lead(c).over(w))
        .withColumn("_d1", F.col(c) - F.col("_prev"))
    )
    return df.withColumn("_d2", F.col("_d1") - F.lag("_d1").over(w))
