"""Distributed discrete correlation function (DCF / ACF).

The reference computes DCF with an O(n1*n2) nested loop per lag bin
(reference: src/correlation/dcf.rs:47-72). Spark-first, that pair
enumeration is a **range join**: pairs with ``lag = t2 - t1`` inside
``[lag_min, lag_max)`` land in bin ``floor((lag - lag_min)/width)``,
then one groupBy(bin) computes mean/stderr of the UDCF values
(SURVEY.md §2.3).

Join strategy: the smaller series side is broadcast when it fits
(series per group are bounded); for two huge series, pre-bucketing both
sides on ``floor(t / width)`` turns the theta-join into an equi-join on
neighboring buckets. ``acf_binned`` below implements that equi-join
form for the self-correlation case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _series_stats(df: DataFrame, v: str):
    """(mean, sample std) — sigma divides by n-1 (src/correlation/dcf.rs:37-38)."""
    return df.agg(
        F.avg(v).alias("mu"), F.stddev_samp(v).alias("sigma")
    )


def dcf_range_join(
    s1: DataFrame,
    s2: DataFrame,
    lag_min: float,
    lag_max: float,
    width: float,
    t: str = "t",
    v: str = "v",
    broadcast_s1: bool = True,
) -> DataFrame:
    """DCF via range join: returns (lag, correlation, error, n_pairs).

    Matches kernel.correlation.dcf exactly (same binning arithmetic,
    same sample-std normalization, empty bins absent).
    """
    st1 = s1.select(F.col(t).alias("t1"), F.col(v).alias("v1")).crossJoin(
        F.broadcast(_series_stats(s1, v).select(F.col("mu").alias("mu1"), F.col("sigma").alias("sg1")))
    )
    st2 = s2.select(F.col(t).alias("t2"), F.col(v).alias("v2")).crossJoin(
        F.broadcast(_series_stats(s2, v).select(F.col("mu").alias("mu2"), F.col("sigma").alias("sg2")))
    )
    left = F.broadcast(st1) if broadcast_s1 else st1
    # the theta join runs as BroadcastNestedLoopJoin; its parallelism is
    # the stream side's partition count, which AQE coalesces for small
    # inputs — pin it so the O(n1*n2) predicate work spreads over cores
    n_part = max(s2.sparkSession.sparkContext.defaultParallelism, 8)
    st2 = st2.repartition(n_part)
    lag = F.col("t2") - F.col("t1")
    n_bins = int((lag_max - lag_min) / width)
    pairs = left.join(
        st2, (lag >= lag_min) & (lag < lag_max), "inner"
    ).select(
        F.floor((lag - F.lit(lag_min)) / F.lit(width)).alias("bin"),
        (
            (F.col("v1") - F.col("mu1"))
            * (F.col("v2") - F.col("mu2"))
            / (F.col("sg1") * F.col("sg2"))
        ).alias("udcf"),
    ).filter(F.col("bin") < n_bins)
    return (
        pairs.groupBy("bin")
        .agg(
            F.avg("udcf").alias("correlation"),
            (F.stddev_samp("udcf") / F.sqrt(F.count("*"))).alias("error"),
            F.count("*").alias("n_pairs"),
        )
        .select(
            (F.lit(lag_min) + (F.col("bin") + 0.5) * F.lit(width)).alias("lag"),
            "correlation",
            "error",
            "n_pairs",
        )
    )


def acf_range_join(
    s: DataFrame,
    lag_min: float,
    lag_max: float,
    width: float,
    t: str = "t",
    v: str = "v",
) -> DataFrame:
    """ACF = DCF of the series with itself (src/correlation/acf.rs:5-12)."""
    return dcf_range_join(s, s, lag_min, lag_max, width, t, v)


def dcf_equi_binned(
    s1: DataFrame,
    s2: DataFrame,
    lag_min: float,
    lag_max: float,
    width: float,
    t: str = "t",
    v: str = "v",
) -> DataFrame:
    """DCF for series whose time stamps are exact multiples of ``width``
    (e.g. minute-bucketed counts): every pair lag is then an integer
    multiple of the bin width, so the theta join collapses to an
    **equi-join** on ``t1 + k*width`` for k = 0..n_bins-1 — O(n·n_bins)
    work instead of O(n1·n2), fully shuffle-parallel. Output is
    identical to ``dcf_range_join`` on such series (same bin centers,
    same sample-std normalization)."""
    n_bins = int((lag_max - lag_min) / width)
    st1 = s1.select(F.col(t).alias("t1"), F.col(v).alias("v1")).crossJoin(
        F.broadcast(
            _series_stats(s1, v).select(
                F.col("mu").alias("mu1"), F.col("sigma").alias("sg1")
            )
        )
    )
    st2 = s2.select(F.col(t).alias("t2"), F.col(v).alias("v2")).crossJoin(
        F.broadcast(
            _series_stats(s2, v).select(
                F.col("mu").alias("mu2"), F.col("sigma").alias("sg2")
            )
        )
    )
    expanded = st1.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin")
    ).withColumn("t2", F.col("t1") + F.lit(lag_min) + F.col("bin") * F.lit(width))
    joined = expanded.join(st2, "t2")
    return (
        joined.groupBy("bin")
        .agg(
            F.avg(
                (F.col("v1") - F.col("mu1"))
                * (F.col("v2") - F.col("mu2"))
                / (F.col("sg1") * F.col("sg2"))
            ).alias("correlation"),
            (
                F.stddev_samp(
                    (F.col("v1") - F.col("mu1"))
                    * (F.col("v2") - F.col("mu2"))
                    / (F.col("sg1") * F.col("sg2"))
                )
                / F.sqrt(F.count("*"))
            ).alias("error"),
            F.count("*").alias("n_pairs"),
        )
        .select(
            (F.lit(lag_min) + (F.col("bin") + 0.5) * F.lit(width)).alias("lag"),
            "correlation",
            "error",
            "n_pairs",
        )
    )


def acf_binned(
    s: DataFrame,
    max_lag_buckets: int,
    bucket_width: float,
    t: str = "t",
    v: str = "v",
) -> DataFrame:
    """Scale path for huge single series: quantize time into buckets of
    ``bucket_width``, aggregate per bucket, then equi-join bucketed
    copies on ``b2 - b1 = k`` for each k — shuffle-partitioned instead
    of broadcast, no theta join anywhere."""
    b = s.select(
        F.floor(F.col(t) / bucket_width).alias("b"), F.col(v).alias("x")
    ).groupBy("b").agg(F.avg("x").alias("x"))
    stats = b.agg(F.avg("x").alias("mu"), F.stddev_samp("x").alias("sg")).collect()[0]
    mu, sg = stats.mu, stats.sg
    left = b.select(F.col("b").alias("b1"), ((F.col("x") - mu) / sg).alias("z1"))
    right = b.select(F.col("b").alias("b2"), ((F.col("x") - mu) / sg).alias("z2"))
    lags = F.explode(
        F.sequence(F.lit(1), F.lit(max_lag_buckets))
    ).alias("k")
    expanded = left.select("b1", "z1", lags).withColumn("b2", F.col("b1") + F.col("k"))
    joined = expanded.join(right, "b2")
    return (
        joined.groupBy("k")
        .agg(F.avg(F.col("z1") * F.col("z2")).alias("correlation"), F.count("*").alias("n_pairs"))
        .select(
            (F.col("k") * bucket_width).alias("lag"), "correlation", "n_pairs"
        )
    )
