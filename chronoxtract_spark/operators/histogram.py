"""Fixed-width value histograms and per-group exact heavy hitters —
the two distribution summaries a metrics tier serves beside its
quantile sketches (rollup_quantiles covers the sketch side; these are
the exact-bucket and exact-top-k sides).

Scale shape
-----------
``value_histogram``: one map-side bin projection (a single division +
floor, no UDF) then one (key, bin) hash aggregation — fully
map-side-combinable, output bounded by key-count x bin-count.
Clipping rows outside [lo, hi) is a pushed filter.

``top_items``: two-stage — (key, item) counts in one shuffle, then a
rank window partitioned by key over the (much smaller) count table.
Ties round-robin by item ascending (pinned).

Oracle determinism: bin indices are ONE shared float expression
(``floor((v - lo) / width)``) over identical doubles; counts exact;
ranks compare exact integers then strings. Bit-exact, no rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def value_histogram(
    df: DataFrame,
    keys: list[str] | str,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Fixed-width histogram of ``value_col`` over ``[lo, hi)`` per
    key: ``n_bins`` equal bins, rows outside the range dropped (the
    pinned convention — emit them to a separate overflow query if
    needed). Empty bins do not emit rows.

    Returns ``keys..., bin, bin_lo, bin_hi, n`` with ``bin_lo/hi``
    computed as ``lo + bin * width`` (one shared expression tree).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not (n_bins >= 1 and hi > lo):
        raise ValueError("need n_bins >= 1 and hi > lo")
    width = (float(hi) - float(lo)) / float(n_bins)
    v = F.col(value_col).cast("double")
    bin_idx = F.floor((v - F.lit(float(lo))) / F.lit(width)).cast("long")
    return (
        df.where((v >= float(lo)) & (v < float(hi)))
        .select(*keys, bin_idx.alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            *keys, "bin",
            (F.lit(float(lo)) + F.col("bin") * F.lit(width)).alias("bin_lo"),
            (F.lit(float(lo)) + (F.col("bin") + 1) * F.lit(width))
            .alias("bin_hi"),
            "n",
        )
    )


def top_items(
    df: DataFrame,
    keys: list[str] | str,
    item_col: str,
    k: int,
) -> DataFrame:
    """Exact top-``k`` most frequent ``item_col`` values per key
    (count DESC, item ASC on ties — pinned).

    Returns ``keys..., item, n, rank``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    counts = df.groupBy(*keys, F.col(item_col).alias("item")).agg(
        F.count("*").cast("long").alias("n")
    )
    rank = F.row_number().over(
        Window.partitionBy(*keys).orderBy(F.desc("n"), F.asc("item"))
    )
    return (
        counts.withColumn("rank", rank.cast("long"))
        .where(F.col("rank") <= int(k))
    )
