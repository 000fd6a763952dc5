"""Visualization-tier downsampling: M4 aggregation and
largest-triangle-three-buckets (LTTB) — the two standard answers to
"render a billion-point series as a thousand-point line without lying"
(M4: Jugel et al., VLDB 2014; LTTB: Steinarsson 2013).

The reference repo computes features OF a series; a serving tier also
has to SHIP the series to a chart, and raw point counts at the 1m tier
(1440/day/key) blow past any canvas. These two operators produce the
standard reduced forms.

Scale shape
-----------
``m4_downsample``: ONE hash shuffle on (keys, bucket) and a window
sort inside each bucket partition; the four extreme points come out of
conditional aggregates over rank columns (no second pass, no join, no
UDF). Per-bucket state is O(1).

``lttb_downsample``: the triangle recurrence is sequential BY DESIGN
(each bucket's pick depends on the previous pick), so it runs as a
per-series Arrow kernel via ``applyInPandas`` — the repo's standard
move for irreducibly sequential recurrences (ewma/gapfill precedent).
One shuffle on the series key; each series is one grouped batch, and
the loop is over OUTPUT buckets (n_out, small by construction), with
the per-bucket argmax vectorized in numpy.

Oracle determinism
------------------
M4 is exact: integer bucket arithmetic, min/max/first/last over exact
values with ties pinned by (t, v) ordering. LTTB's triangle areas are
computed with ONE pinned IEEE expression tree — the kernel evaluates
``|(ta - tb)*(v - va) - (ta - t)*(vb - va)|`` with the exact same
operand order as the DuckDB oracle's lateral walk, every input is
either an exact integer (microsecond timestamps) or a short float
chain from exact integers, and the per-bucket argmax breaks ties
toward the earliest timestamp, so both engines select identical
points.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)


from chronoxtract_spark.operators._util import keylist as _keylist


def m4_downsample(
    df: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    value_col: str,
    bucket_s: int,
) -> DataFrame:
    """M4 aggregation: per (key, time bucket) keep the four points a
    pixel-column line rendering actually needs — first, last, min and
    max — with their timestamps. Buckets are epoch-aligned
    ``bucket_s``-second spans.

    Tie pins (documented, both engines): first/last by (t, v)
    ordering; the min/max rows take the EARLIEST timestamp attaining
    the extreme value.

    Returns per bucket: ``keys..., bucket_ts, n, t_first, v_first,
    t_last, v_last, t_min, v_min, t_max, v_max``.
    """
    keys = _keylist(keys)
    bucket_us = int(bucket_s) * 1_000_000
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = df.select(
        *keys, t_us.alias("t_us"), F.col(value_col).alias("v")
    ).withColumn("bucket", F.expr(f"t_us DIV {bucket_us}"))

    wb = Window.partitionBy(*keys, "bucket")
    r_first = F.row_number().over(wb.orderBy("t_us", "v"))
    r_last = F.row_number().over(wb.orderBy(F.desc("t_us"), F.desc("v")))
    r_min = F.row_number().over(wb.orderBy("v", "t_us"))
    r_max = F.row_number().over(wb.orderBy(F.desc("v"), "t_us"))

    ranked = base.select(
        *keys, "bucket", "t_us", "v",
        r_first.alias("rf"), r_last.alias("rl"),
        r_min.alias("rmin"), r_max.alias("rmax"),
    )

    def pick(rank_col: str, src: str):
        return F.max(F.when(F.col(rank_col) == 1, F.col(src)))

    return (
        ranked.groupBy(*keys, "bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.timestamp_micros(pick("rf", "t_us")).alias("t_first"),
            pick("rf", "v").alias("v_first"),
            F.timestamp_micros(pick("rl", "t_us")).alias("t_last"),
            pick("rl", "v").alias("v_last"),
            F.timestamp_micros(pick("rmin", "t_us")).alias("t_min"),
            pick("rmin", "v").alias("v_min"),
            F.timestamp_micros(pick("rmax", "t_us")).alias("t_max"),
            pick("rmax", "v").alias("v_max"),
        )
        .select(
            *keys,
            F.timestamp_micros(F.col("bucket") * bucket_us).alias("bucket_ts"),
            "n", "t_first", "v_first", "t_last", "v_last",
            "t_min", "v_min", "t_max", "v_max",
        )
    )


def lttb_downsample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    n_out: int,
) -> DataFrame:
    """Largest-triangle-three-buckets downsampling to ``n_out`` points
    per series (Steinarsson 2013): the first and last points are kept;
    the ``n_out - 2`` interior points are split into equal-count
    integer buckets (point ``j`` of ``m`` interior points lands in
    bucket ``j * B // m``), and each bucket keeps the point forming
    the largest triangle with the PREVIOUSLY SELECTED point and the
    centroid of the next bucket (the final point stands in as the last
    "next" target). Area ties pick the earliest timestamp. Duplicate
    timestamps within a series collapse to their MIN value first
    (pinned, same convention as interpolate_grid).

    Series with ``n <= n_out`` pass through complete. Returns
    ``key, sel_idx, ts, value`` — ``sel_idx`` is the 0-based output
    position.
    """
    import numpy as np

    if n_out < 3:
        raise ValueError("n_out must be >= 3")

    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("sel_idx", LongType()),
            StructField("t_us", LongType()),
            StructField("value", DoubleType()),
        ]
    )
    nb = n_out - 2

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["t_us", "v"], kind="mergesort")
        # duplicate-timestamp pin: keep the min value per instant
        pdf = pdf.drop_duplicates("t_us", keep="first")
        key = pdf["key"].iloc[0]
        t = pdf["t_us"].to_numpy(dtype=np.int64)
        v = pdf["v"].to_numpy(dtype=np.float64)
        n = len(t)
        if n <= n_out:
            return pd.DataFrame(
                {"key": key, "sel_idx": np.arange(n, dtype=np.int64),
                 "t_us": t, "value": v}
            )
        # interior points 1..n-2 -> buckets j*nb // (n-2), j = idx-1
        j = np.arange(n - 2, dtype=np.int64)
        b = (j * nb) // (n - 2)
        # split timestamps for overflow-free exact sums: an int64 sum
        # of epoch-us values (~1.7e15 each) wraps past ~5400 elements,
        # silently poisoning the centroid on large buckets. High/low
        # partial sums stay far under int64 range at any bucket size
        # and recombine into an exact Python int.
        t_hi, t_lo_part = t >> 20, t & ((1 << 20) - 1)
        sel_t = np.empty(n_out, dtype=np.int64)
        sel_v = np.empty(n_out, dtype=np.float64)
        sel_t[0], sel_v[0] = t[0], v[0]
        sel_t[-1], sel_v[-1] = t[-1], v[-1]
        starts = np.searchsorted(b, np.arange(nb))
        ends = np.searchsorted(b, np.arange(nb), side="right")
        for i in range(nb):
            lo, hi = starts[i] + 1, ends[i] + 1  # series index range
            if i < nb - 1:
                nlo, nhi = starts[i + 1] + 1, ends[i + 1] + 1
                # exact integer sum (recombined from the split partial
                # sums), round to double, THEN divide — the oracle's
                # sum(t_us)::DOUBLE / count order. A float64 sum loses
                # bits past 2^53 and Python's one-step int/int division
                # rounds differently than double(S)/n by up to 1 ulp.
                t_sum = (int(np.sum(t_hi[nlo:nhi])) << 20) + int(
                    np.sum(t_lo_part[nlo:nhi])
                )
                tb = float(float(t_sum) / (nhi - nlo))
                vb = float(np.sum(v[nlo:nhi]) / (nhi - nlo))
            else:
                tb, vb = float(t[-1]), float(v[-1])
            ta, va = float(sel_t[i]), float(sel_v[i])
            # pinned expression tree — mirrored verbatim in the oracle
            area = np.abs(
                (ta - tb) * (v[lo:hi] - va) - (ta - t[lo:hi]) * (vb - va)
            )
            best = lo + int(np.argmax(area))  # argmax: first (earliest t)
            sel_t[i + 1], sel_v[i + 1] = t[best], v[best]
        return pd.DataFrame(
            {"key": key, "sel_idx": np.arange(n_out, dtype=np.int64),
             "t_us": sel_t, "value": sel_v}
        )

    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = df.select(
        F.col(key_col).cast("string").alias("key"),
        t_us.alias("t_us"),
        F.col(value_col).cast("double").alias("v"),
    )
    out = base.groupBy("key").applyInPandas(kernel, out_schema)
    return out.select(
        "key", "sel_idx",
        F.timestamp_micros("t_us").alias("ts"),
        "value",
    )


def ohlc_bars(
    df: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    value_col: str,
    bar_s: int,
) -> DataFrame:
    """Candlestick resampling: open/high/low/close per epoch-aligned
    ``bar_s``-second bar — the finance-standard projection of the M4
    machinery (open/close by (t, v) order pins, high/low as plain
    extremes), plus ``n`` and the exact value sum. One (key, bar)
    shuffle, same rank-column plan as ``m4_downsample``.

    Returns ``keys..., bar_ts, n, open, high, low, close, sum_v``.
    """
    keys = _keylist(keys)
    bar_us = int(bar_s) * 1_000_000
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = df.select(
        *keys, t_us.alias("t_us"), F.col(value_col).alias("v")
    ).withColumn("bar", F.expr(f"t_us DIV {bar_us}"))
    wb = Window.partitionBy(*keys, "bar")
    r_first = F.row_number().over(wb.orderBy("t_us", "v"))
    r_last = F.row_number().over(wb.orderBy(F.desc("t_us"), F.desc("v")))
    ranked = base.select(
        *keys, "bar", "t_us", "v",
        r_first.alias("rf"), r_last.alias("rl"),
    )
    return (
        ranked.groupBy(*keys, "bar")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.max(F.when(F.col("rf") == 1, F.col("v"))).alias("open"),
            F.max("v").alias("high"),
            F.min("v").alias("low"),
            F.max(F.when(F.col("rl") == 1, F.col("v"))).alias("close"),
            F.sum("v").alias("sum_v"),
        )
        .select(
            *keys,
            F.timestamp_micros(F.col("bar") * bar_us).alias("bar_ts"),
            "n", "open", "high", "low", "close", "sum_v",
        )
    )
