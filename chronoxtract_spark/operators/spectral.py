"""Frequency-domain summary statistics over the Welch PSD.

``welch_psd_frame`` exposes the kernel Welch periodogram
(kernel/fda.py:welch_power — the north-star 'Welch/FFT spectral
power' block) as a per-(key, frequency-bin) DataFrame;
``spectral_summary`` reduces it to the three numbers an ops screen
actually reads:

- ``spectral_entropy`` — Shannon entropy of the normalized one-sided
  PSD over the non-DC bins, divided by ln(n_bins) to land in [0, 1]:
  ~1 white/flat, -> 0 a single dominant tone. The frequency-domain
  sibling of the time-domain entropy_battery.
- ``spectral_flatness`` — Wiener entropy, geometric/arithmetic PSD
  mean; 1 flat, -> 0 peaky; exactly 0 when any bin is zero.
- ``dominant_k`` / ``dominant_share`` — the argmax bin (ties pinned
  by ascending k) and its share of total non-DC power, the 'is there
  one clock driving this series' reading beside seasonality_acf /
  phase_fold (which need the period hypothesized; this reads it off).

Determinism/exactness: the kernel PSD is quantized to 6 decimals
FIRST (the same quantize-then-compute contract the embedding audit
uses), so both engines fold IDENTICAL doubles: every sum is a
k-sorted sequential fold, the entropy/flatness chains are pinned,
and the DuckDB oracle (the welch cos/sin-grid SQL wrapped as a CTE)
matches bit-for-bit. DC (k = 0) is excluded — segments are
mean-detrended so bin 0 carries only rounding dust.

Scale shape: the PSD frame is one applyInPandas over the key shuffle
(Arrow-batched kernel, 33 rows out per key regardless of length);
the summary is one bounded per-key fold. Keys shorter than one
64-sample segment emit nothing (the kernel would shrink nperseg; the
fixed-grid oracle can't — aligned by exclusion, same as welch_psd).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

NPERSEG = 64


def welch_psd_frame(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("event_id",),
    nperseg: int = NPERSEG,
    round_digits: int | None = 6,
) -> DataFrame:
    """One-sided Welch PSD rows ``key, k, psd`` per key (fixed
    ``nperseg`` grid; sub-segment keys emit nothing)."""
    from ..kernel import fda as k_fda

    cols = [key_col, ts_col, *order_cols, value_col]
    ev = df.select(*cols)
    sort_cols = [ts_col, *order_cols]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        x = pdf["" + value_col].to_numpy(np.float64)
        if x.size < nperseg:
            return pd.DataFrame(
                {key_col: [], "k": [], "psd": []}
            ).astype({"k": "int32", "psd": "float64"})
        psd = k_fda.welch_power(x, nperseg=nperseg)
        return pd.DataFrame(
            {
                key_col: pdf[key_col].iloc[0],
                "k": np.arange(psd.size, dtype=np.int32),
                "psd": psd,
            }
        )

    out = ev.groupBy(key_col).applyInPandas(
        fn, schema=f"{key_col} string, k int, psd double"
    )
    psd = (
        F.round("psd", round_digits)
        if round_digits is not None
        else F.col("psd")
    )
    return out.select(key_col, "k", psd.alias("psd"))


def spectral_summary(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("event_id",),
    nperseg: int = NPERSEG,
    round_digits: int | None = 6,
) -> DataFrame:
    """Per-key spectral entropy / flatness / dominant bin over the
    quantized Welch PSD (see module docstring). Returns ``key,
    n_bins, spectral_entropy, spectral_flatness, dominant_k,
    dominant_share``."""
    psd = welch_psd_frame(
        df,
        key_col=key_col,
        ts_col=ts_col,
        value_col=value_col,
        order_cols=order_cols,
        nperseg=nperseg,
        round_digits=6,  # quantize-then-compute: both engines fold these
    ).where(F.col("k") >= 1)
    n_bins = nperseg // 2  # k = 1 .. nperseg/2
    ln_m = math.log(float(n_bins))

    wtop = Window.partitionBy(key_col).orderBy(
        F.col("psd").desc(), F.col("k").asc()
    )
    ranked = psd.select(
        key_col, "k", "psd", F.row_number().over(wtop).alias("_r")
    )
    agg = ranked.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_bins"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("k", "psd"))),
            F.lit(0.0),
            lambda acc, s: acc + s["psd"],
        ).alias("_s"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("k", "psd"))),
            F.lit(0.0),
            lambda acc, s: acc
            + F.when(
                s["psd"] > F.lit(0.0), s["psd"] * F.log(s["psd"])
            ).otherwise(F.lit(0.0)),
        ).alias("_plnp"),
        F.min(F.col("psd")).alias("_pmin"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("k", "psd"))),
            F.lit(0.0),
            lambda acc, s: acc
            + F.when(s["psd"] > F.lit(0.0), F.log(s["psd"])).otherwise(
                F.lit(0.0)
            ),
        ).alias("_lsum"),
        F.max(F.when(F.col("_r") == 1, F.col("k"))).alias("dominant_k"),
        F.max(F.when(F.col("_r") == 1, F.col("psd"))).alias("_pdom"),
    )
    valid = F.col("_s") > F.lit(0.0)
    nd = F.col("n_bins").cast("double")
    # H = (ln S - plnp/S) / ln m  — one pinned chain over the folds
    entropy = F.when(
        valid,
        (F.log(F.col("_s")) - F.col("_plnp") / F.col("_s")) / F.lit(ln_m),
    )
    flatness = F.when(
        valid,
        F.when(
            F.col("_pmin") > F.lit(0.0),
            F.exp(F.col("_lsum") / nd) / (F.col("_s") / nd),
        ).otherwise(F.lit(0.0)),
    )
    share = F.when(valid, F.col("_pdom") / F.col("_s"))

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return agg.select(
        F.col(key_col),
        "n_bins",
        rnd(entropy).alias("spectral_entropy"),
        rnd(flatness).alias("spectral_flatness"),
        F.when(valid, F.col("dominant_k")).alias("dominant_k"),
        rnd(share).alias("dominant_share"),
    )
