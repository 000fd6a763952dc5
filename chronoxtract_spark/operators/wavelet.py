"""Haar multiresolution wavelet-energy ladder per key.

``haar_energy`` decomposes each key's ordered value series with the
unnormalized Haar transform and reports, per key and per dyadic scale
level j (pair width 2^j samples):

- ``n_pairs`` — number of complete coefficient positions at the level.
- ``energy`` — sum of squared Haar detail coefficients
  d_p = (mean of left half-block - mean of right half-block) / 2.
- ``wavelet_var`` — energy / n_pairs, the Haar wavelet variance
  (Percival 1995): the value-domain counterpart of the Allan ladder in
  operators/cadence.py (Allan variance IS the Haar wavelet variance of
  the arrival-rate series). A flat series scores 0 at every level;
  white noise decays ~2x per level; long-memory series decay slower —
  the ladder's log-log slope estimates the Hurst exponent.
- ``energy_frac`` — the level's share of total detail energy across
  the ladder (a discrete scale spectrum).

Tail handling: level j uses the first 2^j * floor(n / 2^j) samples —
half-blocks are kept only when complete (cnt == h) and coefficient
positions only when both halves survive, which composes to exactly the
nested-cascade truncation floor(floor(.../2)/2) = floor(n / 2^j).

Exactness contract (the proven sorted-fold one): sample indexes come
from one row_number over (epoch-second, order_cols); each half-block
sum and each level's energy are sequential left folds over arrays
sorted by position; every detail coefficient is the fixed expression
(S_even - S_odd) / (2h) over those folded sums — in exact arithmetic
identical to the pairwise cascade, and as IEEE doubles identical
between Spark's ``F.aggregate`` and DuckDB's
``list_sum(list(... ORDER BY ...))`` because the fold orders match
term for term. ``round(6)`` is applied at the very end only.

Spark-first shape: the level ladder is exploded onto the rows before
any aggregation (the allan_variance trick), so the whole ladder costs
ONE (key, h, half-block) sum shuffle + two bounded partial-agg
groupBys + a broadcast-size per-key total join. No UDF anywhere; every
groupBy partial-aggregates map-side; level rows are bounded by
keys x levels, never by stream length.

Reference parity note: the reference's frequency family
(src/fda/mod.rs FFT / Lomb-Scargle) characterizes periodicity; this is
the scale-domain battery its engine-native siblings (Allan, DFA in
kernel/seasonality.py) bracket from the arrival and fluctuation sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ._util import epoch_seconds

#: (level j, half-width h = 2^(j-1)); pair width is 2h samples.
DEFAULT_LEVELS: tuple[tuple[int, int], ...] = ((1, 1), (2, 2), (3, 4), (4, 8))


def haar_energy(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    levels: tuple[tuple[int, int], ...] = DEFAULT_LEVELS,
    round_digits: int | None = 6,
) -> DataFrame:
    w = Window.partitionBy(key_col).orderBy(
        epoch_seconds(df, ts_col).asc(), *[F.col(c).asc() for c in order_cols]
    )
    base = df.select(
        F.col(key_col).alias("_k"),
        (F.row_number().over(w) - F.lit(1)).cast("long").alias("_i"),
        F.col(value_col).cast("double").alias("_x"),
    )

    ladder = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).cast("int").alias("level"),
                    F.lit(h).cast("long").alias("h"),
                )
                for j, h in levels
            ]
        )
    ).alias("lv")
    lad = base.select("_k", "_i", "_x", ladder).select(
        "_k",
        F.col("lv.level").alias("_lvl"),
        F.col("lv.h").alias("_h"),
        "_i",
        "_x",
    )

    # half-block sums, folded in sample order; incomplete tail
    # half-blocks dropped (cnt < h)
    hb = (
        lad.groupBy("_k", "_lvl", "_h", F.floor(F.col("_i") / F.col("_h")).alias("_q"))
        .agg(
            F.array_sort(F.collect_list(F.struct("_i", "_x"))).alias("arr"),
            F.count("*").cast("long").alias("cnt"),
        )
        .where(F.col("cnt") == F.col("_h"))
        .select(
            "_k",
            "_lvl",
            "_h",
            "_q",
            F.aggregate("arr", F.lit(0.0), lambda acc, x: acc + x["_x"]).alias("_s"),
        )
    )

    # coefficient positions: both halves must survive
    pairs = (
        hb.groupBy("_k", "_lvl", "_h", F.floor(F.col("_q") / 2).alias("_p"))
        .agg(
            F.max(F.when(F.col("_q") % 2 == 0, F.col("_s"))).alias("_se"),
            F.max(F.when(F.col("_q") % 2 == 1, F.col("_s"))).alias("_so"),
            F.count("*").alias("_np"),
        )
        .where(F.col("_np") == 2)
        .select(
            "_k",
            "_lvl",
            "_h",
            "_p",
            (
                (F.col("_se") - F.col("_so"))
                / (F.lit(2.0) * F.col("_h").cast("double"))
            ).alias("_d"),
        )
    )

    lev = pairs.groupBy("_k", "_lvl", "_h").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.array_sort(
            F.collect_list(F.struct("_p", (F.col("_d") * F.col("_d")).alias("_e")))
        ).alias("arr"),
    ).select(
        "_k",
        "_lvl",
        "_h",
        "n_pairs",
        F.aggregate("arr", F.lit(0.0), lambda acc, x: acc + x["_e"]).alias("_energy"),
    )

    tot = lev.groupBy("_k").agg(
        F.array_sort(F.collect_list(F.struct("_h", "_energy"))).alias("arr")
    ).select(
        "_k",
        F.aggregate("arr", F.lit(0.0), lambda acc, x: acc + x["_energy"]).alias(
            "_tot"
        ),
    )

    j = lev.join(F.broadcast(tot), "_k")

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return j.select(
        F.col("_k").alias(key_col),
        F.col("_lvl").alias("level"),
        F.col("_h").cast("long").alias("half_width"),
        (F.col("_h") * 2).cast("long").alias("pair_width"),
        "n_pairs",
        rnd(F.col("_energy")).alias("energy"),
        rnd(F.col("_energy") / F.col("n_pairs").cast("double")).alias(
            "wavelet_var"
        ),
        rnd(
            F.col("_energy") / F.nullif(F.col("_tot"), F.lit(0.0))
        ).alias("energy_frac"),
    )
