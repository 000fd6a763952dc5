"""Structure-function (variogram) lag ladder per key — increment
statistics at a ladder of index lags.

The first- and second-order structure functions

    SF1(h) = mean |x_{i+h} - x_i|
    SF2(h) = mean (x_{i+h} - x_i)^2        gamma(h) = SF2(h)/2

are the standard scale-resolved variability probes of irregularly
observed series (Simonetti, Cordes & Heeschen 1985 for AGN light
curves; gamma(h) is the classical semivariogram). The log-log SF2
ladder slope separates measurement noise (flat) from correlated
variability (rising) and saturates at twice the variance beyond the
correlation length — the value-stream counterpart of the
Allan-variance ladder that operators/cadence.py runs on arrival RATES.

Lags are INDEX lags on the per-key ordered stream (the reference's
ACF convention, kernel/correlation.py), not time-bin lags — the DCF
family (operators/dcf.py) already covers time-lag binning for
irregular sampling; document-ordered index lags keep every statistic
an exact integer reduction.

Exactness contract (the drawdown/cadence contract): values fix to
integer units of ``10^-scale`` first, every |diff| and diff^2 is
int64, and each (key, lag) cell is a commutative integer SUM — no
float accumulation anywhere, repartitioning cannot move a bit, and
the DuckDB oracle reproduces the arithmetic verbatim. Floats appear
only in the final mean + unit rescale. Overflow bound:
``n * (2 * max|v_u|)^2 < 2^63`` — a million-row key with 10^4 units
of amplitude stays three decades inside int64.

Spark-first shape: ALL ladder rungs come from ONE window pass — each
lag is a fixed-offset ``lead`` over the same (key, ts, order) sort,
so the whole ladder costs one key shuffle; the per-key per-lag sums
ride one partially-aggregated groupBy and unpivot to (key, lag) rows
via a bounded inline array. No UDF, no explode over data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ._util import epoch_seconds

DEFAULT_LAGS = (1, 2, 4, 8, 16)


def structure_function(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("turn_idx",),
    lags: tuple[int, ...] = DEFAULT_LAGS,
    scale: int = 2,
    round_digits: int | None = 6,
) -> DataFrame:
    """One row per (key, lag): ``n_pairs``, ``sf1`` (mean absolute
    increment), ``sf2`` (mean squared increment) and ``gamma``
    (semivariance = sf2/2), in value units. Lags with no pairs
    (series shorter than the lag) emit no row."""
    unit = 10 ** scale
    lags = tuple(int(h) for h in lags)
    if not lags or any(h < 1 for h in lags):
        raise ValueError(f"lags must be positive ints, got {lags!r}")

    d = df.select(
        F.col(key_col).alias("_k"),
        epoch_seconds(df, ts_col).alias("_s"),
        F.round(F.col(value_col) * F.lit(unit), 0).cast("long").alias("_v"),
        *[F.col(c) for c in order_cols],
    )
    w = Window.partitionBy("_k").orderBy("_s", *order_cols)
    leads = d.select(
        "_k",
        "_v",
        *[F.lead("_v", h).over(w).alias(f"_l{h}") for h in lags],
    )
    agg = leads.groupBy("_k").agg(
        *[
            a
            for h in lags
            for a in (
                F.count(F.col(f"_l{h}")).cast("long").alias(f"np{h}"),
                F.sum(F.abs(F.col(f"_l{h}") - F.col("_v"))).alias(f"sa{h}"),
                F.sum(
                    (F.col(f"_l{h}") - F.col("_v"))
                    * (F.col(f"_l{h}") - F.col("_v"))
                ).alias(f"ss{h}"),
            )
        ]
    )
    rung = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(h).cast("long").alias("lag"),
                    F.col(f"np{h}").alias("n_pairs"),
                    F.col(f"sa{h}").alias("sa"),
                    F.col(f"ss{h}").alias("ss"),
                )
                for h in lags
            ]
        )
    )
    e = agg.select(F.col("_k"), rung.alias("r")).select(
        "_k",
        F.col("r.lag").alias("lag"),
        F.col("r.n_pairs").alias("n_pairs"),
        F.col("r.sa").alias("sa"),
        F.col("r.ss").alias("ss"),
    ).where(F.col("n_pairs") > 0)

    def rnd(x):
        return F.round(x, round_digits) if round_digits is not None else x

    npd = F.col("n_pairs").cast("double")
    # gamma halves the ROUNDED sf2 (a *0.5 is exact in IEEE-754), so
    # the two columns cannot disagree at a decimal rounding boundary
    # between engines the way independent round(x) / round(x/2) can.
    sf2 = rnd(F.col("ss").cast("double") / (npd * F.lit(float(unit * unit))))
    return e.select(
        F.col("_k").alias(key_col),
        "lag",
        "n_pairs",
        rnd(F.col("sa").cast("double") / (npd * F.lit(float(unit)))).alias(
            "sf1"
        ),
        sf2.alias("sf2"),
        (sf2 * F.lit(0.5)).alias("gamma"),
    )
