"""Running-extreme statistics: drawdown and record counts per key.

The classic running-peak battery over a cumulative series (finance
drawdown, reliability "time under water", record statistics from
extreme-value theory):

- ``max_drawdown`` — largest peak-to-trough drop of the running
  cumulative value sum.
- ``max_drawdown_len`` — most consecutive observations spent strictly
  below the running peak (the longest "under-water" run, in
  observation counts — robust to irregular sampling).
- ``n_records`` — number of strict new highs of the cumulative series
  (first observation counts as a record).
- ``final_cum`` / ``peak_cum`` — terminal and maximal cumulative sums.

The reference repo has no cumulative-extreme operator; this is
engine-native stream analytics like the cadence battery
(operators/cadence.py), characterizing the PATH of a per-key value
stream where the summary battery characterizes its marginal
distribution.

Exactness: values are fixed to integer micro-units (``scale`` decimal
digits, default 2) BEFORE accumulation, so the cumulative sum, running
max, every drawdown, and both counters are exact int64 arithmetic with
no float accumulation order anywhere — a DuckDB oracle over the same
integer stream matches bit-for-bit, and re-partitioning cannot change
a single bit. Only the final re-scaling to value units divides.

Spark-first shape: ONE window pass per key (cumulative sum, running
max, record flag as a self-comparison of the running max against its
lag) + the gaps-and-islands run numbering for the under-water length,
then one partial-aggregated groupBy — all whole-stage-codegen column
expressions, no UDF. Two window functions share one (key, ts) sort;
the only shuffle is the key partitioning every other per-key operator
uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ._util import epoch_seconds


def drawdown_stats(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("turn_idx",),
    scale: int = 2,
    round_digits: int | None = 6,
) -> DataFrame:
    """One row per key: n_obs, n_records, max_drawdown,
    max_drawdown_len, final_cum, peak_cum (value units)."""
    unit = 10 ** scale
    d = df.select(
        F.col(key_col).alias("_k"),
        epoch_seconds(df, ts_col).alias("_s"),
        F.round(F.col(value_col) * F.lit(unit), 0).cast("long").alias("_v"),
        *[F.col(c) for c in order_cols],
    )

    w = Window.partitionBy("_k").orderBy("_s", *order_cols)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = d.select(
        "_k",
        "_s",
        *order_cols,
        F.sum("_v").over(wrun).alias("cum"),
    )
    c = c.select(
        "_k",
        "_s",
        *order_cols,
        "cum",
        F.max("cum").over(wrun).alias("runmax"),
    )
    # record high: cum strictly above the previous running max (the
    # first row has no previous max and counts as a record); under
    # water: cum strictly below the current running max. The
    # under-water run length is gaps-and-islands over the dry rows.
    c = c.select(
        "_k",
        "cum",
        "runmax",
        F.row_number().over(w).alias("rn"),
        (F.col("runmax") - F.col("cum")).alias("dd"),
        F.when(F.lag("runmax").over(w).isNull(), F.lit(1))
        .when(F.col("cum") > F.lag("runmax").over(w), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_record"),
        F.sum(F.when(F.col("cum") >= F.col("runmax"), 1).otherwise(0))
        .over(wrun)
        .alias("dry_run_id"),
    )
    per_run = (
        c.where(F.col("dd") > 0)
        .groupBy("_k", "dry_run_id")
        .agg(F.count("*").cast("long").alias("run_len"))
        .groupBy("_k")
        .agg(F.max("run_len").alias("max_dd_len"))
    )
    agg = c.groupBy("_k").agg(
        F.count("*").cast("long").alias("n_obs"),
        F.sum("is_record").cast("long").alias("n_records"),
        F.max("dd").alias("max_dd_u"),
        F.max("cum").alias("peak_u"),
        F.max_by("cum", "rn").alias("final_u"),
    )
    j = agg.join(per_run, "_k", "left")

    def rnd(col):
        x = col.cast("double") / F.lit(float(unit))
        return F.round(x, round_digits) if round_digits is not None else x

    return j.select(
        F.col("_k").alias(key_col),
        "n_obs",
        "n_records",
        rnd(F.col("max_dd_u")).alias("max_drawdown"),
        F.coalesce(F.col("max_dd_len"), F.lit(0)).cast("long").alias(
            "max_drawdown_len"
        ),
        rnd(F.col("final_u")).alias("final_cum"),
        rnd(F.col("peak_u")).alias("peak_cum"),
    )


#: Euler-Mascheroni constant, the Gumbel mean offset; injected as the
#: SAME Python double literal into both engines
EULER_GAMMA = 0.5772156649015329


def gumbel_blocks(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    block_s: int = 86400,
    return_blocks: int = 100,
    scale: int = 2,
    round_digits: int | None = 6,
) -> DataFrame:
    """Gumbel extreme-value fit over per-block maxima — the classical
    'how bad can a day get' reading: block (default daily) maxima of
    a light-tailed process converge to Gumbel(mu, beta), fit here by
    method of moments

        beta = s * sqrt(6)/pi,   mu = xbar - gamma * beta

    (gamma the Euler-Mascheroni constant), with the T-block return
    level x_T = mu - beta * ln(-ln(1 - 1/T)) — the value exceeded on
    average once per T blocks, the capacity-planning number the raw
    p99 understates. Complements drawdown_stats (path extremes) with
    the distributional extreme-value model.

    Exactness: block maxima are exact integer cents (one max per
    block); the sample variance clears its divisions n-scaled —
    n*SS - S^2 is exact decimal(38,0)/HUGEINT — so beta, mu and the
    return level are ONE pinned float chain over two exact decimals
    and three injected Python double literals (sqrt(6)/pi, gamma,
    and the T-quantile -ln(-ln(1 - 1/T))). Guards: n < 2 blocks or
    zero variance (constant maxima) null the fit.

    Spark-first: one (key, block) max groupBy over the events (the
    only event-sized shuffle, map-side combine), one per-key
    aggregate. No UDF, no window. Returns ``key, n_blocks,
    block_max_mean, gumbel_mu, gumbel_beta, rl`` where ``rl`` is the
    ``return_blocks``-block return level.
    """
    import math

    if return_blocks < 2:
        raise ValueError(f"return_blocks must be >= 2, got {return_blocks}")
    sqrt6_pi = math.sqrt(6.0) / math.pi
    tq = -math.log(-math.log(1.0 - 1.0 / float(return_blocks)))
    unit = 10 ** scale
    blocks = (
        df.select(
            F.col(key_col).alias("_k"),
            F.floor(epoch_seconds(df, ts_col) / F.lit(int(block_s)))
            .cast("long")
            .alias("b"),
            F.round(F.col(value_col) * F.lit(unit), 0)
            .cast("long")
            .alias("_v"),
        )
        .groupBy("_k", "b")
        .agg(F.max("_v").alias("m"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = blocks.groupBy("_k").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(dec(F.col("m"))).alias("s"),
        F.sum(dec(F.col("m")) * dec(F.col("m"))).alias("ss"),
    )
    nd = F.col("n").cast("double")
    var_num = (
        dec(F.col("n")) * F.col("ss") - F.col("s") * F.col("s")
    )
    valid = (F.col("n") >= F.lit(2)) & (var_num > F.lit(0))
    sd = F.sqrt(
        var_num.cast("double") / (nd * (nd - F.lit(1.0)))
    ) / F.lit(float(unit))
    mean = F.col("s").cast("double") / (nd * F.lit(float(unit)))
    beta = F.when(valid, sd * F.lit(sqrt6_pi))
    mu = F.when(valid, mean - F.lit(EULER_GAMMA) * beta)
    rl = F.when(valid, mu + beta * F.lit(tq))

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return agg.select(
        F.col("_k").alias(key_col),
        F.col("n").alias("n_blocks"),
        rnd(mean).alias("block_max_mean"),
        rnd(mu).alias("gumbel_mu"),
        rnd(beta).alias("gumbel_beta"),
        rnd(rl).alias("rl"),
    )
