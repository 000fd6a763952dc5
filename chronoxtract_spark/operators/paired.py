"""Paired-series operators: align two event streams onto a shared
dense grid and compute rolling second-order statistics between them —
the "does metric A move with metric B" question (rolling Pearson,
covariance, OLS beta) every ops/quant tier answers.

The reference repo's DCF/ACF (operators/dcf.py) correlate at LAGS over
irregular samplings; this module is the complementary same-time
rolling view over the regular grid the tier already materializes.

Scale shape
-----------
``aligned_counts``: one groupBy shuffle to per-(key, grid) counts for
each side, then a dense spine via ``sequence()+explode`` per key and
two broadcast-free left joins ON THE SAME (key, grid) shuffle key —
the join co-locates with no extra exchange. Missing instants count 0.

``rolling_corr``: pure window algebra over the aligned grid — trailing
``w``-row sums of x, y, x², y², xy as exact BIGINTs (counts are
integers), so cov/corr/beta are short float chains over exact integers
with identical IEEE trees in both engines: bit-exact, no rounding.
Only full windows emit (the first ``w - 1`` grid rows are suppressed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


from chronoxtract_spark.operators._util import keylist as _keylist


def aligned_counts(
    df: DataFrame,
    keys: list[str] | str,
    ts_col: str,
    split_col: str,
    x_val: str,
    y_val: str,
    step_s: int,
) -> DataFrame:
    """Per (key, epoch-aligned ``step_s`` grid instant): the event
    counts of the two ``split_col`` populations ``x_val`` and
    ``y_val``, dense over each key's observed span (union of both
    sides), zeros where a side is silent.

    Returns ``keys..., grid_ts, x, y`` with x/y BIGINT counts.
    """
    keys = _keylist(keys)
    step_us = int(step_s) * 1_000_000
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = df.where(F.col(split_col).isin([x_val, y_val])).select(
        *keys,
        (t_us - (t_us % step_us)).alias("g_us"),
        F.col(split_col).alias("_side"),
    )
    counts = base.groupBy(*keys, "g_us").agg(
        F.sum(F.when(F.col("_side") == x_val, 1).otherwise(0))
        .cast("long").alias("x"),
        F.sum(F.when(F.col("_side") == y_val, 1).otherwise(0))
        .cast("long").alias("y"),
    )
    span = counts.groupBy(*keys).agg(
        F.min("g_us").alias("g_lo"), F.max("g_us").alias("g_hi")
    )
    spine = span.select(
        *keys,
        F.explode(
            F.sequence(F.col("g_lo"), F.col("g_hi"), F.lit(step_us))
        ).alias("g_us"),
    )
    return (
        spine.join(counts, [*keys, "g_us"], "left")
        .select(
            *keys,
            F.timestamp_micros("g_us").alias("grid_ts"),
            F.coalesce("x", F.lit(0)).cast("long").alias("x"),
            F.coalesce("y", F.lit(0)).cast("long").alias("y"),
        )
    )


def rolling_corr(
    df: DataFrame,
    keys: list[str] | str,
    order_col: str,
    x_col: str,
    y_col: str,
    window: int,
) -> DataFrame:
    """Trailing-``window`` Pearson correlation, population covariance
    and OLS slope (y on x) per (key, row), full windows only.

    All sums are exact BIGINTs; ``corr`` is null when either side is
    constant in the window (zero variance), ``beta`` null when x is.
    Returns ``keys..., order_col, corr, cov, beta``.
    """
    keys = _keylist(keys)
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(-(window - 1), 0)
    )
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    n = F.count("*").over(w)
    sx = F.sum(x).over(w)
    sy = F.sum(y).over(w)
    sxx = F.sum(x * x).over(w)
    syy = F.sum(y * y).over(w)
    sxy = F.sum(x * y).over(w)

    wl = F.lit(int(window))
    num = (wl * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (wl * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (wl * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    corr = F.when((F.col("dx") > 0) & (F.col("dy") > 0),
                  F.col("num") / F.sqrt(F.col("dx") * F.col("dy")))
    cov = F.col("num") / (wl * wl).cast("double")
    beta = F.when(F.col("dx") > 0, F.col("num") / F.col("dx"))

    return (
        df.select(
            *keys, order_col,
            n.alias("wn"), sx.alias("sx"), sy.alias("sy"),
            sxx.alias("sxx"), syy.alias("syy"), sxy.alias("sxy"),
        )
        .where(F.col("wn") == window)
        .select(*keys, order_col, num.alias("num"), dx.alias("dx"),
                dy.alias("dy"))
        .select(
            *keys, order_col,
            corr.alias("corr"), cov.alias("cov"), beta.alias("beta"),
        )
    )


def lead_lag(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bin_s: int = 3600,
    max_lag: int = 3,
    round_digits: int | None = 6,
) -> DataFrame:
    """Lead-lag scan over every ordered key pair: Pearson correlation
    of key A's dense binned count series against key B's shifted by
    lag bins, for every lag in [-max_lag, +max_lag] — the "does tool
    volume LEAD error volume" question rolling_corr (same-time only)
    cannot answer. A positive best lag means A's series at t aligns
    with B's at t+lag, i.e. A leads B by `lag` bins.

    Both series live on ONE shared dense spine (the table's global
    [min, max] bin span, zero-filled per key), so every lag's overlap
    window is the identical span - |lag| bins for every pair and the
    correlation is never biased by missing-row alignment. Per
    (pair, lag) the sufficient statistic is five exact BIGINT sums
    (Sx, Sy, Sxy, Sxx, Syy) over integer counts; r is the one fixed
    float expression (n Sxy - Sx Sy) / sqrt((n Sxx - Sx^2)(n Syy -
    Sy^2)) over them — partition-order-free, bit-exact vs the oracle
    before round(6), null (nullif, never NaN) when either side is
    constant on the window. ``is_best`` marks each pair's
    largest-|r| lag with a deterministic (|r| DESC NULLS LAST, lag
    ASC) tie pin. Self-pairs are kept: their nonzero lags are the
    binned autocorrelation, and their lag-0 r = 1 is a free oracle
    sanity row.

    Scale shape: counts groupBy (one shuffle linear in events), a
    bounded keys x span grid from sequence()+explode, the lag ladder
    exploded BEFORE the hour-equi join (one join covers all lags), and
    a (pair, lag)-bounded aggregate — no per-row Python, no window
    over raw events. Output rows = |keys|^2 x (2 max_lag + 1).
    """
    from chronoxtract_spark.operators._util import epoch_seconds

    ev = df.select(
        F.col(key_col).alias("_k"),
        F.floor(epoch_seconds(df, ts_col) / F.lit(bin_s)).cast("long").alias("_h"),
    )
    counts = ev.groupBy("_k", "_h").agg(F.count("*").cast("long").alias("_c"))
    span = ev.agg(
        F.min("_h").alias("_h0"), F.max("_h").alias("_h1")
    )
    dense = (
        ev.select("_k").distinct()
        .crossJoin(F.broadcast(span))
        .select("_k", F.explode(F.sequence("_h0", "_h1")).alias("_h"))
        .join(counts, ["_k", "_h"], "left")
        .select("_k", "_h", F.coalesce("_c", F.lit(0)).cast("long").alias("_c"))
    )

    lags = F.explode(
        F.array(*[F.lit(l) for l in range(-max_lag, max_lag + 1)])
    ).alias("_lag")
    a = dense.select(
        F.col("_k").alias("key_a"),
        F.col("_h"),
        F.col("_c").alias("_ca"),
        lags,
    ).select("key_a", "_h", "_ca", F.col("_lag").cast("int").alias("lag"),
             (F.col("_h") + F.col("_lag")).alias("_ht"))
    b = dense.select(
        F.col("_k").alias("key_b"),
        F.col("_h").alias("_ht"),
        F.col("_c").alias("_cb"),
    )
    agg = (
        a.join(b, "_ht")
        .groupBy("key_a", "key_b", "lag")
        .agg(
            F.count("*").cast("long").alias("n_overlap"),
            F.sum("_ca").cast("long").alias("sx"),
            F.sum("_cb").cast("long").alias("sy"),
            F.sum(F.col("_ca") * F.col("_cb")).cast("long").alias("sxy"),
            F.sum(F.col("_ca") * F.col("_ca")).cast("long").alias("sxx"),
            F.sum(F.col("_cb") * F.col("_cb")).cast("long").alias("syy"),
        )
    )
    n = F.col("n_overlap").cast("double")
    num = n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    vx = n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double")
    vy = n * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double")
    r = num / F.nullif(F.sqrt(vx * vy), F.lit(0.0))

    scored = agg.select(
        "key_a", "key_b", "lag", "n_overlap", r.alias("_r")
    )
    w = Window.partitionBy("key_a", "key_b").orderBy(
        F.abs(F.col("_r")).desc_nulls_last(), F.col("lag").asc()
    )
    out = scored.select(
        "key_a",
        "key_b",
        "lag",
        "n_overlap",
        "_r",
        (F.row_number().over(w) == 1).alias("is_best"),
    )

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return out.select(
        "key_a", "key_b", "lag", "n_overlap", rnd(F.col("_r")).alias("r"),
        "is_best",
    )
