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


RS_LADDER = (8, 16, 32, 64)


def rs_ladder(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("turn_idx",),
    windows: tuple[int, ...] = RS_LADDER,
    scale: int = 2,
    round_digits: int | None = 6,
) -> DataFrame:
    """Rescaled-range (R/S) ladder per key — Hurst's original
    long-memory probe, the empirical complement of DFA (which detrends
    per window; R/S only demeans, so the two exponents disagreeing is
    itself a diagnostic for trend-contaminated memory).

    For each window size ``ws`` the series splits into full
    consecutive windows; within a window the cumulative deviation
    from the WINDOW mean walks from 0 back to 0, and

        R/S = (max Z - min Z) / std_pop(window)

    ``rs_mean`` averages R/S over the rung's windows. E[R/S] ~ c *
    ws^H — slope H ~ 0.5 for independent increments, > 0.5
    persistent, < 0.5 anti-persistent (see ``hurst_rs``).

    Exactness: window-mean deviations clear the division by
    ws-scaling (u = ws*x - S_w in integer cents — the CUSUM trick at
    window granularity), so the walk Z_j = ws*cumsum(x) - (j+1)*S_w,
    its range R_u, and the variance moment D = ws*SS_w - S_w^2 are
    exact int64 (R/S = R_u / sqrt(D), one float op per window, since
    the ws scalings cancel). The per-rung mean folds the window R/S
    values sorted by window index (the proven sorted-fold contract —
    arrays bounded by n/min(ws), the tier tables being the intended
    input at scale). Degenerate windows (constant -> D = 0) are
    excluded and counted.

    Spark-first shape: the ladder is exploded onto rows ONCE (the
    Allan-variance trick: cost linear in len(windows), shared shuffle
    on (key, ws, window)), one ordered window pass per rung-window,
    one groupBy per window, one per-(key, ws) fold. No UDF.
    Returns ``key, ws, n_windows, n_degenerate, rs_mean``.
    """
    unit = 10 ** scale
    windows = tuple(int(x) for x in windows)
    if not windows or any(x < 2 for x in windows):
        raise ValueError(f"windows must be >= 2, got {windows!r}")

    d = df.select(
        F.col(key_col).alias("_k"),
        epoch_seconds(df, ts_col).alias("_s"),
        F.round(F.col(value_col) * F.lit(unit), 0).cast("long").alias("_v"),
        *[F.col(c) for c in order_cols],
    )
    w = Window.partitionBy("_k").orderBy("_s", *order_cols)
    wall = Window.partitionBy("_k")
    idx = d.select(
        "_k",
        "_v",
        (F.row_number().over(w) - F.lit(1)).alias("rn"),
        F.count("*").over(wall).alias("n"),
    )
    lad = idx.select(
        "_k",
        "_v",
        "rn",
        "n",
        F.explode(
            F.array(*[F.lit(x).cast("long") for x in windows])
        ).alias("ws"),
    ).where(
        F.col("rn") < (F.col("n") / F.col("ws")).cast("long") * F.col("ws")
    )
    lad = lad.select(
        "_k",
        "ws",
        (F.col("rn") / F.col("ws")).cast("long").alias("wi"),
        (F.col("rn") % F.col("ws")).alias("j"),
        "_v",
    )
    wwin = Window.partitionBy("_k", "ws", "wi")
    wrun = wwin.orderBy("j").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    z = lad.select(
        "_k",
        "ws",
        "wi",
        (
            F.col("ws") * F.sum("_v").over(wrun)
            - (F.col("j") + F.lit(1)) * F.sum("_v").over(wwin)
        ).alias("z"),
        (
            F.col("ws") * F.sum(F.col("_v") * F.col("_v")).over(wwin)
            - F.sum("_v").over(wwin) * F.sum("_v").over(wwin)
        ).alias("dd"),
    )
    per_win = z.groupBy("_k", "ws", "wi").agg(
        (F.max("z") - F.min("z")).alias("r_u"),
        F.max("dd").alias("dd"),
    )
    per_win = per_win.select(
        "_k",
        "ws",
        "wi",
        F.when(
            F.col("dd") > 0,
            F.col("r_u").cast("double") / F.sqrt(F.col("dd").cast("double")),
        ).alias("rs"),
    )
    agg = per_win.groupBy("_k", "ws").agg(
        F.count("*").cast("long").alias("n_windows"),
        F.sum(F.when(F.col("rs").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_degenerate"),
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("rs").isNotNull(),
                        F.struct(F.col("wi"), F.col("rs")),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["rs"],
        ).alias("rs_sum"),
    )
    n_valid = (F.col("n_windows") - F.col("n_degenerate")).cast("double")
    rs_mean = F.when(
        F.col("n_windows") > F.col("n_degenerate"),
        F.col("rs_sum") / n_valid,
    )

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return agg.select(
        F.col("_k").alias(key_col),
        "ws",
        "n_windows",
        "n_degenerate",
        rnd(rs_mean).alias("rs_mean"),
    )


def hurst_rs(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("turn_idx",),
    windows: tuple[int, ...] = RS_LADDER,
    scale: int = 2,
    round_digits: int | None = 6,
) -> DataFrame:
    """Hurst exponent per key: the log-log OLS slope of the R/S
    ladder, H = slope of ln(rs_mean) on ln(ws) over the rungs the key
    populates. ~0.5 independent increments, > 0.5 persistent
    long memory, < 0.5 anti-persistent; pairs with the DFA alpha
    (kernel/seasonality.py) as the two standard long-memory readings.

    Exactness: the ln(ws) regressors are Python double literals
    injected identically into both engines (never engine ln of an
    integer); only ln(rs_mean) runs engine-side. The OLS sums fold
    the (at most ``len(windows)``) rungs in one pinned
    left-associated conditional chain, so no order ambiguity exists.
    Needs >= 2 populated non-degenerate rungs, else null.

    Returns ``key, n_rungs, hurst``.
    """
    import math

    ladder = rs_ladder(
        df,
        key_col=key_col,
        ts_col=ts_col,
        value_col=value_col,
        order_cols=order_cols,
        windows=windows,
        scale=scale,
        round_digits=None,
    )
    piv = ladder.groupBy(key_col).agg(
        *[
            F.max(
                F.when(F.col("ws") == x, F.col("rs_mean"))
            ).alias(f"rs{x}")
            for x in windows
        ]
    )
    lnw = {x: math.log(float(x)) for x in windows}
    avail = {
        x: F.col(f"rs{x}").isNotNull() & (F.col(f"rs{x}") > 0)
        for x in windows
    }

    def chain(terms):
        out = None
        for t in terms:
            out = t if out is None else out + t
        return out

    n_r = chain(
        [F.when(avail[x], 1).otherwise(0) for x in windows]
    ).cast("double")
    sx = chain(
        [F.when(avail[x], F.lit(lnw[x])).otherwise(F.lit(0.0))
         for x in windows]
    )
    sy = chain(
        [F.when(avail[x], F.log(F.col(f"rs{x}"))).otherwise(F.lit(0.0))
         for x in windows]
    )
    sxx = chain(
        [F.when(avail[x], F.lit(lnw[x] * lnw[x])).otherwise(F.lit(0.0))
         for x in windows]
    )
    sxy = chain(
        [
            F.when(
                avail[x], F.lit(lnw[x]) * F.log(F.col(f"rs{x}"))
            ).otherwise(F.lit(0.0))
            for x in windows
        ]
    )
    den = n_r * sxx - sx * sx
    h = F.when(
        (n_r >= F.lit(2.0)) & (den > F.lit(0.0)),
        (n_r * sxy - sx * sy) / den,
    )

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return piv.select(
        F.col(key_col),
        n_r.cast("long").alias("n_rungs"),
        rnd(h).alias("hurst"),
    )


HIGUCHI_KS = (1, 2, 3, 4, 5, 6)


def higuchi_ladder(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("turn_idx",),
    ks: tuple[int, ...] = HIGUCHI_KS,
    scale: int = 2,
    round_digits: int | None = 6,
) -> DataFrame:
    """Higuchi curve-length ladder per key: at stride k the series
    splits into k decimated sub-curves (offsets m = 1..k); sub-curve
    length L_m(k) = [sum |x_{m+ik} - x_{m+(i-1)k}|] * (N-1) /
    (n_m * k^2) with n_m = floor((N-m)/k) terms, and
    L(k) = mean_m L_m(k). ln L(k) vs ln k is the Higuchi
    log-log line whose negative slope is the fractal dimension (see
    ``higuchi_fd``): ~2 for white noise, ~1.5 for a random walk,
    -> 1 for a smooth curve. Third leg of the complexity triad with
    DFA's alpha (kernel/seasonality.py) and the R/S Hurst above —
    Higuchi reads the CURVE LENGTH scaling and converges on far
    shorter windows than either.

    Exactness: the stride-class trick — the i-th difference of
    sub-curve (k, m) is exactly the lag-k difference at position
    j = m + i*k, so A_{m,k} = sum of |x_j - x_{j-k}| over the residue
    class j = m (mod k) is an exact integer-cent sum off ONE lag
    column per k, and L_m(k) = (A * (N-1)) / (n_m * k^2) is one float
    division of two exact decimal(38,0)/HUGEINT products. The per-k
    mean folds the k sub-curve lengths sorted by offset m (the proven
    sorted-fold contract; arrays bounded by k <= max(ks)).

    Spark-first shape: ONE window pass computes every lag column
    (bounded: len(ks) lags), one bounded explode emits the populated
    (k, m, |dx|) triples, one (key, k, m) groupBy and one (key, k)
    sorted fold. No UDF. Returns ``key, k, n_offsets, l_k``
    (offsets with n_m = 0 — series shorter than the stride — carry no
    row; keys shorter than 2 samples emit nothing).
    """
    ks = tuple(int(k) for k in ks)
    if not ks or any(k < 1 for k in ks):
        raise ValueError(f"strides must be >= 1, got {ks!r}")
    unit = 10 ** scale
    d = df.select(
        F.col(key_col).alias("_k"),
        epoch_seconds(df, ts_col).alias("_s"),
        F.round(F.col(value_col) * F.lit(unit), 0).cast("long").alias("_v"),
        *[F.col(c) for c in order_cols],
    )
    w = Window.partitionBy("_k").orderBy("_s", *order_cols)
    wall = Window.partitionBy("_k")
    lagged = d.select(
        "_k",
        F.row_number().over(w).cast("long").alias("j"),
        F.count("*").over(wall).alias("n"),
        *[
            F.abs(F.col("_v") - F.lag("_v", k).over(w)).alias(f"adx{k}")
            for k in ks
        ],
    )
    triples = lagged.select(
        "_k",
        "n",
        F.explode(
            F.filter(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).cast("long").alias("kk"),
                            (
                                (F.col("j") - F.lit(1)) % F.lit(k) + F.lit(1)
                            ).alias("m"),
                            F.col(f"adx{k}").alias("adx"),
                        )
                        for k in ks
                    ]
                ),
                lambda s: s["adx"].isNotNull(),
            )
        ).alias("t"),
    ).select(
        "_k",
        "n",
        F.col("t.kk").alias("kk"),
        F.col("t.m").alias("m"),
        F.col("t.adx").alias("adx"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per_m = triples.groupBy("_k", "kk", "m").agg(
        F.max("n").alias("n"),
        F.count("*").cast("long").alias("n_m"),
        F.sum("adx").alias("a"),
    )
    l_m = per_m.select(
        "_k",
        "kk",
        "m",
        (
            (dec(F.col("a")) * dec(F.col("n") - F.lit(1))).cast("double")
            / dec(
                F.col("n_m") * F.col("kk") * F.col("kk")
            ).cast("double")
        ).alias("lm"),
    )
    agg = l_m.groupBy("_k", "kk").agg(
        F.count("*").cast("long").alias("n_offsets"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("m", "lm"))),
            F.lit(0.0),
            lambda acc, s: acc + s["lm"],
        ).alias("lsum"),
    )

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return agg.select(
        F.col("_k").alias(key_col),
        F.col("kk").alias("k"),
        "n_offsets",
        rnd(F.col("lsum") / F.col("kk").cast("double")).alias("l_k"),
    )


def higuchi_fd(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("turn_idx",),
    ks: tuple[int, ...] = HIGUCHI_KS,
    scale: int = 2,
    round_digits: int | None = 6,
) -> DataFrame:
    """Higuchi fractal dimension per key: the NEGATIVE log-log OLS
    slope of the curve-length ladder, HFD = -d ln L(k) / d ln k.
    ~2 white noise, ~1.5 random walk, -> 1 smooth/deterministic.
    The ln(k) regressors are injected Python double literals (never
    an engine ln of an integer) and the OLS sums fold the at most
    len(ks) rungs in one pinned left-associated conditional chain —
    the exact construction proven by ``hurst_rs``. Needs >= 2
    populated rungs with L(k) > 0, else null.

    Returns ``key, n_rungs, hfd``.
    """
    import math

    ks = tuple(int(k) for k in ks)
    ladder = higuchi_ladder(
        df,
        key_col=key_col,
        ts_col=ts_col,
        value_col=value_col,
        order_cols=order_cols,
        ks=ks,
        scale=scale,
        round_digits=None,
    )
    piv = ladder.groupBy(key_col).agg(
        *[
            F.max(F.when(F.col("k") == k, F.col("l_k"))).alias(f"l{k}")
            for k in ks
        ]
    )
    lnk = {k: math.log(float(k)) for k in ks}
    avail = {
        k: F.col(f"l{k}").isNotNull() & (F.col(f"l{k}") > 0) for k in ks
    }

    def chain(terms):
        out = None
        for t in terms:
            out = t if out is None else out + t
        return out

    n_r = chain([F.when(avail[k], 1).otherwise(0) for k in ks]).cast(
        "double"
    )
    sx = chain(
        [F.when(avail[k], F.lit(lnk[k])).otherwise(F.lit(0.0)) for k in ks]
    )
    sy = chain(
        [
            F.when(avail[k], F.log(F.col(f"l{k}"))).otherwise(F.lit(0.0))
            for k in ks
        ]
    )
    sxx = chain(
        [
            F.when(avail[k], F.lit(lnk[k] * lnk[k])).otherwise(F.lit(0.0))
            for k in ks
        ]
    )
    sxy = chain(
        [
            F.when(
                avail[k], F.lit(lnk[k]) * F.log(F.col(f"l{k}"))
            ).otherwise(F.lit(0.0))
            for k in ks
        ]
    )
    den = n_r * sxx - sx * sx
    fd = F.when(
        (n_r >= F.lit(2.0)) & (den > F.lit(0.0)),
        -((n_r * sxy - sx * sy) / den),
    )

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return piv.select(
        F.col(key_col),
        n_r.cast("long").alias("n_rungs"),
        rnd(fd).alias("hfd"),
    )
