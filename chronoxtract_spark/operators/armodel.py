"""Yule-Walker autoregressive fits per key, closed form.

``yule_walker`` reduces each key's ordered value series to the biased
(1/n) autocovariances c0, c1, c2 and reports the closed-form AR(1) and
AR(2) method-of-moments fits:

- ``acf1``, ``acf2`` — r_k = c_k / c0.
- ``ar1_phi`` = r1, ``ar1_sigma2`` = c0 (1 - r1^2) — the discrete-time
  sibling of the engine's continuous-time CARMA(1,0)/OU family
  (kernel/carma.py): for regularly-sampled data phi = exp(-dt/tau).
- ``ar2_phi1`` = r1 (1 - r2) / (1 - r1^2),
  ``ar2_phi2`` = (r2 - r1^2) / (1 - r1^2) — the Yule-Walker solution;
  phi2 is ALSO the lag-2 partial autocorrelation (Durbin-Levinson), so
  its distance from 0 is the evidence the series needs a second lag.
- ``ar2_sigma2`` = c0 (1 - phi1 r1 - phi2 r2) — innovation variance.

Exactness contract: the mean and every autocovariance are sequential
left folds over position-sorted term arrays (lag-k products folded as
COALESCE(term, 0.0) over ALL positions so Spark's ``F.aggregate`` and
DuckDB's ``list_sum(list(... ORDER BY ...))`` walk identical term
sequences); everything downstream is a fixed closed-form expression
tree over those folds, written with the same association in both
engines. Degenerate keys guard by predicates, not NaN: n < 3 rows are
dropped (no c2), c0 = 0 (constant series with exactly-representable
mean) nulls every ratio, |r1| = 1 nulls the AR(2) columns via
nullif(1 - r1^2, 0).

Spark-first shape: one row_number + two leads over the shared key
window (one shuffle), one per-key collect_list groupBy whose four
folds produce the whole sufficient statistic, then pure column
expressions. Output is one row per key; per-key memory is the
collected term array (stream-bounded like every sorted-fold battery —
the tier tables, not raw events, are the intended input at scale, and
the same closed forms apply unchanged to hierarchical moment merges).

Reference parity note: the reference fits continuous-time AR via
seeded MLE (src/carma/mle.rs); this is the engine-native closed-form
counterpart that needs no optimizer and therefore oracles exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ._util import epoch_seconds


def yule_walker(
    df: DataFrame,
    key_col: str = "conv_id",
    value_col: str = "value",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("turn_idx",),
    round_digits: int | None = 6,
) -> DataFrame:
    w = Window.partitionBy(key_col).orderBy(
        epoch_seconds(df, ts_col).asc(), *[F.col(c).asc() for c in order_cols]
    )
    base = df.select(
        F.col(key_col).alias("_k"),
        (F.row_number().over(w) - F.lit(1)).cast("long").alias("_i"),
        F.col(value_col).cast("double").alias("_x"),
    ).select(
        "_k",
        "_i",
        "_x",
        F.lead("_x", 1).over(Window.partitionBy("_k").orderBy("_i")).alias("_x1"),
        F.lead("_x", 2).over(Window.partitionBy("_k").orderBy("_i")).alias("_x2"),
    )

    mean = base.groupBy("_k").agg(
        F.count("*").cast("long").alias("n"),
        F.array_sort(F.collect_list(F.struct("_i", "_x"))).alias("arr"),
    ).where(F.col("n") >= 3).select(
        "_k",
        "n",
        (
            F.aggregate("arr", F.lit(0.0), lambda acc, x: acc + x["_x"])
            / F.col("n").cast("double")
        ).alias("_m"),
    )

    terms = base.join(F.broadcast(mean), "_k").select(
        "_k",
        "n",
        "_m",
        "_i",
        ((F.col("_x") - F.col("_m")) * (F.col("_x") - F.col("_m"))).alias("_t0"),
        ((F.col("_x") - F.col("_m")) * (F.col("_x1") - F.col("_m"))).alias("_t1"),
        ((F.col("_x") - F.col("_m")) * (F.col("_x2") - F.col("_m"))).alias("_t2"),
    )

    def fold(field):
        return F.aggregate(
            "arr", F.lit(0.0), lambda acc, x: acc + F.coalesce(x[field], F.lit(0.0))
        )

    cov = terms.groupBy("_k", "n", "_m").agg(
        F.array_sort(F.collect_list(F.struct("_i", "_t0", "_t1", "_t2"))).alias(
            "arr"
        )
    ).select(
        "_k",
        "n",
        "_m",
        (fold("_t0") / F.col("n").cast("double")).alias("c0"),
        (fold("_t1") / F.col("n").cast("double")).alias("c1"),
        (fold("_t2") / F.col("n").cast("double")).alias("c2"),
    )

    r1 = F.col("c1") / F.nullif(F.col("c0"), F.lit(0.0))
    r2 = F.col("c2") / F.nullif(F.col("c0"), F.lit(0.0))
    den = F.nullif(F.lit(1.0) - r1 * r1, F.lit(0.0))
    phi1 = r1 * (F.lit(1.0) - r2) / den
    phi2 = (r2 - r1 * r1) / den

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return cov.select(
        F.col("_k").alias(key_col),
        "n",
        rnd(F.col("_m")).alias("mean"),
        rnd(F.col("c0")).alias("var0"),
        rnd(r1).alias("acf1"),
        rnd(r2).alias("acf2"),
        rnd(r1).alias("ar1_phi"),
        rnd(F.col("c0") * (F.lit(1.0) - r1 * r1)).alias("ar1_sigma2"),
        rnd(phi1).alias("ar2_phi1"),
        rnd(phi2).alias("ar2_phi2"),
        rnd(
            F.col("c0") * (F.lit(1.0) - phi1 * r1 - phi2 * r2)
        ).alias("ar2_sigma2"),
    )


#: asymptotic Dickey-Fuller tau_mu (constant, no trend) 5% critical
#: value, shared with the oracle SQL
ADF_CRIT_5PCT = -2.86


def adf_test(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("turn_idx",),
    scale: int = 2,
    round_digits: int | None = 6,
) -> DataFrame:
    """Dickey-Fuller unit-root test per key (constant, no trend, no
    augmentation lags): the OLS t-statistic of beta in

        dx_t = alpha + beta * x_{t-1} + e_t

    where beta = rho - 1. Under the unit-root null the statistic
    follows the Dickey-Fuller tau_mu law; ``stationary`` is True when
    t < -2.86 (the asymptotic 5% point). The closed-form complement
    of the Yule-Walker fits above: phi says HOW persistent, the DF
    t says whether persistence is indistinguishable from a random
    walk. Zero-lag DF (not augmented) keeps every moment a closed
    form — the augmentation lags would need a matrix solve.

    Exactness: values fix to integer cents; the five regression sums
    (Sz, Sy, Szz, Szy, Syy over z = x_{t-1}, y = dx_t) carry products
    in decimal(38,0) (HUGEINT in the oracle), and the m-scaled
    moment identities clear every intermediate division:

        NUM = m*Szy - Sz*Sy, DEN = m*Szz - Sz^2, YY = m*Syy - Sy^2
        beta = NUM/DEN,  t = beta / sqrt((YY - beta*NUM)
                                         / ((m-2) * DEN))

    — exact integers into one fixed float chain both engines share.
    Guards: m < 3 or DEN = 0 (constant regressor) or a zero/negative
    residual variance (exact linear fit) null t and the verdict.

    One lag window pass on the shared key sort + one groupBy, no UDF.
    Returns ``key, n_obs, beta, t_stat, stationary``.
    """
    unit = 10 ** scale
    d = df.select(
        F.col(key_col).alias("_k"),
        epoch_seconds(df, ts_col).alias("_s"),
        F.round(F.col(value_col) * F.lit(unit), 0).cast("long").alias("_v"),
        *[F.col(c) for c in order_cols],
    )
    w = Window.partitionBy("_k").orderBy("_s", *order_cols)
    lagged = d.select(
        "_k",
        F.lag("_v").over(w).alias("z"),
        (F.col("_v") - F.lag("_v").over(w)).alias("y"),
    ).where(F.col("z").isNotNull())
    dec = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    agg = lagged.groupBy("_k").agg(
        F.count("*").cast("long").alias("m"),
        F.sum(dec(F.col("z"))).alias("sz"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("z")) * dec(F.col("z"))).alias("szz"),
        F.sum(dec(F.col("z")) * dec(F.col("y"))).alias("szy"),
        F.sum(dec(F.col("y")) * dec(F.col("y"))).alias("syy"),
    )
    md = F.col("m").cast("decimal(19,0)")
    num_dec = md * F.col("szy") - F.col("sz") * F.col("sy")
    den_dec = md * F.col("szz") - F.col("sz") * F.col("sz")
    yy_dec = md * F.col("syy") - F.col("sy") * F.col("sy")
    # gate on EXACT decimal conditions before any float runs: under
    # den > 0 and m > 2 the chain below is finite (no NaN/Inf can
    # reach a Spark comparison, whose NaN-is-largest semantics differ
    # from nothing here but are best never exercised).
    num, den, yy = (c.cast("double") for c in (num_dec, den_dec, yy_dec))
    beta = num / den
    se2 = (yy - beta * num) / (
        (F.col("m") - F.lit(2)).cast("double") * den
    )
    valid = (F.col("m") > F.lit(2)) & (den_dec > F.lit(0))
    t = F.when(valid & (se2 > F.lit(0.0)), beta / F.sqrt(se2))

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return agg.select(
        F.col("_k").alias(key_col),
        (F.col("m") + F.lit(1)).cast("long").alias("n_obs"),
        rnd(F.when(den_dec > F.lit(0), beta)).alias("beta"),
        rnd(t).alias("t_stat"),
        F.when(t.isNotNull(), t < F.lit(float(ADF_CRIT_5PCT))).alias(
            "stationary"
        ),
    )


#: asymptotic KPSS eta_mu (level-stationarity) 5% critical value,
#: shared with the oracle SQL (Kwiatkowski et al. 1992, table 1)
KPSS_CRIT_5PCT = 0.463


def kpss_test(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("turn_idx",),
    lags: int = 4,
    scale: int = 2,
    round_digits: int | None = 6,
) -> DataFrame:
    """KPSS level-stationarity test per key — the mirror-image
    complement of ``adf_test`` above: ADF's null is a unit root, KPSS's
    null is stationarity, so the pair jointly classifies a series
    (both reject -> neither model fits; both accept -> data too short
    to tell; they disagree -> a clean verdict). The statistic is

        eta_mu = n^-2 sum_t S_t^2 / lrv,   S_t = sum_{i<=t} (x_i - xbar)

    with the Bartlett long-run variance at a FIXED truncation ``lags``
    = L (a deterministic parameter, not the data-dependent Newey-West
    bandwidth, so both engines agree by construction):

        lrv = g0 + 2 sum_{l=1..L} (1 - l/(L+1)) g_l,
        g_l = n^-1 sum_{t>l} e_t e_{t-l}.

    ``stationary`` is True when eta < 0.463 (the asymptotic 5% point
    of the level-case law — KPSS null ACCEPTED). Level variant only:
    the trend variant needs OLS detrending whose residual partial
    sums do not clear to integers (documented trade, same reason the
    DF test above is the constant-only form).

    Exactness: every moment clears its divisions by n-scaling —
    n*e_t = n*x_t - S and n*S_t = n*cumsum_t - t*S are exact integers
    (decimal(38,0) end to end, HUGEINT in the oracle), so
    A = sum (n S_t)^2 and the lag products G_l = sum (n e_t)(n e_{t-l})
    are exact, the Bartlett weights clear through B = (L+1)*G0 +
    2*sum_l (L+1-l)*G_l, and the whole statistic collapses to

        eta = (L+1) * A / (n * B)

    — one float expression over two exact decimals. B = 0 (constant
    series: an exact 0/0) nulls the statistic and verdict. Exact-range
    bound: A ~ n^5 * cents^2 must fit decimal(38) — at tier
    granularity (the intended input at scale) keys are day-bounded,
    and overflow degrades to null, never to a wrong value.

    One ordered window pass (row number, cumulative sum, L leads) on
    the shared key shuffle + one groupBy, no UDF. Returns
    ``key, n, lrv, eta, stationary``.
    """
    if lags < 1:
        raise ValueError(f"lags must be >= 1, got {lags}")
    unit = 10 ** scale
    d = df.select(
        F.col(key_col).alias("_k"),
        epoch_seconds(df, ts_col).alias("_s"),
        F.round(F.col(value_col) * F.lit(unit), 0).cast("long").alias("_v"),
        *[F.col(c) for c in order_cols],
    )
    w = Window.partitionBy("_k").orderBy("_s", *order_cols)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy("_k")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    base = d.select(
        "_k",
        F.row_number().over(w).cast("long").alias("rn"),
        F.sum("_v").over(wrun).alias("cum"),
        F.count("*").over(wall).alias("n"),
        F.sum("_v").over(wall).alias("s_tot"),
        "_v",
        "_s",
        *[F.col(c) for c in order_cols],
    )
    base = base.select(
        "_k",
        "n",
        "_s",
        *[F.col(c) for c in order_cols],
        (dec(F.col("n")) * dec(F.col("cum"))
         - dec(F.col("rn")) * dec(F.col("s_tot"))).alias("ns"),
        (dec(F.col("n")) * dec(F.col("_v")) - dec(F.col("s_tot"))).alias("ne"),
    )
    wo = Window.partitionBy("_k").orderBy("_s", *order_cols)
    leads = base.select(
        "_k",
        "n",
        "ns",
        "ne",
        *[F.lead("ne", l).over(wo).alias(f"ne{l}") for l in range(1, lags + 1)],
    )
    agg = leads.groupBy("_k").agg(
        F.max("n").alias("n"),
        F.sum(F.col("ns") * F.col("ns")).alias("a"),
        F.sum(F.col("ne") * F.col("ne")).alias("g0"),
        *[
            F.sum(F.col("ne") * F.col(f"ne{l}")).alias(f"g{l}")
            for l in range(1, lags + 1)
        ],
    )
    lp1 = lags + 1
    b_dec = F.lit(lp1).cast("decimal(38,0)") * F.col("g0")
    for l in range(1, lags + 1):
        b_dec = b_dec + F.lit(2 * (lp1 - l)).cast("decimal(38,0)") * F.coalesce(
            F.col(f"g{l}"), F.lit(0).cast("decimal(38,0)")
        )
    nd = F.col("n").cast("double")
    eta = F.when(
        b_dec > F.lit(0),
        F.lit(float(lp1)) * F.col("a").cast("double")
        / (nd * b_dec.cast("double")),
    )
    lrv = F.when(
        b_dec > F.lit(0),
        b_dec.cast("double") / (F.lit(float(lp1)) * nd * nd * nd),
    )

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return agg.select(
        F.col("_k").alias(key_col),
        "n",
        rnd(lrv).alias("lrv"),
        rnd(eta).alias("eta"),
        F.when(eta.isNotNull(), eta < F.lit(float(KPSS_CRIT_5PCT))).alias(
            "stationary"
        ),
    )


VR_LADDER = (2, 4, 8)


def variance_ratio(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("turn_idx",),
    qs: tuple[int, ...] = VR_LADDER,
    scale: int = 2,
    round_digits: int | None = 6,
) -> DataFrame:
    """Lo-MacKinlay variance-ratio ladder per key: is the series a
    random walk? For aggregation period q,

        VR(q) = sigma_c^2(q) / sigma_a^2

    compares the variance of overlapping q-period increments (scaled
    by q through the m correction) to the one-period increment
    variance; a true random walk has VR = 1 at every q, persistence
    pushes VR above 1, mean reversion below. The homoskedastic
    z-statistic z = (VR - 1) / sqrt(2(2q-1)(q-1) / (3qT)) is
    asymptotically N(0,1); ``verdict`` reads 'random_walk' when
    |z| <= 1.96 else 'persistent' / 'mean_reverting' by VR's side.
    The third stationarity reading beside adf_test (unit-root null)
    and kpss_test (stationary null): VR localizes WHERE in the
    aggregation ladder the memory lives, the discrete sibling of the
    Allan-variance ladder.

    Exactness: with T = n - 1 increments and R = x_T - x_0, the
    mean-cleared sums scale exactly: A_1 = sum (T*d_t - R)^2 and
    A_q = sum (T*(x_t - x_{t-q}) - q*R)^2 are exact
    decimal(38,0)/HUGEINT integers, and with the Lo-MacKinlay
    m = q(T-q+1)(1-q/T) the ratio collapses to the exact rational

        VR(q) = A_q * (T-1) * T / (q * (T-q+1) * (T-q) * A_1)

    — one float division. z divides by sqrt(c_q / T) where
    c_q = 2(2q-1)(q-1)/(3q) is a per-q Python double literal injected
    identically into both engines. Guards: T < q + 1 or A_1 = 0
    (all increments equal — zero one-period variance) null that
    rung's statistics.

    Spark-first: qs are fixed small lags, so the ladder needs NO
    explode — one window pass carries lag-1 plus one lag column per
    q on the shared key shuffle, one groupBy computes every A_q as a
    conditional decimal sum, and the per-q rows unpivot from the
    single aggregate row via a bounded stack. Returns
    ``key, q, n_incr, vr, z, verdict``.
    """
    qs = tuple(int(q) for q in qs)
    if not qs or any(q < 2 for q in qs):
        raise ValueError(f"qs must be >= 2, got {qs!r}")
    unit = 10 ** scale
    d = df.select(
        F.col(key_col).alias("_k"),
        epoch_seconds(df, ts_col).alias("_s"),
        F.round(F.col(value_col) * F.lit(unit), 0).cast("long").alias("_v"),
        *[F.col(c) for c in order_cols],
    )
    w = Window.partitionBy("_k").orderBy("_s", *order_cols)
    wall = Window.partitionBy("_k")
    wo = Window.partitionBy("_k").orderBy("rn")
    base = d.select(
        "_k",
        "_v",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count("*").over(wall).alias("n"),
        F.first("_v").over(w).alias("x0"),
        F.last("_v").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("xt"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    lag_cols = sorted({1, *qs})
    lagged = base.select(
        "_k",
        "n",
        (F.col("n") - F.lit(1)).alias("t_"),
        (F.col("xt") - F.col("x0")).alias("r_"),
        "_v",
        *[F.lag("_v", q).over(wo).alias(f"xl{q}") for q in lag_cols],
    )

    def a_term(q):
        diff = dec(F.col("t_")) * dec(F.col("_v") - F.col(f"xl{q}")) - F.lit(
            q
        ).cast("decimal(38,0)") * dec(F.col("r_"))
        return F.sum(
            F.when(F.col(f"xl{q}").isNotNull(), diff * diff)
        ).alias(f"a{q}")

    agg = lagged.groupBy("_k").agg(
        F.max("t_").alias("t_"),
        *[a_term(q) for q in lag_cols],
    )

    td = F.col("t_").cast("double")
    rungs = []
    for q in qs:
        c_q = 2.0 * (2 * q - 1) * (q - 1) / (3.0 * q)
        den_dec = (
            F.lit(q).cast("decimal(38,0)")
            * dec(F.col("t_") - F.lit(q) + F.lit(1))
            * dec(F.col("t_") - F.lit(q))
            * F.col("a1")
        )
        valid = (F.col("t_") >= F.lit(q + 1)) & (
            F.col("a1") > F.lit(0).cast("decimal(38,0)")
        )
        vr = F.when(
            valid,
            (
                F.col(f"a{q}")
                * dec(F.col("t_") - F.lit(1))
                * dec(F.col("t_"))
            ).cast("double")
            / den_dec.cast("double"),
        )
        z = F.when(valid, (vr - F.lit(1.0)) / F.sqrt(F.lit(c_q) / td))
        verdict = (
            F.when(F.abs(z) <= F.lit(1.96), F.lit("random_walk"))
            .when(vr > F.lit(1.0), F.lit("persistent"))
            .when(vr <= F.lit(1.0), F.lit("mean_reverting"))
        )
        rungs.append((q, vr, z, verdict))

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    per_q = F.array(
        *[
            F.struct(
                F.lit(q).cast("long").alias("q"),
                rnd(vr).alias("vr"),
                rnd(z).alias("z"),
                verdict.alias("verdict"),
            )
            for q, vr, z, verdict in rungs
        ]
    )
    return agg.select(
        F.col("_k").alias(key_col),
        F.col("t_").alias("n_incr"),
        F.explode(per_q).alias("rung"),
    ).select(
        key_col,
        F.col("rung.q").alias("q"),
        "n_incr",
        F.col("rung.vr").alias("vr"),
        F.col("rung.z").alias("z"),
        F.col("rung.verdict").alias("verdict"),
    )


ESS_MAX_LAG = 10


def ess_autocorr(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("turn_idx",),
    max_lag: int = ESS_MAX_LAG,
    round_digits: int | None = 6,
) -> DataFrame:
    """Effective sample size per key via the integrated
    autocorrelation time — the 'how many INDEPENDENT samples does
    this stream really carry' diagnostic every averaged metric
    silently assumes:

        tau_int = 1 + 2 * sum_{k=1..M} rho_k,    n_eff = n / tau_int

    with the initial-positive truncation rule: lags contribute only
    while every rho up to and including them is positive (the
    standard bias/variance compromise — summing into the noise floor
    makes tau itself noise). tau ~ 1 for white data; a tau of 20
    means a '10,000-sample' daily mean has the statistical weight of
    500 — the number that belongs next to every tier average.

    Exactness: mean and every autocovariance are sequential left
    folds over position-sorted term arrays (lag products folded as
    COALESCE(term, 0.0) over ALL positions — the exact construction
    proven by ``yule_walker`` above, widened to ``max_lag`` leads);
    the truncation gates and the tau sum are one pinned
    left-associated conditional chain, so no order ambiguity exists
    anywhere. c0 = 0 (constant series) nulls the statistic.

    One row_number + ``max_lag`` leads on the shared key window (one
    shuffle), one mean fold, one term-array fold per lag. Returns
    ``key, n, n_lags_used, tau_int, n_eff``.
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    lags = tuple(range(1, max_lag + 1))
    w = Window.partitionBy(key_col).orderBy(
        epoch_seconds(df, ts_col).asc(), *[F.col(c).asc() for c in order_cols]
    )
    base = df.select(
        F.col(key_col).alias("_k"),
        (F.row_number().over(w) - F.lit(1)).cast("long").alias("_i"),
        F.col(value_col).cast("double").alias("_x"),
    )
    wi = Window.partitionBy("_k").orderBy("_i")
    base = base.select(
        "_k",
        "_i",
        "_x",
        *[F.lead("_x", k).over(wi).alias(f"_x{k}") for k in lags],
    )
    mean = (
        base.groupBy("_k")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.array_sort(F.collect_list(F.struct("_i", "_x"))).alias("arr"),
        )
        .where(F.col("n") >= 2)
        .select(
            "_k",
            "n",
            (
                F.aggregate("arr", F.lit(0.0), lambda acc, x: acc + x["_x"])
                / F.col("n").cast("double")
            ).alias("_m"),
        )
    )
    terms = base.join(F.broadcast(mean), "_k").select(
        "_k",
        "n",
        "_m",
        "_i",
        ((F.col("_x") - F.col("_m")) * (F.col("_x") - F.col("_m"))).alias(
            "_t0"
        ),
        *[
            (
                (F.col("_x") - F.col("_m"))
                * (F.col(f"_x{k}") - F.col("_m"))
            ).alias(f"_t{k}")
            for k in lags
        ],
    )

    def fold(field):
        return F.aggregate(
            "arr",
            F.lit(0.0),
            lambda acc, x: acc + F.coalesce(x[field], F.lit(0.0)),
        )

    cov = (
        terms.groupBy("_k", "n", "_m")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("_i", "_t0", *[f"_t{k}" for k in lags])
                )
            ).alias("arr")
        )
        .select(
            "_k",
            "n",
            (fold("_t0") / F.col("n").cast("double")).alias("c0"),
            *[
                (fold(f"_t{k}") / F.col("n").cast("double")).alias(f"c{k}")
                for k in lags
            ],
        )
    )
    c0nz = F.nullif(F.col("c0"), F.lit(0.0))
    rho = {k: F.col(f"c{k}") / c0nz for k in lags}
    # initial-positive gates: g_k = AND_{j<=k} rho_j > 0, as a pinned
    # left-associated chain
    gates = {}
    g = None
    for k in lags:
        g = (rho[k] > F.lit(0.0)) if g is None else g & (rho[k] > F.lit(0.0))
        gates[k] = g

    def chain(terms_):
        out = None
        for t in terms_:
            out = t if out is None else out + t
        return out

    s = chain(
        [
            F.when(gates[k], rho[k]).otherwise(F.lit(0.0))
            for k in lags
        ]
    )
    m_used = chain(
        [F.when(gates[k], 1).otherwise(0) for k in lags]
    ).cast("long")
    tau = F.lit(1.0) + F.lit(2.0) * s
    n_eff = F.col("n").cast("double") / tau

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return cov.select(
        F.col("_k").alias(key_col),
        "n",
        F.when(F.col("c0") != F.lit(0.0), m_used).alias("n_lags_used"),
        rnd(F.when(F.col("c0") != F.lit(0.0), tau)).alias("tau_int"),
        rnd(F.when(F.col("c0") != F.lit(0.0), n_eff)).alias("n_eff"),
    )
