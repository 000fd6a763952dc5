"""Anomaly primitives over series: Hampel (rolling median/MAD)
outlier detection and single-split change-point detection (the first
step of binary segmentation / CUSUM-style level-shift localization).

The reference repo's peak detection (kernel/peaks.py) finds LOCAL
maxima by shape; these two answer the complementary operational
questions — "which samples are statistically implausible against
their neighborhood" and "where did the level of this series shift".

Scale shape
-----------
``hampel_outliers``: one shuffle on the series key; the window median
and MAD are computed from a bounded ``collect_list`` over a ±half
ROWS frame (2*half+1 elements max — constant memory per row), then
pure array expressions (``array_sort`` + ``element_at`` exact median,
``transform`` for absolute deviations). No UDF.

``change_points``: one shuffle on the series key; prefix sums of the
value and its square are exact BIGINT cumulative windows, each
candidate split's two-segment SSE is a per-row expression over those
prefixes, and the argmin is one ``row_number`` window ordered by
``(sse, split_idx)`` — O(n) rows per series, no pair join.

Oracle determinism
------------------
Both operators run on integer per-minute counts, so every float is a
single division / multiply chain over exact integers — identical IEEE
expression trees in both engines, bit-exact, no rounding anywhere.
Median of an even window is the exact mean of the two middles. The
Hampel threshold comparison (|x - med| > k * 1.4826 * MAD) therefore
produces identical flag decisions, and the change-point argmin breaks
exact-equality ties by the earlier split index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from chronoxtract_spark.operators._util import keylist as _keylist

from chronoxtract_spark.kernel.tdist import esd_lambdas


def _arr_median(arr: Column) -> Column:
    """Exact median of an array expression: sorted, middle element for
    odd length, mean of the two middles for even."""
    a = F.array_sort(arr)
    n = F.size(a)
    mid = (n + 1) / 2
    odd = F.element_at(a, F.floor(mid).cast("int")).cast("double")
    even = (
        F.element_at(a, (n / 2).cast("int")).cast("double")
        + F.element_at(a, (n / 2).cast("int") + 1).cast("double")
    ) / 2.0
    return F.when(n % 2 == 1, odd).otherwise(even)


def hampel_outliers(
    df: DataFrame,
    keys: list[str] | str,
    order_col: str,
    value_col: str,
    half_window: int = 5,
    k: float = 3.0,
) -> DataFrame:
    """Hampel filter: a sample is an outlier when it deviates from its
    rolling-window median by more than ``k`` scaled MADs
    (``1.4826 * MAD`` estimates sigma under normality). Edge windows
    truncate (the classic sample-window convention); a window with
    ``MAD = 0`` flags any value different from its median.

    Returns only the flagged rows: ``keys..., order_col, value,
    window_median, window_mad``.
    """
    keys = _keylist(keys)
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(-half_window, half_window)
    )
    win = F.collect_list(value_col).over(w)
    med = _arr_median(F.col("win"))
    mad = _arr_median(
        F.transform(
            F.col("win"), lambda e: F.abs(e.cast("double") - F.col("med"))
        )
    )
    dev = F.abs(F.col(value_col).cast("double") - F.col("med"))
    return (
        df.select(*keys, order_col, value_col, win.alias("win"))
        .withColumn("med", med)
        .withColumn("mad", mad)
        # when mad == 0, k*1.4826*0 == 0 and the threshold reduces to
        # dev > 0 — the zero-MAD branch is the same predicate
        .where(dev > F.lit(float(k)) * F.lit(1.4826) * F.col("mad"))
        .select(
            *keys, order_col, value_col,
            F.col("med").alias("window_median"),
            F.col("mad").alias("window_mad"),
        )
    )


def change_points(
    df: DataFrame,
    keys: list[str] | str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Best single change point per series: the split index minimizing
    the summed within-segment SSE (one step of binary segmentation).
    ``gain`` is the SSE reduction versus the unsplit series — the
    standard level-shift score; series with fewer than 2 samples
    return no row.

    Exact-equality SSE ties break toward the EARLIER split. Returns
    per key: ``n, split_idx, split_at, left_mean, right_mean, gain``
    (``split_idx`` = size of the left segment, ``split_at`` = the
    ``order_col`` of its last row).
    """
    keys = _keylist(keys)
    wo = Window.partitionBy(*keys).orderBy("ord")
    wc = wo.rowsBetween(Window.unboundedPreceding, 0)
    wfull = Window.partitionBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    vv = F.col("v")
    base = (
        df.select(
            *keys,
            F.col(order_col).alias("ord"),
            F.col(value_col).cast("long").alias("v"),
        )
        .select(
            *keys, "ord", "v",
            F.row_number().over(wo).alias("rn"),
            F.sum(vv).over(wc).alias("s1"),
            F.sum(vv * vv).over(wc).alias("s2"),
        )
        # totals: a second window pass over the (already shuffled)
        # key partition — no new exchange, no nested window exprs
        .select(
            *keys, "ord", "rn", "s1", "s2",
            F.count("*").over(wfull).alias("n"),
            # max_by(rn), not max: the value cumsum is not monotone
            # when values can be negative (s2 would be, s1 is not)
            F.max_by("s1", "rn").over(wfull).alias("t1"),
            F.max_by("s2", "rn").over(wfull).alias("t2"),
        )
    )
    kk = F.col("rn").cast("double")
    nn = F.col("n").cast("double")
    sse_l = F.col("s2").cast("double") - (
        F.col("s1").cast("double") * F.col("s1").cast("double")
    ) / kk
    r1 = (F.col("t1") - F.col("s1")).cast("double")
    sse_r = (F.col("t2") - F.col("s2")).cast("double") - (r1 * r1) / (nn - kk)
    sse_tot = F.col("t2").cast("double") - (
        F.col("t1").cast("double") * F.col("t1").cast("double")
    ) / nn
    cand = base.where(F.col("rn") < F.col("n")).select(
        *keys, "ord", "rn", "n", "s1", "t1",
        (sse_l + sse_r).alias("sse"),
        sse_tot.alias("sse_tot"),
    )
    pick = F.row_number().over(
        Window.partitionBy(*keys).orderBy(F.col("sse").asc(), F.col("rn").asc())
    )
    return (
        cand.withColumn("pick", pick)
        .where(F.col("pick") == 1)
        .select(
            *keys,
            F.col("n").cast("long").alias("n"),
            F.col("rn").cast("long").alias("split_idx"),
            F.col("ord").alias("split_at"),
            (F.col("s1").cast("double") / F.col("rn").cast("double"))
            .alias("left_mean"),
            ((F.col("t1") - F.col("s1")).cast("double")
             / (F.col("n") - F.col("rn")).cast("double")).alias("right_mean"),
            (F.col("sse_tot") - F.col("sse")).alias("gain"),
        )
    )


def esd_outliers(
    df: DataFrame,
    keys: list[str] | str,
    order_col: str,
    value_col: str,
    series_n: int,
    k: int = 3,
    alpha: float = 0.05,
) -> DataFrame:
    """Generalized ESD outlier test (Rosner 1983, the test inside
    Twitter's S-H-ESD): per fixed-length-``series_n`` series, remove
    the most-studentized sample ``k`` times, then declare the first
    ``max{i : R_i > lambda_i}`` removals outliers. The critical values
    ``lambda_i`` depend only on (n, k, alpha), so they are computed
    ONCE driver-side (kernel/tdist.py) and embedded as literals —
    identically in the oracle SQL, making parity by construction.

    Scale shape: the removal recurrence unrolls into ``k`` window
    passes over ONE series-key shuffle (conditional sums over active
    rows + a row_number argmax per round; Catalyst chains the window
    operators on the same partitioning — extra sorts, no extra
    exchanges). Series whose row count differs from ``series_n`` are
    dropped (the lambda ladder is n-specific; the query instance
    guarantees n via a dense zero-filled spine).

    Determinism: values are integer counts, so the conditional sums
    are exact; mean/std/R are one shared IEEE chain in both engines,
    and the argmax pins ties by (deviation DESC, order ASC). A round
    with zero variance removes nothing (R undefined), and later
    rounds of such a series cannot remove either. Returns the outlier
    rows: ``keys..., order_col, value, round, r_stat, lam``.
    """
    keys = _keylist(keys)
    lambdas = esd_lambdas(series_n, k, alpha)
    wp = Window.partitionBy(*keys)

    cur = (
        df.select(
            *keys,
            F.col(order_col).alias("ord"),
            F.col(value_col).cast("double").alias("v"),
        )
        .withColumn("_n", F.count("*").over(wp))
        .where(F.col("_n") == series_n)
        .drop("_n")
        .withColumn("rm", F.lit(None).cast("int"))
        .withColumn("r_stat", F.lit(None).cast("double"))
    )
    for i in range(1, k + 1):
        act = F.col("rm").isNull()
        # dynamic active count: a zero-variance round removes nothing,
        # so a hardcoded n-i+1 would poison later rounds' variance
        # (negative -> NaN std; Spark orders NaN ABOVE all numbers, so
        # a NaN guard comparison silently passes — use var > 0, never
        # std > 0 over a possibly-NaN sqrt)
        ma = F.col("ma_i")
        mean = F.col("sx_i") / ma
        var = (F.col("sxx_i") - F.col("sx_i") * F.col("sx_i") / ma) / (
            ma - F.lit(1.0)
        )
        wr = Window.partitionBy(*keys).orderBy(
            F.desc_nulls_last("dev_i"), F.asc("ord")
        )
        cur = (
            cur.withColumn(
                "ma_i",
                F.sum(F.when(act, F.lit(1))).over(wp).cast("double"),
            )
            .withColumn("sx_i", F.sum(F.when(act, F.col("v"))).over(wp))
            .withColumn(
                "sxx_i",
                F.sum(F.when(act, F.col("v") * F.col("v"))).over(wp),
            )
            .withColumn("dev_i", F.when(act, F.abs(F.col("v") - mean)))
            .withColumn("var_i", var)
            .withColumn("pick_i", F.row_number().over(wr))
            .withColumn(
                "take_i",
                (F.col("pick_i") == 1)
                & F.col("rm").isNull()
                & (F.col("var_i") > 0),
            )
            .withColumn(
                "r_stat",
                F.when(
                    F.col("take_i"),
                    F.col("dev_i") / F.sqrt(F.col("var_i")),
                ).otherwise(F.col("r_stat")),
            )
            .withColumn(
                "rm",
                F.when(F.col("take_i"), F.lit(i)).otherwise(F.col("rm")),
            )
            .drop("ma_i", "sx_i", "sxx_i", "dev_i", "var_i", "pick_i",
                  "take_i")
        )

    lam = F.element_at(
        F.array(*[F.lit(float(x)) for x in lambdas]), F.col("rm")
    )
    n_out = F.max(
        F.when(F.col("r_stat") > F.col("lam"), F.col("rm"))
    ).over(wp)
    return (
        cur.withColumn("lam", lam)
        .withColumn("n_out", n_out)
        .where(F.col("rm").isNotNull() & (F.col("rm") <= F.col("n_out")))
        .select(
            *keys,
            F.col("ord").alias(order_col),
            F.col("v").alias("value"),
            F.col("rm").cast("long").alias("round"),
            "r_stat",
            "lam",
        )
    )


def pettitt(
    df: DataFrame,
    keys: list[str] | str,
    order_col: str,
    value_col: str,
    round_digits: int | None = 6,
) -> DataFrame:
    """Pettitt (1979) nonparametric change-point test per series: the
    significance companion to ``change_points``' SSE split, exactly as
    ``mann_kendall`` is to ``theil_sen`` — it asks not "where is the
    biggest level shift" but "is there a shift at all", robust to
    outliers because only sign ranks enter.

    U_t = sum_{i <= t < j} sign(y_i - y_j) (Pettitt's classic
    left-minus-right orientation) is built WITHOUT the O(n^3)
    boundary-pair explosion: the per-element row sum
    V_x = sum_{j != x} sign(y_x - y_j) comes from one co-located
    O(n^2) pair join, and since within-segment pairs cancel by
    antisymmetry, U_t is exactly the cumulative window sum of V over
    x <= t.
    K = max_t |U_t| over the n-1 interior boundaries; the classic
    approximate significance is p = min(1, 2 exp(-6 K^2 / (n^3 +
    n^2))). The O(n^2) pair set is a per-series constant on the
    bounded tier series this targets (24-hour days) — the same
    documented boundary as theil_sen.

    Exactness: V, U, K are pure int64 arithmetic; the argmax boundary
    ties break to the EARLIEST t (matching change_points' tie
    direction); p is one fixed float expression over (K, n) — the
    DuckDB oracle matches bit-for-bit before round(6). Series need
    >= 2 points (no interior boundary otherwise).

    Returns per key: ``n, split_idx`` (left-segment size at the
    maximizing boundary), ``u_at_k`` (signed U there — positive means
    the left segment tends HIGHER), ``k_stat, p_value, significant``
    (p < 0.05).
    """
    keys = _keylist(keys)
    wo = Window.partitionBy(*keys).orderBy(order_col)
    base = df.select(
        *keys,
        (F.row_number().over(wo) - 1).alias("x"),
        F.col(value_col).cast("double").alias("y"),
    )
    a = base.select(*keys, F.col("x"), F.col("y").alias("ya"))
    b = base.select(*keys, F.col("x").alias("xj"), F.col("y").alias("yb"))
    v = (
        a.join(b, keys)
        .where(F.col("xj") != F.col("x"))
        .groupBy(*keys, "x")
        .agg(
            F.sum(
                F.when(F.col("ya") > F.col("yb"), 1)
                .when(F.col("ya") < F.col("yb"), -1)
                .otherwise(0)
            ).cast("long").alias("vx")
        )
    )
    wc = Window.partitionBy(*keys).orderBy("x")
    u = v.select(
        *keys,
        "x",
        F.sum("vx").over(wc.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long").alias("ut"),
        F.count("*").over(
            Window.partitionBy(*keys).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("n"),
    ).where((F.col("x") <= F.col("n") - 2) & (F.col("n") >= 2))
    wk = Window.partitionBy(*keys).orderBy(
        F.abs(F.col("ut")).desc(), F.col("x").asc()
    )
    best = u.select(
        *keys, "n", "x", "ut", F.row_number().over(wk).alias("rn")
    ).where(F.col("rn") == 1)

    nd = F.col("n").cast("double")
    kd = F.abs(F.col("ut")).cast("double")
    p = F.least(
        F.lit(1.0),
        F.lit(2.0) * F.exp(
            F.lit(-6.0) * kd * kd / (nd * nd * nd + nd * nd)
        ),
    )

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return best.select(
        *keys,
        "n",
        (F.col("x") + 1).cast("long").alias("split_idx"),
        F.col("ut").alias("u_at_k"),
        F.abs(F.col("ut")).alias("k_stat"),
        rnd(p).alias("p_value"),
        (p < F.lit(0.05)).alias("significant"),
    )
