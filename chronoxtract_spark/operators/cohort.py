"""Cohort retention and cross-series correlation matrices — the two
"grid" analytics an event tier renders as heatmaps.

``cohort_retention``: classic product-analytics retention — entities
cohorted by their FIRST active day, counted on each later active day
as a (cohort_day, day_offset) matrix plus the rate against cohort
size. One entity-key shuffle to first-days (a window min co-located
with the per-(entity, day) dedup), one (cohort, offset) aggregation.
All counts exact; the rate is one division of exact integers.

``corr_matrix``: pairwise Pearson between k aligned count series
(k small — event types, service names), from ONE dense grid build:
the per-series moments and the pairwise cross-moments come from a
self-join of the grid on the time key restricted to ``name1 < name2``
— co-located on the time-key shuffle, k^2/2 output rows, never a
cross join over raw events. Integer sums keep it bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cohort_retention(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    max_offset: int | None = None,
) -> DataFrame:
    """Retention matrix: for each cohort (an entity's first active
    day) and day offset ``d >= 0``, how many of the cohort's entities
    were active on ``cohort_day + d`` and the retained fraction.

    Returns ``cohort_day (string yyyy-MM-dd), day_offset, n_active,
    cohort_size, retention``.
    """
    day = F.date_format(F.col(ts_col).cast("timestamp"), "yyyy-MM-dd")
    active = (
        df.select(F.col(entity_col).alias("ent"), day.alias("day"))
        .distinct()
    )
    firsts = active.groupBy("ent").agg(F.min("day").alias("cohort_day"))
    joined = active.join(firsts, "ent").select(
        "ent", "cohort_day",
        F.datediff(F.to_date("day"), F.to_date("cohort_day"))
        .cast("long").alias("day_offset"),
    )
    if max_offset is not None:
        joined = joined.where(F.col("day_offset") <= int(max_offset))
    cells = joined.groupBy("cohort_day", "day_offset").agg(
        F.count("*").cast("long").alias("n_active")
    )
    sizes = firsts.groupBy("cohort_day").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    return cells.join(sizes, "cohort_day").select(
        "cohort_day", "day_offset", "n_active", "cohort_size",
        (F.col("n_active").cast("double")
         / F.col("cohort_size").cast("double")).alias("retention"),
    )


def corr_matrix(
    df: DataFrame,
    name_col: str,
    ts_col: str,
    step_s: int,
) -> DataFrame:
    """Pairwise Pearson correlation between the per-``name`` count
    series on a shared dense ``step_s`` grid (union span of all
    names, zeros where silent). Pairs emit once with
    ``name1 < name2``; a constant series yields null correlation.

    Returns ``name1, name2, n, corr`` — ``n`` the shared grid length.
    All sums are exact BIGINTs; ``corr`` is the single
    ``(n*sxy - sx*sy)/sqrt(...)`` float chain, bit-exact.
    """
    step_us = int(step_s) * 1_000_000
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = df.select(
        F.col(name_col).alias("name"),
        (t_us - (t_us % step_us)).alias("g_us"),
    )
    counts = base.groupBy("name", "g_us").agg(
        F.count("*").cast("long").alias("c")
    )
    span = counts.agg(
        F.min("g_us").alias("g_lo"), F.max("g_us").alias("g_hi")
    )
    names = counts.select("name").distinct()
    spine = names.crossJoin(F.broadcast(span)).select(
        "name",
        F.explode(
            F.sequence(F.col("g_lo"), F.col("g_hi"), F.lit(step_us))
        ).alias("g_us"),
    )
    grid = spine.join(counts, ["name", "g_us"], "left").select(
        "name", "g_us", F.coalesce("c", F.lit(0)).alias("c")
    )
    a = grid.select(
        F.col("name").alias("name1"), "g_us", F.col("c").alias("x")
    )
    b = grid.select(
        F.col("name").alias("name2"), "g_us", F.col("c").alias("y")
    )
    pairs = a.join(b, "g_us").where(F.col("name1") < F.col("name2"))
    sums = pairs.groupBy("name1", "name2").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return sums.select(
        "name1", "name2", "n",
        F.when((dx > 0) & (dy > 0), num / F.sqrt(dx * dy)).alias("corr"),
    )


def spearman_matrix(
    df: DataFrame,
    name_col: str,
    ts_col: str,
    step_s: int,
) -> DataFrame:
    """Pairwise Spearman rank correlation between the per-``name``
    count series on the shared dense grid — the robust complement of
    ``corr_matrix``: Pearson sees linear co-movement of the raw
    counts (and one bursty hour can dominate it), Spearman sees any
    MONOTONE association and is invariant to per-series monotone
    rescaling.

    Spearman = Pearson over average ranks. Because the grid is dense
    and shared by every name, each series' ranks are computed ONCE
    per name (not per pair): with ties taking their average rank,
    ``2*avg_rank = 2*rank_min + n_ties - 1`` is an exact integer, so
    doubled ranks keep the whole computation in integer arithmetic —
    rank via one (name)-partitioned sort window, tie counts via one
    (name, value) count window, then the identical time-key
    co-located pair self-join and moment aggregation as
    ``corr_matrix``. The three second-order sums are carried in
    decimal(38,0) (doubled ranks reach 2n, so int64 would cap the
    grid near 1.3e6 cells; the DuckDB oracle's HUGEINT matches to
    10^38). Constant series (all ranks tied) null out via the same
    variance guard.

    Returns ``name1, name2, n, rho`` — ``n`` the shared grid length.
    """
    step_us = int(step_s) * 1_000_000
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = df.select(
        F.col(name_col).alias("name"),
        (t_us - (t_us % step_us)).alias("g_us"),
    )
    counts = base.groupBy("name", "g_us").agg(
        F.count("*").cast("long").alias("c")
    )
    span = counts.agg(
        F.min("g_us").alias("g_lo"), F.max("g_us").alias("g_hi")
    )
    names = counts.select("name").distinct()
    spine = names.crossJoin(F.broadcast(span)).select(
        "name",
        F.explode(
            F.sequence(F.col("g_lo"), F.col("g_hi"), F.lit(step_us))
        ).alias("g_us"),
    )
    grid = spine.join(counts, ["name", "g_us"], "left").select(
        "name", "g_us", F.coalesce("c", F.lit(0)).alias("c")
    )
    wrank = Window.partitionBy("name").orderBy("c")
    wtie = Window.partitionBy("name", "c")
    ranked = grid.select(
        "name",
        "g_us",
        (
            F.lit(2) * F.rank().over(wrank)
            + F.count("*").over(wtie)
            - F.lit(1)
        ).cast("long").alias("r2"),
    )
    a = ranked.select(
        F.col("name").alias("name1"), "g_us", F.col("r2").alias("x")
    )
    b = ranked.select(
        F.col("name").alias("name2"), "g_us", F.col("r2").alias("y")
    )
    pairs = a.join(b, "g_us").where(F.col("name1") < F.col("name2"))
    dec = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    sums = pairs.groupBy("name1", "name2").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x")) * dec(F.col("x"))).alias("sxx"),
        F.sum(dec(F.col("y")) * dec(F.col("y"))).alias("syy"),
        F.sum(dec(F.col("x")) * dec(F.col("y"))).alias("sxy"),
    )
    nd = F.col("n").cast("decimal(19,0)")
    num = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return sums.select(
        "name1", "name2", "n",
        F.when((dx > 0) & (dy > 0), num / F.sqrt(dx * dy)).alias("rho"),
    )


def cooccurrence_mi(
    df: DataFrame,
    name_col: str = "event_type",
    ts_col: str = "ts",
    bucket_s: int = 3600,
    round_digits: int | None = 6,
) -> DataFrame:
    """Pairwise temporal co-occurrence between the per-``name``
    activity indicators: in which hours is each pair active TOGETHER,
    beyond what their individual activity rates explain? The binary
    sibling of ``corr_matrix``/``spearman_matrix`` (which need count
    co-MOVEMENT; this fires on mere co-presence — the right screen
    for sparse or on/off signals):

    - ``mi_nats`` — mutual information of the two presence indicators
      over the shared global bucket span (0 independent, up to ln 2),
    - ``phi`` — the 2x2 phi coefficient (signed: negative means the
      pair AVOIDS each other's hours),
    - ``n_both`` and the span ``n_buckets`` for the raw reading.

    Exactness: the whole 2x2 table comes from exact int64 SET sizes —
    n11 = |A ∩ B| (one bucket equi-join of the distinct-bucket sets),
    marginals |A|, |B|, and the global span H = max - min + 1; no
    dense spine is ever materialized (the complement cells are
    H-arithmetic). Every MI term is (nij/H) * ln((H*nij)/(ri*cj))
    with both ratio operands exact decimal(38,0)/HUGEINT products,
    folded in the pinned (11, 10, 01, 00) order with zero cells
    contributing exactly zero; phi clears to one float division over
    a sqrt of an exact product. Degenerate marginals (a name active
    in every bucket or none) null phi and zero the conditional MI
    terms consistently in both engines.

    One distinct-(name, bucket) projection off the events (the only
    event-sized work), a bucket equi-join between bounded distinct
    sets, a names x names grid (pairs sharing nothing still emit),
    and the 1-row global-span scalar attach (the corr_matrix
    pattern). Returns ``name_a, name_b, n_buckets, n_a, n_b, n_both,
    mi_nats, phi``.
    """
    from ._util import epoch_seconds

    hrs = (
        df.select(
            F.col(name_col).cast("string").alias("_n"),
            F.floor(epoch_seconds(df, ts_col) / F.lit(int(bucket_s)))
            .cast("long")
            .alias("b"),
        )
        .distinct()
    )
    span = hrs.agg(
        (F.max("b") - F.min("b") + F.lit(1)).cast("long").alias("h")
    )
    sizes = hrs.groupBy("_n").agg(F.count("*").cast("long").alias("sz"))
    both = (
        hrs.select(F.col("_n").alias("na"), "b")
        .join(hrs.select(F.col("_n").alias("nb"), "b"), "b")
        .where(F.col("na") < F.col("nb"))
        .groupBy("na", "nb")
        .agg(F.count("*").cast("long").alias("n11"))
    )
    grid = (
        sizes.select(F.col("_n").alias("na"), F.col("sz").alias("sa"))
        .join(sizes.select(F.col("_n").alias("nb"), F.col("sz").alias("sb")))
        .where(F.col("na") < F.col("nb"))
        .join(both, ["na", "nb"], "left")
        .crossJoin(F.broadcast(span))
        .select(
            "na",
            "nb",
            "h",
            "sa",
            "sb",
            F.coalesce(F.col("n11"), F.lit(0)).cast("long").alias("n11"),
        )
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    n10 = (F.col("sa") - F.col("n11")).alias("n10")
    n01 = (F.col("sb") - F.col("n11")).alias("n01")
    n00 = (F.col("h") - F.col("sa") - F.col("sb") + F.col("n11")).alias(
        "n00"
    )
    cells = grid.select("na", "nb", "h", "sa", "sb", "n11", n10, n01, n00)
    hd = F.col("h").cast("double")

    def term(nij, ri, cj):
        num = dec(F.col("h")) * dec(F.col(nij))
        den = dec(ri) * dec(cj)
        return F.when(
            F.col(nij) > 0,
            (F.col(nij).cast("double") / hd)
            * F.log(num.cast("double") / den.cast("double")),
        ).otherwise(F.lit(0.0))

    ca, cb = F.col("sa"), F.col("sb")
    ia, ib = F.col("h") - F.col("sa"), F.col("h") - F.col("sb")
    mi = (
        term("n11", ca, cb)
        + term("n10", ca, ib)
        + term("n01", ia, cb)
        + term("n00", ia, ib)
    )
    phi_den = dec(ca) * dec(ia) * dec(cb) * dec(ib)
    phi_num = dec(F.col("n11")) * dec(F.col("n00")) - dec(
        F.col("n10")
    ) * dec(F.col("n01"))
    phi = F.when(
        phi_den > F.lit(0),
        phi_num.cast("double") / F.sqrt(phi_den.cast("double")),
    )

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return cells.select(
        F.col("na").alias("name_a"),
        F.col("nb").alias("name_b"),
        F.col("h").alias("n_buckets"),
        F.col("sa").alias("n_a"),
        F.col("sb").alias("n_b"),
        F.col("n11").alias("n_both"),
        rnd(mi).alias("mi_nats"),
        rnd(phi).alias("phi"),
    )
