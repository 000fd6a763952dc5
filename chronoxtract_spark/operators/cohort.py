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
