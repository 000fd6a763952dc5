"""Numeric-distribution drift between each key's early and late
halves: two-sample Kolmogorov-Smirnov distance + Population
Stability Index over reference-decile bins.

The numeric sibling of divergence.slice_divergence (which drifts
TOKEN distributions): the standard ML-monitoring pair for "has this
feature's distribution moved" — KS for the sharpest single-point
CDF gap, PSI for the binned mass-reallocation reading with its
industry verdict thresholds (< 0.1 stable, 0.1-0.2 moderate, > 0.2
drifted). Each key's time-ordered stream splits into a reference
half (first floor(n/2) points) and a current half; a production
deployment passes an explicit split instead (yesterday vs today,
train snapshot vs serving window) via ``split_col``.

Exactness contract (the battery family's):

- values fix to integer cents BEFORE any arithmetic;
- the KS statistic is computed entirely in int64: at each distinct
  value the ECDF gap |cum_ref * n_cur - cum_cur * n_ref| is an exact
  integer, its max divides once by n_ref * n_cur at the end;
- PSI bin edges are exact reference order statistics (rank
  ceil(k * n_ref / 10), k = 1..9, type-1 quantiles — duplicate edges
  under heavy ties are kept, deterministically collapsing empty
  bins); bin assignment is the integer comparison count
  sum_k [v > e_k];
- bin probabilities are Laplace-smoothed rationals
  (c + 1/2) / (n + 5) so slice-empty bins stay finite, and the PSI
  sum folds bins in ascending bin order (the proven sorted-fold
  contract), so a DuckDB oracle folding identically matches
  bit-for-bit before round(6). Only bins some row materializes
  contribute (a bin empty in BOTH halves adds its tiny smoothing
  residue in neither engine).

Spark-first shape: one shuffle on the key (every window below shares
it), one (key, value) pre-aggregation for the KS walk, a 9-edge
array built per key from pure rank expressions (no explode — the
candidate ranks are an array literal in n_ref, rows filter by
``array_contains``), a broadcast-sized edges join keyed on the same
partitioning, one (key, bin) count groupBy, one bounded
sorted-array fold per key. No UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ._util import epoch_seconds

PSI_BINS = 10
PSI_MODERATE = 0.1
PSI_DRIFTED = 0.2


def distribution_drift(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("turn_idx",),
    split_col: str | None = None,
    scale: int = 2,
    round_digits: int | None = 6,
) -> DataFrame:
    """Per-key numeric drift battery.

    Returns ``key, n_ref, n_cur, ks_d, psi, psi_verdict`` where
    ``psi_verdict`` is 'stable' / 'moderate' / 'drifted' by the
    standard 0.1 / 0.2 thresholds. ``split_col`` (boolean-ish: truthy
    = current half) overrides the default first-half/second-half
    time split. Keys where either half is empty report their counts
    with null statistics.
    """
    unit = 10**scale
    d = df.select(
        F.col(key_col).alias("_k"),
        epoch_seconds(df, ts_col).alias("_s"),
        F.round(F.col(value_col) * F.lit(unit), 0).cast("long").alias("_v"),
        *[F.col(c) for c in order_cols],
        *([F.col(split_col).cast("boolean").alias("_cur")] if split_col else []),
    )
    wall = Window.partitionBy("_k")
    if split_col is None:
        w = wall.orderBy("_s", *order_cols)
        d = d.select(
            "_k",
            "_v",
            (
                (F.row_number().over(w) - F.lit(1))
                >= (F.count("*").over(wall) / F.lit(2)).cast("long")
            ).alias("_cur"),
        )
    else:
        d = d.select("_k", "_v", "_cur")

    halves = d.select(
        "_k",
        "_v",
        F.when(F.col("_cur"), F.lit(0)).otherwise(F.lit(1)).alias("is_ref"),
        F.when(F.col("_cur"), F.lit(1)).otherwise(F.lit(0)).alias("is_cur"),
    )
    counts = halves.groupBy("_k").agg(
        F.sum("is_ref").cast("long").alias("n_ref"),
        F.sum("is_cur").cast("long").alias("n_cur"),
    )

    # --- KS: exact integer ECDF-gap walk over distinct values -------
    per_v = halves.groupBy("_k", "_v").agg(
        F.sum("is_ref").alias("ca"), F.sum("is_cur").alias("cb")
    )
    wv = Window.partitionBy("_k").orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    walk = per_v.select(
        "_k",
        F.sum("ca").over(wv).alias("cum_a"),
        F.sum("cb").over(wv).alias("cum_b"),
    )
    ks = (
        walk.join(counts, "_k")
        .groupBy("_k")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_a") * F.col("n_cur")
                    - F.col("cum_b") * F.col("n_ref")
                )
            ).alias("ks_int")
        )
    )

    # --- PSI: reference-decile edges, integer bin assignment --------
    # candidate edge ranks ceil(k * n_ref / 10), k = 1..9, as a pure
    # expression in n_ref — rows filter by membership, no explode.
    ref = halves.where(F.col("is_ref") == 1).join(counts, "_k")
    wr = Window.partitionBy("_k").orderBy("_v")
    ranked = ref.select(
        "_k",
        "_v",
        "n_ref",
        F.row_number().over(wr).alias("r"),
    )
    k_seq = F.sequence(F.lit(1), F.lit(PSI_BINS - 1))
    target_ranks = F.transform(
        k_seq, lambda k: ((k * F.col("n_ref") + F.lit(PSI_BINS - 1)) / PSI_BINS).cast("long")
    )
    edges = (
        ranked.where(F.array_contains(target_ranks, F.col("r")))
        .select(
            "_k",
            F.explode(
                F.filter(
                    k_seq,
                    lambda k: ((k * F.col("n_ref") + F.lit(PSI_BINS - 1)) / PSI_BINS).cast(
                        "long"
                    )
                    == F.col("r"),
                )
            ).alias("kq"),
            "_v",
        )
        .groupBy("_k")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("kq", "_v"))),
                lambda s: s["_v"],
            ).alias("edges")
        )
    )
    binned = (
        halves.join(edges, "_k", "left")
        .select(
            "_k",
            "is_ref",
            "is_cur",
            F.when(
                F.col("edges").isNotNull(),
                F.aggregate(
                    F.col("edges"),
                    F.lit(0),
                    lambda acc, e: acc
                    + F.when(F.col("_v") > e, 1).otherwise(0),
                ),
            ).alias("bin"),
        )
        .where(F.col("bin").isNotNull())
    )
    per_bin = binned.groupBy("_k", "bin").agg(
        F.sum("is_ref").cast("long").alias("c_ref"),
        F.sum("is_cur").cast("long").alias("c_cur"),
    )
    pb = per_bin.join(counts, "_k")
    p = (F.col("c_ref").cast("double") + F.lit(0.5)) / (
        F.col("n_ref").cast("double") + F.lit(5.0)
    )
    q = (F.col("c_cur").cast("double") + F.lit(0.5)) / (
        F.col("n_cur").cast("double") + F.lit(5.0)
    )
    terms = pb.select(
        "_k", "bin", ((p - q) * F.log(p / q)).alias("term")
    )
    psi = terms.groupBy("_k").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("bin", "term"))),
            F.lit(0.0),
            lambda acc, s: acc + s["term"],
        ).alias("psi")
    )

    out = (
        counts.join(ks, "_k", "left")
        .join(psi, "_k", "left")
        .select(
            "_k",
            "n_ref",
            "n_cur",
            "ks_int",
            F.when(F.col("n_ref") > 0, F.col("psi")).alias("psi"),
        )
    )
    valid = (F.col("n_ref") > 0) & (F.col("n_cur") > 0)
    ks_d = F.when(
        valid,
        F.col("ks_int").cast("double")
        / (F.col("n_ref") * F.col("n_cur")).cast("double"),
    )
    psi_c: Column = F.when(valid, F.col("psi"))

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return out.select(
        F.col("_k").alias(key_col),
        "n_ref",
        "n_cur",
        rnd(ks_d).alias("ks_d"),
        rnd(psi_c).alias("psi"),
        F.when(psi_c > F.lit(PSI_DRIFTED), F.lit("drifted"))
        .when(psi_c > F.lit(PSI_MODERATE), F.lit("moderate"))
        .when(psi_c.isNotNull(), F.lit("stable"))
        .alias("psi_verdict"),
    )


CRAMERS_WEAK = 0.1
CRAMERS_STRONG = 0.3


def mix_drift(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    cat_col: str = "event_type",
    order_cols: tuple[str, ...] = ("turn_idx",),
    round_digits: int | None = 6,
) -> DataFrame:
    """Categorical mix drift per key: did the composition of
    ``cat_col`` change between the stream's early and late halves?
    The categorical sibling of ``distribution_drift`` above (which
    reads a NUMERIC column): a chi-square homogeneity test over the
    category x half contingency table plus Cramér's V effect size,
    with the conventional verdict bands (V < 0.1 none, < 0.3 weak,
    else strong — effect size, deliberately not a p-value, so the
    reading is sample-size-stable).

    Exactness: every cell term clears its expectations —
    (O - E)^2 / E = (n*O - R*C)^2 / (n*R*C) with R the category
    total and C the half total, both exact int64 — so chi2 is a
    category-sorted fold of one-float-division terms over exact
    decimal(38,0)/HUGEINT products (cells with O = 0 contribute
    their real (R*C)^2 term: the grid is categories x 2, never
    sparse-dropped). For the 2-column table dof = T - 1 and
    V = sqrt(chi2 / n). Guards: an empty half or a single category
    null the test.

    Spark-first: one (key, category) groupBy carrying both halves'
    conditional counts (the only event-sized shuffle), one per-key
    fold over the bounded category list. No UDF, no window beyond
    the shared half-split rank. Returns ``key, n, n_cats, chi2,
    cramers_v, verdict``.
    """
    d = df.select(
        F.col(key_col).alias("_k"),
        epoch_seconds(df, ts_col).alias("_s"),
        F.col(cat_col).cast("string").alias("_c"),
        *[F.col(c) for c in order_cols],
    )
    wall = Window.partitionBy("_k")
    w = wall.orderBy("_s", *order_cols)
    halves = d.select(
        "_k",
        "_c",
        (
            (F.row_number().over(w) - F.lit(1))
            >= (F.count("*").over(wall) / F.lit(2)).cast("long")
        ).alias("_cur"),
    )
    per_cat = halves.groupBy("_k", "_c").agg(
        F.sum(F.when(~F.col("_cur"), 1).otherwise(0))
        .cast("long")
        .alias("o_ref"),
        F.sum(F.when(F.col("_cur"), 1).otherwise(0))
        .cast("long")
        .alias("o_cur"),
    )
    totals = per_cat.groupBy("_k").agg(
        F.sum("o_ref").cast("long").alias("c_ref"),
        F.sum("o_cur").cast("long").alias("c_cur"),
        F.count("*").cast("long").alias("n_cats"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cells = per_cat.join(totals, "_k").select(
        "_k",
        "_c",
        "n_cats",
        "c_ref",
        "c_cur",
        (F.col("c_ref") + F.col("c_cur")).alias("n"),
        (F.col("o_ref") + F.col("o_cur")).alias("r"),
        "o_ref",
        "o_cur",
    )

    def term(o, c):
        num = dec(F.col("n")) * dec(F.col(o)) - dec(F.col("r")) * dec(
            F.col(c)
        )
        return (num * num).cast("double") / (
            dec(F.col("n")) * dec(F.col("r")) * dec(F.col(c))
        ).cast("double")

    valid_half = (F.col("c_ref") > 0) & (F.col("c_cur") > 0)
    terms = cells.select(
        "_k",
        "_c",
        "n_cats",
        "n",
        F.when(valid_half, term("o_ref", "c_ref") + term("o_cur", "c_cur"))
        .alias("t"),
    )
    agg = terms.groupBy("_k").agg(
        F.max("n_cats").alias("n_cats"),
        F.max("n").alias("n"),
        F.min(F.col("t").isNotNull()).alias("ok"),
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.when(F.col("t").isNotNull(), F.struct("_c", "t"))
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["t"],
        ).alias("chi2"),
    )
    valid = F.col("ok") & (F.col("n_cats") >= F.lit(2))
    chi2 = F.when(valid, F.col("chi2"))
    v = F.when(valid, F.sqrt(F.col("chi2") / F.col("n").cast("double")))
    verdict = F.when(
        v.isNotNull(),
        F.when(v < F.lit(CRAMERS_WEAK), F.lit("none"))
        .when(v < F.lit(CRAMERS_STRONG), F.lit("weak"))
        .otherwise(F.lit("strong")),
    )

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return agg.select(
        F.col("_k").alias(key_col),
        "n",
        "n_cats",
        rnd(chi2).alias("chi2"),
        rnd(v).alias("cramers_v"),
        verdict.alias("verdict"),
    )


def qq_drift(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("turn_idx",),
    n_bins: int = PSI_BINS,
    scale: int = 2,
    round_digits: int | None = 6,
) -> DataFrame:
    """Per-key decile QQ ladder between the stream's early and late
    halves — WHERE the distribution moved, the per-quantile
    complement of ``distribution_drift``'s scalar KS/PSI verdicts
    (a pure location shift moves every decile equally; a tail
    blow-up moves only the top rungs; variance growth fans the
    ladder out symmetrically).

    For k = 1..n_bins-1 both halves' k-th decile is the exact type-1
    order statistic at rank ceil(k * n_half / n_bins) (the same cut
    the PSI edges use), pinned by the integer-cent value sort.
    ``shift`` is the current-minus-reference decile difference in
    value units. Keys where either half is empty emit nothing.

    Exactness: order statistics of integer cents — the only float is
    the final unit rescale. One key shuffle shared by both halves'
    rank windows; the candidate ranks are pure expressions in the
    half size (array_contains filter, no explode of data rows — the
    bounded k-list explodes only on the <= 2*(n_bins-1) edge rows
    per key). Returns ``key, decile, q_ref, q_cur, shift``.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    unit = 10 ** scale
    d = df.select(
        F.col(key_col).alias("_k"),
        epoch_seconds(df, ts_col).alias("_s"),
        F.round(F.col(value_col) * F.lit(unit), 0).cast("long").alias("_v"),
        *[F.col(c) for c in order_cols],
    )
    wall = Window.partitionBy("_k")
    w = wall.orderBy("_s", *order_cols)
    halves = d.select(
        "_k",
        "_v",
        (
            (F.row_number().over(w) - F.lit(1))
            >= (F.count("*").over(wall) / F.lit(2)).cast("long")
        ).alias("_cur"),
    )
    wh = Window.partitionBy("_k", "_cur").orderBy("_v")
    whall = Window.partitionBy("_k", "_cur")
    ranked = halves.select(
        "_k",
        "_cur",
        "_v",
        F.row_number().over(wh).alias("r"),
        F.count("*").over(whall).alias("nh"),
    )
    k_seq = F.sequence(F.lit(1), F.lit(n_bins - 1))
    target = lambda k: (  # noqa: E731
        (k * F.col("nh") + F.lit(n_bins - 1)) / n_bins
    ).cast("long")
    edges = (
        ranked.where(
            F.array_contains(F.transform(k_seq, target), F.col("r"))
        )
        .select(
            "_k",
            "_cur",
            "_v",
            F.explode(
                F.filter(k_seq, lambda k: target(k) == F.col("r"))
            ).alias("decile"),
        )
    )
    piv = edges.groupBy("_k", "decile").agg(
        F.max(F.when(~F.col("_cur"), F.col("_v"))).alias("vr"),
        F.max(F.when(F.col("_cur"), F.col("_v"))).alias("vc"),
    ).where(F.col("vr").isNotNull() & F.col("vc").isNotNull())
    uf = F.lit(float(unit))

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return piv.select(
        F.col("_k").alias(key_col),
        F.col("decile").cast("long").alias("decile"),
        rnd(F.col("vr").cast("double") / uf).alias("q_ref"),
        rnd(F.col("vc").cast("double") / uf).alias("q_cur"),
        rnd((F.col("vc") - F.col("vr")).cast("double") / uf).alias("shift"),
    )
