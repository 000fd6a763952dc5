"""Distribution drift between corpus slices: bounded-vocabulary
Jensen-Shannon divergence and total-variation distance.

The training-data QA staple: quantify how far each slice's token
distribution sits from the rest of the corpus (language vs corpus,
yesterday vs today, train vs val...). Reports, per slice value:

- ``jsd_nats`` — Jensen-Shannon divergence JS(P_slice || P_rest) in
  nats (0 identical, ln 2 disjoint): the symmetric, always-finite
  divergence, safe where KL blows up on slice-only terms.
- ``tv_dist`` — total-variation distance 0.5 * sum |p - q|.
- token totals for the slice and its complement, and the closed
  vocabulary size used.

Scale-correct closed vocabulary: distributions are restricted to the
TOP-``vocab_k`` terms by global count (ties broken by term), with all
remaining mass lumped into one ``< other >`` bucket (the sentinel contains
spaces, which no whitespace-split token can, so a real corpus token
can never collide with it) — so the per-slice
fold arrays are bounded by vocab_k + 1 regardless of corpus size, the
top-k is a distributed TakeOrdered (orderBy + limit), never a global
sort materialization, and JS stays well-defined on the exact same
closed support for every slice. The lumping is exact (int64 count
arithmetic), not sampling.

Exactness: every probability is a ratio of int64 counts; both
divergence sums are sequential folds over term-label-sorted arrays
(the engine's sorted-array-fold oracle contract), so a DuckDB oracle
folding identically-ordered term lists matches bit-for-bit before
round(6).

Spark-first shape: one (slice, term) count groupBy over the exploded
tokens (the only corpus-sized shuffle, map-side partials), a global
term rollup with orderBy(...).limit(vocab_k) top-k, a broadcast
vocab join to remap the tail to <other>, then a tiny
(slices x closed-vocab) grid — bounded rows — for the union-support
terms. Tokenization shares operators.text.normalized_text with the
dedup/fingerprint family so the surfaces can never disagree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import normalized_text

OTHER = "< other >"  # contains spaces: no whitespace-split token can collide


def slice_divergence(
    df: DataFrame,
    slice_col: str = "lang",
    text_col: str = "text",
    vocab_k: int = 5000,
    round_digits: int | None = 6,
) -> DataFrame:
    toks = df.select(
        F.col(slice_col).cast("string").alias("_sl"),
        F.explode(
            F.filter(
                F.split(normalized_text(text_col), " "), lambda x: x != ""
            )
        ).alias("term"),
    )
    counts = toks.groupBy("_sl", "term").agg(
        F.count("*").cast("long").alias("c")
    )
    gl = counts.groupBy("term").agg(F.sum("c").cast("long").alias("ct"))
    vocab = gl.orderBy(F.col("ct").desc(), F.col("term")).limit(
        int(vocab_k)
    ).select("term", F.lit(1).alias("_in_vocab"))
    c2 = (
        counts.join(F.broadcast(vocab), "term", "left")
        .select(
            "_sl",
            F.when(F.col("_in_vocab").isNotNull(), F.col("term"))
            .otherwise(F.lit(OTHER))
            .alias("term"),
            "c",
        )
        .groupBy("_sl", "term")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    ct2 = c2.groupBy("term").agg(F.sum("c").cast("long").alias("ct"))
    nl = c2.groupBy("_sl").agg(F.sum("c").cast("long").alias("n_l"))
    grand = nl.agg(F.sum("n_l").cast("long").alias("n_tot"))

    grid = (
        nl.join(F.broadcast(grand))
        .crossJoin(F.broadcast(ct2))
        .join(c2, ["_sl", "term"], "left")
        .select(
            "_sl",
            "term",
            "n_l",
            "n_tot",
            "ct",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    # nullif guards: a slice that IS the whole corpus has no "rest"
    # distribution — divergence is undefined (null), not NaN
    p = F.col("c").cast("double") / F.col("n_l").cast("double")
    q = (F.col("ct") - F.col("c")).cast("double") / F.nullif(
        (F.col("n_tot") - F.col("n_l")).cast("double"), F.lit(0.0)
    )
    m = (p + q) / F.lit(2.0)
    contrib = F.lit(0.5) * (
        F.when(F.col("c") > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("ct") > F.col("c"), q * F.log(q / m)).otherwise(
            F.lit(0.0)
        )
    )
    tvterm = F.lit(0.5) * F.abs(p - q)
    terms = grid.select(
        "_sl", "n_l", "n_tot", "term", contrib.alias("j"), tvterm.alias("tv")
    )
    agg = terms.groupBy("_sl", "n_l", "n_tot").agg(
        F.count("*").cast("long").alias("n_vocab"),
        F.array_sort(F.collect_list(F.struct("term", "j", "tv"))).alias("arr"),
    )

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return agg.select(
        F.col("_sl").alias(slice_col),
        F.col("n_l").alias("n_tokens"),
        (F.col("n_tot") - F.col("n_l")).alias("n_tokens_rest"),
        "n_vocab",
        rnd(
            F.aggregate("arr", F.lit(0.0), lambda a, x: a + x["j"])
        ).alias("jsd_nats"),
        rnd(
            F.aggregate("arr", F.lit(0.0), lambda a, x: a + x["tv"])
        ).alias("tv_dist"),
    )


def vocab_overlap(
    df: DataFrame,
    slice_col: str = "source",
    text_col: str = "text",
    top_k: int = 200,
    round_digits: int | None = 6,
) -> DataFrame:
    """Pairwise top-k vocabulary overlap between corpus slices — the
    set-based complement of ``slice_divergence``'s distributional
    JSD: which sources even SHARE a headline vocabulary, the screen a
    curation pipeline runs before mixing sources or weighting a
    sampler. For every unordered slice pair it reports the slice's
    top-``top_k`` term sets' intersection size, Jaccard similarity
    |A n B| / |A u B|, and overlap coefficient |A n B| / min(|A|,|B|)
    (robust when one slice is much smaller than k).

    Determinism/exactness: top-k is pinned by (count DESC, term ASC)
    row_number; every reported number is a ratio of exact int64 set
    sizes with one float division. Tokenization shares
    ``operators.text.normalized_text`` with the dedup / fingerprint /
    divergence family so the surfaces can never disagree.

    Spark-first shape: one (slice, term) count groupBy over the
    exploded tokens (the only corpus-sized shuffle, map-side
    partials), a rank window over the REDUCED count table, then a
    bounded slices x k self-equi-join on term and a tiny slice-pair
    grid (pairs sharing NOTHING still emit their zero row). Slices
    with no tokens at all carry no rows. Returns ``slice_a, slice_b,
    k_a, k_b, n_common, jaccard, overlap``.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    toks = df.select(
        F.col(slice_col).cast("string").alias("_sl"),
        F.explode(
            F.filter(
                F.split(normalized_text(text_col), " "),
                lambda x: x != "",
            )
        ).alias("term"),
    )
    counts = toks.groupBy("_sl", "term").agg(
        F.count("*").cast("long").alias("c")
    )
    wr = Window.partitionBy("_sl").orderBy(
        F.col("c").desc(), F.col("term").asc()
    )
    topk = counts.select(
        "_sl", "term", F.row_number().over(wr).alias("r")
    ).where(F.col("r") <= top_k)
    sizes = topk.groupBy("_sl").agg(F.count("*").cast("long").alias("ksz"))
    common = (
        topk.select(F.col("_sl").alias("sa"), "term")
        .join(topk.select(F.col("_sl").alias("sb"), "term"), "term")
        .where(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    grid = (
        sizes.select(F.col("_sl").alias("sa"), F.col("ksz").alias("k_a"))
        .join(
            sizes.select(F.col("_sl").alias("sb"), F.col("ksz").alias("k_b"))
        )
        .where(F.col("sa") < F.col("sb"))
        .join(common, ["sa", "sb"], "left")
        .select(
            "sa",
            "sb",
            "k_a",
            "k_b",
            F.coalesce(F.col("n_common"), F.lit(0)).cast("long").alias(
                "n_common"
            ),
        )
    )

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    union = (F.col("k_a") + F.col("k_b") - F.col("n_common")).cast("double")
    return grid.select(
        F.col("sa").alias("slice_a"),
        F.col("sb").alias("slice_b"),
        "k_a",
        "k_b",
        "n_common",
        rnd(F.col("n_common").cast("double") / union).alias("jaccard"),
        rnd(
            F.col("n_common").cast("double")
            / F.least("k_a", "k_b").cast("double")
        ).alias("overlap"),
    )
