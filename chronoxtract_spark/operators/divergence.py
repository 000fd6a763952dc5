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

from pyspark.sql import DataFrame, functions as F

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
