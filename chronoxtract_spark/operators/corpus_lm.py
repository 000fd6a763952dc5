"""Corpus-level statistical analytics: PMI term-pair association and
Zipf rank-frequency fitting — the vocabulary-shaped diagnostics a
training-data pipeline reads before trusting a new corpus (collocation
drift, boilerplate domination, vocabulary collapse after dedup).

Scale shape
-----------
``pmi_pairs``: the classic co-occurrence blow-up is bounded UP FRONT —
only the top-``vocab_k`` terms by document frequency participate (the
vocabulary table is broadcast), so the per-document pair explosion is
``O(min(L, vocab_k)^2)`` over the FILTERED token set, not raw length.
One (doc) dedup shuffle, one (pair) count shuffle, N and df broadcast.

``zipf_fit``: term frequencies (one shuffle), rank by count (window
over the vocabulary-sized table), then a driver-sized OLS of
``ln(freq)`` on ``ln(rank)`` in ONE aggregation — the slope is the
Zipf exponent (~-1 for natural text).

Oracle determinism
------------------
Counts and ranks are exact (count DESC, term ASC rank pin). PMI and
the OLS run over ``ln`` values (libm ulp noise), so pmi rounds to 6
and the fit coefficients to 6; both engines rank identical exact
counts, so the ln inputs are identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chronoxtract_spark.operators.text import normalized_text


def pmi_pairs(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    vocab_k: int = 100,
    min_pair_docs: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Top-``top_k`` term pairs by pointwise mutual information
    ``ln(N * df_ab / (df_a * df_b))`` over DOCUMENT co-occurrence
    (presence, not counts), restricted to the ``vocab_k`` most
    document-frequent terms (df DESC, term ASC pin) and to pairs
    co-occurring in at least ``min_pair_docs`` documents.

    Returns ``t1, t2 (t1 < t2), n_docs_pair, df1, df2, pmi, rank`` —
    ranked by (pmi rounded to 6 DESC, t1, t2).
    """
    toks = df.select(
        F.col(key_col).alias("doc"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(normalized_text(text_col), " "),
                    lambda t: t != "",
                )
            )
        ).alias("term"),
    )
    docfreq = toks.groupBy("term").agg(F.count("*").alias("df"))
    vocab = (
        docfreq.withColumn(
            "vrank",
            F.row_number().over(
                Window.orderBy(F.desc("df"), F.asc("term"))
            ),
        )
        .where(F.col("vrank") <= int(vocab_k))
        .select("term", "df")
    )
    kept = toks.join(F.broadcast(vocab), "term")
    a = kept.select("doc", F.col("term").alias("t1"), F.col("df").alias("df1"))
    b = kept.select("doc", F.col("term").alias("t2"), F.col("df").alias("df2"))
    pairs = a.join(b, "doc").where(F.col("t1") < F.col("t2"))
    counts = pairs.groupBy("t1", "t2", "df1", "df2").agg(
        F.count("*").cast("long").alias("n_docs_pair")
    ).where(F.col("n_docs_pair") >= int(min_pair_docs))
    n_docs = df.select(F.count("*").alias("n_docs"))
    pmi = F.round(
        F.log(
            F.col("n_docs").cast("double")
            * F.col("n_docs_pair").cast("double")
            / (F.col("df1").cast("double") * F.col("df2").cast("double"))
        ),
        6,
    )
    scored = counts.crossJoin(F.broadcast(n_docs)).select(
        "t1", "t2", "n_docs_pair",
        F.col("df1").cast("long").alias("df1"),
        F.col("df2").cast("long").alias("df2"),
        pmi.alias("pmi"),
    )
    rank = F.row_number().over(
        Window.orderBy(F.desc("pmi"), F.asc("t1"), F.asc("t2"))
    )
    return (
        scored.withColumn("rank", rank.cast("long"))
        .where(F.col("rank") <= int(top_k))
    )


def zipf_fit(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 200,
) -> DataFrame:
    """OLS fit of ``ln(freq) = slope * ln(rank) + intercept`` over the
    ``top_n`` most frequent terms (count DESC, term ASC rank pin) —
    the Zipf exponent diagnostic. Returns ONE row: ``n_terms, slope,
    intercept, r2, total_tokens`` (slope/intercept/r2 rounded to 6).
    """
    toks = df.select(
        F.explode(
            F.filter(
                F.split(normalized_text(text_col), " "), lambda t: t != ""
            )
        ).alias("term")
    )
    freq = toks.groupBy("term").agg(F.count("*").alias("freq"))
    ranked = freq.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("term"))),
    ).where(F.col("rank") <= int(top_n))
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("freq").cast("double"))
    fit = ranked.agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"), F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
        F.sum("freq").cast("long").alias("total_tokens"),
    )
    n = F.col("n_terms").cast("double")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = n * F.col("syy") - F.col("sy") * F.col("sy")
    # degenerate-variance guards (all-equal ranks/freqs): null, never
    # a divide-by-zero (Spark ANSI throws; when() branches lazily)
    slope = F.when(dx > 0, num / dx)
    intercept = F.when(dx > 0, (F.col("sy") - (num / dx) * F.col("sx")) / n)
    r2 = F.when((dx > 0) & (dy > 0), (num * num) / (dx * dy))
    return fit.select(
        "n_terms",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
        "total_tokens",
    )
