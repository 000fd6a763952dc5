"""BM25 retrieval scoring (Robertson/Spärck Jones Okapi BM25, the
Lucene ``1 + (N - df + 0.5)/(df + 0.5)`` idf variant): score every
document against a small query set and keep the top-k per query — the
ranking half of the corpus stack (tfidf_terms is the per-document
term-weighting half; this joins a query side to it).

Scale shape
-----------
ONE shuffle over the corpus: tokens explode to (doc, term) and
aggregate to term frequencies, with the document length carried
THROUGH the explode as a functionally-dependent group key (zero extra
shuffle — no doc-keyed rejoin for dl). Everything else is broadcast:
the query terms (tiny), the per-term document frequencies
(vocabulary-sized), and the 1-row (N, avgdl) corpus stats. The final
per-(query, doc) reduction and top-k rank window shuffle only rows
that matched a query term.

Oracle determinism
------------------
tf / df / dl / N are exact integers and avgdl is one division of
exact integers. Each term's score is a short float chain with one
``ln`` (libm ulp noise ~1e-16 relative); the per-(query, doc) sum
adds association-order noise ~1e-15. Scores are rounded to 6 decimals
BEFORE ranking and ties break by doc ascending (the tfidf_terms
convention), so both engines rank identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chronoxtract_spark.operators.text import normalized_text


def bm25_scores(
    docs: DataFrame,
    queries: list[tuple[str, str]],
    key_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """Top-``top_k`` documents per query by BM25. ``queries`` is a
    small literal list of ``(query_id, query_text)`` — it is shipped
    as a broadcast, never a shuffle side. Documents sharing no term
    with a query simply do not appear.

    Returns ``query_id, doc_id (key_col name kept), score, n_terms,
    rank`` where ``n_terms`` is how many distinct query terms hit.
    """
    spark = docs.sparkSession
    # NOTE: no spread_small_scan here — measured 1.2 s -> 2.8 s at
    # sf0.1: the tokenize is light enough that the partition probe +
    # round-robin shuffle cost more than the serial scan they fix
    # (unlike the ~100x-cost shingle/n-gram transforms)
    # empty/whitespace-only docs: split('') yields [''] — filter the
    # empty token BEFORE dl, or such docs get dl=1 and '' becomes a
    # corpus term skewing avgdl and every idf denominator
    toks = docs.select(
        F.col(key_col),
        F.filter(
            F.split(normalized_text(text_col), " "), lambda t: t != ""
        ).alias("_toks"),
    ).select(
        key_col,
        F.size("_toks").alias("dl"),
        F.explode("_toks").alias("term"),
    )
    # dl rides the group key (functionally dependent on the doc key)
    tf = toks.groupBy(key_col, "dl", "term").agg(F.count("*").alias("tf"))

    stats = tf.groupBy(key_col).agg(F.max("dl").alias("dl")).agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*").cast("double"))
        .alias("avgdl"),
    )
    docfreq = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))

    qterms = spark.createDataFrame(
        [(qid, t) for qid, qtext in queries
         for t in dict.fromkeys(qtext.lower().split())],
        "query_id string, term string",
    )

    kk1 = F.lit(float(k1))
    bb = F.lit(float(b))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("doc_freq") + F.lit(0.5))
        / (F.col("doc_freq") + F.lit(0.5))
    )
    tfc = F.col("tf").cast("double")
    denom = tfc + kk1 * (
        F.lit(1.0) - bb + bb * F.col("dl").cast("double") / F.col("avgdl")
    )
    term_score = idf * tfc * (kk1 + F.lit(1.0)) / denom

    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(docfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", key_col)
        .agg(
            F.round(F.sum(term_score), 6).alias("score"),
            F.count("*").cast("long").alias("n_terms"),
        )
    )
    rank = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc(key_col)
        )
    )
    return (
        scored.withColumn("rank", rank.cast("long"))
        .where(F.col("rank") <= top_k)
    )
