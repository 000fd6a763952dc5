"""Corpus-level text statistics for training-data curation:
repetition signals (the Gopher/MassiveText repetition filters) and
per-document TF-IDF keyword extraction.

The reference repo is a single-series feature library and has no text
subsystem; these operators are engine-native, sitting beside the
dedup/quality family (operators/dedup.py, operators/text.py) that a
100 TB pre-training pipeline needs.

Scale shape
-----------
``repetition_stats``: one ``explode`` of per-document n-grams (output
size is O(total words x |ns|), i.e. linear in corpus size), ONE
shuffle keyed (doc, n, gram) with map-side partial aggregation, one
(doc, n) window, and a final (doc) aggregation. The consecutive-run
statistic is a pure array fold (``aggregate`` over adjacent-equality
flags) computed before the explode — no extra shuffle, no UDF.

``tfidf_terms``: token counts shuffle on (doc, term); the term
document-frequency table is vocabulary-sized (zipf-bounded, orders of
magnitude smaller than the corpus) and is broadcast back; the corpus
size N rides a 1-row broadcast cross join. Top-k per doc is a (doc)
window over the scored terms.

Everything is built-in column expressions — no Python UDFs anywhere.

Oracle determinism
------------------
All repetition fractions are single IEEE divisions of exact integer
counts (chars, occurrences), so a DuckDB oracle matches bit-for-bit.
The "most frequent n-gram" is pinned deterministically: highest count,
then lexicographically smallest gram (binary UTF-8 order in both
engines). TF-IDF scores round to 6 decimals BEFORE ranking so both
engines rank identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _grams(words, n: int):
    """Array of space-joined word n-grams of ``words`` (empty when the
    document has fewer than ``n`` words — guarded because Spark's
    ``sequence(1, k)`` would count DOWN for k < 1)."""
    idx = F.sequence(F.lit(1), F.size(words) - (n - 1))
    g = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    return F.when(F.size(words) >= n, g).otherwise(
        F.array().cast("array<string>")
    )


def _tagged_grams(words, n: int):
    """n-grams tagged with their order as ``struct(n, gram)``. A
    closure factory, NOT an inline default-arg lambda: a two-parameter
    lambda makes ``transform`` pass the ARRAY INDEX as the second
    argument, silently shadowing the captured ``n``."""

    def tag(g):
        return F.struct(F.lit(n).alias("n"), g.alias("gram"))

    return F.transform(_grams(words, n), tag)


def _max_consecutive_run(words):
    """Longest run of the same word repeated consecutively, as a pure
    array fold: adjacent-equality flags via ``zip_with`` of the array
    against itself shifted by one, then a (current, best) accumulator.
    A 1-word document has run 1."""
    tail_len = F.size(words) - 1  # split() never yields an empty array
    flags = F.zip_with(
        F.slice(words, 2, tail_len),
        F.slice(words, 1, tail_len),
        lambda a, b: a == b,
    )
    return F.aggregate(
        flags,
        F.struct(F.lit(1).alias("cur"), F.lit(1).alias("best")),
        lambda acc, eq: F.struct(
            F.when(eq, acc["cur"] + 1).otherwise(F.lit(1)).alias("cur"),
            F.greatest(
                acc["best"], F.when(eq, acc["cur"] + 1).otherwise(F.lit(1))
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def repetition_stats(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Per-document repetition signals in the style of the Gopher /
    MassiveText quality filters:

    - ``top{n}_char_frac`` (n in ``top_ns``): fraction of the
      document's characters covered by ALL occurrences of its single
      most frequent word n-gram (``count * len(gram) / len(text)``;
      gram length includes its internal separator spaces, occurrences
      may overlap, so the fraction is a repetition score, not a
      partition of the text).
    - ``dup{n}_char_frac`` (n in ``dup_ns``): fraction of characters
      covered by all occurrences of every n-gram that appears more
      than once.
    - ``max_run``: longest consecutive repetition of a single word.
    - ``n_words``: whitespace token count.

    High values of any of these mark boilerplate / degenerate documents
    that repetition filters drop before training.
    """
    from chronoxtract_spark.operators._util import spread_small_scan

    df = spread_small_scan(df)
    ns = sorted(set(top_ns) | set(dup_ns))
    w = F.split(F.col(text_col), " ")
    base = df.select(
        F.col(key_col),
        w.alias("w"),
        F.length(text_col).cast("long").alias("n_chars"),
    ).select(
        key_col,
        "n_chars",
        F.size("w").cast("long").alias("n_words"),
        _max_consecutive_run(F.col("w")).cast("long").alias("max_run"),
        F.explode_outer(
            F.flatten(
                F.array(*[_tagged_grams(F.col("w"), n) for n in ns])
            )
        ).alias("p"),
    )
    cnt = (
        base.select(
            key_col, "n_chars", "n_words", "max_run",
            F.col("p.n").alias("n"), F.col("p.gram").alias("gram"),
        )
        .groupBy(key_col, "n", "gram")
        .agg(
            F.count("*").alias("cnt"),
            F.first("n_chars").alias("n_chars"),
            F.first("n_words").alias("n_words"),
            F.first("max_run").alias("max_run"),
        )
    )
    # deterministic "most frequent" pin: count desc, then gram asc
    rn = F.row_number().over(
        Window.partitionBy(key_col, "n").orderBy(
            F.col("cnt").desc(), F.col("gram").asc()
        )
    )
    gchars = F.col("cnt") * F.length("gram")
    out = (
        cnt.withColumn("rn", rn)
        .groupBy(key_col)
        .agg(
            F.first("n_chars").alias("n_chars"),
            F.first("n_words").alias("n_words"),
            F.first("max_run").alias("max_run"),
            *[
                F.max(
                    F.when((F.col("n") == n) & (F.col("rn") == 1), gchars)
                ).alias(f"_top{n}")
                for n in top_ns
            ],
            *[
                F.sum(
                    F.when(
                        (F.col("n") == n) & (F.col("cnt") > 1), gchars
                    ).otherwise(F.lit(0))
                ).alias(f"_dup{n}")
                for n in dup_ns
            ],
        )
    )
    frac = lambda c: (F.coalesce(F.col(c), F.lit(0)).cast("long") / F.col("n_chars"))  # noqa: E731
    return out.select(
        key_col,
        "n_words",
        "max_run",
        *[frac(f"_top{n}").alias(f"top{n}_char_frac") for n in top_ns],
        *[frac(f"_dup{n}").alias(f"dup{n}_char_frac") for n in dup_ns],
    )


def bigram_lm_bits(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Character-bigram language-model quality score per document —
    the CCNet-style "LM perplexity" filter shape, self-trained on the
    corpus itself so it needs no external model: documents whose
    character transitions are atypical for the corpus (mojibake,
    base64 blobs, ransom-note casing) score high and get dropped.

    Model: add-one-smoothed bigram LM over the corpus's own character
    stream, ``P(c2|c1) = (cnt(c1 c2) + 1) / (cnt(c1 *) + V)`` with
    ``V`` = corpus distinct-character count. Score: ``bits_per_gram =
    -avg log2 P`` over the document's bigram stream.

    Scale shape: one explode to (doc, bigram) counts, ONE shuffle on
    the bigram key for the model tables, which are vocabulary-squared
    sized (tiny) and BROADCAST back onto the per-doc counts; the final
    per-doc reduction is a map-side-combinable sum. No UDFs.

    Determinism: counts are exact integers; each term is one log2 +
    multiply (libm ulp noise across engines ~1e-16 relative, summed
    ~1e-12 at worst) — the final score rounds to 6 decimals, orders of
    magnitude above both the ulp noise and the sum's association-order
    noise. Returns ``(key, n_bigrams, bits_per_gram)``; documents
    shorter than 2 characters yield no row.
    """
    # substring with a column start needs expr-level substr
    grams = df.where(F.length(text_col) >= 2).select(
        F.col(key_col),
        F.explode(
            F.expr(
                f"transform(sequence(1, length({text_col}) - 1),"
                f" i -> substr({text_col}, i, 2))"
            )
        ).alias("g"),
    )
    dg = grams.groupBy(key_col, "g").agg(F.count("*").alias("n"))
    cnt2 = dg.groupBy("g").agg(F.sum("n").alias("cnt2"))
    cnt1 = cnt2.groupBy(F.substring("g", 1, 1).alias("c1")).agg(
        F.sum("cnt2").alias("cnt1")
    )
    vocab = df.select(
        F.explode(
            F.expr(
                f"transform(sequence(1, length({text_col})),"
                f" i -> substr({text_col}, i, 1))"
            )
        ).alias("c")
    ).agg(F.count_distinct("c").alias("v"))
    model = (
        cnt2.withColumn("c1", F.substring("g", 1, 1))
        .join(F.broadcast(cnt1), "c1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "g",
            (
                -F.log2(
                    (F.col("cnt2") + 1).cast("double")
                    / (F.col("cnt1") + F.col("v")).cast("double")
                )
            ).alias("bits"),
        )
    )
    return (
        dg.join(F.broadcast(model), "g")
        .groupBy(key_col)
        .agg(
            F.sum("n").cast("long").alias("n_bigrams"),
            F.round(
                F.sum(F.col("n") * F.col("bits")) / F.sum("n"), 6
            ).alias("bits_per_gram"),
        )
    )


def tfidf_terms(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF
    (``tf * (ln((N+1)/(df+1)) + 1)``, the sklearn-style smooth-idf).

    Scores are rounded to 6 decimals BEFORE ranking (ties then broken
    by term ascending) so the ordering is reproducible across engines
    — ``ln`` is not guaranteed identically rounded between libm
    implementations, 6 decimals is far coarser than the disagreement.

    Returns (key, term, tf, doc_freq, score, rank).
    """
    toks = df.select(
        F.col(key_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    tf = toks.groupBy(key_col, "term").agg(F.count("*").alias("tf"))
    # document frequency: vocabulary-sized — broadcast back onto tf
    docfreq = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    n_docs = df.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(docfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1)).cast("double")
                        / (F.col("doc_freq") + F.lit(1))
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    rank = F.row_number().over(
        Window.partitionBy(key_col).orderBy(
            F.col("score").desc(), F.col("term").asc()
        )
    )
    return (
        scored.withColumn("rank", rank)
        .where(F.col("rank") <= k)
        .select(key_col, "term", "tf", "doc_freq", "score", "rank")
    )


def hill_tail(
    df: DataFrame,
    slice_col: str = "source",
    size_col: str = "n_chars",
    id_col: str = "doc_id",
    tail_frac: int = 10,
    round_digits: int | None = 6,
) -> DataFrame:
    """Hill tail-index estimator of each slice's document-size
    distribution — the curation screen for length pathologies: a
    healthy natural corpus has a Pareto-ish size tail with index
    alpha ~ 1-3; truncation caps push alpha up sharply, concatenation
    / boilerplate explosion pulls it toward 1 and below. With the
    slice's sizes sorted descending x_(1) >= ... >= x_(n),

        alpha_hat = k / sum_{i=1..k} ln(x_(i) / x_(k+1))

    over the top k = min(max(1, n // tail_frac), n - 1) order
    statistics (the standard 1/tail_frac-of-sample choice, derived
    from n by integer arithmetic so both engines agree).

    Determinism/exactness: sizes are integers; the order statistic
    cut is pinned by (size DESC, id ASC) row_number; the log sum
    folds the k tail terms sorted by rank (the proven sorted-fold
    contract, arrays bounded by k) as sum ln x_(i) - k * ln x_(k+1),
    each ln an engine ln of an integer-valued double. Non-positive
    sizes are excluded up front (a log-scale tail has none, and
    DuckDB's ln(0) is an error, not a null); guards: n < 2 or a zero
    log sum (top k+1 sizes all equal) null the index.

    Spark-first: one rank window on the slice shuffle, the fold over
    only the k+1 retained rows. Returns ``slice, n_docs, k_tail,
    x_threshold, hill_alpha`` (alpha < 2 flags a heavy tail whose
    sample means are unstable — weight by doc count, not bytes).
    """
    if tail_frac < 1:
        raise ValueError(f"tail_frac must be >= 1, got {tail_frac}")
    d = df.select(
        F.col(slice_col).cast("string").alias("_sl"),
        F.col(size_col).cast("long").alias("x"),
        F.col(id_col).alias("_id"),
    ).where(F.col("x") >= 1)  # a log-scale tail has no <= 0 sizes
    w = Window.partitionBy("_sl").orderBy(
        F.col("x").desc(), F.col("_id").asc()
    )
    wall = Window.partitionBy("_sl")
    ranked = d.select(
        "_sl",
        "x",
        F.row_number().over(w).cast("long").alias("r"),
        F.count("*").over(wall).alias("n"),
    )
    k = F.least(
        F.greatest(F.lit(1), (F.col("n") / F.lit(tail_frac)).cast("long")),
        F.col("n") - F.lit(1),
    )
    tail = ranked.where(F.col("r") <= k + F.lit(1)).select(
        "_sl", "n", k.alias("k"), "r", "x"
    )
    agg = tail.groupBy("_sl").agg(
        F.max("n").alias("n"),
        F.max("k").alias("k"),
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("r") <= F.col("k"),
                        F.struct(F.col("r"), F.log(F.col("x").cast("double")).alias("lx")),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["lx"],
        ).alias("lsum"),
        F.max(F.when(F.col("r") == F.col("k") + F.lit(1), F.col("x"))).alias(
            "xk1"
        ),
    )
    denom = F.col("lsum") - F.col("k").cast("double") * F.log(
        F.col("xk1").cast("double")
    )
    alpha = F.when(
        (F.col("n") >= F.lit(2)) & (F.col("xk1") >= F.lit(1)) & (denom > F.lit(0.0)),
        F.col("k").cast("double") / denom,
    )

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return agg.select(
        F.col("_sl").alias(slice_col),
        F.col("n").alias("n_docs"),
        F.col("k").alias("k_tail"),
        F.col("xk1").alias("x_threshold"),
        rnd(alpha).alias("hill_alpha"),
    )


def boilerplate_prefixes(
    df: DataFrame,
    slice_col: str = "source",
    text_col: str = "text",
    prefix_tokens: int = 8,
    round_digits: int | None = 6,
) -> DataFrame:
    """Template/boilerplate screen per corpus slice: how concentrated
    are document OPENINGS? Scraped templates, auto-generated pages
    and header boilerplate all collapse the first few tokens onto a
    handful of prefixes long before full-document dedup fires — the
    cheap early-warning a curation pipeline runs per source. For each
    slice the documents' first ``prefix_tokens`` normalized tokens
    form the prefix key; reported are the distinct-prefix count, the
    most common prefix with its share, and the prefix-distribution
    entropy in nats (ln(n_docs) = all unique, -> 0 = one template).

    Determinism/exactness: prefixes come from the shared
    ``normalized_text`` tokenization (identical to the dedup /
    fingerprint family); counts are exact int64; the top prefix is
    pinned by (count DESC, prefix ASC); the entropy folds
    (c/n) ln(c/n) terms in prefix-sorted order (the proven
    sorted-fold contract — the array is bounded by the DISTINCT
    prefix count, which boilerplate itself keeps small; a
    pathological all-unique slice is bounded by its doc count, the
    same bound profile_table's mode already carries).

    Spark-first: one (slice, prefix) count groupBy over the documents
    (the only corpus-sized shuffle; the prefix projection is pure
    column expressions), one per-slice fold + struct-min argmax
    (min over (-count, prefix) = highest count, lowest prefix). Empty/
    whitespace-only documents count under the empty prefix ''.
    Returns ``slice, n_docs, n_prefixes, top_prefix, top_share,
    prefix_entropy``.
    """
    if prefix_tokens < 1:
        raise ValueError(f"prefix_tokens must be >= 1, got {prefix_tokens}")
    from .text import normalized_text

    prefix = F.array_join(
        F.slice(
            F.filter(
                F.split(normalized_text(text_col), " "),
                lambda x: x != "",
            ),
            1,
            prefix_tokens,
        ),
        " ",
    )
    counts = (
        df.select(
            F.col(slice_col).cast("string").alias("_sl"),
            prefix.alias("p"),
        )
        .groupBy("_sl", "p")
        .agg(F.count("*").cast("long").alias("c"))
    )
    agg = counts.groupBy("_sl").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_prefixes"),
        F.min(F.struct((-F.col("c")).alias("negc"), F.col("p"))).alias(
            "_top"
        ),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("p", "c"))),
            F.lit(0.0),
            lambda acc, s: acc + s["c"].cast("double") * F.log(
                s["c"].cast("double")
            ),
        ).alias("_clnc"),
    )
    nd = F.col("n_docs").cast("double")
    # H = ln n - (1/n) * sum c ln c  — one fold, exact-int counts
    entropy = F.log(nd) - F.col("_clnc") / nd
    top_share = (-F.col("_top.negc")).cast("double") / nd

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return agg.select(
        F.col("_sl").alias(slice_col),
        "n_docs",
        "n_prefixes",
        F.col("_top.p").alias("top_prefix"),
        rnd(top_share).alias("top_share"),
        rnd(entropy).alias("prefix_entropy"),
    )


def lexical_stats(
    df: DataFrame,
    slice_col: str = "source",
    text_col: str = "text",
    round_digits: int | None = 6,
) -> DataFrame:
    """Classical lexical-diversity battery per corpus slice — the
    third leg beside ``tfidf_terms`` (what the vocabulary IS) and the
    zipf fit (how it DECAYS): how diverse is it at all. Synthetic /
    templated / looping text collapses every one of these numbers
    long before a human reads a sample:

    - ``ttr`` — type-token ratio V/N;
    - ``hapax_share`` — fraction of types seen exactly once (organic
      corpora hold near ~0.4-0.6; template mills crush it);
    - ``simpson`` — repeat probability sum c(c-1)/(N(N-1)), the
      chance two random tokens are the same type (0 all-distinct,
      1 one type);
    - ``yule_k`` — Yule's characteristic 10^4 (S2 - N)/N^2 with
      S2 = sum c^2, the length-robust repeat-rate constant.

    Exactness: every statistic is ONE float division of exact
    decimal(38,0)/HUGEINT integer moments of the term-count
    distribution (S2 = sum c^2 is the only quadratic; hapax and type
    counts are conditional counts). Tokenization shares
    ``operators.text.normalized_text`` with the dedup / divergence /
    overlap family. Guards: token-free slices carry no row; N < 2
    nulls simpson.

    Spark-first: one (slice, term) count groupBy over the exploded
    tokens (the only corpus-sized shuffle, map-side partials), one
    bounded per-slice aggregate of the count distribution's moments.
    No UDF, no window. Returns ``slice, n_tokens, n_types, ttr,
    hapax_share, simpson, yule_k``.
    """
    from .text import normalized_text

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
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = counts.groupBy("_sl").agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").cast("long").alias("v"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("hapax"),
        F.sum(dec(F.col("c")) * dec(F.col("c"))).alias("s2"),
        F.sum(dec(F.col("c")) * dec(F.col("c") - F.lit(1))).alias("rep"),
    )
    nd = F.col("n").cast("double")
    ttr = F.col("v").cast("double") / nd
    hapax_share = F.col("hapax").cast("double") / F.col("v").cast("double")
    simpson = F.when(
        F.col("n") >= F.lit(2),
        F.col("rep").cast("double")
        / (dec(F.col("n")) * dec(F.col("n") - F.lit(1))).cast("double"),
    )
    yule_k = (
        F.lit(10000.0)
        * (F.col("s2") - dec(F.col("n"))).cast("double")
        / (dec(F.col("n")) * dec(F.col("n"))).cast("double")
    )

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return agg.select(
        F.col("_sl").alias(slice_col),
        F.col("n").alias("n_tokens"),
        F.col("v").alias("n_types"),
        rnd(ttr).alias("ttr"),
        rnd(hapax_share).alias("hapax_share"),
        rnd(simpson).alias("simpson"),
        rnd(yule_k).alias("yule_k"),
    )
