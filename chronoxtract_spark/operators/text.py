"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

Everything is column expressions (codegen'd) except the n-gram
language model, which stays a tiny broadcastable lookup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# minimal stopword profiles for the n-gram language heuristic; the
# testdata's lang column is synthetic so this doubles as a plumbing
# check rather than a linguistics exercise
_LANG_MARKERS = {
    "en": ["the", "a", "and", "of", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "de", "et", "les"],
    "zh": ["的", "是", "了", "在", "我"],
}

_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

#: BPE-ish token heuristic: word chunks, numbers, punctuation runs
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count + char count."""
    t = F.col(text_col)
    ws = F.size(F.split(t, " "))
    bpe = F.size(F.regexp_extract_all(t, F.lit(TOKEN_PATTERN), F.lit(0)))
    return (
        df.withColumn("n_tokens_ws", ws.cast("long"))
        .withColumn("n_tokens_bpe", bpe.cast("long"))
        .withColumn("n_chars_calc", F.length(t).cast("long"))
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features: mean word length, punctuation ratio,
    stopword ratio, digit ratio, and a composite [0,1] score."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(t, " ")
    n_words = F.size(words)
    mean_word_len = (n_chars - (n_words - 1)) / n_words
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    punct_ratio = n_punct / n_chars
    n_digits = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    digit_ratio = n_digits / n_chars
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w))))
    stop_ratio = n_stop / n_words
    score = (
        F.lit(1.0)
        - F.least(punct_ratio * 2, F.lit(0.5))
        - F.least(digit_ratio * 2, F.lit(0.3))
    ) * F.when((mean_word_len >= 2) & (mean_word_len <= 12), 1.0).otherwise(0.5)
    return (
        df.withColumn("mean_word_len", F.round(mean_word_len, 6))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("digit_ratio", F.round(digit_ratio, 6))
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("quality_score", F.round(score, 6))
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic: per language, count marker hits
    in the token set; argmax wins, 'und' (undetermined) when no hits."""
    words = F.split(F.lower(F.col(text_col)), " ")
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        marr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(words, lambda w: F.array_contains(marr, w)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        "lang_pred",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def normalized_text(col) -> F.Column:
    """THE canonical text normalization for identity surfaces
    (fingerprinting, normalized dedup keys): trim, lowercase, collapse
    whitespace runs to one space. One shared definition so
    exact_duplicates(key='normalized') and the fingerprint queries can
    never disagree on leading/trailing-whitespace docs. SQL mirror:
    ``regexp_replace(lower(trim(x)), '\\s+', ' ', 'g')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic 64-bit content fingerprint: xxhash64 of the
    canonically normalized text (rolling-hash equivalent for
    whole-document identity)."""
    return df.withColumn("fingerprint", F.xxhash64(normalized_text(text_col)))


#: redaction patterns — deliberately restricted to the regex subset
#: Java (Spark) and RE2 (DuckDB/production scanners) agree on: no
#: backreferences, no lookaround
REDACTION_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def with_redactions(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII-style scrubbing pass: replace emails and IPv4 literals with
    typed placeholders and count the redactions per type. Pure column
    expressions (regexp_replace / regexp_extract_all) — map-only, no
    UDF; production extends REDACTION_PATTERNS with its own scanner
    set under the same dual-dialect constraint."""
    red = F.col(text_col)
    out = df
    # patterns apply IN ORDER and each count is taken on the text as it
    # stands when that pattern runs — so n_<type> always equals the
    # number of <TYPE> placeholders actually inserted, even when
    # patterns overlap (an email whose local part looks like an IPv4 is
    # consumed by the email pass and never double-counted)
    for name, pat in REDACTION_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(red, F.lit(pat), F.lit(0))).cast("long"),
        )
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return out.withColumn("redacted_text", red)


#: character classes for the composition profile, each a regex whose
#: semantics are IDENTICAL in Java regex (Spark) and RE2 (DuckDB):
#: explicit ranges only, no \s/\w shorthands (their class contents
#: differ between the two engines)
CHAR_CLASSES = (
    ("letter", "[A-Za-z]"),
    ("digit", "[0-9]"),
    ("space", "[ \\t\\n\\r]"),
    ("punct", "[!-/:-@\\[-`{-~]"),
)


def charclass_profile(
    df: DataFrame,
    slice_col: str = "source",
    text_col: str = "text",
    round_digits: int | None = 6,
) -> DataFrame:
    """Character-class composition per corpus slice — the cheapest
    non-text detector there is: base64 blobs read as letter+digit
    soup with no spaces, binary-ish junk and mojibake pile up in
    'other', tables and code inflate punct, healthy prose sits near
    ~80% letters / ~17% spaces. Reports each class's share of the
    slice's characters plus the 5-class composition entropy in nats
    (degenerate single-class content -> 0).

    Classes are ASCII letters / digits / explicit whitespace
    ( \\t\\n\\r) / ASCII punctuation, with 'other' the exact
    remainder (all non-ASCII, control chars, unicode letters —
    a slice legitimately heavy in non-Latin script shows up as
    'other'-dominant by design; split further per deployment).
    Shorthand classes (\\s, \\w) are deliberately avoided: their
    contents differ between Java regex and RE2.

    Exactness: per-document class counts are length differences
    under regexp_replace (exact int64 both engines, length = chars),
    slice totals are integer sums, every share is one float division
    and the entropy is a pinned 5-term conditional chain — zero
    classes contribute zero exactly. One map-only projection + one
    slice groupBy; no UDF. Returns ``slice, n_chars, letter_share,
    digit_share, space_share, punct_share, other_share,
    class_entropy``.
    """
    t = F.col(text_col)
    total = F.length(t).cast("long")
    cls_counts = [
        (name, (total - F.length(F.regexp_replace(t, pat, ""))).cast("long"))
        for name, pat in CHAR_CLASSES
    ]
    per_doc = df.select(
        F.col(slice_col).cast("string").alias("_sl"),
        total.alias("_n"),
        *[c.alias(f"_c_{name}") for name, c in cls_counts],
    )
    agg = per_doc.groupBy("_sl").agg(
        F.sum("_n").cast("long").alias("n_chars"),
        *[
            F.sum(f"_c_{name}").cast("long").alias(f"c_{name}")
            for name, _ in CHAR_CLASSES
        ],
    )
    known = None
    for name, _ in CHAR_CLASSES:
        c = F.col(f"c_{name}")
        known = c if known is None else known + c
    agg = agg.select(
        "_sl",
        "n_chars",
        *[F.col(f"c_{name}") for name, _ in CHAR_CLASSES],
        (F.col("n_chars") - known).alias("c_other"),
    )
    names = [name for name, _ in CHAR_CLASSES] + ["other"]
    nd = F.col("n_chars").cast("double")
    shares = {name: F.col(f"c_{name}").cast("double") / nd for name in names}
    ent = None
    for name in names:
        term = F.when(
            F.col(f"c_{name}") > 0,
            shares[name] * F.log(shares[name]),
        ).otherwise(F.lit(0.0))
        ent = term if ent is None else ent + term
    entropy = F.when(F.col("n_chars") > 0, -ent)

    def rnd(c):
        return F.round(c, round_digits) if round_digits is not None else c

    return agg.select(
        F.col("_sl").alias(slice_col),
        "n_chars",
        *[
            rnd(F.when(F.col("n_chars") > 0, shares[name])).alias(
                f"{name}_share"
            )
            for name in names
        ],
        rnd(entropy).alias("class_entropy"),
    )
