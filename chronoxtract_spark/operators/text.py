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
