"""Text-analysis operators for training-data pipelines — all pure
Catalyst expressions (JVM-side, whole-stage codegen, DuckDB-oracle-able).

Operators: token counting, quality scoring (length / punctuation /
stopword / digit ratios), n-gram-heuristic language ID, document
fingerprinting (md5 of normalized text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/common-word heuristic;
# enough to separate the fixture languages deterministically
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des"],
    "nl": ["de", "het", "een", "en", "van", "is", "dat", "niet", "met", "voor"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization; empty/blank text → empty array."""
    trimmed = F.trim(col)
    return F.when(
        trimmed.isNull() | (trimmed == ""), F.array().cast("array<string>")
    ).otherwise(F.split(trimmed, r"\s+"))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND
    letter/digit/punct boundaries (a cheap BPE proxy)."""
    pieces = F.split(
        F.trim(col), r"(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])|\s+|(?=[^\w\s])|(?<=[^\w\s])"
    )
    return F.size(F.filter(pieces, lambda p: p != ""))


def regex_token_count(col: Column) -> Column:
    """Match-based sub-word token count (letter runs | digit runs |
    single punctuation char).  Same spirit as :func:`bpe_ish_token_count`
    but expressed with ``regexp_extract_all`` so the identical RE2-safe
    pattern runs in ANSI-SQL oracles (no lookaround)."""
    safe = F.coalesce(col, F.lit(""))
    return F.size(F.regexp_extract_all(safe, F.lit(r"[A-Za-z]+|[0-9]+|[^\w\s]"), F.lit(0)))


def char_count(col: Column) -> Column:
    return F.coalesce(F.length(col), F.lit(0))


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are not word chars or whitespace."""
    n = F.length(col)
    stripped = F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return F.when(n.isNull() | (n == 0), F.lit(0.0)).otherwise(
        (n - stripped).cast("double") / n
    )


def digit_ratio(col: Column) -> Column:
    n = F.length(col)
    stripped = F.length(F.regexp_replace(col, r"[0-9]", ""))
    return F.when(n.isNull() | (n == 0), F.lit(0.0)).otherwise(
        (n - stripped).cast("double") / n
    )


def _hits(toks: Column, words: list[str]) -> Column:
    """Count of tokens in the word list.  NOTE: the lambda must stay
    single-parameter — PySpark passes (element, index) to 2-arg lambdas."""

    def member(t):
        return t.isin(words)

    return F.size(F.filter(toks, member))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    toks = tokens(F.lower(col))
    hits = _hits(toks, STOPWORDS[lang])
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(toks)
    )


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: reasonable length, low
    punctuation/digit load, some stopwords.  Deterministic closed form
    (also expressible in ANSI SQL for the oracle)."""
    n_tok = token_count(col).cast("double")
    len_score = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(col) * 4, F.lit(1.0))
    digit_score = F.lit(1.0) - F.least(digit_ratio(col) * 4, F.lit(1.0))
    stop_score = F.least(stopword_ratio(col) * 5, F.lit(1.0))
    return F.round(
        (len_score * 0.4 + punct_score * 0.25 + digit_score * 0.15 + stop_score * 0.2), 6
    )


def lang_id(col: Column) -> Column:
    """Argmax of per-language stopword hits (ties → lexicographically
    first language, 'und' when no hits at all)."""
    toks = tokens(F.lower(col))
    scores = {lang: _hits(toks, list(words)) for lang, words in STOPWORDS.items()}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def normalize_text(col: Column) -> Column:
    """Lowercase + collapse whitespace (the dedup canonical form)."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (md5 exists in both Spark and DuckDB → oracle-able end to end)."""
    return F.md5(normalize_text(col))


def with_text_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        char_count(c).alias("n_chars_m"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(digit_ratio(c), 6).alias("digit_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )
