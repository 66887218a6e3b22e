"""Repetition / heuristic quality filters for training-data curation
(SURVEY.md §2.11 extensions; not in the reference — oxigraph has no
document processing).

Implements the standard published filter families a web-scale pretraining
pipeline runs before dedup:

- **Repetition signals** (Rae et al., *Gopher*, arXiv:2112.11446 App. A):
  duplicate-line / duplicate-paragraph fractions (by count and by
  character mass), most-frequent word-n-gram character fraction
  (n = 2..4), duplicated word-n-gram character fraction (n = 5..10).
- **Heuristic quality flags** (Gopher rules + Raffel et al., *C4*,
  arXiv:1910.10683 §2.2): word-count bounds, mean word length bounds,
  symbol-to-word ratios, bullet/ellipsis line fractions, alphabetic-word
  fraction, stopword evidence, terminal-punctuation lines, brace /
  boilerplate markers.

100 TB shapes: every per-document signal is either a pure JVM
higher-order-function expression (no shuffle at all) or an
``explode → groupBy(id, …)`` aggregate keyed by document id — map-side
combinable, uniformly distributed by id, no self-joins, no skewed keys
(the hot key would be a single document, and a document's n-grams are
bounded by its length).  Zero Python UDFs.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import normalize_text, spread
from .textstats import EN_STOPWORDS, mean_word_length, token_count


# ---------------------------------------------------------------------------
# line / paragraph repetition (pure expressions, no shuffle)
# ---------------------------------------------------------------------------

def _dup_fraction(items: Column) -> Column:
    """Fraction of array elements that are duplicates of an earlier
    element: 1 - distinct/size.  0 for empty arrays."""
    n = F.size(items)
    return F.when(n > 0,
                  (n - F.size(F.array_distinct(items))).cast("double") / n) \
            .otherwise(F.lit(0.0))


def _dup_char_fraction(items: Column) -> Column:
    """Fraction of CHARACTER mass carried by duplicate elements (every
    occurrence beyond the first counts its length).  Computed as
    1 - chars(distinct)/chars(all); 0 when empty."""
    total = F.aggregate(items, F.lit(0), lambda a, x: a + F.length(x))
    uniq = F.aggregate(F.array_distinct(items), F.lit(0),
                       lambda a, x: a + F.length(x))
    return F.when(total > 0,
                  (total - uniq).cast("double") / total).otherwise(F.lit(0.0))


def split_lines(text: Column) -> Column:
    """Non-empty trimmed lines of a document."""
    return F.filter(F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
                    lambda l: F.length(l) > 0)


def split_paragraphs(text: Column) -> Column:
    """Non-empty trimmed paragraphs (blank-line separated)."""
    return F.filter(F.transform(F.split(text, r"\n\s*\n"),
                                lambda p: F.trim(p)),
                    lambda p: F.length(p) > 0)


def line_repetition_stats(df: DataFrame, text_col: str,
                          id_col: str) -> DataFrame:
    """Per-document duplicate-line/paragraph fractions (Gopher App. A
    first block) → ``(id, dup_line_frac, dup_line_char_frac,
    dup_para_frac, dup_para_char_frac, n_lines, n_paras)``.

    Pure per-row expressions — at 100 TB this is a mapper, no shuffle."""
    t = F.col(text_col)
    lines, paras = split_lines(t), split_paragraphs(t)
    return df.select(
        F.col(id_col).alias("id"),
        F.round(_dup_fraction(lines), 6).alias("dup_line_frac"),
        F.round(_dup_char_fraction(lines), 6).alias("dup_line_char_frac"),
        F.round(_dup_fraction(paras), 6).alias("dup_para_frac"),
        F.round(_dup_char_fraction(paras), 6).alias("dup_para_char_frac"),
        F.size(lines).alias("n_lines"),
        F.size(paras).alias("n_paras"),
    )


# ---------------------------------------------------------------------------
# word n-gram repetition (explode → groupBy(id, gram), keyed by doc)
# ---------------------------------------------------------------------------

def _word_ngrams(words: Column, n: int) -> Column:
    """Word n-grams as space-joined strings (empty array when the doc has
    fewer than n words)."""
    return F.when(
        F.size(words) >= n,
        F.transform(F.sequence(F.lit(1), F.size(words) - n + 1),
                    lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    ).otherwise(F.array().cast("array<string>"))


def ngram_repetition_stats(df: DataFrame, text_col: str, id_col: str,
                           top_ns: Optional[List[int]] = None,
                           dup_ns: Optional[List[int]] = None) -> DataFrame:
    """Gopher word-n-gram repetition signals, per document:

    - ``top{n}_char_frac`` (n in ``top_ns``, default 2..4): fraction of
      document characters covered by occurrences of the single MOST
      FREQUENT word n-gram (only when it occurs more than once —
      a unique n-gram is not repetition);
    - ``dup{n}_char_frac`` (n in ``dup_ns``, default 5..10): fraction of
      characters covered by ALL word n-grams occurring ≥2 times
      (overlap-unaware upper bound, per the paper's methodology).

    Shape: one explode per n, ``groupBy(id, gram)`` count, re-aggregate
    to the doc — everything keyed by (id, gram) / id, map-side
    combinable, no joins.  A document's gram count is bounded by its
    word count, so keys stay uniform at any corpus size."""
    top_ns = top_ns or [2, 3, 4]
    dup_ns = dup_ns or [5, 6, 7, 8, 9, 10]
    all_ns = sorted(set(top_ns) | set(dup_ns))
    t = F.col(text_col)
    base = df.select(F.col(id_col).alias("id"),
                     F.split(normalize_text(t), " ").alias("__w"),
                     F.length(t).alias("__chars"))
    # ONE explode over every requested n (gram rows tagged by n), ONE
    # (id, n, gram) count, ONE per-(id, n) aggregate, then a conditional
    # re-aggregate keyed by id — 2 gram-keyed shuffles TOTAL regardless
    # of how many n values are requested (the per-n loop-of-joins shape
    # would pay 3 shuffles per n)
    def _tag(n):
        # NB: the transform lambda must take exactly ONE parameter — a
        # defaulted second arg would make pyspark pass the element index
        return F.transform(_word_ngrams(F.col("__w"), n),
                           lambda g: F.struct(F.lit(n).alias("n"),
                                              g.alias("g")))

    tagged = F.flatten(F.array(*[_tag(n) for n in all_ns]))
    grams = base.select("id", "__chars",
                        F.explode(tagged).alias("t")) \
                .select("id", "__chars", F.col("t.n").alias("n"),
                        F.col("t.g").alias("g"))
    per_gram = grams.groupBy("id", "__chars", "n", "g").agg(
        F.count(F.lit(1)).alias("c"))
    mass = F.when(F.col("c") > 1, F.col("c") * F.length("g")) \
            .otherwise(F.lit(0))
    per_doc_n = per_gram.groupBy("id", "__chars", "n").agg(
        F.max(mass).alias("__top"), F.sum(mass).alias("__dup"))

    def frac(col):
        return F.round(F.least(col.cast("double")
                               / F.greatest(F.col("__chars"), F.lit(1)),
                               F.lit(1.0)), 6)

    aggs = []
    for n in top_ns:
        aggs.append(frac(F.max(F.when(F.col("n") == n, F.col("__top"))
                               .otherwise(F.lit(0))))
                    .alias(f"top{n}_char_frac"))
    for n in dup_ns:
        aggs.append(frac(F.max(F.when(F.col("n") == n, F.col("__dup"))
                               .otherwise(F.lit(0))))
                    .alias(f"dup{n}_char_frac"))
    per_doc = per_doc_n.groupBy("id", "__chars").agg(*aggs)
    out = base.select("id").join(per_doc.drop("__chars"), "id", "left")
    fill = {c: 0.0 for c in out.columns if c.endswith("_char_frac")}
    return out.fillna(fill)


# ---------------------------------------------------------------------------
# heuristic flags (Gopher rules + C4 rules) — pure expressions
# ---------------------------------------------------------------------------

def gopher_quality_flags(df: DataFrame, text_col: str, id_col: str,
                         min_words: int = 50, max_words: int = 100_000,
                         min_mean_word_len: float = 3.0,
                         max_mean_word_len: float = 10.0,
                         max_symbol_word_ratio: float = 0.1,
                         max_bullet_frac: float = 0.9,
                         max_ellipsis_frac: float = 0.3,
                         min_alpha_word_frac: float = 0.8,
                         min_stopword_hits: int = 2) -> DataFrame:
    """Gopher quality rules as per-document booleans + an overall
    ``gopher_pass`` → one row per doc.  Pure JVM expressions (mapper)."""
    t = F.col(text_col)
    words = F.split(normalize_text(t), " ")
    n_words = token_count(t)
    lines = split_lines(t)
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_lines = F.size(F.filter(
        lines, lambda l: l.rlike(r"^([\-\*•‣▪]|\d+[.)])")))
    ellipsis_lines = F.size(F.filter(
        lines, lambda l: l.rlike(r"(\.\.\.|…)$")))
    # hash or ellipsis count vs words (Gopher's symbol-to-word ratio)
    symbols = (F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
               + (F.length(t) - F.length(
                   F.regexp_replace(t, r"…", ""))) \
               + (F.length(t) - F.length(
                   F.regexp_replace(t, r"\.\.\.", ""))) / F.lit(3))
    alpha_words = F.size(F.filter(words, lambda w: w.rlike(r"\p{L}")))
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*EN_STOPWORDS)))
    mwl = mean_word_length(t)
    nw = F.greatest(n_words, F.lit(1))
    flags = {
        "word_count_ok": (n_words >= min_words) & (n_words <= max_words),
        "mean_word_len_ok": (mwl >= min_mean_word_len)
                            & (mwl <= max_mean_word_len),
        "symbol_ratio_ok": (symbols.cast("double") / nw)
                           <= max_symbol_word_ratio,
        "bullet_frac_ok": (bullet_lines.cast("double") / n_lines)
                          <= max_bullet_frac,
        "ellipsis_frac_ok": (ellipsis_lines.cast("double") / n_lines)
                            <= max_ellipsis_frac,
        "alpha_word_frac_ok": (alpha_words.cast("double") / nw)
                              >= min_alpha_word_frac,
        "stopword_ok": stop_hits >= min_stopword_hits,
    }
    cols = [F.col(id_col).alias("id")]
    overall = F.lit(True)
    for name, c in flags.items():
        cols.append(c.alias(name))
        overall = overall & c
    cols.append(overall.alias("gopher_pass"))
    return df.select(*cols)


def c4_line_filter(df: DataFrame, text_col: str, id_col: str,
                   min_words_per_line: int = 3,
                   blocklist: Optional[List[str]] = None) -> DataFrame:
    """C4 §2.2 line-level cleaning → ``(id, clean_text, n_kept_lines,
    n_dropped_lines)``: keep lines that end in terminal punctuation,
    have ≥ ``min_words_per_line`` words, and contain no blocklisted
    marker; drop the whole document (clean_text NULL) when it contains
    a curly brace (code) or "lorem ipsum".  Pure expressions."""
    import re as _re
    markers = [m.lower() for m in
               (blocklist or ["javascript", "cookie policy",
                              "terms of use", "privacy policy"])]
    marker_re = "(" + "|".join(_re.escape(m) for m in markers) + ")"
    t = F.col(text_col)
    lines = F.transform(F.split(t, r"\n"), lambda l: F.trim(l))
    keep = F.filter(
        lines,
        lambda l: l.rlike(r"[.!?”\"']$")
        & (F.size(F.split(l, r"\s+")) >= min_words_per_line)
        & ~F.lower(l).rlike(marker_re))
    doc_bad = F.lower(t).contains("lorem ipsum") | t.contains("{")
    clean = F.when(doc_bad | (F.size(keep) == 0), F.lit(None)) \
             .otherwise(F.concat_ws("\n", keep))
    n_all = F.size(F.filter(lines, lambda l: F.length(l) > 0))
    return df.select(F.col(id_col).alias("id"),
                     clean.alias("clean_text"),
                     F.size(keep).alias("n_kept_lines"),
                     (n_all - F.size(keep)).alias("n_dropped_lines"))


def corpus_line_dedup(df: DataFrame, text_col: str, id_col: str,
                      min_line_chars: int = 20) -> DataFrame:
    """C4 §2.2 corpus-level line dedup: any line occurring more than
    once ACROSS THE WHOLE CORPUS is kept only in the document of its
    first occurrence (min id, then line position) and removed
    everywhere else → ``(id, text, n_removed_lines)``.

    Lines shorter than ``min_line_chars`` are exempt (short lines —
    headers, "Introduction" — collide legitimately and carry no
    boilerplate signal).

    Shape at 100 TB: explode to (64-bit line hash, id, pos) — the text
    of a line never shuffles, only its hash; one groupBy picks each
    hash's winner; a join keyed by id + a groupBy(id) reassembles
    documents.  All keys are doc ids or line hashes — uniform."""
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("pos", "line"))
    hashed = lines.withColumn("__h", F.xxhash64("line")) \
                  .withColumn("__dedupable",
                              F.length(F.trim("line")) >= min_line_chars)
    winners = (hashed.where("__dedupable")
               .groupBy("__h")
               .agg(F.min(F.struct("id", "pos")).alias("w")))
    keep = hashed.join(winners, "__h", "left").where(
        ~F.col("__dedupable")
        | (F.col("w").isNull())
        | ((F.col("w.id") == F.col("id")) & (F.col("w.pos") == F.col("pos"))))
    rebuilt = (keep.groupBy("id")
               .agg(F.array_join(
                       F.transform(F.array_sort(F.collect_list(
                           F.struct("pos", "line"))), lambda x: x["line"]),
                       "\n").alias(text_col),
                    F.count(F.lit(1)).alias("__kept")))
    n_lines = lines.groupBy("id").agg(F.count(F.lit(1)).alias("__all"))
    return (rebuilt.join(n_lines, "id")
            .select("id", text_col,
                    (F.col("__all") - F.col("__kept"))
                    .alias("n_removed_lines")))


PII_PATTERNS = [
    # (label, regex) — the standard scrub list; extend per deployment.
    # Order matters: specific shapes (SSN) before the greedy digit-run
    # PHONE pattern, which would otherwise consume them.
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("IP", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("SSN", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("PHONE", r"\+?\d[\d\s().-]{7,}\d"),
]


def redact_pii(text: Column) -> Column:
    """Replace common PII shapes (emails, IPs, phone-like digit runs,
    SSNs) with ``<LABEL>`` tokens — the pre-training scrub pass.  Pure
    chained ``regexp_replace`` (JVM regex, one mapper); a production
    system adds NER-based detection on top, same plan shape via
    mapInPandas."""
    out = text
    for label, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{label}>")
    return out


def quality_filter(df: DataFrame, text_col: str, id_col: str,
                   max_dup_line_frac: float = 0.3,
                   max_dup_para_frac: float = 0.3,
                   max_top2_char_frac: float = 0.2,
                   max_dup5_char_frac: float = 0.15,
                   **gopher_kwargs) -> DataFrame:
    """End-to-end curation verdict per document: joins the repetition
    signals with the Gopher heuristic flags and emits ``(id, keep,
    reject_reason)``.  ``reject_reason`` names the FIRST failing rule
    (deterministic order) or NULL when kept.

    One wide mapper (flags + line stats) + one n-gram aggregate pass,
    joined back by id — two doc-keyed shuffles total at any scale."""
    d = spread(df)
    flags = gopher_quality_flags(d, text_col, id_col, **gopher_kwargs)
    rep = line_repetition_stats(d, text_col, id_col)
    ng = ngram_repetition_stats(d, text_col, id_col,
                                top_ns=[2], dup_ns=[5])
    j = flags.join(rep, "id").join(ng, "id")
    rules = [
        ("dup_lines", F.col("dup_line_frac") <= max_dup_line_frac),
        ("dup_paras", F.col("dup_para_frac") <= max_dup_para_frac),
        ("top_2gram", F.col("top2_char_frac") <= max_top2_char_frac),
        ("dup_5gram", F.col("dup5_char_frac") <= max_dup5_char_frac),
        ("gopher", F.col("gopher_pass")),
    ]
    keep = F.lit(True)
    reason = F.lit(None).cast("string")
    for name, ok in reversed(rules):
        reason = F.when(~ok, F.lit(name)).otherwise(reason)
    for _, ok in rules:
        keep = keep & ok
    return j.select("id", keep.alias("keep"), reason.alias("reject_reason"))
