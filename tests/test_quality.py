"""Tests for pipeline.quality (Gopher/C4 filters), pipeline.urls, and
the exact-substring span ops in pipeline.curation."""

import pytest
from pyspark.sql import Row, functions as F

from oxigraph_spark.pipeline import quality as Q
from oxigraph_spark.pipeline import urls as U
from oxigraph_spark.pipeline.curation import (mask_shared_spans,
                                              shared_substring_spans)


# ---------------------------------------------------------------------------
# repetition signals
# ---------------------------------------------------------------------------

def test_line_repetition(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="alpha one\nbeta two\nalpha one\ngamma"),
        Row(doc_id=2, text="unique a\nunique b\n\nunique c"),
    ])
    out = {r["id"]: r for r in
           Q.line_repetition_stats(df, "text", "doc_id").collect()}
    # doc 1: 4 lines, one duplicate line ("alpha one") -> 1/4
    assert out[1]["dup_line_frac"] == 0.25
    assert out[1]["n_lines"] == 4
    # dup char mass: "alpha one" = 9 chars of total 9+8+9+5=31
    assert out[1]["dup_line_char_frac"] == round(9 / 31, 6)
    assert out[2]["dup_line_frac"] == 0.0
    assert out[2]["n_paras"] == 2


def test_ngram_repetition_top2(spark):
    # "the cat" appears 3 times out of 5 bigrams
    text = "the cat sat the cat ran the cat"
    df = spark.createDataFrame([Row(doc_id=1, text=text),
                                Row(doc_id=2, text="all words differ here")])
    out = {r["id"]: r for r in
           Q.ngram_repetition_stats(df, "text", "doc_id",
                                    top_ns=[2], dup_ns=[2]).collect()}
    # top bigram "the cat": 3 occurrences x 7 chars = 21 of 31 chars
    assert out[1]["top2_char_frac"] == round(21 / len(text), 6)
    # duplicated bigrams: only "the cat" occurs >1 -> same mass
    assert out[1]["dup2_char_frac"] == round(21 / len(text), 6)
    assert out[2]["top2_char_frac"] == 0.0
    assert out[2]["dup2_char_frac"] == 0.0


def test_gopher_flags_and_quality_filter(spark):
    good = ("the quick brown fox jumps over the lazy dog and then it "
            "runs for a while in the field with many other animals "
            "that live there peacefully every single day of the year "
            "under a bright warm sun that is high in the sky above")
    spam = "buy now # # # # # # # # # # # # # # # # # # # # # #"
    df = spark.createDataFrame([Row(doc_id=1, text=good),
                                Row(doc_id=2, text=spam)])
    flags = {r["id"]: r for r in
             Q.gopher_quality_flags(df, "text", "doc_id",
                                    min_words=20).collect()}
    assert flags[1]["gopher_pass"]
    assert not flags[2]["gopher_pass"]
    assert not flags[2]["symbol_ratio_ok"]
    verdict = {r["id"]: r for r in
               Q.quality_filter(df, "text", "doc_id",
                                min_words=20).collect()}
    assert verdict[1]["keep"] and verdict[1]["reject_reason"] is None
    assert not verdict[2]["keep"] and verdict[2]["reject_reason"]


def test_c4_line_filter(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="This is a good sentence.\nshort\n"
                           "Another proper sentence here!\n"
                           "Please accept our cookie policy today."),
        Row(doc_id=2, text="function f() { return 1; }"),
    ])
    out = {r["id"]: r for r in
           Q.c4_line_filter(df, "text", "doc_id").collect()}
    assert out[1]["clean_text"] == ("This is a good sentence.\n"
                                    "Another proper sentence here!")
    assert out[1]["n_kept_lines"] == 2
    assert out[2]["clean_text"] is None  # curly brace -> code


# ---------------------------------------------------------------------------
# URLs
# ---------------------------------------------------------------------------

def test_normalize_url(spark):
    rows = spark.createDataFrame([
        Row(u="HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag"),
        Row(u="http://example.com/a/b?a=1&b=2"),
        Row(u="example.com"),
        Row(u="not a url at all"),
    ]).select(U.normalize_url(F.col("u")).alias("n")).collect()
    assert rows[0]["n"] == "https://example.com/a/b?a=1&b=2"
    assert rows[1]["n"] == "http://example.com/a/b?a=1&b=2"
    assert rows[2]["n"] == "http://example.com/"
    assert rows[3]["n"] is None


def test_domain_and_dedup(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, u="http://www.news.example.co.uk/x"),
        Row(doc_id=2, u="https://blog.example.com/p?utm_source=a"),
        Row(doc_id=3, u="https://blog.example.com/p"),
    ])
    doms = df.select(U.domain_of(F.col("u")).alias("d")).collect()
    assert doms[0]["d"] == "example.co.uk"
    assert doms[1]["d"] == "example.com"
    dedup = U.url_dedup(df, "u", "doc_id").collect()
    # docs 2 and 3 normalize to the same URL -> min id 2 survives
    ids = sorted(r["id"] for r in dedup)
    assert ids == [1, 2]


def test_cap_per_domain(spark):
    rows = ([Row(doc_id=i, u=f"http://big.example.com/p{i}")
             for i in range(20)]
            + [Row(doc_id=100, u="http://small.example.org/x")])
    df = spark.createDataFrame(rows)
    out = U.cap_per_domain(df, "u", "doc_id", cap=5)
    got = out.collect()
    assert len(got) == 6  # 5 of big + 1 of small
    assert {r["doc_id"] for r in got} >= {100}
    assert set(out.columns) == {"doc_id", "u"}
    # deterministic across runs
    again = {r["doc_id"] for r in
             U.cap_per_domain(df, "u", "doc_id", cap=5).collect()}
    assert again == {r["doc_id"] for r in got}


# ---------------------------------------------------------------------------
# exact-substring spans
# ---------------------------------------------------------------------------

W = ("w%d " * 40).strip()


def _doc(*chunks):
    return " ".join(chunks)


def test_shared_substring_spans(spark):
    shared = " ".join(f"s{i}" for i in range(20))  # 20-word shared run
    a = _doc(" ".join(f"a{i}" for i in range(10)), shared,
             " ".join(f"z{i}" for i in range(5)))
    b = _doc(" ".join(f"b{i}" for i in range(3)), shared)
    c = "totally different words only here"
    df = spark.createDataFrame([Row(doc_id=1, text=a),
                                Row(doc_id=2, text=b),
                                Row(doc_id=3, text=c)])
    spans = shared_substring_spans(df, "text", "doc_id",
                                   k=8, min_len=16).collect()
    assert len(spans) == 1
    s = spans[0]
    assert (s["id_a"], s["id_b"]) == (1, 2)
    assert s["span_words"] == 20
    assert s["start_a"] == 11  # 1-based: after 10 filler words
    assert s["start_b"] == 4


def test_shared_spans_threshold_and_mask(spark):
    shared = " ".join(f"s{i}" for i in range(12))  # 12 < min_len=16
    df = spark.createDataFrame([
        Row(doc_id=1, text=shared + " tail one"),
        Row(doc_id=2, text="head " + shared),
    ])
    assert shared_substring_spans(df, "text", "doc_id",
                                  k=8, min_len=16).count() == 0
    # with min_len=8 the span is found and maskable
    spans = shared_substring_spans(df, "text", "doc_id", k=8, min_len=8)
    masked = {r["doc_id"]: r for r in
              mask_shared_spans(df, spans, "text", "doc_id").collect()}
    assert masked[1]["n_cut_words"] == 0  # id_a side untouched
    assert masked[2]["n_cut_words"] == 12
    assert masked[2]["text"] == "head"
    assert "s0" not in masked[2]["text"]


def test_hot_anchor_cap_bounds_pairs(spark):
    # one boilerplate sentence shared by many docs: with the cap the
    # self-join must not see the hot anchors at all
    boiler = " ".join(f"b{i}" for i in range(30))
    rows = [Row(doc_id=i, text=f"u{i} " + boiler) for i in range(40)]
    df = spark.createDataFrame(rows)
    capped = shared_substring_spans(df, "text", "doc_id",
                                    k=8, min_len=8, max_posting=10)
    assert capped.count() == 0  # all anchors hotter than the cap
    uncapped = shared_substring_spans(df, "text", "doc_id",
                                      k=8, min_len=8, max_posting=1000)
    assert uncapped.count() == 40 * 39 / 2


def test_shared_spans_differential_bruteforce(spark):
    """Seeded random docs over a tiny vocabulary (lots of natural
    repeats) — shared_substring_spans must match a brute-force diagonal
    scan computing islands of consecutive matching k-grams."""
    import random
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    docs = {i: [rng.choice(vocab) for _ in range(rng.randint(10, 60))]
            for i in range(30)}
    K, MIN = 4, 6
    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(ws)) for i, ws in docs.items()])
    got = sorted(
        (r["id_a"], r["id_b"], r["start_a"], r["start_b"], r["span_words"])
        for r in shared_substring_spans(df, "text", "doc_id", k=K,
                                        min_len=MIN,
                                        max_posting=10**6).collect())

    def grams(ws):
        return [" ".join(ws[i:i + K]) for i in range(len(ws) - K + 1)]

    expected = []
    ids = sorted(docs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            ga, gb = grams(docs[a]), grams(docs[b])
            for d in range(-len(gb) + 1, len(ga)):
                run = 0
                for i in range(len(ga) + 1):
                    j = i - d
                    hit = (i < len(ga) and 0 <= j < len(gb)
                           and ga[i] == gb[j])
                    if hit:
                        run += 1
                    else:
                        if run and run + K - 1 >= max(K, MIN):
                            expected.append(
                                (a, b, i - run + 1, i - run - d + 1,
                                 run + K - 1))
                        run = 0
    assert got == sorted(expected)


def test_corpus_line_dedup(spark):
    boiler = "this exact boilerplate footer appears in many documents"
    df = spark.createDataFrame([
        Row(doc_id=1, text=f"unique first line of doc one\n{boiler}"),
        Row(doc_id=2, text=f"{boiler}\nunique line of doc two"),
        Row(doc_id=3, text="short\nall unique content here today"),
    ])
    out = {r["id"]: r for r in
           Q.corpus_line_dedup(df, "text", "doc_id").collect()}
    # winner = min (id, pos): doc 1 keeps the boilerplate
    assert boiler in out[1]["text"] and out[1]["n_removed_lines"] == 0
    assert boiler not in out[2]["text"] and out[2]["n_removed_lines"] == 1
    assert out[2]["text"] == "unique line of doc two"
    assert out[3]["n_removed_lines"] == 0
    # short lines exempt even if repeated
    df2 = spark.createDataFrame([Row(doc_id=1, text="short\na"),
                                 Row(doc_id=2, text="short\nb")])
    out2 = {r["id"]: r["n_removed_lines"] for r in
            Q.corpus_line_dedup(df2, "text", "doc_id").collect()}
    assert out2 == {1: 0, 2: 0}


def test_redact_pii(spark):
    df = spark.createDataFrame([Row(doc_id=1, text=(
        "mail me at jane.doe+x@corp.example.com or call +1 (555) 123-4567; "
        "server 192.168.0.1, ssn 123-45-6789"))])
    got = df.select(Q.redact_pii(F.col("text")).alias("t")).collect()[0]["t"]
    assert "<EMAIL>" in got and "<PHONE>" in got
    assert "<IP>" in got and "<SSN>" in got
    assert "jane" not in got and "192.168" not in got


def test_mask_overlapping_spans_multiple_partners(spark):
    """A doc duplicated against TWO partners with overlapping spans:
    the union of covered word ranges is cut exactly once."""
    shared = " ".join(f"s{i}" for i in range(12))
    df = spark.createDataFrame([
        Row(doc_id=1, text=shared),                    # source A
        Row(doc_id=2, text=shared + " tail"),          # source B
        Row(doc_id=3, text="head " + shared),          # dupe of both
    ])
    spans = shared_substring_spans(df, "text", "doc_id", k=8, min_len=8)
    # doc 3 is id_b for both (1,3) and (2,3) pairs; spans overlap fully
    masked = {r["doc_id"]: r for r in
              mask_shared_spans(df, spans, "text", "doc_id").collect()}
    assert masked[3]["text"] == "head"
    assert masked[3]["n_cut_words"] == 12  # overlap not double-counted
