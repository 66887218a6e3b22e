"""BM25 / TF-IDF retrieval: exact-score oracle in pure Python, parquet
round-trip, pruned-plan guard, and corpus-scale smoke on documents."""

import math
import os
import re

import pytest
from pyspark.sql import functions as F

from oxigraph_spark.pipeline.retrieval import (
    TextIndex, bm25_topk, build_text_index, tfidf_topk)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown cat naps all day the cat"),
    (2, "a fox and a dog became friends in the park"),
    (3, "spark shuffles and joins and aggregates at scale"),
    (4, "quick quick quick fox"),
]


def norm_tokens(text):
    t = re.sub(r"\s+", " ",
               re.sub(r"[^\w\s]|_", " ", text.lower())).strip()
    return t.split(" ") if t else []


def py_bm25(docs, query, k1=1.2, b=0.75):
    toks = {i: norm_tokens(t) for i, t in docs}
    n = len(docs)
    lens = {i: len(v) for i, v in toks.items()}
    avgdl = sum(lens[i] for i in toks if lens[i]) / \
        max(1, sum(1 for i in toks if lens[i]))
    dfreq = {}
    for i, v in toks.items():
        for t in set(v):
            dfreq[t] = dfreq.get(t, 0) + 1
    q = norm_tokens(query)
    scores = {}
    for i, v in toks.items():
        s = 0.0
        for t in q:
            tf = v.count(t)
            if tf == 0 or t not in dfreq:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * lens[i] / avgdl))
        if s > 0:
            scores[i] = s
    return scores


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return build_text_index(docs)


def test_bm25_exact_scores(index):
    got = {r["doc_id"]: r["score"]
           for r in bm25_topk(index, "quick fox", k=10).collect()}
    want = py_bm25(DOCS, "quick fox")
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9)


def test_bm25_ranking_sane(index):
    top = bm25_topk(index, "quick fox", k=2).collect()
    # doc 4 is saturated with both query terms and is short
    assert top[0]["doc_id"] == 4


def test_bm25_duplicate_query_terms_weight(index):
    single = {r["doc_id"]: r["score"]
              for r in bm25_topk(index, "fox dog", k=10).collect()}
    doubled = {r["doc_id"]: r["score"]
               for r in bm25_topk(index, "fox fox dog", k=10).collect()}
    # qtf doubles the fox term's contribution for fox-only docs
    assert doubled[4] == pytest.approx(2 * single[4], rel=1e-9)


def test_bm25_oov_and_empty_query(index):
    assert bm25_topk(index, "zzz qqq", k=5).count() == 0
    assert bm25_topk(index, "  ... ", k=5).count() == 0


def test_tfidf_topk(index):
    got = {r["doc_id"] for r in tfidf_topk(index, "spark scale").collect()}
    assert got == {3}


def test_index_roundtrip(index, spark, tmp_path):
    path = os.path.join(str(tmp_path), "idx")
    index.write(path)
    loaded = TextIndex.load(spark, path)
    assert loaded.n_docs == index.n_docs
    assert loaded.avgdl == pytest.approx(index.avgdl)
    a = {r["doc_id"]: r["score"]
         for r in bm25_topk(loaded, "quick fox", k=10).collect()}
    b = {r["doc_id"]: r["score"]
         for r in bm25_topk(index, "quick fox", k=10).collect()}
    assert a == b


def test_query_plan_pruned(index):
    """Query-time plan: top-k fused (TakeOrderedAndProject), the postings
    probe filtered on the term key, and no corpus-wide sort."""
    plan = bm25_topk(index, "quick fox", k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "term" in plan


def test_documents_corpus(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    idx = build_text_index(docs)
    top = bm25_topk(idx, "spark shuffle join", k=5).collect()
    assert 0 < len(top) <= 5
    # scores descend
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)


def test_rrf_fuse_exact(index, spark):
    """Fusion score equals Σ 1/(60+rank) computed from a Python replica."""
    from oxigraph_spark.pipeline.retrieval import rrf_fuse
    a = bm25_topk(index, "quick fox", k=5)
    b = bm25_topk(index, "dog park", k=5)
    rows_a = [r["doc_id"] for r in a.collect()]
    rows_b = [r["doc_id"] for r in b.collect()]
    want = {}
    for lst in (rows_a, rows_b):
        for i, d in enumerate(lst):
            want[d] = want.get(d, 0.0) + 1.0 / (60 + i + 1)
    got = {r["doc_id"]: r["score"] for r in rrf_fuse(a, b, k=10).collect()}
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)


def test_hybrid_lexical_dense(spark, sf_dir):
    """BM25 over documents fused with dense cosine over embeddings:
    the hybrid-retrieval shape (ids align doc_id == vec_id here)."""
    from oxigraph_spark.pipeline.retrieval import rrf_fuse
    from oxigraph_spark.pipeline.simsearch import brute_force_topk
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    embs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    idx = build_text_index(docs)
    lex = bm25_topk(idx, "spark hash join", k=10)
    qvec = embs.select("embedding").first()["embedding"]
    dense = brute_force_topk(embs, "embedding", "vec_id", qvec, k=10) \
        .withColumnRenamed("id", "doc_id").withColumnRenamed("sim", "score")
    fused = rrf_fuse(lex, dense, k=5).collect()
    assert 0 < len(fused) <= 5
    scores = [r["score"] for r in fused]
    assert scores == sorted(scores, reverse=True)


def test_tokenizers_locked_together(spark):
    """_tokenize_py must produce exactly what the Spark-side tokenizer
    (dedup.normalize_text split) produces — the index is built with one
    and queries with the other, so drift silently empties results."""
    from oxigraph_spark.pipeline.retrieval import _tokenize_py, _tokens
    cases = [
        "Hello, World!", "a-b_c d", "  spaces\t tabs \n lines ",
        "ALL CAPS", "unicode: café über straße",
        "digits 123 mix3d", "punct!!! ???", "", "   ", "one",
        "hyphen-ated and slash/ed", "quotes 'single' \"double\"",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    spark_toks = [r["t"] for r in
                  df.select(_tokens(F.col("text")).alias("t")).collect()]
    for c, st in zip(cases, spark_toks):
        got = _tokenize_py(c)
        want = [w for w in st if w != ""]
        got = [w for w in got if w != ""]
        assert got == want, f"tokenizer drift on {c!r}: {got} != {want}"


def test_rrf_fuse_no_rankings_raises(spark):
    from oxigraph_spark.pipeline.retrieval import rrf_fuse
    with pytest.raises(ValueError):
        rrf_fuse(k=5)
