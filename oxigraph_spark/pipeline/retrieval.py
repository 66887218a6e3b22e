"""Lexical retrieval: inverted index, TF-IDF, and BM25 top-k over a
document corpus.

Beyond the reference (which has no full-text engine beyond REGEX/
CONTAINS): a training-data pipeline needs lexical retrieval for
eval-set decontamination probes, RAG-corpus QA, and hard-negative
mining — and BM25 (Robertson/Spärck Jones; the Okapi formulation) is
the standard baseline ranker.

Scale shape:

- The index is a POSTINGS table ``(term, doc_id, tf)`` + tiny per-term
  document frequencies and two scalars (N, avgdl).  At 100 TB the
  postings land in parquet partitioned/bucketed by ``term``, so a
  query's ``term IN (...)`` probe is partition-pruned: it reads ONLY
  the postings of the query's terms, never the corpus.
- Query scoring is: prune postings to query terms → broadcast-join the
  per-term IDF (|query| rows) → one partial-agg sum per doc →
  ``TakeOrderedAndProject`` top-k.  No corpus-wide shuffle at query
  time; the only full shuffles happen ONCE at index build.
- Tokenization matches the dedup family (:func:`normalize_text`) so
  retrieval and dedup agree on what a "word" is.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .dedup import normalize_text

__all__ = ["TextIndex", "build_text_index", "bm25_topk", "tfidf_topk",
           "rrf_fuse"]


def _tokens(c: Column) -> Column:
    return F.split(normalize_text(c), " ")


def _tokenize_py(text: str) -> list:
    """Driver-side twin of :func:`_tokens` for the (tiny) query string."""
    t = re.sub(r"\s+", " ", re.sub(r"[^\w\s]|_", " ", text.lower(),
                                   flags=re.UNICODE)).strip()
    return t.split(" ") if t else []


@dataclass
class TextIndex:
    """Inverted index handle: postings + term stats + corpus scalars.

    ``postings``: (term, doc_id, tf);  ``terms``: (term, df);
    ``n_docs`` / ``avgdl``: corpus size and mean document length.
    ``write``/``load`` round-trip through parquet with the postings
    repartitioned by term — the layout whose partition pruning makes
    query-time reads O(query terms), not O(corpus).
    """
    postings: DataFrame
    terms: DataFrame
    n_docs: int
    avgdl: float

    def write(self, path: str) -> None:
        # cluster by term so each term's postings land contiguously:
        # the query-time term IN (...) predicate then prunes at the
        # row-group level via parquet min/max stats
        (self.postings.repartition("term").sortWithinPartitions("term")
         .write.mode("overwrite").parquet(f"{path}/postings"))
        self.terms.write.mode("overwrite").parquet(f"{path}/terms")
        spark = self.postings.sparkSession
        spark.createDataFrame([(self.n_docs, self.avgdl)],
                              "n_docs long, avgdl double") \
            .write.mode("overwrite").parquet(f"{path}/stats")

    def unpersist(self) -> None:
        """Release the cached postings/term frames (long-lived sessions
        that rebuild indexes repeatedly should call this — Spark's cache
        registry holds persisted plans until told otherwise)."""
        self.postings.unpersist()
        self.terms.unpersist()

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "TextIndex":
        stats = spark.read.parquet(f"{path}/stats").first()
        return cls(spark.read.parquet(f"{path}/postings"),
                   spark.read.parquet(f"{path}/terms"),
                   int(stats["n_docs"]), float(stats["avgdl"]))


def build_text_index(docs: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text") -> TextIndex:
    """One pass over the corpus: explode tokens → per-(term, doc) tf
    (carries the doc length along, no second corpus read) → per-term df.
    Two shuffles total, both on the term/doc keys — build-time cost,
    amortized over every query."""
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       _tokens(F.col(text_col)).alias("toks"))
    toks = toks.select("doc_id", F.size("toks").alias("dl"),
                       F.explode("toks").alias("term")) \
               .where(F.col("term") != "")
    postings = (toks.groupBy("term", "doc_id")
                .agg(F.count(F.lit(1)).alias("tf"),
                     F.first("dl").alias("dl")))
    terms = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # both corpus scalars from ONE map-side aggregate over a narrow
    # tokenized projection — no shuffle.  This replaces a docs.count()
    # job plus a full postings.groupBy(doc_id) shuffle (r9, guide §2.1):
    # avgdl = mean doc length over docs with >=1 non-empty token (the
    # exact set that appears in postings).  avg() over an int column
    # accumulates the sum in DOUBLE, which represents integers exactly
    # below 2^53 — total token count stays far under that at any
    # realistic corpus size, so the quotient matches the old
    # postings-derived mean bit-for-bit (r10 advisory: the guarantee is
    # via exact-in-double, not bigint arithmetic).
    stats = (docs.select(_tokens(F.col(text_col)).alias("toks"))
             .select(F.size("toks").alias("dl"),
                     F.exists("toks", lambda t: t != "").alias("has"))
             .agg(F.count(F.lit(1)).alias("n"),
                  F.avg(F.when(F.col("has"), F.col("dl"))).alias("avgdl"))
             .first())
    return TextIndex(postings.persist(), terms.persist(), int(stats["n"]),
                     float(stats["avgdl"] or 0.0))


def bm25_topk(index: TextIndex, query: str, k: int = 10, *,
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Okapi BM25 top-k: ``(doc_id, score)`` descending.

    IDF uses the standard ``ln(1 + (N - df + 0.5)/(df + 0.5))`` form
    (always positive).  Query terms absent from the corpus contribute
    nothing.  Duplicate query terms weight linearly (qtf), per Okapi.
    """
    q = _tokenize_py(query)
    if not q:
        return index.postings.sparkSession.createDataFrame(
            [], "doc_id long, score double")
    qtf: dict = {}
    for t in q:
        qtf[t] = qtf.get(t, 0) + 1
    spark = index.postings.sparkSession
    qdf = spark.createDataFrame(list(qtf.items()), "term string, qtf long")
    # per-term idf for JUST the query's terms — a |query|-row broadcast
    tstats = index.terms.join(F.broadcast(qdf), "term")
    n = index.n_docs
    idf = F.log(F.lit(1.0) + (F.lit(float(n)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    tstats = tstats.select("term", "qtf", idf.alias("idf"))
    # postings pruned to the query's terms: with a term-partitioned
    # index layout this is a partition-pruned read, not a scan
    hits = index.postings.where(F.col("term").isin(list(qtf)))
    avgdl = index.avgdl if index.avgdl > 0 else 1.0
    tf_part = (F.col("tf") * (k1 + 1.0)
               / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl)))
    scored = (hits.join(F.broadcast(tstats), "term")
              .groupBy("doc_id")
              .agg(F.sum(F.col("qtf") * F.col("idf") * tf_part)
                   .alias("score")))
    return scored.orderBy(F.desc("score"), "doc_id").limit(k)


def tfidf_topk(index: TextIndex, query: str, k: int = 10) -> DataFrame:
    """Cosine-free TF-IDF ranking (sum of tf·idf over query terms) —
    the simpler baseline; same pruned-postings plan shape as BM25."""
    q = set(_tokenize_py(query)) - {""}
    if not q:
        return index.postings.sparkSession.createDataFrame(
            [], "doc_id long, score double")
    n = index.n_docs
    idf = F.log(F.lit(float(n) + 1.0) / (F.col("df") + 1.0)) + F.lit(1.0)
    tstats = index.terms.where(F.col("term").isin(list(q))) \
        .select("term", idf.alias("idf"))
    hits = index.postings.where(F.col("term").isin(list(q)))
    scored = (hits.join(F.broadcast(tstats), "term")
              .groupBy("doc_id")
              .agg(F.sum((F.lit(1.0) + F.log("tf")) * F.col("idf"))
                   .alias("score")))
    return scored.orderBy(F.desc("score"), "doc_id").limit(k)


def rrf_fuse(*rankings, id_col: str = "doc_id", k: int = 10,
             c: int = 60) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of N ranked
    lists: ``score = Σ 1/(c + rank_i)`` — the standard way to combine a
    lexical (BM25) and a dense (ANN cosine) retriever without score
    calibration.

    Each input is ``(df, score_col)`` or a bare DataFrame with a
    ``score`` column; ranks are recomputed from the score (descending,
    id tie-break) so they're deterministic regardless of physical row
    order.  Inputs must be small (top-k results, not corpora) — rank
    assignment uses a single-partition window, exactly right for k-row
    frames and wrong for anything larger.
    """
    from pyspark.sql import Window
    if not rankings:
        raise ValueError("rrf_fuse: at least one ranked list required")
    parts = []
    for r in rankings:
        df, score_col = r if isinstance(r, tuple) else (r, "score")
        w = Window.orderBy(F.desc(score_col), F.col(id_col))
        parts.append(df.select(F.col(id_col), F.col(score_col))
                     .withColumn("__rank", F.row_number().over(w))
                     .select(id_col, "__rank"))
    fused = parts[0]
    for p in parts[1:]:
        fused = fused.unionAll(p)
    return (fused.groupBy(id_col)
            .agg(F.sum(1.0 / (F.lit(float(c)) + F.col("__rank")))
                 .alias("score"))
            .orderBy(F.desc("score"), id_col)
            .limit(k))
