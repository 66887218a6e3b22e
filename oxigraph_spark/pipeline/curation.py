"""Corpus-curation operators for training-data pipelines.

Not in the reference (oxigraph has no document processing); extensions in
the spirit of SURVEY.md §2.11.  Everything is built-in-function
DataFrame code except ``pack_sequences``, whose per-partition greedy bin
packing is genuinely imperative — that one is an Arrow-batched
``mapInPandas`` (the documented slow-path escape hatch).

100 TB shapes:
- stratified sampling: one tiny stratum-count aggregate, then a
  map-side ``sampleBy`` — the corpus is never shuffled;
- winnowing: per-document O(len·window) JVM expressions, then an
  inverted-index pair join on 8-byte fingerprints (Σ posting² like the
  other dedup families, never all-pairs);
- packing: bins never span partitions, so no global coordination;
- streaming dedup: state bounded by the watermark horizon.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame, Window, functions as F

from .dedup import normalize_text, spread


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------

def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: Optional[Dict] = None,
                      cap_per_stratum: Optional[int] = None,
                      seed: int = 42) -> DataFrame:
    """Deterministic per-stratum sampling (e.g. balance languages).

    Either explicit ``fractions`` {stratum: fraction}, or
    ``cap_per_stratum`` = N to down-sample every stratum to ~N docs
    (fractions derived from one small count aggregate; strata
    cardinality is assumed driver-sized — languages, sources — NOT
    arbitrary keys).  Bernoulli sampling per row → no shuffle."""
    if (fractions is None) == (cap_per_stratum is None):
        raise ValueError("exactly one of fractions / cap_per_stratum")
    if fractions is None:
        counts = {r["k"]: r["n"]
                  for r in df.groupBy(F.col(strata_col).alias("k"))
                             .agg(F.count(F.lit(1)).alias("n")).collect()}
        fractions = {k: min(1.0, cap_per_stratum / n)
                     for k, n in counts.items()}
    return df.sampleBy(strata_col, fractions, seed=seed)


# ---------------------------------------------------------------------------
# corpus statistics
# ---------------------------------------------------------------------------

def corpus_stats(df: DataFrame, text_col: str,
                 strata_col: Optional[str] = None) -> DataFrame:
    """Per-stratum (default: corpus-wide) size/token statistics with
    approximate quantiles — the curation dashboard numbers.  One
    aggregate; percentile_approx is a fixed-size sketch (map-side
    combinable), so this is a single narrow shuffle at any scale."""
    from .textstats import token_count
    t = F.col(text_col)
    toks = token_count(t)
    keys = [F.col(strata_col)] if strata_col else [F.lit("all").alias("stratum")]
    return (df.groupBy(*keys)
              .agg(F.count(F.lit(1)).alias("n_docs"),
                   F.sum(toks).alias("total_tokens"),
                   F.round(F.avg(toks), 3).alias("mean_tokens"),
                   F.percentile_approx(toks, [0.5, 0.9, 0.99])
                    .alias("token_quantiles_50_90_99"),
                   F.sum(F.length(t)).alias("total_chars")))


# ---------------------------------------------------------------------------
# winnowing fingerprints (partial-overlap / containment detection)
# ---------------------------------------------------------------------------

def winnow_fingerprints(df: DataFrame, text_col: str, id_col: str,
                        k: int = 8, window: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 —
    the MOSS algorithm) → ``(id, fps array<long>)``: hash every char
    k-gram, keep the MINIMUM hash of each sliding window of ``window``
    consecutive k-grams, distinct.

    Guarantees: any shared substring of length ≥ k + window − 1 between
    two documents yields at least one shared fingerprint — catches
    doc-contains-doc overlap that whole-document MinHash Jaccard misses.
    Pure JVM higher-order functions, O(len·window) per doc.

    DataFrame-level on purpose: the k-gram array must be MATERIALIZED
    before the window pass references it inside a lambda — a lambda body
    re-evaluates free sub-expressions PER ELEMENT, so composing this as
    one Column expression is O(len²·regex) (measured 40 ms/doc → ~1 ms).
    Each stage is an `_opaque` alias so CollapseProject cannot inline it
    back into the next lambda."""
    from ..plans.compiler import _opaque
    t = F.col("__nt")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - k + 1, F.lit(1))),
        lambda i: F.xxhash64(t.substr(i, F.lit(k))))
    g = F.col("__grams")
    mins = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(g) - window + 1, F.lit(1))),
        lambda j: F.array_min(F.slice(g, j, window)))
    return (df.select(F.col(id_col).alias("id"),
                      _opaque(normalize_text(F.col(text_col))).alias("__nt"))
              .select("id", _opaque(grams).alias("__grams"))
              .select("id", F.array_distinct(mins).alias("fps")))


def winnow_overlap_pairs(df: DataFrame, text_col: str, id_col: str,
                         k: int = 8, window: int = 4,
                         min_shared: int = 5,
                         max_posting: int = 64) -> DataFrame:
    """Candidate partial-overlap pairs: docs sharing ≥ ``min_shared``
    winnowing fingerprints.  Inverted index on the 8-byte fingerprint →
    per-fingerprint id pairs → co-occurrence count.

    ``max_posting`` is the load-bearing knob: fingerprints whose posting
    list exceeds it are DROPPED before the pair join (same idiom as the
    MinHash hot-bucket cap), which (a) bounds the join at
    Σ min(posting, cap)² regardless of corpus size — boilerplate shared
    by thousands of docs would otherwise contribute posting²/2 pairs
    EACH — and (b) is the right semantics: a fingerprint common to half
    the corpus carries no overlap signal, exactly like an IDF stopword.
    Doc-specific (discriminative) fingerprints always survive the cap."""
    fp = winnow_fingerprints(spread(df), text_col, id_col, k, window) \
        .select("id", F.explode("fps").alias("fp"))
    fp = fp.withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy("fp"))) \
        .where(F.col("__n") <= max_posting).drop("__n")
    a = fp.alias("a")
    b = fp.alias("b")
    pairs = (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                    & (F.col("a.id") < F.col("b.id")))
             .groupBy(F.col("a.id").alias("id_a"),
                      F.col("b.id").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("shared_fps"))
             .where(F.col("shared_fps") >= min_shared))
    return pairs


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: str = "text",
                  k: int = 8, window: int = 4,
                  min_shared: int = 3) -> DataFrame:
    """Flag training documents containing evaluation-set content
    (benchmark decontamination — the step every training pipeline runs
    so eval questions don't leak into the corpus).

    Returns ``(id, shared_fps)`` for every CONTAMINATED training doc:
    ``shared_fps`` = how many distinct benchmark fingerprints it
    contains.  (Occurrence counts would be redundant here: winnowing
    fingerprints are de-duplicated per doc and the benchmark set is
    distinct, so each (id, fp) matches at most once.)  Filter the
    corpus with an anti-join on ``id``.

    Built on winnowing fingerprints, NOT whole-document similarity: a
    100-token eval question pasted into a 10k-token web page moves
    MinHash Jaccard by ~1% but GUARANTEES a shared winnowing fingerprint
    for any common substring of length ≥ k + window − 1.

    Scale shape: the benchmark fingerprint set is small (eval sets are
    thousands of items) — it deduplicates into a broadcast-joinable
    table, so the corpus-side pass is one scan + fingerprint explode +
    broadcast semi-join + groupBy.  No corpus self-join, no posting-list
    caps needed (benchmark fingerprints are the index, not the corpus)."""
    corpus_fp = winnow_fingerprints(spread(docs), text_col, id_col,
                                    k, window) \
        .select("id", F.explode("fps").alias("fp"))
    bench_fp = winnow_fingerprints(spread(benchmark), bench_text_col,
                                   benchmark.columns[0], k, window) \
        .select(F.explode("fps").alias("fp")).distinct()
    hits = corpus_fp.join(F.broadcast(bench_fp), "fp")
    return (hits.groupBy("id")
            .agg(F.count_distinct("fp").alias("shared_fps"))
            .where(F.col("shared_fps") >= min_shared))


# ---------------------------------------------------------------------------
# leakage-safe splits (cluster-aware train/val/test)
# ---------------------------------------------------------------------------

def leakage_safe_split(df: DataFrame, pairs: DataFrame, id_col: str,
                       fractions: Optional[Dict[str, float]] = None,
                       seed: int = 42) -> DataFrame:
    """Assign every document to train/val/test such that NEAR-DUPLICATES
    NEVER STRADDLE SPLITS: the split is decided per near-dup CLUSTER
    (connected components over ``pairs``, singletons for unpaired docs),
    by a seeded hash of the cluster id → original columns + ``cluster``
    + ``split``.

    Splitting documents independently leaks training data into eval
    whenever two near-copies land in different splits — the standard
    failure the dedup pipeline exists to prevent.  Hash-based
    assignment is deterministic, stable under re-runs and corpus
    growth (a cluster keeps its split when new members join it, as
    long as its min-id representative is stable).

    Shape: clustering shuffles only 8-byte ids; the split decision is a
    map-side hash on the attached cluster column — no extra shuffle
    beyond :func:`~oxigraph_spark.pipeline.dedup.assign_clusters`."""
    from .dedup import assign_clusters
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(fractions.values())
    if not 0.999 < total < 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    d = assign_clusters(df, pairs, id_col=id_col).drop("is_duplicate")
    # uniform [0,1) from the cluster id, seeded
    u = (F.pmod(F.xxhash64(F.col("cluster").cast("string"), F.lit(seed)),
                F.lit(1_000_000)).cast("double") / 1_000_000.0)
    split = F.lit(None).cast("string")
    acc = 0.0
    for name, frac in sorted(fractions.items()):
        acc += frac
        split = F.coalesce(split,
                           F.when(u < acc, F.lit(name)))
    return d.withColumn("split", F.coalesce(split,
                                            F.lit(sorted(fractions)[-1])))


# ---------------------------------------------------------------------------
# training-mix construction (token-budget sampling per source)
# ---------------------------------------------------------------------------

def sample_to_token_budget(df: DataFrame, token_col: str, strata_col: str,
                           budget_tokens: int,
                           weights: Optional[Dict] = None,
                           seed: int = 42) -> DataFrame:
    """Build a training mix: sample each stratum (source/domain/language)
    so the total token count approaches ``budget_tokens`` split by
    ``weights`` (relative shares, default: proportional to the corpus).
    Strata needing MORE than their corpus has are upsampled: whole
    copies via a small crossJoin-on-literal-range (no data skew — each
    copy is a map-side pass) plus a Bernoulli remainder, the standard
    data-mixing shape (e.g. up-weighting Wikipedia against web crawl).

    One tiny count aggregate (strata cardinality is driver-sized:
    sources, not arbitrary keys), then map-side ``sampleBy``/unions —
    the corpus is never shuffled.  Deterministic under ``seed``.
    Returns the original columns."""
    totals = {r["k"]: r["t"] for r in
              df.groupBy(F.col(strata_col).alias("k"))
                .agg(F.sum(token_col).alias("t")).collect()}
    if not totals:
        return df.limit(0)
    if weights is None:
        weights = dict(totals)
    wsum = float(sum(weights.get(k, 0.0) for k in totals))
    out = None
    for k, have in totals.items():
        w = float(weights.get(k, 0.0))
        if w <= 0 or not have:
            continue
        want = budget_tokens * w / wsum
        ratio = want / float(have)
        part = df.where(F.col(strata_col) == k)
        whole, frac = int(ratio), ratio - int(ratio)
        pieces = []
        if whole:
            # n whole copies: range-literal crossJoin is a broadcast of
            # `whole` rows — each copy is one map-side pass of the stratum
            copies = part.crossJoin(
                df.sparkSession.range(whole).select(
                    F.col("id").alias("__copy"))).drop("__copy")
            pieces.append(copies)
        if frac > 1e-9:
            pieces.append(part.sample(fraction=min(frac, 1.0), seed=seed))
        if not pieces:
            continue
        piece = pieces[0] if len(pieces) == 1 \
            else pieces[0].unionByName(pieces[1])
        out = piece if out is None else out.unionByName(piece)
    return out if out is not None else df.limit(0)


# ---------------------------------------------------------------------------
# exact-substring duplicate spans (Lee et al., arXiv:2107.06499)
# ---------------------------------------------------------------------------

def shared_substring_spans(df: DataFrame, text_col: str, id_col: str,
                           k: int = 8, min_len: int = 16,
                           max_posting: int = 64) -> DataFrame:
    """Maximal exact-duplicated WORD spans across document pairs →
    ``(id_a, id_b, start_a, start_b, span_words)``: every run of
    ≥ ``min_len`` consecutive words that appears verbatim in both
    documents, with its start word offset in each.

    This is the *exact-substring* dedup signal of "Deduplicating
    Training Data Makes Language Models Better" (Lee et al.,
    arXiv:2107.06499), which builds a suffix array — inherently
    single-machine.  The distributed re-expression: anchor on word
    ``k``-gram rolling hashes with positions, join anchors on the hash,
    then merge DIAGONAL runs (consecutive positions in both docs) with
    a gaps-and-islands window.  A shared span of ``L ≥ k`` words yields
    ``L−k+1`` consecutive anchors on one diagonal, so every span of
    length ≥ ``max(k, min_len)`` is found exactly — no recall loss
    against the suffix array for spans above the threshold.

    Scale shape: anchors explode to one row per word (same mass as
    tokenization); the ONLY pairwise step is the anchor self-join,
    bounded by ``max_posting`` (a k-gram shared by more than that many
    docs is boilerplate/stopword mass — the same IDF-style cap as
    :func:`winnow_overlap_pairs`, idiom at ``dedup.py`` MinHash); the
    island merge is windowed per (id_a, id_b, diagonal) — keys no hotter
    than the longest single overlap.  Zero Python UDFs."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    base = spread(df).select(F.col(id_col).alias("id"),
                             words.alias("__w"))
    grams = base.select(
        "id",
        F.posexplode(F.when(
            F.size("__w") >= k,
            F.transform(F.sequence(F.lit(1), F.size("__w") - k + 1),
                        lambda i: F.xxhash64(
                            F.concat_ws(" ", F.slice("__w", i, k))))
        ).otherwise(F.array().cast("array<long>"))).alias("pos0", "h"))
    # 1-based word offsets (posexplode is 0-based; mask_shared_spans and
    # humans both count words from 1)
    grams = grams.select("id", (F.col("pos0") + 1).alias("pos"), "h")
    # IDF-style hot-anchor cap BEFORE the self-join
    grams = grams.withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy("h"))) \
        .where(F.col("__n") <= max_posting).drop("__n")
    a, b = grams.alias("a"), grams.alias("b")
    hits = (a.join(b, (F.col("a.h") == F.col("b.h"))
                   & (F.col("a.id") < F.col("b.id")))
             .select(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"),
                     F.col("a.pos").alias("pos_a"),
                     F.col("b.pos").alias("pos_b"))
             .withColumn("diag", F.col("pos_a") - F.col("pos_b"))
             .dropDuplicates(["id_a", "id_b", "pos_a", "pos_b"]))
    # gaps-and-islands on each diagonal: consecutive pos_a = one span
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
    spans = (hits.withColumn("__isl",
                             F.col("pos_a") - F.row_number().over(w))
                 .groupBy("id_a", "id_b", "diag", "__isl")
                 .agg(F.min("pos_a").alias("start_a"),
                      F.min("pos_b").alias("start_b"),
                      (F.max("pos_a") - F.min("pos_a") + k)
                      .alias("span_words")))
    return (spans.where(F.col("span_words") >= max(k, min_len))
                 .select("id_a", "id_b", "start_a", "start_b",
                         "span_words"))


def mask_shared_spans(df: DataFrame, spans: DataFrame, text_col: str,
                      id_col: str) -> DataFrame:
    """Cut every duplicated span (the ``id_b``/higher-id side of
    :func:`shared_substring_spans` output) out of its document →
    original columns with ``text_col`` rewritten, plus
    ``n_cut_words``.  Docs with no spans pass through untouched.

    NOTE: span coordinates live in NORMALIZED word space
    (:func:`normalize_text` — lowercased, punctuation stripped), so a
    rewritten document is returned in that normalized form; docs without
    spans keep their original text.  Pipelines that must preserve
    original formatting should use the span list to drop whole
    documents (or re-derive char offsets with their own tokenizer)
    rather than splice text.

    The per-doc span list arrives as a grouped array (one row per doc
    after the aggregate), and the cut is a word-level higher-order
    filter — a mapper over the joined rows, no Python."""
    cuts = (spans.groupBy(F.col("id_b").alias("__cid"))
                 .agg(F.collect_list(
                     F.struct(F.col("start_b").alias("s"),
                              (F.col("start_b") + F.col("span_words"))
                              .alias("e"))).alias("__spans")))
    d = df.join(cuts, df[id_col] == cuts["__cid"], "left").drop("__cid")
    words = F.split(normalize_text(F.col(text_col)), " ")
    sp = F.coalesce(F.col("__spans"),
                    F.array().cast("array<struct<s:int,e:int>>"))
    kept = F.filter(
        F.transform(words, lambda w, i: F.struct(w.alias("w"),
                                                 (i + 1).alias("p"))),
        lambda x: ~F.exists(sp, lambda r: (x["p"] >= r["s"])
                            & (x["p"] < r["e"])))
    out_text = F.concat_ws(" ", F.transform(kept, lambda x: x["w"]))
    n_cut = F.size(words) - F.size(kept)
    cols = [c for c in df.columns if c != text_col]
    return d.select(*cols,
                    F.when(F.col("__spans").isNotNull(), out_text)
                     .otherwise(F.col(text_col)).alias(text_col),
                    F.when(F.col("__spans").isNotNull(), n_cut)
                     .otherwise(F.lit(0)).alias("n_cut_words"))


# ---------------------------------------------------------------------------
# sequence packing (training-batch construction)
# ---------------------------------------------------------------------------

def pack_sequences(df: DataFrame, id_col: str, token_col: str,
                   max_tokens: int = 2048,
                   open_bins: int = 32) -> DataFrame:
    """Greedy first-fit packing of documents into training sequences of
    ≤ ``max_tokens`` total tokens → ``(pack_id, ids, total_tokens)``.

    Bins never span partitions: each partition packs independently
    (``pack_id`` = partition id ⊕ local counter), so there is no global
    coordination and the waste is < 1 open bin per partition — noise at
    scale.  At most ``open_bins`` bins stay open per partition (first
    fit over a bounded ring), keeping packing O(n·open_bins).

    Docs longer than ``max_tokens`` get a singleton pack (truncation is
    the tokenizer's job, not the packer's).  This is per-partition
    imperative logic — the documented legitimate ``mapInPandas`` case.
    """
    from pyspark.sql.types import (ArrayType, LongType, StructField,
                                   StructType)
    src = df.select(
        F.spark_partition_id().alias("__pid"),
        F.col(id_col).cast("long").alias("id"),
        F.col(token_col).cast("long").alias("tok"))
    schema = StructType([
        StructField("pack_id", LongType()),
        StructField("ids", ArrayType(LongType())),
        StructField("total_tokens", LongType()),
    ])

    def pack(batches):
        import pandas as pd
        bins = []          # [remaining, ids, total]
        pid, seq = 0, 0

        def close(b):
            nonlocal seq
            out = {"pack_id": (pid << 20) | seq, "ids": b[1],
                   "total_tokens": b[2]}
            seq += 1
            return out

        done = []
        for pdf in batches:
            for i, t, p in zip(pdf["id"], pdf["tok"], pdf["__pid"]):
                pid = int(p)
                t = int(t)
                if t >= max_tokens:
                    done.append(close([0, [int(i)], t]))
                    continue
                for b in bins:
                    if b[0] >= t:
                        b[0] -= t
                        b[1].append(int(i))
                        b[2] += t
                        break
                else:
                    bins.append([max_tokens - t, [int(i)], t])
                    if len(bins) > open_bins:
                        done.append(close(bins.pop(0)))
                if len(done) >= 1000:
                    yield pd.DataFrame(done, columns=[f.name for f in schema])
                    done = []
        done.extend(close(b) for b in bins)
        if done:
            yield pd.DataFrame(done, columns=[f.name for f in schema])

    return src.mapInPandas(pack, schema)


# ---------------------------------------------------------------------------
# streaming dedup
# ---------------------------------------------------------------------------

def streaming_exact_dedup(df: DataFrame, text_col: str,
                          ts_col: str = "ts",
                          watermark: str = "10 minutes") -> DataFrame:
    """Exact dedup for a document STREAM: keep the first arrival of each
    normalized-content hash within the watermark horizon
    (``dropDuplicatesWithinWatermark`` — state is bounded by the
    horizon, unlike a global dropDuplicates whose state grows forever).
    In batch mode the same transform degrades to plain content dedup,
    so it stays oracle-checkable."""
    out = df.withColumn("__h", F.xxhash64(normalize_text(F.col(text_col))))
    if out.isStreaming:
        return (out.withWatermark(ts_col, watermark)
                   .dropDuplicatesWithinWatermark(["__h"])
                   .drop("__h"))
    return out.dropDuplicates(["__h"]).drop("__h")


# ---------------------------------------------------------------------------
# document chunking (RAG / context-window preparation)
# ---------------------------------------------------------------------------

def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", size: int = 512,
                    overlap: int = 0, by: str = "chars") -> DataFrame:
    """Split documents into fixed-size chunks with optional overlap —
    the windowing step every RAG / context-length-bounded training
    pipeline needs before embedding or packing.

    ``by='chars'`` windows the raw string; ``by='tokens'`` windows the
    whitespace-token sequence (chunk text rejoined with single spaces).
    Output: one row per chunk with (id_col, chunk_id, chunk_start,
    chunk_text); ``chunk_start`` is the char / token offset.  Documents
    shorter than ``size`` yield exactly one chunk; empty/NULL text
    yields none.

    Scale shape: pure JVM expressions (``sequence`` + ``posexplode`` +
    ``substring``/``slice``) — map-side only, no shuffle, no Python.
    100 TB of documents chunk at full scan speed and downstream
    operators see a narrow (id, chunk) table."""
    if overlap >= size:
        raise ValueError(f"overlap {overlap} must be < size {size}")
    step = size - overlap
    t = F.col(text_col)
    if by == "chars":
        n = F.length(t)
        starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)),
                            F.lit(step))
        out = (df.where(t.isNotNull() & (n > 0))
                 .select(id_col,
                         F.posexplode(starts).alias("chunk_id",
                                                    "chunk_start"),
                         t.alias("__t"))
                 # a start past the end (last seq element when step
                 # overshoots) contributes an empty chunk: drop it
                 .withColumn("chunk_text",
                             F.expr(f"substring(__t, chunk_start + 1, "
                                    f"{size})"))
                 .where(F.length("chunk_text") > 0)
                 .drop("__t"))
        return out
    if by == "tokens":
        toks = F.split(F.trim(t), r"\s+")
        n = F.size(toks)
        starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)),
                            F.lit(step))
        out = (df.where(t.isNotNull() & (F.length(F.trim(t)) > 0))
                 .select(id_col,
                         F.posexplode(starts).alias("chunk_id",
                                                    "chunk_start"),
                         toks.alias("__toks"))
                 .withColumn("chunk_text",
                             F.array_join(
                                 F.slice(F.col("__toks"),
                                         F.col("chunk_start") + 1, size),
                                 " "))
                 .where(F.length("chunk_text") > 0)
                 .drop("__toks"))
        return out
    raise ValueError(f"by must be 'chars' or 'tokens', got {by!r}")


# ---------------------------------------------------------------------------
# end-to-end curation recipe
# ---------------------------------------------------------------------------

def curate_corpus(df: DataFrame, *, text_col: str = "text",
                  id_col: str = "doc_id", strata_col: Optional[str] = None,
                  budget_tokens: Optional[int] = None,
                  minhash_threshold: float = 0.7,
                  minhash_num_perm: int = 32, minhash_bands: int = 8,
                  quality_kwargs: Optional[Dict] = None,
                  weights: Optional[Dict] = None,
                  seed: int = 42) -> Dict[str, DataFrame]:
    """The standard curation pipeline, composed end to end:

        quality filter → exact dedup → MinHash near-dedup →
        token counting → (optional) budgeted training mix

    Returns the named intermediate frames so callers can inspect, fork,
    or persist any stage::

        verdicts   (id, keep, reject_reason)       quality verdict/doc
        kept       input rows that passed quality
        exact      kept minus exact duplicates (min-id representative)
        pairs      (id_a, id_b, sim) near-dup candidate pairs
        curated    exact minus near-duplicates, + token_count
        mix        curated sampled to ``budget_tokens`` (only when set)

    Everything stays lazy — no stage runs until the caller acts on a
    frame.  Shuffle budget at 100 TB: two doc-keyed shuffles (quality),
    one 8-byte-hash shuffle (exact dedup), the banded LSH id-only
    candidate shuffle (near dedup), one broadcast-ish label join, and a
    stratum-count aggregate for the mix — the full text shuffles only
    in the LSH signature pass, never for joins."""
    from .dedup import assign_clusters, exact_dedup, minhash_lsh_pairs
    from .quality import quality_filter
    from .textstats import token_count

    verdicts = quality_filter(df, text_col, id_col,
                              **(quality_kwargs or {}))
    # quality_filter reports under the fixed name "id"
    kept_ids = verdicts.where(F.col("keep")) \
                       .select(F.col("id").alias(id_col))
    kept = df.join(kept_ids, id_col, "leftsemi")
    exact_reps = exact_dedup(kept, text_col, id_col).select(id_col)
    exact = kept.join(exact_reps, id_col, "leftsemi")
    pairs = minhash_lsh_pairs(exact, text_col, id_col,
                              num_perm=minhash_num_perm,
                              bands=minhash_bands,
                              threshold=minhash_threshold)
    labeled = assign_clusters(exact, pairs, id_col=id_col)
    curated = labeled.where(~F.col("is_duplicate")) \
                     .drop("cluster", "is_duplicate") \
                     .withColumn("token_count",
                                 token_count(F.col(text_col)))
    out = {"verdicts": verdicts, "kept": kept, "exact": exact,
           "pairs": pairs, "curated": curated}
    if budget_tokens is not None:
        if strata_col is None:
            raise ValueError("budget_tokens needs strata_col for the mix")
        out["mix"] = sample_to_token_budget(
            curated, "token_count", strata_col, budget_tokens,
            weights=weights, seed=seed)
    return out
