"""Deduplication operators for large-scale training-data pipelines.

Not in the reference (oxigraph has no document processing); required by the
project north star (BASELINE.json) as first-class operators.  All are pure
DataFrame ops designed for the 100 TB shape:

- exact dedup: one shuffle on a 64-bit content hash;
- MinHash+LSH: shingle→minhash→band→bucket-join, so candidate generation
  never compares all pairs — cost is Σ bucket²  instead of n²;
- SimHash: 64-bit fingerprint + banded hamming candidate join;
- n-gram Jaccard: exact set similarity via shingle co-occurrence counts
  (explode + groupBy joins, no cross product).

Determinism: every hash is seeded xxhash64 — stable across runs/cluster
sizes, so results are oracle-checkable.
"""

from __future__ import annotations

import threading as _threading
from collections import deque as _deque
from typing import Deque, List, Optional

from pyspark.sql import Column, DataFrame, Window, functions as F
from ..session import pin


def spread(df: DataFrame) -> DataFrame:
    """Repartition UP to the session's parallelism when the input has too
    few partitions (e.g. one small parquet file): shingling/hashing are
    CPU-bound per row, and a 2-partition input would use 2 of 32 cores.
    A no-op at scale — inputs that already have enough partitions pass
    through unshuffled.

    Sizing uses ``inputFiles()`` (a file-index lookup), NOT
    ``df.rdd.getNumPartitions()``: the latter forces full physical
    planning (toRdd) at plan-BUILD time on every call — measurably ~2 s
    of driver latency per dedup op locally.  File count underestimates
    partitions when files are splittable (one 1 GB parquet → many
    tasks), so the only mis-fire is an extra repartition of an input
    with few-but-huge files — cheap relative to the CPU-bound work this
    feeds, and the at-scale shape (many files) passes through
    untouched.  Non-file inputs (memory relations in tests) report zero
    files and get spread."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        nfiles = len(df.inputFiles())
    except Exception:  # pragma: no cover - non-file-backed exotic plans
        nfiles = 0
    if nfiles < target:
        return df.repartition(target)
    return df


def normalize_text(c: Column) -> Column:
    """Lowercase, collapse whitespace, strip punctuation — the canonical
    form used by all dedup operators."""
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^\p{L}\p{N}\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one representative (min id) per exact normalized text.
    One shuffle on the content hash; the text itself never shuffles."""
    h = F.xxhash64(normalize_text(F.col(text_col)))
    return (df.withColumn("__h", h)
              .groupBy("__h")
              .agg(F.min(F.col(id_col)).alias(id_col),
                   F.count(F.lit(1)).alias("dup_count"))
              .drop("__h"))


def shingles(c: Column, n: int = 3, distinct: bool = True) -> Column:
    """Word n-gram shingle array of the normalized text.

    ``distinct=False`` skips the O(n²) array_distinct — correct whenever
    the consumer is multiset-insensitive (MinHash minima don't change)."""
    words = F.split(normalize_text(c), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    arr = F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, n), " "))
    if distinct:
        arr = F.array_distinct(arr)
    return F.when(F.size(words) >= n, arr) \
            .otherwise(F.array(F.array_join(words, " ")))


def shingle_hashes(c: Column, n: int = 3) -> Column:
    """Word n-gram shingle HASHES without materializing shingle strings:
    hash each word once, then combine consecutive word hashes
    arithmetically (zip_with over shifted copies).  Skips the per-shingle
    array_join + string xxhash64 of :func:`shingles` — the signature
    pipeline only ever needs hashes, never the shingle text.  Long
    overflow wraps (non-ANSI), which is the arithmetic we want; the
    splitmix64 permutation mixes decorrelate the combiner downstream."""
    words = F.split(normalize_text(c), " ")
    hw = F.transform(words, lambda w: F.xxhash64(w))
    size = F.size(hw)
    arr = hw
    for k in range(1, n):
        shifted = F.slice(hw, k + 1, F.greatest(size - k, F.lit(0)))
        # zip_with pads the shorter array with NULLs; the tail NULLs are
        # trimmed by the slice below
        arr = F.zip_with(arr, shifted,
                         lambda a, b: a * F.lit(-7046029254386353131) + b)
    arr = F.slice(arr, 1, F.greatest(size - (n - 1), F.lit(1)))
    return F.when(size >= n, arr) \
            .otherwise(F.array(F.xxhash64(F.array_join(words, " "))))


def _mix(h: Column, i: int) -> Column:
    """splitmix64 finalizer with a per-permutation seed: a full-avalanche
    64-bit permutation (long overflow wraps in non-ANSI mode, which is the
    arithmetic we want).  A weaker mix correlates the per-permutation
    minima and floods LSH with false-positive candidates."""
    def u64(x):
        return x - (1 << 64) if x >= (1 << 63) else x

    z = h.bitwiseXOR(F.lit(u64((0x9E3779B97F4A7C15 * (2 * i + 1)) & ((1 << 64) - 1))))
    z = z.bitwiseXOR(F.shiftrightunsigned(z, 30)) * F.lit(u64(0xBF58476D1CE4E5B9))
    z = z.bitwiseXOR(F.shiftrightunsigned(z, 27)) * F.lit(u64(0x94D049BB133111EB))
    return z.bitwiseXOR(F.shiftrightunsigned(z, 31))


def minhash_signature_from_hashes(hash_col: Column,
                                  num_perm: int = 32) -> Column:
    """MinHash signature from a MATERIALIZED array<long> of shingle
    hashes: per-permutation values are arithmetic mixes — signature cost
    is O(shingles + perms) long ops, not O(shingles × perms) string
    hashes.  Pure expressions, no UDF."""
    def perm(i):
        return lambda h: _mix(h, i)  # one-arg lambda (arity is significant)

    return F.array(*[F.array_min(F.transform(hash_col, perm(i)))
                     for i in range(num_perm)])


def minhash_signature(shingle_col: Column, num_perm: int = 32) -> Column:
    """Convenience wrapper over a shingle-string array (prefer
    materializing the hash array and calling
    :func:`minhash_signature_from_hashes` — this form duplicates the
    string hashing per permutation)."""
    return minhash_signature_from_hashes(
        F.transform(shingle_col, lambda s: F.xxhash64(s)), num_perm)


# Shared-intermediate persist registry for the pair-generation family
# (signature tables, guarded bucket/chunk/anchor indexes — any frame a
# self-join or scorer consumes more than once; exchange reuse shares
# only shuffle files, never the map/sort work above them, so without a
# materialization every extra consumer re-runs the whole derivation —
# guide §2.4 "two operations keyed the same way can share one
# exchange").  A bounded FIFO: each call registers its persisted table
# and evicts the OLDEST entries beyond the cap, so repeated invocations
# in one session hold at most _SIG_CACHE_CAP extra tables instead of
# leaking a MEMORY_AND_DISK entry per call (DataFrame persist is never
# GC-cleaned).  The lock + cap>1 make the cache safe under server.py's
# concurrent queries (round-9): with the old one-slot swap, two
# simultaneous dedup requests would unpersist each other's in-flight
# signature table.  A pairs DataFrame from an evicted call stays
# CORRECT — it just recomputes on next execution.
_SIG_LOCK = _threading.Lock()
_SIG_CACHE: Deque[DataFrame] = _deque()
_SIG_CACHE_CAP = 8


def _persist_sig(sig: DataFrame) -> DataFrame:
    sig.persist()
    with _SIG_LOCK:
        _SIG_CACHE.append(sig)
        evict = []
        while len(_SIG_CACHE) > _SIG_CACHE_CAP:
            evict.append(_SIG_CACHE.popleft())
    for old in evict:
        old.unpersist()
    return sig


def _hot_bucket_keys(buckets: DataFrame, max_bucket: int,
                     frac: float = 0.01, seed: int = 7) -> DataFrame:
    """Approximate (band, bh) keys of DEGENERATE bucket families — the
    round-8 pre-filter for the one residual straggler in the window
    guard below: the exact per-bucket window count is linear and
    spill-capable, but a billion-row identical-text family would still
    land in ONE window task before being dropped.  This estimates
    bucket sizes from a ``frac`` sample (map-side-combinable count of a
    tiny projection), keeps only keys whose estimate is far above the
    cap, and the caller broadcasts them into an anti-join so the family
    never reaches the window at all.

    Conservative by construction: a key qualifies only with
    ``max(8, 5·max_bucket·frac + 1)`` SAMPLED rows, so a bucket that is
    actually under the cap has astronomically small odds of being
    pre-dropped (P[Binom(max_bucket, frac) ≥ 8] ≈ 0 for the default
    cap 64 / frac 1%), while any family big enough to be a straggler
    has thousands of sampled rows.  Buckets between the cap and the
    trigger are still dropped by the exact window — results are
    identical to the window-only guard."""
    min_count = max(8, int(5 * max_bucket * frac) + 1)
    return (buckets.sample(fraction=frac, seed=seed)
            .groupBy("band", "bh").agg(F.count(F.lit(1)).alias("__c"))
            .where(F.col("__c") >= min_count)
            .select("band", "bh"))


def minhash_lsh_pairs(df: DataFrame, text_col: str, id_col: str,
                      num_perm: int = 32, bands: int = 8,
                      threshold: float = 0.5,
                      max_bucket: Optional[int] = None,
                      prefilter_sample: float = 0.01) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH, verified by
    signature-agreement similarity.

    Returns (id_a, id_b, sim) with id_a < id_b and sim >= threshold.
    Scale: docs hash into (band, band_hash) buckets; only same-bucket pairs
    join — the classic LSH trade: recall controlled by (bands, rows/band).

    ``max_bucket`` is the 100 TB skew guard: a band hash shared by N docs
    produces N² candidates, and degenerate content (boilerplate, empty
    pages) creates million-doc buckets that would dominate the entire
    job.  Buckets larger than the cap are dropped BEFORE the self-join
    (standard large-scale MinHash practice; a pair only loses candidacy
    if EVERY band it agrees on is hot, so recall loss is bounded and the
    dropped mass is exactly the near-identical boilerplate a pipeline
    handles by exact dedup anyway).  Default off for exactness at test
    scale."""
    # the signature table is consumed three times (banding + both sides
    # of agreement scoring): persist computes it once — at 100 TB this is
    # the table you keep, with the banded index derived from it.  persist,
    # not localCheckpoint: a lazy checkpoint still runs full physical
    # planning (toRdd) at BUILD time (~2 s of the op's driver latency),
    # while persist defers everything to execution and is spill-safe
    # (MEMORY_AND_DISK)
    sig = _persist_sig(minhash_signatures(df, text_col, id_col, num_perm))
    buckets = _band_buckets(sig, num_perm, bands)
    if max_bucket is not None:
        # window count over the SAME (band, bh) partitioning the
        # self-join needs: one exchange serves the size filter AND the
        # join (a groupBy+semijoin guard costs two extra shuffles of the
        # same 24-byte rows; measured 2x on the sf0.1 headline).  Hot
        # buckets never reach the self-join; the hot partition's window
        # count is linear, not quadratic.  Round-8: DEGENERATE families
        # (which would land in ONE window task before being dropped —
        # a straggler at billion-row scale) are removed first by an
        # approximate sampled count broadcast into an anti-join; the
        # exact window then enforces the precise cap on what remains.
        hot = _hot_bucket_keys(buckets, max_bucket, frac=prefilter_sample)
        buckets = buckets.join(F.broadcast(hot), ["band", "bh"],
                               "left_anti")
        from pyspark.sql import Window
        w = Window.partitionBy("band", "bh")
        buckets = buckets.withColumn("__n", F.count(F.lit(1)).over(w)) \
                         .where(F.col("__n") <= max_bucket).drop("__n")
        # persist the GUARDED index: the self-join consumes it twice,
        # and without a materialization each side re-runs the
        # anti-join + window-sort pass over the banded index (exchange
        # reuse shares only the shuffle files, not the sort/window
        # above them).  24 B/row id-only rows, MEMORY_AND_DISK, same
        # FIFO eviction as the signature table (guide §2.4: one
        # exchange serving both consumers).
        buckets = _persist_sig(buckets)
    # candidate generation shuffles ONLY ids: the bucket self-join and the
    # pair-dedup never carry the 32-element signatures (on hot buckets the
    # wide alternative shuffles sig × bucket² — the round-1 bottleneck);
    # signatures re-join once per side afterwards to score agreement
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bh") == F.col("b.bh"))
                   & (F.col("a.id") < F.col("b.id")))
             .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
             .distinct())
    arrays = _sig_arrays(sig, num_perm)
    return _score_pairs(cand, arrays, arrays, num_perm, threshold)


def minhash_signatures(df: DataFrame, text_col: str, id_col: str,
                       num_perm: int = 32) -> DataFrame:
    """(id, m0..m{n-1}) MinHash signature table — the artifact a corpus
    pipeline persists (parquet) and feeds to
    :func:`minhash_lsh_pairs_incremental` for per-batch dedup.

    Signature via explode + per-permutation MIN aggregates: higher-order
    functions (transform/array_min) evaluate interpreted per element,
    while exploded min-aggs run in whole-stage codegen with map-side
    partial aggregation — ~8x faster and the shape that scales."""
    sh = spread(df).select(F.col(id_col).alias("id"),
                           shingle_hashes(F.col(text_col)).alias("sh"))
    ex = sh.select("id", F.explode("sh").alias("h"))
    return ex.groupBy("id").agg(
        *[F.min(_mix(F.col("h"), i)).alias(f"m{i}") for i in range(num_perm)])


def _band_buckets(sig: DataFrame, num_perm: int, bands: int) -> DataFrame:
    """Signature table → (id, band, bh) LSH bucket index (derived, never
    persisted: 8 projections of the signature row, map-side only).

    The band hash is native ``xxhash64`` over the band's minhash LONG
    columns — NOT over a concatenated decimal string: the string form
    paid rows/band int→string casts + a concat + a string hash per row
    per band (measured 25–30% of the derivation, r10 interleaved noop
    A/B 0.101 → 0.072 s at sf0.1).  Bucketing semantics are unchanged —
    both forms are injective on the minhash tuple up to a 2⁻⁶⁴ hash
    collision, and the full per-band bucket PARTITION of ids was
    verified identical on the sf0.1 corpus before/after.  (Bucket hash
    VALUES differ from the string form; they are derived, never
    persisted, and nothing stores or compares them across versions.)"""
    rows = num_perm // bands
    return sig.select(
        "id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.xxhash64(*[F.col(f"m{b * rows + r}")
                                  for r in range(rows)]).alias("bh"))
            for b in range(bands)])).alias("bucket")) \
        .select("id", "bucket.band", "bucket.bh")


def _sig_arrays(sig: DataFrame, num_perm: int) -> DataFrame:
    return sig.select(
        "id", F.array(*[f"m{i}" for i in range(num_perm)]).alias("sig"))


def _score_pairs(cand: DataFrame, arrays_a: DataFrame, arrays_b: DataFrame,
                 num_perm: int, threshold: float) -> DataFrame:
    """(id_a, id_b) candidates → (id_a, id_b, sim) by signature agreement.

    Both sides join the signature-array table via join CONDITIONS over
    aliased frames instead of per-side column renames, keeping the two
    build subtrees structurally identical.  NOTE (r10, measured): this
    does NOT buy a ReusedExchange at runtime — broadcast-exchange reuse
    never fires when the duplicated subtree bottoms out in an
    InMemoryRelation or LogicalRDD, because those leaves keep their
    re-id'd attributes through canonicalization (verified with minimal
    repros: a plain computed subtree under the same double-join DOES
    reuse, a persisted or localCheckpoint'ed one does not, with AQE on
    or off).  Both builds therefore still run, each reading the
    persisted signature cache — cheap, and the aliased form is kept as
    the cleaner construction."""
    sa, sb = arrays_a.alias("__sa"), arrays_b.alias("__sb")
    cand = (cand
            .join(sa, F.col("id_a") == F.col("__sa.id"))
            .join(sb, F.col("id_b") == F.col("__sb.id")))
    agree = F.size(F.filter(
        F.zip_with(F.col("__sa.sig"), F.col("__sb.sig"),
                   lambda x, y: x == y),
        lambda v: v))
    sim = agree.cast("double") / F.lit(float(num_perm))
    return (cand.withColumn("sim", sim)
                .where(F.col("sim") >= threshold)
                .select("id_a", "id_b", "sim"))


def minhash_lsh_pairs_incremental(
        new_df: DataFrame, corpus_sig: DataFrame, text_col: str,
        id_col: str, num_perm: int = 32, bands: int = 8,
        threshold: float = 0.5,
        max_bucket: Optional[int] = None) -> DataFrame:
    """Near-dup pairs for a NEW document batch against an EXISTING corpus
    — the production ingest shape: the corpus is represented ONLY by its
    persisted :func:`minhash_signatures` table, its text is never read.

    Returns (id_a, id_b, sim) where ``id_a`` is always a new-batch id and
    ``id_b`` is a corpus id (new-vs-corpus) or a larger new-batch id
    (within-batch, ``id_a < id_b``).  Per-batch cost is O(batch) plus the
    corpus bucket rows that actually collide: the corpus side is an
    8-projection map of its signature table joined on (band, bh) — with a
    small batch AQE turns this into a broadcast join and the corpus is
    never shuffled.  ``max_bucket`` caps candidates per corpus bucket
    (same skew guard as :func:`minhash_lsh_pairs`)."""
    nsig = _persist_sig(minhash_signatures(new_df, text_col, id_col,
                                           num_perm))
    nb = _band_buckets(nsig, num_perm, bands)
    cb = _band_buckets(corpus_sig, num_perm, bands)
    if max_bucket is not None:
        sizes = cb.groupBy("band", "bh") \
                  .agg(F.count(F.lit(1)).alias("__n")) \
                  .where(F.col("__n") <= max_bucket)
        cb = cb.join(sizes.select("band", "bh"), ["band", "bh"], "leftsemi")
    a, b = nb.alias("a"), cb.alias("b")
    vs_corpus = (a.join(b, (F.col("a.band") == F.col("b.band"))
                        & (F.col("a.bh") == F.col("b.bh"))
                        & (F.col("a.id") != F.col("b.id")))
                 .select(F.col("a.id").alias("id_a"),
                         F.col("b.id").alias("id_b"))
                 .distinct())
    n2 = nb.alias("b")
    within = (a.join(n2, (F.col("a.band") == F.col("b.band"))
                     & (F.col("a.bh") == F.col("b.bh"))
                     & (F.col("a.id") < F.col("b.id")))
              .select(F.col("a.id").alias("id_a"),
                      F.col("b.id").alias("id_b"))
              .distinct())
    cand = vs_corpus.unionByName(within).distinct()
    new_arr = _sig_arrays(nsig, num_perm)
    # on id collision (re-ingest with changed text) the NEW batch's
    # signature wins deterministically: anti-join the corpus side against
    # new ids instead of dropDuplicates over the union, whose pick is
    # arbitrary and made reported sims nondeterministic
    corpus_arr = _sig_arrays(corpus_sig, num_perm) \
        .join(new_arr.select("id"), "id", "leftanti")
    all_arr = new_arr.unionByName(corpus_arr)
    return _score_pairs(cand, new_arr, all_arr, num_perm, threshold)


def _simhash_from_hashes(hashes: Column, bits: int = 64) -> Column:
    """SimHash from a materialized token-hash array column.

    Single traversal: one ``aggregate`` over the hash array carrying a
    ``bits``-wide counter array (per-bit signed counts via ``zip_with``),
    then one fold of the counters into the fingerprint.  Bit-exact with
    the naive per-bit formulation (sign of per-bit weighted sums), but
    one pass over the array instead of ``bits`` chained ``aggregate``
    calls — 64× fewer array traversals per row and a Catalyst tree small
    enough to compile in milliseconds (r9: the old tree dominated the
    entry's cold compile at ~12 s and tripled warm execution)."""
    # one py4j call + one pre-folded Literal for the whole mask array
    # (see simsearch._lit_vec) — this array appears in BOTH folds below,
    # so the element-wise F.array(F.lit...) form cost 2×bits driver
    # round-trips per plan build; values are identical int64s
    import numpy as np
    masks = F.lit(np.asarray([(1 << i) if i < 63 else -(2 ** 63)
                              for i in range(bits)], dtype=np.int64))
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc, masks,
            lambda c, m: c + F.when(h.bitwiseAND(m) != 0,
                                    F.lit(1)).otherwise(F.lit(-1))))
    return F.aggregate(
        F.zip_with(counts, masks,
                   lambda c, m: F.when(c > 0, m).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"), lambda a, x: a + x)


def simhash(text: Column, bits: int = 64) -> Column:
    """64-bit SimHash: sign of per-bit weighted sums over token hashes.
    NB: prefer :func:`simhash_pairs`, which materializes the token hashes
    once — inline use recomputes the tokenize pipeline per bit."""
    words = F.split(normalize_text(text), " ")
    return _simhash_from_hashes(F.transform(words, lambda w: F.xxhash64(w)),
                                bits)


def simhash_pairs(df: DataFrame, text_col: str, id_col: str,
                  max_hamming: int = 8,
                  max_bucket: Optional[int] = None) -> DataFrame:
    """Near-dup pairs by SimHash banding: fingerprints split into 4
    16-bit chunks; pairs agreeing on ≥1 chunk are candidates (guaranteed
    to include all pairs with hamming ≤ 3 chunks' worth of differences).

    ``max_bucket`` is the 100 TB skew guard (same shape as
    :func:`minhash_lsh_pairs`): 16-bit chunks give only 65k buckets per
    band, so a web-scale corpus averages N/65k docs per bucket and a
    degenerate chunk value (all-identical boilerplate hashes to one
    bucket) makes N² candidate rows on one key.  Chunk buckets larger
    than the cap are dropped BEFORE the self-join; a pair survives if
    ANY of its agreeing chunks is cold, so recall loss is confined to
    pairs whose every agreeing chunk is boilerplate-hot.  Default off
    for exactness at test scale."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    hashed = spread(df).select(F.col(id_col).alias("id"),
                               F.transform(words, lambda w: F.xxhash64(w)).alias("h"))
    fp = hashed.select("id", _simhash_from_hashes(F.col("h")).alias("fp"))
    chunks = fp.select("id", "fp", F.explode(F.array(*[
        F.struct(F.lit(i).alias("chunk"),
                 F.shiftrightunsigned("fp", i * 16).bitwiseAND(F.lit(0xFFFF))
                 .alias("ch"))
        for i in range(4)])).alias("c")).select("id", "fp", "c.chunk", "c.ch")
    if max_bucket is not None:
        # window count over the self-join's own (chunk, ch) partitioning
        # (same one-exchange guard as minhash_lsh_pairs)
        from pyspark.sql import Window
        w = Window.partitionBy("chunk", "ch")
        chunks = chunks.withColumn("__n", F.count(F.lit(1)).over(w)) \
                       .where(F.col("__n") <= max_bucket).drop("__n")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
                   & (F.col("a.ch") == F.col("b.ch"))
                   & (F.col("a.id") < F.col("b.id")))
             .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                     F.col("a.fp").alias("fp_a"), F.col("b.fp").alias("fp_b"))
             .distinct())
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (cand.withColumn("hamming", ham)
                .where(F.col("hamming") <= max_hamming)
                .select("id_a", "id_b", "hamming"))


_NGRAM_CAP_WARNED = False


def ngram_jaccard_pairs(df: DataFrame, text_col: str, id_col: str,
                        n: int = 3, threshold: float = 0.5,
                        max_doc_freq: Optional[int] = 1000) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (id_a < id_b, sim >= threshold).

    No cross product: explode shingles, count co-occurrences per pair via a
    groupBy on the shingle (inverted index), then jaccard from set sizes.

    ``max_doc_freq`` is the 100 TB skew guard — ON BY DEFAULT (1000;
    VERDICT r6 item 5: unguarded all-pairs is a foot-gun at scale — a
    shingle shared by N docs, e.g. a boilerplate header or empty-page
    artifact, contributes N² rows on ONE join key before the pair
    groupBy).  Shingles with document frequency above the cap are
    dropped from the inverted index BEFORE the self-join — one
    map-side-combinable count per shingle.  Set sizes stay exact
    (computed pre-filter), so the UNDERCOUNT BOUND is: each reported
    ``sim`` is missing at most the capped shingles from its
    intersection (never its union), and a pair is found iff it shares
    at least one sub-cap shingle — docs made entirely of >cap
    boilerplate are exactly what exact-dedup already collapses.  Pass
    ``max_doc_freq=None`` to opt out for oracle-exact use on bounded
    corpora (the correctness-gate entry does)."""
    sh = (spread(df).select(F.col(id_col).alias("id"),
                            F.explode(shingles(F.col(text_col), n)).alias("sh")))
    # NOT persisted, deliberately (r9 measured): the exploded shingle
    # index is consumed by both self-join sides plus the size/freq aggs,
    # but re-deriving it is cheap map-side codegen while a
    # MEMORY_AND_DISK materialization costs a cache write + columnar
    # round-trip per consumer — measured 23.0 s -> 29.9 s at sf0.1 with
    # the persist.  Contrast minhash_lsh_pairs, whose duplicated
    # subtree contains a Window+Exchange and DOES win from persisting.
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    if max_doc_freq is not None:
        # shingles() emits per-doc DISTINCT shingles, so count == doc freq
        freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("__df"))
        # Check-and-warn is FIRST CALL ONLY per process (the probe is an
        # extra pass over the shingle index — too costly to repeat at
        # 100 TB); subsequent calls rely on the documented undercount
        # bound below.
        global _NGRAM_CAP_WARNED
        if not _NGRAM_CAP_WARNED:
            _NGRAM_CAP_WARNED = True
            hot = freq.where(F.col("__df") > max_doc_freq).take(1)
            if hot:
                import warnings
                warnings.warn(
                    f"ngram_jaccard_pairs: shingle(s) with doc_freq > "
                    f"{max_doc_freq} dropped from the inverted index "
                    f"(e.g. {hot[0]['sh']!r} in {hot[0]['__df']} docs); "
                    "reported sims may undercount on corpora with "
                    "legitimately common shingles — pass "
                    "max_doc_freq=None for exact results on bounded "
                    "data (warned on first call only)",
                    stacklevel=2)
        sh = sh.join(freq.where(F.col("__df") <= max_doc_freq)
                     .select("sh"), "sh", "leftsemi")
    a, b = sh.alias("a"), sh.alias("b")
    inter = (a.join(b, (F.col("a.sh") == F.col("b.sh"))
                    & (F.col("a.id") < F.col("b.id")))
              .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
              .agg(F.count(F.lit(1)).alias("inter")))
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    out = (inter.join(sa, "id_a").join(sb, "id_b")
           .withColumn("sim", F.col("inter").cast("double")
                       / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
           .where(F.col("sim") >= threshold)
           .select("id_a", "id_b", "sim"))
    return out


def embedding_cosine_pairs(df: DataFrame, vec_col: str, id_col: str,
                           threshold: float = 0.95,
                           planes: int = 12,
                           max_bucket: Optional[int] = None) -> DataFrame:
    """Embedding near-duplicate pairs: random-hyperplane LSH buckets, then
    exact cosine inside buckets.  Hyperplanes are derived from seeded
    hashes of the dimension index — deterministic, no fitted model.

    ``max_bucket`` caps in-bucket pair fan-out (same skew guard as
    :func:`minhash_lsh_pairs`): ``planes=12`` gives 4096 buckets, which
    is ample until the corpus is huge or the embeddings cluster (near-
    identical model outputs land in one bucket).  Over-cap buckets are
    dropped before the self-join; their mass is the near-identical
    cluster a pipeline should route through exact/MinHash dedup first.
    Default off for exactness at test scale."""
    from .simsearch import dot, norm, plane_sums
    # one traversal for all plane projections (see plane_sums) — the
    # per-plane aggregate loop this replaces did `planes` full array
    # passes per row
    bucket = F.array_join(
        F.transform(plane_sums(F.col(vec_col), planes),
                    lambda s: F.when(s > 0, F.lit("1")).otherwise(F.lit("0"))),
        "")
    emb = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                    bucket.alias("bkt"))
    if max_bucket is not None:
        # window count over the self-join's own bkt partitioning (same
        # one-exchange guard as minhash_lsh_pairs); rows carry the
        # vector, but they shuffle to the join on bkt anyway
        from pyspark.sql import Window
        w = Window.partitionBy("bkt")
        emb = emb.withColumn("__n", F.count(F.lit(1)).over(w)) \
                 .where(F.col("__n") <= max_bucket).drop("__n")
    # per-row norm BEFORE the self-join: a row in k candidate pairs
    # otherwise re-traverses its vector k times just for the norm
    # (bit-exact — same values, same multiply order as cosine(); r9 §4)
    emb = emb.withColumn("__nv", norm(F.col("v")))
    a, b = emb.alias("a"), emb.alias("b")
    cand = a.join(b, (F.col("a.bkt") == F.col("b.bkt"))
                  & (F.col("a.id") < F.col("b.id")))
    sim = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.__nv") * F.col("b.__nv"))
    return (cand.select(F.col("a.id").alias("id_a"),
                        F.col("b.id").alias("id_b"), sim.alias("sim"))
                .where(F.col("sim") >= threshold))


def semantic_dedup(df: DataFrame, vec_col: str, id_col: str,
                   n_clusters: int = 16, threshold: float = 0.95,
                   iters: int = 2, seed: int = 0,
                   max_cluster: Optional[int] = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means the
    embedding space, call pairs within a cluster duplicates when their
    cosine exceeds ``threshold``, and KEEP one representative per
    duplicate group — the member LEAST similar to its centroid (the
    paper's diversity-preserving choice; ties break on min id).

    → ``(id, cid, group, ccos, keep)``: ``cid`` = k-means cluster,
    ``group`` = duplicate-group id (min member id; singleton groups are
    the id itself), ``keep`` = the representative flag.

    Spark shape: pair generation is per-k-means-cluster, so the volume
    is Σ cluster² of the SEMANTIC clusters — k is the fan-out knob the
    paper also uses (they run k=50k on LAION).  ``max_cluster`` is the
    hot-cluster cap (same skew guard as every other dedup family:
    over-cap clusters are excluded from pairing and kept whole — route
    such near-identical mass through exact/MinHash dedup first).
    Duplicate groups come from the shared min-label-propagation
    :func:`dedup_clusters` (ids only ever shuffle)."""
    from .simsearch import dot, kmeans_clusters, norm
    km = kmeans_clusters(df, vec_col, id_col, k=n_clusters, iters=iters,
                         seed=seed).transform(pin)
    emb = km
    if max_cluster is not None:
        cold = (km.select("id", "cid").groupBy("cid")
                  .agg(F.count(F.lit(1)).alias("__n"))
                  .where(F.col("__n") <= max_cluster))
        emb = km.join(cold.select("cid"), "cid", "leftsemi")
    # per-row norm before the self-join (r9 §4, same as embedding_dedup)
    emb = emb.withColumn("__nv", norm(F.col("vec")))
    a, b = emb.alias("a"), emb.alias("b")
    pairs = (a.join(b, (F.col("a.cid") == F.col("b.cid"))
                    & (F.col("a.id") < F.col("b.id")))
              .select(F.col("a.id").alias("id_a"),
                      F.col("b.id").alias("id_b"),
                      (dot(F.col("a.vec"), F.col("b.vec"))
                       / (F.col("a.__nv") * F.col("b.__nv"))).alias("sim"))
              .where(F.col("sim") >= threshold))
    grouped = dedup_clusters(pairs)  # (id, cluster) for paired ids only
    out = (km.join(grouped.withColumnRenamed("cluster", "group"),
                   "id", "left")
             .withColumn("group", F.coalesce(F.col("group"), F.col("id"))))
    # representative: least centroid-similar member of each group
    w = Window.partitionBy("group").orderBy(F.col("ccos").asc(),
                                            F.col("id").asc())
    return (out.withColumn("__rk", F.row_number().over(w))
               .select("id", "cid", "group", "ccos",
                       (F.col("__rk") == 1).alias("keep")))


# ---------------------------------------------------------------------------
# pair → cluster: connected components over the near-dup pair graph
# ---------------------------------------------------------------------------

CC_MAX_ROUNDS = 32


def dedup_clusters(pairs: DataFrame, left_col: str = "id_a",
                   right_col: str = "id_b") -> DataFrame:
    """Near-dup pairs → ``(id, cluster)``: connected components, with the
    component's MINIMUM member id as the cluster id (deterministic, so
    oracle-checkable).

    Min-label propagation with the same one-job-per-round idiom as the
    property-path fixpoint (operators/paths.py): per round one shuffle
    join + one aggregate, the convergence count doubles as the action
    that materializes the lazy checkpoint.  LSH candidate components are
    near-cliques (every member shares a band bucket with most others),
    so label propagation converges in 2–4 rounds — no need for the
    log(n) large-star/small-star dance at this diameter.  Only ids
    (8 bytes) ever shuffle; never text or signatures.
    """
    sym = (pairs.select(F.col(left_col).alias("src"),
                        F.col(right_col).alias("dst"))
           .unionByName(pairs.select(F.col(right_col).alias("src"),
                                     F.col(left_col).alias("dst")))
           .distinct().transform(pin))
    # initial label: min(self, neighbors)
    labels = (sym.groupBy("src").agg(F.min("dst").alias("m"))
              .select(F.col("src").alias("id"),
                      F.least(F.col("src"), F.col("m")).alias("cluster"))
              .transform(pin))
    for _ in range(CC_MAX_ROUNDS):
        nbr = (sym.join(labels, sym["dst"] == labels["id"])
               .select(sym["src"].alias("id"), F.col("cluster")))
        new = (nbr.unionByName(labels)
               .groupBy("id").agg(F.min("cluster").alias("cluster"))
               .transform(pin))
        changed = (new.join(labels.select(F.col("id").alias("oid"),
                                          F.col("cluster").alias("old")),
                            new["id"] == F.col("oid"))
                   .where(F.col("cluster") < F.col("old")).count())
        labels = new
        if changed == 0:
            return labels
    raise RuntimeError(
        f"dedup clustering did not converge in {CC_MAX_ROUNDS} rounds; "
        "the pair graph has a path of that diameter — raise "
        "pipeline.dedup.CC_MAX_ROUNDS")


def assign_clusters(df: DataFrame, pairs: DataFrame, id_col: str = "id",
                    left_col: str = "id_a",
                    right_col: str = "id_b") -> DataFrame:
    """Attach ``cluster`` + ``is_duplicate`` to every document: docs in no
    pair form singleton clusters (cluster = own id, not a duplicate);
    within a component only the min-id representative is kept.

    The labels table holds only ids that appear in some near-dup pair —
    usually small relative to the corpus, in which case AQE broadcasts
    the join and the corpus never shuffles.  No broadcast HINT on
    purpose: at a high duplicate rate the label table is itself huge,
    and forcing a broadcast would OOM the driver — AQE picks per run."""
    labels = dedup_clusters(pairs, left_col, right_col) \
        .withColumnRenamed("id", "__cid")
    out = df.join(labels, df[id_col] == F.col("__cid"), "left").drop("__cid")
    cluster = F.coalesce(F.col("cluster"), df[id_col])
    return (out.withColumn("cluster", cluster)
               .withColumn("is_duplicate", df[id_col] != cluster))
