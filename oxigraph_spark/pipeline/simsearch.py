"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (one broadcast of the query
vector, one pass, TakeOrdered — no shuffle of the corpus).  The scale path
is bucketed ANN, two families:

- **IVF** (inverted file, the recommended top-k default): measured on
  the sf0.1 embeddings grid (tools/ann_recall.py) recall@10 = 0.96 at
  6.7 % of the corpus scanned with ``nprobe=1``, 0.98 at 12.9 % with
  the default ``nprobe=2``.
- **LSH** sign-of-projection buckets: measured recall-LIMITED for
  top-k search on the same grid (0.40 recall at 8 planes / multiprobe
  2; 0.66 at 4 planes / mp 2 costing 46 % of the corpus) — random
  hyperplanes fragment true neighbors.  Keep it for the DEDUP family
  (near-duplicates are near-identical vectors, where bucket collision
  is reliable); use IVF for similarity search.

All vector math is JVM-side (`F.zip_with`/`F.aggregate`) — no UDFs.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _lit_vec(vec) -> Column:
    """Literal array<double> column built with ONE py4j call and ONE
    Catalyst node.

    ``F.array(*[F.lit(float(x)) for x in vec])`` costs one driver RPC
    per element (64-dim query vector = 65 round-trips, ~40 ms of
    plan-build latency per call site; a 16-centroid scored array pays
    16×) and a ``CreateArray`` tree the optimizer only collapses to a
    Literal at constant-folding time.  ``F.lit(ndarray)`` goes through
    py4j's array converter → ``Literal.create`` — a single pre-folded
    array literal with bit-identical float64 values (verified by repr
    compare on every element class incl. -0.0; r10)."""
    import numpy as np
    return F.lit(np.asarray([float(x) for x in vec], dtype=np.float64))


def _lit_norm(vec) -> float:
    """Driver-side L2 norm of a literal vector, summing LEFT TO RIGHT so
    the result is bit-identical to the :func:`norm` column expression's
    sequential ``aggregate`` fold (do NOT replace with ``math.fsum`` —
    its compensated sum can differ in the last ulp)."""
    import math
    s = 0.0
    for x in vec:
        s += float(x) * float(x)
    return math.sqrt(s)


def brute_force_topk(df: DataFrame, vec_col: str, id_col: str,
                     query: Sequence[float], k: int = 10) -> DataFrame:
    """Exact cosine top-k for one query vector.

    The query rides along as a literal array (broadcast by Catalyst);
    ORDER BY + LIMIT fuses to TakeOrderedAndProject, so nothing but the
    top-k per partition ever reaches the driver.
    """
    qcol = _lit_vec(query)
    # query norm folded driver-side (lambda expressions are not foldable,
    # so norm(qcol) would re-traverse the literal per row); bit-exact
    # with cosine() — see _lit_norm
    v = F.col(vec_col).cast("array<double>")
    out = df.select(F.col(id_col).alias("id"),
                    (dot(v, qcol) / (norm(v) * F.lit(_lit_norm(query))))
                    .alias("sim"))
    return out.orderBy(F.col("sim").desc(), F.col("id")).limit(k)


def plane_sums(vec: Column, planes: int) -> Column:
    """``planes``-wide array of hyperplane projection sums in ONE
    traversal of the vector (hyperplane weights derive from seeded
    hashes of the dimension index — deterministic, no fitted model).

    Bit-exact with the per-plane formulation (each plane's accumulator
    sees the same elements in the same order), but one array pass per
    row instead of ``planes`` chained ``aggregate`` calls — the same
    rewrite that cut the SimHash fingerprint 64-fold (r9, guide §4)."""
    pseq = F.sequence(F.lit(0), F.lit(planes - 1))
    elems = F.zip_with(vec, F.sequence(F.lit(0), F.size(vec) - 1),
                       lambda v, i: F.struct(v.alias("v"), i.alias("i")))
    return F.aggregate(
        elems, F.array_repeat(F.lit(0.0), planes),
        lambda acc, e: F.zip_with(
            acc, pseq,
            lambda a, p: a + e["v"]
            * ((F.xxhash64(e["i"].cast("string"), p) % 1000)
               .cast("double") / 500.0 - 1.0)))


def _bucket(vec: Column, planes: int) -> Column:
    """Deterministic sign-of-projection LSH bucket id."""
    return F.array_join(
        F.transform(plane_sums(vec, planes),
                    lambda s: F.when(s > 0, F.lit("1")).otherwise(F.lit("0"))),
        "")


def lsh_index(df: DataFrame, vec_col: str, id_col: str,
              planes: int = 8) -> DataFrame:
    """Materializable ANN index: (bucket, id, vec).  At 100 TB this is the
    table you write partitioned by bucket — a probe prunes to one
    partition (plus multi-probe neighbors)."""
    v = F.col(vec_col).cast("array<double>")
    return df.select(_bucket(v, planes).alias("bucket"),
                     F.col(id_col).alias("id"), v.alias("vec"))


def ivf_index(df: DataFrame, vec_col: str, id_col: str,
              n_centroids: int = 16) -> DataFrame:
    """IVF (inverted-file) ANN index: (centroid_id, id, vec).

    Centroids are a DETERMINISTIC seeded sample of the corpus (the
    ``n_centroids`` vectors with smallest ``xxhash64(id)`` — no fitted
    k-means model, so the index is reproducible and oracle-checkable);
    every vector is assigned to its maximum-cosine centroid.  At 100 TB
    this is the table you write partitioned by ``centroid_id``: a probe
    reads ``nprobe`` partitions instead of the corpus.  The centroid set
    itself is tiny and broadcast as literals (one bounded driver
    collect, like DESCRIBE targets)."""
    v = F.col(vec_col).cast("array<double>")
    base = df.select(F.col(id_col).alias("id"), v.alias("vec"))
    cents = (base.withColumn("__h", F.xxhash64(F.col("id").cast("string")))
                 .orderBy("__h", "id").limit(n_centroids)
                 .select("id", "vec").collect())
    # hoist norm(vec) out of the per-centroid cosines (higher-order
    # functions evaluate interpreted — no codegen CSE — so the inline
    # cosine re-traversed the vector once PER CENTROID just for the row
    # norm), and fold norm(centroid) driver-side (lambda expressions are
    # never foldable, so Catalyst kept re-evaluating the literal-array
    # norm per row).  _lit_norm sums left-to-right exactly like the
    # aggregate() fold, so every score is bit-identical (r9, guide §4:
    # interleaved A/B 0.583 -> 0.414 s at sf0.1, 0 assignment changes).
    scored = F.array(*[
        F.struct((dot(F.col("vec"), _lit_vec(c["vec"]))
                  / (F.col("__nv") * F.lit(_lit_norm(c["vec"]))))
                 .alias("s"),
                 F.lit(int(c["id"])).alias("cid"))
        for c in cents])
    best = F.array_max(scored)  # struct compare: max by score, then cid
    return base.withColumn("__nv", norm(F.col("vec"))) \
               .select(best["cid"].alias("centroid_id"), "id", "vec")


def _centroid_order(query, cents) -> List[int]:
    import math
    qn = math.sqrt(sum(x * x for x in query)) or 1.0

    def cos(c):
        vn = math.sqrt(sum(x * x for x in c["vec"])) or 1.0
        return sum(a * b for a, b in zip(query, c["vec"])) / (qn * vn)

    return [int(c["id"]) for c in sorted(cents, key=cos, reverse=True)]


def ivf_topk(index: DataFrame, query: Sequence[float], k: int = 10,
             nprobe: int = 2, centroids: "Optional[DataFrame]" = None) -> DataFrame:
    """IVF probe: rank centroids by query cosine (driver-side — the
    centroid set is tiny), brute-force only the ``nprobe`` best inverted
    lists.  ``centroids`` defaults to re-deriving distinct centroid rows
    from the index."""
    qcol = _lit_vec(query)
    # dedup over (id, vec), not id alone: vec is functionally determined
    # by the vector id, and a key-only dedup would put the array in a
    # first(array) buffer HashAggregate cannot hold, forcing the whole
    # centroid derivation onto the Sort+SortAggregate path (r9, guide §5)
    cent_rows = (centroids if centroids is not None
                 else index.select(F.col("centroid_id").alias("id"))
                           .distinct()
                           .join(index.select("id", "vec"), "id")
                           .dropDuplicates()).collect()
    probe = set(_centroid_order(query, cent_rows)[:nprobe])
    cand = index.where(F.col("centroid_id").isin(*sorted(probe)))
    # driver-side folded query norm — bit-exact with cosine(), see
    # _lit_norm / brute_force_topk
    out = cand.select("id", (dot(F.col("vec"), qcol)
                             / (norm(F.col("vec")) * F.lit(_lit_norm(query))))
              .alias("sim"))
    return out.orderBy(F.col("sim").desc(), F.col("id")).limit(k)


def _assign(base: DataFrame, cents: List[Sequence[float]]) -> DataFrame:
    """(id, vec) + centroid list → (id, vec, cid, ccos) by max cosine.
    Centroids ride as literal arrays (Catalyst folds them into the task
    binary — no join, no shuffle; bounded by len(cents), same contract
    as :func:`ivf_index`'s centroid literals)."""
    # same norm(vec) hoist + driver-side centroid-norm fold as ivf_index
    # (bit-exact — identical ops in identical order, see _lit_norm)
    scored = F.array(*[
        F.struct((dot(F.col("vec"), _lit_vec(c))
                  / (F.col("__nv") * F.lit(_lit_norm(c))))
                 .alias("s"), F.lit(i).alias("cid"))
        for i, c in enumerate(cents)])
    best = F.array_max(scored)
    return base.withColumn("__nv", norm(F.col("vec"))) \
               .select("id", "vec", best["cid"].alias("cid"),
                       best["s"].alias("ccos"))


def kmeans_clusters(df: DataFrame, vec_col: str, id_col: str, k: int = 16,
                    iters: int = 2, seed: int = 0) -> DataFrame:
    """Distributed spherical k-means (Lloyd iterations under cosine):
    → ``(id, vec, cid, ccos)`` where ``ccos`` is the member's cosine to
    its final centroid.  Topic/domain bucketing for training-mix
    construction and the clustering stage of SemDeDup.

    Spark shape: initialization is the deterministic seeded sample used
    by :func:`ivf_index` (smallest ``xxhash64(id, seed)`` — reproducible,
    no fitted-model state).  Each iteration is ONE map-side assignment
    (centroid literals, no shuffle) plus ONE aggregation: centroid
    recomputation explodes vectors to ``(cid, pos, val)`` and means
    per (cid, pos) — k·d rows cross the driver per round, never vectors
    per row.  ``k`` is bounded by what fits in a task binary as literals
    (~10³); beyond that, shard the corpus by a coarse hash first."""
    v = F.col(vec_col).cast("array<double>")
    base = df.select(F.col(id_col).alias("id"), v.alias("vec"))
    cents = [c["vec"] for c in
             base.withColumn("__h", F.xxhash64(F.col("id").cast("string"),
                                               F.lit(seed)))
                 .orderBy("__h", "id").limit(k).select("vec").collect()]
    if not cents:
        raise ValueError("kmeans_clusters: empty input")
    for _ in range(max(0, iters)):
        assigned = _assign(base, cents)
        rows = (assigned
                .select("cid", F.posexplode("vec").alias("pos", "val"))
                .groupBy("cid", "pos").agg(F.avg("val").alias("m"))
                .collect())
        by_cid: dict = {}
        for r in rows:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = r["m"]
        cents = [
            [by_cid[i][p] for p in range(len(cents[i]))]
            if i in by_cid else cents[i]        # empty cluster: keep old
            for i in range(len(cents))]
    return _assign(base, cents)


def l2_normalize(df: DataFrame, vec_col: str) -> DataFrame:
    """Unit-normalize the embedding column in place (after this, dot
    product IS cosine — one multiply-add per dimension instead of three
    aggregates per pair downstream).  Zero vectors pass through as
    zeros.  Pure mapper."""
    v = F.col(vec_col).cast("array<double>")
    n = norm(v)
    unit = F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v)
    return df.withColumn(vec_col, unit)


def quantize_int8(df: DataFrame, vec_col: str,
                  out_col: str = "vec_q8",
                  scale_col: str = "vec_scale") -> DataFrame:
    """Symmetric int8 quantization: per-vector scale = max|x|/127 →
    ``out_col array<tinyint>`` + ``scale_col double``.  4× smaller
    shuffle/storage footprint for ANN candidate stages; dequantize with
    :func:`dequantize_int8`.  Pure mapper, no UDFs."""
    v = F.col(vec_col).cast("array<double>")
    amax = F.aggregate(F.transform(v, lambda x: F.abs(x)), F.lit(0.0),
                       lambda a, x: F.greatest(a, x))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    q = F.transform(v, lambda x: F.round(x / scale).cast("tinyint"))
    return df.withColumn(out_col, q).withColumn(scale_col, scale)


def dequantize_int8(df: DataFrame, q_col: str = "vec_q8",
                    scale_col: str = "vec_scale",
                    out_col: str = "vec") -> DataFrame:
    s = F.col(scale_col)
    return df.withColumn(
        out_col, F.transform(F.col(q_col), lambda x: x.cast("double") * s))


def knn_join(df: DataFrame, vec_col: str, id_col: str, k: int = 5,
             planes: int = 6,
             max_bucket: Optional[int] = None) -> DataFrame:
    """Approximate k-nearest-neighbors SELF-join: for every document,
    its top-``k`` most cosine-similar neighbors among documents sharing
    its LSH bucket → ``(id, nbr, sim, rk)``.

    The all-pairs version of :func:`lsh_topk` (one query vs corpus →
    every row vs corpus).  Candidates are generated per bucket, so the
    pair volume is Σ bucket² — never n²; fewer ``planes`` ⇒ bigger
    buckets ⇒ higher recall and cost (the recall knob).  ``max_bucket``
    is the standard hot-bucket skew cap (embedding clusters: a bucket
    holding a fraction f of the corpus contributes (f·n)² pairs).
    The per-id top-k is a window over the candidate pairs — keyed by
    doc id, no global sort."""
    idx = lsh_index(df, vec_col, id_col, planes)
    if max_bucket is not None:
        sizes = idx.groupBy("bucket") \
                   .agg(F.count(F.lit(1)).alias("__n")) \
                   .where(F.col("__n") <= max_bucket)
        idx = idx.join(sizes.select("bucket"), "bucket", "leftsemi")
    # per-row norm before the self-join: a row in k candidate pairs
    # otherwise re-traverses its vector k times (bit-exact; r9 §4)
    idx = idx.withColumn("__nv", norm(F.col("vec")))
    a, b = idx.alias("a"), idx.alias("b")
    cand = (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.id") != F.col("b.id")))
             .select(F.col("a.id").alias("id"),
                     F.col("b.id").alias("nbr"),
                     (dot(F.col("a.vec"), F.col("b.vec"))
                      / (F.col("a.__nv") * F.col("b.__nv"))).alias("sim")))
    w = Window.partitionBy("id").orderBy(F.col("sim").desc(), F.col("nbr"))
    return (cand.withColumn("rk", F.row_number().over(w))
                .where(F.col("rk") <= k))


def lsh_topk(index: DataFrame, query: Sequence[float], k: int = 10,
             planes: int = 8, multiprobe: int = 1) -> DataFrame:
    """ANN top-k: search the query's bucket plus all buckets within
    ``multiprobe`` bit flips (recall/latency knob)."""
    import itertools
    qcol = _lit_vec(query)
    # exact replication of xxhash64 driver-side is not practical — derive
    # the query's bucket with a 1-row Spark job instead (cheap, one probe).
    spark = index.sparkSession
    qrow = spark.range(1).select(_bucket(qcol, planes).alias("b")).first()
    qbucket = qrow["b"]
    buckets = {qbucket}
    if multiprobe > 0:
        for flips in itertools.combinations(range(planes), multiprobe):
            b = list(qbucket)
            for f in flips:
                b[f] = "1" if b[f] == "0" else "0"
            buckets.add("".join(b))
    cand = index.where(F.col("bucket").isin(*sorted(buckets)))
    # driver-side folded query norm (bit-exact; see _lit_norm)
    out = cand.select("id", (dot(F.col("vec"), qcol)
                             / (norm(F.col("vec")) * F.lit(_lit_norm(query))))
              .alias("sim"))
    return out.orderBy(F.col("sim").desc(), F.col("id")).limit(k)
