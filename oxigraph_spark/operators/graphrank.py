"""Graph analytics over edge frames: PageRank, degree statistics, and an
adapter from the RDF graph.

Not in the reference engine — this is the "beyond the reference" curation
surface: link-graph authority scores are a standard web-scale quality
signal for training-data pipelines (Common Crawl publishes exactly this —
harmonic-centrality/PageRank domain rankings — and CCNet/RefinedWeb-style
curation joins them against the corpus).  The engine side of that join is
here; the corpus side is :mod:`oxigraph_spark.pipeline.urls`
(``registrable_domain``).

Scale shape (the part that matters at 100 TB):

- Nodes are 8-byte ``xxhash64`` ids; the (id → lexical) dictionary is a
  separate frame joined back ONCE at output.  Per-iteration exchanges
  ship ``(long, double)`` rows only — never strings.
- The edge set is hash-partitioned by ``src`` and persisted once; each
  iteration re-shuffles only the rank vector (N rows) to meet it.  With a
  bucketed/pre-partitioned edge store even that exchange is one-sided.
- Dangling mass (nodes with no out-edges) folds in as a broadcast 1-row
  aggregate INSIDE the plan — no per-iteration driver action, so nothing
  forces recomputation of unmaterialized lineage mid-loop.
- Eager ``localCheckpoint`` per round truncates lineage: the next round
  consumes the score vector twice (mass aggregate + contribution join),
  and an unmaterialized plan would double per round — exponential
  recompute (same discipline as the property-path fixpoint,
  operators/paths.py).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F
from ..session import pin_eager

__all__ = ["pagerank", "degree_stats", "rdf_edges", "pagerank_terms",
           "hits", "connected_components"]

_CACHE_PART_KEY = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
# serializes the set/restore window so two concurrent graph ops can't
# interleave get/set and "restore" each other's flipped value as the
# session default.  Residual caveat (documented, not fixable from
# Python): the conf is session-global, so an UNRELATED thread calling
# persist() during the window also gets pinned partitioning for that
# one cache — harmless for correctness, it only opts that cache out of
# AQE re-planning.
_pin_lock = __import__("threading").Lock()


@contextmanager
def _pinned_cache_partitioning(df: DataFrame):
    """Persist-scope guard: the session default keeps
    ``canChangeCachedPlanOutputPartitioning=true`` (cached frames opt
    INTO AQE so consumers keep runtime broadcast/coalescing — see
    session.configure), but that makes a cached frame report UNKNOWN
    output partitioning, so a pre-``repartition(key)``-ed edge cache
    would be re-shuffled by every per-iteration join — the exact
    exchange the pre-partitioning exists to delete.  The conf is read
    once, when ``persist()`` builds the InMemoryRelation, so flipping
    it false just around the persist pins the cache's hash
    partitioning for all consumers while leaving every other cache in
    the session adaptive."""
    spark = df.sparkSession
    with _pin_lock:
        old = spark.conf.get(_CACHE_PART_KEY)
        spark.conf.set(_CACHE_PART_KEY, "false")
        try:
            yield
        finally:
            spark.conf.set(_CACHE_PART_KEY, old)


def _node_id(c: Column) -> Column:
    return F.xxhash64(c)


# target rows per pinned iteration partition: 1M (long, long) edge rows
# ≈ 16 MB — the same order as AQE's advisory post-shuffle partition size
_ROWS_PER_PARTITION = 1_000_000


def _iter_partitions(spark, m: int, requested: Optional[int]) -> int:
    """Partition count for a fixpoint's pinned iteration state.

    Pinned caches opt OUT of AQE coalescing (that is what keeps the
    per-round joins exchange-free), so the loop must size its own
    partitioning the way AQE would have: enough partitions to hold
    ~1M edge rows each, clamped to the session's shuffle parallelism.
    Without this, a small graph iterates as ``shuffle.partitions``
    pinned partitions and pays a full task wave of scheduling per stage
    for single-digit-ms of work each (measured 0.95 s/round → 0.2 s/round
    at sf0.1's 166k-edge FK graph, local[32]); a 100 TB graph still gets
    the full configured parallelism."""
    if requested:
        return requested
    try:
        cap = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    except ValueError:  # e.g. "auto" under some AQE configurations
        cap = spark.sparkContext.defaultParallelism
    return max(1, min(cap, -(-m // _ROWS_PER_PARTITION)))


def rdf_edges(quads: DataFrame, predicate: Optional[str] = None,
              ) -> tuple[DataFrame, DataFrame]:
    """``(edges, nodes)`` of the IRI→IRI link graph in ``quads``.

    ``edges`` is ``(src BIGINT, dst BIGINT)`` (xxhash64 of the IRI — the
    8-byte shuffle discipline); ``nodes`` is the ``(id, iri)`` decode
    dictionary.  Only triples whose subject AND object are IRIs
    contribute (literal objects are attributes, not links).
    ``predicate`` restricts to one link predicate (e.g. only
    ``ref_nation`` edges); None takes every IRI→IRI triple.
    """
    q = quads.where((F.col("s")["kind"] == 0) & (F.col("o")["kind"] == 0))
    if predicate is not None:
        q = q.where(F.col("p")["lex"] == predicate)
    # persisted dictionary sidecars (quad-store scans,
    # ``quad_store.write(with_keys=True)`` 64-bit layout): the store's
    # BIGINT ids ARE the node ids — zero string hashing at graph build,
    # and over a ``BucketedQuadStore`` the edge frame arrives already
    # clustered on ``s_key``
    dt = dict(q.dtypes)
    have_keys = dt.get("s_key") == "bigint" and dt.get("o_key") == "bigint"
    # materialize the (tiny relative to the store) pair list ONCE:
    # edges, the node dictionary, the parallel-edge distinct, and the
    # degree agg all consume it, and each would otherwise re-execute
    # the full union-of-predicate-frames quad scan (measured 6x the
    # whole PageRank loop at sf0.1)
    if have_keys:
        pairs = q.select(F.col("s")["lex"].alias("s_iri"),
                         F.col("o")["lex"].alias("o_iri"),
                         F.col("s_key").alias("sk"),
                         F.col("o_key").alias("ok")).transform(pin_eager)
        edges = pairs.select(F.col("sk").alias("src"),
                             F.col("ok").alias("dst"))
        # dedup over BOTH columns, not just the id: iri is functionally
        # determined by the dictionary key (equal key ⇔ equal lex), and
        # a key-only dedup compiles iri into a first(string) aggregate
        # buffer that HashAggregate cannot hold — the node dictionary
        # then built on the Sort+SortAggregate path (r9, guide §5)
        nodes = (pairs.select(F.col("sk").alias("id"),
                              F.col("s_iri").alias("iri"))
                 .unionAll(pairs.select(F.col("ok").alias("id"),
                                        F.col("o_iri").alias("iri")))
                 .dropDuplicates())
        return edges, nodes
    pairs = q.select(F.col("s")["lex"].alias("s_iri"),
                     F.col("o")["lex"].alias("o_iri")).transform(pin_eager)
    edges = pairs.select(_node_id(F.col("s_iri")).alias("src"),
                         _node_id(F.col("o_iri")).alias("dst"))
    nodes = (pairs.select(F.col("s_iri").alias("iri"))
             .unionAll(pairs.select(F.col("o_iri").alias("iri")))
             .distinct()
             .select(_node_id(F.col("iri")).alias("id"), "iri"))
    return edges, nodes


def pagerank(edges: DataFrame, *, src: str = "src", dst: str = "dst",
             damping: float = 0.85, max_iter: int = 20,
             num_partitions: Optional[int] = None,
             checkpoint_every: int = 1,
             dedup_edges: bool = True,
             personalize: Optional[Sequence] = None) -> DataFrame:
    """PageRank over ``edges`` → ``(node BIGINT, rank DOUBLE)``.

    Standard power iteration with uniform teleport and dangling-mass
    redistribution; ``sum(rank) == 1`` at every step (a test asserts it).
    ``edges`` columns may be any orderable type; they are used as join
    keys verbatim (callers with string node names should pre-hash — see
    :func:`rdf_edges`).

    ``personalize`` is a (small) seed-node list: teleport AND dangling
    mass then restart uniformly over the SEEDS instead of all nodes —
    personalized PageRank (Haveliwala, WWW 2002), the entity-relatedness
    score for "what's close to these nodes in link space".  Seeds ride
    as a broadcast literal set; nothing else changes shape.

    ``dedup_edges=False`` skips the parallel-edge distinct for inputs
    that are already edge-unique (saves one shuffle at build).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
             .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if dedup_edges:
        e = e.distinct()
    # one narrow pre-count sizes the pinned layout (see _iter_partitions)
    p = _iter_partitions(edges.sparkSession, e.count(), num_partitions)
    e = e.repartition(p, "src")
    # edges + per-source out-degree materialized ONCE; every iteration
    # reads this frame, so persist it (deg rides along → the per-iter
    # join needs no second lookup).  Pinned partitioning: the cache
    # keeps its src-hash layout visible, so each iteration's join
    # exchanges only the (long, double) rank vector.
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e = e.join(deg, "src")
    with _pinned_cache_partitioning(e):
        e = e.persist()

    # node set WITH a has-out-edges flag: node count and the dangling
    # probe come out of ONE aggregate job (a separate anti-join probe
    # measured 2 s of pure scheduling at sf0.1)
    flags = (e.select(F.col("src").alias("node"),
                      F.lit(1).alias("has_out"))
             .unionAll(e.select(F.col("dst").alias("node"),
                                F.lit(0).alias("has_out")))
             .groupBy("node").agg(F.max("has_out").alias("has_out"))
             .repartition(p, "node"))
    with _pinned_cache_partitioning(flags):
        flags = flags.persist()
    stats = flags.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.lit(1) - F.col("has_out")).alias("nd")).first()
    n = stats["n"]  # this agg also materialized both caches
    if n == 0:
        return flags.select("node", F.lit(1.0).alias("rank"))
    # graphs where every node links out (common after domain-graph
    # closure) skip the dangling-mass machinery entirely
    has_dangling = (stats["nd"] or 0) > 0

    # teleport distribution: uniform, or uniform over the seed set
    if personalize is not None:
        seeds = sorted(set(personalize))  # dups would leak teleport mass
        if not seeds:
            raise ValueError("personalize: empty seed set")
        # normalize over the seeds PRESENT in the graph — absent seeds
        # would silently drain sum(rank) below 1 every iteration
        present = flags.where(F.col("node").isin(seeds)).count()
        if present == 0:
            raise ValueError("personalize: no seed present in the graph")
        if present < len(seeds):
            seeds = [r["node"] for r in
                     flags.where(F.col("node").isin(seeds)).collect()]
        tele = F.when(F.col("node").isin(seeds),
                      F.lit(1.0 / len(seeds))).otherwise(F.lit(0.0))
    else:
        tele = F.lit(1.0 / n)
    # projection over the pinned cache: keeps the node-hash layout, so
    # the per-iteration left join meets contrib co-located
    nodes = flags.select("node", tele.alias("tele"))
    ranks = nodes.select("node", F.col("tele").alias("rank"))

    for i in range(max_iter):
        # mass leaving via links: rank/deg per edge, summed per target.
        # join key is src on BOTH sides of the co-partitioned layout —
        # only the N-row rank vector moves.
        contrib = (e.join(ranks.withColumnRenamed("node", "src"), "src")
                   .groupBy(F.col("dst").alias("node"))
                   .agg(F.sum(F.col("rank") / F.col("deg")).alias("in_mass")))
        # dangling mass (rank held by nodes with no out-edges, restarted
        # over the teleport distribution) rides along as a broadcast
        # 1-row frame — NO per-iteration driver action.  Algebraic form:
        # sum(rank) == 1 every step (the conservation invariant a test
        # asserts), and each non-dangling node contributes exactly
        # deg·(rank/deg) = rank to Σ in_mass, so dangling mass =
        # damping·(1 − Σ in_mass) — a 1-row agg over the ALREADY
        # node-aggregated contrib frame, whose exchange the next join
        # shares via AQE stage reuse.  The earlier form semi-joined the
        # full rank vector against a persisted dangling-node set every
        # iteration — one whole extra pass over the vector per round.
        restart = F.lit(1.0 - damping)
        if has_dangling:
            dng = contrib.agg(
                (F.lit(damping)
                 * (F.lit(1.0) - F.coalesce(F.sum("in_mass"), F.lit(0.0))))
                .alias("__dng"))
            restart = restart + F.col("__dng")
        nxt = (nodes.join(contrib, "node", "left"))
        if has_dangling:
            nxt = nxt.crossJoin(F.broadcast(dng))
        ranks = nxt.select(
            "node",
            (F.col("tele") * restart + F.lit(damping)
             * F.coalesce(F.col("in_mass"), F.lit(0.0))).alias("rank"))
        if (i + 1) % checkpoint_every == 0 and i + 1 < max_iter:
            # EAGER materialization (paths.py fixpoint discipline): the
            # NEXT round consumes this frame twice (dangling agg +
            # contribution join), so an unmaterialized plan would double
            # its lineage per round — exponential recompute.  One cheap
            # (node, rank) checkpoint per round keeps every iteration
            # O(edges) and the logical plan O(1)-deep.
            ranks = ranks.transform(pin_eager)

    # sever lineage, then release every cache this call registered —
    # a long-lived session calling pagerank per request must not
    # accumulate dead edge sets in the executor storage registry
    ranks = ranks.transform(pin_eager)
    for frame in (e, flags):
        frame.unpersist()
    return ranks


def pagerank_terms(quads: DataFrame, predicate: Optional[str] = None,
                   personalize_iris: Optional[Sequence[str]] = None,
                   **kw) -> DataFrame:
    """:func:`pagerank` over the RDF link graph, decoded back to IRIs:
    ``(iri STRING, rank DOUBLE)``, descending.  The dictionary join is
    the ONLY place strings appear; iterations ran on 8-byte ids.
    ``personalize_iris`` restarts over the given seed IRIs (personalized
    PageRank — entity relatedness); resolved to ids via one bounded
    |seeds|-row collect of the dictionary."""
    edges, nodes = rdf_edges(quads, predicate)
    if personalize_iris is not None:
        rows = (nodes.where(F.col("iri").isin(list(personalize_iris)))
                .select("id").collect())
        if not rows:
            raise ValueError("personalize_iris: no seed found in graph")
        kw["personalize"] = [r["id"] for r in rows]
    ranks = pagerank(edges, **kw)
    return (ranks.join(nodes, ranks["node"] == nodes["id"])
            .select("iri", "rank")
            .orderBy(F.desc("rank"), "iri"))


def degree_stats(edges: DataFrame, *, src: str = "src", dst: str = "dst",
                 ) -> DataFrame:
    """Per-node ``(node, out_deg, in_deg)`` — one pass, two partial aggs,
    full-outer on the 8-byte key."""
    out_d = edges.groupBy(F.col(src).alias("node")) \
                 .agg(F.count(F.lit(1)).alias("out_deg"))
    in_d = edges.groupBy(F.col(dst).alias("node")) \
                .agg(F.count(F.lit(1)).alias("in_deg"))
    return (out_d.join(in_d, "node", "full")
            .select("node",
                    F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
                    F.coalesce("in_deg", F.lit(0)).alias("in_deg")))


def _half_step(e_oriented: DataFrame, scores: DataFrame,
               join_key: str, out_key: str, col: str) -> DataFrame:
    """One HITS half-step: join the score vector against an edge frame
    PRE-PARTITIONED on ``join_key`` and sum per ``out_key``.  Because
    the edge side already meets the join's required distribution, the
    only Exchange in this plan is the (long, double) score vector —
    asserted by ``tests/test_graphrank.py::test_hits_halfstep_plan``."""
    return (e_oriented.join(scores.withColumnRenamed("node", join_key),
                            join_key)
            .groupBy(F.col(out_key).alias("node"))
            .agg(F.sum(col).alias(col)))


def hits(edges: DataFrame, *, src: str = "src", dst: str = "dst",
         max_iter: int = 20, dedup_edges: bool = True) -> DataFrame:
    """Kleinberg HITS → ``(node, hub, auth)``, both L2-normalized.

    Same execution discipline as :func:`pagerank`, plus DUAL-ORIENTATION
    edge persistence: the auth half-step joins on ``src`` and the hub
    half-step on ``dst``, so a single src-partitioned copy would
    re-shuffle the FULL edge set once per iteration.  Persisting a
    second, dst-partitioned copy makes both half-steps meet their join
    key co-located — each iteration's exchanges are the two
    (long, double) score vectors only.  Cost: 2× edge storage while the
    loop runs (both copies released before return); at 100 TB that is
    the standard time/space trade every dual-orientation index makes
    (the reference stores SIX quad orderings for the same reason,
    ``storage/mod.rs``).  The L2 norm rides along as a broadcast 1-row
    frame (no per-iteration driver action), and both vectors are
    eagerly checkpointed per round so the dual consumption (norm agg +
    next half-step join) never recomputes lineage.
    """
    if max_iter < 1:
        raise ValueError("hits: max_iter must be >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
             .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if dedup_edges:
        e = e.distinct()
    p = _iter_partitions(edges.sparkSession, e.count(), None)
    with _pinned_cache_partitioning(e):
        e_fwd = e.repartition(p, "src").persist()
        e_rev = e_fwd.repartition(p, "dst").persist()
        nodes = (e_fwd.select(F.col("src").alias("node"))
                 .unionAll(e_fwd.select(F.col("dst").alias("node")))
                 .distinct().repartition(p, "node").persist())
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("hub"),
                            F.lit(0.0).alias("auth"))

    def _normed(df: DataFrame, col: str) -> DataFrame:
        nrm = df.agg(F.sqrt(F.sum(F.col(col) * F.col(col)))
                     .alias("__nrm"))
        return (df.crossJoin(F.broadcast(nrm))
                .select("node",
                        F.when(F.col("__nrm") > 0,
                               F.col(col) / F.col("__nrm"))
                        .otherwise(F.lit(0.0)).alias(col)))

    hubs = nodes.select("node", F.lit(1.0 / (n ** 0.5)).alias("hub")) \
                .transform(pin_eager)
    auths = None
    for _ in range(max_iter):
        raw_a = _half_step(e_fwd, hubs, "src", "dst", "hub") \
            .withColumnRenamed("hub", "auth")
        auths = _normed(
            nodes.join(raw_a, "node", "left")
            .select("node", F.coalesce("auth", F.lit(0.0)).alias("auth")),
            "auth").transform(pin_eager)
        raw_h = _half_step(e_rev, auths, "dst", "src", "auth") \
            .withColumnRenamed("auth", "hub")
        hubs = _normed(
            nodes.join(raw_h, "node", "left")
            .select("node", F.coalesce("hub", F.lit(0.0)).alias("hub")),
            "hub").transform(pin_eager)
    # both vectors are checkpointed (lineage severed) — release the
    # caches this call registered before returning
    out = hubs.join(auths, "node")
    e_fwd.unpersist()
    e_rev.unpersist()
    nodes.unpersist()
    return out


def connected_components(edges: DataFrame, *, src: str = "src",
                         dst: str = "dst") -> DataFrame:
    """Weakly connected components → ``(id, cluster)`` with the
    component's minimum member id as the label.  Thin graph-API alias
    of the dedup family's min-label propagation
    (:func:`oxigraph_spark.pipeline.dedup.dedup_clusters`) — one
    shuffle join + one aggregate per round, ids only."""
    from ..pipeline.dedup import dedup_clusters
    return dedup_clusters(edges, left_col=src, right_col=dst)
