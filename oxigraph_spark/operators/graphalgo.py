"""Graph algorithms beyond rank scores: BFS shortest paths to landmark
nodes, degree-ordered triangle counting, and label-propagation
communities.

Not in the reference engine — same "beyond the reference" surface as
:mod:`oxigraph_spark.operators.graphrank` (the reference's data model
stops at SPARQL property paths; these are the closures a link-graph
curation pipeline asks next: distance-to-seed features, clustering
coefficients / spam-farm detection, community labels for
leakage-safe splitting).

Execution discipline (shared with graphrank.py / paths.py — the shapes
that survive 100 TB):

- Node ids are 8-byte longs (callers hash strings first — see
  :func:`oxigraph_spark.operators.graphrank.rdf_edges`).  Per-iteration
  exchanges ship fixed-width rows only: ``(long, long, int)`` for BFS
  frontiers, ``(long, long)`` for label vectors.
- The edge relation is hash-partitioned on its per-round join key and
  persisted ONCE with pinned partitioning
  (:func:`graphrank._pinned_cache_partitioning`), so every fixpoint
  round exchanges the frontier/label vector only — never the edges.
- Eager ``localCheckpoint`` per round truncates lineage (the next round
  consumes each vector more than once; unmaterialized lineage would
  double per round).
- Triangle counting is the classic degree-ordered wedge join
  (Suri & Vassilvitskii, WWW 2011 "Counting triangles and the curse of
  the last reducer"): orienting every edge from the lower-(degree, id)
  endpoint to the higher bounds per-key wedge fan-out by sqrt(m), which
  is exactly the skew cap that makes the wedge shuffle survive
  power-law graphs.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from .graphrank import _iter_partitions, _pinned_cache_partitioning
from ..session import pin, pin_eager

__all__ = ["shortest_paths", "weighted_shortest_paths", "triangle_count",
           "label_propagation"]

# Same bound discipline as paths.MAX_ITERATIONS: deeper graphs raise
# instead of silently truncating.
MAX_ROUNDS = 128


def _clean_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
            .where(F.col("src").isNotNull() & F.col("dst").isNotNull()))


def shortest_paths(edges: DataFrame, landmarks: Sequence, *,
                   src: str = "src", dst: str = "dst",
                   max_dist: Optional[int] = None) -> DataFrame:
    """Unweighted directed shortest-path distances TO each landmark →
    ``(node, landmark, dist INT)`` (GraphFrames ``shortestPaths``
    semantics: the length of the shortest directed path FROM ``node``
    TO ``landmark``; unreachable pairs are absent).

    Multi-source BFS run backward from the landmarks, all landmarks in
    ONE fixpoint: the frontier is ``(node, landmark, dist)`` and each
    round relaxes every landmark's wavefront together, so k landmarks
    cost one scan sequence, not k.  First discovery = shortest in an
    unweighted graph, so the per-round anti-join against the
    accumulated set is the whole relaxation.

    The edge relation is persisted once, hash-partitioned on ``dst``
    (the per-round join key — BFS walks edges backward); each round
    exchanges only the 20-byte frontier rows.  ``max_dist`` bounds the
    search radius (distance features rarely need the full diameter).
    """
    lm = sorted(set(landmarks))
    if not lm:
        raise ValueError("shortest_paths: empty landmark set")
    e = _clean_edges(edges, src, dst).distinct()
    p = _iter_partitions(edges.sparkSession, e.count(), None)
    with _pinned_cache_partitioning(e):
        e = e.repartition(p, "dst").persist()
    e.count()

    spark = edges.sparkSession
    # landmarks at distance 0 — only those actually present in the graph
    nodes = e.select(F.col("src").alias("node")) \
             .unionAll(e.select(F.col("dst").alias("node"))).distinct()
    seed = (nodes.where(F.col("node").isin(lm))
            .select("node", F.col("node").alias("landmark"),
                    F.lit(0).alias("dist")))
    frontier = seed.transform(pin_eager)
    known = frontier
    bound = max_dist if max_dist is not None else MAX_ROUNDS
    dist = 0
    try:
        while dist < bound:
            dist += 1
            # walk one edge backward: anything pointing AT the frontier
            # is one hop further from the landmark
            step = (e.join(frontier.withColumnRenamed("node", "dst")
                           .select("dst", "landmark"), "dst")
                    .select(F.col("src").alias("node"), "landmark",
                            F.lit(dist).alias("dist"))
                    .dropDuplicates(["node", "landmark"]))
            new = step.join(known.select("node", "landmark"),
                            ["node", "landmark"], "leftanti") \
                      .transform(pin)
            if new.count() == 0:
                break
            known = known.unionByName(new)
            frontier = new
        else:
            if max_dist is None:
                raise RuntimeError(
                    f"shortest_paths did not converge within {MAX_ROUNDS} "
                    "hops; raise oxigraph_spark.operators.graphalgo."
                    "MAX_ROUNDS for deeper graphs")
        out = known.transform(pin_eager)
    finally:
        e.unpersist()
    return out


def weighted_shortest_paths(edges: DataFrame, landmarks: Sequence, *,
                            src: str = "src", dst: str = "dst",
                            weight: str = "weight",
                            max_rounds: Optional[int] = None) -> DataFrame:
    """Weighted directed shortest-path distances TO each landmark →
    ``(node, landmark, dist DOUBLE)`` — the weighted analog of
    :func:`shortest_paths` (same orientation: cost of the cheapest
    directed path FROM ``node`` TO ``landmark``; unreachable pairs are
    absent).  Weights must be non-negative (checked — a silent negative
    weight would corrupt every downstream distance).

    Pregel-style frontier Bellman–Ford (the SSSP of Malewicz et al.,
    SIGMOD 2010), all landmarks in one fixpoint: each round relaxes
    every edge INTO the improved set and keeps candidates that beat the
    current best.  Unlike BFS, a settled node can re-improve, so the
    distance vector is re-min-merged per round — the per-round exchange
    is the 24-byte ``(long, long, double)`` vector rows only, never the
    edges (hash-partitioned on ``dst`` and persisted once, exactly the
    :func:`shortest_paths` discipline).

    Rounds are bounded by the longest shortest path in EDGE COUNT (each
    round extends optimal paths by ≥1 edge), not by the weight range —
    delta-stepping's bucket refinement buys nothing under BSP rounds
    where a full frontier relaxation is one job either way.
    ``max_rounds`` bounds the relaxation (distances then reflect
    cheapest paths of ≤ that many edges); without it, non-convergence
    within MAX_ROUNDS raises, matching the module convention.
    """
    lm = sorted(set(landmarks))
    if not lm:
        raise ValueError("weighted_shortest_paths: empty landmark set")
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                      F.col(weight).cast("double").alias("w"))
         .where(F.col("src").isNotNull() & F.col("dst").isNotNull()
                & F.col("w").isNotNull())
         # parallel edges: only the cheapest can ever win a relaxation
         .groupBy("src", "dst").agg(F.min("w").alias("w")))
    p = _iter_partitions(edges.sparkSession, e.count(), None)
    with _pinned_cache_partitioning(e):
        e = e.repartition(p, "dst").persist()
    e.count()
    try:
        if e.where(F.col("w") < 0).limit(1).count() > 0:
            raise ValueError(
                "weighted_shortest_paths: negative edge weight")
        nodes = e.select(F.col("src").alias("node")) \
                 .unionAll(e.select(F.col("dst").alias("node"))).distinct()
        dist = (nodes.where(F.col("node").isin(lm))
                .select("node", F.col("node").alias("landmark"),
                        F.lit(0.0).alias("dist"))
                .transform(pin_eager))
        frontier = dist
        bound = max_rounds if max_rounds is not None else MAX_ROUNDS
        rounds = 0
        while rounds < bound:
            rounds += 1
            # relax one edge backward: u -> frontier-node costs w + dist
            cand = (e.join(frontier.withColumnRenamed("node", "dst")
                           .select("dst", "landmark",
                                   F.col("dist").alias("fd")), "dst")
                    .groupBy(F.col("src").alias("node"), "landmark")
                    .agg(F.min(F.col("fd") + F.col("w")).alias("dist")))
            improved = (cand.join(dist.select(
                            "node", "landmark",
                            F.col("dist").alias("best")),
                            ["node", "landmark"], "left")
                        .where(F.col("best").isNull()
                               | (F.col("dist") < F.col("best")))
                        .select("node", "landmark", "dist")
                        .transform(pin))
            if improved.count() == 0:
                break
            dist = (dist.unionByName(improved)
                    .groupBy("node", "landmark")
                    .agg(F.min("dist").alias("dist"))
                    .transform(pin_eager))
            frontier = improved
        else:
            if max_rounds is None:
                raise RuntimeError(
                    f"weighted_shortest_paths did not converge within "
                    f"{MAX_ROUNDS} rounds; pass max_rounds= to bound the "
                    "relaxation or raise graphalgo.MAX_ROUNDS")
        out = dist.transform(pin_eager)
    finally:
        e.unpersist()
    return out


def triangle_count(edges: DataFrame, *, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Per-node triangle participation over the UNDIRECTED simple graph
    of ``edges`` → ``(node, triangles BIGINT)`` (nodes in no triangle
    report 0).  Σ triangles == 3 × the number of distinct triangles.

    Degree-ordered wedge join: canonicalize to undirected simple edges,
    orient each from the lower-(degree, id) endpoint to the higher (a
    total order ⇒ the oriented graph is acyclic and each triangle
    appears as exactly ONE wedge a→b, b→c closed by a→c), then one
    self-join builds wedges and one semi-join against the oriented edge
    set closes them.  Wedge fan-out per node is bounded by its
    out-degree in the orientation — O(sqrt(m)) on any graph — so the
    wedge shuffle is skew-capped by construction; no all-pairs stage
    exists at any scale.
    """
    e = _clean_edges(edges, src, dst).where(F.col("src") != F.col("dst"))
    und = (e.select(F.least("src", "dst").alias("a"),
                    F.greatest("src", "dst").alias("b"))
           .distinct())
    deg = (und.select(F.col("a").alias("node"))
           .unionAll(und.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    # orient from lower (deg, id) to higher — ranks are total, ties on
    # degree break by id
    w = (und.join(deg.withColumnRenamed("node", "a")
                  .withColumnRenamed("deg", "deg_a"), "a")
         .join(deg.withColumnRenamed("node", "b")
               .withColumnRenamed("deg", "deg_b"), "b"))
    a_first = (F.col("deg_a") < F.col("deg_b")) | \
              ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b")))
    o = w.select(F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
                 F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"))
    p = _iter_partitions(edges.sparkSession, und.count(), None)
    with _pinned_cache_partitioning(o):
        o = o.repartition(p, "u").persist()
    o.count()
    # wedges u→v, v→w; closing edge u→w must exist in the oriented set
    e1, e2 = o.alias("e1"), o.alias("e2")
    wedges = e1.join(e2, F.col("e1.v") == F.col("e2.u")) \
               .select(F.col("e1.u").alias("x"), F.col("e1.v").alias("y"),
                       F.col("e2.v").alias("z"))
    closing = o.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tris = wedges.join(closing, ["x", "z"], "leftsemi")
    corners = (tris.select(F.col("x").alias("node"))
               .unionAll(tris.select(F.col("y").alias("node")))
               .unionAll(tris.select(F.col("z").alias("node"))))
    counts = corners.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))
    out = (deg.select("node").join(counts, "node", "left")
           .select("node", F.coalesce("triangles", F.lit(0))
                   .cast("bigint").alias("triangles"))
           .transform(pin_eager))
    o.unpersist()
    return out


def label_propagation(edges: DataFrame, *, src: str = "src",
                      dst: str = "dst", max_iter: int = 5) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over the
    undirected graph of ``edges`` → ``(node, label)`` community
    assignments.  Deterministic: each round every node adopts the most
    frequent label among its neighbors, ties broken by the SMALLEST
    label (the usual hash-agnostic tiebreak), isolated semantics via
    left join (a node with no neighbors keeps its label).

    Fixed ``max_iter`` rounds (synchronous LPA can oscillate on
    bipartite structures, so convergence detection would not terminate
    in general — bounded rounds are the standard cure).  Per round: one
    join of the (long, long) label vector against the neighbor frame
    pre-partitioned on its join key + two aggregates; the edge relation
    never re-shuffles.
    """
    if max_iter < 1:
        raise ValueError("label_propagation: max_iter must be >= 1")
    e = _clean_edges(edges, src, dst).where(F.col("src") != F.col("dst"))
    nbrs = (e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
            .unionAll(e.select(F.col("dst").alias("u"),
                               F.col("src").alias("v")))
            .distinct())
    p = _iter_partitions(edges.sparkSession, nbrs.count(), None)
    with _pinned_cache_partitioning(nbrs):
        nbrs = nbrs.repartition(p, "v").persist()
    nodes = nbrs.select(F.col("u").alias("node")).distinct() \
                .repartition(p, "node")
    with _pinned_cache_partitioning(nodes):
        nodes = nodes.persist()
    nodes.count()

    labels = nodes.select("node", F.col("node").alias("label")) \
                  .transform(pin_eager)
    for _ in range(max_iter):
        # each neighbor v contributes its current label to u
        votes = (nbrs.join(labels.withColumnRenamed("node", "v"), "v")
                 .groupBy(F.col("u").alias("node"), "label")
                 .agg(F.count(F.lit(1)).alias("cnt")))
        # most frequent label, ties → smallest label: min over
        # (-cnt, label) orders by cnt desc then label asc
        best = (votes.groupBy("node")
                .agg(F.min(F.struct((-F.col("cnt")).alias("neg"),
                                    F.col("label"))).alias("top"))
                .select("node", F.col("top")["label"].alias("new_label")))
        labels = (labels.join(best, "node", "left")
                  .select("node", F.coalesce("new_label", "label")
                          .alias("label"))
                  .transform(pin_eager))
    nbrs.unpersist()
    nodes.unpersist()
    return labels
