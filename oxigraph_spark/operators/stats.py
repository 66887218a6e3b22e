"""Dataset statistics (VoID-style summaries) and graph delta operators.

Reference parity: oxigraph exposes ``Store::len()`` and per-graph
iteration; real deployments derive VoID descriptions
(https://www.w3.org/TR/void/) with SPARQL aggregates.  Here the
summaries are first-class DataFrame ops over the quad table — each is
one aggregate (map-side combinable, one narrow shuffle at any scale).

``graph_diff`` is the RDF-diff a sync/replication pipeline needs:
added/removed quads between two datasets, blank-node-label-independent
when ``canonicalize=True`` (reuses ``operators/canonicalize.py``'s
refinement hashing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..model import terms as T

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _with_g(df: DataFrame) -> DataFrame:
    """Accept triple-only frames (e.g. CONSTRUCT output): add a
    default-graph ``g`` column when missing."""
    if "g" in df.columns:
        return df
    return df.withColumn("g", T.default_graph())


def dataset_stats(quads: DataFrame, approx: bool = False,
                  rsd: float = 0.02) -> DataFrame:
    """One-row VoID core: ``triples``, ``distinct_subjects``,
    ``distinct_predicates``, ``distinct_objects``, ``distinct_graphs``.

    ``approx=False``: exact count_distinct on term keys (one aggregate,
    map-side partials — but each distinct carries its own hash set
    through the shuffle).  ``approx=True``: HyperLogLog++
    (``approx_count_distinct``, relative error ``rsd``) — fixed-size
    sketches regardless of cardinality, THE right default at 100 TB
    where exact distincts of ~10¹² subjects would shuffle terabytes of
    intermediate sets for a dashboard number."""
    quads = _with_g(quads)
    cd = ((lambda c: F.approx_count_distinct(c, rsd)) if approx
          else F.count_distinct)
    return quads.agg(
        F.count(F.lit(1)).alias("triples"),
        cd(T.join_key(quads["s"])).alias("distinct_subjects"),
        cd(T.join_key(quads["p"])).alias("distinct_predicates"),
        cd(T.join_key(quads["o"])).alias("distinct_objects"),
        cd(T.join_key(quads["g"])).alias("distinct_graphs"))


def predicate_partition(quads: DataFrame, approx: bool = False,
                        rsd: float = 0.02) -> DataFrame:
    """VoID property partition: per-predicate triple counts + distinct
    subject/object counts, descending — the dataset shape dashboard and
    the input every vertical-partitioning decision reads.
    ``approx=True`` switches to HyperLogLog++ sketches (see
    :func:`dataset_stats`)."""
    quads = _with_g(quads)
    cd = ((lambda c: F.approx_count_distinct(c, rsd)) if approx
          else F.count_distinct)
    return (quads.groupBy(quads["p"]["lex"].alias("predicate"))
                 .agg(F.count(F.lit(1)).alias("triples"),
                      cd(T.join_key(quads["s"]))
                       .alias("distinct_subjects"),
                      cd(T.join_key(quads["o"]))
                       .alias("distinct_objects"))
                 .orderBy(F.col("triples").desc(), "predicate"))


def class_partition(quads: DataFrame) -> DataFrame:
    """VoID class partition: instances per ``rdf:type`` object."""
    quads = _with_g(quads)
    return (quads.where((quads["p"]["kind"] == T.KIND_IRI)
                        & (quads["p"]["lex"] == RDF_TYPE))
                 .groupBy(quads["o"]["lex"].alias("cls"))
                 .agg(F.count_distinct(T.join_key(quads["s"]))
                      .alias("instances"))
                 .orderBy(F.col("instances").desc(), "cls"))


def graph_diff(a: DataFrame, b: DataFrame,
               canonicalize: bool = False) -> DataFrame:
    """Quad-level delta → rows of ``(op, s, p, o, g)`` with ``op`` ∈
    {'+', '-'}: '+' quads present in ``b`` but not ``a`` (added), '-'
    present in ``a`` but not ``b`` (removed).  SET semantics — correct
    for RDF graphs, which are sets of triples: each side is deduplicated
    on the quad key first, so a quad present twice in one side and once
    in the other produces no delta row.

    With ``canonicalize=True`` blank nodes are relabeled by structural
    refinement hash first, so two isomorphic serializations diff as
    empty — the property a replication check needs.  Shape: two
    anti-join-style full-outer count joins on 64-bit quad keys; term
    structs ride along, only keys shuffle twice."""
    a, b = _with_g(a), _with_g(b)
    if canonicalize:
        from .canonicalize import canonical_quads
        a, b = canonical_quads(a), canonical_quads(b)

    def keyed(df: DataFrame) -> DataFrame:
        qk = F.xxhash64(*[x for col in ("s", "p", "o", "g")
                          for x in (df[col]["kind"],
                                    F.coalesce(df[col]["lex"], F.lit("\x00L")),
                                    F.coalesce(df[col]["datatype"],
                                               F.lit("\x00D")),
                                    F.coalesce(df[col]["lang"],
                                               F.lit("\x00G")))])
        # dedup over the full row: the term structs are determined by the
        # content hash qk, and a qk-only dedup compiles them into
        # first(struct) buffers that force the Sort+SortAggregate path
        # (r9, guide §5 hash vs sort aggregate)
        return df.select(qk.alias("qk"), "s", "p", "o", "g") \
                 .dropDuplicates()

    ka, kb = keyed(a), keyed(b)
    removed = ka.join(kb.select("qk"), "qk", "left_anti") \
                .select(F.lit("-").alias("op"), "s", "p", "o", "g")
    added = kb.join(ka.select("qk"), "qk", "left_anti") \
              .select(F.lit("+").alias("op"), "s", "p", "o", "g")
    return removed.unionByName(added)
