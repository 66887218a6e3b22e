"""Continuous SPARQL: registered queries re-evaluated over streaming
quad ingest.

The C-SPARQL / RSP re-evaluation model (Barbieri et al., "C-SPARQL:
SPARQL for continuous querying", WWW 2009): RDF arrives as a stream,
a set of standing queries is re-evaluated as data lands, and each
evaluation's result replaces the previous snapshot.  The reference
engine has no stream support (its store is RocksDB + a pull evaluator);
this is the Structured-Streaming-native re-expression:

- ingest is ``readStream.text`` over a drop directory of N-Triples /
  N-Quads files (the same lenient line parser as the batch reader —
  pure column expressions, so it runs wherever Spark schedules it);
- each micro-batch APPENDS parsed quads to a parquet quad log
  (predicate-partitioned is the store layout; the log is the cheap
  ingest tier) and re-evaluates every registered query over
  base ∪ log, overwriting that query's result snapshot;
- delivery is exactly-once per batch via ``foreachBatch`` +
  checkpointing; a crashed driver replays the last batch, and both
  the append and the snapshot overwrite are idempotent per batch id.

At 100 TB the quad log compacts into the long-term store on a schedule
(``TransactionalQuadStore.ingest_log`` + ``expire_log`` — one atomic
commit per fold, each quad in base XOR log).  Evaluation tiers:

- **Incremental (delta) tier** — monotone DISTINCT BGP standing
  queries evaluate only the solutions touching each batch's new quads
  (per-pattern delta decomposition, see :func:`_delta_rewrites`) and
  append; per-batch cost scales with the delta, not the corpus.
- **Snapshot tier** — everything non-monotone (OPTIONAL / MINUS /
  EXISTS / aggregates / windows) re-evaluates fully per batch at the
  query's normal batch cost.  Windowed/stateful standing queries
  should compose the Structured-Streaming operators in :mod:`.events`
  instead, where Spark's own incremental execution applies.
"""

from __future__ import annotations

import os
from functools import reduce
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..algebra import ast as A
from ..model import terms as T
from ..sources.ntriples import parse_nt_lines

__all__ = ["stream_ntriples", "continuous_sparql",
           "start_standing_queries", "resume_standing_queries"]

# synthetic graph name the incremental evaluator tags each batch's new
# quads with — never collides with user data (no scheme registration)
_DELTA_GRAPH = "urn:oxigraph-spark:stream:delta"


# builtins whose value differs between evaluations: a replayed batch
# would append the "same" solution with fresh values, breaking the
# delta path's exactly-once-per-row guarantee (review finding r5)
_NONDETERMINISTIC = {"UUID", "STRUUID", "RAND", "NOW", "BNODE"}


def _expr_blocks_delta(e) -> bool:
    """True when the expression makes delta evaluation unsound: EXISTS
    (non-monotone) or a nondeterministic / unknown-custom function call
    (replay would re-mint values; custom IRIs are conservatively
    assumed nondeterministic)."""
    if isinstance(e, A.EExists):
        return True
    if isinstance(e, A.ECall):
        if e.name in _NONDETERMINISTIC or ":" in e.name:
            return True
        return any(_expr_blocks_delta(a) for a in e.args)
    if isinstance(e, A.EOp):
        return any(_expr_blocks_delta(a) for a in e.args)
    if isinstance(e, A.EIn):
        return (_expr_blocks_delta(e.expr)
                or any(_expr_blocks_delta(x) for x in e.options))
    return False


def _delta_variants(node):
    """All single-pattern delta decompositions of a MONOTONE pattern
    tree: each returned tree is ``node`` with exactly one triple
    pattern addressed through the synthetic delta graph and everything
    else over full data.  Returns None when the tree contains a
    non-monotone operator (OPTIONAL/MINUS/EXISTS/aggregates/paths/
    GRAPH/SERVICE…), ``[]`` for monotone-but-constant leaves (VALUES,
    empty BGP — they never produce new solutions on their own)."""
    delta_g = A.NamedNode(_DELTA_GRAPH)
    if isinstance(node, A.BGP):
        if not all(isinstance(p, A.TriplePattern) for p in node.patterns):
            return None
        out = []
        pats = list(node.patterns)
        for i, t in enumerate(pats):
            delta_part = A.Graph(delta_g, A.BGP((t,)))
            rest = pats[:i] + pats[i + 1:]
            out.append(delta_part if not rest
                       else A.Join(A.BGP(tuple(rest)), delta_part))
        return out
    if isinstance(node, A.Union_):
        # UNION is monotone: a new solution comes from exactly one
        # branch touching Δ — the other branch drops from that variant
        left = _delta_variants(node.left)
        right = _delta_variants(node.right)
        if left is None or right is None:
            return None
        return left + right
    if isinstance(node, A.Join):
        left = _delta_variants(node.left)
        right = _delta_variants(node.right)
        if left is None or right is None:
            return None
        return ([A.Join(v, node.right) for v in left]
                + [A.Join(node.left, v) for v in right])
    if isinstance(node, A.Filter):
        if _expr_blocks_delta(node.expr):
            return None
        inner = _delta_variants(node.inner)
        return (None if inner is None
                else [A.Filter(node.expr, v) for v in inner])
    if isinstance(node, A.Extend):
        if _expr_blocks_delta(node.expr):
            return None
        inner = _delta_variants(node.inner)
        return (None if inner is None
                else [A.Extend(v, node.var, node.expr) for v in inner])
    if isinstance(node, A.Values):
        return []  # constant across batches: no delta of its own
    return None


def _delta_rewrites(query_ast):
    """Per-pattern delta decompositions of a monotone DISTINCT query,
    or None when the query is ineligible (falls back to snapshot mode).

    A solution that is NEW after appending Δ must use at least one quad
    of Δ, so for patterns t1..tn the new solutions are
    ∪_i Q[t_i ↦ Δ, rest ↦ full] — the classic semi-naive delta rule,
    here with every i's term widened to full data on the non-delta
    patterns (sound for SET semantics; the append dedups, hence the
    DISTINCT requirement).  The monotone fragment covers BGP + FILTER +
    BIND + VALUES + JOIN + UNION (each variant keeps only the branch
    whose pattern is delta'd).  Δ is addressed through a synthetic
    named graph (the batch's quads tagged ``_DELTA_GRAPH`` ride
    alongside the full default-graph data), so each rewrite is plain
    SPARQL algebra — ``GRAPH <delta> { t_i }`` joined with the
    remaining patterns — and the whole existing compiler applies
    unchanged."""
    if not isinstance(query_ast, A.SelectQuery):
        return None
    if query_ast.from_graphs or query_ast.from_named:
        return None
    # peel the solution-modifier wrappers, requiring DISTINCT
    node = query_ast.pattern
    wrappers = []
    distinct = False
    while True:
        if isinstance(node, A.Distinct):
            distinct = True
            wrappers.append(("distinct",))
        elif isinstance(node, A.Reduced):
            wrappers.append(("reduced",))
        elif isinstance(node, A.Project):
            wrappers.append(("project", node.vars))
        else:
            break
        node = node.inner
    if not distinct:
        return None
    variants = _delta_variants(node)
    if not variants:
        return None

    def rewrap(v):
        for w in reversed(wrappers):
            if w[0] == "distinct":
                v = A.Distinct(v)
            elif w[0] == "reduced":
                v = A.Reduced(v)
            else:
                v = A.Project(v, w[1])
        return v

    return [A.SelectQuery(rewrap(v)) for v in variants]


def _write_json_atomic(path: str, obj: dict) -> None:
    """Publish a JSON document with rename atomicity (a reader never
    sees a torn write; a crash mid-write leaves the previous version)."""
    import json
    import tempfile
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def start_standing_queries(spark: SparkSession, drop_dir: str,
                           queries: Dict[str, str], *, quad_log: str,
                           results_dir: str,
                           checkpoint: Optional[str] = None,
                           registry: Optional[str] = None,
                           quads: bool = False,
                           available_now: bool = True,
                           window_batches: Optional[int] = None,
                           incremental: bool = True,
                           max_files_per_trigger: int = 1):
    """:func:`continuous_sparql` with a CRASH-RECOVERABLE registration:
    the standing-query set and every stream location are persisted to a
    registry JSON sidecar (default ``<results_dir>/_registry.json``,
    published atomically) and the last successfully processed batch id
    is recorded after each batch.  After a driver restart,
    :func:`resume_standing_queries` reloads the registry and restarts
    the stream against the SAME checkpoint — Structured Streaming
    replays the one possibly-uncommitted batch, and the per-batch
    idempotence (dynamic-partition log overwrite; keyed anti-join
    snapshot append) makes the replay exactly-once.  A checkpoint is
    mandatory for that guarantee, so one is defaulted here
    (``<results_dir>/_checkpoint``) rather than left optional."""
    checkpoint = checkpoint or os.path.join(results_dir, "_checkpoint")
    registry = registry or os.path.join(results_dir, "_registry.json")
    cfg = {"drop_dir": drop_dir, "queries": dict(queries),
           "quad_log": quad_log, "results_dir": results_dir,
           "checkpoint": checkpoint, "quads": quads,
           "window_batches": window_batches, "incremental": incremental,
           "max_files_per_trigger": max_files_per_trigger,
           "last_batch": None}
    _write_json_atomic(registry, cfg)
    lines = stream_ntriples(spark, drop_dir,
                            max_files_per_trigger=max_files_per_trigger)
    return continuous_sparql(
        lines, queries, quad_log=quad_log, results_dir=results_dir,
        checkpoint=checkpoint, quads=quads, available_now=available_now,
        window_batches=window_batches, incremental=incremental,
        registry=registry)


def resume_standing_queries(spark: SparkSession, registry: str, *,
                            available_now: bool = True):
    """Restart a registered standing-query stream after a driver
    restart: reload the registry written by
    :func:`start_standing_queries` and resume from its checkpoint.
    Returns the new StreamingQuery."""
    import json
    with open(registry) as f:
        cfg = json.load(f)
    lines = stream_ntriples(
        spark, cfg["drop_dir"],
        max_files_per_trigger=cfg.get("max_files_per_trigger", 1))
    return continuous_sparql(
        lines, cfg["queries"], quad_log=cfg["quad_log"],
        results_dir=cfg["results_dir"], checkpoint=cfg["checkpoint"],
        quads=cfg.get("quads", False), available_now=available_now,
        window_batches=cfg.get("window_batches"),
        incremental=cfg.get("incremental", True), registry=registry)


def stream_ntriples(spark: SparkSession, drop_dir: str,
                    max_files_per_trigger: int = 1,
                    pattern: str = "*.n[tq]") -> DataFrame:
    """Streaming frame of raw N-Triples/N-Quads lines from a drop
    directory (new ``.nt``/``.nq`` files appear → new micro-batch)."""
    return (spark.readStream
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .text(os.path.join(drop_dir, pattern)))


def continuous_sparql(lines: DataFrame, queries: Dict[str, str], *,
                      quad_log: str, results_dir: str,
                      base_store=None, quads: bool = False,
                      checkpoint: Optional[str] = None,
                      available_now: bool = True,
                      window_batches: Optional[int] = None,
                      incremental: bool = True,
                      registry: Optional[str] = None):
    """Start the standing-query stream; returns the StreamingQuery
    (callers own ``awaitTermination``/``stop``).

    ``queries`` maps snapshot name → SPARQL text.  After each batch,
    ``results_dir/<name>`` holds that query's full re-evaluation over
    everything ingested so far (∪ ``base_store``'s quads if given).
    ``available_now=True`` drains what's already in the drop dir and
    stops — the testable mode; pass False for a long-running stream.

    ``window_batches=W`` gives C-SPARQL's sliding window: only quads
    from the most recent W micro-batches participate in re-evaluation
    (the base store, if given, always does).  The quad log carries a
    ``__batch`` partition column, so the window filter prunes log
    PARTITIONS — an evaluation never reads expired data, and expired
    partitions can be dropped by retention jobs without touching the
    stream.

    ``incremental=True`` (default) switches MONOTONE standing queries
    (DISTINCT over one BGP + FILTER/BIND — see :func:`_delta_rewrites`)
    to delta evaluation: each batch evaluates only the solutions that
    touch the batch's new quads (per-pattern delta decomposition) and
    APPENDS the genuinely new rows to the snapshot, instead of
    re-evaluating the whole query — per-batch cost scales with |Δ|-
    seeded joins, not with the accumulated corpus.  Non-monotone
    queries (OPTIONAL / MINUS / EXISTS / aggregates / non-DISTINCT)
    automatically keep full snapshot re-evaluation, as does everything
    when ``window_batches`` is set (expiry deletes solutions —
    non-monotone by construction).  The append is idempotent per row
    (anti-join against the current snapshot), so batch replay after a
    crash stays exactly-once.
    """
    from ..operators.update import MutableQuadSource
    from ..plans.compiler import Compiler
    from ..store import Store

    spark = lines.sparkSession

    delta_asts = {}
    if incremental and window_batches is None:
        from ..algebra.parser import parse_query
        for name, sparql in queries.items():
            rewrites = _delta_rewrites(parse_query(sparql))
            if rewrites is not None:
                delta_asts[name] = rewrites

    def _append_delta(st_source, name, rewrites, snap_path) -> None:
        comp = [Compiler(spark, st_source).compile_query(q)
                for q in rewrites]
        new_rows = reduce(lambda a, b: a.unionByName(b), comp)
        cols = new_rows.columns
        kn = [f"__k_{c}" for c in cols]
        # snapshot identity keys are ALWAYS the 128-bit content hash —
        # independent of the source's dictionary width, stable across
        # parquet round-trips
        # dedup over terms + keys, not keys alone: each term struct is
        # determined by its 128-bit content hash, and a key-only dedup
        # compiles the structs into first() buffers that push the dedup
        # onto the Sort+SortAggregate path (r9, guide §5)
        newk = new_rows.select(
            "*", *[T.join_key(new_rows[c]).alias(k)
                   for c, k in zip(cols, kn)]).dropDuplicates()
        prev = spark.read.parquet(snap_path)
        prevk = prev.select(*[T.join_key(prev[c]).alias(k)
                              for c, k in zip(cols, kn)])
        cond = reduce(lambda a, b: a & b,
                      [newk[k].eqNullSafe(prevk[k]) for k in kn])
        newk.join(prevk, cond, "leftanti").select(*cols) \
            .write.mode("append").parquet(snap_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch hands a CLONED session — confs must be set on
        # THAT session or the write below silently ignores them
        bspark = batch_df.sparkSession
        new_quads = parse_nt_lines(batch_df, quads=quads)
        # idempotent under batch REPLAY (driver crash between the log
        # write and the checkpoint commit re-runs this batch_id):
        # dynamic partition overwrite replaces ONLY this batch's
        # partition, so a replayed batch lands exactly once — a plain
        # append would double its quads forever
        prev = bspark.conf.get("spark.sql.sources.partitionOverwriteMode",
                               "static")
        bspark.conf.set("spark.sql.sources.partitionOverwriteMode",
                        "dynamic")
        try:
            new_quads.withColumn("__batch", F.lit(batch_id)) \
                .write.mode("overwrite").partitionBy("__batch") \
                .parquet(quad_log)
        finally:
            bspark.conf.set("spark.sql.sources.partitionOverwriteMode",
                            prev)
        log = spark.read.parquet(quad_log)
        if window_batches is not None:
            log = log.where(
                F.col("__batch") > batch_id - window_batches)
        all_quads = log.drop("__batch")
        if base_store is not None:
            all_quads = base_store.source.quads().unionByName(all_quads)
        # persist: every registered query pattern-scans this frame —
        # don't re-read the log per scan; released before the batch
        # ends so a long-running stream holds at most one copy
        cached = all_quads.persist()
        # separate source for delta evaluation: the full data PLUS a
        # copy of the batch's quads tagged into the synthetic delta
        # graph (GRAPH <delta> patterns in the rewrites address exactly
        # the new quads).  Snapshot-mode queries never see this frame,
        # so a GRAPH ?g pattern cannot pick up the synthetic graph.
        delta_source = None
        if delta_asts:
            # tag ONLY default-graph quads: the monotone BGP's patterns
            # match the default graph, so a named-graph quad (quads=True
            # N-Quads ingest) must not leak into the delta rewrites —
            # snapshot evaluation would never see it either
            dflt = new_quads.where(
                F.col("g")["kind"] == T.KIND_DEFAULT_GRAPH)
            tagged = dflt.withColumn("g", T.iri(F.lit(_DELTA_GRAPH)))
            delta_source = MutableQuadSource(
                spark, cached.unionByName(tagged))
        try:
            st = Store(spark, MutableQuadSource(spark, cached))
            for name, sparql in queries.items():
                snap_path = os.path.join(results_dir, name)
                rewrites = delta_asts.get(name)
                # snapshot must exist COMMITTED (_SUCCESS) before the
                # append path may trust it — a crash mid-overwrite on
                # the init batch must replay as a full evaluation
                if rewrites is not None and os.path.exists(
                        os.path.join(snap_path, "_SUCCESS")):
                    _append_delta(delta_source, name, rewrites, snap_path)
                else:
                    st.query(sparql).write.mode("overwrite") \
                        .parquet(snap_path)
        finally:
            cached.unpersist()
        if registry is not None and os.path.exists(registry):
            # bookkeeping only (the checkpoint is the replay authority):
            # lets operators see stream progress without Spark APIs
            import json
            with open(registry) as f:
                cfg = json.load(f)
            cfg["last_batch"] = batch_id
            _write_json_atomic(registry, cfg)

    writer = lines.writeStream.foreachBatch(process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
