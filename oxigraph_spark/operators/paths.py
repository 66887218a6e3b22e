"""Property-path evaluation (SPARQL §9; SURVEY.md §2.6 PP1–PP8).

Reference: ``lib/spargebra/src/algebra.rs`` · ``PropertyPathExpression``,
evaluated in ``lib/spareval/src/eval.rs`` by an in-memory BFS with a
visited set.  Spark-first re-expression: every path is a *relation*
``(src, dst, sk, dk)`` built from DataFrame ops, where ``sk``/``dk`` are
the endpoints' 128-bit dictionary ids (``terms.join_key`` layout) —
served straight from parquet when the store persisted them
(``quad_store.write(with_keys=True)``), computed map-side once
otherwise.  Every join inside path algebra (sequences, closures) is on
these fixed-width ids; the transitive-closure variants (``p+``/``p*``)
are a semi-naive iterative fixpoint —

    frontier' = (frontier ⋈ edges) \\ paths

with ``localCheckpoint`` per iteration to cut lineage and let AQE re-plan
each step.  When an endpoint is a concrete term we seed the BFS from it
instead of closing the whole relation — the difference between touching
the frontier's partitions and materializing an O(V²) closure at 100 TB.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F

from ..algebra import ast as A
from ..model import terms as T
from ..session import pin


def _key(c: Column) -> Column:
    # default 16-byte hash join key (see terms.join_key); width-aware
    # call sites use compiler._jk so the opt-in 64-bit dictionary mode
    # (source.key_width=64) stays coherent end to end
    return T.join_key(c)


_POS_KEY = {"s": "s_key", "o": "o_key"}


def _dedup_det(df: DataFrame) -> DataFrame:
    """Dedup for frames whose every non-key column is a TERM struct
    functionally determined by its 64-bit dictionary key (the engine's
    identity contract: equal key ⇔ equal lexical form ⇔ equal struct).

    Equivalent to ``dropDuplicates(key columns)`` — but a key-only dedup
    compiles each carried struct into a ``first(struct)`` aggregate
    buffer, which HashAggregate does not support, pushing the whole
    dedup onto the Sort+SortAggregate path (r9 measured:
    plans/r09/PP5_zero_or_one_before.txt vs _after.txt).  Folding the
    determined columns into the grouping keys keeps the aggregation
    buffer EMPTY, so the dedup stays on spill-free HashAggregate
    (optimization guide §5, hash vs sort aggregate)."""
    return df.dropDuplicates()


def _with_keys(df: DataFrame, src_pos: str = "s", dst_pos: str = "o",
               jk=_key, with_graph: bool = False) -> DataFrame:
    """Scan → (src, dst, sk, dk), preferring store-persisted key columns
    over re-hashing the terms (dictionary wiring, SURVEY.md §1.4).
    ``with_graph`` (GRAPH ?var contexts) also carries ``(g, gk)`` so the
    closure stays PER-GRAPH — §18 Graph(?g, P) is a union of per-graph
    evaluations, never a cross-graph stitch."""
    def k(pos: str) -> Column:
        name = _POS_KEY[pos]
        return df[name] if name in df.columns else jk(df[pos])
    cols = [df[src_pos].alias("src"), df[dst_pos].alias("dst"),
            k(src_pos).alias("sk"), k(dst_pos).alias("dk")]
    if with_graph:
        cols += [df["g"].alias("g"), jk(df["g"]).alias("gk")]
    return df.select(*cols)


def _endpoint_nodes(compiler, df: DataFrame,
                    with_graph: bool = False) -> DataFrame:
    """(node, k[, g, gk]) rows for BOTH endpoints of every quad in ONE
    pass: an explode of the (s, o) pair instead of a 2-branch union.
    The union form planned and scanned the quad subtree twice — the
    duplicated branch is pure Catalyst/codegen/scan cost (same fix as
    the closure decode dictionary, r10)."""
    def pos_struct(pos: str):
        name = _POS_KEY[pos]
        k = df[name] if name in df.columns else compiler._jk(df[pos])
        return F.struct(df[pos].alias("node"), k.alias("k"))

    cols = [F.explode(F.array(pos_struct("s"), pos_struct("o"))).alias("e")]
    if with_graph:
        cols += [df["g"].alias("g"), compiler._jk(df["g"]).alias("gk")]
    out = df.select(*cols)
    keep = ["g", "gk"] if with_graph else []
    return out.select(out["e"]["node"].alias("node"),
                      out["e"]["k"].alias("k"), *keep)


def _named_graphs(compiler, gvar) -> DataFrame:
    """Distinct named graphs the GRAPH variable ranges over → (g, gk)
    (respects FROM NAMED via _graph_filter)."""
    df = compiler._graph_filter(compiler.source.scan(), gvar)
    g = df.select(df["g"].alias("g"), compiler._jk(df["g"]).alias("gk"))
    return _dedup_det(g)


def compile_path(compiler, pp: A.PathPattern, graph_ctx,
                 seeds: "Optional[DataFrame]" = None):
    """``seeds`` (TERM column ``src``, optionally its key ``sk``):
    restrict closure evaluation to these start nodes — the path analog of
    the reference's bound-prefix index selection, supplied by the BGP
    compiler when the subject variable is already bound by an earlier
    join operand."""
    from ..plans.compiler import Compiled, _const_term_col, _idname

    path, s, o = pp.path, pp.s, pp.o
    # ground endpoint terms: zero-length sub-paths at any depth must
    # relate these to themselves even outside the graph domain (§9.3)
    grounds = tuple(t for t in (s, o) if not isinstance(t, A.Var))
    wg = isinstance(graph_ctx, A.Var)

    # seeded fast path for closures with a concrete endpoint.  Under a
    # VARIABLE graph context the general per-graph relation runs instead
    # (seed bookkeeping would need a per-graph frontier; Graph(?g, P)
    # with a closure is rare enough that correctness wins over the seed
    # optimization here — the per-graph closure is still one fixpoint)
    if wg:
        rel = _relation(compiler, path, graph_ctx, grounds)
    elif isinstance(path, (A.POneOrMore, A.PZeroOrMore)):
        include_zero = isinstance(path, A.PZeroOrMore)
        if not isinstance(s, A.Var):
            rel = _seeded_closure(compiler, path.inner, graph_ctx,
                                  _const_df(compiler, s), include_zero,
                                  extra_terms=grounds)
        elif seeds is not None:
            # BGP-supplied seeds stand in for a VARIABLE subject: the
            # §18.1.7 var-var rule makes zero-length rows range over
            # nodes(G), so the seeded optimization must intersect the
            # seeds with the graph domain (zero_self=False) — a seed
            # term bound by another operand but absent from the graph
            # gets NO self-pair, exactly like the unseeded evaluation
            # it replaces.  Ground endpoints (above) keep self-pairs
            # per the X-is-a-term ALP rule.
            rel = _seeded_closure(compiler, path.inner, graph_ctx,
                                  seeds, include_zero, zero_self=False)
        elif not isinstance(o, A.Var):
            inv = _relation(compiler, A.PInv(path.inner), graph_ctx,
                            grounds)
            rel = _closure(compiler, inv, _const_df(compiler, o))
            if include_zero:
                # zero-length from a concrete endpoint matches the term
                # itself whether or not it occurs in the graph (§9.3 ALP
                # starts from the node; W3C pp tests assert this)
                rel = rel.unionByName(
                    _self_rows(compiler, _const_df(compiler, o))) \
                         .transform(_dedup_det)
            rel = rel.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst"),
                             F.col("dk").alias("sk"),
                             F.col("sk").alias("dk"))
        else:
            rel = _relation(compiler, path, graph_ctx, grounds)
    elif isinstance(path, A.PZeroOrOne) and not (isinstance(s, A.Var)
                                                 and isinstance(o, A.Var)):
        # path? with a concrete endpoint: the zero-length half is that
        # term's self-pair REGARDLESS of graph membership (same §9.3
        # rule as above) — and only it, so the full-domain node scan
        # `_relation` would union is skipped entirely
        g_term = s if not isinstance(s, A.Var) else o
        rel = _relation(compiler, path.inner, graph_ctx, grounds) \
            .unionByName(_self_rows(compiler, _const_df(compiler, g_term))) \
            .transform(_dedup_det)
    else:
        rel = _relation(compiler, path, graph_ctx, grounds)

    kcol = {"src": "sk", "dst": "dk", "g": "gk"}
    conds = []
    sel = {}
    for col, term in (("src", s), ("dst", o)):
        if isinstance(term, A.Var):
            if term.name in sel:  # ?x path ?x
                conds.append(rel[kcol[sel[term.name]]] == rel[kcol[col]])
            else:
                sel[term.name] = col
        else:
            conds.append(rel[kcol[col]] == compiler._jk(_const_term_col(term)))
    if wg:
        # bind the GRAPH variable from the relation's per-graph column
        if graph_ctx.name in sel:  # GRAPH ?g { ?g path ?x }
            conds.append(rel["gk"] == rel[kcol[sel[graph_ctx.name]]])
        else:
            sel[graph_ctx.name] = "g"
    df = rel
    if conds:
        df = df.where(reduce(lambda a, b: a & b, conds))
    ids = {}
    if sel:
        out_cols = [df[c].alias(v) for v, c in sel.items()]
        if compiler.use_ids:
            # endpoints' dictionary ids ride along: the enclosing BGP
            # joins this relation on them without re-hashing the terms
            for v, c in sel.items():
                ids[v] = _idname(v)
                out_cols.append(df[kcol[c]].alias(ids[v]))
        out = df.select(*out_cols)
    else:
        out = df.select(F.lit(1).alias("__unit"))
    names = frozenset(sel)
    return Compiled(out, names, names, None, None, ids)


def _const_df(compiler, term) -> DataFrame:
    from ..plans.compiler import _const_term_col
    c = _const_term_col(term)
    return compiler.spark.range(1).select(c.alias("src"),
                                          compiler._jk(c).alias("sk"))


def _self_rows(compiler, seeds: DataFrame) -> DataFrame:
    """(node, node) self-pairs of the seed terms — the zero-length rows
    a seeded closure contributes (every term zero-length-reaches itself,
    in or out of the graph's node domain; SPARQL §9.3)."""
    sk = seeds["sk"] if "sk" in seeds.columns else compiler._jk(seeds["src"])
    return seeds.select(seeds["src"].alias("src"),
                        seeds["src"].alias("dst"),
                        sk.alias("sk"), sk.alias("dk"))


# ---------------------------------------------------------------------------
# path → relation(src, dst, sk, dk)
# ---------------------------------------------------------------------------

def _relation(compiler, path, graph_ctx, extra_terms=()) -> DataFrame:
    """Path expression -> (src, dst, sk, dk) relation.

    ``extra_terms``: the enclosing pattern's GROUND endpoint terms.
    Zero-length sub-paths (``p?``/``p*`` at ANY nesting depth) must
    relate these to themselves even when they never occur in the graph
    (SPARQL 9.3 ALP starts from the term) - and they are the ONLY
    non-domain terms that can flow through a path relation (edges
    produce domain terms; zero-length of domain + grounds stays in
    domain + grounds), so extending the identity component by them is
    complete.

    Under a VARIABLE graph context every relation additionally carries
    ``(g, gk)`` and all joins/dedups key on the graph too: Graph(?g, P)
    is the UNION of per-graph evaluations (§18.1.7) — a sequence or
    closure must never stitch an edge from one named graph onto an edge
    from another."""
    wg = isinstance(graph_ctx, A.Var)
    if isinstance(path, A.PLink):
        df = compiler.source.scan(path.iri)
        df = compiler._graph_filter(df, graph_ctx)
        df = df.where((df["p"]["kind"] == T.KIND_IRI)
                      & (df["p"]["lex"] == path.iri))
        return _with_keys(df, jk=compiler._jk, with_graph=wg)
    if isinstance(path, A.PInv):
        r = _relation(compiler, path.inner, graph_ctx, extra_terms)
        cols = [r["dst"].alias("src"), r["src"].alias("dst"),
                r["dk"].alias("sk"), r["sk"].alias("dk")]
        if wg:
            cols += [r["g"], r["gk"]]
        return r.select(*cols)
    if isinstance(path, A.PSeq):
        l = _relation(compiler, path.left, graph_ctx, extra_terms).alias("l")
        r = _relation(compiler, path.right, graph_ctx, extra_terms).alias("r")
        cond = F.col("l.dk") == F.col("r.sk")
        if wg:
            cond = cond & (F.col("l.gk") == F.col("r.gk"))
        cols = [F.col("l.src").alias("src"), F.col("r.dst").alias("dst"),
                F.col("l.sk").alias("sk"), F.col("r.dk").alias("dk")]
        if wg:
            cols += [F.col("l.g").alias("g"), F.col("l.gk").alias("gk")]
        return l.join(r, cond).select(*cols)
    if isinstance(path, A.PAlt):
        return _relation(compiler, path.left, graph_ctx, extra_terms) \
            .unionByName(_relation(compiler, path.right, graph_ctx,
                                   extra_terms))
    if isinstance(path, A.PZeroOrOne):
        return _relation(compiler, path.inner, graph_ctx, extra_terms) \
            .unionByName(_zero_len_for(compiler, graph_ctx, extra_terms)) \
            .transform(_dedup_det)
    if isinstance(path, A.POneOrMore):
        return _closure(compiler,
                        _relation(compiler, path.inner, graph_ctx,
                                  extra_terms), None)
    if isinstance(path, A.PZeroOrMore):
        closed = _closure(compiler,
                          _relation(compiler, path.inner, graph_ctx,
                                    extra_terms), None)
        return closed.unionByName(_zero_len_for(compiler, graph_ctx,
                                                extra_terms)) \
                     .transform(_dedup_det)
    if isinstance(path, A.PNeg):
        df = compiler._graph_filter(compiler.source.scan(), graph_ctx)
        parts = []
        if path.forward or not path.inverse:
            fwd = df.where(df["p"]["kind"] == T.KIND_IRI)
            if path.forward:
                fwd = fwd.where(~df["p"]["lex"].isin(*path.forward))
            parts.append(_with_keys(fwd, jk=compiler._jk, with_graph=wg))
        if path.inverse:
            inv = df.where(df["p"]["kind"] == T.KIND_IRI)
            inv = inv.where(~df["p"]["lex"].isin(*path.inverse))
            parts.append(_with_keys(inv, src_pos="o", dst_pos="s",
                                    jk=compiler._jk, with_graph=wg))
        return reduce(lambda a, b: a.unionByName(b), parts)
    raise NotImplementedError(f"path {type(path).__name__}")


def _zero_len_for(compiler, graph_ctx, extra_terms=()) -> DataFrame:
    """Zero-length path rows (node, node): every term occurring in the
    active graph as subject or object (§9.3 — subtle, see SURVEY.md
    PP7), PLUS the enclosing pattern's ground endpoint terms
    (``extra_terms`` — zero-length relates them to themselves whether
    or not they occur in the graph).  Top-level concrete-endpoint
    closures use :func:`_self_rows` alone instead.

    Under a VARIABLE graph context the rows are per named graph —
    domain nodes of EACH graph, and ground endpoints' self-pairs in
    EVERY named graph (a ground zero-length match holds in a graph the
    term never occurs in)."""
    df = compiler._graph_filter(compiler.source.scan(), graph_ctx)
    wg = isinstance(graph_ctx, A.Var)
    both = _endpoint_nodes(compiler, df, with_graph=wg)
    if wg:
        graphs = _named_graphs(compiler, graph_ctx)
        for t in extra_terms:
            gdf = _const_df(compiler, t)
            both = both.unionByName(
                F.broadcast(gdf).crossJoin(graphs).select(
                    gdf["src"].alias("node"), gdf["sk"].alias("k"),
                    graphs["g"], graphs["gk"]))
        nodes = _dedup_det(both)
        return nodes.select(nodes["node"].alias("src"),
                            nodes["node"].alias("dst"),
                            nodes["k"].alias("sk"), nodes["k"].alias("dk"),
                            nodes["g"], nodes["gk"])
    for t in extra_terms:
        gdf = _const_df(compiler, t)
        both = both.unionByName(gdf.select(gdf["src"].alias("node"),
                                           gdf["sk"].alias("k")))
    nodes = _dedup_det(both)
    return nodes.select(nodes["node"].alias("src"), nodes["node"].alias("dst"),
                        nodes["k"].alias("sk"), nodes["k"].alias("dk"))


# ---------------------------------------------------------------------------
# transitive closure (semi-naive fixpoint)
# ---------------------------------------------------------------------------

# Each round extends the frontier by TWO edge hops, so the reachable
# diameter is 2*MAX_ITERATIONS + 1.  Deeper graphs raise instead of
# silently truncating the closure.
MAX_ITERATIONS = 64


def _one_hop(frontier: DataFrame, edges: DataFrame,
             broadcast_frontier: bool = False,
             with_graph: bool = False) -> DataFrame:
    """One hop over ENCODED relations (sk, dk) — plain 16-byte column
    equality, no per-round key recomputation.  NOT deduplicated: callers
    chain hops and distinct the round's union once (one shuffle per
    round instead of three).  ``with_graph``: relations carry ``gk`` and
    hops stay within one named graph."""
    f = F.broadcast(frontier) if broadcast_frontier else frontier
    f, e = f.alias("f"), edges.alias("e")
    cond = F.col("f.dk") == F.col("e.sk")
    cols = [F.col("f.sk").alias("sk"), F.col("e.dk").alias("dk")]
    if with_graph:
        cond = cond & (F.col("f.gk") == F.col("e.gk"))
        cols.append(F.col("f.gk").alias("gk"))
    return f.join(e, cond).select(*cols)


def _closure(compiler, edges: DataFrame, start: Optional[DataFrame]) -> DataFrame:
    """Semi-naive transitive closure with dictionary-encoded iteration
    (late materialization — the reference's ``EncodedTerm`` id-space
    evaluation, ``storage/numeric_encoder.rs``, as a Spark plan shape).

    The fixpoint never touches TERM structs: the relation arrives already
    carrying 16-byte content-hash ids ``(sk, dk)`` (from parquet when the
    store persisted them) plus its terms; every round's join / distinct /
    anti-join shuffles two fixed-width binaries per row, and the
    accumulated closure decodes back to terms through TWO dictionary
    joins at the very end.  At 100 TB the difference per round is
    shuffling 32 B/row versus two full term structs (lex strings
    included); locally it also keeps the per-round Catalyst plan small —
    key equality instead of rebuilt hash expressions.

    Per round: two chained hop joins (halves fixpoint driver
    round-trips) deduplicated ONCE, one anti-join against the
    accumulated paths, one ``localCheckpoint`` of the NEW delta only.
    The accumulated path set is a lazy union of checkpointed deltas —
    never re-shuffled or re-materialized as it grows.  The raw edge
    relation is NOT pre-deduplicated: the store holds unique quads and
    every downstream consumer (initial frontier, per-round union)
    distincts anyway, so a global edge shuffle would be pure cost.

    Cold-build discipline (round-5): under AQE, ``localCheckpoint``
    forces physical planning AND materializes every exchange stage
    synchronously, so each checkpointed frame costs a driver codegen +
    scheduling round even when lazy.  The fixpoint therefore
    checkpoints ONLY what iterations actually touch — the narrow
    8/16-byte ``(sk, dk)`` relation and the per-round deltas.  The
    term dictionary stays a lazy plan over the raw edge scans: it is
    consumed exactly once, by the final decode join, where its two
    references collapse to one shuffle via exchange reuse — deferring
    it merges its work into the decode job instead of paying a
    separate synchronous materialization before round 1."""
    wg = "gk" in edges.columns  # GRAPH ?var context: per-graph closure
    kcols = ["gk", "sk", "dk"] if wg else ["sk", "dk"]
    if start is not None:
        # seeded: the loop only ever touches (sk, dk) — checkpoint the
        # NARROW relation so the loop's materialization never builds
        # 9-field TERM structs in memory; the decode's pruned
        # dictionary re-derives terms from the raw (lazy) edge scans
        # once, inside the (checkpointed) decode
        ek = edges.select(*kcols).transform(pin)
    else:
        # unseeded: the full-domain decode dictionary needs the term
        # payloads anyway — one wide checkpoint serves both the loop
        # and the dictionary
        edges = edges.transform(pin)
        ek = edges.select(*kcols)
    # (k, term) endpoint rows in ONE pass over the edge relation: an
    # explode of both endpoints per row instead of a 2-branch union.
    # The union form planned (and scanned) the whole edges subtree
    # TWICE — for the seeded closure that subtree is the raw per-
    # predicate scans with term/key expressions, so the duplicated
    # branch dominated the decode plan's Catalyst+codegen cold cost
    # (r10 CPU-time A/B ×3: construct 46.5→29.9 s JVM CPU median) and
    # doubles the decode's scan work at scale.
    endpoints = edges.select(F.explode(F.array(
        F.struct(F.col("sk").alias("k"), F.col("src").alias("term")),
        F.struct(F.col("dk").alias("k"), F.col("dst").alias("term"))))
        .alias("e")).select("e.k", "e.term")
    gdic = (_dedup_det(edges.select("gk", "g"))
            if wg else None)
    if start is not None:
        sk = start["sk"] if "sk" in start.columns else compiler._jk(start["src"])
        sk0 = start.select(sk.alias("k")).distinct()
        paths = ek.join(F.broadcast(sk0), ek["sk"] == sk0["k"], "leftsemi")
    else:
        paths = ek
    # lazy: materialized by round 1's count() together with everything
    # else — an eager checkpoint here would cost one extra driver sync
    frontier = paths.distinct().transform(pin)
    paths = frontier
    # seeded closures keep a bounded frontier (reachable set of the seed
    # nodes): broadcasting it turns each round's join into a map-side
    # broadcast join — the big edge relation is never shuffled.  Unseeded
    # closures keep the shuffle join (the frontier IS the full relation).
    bc = start is not None
    for _ in range(MAX_ITERATIONS):
        hop1 = _one_hop(frontier, ek, broadcast_frontier=bc, with_graph=wg)
        if not bc:
            # unseeded frontiers are whole relations: dedup between the
            # chained hops bounds the intermediate at O(V^2) rows (multi-
            # predecessor fan-in would otherwise square the join input)
            hop1 = hop1.distinct()
        stepped = hop1.unionByName(
            _one_hop(hop1, ek, broadcast_frontier=bc,
                     with_graph=wg)).distinct()
        seen = paths.select(*[F.col(c).alias("p" + c) for c in kcols])
        # lazy checkpoint + count = ONE job per round (the count action
        # materializes the checkpoint); an eager checkpoint followed by
        # isEmpty would cost two driver round-trips per round
        new = stepped.join(
            seen,
            reduce(lambda a, b: a & b,
                   [stepped[c] == seen["p" + c] for c in kcols]),
            "leftanti").transform(pin)
        if new.count() == 0:
            return _decode(paths, endpoints, seeded=start is not None,
                           gdic=gdic)
        paths = paths.unionByName(new)
        frontier = new
    raise RuntimeError(
        f"property-path closure did not converge within {2 * MAX_ITERATIONS} "
        "edge hops; raise oxigraph_spark.operators.paths.MAX_ITERATIONS for "
        "deeper graphs")


def _decode(paths: DataFrame, endpoints: DataFrame,
            seeded: bool, gdic: Optional[DataFrame] = None) -> DataFrame:
    """Build the decode dictionary and materialize the closure's terms.

    Seeded closures decode through a PRUNED dictionary: the closure's
    key set (bounded — it is the seed-reachable relation) semi-joins
    the raw endpoint rows before the distinct, so the dedup shuffle
    covers only reachable terms instead of the store's full endpoint
    domain; the whole thing stays lazy and runs inside the final job
    (AQE broadcasts the key set when it is small).  Unseeded closures
    keep the full-domain dictionary, checkpointed so its one shuffle is
    shared by both decode joins."""
    if seeded:
        keys = paths.select("sk").unionByName(
            paths.select(F.col("dk").alias("sk"))) \
            .distinct().select(F.col("sk").alias("kk"))
        dic = endpoints.join(keys, endpoints["k"] == keys["kk"],
                             "leftsemi").transform(_dedup_det)
        # checkpoint the DECODED relation (it is bounded — the seed-
        # reachable closure): repeated consumption (cached plans
        # re-counting, multi-operand BGPs) must not re-run the edge
        # scans + pruned dedup per action
        return _decode_pairs(paths, dic, gdic).transform(pin)
    dic = _dedup_det(endpoints).transform(pin)
    return _decode_pairs(paths, dic, gdic)


def _decode_pairs(pairs: DataFrame, dic: DataFrame,
                  gdic: Optional[DataFrame] = None) -> DataFrame:
    """(sk, dk) key pairs → (src, dst, sk, dk) via two dictionary joins —
    the LATE materialization step, run once after the fixpoint.  With a
    graph dictionary (``gdic``: gk → g, GRAPH ?var contexts) the graph
    term rides back too."""
    ds = dic.select(F.col("k").alias("__sk"), F.col("term").alias("src"))
    dd = dic.select(F.col("k").alias("__dk"), F.col("term").alias("dst"))
    out = pairs.join(ds, pairs["sk"] == ds["__sk"]) \
               .join(dd, pairs["dk"] == dd["__dk"])
    if gdic is not None:
        # plain equi-join: AQE broadcasts when the graph dictionary is
        # small; with millions of named graphs it stays a shuffle join
        gd = gdic.select(F.col("gk").alias("__gk"), F.col("g").alias("g"))
        return out.join(gd, pairs["gk"] == gd["__gk"]) \
                  .select("src", "dst", "sk", "dk", "g",
                          pairs["gk"].alias("gk"))
    return out.select("src", "dst", "sk", "dk")


def _seeded_closure(compiler, inner_path, graph_ctx, seeds: DataFrame,
                    include_zero: bool, extra_terms=(),
                    zero_self: bool = True) -> DataFrame:
    edges = _relation(compiler, inner_path, graph_ctx, extra_terms)
    out = _closure(compiler, edges, seeds)
    if include_zero:
        if zero_self:
            # ground-endpoint seeding: zero-length reaches the start
            # term even when it has no edges and does not occur in the
            # graph at all (§9.3 ALP with X a term)
            zero = _self_rows(compiler, seeds)
        else:
            # variable-subject seeding (BGP-supplied): §18.1.7 var-var
            # zero-length ranges over nodes(G) — intersect the domain
            # with the seed set (broadcast-semi BEFORE the distinct, so
            # the full term domain is never deduplicated)
            zero = _zero_len_seeds(compiler, graph_ctx, seeds)
        out = out.unionByName(zero).transform(_dedup_det)
    return out


def _zero_len_seeds(compiler, graph_ctx, seeds: DataFrame) -> DataFrame:
    """(node, node) self-pairs of graph-domain terms restricted to the
    seed set — the zero-length rows a VARIABLE-subject seeded closure
    contributes."""
    df = compiler._graph_filter(compiler.source.scan(), graph_ctx)
    both = _endpoint_nodes(compiler, df)
    sk = seeds["sk"] if "sk" in seeds.columns else compiler._jk(seeds["src"])
    both = both.join(F.broadcast(seeds.select(sk.alias("__sk"))),
                     both["k"] == F.col("__sk"), "leftsemi")
    nodes = _dedup_det(both)
    return nodes.select(nodes["node"].alias("src"),
                        nodes["node"].alias("dst"),
                        nodes["k"].alias("sk"), nodes["k"].alias("dk"))
