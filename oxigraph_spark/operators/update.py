"""SPARQL 1.1 Update (SURVEY.md §2.8 U1–U9) as batch table rewrites.

Reference: ``lib/spargebra/src/update.rs`` · ``GraphUpdateOperation`` parsed
forms, executed transactionally in ``lib/oxigraph/src/sparql/update.rs``.
Our execution model is Spark-native batch: each operation produces a NEW
quads DataFrame from the old one (union / left_anti / filter) — RDF graphs
are sets, so inserts dedup and deletes anti-join on term identity.

Durability: an in-memory ``MutableQuadSource`` is single-session;
``sources.quad_store.TransactionalQuadStore`` adds serializable
multi-writer commits (manifest CAS + ``update_with_retry`` backoff —
r6/r7).  At 100 TB each op is one shuffle-free union or one anti-join
on the narrow term_key.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from typing import List, Optional, Tuple, Union

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..algebra import ast as A
from ..model import terms as T
from ..session import pin, pin_eager


# -- operation ASTs (mirror GraphUpdateOperation) ---------------------------

@dataclass(frozen=True)
class QuadTemplate:
    s: A.TermOrVar
    p: A.TermOrVar
    o: A.TermOrVar
    g: Optional[Union[A.NamedNode, A.Var]] = None  # None = default graph


@dataclass(frozen=True)
class InsertData:
    quads: Tuple[QuadTemplate, ...]


@dataclass(frozen=True)
class DeleteData:
    quads: Tuple[QuadTemplate, ...]


@dataclass(frozen=True)
class DeleteInsert:
    delete: Tuple[QuadTemplate, ...]
    insert: Tuple[QuadTemplate, ...]
    pattern: Optional[A.GraphPattern]  # None → DELETE WHERE shorthand
    # USING / USING NAMED (§3.1.5.3): the WHERE clause's dataset, exactly
    # like FROM / FROM NAMED for queries; overrides WITH for the WHERE
    using: Tuple[str, ...] = ()
    using_named: Tuple[str, ...] = ()


@dataclass(frozen=True)
class Clear:
    target: str                      # 'DEFAULT' | 'NAMED' | 'ALL' | 'GRAPH'
    graph: Optional[str] = None


@dataclass(frozen=True)
class Drop(Clear):
    pass


@dataclass(frozen=True)
class Create:
    graph: str


@dataclass(frozen=True)
class CopyMoveAdd:
    kind: str                        # 'COPY' | 'MOVE' | 'ADD'
    src: Optional[str]               # None = DEFAULT
    dst: Optional[str]
    silent: bool = False


@dataclass(frozen=True)
class Load:
    source: str                      # file IRI/path (no network here)
    graph: Optional[str] = None      # INTO GRAPH target
    silent: bool = False


UpdateOp = Union[InsertData, DeleteData, DeleteInsert, Clear, Drop, Create,
                 CopyMoveAdd, Load]


# -- mutable store ----------------------------------------------------------

class MutableQuadSource:
    """In-memory quads DataFrame usable as a compiler source AND as the
    target of update operations."""

    def __init__(self, spark: SparkSession, df: DataFrame,
                 key_width: int = 64, dedup: bool = True):
        self.spark = spark
        # an RDF dataset is a SET of quads: a statement written twice in
        # a document is ONE triple, so BGP scans must never see the
        # duplicate (round-9 — updates already held the invariant via
        # distinct()/anti-joins; the initial load did not).  Callers
        # that already hold a deduplicated frame pass dedup=False.
        self.df = df.dropDuplicates() if dedup else df
        # identity-key width the compiler uses over this source (64 =
        # compact single-xxhash64 longs, model.terms.join_key64 —
        # the default; 128 = struct double-hash fallback)
        self.key_width = key_width
        # bumped on every mutation; Store's compiled-plan cache keys on
        # it so cached plans over a mutated source are never served
        self.generation = 0

    @classmethod
    def from_source(cls, spark: SparkSession, source) -> "MutableQuadSource":
        # materialize once: update execution pattern-scans the store many
        # times (templates + WHERE + anti-joins); without this every scan
        # re-reads the full per-predicate union from parquet.  Inherit
        # the source's key width so Store.update keeps the same
        # dictionary mode end to end.
        # dedup=False: engine sources hold the set invariant already
        # (direct mapping is relational-unique; ParquetQuadStore.write
        # dedups at ingest; this class dedups raw frames on __init__)
        return cls(spark, source.quads().transform(pin_eager),
                   key_width=getattr(source, "key_width", 64), dedup=False)

    def scan(self, p_lex: Optional[str] = None) -> DataFrame:
        df = self.df
        if p_lex is not None:
            df = df.where((df["p"]["kind"] == T.KIND_IRI)
                          & (df["p"]["lex"] == p_lex))
        return df

    def quads(self) -> DataFrame:
        return self.df

    # -- execution ---------------------------------------------------------

    def apply(self, op: UpdateOp) -> None:
        if isinstance(op, InsertData):
            self.df = self.df.unionByName(
                self._ground_quads(op.quads, freshen_bnodes=True)).distinct()
        elif isinstance(op, DeleteData):
            self.df = self._anti(self.df, self._ground_quads(op.quads))
        elif isinstance(op, DeleteInsert):
            self._delete_insert(op)
        elif isinstance(op, (Clear, Drop)):
            self.df = self.df.where(~self._graph_pred(op))
        elif isinstance(op, Create):
            pass  # graphs exist implicitly in the quads model
        elif isinstance(op, CopyMoveAdd):
            self._copy_move_add(op)
        elif isinstance(op, Load):
            self._load(op)
        else:
            raise TypeError(type(op))
        self.df = self.df.transform(pin)
        self.generation += 1

    def apply_all(self, ops: List[UpdateOp]) -> None:
        for op in ops:
            self.apply(op)

    def _graph_pred(self, op: Clear):
        g = self.df["g"]
        if op.target == "DEFAULT":
            return g["kind"] == T.KIND_DEFAULT_GRAPH
        if op.target == "NAMED":
            return g["kind"] != T.KIND_DEFAULT_GRAPH
        if op.target == "ALL":
            return F.lit(True)
        return (g["kind"] == T.KIND_IRI) & (g["lex"] == op.graph)

    def _ground_quads(self, quads: Tuple[QuadTemplate, ...],
                      freshen_bnodes: bool = False) -> DataFrame:
        from ..plans.compiler import _term_to_py
        import uuid
        # bnodes in INSERT DATA are fresh per operation (§19.6): suffix
        # the labels so repeats never merge with existing store bnodes
        suffix = uuid.uuid4().hex[:12]

        def fresh(t):
            if not freshen_bnodes:
                return t
            if isinstance(t, A.BlankNode):
                return A.BlankNode(f"{t.label}_{suffix}")
            if isinstance(t, A.QuotedTriple):
                return A.QuotedTriple(fresh(t.s), fresh(t.p), fresh(t.o))
            return t

        rows = []
        for q in quads:
            gterm = q.g if q.g is not None else None
            rows.append((
                _term_to_py(fresh(q.s)), _term_to_py(fresh(q.p)),
                _term_to_py(fresh(q.o)),
                _term_to_py(gterm) if gterm is not None
                else (T.KIND_DEFAULT_GRAPH, "", None, None, None, None,
                      None, None, None)))
        from pyspark.sql.types import StructField, StructType
        schema = StructType([StructField(c, T.TERM_SCHEMA)
                             for c in ("s", "p", "o", "g")])
        return self.spark.createDataFrame(rows, schema)

    def _anti(self, df: DataFrame, remove: DataFrame) -> DataFrame:
        r = remove.select(*[remove[c].alias(f"{c}__r") for c in ("s", "p", "o", "g")])
        cond = reduce(lambda a, b: a & b, [
            T.join_key(df[c]) == T.join_key(r[f"{c}__r"])
            for c in ("s", "p", "o", "g")])
        return df.join(F.broadcast(r.distinct()), cond, "leftanti")

    def _instantiate(self, templates: Tuple[QuadTemplate, ...],
                     sol: "DataFrame", sol_vars) -> DataFrame:
        """Template × solutions → quads (CONSTRUCT-style; incomplete rows
        dropped, invalid RDF positions dropped — spec §19.6)."""
        from ..plans.compiler import (_template_has_bnode,
                                      _template_term_col)
        import uuid
        if any(_template_has_bnode(tq.s, tq.p, tq.o) for tq in templates):
            # fresh bnode per solution, same label → same bnode across
            # template quads within a solution (see _compile_construct)
            sol = sol.withColumn(
                "__crow", F.monotonically_increasing_id()
            ).transform(pin)
        env = {v: sol[v] for v in sol_vars}
        bprefix = f"ub{uuid.uuid4().hex[:8]}"
        frames = []
        for tq in templates:
            def col_of(term):
                if term is None:
                    return T.default_graph()
                return _template_term_col(term, env, bprefix)

            row = sol.select(col_of(tq.s).alias("s"), col_of(tq.p).alias("p"),
                             col_of(tq.o).alias("o"), col_of(tq.g).alias("g"))
            row = row.where(F.col("s").isNotNull() & F.col("p").isNotNull()
                            & F.col("o").isNotNull()
                            & (F.col("s")["kind"] != T.KIND_LITERAL)
                            & (F.col("p")["kind"] == T.KIND_IRI)
                            # GRAPH ?g templates: unbound/invalid graph
                            # labels drop the quad (names are IRIs or
                            # bnodes; None lowered to the default-graph
                            # sentinel above)
                            & F.col("g").isNotNull()
                            & F.col("g")["kind"].isin(
                                T.KIND_IRI, T.KIND_BNODE,
                                T.KIND_DEFAULT_GRAPH))
            frames.append(row)
        if not frames:
            return self.spark.createDataFrame([], self.df.schema)
        return reduce(lambda a, b: a.unionByName(b), frames).distinct()

    def _delete_insert(self, op: DeleteInsert) -> None:
        from ..plans.compiler import Compiler
        pattern = op.pattern
        if pattern is None:
            # DELETE WHERE: the template IS the pattern — quads with a
            # graph label match inside that GRAPH (incl. WITH rewrites);
            # quoted triples with variables lower to fresh vars + accessor
            # constraints, exactly as the parser does for WHERE patterns
            import itertools
            from ..algebra.parser import apply_qt_lowerings
            counter = itertools.count()
            lowerings: list = []

            def strip(term):
                if not isinstance(term, A.QuotedTriple):
                    return term
                s, p, o = strip(term.s), strip(term.p), strip(term.o)
                if all(not isinstance(x, A.Var) for x in (s, p, o)):
                    return term
                v = A.Var(f"__dqt{next(counter)}")
                lowerings.append((v, s, p, o))
                return v

            groups: dict = {}
            for q in op.delete:
                groups.setdefault(q.g, []).append(
                    A.TriplePattern(strip(q.s), strip(q.p), strip(q.o)))
            parts = []
            for g, tps in groups.items():
                bgp = A.BGP(tuple(tps))
                parts.append(bgp if g is None else A.Graph(g, bgp))
            pattern = reduce(lambda a, b: A.Join(a, b), parts) \
                if parts else A.BGP()
            if lowerings:
                pattern = apply_qt_lowerings(pattern, lowerings)
        compiler = Compiler(self.spark, self)
        # USING / USING NAMED define the WHERE clause's active dataset —
        # same semantics as FROM / FROM NAMED (_graph_filter consults
        # these attributes)
        compiler._from_graphs = tuple(getattr(op, "using", ()) or ())
        compiler._from_named = tuple(getattr(op, "using_named", ()) or ())
        sol = compiler.compile_pattern(pattern)
        # both template sets instantiate against the ORIGINAL store state
        to_delete = self._instantiate(op.delete, sol.df, sol.vars) \
            if op.delete else None
        to_insert = self._instantiate(op.insert, sol.df, sol.vars) \
            if op.insert else None
        df = self.df
        if to_delete is not None:
            df = self._anti(df, to_delete)
        if to_insert is not None:
            df = df.unionByName(to_insert).distinct()
        self.df = df

    def _copy_move_add(self, op: CopyMoveAdd) -> None:
        def pred(name: Optional[str]):
            g = self.df["g"]
            if name is None:
                return g["kind"] == T.KIND_DEFAULT_GRAPH
            return (g["kind"] == T.KIND_IRI) & (g["lex"] == name)

        dst_g = (T.default_graph() if op.dst is None
                 else T.iri(F.lit(op.dst)))
        moved = self.df.where(pred(op.src)).select(
            "s", "p", "o", dst_g.alias("g"))
        # §3.2.3-5: a NON-EXISTENT named source graph is an ERROR unless
        # SILENT (quads-only model: a named graph exists iff it has
        # quads; DEFAULT always exists).  Either way the destination is
        # untouched — the old behavior "clear the destination then
        # insert nothing" destroyed data.
        if op.src is not None and not moved.take(1):
            if not op.silent:
                raise ValueError(
                    f"{op.kind}: source graph <{op.src}> does not exist "
                    "(no quads); use SILENT to make this a no-op")
            return
        if op.src == op.dst:           # COPY/MOVE/ADD g TO g: no-op
            return
        df = self.df
        if op.kind in ("COPY", "MOVE"):
            df = df.where(~pred(op.dst))
        if op.kind == "MOVE":
            df = df.where(~pred(op.src))
        self.df = df.unionByName(moved).distinct()

    def _load(self, op: Load) -> None:
        """LOAD <doc> [INTO GRAPH g]: read of a local/shared-fs RDF
        document (``file://`` IRIs or plain paths, distributed) or an
        ``http(s)://`` document (driver-side fetch → temp file → same
        format readers; content negotiation via Accept, format from the
        Content-Type with an extension fallback — the reference fetches
        the same way, ``Store::load_from_reader`` + its HTTP client).
        SILENT turns any failure into a no-op per §3.1.31."""
        from ..sources.rdf_io import load_rdf
        path = op.source
        if path.startswith("file://"):
            path = path[len("file://"):]
        try:
            if path.startswith(("http://", "https://")):
                quads = self._fetch_remote(path)
            elif "://" in path:
                raise ValueError(
                    f"LOAD supports file/http(s) URIs, got {op.source}")
            else:
                quads = load_rdf(self.spark, path)
            # force the read NOW: the strict N-Triples parser validates
            # lazily in-pass (round-8), so SILENT must materialize the
            # document inside this try to keep §3.1.31 error semantics.
            # LOAD targets bounded documents; pinning also avoids
            # re-reading the file on every downstream action.
            quads = pin_eager(quads)
        except Exception:
            if op.silent:
                return
            raise
        g = (T.iri(F.lit(op.graph)) if op.graph is not None
             else T.default_graph())
        quads = quads.select("s", "p", "o", g.alias("g"))
        self.df = self.df.unionByName(quads).distinct()

    _CTYPE_EXT = {
        "application/n-triples": ".nt", "application/n-quads": ".nq",
        "text/turtle": ".ttl", "application/trig": ".trig",
        "application/rdf+xml": ".rdf", "application/ld+json": ".jsonld",
        "text/plain": ".nt",
    }

    def _fetch_remote(self, url: str):
        """Driver-side HTTP GET of one RDF document → quads DataFrame.
        Bounded documents only (protocol responses, vocabularies); bulk
        corpora belong on shared storage read by ``file://`` paths."""
        import tempfile
        import urllib.request
        from ..sources.rdf_io import load_rdf
        req = urllib.request.Request(url, headers={"Accept": (
            "application/n-triples, text/turtle;q=0.9, "
            "application/n-quads;q=0.9, application/trig;q=0.8, "
            "application/rdf+xml;q=0.7, application/ld+json;q=0.7")})
        with urllib.request.urlopen(req, timeout=60) as resp:
            ctype = (resp.headers.get("Content-Type") or "").split(";")[0]
            body = resp.read()
        ext = self._CTYPE_EXT.get(ctype.strip().lower())
        if ext is None:  # fall back to the URL's extension
            tail = url.split("?")[0].rsplit("/", 1)[-1]
            ext = "." + tail.rsplit(".", 1)[-1] if "." in tail else ".nt"
        with tempfile.NamedTemporaryFile(suffix=ext, delete=False) as f:
            f.write(body)
            tmp = f.name
        try:
            # materialize before the temp file disappears (lazy reads
            # would fail later); remote docs are bounded so this is fine
            return load_rdf(self.spark, tmp).transform(pin_eager)
        finally:
            import os as _os
            _os.unlink(tmp)
