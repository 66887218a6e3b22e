"""JSON-LD reader/writer — expanded form (SURVEY.md §2.1 S6).

Reference: ``lib/oxjsonld/src/`` · upstream parses JSON-LD 1.0 with
context processing.  This implementation covers the EXPANDED document
form (the canonical, context-free shape every JSON-LD processor can
produce via the standard ``expand()`` operation): an array of node
objects keyed by absolute IRIs, with ``@value``/``@type``/``@language``
value objects, ``@id`` references, ``@list`` collections and ``@graph``
containers.  Compacted documents must be expanded first (context
processing needs remote-``@context`` fetches — no network here);
this restriction is documented, not silent: a top-level ``@context``
raises.

Spark-first shape: same whole-document parallelism as RDF/XML and
Turtle — :func:`jsonld_to_ntriples` converts one file per task, then
N-Triples reads line-parallel.  Driver-side small reader + expanded
serializer complete the interop surface.
"""

from __future__ import annotations

import json
from typing import Iterator, List, Optional, Tuple

from ..algebra import ast as A

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_STRING = XSD + "string"

Triple = Tuple[object, object, object, object]  # s, p, o, graph|None


class _Ctx:
    def __init__(self, bnode_prefix: str = "jb"):
        self.prefix = bnode_prefix
        self.n = 0
        self.relabel: dict = {}

    def bnode(self) -> A.BlankNode:
        self.n += 1
        return A.BlankNode(f"{self.prefix}{self.n}")

    def ref(self, ident: str):
        """``@id`` string → term (``_:`` labels relabel through the
        per-document prefix so files never collide)."""
        if ident.startswith("_:"):
            if ident not in self.relabel:
                self.relabel[ident] = self.bnode()
            return self.relabel[ident]
        return A.NamedNode(ident)


def parse_jsonld(doc, bnode_prefix: str = "jb") -> List[Triple]:
    """Expanded JSON-LD document (parsed JSON) → ground quads
    ``(s, p, o, graph-or-None)``."""
    ctx = _Ctx(bnode_prefix)
    out: List[Triple] = []
    _top(doc, ctx, out, None)
    return out


def _top(doc, ctx: _Ctx, out: List[Triple], graph):
    if isinstance(doc, list):
        for node in doc:
            _node(node, ctx, out, graph)
        return
    if isinstance(doc, dict):
        if "@context" in doc:
            raise NotImplementedError(
                "compacted JSON-LD (@context) is not supported: expand the "
                "document first (jsonld.expand) — context processing "
                "requires remote fetches unavailable in this environment")
        if set(doc) <= {"@graph", "@id"} and "@graph" in doc and "@id" not in doc:
            _top(doc["@graph"], ctx, out, graph)
            return
        _node(doc, ctx, out, graph)
        return
    raise ValueError(f"not an expanded JSON-LD document: {type(doc)}")


def _node(node: dict, ctx: _Ctx, out: List[Triple], graph):
    """Node object → subject term (emits its triples)."""
    if "@context" in node:
        raise NotImplementedError("compacted JSON-LD (@context): expand first")
    subj = ctx.ref(node["@id"]) if "@id" in node else ctx.bnode()
    for t in _as_list(node.get("@type", [])):
        out.append((subj, A.NamedNode(RDF_NS + "type"), ctx.ref(t), graph))
    if "@graph" in node:  # named graph container
        _top(node["@graph"], ctx, out, subj)
    for key, values in node.items():
        if key.startswith("@"):
            continue
        pred = A.NamedNode(key)
        for v in _as_list(values):
            out.append((subj, pred, _object(v, ctx, out, graph), graph))
    return subj


def _as_list(v):
    return v if isinstance(v, list) else [v]


def _object(v, ctx: _Ctx, out: List[Triple], graph):
    if isinstance(v, dict):
        if "@value" in v:
            return _value(v)
        if "@list" in v:
            return _rdf_list([_object(i, ctx, out, graph)
                              for i in _as_list(v["@list"])], ctx, out, graph)
        if set(v) == {"@id"}:
            return ctx.ref(v["@id"])
        return _node(v, ctx, out, graph)  # embedded node object
    # bare JSON scalar (legal in expanded form as a value shortcut)
    return _value({"@value": v})


def _value(v: dict):
    val = v["@value"]
    if "@language" in v:
        return A.Literal(str(val), lang=v["@language"])
    dt = v.get("@type")
    if isinstance(val, bool):
        return A.Literal("true" if val else "false",
                         datatype=dt or XSD + "boolean")
    if isinstance(val, int):
        return A.Literal(str(val), datatype=dt or XSD + "integer")
    if isinstance(val, float):
        lex = repr(val) if val == val and abs(val) != float("inf") else (
            "NaN" if val != val else ("INF" if val > 0 else "-INF"))
        return A.Literal(lex, datatype=dt or XSD + "double")
    return A.Literal(str(val), datatype=dt)


def _rdf_list(items, ctx: _Ctx, out: List[Triple], graph):
    head = A.NamedNode(RDF_NS + "nil")
    first, rest = A.NamedNode(RDF_NS + "first"), A.NamedNode(RDF_NS + "rest")
    for item in reversed(items):
        cell = ctx.bnode()
        out.append((cell, first, item, graph))
        out.append((cell, rest, head, graph))
        head = cell
    return head


# -- Spark wiring -----------------------------------------------------------

def jsonld_text_to_nt_lines(text: str) -> List[str]:
    """One expanded JSON-LD document → N-Quads/N-Triples lines (pure
    Python — runs on executors inside :func:`jsonld_to_ntriples`)."""
    import zlib
    from ..plans.compiler import _py_token
    prefix = f"jb{zlib.crc32(text.encode('utf-8', 'ignore')):08x}n"
    lines = []
    for s, p, o, g in parse_jsonld(json.loads(text), bnode_prefix=prefix):
        gtok = f" {_py_token(g)}" if g is not None else ""
        lines.append(f"{_py_token(s)} {_py_token(p)} {_py_token(o)}{gtok} .")
    return lines


def jsonld_to_ntriples(spark, in_path: str, out_path: str) -> None:
    """Distributed JSON-LD→N-Quads conversion, one task per file (JSON
    documents are not line-splittable); output reads line-parallel."""
    files = spark.read.text(in_path, wholetext=True)

    def convert(batches) -> Iterator:
        import pandas as pd
        for pdf in batches:
            lines: List[str] = []
            for text in pdf["value"]:
                lines.extend(jsonld_text_to_nt_lines(text))
            yield pd.DataFrame({"value": lines})

    files.mapInPandas(convert, "value string") \
         .write.mode("overwrite").text(out_path)


def read_jsonld_small(spark, path: str, max_bytes: int = 64 << 20):
    """Driver-side reader for ONE small expanded JSON-LD document →
    quads DataFrame; corpora go through :func:`jsonld_to_ntriples`."""
    import os
    size = os.path.getsize(path)
    if size > max_bytes:
        raise ValueError(
            f"JSON-LD file {size >> 20} MiB > {max_bytes >> 20} MiB limit: "
            "use jsonld_to_ntriples for the distributed path")
    doc = json.load(open(path, encoding="utf-8"))
    from ..model import terms as T
    from ..plans.compiler import _term_to_py
    default_g = (T.KIND_DEFAULT_GRAPH, "", None, None, None, None, None,
                 None, None)
    rows = [(_term_to_py(s), _term_to_py(p), _term_to_py(o),
             _term_to_py(g) if g is not None else default_g)
            for s, p, o, g in parse_jsonld(doc)]
    from pyspark.sql.types import StructField, StructType
    schema = StructType([StructField(c, T.TERM_SCHEMA)
                         for c in ("s", "p", "o", "g")])
    return spark.createDataFrame(rows, schema)


# -- writer (driver-side) ---------------------------------------------------

def to_jsonld_document(df, max_rows: int = 1_000_000) -> str:
    """Triples DataFrame → expanded JSON-LD string.  DRIVER-SIDE collect,
    bounded; the distributed dump path is N-Triples/N-Quads."""
    from ..model import terms as T
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"to_jsonld_document: > {max_rows} triples; dump N-Triples "
            "for large graphs")
    nodes: dict = {}
    for r in rows:
        s = r["s"]
        sid = s["lex"] if s["kind"] == T.KIND_IRI else "_:" + s["lex"]
        node = nodes.setdefault(sid, {"@id": sid})
        o = r["o"]
        pred = r["p"]["lex"]
        if (pred == RDF_NS + "type") and o["kind"] == T.KIND_IRI:
            node.setdefault("@type", []).append(o["lex"])
            continue
        if o["kind"] == T.KIND_IRI:
            obj = {"@id": o["lex"]}
        elif o["kind"] == T.KIND_BNODE:
            obj = {"@id": "_:" + o["lex"]}
        elif o["kind"] == T.KIND_LITERAL:
            obj = {"@value": o["lex"]}
            if o["lang"]:
                obj["@language"] = o["lang"]
            elif o["datatype"] and o["datatype"] != XSD_STRING:
                obj["@type"] = o["datatype"]
        else:
            raise ValueError(
                "JSON-LD cannot serialize quoted triples (RDF-star); "
                "dump N-Triples instead")
        node.setdefault(pred, []).append(obj)
    return json.dumps(list(nodes.values()), indent=1, sort_keys=True)
