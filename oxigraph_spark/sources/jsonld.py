"""JSON-LD reader/writer — expanded + compact form (SURVEY.md §2.1 S6).

Reference: ``lib/oxjsonld/src/`` · upstream parses JSON-LD 1.0 with
context processing.  This implementation covers the EXPANDED document
form (the canonical, context-free shape every JSON-LD processor can
produce via the standard ``expand()`` operation) — an array of node
objects keyed by absolute IRIs, with ``@value``/``@type``/``@language``
value objects, ``@id`` references, ``@list`` collections and ``@graph``
containers — plus COMPACT documents with **inline** ``@context``:
term→IRI mappings, compact IRIs (``prefix:suffix``), keyword aliases,
``@vocab``/``@base``/``@language`` defaults, type coercion (``@id`` /
``@vocab`` / datatype), containers (``@list``/``@set``/``@language``/
``@index``) and node-level ``@reverse``.  Remote context URLs resolve
through the pluggable :func:`register_context_resolver` registry (same
idiom as the compiler's SERVICE handler registry); with no resolver
registered they raise — the no-network restriction is documented, not
silent, and callers with network (or a context cache) close it without
touching this module.

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
        if not isinstance(ident, str):
            raise ValueError(
                f"@id must be a string, got {type(ident).__name__}: "
                f"{ident!r}")
        if ident.startswith("_:"):
            if ident not in self.relabel:
                self.relabel[ident] = self.bnode()
            return self.relabel[ident]
        return A.NamedNode(ident)


def parse_jsonld(doc, bnode_prefix: str = "jb") -> List[Triple]:
    """JSON-LD document (parsed JSON) → ground quads
    ``(s, p, o, graph-or-None)``.  Documents carrying an inline
    ``@context`` anywhere are run through :func:`expand` first."""
    if _has_context(doc):
        doc = expand(doc)
    ctx = _Ctx(bnode_prefix)
    out: List[Triple] = []
    _top(doc, ctx, out, None)
    return out


def _has_context(doc) -> bool:
    if isinstance(doc, dict):
        return "@context" in doc or any(_has_context(v) for v in doc.values())
    if isinstance(doc, list):
        return any(_has_context(v) for v in doc)
    return False


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
    for pred, values in node.get("@reverse", {}).items():
        # reversed relationship: the VALUES are the subjects
        p = A.NamedNode(pred)
        for v in _as_list(values):
            out.append((_object(v, ctx, out, graph), p, subj, graph))
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
        # RDF 1.1: language-tag value space is lowercase
        return A.Literal(str(val), lang=str(v["@language"]).lower())
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


# -- context processing + expansion (compact → expanded form) ---------------
#
# Subset of the JSON-LD 1.0 expansion algorithm that is computable
# offline: inline contexts only.  Unsupported constructs raise
# NotImplementedError (remote context URLs, scoped contexts, @nest,
# @container arrays) rather than silently dropping data.

_KEYWORDS = frozenset({
    "@id", "@type", "@value", "@language", "@list", "@set", "@graph",
    "@index", "@reverse", "@context", "@vocab", "@base", "@container",
    "@nest", "@version", "@none", "@json", "@direction",
})


class _ActiveCtx:
    __slots__ = ("terms", "vocab", "base", "language")

    def __init__(self):
        self.terms: dict = {}
        self.vocab: Optional[str] = None
        self.base: Optional[str] = None
        self.language: Optional[str] = None

    def copy(self) -> "_ActiveCtx":
        c = _ActiveCtx()
        c.terms = dict(self.terms)
        c.vocab, c.base, c.language = self.vocab, self.base, self.language
        return c


# Pluggable remote-@context resolution (round-9; same registry idiom as
# Compiler.SERVICE_HANDLERS): a resolver takes the context URL and
# returns the context VALUE (the dict a dereference would yield under
# "@context", or a full remote-context document {"@context": ...}).
# The no-network default still raises — callers supply an HTTP fetcher,
# a cache, or a test stub.
_CONTEXT_RESOLVERS: list = []


def register_context_resolver(fn) -> None:
    """Register ``fn(url) -> dict | list | str | None``; resolvers are
    tried in registration order, first non-None answer wins.  Remove
    with :func:`unregister_context_resolver` (tests must clean up)."""
    _CONTEXT_RESOLVERS.append(fn)


def unregister_context_resolver(fn) -> None:
    _CONTEXT_RESOLVERS.remove(fn)


def _resolve_remote_context(url: str):
    for fn in _CONTEXT_RESOLVERS:
        got = fn(url)
        if got is not None:
            if isinstance(got, dict) and "@context" in got:
                got = got["@context"]   # full remote context document
            return got
    raise NotImplementedError(
        f"remote @context {url!r}: no registered context resolver — "
        "register_context_resolver(fn) to supply one, inline the "
        "context, or pre-expand the document")


def _process_context(actx: "_ActiveCtx", local, _depth: int = 0) -> "_ActiveCtx":
    if _depth > 8:
        raise ValueError("remote @context chain exceeds depth 8 "
                         "(cycle?)")
    actx = actx.copy()
    for c in (local if isinstance(local, list) else [local]):
        if c is None:          # null context: reset
            actx = _ActiveCtx()
            continue
        if isinstance(c, str):
            actx = _process_context(actx, _resolve_remote_context(c),
                                    _depth + 1)
            continue
        if not isinstance(c, dict):
            raise ValueError(f"@context entry must be object/null/IRI: {c!r}")
        if "@base" in c:
            actx.base = c["@base"]
        if "@vocab" in c:
            actx.vocab = c["@vocab"]
        if "@language" in c:
            actx.language = c["@language"]
        defined: dict = {}
        for term in c:
            if term not in ("@base", "@vocab", "@language", "@version"):
                _create_term(actx, c, term, defined)
    return actx


def _create_term(actx: "_ActiveCtx", lctx: dict, term: str, defined: dict):
    if defined.get(term):
        return
    if term in defined:
        raise ValueError(f"cyclic @context term definition: {term!r}")
    if term.startswith("@"):
        raise ValueError(f"@context cannot redefine keyword {term!r}")
    defined[term] = False
    defn = lctx[term]
    if defn is None:
        actx.terms[term] = {"iri": None}      # explicit null: term dropped
        defined[term] = True
        return
    if isinstance(defn, str):
        actx.terms[term] = {
            "iri": _expand_iri(actx, defn, vocab=True, lctx=lctx,
                               defined=defined)}
        defined[term] = True
        return
    if not isinstance(defn, dict):
        raise ValueError(f"invalid term definition for {term!r}: {defn!r}")
    if "@context" in defn:
        raise NotImplementedError("scoped contexts (JSON-LD 1.1)")
    td: dict = {}
    if "@reverse" in defn:
        td["reverse"] = True
        td["iri"] = _expand_iri(actx, defn["@reverse"], vocab=True,
                                lctx=lctx, defined=defined)
    elif "@id" in defn:
        v = defn["@id"]
        td["iri"] = v if (v is None or v in _KEYWORDS) else \
            _expand_iri(actx, v, vocab=True, lctx=lctx, defined=defined)
    else:
        td["iri"] = _expand_iri(actx, term, vocab=True, lctx=lctx,
                                defined=defined)
    if "@type" in defn:
        t = defn["@type"]
        td["type"] = t if t in ("@id", "@vocab") else \
            _expand_iri(actx, t, vocab=True, lctx=lctx, defined=defined)
    if "@language" in defn:
        td["language"] = defn["@language"]    # None clears the default
        td["has_language"] = True
    if "@container" in defn:
        cont = defn["@container"]
        if cont not in ("@list", "@set", "@language", "@index"):
            raise NotImplementedError(f"@container {cont!r}")
        td["container"] = cont
    actx.terms[term] = td
    defined[term] = True


def _expand_iri(actx: "_ActiveCtx", value, vocab: bool = False,
                relative: bool = False, lctx: Optional[dict] = None,
                defined: Optional[dict] = None):
    """Term / compact-IRI / relative-IRI → absolute IRI (or keyword).
    Returns None when the value has no mapping in vocab mode (the spec
    drops such properties)."""
    if value is None or value in _KEYWORDS:
        return value
    if not isinstance(value, str):
        raise ValueError(f"IRI expansion on non-string: {value!r}")
    if lctx is not None and value in lctx and not defined.get(value):
        _create_term(actx, lctx, value, defined)
    if vocab and value in actx.terms:
        return actx.terms[value]["iri"]
    colon = value.find(":", 1)
    if colon > 0:
        prefix, suffix = value[:colon], value[colon + 1:]
        if prefix == "_" or suffix.startswith("//"):
            return value                       # bnode label / absolute IRI
        if lctx is not None and prefix in lctx and not defined.get(prefix):
            _create_term(actx, lctx, prefix, defined)
        td = actx.terms.get(prefix)
        if td and td.get("iri"):
            return td["iri"] + suffix
        return value                           # scheme:path absolute IRI
    if vocab and actx.vocab is not None:
        return actx.vocab + value
    if relative and actx.base is not None:
        from urllib.parse import urljoin
        return urljoin(actx.base, value)
    return None if vocab else value


def expand(doc):
    """Compact JSON-LD (inline contexts) → expanded document, suitable
    for the expanded-form parser above.  Mirrors the W3C expansion
    algorithm restricted to offline-computable inputs."""
    out = _expand_element(_ActiveCtx(), doc, None)
    return [] if out is None else out


def _expand_value(actx: "_ActiveCtx", active_prop: Optional[str], value):
    td = actx.terms.get(active_prop or "", {})
    t = td.get("type")
    if isinstance(value, str):
        if t == "@id":
            return {"@id": _expand_iri(actx, value, relative=True)}
        if t == "@vocab":
            return {"@id": _expand_iri(actx, value, vocab=True,
                                       relative=True) or value}
    rv: dict = {"@value": value}
    if t and t not in ("@id", "@vocab"):
        rv["@type"] = t
    elif isinstance(value, str):
        lang = td["language"] if td.get("has_language") else actx.language
        if lang:
            rv["@language"] = lang
    return rv


def _expand_element(actx: "_ActiveCtx", element, active_prop):
    if element is None:
        return None
    if isinstance(element, list):
        result = []
        for item in element:
            v = _expand_element(actx, item, active_prop)
            if v is None:
                continue
            result.extend(v) if isinstance(v, list) else result.append(v)
        return result
    if not isinstance(element, dict):
        return _expand_value(actx, active_prop, element)
    if "@context" in element:
        actx = _process_context(actx, element["@context"])
    result: dict = {}
    for key in element:
        if key == "@context":
            continue
        ekey = _expand_iri(actx, key, vocab=True)
        if ekey is None:
            continue                           # unmapped property: dropped
        if ekey == "@id":
            result["@id"] = _expand_iri(actx, element[key], relative=True) \
                if isinstance(element[key], str) else element[key]
            continue
        if ekey == "@type":
            result["@type"] = [
                _expand_iri(actx, t, vocab=True, relative=True) or t
                for t in _as_list(element[key])]
            continue
        if ekey in ("@value", "@language", "@index"):
            result[ekey] = element[key]
            continue
        if ekey == "@graph":
            result["@graph"] = _expand_element(actx, element[key], "@graph")
            continue
        if ekey == "@list":
            ev = _expand_element(actx, element[key], active_prop)
            result["@list"] = [] if ev is None else _as_list(ev)
            continue
        if ekey == "@set":
            ev = _expand_element(actx, element[key], active_prop)
            return [] if ev is None else ev    # @set is transparent
        if ekey == "@reverse":
            rev = result.setdefault("@reverse", {})
            for rk, rvs in element[key].items():
                rki = _expand_iri(actx, rk, vocab=True)
                if rki is None:
                    continue
                ev = _expand_element(actx, rvs, rk)
                rev.setdefault(rki, []).extend(
                    [] if ev is None else _as_list(ev))
            continue
        if ekey in _KEYWORDS:
            raise NotImplementedError(f"JSON-LD keyword {ekey}")
        td = actx.terms.get(key, {})
        container = td.get("container")
        if container == "@language" and isinstance(element[key], dict):
            vals = [{"@value": item, "@language": lang}
                    for lang, lv in sorted(element[key].items())
                    for item in _as_list(lv)]
        elif container == "@index" and isinstance(element[key], dict):
            vals = []
            for _idx in sorted(element[key]):
                ev = _expand_element(actx, element[key][_idx], key)
                vals.extend([] if ev is None else _as_list(ev))
        else:
            ev = _expand_element(actx, element[key], key)
            vals = [] if ev is None else _as_list(ev)
            if container == "@list" and not (
                    len(vals) == 1 and isinstance(vals[0], dict)
                    and "@list" in vals[0]):
                vals = [{"@list": vals}]
        if td.get("reverse"):
            result.setdefault("@reverse", {}).setdefault(
                td["iri"], []).extend(vals)
        else:
            result.setdefault(ekey, []).extend(vals)
    # a value object's @type must be a bare IRI string, not an array
    if "@value" in result and isinstance(result.get("@type"), list) \
            and len(result["@type"]) == 1:
        result["@type"] = result["@type"][0]
    return result


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


def _scan_json_line(s: str, depth: int) -> Tuple[int, List[int]]:
    """Scan one line of a JSON document given the absolute brace/bracket
    ``depth`` at line start → ``(end_depth, cuts)`` where ``cuts`` are
    character offsets just after a top-level object closes (a ``}``
    bringing the depth back to 1 — the root array's level).

    JSON strings cannot contain raw newlines, so a line NEVER starts
    inside a string: the in-string flag starts False and the scan is
    exact with no state simulation (unlike Turtle's long literals)."""
    cuts: List[int] = []
    in_str = esc = False
    for i, ch in enumerate(s):
        if in_str:
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
        elif ch in "{[":
            depth += 1
        elif ch in "}]":
            depth -= 1
            if depth == 1 and ch == "}":
                cuts.append(i + 1)
    return depth, cuts


def _chunk_to_nt(text: str) -> List[str]:
    """One top-level-object chunk (with stray ``[`` ``,`` ``]``
    separators from the cut) → N-Quads lines."""
    t = text.strip()
    while t[:1] in ("[", ","):
        t = t[1:].lstrip()
    while t[-1:] in ("]", ","):
        t = t[:-1].rstrip()
    if not t:
        return []
    return jsonld_text_to_nt_lines(t)


def jsonld_to_ntriples_chunked(spark, in_path: str, out_path: str,
                               max_partition_bytes: Optional[int] = None
                               ) -> None:
    """Distributed parse of ONE large JSON-LD document (the
    single-200-GB-file gap, closing SURVEY §2.1 S6's per-file-task
    limitation; mirrors ``rdf_io.turtle_to_ntriples_chunked``).

    Works on documents whose root is a top-level ARRAY of node objects
    spread across lines (the shape pretty-printers and NDJSON-LD-style
    exporters produce).  Scheme: newline-split read (line-parallel
    Hadoop splits); pass 1 computes each partition's brace-depth delta
    (one number per partition — JSON strings cannot span lines, so the
    per-line scan needs no start-state simulation); the driver
    prefix-sums deltas to learn each partition's absolute start depth;
    pass 2 cuts complete top-level objects where a ``}`` returns to
    depth 1 and parses them in place.  Partition-boundary fragments are
    stitched driver-side (≤2 tiny strings per partition).  Bnode labels
    are chunk-content-hashed (`jsonld_text_to_nt_lines`), so anonymous
    nodes never collide across chunks; document-given ``_:labels`` are
    preserved verbatim, so cross-object references stay intact.

    A root-OBJECT document (e.g. ``{"@context":…,"@graph":[…]}``) cannot
    be depth-cut (a direct child object — an inline ``@context``, say —
    closes back to depth 1 and would cut mid-object, yielding invalid
    JSON chunks), so the root kind is sniffed up front and a non-array
    root routes the WHOLE document through the driver-side parser —
    correct but not distributed; expand such documents (or lift the
    ``@graph`` array to the root) to get the distributed path.

    ``max_partition_bytes`` temporarily overrides
    ``spark.sql.files.maxPartitionBytes`` for this read — used by tests
    to force multi-partition chunking on small files."""
    with open(in_path, encoding="utf-8") as f:
        first = ""
        while True:
            chunk = f.read(4096)
            if not chunk:
                break
            stripped = chunk.lstrip()
            if stripped:
                first = stripped[0]
                break
    if first != "[":
        text = open(in_path, encoding="utf-8").read()
        nts = jsonld_text_to_nt_lines(text)
        spark.createDataFrame([(l,) for l in nts], schema="value string") \
             .write.mode("overwrite").text(out_path)
        return
    conf_key = "spark.sql.files.maxPartitionBytes"
    old = spark.conf.get(conf_key)
    if max_partition_bytes is not None:
        spark.conf.set(conf_key, str(max_partition_bytes))
    try:
        lines = spark.read.text(in_path)

        def deltas(idx: int, it):
            d = 0
            for row in it:
                d, _ = _scan_json_line(row.value, d)
            yield (idx, d)

        delta = dict(lines.rdd.mapPartitionsWithIndex(deltas).collect())
        start_depth, d = {}, 0
        for i in range(lines.rdd.getNumPartitions()):
            start_depth[i] = d
            d += delta.get(i, 0)
        bstart = spark.sparkContext.broadcast(start_depth)

        def seal(idx: int, it):
            depth = bstart.value.get(idx, 0)
            buf: List[str] = []
            seen_boundary = False
            for row in it:
                v = row.value
                depth, cuts = _scan_json_line(v, depth)
                last = 0
                for c in cuts:
                    buf.append(v[last:c])
                    text = "\n".join(buf)
                    buf = []
                    last = c
                    if not seen_boundary:
                        seen_boundary = True
                        yield ("frag", idx, "head", text)
                    else:
                        for nt in _chunk_to_nt(text):
                            yield ("nt", idx, "", nt)
                buf.append(v[last:])
            tail = "\n".join(buf)
            if not seen_boundary:
                yield ("frag", idx, "all", tail)
            elif tail.strip().strip("],").strip():
                yield ("frag", idx, "tail", tail)

        rdd = lines.rdd.mapPartitionsWithIndex(seal).persist()
        frags = sorted(
            ((t[1], t[2], t[3]) for t in
             rdd.filter(lambda t: t[0] == "frag").collect()),
            key=lambda t: (t[0], 0 if t[1] in ("head", "all") else 1))
        stitched: List[str] = []
        pending = ""
        for _, kind, text in frags:
            if kind == "all":
                pending = pending + "\n" + text
                continue
            if kind == "head":
                stitched.extend(_chunk_to_nt(pending + "\n" + text))
                pending = ""
            else:                              # tail
                pending = pending + "\n" + text
        if pending.strip().strip("],").strip():
            stitched.extend(_chunk_to_nt(pending))

        # explicit schema: toDF() infers from the first element and raises
        # on an EMPTY body RDD — exactly the degraded cases (root-object
        # docs, <=1 top-level object, single-partition files) where every
        # row came out as a driver-stitched fragment
        body_df = spark.createDataFrame(
            rdd.filter(lambda t: t[0] == "nt").map(lambda t: (t[3],)),
            schema="value string")
        if stitched:
            extra = spark.createDataFrame([(l,) for l in stitched],
                                          ["value"])
            body_df = body_df.unionByName(extra)
        body_df.write.mode("overwrite").text(out_path)
        rdd.unpersist()
    finally:
        spark.conf.set(conf_key, old)


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
    """Triples DataFrame → ONE expanded JSON-LD string.  DRIVER-SIDE
    collect, bounded; use :func:`write_jsonld` for the distributed
    per-partition part-file path."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"to_jsonld_document: > {max_rows} triples; dump N-Triples "
            "for large graphs")
    return rows_to_jsonld(rows)


def rows_to_jsonld(rows) -> str:
    """Triple rows (mapping-indexable ``s``/``p``/``o`` term fields) →
    one expanded JSON-LD document string (root array of node objects).
    Pure Python: driver-side for :func:`to_jsonld_document`, per
    partition inside :func:`write_jsonld`."""
    from ..model import terms as T
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


def write_jsonld(df, path: str) -> None:
    """DISTRIBUTED expanded-JSON-LD writer: each partition serializes
    its rows as ONE complete root-array document part file — no driver
    collect, mirroring ``write_ntriples``'s per-partition shape.  Read
    the part set back with :func:`jsonld_to_ntriples` (one task per
    part).  Document-given ``_:`` labels are preserved verbatim, so
    bnodes shared across partitions stay one node for readers that
    keep labels across the part set (ours does)."""
    from pyspark.sql import functions as F

    flat = df.select(
        df["s"]["kind"].alias("skind"), df["s"]["lex"].alias("slex"),
        df["p"]["lex"].alias("plex"),
        df["o"]["kind"].alias("okind"), df["o"]["lex"].alias("olex"),
        df["o"]["datatype"].alias("odt"), df["o"]["lang"].alias("olang"))

    def to_doc(batches):
        import pandas as pd
        rows = []
        for pdf in batches:
            for t in pdf.itertuples(index=False):
                rows.append({
                    "s": {"kind": t.skind, "lex": t.slex},
                    "p": {"lex": t.plex},
                    "o": {"kind": t.okind, "lex": t.olex,
                          "datatype": t.odt, "lang": t.olang},
                })
        if rows:
            yield pd.DataFrame({"value": [rows_to_jsonld(rows)]})

    flat.mapInPandas(to_doc, "value string") \
        .write.mode("overwrite").text(path)
