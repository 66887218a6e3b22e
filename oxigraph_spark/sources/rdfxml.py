"""RDF/XML reader/writer (SURVEY.md §2.1 S5).

Reference: ``lib/oxrdfxml/src/parser.rs`` · ``RdfXmlParser`` (upstream
implements the full W3C RDF/XML grammar over a streaming XML reader).

Spark-first shape: RDF/XML is a whole-document format (namespace scopes
and ``xml:base``/``xml:lang`` inheritance make it non-splittable), so —
exactly like Turtle (S3) — the unit of parallelism is one FILE:

- :func:`rdfxml_to_ntriples` converts a corpus with one executor task
  per file (``wholetext`` read + ``mapInPandas``), emitting N-Triples
  that then re-read line-parallel at any scale;
- :func:`read_rdfxml_small` is the driver-side path for a single small
  document (schema/ontology files, which is what RDF/XML carries in
  practice).

The parser is pure stdlib ``xml.etree`` and covers the grammar core:
node elements (``rdf:Description`` and typed), ``rdf:about`` /
``rdf:ID`` / ``rdf:nodeID`` / anonymous, property elements with
``rdf:resource`` / ``rdf:nodeID`` / ``rdf:datatype`` / inherited
``xml:lang``, property attributes, ``rdf:li`` item expansion,
``rdf:parseType="Resource"|"Literal"|"Collection"``, statement
reification via ``rdf:ID`` on property elements, and ``xml:base``
resolution.  Not covered (documented): ``rdf:aboutEach`` /
``rdf:bagID`` (removed from the 2004 spec), exact XML-literal
canonicalization (exclusive canonical XML; we serialize the literal
subtree as-is).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Iterator, List, Optional, Tuple
from urllib.parse import urljoin

from ..algebra import ast as A

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XML_NS = "http://www.w3.org/XML/1998/namespace"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
RDF_XMLLITERAL = RDF_NS + "XMLLiteral"

_R = "{%s}" % RDF_NS
_X = "{%s}" % XML_NS

# rdf:* attributes that are syntax, not property attributes
_SYNTAX_ATTRS = {_R + a for a in (
    "about", "ID", "nodeID", "resource", "datatype", "parseType",
    "aboutEach", "bagID")}

Triple = Tuple[object, object, object]


class _Ctx:
    """Per-document parse state: bnode counter + label prefix (the prefix
    keeps labels collision-free when many files parse in one job)."""

    def __init__(self, bnode_prefix: str = "rx"):
        self.prefix = bnode_prefix
        self.n = 0
        self.li: dict = {}  # element id → next rdf:li ordinal
        self.ids: set = set()  # resolved rdf:ID IRIs (must be unique)

    def bnode(self) -> A.BlankNode:
        self.n += 1
        return A.BlankNode(f"{self.prefix}{self.n}")

    def li_iri(self, node_el) -> str:
        k = id(node_el)
        self.li[k] = self.li.get(k, 0) + 1
        return f"{RDF_NS}_{self.li[k]}"


_NCNAME_RE = re.compile(r"^[^\d\W][\w.\-]*$", re.UNICODE)


def _rdf_id_iri(ctx: _Ctx, rid: str, base: Optional[str]) -> str:
    """Validate + resolve an ``rdf:ID`` value: must be an XML NCName
    (``rdf-id`` production), and each (base, ID) pair may appear at most
    once per document."""
    if not _NCNAME_RE.match(rid):
        raise ValueError(f"rdf:ID value is not an XML NCName: {rid!r}")
    iri = _resolve("#" + rid, base)
    if iri in ctx.ids:
        raise ValueError(f"duplicate rdf:ID in document: {rid!r}")
    ctx.ids.add(iri)
    return iri


def _tag_iri(tag: str) -> str:
    """ElementTree ``{ns}local`` tag → concatenated IRI."""
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns + local
    return tag


def _resolve(iri: str, base: Optional[str]) -> str:
    if not base or "://" not in base and not base.startswith("file:"):
        return iri
    return urljoin(base, iri)


def _scoped(el, lang: Optional[str], base: Optional[str]):
    own = el.get(_X + "lang")
    if own is not None:
        lang = own.lower() or None   # RDF 1.1: lowercase value space
    return (lang or None,
            el.get(_X + "base", base))


def parse_rdfxml(text: str, base: Optional[str] = None,
                 bnode_prefix: str = "rx") -> List[Triple]:
    """One RDF/XML document → list of ground AST triples."""
    root = ET.fromstring(text)
    ctx = _Ctx(bnode_prefix)
    out: List[Triple] = []
    lang, base = _scoped(root, None, base)
    if root.tag == _R + "RDF":
        for child in root:
            _node_element(child, ctx, out, lang, base)
    else:
        _node_element(root, ctx, out, lang, base)
    return out


def _subject_of(el, ctx: _Ctx, base: Optional[str]):
    about = el.get(_R + "about")
    rid = el.get(_R + "ID")
    nid = el.get(_R + "nodeID")
    if sum(x is not None for x in (about, rid, nid)) > 1:
        # the grammar allows AT MOST ONE of rdf:about / rdf:ID /
        # rdf:nodeID on a node element
        raise ValueError(
            "node element carries more than one of rdf:about/rdf:ID/"
            f"rdf:nodeID ({el.tag})")
    if about is not None:
        return A.NamedNode(_resolve(about, base))
    if rid is not None:
        return A.NamedNode(_rdf_id_iri(ctx, rid, base))
    if nid is not None:
        return A.BlankNode(nid)
    return ctx.bnode()


def _node_element(el, ctx: _Ctx, out: List[Triple],
                  lang: Optional[str], base: Optional[str]):
    """nodeElement production → subject term (emits its triples)."""
    lang, base = _scoped(el, lang, base)
    subj = _subject_of(el, ctx, base)
    if el.tag != _R + "Description":
        out.append((subj, A.NamedNode(RDF_NS + "type"),
                    A.NamedNode(_tag_iri(el.tag))))
    for k, v in el.attrib.items():
        if k in _SYNTAX_ATTRS or k.startswith(_X):
            continue
        if k == _R + "type":
            out.append((subj, A.NamedNode(RDF_NS + "type"),
                        A.NamedNode(_resolve(v, base))))
        elif k.startswith("{"):
            out.append((subj, A.NamedNode(_tag_iri(k)),
                        A.Literal(v, lang=lang)))
    for prop in el:
        _property_element(subj, prop, el, ctx, out, lang, base)
    return subj


def _property_element(subj, el, node_el, ctx: _Ctx, out: List[Triple],
                      lang: Optional[str], base: Optional[str]):
    lang, base = _scoped(el, lang, base)
    tag = _tag_iri(el.tag)
    if el.tag == _R + "li":
        tag = ctx.li_iri(node_el)
    pred = A.NamedNode(tag)

    ptype = el.get(_R + "parseType")
    obj = None
    if ptype == "Resource":
        obj = ctx.bnode()
        for sub in el:
            _property_element(obj, sub, el, ctx, out, lang, base)
    elif ptype == "Literal":
        inner = (el.text or "") + "".join(
            ET.tostring(c, encoding="unicode") for c in el)
        obj = A.Literal(inner, datatype=RDF_XMLLITERAL)
    elif ptype == "Collection":
        items = [_node_element(c, ctx, out, lang, base) for c in el]
        obj = _rdf_list(items, ctx, out)
    elif (res := el.get(_R + "resource")) is not None:
        obj = A.NamedNode(_resolve(res, base))
    elif (nid := el.get(_R + "nodeID")) is not None:
        obj = A.BlankNode(nid)
    elif len(el):
        children = list(el)
        if len(children) != 1:
            raise ValueError(
                f"property element <{tag}> must contain exactly one node "
                f"element, found {len(children)}")
        obj = _node_element(children[0], ctx, out, lang, base)
    else:
        prop_attrs = [(k, v) for k, v in el.attrib.items()
                      if k not in _SYNTAX_ATTRS and not k.startswith(_X)
                      and k.startswith("{")]
        if prop_attrs and not (el.text or "").strip():
            # empty property element with property attributes → bnode
            obj = ctx.bnode()
            for k, v in prop_attrs:
                out.append((obj, A.NamedNode(_tag_iri(k)),
                            A.Literal(v, lang=lang)))
        else:
            dt = el.get(_R + "datatype")
            text = el.text or ""
            obj = (A.Literal(text, datatype=_resolve(dt, base)) if dt
                   else A.Literal(text, lang=lang))
    out.append((subj, pred, obj))

    rid = el.get(_R + "ID")
    if rid is not None:  # statement reification
        st = A.NamedNode(_rdf_id_iri(ctx, rid, base))
        out.extend([
            (st, A.NamedNode(RDF_NS + "type"),
             A.NamedNode(RDF_NS + "Statement")),
            (st, A.NamedNode(RDF_NS + "subject"), subj),
            (st, A.NamedNode(RDF_NS + "predicate"), pred),
            (st, A.NamedNode(RDF_NS + "object"), obj),
        ])


def _rdf_list(items, ctx: _Ctx, out: List[Triple]):
    head = A.NamedNode(RDF_NS + "nil")
    first, rest = A.NamedNode(RDF_NS + "first"), A.NamedNode(RDF_NS + "rest")
    for item in reversed(items):
        cell = ctx.bnode()
        out.append((cell, first, item))
        out.append((cell, rest, head))
        head = cell
    return head


# -- Spark wiring -----------------------------------------------------------

def rdfxml_text_to_nt_lines(text: str, base: Optional[str] = None) -> List[str]:
    """One RDF/XML document → canonical N-Triples lines (pure Python —
    runs on executors inside :func:`rdfxml_to_ntriples`)."""
    import zlib
    from ..plans.compiler import _py_token
    # per-document bnode prefix so labels never collide across files
    prefix = f"rx{zlib.crc32(text.encode('utf-8', 'ignore')):08x}n"
    return [f"{_py_token(s)} {_py_token(p)} {_py_token(o)} ."
            for s, p, o in parse_rdfxml(text, base=base, bnode_prefix=prefix)]


def rdfxml_to_ntriples(spark, in_path: str, out_path: str) -> None:
    """Distributed RDF/XML→N-Triples conversion: one task per file
    (RDF/XML is not line-splittable), then the output reads line-parallel
    at any scale.  Mirrors :func:`..rdf_io.turtle_to_ntriples`."""
    files = spark.read.text(in_path, wholetext=True)

    def convert(batches) -> Iterator:
        import pandas as pd
        for pdf in batches:
            lines: List[str] = []
            for text in pdf["value"]:
                lines.extend(rdfxml_text_to_nt_lines(text))
            yield pd.DataFrame({"value": lines})

    files.mapInPandas(convert, "value string") \
         .write.mode("overwrite").text(out_path)


# -- chunked distributed parse of ONE large document ------------------------

# scanner modes: "" text · "C" comment · "D" CDATA · "To"/"Tc"/"Tx"
# inside an opening/closing/other (PI, decl) tag · each T-mode plus a
# trailing quote char when inside an attribute value (values may legally
# contain newlines and '>') · "To/" inside an opening tag whose previous
# line ended in '/' (self-closing tag wrapped across the line break).
_XML_MODES = ("", "C", "D", "To", "Tc", "Tx", "To/",
              'To"', "To'", 'Tc"', "Tc'", 'Tx"', "Tx'")


def _scan_xml_line(s: str, mode: str, depth: int):
    """Scan one line given the scanner ``mode`` and element ``depth`` at
    line start → ``(mode, depth, cuts, opens)``.  ``cuts`` are offsets
    just after a top-level element (a child of the root) closes — where
    the document can be split into independently parseable chunks;
    ``opens`` are offsets just after an opening tag took the depth to 1
    (i.e. the root element's ``>``, used for header capture)."""
    cuts: List[int] = []
    opens: List[int] = []
    i, n = 0, len(s)
    while i < n:
        if mode == "":
            j = s.find("<", i)
            if j < 0:
                break
            if s.startswith("<!--", j):
                mode, i = "C", j + 4
            elif s.startswith("<![CDATA[", j):
                mode, i = "D", j + 9
            elif s.startswith("<!", j) or s.startswith("<?", j):
                mode, i = "Tx", j + 2
            elif s.startswith("</", j):
                mode, i = "Tc", j + 2
            else:
                mode, i = "To", j + 1
        elif mode == "C":
            j = s.find("-->", i)
            if j < 0:
                return mode, depth, cuts, opens
            mode, i = "", j + 3
        elif mode == "D":
            j = s.find("]]>", i)
            if j < 0:
                return mode, depth, cuts, opens
            mode, i = "", j + 3
        elif len(mode) == 3 and mode[2] in "\"'":  # inside attribute value
            j = s.find(mode[2], i)
            if j < 0:
                return mode, depth, cuts, opens
            mode, i = mode[:2], j + 1
        else:                       # To / Tc / Tx (+ "/" pending slash)
            pend = mode.endswith("/")
            bm = mode[:-1] if pend else mode
            m = _TAG_DELIM.search(s, i)
            if m is None:
                # a '/' ending a To-mode line may pair with a '>' that
                # opens the NEXT line (formatter-wrapped tag) — carry a
                # pending-slash marker so the composition stays exact
                if bm == "To" and s[i:] and s.endswith("/"):
                    return bm + "/", depth, cuts, opens
                return bm, depth, cuts, opens
            j, ch = m.start(), m.group()
            if ch in "\"'":
                mode, i = bm + ch, j + 1
                continue
            if bm == "To":
                # self-closing: '/' immediately before '>', possibly on
                # the previous line (pend carries that case; pending is
                # only honored when '>' is the line's first character)
                if (j > 0 and s[j - 1] == "/") or (pend and j == 0):
                    if depth == 1:
                        cuts.append(j + 1)
                else:
                    depth += 1
                    if depth == 1:
                        opens.append(j + 1)
            elif bm == "Tc":
                depth -= 1
                if depth == 1:
                    cuts.append(j + 1)
            mode, i = "", j + 1
    return mode, depth, cuts, opens


_TAG_DELIM = re.compile(r"[\"'>]")


def rdfxml_to_ntriples_chunked(spark, in_path: str, out_path: str,
                               max_partition_bytes: Optional[int] = None
                               ) -> None:
    """Distributed parse of ONE large RDF/XML document (the
    single-200-GB-file gap; mirrors ``rdf_io.turtle_to_ntriples_chunked``
    — upstream streams via ``lib/oxrdfxml/src/parser.rs``, this is the
    Spark re-expression).

    Scheme: newline-split read; pass 1 computes, per partition, the
    scanner-state transition function simulated from all 12 possible
    start modes (text / comment / CDATA / inside-tag × attribute-quote)
    together with each path's element-depth delta; the driver composes
    the functions in partition order to learn every partition's true
    (mode, depth) start state — one tiny row per partition.  Pass 2 cuts
    complete top-level elements (children of the root) where the depth
    returns to 1, wraps each chunk in the captured root open tag (so
    every namespace / xml:base / xml:lang declared on the root stays in
    scope), and parses chunks in place; partition-boundary fragments are
    stitched driver-side.  Bnode labels are chunk-content-hashed and
    ``rdf:nodeID`` labels are preserved verbatim, so cross-chunk
    references stay intact.

    Documented limits: an internal DTD subset (``<!DOCTYPE … [ … ]>``)
    raises — entity definitions would need a pre-pass; rdf:ID-based
    reification counters restart per chunk (labels are content-hashed so
    they stay unique)."""
    header_lines: List[str] = []
    root_open = None
    mode, depth = "", 0
    with open(in_path, encoding="utf-8") as f:
        for line in f:
            if "<!DOCTYPE" in line and "[" in line:
                raise NotImplementedError(
                    "internal DTD subset: expand entities before the "
                    "chunked parse")
            body = line.rstrip("\n")
            mode, depth, _, opens = _scan_xml_line(body, mode, depth)
            if opens:
                # root element open tag ends at opens[0] of this line
                header_lines.append(body[: opens[0]])
                root_open = "".join(header_lines)
                break
            header_lines.append(line)
    if root_open is None:
        raise ValueError(f"{in_path}: no root element found")
    # strip comments (which may contain '<'), then the last '<' starts
    # the root open tag — attribute values cannot contain a raw '<'
    wo_comments = re.sub(r"<!--.*?-->", "", root_open, flags=re.S)
    wrap_open = wo_comments[wo_comments.rindex("<"):]
    m = re.search(r"<\s*([^\s/>]+)", wrap_open)
    root_close = f"</{m.group(1)}>"

    conf_key = "spark.sql.files.maxPartitionBytes"
    old = spark.conf.get(conf_key)
    if max_partition_bytes is not None:
        spark.conf.set(conf_key, str(max_partition_bytes))
    try:
        lines = spark.read.text(in_path)

        def transitions(idx: int, it):
            cur = {m0: (m0, 0) for m0 in _XML_MODES}
            for row in it:
                nxt = {}
                for m0, (m1, d1) in cur.items():
                    m2, d2, _, _ = _scan_xml_line(row.value, m1, 0)
                    nxt[m0] = (m2, d1 + d2)
                cur = nxt
            yield (idx, cur)

        trans = dict(lines.rdd.mapPartitionsWithIndex(transitions).collect())
        ident = {m0: (m0, 0) for m0 in _XML_MODES}
        starts = {}
        st, dp = "", 0
        for i in range(lines.rdd.getNumPartitions()):
            starts[i] = (st, dp)
            m1, dd = trans.get(i, ident)[st]
            st, dp = m1, dp + dd
        bstart = spark.sparkContext.broadcast(starts)

        def chunk_nt(text: str, with_root: bool) -> List[str]:
            doc = text if with_root else wrap_open + text
            return rdfxml_text_to_nt_lines(doc + root_close)

        def seal(idx: int, it):
            md, depth = bstart.value.get(idx, ("", 0))
            buf: List[str] = []
            seen_boundary = False
            for row in it:
                v = row.value
                md, depth, cuts, _ = _scan_xml_line(v, md, depth)
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
                        for nt in chunk_nt(text, with_root=False):
                            yield ("nt", idx, "", nt)
                buf.append(v[last:])
            tail = "\n".join(buf)
            if not seen_boundary:
                yield ("frag", idx, "all", tail)
            elif tail.strip():
                yield ("frag", idx, "tail", tail)

        rdd = lines.rdd.mapPartitionsWithIndex(seal).persist()
        frags = sorted(
            ((t[1], t[2], t[3]) for t in
             rdd.filter(lambda t: t[0] == "frag").collect()),
            key=lambda t: (t[0], 0 if t[1] in ("head", "all") else 1))
        stitched: List[str] = []
        pending, first = "", True
        for _, kind, text in frags:
            if kind == "all":
                pending = pending + "\n" + text if pending else text
                continue
            if kind == "head":
                piece = (pending + "\n" + text) if pending else text
                # the file-head piece already contains the root open tag
                stitched.extend(chunk_nt(piece, with_root=first))
                pending, first = "", False
            else:                              # tail
                pending = pending + "\n" + text if pending else text
        # final piece: everything after the last top-level element —
        # the root close tag plus trailing comments; parse only if it
        # still holds an element
        rest = pending.replace(root_close, "").strip()
        if rest and re.search(r"<[A-Za-z]", rest):
            stitched.extend(chunk_nt(pending.replace(root_close, ""),
                                     with_root=first))

        # explicit schema: toDF() infers from the first element and raises
        # on an EMPTY body RDD (documents with <=1 top-level element or a
        # single partition stitch everything driver-side)
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


def read_rdfxml_small(spark, path: str, max_bytes: int = 64 << 20):
    """Driver-side reader for ONE small RDF/XML document (the common
    schema/ontology case) → quads DataFrame.  Corpora go through
    :func:`rdfxml_to_ntriples` instead."""
    import os
    size = os.path.getsize(path)
    if size > max_bytes:
        raise ValueError(
            f"RDF/XML file {size >> 20} MiB > {max_bytes >> 20} MiB limit: "
            "use rdfxml_to_ntriples for the distributed path")
    text = open(path, encoding="utf-8").read()
    from ..model import terms as T
    from ..plans.compiler import _term_to_py
    g = (T.KIND_DEFAULT_GRAPH, "", None, None, None, None, None, None, None)
    rows = [(_term_to_py(s), _term_to_py(p), _term_to_py(o), g)
            for s, p, o in parse_rdfxml(text)]
    from pyspark.sql.types import StructField, StructType
    schema = StructType([StructField(c, T.TERM_SCHEMA)
                         for c in ("s", "p", "o", "g")])
    return spark.createDataFrame(rows, schema)


# -- writer (driver-side) ---------------------------------------------------

def _split_iri(iri: str) -> Tuple[str, str]:
    """Namespace/local split for QName generation: last '#', '/' or ':'
    (urn-style IRIs) such that the local part is an XML NCName."""
    for i in range(len(iri) - 1, 0, -1):
        if iri[i] in "#/:":
            local = iri[i + 1:]
            if local and not local[0].isdigit() and all(
                    c.isalnum() or c in "_-." for c in local):
                return iri[:i + 1], local
            break
    raise ValueError(f"cannot form an XML QName for predicate IRI {iri!r}")


def to_rdfxml_document(df, max_rows: int = 1_000_000) -> str:
    """Triples DataFrame → ONE RDF/XML string.  DRIVER-SIDE collect —
    bounded by ``max_rows``; use :func:`write_rdfxml` for the
    distributed per-partition part-file path."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"to_rdfxml_document: > {max_rows} triples; dump N-Triples "
            "for large graphs")
    return rows_to_rdfxml(rows)


def rows_to_rdfxml(rows) -> str:
    """Triple rows (mapping-indexable ``s``/``p``/``o`` term fields) →
    one complete RDF/XML document string.  Pure Python: runs driver-side
    for :func:`to_rdfxml_document` and per partition inside
    :func:`write_rdfxml`."""
    from ..model import terms as T
    ns: dict = {RDF_NS: "rdf"}
    by_subj: dict = {}
    for r in rows:
        by_subj.setdefault((r["s"]["kind"], r["s"]["lex"]), []).append(r)
        ns.setdefault(_split_iri(r["p"]["lex"])[0], f"n{len(ns)}")
    lines = ["<?xml version=\"1.0\" encoding=\"UTF-8\"?>"]
    decls = " ".join(f'xmlns:{p}="{u}"' for u, p in ns.items())
    lines.append(f"<rdf:RDF {decls}>")
    for (kind, lex), triples in by_subj.items():
        attr = (f'rdf:about="{_xml_attr(lex)}"' if kind == T.KIND_IRI
                else f'rdf:nodeID="{_xml_attr(lex)}"')
        lines.append(f"  <rdf:Description {attr}>")
        for r in triples:
            pns, plocal = _split_iri(r["p"]["lex"])
            q = f"{ns[pns]}:{plocal}"
            o = r["o"]
            if o["kind"] == T.KIND_IRI:
                lines.append(f'    <{q} rdf:resource="{_xml_attr(o["lex"])}"/>')
            elif o["kind"] == T.KIND_BNODE:
                lines.append(f'    <{q} rdf:nodeID="{_xml_attr(o["lex"])}"/>')
            elif o["kind"] == T.KIND_LITERAL:
                body = _xml_text(o["lex"])
                if o["lang"]:
                    lines.append(f'    <{q} xml:lang="{o["lang"]}">{body}</{q}>')
                elif o["datatype"] and o["datatype"] != XSD_STRING:
                    lines.append(
                        f'    <{q} rdf:datatype="{_xml_attr(o["datatype"])}">'
                        f"{body}</{q}>")
                else:
                    lines.append(f"    <{q}>{body}</{q}>")
            else:
                raise ValueError(
                    "RDF/XML cannot serialize quoted triples (RDF-star); "
                    "dump N-Triples instead")
        lines.append("  </rdf:Description>")
    lines.append("</rdf:RDF>")
    return "\n".join(lines)


def write_rdfxml(df, path: str) -> None:
    """DISTRIBUTED RDF/XML writer: each partition serializes its rows as
    ONE complete self-contained document part file (own ``<rdf:RDF>``
    wrapper + namespace decls) — no driver collect, mirroring
    ``write_ntriples``'s per-partition shape.  The part-file set is one
    logical graph: read it back with :func:`rdfxml_to_ntriples` (one
    task per part).  Anonymous-bnode caveat: labels are emitted as
    ``rdf:nodeID`` verbatim, so a bnode shared ACROSS partitions stays
    one node only for readers that preserve labels across the part set
    (ours does); co-partition by subject first if that matters."""
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
            yield pd.DataFrame({"value": [rows_to_rdfxml(rows)]})

    flat.mapInPandas(to_doc, "value string") \
        .write.mode("overwrite").text(path)


def _xml_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _xml_attr(s: str) -> str:
    return _xml_text(s).replace('"', "&quot;")
