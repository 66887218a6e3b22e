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

    def bnode(self) -> A.BlankNode:
        self.n += 1
        return A.BlankNode(f"{self.prefix}{self.n}")

    def li_iri(self, node_el) -> str:
        k = id(node_el)
        self.li[k] = self.li.get(k, 0) + 1
        return f"{RDF_NS}_{self.li[k]}"


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
    return (el.get(_X + "lang", lang) or None,
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
    if about is not None:
        return A.NamedNode(_resolve(about, base))
    rid = el.get(_R + "ID")
    if rid is not None:
        return A.NamedNode(_resolve("#" + rid, base))
    nid = el.get(_R + "nodeID")
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
        st = A.NamedNode(_resolve("#" + rid, base))
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
    """Triples DataFrame → RDF/XML string.  DRIVER-SIDE collect — bounded
    by ``max_rows``; the distributed dump path is N-Triples (this format
    exists for interop with XML toolchains, not for 100 TB exports)."""
    from ..model import terms as T
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"to_rdfxml_document: > {max_rows} triples; dump N-Triples "
            "for large graphs")
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


def _xml_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _xml_attr(s: str) -> str:
    return _xml_text(s).replace('"', "&quot;")
