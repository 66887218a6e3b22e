"""SPARQL query results serializers/parsers (SURVEY.md §2.1 S8).

Reference: ``lib/sparesults/src/{json,xml,csv}.rs`` — SPARQL 1.1 Query
Results JSON/XML Formats and CSV/TSV.  Spark-first split:

- CSV/TSV are DISTRIBUTED writes (``df.write.csv``-shaped; value
  formatting per the W3C CSV/TSV results spec is a column expression);
- JSON/XML carry per-binding structure, so rows are formatted
  distributed (one JSON text line per solution via ``toJSON``-style
  expressions) and only the enclosing envelope is assembled driver-side
  on collect — or streamed to one file for the full document form.
"""

from __future__ import annotations

import json
import re
from typing import Dict, List, Optional
from xml.sax.saxutils import escape as xml_escape

from pyspark.sql import Column, DataFrame, functions as F

from ..model import terms as T


# -- per-term cell formatting ----------------------------------------------

def csv_cell(t: Column) -> Column:
    """CSV results format: plain lexical form (no quoting of terms)."""
    return F.coalesce(t["lex"], F.lit(""))


def tsv_cell(t: Column) -> Column:
    """TSV results format: full N-Triples-style term syntax."""
    from .ntriples import format_term
    return F.coalesce(format_term(t), F.lit(""))


def json_binding(t: Column) -> Column:
    """One variable binding as a JSON object string (RDF term typed)."""
    lit_type = F.when(t["lang"].isNotNull(), F.lit("literal")) \
                .otherwise(F.lit("literal"))
    obj = (
        F.when(t["kind"] == T.KIND_IRI,
               F.concat(F.lit('{"type":"uri","value":"'),
                        _jesc(t["lex"]), F.lit('"}')))
        .when(t["kind"] == T.KIND_BNODE,
              F.concat(F.lit('{"type":"bnode","value":"'),
                       _jesc(t["lex"]), F.lit('"}')))
        .when(t["kind"] == T.KIND_LITERAL,
              F.concat(
                  F.lit('{"type":"literal","value":"'), _jesc(t["lex"]),
                  F.coalesce(
                      F.when(t["lang"].isNotNull(),
                             F.concat(F.lit('","xml:lang":"'), t["lang"])),
                      F.when(t["datatype"].isNotNull()
                             & (t["datatype"] != T.XSD_STRING),
                             F.concat(F.lit('","datatype":"'),
                                      _jesc(t["datatype"]))),
                      F.lit("")),
                  F.lit('"}')))
        # TSV-style flattening: the quoted triple as its N-Triples text.
        # Column expressions can't recurse, so :func:`json_rows` routes
        # triple-bearing rows through an Arrow-batched Python path that
        # emits the spec's nested object instead; this branch only
        # remains for direct callers of json_binding.
        .when(t["kind"] == T.KIND_TRIPLE,
              F.concat(F.lit('{"type":"triple","value":"'),
                       _jesc(t["lex"]), F.lit('"}')))
    )
    return obj


# -- Python-side term formatting (bounded/document paths) -------------------

def _split_nt_tokens(s: str) -> List[str]:
    """Split an N-Triples term sequence into top-level tokens, treating
    strings, IRIs and nested ``<< … >>`` quoted triples as opaque."""
    toks: List[str] = []
    cur: List[str] = []
    i, n, depth = 0, len(s), 0
    while i < n:
        c = s[i]
        if c == '"':
            j = i + 1
            while j < n:
                if s[j] == "\\":
                    j += 2
                elif s[j] == '"':
                    j += 1
                    break
                else:
                    j += 1
            cur.append(s[i:j]); i = j
        elif s.startswith("<<", i):
            depth += 1; cur.append("<<"); i += 2
        elif s.startswith(">>", i):
            depth -= 1; cur.append(">>"); i += 2
        elif c == "<":
            j = s.find(">", i)
            j = n if j < 0 else j + 1
            cur.append(s[i:j]); i = j
        elif c.isspace() and depth == 0:
            if cur:
                toks.append("".join(cur)); cur = []
            i += 1
        else:
            cur.append(c); i += 1
    if cur:
        toks.append("".join(cur))
    return toks


def term_to_json_obj(t) -> Optional[dict]:
    """TERM struct Row → SPARQL results JSON binding object, including
    the SPARQL 1.2 nested ``triple`` form for quoted-triple terms."""
    if t is None:
        return None
    k = t["kind"]
    if k == T.KIND_IRI:
        return {"type": "uri", "value": t["lex"]}
    if k == T.KIND_BNODE:
        return {"type": "bnode", "value": t["lex"]}
    if k == T.KIND_LITERAL:
        d = {"type": "literal", "value": t["lex"]}
        if t["lang"]:
            d["xml:lang"] = t["lang"]
        elif t["datatype"] and t["datatype"] != T.XSD_STRING:
            d["datatype"] = t["datatype"]
        return d
    if k == T.KIND_TRIPLE:
        return _triple_lex_to_json(t["lex"])
    raise ValueError(f"unexpected term kind {k}")


def _triple_lex_to_json(lex: str) -> dict:
    s, p, o = _split_nt_tokens(lex)
    return {"type": "triple",
            "value": {"subject": _nt_token_to_json(s),
                      "predicate": _nt_token_to_json(p),
                      "object": _nt_token_to_json(o)}}


def _nt_token_to_json(tok: str) -> dict:
    if tok.startswith("<<") and tok.endswith(">>"):
        return _triple_lex_to_json(tok[2:-2].strip())
    d = parse_tsv_term(tok)
    assert d is not None
    return d


def _jesc(c: Column) -> Column:
    c = F.regexp_replace(c, r"\\", r"\\\\")
    c = F.regexp_replace(c, "\"", "\\\\\"")
    c = F.regexp_replace(c, "\n", r"\\n")
    c = F.regexp_replace(c, "\r", r"\\r")
    c = F.regexp_replace(c, "\t", r"\\t")
    return c


# -- whole result set ------------------------------------------------------

def write_csv(df: DataFrame, path: str) -> None:
    """Distributed CSV results write (header = variable names)."""
    out = df.select(*[csv_cell(df[c]).alias(c) for c in df.columns])
    out.write.mode("overwrite").option("header", True).csv(path)


def write_tsv(df: DataFrame, path: str) -> None:
    out = df.select(*[tsv_cell(df[c]).alias(c) for c in df.columns])
    out.write.mode("overwrite").option("header", True) \
       .option("sep", "\t").option("quote", "").csv(path)


def json_rows(df: DataFrame) -> DataFrame:
    """One JSON object string per solution (distributed).

    Rows whose bindings are all IRI/bnode/literal format as pure column
    expressions (JVM-side, whole-stage codegen).  Rows holding a
    quoted-triple term are split off and formatted in an Arrow-batched
    ``mapInPandas`` via :func:`term_to_json_obj`, so the distributed
    writer emits the same SPARQL 1.2 nested
    ``{"type":"triple","value":{subject,predicate,object}}`` object as
    the bounded document form (line ORDER across the two branches is
    not preserved — result sets without ORDER BY are unordered anyway,
    and part files never preserve it)."""
    cols = list(df.columns)
    # null-compacted array join: commas separate exactly the BOUND
    # entries (the old prefix-comma chain emitted invalid `{,"b":…}`
    # when the first column was unbound — caught by the round-7
    # round-trip fuzz)
    frags = [F.when(df[c].isNotNull(),
                    F.concat(F.lit(f'"{c}":'), json_binding(df[c])))
             for c in cols]
    fast = F.concat(
        F.lit("{"),
        F.array_join(F.array_compact(F.array(*frags)), ","),
        F.lit("}")).alias("json")

    has_triple = F.lit(False)
    for c in cols:
        has_triple = has_triple | F.coalesce(
            df[c]["kind"] == T.KIND_TRIPLE, F.lit(False))
    plain = df.filter(~has_triple).select(fast)

    def exact(batches):
        import pandas as pd
        for pdf in batches:
            # Arrow structs arrive as dicts; null structs as None/NaN
            vals = [json.dumps(
                {c: term_to_json_obj(rec[c]) for c in cols
                 if isinstance(rec[c], dict)},
                ensure_ascii=False, separators=(",", ":"))
                for rec in pdf.to_dict("records")]
            yield pd.DataFrame({"json": vals})

    tri = df.filter(has_triple).mapInPandas(exact, "json string")
    return plain.unionByName(tri)


def to_json_document(df: DataFrame, limit: Optional[int] = None) -> str:
    """Full SPARQL 1.1 Results JSON document.

    **Driver-side ``collect()`` — interop/endpoint-response path ONLY.**
    This materializes the whole result on the driver; NEVER call it on an
    unbounded result at scale (pass ``limit`` or use
    ``json_rows(df).write.text(...)``, which formats and writes fully
    distributed)."""
    rows = (df if limit is None else df.limit(limit)).collect()
    bindings = ",".join(
        json.dumps({c: term_to_json_obj(r[c]) for c in df.columns
                    if r[c] is not None}, ensure_ascii=False,
                   separators=(",", ":"))
        for r in rows)
    head = json.dumps({"vars": list(df.columns)})
    return ('{"head":' + head
            + ',"results":{"bindings":[' + bindings + "]}}")


def to_xml_document(df: DataFrame, limit: Optional[int] = None) -> str:
    """SPARQL 1.1 Results XML document.

    **Driver-side ``collect()`` — interop/tests ONLY**; same size caveat
    as :func:`to_json_document` (pass ``limit`` at scale)."""
    out = ['<?xml version="1.0"?>',
           '<sparql xmlns="http://www.w3.org/2005/sparql-results#">',
           "<head>"]
    for c in df.columns:
        out.append(f'<variable name="{xml_escape(c)}"/>')
    out.append("</head><results>")
    rows = (df if limit is None else df.limit(limit)).collect()
    for r in rows:
        out.append("<result>")
        for c in df.columns:
            t = r[c]
            if t is None:
                continue
            out.append(f'<binding name="{xml_escape(c)}">')
            out.append(_xml_term(term_to_json_obj(t)))
            out.append("</binding>")
        out.append("</result>")
    out.append("</results></sparql>")
    return "".join(out)


def _xml_term(d: dict) -> str:
    """Binding JSON object → SPARQL results XML element (SPARQL 1.2
    ``<triple>`` nesting for quoted-triple terms)."""
    t = d["type"]
    if t == "uri":
        return f"<uri>{xml_escape(d['value'])}</uri>"
    if t == "bnode":
        return f"<bnode>{xml_escape(d['value'])}</bnode>"
    if t == "triple":
        v = d["value"]
        return ("<triple><subject>" + _xml_term(v["subject"])
                + "</subject><predicate>" + _xml_term(v["predicate"])
                + "</predicate><object>" + _xml_term(v["object"])
                + "</object></triple>")
    attrs = ""
    if d.get("xml:lang"):
        attrs = f' xml:lang="{xml_escape(d["xml:lang"])}"'
    elif d.get("datatype"):
        attrs = f' datatype="{xml_escape(d["datatype"])}"'
    return f"<literal{attrs}>{xml_escape(d['value'])}</literal>"


def to_csv_document(df: DataFrame, limit: Optional[int] = None) -> str:
    """Results CSV document (driver-side, bounded — endpoint responses).
    Spec-lossy like :func:`write_csv`: plain lexical forms, RFC-4180
    quoting when a cell holds comma/quote/newline."""
    c = F.concat_ws(",", *[
        F.when(csv_cell(df[x]).rlike('[",\n\r]'),
               F.concat(F.lit('"'),
                        F.regexp_replace(csv_cell(df[x]), '"', '""'),
                        F.lit('"')))
         .otherwise(csv_cell(df[x])) for x in df.columns])
    rows = (df if limit is None else df.limit(limit)) \
        .select(c.alias("line")).collect()
    return "\r\n".join([",".join(df.columns)] + [r.line for r in rows]) \
        + "\r\n"


def to_tsv_document(df: DataFrame, limit: Optional[int] = None) -> str:
    """Results TSV document (driver-side, bounded — endpoint responses):
    W3C ``?var`` header + N-Triples-style term tokens."""
    c = F.concat_ws("\t", *[tsv_cell(df[x]) for x in df.columns])
    rows = (df if limit is None else df.limit(limit)) \
        .select(c.alias("line")).collect()
    hdr = "\t".join("?" + x for x in df.columns)
    return "\n".join([hdr] + [r.line for r in rows]) + "\n"


def parse_json_results(doc: str) -> List[Dict[str, dict]]:
    """Results JSON parser (sparesults reader analog; for tests/interop).
    Truncated or non-results documents raise (JSONDecodeError /
    ValueError) rather than returning an empty binding list."""
    data = json.loads(doc)
    if (not isinstance(data, dict) or not isinstance(data.get("results"), dict)
            or not isinstance(data["results"].get("bindings"), list)):
        raise ValueError(
            "not a SPARQL results JSON document (missing results.bindings)")
    bindings = data["results"]["bindings"]
    for row in bindings:
        if isinstance(row, dict):
            for term in row.values():
                _lc_lang_inplace(term)
    return bindings


def _lc_lang_inplace(term) -> None:
    """Lowercase ``xml:lang`` (recursing into quoted-triple values) so
    interop-parsed terms share identity with the data readers, which
    all lowercase language tags on read."""
    if not isinstance(term, dict):
        return
    lang = term.get("xml:lang")
    if isinstance(lang, str):
        term["xml:lang"] = lang.lower()
    val = term.get("value")
    if term.get("type") == "triple" and isinstance(val, dict):
        for sub in val.values():
            _lc_lang_inplace(sub)


# -- results parsers for the other three formats ---------------------------
# Reference: lib/sparesults/src/{xml,csv}.rs readers — upstream round-trips
# every format it writes; these close that gap for federation/test interop.
# All return the Results-JSON binding-dict shape so the four formats
# compare uniformly ({"type": "uri"|"bnode"|"literal", "value": ...,
# "xml:lang"? , "datatype"?}).  CSV is lossy BY SPEC (plain lexical
# forms): its parser returns untyped literal bindings.

_XMLNS = "{http://www.w3.org/2005/sparql-results#}"
_XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"


def parse_xml_results(doc: str) -> List[Dict[str, dict]]:
    """SPARQL 1.1 Results XML parser (driver-side; endpoint responses
    are single bounded documents)."""
    import xml.etree.ElementTree as ET
    root = ET.fromstring(doc)
    out: List[Dict[str, dict]] = []
    results = root.find(f"{_XMLNS}results")
    if results is None:
        return out
    for res in results.findall(f"{_XMLNS}result"):
        b: Dict[str, dict] = {}
        for bind in res.findall(f"{_XMLNS}binding"):
            name = bind.attrib["name"]
            term = _parse_xml_term(bind)
            if term is not None:
                b[name] = term
        out.append(b)
    return out


def _parse_xml_term(el) -> Optional[dict]:
    """First term child of a binding/subject/predicate/object element →
    binding JSON object (recursive for SPARQL 1.2 <triple>)."""
    uri = el.find(f"{_XMLNS}uri")
    bnode = el.find(f"{_XMLNS}bnode")
    lit = el.find(f"{_XMLNS}literal")
    tri = el.find(f"{_XMLNS}triple")
    if uri is not None:
        return {"type": "uri", "value": uri.text or ""}
    if bnode is not None:
        return {"type": "bnode", "value": bnode.text or ""}
    if tri is not None:
        return {"type": "triple", "value": {
            pos: _parse_xml_term(tri.find(f"{_XMLNS}{pos}"))
            for pos in ("subject", "predicate", "object")}}
    if lit is not None:
        d = {"type": "literal", "value": lit.text or ""}
        lang = lit.attrib.get(_XML_LANG)
        dt = lit.attrib.get("datatype")
        if lang:
            d["xml:lang"] = lang.lower()
        elif dt:
            d["datatype"] = dt
        return d
    return None


def parse_xml_boolean(doc: str) -> Optional[bool]:
    """ASK-form Results XML → bool (None when the doc is a SELECT form)."""
    import xml.etree.ElementTree as ET
    node = ET.fromstring(doc).find(f"{_XMLNS}boolean")
    return None if node is None else (node.text or "").strip() == "true"


_TSV_LIT = re.compile(
    r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9-]+)|\^\^<([^>]*)>)?$')


_TSV_ESCAPES = {"n": "\n", "r": "\r", "t": "\t", '"': '"', "\\": "\\",
                "'": "'", "b": "\b", "f": "\f"}


def _nt_unescape(s: str) -> str:
    out: List[str] = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\":
            nxt = s[i + 1:i + 2]
            if nxt in ("u", "U"):
                # UCHAR: SPARQL-syntax terms in TSV results may carry
                # \uXXXX / \UXXXXXXXX escapes (sparesults decodes them)
                n = 4 if nxt == "u" else 8
                hexs = s[i + 2:i + 2 + n]
                if len(hexs) != n or any(
                        ch not in "0123456789abcdefABCDEF" for ch in hexs):
                    raise ValueError(
                        f"malformed \\{nxt} escape in TSV literal: "
                        f"\\{nxt}{hexs!r}")
                cp = int(hexs, 16)
                if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
                    raise ValueError(
                        f"\\{nxt} escape outside Unicode scalar range: "
                        f"\\{nxt}{hexs}")
                out.append(chr(cp))
                i += 2 + n
            elif not nxt or nxt not in _TSV_ESCAPES:
                # round-8: an unknown escape is a PARSE error, not a
                # silently-dropped backslash (ECHAR is a closed set)
                raise ValueError(
                    f"illegal escape in TSV literal: \\{nxt}")
            else:
                out.append(_TSV_ESCAPES[nxt])
                i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def parse_tsv_term(tok: str) -> Optional[dict]:
    """One TSV cell (N-Triples-style token) → binding dict; '' = unbound."""
    if tok == "":
        return None
    if tok.startswith("<<") and tok.endswith(">>"):
        return _triple_lex_to_json(tok[2:-2].strip())
    if tok.startswith("<"):
        if not tok.endswith(">") or any(c in tok[1:-1] for c in '<>" '):
            raise ValueError(f"malformed TSV IRI token: {tok[:60]!r}")
        val = tok[1:-1]
        if "\\" in val:
            # IRIREF allows only UCHAR escapes; _nt_unescape handles
            # them (an ECHAR like \n inside an IRI is also caught there
            # as data rather than structure — harmless on this path)
            val = _nt_unescape(val)
        return {"type": "uri", "value": val}
    if tok.startswith("_:"):
        return {"type": "bnode", "value": tok[2:]}
    if tok.startswith('"'):
        m = _TSV_LIT.match(tok)
        if not m:
            # unterminated/garbage-suffixed literal is a PARSE error —
            # the bare-token shorthand below must not swallow it
            raise ValueError(f"malformed TSV literal token: {tok[:60]!r}")
        d = {"type": "literal", "value": _nt_unescape(m.group(1))}
        if m.group(2):
            # lowercase for term-identity consistency with the data
            # readers (BCP-47 tags compare case-insensitively)
            d["xml:lang"] = m.group(2).lower()
        elif m.group(3) and m.group(3) != T.XSD_STRING:
            d["datatype"] = m.group(3)
        return d
    # bare token: the W3C TSV numeric/boolean shorthand
    return {"type": "literal", "value": tok}


def parse_tsv_results(text: str) -> List[Dict[str, dict]]:
    """Results TSV parser.  Accepts both W3C-style ``?var`` headers and
    the bare variable names :func:`write_tsv` emits."""
    lines = [l for l in text.split("\n") if l != ""]
    if not lines:
        return []
    hdr = [v[1:] if v.startswith("?") else v for v in lines[0].split("\t")]
    out: List[Dict[str, dict]] = []
    for line in lines[1:]:
        cells = line.split("\t")
        if len(cells) != len(hdr):
            raise ValueError(
                f"TSV row arity {len(cells)} != header arity {len(hdr)}: "
                f"{line[:60]!r}")
        b = {}
        for var, tok in zip(hdr, cells):
            term = parse_tsv_term(tok)
            if term is not None:
                b[var] = term
        out.append(b)
    return out


def parse_csv_results(text: str) -> List[Dict[str, dict]]:
    """Results CSV parser — lossy by spec: every bound value comes back
    as a plain (untyped) literal binding; empty cells are unbound."""
    import csv as _csv
    import io
    rows = list(_csv.reader(io.StringIO(text)))
    if not rows:
        return []
    hdr = rows[0]
    out: List[Dict[str, dict]] = []
    for cells in rows[1:]:
        b = {}
        for var, val in zip(hdr, cells):
            if val != "":
                b[var] = {"type": "literal", "value": val}
        out.append(b)
    return out
