"""SPARQL-Protocol client for SERVICE federation (J7's default handler).

Reference behavior: upstream ships an HTTP service client that POSTs the
inner pattern to the endpoint and parses the results document
(``lib/spareval/src/service.rs`` · ``ServiceHandler`` and the simple
HTTP client it drives).  Spark re-expression: the call runs
DRIVER-side at plan-build time (remote solution sequences are bounded
protocol responses, not datasets — the reference holds them in memory
too) and materializes a small local DataFrame of TERM structs that joins
into the surrounding plan; Spark then distributes the join itself.  For
endpoint results too large for the driver, register a custom handler
that reads the endpoint's bulk-export path instead — the handler
registry (``plans/compiler.py`` · ``register_service_handler``) takes
precedence over this default.

Protocol: POST ``application/sparql-query``; Accept results JSON (XML
fallback).  SELECT-star semantics: the inner group's verbatim source
(``Service.raw``) plus the query's PREFIX declarations form the remote
query, so FILTERs/subpatterns inside SERVICE are evaluated remotely,
exactly like upstream.
"""

from __future__ import annotations

import json
import urllib.request
from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

from ..model import terms as T


def _binding_term(b: Optional[dict]):
    """Results-JSON binding dict → algebra ground term (None = unbound)."""
    from ..algebra import ast as A
    if b is None:
        return None
    t = b.get("type")
    if t == "uri":
        return A.NamedNode(b["value"])
    if t == "bnode":
        return A.BlankNode(b["value"])
    if t in ("literal", "typed-literal"):
        lang = b.get("xml:lang")
        dt = b.get("datatype")
        if lang:
            return A.Literal(b["value"], lang=lang)
        if dt:
            return A.Literal(b["value"], datatype=dt)
        return A.Literal(b["value"])
    raise ValueError(f"unknown binding type {t!r}")


def bindings_to_df(spark: SparkSession, variables: List[str],
                   bindings: List[Dict[str, dict]]) -> DataFrame:
    """Results bindings → DataFrame with one TERM column per variable."""
    from ..plans.compiler import _term_to_py
    from pyspark.sql.types import StructField, StructType
    rows = [tuple(_term_to_py(_binding_term(b.get(v))) if b.get(v) is not None
                  else None for v in variables)
            for b in bindings]
    schema = StructType([StructField(v, T.TERM_SCHEMA) for v in variables])
    return spark.createDataFrame(rows, schema)


def _parse_results(doc: str, ctype: str) -> Tuple[List[str], List[dict]]:
    from .results_io import parse_tsv_results, parse_xml_results
    if "json" in ctype:
        data = json.loads(doc)
        return list(data["head"]["vars"]), data["results"]["bindings"]
    if "xml" in ctype:
        import xml.etree.ElementTree as ET
        ns = "{http://www.w3.org/2005/sparql-results#}"
        root = ET.fromstring(doc)
        head = root.find(f"{ns}head")
        variables = [v.attrib["name"]
                     for v in (head.findall(f"{ns}variable") if head is not None
                               else [])]
        return variables, parse_xml_results(doc)
    if "tab-separated-values" in ctype:
        lines = [l for l in doc.split("\n") if l != ""]
        variables = ([v[1:] if v.startswith("?") else v
                      for v in lines[0].split("\t")] if lines else [])
        return variables, parse_tsv_results(doc)
    raise ValueError(f"unsupported SERVICE response content type {ctype!r}")


#: Characters that cannot appear inside an IRIREF token (SPARQL grammar
#: [139]): angle brackets, quotes, braces, pipe, caret, backtick,
#: backslash, space.  Control chars are checked separately.
_IRIREF_ILLEGAL = set('<>"{}|^`\\ ')


def term_sparql_token(t) -> Optional[str]:
    """TERM struct Row → SPARQL term token, or None when the term cannot
    be shipped over the protocol (blank nodes are scoped to their
    dataset; quoted triples would need SPARQL-star remotes).  IRIs whose
    lexical form contains characters illegal in an IRIREF are also
    unshippable — interpolating them into ``<...>`` would produce a
    malformed (or injected) remote query; returning None makes the
    caller fall back to the unseeded join instead."""
    k = t["kind"]
    if k == T.KIND_IRI:
        lex = t["lex"]
        if any(c in _IRIREF_ILLEGAL or ord(c) <= 0x20 for c in lex):
            return None
        return f"<{lex}>"
    if k == T.KIND_LITERAL:
        lex = (t["lex"].replace("\\", "\\\\").replace('"', '\\"')
               .replace("\n", "\\n").replace("\r", "\\r"))
        if t["lang"]:
            return f'"{lex}"@{t["lang"]}'
        dt = t["datatype"]
        if dt and dt != T.XSD_STRING:
            return f'"{lex}"^^<{dt}>'
        return f'"{lex}"'
    return None


def values_clause(variables: List[str], rows) -> Optional[str]:
    """Bind-join seed block: ``VALUES (?v …) { (t …) … }`` from collected
    TERM Rows, or None when any term is unshippable.  Callers guarantee
    every row is fully bound (certainly-bound vars only) — UNDEF rows
    would break the bind-join's multiplicity argument (see
    ``Compiler._c_Service``)."""
    head = " ".join("?" + v for v in variables)
    out = []
    for r in rows:
        toks = []
        for v in variables:
            t = r[v]
            tok = None if t is None else term_sparql_token(t)
            if tok is None:
                return None
            toks.append(tok)
        out.append("(" + " ".join(toks) + ")")
    return f"VALUES ({head}) {{ {' '.join(out)} }}"


class HttpServiceHandler:
    """Callable service handler POSTing the pattern to one endpoint.

    Matches the handler protocol the compiler invokes
    (``(spark, pattern, raw=…, prefixes=…, values=…)``); requires the
    parsed ``raw`` source of the inner group (queries built
    programmatically without source text cannot be shipped over the
    wire).  ``values`` is an optional bind-join seed block (a VALUES
    clause string) injected before the pattern, restricting the remote
    evaluation to solutions compatible with the local join partner —
    the FedX-style bound join that turns "download the remote relation"
    into "probe it"."""

    def __init__(self, endpoint: str, timeout: float = 60.0):
        self.endpoint = endpoint
        self.timeout = timeout

    def build_query(self, raw: str, prefixes: Optional[tuple],
                    values: Optional[str] = None) -> str:
        pfx = "".join(f"PREFIX {p}: <{iri}>\n" for p, iri in (prefixes or ()))
        if values:
            return f"{pfx}SELECT * WHERE {{ {values} {raw} }}"
        return f"{pfx}SELECT * WHERE {raw}"

    def __call__(self, spark: SparkSession, pattern, raw: Optional[str] = None,
                 prefixes: Optional[tuple] = None,
                 values: Optional[str] = None) -> DataFrame:
        if raw is None:
            raise ValueError(
                "HTTP SERVICE needs the parsed pattern source (Service.raw); "
                "register a custom handler for programmatic patterns")
        q = self.build_query(raw, prefixes, values)
        req = urllib.request.Request(
            self.endpoint, data=q.encode("utf-8"), method="POST",
            headers={
                "Content-Type": "application/sparql-query",
                "Accept": ("application/sparql-results+json, "
                           "application/sparql-results+xml;q=0.9, "
                           "text/tab-separated-values;q=0.5"),
            })
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            ctype = resp.headers.get("Content-Type", "") or ""
            doc = resp.read().decode("utf-8")
        variables, bindings = _parse_results(doc, ctype)
        return bindings_to_df(spark, variables, bindings)
