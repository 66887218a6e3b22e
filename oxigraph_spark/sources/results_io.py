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
    )
    return obj


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
    """One JSON object string per solution (distributed)."""
    parts: List[Column] = [F.lit("{")]
    for i, c in enumerate(df.columns):
        entry = F.when(
            df[c].isNotNull(),
            F.concat(F.lit(f'"{c}":'), json_binding(df[c])))
        parts.append(F.coalesce(
            F.when(F.lit(i) > 0,
                   F.when(df[c].isNotNull(), F.concat(F.lit(","), entry)))
            .otherwise(entry), F.lit("")))
    parts.append(F.lit("}"))
    return df.select(F.concat(*parts).alias("json"))


def to_json_document(df: DataFrame, limit: Optional[int] = None) -> str:
    """Full SPARQL 1.1 Results JSON document.

    **Driver-side ``collect()`` — interop/endpoint-response path ONLY.**
    This materializes the whole result on the driver; NEVER call it on an
    unbounded result at scale (pass ``limit`` or use
    ``json_rows(df).write.text(...)``, which formats and writes fully
    distributed)."""
    rows = json_rows(df if limit is None else df.limit(limit)).collect()
    bindings = ",".join(r.json for r in rows)
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
            if t.kind == T.KIND_IRI:
                out.append(f"<uri>{xml_escape(t.lex)}</uri>")
            elif t.kind == T.KIND_BNODE:
                out.append(f"<bnode>{xml_escape(t.lex)}</bnode>")
            else:
                attrs = ""
                if t.lang:
                    attrs = f' xml:lang="{xml_escape(t.lang)}"'
                elif t.datatype and t.datatype != T.XSD_STRING:
                    attrs = f' datatype="{xml_escape(t.datatype)}"'
                out.append(f"<literal{attrs}>{xml_escape(t.lex)}</literal>")
            out.append("</binding>")
        out.append("</result>")
    out.append("</results></sparql>")
    return "".join(out)


def parse_json_results(doc: str) -> List[Dict[str, dict]]:
    """Results JSON parser (sparesults reader analog; for tests/interop)."""
    data = json.loads(doc)
    return data["results"]["bindings"]
