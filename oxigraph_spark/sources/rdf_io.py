"""Unified RDF I/O dispatch (SURVEY.md §2.1 S7).

Reference: ``lib/oxrdfio/src/{format,parser,serializer}.rs`` ·
``RdfFormat``/``RdfParser``/``RdfSerializer`` facade.  Formats:

- ``ntriples`` / ``nquads``: distributed line-based read/write (S2);
- ``turtle``: driver-side reader for small files; distributed paths:
  :func:`turtle_to_ntriples` (one task per file) for a corpus of .ttl
  files, and :func:`turtle_to_ntriples_chunked` for ONE large document
  (statement-boundary chunking — see its docstring for the long-literal
  caveat);
- ``trig``: Turtle + named-graph blocks ``[GRAPH] <g> { … }``;
  driver-side small reader, distributed block writer (TriG allows a
  graph label to open multiple blocks, so partitions write
  independently);
- ``rdfxml`` (S5): driver-side small reader + writer; distributed path
  :func:`rdfxml.rdfxml_to_ntriples` (one task per file);
- ``jsonld`` (S6): expanded form only (compacted docs must be expanded
  by a JSON-LD processor first — @context raises); same small/driver +
  per-file distributed split;
- ``n3`` (S4): the Turtle-compatible subset (no formulas/rules — those
  have no RDF data model to map onto; a ``{`` formula raises).
"""

from __future__ import annotations

import os
import re
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

from ..model import terms as T

FORMATS = ("ntriples", "nquads", "turtle", "trig", "rdfxml", "jsonld", "n3")


def load_rdf(spark: SparkSession, path: str, fmt: Optional[str] = None) -> DataFrame:
    """Read an RDF file into a quads DataFrame (s, p, o, g)."""
    fmt = fmt or guess_format(path)
    if fmt == "ntriples":
        from .ntriples import read_ntriples
        return read_ntriples(spark, path, quads=False)
    if fmt == "nquads":
        from .ntriples import read_ntriples
        return read_ntriples(spark, path, quads=True)
    if fmt in ("turtle", "n3"):
        return _read_turtle_small(spark, path, n3=(fmt == "n3"))
    if fmt == "trig":
        return _read_trig_small(spark, path)
    if fmt == "rdfxml":
        from .rdfxml import read_rdfxml_small
        return read_rdfxml_small(spark, path)
    if fmt == "jsonld":
        from .jsonld import read_jsonld_small
        return read_jsonld_small(spark, path)
    raise NotImplementedError(f"format {fmt!r}: supported = {FORMATS}")


def dump_rdf(df: DataFrame, path: str, fmt: str = "ntriples") -> None:
    """Serialize quads to files (Store::dump_to_writer analog).
    N-Triples/N-Quads write distributed; RDF/XML and JSON-LD are
    driver-side single-document writers (bounded, for interop)."""
    from .ntriples import write_ntriples
    if fmt == "ntriples":
        write_ntriples(df, path, quads=False)
    elif fmt == "nquads":
        write_ntriples(df, path, quads=True)
    elif fmt == "trig":
        write_trig(df, path)
    elif fmt == "rdfxml":
        from .rdfxml import to_rdfxml_document
        with open(path, "w", encoding="utf-8") as f:
            f.write(to_rdfxml_document(df))
    elif fmt == "jsonld":
        from .jsonld import to_jsonld_document
        with open(path, "w", encoding="utf-8") as f:
            f.write(to_jsonld_document(df))
    else:
        raise NotImplementedError(f"serializer for {fmt!r}")


def guess_format(path: str) -> str:
    ext = os.path.splitext(path)[1].lower()
    return {".nt": "ntriples", ".nq": "nquads", ".ttl": "turtle",
            ".trig": "trig", ".n3": "n3", ".rdf": "rdfxml",
            ".rdfxml": "rdfxml", ".owl": "rdfxml", ".xml": "rdfxml",
            ".jsonld": "jsonld", ".json": "jsonld"}.get(ext, "ntriples")


# -- distributed Turtle → N-Triples conversion ------------------------------

def turtle_to_ntriples(spark: SparkSession, in_path: str,
                       out_path: str) -> None:
    """Distributed Turtle→N-Triples conversion — the preprocessing step
    for the scale path (S3): Turtle's stateful prefixes make one FILE the
    unit of parallelism (it cannot be line-split), so a corpus of .ttl
    files converts with one task per file via ``wholetext`` read +
    ``mapInPandas``.  The resulting N-Triples directory then reads
    line-parallel at any scale with :func:`load_rdf`.

    Executor-side parsing reuses the same grammar as the driver-side
    small reader; malformed files raise (fail-fast like the reference's
    strict parser)."""
    files = spark.read.text(in_path, wholetext=True)

    def convert(batches):
        import pandas as pd
        for pdf in batches:
            lines: List[str] = []
            for text in pdf["value"]:
                lines.extend(turtle_text_to_nt_lines(text))
            yield pd.DataFrame({"value": lines})

    files.mapInPandas(convert, "value string") \
         .write.mode("overwrite").text(out_path)


def turtle_text_to_nt_lines(text: str) -> List[str]:
    """One Turtle document → canonical N-Triples lines (pure Python —
    runs on executors inside :func:`turtle_to_ntriples`)."""
    from ..algebra import ast as A
    from ..algebra.parser import Parser
    from ..plans.compiler import _py_token
    prefixes = dict(_TTL_PREFIX.findall(text))
    body = _TTL_PREFIX.sub("", text)
    p = Parser("{" + body + "}")
    p.prefixes.update(prefixes)
    pattern = p._group_graph_pattern()
    out: List[str] = []
    if isinstance(pattern, A.BGP):
        def ground(t):
            return A.BlankNode(t.name) if isinstance(t, A.Var) else t
        for tp in pattern.patterns:
            if isinstance(tp, A.TriplePattern):
                out.append(f"{_py_token(ground(tp.s))} "
                           f"{_py_token(ground(tp.p))} "
                           f"{_py_token(ground(tp.o))} .")
    return out


# -- minimal driver-side Turtle reader (small files only) -------------------

_TTL_PREFIX = re.compile(r"@prefix\s+([A-Za-z0-9_-]*):\s*<([^>]*)>\s*\.")


def _read_turtle_small(spark: SparkSession, path: str,
                       max_bytes: int = 64 << 20,
                       n3: bool = False) -> DataFrame:
    """Convert a SMALL Turtle file to triples driver-side, then
    parallelize.  Supports prefixes, ``a``, ``;``/``,`` lists and plain
    terms — not nested bnodes/collections (use N-Triples for those).

    ``n3=True`` reads the Turtle-compatible subset of Notation3 (S4):
    N3's extensions — formulas ``{...}``, rules ``=>``, ``@forAll`` /
    ``@forSome`` — have no RDF data-model mapping, so they raise rather
    than silently drop."""
    size = os.path.getsize(path)
    if size > max_bytes:
        raise ValueError(
            f"turtle file {size >> 20} MiB > {max_bytes >> 20} MiB limit: "
            "convert to N-Triples for the distributed path")
    text = open(path, encoding="utf-8").read()
    if n3:
        stripped = re.sub(r'"(?:[^"\\]|\\.)*"', '""', text)  # ignore strings
        for tok in ("{", "=>", "@forAll", "@forSome"):
            if tok in stripped:
                raise NotImplementedError(
                    f"N3 {tok!r}: formulas/rules are outside the RDF data "
                    "model; only the Turtle-compatible N3 subset is read")
    prefixes = dict(_TTL_PREFIX.findall(text))
    body = _TTL_PREFIX.sub("", text)
    from ..algebra.parser import Parser
    # reuse the SPARQL triples grammar: a Turtle statement block is the
    # same surface as a BGP with ground terms
    p = Parser("{" + body + "}")
    p.prefixes.update(prefixes)
    pattern = p._group_graph_pattern()
    from ..algebra import ast as A
    triples: List[Tuple] = []
    if isinstance(pattern, A.BGP):
        from ..plans.compiler import _term_to_py

        def ground(t):
            # the SPARQL grammar surfaces Turtle bnodes as variables;
            # in DATA they are blank node terms
            return A.BlankNode(t.name) if isinstance(t, A.Var) else t

        for tp in pattern.patterns:
            if isinstance(tp, A.TriplePattern):
                triples.append((_term_to_py(ground(tp.s)),
                                _term_to_py(ground(tp.p)),
                                _term_to_py(ground(tp.o)),
                                (T.KIND_DEFAULT_GRAPH, "", None, None, None,
                                 None, None, None, None)))
    from pyspark.sql.types import StructField, StructType
    schema = StructType([StructField(c, T.TERM_SCHEMA)
                         for c in ("s", "p", "o", "g")])
    return spark.createDataFrame(triples, schema)
