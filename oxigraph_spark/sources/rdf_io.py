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
- ``rdfxml`` (S5): driver-side small reader + writer; distributed
  paths :func:`rdfxml.rdfxml_to_ntriples` (one task per file) and
  :func:`rdfxml.rdfxml_to_ntriples_chunked` for ONE large document
  (top-level elements split across line-parallel partitions via a
  12-state scanner transition composition);
- ``jsonld`` (S6): driver-side small reader (expanded + inline-context
  compact); distributed per-file :func:`jsonld.jsonld_to_ntriples` and
  :func:`jsonld.jsonld_to_ntriples_chunked` for ONE large root-array
  document (brace-depth chunking — JSON strings cannot span lines, so
  the per-partition scan composes with a single depth delta);
- ``n3`` (S4): the Turtle-compatible subset (no formulas/rules — those
  have no RDF data model to map onto; a ``{`` formula raises).
"""

from __future__ import annotations

import os
import re
from functools import reduce
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


def dump_rdf(df: DataFrame, path: str, fmt: str = "ntriples",
             distributed: bool = True) -> None:
    """Serialize quads to files (Store::dump_to_writer analog).

    Every format has a DISTRIBUTED per-partition part-file writer
    (default).  ``distributed=False`` switches RDF/XML and JSON-LD to
    the bounded driver-side single-document writers (``path`` is then
    one file, for interop with tools expecting exactly one document)."""
    from .ntriples import write_ntriples
    if fmt == "ntriples":
        write_ntriples(df, path, quads=False)
    elif fmt == "nquads":
        write_ntriples(df, path, quads=True)
    elif fmt == "turtle":
        write_turtle(df, path)
    elif fmt == "trig":
        write_trig(df, path)
    elif fmt == "rdfxml":
        if distributed:
            from .rdfxml import write_rdfxml
            write_rdfxml(df, path)
        else:
            from .rdfxml import to_rdfxml_document
            with open(path, "w", encoding="utf-8") as f:
                f.write(to_rdfxml_document(df))
    elif fmt == "jsonld":
        if distributed:
            from .jsonld import write_jsonld
            write_jsonld(df, path)
        else:
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


def turtle_text_to_nt_lines(text: str,
                            prefixes: Optional[dict] = None,
                            base: Optional[str] = None) -> List[str]:
    """One Turtle document → canonical N-Triples lines (pure Python —
    runs on executors inside :func:`turtle_to_ntriples`).  ``prefixes``
    supplies externally-known prefix bindings (the chunked path's
    document header); in-document directives still win."""
    from ..plans.compiler import _py_token
    out: List[str] = []
    for i, (sbase, sprefixes, sbody) in enumerate(
            _directive_segments(text, prefixes, base)):
        for s, p, o in _parse_turtle_triples(
                sbody, sprefixes, sbase,
                bnode_ns=f"s{i}" if i else "", as_ast=True):
            out.append(f"{_py_token(s)} {_py_token(p)} {_py_token(o)} .")
    return out


# -- minimal driver-side Turtle reader (small files only) -------------------

_TTL_PREFIX = re.compile(
    r"(?:@prefix|^[ \t]*PREFIX)\s+([A-Za-z0-9_-]*):\s*<([^>]*)>\s*\.?",
    re.MULTILINE | re.IGNORECASE)
_TTL_BASE = re.compile(
    r"(?:@base|^[ \t]*BASE)\s*<([^>]*)>\s*\.?",
    re.MULTILINE | re.IGNORECASE)


def _opaque_spans(text: str) -> List[Tuple[int, int]]:
    """Half-open index spans of string literals, IRIs and comments —
    regions where directive-looking text is DATA, not syntax (same
    opacity discipline as :func:`_require_final_dot` /
    :func:`_split_trig_blocks`)."""
    spans: List[Tuple[int, int]] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in "\"'":
            try:
                j = _skip_string(text, i)
            except ValueError:
                j = n  # unterminated (chunk fragment): opaque to the end
            spans.append((i, j))
            i = j
        elif ch == "<":
            j = text.find(">", i)
            j = n if j < 0 else j + 1
            spans.append((i, j))
            i = j
        elif ch == "#":
            j = text.find("\n", i)
            j = n if j < 0 else j
            spans.append((i, j))
            i = j
        else:
            i += 1
    return spans


def _strip_directives(text: str, ext_prefixes: dict = None,
                      ext_base: str = None):
    """Extract Turtle prologue directives (@prefix/@base and their
    SPARQL-style PREFIX/BASE forms, Turtle 1.1 §6.3) → (base, prefixes,
    body).  Prefix IRIs resolve against the base (first @base wins;
    mid-document re-declaration is not supported — the grammar subset
    documented on _read_turtle_small).  External bindings (chunked-path
    document header) lose to in-document ones.

    Directive matches INSIDE string literals, IRIs or comments are data
    and are neither honored nor stripped (a literal containing
    ``@base <x> .`` survives intact)."""
    from ..algebra.parser import resolve_iri
    spans = _opaque_spans(text)

    def outside(pos: int) -> bool:
        return not any(a <= pos < b for a, b in spans)

    m = next((m for m in _TTL_BASE.finditer(text) if outside(m.start())),
             None)
    base = resolve_iri(ext_base, m.group(1)) if m else ext_base
    prefixes = dict(ext_prefixes or {})
    cuts: List[Tuple[int, int]] = []
    for m in _TTL_PREFIX.finditer(text):
        if outside(m.start()):
            prefixes[m.group(1)] = resolve_iri(base, m.group(2))
            cuts.append(m.span())
    cuts.extend(m.span() for m in _TTL_BASE.finditer(text)
                if outside(m.start()))
    body = text
    for a, b in sorted(cuts, reverse=True):
        body = body[:a] + body[b:]
    return base, prefixes, body


def _directive_segments(text: str, ext_prefixes: dict = None,
                        ext_base: str = None):
    """Position-sensitive directive handling (Turtle 1.1 §6.3: a
    directive applies from its position to the end or its next
    re-declaration — ``@prefix p:`` may be re-bound mid-document, and a
    relative ``@base`` resolves against the PREVIOUS base).  Returns
    ``[(base, prefixes_snapshot, body_segment), ...]`` in document
    order; directive text inside strings/IRIs/comments is data and is
    neither honored nor cut (same opacity discipline as
    :func:`_strip_directives`)."""
    from ..algebra.parser import resolve_iri
    spans = _opaque_spans(text)

    def outside(pos: int) -> bool:
        return not any(a <= pos < b for a, b in spans)

    ds = []
    for m in _TTL_PREFIX.finditer(text):
        if outside(m.start()):
            ds.append((m.start(), m.end(), "p", m.group(1), m.group(2)))
    for m in _TTL_BASE.finditer(text):
        if outside(m.start()):
            ds.append((m.start(), m.end(), "b", None, m.group(1)))
    ds.sort()
    segs = []
    base = ext_base
    prefixes = dict(ext_prefixes or {})
    pos = 0
    for a, b, kind, name, iri in ds:
        if text[pos:a].strip():
            segs.append((base, dict(prefixes), text[pos:a]))
        if kind == "b":
            base = resolve_iri(base, iri)
        else:
            prefixes[name] = resolve_iri(base, iri)
        pos = b
    if text[pos:].strip() or not segs:
        segs.append((base, dict(prefixes), text[pos:]))
    return segs


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
    triples = []
    for i, (base, prefixes, body) in enumerate(_directive_segments(text)):
        triples += [(s, p, o, _DEFAULT_G)
                    for s, p, o in _parse_turtle_triples(
                        body, prefixes, base,
                        bnode_ns=f"s{i}" if i else "")]
    return _quads_df(spark, triples)


_DEFAULT_G = (T.KIND_DEFAULT_GRAPH, "", None, None, None, None, None, None,
              None)


def _quads_df(spark: SparkSession, rows: List[Tuple]) -> DataFrame:
    from pyspark.sql.types import StructField, StructType
    schema = StructType([StructField(c, T.TERM_SCHEMA)
                         for c in ("s", "p", "o", "g")])
    return spark.createDataFrame(rows, schema)


def _parse_turtle_triples(body: str, prefixes: dict,
                          base: Optional[str] = None,
                          require_dot: bool = True,
                          bnode_ns: str = "",
                          as_ast: bool = False) -> List[Tuple]:
    """Turtle statement text (sans @prefix directives) → ``(s, p, o)``
    py-term tuples.  Reuses the SPARQL triples grammar: a Turtle
    statement block is the same surface as a BGP with ground terms.

    ``require_dot=False`` for TriG graph-block text: the TriG grammar
    (``wrappedGraph ::= '{' triplesBlock? '}'``, ``triplesBlock ::=
    triples ('.' triplesBlock?)?``) makes the final '.' inside braces
    optional, unlike top-level Turtle statements."""
    from ..algebra import ast as A
    from ..algebra.parser import ParseError, Parser
    from ..plans.compiler import _term_to_py
    if require_dot:
        _require_final_dot(body)
    # the trailing newline keeps a final '#' comment in the document
    # from swallowing the closing brace (round-9: a trailing comment
    # made the whole block a parse error)
    p = Parser("{" + body + "\n}")
    p.base = base
    p.prefixes.update(prefixes)
    p.data_mode = True
    pattern = p._group_graph_pattern()
    triples: List[Tuple] = []
    if isinstance(pattern, A.BGP):
        def ground(t):
            # the SPARQL grammar surfaces Turtle bnodes as variables;
            # in DATA they are blank node terms.  bnode_ns disambiguates
            # PARSER-GENERATED labels (anonymous []/collection nodes)
            # across the separate Parser instances a segmented document
            # or a multi-block TriG doc uses — each parser restarts its
            # counters at 0, so two distinct [] in different segments
            # would otherwise merge into one bnode.  Explicit _:labels
            # are document-scoped and stay shared.
            if not isinstance(t, A.Var):
                return t
            nm = t.name
            if bnode_ns and (nm.startswith("__anon")
                             or nm.startswith("__list")):
                nm = f"__{bnode_ns}_{nm[2:]}"
            return A.BlankNode(nm)

        for tp in pattern.patterns:
            if isinstance(tp, A.TriplePattern):
                # Turtle is stricter than the SPARQL triples grammar:
                # no literal subjects (the SPARQL grammar's GraphTerm
                # allows them in patterns; Turtle's `subject` does not)
                if isinstance(tp.s, A.Literal):
                    raise ParseError(
                        f"literal {tp.s.lex!r} as Turtle subject")
                conv = (lambda t: t) if as_ast else _term_to_py
                triples.append((conv(ground(tp.s)),
                                conv(ground(tp.p)),
                                conv(ground(tp.o))))
            else:
                # the SPARQL grammar this parser reuses also matches
                # property paths (":s :p+ :o"); those are NOT Turtle —
                # rejecting here keeps an illegal statement from being
                # silently dropped (round-9: ":s :p +2E-1 ." parsed as
                # the path ":p+" and vanished)
                raise ParseError(
                    f"not a Turtle statement: {type(tp).__name__} "
                    f"(property paths are not valid in data documents)")
    else:
        raise ParseError(
            f"not Turtle statement text: parsed as {type(pattern).__name__}")
    return triples


def _require_final_dot(body: str) -> None:
    """Turtle requires '.' after every statement; the SPARQL group
    grammar this parser reuses makes the FINAL one optional — enforce it
    here.  Scans with string/IRI/comment opacity (same discipline as
    _split_trig_blocks)."""
    from ..algebra.parser import ParseError
    last = ""
    i, n = 0, len(body)
    while i < n:
        ch = body[i]
        if ch in "\"'":
            i = _skip_string(body, i)
            last = '"'
        elif ch == "<":
            j = body.find(">", i)
            i = n if j < 0 else j + 1
            last = ">"
        elif ch == "#":
            j = body.find("\n", i)
            i = n if j < 0 else j
        elif ch in " \t\r\n":
            i += 1
        else:
            if (ch == "." and last in ("", ".")
                    and not body[i + 1:i + 2].isdigit()):
                # a statement terminator with no statement before it
                # ('.' alone, or '..') — the SPARQL group grammar
                # downstream would silently tolerate it (round-9)
                raise ParseError("empty Turtle statement (bare '.')")
            last = ch
            i += 1
    if last and last != ".":
        raise ParseError("Turtle statement not terminated by '.'")


# -- TriG: Turtle + named-graph blocks (S3) ---------------------------------
# Reference: lib/oxttl/src/trig.rs · TriGParser/TriGSerializer.  A TriG
# document is Turtle statements (default graph) plus `[GRAPH] label { … }`
# blocks; a label may open any number of blocks (their union is the graph),
# which is what makes the WRITER embarrassingly parallel.

def _skip_string(text: str, i: int) -> int:
    """Index just past the string literal starting at ``text[i]``
    (handles ''' / \"\"\" long forms and backslash escapes)."""
    q = text[i]
    if text[i:i + 3] == q * 3:
        j = i + 3
        while True:
            j = text.find(q * 3, j)
            if j < 0:
                raise ValueError("unterminated long string literal")
            bs = 0
            while text[j - 1 - bs] == "\\":
                bs += 1
            if bs % 2 == 0:
                return j + 3
            j += 1
    j = i + 1
    n = len(text)
    while j < n:
        if text[j] == "\\":
            j += 2
        elif text[j] == q:
            return j + 1
        else:
            j += 1
    raise ValueError("unterminated string literal")


_ANON_GRAPH_N = 0

_TRIG_LABEL = re.compile(
    r"(?:GRAPH\s+)?(<[^>]*>|[A-Za-z][\w.-]*:[\w.-]*|:[\w.-]*|_:[\w.-]+"
    r"|\[\s*\])\s*$", re.IGNORECASE)


def _split_trig_blocks(body: str):
    """TriG body → ``(default_graph_text, [(label_or_None, block_text)])``.

    A scanner, not a grammar: strings, IRIs and comments are opaque;
    graph blocks are the top-level ``{ … }`` regions (TriG forbids
    nesting), labeled by the token immediately before ``{`` (optional
    ``GRAPH`` keyword; no label = default-graph block)."""
    blocks = []
    cur: List[str] = []
    i, n = 0, len(body)
    while i < n:
        ch = body[i]
        if ch in "\"'":
            j = _skip_string(body, i)
            cur.append(body[i:j])
            i = j
        elif ch == "<":                       # IRIs may contain '#'
            j = body.find(">", i)
            j = n if j < 0 else j + 1
            cur.append(body[i:j])
            i = j
        elif ch == "#":
            j = body.find("\n", i)
            i = n if j < 0 else j
        elif ch == "{":
            pre = "".join(cur)
            m = _TRIG_LABEL.search(pre)
            label = None
            if m:
                label = m.group(1)
                pre = pre[:m.start()]
            j = i + 1
            while j < n and body[j] != "}":
                cj = body[j]
                if cj in "\"'":
                    j = _skip_string(body, j)
                elif cj == "<":
                    k = body.find(">", j)
                    j = n if k < 0 else k + 1
                elif cj == "#":
                    k = body.find("\n", j)
                    j = n if k < 0 else k
                elif cj == "{":
                    raise ValueError("nested {} in TriG graph block")
                else:
                    j += 1
            if j >= n:
                raise ValueError("unterminated TriG graph block")
            blocks.append((label, body[i + 1:j]))
            cur = [pre, " "]
            i = j + 1
            # optional block-terminating '.'
            while i < n and body[i] in " \t\r\n":
                i += 1
            if i < n and body[i] == ".":
                i += 1
        else:
            cur.append(ch)
            i += 1
    return "".join(cur), blocks


def _graph_term_tuple(label: str, prefixes: dict,
                      base: Optional[str] = None) -> Tuple:
    from ..algebra import ast as A
    from ..algebra.parser import resolve_iri
    from ..plans.compiler import _term_to_py
    if label.startswith("<"):
        return _term_to_py(A.NamedNode(resolve_iri(base, label[1:-1])))
    if label.startswith("_:"):
        return _term_to_py(A.BlankNode(label[2:]))
    if label.startswith("["):
        # ANON graph label ("[] { ... }", TriG labelOrSubject): a fresh
        # document-unique bnode per occurrence
        global _ANON_GRAPH_N
        _ANON_GRAPH_N += 1
        return _term_to_py(A.BlankNode(f"__anong{_ANON_GRAPH_N}"))
    pfx, _, local = label.partition(":")
    if pfx in prefixes:
        return _term_to_py(A.NamedNode(prefixes[pfx] + local))
    raise ValueError(f"unknown prefix in TriG graph label {label!r}")


def _read_trig_small(spark: SparkSession, path: str,
                     max_bytes: int = 64 << 20) -> DataFrame:
    """Driver-side TriG reader (small files; same grammar subset as
    :func:`_read_turtle_small` within each block).  Accepts a directory
    of part files (the output of :func:`write_trig`)."""
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.startswith("part-") and not f.endswith(".crc"))
        dfs = [_read_trig_small(spark, f, max_bytes) for f in parts]
        return reduce(lambda a, b: a.unionByName(b), dfs)
    size = os.path.getsize(path)
    if size > max_bytes:
        raise ValueError(
            f"trig file {size >> 20} MiB > {max_bytes >> 20} MiB limit: "
            "convert to N-Quads for the distributed path")
    text = open(path, encoding="utf-8").read()
    base, prefixes, body = _strip_directives(text)
    default_text, block_list = _split_trig_blocks(body)
    rows = [(s, p, o, _DEFAULT_G)
            for s, p, o in _parse_turtle_triples(default_text, prefixes,
                                                 base)]
    for i, (label, btext) in enumerate(block_list):
        g = (_DEFAULT_G if label is None
             else _graph_term_tuple(label, prefixes, base))
        # per-block bnode_ns: anonymous []/collection nodes in distinct
        # blocks are distinct bnodes (each block re-parses with a fresh
        # Parser whose counters restart at 0)
        rows += [(s, p, o, g)
                 for s, p, o in _parse_turtle_triples(btext, prefixes, base,
                                                      require_dot=False,
                                                      bnode_ns=f"g{i}")]
    return _quads_df(spark, rows)


def write_turtle(df: DataFrame, path: str) -> None:
    """DISTRIBUTED Turtle writer: subject-grouped predicate lists
    (``<s> <p1> o1 ; <p2> o2 .``), serialized per partition with no
    driver collect — mirrors ``write_ntriples``.  Full IRIs (no prefix
    table needed, every part file self-contained); a
    ``sortWithinPartitions`` on the subject token groups each subject's
    rows without a shuffle.

    CONTRACT (round-9, deliberate): bnodes serialize as labeled terms
    (``_:label``), never as nested ``[...]`` property lists or
    ``( ... )`` collections — nesting requires grouping a bnode's
    triples with its single referencing triple, which may live in a
    DIFFERENT partition (a cross-partition shuffle for cosmetics).  The
    upstream serializer (lib/oxttl turtle.rs) nests because it is
    single-stream.  The round-trip guarantee is ISOMORPHISM: write →
    read yields the same graph up to bnode relabeling
    (tests/test_round9.py::test_turtle_writer_bnode_roundtrip)."""
    from pyspark.sql import functions as F
    from .ntriples import format_term
    toks = df.select(
        format_term(df["s"]).alias("stok"),
        F.concat(format_term(df["p"]), F.lit(" "),
                 format_term(df["o"])).alias("po"))
    toks = toks.sortWithinPartitions("stok")

    def stmts(batches):
        import pandas as pd
        for pdf in batches:
            vals = []
            for stok, grp in pdf.groupby("stok", sort=False):
                vals.append(f"{stok} " + " ;\n    ".join(grp["po"]) + " .")
            if vals:
                yield pd.DataFrame({"value": vals})

    toks.mapInPandas(stmts, "value string") \
        .write.mode("overwrite").text(path)


def write_trig(df: DataFrame, path: str) -> None:
    """DISTRIBUTED TriG writer: because TriG lets one graph label open
    any number of blocks, each partition serializes its own rows as
    self-contained blocks — no global group-by-graph, no driver
    collect.  A ``repartition`` on the graph token keeps blocks per
    graph to one per partition holding it (cosmetic at small scale,
    shuffle-bounded by the id-sized token at large)."""
    from pyspark.sql import functions as F
    from .ntriples import format_term
    toks = df.select(
        F.concat(format_term(df["s"]), F.lit(" "), format_term(df["p"]),
                 F.lit(" "), format_term(df["o"]), F.lit(" .")).alias("line"),
        F.when(df["g"]["kind"] == T.KIND_DEFAULT_GRAPH, F.lit(""))
         .otherwise(format_term(df["g"])).alias("gtok"))
    toks = toks.repartition(F.col("gtok"))

    def blocks(batches):
        import pandas as pd
        for pdf in batches:
            vals = []
            for gtok, grp in pdf.groupby("gtok"):
                stmts = "\n".join(grp["line"])
                vals.append(stmts if gtok == ""
                            else f"{gtok} {{\n{stmts}\n}}")
            if vals:
                yield pd.DataFrame({"value": vals})

    toks.mapInPandas(blocks, "value string") \
        .write.mode("overwrite").text(path)


# -- chunked distributed parse of ONE large Turtle document -----------------

def _scan_line(line: str, state: str) -> tuple:
    """Exact statement-boundary scanner for the chunked path.

    ``state`` is the long-string context the line STARTS in: ``''``
    (outside), ``'"'`` (inside a \"\"\"-literal), ``\"'\"`` (inside a
    '''-literal).  Returns ``(state_after_line, ends_statement)`` where
    ``ends_statement`` is True when the line's last significant character
    OUTSIDE strings/IRIs/comments is '.' and the line ends outside any
    long literal.  Short strings, IRIs and comments are line-local per
    the Turtle grammar; only long (triple-quoted) literals carry state
    across lines — which is exactly what ``state`` tracks.  Quote RUNS
    follow longest-match (''\"\"\"\"'' inside a literal = one content
    quote + closer)."""
    i, n = 0, len(line)
    last_sig = ""
    while i < n:
        c = line[i]
        if state in ('"', "'"):
            q = state
            if c == "\\":
                i += 2
                continue
            if c == q:
                r = 1
                while i + r < n and line[i + r] == q:
                    r += 1
                if r >= 3:          # content quotes (r-3) then the closer
                    state = ""
                    last_sig = q
                i += r
                continue
            i += 1
            continue
        if c == "#":
            break
        if c in ('"', "'"):
            r = 1
            while i + r < n and line[i + r] == c:
                r += 1
            if r >= 3:
                # long-literal open (3) + trailing content quotes; a run
                # of >= 6 is open + immediate close (empty long literal)
                state = "" if r >= 6 else c
                i += r
                if state == "":
                    last_sig = c
                continue
            if r == 2:              # empty short string
                i += 2
                last_sig = c
                continue
            i += 1                  # short string: line-local scan
            while i < n:
                if line[i] == "\\":
                    i += 2
                    continue
                if line[i] == c:
                    break
                i += 1
            i += 1
            last_sig = c
            continue
        if c == "<":
            j = line.find(">", i + 1)
            i = (j + 1) if j >= 0 else n
            last_sig = ">"
            continue
        if not c.isspace():
            last_sig = c
        i += 1
    return state, (state == "" and last_sig == ".")


_LS_STATES = ("", '"', "'")


def turtle_to_ntriples_chunked(spark: SparkSession, in_path: str,
                               out_path: str,
                               max_partition_bytes: Optional[int] = None
                               ) -> None:
    """Distributed parse of ONE large Turtle document (SURVEY §2.1 S3's
    single-200-GB-file gap): newline-split read (line-parallel Hadoop
    splits), per-partition reassembly of '.'-terminated statements,
    partition-boundary fragments stitched driver-side (≤ 2 tiny strings
    per partition).  @prefix directives are read from the document
    header driver-side and broadcast to every chunk.

    Multi-line (triple-quoted) literals are handled EXACTLY via a
    two-pass state composition (the standard distributed-parse move for
    formats with cross-line state): pass 1 computes, per partition, the
    long-string-state transition function (simulating all 3 possible
    start states in one scan); the driver composes those functions in
    partition order to learn each partition's true start state (one tiny
    row per partition); pass 2 seals statements with the exact state, so
    a '.'-ending line INSIDE a long literal is never mistaken for a
    statement boundary.  The file is read twice — both reads are
    line-parallel and the first is a pure scan.  Blank-node labels are
    stable across chunks (label identity is preserved verbatim), so
    cross-chunk bnode references stay intact.

    ``max_partition_bytes`` temporarily overrides
    ``spark.sql.files.maxPartitionBytes`` for this read — used by tests
    to force multi-partition chunking on small files; leave None in
    production (the session default sizes chunks)."""
    # header prefixes: read up to the first non-directive, non-comment
    # statement (Turtle prologue); later in-document directives also
    # apply from their position via turtle_text_to_nt_lines
    header: List[str] = []
    with open(in_path, encoding="utf-8") as f:
        for line in f:
            if _TTL_PREFIX.search(line) or _TTL_BASE.search(line) \
                    or not line.strip() \
                    or line.lstrip().startswith("#"):
                header.append(line)
            else:
                break
    base, prefixes, _ = _strip_directives("".join(header))

    conf_key = "spark.sql.files.maxPartitionBytes"
    old = spark.conf.get(conf_key)
    if max_partition_bytes is not None:
        spark.conf.set(conf_key, str(max_partition_bytes))
    try:
        lines = spark.read.text(in_path)

        # pass 1: per-partition long-string-state transition function
        # (start state → end state), simulated for all 3 start states
        def transitions(idx: int, it):
            cur = {s: s for s in _LS_STATES}
            for row in it:
                cur = {s0: _scan_line(row.value, s1)[0]
                       for s0, s1 in cur.items()}
            yield (idx, cur)

        trans = dict(lines.rdd.mapPartitionsWithIndex(transitions).collect())
        start_states = {}
        st = ""
        for i in range(lines.rdd.getNumPartitions()):
            start_states[i] = st
            st = trans.get(i, {s: s for s in _LS_STATES})[st]
        bstart = spark.sparkContext.broadcast(start_states)

        def seal(idx: int, it):
            """Yield ('nt', line) for statements fully inside this
            partition, ('frag', idx, kind, text) for boundary pieces."""
            st = bstart.value.get(idx, "")
            buf: List[str] = []
            seen_boundary = False
            for row in it:
                v = row.value
                buf.append(v)
                st, ends = _scan_line(v, st)
                if ends:
                    text = "\n".join(buf)
                    buf = []
                    if not seen_boundary:
                        # may complete the previous partition's tail
                        seen_boundary = True
                        yield ("frag", idx, "head", text)
                    else:
                        for nt in turtle_text_to_nt_lines(text, prefixes,
                                                          base):
                            yield ("nt", idx, "", nt)
            tail = "\n".join(buf)
            if not seen_boundary:
                # no boundary at all: whole partition is one fragment
                yield ("frag", idx, "all", tail)
            elif tail.strip():
                yield ("frag", idx, "tail", tail)

        rdd = lines.rdd.mapPartitionsWithIndex(seal).persist()
        frags = sorted(
            ((idx, kind, text) for tag, idx, kind, text in
             ((t[0], t[1], t[2], t[3]) for t in
              rdd.filter(lambda t: t[0] == "frag").collect())),
            key=lambda t: (t[0], 0 if t[1] in ("head", "all") else 1))
        stitched_nt: List[str] = []
        pending = ""
        for _, kind, text in frags:
            if kind == "all":
                pending = pending + "\n" + text
                continue
            if kind == "head":
                piece = pending + "\n" + text
                pending = ""
            else:                              # tail
                piece = pending + "\n" + text  # pending == "" normally
                pending = piece
                continue
            stitched_nt.extend(turtle_text_to_nt_lines(piece, prefixes,
                                                       base))
        if pending.strip():
            stitched_nt.extend(turtle_text_to_nt_lines(pending, prefixes,
                                                       base))

        body_df = rdd.filter(lambda t: t[0] == "nt") \
                     .map(lambda t: (t[3],)).toDF(["value"])
        if stitched_nt:
            extra = spark.createDataFrame([(l,) for l in stitched_nt],
                                          ["value"])
            body_df = body_df.unionByName(extra)
        body_df.write.mode("overwrite").text(out_path)
        rdd.unpersist()
    finally:
        spark.conf.set(conf_key, old)
