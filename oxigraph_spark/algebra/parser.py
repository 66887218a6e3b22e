"""SPARQL 1.1 parser → algebra (spec §19 grammar, §18.2 ToAlgebra).

Reference: ``lib/spargebra/src/parser.rs`` (a rust-peg grammar that applies
the ToAlgebra translation during parsing — we do the same: the parser's
output is already the algebra of :mod:`oxigraph_spark.algebra.ast`, not a
parse tree).  Hand-written recursive descent over a regex tokenizer.

Supported surface: SELECT/ASK/CONSTRUCT/DESCRIBE, prologue (BASE/PREFIX),
group patterns with OPTIONAL/UNION/MINUS/FILTER/BIND/VALUES/GRAPH/sub-SELECT,
property paths, full expression grammar with aggregates, solution modifiers
(GROUP BY/HAVING/ORDER BY/LIMIT/OFFSET/DISTINCT/REDUCED), blank-node
property lists and collections (desugared per spec).
"""

from __future__ import annotations

import itertools
import re
from typing import Dict, List, Optional, Tuple, Union

from . import ast as A

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF + "type"
RDF_FIRST, RDF_REST, RDF_NIL = RDF + "first", RDF + "rest", RDF + "nil"


class ParseError(ValueError):
    pass


def resolve_iri(base: Optional[str], iri: str) -> str:
    """RFC 3986 reference resolution of ``iri`` against ``base``
    (§19.2.1 / Turtle @base; reference: oxiri's Iri::resolve).
    Absolute IRIs (with a scheme) pass through; with no base, relative
    IRIs pass through unchanged (pre-round-6 behavior for callers that
    operate on already-absolute data)."""
    if not base or re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
        return iri
    from urllib.parse import urljoin
    # urljoin implements RFC 3986 merge + dot-segment removal for
    # hierarchical bases; non-hierarchical bases (urn:...) get the
    # simple concat fallback it would otherwise mangle
    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", base):
        out = urljoin(base, iri)
        # urljoin drops an EMPTY fragment ('ns#' → 'ns'); RDF namespace
        # IRIs end with '#' meaningfully
        if iri.endswith("#") and not out.endswith("#"):
            out += "#"
        return out
    return base + iri


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

# SPARQL/Turtle identifier character classes (grammar PN_CHARS_BASE /
# PN_CHARS_U / PN_CHARS / VARNAME) — the unicode ranges matter: ":café"
# and "?π" are legal prefixed names / variables.
_PNB = ("A-Za-z\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u02FF\u0370-\u037D"
        "\u037F-\u1FFF\u200C-\u200D\u2070-\u218F\u2C00-\u2FEF"
        "\u3001-\uD7FF\uF900-\uFDCF\uFDF0-\uFFFD\U00010000-\U000EFFFF")
_PNU = _PNB + "_"
_PNCH = _PNU + "0-9\\-\u00B7\u0300-\u036F\u203F-\u2040"
_VARCH = _PNU + "0-9\u00B7\u0300-\u036F\u203F-\u2040"   # VARNAME: no '-'
_ESCC = r"\\[_~.!$&'()*+,;=/?#@%-]"                      # PN_LOCAL_ESC
_PLX = r"(?:%[0-9A-Fa-f]{2}|" + _ESCC + ")"              # PLX: exact 2 hex
_PN_PREFIX = f"(?:[{_PNB}](?:[{_PNCH}.]*[{_PNCH}])?)?"
_PN_LOCAL = (f"(?:(?:[{_PNU}0-9:]|{_PLX})"
             f"(?:(?:[{_PNCH}.:]|{_PLX})*(?:[{_PNCH}:]|{_PLX}))?)?")

TOKEN_RE = re.compile(r"""
    (?P<WS>\s+|\#[^\n]*)
  | (?P<IRIREF><(?:[^<>"{}|^`\\\s]|\\[uU][0-9A-Fa-f]+)*>)
  | (?P<STRING_LONG1>'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<STRING_LONG2>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
  | (?P<STRING1>'(?:[^'\\\n]|\\.)*')
  | (?P<STRING2>"(?:[^"\\\n]|\\.)*")
  | (?P<BLANK>_:[""" + _PNU + r"""0-9](?:[""" + _PNCH + r""".]*[""" + _PNCH + r"""])?)
  | (?P<VAR>[?$][""" + _VARCH + r"""0-9][""" + _VARCH + r"""]*)
  | (?P<LANGTAG>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<DOUBLE>[+-]?(?:[0-9]+\.[0-9]*|\.[0-9]+|[0-9]+)[eE][+-]?[0-9]+)
  | (?P<DECIMAL>[+-]?[0-9]*\.[0-9]+)
  | (?P<INTEGER>[+-]?[0-9]+)
  | (?P<PNAME>""" + _PN_PREFIX + ":" + _PN_LOCAL + r""")
  | (?P<NAME>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<OP>\^\^|&&|\{\||\|\}|\|\||!=|<=|>=|<<|>>|[{}()\[\],;.^|/*+?!=<>-])
""", re.VERBOSE)


class Token:
    __slots__ = ("kind", "value", "pos")

    def __init__(self, kind: str, value: str, pos: int):
        self.kind, self.value, self.pos = kind, value, pos

    def __repr__(self):
        return f"{self.kind}({self.value!r})"


def tokenize(text: str) -> List[Token]:
    out: List[Token] = []
    i = 0
    while i < len(text):
        m = TOKEN_RE.match(text, i)
        if not m:
            raise ParseError(f"lex error at {i}: {text[i:i+30]!r}")
        kind = m.lastgroup
        if kind != "WS":
            out.append(Token(kind, m.group(), i))
        i = m.end()
    out.append(Token("EOF", "", len(text)))
    return out


_ESCAPES = {"t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
            '"': '"', "'": "'", "\\": "\\"}


def _unescape(s: str) -> str:
    out: List[str] = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            try:
                if n == "u":
                    hx = s[i + 2:i + 6]
                    # UCHAR requires exactly 4 HEX — a short slice like
                    # "\u12" must reject, not decode as U+0012
                    if len(hx) != 4 or not all(
                            c in "0123456789abcdefABCDEF" for c in hx):
                        raise ValueError(hx)
                    out.append(chr(int(hx, 16))); i += 6; continue
                if n == "U":
                    hx = s[i + 2:i + 10]
                    if len(hx) != 8 or not all(
                            c in "0123456789abcdefABCDEF" for c in hx):
                        raise ValueError(hx)
                    out.append(chr(int(hx, 16))); i += 10; continue
            except ValueError:
                raise ParseError(f"invalid \\{n} escape in string literal")
            if n not in _ESCAPES:
                # ECHAR ::= '\' [tbnrf"'\\] — anything else is a syntax
                # error in both SPARQL and Turtle, not a literal backslash
                raise ParseError(f"illegal string escape \\{n}")
            out.append(_ESCAPES[n]); i += 2; continue
        out.append(c); i += 1
    return "".join(out)


def _decode_iri_uchar(s: str) -> str:
    """Decode UCHAR (``\\uXXXX`` / ``\\UXXXXXXXX``) escapes inside an
    IRIREF — the only escapes the IRIREF production admits.  The decoded
    character must itself be legal in an IRIREF (no control/space/
    bracket characters), matching the reference's checked IRI parse."""
    out: List[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c != "\\":
            out.append(c); i += 1; continue
        kind = s[i + 1:i + 2]
        width = 4 if kind == "u" else 8 if kind == "U" else 0
        hx = s[i + 2:i + 2 + width]
        if not width or len(hx) != width or any(
                ch not in "0123456789abcdefABCDEF" for ch in hx):
            raise ParseError(f"invalid \\{kind or ''} escape in IRIREF")
        cp = int(hx, 16)
        if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
            raise ParseError(f"\\{kind} escape outside Unicode scalar "
                             f"range in IRIREF")
        ch = chr(cp)
        if cp <= 0x20 or ch in '<>"{}|^`\\':
            raise ParseError(
                f"\\{kind} escape decodes to a character illegal in an "
                f"IRIREF: U+{cp:04X}")
        out.append(ch)
        i += 2 + width
    return "".join(out)


AGG_NAMES = {"COUNT", "SUM", "AVG", "MIN", "MAX", "SAMPLE", "GROUP_CONCAT"}

BUILTIN_NAMES = {
    "STR", "LANG", "LANGMATCHES", "DATATYPE", "BOUND", "IRI", "URI",
    "BNODE", "RAND", "ABS", "CEIL", "FLOOR", "ROUND", "CONCAT", "STRLEN",
    "UCASE", "LCASE", "ENCODE_FOR_URI", "CONTAINS", "STRSTARTS", "STRENDS",
    "STRBEFORE", "STRAFTER", "YEAR", "MONTH", "DAY", "HOURS", "MINUTES",
    "SECONDS", "TIMEZONE", "TZ", "NOW", "UUID", "STRUUID", "MD5", "SHA1",
    "SHA256", "SHA384", "SHA512", "COALESCE", "IF", "STRLANG", "STRDT",
    "SAMETERM", "ISIRI", "ISURI", "ISBLANK", "ISLITERAL", "ISNUMERIC",
    "REGEX", "SUBSTR", "REPLACE",
    # SPARQL 1.2 RDF-star
    "TRIPLE", "SUBJECT", "PREDICATE", "OBJECT", "ISTRIPLE",
}


class Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = tokenize(text)
        self.i = 0
        self.base: Optional[str] = None
        self.prefixes: Dict[str, str] = {}
        self._bnode_counter = itertools.count()
        self._anon_counter = itertools.count()
        self._agg_counter = itertools.count()
        self._qt_counter = itertools.count()
        # bnode-label scoping (grammar note §19.6: the same label may not
        # appear in two different group graph patterns of one query):
        # label → token of the group where it first appeared
        self._bnode_group: Dict[str, int] = {}
        self._group_counter = itertools.count()
        self._group_stack: List[int] = []
        # per-group lists of (fresh_var, s, p, o) quoted-triple-pattern
        # lowerings, applied when the enclosing group pattern closes
        self._qt_stack: List[List] = []
        # >0 while parsing a CONSTRUCT / update quad template: blank nodes
        # stay BlankNode terms (fresh per solution, §16.2.1) and quoted
        # triples with variables stay QuotedTriple terms (constructed at
        # runtime via TRIPLE()) instead of being lowered to pattern vars
        self._template_depth = 0
        # True while parsing a DATA document (Turtle/TriG reuse this
        # parser): enables Turtle-only strictness (case-sensitive
        # booleans) that SPARQL's case-insensitive keywords forbid
        self.data_mode = False
        # FROM / FROM NAMED iris (top-level query dataset)
        self._from_graphs: List[str] = []
        self._from_named: List[str] = []

    # -- token helpers --------------------------------------------------

    def peek(self, k: int = 0) -> Token:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t.kind == "NAME" and t.value.upper() in kws

    def eat_kw(self, *kws: str) -> str:
        if not self.at_kw(*kws):
            raise ParseError(f"expected {kws}, got {self.peek()}")
        return self.next().value.upper()

    def at_op(self, *ops: str) -> bool:
        t = self.peek()
        return t.kind == "OP" and t.value in ops

    def eat_op(self, op: str) -> None:
        t = self.peek()
        if t.kind != "OP" or t.value != op:
            raise ParseError(f"expected {op!r}, got {t} at {t.pos}")
        self.next()

    # -- entry ----------------------------------------------------------

    def parse_query(self) -> A.Query:
        self._prologue()
        if self.at_kw("SELECT"):
            q = self._select_query()
        elif self.at_kw("ASK"):
            q = self._ask_query()
        elif self.at_kw("CONSTRUCT"):
            q = self._construct_query()
        elif self.at_kw("DESCRIBE"):
            q = self._describe_query()
        else:
            raise ParseError(f"expected query form, got {self.peek()}")
        # trailing VALUES clause
        if self.at_kw("VALUES"):
            values = self._values_clause()
            q = _join_values(q, values)
        if self.peek().kind != "EOF":
            raise ParseError(f"trailing input: {self.peek()}")
        return q

    def _prologue(self) -> None:
        while True:
            if self.at_kw("PREFIX"):
                self.next()
                pn = self.next()
                if pn.kind != "PNAME" or not pn.value.endswith(":"):
                    raise ParseError(f"bad PREFIX name {pn}")
                iri = self._iriref()
                self.prefixes[pn.value[:-1]] = iri
            elif self.at_kw("BASE"):
                self.next()
                self.base = self._iriref()
            else:
                return

    def _iriref(self) -> str:
        t = self.next()
        if t.kind != "IRIREF":
            raise ParseError(f"expected IRIREF, got {t}")
        raw = t.value[1:-1]
        if "\\" in raw:
            raw = _decode_iri_uchar(raw)
        return resolve_iri(self.base, raw)

    # -- query forms -----------------------------------------------------

    def _select_query(self) -> A.SelectQuery:
        pattern = self._select_inner()
        return A.SelectQuery(pattern, tuple(self._from_graphs),
                             tuple(self._from_named))

    def _select_inner(self) -> A.GraphPattern:
        """SELECT clause + WHERE + modifiers → algebra pattern (shared by
        top-level SELECT and sub-SELECT)."""
        self.eat_kw("SELECT")
        distinct = reduced = False
        if self.at_kw("DISTINCT"):
            self.next(); distinct = True
        elif self.at_kw("REDUCED"):
            self.next(); reduced = True

        proj: List[Tuple[A.Var, Optional[A.Expression]]] = []
        star = False
        if self.at_op("*"):
            self.next(); star = True
        else:
            while True:
                if self.peek().kind == "VAR":
                    proj.append((A.Var(self.next().value[1:]), None))
                elif self.at_op("("):
                    self.next()
                    e = self._expression()
                    self.eat_kw("AS")
                    v = A.Var(self.next().value[1:])
                    self.eat_op(")")
                    proj.append((v, e))
                else:
                    break
            if not proj:
                raise ParseError("empty SELECT clause")

        self._dataset_clauses()
        if self.at_kw("WHERE"):
            self.next()
        pattern = self._group_graph_pattern()
        return self._solution_modifiers(pattern, proj, star, distinct, reduced)

    def _dataset_clauses(self) -> None:
        """FROM / FROM NAMED → recorded on the parser; query constructors
        attach them to the query node (spargebra · QueryDataset)."""
        while self.at_kw("FROM"):
            self.next()
            if self.at_kw("NAMED"):
                self.next()
                self._from_named.append(self._iri())
            else:
                self._from_graphs.append(self._iri())

    def _ask_query(self) -> A.AskQuery:
        self.eat_kw("ASK")
        self._dataset_clauses()
        if self.at_kw("WHERE"):
            self.next()
        return A.AskQuery(self._group_graph_pattern(),
                          tuple(self._from_graphs), tuple(self._from_named))

    def _construct_query(self) -> A.ConstructQuery:
        self.eat_kw("CONSTRUCT")
        if self.at_op("{"):
            template = self._construct_template()
            self._dataset_clauses()
            if self.at_kw("WHERE"):
                self.next()
            pattern = self._group_graph_pattern()
        else:  # CONSTRUCT WHERE { pattern } shorthand
            self.eat_kw("WHERE")
            template_pattern = self._group_graph_pattern()
            if not isinstance(template_pattern, A.BGP):
                raise ParseError("CONSTRUCT WHERE requires a plain BGP")
            template = [tp for tp in template_pattern.patterns
                        if isinstance(tp, A.TriplePattern)]
            pattern = template_pattern
        pattern = self._slice_modifiers(pattern)
        return A.ConstructQuery(tuple(template), pattern,
                                tuple(self._from_graphs),
                                tuple(self._from_named))

    def _construct_template(self) -> List[A.TriplePattern]:
        self.eat_op("{")
        triples: List = []
        self._template_depth += 1
        try:
            self._triples_block(triples)
        finally:
            self._template_depth -= 1
        self.eat_op("}")
        out = []
        for t in triples:
            if isinstance(t, A.PathPattern):
                raise ParseError("property paths not allowed in CONSTRUCT template")
            out.append(t)
        return out

    def _describe_query(self) -> A.DescribeQuery:
        self.eat_kw("DESCRIBE")
        terms: List[A.TermOrVar] = []
        if self.at_op("*"):
            self.next()
        else:
            while True:
                if self.peek().kind == "VAR":
                    terms.append(A.Var(self.next().value[1:]))
                elif self.peek().kind in ("IRIREF", "PNAME"):
                    terms.append(A.NamedNode(self._iri()))
                else:
                    break
        self._dataset_clauses()
        pattern = None
        if self.at_kw("WHERE") or self.at_op("{"):
            if self.at_kw("WHERE"):
                self.next()
            pattern = self._group_graph_pattern()
        return A.DescribeQuery(tuple(terms), pattern,
                               tuple(self._from_graphs),
                               tuple(self._from_named))

    # -- solution modifiers (ToAlgebra §18.2.4-5) ------------------------

    def _solution_modifiers(self, pattern, proj, star, distinct, reduced):
        group_by: List[Tuple[A.Var, Optional[A.Expression]]] = []
        if self.at_kw("GROUP"):
            self.next(); self.eat_kw("BY")
            while True:
                if self.peek().kind == "VAR":
                    group_by.append((A.Var(self.next().value[1:]), None))
                elif self.at_op("("):
                    self.next()
                    e = self._expression()
                    if self.at_kw("AS"):
                        self.next()
                        v = A.Var(self.next().value[1:])
                    else:
                        v = A.Var(f"__grp{next(self._agg_counter)}")
                    self.eat_op(")")
                    group_by.append((v, e))
                elif self.peek().kind in ("IRIREF", "PNAME") or (
                        self.peek().kind == "NAME"
                        and self.peek().value.upper() in BUILTIN_NAMES):
                    e = self._builtin_or_function_call()
                    group_by.append((A.Var(f"__grp{next(self._agg_counter)}"), e))
                else:
                    break

        having: List[A.Expression] = []
        if self.at_kw("HAVING"):
            self.next()
            while True:
                having.append(self._constraint())
                t = self.peek()
                starts_constraint = self.at_op("(") or (
                    t.kind == "NAME" and t.value.upper() in
                    (BUILTIN_NAMES | AGG_NAMES | {"NOT", "EXISTS"}))
                if not starts_constraint:
                    break

        order: List[A.OrderCond] = []
        if self.at_kw("ORDER"):
            self.next(); self.eat_kw("BY")
            while True:
                if self.at_kw("ASC", "DESC"):
                    asc = self.eat_kw("ASC", "DESC") == "ASC"
                    self.eat_op("(")
                    e = self._expression()
                    self.eat_op(")")
                    order.append(A.OrderCond(e, asc))
                elif self.peek().kind == "VAR":
                    order.append(A.OrderCond(A.EVar(self.next().value[1:])))
                elif self.at_op("("):
                    self.next()
                    e = self._expression()
                    self.eat_op(")")
                    order.append(A.OrderCond(e))
                elif self.peek().kind == "NAME" and self.peek().value.upper() in (
                        BUILTIN_NAMES | AGG_NAMES):
                    order.append(A.OrderCond(self._builtin_or_function_call()))
                elif (self.peek().kind in ("IRIREF", "PNAME")
                        and self.peek(1).kind == "OP"
                        and self.peek(1).value == "("):
                    # Constraint ::= … | FunctionCall (iri ArgList) —
                    # e.g. ORDER BY xsd:integer(?x)
                    iri = self._iri()
                    order.append(A.OrderCond(
                        A.ECall(iri, tuple(self._expr_list()))))
                else:
                    break

        offset, limit = 0, None
        while self.at_kw("LIMIT", "OFFSET"):
            kw = self.eat_kw("LIMIT", "OFFSET")
            tok = self.next()
            # the grammar takes the unsigned INTEGER token only — a
            # signed count ("LIMIT -1", now one token) must reject
            if tok.kind != "INTEGER" or tok.value[0] in "+-":
                raise ParseError(
                    f"{kw} requires a non-negative INTEGER, got {tok.value!r}")
            n = int(tok.value)
            if kw == "LIMIT":
                limit = n
            else:
                offset = n

        return _assemble_select(pattern, proj, star, distinct, reduced,
                                group_by, having, order, offset, limit,
                                self._agg_counter)

    def _slice_modifiers(self, pattern):
        order: List[A.OrderCond] = []
        if self.at_kw("ORDER"):
            self.next(); self.eat_kw("BY")
            while True:
                if self.at_kw("ASC", "DESC"):
                    asc = self.eat_kw("ASC", "DESC") == "ASC"
                    self.eat_op("(")
                    e = self._expression()
                    self.eat_op(")")
                    order.append(A.OrderCond(e, asc))
                elif self.at_op("("):
                    self.next(); e = self._expression(); self.eat_op(")")
                    order.append(A.OrderCond(e))
                elif self.peek().kind == "VAR":
                    order.append(A.OrderCond(A.EVar(self.next().value[1:])))
                elif self.peek().kind == "NAME" and self.peek().value.upper() in (
                        BUILTIN_NAMES | AGG_NAMES):
                    order.append(A.OrderCond(self._builtin_or_function_call()))
                elif (self.peek().kind in ("IRIREF", "PNAME")
                        and self.peek(1).kind == "OP"
                        and self.peek(1).value == "("):
                    iri = self._iri()
                    order.append(A.OrderCond(
                        A.ECall(iri, tuple(self._expr_list()))))
                else:
                    break
        if order:
            pattern = A.OrderBy(pattern, tuple(order))
        offset, limit = 0, None
        while self.at_kw("LIMIT", "OFFSET"):
            kw = self.eat_kw("LIMIT", "OFFSET")
            tok = self.next()
            # the grammar takes the unsigned INTEGER token only — a
            # signed count ("LIMIT -1", now one token) must reject
            if tok.kind != "INTEGER" or tok.value[0] in "+-":
                raise ParseError(
                    f"{kw} requires a non-negative INTEGER, got {tok.value!r}")
            n = int(tok.value)
            if kw == "LIMIT":
                limit = n
            else:
                offset = n
        if offset or limit is not None:
            pattern = A.Slice(pattern, offset, limit)
        return pattern

    # -- group graph pattern (ToAlgebra §18.2.2.6) -----------------------

    def _group_graph_pattern(self) -> A.GraphPattern:
        self.eat_op("{")
        self._group_stack.append(next(self._group_counter))
        try:
            return self._group_graph_pattern_body()
        finally:
            self._group_stack.pop()

    def _group_graph_pattern_body(self) -> A.GraphPattern:
        if self.at_kw("SELECT"):
            sub = self._select_inner()
            self.eat_op("}")
            return sub

        acc: Optional[A.GraphPattern] = None
        triples: List = []
        filters: List[A.Expression] = []
        self._qt_stack.append([])

        def flush_triples():
            nonlocal acc, triples
            if triples:
                bgp = A.BGP(tuple(triples))
                acc = bgp if acc is None else A.Join(acc, bgp)
                triples = []

        while not self.at_op("}"):
            if self.at_kw("OPTIONAL"):
                self.next()
                flush_triples()
                right = self._group_graph_pattern()
                expr = None
                if isinstance(right, A.Filter):  # {P FILTER F} → LeftJoin(..,P,F)
                    expr, right = right.expr, right.inner
                acc = A.LeftJoin(acc if acc is not None else A.BGP(), right, expr)
            elif self.at_kw("MINUS"):
                self.next()
                flush_triples()
                acc = A.Minus(acc if acc is not None else A.BGP(),
                              self._group_graph_pattern())
            elif self.at_kw("FILTER"):
                self.next()
                c = self._constraint()
                if _has_aggregate(c):
                    raise ParseError(
                        "aggregate function in a WHERE filter — "
                        "aggregates are only legal in SELECT "
                        "expressions, HAVING, and ORDER BY")
                filters.append(c)
            elif self.at_kw("BIND"):
                self.next()
                self.eat_op("(")
                e = self._expression()
                if _has_aggregate(e):
                    raise ParseError(
                        "aggregate function in BIND — aggregates are "
                        "only legal in SELECT expressions, HAVING, and "
                        "ORDER BY")
                self.eat_kw("AS")
                v = A.Var(self.next().value[1:])
                self.eat_op(")")
                flush_triples()
                # grammar note 12 (§19.8): the assigned variable must not
                # already be in-scope from the elements of this group up
                # to the BIND (pattern_vars implements §18.2.1 in-scope:
                # MINUS right sides and non-projected subquery vars
                # do NOT count)
                if acc is not None and v.name in A.pattern_vars(acc):
                    raise ParseError(
                        f"BIND: variable ?{v.name} is already in scope "
                        "in this group (grammar note 12, §19.8)")
                acc = A.Extend(acc if acc is not None else A.BGP(), v, e)
            elif self.at_kw("VALUES"):
                values = self._values_clause()
                flush_triples()
                acc = values if acc is None else A.Join(acc, values)
            elif self.at_kw("GRAPH"):
                self.next()
                if self.peek().kind == "VAR":
                    name: Union[A.NamedNode, A.Var] = A.Var(self.next().value[1:])
                else:
                    name = A.NamedNode(self._iri())
                g = A.Graph(name, self._group_graph_pattern())
                flush_triples()
                acc = g if acc is None else A.Join(acc, g)
            elif self.at_kw("SERVICE"):
                self.next()
                silent = False
                if self.at_kw("SILENT"):
                    self.next(); silent = True
                if self.peek().kind == "VAR":
                    name = A.Var(self.next().value[1:])
                else:
                    name = A.NamedNode(self._iri())
                start = self.peek().pos     # the inner group's '{'
                inner_pat = self._group_graph_pattern()
                last = self.toks[self.i - 1]
                svc = A.Service(
                    name, inner_pat, silent,
                    raw=self.text[start:last.pos + len(last.value)],
                    prefixes=tuple(sorted(self.prefixes.items())))
                flush_triples()
                acc = svc if acc is None else A.Join(acc, svc)
            elif self.at_op("{"):
                flush_triples()
                sub = self._group_or_union()
                acc = sub if acc is None else A.Join(acc, sub)
            elif self.at_op("."):
                self.next()
            else:
                self._triples_block(triples)
        self.eat_op("}")
        flush_triples()
        if acc is None:
            acc = A.BGP()
        acc = self._apply_qt_lowerings(acc, self._qt_stack.pop())
        for f in filters:
            acc = A.Filter(f, acc)
        return acc

    def _group_or_union(self) -> A.GraphPattern:
        left = self._group_graph_pattern()
        while self.at_kw("UNION"):
            self.next()
            left = A.Union_(left, self._group_graph_pattern())
        return left

    def _values_clause(self) -> A.Values:
        self.eat_kw("VALUES")
        vars_: List[A.Var] = []
        rows: List[Tuple] = []
        if self.peek().kind == "VAR":
            vars_.append(A.Var(self.next().value[1:]))
            self.eat_op("{")
            while not self.at_op("}"):
                rows.append((self._data_value(),))
            self.eat_op("}")
        else:
            self.eat_op("(")
            while self.peek().kind == "VAR":
                vars_.append(A.Var(self.next().value[1:]))
            self.eat_op(")")
            self.eat_op("{")
            while self.at_op("("):
                self.next()
                row = []
                while not self.at_op(")"):
                    row.append(self._data_value())
                self.eat_op(")")
                if len(row) != len(vars_):
                    raise ParseError("VALUES row arity mismatch")
                rows.append(tuple(row))
            self.eat_op("}")
        return A.Values(tuple(vars_), tuple(rows))

    def _data_value(self):
        if self.at_kw("UNDEF"):
            self.next()
            return None
        if self.at_op("<<"):
            # SPARQL-star DataBlockValue: GROUND quoted triple only
            self.eat_op("<<")
            s = self._data_value()
            p = A.NamedNode(self._iri())
            o = self._data_value()
            self.eat_op(">>")
            if s is None or o is None:
                raise ParseError("UNDEF inside a VALUES quoted triple")
            if isinstance(s, A.Literal):
                raise ParseError("literal as quoted-triple subject")
            return A.QuotedTriple(s, p, o)
        return self._term_literal_or_iri()

    # -- triples ---------------------------------------------------------

    def _triples_block(self, out: List) -> None:
        while True:
            # TriplesSameSubject ::= VarOrTerm PropertyListNotEmpty
            #                      | TriplesNode PropertyList
            # — only [ … ] / ( … ) subjects may omit the predicate list;
            # a plain term with none used to be SILENTLY DROPPED
            # ("{ 5 }" parsed as an empty BGP, "1.2.3" as one triple)
            is_node = self.at_op("[", "(")
            subj = self._graph_node(out)
            self._property_list(subj, out, required=not is_node)
            if self.at_op("."):
                self.next()
                t = self.peek()
                if t.kind in ("VAR", "IRIREF", "PNAME", "BLANK", "INTEGER",
                              "DECIMAL", "DOUBLE", "STRING1", "STRING2",
                              "STRING_LONG1", "STRING_LONG2") \
                        or self.at_op("[", "(") or self.at_kw("TRUE", "FALSE"):
                    continue
            return

    def _property_list(self, subj, out: List, required: bool) -> None:
        first = True
        while True:
            if self.peek().kind == "VAR":
                verb: Union[A.Var, object] = A.Var(self.next().value[1:])
                is_path = False
                path = None
            else:
                t = self.peek()
                if not (t.kind in ("IRIREF", "PNAME")
                        or (t.kind == "NAME" and t.value == "a")
                        or self.at_op("^", "!", "(")):
                    if first and required:
                        raise ParseError(f"expected predicate at {t}")
                    return
                path = self._path()
                is_path = not isinstance(path, A.PLink)
                verb = A.NamedNode(path.iri) if isinstance(path, A.PLink) else None
            while True:
                obj = self._graph_node(out)
                if is_path:
                    out.append(A.PathPattern(subj, path, obj))
                else:
                    out.append(A.TriplePattern(subj, verb, obj))
                if self.at_op("{|"):
                    # annotation syntax (SPARQL-star): `s p o {| q v |}`
                    # asserts/matches the base triple AND statements
                    # about << s p o >>
                    if is_path:
                        raise ParseError(
                            "annotation {| |} not allowed on a property "
                            "path")
                    self.next()
                    qt = self._qt_subject(subj, verb, obj)
                    self._property_list(qt, out, required=True)
                    self.eat_op("|}")
                if self.at_op(","):
                    self.next()
                    continue
                break
            if self.at_op(";"):
                self.next()
                first = False
                # allow trailing ;
                t = self.peek()
                if t.kind == "VAR" or t.kind in ("IRIREF", "PNAME") \
                        or (t.kind == "NAME" and t.value == "a") \
                        or self.at_op("^", "!", "("):
                    continue
            return

    def _qt_subject(self, s, p, o):
        """The quoted-triple term `<< s p o >>` an annotation block hangs
        its statements on — same lowering rules as ``_quoted_triple``:
        ground or in a template → constant/runtime QuotedTriple; with
        variables in a pattern → fresh var + accessor constraints."""
        if isinstance(s, A.Literal):
            raise ParseError("literal as quoted-triple subject")
        if all(not isinstance(x, A.Var) for x in (s, p, o)) \
                or self._template_depth:
            return A.QuotedTriple(s, p, o)
        qv = A.Var(f"__qt{next(self._qt_counter)}")
        if not self._qt_stack:
            raise ParseError("annotation {| |} outside a group pattern")
        self._qt_stack[-1].append((qv, s, p, o))
        return qv

    def _quoted_triple(self, out: List):
        """``<< s p o >>`` in a data position (SPARQL-star).  Ground →
        constant QuotedTriple term; with variables → lowered to a fresh
        var plus SUBJECT/PREDICATE/OBJECT constraints on the enclosing
        group (see _apply_qt_lowerings)."""
        self.eat_op("<<")
        s = self._graph_node(out)
        if isinstance(s, A.Literal):
            raise ParseError("literal as quoted-triple subject")
        if self.peek().kind == "VAR":
            p: object = A.Var(self.next().value[1:])
        else:
            p = A.NamedNode(self._iri())
        o = self._graph_node(out)
        self.eat_op(">>")
        if all(not isinstance(x, A.Var) for x in (s, p, o)):
            return A.QuotedTriple(s, p, o)
        if self._template_depth:
            # template position: build the quoted triple at runtime from
            # the solution bindings (TRIPLE() semantics, SPARQL 1.2 §16.2)
            return A.QuotedTriple(s, p, o)
        qv = A.Var(f"__qt{next(self._qt_counter)}")
        if not self._qt_stack:
            raise ParseError("quoted triple pattern outside a group pattern")
        self._qt_stack[-1].append((qv, s, p, o))
        return qv

    def _apply_qt_lowerings(self, acc: A.GraphPattern,
                            lowerings: List) -> A.GraphPattern:
        return apply_qt_lowerings(acc, lowerings)

    def _graph_node(self, out: List):
        t = self.peek()
        if self.at_op("<<"):
            return self._quoted_triple(out)
        if t.kind == "VAR":
            self.next()
            return A.Var(t.value[1:])
        if t.kind == "BLANK":
            self.next()
            if self._template_depth:
                return A.BlankNode(t.value[2:])  # fresh-per-solution term
            label = t.value[2:]
            grp = self._group_stack[-1] if self._group_stack else -1
            seen = self._bnode_group.setdefault(label, grp)
            if seen != grp:
                raise ParseError(
                    f"blank node label _:{label} used in two different "
                    "group graph patterns (SPARQL grammar note)")
            return A.Var(f"__bn_{label}")  # bnodes in queries = fresh vars
        if self.at_op("["):
            self.next()
            v = (A.BlankNode(f"__anon{next(self._anon_counter)}")
                 if self._template_depth
                 else A.Var(f"__anon{next(self._anon_counter)}"))
            if not self.at_op("]"):
                self._property_list(v, out, required=True)
            self.eat_op("]")
            return v
        if self.at_op("("):
            self.next()
            items = []
            while not self.at_op(")"):
                items.append(self._graph_node(out))
            self.eat_op(")")
            if not items:
                return A.NamedNode(RDF_NIL)

            def list_node():
                n = next(self._anon_counter)
                return (A.BlankNode(f"__list{n}") if self._template_depth
                        else A.Var(f"__list{n}"))
            head = list_node()
            cur = head
            for i, item in enumerate(items):
                out.append(A.TriplePattern(cur, A.NamedNode(RDF_FIRST), item))
                nxt = A.NamedNode(RDF_NIL) if i == len(items) - 1 \
                    else list_node()
                out.append(A.TriplePattern(cur, A.NamedNode(RDF_REST), nxt))
                cur = nxt
            return head
        return self._term_literal_or_iri()

    def _term_literal_or_iri(self):
        t = self.peek()
        if t.kind in ("IRIREF", "PNAME"):
            return A.NamedNode(self._iri())
        if t.kind in ("STRING1", "STRING2", "STRING_LONG1", "STRING_LONG2"):
            return self._rdf_literal()
        if t.kind in ("INTEGER", "DECIMAL", "DOUBLE"):
            # signs are part of the token (SPARQL INTEGER_POSITIVE etc.);
            # the lexical form is preserved exactly as written ("+2E-1")
            self.next()
            dt = {"INTEGER": XSD + "integer", "DECIMAL": XSD + "decimal",
                  "DOUBLE": XSD + "double"}[t.kind]
            return A.Literal(t.value, datatype=dt)
        if t.kind == "NAME" and t.value.upper() in ("TRUE", "FALSE"):
            # SPARQL keywords are case-insensitive; Turtle booleans are
            # NOT ('TRUE' is a syntax error in data documents)
            if self.data_mode and t.value not in ("true", "false"):
                raise ParseError(
                    f"Turtle boolean literals are case-sensitive: "
                    f"{t.value!r} at {t.pos}")
            self.next()
            return A.Literal(t.value.lower(), datatype=XSD + "boolean")
        raise ParseError(f"expected RDF term, got {t} at {t.pos}")

    def _rdf_literal(self) -> A.Literal:
        t = self.next()
        raw = t.value
        if t.kind in ("STRING_LONG1", "STRING_LONG2"):
            lex = _unescape(raw[3:-3])
        else:
            lex = _unescape(raw[1:-1])
        if self.peek().kind == "LANGTAG":
            lang = self.next().value[1:].lower()
            return A.Literal(lex, lang=lang)
        if self.at_op("^^"):
            self.next()
            return A.Literal(lex, datatype=self._iri())
        return A.Literal(lex, datatype=XSD + "string")

    def _iri(self) -> str:
        t = self.peek()
        if t.kind == "IRIREF":
            return self._iriref()
        if t.kind == "PNAME":
            self.next()
            pfx, _, local = t.value.partition(":")
            if pfx not in self.prefixes:
                raise ParseError(f"unknown prefix {pfx!r}")
            return self.prefixes[pfx] + local.replace("\\", "")
        if t.kind == "NAME" and t.value == "a":
            self.next()
            return RDF_TYPE
        raise ParseError(f"expected IRI, got {t} at {t.pos}")

    # -- property paths (§19 grammar Path*) ------------------------------

    def _path(self) -> A.PathExpr:
        return self._path_alternative()

    def _path_alternative(self) -> A.PathExpr:
        left = self._path_sequence()
        while self.at_op("|"):
            self.next()
            left = A.PAlt(left, self._path_sequence())
        return left

    def _path_sequence(self) -> A.PathExpr:
        left = self._path_elt_or_inverse()
        while self.at_op("/"):
            self.next()
            left = A.PSeq(left, self._path_elt_or_inverse())
        return left

    def _path_elt_or_inverse(self) -> A.PathExpr:
        if self.at_op("^"):
            self.next()
            return A.PInv(self._path_elt())
        return self._path_elt()

    def _path_elt(self) -> A.PathExpr:
        p = self._path_primary()
        if self.at_op("?"):
            self.next()
            return A.PZeroOrOne(p)
        if self.at_op("*"):
            self.next()
            return A.PZeroOrMore(p)
        if self.at_op("+"):
            self.next()
            return A.POneOrMore(p)
        return p

    def _path_primary(self) -> A.PathExpr:
        if self.at_op("("):
            self.next()
            p = self._path()
            self.eat_op(")")
            return p
        if self.at_op("!"):
            self.next()
            return self._path_negated()
        return A.PLink(self._iri())

    def _path_negated(self) -> A.PathExpr:
        fwd: List[str] = []
        inv: List[str] = []

        def one():
            if self.at_op("^"):
                self.next()
                inv.append(self._iri())
            else:
                fwd.append(self._iri())

        if self.at_op("("):
            self.next()
            if not self.at_op(")"):
                one()
                while self.at_op("|"):
                    self.next()
                    one()
            self.eat_op(")")
        else:
            one()
        return A.PNeg(tuple(fwd), tuple(inv))

    # -- expressions (§19 grammar Expression*) ---------------------------

    def _constraint(self) -> A.Expression:
        if self.at_op("("):
            self.next()
            e = self._expression()
            self.eat_op(")")
            return e
        if self.at_kw("NOT"):
            self.next()
            self.eat_kw("EXISTS")
            return A.EExists(self._group_graph_pattern(), negated=True)
        if self.at_kw("EXISTS"):
            self.next()
            return A.EExists(self._group_graph_pattern(), negated=False)
        return self._builtin_or_function_call()

    def _expression(self) -> A.Expression:
        left = self._and_expression()
        while self.at_op("||"):
            self.next()
            left = A.EOp("||", (left, self._and_expression()))
        return left

    def _and_expression(self) -> A.Expression:
        left = self._relational()
        while self.at_op("&&"):
            self.next()
            left = A.EOp("&&", (left, self._relational()))
        return left

    def _relational(self) -> A.Expression:
        left = self._additive()
        if self.at_op("=", "!=", "<", "<=", ">", ">="):
            op = self.next().value
            return A.EOp(op, (left, self._additive()))
        if self.at_kw("IN"):
            self.next()
            return A.EIn(left, tuple(self._expr_list()), negated=False)
        if self.at_kw("NOT"):
            self.next()
            self.eat_kw("IN")
            return A.EIn(left, tuple(self._expr_list()), negated=True)
        return left

    def _expr_list(self) -> List[A.Expression]:
        self.eat_op("(")
        out: List[A.Expression] = []
        if not self.at_op(")"):
            out.append(self._expression())
            while self.at_op(","):
                self.next()
                out.append(self._expression())
        self.eat_op(")")
        return out

    def _additive(self) -> A.Expression:
        left = self._multiplicative()
        while True:
            if self.at_op("+", "-"):
                op = self.next().value
                left = A.EOp(op, (left, self._multiplicative()))
            elif (self.peek().kind in ("INTEGER", "DECIMAL", "DOUBLE")
                  and self.peek().value[0] in "+-"):
                # SPARQL grammar quirk: "?x-1" lexes as VAR INTEGER(-1)
                # (signs are part of numeric tokens); AdditiveExpression
                # admits NumericLiteralPositive/Negative as an implicit
                # addend, optionally continued by '*'/'/' UnaryExpression
                t = self.next()
                dt = {"INTEGER": XSD + "integer",
                      "DECIMAL": XSD + "decimal",
                      "DOUBLE": XSD + "double"}[t.kind]
                rhs: A.Expression = A.ETerm(A.Literal(t.value, datatype=dt))
                while self.at_op("*", "/"):
                    op = self.next().value
                    rhs = A.EOp(op, (rhs, self._unary()))
                left = A.EOp("+", (left, rhs))
            else:
                return left

    def _multiplicative(self) -> A.Expression:
        left = self._unary()
        while self.at_op("*", "/"):
            op = self.next().value
            left = A.EOp(op, (left, self._unary()))
        return left

    def _unary(self) -> A.Expression:
        if self.at_op("!"):
            self.next()
            return A.EOp("!", (self._unary(),))
        if self.at_op("-"):
            self.next()
            return A.EOp("u-", (self._unary(),))
        if self.at_op("+"):
            self.next()
            return A.EOp("u+", (self._unary(),))
        return self._primary()

    def _primary(self) -> A.Expression:
        t = self.peek()
        if self.at_op("("):
            self.next()
            e = self._expression()
            self.eat_op(")")
            return e
        if t.kind == "VAR":
            self.next()
            return A.EVar(t.value[1:])
        if t.kind in ("STRING1", "STRING2", "STRING_LONG1", "STRING_LONG2",
                      "INTEGER", "DECIMAL", "DOUBLE"):
            return A.ETerm(self._term_literal_or_iri())
        if t.kind == "NAME":
            up = t.value.upper()
            if up in ("TRUE", "FALSE"):
                self.next()
                return A.ETerm(A.Literal(t.value.lower(), datatype=XSD + "boolean"))
            if up == "NOT":
                self.next()
                self.eat_kw("EXISTS")
                return A.EExists(self._group_graph_pattern(), negated=True)
            if up == "EXISTS":
                self.next()
                return A.EExists(self._group_graph_pattern(), negated=False)
            return self._builtin_or_function_call()
        if t.kind in ("IRIREF", "PNAME"):
            iri = self._iri()
            if self.at_op("("):
                args = self._expr_list()
                return A.ECall(iri, tuple(args))
            return A.ETerm(A.NamedNode(iri))
        raise ParseError(f"expected expression, got {t} at {t.pos}")

    def _builtin_or_function_call(self) -> A.Expression:
        t = self.next()
        name = t.value.upper()
        if name in AGG_NAMES:
            return self._aggregate(name)
        if name not in BUILTIN_NAMES:
            raise ParseError(f"unknown function {t.value!r} at {t.pos}")
        if name in ("NOW", "RAND", "UUID", "STRUUID") or \
                (name == "BNODE" and self.at_op("(") and self.peek(1).kind == "OP"
                 and self.peek(1).value == ")"):
            self.eat_op("(")
            self.eat_op(")")
            return A.ECall(name, ())
        args = tuple(self._expr_list())
        if name in ("IRI", "URI") and self.base and len(args) == 1:
            # §17.4.2.8: IRI(str) resolves against the query base.
            # Constant strings resolve exactly (RFC 3986) at parse time;
            # dynamic arguments carry the base as a second argument for
            # the kernel's column-level resolution.
            a0 = args[0]
            if (isinstance(a0, A.ETerm) and isinstance(a0.term, A.Literal)
                    and a0.term.lang is None
                    and (a0.term.datatype or XSD + "string")
                    == XSD + "string"):
                return A.ETerm(A.NamedNode(
                    resolve_iri(self.base, a0.term.lex)))
            args = (a0, A.ETerm(A.Literal(self.base,
                                          datatype=XSD + "string")))
        return A.ECall(name, args)

    def _aggregate(self, name: str) -> A.ECall:
        """Aggregates surface as ECall('__agg', AggExpr marker) and are
        hoisted by _assemble_select."""
        self.eat_op("(")
        distinct = False
        if self.at_kw("DISTINCT"):
            self.next()
            distinct = True
        sep = " "
        if name == "COUNT" and self.at_op("*"):
            self.next()
            expr = None
        else:
            expr = self._expression()
        if name == "GROUP_CONCAT" and self.at_op(";"):
            self.next()
            self.eat_kw("SEPARATOR")
            self.eat_op("=")
            sep = self._rdf_literal().lex
        self.eat_op(")")
        if expr is not None and _has_aggregate(expr):
            raise ParseError(
                f"aggregate inside the argument of {name}() — "
                "aggregates cannot nest (§18.2.4.4/§19.8)")
        return A.ECall("__agg", (AggMarker(A.AggExpr(name, expr, distinct, sep)),))


    # -- SPARQL Update (§19 Update grammar; spargebra update.rs) ---------

    def parse_update(self):
        from ..operators import update as U
        ops: List = []
        while True:
            self._prologue()
            if self.peek().kind == "EOF":
                break
            ops.append(self._update_op(U))
            if self.at_op(";"):
                self.next()
                continue
            break
        if self.peek().kind != "EOF":
            raise ParseError(f"trailing input: {self.peek()}")
        return ops

    def _check_quads(self, quads, ctx, *, vars_ok, bnodes_ok):
        """Grammar restrictions on quad templates (§19.6): INSERT/DELETE
        DATA must be ground; DELETE templates may not contain bnodes."""
        def walk(t):
            if isinstance(t, A.Var) and not vars_ok:
                raise ParseError(f"variable not allowed in {ctx}")
            if isinstance(t, A.BlankNode) and not bnodes_ok:
                raise ParseError(f"blank node not allowed in {ctx}")
            if isinstance(t, A.QuotedTriple):
                walk(t.s), walk(t.p), walk(t.o)
        for q in quads:
            walk(q.s), walk(q.p), walk(q.o)
            if q.g is not None:
                walk(q.g)
        return quads

    def _update_op(self, U):
        # WITH <g>: default graph for BOTH the templates and the WHERE
        # pattern of the following DELETE/INSERT operation (§3.1.3)
        with_graph: Optional[A.NamedNode] = None
        if self.at_kw("WITH"):
            self.next()
            with_graph = A.NamedNode(self._iri())
            if not self.at_kw("DELETE", "INSERT"):
                raise ParseError("WITH requires DELETE/INSERT")

        def tmpl(quads):
            if with_graph is None:
                return tuple(quads)
            return tuple(q if q.g is not None else
                         U.QuadTemplate(q.s, q.p, q.o, with_graph)
                         for q in quads)

        def using_clauses():
            """USING / USING NAMED* before WHERE (§3.1.5.3 — the WHERE
            clause's dataset, like FROM/FROM NAMED for queries)."""
            using, named = [], []
            while self.at_kw("USING"):
                self.next()
                if self.at_kw("NAMED"):
                    self.next()
                    named.append(self._iri())
                else:
                    using.append(self._iri())
            return tuple(using), tuple(named)

        def where(pattern, has_using):
            # a USING dataset overrides WITH for the WHERE clause (WITH
            # still scopes the templates, handled by tmpl())
            if with_graph is None or has_using:
                return pattern
            return A.Graph(with_graph, pattern)

        if self.at_kw("INSERT"):
            self.next()
            if self.at_kw("DATA"):
                self.next()
                if with_graph is not None:
                    # grammar: WITH belongs to Modify only (§19.8 Update1)
                    raise ParseError("WITH is not allowed with INSERT DATA")
                return U.InsertData(tuple(self._check_quads(
                    self._quad_data(), "INSERT DATA",
                    vars_ok=False, bnodes_ok=True)))
            t = tmpl(self._quad_data())
            ug, un = using_clauses()
            self.eat_kw("WHERE")
            return U.DeleteInsert(
                (), t, where(self._group_graph_pattern(), bool(ug or un)),
                using=ug, using_named=un)
        if self.at_kw("DELETE"):
            self.next()
            if self.at_kw("DATA"):
                self.next()
                if with_graph is not None:
                    raise ParseError("WITH is not allowed with DELETE DATA")
                return U.DeleteData(tuple(self._check_quads(
                    self._quad_data(), "DELETE DATA",
                    vars_ok=False, bnodes_ok=False)))
            if self.at_kw("WHERE"):
                self.next()
                if with_graph is not None:
                    # DeleteWhere is its own Update1 production, no WITH
                    raise ParseError("WITH is not allowed with DELETE WHERE")
                dq = self._check_quads(self._quad_data(), "DELETE WHERE",
                                       vars_ok=True, bnodes_ok=False)
                return U.DeleteInsert(tmpl(dq), (), None)
            del_t = tmpl(self._check_quads(
                self._quad_data(), "DELETE template",
                vars_ok=True, bnodes_ok=False))
            ins_t: tuple = ()
            if self.at_kw("INSERT"):
                self.next()
                ins_t = tmpl(self._quad_data())
            ug, un = using_clauses()
            self.eat_kw("WHERE")
            return U.DeleteInsert(
                del_t, ins_t,
                where(self._group_graph_pattern(), bool(ug or un)),
                using=ug, using_named=un)
        if self.at_kw("CLEAR", "DROP"):
            kind = self.eat_kw("CLEAR", "DROP")
            if self.at_kw("SILENT"):
                self.next()
            cls = U.Clear if kind == "CLEAR" else U.Drop
            if self.at_kw("DEFAULT", "NAMED", "ALL"):
                return cls(self.eat_kw("DEFAULT", "NAMED", "ALL"))
            self.eat_kw("GRAPH")
            return cls("GRAPH", self._iri())
        if self.at_kw("CREATE"):
            self.next()
            if self.at_kw("SILENT"):
                self.next()
            self.eat_kw("GRAPH")
            return U.Create(self._iri())
        if self.at_kw("COPY", "MOVE", "ADD"):
            kind = self.eat_kw("COPY", "MOVE", "ADD")
            silent = False
            if self.at_kw("SILENT"):
                self.next()
                silent = True
            src = self._graph_or_default()
            self.eat_kw("TO")
            return U.CopyMoveAdd(kind, src, self._graph_or_default(),
                                 silent=silent)
        if self.at_kw("LOAD"):
            self.next()
            silent = False
            if self.at_kw("SILENT"):
                self.next()
                silent = True
            source = self._iri()
            graph = None
            if self.at_kw("INTO"):
                self.next()
                self.eat_kw("GRAPH")
                graph = self._iri()
            return U.Load(source, graph, silent)
        raise ParseError(f"expected update operation, got {self.peek()}")

    def _graph_or_default(self):
        if self.at_kw("DEFAULT"):
            self.next()
            return None
        if self.at_kw("GRAPH"):
            self.next()
        return self._iri()

    def _quad_data(self):
        """{ triples (GRAPH g { triples })* } → list of QuadTemplate."""
        from ..operators import update as U
        self.eat_op("{")
        out: List = []

        def add_triples(graph):
            triples: List = []
            self._template_depth += 1
            try:
                self._triples_block(triples)
            finally:
                self._template_depth -= 1
            for t in triples:
                if isinstance(t, A.PathPattern):
                    raise ParseError("property paths not allowed in templates")
                out.append(U.QuadTemplate(t.s, t.p, t.o, graph))

        while not self.at_op("}"):
            if self.at_kw("GRAPH"):
                self.next()
                # QuadsNotTriples ::= 'GRAPH' VarOrIri '{' TriplesTemplate? '}'
                # — a VARIABLE label is grammar-legal; _check_quads rejects
                # it where groundness is required (INSERT/DELETE DATA)
                if self.peek().kind == "VAR":
                    g: Union[A.NamedNode, A.Var] = A.Var(
                        self.next().value[1:])
                else:
                    g = A.NamedNode(self._iri())
                self.eat_op("{")
                if not self.at_op("}"):
                    add_triples(g)
                self.eat_op("}")
            elif self.at_op("."):
                self.next()
            else:
                add_triples(None)
        self.eat_op("}")
        return out


def apply_qt_lowerings(acc: A.GraphPattern, lowerings: List) -> A.GraphPattern:
    """Lower each quoted-triple pattern: the fresh var must bind a
    quoted-triple term whose components match — variable components
    bind via Extend (or sameTerm-filter when already in scope), ground
    components constrain via sameTerm.  Module-level so DELETE WHERE
    template→pattern conversion (operators/update.py) can reuse it.

    Outer-before-inner order: recursion records nested quoted triples
    innermost-first, but the OUTER lowering's Extend is what binds the
    inner fresh var, so it must land deeper in the algebra nest —
    hence the reversal."""
    for qv, s, p, o in reversed(lowerings):
        ev = A.EVar(qv.name)
        acc = A.Filter(A.ECall("ISTRIPLE", (ev,)), acc)
        for comp, accessor in ((s, "SUBJECT"), (p, "PREDICATE"),
                               (o, "OBJECT")):
            get = A.ECall(accessor, (ev,))
            if isinstance(comp, A.Var):
                if comp.name in A.pattern_vars(acc):
                    acc = A.Filter(
                        A.ECall("SAMETERM", (get, A.EVar(comp.name))), acc)
                else:
                    acc = A.Extend(acc, comp, get)
            else:
                acc = A.Filter(
                    A.ECall("SAMETERM", (get, A.ETerm(comp))), acc)
    return acc


class AggMarker:
    """Wrapper so an AggExpr can ride inside an ECall arg tuple."""

    def __init__(self, agg: A.AggExpr):
        self.agg = agg


# ---------------------------------------------------------------------------
# SELECT assembly (ToAlgebra §18.2.4): grouping, having, order, projection
# ---------------------------------------------------------------------------


def _hoist_aggregates(e, aggs: List[Tuple[A.Var, A.AggExpr]], counter):
    """Replace __agg markers with fresh variables, collecting (var, agg)."""
    if isinstance(e, A.ECall) and e.name == "__agg":
        marker = e.args[0]
        v = A.Var(f"__agg{next(counter)}")
        aggs.append((v, marker.agg))
        return A.EVar(v.name)
    if isinstance(e, A.EOp):
        return A.EOp(e.op, tuple(_hoist_aggregates(a, aggs, counter) for a in e.args))
    if isinstance(e, A.ECall):
        return A.ECall(e.name, tuple(_hoist_aggregates(a, aggs, counter) for a in e.args))
    if isinstance(e, A.EIn):
        return A.EIn(_hoist_aggregates(e.expr, aggs, counter),
                     tuple(_hoist_aggregates(o, aggs, counter) for o in e.options),
                     e.negated)
    return e


def _has_aggregate(e) -> bool:
    if isinstance(e, A.ECall):
        if e.name == "__agg":
            return True
        return any(_has_aggregate(a) for a in e.args if isinstance(
            a, (A.EOp, A.ECall, A.EIn, A.ETerm, A.EVar)))
    if isinstance(e, A.EOp):
        return any(_has_aggregate(a) for a in e.args)
    if isinstance(e, A.EIn):
        return _has_aggregate(e.expr) or any(_has_aggregate(o) for o in e.options)
    return False


def _free_vars(e):
    """Variable names reachable in an expression OUTSIDE aggregate
    arguments (``__agg`` markers) and EXISTS sub-patterns — i.e. the
    names §18.2.4.4 requires to be grouped.  Conservative: unknown node
    kinds contribute nothing."""
    if isinstance(e, A.EVar):
        yield e.name
    elif isinstance(e, A.ECall):
        if e.name != "__agg":
            for a in e.args:
                yield from _free_vars(a)
    elif isinstance(e, A.EOp):
        for a in e.args:
            yield from _free_vars(a)
    elif isinstance(e, A.EIn):
        yield from _free_vars(e.expr)
        for o in e.options:
            yield from _free_vars(o)


def _assemble_select(pattern, proj, star, distinct, reduced, group_by,
                     having, order, offset, limit, counter):
    # grammar note 12 (§19.8): a variable assigned with AS — in a SELECT
    # expression or a GROUP BY binding — must not already be in-scope of
    # the WHERE pattern, and SELECT aliases must not collide with any
    # other projection entry
    scope = A.pattern_vars(pattern) if pattern is not None else frozenset()
    names = [v.name for v, _ in proj]
    for v, e in proj:
        if e is not None:
            if v.name in scope:
                raise ParseError(
                    f"SELECT expression assigns ?{v.name}, which is "
                    "already in scope in the WHERE pattern (grammar "
                    "note 12, §19.8)")
            if names.count(v.name) > 1:
                raise ParseError(
                    f"SELECT expression assigns ?{v.name} more than "
                    "once (grammar note 12, §19.8)")
    for v, e in group_by:
        if e is not None and v.name in scope:
            raise ParseError(
                f"GROUP BY assigns ?{v.name}, which is already in "
                "scope in the WHERE pattern (grammar note 12, §19.8)")

    needs_group = bool(group_by) or any(
        e is not None and _has_aggregate(e) for _, e in proj) or any(
        _has_aggregate(h) for h in having) or any(
        _has_aggregate(o.expr) for o in order)

    if needs_group:
        if star:
            raise ParseError(
                "SELECT * cannot be used with GROUP BY / aggregates "
                "(spec §18.2.4.4): project grouped variables and "
                "aggregate expressions explicitly")
        # GROUP BY (expr AS ?v) → Extend before grouping
        by_vars: List[A.Var] = []
        for v, e in group_by:
            if e is not None:
                pattern = A.Extend(pattern, v, e)
            by_vars.append(v)
        by_names = {v.name for v in by_vars}
        # SELECT expressions may use grouped vars, aggregates, and
        # aliases assigned EARLIER in the same SELECT clause (the Extend
        # chain below binds them in order) — any other free variable is
        # the §18.2.4.4 ungrouped-variable syntax error
        aliases_so_far: set = set()
        for v, e in proj:
            if e is None:
                if v.name not in by_names:
                    raise ParseError(
                        f"variable ?{v.name} is projected but neither "
                        "grouped nor aggregated (spec §18.2.4.4 — wrap it "
                        "in SAMPLE() or add it to GROUP BY)")
            else:
                for name in _free_vars(e):
                    if name not in by_names and name not in aliases_so_far:
                        raise ParseError(
                            f"variable ?{name} in SELECT expression is "
                            "neither grouped nor aggregated "
                            "(spec §18.2.4.4)")
            aliases_so_far.add(v.name)
        # HAVING runs on the raw Group output (before projection
        # Extends), so only grouped vars are in scope there; ORDER BY
        # additionally sees SELECT-expression aliases.
        alias_names = {v.name for v, e in proj if e is not None}
        for h in having:
            for name in _free_vars(h):
                if name not in by_names:
                    raise ParseError(
                        f"variable ?{name} in HAVING is neither grouped "
                        "nor aggregated (spec §18.2.4.4)")
        for o in order:
            for name in _free_vars(o.expr):
                if name not in by_names and name not in alias_names:
                    raise ParseError(
                        f"variable ?{name} in ORDER BY is neither "
                        "grouped, aggregated, nor a SELECT alias "
                        "(spec §18.2.4.4)")
        aggs: List[Tuple[A.Var, A.AggExpr]] = []
        new_proj = []
        for v, e in proj:
            if e is None:
                new_proj.append((v, None))
            else:
                new_proj.append((v, _hoist_aggregates(e, aggs, counter)))
        new_having = [_hoist_aggregates(h, aggs, counter) for h in having]
        new_order = [A.OrderCond(_hoist_aggregates(o.expr, aggs, counter), o.asc)
                     for o in order]
        pattern = A.Group(pattern, tuple(by_vars), tuple(aggs))
        for h in new_having:
            pattern = A.Filter(h, pattern)
        proj, having, order = new_proj, [], new_order

    # SELECT (expr AS ?v) → Extend
    out_vars: List[A.Var] = []
    for v, e in proj:
        if e is not None:
            pattern = A.Extend(pattern, v, e)
        out_vars.append(v)

    for h in having:
        pattern = A.Filter(h, pattern)
    if order:
        pattern = A.OrderBy(pattern, tuple(order))

    if star:
        vars_ = sorted(n for n in A.pattern_vars(pattern)
                       if not n.startswith("__"))
        out_vars = [A.Var(n) for n in vars_]
    pattern = A.Project(pattern, tuple(out_vars))
    if distinct:
        pattern = A.Distinct(pattern)
    elif reduced:
        pattern = A.Reduced(pattern)
    if offset or limit is not None:
        pattern = A.Slice(pattern, offset, limit)
    return pattern


def _join_values(q: A.Query, values: A.Values) -> A.Query:
    import dataclasses
    if isinstance(q, (A.SelectQuery, A.AskQuery, A.ConstructQuery)):
        return dataclasses.replace(q, pattern=A.Join(q.pattern, values))
    return q


def parse_query(text: str) -> A.Query:
    return Parser(text).parse_query()


def parse_update(text: str):
    return Parser(text).parse_update()
