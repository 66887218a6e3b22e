"""RDF-star / SPARQL-star kernels (SURVEY.md §2.7 RDF-star row).

Reference: ``lib/oxrdf/src/triple.rs`` · ``Term::Triple`` (quoted triples
as a term variant) and the SPARQL 1.2 builtins TRIPLE / SUBJECT /
PREDICATE / OBJECT / isTRIPLE.

Spark-first encoding: a quoted triple is a ``KIND_TRIPLE`` term whose
``lex`` is the canonical space-separated N-Triples token serialization of
its three components (``<s> <p> o-token``).  That keeps the TERM struct
fixed-width (no recursive schema — Spark cannot express one), makes
quoted-triple identity plain term identity (kind + lex), and lets every
accessor be a pure JVM regex/substring expression:

- subject and predicate tokens never contain spaces (see restriction),
  so ``^(\\S+) (\\S+) (.*)$`` splits the components exactly;
- the object token (which may contain spaces: literals, nested quoted
  triples) is the remainder, re-parsed by the shared N-Triples token
  parser, which rebuilds the full typed payload for literals.

v1 restriction (documented; mirrors the regex-parseable subset): the
SUBJECT of a quoted triple must be an IRI or blank node — quoted triples
nested in subject position are rejected by TRIPLE() (error→NULL) and the
parser.  Nesting in OBJECT position is unrestricted.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..model import terms as T
from ..sources.ntriples import format_term, parse_token
from .builtins import bool_term, err


def quoted_lex(s: Column, p: Column, o: Column) -> Column:
    """Canonical quoted-triple ``lex`` from three TERM columns."""
    return F.concat_ws(" ", format_term(s), format_term(p), format_term(o))


def fn_triple(s: Column, p: Column, o: Column) -> Column:
    """TRIPLE(s, p, o) → quoted-triple term (SPARQL 1.2 §17).
    Errors (NULL) unless s is IRI/bnode, p is IRI, o is any RDF term."""
    ok = (s["kind"].isin(T.KIND_IRI, T.KIND_BNODE)
          & (p["kind"] == T.KIND_IRI)
          & o["kind"].isin(T.KIND_IRI, T.KIND_BNODE, T.KIND_LITERAL,
                           T.KIND_TRIPLE))
    return F.when(ok, T.term_struct(T.KIND_TRIPLE, quoted_lex(s, p, o))) \
            .otherwise(err())


def _component(t: Column, which: str) -> Column:
    lex = t["lex"]
    if which == "s":
        tok = F.regexp_extract(lex, r"^(\S+) ", 1)
    elif which == "p":
        tok = F.regexp_extract(lex, r"^\S+ (\S+) ", 1)
    else:
        tok = F.regexp_extract(lex, r"^\S+ \S+ (.*)$", 1)
    # let-bind the extracted token so parse_token's many references see a
    # leaf lambda var, not a duplicated regexp_extract subtree
    return F.when(t["kind"] == T.KIND_TRIPLE, T.let1(tok, parse_token)) \
            .otherwise(err())


def fn_subject(t: Column) -> Column:
    return _component(t, "s")


def fn_predicate(t: Column) -> Column:
    return _component(t, "p")


def fn_object(t: Column) -> Column:
    return _component(t, "o")


def fn_is_triple(t: Column) -> Column:
    return F.when(t.isNull(), err()) \
            .otherwise(bool_term(t["kind"] == T.KIND_TRIPLE))
