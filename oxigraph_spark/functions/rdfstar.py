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

- a plain (IRI/bnode) subject token never contains spaces, so
  ``^(\\S+) `` splits it off directly; a NESTED quoted-triple subject
  token (``<<…>>``, which may contain spaces at any depth) is split off
  by an exact char-scan (``aggregate`` over the characters tracking
  quote-nesting depth, string state, and IRI state — still a pure JVM
  expression, no UDF);
- the predicate token (always an IRI) is the next ``\\S+``;
- the object token (which may contain spaces: literals, nested quoted
  triples) is the remainder, re-parsed by the shared N-Triples token
  parser, which rebuilds the full typed payload for literals.

TRIPLE()/SUBJECT/PREDICATE/OBJECT are exact at ANY nesting depth, and
since round 8 so is the N-Triples LINE reader (its bounded regex is
only the fast path; deeper lines fall through to the same char-scan —
``ntriples._scan_tokens``).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..model import terms as T
from ..sources.ntriples import format_term, parse_token, qt_token_len
from .builtins import bool_term, err


def quoted_lex(s: Column, p: Column, o: Column) -> Column:
    """Canonical quoted-triple ``lex`` from three TERM columns."""
    return F.concat_ws(" ", format_term(s), format_term(p), format_term(o))


def fn_triple(s: Column, p: Column, o: Column) -> Column:
    """TRIPLE(s, p, o) → quoted-triple term (SPARQL 1.2 §17).
    Errors (NULL) unless s is IRI/bnode/quoted triple, p is IRI, o is any
    RDF term.

    Each argument is let-bound once: the body references every argument
    ~8x (kind checks + format_term), so NESTED TRIPLE() towers would
    otherwise grow the expression tree ~8^depth — a depth-5 tower OOM'd
    the driver before round-8's binding."""
    def mk(sb: Column) -> Column:
        def mk2(pb: Column) -> Column:
            def mk3(ob: Column) -> Column:
                ok = (sb["kind"].isin(T.KIND_IRI, T.KIND_BNODE,
                                      T.KIND_TRIPLE)
                      & (pb["kind"] == T.KIND_IRI)
                      & ob["kind"].isin(T.KIND_IRI, T.KIND_BNODE,
                                        T.KIND_LITERAL, T.KIND_TRIPLE))
                return F.when(ok, T.term_struct(
                    T.KIND_TRIPLE, quoted_lex(sb, pb, ob))).otherwise(err())
            return T.let1(o, mk3)
        return T.let1(p, mk2)
    return T.let1(s, mk)


# the exact quoted-triple char scan lives in sources.ntriples
# (qt_token_len) — shared with the any-depth N-Triples line tokenizer
_subject_token_len = qt_token_len


def _component(t: Column, which: str) -> Column:
    lex = t["lex"]
    nested_subj = lex.startswith("<<")
    if which == "s":
        tok = F.when(nested_subj,
                     T.let1(_subject_token_len(lex),
                            lambda n: lex.substr(F.lit(1), n))) \
               .otherwise(F.regexp_extract(lex, r"^(\S+) ", 1))
    else:
        # strip the subject token (+ the separating space), then the
        # predicate is the next \S+ and the object the remainder
        rest = F.when(nested_subj,
                      T.let1(_subject_token_len(lex),
                             lambda n: lex.substr(n + F.lit(2),
                                                  F.length(lex)))) \
                .otherwise(F.regexp_extract(lex, r"^\S+ (.*)$", 1))
        if which == "p":
            tok = F.regexp_extract(rest, r"^(\S+)", 1)
        else:
            tok = F.regexp_extract(rest, r"^\S+ (.*)$", 1)
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


# self-registration (see note at the bottom of builtins.py): by the time
# this module body runs, builtins has fully executed at least through
# REGISTRY's definition, whichever module was imported first.
from .builtins import REGISTRY as _REGISTRY  # noqa: E402

_REGISTRY.update({
    "TRIPLE": fn_triple, "SUBJECT": fn_subject,
    "PREDICATE": fn_predicate, "OBJECT": fn_object,
    "ISTRIPLE": fn_is_triple,
})
