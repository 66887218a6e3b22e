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

TRIPLE()/SUBJECT/PREDICATE/OBJECT are exact at ANY nesting depth.  Only
the N-Triples LINE reader bounds nesting (``ntriples.QT_DEPTH``, regex
unrolling — see there).
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
    Errors (NULL) unless s is IRI/bnode/quoted triple, p is IRI, o is any
    RDF term."""
    ok = (s["kind"].isin(T.KIND_IRI, T.KIND_BNODE, T.KIND_TRIPLE)
          & (p["kind"] == T.KIND_IRI)
          & o["kind"].isin(T.KIND_IRI, T.KIND_BNODE, T.KIND_LITERAL,
                           T.KIND_TRIPLE))
    return F.when(ok, T.term_struct(T.KIND_TRIPLE, quoted_lex(s, p, o))) \
            .otherwise(err())


def _subject_token_len(lex: Column) -> Column:
    """Length of a NESTED quoted-triple subject token at the start of
    ``lex`` (which begins with ``<<``).  Exact one-pass char scan as a
    JVM ``aggregate`` over the characters after the opening ``<<``:
    ``<<``/``>>`` pairs adjust depth, but only OUTSIDE literal strings
    (escape-aware) and OUTSIDE ``<…>`` IRI tokens (whose ``>`` must not
    pair with a following ``>``).  Returns the 1-based position of the
    closing ``>`` — the subject token is ``substr(lex, 1, len)``."""
    chars = F.split(lex.substr(F.lit(3), F.length(lex)), "")
    init = F.struct(
        F.lit(1).alias("d"), F.lit(2).alias("i"),
        F.lit(False).alias("instr"), F.lit(False).alias("esc"),
        F.lit(False).alias("iniri"), F.lit("").alias("prev"),
        F.lit(0).alias("fin"))

    def step(a: Column, c: Column) -> Column:
        i2 = a["i"] + F.lit(1)
        at_top = (~a["instr"]) & (~a["iniri"])
        pend_lt = at_top & (a["prev"] == F.lit("<"))
        pend_gt = at_top & (a["prev"] == F.lit(">"))
        open_ = pend_lt & (c == F.lit("<"))          # "<<" quote-open
        close = pend_gt & (c == F.lit(">"))          # ">>" quote-close
        iri_start = pend_lt & (c != F.lit("<")) & (c != F.lit(">"))
        empty_iri = pend_lt & (c == F.lit(">"))      # "<>"
        d2 = F.when(open_, a["d"] + 1).when(close, a["d"] - 1) \
              .otherwise(a["d"])
        fin2 = F.when(close & (d2 == F.lit(0)), i2).otherwise(F.lit(0))
        instr2 = F.when(a["instr"], ~((c == F.lit('"')) & (~a["esc"]))) \
                  .otherwise(at_top & (~pend_lt) & (c == F.lit('"')))
        esc2 = a["instr"] & (c == F.lit("\\")) & (~a["esc"])
        iniri2 = (F.when(a["instr"], F.lit(False))
                   .when(a["iniri"], c != F.lit(">"))
                   .otherwise(iri_start))
        prev2 = (F.when(a["instr"] | a["iniri"] | open_ | close
                        | iri_start | empty_iri | instr2, F.lit(""))
                  .when(c == F.lit("<"), F.lit("<"))
                  .when(c == F.lit(">"), F.lit(">"))
                  .otherwise(F.lit("")))
        upd = F.struct(d2.alias("d"), i2.alias("i"), instr2.alias("instr"),
                       esc2.alias("esc"), iniri2.alias("iniri"),
                       prev2.alias("prev"), fin2.alias("fin"))
        return F.when(a["fin"] > F.lit(0), a).otherwise(upd)

    return F.aggregate(chars, init, step)["fin"]


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
