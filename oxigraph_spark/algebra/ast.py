"""SPARQL algebra as Python dataclasses.

Mirrors the reference's algebra IR (``lib/spargebra/src/algebra.rs`` ·
``GraphPattern`` / ``Expression`` / ``AggregateExpression`` /
``PropertyPathExpression`` and ``lib/spargebra/src/term.rs`` term kinds).
The SPARQL-spec §18.2 "ToAlgebra" translation targets these nodes; the
compiler in :mod:`oxigraph_spark.plans.compiler` lowers them to DataFrame
plans (our physical layer is Catalyst, SURVEY.md §3 E1).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple, Union

# ---------------------------------------------------------------------------
# RDF terms (ground) and variables
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class NamedNode:
    iri: str


@dataclass(frozen=True)
class BlankNode:
    label: str


@dataclass(frozen=True)
class Literal:
    lex: str
    datatype: Optional[str] = None  # None ⇒ xsd:string (simple literal)
    lang: Optional[str] = None


@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class QuotedTriple:
    """RDF-star quoted triple used as a term (ground components only by
    the time it reaches the compiler; variable components are lowered by
    the parser to a fresh var + SUBJECT/PREDICATE/OBJECT constraints)."""
    s: "GroundTerm"
    p: "GroundTerm"
    o: "GroundTerm"


GroundTerm = Union[NamedNode, BlankNode, Literal, QuotedTriple]
TermOrVar = Union[NamedNode, BlankNode, Literal, QuotedTriple, Var]

DEFAULT_GRAPH = NamedNode("urn:x-oxispark:default-graph")  # sentinel


# ---------------------------------------------------------------------------
# Property paths (spargebra · PropertyPathExpression)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PLink:
    iri: str


@dataclass(frozen=True)
class PInv:
    inner: "PathExpr"


@dataclass(frozen=True)
class PSeq:
    left: "PathExpr"
    right: "PathExpr"


@dataclass(frozen=True)
class PAlt:
    left: "PathExpr"
    right: "PathExpr"


@dataclass(frozen=True)
class PZeroOrMore:
    inner: "PathExpr"


@dataclass(frozen=True)
class POneOrMore:
    inner: "PathExpr"


@dataclass(frozen=True)
class PZeroOrOne:
    inner: "PathExpr"


@dataclass(frozen=True)
class PNeg:
    forward: Tuple[str, ...] = ()
    inverse: Tuple[str, ...] = ()


PathExpr = Union[PLink, PInv, PSeq, PAlt, PZeroOrMore, POneOrMore,
                 PZeroOrOne, PNeg]


# ---------------------------------------------------------------------------
# Expressions (spargebra · Expression / Function)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ETerm:
    term: GroundTerm


@dataclass(frozen=True)
class EVar:
    name: str


@dataclass(frozen=True)
class EOp:
    """op ∈ {'||','&&','!','=','!=','<','<=','>','>=','+','-','*','/','u-','u+'}"""
    op: str
    args: Tuple["Expression", ...]


@dataclass(frozen=True)
class ECall:
    """Built-in or extension function call; ``name`` is the uppercase
    builtin name (STR, REGEX, …), a cast datatype IRI, or a custom
    function IRI registered via the function registry (§2.9)."""
    name: str
    args: Tuple["Expression", ...]


@dataclass(frozen=True)
class EIn:
    expr: "Expression"
    options: Tuple["Expression", ...]
    negated: bool = False


@dataclass(frozen=True)
class EExists:
    pattern: "GraphPattern"
    negated: bool = False


Expression = Union[ETerm, EVar, EOp, ECall, EIn, EExists]


# ---------------------------------------------------------------------------
# Aggregates (spargebra · AggregateExpression)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AggExpr:
    name: str                      # COUNT SUM AVG MIN MAX SAMPLE GROUP_CONCAT
    expr: Optional[Expression]     # None ⇒ COUNT(*)
    distinct: bool = False
    separator: str = " "           # GROUP_CONCAT only


# ---------------------------------------------------------------------------
# Graph patterns (spargebra · GraphPattern)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TriplePattern:
    s: TermOrVar
    p: TermOrVar          # concrete predicate, or Var
    o: TermOrVar


@dataclass(frozen=True)
class PathPattern:
    s: TermOrVar
    path: PathExpr
    o: TermOrVar


@dataclass(frozen=True)
class BGP:
    patterns: Tuple[Union[TriplePattern, PathPattern], ...] = ()


@dataclass(frozen=True)
class Join:
    left: "GraphPattern"
    right: "GraphPattern"


@dataclass(frozen=True)
class LeftJoin:
    left: "GraphPattern"
    right: "GraphPattern"
    expr: Optional[Expression] = None


@dataclass(frozen=True)
class Minus:
    left: "GraphPattern"
    right: "GraphPattern"


@dataclass(frozen=True)
class Union_:
    left: "GraphPattern"
    right: "GraphPattern"


@dataclass(frozen=True)
class Filter:
    expr: Expression
    inner: "GraphPattern"


@dataclass(frozen=True)
class Extend:
    inner: "GraphPattern"
    var: Var
    expr: Expression


@dataclass(frozen=True)
class Values:
    vars: Tuple[Var, ...]
    rows: Tuple[Tuple[Optional[GroundTerm], ...], ...]


@dataclass(frozen=True)
class Graph:
    name: Union[NamedNode, Var]
    inner: "GraphPattern"


@dataclass(frozen=True)
class Group:
    inner: "GraphPattern"
    by: Tuple[Var, ...]
    aggregates: Tuple[Tuple[Var, AggExpr], ...]


@dataclass(frozen=True)
class OrderCond:
    expr: Expression
    asc: bool = True


@dataclass(frozen=True)
class OrderBy:
    inner: "GraphPattern"
    conds: Tuple[OrderCond, ...]


@dataclass(frozen=True)
class Project:
    inner: "GraphPattern"
    vars: Tuple[Var, ...]


@dataclass(frozen=True)
class Distinct:
    inner: "GraphPattern"


@dataclass(frozen=True)
class Reduced:
    inner: "GraphPattern"


@dataclass(frozen=True)
class Slice:
    inner: "GraphPattern"
    offset: int = 0
    limit: Optional[int] = None


@dataclass(frozen=True)
class Service:
    name: Union[NamedNode, Var]
    inner: "GraphPattern"
    silent: bool = False
    # verbatim source of the inner group ("{ ... }") plus the query's
    # prefix declarations — what a protocol client ships to the remote
    # endpoint (upstream evaluates SERVICE by sending the pattern text,
    # lib/spareval/src/service.rs); None when the AST was built
    # programmatically rather than parsed
    raw: Optional[str] = None
    prefixes: Optional[tuple] = None  # ((prefix, iri), ...)


GraphPattern = Union[BGP, Join, LeftJoin, Minus, Union_, Filter, Extend,
                     Values, Graph, Group, OrderBy, Project, Distinct,
                     Reduced, Slice, Service]


# ---------------------------------------------------------------------------
# Query forms (spargebra · Query) and updates (· GraphUpdateOperation)
# ---------------------------------------------------------------------------


# FROM / FROM NAMED dataset spec (spargebra · QueryDataset): when either
# tuple is non-empty the query's active dataset is EXACTLY what's listed
# (default graph = merge of `from_graphs`; GRAPH patterns range over
# `from_named` only)


@dataclass(frozen=True)
class SelectQuery:
    pattern: GraphPattern
    from_graphs: Tuple[str, ...] = ()
    from_named: Tuple[str, ...] = ()


@dataclass(frozen=True)
class AskQuery:
    pattern: GraphPattern
    from_graphs: Tuple[str, ...] = ()
    from_named: Tuple[str, ...] = ()


@dataclass(frozen=True)
class ConstructQuery:
    template: Tuple[TriplePattern, ...]
    pattern: GraphPattern
    from_graphs: Tuple[str, ...] = ()
    from_named: Tuple[str, ...] = ()


@dataclass(frozen=True)
class DescribeQuery:
    terms: Tuple[TermOrVar, ...]
    pattern: Optional[GraphPattern]
    from_graphs: Tuple[str, ...] = ()
    from_named: Tuple[str, ...] = ()


Query = Union[SelectQuery, AskQuery, ConstructQuery, DescribeQuery]


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def pattern_vars(node) -> frozenset:
    """All variable names a pattern may bind (its in-scope variables)."""
    if isinstance(node, (TriplePattern,)):
        return frozenset(t.name for t in (node.s, node.p, node.o)
                         if isinstance(t, Var))
    if isinstance(node, PathPattern):
        return frozenset(t.name for t in (node.s, node.o)
                         if isinstance(t, Var))
    if isinstance(node, BGP):
        out: frozenset = frozenset()
        for p in node.patterns:
            out |= pattern_vars(p)
        return out
    if isinstance(node, (Join, LeftJoin, Union_)):
        return pattern_vars(node.left) | pattern_vars(node.right)
    if isinstance(node, Minus):
        return pattern_vars(node.left)
    if isinstance(node, Filter):
        return pattern_vars(node.inner)
    if isinstance(node, Extend):
        return pattern_vars(node.inner) | {node.var.name}
    if isinstance(node, Values):
        return frozenset(v.name for v in node.vars)
    if isinstance(node, Graph):
        extra = {node.name.name} if isinstance(node.name, Var) else set()
        return pattern_vars(node.inner) | extra
    if isinstance(node, Group):
        return (frozenset(v.name for v in node.by)
                | frozenset(v.name for v, _ in node.aggregates))
    if isinstance(node, (OrderBy, Distinct, Reduced, Slice)):
        return pattern_vars(node.inner)
    if isinstance(node, Project):
        return frozenset(v.name for v in node.vars)
    if isinstance(node, Service):
        return pattern_vars(node.inner)
    raise TypeError(f"unknown pattern node: {type(node)}")
