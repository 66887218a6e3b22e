"""Mini W3C-style manifest-driven evaluation suite (round-4 VERDICT item
5; upstream's backbone is ``testsuite/rdf-tests`` manifests).

``tests/w3c_mini/manifest.ttl`` lists 450 entries targeting known-hard
semantics: nested OPTIONAL scoping, VALUES+UNDEF join compatibility,
aggregate error propagation, MINUS vs NOT EXISTS divergence, property
paths on cycles / zero-length over ground terms (in AND out of the
graph domain) / negated sets with inverse members / diamonds and self
loops, SPARQL Update evaluation (WITH/USING/USING NAMED interaction,
DELETE WHERE over named graphs, CLEAR/MOVE/ADD, op sequences), named
graphs, BIND scoping, EXISTS correlation, error-tolerant IN, ordering
of unbound/mixed-kind terms, and six negative-syntax cases.  The
runner is self-hosting: the manifest itself is parsed by this engine's
Turtle reader and queried with SPARQL; CONSTRUCT results compare via
``operators.canonicalize.isomorphic``; UpdateEvaluationTest entries run
``Store.update`` and compare the FULL resulting dataset (all graphs)
isomorphically against an expected TriG document.

Binding comparison: multiset over normalized terms — numeric literals
compare by VALUE within the same datatype (lexical "3" ≡ "3.0" for one
decimal), everything else by exact (type, value, datatype|lang).
"""

import json
import os
from decimal import Decimal

import pytest

from oxigraph_spark.model import terms as T
from oxigraph_spark.store import Store

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "w3c_mini")
MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
QT = "http://www.w3.org/2001/sw/DataAccess/tests/test-query#"
XSD = "http://www.w3.org/2001/XMLSchema#"
NUMERIC = {XSD + t for t in
           ("integer", "decimal", "double", "float", "long", "int",
            "short", "byte", "nonNegativeInteger", "positiveInteger",
            "negativeInteger", "nonPositiveInteger", "unsignedLong",
            "unsignedInt", "unsignedShort", "unsignedByte")}


def _norm_binding(b):
    """Results-JSON binding dict → hashable normalized term."""
    if b is None:
        return None
    t = b["type"]
    v = b["value"]
    if t in ("uri", "bnode"):
        return (t, v)
    lang = b.get("xml:lang")
    if lang:
        return ("lit-lang", v, lang.lower())
    if t == "triple":
        return ("triple", _norm_binding(v["subject"]),
                _norm_binding(v["predicate"]), _norm_binding(v["object"]))
    dt = b.get("datatype") or XSD + "string"
    if dt in NUMERIC:
        num = (float(v) if dt in (XSD + "double", XSD + "float")
               else Decimal(v))
        return ("lit-num", dt, num)
    return ("lit", v, dt)


def _row_term_binding(t):
    """Engine TERM struct Row → results-JSON binding dict (None=unbound);
    quoted triples nest per SPARQL 1.2 results JSON."""
    from oxigraph_spark.sources.results_io import term_to_json_obj
    return term_to_json_obj(t)


def _solution_multiset(bindings, variables):
    out = []
    for b in bindings:
        out.append(tuple(_norm_binding(b.get(v)) for v in variables))
    return sorted(out, key=repr)


def _load_manifest(spark):
    """Self-hosting: parse manifest.ttl with this engine and query it."""
    from oxigraph_spark.operators.update import MutableQuadSource
    from oxigraph_spark.sources.rdf_io import load_rdf
    quads = load_rdf(spark, os.path.join(HERE, "manifest.ttl"))
    st = Store(spark, MutableQuadSource(spark, quads))
    rows = st.query(f"""
        PREFIX mf: <{MF}>
        PREFIX qt: <{QT}>
        SELECT ?type ?name ?query ?data ?result WHERE {{
          ?e a ?type ; mf:name ?name ; qt:query ?query .
          OPTIONAL {{ ?e qt:data ?data }}
          OPTIONAL {{ ?e mf:result ?result }}
        }} ORDER BY ?name
    """).collect()
    entries = []
    for r in rows:
        entries.append({
            "kind": r["type"]["lex"].rsplit("#", 1)[1],
            "name": r["name"]["lex"],
            "query": r["query"]["lex"],
            "data": r["data"]["lex"] if r["data"] else None,
            "result": r["result"]["lex"] if r["result"] else None,
        })
    return entries


_DATA_STORES = {}


def _store_for(spark, data_file):
    from oxigraph_spark.operators.update import MutableQuadSource
    from oxigraph_spark.sources.rdf_io import load_rdf
    if data_file not in _DATA_STORES:
        quads = load_rdf(spark, os.path.join(HERE, data_file))
        _DATA_STORES[data_file] = Store(
            spark, MutableQuadSource(spark, quads))
    return _DATA_STORES[data_file]


@pytest.fixture(autouse=True)
def _no_leaked_service_handlers():
    """SERVICE ?var deliberately ranges over REGISTERED endpoint
    handlers (engine extension) — but other test modules register
    handlers into the class-level dict, which made the
    service-silent-var-endpoint entry order-dependent in the full
    suite.  Run the manifest against a clean registry, restore after."""
    from oxigraph_spark.plans.compiler import Compiler
    saved = dict(Compiler.SERVICE_HANDLERS)
    Compiler.SERVICE_HANDLERS.clear()
    try:
        yield
    finally:
        Compiler.SERVICE_HANDLERS.clear()
        Compiler.SERVICE_HANDLERS.update(saved)


@pytest.mark.slow
def test_manifest_suite(spark):
    """Full 450-entry sweep — the pre-release pass (``--runslow``).
    The default run covers a deterministic 1-in-8 sample of the same
    manifest via :func:`test_manifest_smoke` (r10: the full suite
    outgrew the driver's verify window)."""
    entries = _load_manifest(spark)
    assert len(entries) == 450
    _run_entries(spark, entries)


def test_manifest_smoke(spark):
    """Every 8th manifest entry (name-ordered, deterministic) — keeps
    W3C-semantics coverage in the DEFAULT test run at ~1/8 the cost."""
    entries = _load_manifest(spark)
    assert len(entries) == 450
    _run_entries(spark, entries[::8])


def _run_entries(spark, entries):
    from oxigraph_spark.algebra.parser import ParseError, parse_query
    from oxigraph_spark.operators.canonicalize import isomorphic
    from oxigraph_spark.sources.rdf_io import load_rdf
    from pyspark.sql import functions as F

    failures = []
    for e in entries:
        name = e["name"]
        qtext = open(os.path.join(HERE, e["query"])).read()
        try:
            if e["kind"] == "NegativeSyntaxTest":
                from oxigraph_spark.algebra.parser import parse_update
                parse = (parse_update if e["query"].endswith(".ru")
                         else parse_query)
                try:
                    parse(qtext)
                    failures.append(f"{name}: expected ParseError")
                except ParseError:
                    pass
                continue
            if e["kind"] == "NegativeRdfSyntaxTest":
                # ill-formed Turtle/TriG documents the reader must reject
                try:
                    load_rdf(spark, os.path.join(HERE, e["query"])).collect()
                    failures.append(f"{name}: expected a syntax error")
                except Exception:  # noqa: BLE001 (ParseError/ValueError)
                    pass
                continue
            if e["kind"] == "UpdateEvaluationTest":
                # base stores are immutable (Store.update returns a NEW
                # store over a rewritten source), so the per-data cache
                # stays valid across update entries
                base = _store_for(spark, e["data"])
                got = base.update(qtext).source.quads()
                exp = load_rdf(spark, os.path.join(HERE, e["result"]))
                from oxigraph_spark.operators.canonicalize import (
                    isomorphic as _iso)
                if not _iso(got, exp):
                    failures.append(f"{name}: update result not isomorphic")
                continue
            st = _store_for(spark, e["data"])
            rpath = os.path.join(HERE, e["result"])
            if e["result"].endswith(".ttl"):       # CONSTRUCT
                got = st.query(qtext)
                if "g" not in got.columns:
                    got = got.withColumn("g", T.default_graph())
                from oxigraph_spark.sources.rdf_io import load_rdf as _lr
                exp = _lr(spark, rpath)
                if not isomorphic(got, exp):
                    failures.append(f"{name}: CONSTRUCT not isomorphic")
                continue
            doc = json.loads(open(rpath).read())
            if "boolean" in doc:                   # ASK
                got_b = st.ask(qtext)
                if got_b != doc["boolean"]:
                    failures.append(
                        f"{name}: ASK {got_b} != {doc['boolean']}")
                continue
            variables = doc["head"]["vars"]
            exp = _solution_multiset(doc["results"]["bindings"], variables)
            df = st.query(qtext)
            got_rows = [{v: _row_term_binding(r[v]) for v in variables
                         if r[v] is not None} for r in df.collect()]
            got = _solution_multiset(got_rows, variables)
            if got != exp:
                failures.append(
                    f"{name}:\n  expected {exp}\n  got      {got}")
        except Exception as ex:                    # noqa: BLE001
            failures.append(f"{name}: raised {type(ex).__name__}: {ex}")
    assert not failures, "\n".join(failures)
