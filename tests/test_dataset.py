"""FROM / FROM NAMED dataset construction (spec §13.2; spargebra ·
QueryDataset): the active dataset is exactly what the clauses list."""

import pytest

from oxigraph_spark.operators.update import MutableQuadSource
from oxigraph_spark.sources.ntriples import read_ntriples
from oxigraph_spark.store import Store

NQ = """
<urn:s1> <urn:p> "default" .
<urn:s2> <urn:p> "g1" <urn:graph:1> .
<urn:s3> <urn:p> "g2" <urn:graph:2> .
<urn:s4> <urn:p> "g3" <urn:graph:3> .
"""


@pytest.fixture(scope="module")
def ds_store(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("ds") / "data.nq"
    p.write_text(NQ)
    quads = read_ntriples(spark, str(p), quads=True)
    return Store(spark, MutableQuadSource(spark, quads))


def _vals(df):
    return sorted(r.o.lex for r in df.collect())


def test_no_dataset_defaults_to_default_graph(ds_store):
    df = ds_store.query("SELECT ?o WHERE { ?s <urn:p> ?o }")
    assert _vals(df.select(df["o"].alias("o"))) == ["default"]


def test_from_merges_named_graphs(ds_store):
    df = ds_store.query("""
        SELECT ?o FROM <urn:graph:1> FROM <urn:graph:2>
        WHERE { ?s <urn:p> ?o }""")
    assert _vals(df) == ["g1", "g2"]  # real default graph excluded


def test_from_named_restricts_graph_patterns(ds_store):
    df = ds_store.query("""
        SELECT ?g ?o FROM NAMED <urn:graph:2>
        WHERE { GRAPH ?g { ?s <urn:p> ?o } }""")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].o.lex == "g2" and rows[0].g.lex == "urn:graph:2"


def test_from_named_only_empties_default(ds_store):
    df = ds_store.query("""
        SELECT ?o FROM NAMED <urn:graph:1> WHERE { ?s <urn:p> ?o }""")
    assert df.count() == 0


def test_graph_iri_outside_from_named_is_empty(ds_store):
    df = ds_store.query("""
        SELECT ?o FROM NAMED <urn:graph:1>
        WHERE { GRAPH <urn:graph:2> { ?s <urn:p> ?o } }""")
    assert df.count() == 0


def test_update_using_clause(spark):
    """USING <g> restricts the WHERE clause's default graph to the
    listed graph (§3.1.5.3); USING NAMED scopes GRAPH patterns."""
    from tests.test_semantics import iri, lit, quads_store
    st = quads_store(spark, [(iri("a"), iri("p"), lit("base"))])
    st = st.update("""
        PREFIX ex: <urn:ex:>
        INSERT DATA { GRAPH ex:g1 { ex:b ex:p "one" }
                      GRAPH ex:g2 { ex:c ex:p "two" } }""")
    # USING ex:g1: WHERE sees only g1 as the default graph
    st2 = st.update("""
        PREFIX ex: <urn:ex:>
        INSERT { ?s ex:copied ?o } USING ex:g1 WHERE { ?s ex:p ?o }""")
    got = {(r["s"]["lex"], r["o"]["lex"]) for r in st2.query(
        "PREFIX ex: <urn:ex:> SELECT ?s ?o WHERE { ?s ex:copied ?o }"
    ).collect()}
    assert got == {("urn:ex:b", "one")}
    # without USING the default graph is the real default graph
    st3 = st.update("""
        PREFIX ex: <urn:ex:>
        INSERT { ?s ex:copied ?o } WHERE { ?s ex:p ?o }""")
    got3 = {(r["s"]["lex"], r["o"]["lex"]) for r in st3.query(
        "PREFIX ex: <urn:ex:> SELECT ?s ?o WHERE { ?s ex:copied ?o }"
    ).collect()}
    assert got3 == {("urn:ex:a", "base")}
    # USING NAMED: GRAPH ?g ranges over the listed named graphs only
    st4 = st.update("""
        PREFIX ex: <urn:ex:>
        INSERT { ?s ex:copied ?o } USING NAMED ex:g2
        WHERE { GRAPH ?g { ?s ex:p ?o } }""")
    got4 = {(r["s"]["lex"], r["o"]["lex"]) for r in st4.query(
        "PREFIX ex: <urn:ex:> SELECT ?s ?o WHERE { ?s ex:copied ?o }"
    ).collect()}
    assert got4 == {("urn:ex:c", "two")}


def test_use_default_graph_as_union(spark):
    """pyoxigraph's use_default_graph_as_union: patterns outside GRAPH
    match quads from EVERY graph; an explicit FROM still overrides."""
    from oxigraph_spark.operators.update import MutableQuadSource
    from oxigraph_spark.store import Store
    from tests.test_semantics import iri, lit, quads_store
    st = quads_store(spark, [(iri("a"), iri("p"), lit("default"))])
    st = st.update("""
        INSERT DATA {
          GRAPH <urn:ex:g1> { <urn:ex:a> <urn:ex:p> "one" }
          GRAPH <urn:ex:g2> { <urn:ex:a> <urn:ex:p> "two" }
        }""")
    q = "SELECT ?o WHERE { <urn:ex:a> <urn:ex:p> ?o }"
    plain = sorted(r.o.lex for r in st.query(q).collect())
    assert plain == ["default"]
    union = sorted(r.o.lex for r in st.query(
        q, use_default_graph_as_union=True).collect())
    assert union == ["default", "one", "two"]
    # FROM overrides the union flag (explicit dataset wins, as upstream)
    fq = ("SELECT ?o FROM <urn:ex:g1> WHERE "
          "{ <urn:ex:a> <urn:ex:p> ?o }")
    got = sorted(r.o.lex for r in st.query(
        fq, use_default_graph_as_union=True).collect())
    assert got == ["one"]


def test_store_parity_apis(spark):
    """quads_for_pattern / named_graphs / contains / count_quads mirror
    the reference Store API (store.rs quads_for_pattern/contains/len,
    pyoxigraph named_graphs)."""
    from oxigraph_spark.algebra import ast as A
    from tests.test_semantics import iri, lit, quads_store
    st = quads_store(spark, [
        (iri("a"), iri("p"), lit("x")),
        (iri("a"), iri("q"), lit("y")),
        (iri("b"), iri("p"), iri("a")),
    ])
    st = st.update(
        'INSERT DATA { GRAPH <urn:ex:g1> { <urn:ex:c> <urn:ex:p> "z" } }')
    assert st.count_quads() == 4
    # bound predicate
    rows = st.quads_for_pattern(p=A.NamedNode("urn:ex:p")).collect()
    assert len(rows) == 3
    # bound subject + object
    rows = st.quads_for_pattern(s=A.NamedNode("urn:ex:a"),
                                o=A.Literal("y")).collect()
    assert len(rows) == 1 and rows[0].p.lex == "urn:ex:q"
    # graph-bound
    rows = st.quads_for_pattern(g=A.NamedNode("urn:ex:g1")).collect()
    assert len(rows) == 1 and rows[0].s.lex == "urn:ex:c"
    # contains
    assert st.contains(A.NamedNode("urn:ex:a"), A.NamedNode("urn:ex:p"),
                       A.Literal("x"))
    assert not st.contains(A.NamedNode("urn:ex:a"), A.NamedNode("urn:ex:p"),
                           A.Literal("nope"))
    # named graphs
    gs = sorted(r.g.lex for r in st.named_graphs().collect())
    assert gs == ["urn:ex:g1"]


def test_paths_respect_graph_contexts(spark, tmp_path_factory):
    """Round-7 regression: property-path closures must stay PER-GRAPH
    under `GRAPH ?g` (no cross-graph edge stitching, ?g bound), follow
    a ground GRAPH, and under use_default_graph_as_union close over
    the RDF merge (which IS the union default graph)."""
    p = tmp_path_factory.mktemp("pg") / "data.nq"
    p.write_text(
        '<urn:a> <urn:r> <urn:b> <urn:g1> .\n'
        '<urn:b> <urn:r> <urn:c> <urn:g1> .\n'
        '<urn:a> <urn:r> <urn:d> <urn:g2> .\n'
        '<urn:c> <urn:r> <urn:e> <urn:g2> .\n')
    quads = read_ntriples(spark, str(p), quads=True)
    st = Store(spark, MutableQuadSource(spark, quads))

    got = sorted((r.g.lex, r.x.lex) for r in st.query(
        "SELECT ?g ?x WHERE { GRAPH ?g { <urn:a> <urn:r>+ ?x } }"
    ).collect())
    # per-graph closure: urn:e is NOT reachable inside g2 alone
    assert got == [("urn:g1", "urn:b"), ("urn:g1", "urn:c"),
                   ("urn:g2", "urn:d")]

    got2 = sorted(r.x.lex for r in st.query(
        "SELECT ?x WHERE { GRAPH <urn:g2> { <urn:a> <urn:r>+ ?x } }"
    ).collect())
    assert got2 == ["urn:d"]

    # union default graph: the merge makes e reachable (a->d? no:
    # a->b->c->e via g1+g2 edges merged)
    got3 = sorted(r.x.lex for r in st.query(
        "SELECT ?x WHERE { <urn:a> <urn:r>+ ?x }",
        use_default_graph_as_union=True).collect())
    assert got3 == ["urn:b", "urn:c", "urn:d", "urn:e"]

    # default graph without the flag: no edges at all
    assert st.query(
        "SELECT ?x WHERE { <urn:a> <urn:r>+ ?x }").count() == 0
