"""Micro-fixtures round 2 (FIXTURES.md §4): fx_strings (lang rules),
fx_temporal (tz), fx_agg (error groups), fx_graphs (named graphs)."""

import pytest

from oxigraph_spark.algebra import ast as A
from oxigraph_spark.model import terms as T
from tests.test_semantics import quads_store, iri, lit, integer, dbl

EX = "urn:ex:"


@pytest.fixture(scope="module")
def store(spark):
    triples = [
        # fx_strings
        (iri("s1"), iri("label"), lit("hello", lang="en")),
        (iri("s2"), iri("label"), lit("howdy", lang="en-US")),
        (iri("s3"), iri("label"), lit("bonjour", lang="fr")),
        (iri("s4"), iri("label"), lit("plain")),
        (iri("s5"), iri("label"), lit("Ünïcödé")),
        # fx_agg: g1 all numeric, g2 contains a non-numeric → SUM errors
        (iri("a1"), iri("grp"), lit("g1")), (iri("a1"), iri("v"), integer(1)),
        (iri("a2"), iri("grp"), lit("g1")), (iri("a2"), iri("v"), integer(2)),
        (iri("a3"), iri("grp"), lit("g2")), (iri("a3"), iri("v"), integer(3)),
        (iri("a4"), iri("grp"), lit("g2")), (iri("a4"), iri("v"), lit("oops")),
    ]
    return quads_store(spark, triples)


def test_langmatches(store):
    df = store.query(f"""
        SELECT ?s WHERE {{ ?s <{EX}label> ?l .
          FILTER(LANGMATCHES(LANG(?l), "en")) }}""")
    got = sorted(r.s.lex[-2:] for r in df.collect())
    assert got == ["s1", "s2"]  # en and en-US both match range "en"
    df2 = store.query(f"""
        SELECT ?s WHERE {{ ?s <{EX}label> ?l .
          FILTER(LANGMATCHES(LANG(?l), "*")) }}""")
    assert df2.count() == 3  # any language-tagged literal


def test_argument_compatibility(store):
    # CONTAINS("plain", "bonjour"@fr) → error (lang arg vs plain) → dropped
    df = store.query(f"""
        SELECT ?s WHERE {{ ?s <{EX}label> ?l .
          FILTER(CONTAINS(?l, "o"@fr)) }}""")
    got = sorted(r.s.lex[-2:] for r in df.collect())
    assert got == ["s3"]  # only fr-tagged "bonjour" is compatible + contains o


def test_strlang_strdt_lang_accessors(store):
    df = store.query(f"""
        SELECT ?tagged ?typed WHERE {{
          BIND(STRLANG("hi", "EN") AS ?tagged)
          BIND(STRDT("5", <http://www.w3.org/2001/XMLSchema#integer>) AS ?typed)
        }}""")
    r = df.collect()[0]
    assert r.tagged.lang == "en"          # tag normalized to lowercase
    assert r.typed.num == 5               # payload derived dynamically


def test_unicode_case_and_substr(store):
    df = store.query(f"""
        SELECT ?u ?sub WHERE {{ <{EX}s5> <{EX}label> ?l .
          BIND(UCASE(?l) AS ?u) BIND(SUBSTR(?l, 2, 3) AS ?sub) }}""")
    r = df.collect()[0]
    assert r.u.lex == "ÜNÏCÖDÉ"
    assert r.sub.lex == "nïc"  # 1-based, codepoint semantics


def test_sum_error_group_is_unbound(store):
    df = store.query(f"""
        SELECT ?g (SUM(?v) AS ?sum) (COUNT(?v) AS ?cnt) WHERE {{
          ?x <{EX}grp> ?g ; <{EX}v> ?v .
        }} GROUP BY ?g""")
    rows = {r.g.lex: (r.sum, r.cnt.num) for r in df.collect()}
    assert rows["g1"][0].num == 3 and rows["g1"][1] == 2
    assert rows["g2"][0] is None          # "oops" → aggregation error
    assert rows["g2"][1] == 2             # COUNT counts non-error evals


def test_min_max_cross_type(store):
    df = store.query(f"""
        SELECT (MIN(?v) AS ?mn) (MAX(?v) AS ?mx) WHERE {{
          ?x <{EX}v> ?v . }}""")
    r = df.collect()[0]
    assert r.mn.num == 1                  # numerics order before strings
    assert r.mx.lex == "oops"             # string class sorts above numeric


def test_named_graphs_via_update(spark):
    st = quads_store(spark, [(iri("x"), iri("p"), integer(1))])
    st2 = st.update(f"""
        INSERT DATA {{ GRAPH <{EX}g1> {{ <{EX}x> <{EX}p> 2 }}
                       GRAPH <{EX}g2> {{ <{EX}y> <{EX}p> 3 }} }}
    """)
    # default graph unchanged
    assert st2.query(f"SELECT ?o WHERE {{ ?s <{EX}p> ?o }}").count() == 1
    # named graph pattern
    df = st2.query(f"SELECT ?o WHERE {{ GRAPH <{EX}g1> {{ ?s <{EX}p> ?o }} }}")
    assert [r.o.num for r in df.collect()] == [2]
    # variable graph binds graph names, excludes default
    df2 = st2.query(f"SELECT ?g ?o WHERE {{ GRAPH ?g {{ ?s <{EX}p> ?o }} }}")
    got = sorted((r.g.lex, int(r.o.num)) for r in df2.collect())
    assert got == [(f"{EX}g1", 2), (f"{EX}g2", 3)]
    # graph var join: same graph must hold both triples
    st3 = st2.update(f"INSERT DATA {{ GRAPH <{EX}g1> {{ <{EX}x> <{EX}q> 9 }} }}")
    df3 = st3.query(
        f"SELECT ?g WHERE {{ GRAPH ?g {{ ?s <{EX}p> ?o . ?s <{EX}q> ?o2 }} }}")
    assert [r.g.lex for r in df3.collect()] == [f"{EX}g1"]


def test_with_graph_update(spark):
    """WITH <g>: default graph for DELETE/INSERT templates AND the WHERE
    pattern (§3.1.3)."""
    st = quads_store(spark, [(iri("x"), iri("p"), integer(1))])
    st2 = st.update(f"""
        INSERT DATA {{ GRAPH <{EX}g1> {{ <{EX}x> <{EX}p> 2 }} }} ;
        WITH <{EX}g1>
        DELETE {{ ?s <{EX}p> ?o }}
        INSERT {{ ?s <{EX}p> 20 }}
        WHERE  {{ ?s <{EX}p> ?o }}
    """)
    # the WITH update touched ONLY g1; default graph unchanged
    df = st2.query(f"SELECT ?o WHERE {{ ?s <{EX}p> ?o }}")
    assert [int(r.o.num) for r in df.collect()] == [1]
    df1 = st2.query(
        f"SELECT ?o WHERE {{ GRAPH <{EX}g1> {{ ?s <{EX}p> ?o }} }}")
    assert [int(r.o.num) for r in df1.collect()] == [20]
    # WITH scopes a full DELETE-template Modify to the graph; the
    # DELETE WHERE shorthand is its own Update1 production the grammar
    # gives no WITH to (§19.8 — round-6 strictness, matching upstream
    # spargebra)
    st3 = st2.update(f"WITH <{EX}g1> DELETE {{ ?s <{EX}p> ?o }} "
                     f"WHERE {{ ?s <{EX}p> ?o }}")
    assert st3.query(
        f"SELECT ?o WHERE {{ GRAPH <{EX}g1> {{ ?s ?p ?o }} }}").count() == 0
    assert st3.query(f"SELECT ?o WHERE {{ ?s <{EX}p> ?o }}").count() == 1
    from oxigraph_spark.algebra.parser import ParseError
    with pytest.raises(ParseError):
        st2.update(f"WITH <{EX}g1> DELETE WHERE {{ ?s <{EX}p> ?o }}")


def test_temporal_timezones(spark):
    triples = [
        (iri("t1"), iri("at"), A.Literal("2024-03-01T12:00:00+05:30",
                                         datatype=T.XSD_DATETIME)),
        (iri("t2"), iri("at"), A.Literal("2024-03-01T06:30:00Z",
                                         datatype=T.XSD_DATETIME)),
        (iri("t3"), iri("at"), A.Literal("2024-03-01T06:30:00",
                                         datatype=T.XSD_DATETIME)),
    ]
    st = quads_store(spark, triples)
    # t1 and t2 denote the same instant → equal; TZ()/TIMEZONE() differ
    df = st.query(f"""
        SELECT ?s ?tz ?dur ?h WHERE {{ ?s <{EX}at> ?d .
          BIND(TZ(?d) AS ?tz) BIND(TIMEZONE(?d) AS ?dur)
          BIND(HOURS(?d) AS ?h) }}""")
    rows = {r.s.lex[-2:]: r for r in df.collect()}
    assert rows["t1"].tz.lex == "+05:30"
    assert rows["t1"].dur.lex == "PT5H30M"
    assert rows["t2"].tz.lex == "Z" and rows["t2"].dur.lex == "PT0S"
    assert rows["t3"].tz.lex == "" and rows["t3"].dur is None  # tz-less → error
    # instant comparison across offsets
    eq = st.query(f"""
        ASK {{ <{EX}t1> <{EX}at> ?a . <{EX}t2> <{EX}at> ?b . FILTER(?a = ?b) }}""")
    assert eq.count() == 1


def test_construct_template_bnodes(spark):
    """Bnodes in CONSTRUCT templates: fresh per solution, same label →
    same bnode across template triples within one solution (§16.2.1)."""
    st = quads_store(spark, [(iri("a"), iri("p"), integer(1)),
                             (iri("b"), iri("p"), integer(2))])
    rows = st.query(
        "CONSTRUCT { ?s <urn:ex:q> _:b . _:b <urn:ex:r> ?o } "
        "WHERE { ?s <urn:ex:p> ?o }").collect()
    assert len(rows) == 4
    by_s = {r.o.lex: r.s.lex for r in rows if r.p.lex == "urn:ex:r"}
    links = {r.s.lex: r.o.lex for r in rows if r.p.lex == "urn:ex:q"}
    # each subject links to the bnode that carries its own ?o
    assert set(links.values()) == set(by_s.values())
    assert len(set(links.values())) == 2


def test_insert_data_bnodes_fresh_per_op(spark):
    """INSERT DATA bnodes are fresh per operation and shared within it."""
    st = quads_store(spark, [(iri("x"), iri("p"), integer(1))])
    st1 = st.update("INSERT DATA { _:b <urn:ex:q> 5 . _:b <urn:ex:r> 6 }")
    got = st1.query(
        "SELECT ?s1 ?s2 WHERE { ?s1 <urn:ex:q> ?a . ?s2 <urn:ex:r> ?b }"
    ).collect()
    assert len(got) == 1 and got[0].s1.lex == got[0].s2.lex
    assert got[0].s1.kind == 1
    st2 = st1.update("INSERT DATA { _:b <urn:ex:q> 5 . _:b <urn:ex:r> 6 }")
    assert st2.query("SELECT ?s WHERE { ?s <urn:ex:q> ?a }").count() == 2


def test_insert_template_bnodes(spark):
    """Bnodes in INSERT templates instantiate fresh per solution."""
    st = quads_store(spark, [(iri("a"), iri("p"), integer(1)),
                             (iri("b"), iri("p"), integer(2))])
    st2 = st.update("INSERT { ?s <urn:ex:ln> _:n . _:n <urn:ex:v> ?o } "
                    "WHERE { ?s <urn:ex:p> ?o }")
    got = st2.query("SELECT ?s ?n ?o WHERE "
                    "{ ?s <urn:ex:ln> ?n . ?n <urn:ex:v> ?o }").collect()
    assert len(got) == 2
    assert len({r.n.lex for r in got}) == 2


def test_update_template_validation(spark):
    """§19.6 grammar restrictions: ground INSERT/DELETE DATA, no bnodes
    in DELETE templates."""
    from oxigraph_spark.algebra.parser import ParseError
    st = quads_store(spark, [(iri("x"), iri("p"), integer(1))])
    for q in ["INSERT DATA { ?v <urn:ex:p> 1 }",
              "DELETE DATA { _:b <urn:ex:p> 1 }",
              "DELETE DATA { ?v <urn:ex:p> 1 }",
              "DELETE { _:b <urn:ex:p> ?o } WHERE { ?s <urn:ex:p> ?o }",
              "DELETE WHERE { _:b <urn:ex:p> ?o }"]:
        with pytest.raises(ParseError):
            st.update(q)


def test_bnode_canonicalization_isomorphic(spark):
    """Two isomorphic graphs with distinct bnode labels canonicalize
    identically; a structurally different graph does not (upstream
    oxrdf Dataset::canonicalize parity)."""
    from oxigraph_spark.operators.canonicalize import (
        canonical_quads, isomorphic)
    from tests.test_semantics import EX, iri, integer, quads_store

    def g(triples):
        return quads_store(spark, triples).source.quads()

    import oxigraph_spark.algebra.ast as A
    # chain: A -p-> _:x -p-> _:y -p-> B   (labels x,y vs u,v)
    g1 = g([(iri("a"), iri("p"), A.BlankNode("x")),
            (A.BlankNode("x"), iri("p"), A.BlankNode("y")),
            (A.BlankNode("y"), iri("p"), iri("b"))])
    g2 = g([(iri("a"), iri("p"), A.BlankNode("u")),
            (A.BlankNode("u"), iri("p"), A.BlankNode("v")),
            (A.BlankNode("v"), iri("p"), iri("b"))])
    # different structure: chain reversed at the tail
    g3 = g([(iri("a"), iri("p"), A.BlankNode("u")),
            (A.BlankNode("u"), iri("p"), A.BlankNode("v")),
            (iri("b"), iri("p"), A.BlankNode("v"))])
    assert isomorphic(g1, g2)
    assert not isomorphic(g1, g3)
    # canonical labels are identical across isomorphic inputs
    k1 = {(r["s"]["lex"], r["o"]["lex"])
          for r in canonical_quads(g1).collect()}
    k2 = {(r["s"]["lex"], r["o"]["lex"])
          for r in canonical_quads(g2).collect()}
    assert k1 == k2
    # construct-style use: same data, fresh bnode labels per run
    assert isomorphic(g2, g2)


def test_bnode_canonicalization_counts(spark):
    """Multiset semantics: two interchangeable bnodes collapse to one
    label but keep their quad COUNT, so a one-bnode graph with the same
    quad set is still distinguished."""
    from oxigraph_spark.operators.canonicalize import isomorphic
    from tests.test_semantics import iri, integer, quads_store
    import oxigraph_spark.algebra.ast as A

    def g(triples):
        return quads_store(spark, triples).source.quads()

    two = g([(A.BlankNode("a"), iri("p"), integer(1)),
             (A.BlankNode("b"), iri("p"), integer(1))])
    one = g([(A.BlankNode("c"), iri("p"), integer(1))])
    assert not isomorphic(two, one)


def test_exists_unbound_shared_var_multiplicity(store):
    """FILTER EXISTS sharing a var that is UNBOUND in the outer solution:
    the unbound var is compatible with every subpattern solution, so the
    row passes — but must appear exactly ONCE (a naive compatibility
    left-join against the subpattern's distinct bindings duplicates it
    once per distinct value)."""
    q = f"""
        SELECT ?s ?v WHERE {{
          ?s <{EX}label> ?l .
          OPTIONAL {{ ?s <{EX}v> ?v }}
          FILTER EXISTS {{ ?a <{EX}v> ?v }}
        }}"""
    df = store.query(q)
    got = sorted(r.s.lex[-2:] for r in df.collect())
    # s1..s5 carry labels and never bind ?v; EXISTS {?a v ?v} with ?v
    # free is satisfiable → each row passes exactly once
    assert got == ["s1", "s2", "s3", "s4", "s5"]
    # and the complement: NOT EXISTS drops all of them
    df2 = store.query(q.replace("FILTER EXISTS", "FILTER NOT EXISTS"))
    assert df2.count() == 0


def test_describe_bnode_closure(spark):
    """DESCRIBE recursively includes descriptions of blank-node objects
    (concise-bounded-description shape): a bnode reached through the
    described node brings its own outgoing triples, IRIs do not recurse."""
    from oxigraph_spark.algebra import ast as A
    from tests.test_semantics import iri, lit, quads_store
    b1, b2 = A.BlankNode("b1"), A.BlankNode("b2")
    st = quads_store(spark, [
        (iri("a"), iri("addr"), b1),
        (b1, iri("city"), lit("Springfield")),
        (b1, iri("geo"), b2),
        (b2, iri("lat"), lit("1.5")),
        (iri("a"), iri("knows"), iri("z")),
        (iri("z"), iri("name"), lit("zed")),      # NOT included (IRI)
        (iri("other"), iri("p"), lit("x")),       # unrelated
    ])
    rows = st.query("DESCRIBE <urn:ex:a>").collect()
    got = sorted((r.s.lex, r.p.lex, r.o.lex) for r in rows)
    labels = {s for s, _, _ in got}
    preds = sorted(p for _, p, _ in got)
    assert preds == ["urn:ex:addr", "urn:ex:city", "urn:ex:geo",
                     "urn:ex:knows", "urn:ex:lat"]
    # z's own description is NOT pulled in; both bnodes' are
    assert not any(p == "urn:ex:name" for _, p, _ in got)


def test_copy_move_add_missing_source_errors_unless_silent(spark):
    """SPARQL 1.1 Update §3.2.3-5: COPY/MOVE/ADD from a NON-EXISTENT
    named source graph is an error unless SILENT; either way the
    destination is untouched (round-8 ADVICE fix — previously always a
    silent no-op; before round 7 it destroyed the destination)."""
    import pytest as _pytest
    st = quads_store(spark, [(iri("x"), iri("p"), integer(1))])
    st = st.update(f"INSERT DATA {{ GRAPH <{EX}g2> {{ <{EX}y> <{EX}q> 2 }} }}")
    for kind in ("COPY", "MOVE", "ADD"):
        with _pytest.raises(ValueError, match="does not exist"):
            st.update(f"{kind} <{EX}missing> TO <{EX}g2>")
        st2 = st.update(f"{kind} SILENT <{EX}missing> TO <{EX}g2>")
        # SILENT: no-op, destination intact
        df = st2.query(
            f"SELECT ?o WHERE {{ GRAPH <{EX}g2> {{ ?s <{EX}q> ?o }} }}")
        assert [int(r.o.num) for r in df.collect()] == [2]
    # the DEFAULT graph always exists: COPY DEFAULT TO g works on empty
    st3 = quads_store(spark, [(iri("x"), iri("p"), integer(1))])
    st3.update(f"MOVE DEFAULT TO <{EX}g9>")  # no raise
