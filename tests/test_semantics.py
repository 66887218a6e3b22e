"""Operator micro-fixtures (FIXTURES.md §4): semantic corners the DuckDB
oracle can't express — OPTIONAL compatibility, MINUS disjoint-domain,
path closure on cycles, EBV, promotion, error-as-NULL, updates.

Mirrors the reference's W3C micro-test style (testsuite/ manifests):
tiny graphs, exact solution multisets.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from oxigraph_spark.algebra import ast as A
from oxigraph_spark.model import terms as T
from oxigraph_spark.operators.update import MutableQuadSource
from oxigraph_spark.plans.compiler import _term_to_py
from oxigraph_spark.store import Store

EX = "urn:ex:"


def iri(x):
    return A.NamedNode(EX + x)


def lit(x, dt=None, lang=None):
    return A.Literal(str(x), datatype=dt, lang=lang)


def integer(n):
    return A.Literal(str(n), datatype=T.XSD_INTEGER)


def dbl(x):
    return A.Literal(str(x), datatype=T.XSD_DOUBLE)


def quads_store(spark, triples):
    schema = StructType([StructField(c, T.TERM_SCHEMA)
                         for c in ("s", "p", "o", "g")])
    default_g = (T.KIND_DEFAULT_GRAPH, "", None, None, None, None, None,
                 None, None)
    rows = [( _term_to_py(s), _term_to_py(p), _term_to_py(o), default_g)
            for s, p, o in triples]
    df = spark.createDataFrame(rows, schema)
    return Store(spark, MutableQuadSource(spark, df))


@pytest.fixture(scope="module")
def fx(spark):
    """One combined micro-graph: people/emails, a path cycle, numbers."""
    triples = [
        # fx_optional: alice+bob have emails, carol none
        (iri("alice"), iri("name"), lit("Alice")),
        (iri("bob"), iri("name"), lit("Bob")),
        (iri("carol"), iri("name"), lit("Carol")),
        (iri("alice"), iri("email"), lit("a@x.org")),
        (iri("bob"), iri("email"), lit("bob@corp.example")),
        # fx_path_dag: chain d1→d2→d3, cycle c1→c2→c3→c1, isolated n0
        (iri("d1"), iri("next"), iri("d2")),
        (iri("d2"), iri("next"), iri("d3")),
        (iri("c1"), iri("next"), iri("c2")),
        (iri("c2"), iri("next"), iri("c3")),
        (iri("c3"), iri("next"), iri("c1")),
        (iri("n0"), iri("other"), iri("n0b")),
        # fx_promotion
        (iri("v1"), iri("val"), integer(7)),
        (iri("v2"), iri("val"), dbl(2.5)),
        (iri("v3"), iri("val"), lit("not-a-number")),
    ]
    return triples


@pytest.fixture(scope="module")
def store(spark, fx):
    return quads_store(spark, fx)


def names(df, col="x"):
    return sorted(r[col].lex.replace(EX, "") for r in df.collect())


def test_optional_left_join_semantics(store):
    df = store.query(f"""
        SELECT ?n ?e WHERE {{
          ?p <{EX}name> ?n .
          OPTIONAL {{ ?p <{EX}email> ?e . FILTER(CONTAINS(?e, "x.org")) }}
        }}""")
    rows = {r.n.lex: (r.e.lex if r.e else None) for r in df.collect()}
    # bob HAS an email but it fails the filter → still appears, unbound
    assert rows == {"Alice": "a@x.org", "Bob": None, "Carol": None}


def test_minus_disjoint_domain_removes_nothing(store):
    df = store.query(f"""
        SELECT ?n WHERE {{
          ?p <{EX}name> ?n .
          MINUS {{ ?q <{EX}email> ?e }}
        }}""")
    # no shared variables → MINUS is a no-op (spec §8.3.3)
    assert df.count() == 3


def test_not_exists_differs_from_minus(store):
    df = store.query(f"""
        SELECT ?n WHERE {{
          ?p <{EX}name> ?n .
          FILTER NOT EXISTS {{ ?q <{EX}email> ?e }}
        }}""")
    # the uncorrelated subpattern matches → every row filtered out
    assert df.count() == 0


def test_path_plus_terminates_on_cycle(store):
    df = store.query(
        f"SELECT ?x WHERE {{ <{EX}c1> <{EX}next>+ ?x }}")
    assert names(df) == ["c1", "c2", "c3"]


def test_path_star_includes_zero_length(store):
    df = store.query(
        f"SELECT ?x WHERE {{ <{EX}d1> <{EX}next>* ?x }}")
    assert names(df) == ["d1", "d2", "d3"]


def test_path_star_unbound_zero_length_domain(store):
    # ?x next* ?x with zero length: every node in the graph pairs with
    # itself; answers = all terms (subjects ∪ objects)
    df = store.query(
        f"SELECT ?x WHERE {{ ?x <{EX}other>* ?x }}")
    assert df.count() == 22  # all distinct terms in the graph


def test_path_inverse_and_sequence(store):
    # d3 ^next d2 (d2 next d3), d2 ^next d1 → walks the chain backwards
    df = store.query(
        f"SELECT ?x WHERE {{ <{EX}d3> (^<{EX}next>/^<{EX}next>) ?x }}")
    assert names(df) == ["d1"]


def test_promotion_int_plus_double(store):
    df = store.query(f"""
        SELECT ?s ?r WHERE {{ ?s <{EX}val> ?v . BIND(?v + 1.5 AS ?r) }}""")
    rows = {r.s.lex.replace(EX, ""): r.r for r in df.collect()}
    # "1.5" is xsd:decimal (§19: only exponent forms are double), so
    # integer + decimal promotes to decimal; double operand wins for v2
    assert rows["v1"].datatype == T.XSD_DECIMAL and float(rows["v1"].num) == 8.5
    assert rows["v2"].datatype == T.XSD_DOUBLE and rows["v2"].dbl == 4.0
    assert rows["v3"] is None  # error → unbound


def test_int_division_yields_decimal(store):
    df = store.query(
        f"SELECT ?r WHERE {{ <{EX}v1> <{EX}val> ?v . BIND(?v / 2 AS ?r) }}")
    r = df.collect()[0].r
    assert r.datatype == T.XSD_DECIMAL and float(r.num) == 3.5


def test_division_by_zero_is_error(store):
    df = store.query(f"""
        SELECT ?s ?r WHERE {{ ?s <{EX}val> ?v . BIND(?v / 0 AS ?r) }}""")
    rows = {r.s.lex.replace(EX, ""): r.r for r in df.collect()}
    assert rows["v1"] is None          # integer ÷ 0 → error
    assert rows["v2"].dbl == float("inf")  # double ÷ 0 → +Inf (XSD)


def test_ebv_rules(store):
    df = store.query(f"""
        SELECT ?s WHERE {{ ?s <{EX}val> ?v . FILTER(?v) }}""")
    # 7 → true; 2.5 → true; "not-a-number" non-empty string → true
    assert df.count() == 3
    df2 = store.query(f"""
        SELECT ?s WHERE {{ ?s <{EX}name> ?n . FILTER(STRLEN(?n) - STRLEN(?n)) }}""")
    assert df2.count() == 0  # 0 → EBV false


def test_union_null_padding_and_coalesce(store):
    df = store.query(f"""
        SELECT ?who ?mail WHERE {{
          {{ ?p <{EX}name> ?who }} UNION {{ ?p <{EX}email> ?mail }}
        }}""")
    rows = [(r.who.lex if r.who else None, r.mail.lex if r.mail else None)
            for r in df.collect()]
    assert (None, "a@x.org") in rows and ("Alice", None) in rows
    assert len(rows) == 5


def test_order_by_mixed_kinds(store):
    df = store.query(f"""
        SELECT ?v WHERE {{ ?s <{EX}val> ?v }} ORDER BY ?v""")
    vals = [r.v for r in df.collect()]
    # numerics sort before strings in our total order; 2.5 < 7
    assert float(vals[0].dbl) == 2.5 and vals[1].num == 7
    assert vals[2].lex == "not-a-number"


def test_values_join(store):
    df = store.query(f"""
        SELECT ?n WHERE {{
          VALUES ?n {{ "Alice" "Zed" }}
          ?p <{EX}name> ?n .
        }}""")
    assert [r.n.lex for r in df.collect()] == ["Alice"]


def test_update_insert_delete(spark, fx):
    st = quads_store(spark, fx)
    st2 = st.update(f"""
        INSERT DATA {{ <{EX}dave> <{EX}name> "Dave" }} ;
        DELETE WHERE {{ <{EX}carol> <{EX}name> ?n }}
    """)
    df = st2.query(f"SELECT ?n WHERE {{ ?p <{EX}name> ?n }}")
    assert sorted(r.n.lex for r in df.collect()) == ["Alice", "Bob", "Dave"]


def test_update_delete_insert_where(spark, fx):
    st = quads_store(spark, fx)
    st2 = st.update(f"""
        DELETE {{ ?p <{EX}email> ?e }}
        INSERT {{ ?p <{EX}hadEmail> "true" }}
        WHERE {{ ?p <{EX}email> ?e }}
    """)
    assert st2.query(f"SELECT ?e WHERE {{ ?p <{EX}email> ?e }}").count() == 0
    assert st2.query(f"SELECT ?p WHERE {{ ?p <{EX}hadEmail> ?x }}").count() == 2


def test_update_clear_all(spark, fx):
    st = quads_store(spark, fx)
    st2 = st.update("CLEAR ALL")
    assert st2.query("SELECT ?s WHERE { ?s ?p ?o }").count() == 0


def test_construct_drops_incomplete(store):
    df = store.query(f"""
        CONSTRUCT {{ ?p <{EX}mail2> ?e }}
        WHERE {{ ?p <{EX}name> ?n . OPTIONAL {{ ?p <{EX}email> ?e }} }}""")
    assert df.count() == 2  # carol's unbound ?e row dropped


def test_optional_filter_exists(spark):
    """EXISTS/NOT EXISTS inside an OPTIONAL's FILTER (§8.3 LeftJoin with
    an expression the marker-join decorrelation can't attach to a join
    condition — exercises the decomposed passing ∪ complement path)."""
    triples = [
        (iri("a"), iri("p"), integer(1)), (iri("a"), iri("q"), integer(10)),
        (iri("b"), iri("p"), integer(2)), (iri("b"), iri("q"), integer(20)),
        (iri("c"), iri("p"), integer(3)),
        (iri("x"), iri("flag"), integer(10)),
    ]
    st = quads_store(spark, triples)

    def run(q):
        return [(r["s"]["lex"], r["v"]["lex"] if r["v"] else None)
                for r in st.query(q).orderBy("s.lex").collect()]

    got = run(f"""SELECT ?s ?v WHERE {{ ?s <{EX}p> ?k .
        OPTIONAL {{ ?s <{EX}q> ?v . FILTER EXISTS {{ ?f <{EX}flag> ?v }} }} }}""")
    assert got == [(EX + "a", "10"), (EX + "b", None), (EX + "c", None)]

    got = run(f"""SELECT ?s ?v WHERE {{ ?s <{EX}p> ?k .
        OPTIONAL {{ ?s <{EX}q> ?v .
                    FILTER NOT EXISTS {{ ?f <{EX}flag> ?v }} }} }}""")
    assert got == [(EX + "a", None), (EX + "b", "20"), (EX + "c", None)]

    # EXISTS combined with a plain comparison over a LEFT-side variable
    got = run(f"""SELECT ?s ?v WHERE {{ ?s <{EX}p> ?k .
        OPTIONAL {{ ?s <{EX}q> ?v .
                    FILTER(EXISTS {{ ?f <{EX}flag> ?v }} && ?k < 3) }} }}""")
    assert got == [(EX + "a", "10"), (EX + "b", None), (EX + "c", None)]


def test_optional_filter_exists_partial_left_bindings(spark):
    """Regression: L rows with an UNBOUND shared var feeding an OPTIONAL
    whose filter contains EXISTS.  The complement must be computed per
    L-ROW (row id), not by value-projecting ``passing`` back onto L's
    vars: passing's shared vars are coalesce(l, r)-merged, so the bare
    L row (?v unbound) and its passing extension (?v bound) project to
    different tuples and a value anti-join would emit the bare row in
    addition to the extension."""
    triples = [
        (iri("a"), iri("p"), integer(1)),
        (iri("a"), iri("r"), integer(10)),
        (iri("a"), iri("q"), integer(10)),
        (iri("x"), iri("flag"), integer(10)),
    ]
    st = quads_store(spark, triples)
    # L = { ?s p ?k } UNION { ?s p ?k . ?s r ?v }  — two L rows for a:
    # (a, 1, v=NULL) and (a, 1, v=10).  Both are compatible with the
    # OPTIONAL's ?s q ?v (v=10), both extensions pass EXISTS, so the
    # answer is exactly two (a, v=10) rows — no bare (a, NULL) row.
    df = st.query(f"""SELECT ?s ?v WHERE {{
        {{ {{ ?s <{EX}p> ?k }} UNION {{ ?s <{EX}p> ?k . ?s <{EX}r> ?v }} }}
        OPTIONAL {{ ?s <{EX}q> ?v . FILTER EXISTS {{ ?f <{EX}flag> ?v }} }}
    }}""")
    got = sorted((r["s"]["lex"], r["v"]["lex"] if r["v"] else None)
                 for r in df.collect())
    assert got == [(EX + "a", "10"), (EX + "a", "10")]
