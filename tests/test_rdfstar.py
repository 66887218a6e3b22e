"""RDF-star: quoted-triple parse/serialize, SPARQL-star patterns, and the
TRIPLE/SUBJECT/PREDICATE/OBJECT/ISTRIPLE builtins (SURVEY.md §2.7;
reference: lib/oxrdf/src/triple.rs · Term::Triple)."""

import pytest
from pyspark.sql import functions as F

from oxigraph_spark.model import terms as T
from oxigraph_spark.operators.update import MutableQuadSource
from oxigraph_spark.sources.ntriples import read_ntriples, write_ntriples
from oxigraph_spark.store import Store

XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
XSD_DBL = "http://www.w3.org/2001/XMLSchema#double"

NT = f"""
<< <urn:a> <urn:p> "42"^^<{XSD_INT}> >> <urn:certainty> "0.9"^^<{XSD_DBL}> .
<< <urn:b> <urn:p> "7"^^<{XSD_INT}> >> <urn:certainty> "0.4"^^<{XSD_DBL}> .
<urn:a> <urn:p> "42"^^<{XSD_INT}> .
"""


@pytest.fixture(scope="module")
def star_store(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("star") / "star.nt"
    p.write_text(NT)
    quads = read_ntriples(spark, str(p))
    return Store(spark, MutableQuadSource(spark, quads)), quads


def test_quoted_triple_read_kind(star_store):
    _, quads = star_store
    kinds = sorted(r.s.kind for r in quads.collect())
    assert kinds == [0, 3, 3]


def test_quoted_pattern_with_vars(star_store):
    store, _ = star_store
    rows = store.query("""
        SELECT ?s ?val ?c WHERE {
          << ?s <urn:p> ?val >> <urn:certainty> ?c .
          FILTER(?c > 0.5)
        }""").collect()
    assert len(rows) == 1
    assert rows[0].s.lex == "urn:a" and rows[0].val.num == 42


def test_ground_quoted_constant(star_store):
    store, _ = star_store
    rows = store.query(
        'SELECT ?c WHERE { << <urn:b> <urn:p> 7 >> <urn:certainty> ?c . }'
    ).collect()
    assert len(rows) == 1 and abs(rows[0].c.dbl - 0.4) < 1e-9


def test_triple_builtins(star_store):
    store, _ = star_store
    rows = store.query("""
        SELECT ?s ?subj ?istr ?notr WHERE {
          ?s <urn:p> ?o .
          BIND(TRIPLE(?s, <urn:p>, ?o) AS ?t)
          BIND(SUBJECT(?t) AS ?subj)
          BIND(ISTRIPLE(?t) AS ?istr)
          BIND(ISTRIPLE(?s) AS ?notr)
          FILTER(SAMETERM(OBJECT(?t), ?o)
                 && SAMETERM(PREDICATE(?t), <urn:p>))
        }""").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.subj.lex == "urn:a" and r.istr.bool is True and r.notr.bool is False


def test_constructed_equals_parsed(star_store):
    """TRIPLE() output and reader-parsed quoted terms share identity."""
    store, _ = star_store
    rows = store.query("""
        SELECT ?c WHERE {
          ?s <urn:p> ?o .
          << ?s2 <urn:p> ?o2 >> <urn:certainty> ?c .
          FILTER(SAMETERM(TRIPLE(?s, <urn:p>, ?o),
                          TRIPLE(?s2, <urn:p>, ?o2)))
        }""").collect()
    assert len(rows) == 1 and abs(rows[0].c.dbl - 0.9) < 1e-9


def test_star_roundtrip(spark, star_store, tmp_path):
    _, quads = star_store
    out = str(tmp_path / "star_out")
    write_ntriples(quads, out)
    again = read_ntriples(spark, out + "/*.txt")
    key = lambda df: sorted(str(r) for r in df.select(
        T.term_key(df["s"]).alias("a"), T.term_key(df["p"]).alias("b"),
        T.term_key(df["o"]).alias("c")).collect())
    assert key(quads) == key(again)


def test_nested_subject_quoted_triple(spark, tmp_path):
    """Quoted triples nested in SUBJECT position: reader (bounded-depth
    token regex + recursive spacing canonicalization), ground pattern
    matching, and exact accessors (char-scan subject split)."""
    nt = tmp_path / "nested.nt"
    # human spacing in the file; constants/writer emit tight spacing —
    # identity must hold across both (canonicalization)
    nt.write_text(
        '<< << <urn:a> <urn:p> "x y" >> <urn:q> <urn:o> >> '
        '<urn:certainty> "0.8"^^<http://www.w3.org/2001/XMLSchema#double> .\n')
    quads = read_ntriples(spark, str(nt))
    rows = quads.collect()
    assert len(rows) == 1 and rows[0].s.kind == T.KIND_TRIPLE
    store = Store(spark, MutableQuadSource(spark, quads))
    # ground nested-subject constant matches the parsed data (identity
    # through the canonicalized lex)
    got = store.query("""
        SELECT ?c WHERE {
          << << <urn:a> <urn:p> "x y" >> <urn:q> <urn:o> >>
              <urn:certainty> ?c . }""").collect()
    assert len(got) == 1 and abs(got[0].c.dbl - 0.8) < 1e-9
    # accessors peel the nesting exactly (subject token contains spaces)
    got = store.query("""
        SELECT ?innerS ?innerO ?innerP ?outerP ?outerO WHERE {
          ?t <urn:certainty> ?c .
          BIND(SUBJECT(?t) AS ?outerS)
          BIND(PREDICATE(?t) AS ?outerP)
          BIND(OBJECT(?t) AS ?outerO)
          BIND(SUBJECT(?outerS) AS ?innerS)
          BIND(PREDICATE(?outerS) AS ?innerP)
          BIND(OBJECT(?outerS) AS ?innerO)
        }""").collect()
    # outer accessors run the char-scan path (subject token has spaces)
    assert got[0].outerP.lex == "urn:q"
    assert got[0].outerO.lex == "urn:o"
    # inner accessors peel the second level
    assert got[0].innerS.lex == "urn:a"
    assert got[0].innerP.lex == "urn:p"
    assert got[0].innerO.lex == "x y"
    # TRIPLE() accepts a quoted-triple subject and reproduces identity
    got = store.query("""
        SELECT ?match WHERE {
          ?t <urn:certainty> ?c .
          BIND(SAMETERM(TRIPLE(SUBJECT(?t), <urn:q>, <urn:o>), ?t)
               AS ?match) }""").collect()
    assert got[0].match.bool is True


def test_construct_quoted_triple_template(star_store):
    """CONSTRUCT template quoted triples with variables build terms at
    runtime (TRIPLE() semantics, SPARQL 1.2 §16.2)."""
    store, _ = star_store
    df = store.query("""
        CONSTRUCT { << ?s <urn:p> ?v >> <urn:said> <urn:doc1> }
        WHERE { ?s <urn:p> ?v }""")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].s.kind == T.KIND_TRIPLE
    assert rows[0].s.lex == f'<urn:a> <urn:p> "42"^^<{XSD_INT}>'


def test_insert_delete_quoted_triple_template(star_store):
    """INSERT templates instantiate quoted triples from bindings; DELETE
    WHERE with a quoted-triple pattern lowers to accessor constraints."""
    store, _ = star_store
    st = store.update("""
        INSERT { << ?s <urn:p> ?v >> <urn:src> <urn:doc2> }
        WHERE { ?s <urn:p> ?v }""")
    got = st.query("SELECT ?t WHERE { ?t <urn:src> <urn:doc2> }").collect()
    assert len(got) == 1 and got[0].t.kind == T.KIND_TRIPLE
    st2 = st.update("DELETE WHERE { << ?s <urn:p> ?v >> <urn:src> <urn:doc2> }")
    assert st2.query("SELECT ?t WHERE { ?t <urn:src> ?x }").count() == 0


def test_annotation_syntax(spark):
    """SPARQL-star annotation sugar: `s p o {| q v |}` asserts the base
    triple AND statements about << s p o >>, in data and patterns."""
    from tests.test_semantics import quads_store
    st = quads_store(spark, [])
    st = st.update("""
        PREFIX ex: <urn:ex:>
        INSERT DATA { ex:a ex:score 7 {| ex:cert 0.9 ; ex:src ex:d1 |} .
                      ex:b ex:score 5 . }""")
    # base triples both asserted
    assert st.query("PREFIX ex: <urn:ex:> "
                    "SELECT ?s WHERE { ?s ex:score ?v }").count() == 2
    # annotation matches via sugar and via explicit quoted triple
    rows = st.query("""
        PREFIX ex: <urn:ex:>
        SELECT ?s ?c WHERE { ?s ex:score ?v {| ex:cert ?c |} }""").collect()
    assert [(r["s"]["lex"], r["c"]["lex"]) for r in rows] \
        == [("urn:ex:a", "0.9")]
    src = st.query("""
        PREFIX ex: <urn:ex:>
        SELECT ?x WHERE { << ex:a ex:score 7 >> ex:src ?x }""").collect()
    assert [r["x"]["lex"] for r in src] == ["urn:ex:d1"]


def test_annotation_on_path_rejected(spark):
    from oxigraph_spark.algebra.parser import ParseError, parse_query
    import pytest as _pytest
    with _pytest.raises(ParseError):
        parse_query("""
            PREFIX ex: <urn:ex:>
            SELECT ?o WHERE { ?s ex:p/ex:q ?o {| ex:c 1 |} }""")
