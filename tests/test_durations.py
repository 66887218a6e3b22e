"""xsd:duration / yearMonthDuration / dayTimeDuration: literals,
value equality, ordering, dateTime arithmetic (SURVEY.md §1.2;
reference: lib/oxsdatatypes/src/duration.rs)."""

import pytest

from oxigraph_spark.operators.update import MutableQuadSource
from oxigraph_spark.sources.ntriples import read_ntriples
from oxigraph_spark.store import Store

XSD = "http://www.w3.org/2001/XMLSchema#"

NT = f"""
<urn:e1> <urn:start> "2024-01-10T12:00:00"^^<{XSD}dateTime> .
<urn:e1> <urn:dur> "P1DT2H30M"^^<{XSD}dayTimeDuration> .
<urn:e2> <urn:start> "2024-03-01T00:00:00"^^<{XSD}dateTime> .
<urn:e2> <urn:dur> "P2M"^^<{XSD}yearMonthDuration> .
"""


@pytest.fixture(scope="module")
def dur_store(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("dur") / "dur.nt"
    p.write_text(NT)
    return Store(spark, MutableQuadSource(spark, read_ntriples(spark, str(p))))


def test_datetime_plus_minus_duration(dur_store):
    rows = {r.e.lex: r for r in dur_store.query("""
        SELECT ?e ?end ?back ?diff WHERE {
          ?e <urn:start> ?s ; <urn:dur> ?d .
          BIND(?s + ?d AS ?end)
          BIND(?end - ?d AS ?back)
          BIND(?end - ?s AS ?diff)
        }""").collect()}
    r1, r2 = rows["urn:e1"], rows["urn:e2"]
    assert r1.end.lex == "2024-01-11T14:30:00"
    assert r1.back.lex == "2024-01-10T12:00:00"
    assert r1.diff.lex == "P1DT2H30M"
    assert r1.diff.datatype == XSD + "dayTimeDuration"
    assert r2.end.lex == "2024-05-01T00:00:00"   # calendar month add
    assert r2.diff.lex == "P61D"                  # dateTime diff is dayTime


def test_duration_eq_cmp_and_sum(dur_store):
    r = dur_store.query(f"""
        SELECT ?eq ?cmp ?sum ?bad WHERE {{
          BIND("P1Y"^^<{XSD}duration> = "P12M"^^<{XSD}duration> AS ?eq)
          BIND("P1Y"^^<{XSD}yearMonthDuration>
               < "P13M"^^<{XSD}yearMonthDuration> AS ?cmp)
          BIND("P1DT12H"^^<{XSD}dayTimeDuration>
               + "PT12H"^^<{XSD}dayTimeDuration> AS ?sum)
          BIND("P1Y"^^<{XSD}yearMonthDuration>
               < "P1D"^^<{XSD}dayTimeDuration> AS ?bad)
        }}""").collect()[0]
    assert r.eq.bool is True and r.cmp.bool is True
    assert r.sum.lex == "P2D"
    assert r.bad is None  # cross-family comparison is a type error


def test_duration_payloads_and_cast(dur_store):
    r = dur_store.query(f"""
        SELECT ?c ?neg WHERE {{
          BIND(<{XSD}dayTimeDuration>("PT90M") AS ?c)
          BIND("-P1DT1H"^^<{XSD}dayTimeDuration> AS ?neg)
        }}""").collect()[0]
    assert r.c.lex == "PT90M" and float(r.c.dbl) == 5400.0
    assert float(r.neg.dbl) == -(86400 + 3600)


def test_date_plus_duration_in_filter(spark):
    """Regression: stype_of claimed `+` is always numeric, which
    specialized the enclosing comparison numerically and silently
    dropped every row of `FILTER(?date + duration > date)`."""
    from tests.test_semantics import iri, quads_store
    from oxigraph_spark.algebra import ast as A
    XSD = "http://www.w3.org/2001/XMLSchema#"
    st = quads_store(spark, [
        (iri("a"), iri("d"), A.Literal("2024-03-01", datatype=XSD + "date")),
        (iri("b"), iri("d"), A.Literal("2024-03-15", datatype=XSD + "date")),
    ])
    pfx = "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> "
    q = ('SELECT ?s WHERE { ?s <urn:ex:d> ?v . '
         'FILTER(?v + "P20D"^^xsd:dayTimeDuration > '
         '"2024-03-18"^^xsd:date) }')
    assert st.query(pfx + q).count() == 2
    q2 = ('SELECT ?s WHERE { ?s <urn:ex:d> ?v . '
          'FILTER(?v + "P1D"^^xsd:dayTimeDuration > '
          '"2024-03-10"^^xsd:date) }')
    got = [r["s"]["lex"] for r in st.query(pfx + q2).collect()]
    assert got == ["urn:ex:b"]
    # plain numeric + stays specialized (sanity)
    q3 = ('SELECT ?s WHERE { ?s <urn:ex:d> ?v . '
          'FILTER(1 + 1 = 2) }')
    assert st.query(pfx + q3).count() == 2


def test_xsd_time_ordering(spark):
    """xsd:time values carry an epoch-day ts payload: comparison,
    ORDER BY, and HOURS() work; offsets normalize to UTC."""
    from tests.test_semantics import iri, quads_store
    from oxigraph_spark.algebra import ast as A
    XSD = "http://www.w3.org/2001/XMLSchema#"
    st = quads_store(spark, [
        (iri("a"), iri("t"), A.Literal("09:30:00", datatype=XSD + "time")),
        (iri("b"), iri("t"), A.Literal("18:00:00", datatype=XSD + "time")),
        (iri("c"), iri("t"), A.Literal("23:00:00+11:00",
                                       datatype=XSD + "time")),
    ])
    pfx = "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> "
    got = [r["s"]["lex"] for r in st.query(
        pfx + 'SELECT ?s WHERE { ?s <urn:ex:t> ?v . '
              'FILTER(?v > "12:00:00"^^xsd:time) } ORDER BY ?s').collect()]
    # 23:00+11:00 = 12:00Z -> not strictly greater; only b qualifies
    assert got == ["urn:ex:b"]
    ordered = [r["s"]["lex"] for r in st.query(
        pfx + 'SELECT ?s WHERE { ?s <urn:ex:t> ?v } ORDER BY ?v').collect()]
    assert ordered == ["urn:ex:a", "urn:ex:c", "urn:ex:b"]
    hrs = {r["s"]["lex"]: r["h"]["num"] for r in st.query(
        pfx + 'SELECT ?s (HOURS(?v) AS ?h) WHERE { ?s <urn:ex:t> ?v }'
    ).collect()}
    assert int(hrs["urn:ex:a"]) == 9


def test_gyear_ordering(spark):
    """gYear/gYearMonth order via period-start anchored ts payloads."""
    from tests.test_semantics import iri, quads_store
    from oxigraph_spark.algebra import ast as A
    XSD = "http://www.w3.org/2001/XMLSchema#"
    st = quads_store(spark, [
        (iri("a"), iri("y"), A.Literal("1999", datatype=XSD + "gYear")),
        (iri("b"), iri("y"), A.Literal("2003", datatype=XSD + "gYear")),
        (iri("c"), iri("m"), A.Literal("2003-07",
                                       datatype=XSD + "gYearMonth")),
        (iri("d"), iri("m"), A.Literal("2003-02",
                                       datatype=XSD + "gYearMonth")),
    ])
    pfx = "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> "
    got = [r["s"]["lex"][-1] for r in st.query(
        pfx + 'SELECT ?s WHERE { ?s <urn:ex:y> ?v . '
              'FILTER(?v > "2000"^^xsd:gYear) }').collect()]
    assert got == ["b"]
    months = [r["s"]["lex"][-1] for r in st.query(
        pfx + 'SELECT ?s WHERE { ?s <urn:ex:m> ?v } ORDER BY ?v').collect()]
    assert months == ["d", "c"]


def test_component_accessors_use_lexical_timezone(spark):
    """§17.4.5 YEAR…SECONDS operate on the LEXICAL form, not the
    UTC-normalized value: HOURS("…T14:45:13-05:00") = 14 (not 19);
    cross-day offsets shift DAY/MONTH/YEAR too."""
    from tests.test_semantics import quads_store, iri
    import oxigraph_spark.algebra.ast as A
    from oxigraph_spark.model import terms as T
    dt = lambda lex: A.Literal(lex, datatype=T.XSD_DATETIME)
    st = quads_store(spark, [
        (iri("a"), iri("p"), dt("2011-01-10T14:45:13.815-05:00")),
        (iri("b"), iri("p"), dt("2011-01-10T01:15:00+05:30")),
        (iri("c"), iri("p"), dt("2010-12-31T23:30:00-05:00")),
        (iri("d"), iri("p"), dt("2011-01-10T14:45:13Z")),
        (iri("e"), iri("p"), dt("2011-01-10T14:45:13")),
    ])
    rows = st.query("""
        SELECT ?s (YEAR(?d) AS ?y) (MONTH(?d) AS ?mo) (DAY(?d) AS ?dy)
               (HOURS(?d) AS ?h) (MINUTES(?d) AS ?mi) (SECONDS(?d) AS ?se)
        WHERE { ?s <urn:ex:p> ?d } ORDER BY ?s""").collect()
    got = {r["s"]["lex"][-1]:
           [r[c]["lex"] for c in ("y", "mo", "dy", "h", "mi", "se")]
           for r in rows}
    assert got["a"] == ["2011", "1", "10", "14", "45", "13.815"]
    assert got["b"] == ["2011", "1", "10", "1", "15", "0"]
    assert got["c"] == ["2010", "12", "31", "23", "30", "0"]
    assert got["d"] == ["2011", "1", "10", "14", "45", "13"]
    assert got["e"] == ["2011", "1", "10", "14", "45", "13"]


def test_decimal_zero_and_tiny_canonical_lex(spark):
    """BigDecimal scientific forms never leak into xsd:decimal lexicals:
    zero at scale is "0" (was "0E-18"), tiny magnitudes expand to plain
    notation."""
    from tests.test_semantics import quads_store, iri, lit
    st = quads_store(spark, [(iri("a"), iri("p"), lit("x"))])
    r = st.query(
        'SELECT (1.5-1.5 AS ?z) (0.0-0.0000012 AS ?nt) (2.50+0.25 AS ?d) '
        '(0.0*5 AS ?zm) WHERE {}').collect()[0]
    assert r["z"]["lex"] == "0"
    assert r["nt"]["lex"] == "-0.0000012"
    assert r["d"]["lex"] == "2.75"
    assert r["zm"]["lex"] == "0"
