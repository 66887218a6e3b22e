"""I/O layer tests: N-Triples roundtrip, quad store, results formats,
RDF I/O facade, SERVICE handler."""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from oxigraph_spark.algebra import ast as A
from oxigraph_spark.model import terms as T
from oxigraph_spark.sources.ntriples import read_ntriples, write_ntriples
from oxigraph_spark.sources.quad_store import ParquetQuadStore
from oxigraph_spark.sources import results_io, rdf_io
from oxigraph_spark.store import Store

NT = """\
<urn:ex:a> <urn:ex:p> <urn:ex:b> .
<urn:ex:a> <urn:ex:name> "Alice" .
<urn:ex:a> <urn:ex:note> "multi\\nline\\t\\"quoted\\"" .
<urn:ex:a> <urn:ex:age> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
<urn:ex:a> <urn:ex:label> "bonjour"@fr .
_:b1 <urn:ex:p> <urn:ex:a> .
# a comment line

"""


@pytest.fixture(scope="module")
def nt_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("nt") / "data.nt"
    p.write_text(NT)
    return str(p)


def test_ntriples_read(spark, nt_path):
    df = read_ntriples(spark, nt_path)
    rows = df.collect()
    assert len(rows) == 6  # comment/blank lines skipped
    by_pred = {r.p.lex: r for r in rows}
    assert by_pred["urn:ex:name"].o.lex == "Alice"
    assert by_pred["urn:ex:note"].o.lex == 'multi\nline\t"quoted"'
    assert by_pred["urn:ex:age"].o.num == 42
    assert by_pred["urn:ex:label"].o.lang == "fr"
    assert by_pred["urn:ex:p"] is not None


def test_ntriples_unescape_edge_cases(spark, tmp_path):
    """Escape decoding: adjacent backslashes (the escaped-backslash-then-t
    corruption class), \\uXXXX incl. surrogate pairs, \\UXXXXXXXX."""
    BS = chr(92)
    values = [
        (0, BS + BS + "t", BS + "t"),            # \\t → backslash + 't'
        (1, BS + BS + BS + "t", BS + "\t"),      # \\\t → backslash + TAB
        (2, BS + BS + BS + BS + "n", BS + BS + "n"),
        (3, BS + "u00E9", chr(0xE9)),
        (4, BS + "uD83D" + BS + "uDE00", chr(0x1F600)),   # surrogate pair
        (5, BS + "U0001F914", chr(0x1F914)),
        (6, BS + BS + "u0041", BS + "u0041"),    # escaped \, not an escape
    ]
    lines = "\n".join(
        f'<urn:ex:s{i}> <urn:ex:v> "{raw}" .' for i, raw, _ in values)
    p = tmp_path / "esc.nt"
    p.write_text(lines)
    df = read_ntriples(spark, str(p))
    got = {r.s.lex: r.o.lex for r in df.collect()}
    for i, _, want in values:
        assert got[f"urn:ex:s{i}"] == want, (i, repr(got[f"urn:ex:s{i}"]),
                                             repr(want))
    # writer roundtrip through the same edge cases
    out = str(tmp_path / "esc_out")
    write_ntriples(df, out)
    again = {r.s.lex: r.o.lex
             for r in read_ntriples(spark, out + "/*.txt").collect()}
    assert again == got


def test_ntriples_roundtrip(spark, nt_path, tmp_path):
    df = read_ntriples(spark, nt_path)
    out = str(tmp_path / "out_nt")
    write_ntriples(df, out)
    again = read_ntriples(spark, out + "/*.txt")
    k1 = sorted(map(str, df.select(T.term_key(df["s"]).alias("a"),
                                   T.term_key(df["p"]).alias("b"),
                                   T.term_key(df["o"]).alias("c")).collect()))
    k2 = sorted(map(str, again.select(T.term_key(again["s"]).alias("a"),
                                      T.term_key(again["p"]).alias("b"),
                                      T.term_key(again["o"]).alias("c")).collect()))
    assert k1 == k2


def test_quad_store_roundtrip_and_pruning(spark, nt_path, tmp_path):
    df = read_ntriples(spark, nt_path)
    path = str(tmp_path / "qstore")
    ParquetQuadStore.write(df, path)
    store = ParquetQuadStore(spark, path)
    assert store.quads().count() == 6
    one = store.scan("urn:ex:name")
    assert one.count() == 1
    # partition pruning visible in the plan
    plan = one._jdf.queryExecution().executedPlan().treeString()
    part_filters = plan.split("PartitionFilters: [", 1)[1]
    assert part_filters.split("]")[0].find("p_part") >= 0


def test_sparql_over_loaded_ntriples(spark, nt_path):
    from oxigraph_spark.operators.update import MutableQuadSource
    quads = read_ntriples(spark, nt_path)
    store = Store(spark, MutableQuadSource(spark, quads))
    df = store.query(
        "SELECT ?n WHERE { <urn:ex:a> <urn:ex:name> ?n }")
    assert [r.n.lex for r in df.collect()] == ["Alice"]


def test_results_formats(spark, nt_path):
    from oxigraph_spark.operators.update import MutableQuadSource
    quads = read_ntriples(spark, nt_path)
    store = Store(spark, MutableQuadSource(spark, quads))
    df = store.query(
        "SELECT ?n ?l WHERE { <urn:ex:a> <urn:ex:name> ?n . "
        "OPTIONAL { <urn:ex:a> <urn:ex:label> ?l } }")
    doc = results_io.to_json_document(df)
    parsed = results_io.parse_json_results(doc)
    assert parsed[0]["n"] == {"type": "literal", "value": "Alice"}
    assert parsed[0]["l"] == {"type": "literal", "value": "bonjour",
                              "xml:lang": "fr"}
    xml = results_io.to_xml_document(df)
    assert '<literal xml:lang="fr">bonjour</literal>' in xml
    tsv = df.select(results_io.tsv_cell(df["n"]).alias("n")).collect()
    assert tsv[0].n == '"Alice"'


def test_results_roundtrip_all_formats(spark, nt_path, tmp_path):
    """Write→parse→compare for all four result formats (upstream
    sparesults round-trips every format it writes; S8 parity).  JSON and
    XML parse to identical binding dicts; TSV round-trips term structure
    (lang tags, datatypes, IRIs); CSV is lossy by spec (plain lexical
    forms) but must preserve values and unbound cells."""
    import glob
    from oxigraph_spark.operators.update import MutableQuadSource
    quads = read_ntriples(spark, nt_path)
    store = Store(spark, MutableQuadSource(spark, quads))
    df = store.query(
        "SELECT ?s ?n ?l WHERE { ?s <urn:ex:name> ?n . "
        "OPTIONAL { ?s <urn:ex:label> ?l } } ORDER BY ?n")
    expect = results_io.parse_json_results(results_io.to_json_document(df))
    assert len(expect) > 0 and expect[0]["s"]["type"] == "uri"

    got_xml = results_io.parse_xml_results(results_io.to_xml_document(df))
    assert got_xml == expect

    tsv_dir = str(tmp_path / "r.tsv.d")
    results_io.write_tsv(df, tsv_dir)
    got_tsv = []
    for part in sorted(glob.glob(tsv_dir + "/part-*")):
        if part.endswith(".crc"):
            continue
        got_tsv += results_io.parse_tsv_results(
            open(part, encoding="utf-8").read())
    keyf = lambda b: json.dumps(b, sort_keys=True)
    assert sorted(map(keyf, got_tsv)) == sorted(map(keyf, expect))

    csv_dir = str(tmp_path / "r.csv.d")
    results_io.write_csv(df, csv_dir)
    got_csv = []
    for part in sorted(glob.glob(csv_dir + "/part-*")):
        if part.endswith(".crc"):
            continue
        got_csv += results_io.parse_csv_results(
            open(part, encoding="utf-8").read())
    lossy = sorted(
        json.dumps({k: v["value"] for k, v in b.items()}, sort_keys=True)
        for b in expect)
    assert sorted(
        json.dumps({k: v["value"] for k, v in b.items()}, sort_keys=True)
        for b in got_csv) == lossy


def test_turtle_small_reader(spark, tmp_path):
    ttl = tmp_path / "d.ttl"
    ttl.write_text("""
@prefix ex: <urn:ex:> .
ex:a a ex:Person ; ex:name "Alice" , "Alicia" .
ex:b ex:knows ex:a .
""")
    df = rdf_io.load_rdf(spark, str(ttl), "turtle")
    assert df.count() == 4
    types = df.where(F.col("p.lex") == rdf_io.T.RDF + "type").count()
    assert types == 1


def test_turtle_to_ntriples_distributed(spark, tmp_path):
    """Directory of Turtle files → N-Triples via mapInPandas (one task
    per file), then line-parallel N-Triples read matches."""
    d = tmp_path / "ttls"
    d.mkdir()
    (d / "a.ttl").write_text("""
@prefix ex: <urn:ex:> .
ex:a a ex:Person ; ex:name "Ali\\"ce" .
""")
    (d / "b.ttl").write_text("""
@prefix ex: <urn:ex:> .
ex:b ex:knows ex:a ; ex:age 42 .
""")
    out = str(tmp_path / "nt_out")
    rdf_io.turtle_to_ntriples(spark, str(d), out)
    quads = rdf_io.load_rdf(spark, out + "/*.txt", "ntriples")
    rows = quads.collect()
    assert len(rows) == 4
    by_pred = {}
    for r in rows:
        by_pred.setdefault(r.p.lex, []).append(r)
    assert by_pred["urn:ex:name"][0].o.lex == 'Ali"ce'
    assert by_pred["urn:ex:age"][0].o.num == 42


def test_service_handler(spark, nt_path):
    from oxigraph_spark.operators.update import MutableQuadSource
    from oxigraph_spark.plans.compiler import Compiler
    quads = read_ntriples(spark, nt_path)
    store = Store(spark, MutableQuadSource(spark, quads))

    def handler(sp, pattern):
        return sp.createDataFrame(
            [((2, "remote", T.XSD_STRING, None, None, None, None, None,
               None),)], "x struct<kind:tinyint,lex:string,datatype:string,"
            "lang:string,num:decimal(38,18),dbl:double,ts:timestamp,"
            "tz_min:smallint,bool:boolean>")

    Compiler.register_service_handler("urn:svc:test", handler)
    df = store.query("""
        SELECT ?n ?x WHERE {
          <urn:ex:a> <urn:ex:name> ?n .
          SERVICE <urn:svc:test> { ?y <urn:p> ?x }
        }""")
    rows = df.collect()
    assert len(rows) == 1 and rows[0].x.lex == "remote"
    # SILENT + unregistered endpoint → empty solution, query still works
    df2 = store.query("""
        SELECT ?n WHERE {
          <urn:ex:a> <urn:ex:name> ?n .
          SERVICE SILENT <urn:svc:missing> { ?y <urn:p> ?x }
        }""")
    assert df2.count() == 1
    # don't leak the handler into later tests (SERVICE ?var ranges over
    # the registered set, so a leftover registration changes results)
    Compiler.SERVICE_HANDLERS.pop("urn:svc:test", None)


def test_variable_service_target(spark, nt_path):
    """SERVICE ?endpoint ranges over registered endpoints, binding the
    variable to each endpoint IRI."""
    from oxigraph_spark.operators.update import MutableQuadSource
    from oxigraph_spark.plans.compiler import Compiler
    quads = read_ntriples(spark, nt_path)
    store = Store(spark, MutableQuadSource(spark, quads))

    def mk_handler(val):
        def handler(sp, pattern):
            return sp.createDataFrame(
                [((2, val, T.XSD_STRING, None, None, None, None, None,
                   None),)], "x struct<kind:tinyint,lex:string,"
                "datatype:string,lang:string,num:decimal(38,18),dbl:double,"
                "ts:timestamp,tz_min:smallint,bool:boolean>")
        return handler

    Compiler.register_service_handler("urn:svc:v1", mk_handler("r1"))
    Compiler.register_service_handler("urn:svc:v2", mk_handler("r2"))
    try:
        df = store.query("""
            SELECT ?svc ?x WHERE { SERVICE ?svc { ?y <urn:p> ?x } }""")
        got = sorted((r.svc.lex, r.x.lex) for r in df.collect()
                     if r.svc.lex.startswith("urn:svc:v"))
        assert got == [("urn:svc:v1", "r1"), ("urn:svc:v2", "r2")]
    finally:
        Compiler.SERVICE_HANDLERS.pop("urn:svc:v1", None)
        Compiler.SERVICE_HANDLERS.pop("urn:svc:v2", None)


def test_update_load_file(spark, nt_path, tmp_path):
    """LOAD <file://…> [INTO GRAPH g] reads a document distributedly."""
    from oxigraph_spark.operators.update import MutableQuadSource
    quads = read_ntriples(spark, nt_path)
    store = Store(spark, MutableQuadSource(spark, quads))
    extra = tmp_path / "extra.nt"
    extra.write_text('<urn:new:s> <urn:new:p> "loaded" .\n')
    st2 = store.update(f"LOAD <file://{extra}> INTO GRAPH <urn:g:ld>")
    df = st2.query("""
        SELECT ?o WHERE { GRAPH <urn:g:ld> { ?s <urn:new:p> ?o } }""")
    rows = df.collect()
    assert len(rows) == 1 and rows[0].o.lex == "loaded"
    # SILENT failure is a no-op; non-SILENT missing file raises
    st3 = store.update("LOAD SILENT <file:///nonexistent/x.nt>")
    assert st3.query("ASK { ?s ?p ?o }").count() >= 0
    import pytest as _pytest
    with _pytest.raises(Exception):
        store.update("LOAD <http://example.org/x.nt>")


def test_dictionary_encode_roundtrip(spark, nt_path):
    from oxigraph_spark.sources.dictionary import encode, decode
    quads = read_ntriples(spark, nt_path)
    terms, ids = encode(quads)
    assert terms.count() == terms.select("id").distinct().count()
    back = decode(ids, terms)
    k = lambda df: sorted(map(str, df.select(
        T.term_key(df["s"]).alias("a"), T.term_key(df["p"]).alias("b"),
        T.term_key(df["o"]).alias("c")).collect()))
    assert k(back) == k(quads)


def test_quad_store_persisted_dictionary_keys(spark, nt_path, tmp_path):
    """write(with_keys=True) persists 128-bit dictionary ids per position
    (SURVEY.md §1.4): scans serve them, they agree with a fresh
    join_key computation, and a self-join query over the store uses them
    instead of re-hashing terms (zero xxhash64 in the optimized plan)."""
    df = read_ntriples(spark, nt_path)
    path = str(tmp_path / "qstore_keys")
    ParquetQuadStore.write(df, path, key_width=128)
    store = ParquetQuadStore(spark, path, key_width=128)
    scan = store.scan("urn:ex:name")
    assert {"s_key", "p_key", "o_key", "g_key"} <= set(scan.columns)
    ok = scan.select(
        (scan["s_key"] == T.join_key(scan["s"])).alias("s_ok"),
        (scan["o_key"] == T.join_key(scan["o"])).alias("o_ok")).collect()
    assert all(r.s_ok and r.o_ok for r in ok)
    # quads() stays plain (update/export schema)
    assert store.quads().columns == ["s", "p", "o", "g"]

    st = Store(spark, store)
    q = st.query("""SELECT ?u ?w WHERE {
        ?u <urn:ex:p> ?v . ?v <urn:ex:p> ?w . }""")
    assert [(r.u.lex, r.w.lex) for r in q.collect()] == [("b1", "urn:ex:b")]
    plan = q._jdf.queryExecution().optimizedPlan().toString()
    assert "xxhash64" not in plan  # join keys come straight from parquet


# -- HTTP SERVICE (SPARQL-Protocol client, round 4) -------------------------

def _start_sparql_endpoint(responses):
    """In-process SPARQL-Protocol endpoint speaking the same wire format
    the reference's HTTP client consumes; captures request bodies."""
    import http.server
    import threading

    captured = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", "0"))
            captured.append({
                "body": self.rfile.read(n).decode("utf-8"),
                "ctype": self.headers.get("Content-Type"),
                "accept": self.headers.get("Accept"),
            })
            ctype, doc = responses[min(len(captured) - 1,
                                       len(responses) - 1)]
            data = doc.encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, captured


def test_http_service_end_to_end_json(spark, nt_path):
    """SERVICE <http://…> with no registered handler dials the default
    SPARQL-Protocol client: POSTs `application/sparql-query` built from
    the PREFIXed verbatim inner group, parses the results-JSON response,
    and joins the remote solutions into the local pattern."""
    import json as _json
    from oxigraph_spark.operators.update import MutableQuadSource
    quads = read_ntriples(spark, nt_path)
    store = Store(spark, MutableQuadSource(spark, quads))
    doc = _json.dumps({
        "head": {"vars": ["n", "pop"]},
        "results": {"bindings": [
            {"n": {"type": "literal", "value": "Alice"},
             "pop": {"type": "literal", "value": "12",
                     "datatype": "http://www.w3.org/2001/XMLSchema#integer"}},
            {"n": {"type": "literal", "value": "nobody"},
             "pop": {"type": "literal", "value": "7",
                     "datatype": "http://www.w3.org/2001/XMLSchema#integer"}},
        ]},
    })
    srv, captured = _start_sparql_endpoint(
        [("application/sparql-results+json", doc)])
    try:
        ep = f"http://127.0.0.1:{srv.server_address[1]}/sparql"
        df = store.query(f"""
            PREFIX ex: <urn:ex:>
            SELECT ?n ?pop WHERE {{
              <urn:ex:a> <urn:ex:name> ?n .
              SERVICE <{ep}> {{ ?city ex:name ?n ; ex:pop ?pop }}
            }}""")
        rows = df.collect()
        # local store binds ?n = "Alice" only -> join keeps that row
        assert len(rows) == 1
        assert rows[0].n.lex == "Alice" and rows[0].pop.lex == "12"
        assert rows[0].pop.num == 12
        # the endpoint received a well-formed SELECT-star protocol query
        # carrying the local join partner's bindings as a bind-join seed
        body = captured[0]["body"]
        assert captured[0]["ctype"] == "application/sparql-query"
        assert body.startswith("PREFIX ex: <urn:ex:>")
        assert ('SELECT * WHERE { VALUES (?n) { ("Alice") } '
                "{ ?city ex:name ?n ; ex:pop ?pop } }") in body
    finally:
        srv.shutdown()


def test_http_service_xml_fallback_and_silent(spark, nt_path):
    """XML results responses parse through the same client; SILENT
    swallows a dead endpoint into a single empty solution."""
    from oxigraph_spark.operators.update import MutableQuadSource
    quads = read_ntriples(spark, nt_path)
    store = Store(spark, MutableQuadSource(spark, quads))
    xml = """<?xml version="1.0"?>
<sparql xmlns="http://www.w3.org/2005/sparql-results#">
  <head><variable name="x"/></head>
  <results>
    <result><binding name="x"><uri>urn:ex:r1</uri></binding></result>
    <result><binding name="x">
      <literal xml:lang="en">hi</literal></binding></result>
  </results>
</sparql>"""
    srv, _ = _start_sparql_endpoint(
        [("application/sparql-results+xml", xml)])
    try:
        ep = f"http://127.0.0.1:{srv.server_address[1]}/q"
        df = store.query(
            f"SELECT ?x WHERE {{ SERVICE <{ep}> {{ ?s <urn:p> ?x }} }}")
        got = sorted((r.x.kind, r.x.lex, r.x.lang) for r in df.collect())
        assert got == [(0, "urn:ex:r1", None), (2, "hi", "en")]
    finally:
        srv.shutdown()
    # dead endpoint (closed server), SILENT -> one empty solution
    df2 = store.query(f"""
        SELECT ?n WHERE {{
          <urn:ex:a> <urn:ex:name> ?n .
          SERVICE SILENT <http://127.0.0.1:1/unreachable> {{ ?s <urn:p> ?x }}
        }}""")
    assert df2.count() == 1


def test_update_load_http(spark, nt_path):
    """LOAD <http://…> fetches the document from an HTTP endpoint
    (loopback), picks the parser from Content-Type, and merges into the
    target graph; SILENT swallows a dead endpoint."""
    import http.server
    import threading
    from oxigraph_spark.operators.update import MutableQuadSource
    nt_doc = "<urn:ex:r1> <urn:ex:p> \"remote\" .\n"

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            b = nt_doc.encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/n-triples")
            self.send_header("Content-Length", str(len(b)))
            self.end_headers()
            self.wfile.write(b)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/doc"
        quads = read_ntriples(spark, nt_path)
        store = Store(spark, MutableQuadSource(spark, quads))
        st2 = store.update(f"LOAD <{url}> INTO GRAPH <urn:g:remote>")
        rows = st2.query("""
            SELECT ?o WHERE { GRAPH <urn:g:remote> {
              <urn:ex:r1> <urn:ex:p> ?o } }""").collect()
        assert len(rows) == 1 and rows[0].o.lex == "remote"
    finally:
        srv.shutdown()
    # dead endpoint: plain LOAD raises, SILENT is a no-op
    import pytest as _pytest
    with _pytest.raises(Exception):
        store.update("LOAD <http://127.0.0.1:1/x>")
    st3 = store.update("LOAD SILENT <http://127.0.0.1:1/x>")
    assert st3.query("SELECT ?s WHERE { ?s ?p ?o }").count() \
        == store.query("SELECT ?s WHERE { ?s ?p ?o }").count()


def test_http_service_tsv_fallback(spark, nt_path):
    """A TSV results response parses through the SERVICE client."""
    from oxigraph_spark.operators.update import MutableQuadSource
    quads = read_ntriples(spark, nt_path)
    store = Store(spark, MutableQuadSource(spark, quads))
    tsv = "?x\n<urn:ex:r1>\n\"42\"^^<http://www.w3.org/2001/XMLSchema#integer>\n"
    srv, _ = _start_sparql_endpoint([("text/tab-separated-values", tsv)])
    try:
        ep = f"http://127.0.0.1:{srv.server_address[1]}/q"
        df = store.query(
            f"SELECT ?x WHERE {{ SERVICE <{ep}> {{ ?s <urn:p> ?x }} }}")
        got = sorted((r.x.kind, r.x.lex) for r in df.collect())
        assert got == [(0, "urn:ex:r1"), (2, "42")]
    finally:
        srv.shutdown()


def test_results_rdfstar_triple_terms(spark):
    """SPARQL 1.2 quoted-triple bindings round-trip through the results
    JSON/XML/TSV document forms (reference: sparesults' RDF-star
    support; json {"type":"triple","value":{subject,predicate,object}},
    xml <triple><subject>..., tsv << ... >> tokens)."""
    from oxigraph_spark.operators.update import MutableQuadSource
    from oxigraph_spark.sources.rdf_io import load_rdf
    from oxigraph_spark.store import Store
    import os
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "w3c_mini")
    st = Store(spark, MutableQuadSource(
        spark, load_rdf(spark, os.path.join(here, "data-star.ttl"))))
    df = st.query("""
        PREFIX : <http://example/>
        SELECT ?t ?c WHERE { ?t :certainty ?c . FILTER(?c > 0.5) }
    """)
    doc = results_io.to_json_document(df)
    parsed = results_io.parse_json_results(doc)
    assert len(parsed) == 1
    t = parsed[0]["t"]
    assert t["type"] == "triple"
    assert t["value"]["subject"] == {"type": "uri",
                                     "value": "http://example/bob"}
    assert t["value"]["predicate"] == {"type": "uri",
                                       "value": "http://example/age"}
    assert t["value"]["object"]["value"] == "23"

    xml_doc = results_io.to_xml_document(df)
    px = results_io.parse_xml_results(xml_doc)
    assert px[0]["t"]["value"]["subject"]["value"] == "http://example/bob"

    tsv_doc = results_io.to_tsv_document(df)
    pt = results_io.parse_tsv_results(tsv_doc)
    assert pt[0]["t"]["type"] == "triple"
    assert pt[0]["t"]["value"]["object"]["value"] == "23"

    # nested quoted triple: << << s p o >> cert 0.9 >> src doc1
    df2 = st.query("""
        PREFIX : <http://example/>
        SELECT ?t WHERE { ?t :src :doc1 }
    """)
    p2 = results_io.parse_json_results(results_io.to_json_document(df2))
    inner = p2[0]["t"]["value"]["subject"]
    assert inner["type"] == "triple"
    assert inner["value"]["subject"]["value"] == "http://example/bob"


def test_json_rows_distributed_rdfstar_nested(spark):
    """ADVICE r6: the DISTRIBUTED SRJ writer (json_rows) must emit the
    SPARQL 1.2 nested {"type":"triple","value":{subject,predicate,
    object}} object for quoted-triple bindings — same shape as the
    bounded to_json_document path — while plain rows keep the pure
    column-expression fast path."""
    from oxigraph_spark.operators.update import MutableQuadSource
    from oxigraph_spark.sources.rdf_io import load_rdf
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "w3c_mini")
    st = Store(spark, MutableQuadSource(
        spark, load_rdf(spark, os.path.join(here, "data-star.ttl"))))
    df = st.query("""
        PREFIX : <http://example/>
        SELECT ?t ?c WHERE { ?t :certainty ?c }
    """)
    lines = [json.loads(r["json"])
             for r in results_io.json_rows(df).collect()]
    tri = [l for l in lines if l.get("t", {}).get("type") == "triple"]
    assert tri, f"no triple bindings in {lines}"
    for l in tri:
        v = l["t"]["value"]
        assert isinstance(v, dict), "flat-string triple value in SRJ"
        assert set(v) == {"subject", "predicate", "object"}
    # plain (non-triple) rows still format
    df2 = st.query("""
        PREFIX : <http://example/>
        SELECT ?s WHERE { ?s :src :doc1 }
    """)
    lines2 = [json.loads(r["json"])
              for r in results_io.json_rows(df2).collect()]
    assert lines2
    # nested quoted triple nests recursively
    deep = [l for l in lines2
            if l.get("s", {}).get("type") == "triple"]
    for l in deep:
        inner = l["s"]["value"]["subject"]
        if inner["type"] == "triple":
            assert isinstance(inner["value"], dict)


@pytest.mark.slow
def test_results_roundtrip_fuzz(spark):
    """VERDICT r6 item 1: seeded random solution sets — IRIs, bnodes,
    plain/lang/typed literals with hostile lexical forms (quotes,
    newlines, tabs, unicode), unbound cells, nested quoted triples —
    serialized to JSON, XML and TSV document forms PLUS the distributed
    SRJ writer, parsed back, and compared as normalized multisets.  Any
    format pair disagreeing (escaping, nesting, term typing) fails."""
    import random

    from oxigraph_spark.plans.compiler import _term_to_py
    from oxigraph_spark.algebra import ast as A
    from pyspark.sql.types import StructField, StructType
    import test_manifest as tm

    XSD = "http://www.w3.org/2001/XMLSchema#"
    LEXES = ["plain", 'quo"te', "new\nline", "tab\there", "back\\slash",
             "uni·codé ≤ ∀", "", "  spaced  ", "a'b", "<not-an-iri>"]

    def rand_term(rng, depth=0):
        k = rng.randrange(0, 9 if depth == 0 else 8)
        if k in (0, 1):
            return A.NamedNode(f"http://ex.org/r{rng.randrange(20)}")
        if k == 2:
            return A.BlankNode(f"b{rng.randrange(8)}")
        if k == 3:
            return A.Literal(str(rng.randrange(-999, 999)),
                             datatype=XSD + "integer")
        if k == 4:
            return A.Literal(rng.choice(LEXES),
                             lang=rng.choice(["en", "en-US", "de"]))
        if k == 5:
            return A.Literal(rng.choice(LEXES), datatype="urn:my:dt")
        if k in (6, 7):
            return A.Literal(rng.choice(LEXES))
        return A.QuotedTriple(
            rand_term(rng, depth + 1),
            A.NamedNode(f"http://ex.org/p{rng.randrange(5)}"),
            rand_term(rng, depth + 1))

    variables = ["a", "b", "c"]
    schema = StructType([StructField(v, T.TERM_SCHEMA) for v in variables])
    for seed in range(5):
        rng = random.Random(seed)
        rows = [tuple(None if rng.random() < 0.15
                      else _term_to_py(rand_term(rng))
                      for _ in variables) for _ in range(25)]
        df = spark.createDataFrame(rows, schema)

        ms = {}
        ms["json"] = tm._solution_multiset(
            results_io.parse_json_results(results_io.to_json_document(df)),
            variables)
        ms["xml"] = tm._solution_multiset(
            results_io.parse_xml_results(results_io.to_xml_document(df)),
            variables)
        ms["tsv"] = tm._solution_multiset(
            results_io.parse_tsv_results(results_io.to_tsv_document(df)),
            variables)
        dist = [json.loads(r["json"])
                for r in results_io.json_rows(df).collect()]
        ms["srj_distributed"] = tm._solution_multiset(dist, variables)
        base = ms.pop("json")
        for fmt, got in ms.items():
            assert got == base, (
                f"seed {seed}: {fmt} multiset diverges from json\n"
                f"json: {base[:3]}...\n{fmt}: {got[:3]}...")


def test_ntriples_strict_rejects_malformed(spark, tmp_path):
    """Round-7: the distributed N-Triples reader is STRICT by default —
    a malformed line fails the read (silent dropping at 100 TB is data
    loss); round-8 FUSED the check into the parse itself (raise_error
    in-pass, zero extra scans), so the error surfaces lazily when the
    frame is computed.  lenient=True restores the drop-malformed path;
    comments and blank lines are fine in both modes."""
    p = tmp_path / "mixed.nt"
    p.write_text('# comment\n\n<urn:s> <urn:p> "ok" .\n'
                 '"literal subject" <urn:p> <urn:o> .\n')
    with pytest.raises(Exception, match="malformed"):
        read_ntriples(spark, str(p)).collect()
    rows = read_ntriples(spark, str(p), lenient=True).collect()
    assert len(rows) == 1 and rows[0].o.lex == "ok"
    good = tmp_path / "good.nt"
    good.write_text('# only good lines\n<urn:s> <urn:p> "ok" .\n')
    assert read_ntriples(spark, str(good)).count() == 1


def test_ntriples_single_scan_strict(spark, tmp_path):
    """The strict reader's plan reads the text exactly ONCE — validation
    is fused into the parse projection, not a separate pre-pass (at
    100 TB a second validation scan doubles I/O with a cold OS cache)."""
    p = tmp_path / "one.nt"
    p.write_text('<urn:s> <urn:p> "ok" .\n')
    df = read_ntriples(spark, str(p))
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re
    scans = len(re.findall(r"FileScan text|Scan text", plan))
    assert scans == 1, f"expected one text scan, plan:\n{plan}"


def test_ntriples_deep_rdfstar_any_depth(spark, tmp_path):
    """Quoted triples nested DEEPER than the bounded line regex
    (QT_DEPTH=4) parse in strict mode via the exact char-scan tokenizer,
    in subject and object position, with N-Quads graph labels — and the
    resulting lex is IDENTICAL to what a TRIPLE() constructor tower
    produces (canonical spacing at any depth)."""
    deep = ("<< << << << << <urn:a> <urn:b> <urn:c> >> <urn:p1> <urn:o1> "
            ">> <urn:p2> <urn:o2> >> <urn:p3> <urn:o3> >> <urn:p4> "
            "<urn:o4> >>")
    p = tmp_path / "deep.nq"
    p.write_text(f'{deep} <urn:p> "v" <urn:g> .\n'
                 f'<urn:x> <urn:y> {deep} .\n')
    rows = read_ntriples(spark, str(p), quads=True).collect()
    assert len(rows) == 2
    by_pred = {r.p.lex: r for r in rows}
    subj = by_pred["urn:p"].s
    obj = by_pred["urn:y"].o
    assert subj.kind == obj.kind and subj.lex == obj.lex
    assert by_pred["urn:p"].g.lex == "urn:g"
    # constructor tower must produce the same lex (identity across
    # reader- and TRIPLE()-built deep terms)
    from pyspark.sql import functions as F
    from oxigraph_spark.functions.rdfstar import fn_triple
    from oxigraph_spark.model import terms as T
    t = fn_triple(T.iri(F.lit("urn:a")), T.iri(F.lit("urn:b")),
                  T.iri(F.lit("urn:c")))
    for i in (1, 2, 3, 4):
        t = fn_triple(t, T.iri(F.lit(f"urn:p{i}")),
                      T.iri(F.lit(f"urn:o{i}")))
    built = spark.range(1).select(t.alias("t")).collect()[0].t
    assert built.lex == subj.lex


def test_results_parser_negatives():
    """Round-8 (r7 verdict item 1): the results-format PARSERS reject
    malformed documents instead of silently mis-reading them — truncated
    SRJ, non-results JSON, bad TSV escapes, unterminated TSV literals,
    malformed IRI tokens, and row-arity mismatches."""
    from oxigraph_spark.sources import results_io as R
    import json as _json
    with pytest.raises(_json.JSONDecodeError):
        R.parse_json_results('{"head":{"vars":["x"]},"results":{"bind')
    with pytest.raises(ValueError, match="results.bindings"):
        R.parse_json_results('{"head":{"vars":["x"]}}')
    with pytest.raises(ValueError, match="results.bindings"):
        R.parse_json_results('{"results":{"bindings":{"not":"alist"}}}')
    with pytest.raises(ValueError, match="escape"):
        R.parse_tsv_results('?x\n"bad\\qescape"')
    with pytest.raises(ValueError, match="literal"):
        R.parse_tsv_results('?x\n"unterminated')
    with pytest.raises(ValueError, match="literal"):
        R.parse_tsv_results('?x\n"lit"garbage')
    with pytest.raises(ValueError, match="IRI"):
        R.parse_tsv_results('?x\n<urn:unclosed')
    with pytest.raises(ValueError, match="arity"):
        R.parse_tsv_results('?x\t?y\n<urn:a>\t<urn:b>\t<urn:c>')
    # legal docs still parse: escapes, lang, typed, shorthand, unbound
    rows = R.parse_tsv_results(
        '?x\t?y\n"a\\tb"@en\t<urn:ok>\n42\t\n"t\\"q"^^<urn:dt>\t_:b0')
    assert rows[0]["x"] == {"type": "literal", "value": "a\tb",
                            "xml:lang": "en"}
    assert rows[1]["x"]["value"] == "42" and "y" not in rows[1]
    assert rows[2]["x"] == {"type": "literal", "value": 't"q',
                            "datatype": "urn:dt"}
    assert rows[2]["y"] == {"type": "bnode", "value": "b0"}
