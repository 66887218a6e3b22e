"""SPARQL-Protocol endpoint tests (round 4, SURVEY §2.1 S11): GET/POST
query with content negotiation, POST update, and closing the federation
loop — this engine's own SERVICE client querying this engine's own
endpoint."""

import json
import urllib.parse
import urllib.request

from oxigraph_spark.server import SparqlEndpoint
from oxigraph_spark.store import Store


def _mk_endpoint(spark):
    from oxigraph_spark.operators.update import MutableQuadSource
    from tests.test_semantics import iri, lit, quads_store
    st = quads_store(spark, [
        (iri("a"), iri("name"), lit("Alice")),
        (iri("b"), iri("name"), lit("Bob")),
        (iri("a"), iri("age"), lit("42", dt="http://www.w3.org/2001/"
                                            "XMLSchema#integer")),
    ])
    ep = SparqlEndpoint(st)
    host, port = ep.start()
    return ep, f"http://{host}:{port}"


def _get(url, accept="application/sparql-results+json"):
    req = urllib.request.Request(url, headers={"Accept": accept})
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.headers.get("Content-Type"), r.read().decode()


def test_protocol_query_forms_and_negotiation(spark):
    ep, base = _mk_endpoint(spark)
    try:
        q = "SELECT ?n WHERE { <urn:ex:a> <urn:ex:name> ?n }"
        # GET + JSON (default)
        ct, body = _get(f"{base}/query?query={urllib.parse.quote(q)}")
        assert ct == "application/sparql-results+json"
        doc = json.loads(body)
        assert doc["results"]["bindings"][0]["n"]["value"] == "Alice"
        # XML negotiation
        ct, body = _get(f"{base}/query?query={urllib.parse.quote(q)}",
                        accept="application/sparql-results+xml")
        assert ct == "application/sparql-results+xml"
        assert "<literal>Alice</literal>" in body
        # TSV + CSV
        ct, body = _get(f"{base}/query?query={urllib.parse.quote(q)}",
                        accept="text/tab-separated-values")
        assert body.splitlines() == ["?n", '"Alice"']
        ct, body = _get(f"{base}/query?query={urllib.parse.quote(q)}",
                        accept="text/csv")
        assert body.split("\r\n")[:2] == ["n", "Alice"]
        # POST raw sparql-query
        req = urllib.request.Request(
            f"{base}/query", data=q.encode(),
            headers={"Content-Type": "application/sparql-query"})
        with urllib.request.urlopen(req, timeout=30) as r:
            assert json.loads(r.read())["results"]["bindings"]
        # ASK both forms
        aq = "ASK { <urn:ex:a> <urn:ex:name> \"Alice\" }"
        _, body = _get(f"{base}/query?query={urllib.parse.quote(aq)}")
        assert json.loads(body)["boolean"] is True
        _, body = _get(f"{base}/query?query={urllib.parse.quote(aq)}",
                       accept="application/sparql-results+xml")
        assert "<boolean>true</boolean>" in body
        # CONSTRUCT -> N-Triples
        cq = ("CONSTRUCT { ?s <urn:ex:n2> ?n } WHERE "
              "{ ?s <urn:ex:name> ?n }")
        ct, body = _get(f"{base}/query?query={urllib.parse.quote(cq)}")
        assert ct == "application/n-triples"
        assert '<urn:ex:a> <urn:ex:n2> "Alice" .' in body
        # parse error -> 400
        try:
            _get(f"{base}/query?query=NOT+SPARQL")
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        ep.stop()


def test_protocol_update_and_service_roundtrip(spark):
    """POST /update mutates the served store; then OUR SERVICE client
    federates against OUR endpoint — the full protocol loop."""
    ep, base = _mk_endpoint(spark)
    try:
        upd = ('INSERT DATA { <urn:ex:c> <urn:ex:name> "Cara" }')
        req = urllib.request.Request(
            f"{base}/update",
            data=urllib.parse.urlencode({"update": upd}).encode(),
            headers={"Content-Type": "application/x-www-form-urlencoded"})
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.status == 204
        q = "SELECT ?s WHERE { ?s <urn:ex:name> \"Cara\" }"
        _, body = _get(f"{base}/query?query={urllib.parse.quote(q)}")
        assert json.loads(body)["results"]["bindings"][0]["s"]["value"] \
            == "urn:ex:c"

        # federation loop: local store SERVICE -> this endpoint
        from oxigraph_spark.operators.update import MutableQuadSource
        from tests.test_semantics import iri, lit, quads_store
        local = quads_store(spark, [(iri("x"), iri("likes"), lit("Cara"))])
        df = local.query(f"""
            SELECT ?who ?n WHERE {{
              ?who <urn:ex:likes> ?n .
              SERVICE <{base}/query> {{ ?p <urn:ex:name> ?n }}
            }}""")
        rows = df.collect()
        assert len(rows) == 1 and rows[0].who.lex == "urn:ex:x"
    finally:
        ep.stop()


def test_concurrent_clients(spark):
    """Endpoint under concurrency (ThreadingHTTPServer + thread-safe
    Spark reads): 8 client threads x 5 requests each, mixed SELECT/ASK
    shapes, all answers correct — no cross-request bleed, no 5xx."""
    import concurrent.futures as cf

    ep, base = _mk_endpoint(spark)
    try:
        cases = [
            ("SELECT ?n WHERE { <urn:ex:a> <urn:ex:name> ?n }",
             lambda d: [b["n"]["value"] for r in [d["results"]["bindings"]]
                        for b in r] == ["Alice"]),
            ("SELECT ?n WHERE { <urn:ex:b> <urn:ex:name> ?n }",
             lambda d: [b["n"]["value"]
                        for b in d["results"]["bindings"]] == ["Bob"]),
            ("ASK { <urn:ex:a> <urn:ex:age> 42 }",
             lambda d: d["boolean"] is True),
            ("ASK { <urn:ex:a> <urn:ex:age> 43 }",
             lambda d: d["boolean"] is False),
            ("SELECT (COUNT(*) AS ?c) WHERE { ?s ?p ?o }",
             lambda d: d["results"]["bindings"][0]["c"]["value"] == "3"),
        ]

        def client(tid):
            ok = 0
            for q, check in cases:
                url = f"{base}/query?query={urllib.parse.quote(q)}"
                _, body = _get(url)
                assert check(json.loads(body)), (tid, q, body)
                ok += 1
            return ok

        with cf.ThreadPoolExecutor(max_workers=8) as pool:
            done = list(pool.map(client, range(8)))
        assert done == [5] * 8
    finally:
        ep.stop()
