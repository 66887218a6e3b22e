"""SPARQL-Protocol endpoint tests (round 4, SURVEY §2.1 S11): GET/POST
query with content negotiation, POST update, and closing the federation
loop — this engine's own SERVICE client querying this engine's own
endpoint."""

import json
import urllib.error
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


def test_bind_join_ships_values(spark):
    """FedX-style bound join: a SERVICE pattern joined with a selective
    local operand ships the local bindings as a VALUES seed — asserted
    on the wire-level query text — and returns the same rows as the
    unseeded evaluation."""
    from oxigraph_spark.plans.compiler import Compiler
    from oxigraph_spark.sources.service_http import HttpServiceHandler
    from tests.test_semantics import iri, lit, quads_store

    ep, base = _mk_endpoint(spark)

    class Spy(HttpServiceHandler):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.queries = []

        def build_query(self, raw, prefixes, values=None):
            q = super().build_query(raw, prefixes, values)
            self.queries.append(q)
            return q

    svc = "urn:svc:spy"
    spy = Spy(f"{base}/query")
    Compiler.register_service_handler(svc, spy)
    try:
        local = quads_store(spark, [
            (iri("a"), iri("flag"), lit("1")),
        ])
        q = f"""SELECT ?s ?n WHERE {{
            ?s <urn:ex:flag> ?f .
            SERVICE <{svc}> {{ ?s <urn:ex:name> ?n }}
        }}"""
        rows = local.query(q).collect()
        assert len(rows) == 1
        assert rows[0].s.lex == "urn:ex:a" and rows[0].n.lex == "Alice"
        # the wire query carried the local ?s bindings
        assert "VALUES (?s) { (<urn:ex:a>) }" in spy.queries[-1]

        # SERVICE written FIRST still seeds from its later partner
        spy.queries.clear()
        q2 = f"""SELECT ?s ?n WHERE {{
            SERVICE <{svc}> {{ ?s <urn:ex:name> ?n }}
            ?s <urn:ex:flag> ?f .
        }}"""
        rows2 = local.query(q2).collect()
        assert len(rows2) == 1 and rows2[0].n.lex == "Alice"
        assert "VALUES (?s)" in spy.queries[-1]

        # OPTIONAL { SERVICE }: seeded, left rows all survive
        spy.queries.clear()
        local2 = quads_store(spark, [
            (iri("a"), iri("flag"), lit("1")),
            (iri("zz"), iri("flag"), lit("1")),
        ])
        q3 = f"""SELECT ?s ?n WHERE {{
            ?s <urn:ex:flag> ?f .
            OPTIONAL {{ SERVICE <{svc}> {{ ?s <urn:ex:name> ?n }} }}
        }}"""
        got = {r.s.lex: (r.n.lex if r.n else None)
               for r in local2.query(q3).collect()}
        assert got == {"urn:ex:a": "Alice", "urn:ex:zz": None}
        assert "VALUES (?s)" in spy.queries[-1]
        assert "urn:ex:zz" in spy.queries[-1]  # both seeds shipped

        # explain-only compilation elides the seed: collecting local
        # bindings would run Spark jobs, which explain must not
        spy.queries.clear()
        plan = local.explain(q)
        assert "== Physical Plan ==" in plan
        assert spy.queries and "VALUES (?s)" not in spy.queries[-1]
    finally:
        Compiler.SERVICE_HANDLERS.pop(svc, None)
        ep.stop()


def test_bind_join_chunks_large_seed_sets(spark):
    """Local sides above MAX_SERVICE_BINDINGS ship as sequential VALUES
    chunks (one request each), wire-asserted; only above
    MAX_SERVICE_TOTAL_BINDINGS does the unseeded fallback run."""
    import re

    from oxigraph_spark.plans.compiler import Compiler
    from oxigraph_spark.sources.service_http import HttpServiceHandler
    from tests.test_semantics import iri, lit, quads_store

    ep, base = _mk_endpoint(spark)

    class Spy(HttpServiceHandler):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.queries = []

        def build_query(self, raw, prefixes, values=None):
            q = super().build_query(raw, prefixes, values)
            self.queries.append(q)
            return q

    svc = "urn:svc:chunky"
    spy = Spy(f"{base}/query")
    Compiler.register_service_handler(svc, spy)
    old_per, old_total = (Compiler.MAX_SERVICE_BINDINGS,
                          Compiler.MAX_SERVICE_TOTAL_BINDINGS)
    Compiler.MAX_SERVICE_BINDINGS, Compiler.MAX_SERVICE_TOTAL_BINDINGS = 2, 4
    try:
        # endpoint knows a, b; local side has 3 distinct subjects -> 2
        # chunks of <=2 seeds; answers match the unseeded evaluation
        local = quads_store(spark, [
            (iri("a"), iri("flag"), lit("1")),
            (iri("b"), iri("flag"), lit("1")),
            (iri("zz"), iri("flag"), lit("1")),
        ])
        q = f"""SELECT ?s ?n WHERE {{
            ?s <urn:ex:flag> ?f .
            SERVICE <{svc}> {{ ?s <urn:ex:name> ?n }}
        }}"""
        got = {(r.s.lex, r.n.lex) for r in local.query(q).collect()}
        assert got == {("urn:ex:a", "Alice"), ("urn:ex:b", "Bob")}
        assert len(spy.queries) == 2
        sizes = sorted(len(re.findall(r"\(<urn:ex:", t))
                       for t in spy.queries)
        assert sizes == [1, 2]  # 3 seeds split 2+1
        seen = "".join(spy.queries)
        for s in ("urn:ex:a", "urn:ex:b", "urn:ex:zz"):
            assert s in seen

        # above the TOTAL cap: one unseeded request, same answers
        spy.queries.clear()
        local2 = quads_store(spark, [
            (iri(x), iri("flag"), lit("1"))
            for x in ("a", "b", "c", "d", "e")])
        got2 = {(r.s.lex, r.n.lex) for r in local2.query(q).collect()}
        assert got2 == {("urn:ex:a", "Alice"), ("urn:ex:b", "Bob")}
        assert len(spy.queries) == 1 and "VALUES" not in spy.queries[0]
    finally:
        Compiler.MAX_SERVICE_BINDINGS = old_per
        Compiler.MAX_SERVICE_TOTAL_BINDINGS = old_total
        Compiler.SERVICE_HANDLERS.pop(svc, None)
        ep.stop()


def test_bind_join_skips_uncertain_vars(spark):
    """A shared variable bound only OPTIONALly is not certainly bound —
    UNDEF rows would break the multiplicity argument, so no VALUES
    ships and the plain evaluation runs."""
    from oxigraph_spark.plans.compiler import Compiler
    from oxigraph_spark.sources.service_http import HttpServiceHandler
    from tests.test_semantics import iri, lit, quads_store

    ep, base = _mk_endpoint(spark)

    class Spy(HttpServiceHandler):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.queries = []

        def build_query(self, raw, prefixes, values=None):
            q = super().build_query(raw, prefixes, values)
            self.queries.append(q)
            return q

    svc = "urn:svc:spy2"
    Compiler.register_service_handler(svc, spy := Spy(f"{base}/query"))
    try:
        local = quads_store(spark, [
            (iri("a"), iri("flag"), lit("1")),
            (iri("b"), iri("flag"), lit("1")),
            (iri("a"), iri("alias"), iri("a")),
        ])
        q = f"""SELECT ?s ?n WHERE {{
            ?x <urn:ex:flag> ?f .
            OPTIONAL {{ ?x <urn:ex:alias> ?s }}
            SERVICE <{svc}> {{ ?s <urn:ex:name> ?n }}
        }}"""
        rows = local.query(q).collect()
        assert "VALUES" not in spy.queries[-1]
        # :a's alias row joins Alice; :b leaves ?s unbound -> compatible
        # with every remote solution (2 of them)
        assert len(rows) == 3
    finally:
        Compiler.SERVICE_HANDLERS.pop(svc, None)
        ep.stop()


def test_bind_join_unshippable_terms_fall_back(spark):
    """Blank-node seeds cannot ship (scoped to the local dataset): the
    VALUES clause is withheld and the plain evaluate-then-join runs."""
    from oxigraph_spark.sources.service_http import (term_sparql_token,
                                                     values_clause)

    class R(dict):
        def __getitem__(self, k):
            return dict.__getitem__(self, k)

    iri_row = {"kind": 0, "lex": "urn:x", "datatype": None, "lang": None}
    lit_row = {"kind": 2, "lex": 'say "hi"\n', "datatype": None,
               "lang": "en"}
    bnode_row = {"kind": 1, "lex": "b0", "datatype": None, "lang": None}
    assert term_sparql_token(R(iri_row)) == "<urn:x>"
    assert term_sparql_token(R(lit_row)) == '"say \\"hi\\"\\n"@en'
    assert term_sparql_token(R(bnode_row)) is None
    assert values_clause(["x"], [R({"x": R(bnode_row)})]) is None
    assert values_clause(
        ["x", "y"], [R({"x": R(iri_row), "y": R(lit_row)})]) \
        == 'VALUES (?x ?y) { (<urn:x> "say \\"hi\\"\\n"@en) }'
    # IRIs whose lex would break out of <...> (IRIREF-illegal chars /
    # controls) are unshippable too — a '>' in local data must not become
    # injected query text at the remote endpoint
    for bad in ("urn:x>. } DROP ALL #", "urn:x x", "urn:\tx",
                'urn:"x', "urn:{x}", "urn:x|y", "urn:x\\y", "urn:x`^"):
        row = {"kind": 0, "lex": bad, "datatype": None, "lang": None}
        assert term_sparql_token(R(row)) is None, bad
        assert values_clause(["x"], [R({"x": R(row)})]) is None, bad


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


# -- Graph Store Protocol (round 6) -----------------------------------------

def _req(url, method="GET", data=None, ctype=None, accept=None):
    headers = {}
    if ctype:
        headers["Content-Type"] = ctype
    if accept:
        headers["Accept"] = accept
    req = urllib.request.Request(
        url, data=data.encode() if isinstance(data, str) else data,
        headers=headers, method=method)
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, r.headers.get("Content-Type"), r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read().decode()


def test_gsp_named_graph_lifecycle(spark):
    ep, base = _mk_endpoint(spark)
    g = urllib.parse.quote("urn:g:people", safe="")
    store_g = f"{base}/store?graph={g}"
    try:
        # absent graph: GET/HEAD/DELETE → 404
        assert _req(store_g)[0] == 404
        assert _req(store_g, method="HEAD")[0] == 404
        assert _req(store_g, method="DELETE")[0] == 404
        # PUT creates → 201
        ttl = ('@prefix ex: <urn:ex:> .\n'
               'ex:c ex:name "Carol" .\n'
               'ex:c ex:age 33 .\n')
        code, _, _ = _req(store_g, method="PUT", data=ttl,
                          ctype="text/turtle")
        assert code == 201
        code, ct, body = _req(store_g, accept="application/n-triples")
        assert code == 200 and ct == "application/n-triples"
        assert '<urn:ex:c> <urn:ex:name> "Carol" .' in body
        assert len([ln for ln in body.splitlines() if ln.strip()]) == 2
        # the SPARQL endpoint sees the same store state (one server, one
        # store: GSP writes are visible to protocol queries)
        q = ("SELECT ?n WHERE { GRAPH <urn:g:people> "
             "{ ?s <urn:ex:name> ?n } }")
        _, body = _get(f"{base}/query?query={urllib.parse.quote(q)}")
        assert json.loads(body)["results"]["bindings"][0]["n"]["value"] \
            == "Carol"
        # POST merges → 204; both subjects now present
        code, _, _ = _req(store_g, method="POST",
                          data='<urn:ex:d> <urn:ex:name> "Dan" .\n',
                          ctype="application/n-triples")
        assert code == 204
        _, _, body = _req(store_g)
        assert '"Carol"' in body and '"Dan"' in body
        # PUT replaces → 204; only the new content remains
        code, _, _ = _req(store_g, method="PUT",
                          data='<urn:ex:e> <urn:ex:name> "Eve" .\n',
                          ctype="application/n-triples")
        assert code == 204
        _, _, body = _req(store_g)
        assert '"Eve"' in body and '"Carol"' not in body
        # DELETE drops → 204, then 404
        assert _req(store_g, method="DELETE")[0] == 204
        assert _req(store_g)[0] == 404
    finally:
        ep.stop()


def test_gsp_default_graph_and_dataset(spark):
    ep, base = _mk_endpoint(spark)
    try:
        # default graph: GET serves the seeded triples, never 404
        code, ct, body = _req(f"{base}/store?default")
        assert code == 200
        assert '<urn:ex:a> <urn:ex:name> "Alice" .' in body
        # POST into the default graph merges
        code, _, _ = _req(f"{base}/store?default", method="POST",
                          data='<urn:ex:z> <urn:ex:name> "Zoe" .\n',
                          ctype="application/n-triples")
        assert code == 204
        _, _, body = _req(f"{base}/store?default")
        assert '"Zoe"' in body and '"Alice"' in body
        # dataset-level GET → N-Quads with graph tokens
        g = urllib.parse.quote("urn:g:extra", safe="")
        _req(f"{base}/store?graph={g}", method="PUT",
             data='@prefix ex: <urn:ex:> .\nex:x ex:v 1 .\n',
             ctype="text/turtle")
        code, ct, body = _req(f"{base}/store")
        assert code == 200 and ct == "application/n-quads"
        assert ('<urn:ex:x> <urn:ex:v> '
                '"1"^^<http://www.w3.org/2001/XMLSchema#integer> '
                '<urn:g:extra> .') in body
        assert '<urn:ex:a> <urn:ex:name> "Alice" .' in body  # no g token
        # PUT on the dataset replaces everything (N-Quads payload keeps
        # its graph labels)
        nq = ('<urn:s:1> <urn:p:1> "v1" .\n'
              '<urn:s:2> <urn:p:2> "v2" <urn:g:two> .\n')
        code, _, _ = _req(f"{base}/store", method="PUT", data=nq,
                          ctype="application/n-quads")
        assert code == 204
        _, _, body = _req(f"{base}/store")
        lines = sorted(ln for ln in body.splitlines() if ln.strip())
        assert lines == ['<urn:s:1> <urn:p:1> "v1" .',
                         '<urn:s:2> <urn:p:2> "v2" <urn:g:two> .']
    finally:
        ep.stop()


def test_gsp_negotiation_and_bnodes(spark):
    ep, base = _mk_endpoint(spark)
    g = urllib.parse.quote("urn:g:neg", safe="")
    store_g = f"{base}/store?graph={g}"
    try:
        _req(store_g, method="PUT",
             data='<urn:ex:n> <urn:ex:name> "Néo" .\n',
             ctype="application/n-triples")
        # Turtle negotiation (N-Triples body is valid Turtle)
        code, ct, body = _req(store_g, accept="text/turtle")
        assert code == 200 and ct == "text/turtle" and "Néo" in body
        # RDF/XML + JSON-LD negotiated documents round-trip via our own
        # readers
        code, ct, xml_doc = _req(store_g, accept="application/rdf+xml")
        assert code == 200 and ct == "application/rdf+xml"
        assert "rdf:RDF" in xml_doc
        code, ct, json_doc = _req(store_g, accept="application/ld+json")
        assert code == 200 and ct == "application/ld+json"
        assert "urn:ex:name" in json_doc
        # unsupported payload type → 415
        code, _, _ = _req(store_g, method="POST", data="x,y\n1,2\n",
                          ctype="text/csv")
        assert code == 415
        # blank nodes are fresh per POST (GSP merge semantics): the same
        # document twice yields two distinct bnodes
        doc = '_:b <urn:ex:name> "Anon" .\n'
        _req(store_g, method="POST", data=doc,
             ctype="application/n-triples")
        _req(store_g, method="POST", data=doc,
             ctype="application/n-triples")
        _, _, body = _req(store_g)
        anon = [ln for ln in body.splitlines() if '"Anon"' in ln]
        assert len(anon) == 2
        subjects = {ln.split(" ")[0] for ln in anon}
        assert len(subjects) == 2 and all(s.startswith("_:")
                                          for s in subjects)
    finally:
        ep.stop()


def test_bind_join_parallel_chunk_dispatch(spark):
    """VERDICT r6 item 3: multi-chunk bound joins ship through a bounded
    thread pool — ≥2 chunk requests observed IN FLIGHT simultaneously
    against a deliberately slow endpoint — and the unioned result is
    identical (order-insensitive) to the sequential path."""
    import threading
    import time

    from oxigraph_spark.plans.compiler import Compiler
    from oxigraph_spark.sources.service_http import HttpServiceHandler
    from tests.test_semantics import iri, lit, quads_store

    ep, base = _mk_endpoint(spark)

    class SlowSpy(HttpServiceHandler):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.lock = threading.Lock()
            self.active = 0
            self.max_active = 0
            self.queries = []

        def __call__(self, *a, **kw):
            with self.lock:
                self.active += 1
                self.max_active = max(self.max_active, self.active)
                if kw.get("values"):
                    self.queries.append(kw["values"])
            try:
                time.sleep(0.3)  # hold the slot so overlap is observable
                return super().__call__(*a, **kw)
            finally:
                with self.lock:
                    self.active -= 1

    svc = "urn:svc:parallel"
    spy = SlowSpy(f"{base}/query")
    Compiler.register_service_handler(svc, spy)
    old_per = Compiler.MAX_SERVICE_BINDINGS
    Compiler.MAX_SERVICE_BINDINGS = 1  # 4 seeds -> 4 chunks
    try:
        local = quads_store(spark, [
            (iri(x), iri("flag"), lit("1")) for x in ("a", "b", "c", "d")])
        q = f"""SELECT ?s ?n WHERE {{
            ?s <urn:ex:flag> ?f .
            SERVICE <{svc}> {{ ?s <urn:ex:name> ?n }}
        }}"""
        got = {(r.s.lex, r.n.lex) for r in local.query(q).collect()}
        assert got == {("urn:ex:a", "Alice"), ("urn:ex:b", "Bob")}
        assert len(spy.queries) == 4
        assert spy.max_active >= 2, "chunks were not dispatched in parallel"

        # sequential mode (service_pool=1) gives the same answers, one
        # request at a time
        spy.queries.clear()
        spy.max_active = spy.active = 0
        local_seq = quads_store(spark, [
            (iri(x), iri("flag"), lit("1")) for x in ("a", "b", "c", "d")])
        local_seq.service_pool = 1
        got_seq = {(r.s.lex, r.n.lex)
                   for r in local_seq.query(q).collect()}
        assert got_seq == got
        assert len(spy.queries) == 4 and spy.max_active == 1
    finally:
        Compiler.MAX_SERVICE_BINDINGS = old_per
        Compiler.SERVICE_HANDLERS.pop(svc, None)
        ep.stop()


def test_service_max_total_bindings_store_option(spark):
    """MAX_SERVICE_TOTAL_BINDINGS is a per-Store option: a Store built
    with service_max_total_bindings=N falls back to the unseeded join
    above N local seeds without touching the class default."""
    from oxigraph_spark.plans.compiler import Compiler
    from oxigraph_spark.sources.service_http import HttpServiceHandler
    from tests.test_semantics import iri, lit, quads_store

    ep, base = _mk_endpoint(spark)

    class Spy(HttpServiceHandler):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.queries = []

        def build_query(self, raw, prefixes, values=None):
            q = super().build_query(raw, prefixes, values)
            self.queries.append(q)
            return q

    svc = "urn:svc:captotal"
    spy = Spy(f"{base}/query")
    Compiler.register_service_handler(svc, spy)
    try:
        st = quads_store(spark, [
            (iri(x), iri("flag"), lit("1")) for x in ("a", "b", "c")])
        st.service_max_total_bindings = 2  # 3 seeds > 2 -> unseeded
        q = f"""SELECT ?s ?n WHERE {{
            ?s <urn:ex:flag> ?f .
            SERVICE <{svc}> {{ ?s <urn:ex:name> ?n }}
        }}"""
        got = {(r.s.lex, r.n.lex) for r in st.query(q).collect()}
        assert got == {("urn:ex:a", "Alice"), ("urn:ex:b", "Bob")}
        assert len(spy.queries) == 1 and "VALUES" not in spy.queries[0]
        assert Compiler.MAX_SERVICE_TOTAL_BINDINGS == 10000  # untouched
    finally:
        Compiler.SERVICE_HANDLERS.pop(svc, None)
        ep.stop()
