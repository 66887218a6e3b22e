"""RDF/XML (S5), JSON-LD expanded (S6), N3 subset (S4) format tests."""

import json

import pytest
from pyspark.sql import functions as F

from oxigraph_spark.algebra import ast as A
from oxigraph_spark.model import terms as T
from oxigraph_spark.sources import rdf_io
from oxigraph_spark.sources.jsonld import (
    parse_jsonld, jsonld_to_ntriples, to_jsonld_document)
from oxigraph_spark.sources.rdfxml import (
    parse_rdfxml, rdfxml_to_ntriples, to_rdfxml_document)

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"


# -- RDF/XML parser (pure Python, no Spark) ---------------------------------

def test_rdfxml_core_grammar():
    doc = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="urn:ex:" xml:base="http://b.example/doc">
  <ex:Person rdf:about="http://a.example/alice" ex:nick="Al">
    <ex:name xml:lang="en">Alice</ex:name>
    <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">30</ex:age>
    <ex:knows rdf:resource="http://a.example/bob"/>
    <ex:addr rdf:parseType="Resource">
      <ex:city>Springfield</ex:city>
    </ex:addr>
  </ex:Person>
  <rdf:Description rdf:ID="frag">
    <ex:note rdf:nodeID="n1"/>
  </rdf:Description>
</rdf:RDF>"""
    triples = parse_rdfxml(doc)
    idx = {}
    for s, p, o in triples:
        idx.setdefault(p.iri, []).append((s, o))
    # typed node element → rdf:type
    (s, o), = idx[RDF + "type"]
    assert s == A.NamedNode("http://a.example/alice")
    assert o == A.NamedNode("urn:ex:Person")
    # property attribute → literal triple
    assert idx["urn:ex:nick"][0][1] == A.Literal("Al")
    # xml:lang on the property element
    assert idx["urn:ex:name"][0][1] == A.Literal("Alice", lang="en")
    # rdf:datatype
    assert idx["urn:ex:age"][0][1] == A.Literal(
        "30", datatype=XSD + "integer")
    assert idx["urn:ex:knows"][0][1] == A.NamedNode("http://a.example/bob")
    # parseType=Resource → bnode with nested property
    addr = idx["urn:ex:addr"][0][1]
    assert isinstance(addr, A.BlankNode)
    assert idx["urn:ex:city"][0] == (addr, A.Literal("Springfield"))
    # rdf:ID resolves against xml:base; rdf:nodeID object
    s, o = idx["urn:ex:note"][0]
    assert s == A.NamedNode("http://b.example/doc#frag")
    assert o == A.BlankNode("n1")


def test_rdfxml_li_and_collection():
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="urn:ex:">
  <rdf:Seq rdf:about="urn:ex:seq">
    <rdf:li>one</rdf:li>
    <rdf:li>two</rdf:li>
  </rdf:Seq>
  <rdf:Description rdf:about="urn:ex:l">
    <ex:items rdf:parseType="Collection">
      <rdf:Description rdf:about="urn:ex:i1"/>
      <rdf:Description rdf:about="urn:ex:i2"/>
    </ex:items>
  </rdf:Description>
</rdf:RDF>"""
    triples = parse_rdfxml(doc)
    preds = {p.iri for _, p, _ in triples}
    assert RDF + "_1" in preds and RDF + "_2" in preds
    # collection → well-formed rdf list: walk it from the head
    firsts = {s: o for s, p, o in triples if p.iri == RDF + "first"}
    rests = {s: o for s, p, o in triples if p.iri == RDF + "rest"}
    head, = [o for s, p, o in triples if p.iri == "urn:ex:items"]
    items = []
    while head != A.NamedNode(RDF + "nil"):
        items.append(firsts[head])
        head = rests[head]
    assert items == [A.NamedNode("urn:ex:i1"), A.NamedNode("urn:ex:i2")]


def test_rdfxml_reification_and_xmlliteral():
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="urn:ex:" xml:base="http://b.example/">
  <rdf:Description rdf:about="urn:ex:s">
    <ex:claim rdf:ID="st1">v</ex:claim>
    <ex:html rdf:parseType="Literal"><b>bold</b></ex:html>
  </rdf:Description>
</rdf:RDF>"""
    triples = parse_rdfxml(doc)
    bypred = {p.iri: (s, o) for s, p, o in triples}
    st = A.NamedNode("http://b.example/#st1")
    assert bypred[RDF + "subject"] == (st, A.NamedNode("urn:ex:s"))
    assert bypred[RDF + "object"][1] == A.Literal("v")
    assert bypred["urn:ex:html"][1] == A.Literal(
        "<b>bold</b>", datatype=RDF + "XMLLiteral")


def test_rdfxml_roundtrip_via_spark(spark, tmp_path):
    nt = tmp_path / "g.nt"
    nt.write_text("""<urn:ex:a> <urn:ex:p> "plain" .
<urn:ex:a> <urn:ex:p> "français"@fr .
<urn:ex:a> <urn:ex:n> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
<urn:ex:a> <urn:ex:q> <urn:ex:b> .
_:x <urn:ex:p> "from bnode" .
""")
    df = rdf_io.load_rdf(spark, str(nt), "ntriples")
    out = tmp_path / "g.rdf"
    rdf_io.dump_rdf(df, str(out), "rdfxml", distributed=False)
    back = rdf_io.load_rdf(spark, str(out), "rdfxml")

    def key(df):
        return sorted(map(tuple, df.select(
            "s.kind", "p.lex", "o.kind", "o.lex", "o.datatype", "o.lang"
        ).collect()))
    assert key(back) == key(df)


def test_rdfxml_to_ntriples_distributed(spark, tmp_path):
    d = tmp_path / "xmls"
    d.mkdir()
    (d / "a.rdf").write_text("""<rdf:RDF
  xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" xmlns:ex="urn:ex:">
  <rdf:Description rdf:about="urn:ex:a"><ex:name>A &amp; B</ex:name>
  <ex:pal><rdf:Description rdf:about="urn:ex:b"/></ex:pal>
  </rdf:Description></rdf:RDF>""")
    (d / "b.rdf").write_text("""<rdf:RDF
  xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" xmlns:ex="urn:ex:">
  <ex:Thing rdf:about="urn:ex:c"/></rdf:RDF>""")
    out = str(tmp_path / "nt_out")
    rdfxml_to_ntriples(spark, str(d), out)
    quads = rdf_io.load_rdf(spark, out + "/*.txt", "ntriples")
    rows = quads.collect()
    assert len(rows) == 3
    vals = {r.o.lex for r in rows}
    assert "A & B" in vals and "urn:ex:Thing" in vals


# -- JSON-LD expanded form --------------------------------------------------

def test_jsonld_expanded_core():
    doc = [
        {"@id": "urn:ex:a",
         "@type": ["urn:ex:Person"],
         "urn:ex:name": [{"@value": "Alice", "@language": "en"}],
         "urn:ex:age": [{"@value": 30}],
         "urn:ex:score": [{"@value": 1.5}],
         "urn:ex:ok": [{"@value": True}],
         "urn:ex:knows": [{"@id": "_:b"},
                          {"@id": "urn:ex:c"}]},
        {"@id": "_:b", "urn:ex:name": [{"@value": "Bob"}]},
    ]
    quads = parse_jsonld(doc)
    idx = {}
    for s, p, o, g in quads:
        assert g is None
        idx.setdefault(p.iri, []).append((s, o))
    assert idx[RDF + "type"][0][1] == A.NamedNode("urn:ex:Person")
    assert idx["urn:ex:name"][0][1] == A.Literal("Alice", lang="en")
    assert idx["urn:ex:age"][0][1] == A.Literal(
        "30", datatype=XSD + "integer")
    assert idx["urn:ex:score"][0][1] == A.Literal(
        "1.5", datatype=XSD + "double")
    assert idx["urn:ex:ok"][0][1] == A.Literal(
        "true", datatype=XSD + "boolean")
    # bnode @id relabeled consistently between reference and node object
    bob_ref = idx["urn:ex:knows"][0][1]
    bob_node = idx["urn:ex:name"][1][0]
    assert isinstance(bob_ref, A.BlankNode) and bob_ref == bob_node


def test_jsonld_lists_graphs_nesting():
    doc = [
        {"@id": "urn:ex:l",
         "urn:ex:items": [{"@list": [{"@value": 1}, {"@id": "urn:ex:x"}]}],
         "urn:ex:embed": [{"urn:ex:name": [{"@value": "anon"}]}]},
        {"@id": "urn:ex:g1",
         "@graph": [{"@id": "urn:ex:s", "urn:ex:p": [{"@value": "v"}]}]},
    ]
    quads = parse_jsonld(doc)
    in_g1 = [(s, p, o) for s, p, o, g in quads
             if g == A.NamedNode("urn:ex:g1")]
    assert in_g1 == [(A.NamedNode("urn:ex:s"), A.NamedNode("urn:ex:p"),
                      A.Literal("v"))]
    firsts = [o for s, p, o, g in quads if p.iri == RDF + "first"]
    assert A.Literal("1", datatype=XSD + "integer") in firsts
    # embedded anonymous node object got a fresh bnode subject
    anon = [s for s, p, o, g in quads if o == A.Literal("anon")]
    assert isinstance(anon[0], A.BlankNode)


def test_jsonld_remote_context_raises():
    with pytest.raises(NotImplementedError, match="remote @context"):
        parse_jsonld({"@context": "https://schema.org", "name": "x"})


def test_jsonld_compact_inline_context():
    doc = {
        "@context": {
            "ex": "urn:ex:",
            "name": "ex:name",
            "knows": {"@id": "ex:knows", "@type": "@id"},
            "age": {"@id": "ex:age", "@type": "ex:years"},
            "id": "@id", "type": "@type",
        },
        "id": "ex:a",
        "type": "ex:Person",
        "name": "Alice",
        "knows": ["ex:b", "_:c"],
        "age": 30,
    }
    quads = parse_jsonld(doc)
    idx = {}
    for s, p, o, g in quads:
        assert g is None and s == A.NamedNode("urn:ex:a")
        idx.setdefault(p.iri, []).append(o)
    assert idx[RDF + "type"] == [A.NamedNode("urn:ex:Person")]
    assert idx["urn:ex:name"] == [A.Literal("Alice")]
    assert A.NamedNode("urn:ex:b") in idx["urn:ex:knows"]
    assert any(isinstance(o, A.BlankNode) for o in idx["urn:ex:knows"])
    # the term's datatype coercion overrides the native JSON typing
    assert idx["urn:ex:age"] == [A.Literal("30", datatype="urn:ex:years")]


def test_jsonld_compact_vocab_base_language():
    doc = {
        "@context": {"@vocab": "urn:v:", "@base": "http://ex.org/d/",
                     "@language": "fr"},
        "@id": "item1",
        "title": "bonjour",
        "link": {"@id": "other"},
    }
    quads = parse_jsonld(doc)
    trip = {(s, p.iri, o) for s, p, o, g in quads}
    subj = A.NamedNode("http://ex.org/d/item1")
    assert (subj, "urn:v:title", A.Literal("bonjour", lang="fr")) in trip
    assert (subj, "urn:v:link", A.NamedNode("http://ex.org/d/other")) in trip


def test_jsonld_compact_containers_and_reverse():
    doc = {
        "@context": {
            "ex": "urn:ex:",
            "label": {"@id": "ex:label", "@container": "@language"},
            "steps": {"@id": "ex:steps", "@container": "@list"},
            "tags": {"@id": "ex:tag", "@container": "@set"},
            "byIdx": {"@id": "ex:byIdx", "@container": "@index"},
            "parentOf": {"@reverse": "ex:childOf"},
        },
        "@id": "ex:n",
        "label": {"en": "water", "de": "Wasser"},
        "steps": ["a", "b"],
        "tags": ["t1"],
        "byIdx": {"k1": "v1", "k2": "v2"},
        "parentOf": [{"@id": "ex:kid"}],
        "@reverse": {"ex:likes": {"@id": "ex:fan"}},
    }
    quads = parse_jsonld(doc)
    trip = {(s, p.iri, o) for s, p, o, g in quads}
    n = A.NamedNode("urn:ex:n")
    assert (n, "urn:ex:label", A.Literal("water", lang="en")) in trip
    assert (n, "urn:ex:label", A.Literal("Wasser", lang="de")) in trip
    # list container → rdf:first/rest chain yielding a,b in order
    first = {s: o for s, p, o, g in quads if p.iri == RDF + "first"}
    rest = {s: o for s, p, o, g in quads if p.iri == RDF + "rest"}
    head = next(o for s, p, o, g in quads if p.iri == "urn:ex:steps")
    walked = []
    while head != A.NamedNode(RDF + "nil"):
        walked.append(first[head].lex)
        head = rest[head]
    assert walked == ["a", "b"]
    assert (n, "urn:ex:tag", A.Literal("t1")) in trip
    assert {o for s, p, o, g in quads if p.iri == "urn:ex:byIdx"} == \
        {A.Literal("v1"), A.Literal("v2")}
    # reverse term + node-level @reverse both invert direction
    assert (A.NamedNode("urn:ex:kid"), "urn:ex:childOf", n) in trip
    assert (A.NamedNode("urn:ex:fan"), "urn:ex:likes", n) in trip


def test_jsonld_compact_matches_expanded():
    compact = {
        "@context": {"ex": "urn:ex:", "name": {"@id": "ex:name"}},
        "@id": "ex:a", "name": "Alice",
        "ex:child": {"@id": "ex:b", "name": "Bob"},
    }
    expanded = [
        {"@id": "urn:ex:a",
         "urn:ex:name": [{"@value": "Alice"}],
         "urn:ex:child": [{"@id": "urn:ex:b",
                           "urn:ex:name": [{"@value": "Bob"}]}]},
    ]
    assert set(map(tuple, parse_jsonld(compact))) == \
        set(map(tuple, parse_jsonld(expanded)))


def test_jsonld_roundtrip_via_spark(spark, tmp_path):
    nt = tmp_path / "g.nt"
    nt.write_text("""<urn:ex:a> <urn:ex:p> "plain" .
<urn:ex:a> <urn:ex:p> "texte"@fr .
<urn:ex:a> <urn:ex:n> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
<urn:ex:a> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <urn:ex:T> .
_:x <urn:ex:q> <urn:ex:a> .
""")
    df = rdf_io.load_rdf(spark, str(nt), "ntriples")
    out = tmp_path / "g.jsonld"
    rdf_io.dump_rdf(df, str(out), "jsonld", distributed=False)
    assert "@value" in out.read_text()
    back = rdf_io.load_rdf(spark, str(out), "jsonld")

    def key(df):
        return sorted(map(tuple, df.select(
            "s.kind", "p.lex", "o.kind", "o.lex", "o.datatype", "o.lang"
        ).collect()))
    assert key(back) == key(df)


def test_jsonld_to_ntriples_distributed(spark, tmp_path):
    d = tmp_path / "jsons"
    d.mkdir()
    (d / "a.jsonld").write_text(json.dumps(
        [{"@id": "urn:ex:a", "urn:ex:name": [{"@value": "A"}],
          "urn:ex:pal": [{"urn:ex:name": [{"@value": "anon pal"}]}]}]))
    (d / "b.jsonld").write_text(json.dumps(
        [{"@id": "urn:ex:g", "@graph": [
            {"@id": "urn:ex:s", "urn:ex:p": [{"@value": "in graph"}]}]}]))
    out = str(tmp_path / "nq_out")
    jsonld_to_ntriples(spark, str(d), out)
    quads = rdf_io.load_rdf(spark, out + "/*.txt", "nquads")
    rows = quads.collect()
    assert len(rows) == 4
    graphs = {r.g.lex for r in rows}
    assert "urn:ex:g" in graphs


# -- N3 subset --------------------------------------------------------------

def test_n3_turtle_subset(spark, tmp_path):
    n3 = tmp_path / "d.n3"
    n3.write_text("""
@prefix ex: <urn:ex:> .
ex:a a ex:Person ; ex:name "Alice {not a formula}" .
""")
    df = rdf_io.load_rdf(spark, str(n3))  # guessed from extension
    assert df.count() == 2


def test_n3_formula_raises(spark, tmp_path):
    n3 = tmp_path / "f.n3"
    n3.write_text("""
@prefix ex: <urn:ex:> .
{ ex:a ex:p ex:b } => { ex:a ex:q ex:b } .
""")
    with pytest.raises(NotImplementedError, match="formulas"):
        rdf_io.load_rdf(spark, str(n3), "n3")


def test_trig_two_graphs(spark, tmp_path):
    """A 2-graph TriG file parses into the correct ``g`` column: bare
    `<g> { … }`, `GRAPH <g> { … }`, prefixed labels, and top-level
    default-graph statements."""
    path = str(tmp_path / "two.trig")
    with open(path, "w") as f:
        f.write("""@prefix ex: <urn:ex:> .
ex:top ex:p "default" .
ex:g1 { ex:a ex:p "one" . ex:b ex:p "two" . }
GRAPH <urn:ex:g2> { ex:c ex:p "three" . }
{ ex:d ex:p "also-default" . }
""")
    df = rdf_io.load_rdf(spark, path)
    rows = [(r["s"]["lex"], r["o"]["lex"],
             r["g"]["kind"], r["g"]["lex"]) for r in df.collect()]
    by_graph = {}
    for s, o, gk, gl in rows:
        key = gl if gk == T.KIND_IRI else "<default>"
        by_graph.setdefault(key, set()).add((s, o))
    assert by_graph["urn:ex:g1"] == {("urn:ex:a", "one"),
                                     ("urn:ex:b", "two")}
    assert by_graph["urn:ex:g2"] == {("urn:ex:c", "three")}
    assert by_graph["<default>"] == {("urn:ex:top", "default"),
                                     ("urn:ex:d", "also-default")}


def test_trig_write_read_roundtrip(spark, tmp_path):
    """Distributed TriG writer → reader round-trip preserves graph
    assignment (writer emits per-partition blocks; same-label blocks
    union per the TriG spec)."""
    src = str(tmp_path / "src.trig")
    with open(src, "w") as f:
        f.write("""@prefix ex: <urn:ex:> .
ex:top ex:p "default" .
ex:g1 { ex:a ex:p "one" . }
GRAPH ex:g2 { ex:b ex:p "two" . }
""")
    df = rdf_io.load_rdf(spark, src)
    out = str(tmp_path / "out.trig.d")
    rdf_io.dump_rdf(df, out, fmt="trig")
    back = rdf_io._read_trig_small(spark, out)
    def key(d):
        return {(r["s"]["lex"], r["o"]["lex"],
                 r["g"]["kind"], r["g"]["lex"]) for r in d.collect()}
    assert key(back) == key(df)


def test_trig_strings_and_comments_opaque(spark, tmp_path):
    """Braces and '#' inside literals / IRIs must not confuse the block
    scanner."""
    path = str(tmp_path / "tricky.trig")
    with open(path, "w") as f:
        f.write("""@prefix ex: <urn:ex:> .
# a comment with { braces } and <angle>
ex:top ex:p "braces { in } literal # not a comment" .
ex:g1 { ex:a ex:p <urn:ex:frag#hash> . }
""")
    df = rdf_io.load_rdf(spark, path)
    got = {(r["s"]["lex"], r["o"]["lex"],
            r["g"]["lex"] if r["g"]["kind"] == T.KIND_IRI else None)
           for r in df.collect()}
    assert got == {
        ("urn:ex:top", "braces { in } literal # not a comment", None),
        ("urn:ex:a", "urn:ex:frag#hash", "urn:ex:g1")}


def test_turtle_chunked_matches_driver_reader(spark, tmp_path):
    """turtle_to_ntriples_chunked on a multi-partition single .ttl file
    produces the same triples as the driver-side small reader, including
    statements that span lines and cross chunk boundaries."""
    from oxigraph_spark.sources.ntriples import read_ntriples
    src = str(tmp_path / "big.ttl")
    lines = ["@prefix ex: <urn:ex:> ."]
    for i in range(400):
        if i % 3 == 0:
            # multi-line statement (object list over two lines)
            lines.append(f"ex:s{i} ex:p \"v{i}\" ,")
            lines.append(f"    \"w{i}\" .")
        else:
            lines.append(f"ex:s{i} ex:p ex:o{i} .")
    with open(src, "w") as f:
        f.write("\n".join(lines) + "\n")
    out = str(tmp_path / "big.nt.d")
    # ~1 KB partitions => dozens of chunks over this file
    rdf_io.turtle_to_ntriples_chunked(spark, src, out,
                                      max_partition_bytes=1024)
    chunked = read_ntriples(spark, out)
    driver = rdf_io._read_turtle_small(spark, src)
    def key(d):
        return sorted((r["s"]["lex"], r["p"]["lex"], r["o"]["lex"])
                      for r in d.select("s", "p", "o").collect())
    ck, dk = key(chunked), key(driver)
    assert len(ck) == len(dk) == 400 + 134  # 134 object-list extras
    assert ck == dk


def test_turtle_chunked_multiline_long_literals(spark, tmp_path):
    """Long (triple-quoted) literals spanning lines — including lines
    that END IN '.' inside the literal — across many tiny partitions.
    The two-pass state composition must never split a statement
    mid-literal or take an in-literal '.' as a statement boundary."""
    from oxigraph_spark.sources.ntriples import read_ntriples
    src = str(tmp_path / "long.ttl")
    lines = ["@prefix ex: <urn:ex:> ."]
    for i in range(120):
        if i % 4 == 0:
            # adversarial: in-literal lines ending with '.', plus a
            # quote run and a '#' that must not read as a comment
            lines.append(f'ex:s{i} ex:note """first line {i}.')
            lines.append("not a # comment, ends with a dot.")
            lines.append('middle "quoted" part.')
            lines.append(f'last line {i}""" .')
        else:
            lines.append(f"ex:s{i} ex:p ex:o{i} .")
    with open(src, "w") as f:
        f.write("\n".join(lines) + "\n")
    out = str(tmp_path / "long.nt.d")
    rdf_io.turtle_to_ntriples_chunked(spark, src, out,
                                      max_partition_bytes=256)
    chunked = read_ntriples(spark, out)
    driver = rdf_io._read_turtle_small(spark, src)

    def key(d):
        return sorted((r["s"]["lex"], r["p"]["lex"], r["o"]["lex"])
                      for r in d.select("s", "p", "o").collect())
    ck, dk = key(chunked), key(driver)
    assert len(ck) == len(dk) == 120
    assert ck == dk
    # and the literal content survived intact, newlines included
    note = [o for s, p, o in ck if p == "urn:ex:note" and s == "urn:ex:s0"]
    assert note == ["first line 0.\nnot a # comment, ends with a dot.\n"
                    'middle "quoted" part.\nlast line 0']


@pytest.mark.slow
def test_jsonld_chunked_matches_driver_reader(spark, tmp_path):
    """jsonld_to_ntriples_chunked on a multi-partition single .jsonld
    file (pretty-printed root array) matches the driver-side reader,
    including objects spanning lines and chunk boundaries, nested
    objects/arrays, and braces inside string values."""
    import json as _json
    from oxigraph_spark.sources import jsonld as JL
    from oxigraph_spark.sources.ntriples import read_ntriples
    docs = []
    for i in range(120):
        node = {
            "@id": f"urn:ex:s{i}",
            "urn:ex:p": [{"@value": f'v "{i}" with {{braces}} and [x]'}],
        }
        if i % 3 == 0:
            node["urn:ex:q"] = [{"@id": f"urn:ex:o{i}"},
                                {"@value": i, "@type":
                                 "http://www.w3.org/2001/XMLSchema#integer"}]
        docs.append(node)
    src = str(tmp_path / "big.jsonld")
    with open(src, "w") as f:
        f.write(_json.dumps(docs, indent=1))
    out = str(tmp_path / "big.nq.d")
    JL.jsonld_to_ntriples_chunked(spark, src, out,
                                  max_partition_bytes=512)
    chunked = read_ntriples(spark, out, quads=True)
    driver = JL.read_jsonld_small(spark, src)

    def key(d):
        return sorted((r["s"]["lex"], r["p"]["lex"], r["o"]["lex"])
                      for r in d.select("s", "p", "o").collect())
    ck, dk = key(chunked), key(driver)
    assert len(ck) == len(dk) == 120 + 2 * 40
    assert ck == dk


def test_rdfxml_chunked_matches_driver_reader(spark, tmp_path):
    """rdfxml_to_ntriples_chunked on a multi-partition single .rdf file
    matches the driver-side reader: root-level namespace scoping, typed
    nodes, nested property elements, attribute values containing '>',
    comments, and self-closing top-level elements."""
    from oxigraph_spark.sources import rdfxml as RX
    from oxigraph_spark.sources.ntriples import read_ntriples
    parts = ['<?xml version="1.0"?>',
             '<!-- header comment with < inside -->',
             '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"',
             '         xmlns:ex="urn:ex:">']
    for i in range(100):
        if i % 4 == 0:
            parts.append(f'  <ex:Thing rdf:about="urn:ex:s{i}" '
                         f'ex:tag="a&gt;b"/>')
        else:
            parts.append(f'  <rdf:Description rdf:about="urn:ex:s{i}">')
            parts.append(f'    <ex:p>value {i}</ex:p>')
            parts.append('    <ex:nested>')
            parts.append(f'      <rdf:Description rdf:about="urn:ex:n{i}">')
            parts.append(f'        <ex:q rdf:resource="urn:ex:o{i}"/>')
            parts.append('      </rdf:Description>')
            parts.append('    </ex:nested>')
            parts.append('  </rdf:Description>')
    parts.append('</rdf:RDF>')
    src = str(tmp_path / "big.rdf")
    with open(src, "w") as f:
        f.write("\n".join(parts) + "\n")
    out = str(tmp_path / "big.nt.d")
    RX.rdfxml_to_ntriples_chunked(spark, src, out,
                                  max_partition_bytes=512)
    chunked = read_ntriples(spark, out)
    driver = RX.read_rdfxml_small(spark, src)

    def key(d):
        return sorted((r["s"]["lex"], r["p"]["lex"], r["o"]["lex"])
                      for r in d.select("s", "p", "o").collect())
    ck, dk = key(chunked), key(driver)
    assert ck == dk
    assert len(ck) == 25 * 2 + 75 * 3  # typed nodes: type+tag; others: p,nested,q


def test_jsonld_chunked_root_object_routes_driver_side(spark, tmp_path):
    """A root-OBJECT JSON-LD document (inline @context + @graph) cannot
    be depth-cut; the chunked entry point must sniff the root kind and
    fall back to the driver-side parser instead of emitting invalid
    chunks (ADVICE r3)."""
    import json as _json
    from oxigraph_spark.sources import jsonld as JL
    from oxigraph_spark.sources.ntriples import read_ntriples
    doc = {
        "@context": {"p": "urn:ex:p"},
        "@graph": [
            {"@id": f"urn:ex:s{i}", "p": [{"@value": f"v{i}"}]}
            for i in range(20)
        ],
    }
    src = str(tmp_path / "rootobj.jsonld")
    with open(src, "w") as f:
        f.write(_json.dumps(doc, indent=1))
    out = str(tmp_path / "rootobj.nq.d")
    JL.jsonld_to_ntriples_chunked(spark, src, out, max_partition_bytes=256)
    got = sorted((r["s"]["lex"], r["o"]["lex"])
                 for r in read_ntriples(spark, out, quads=True)
                 .select("s", "o").collect())
    assert got == sorted((f"urn:ex:s{i}", f"v{i}") for i in range(20))


def test_jsonld_chunked_single_partition_no_crash(spark, tmp_path):
    """A tiny root-array file read as ONE partition stitches everything
    driver-side, leaving the distributed N-T body EMPTY — building that
    body with toDF() crashed on schema inference (ADVICE r3, medium)."""
    import json as _json
    from oxigraph_spark.sources import jsonld as JL
    from oxigraph_spark.sources.ntriples import read_ntriples
    docs = [{"@id": "urn:ex:a", "urn:ex:p": [{"@value": "x"}]}]
    src = str(tmp_path / "tiny.jsonld")
    with open(src, "w") as f:
        f.write(_json.dumps(docs))
    out = str(tmp_path / "tiny.nq.d")
    JL.jsonld_to_ntriples_chunked(spark, src, out)   # default split size
    rows = read_ntriples(spark, out, quads=True).collect()
    assert len(rows) == 1 and rows[0]["s"]["lex"] == "urn:ex:a"


def test_rdfxml_chunked_single_element_no_crash(spark, tmp_path):
    """One top-level element in one partition → empty distributed body;
    must not crash in toDF schema inference (ADVICE r3, medium)."""
    from oxigraph_spark.sources import rdfxml as RX
    from oxigraph_spark.sources.ntriples import read_ntriples
    src = str(tmp_path / "one.rdf")
    with open(src, "w") as f:
        f.write('<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/'
                '22-rdf-syntax-ns#" xmlns:ex="urn:ex:">\n'
                '  <rdf:Description rdf:about="urn:ex:s">\n'
                '    <ex:p>v</ex:p>\n'
                '  </rdf:Description>\n'
                '</rdf:RDF>\n')
    out = str(tmp_path / "one.nt.d")
    RX.rdfxml_to_ntriples_chunked(spark, src, out)
    rows = read_ntriples(spark, out).collect()
    assert len(rows) == 1 and rows[0]["s"]["lex"] == "urn:ex:s"


def test_xml_scanner_wrapped_self_closing_tag():
    """'/' ending one line with '>' opening the next (formatter-wrapped
    self-closing tag): the scanner must carry a pending-slash marker so
    depth composition stays exact across the break (ADVICE r3).  The
    tag itself is not well-formed XML (expat rejects it), but an exact
    scanner keeps every OTHER chunk boundary correct."""
    from oxigraph_spark.sources.rdfxml import _scan_xml_line
    # inside the root (depth 1): a wrapped self-closing child element
    mode, depth = "", 1
    mode, depth, cuts, _ = _scan_xml_line('<ex:Thing attr="x" /', mode, depth)
    assert mode == "To/" and depth == 1 and cuts == []
    mode, depth, cuts, _ = _scan_xml_line('>', mode, depth)
    assert mode == "" and depth == 1      # NOT counted as an opening tag
    assert cuts == [1]                    # and the top-level cut is seen
    # control: chars between '/' and the line break clear the pending
    mode, depth, cuts, _ = _scan_xml_line('<ex:T attr="a/b" x="y"', "", 1)
    assert mode == "To"
    mode, depth, cuts, _ = _scan_xml_line('>', mode, 1)
    assert depth == 2 and cuts == []      # ordinary opening tag


# -- distributed writers (round 4: Turtle / RDF-XML / JSON-LD part files) ---

def _mk_triples(spark, n=60):
    """Multi-partition triples frame: IRIs, typed + lang literals."""
    from oxigraph_spark.plans.compiler import _term_to_py
    from oxigraph_spark.algebra import ast as A
    from oxigraph_spark.model import terms as T
    from pyspark.sql.types import StructField, StructType
    rows = []
    for i in range(n):
        s = A.NamedNode(f"urn:ex:s{i}")
        rows.append((_term_to_py(s), _term_to_py(A.NamedNode("urn:ex#p")),
                     _term_to_py(A.Literal(f'v "{i}" <&> x'))))
        rows.append((_term_to_py(s), _term_to_py(A.NamedNode("urn:ex#q")),
                     _term_to_py(A.Literal(str(i),
                     datatype="http://www.w3.org/2001/XMLSchema#integer"))))
        if i % 3 == 0:
            rows.append((_term_to_py(s),
                         _term_to_py(A.NamedNode("urn:ex#r")),
                         _term_to_py(A.NamedNode(f"urn:ex:o{i}"))))
    schema = StructType([StructField(c, T.TERM_SCHEMA)
                         for c in ("s", "p", "o")])
    return spark.createDataFrame(rows, schema).repartition(4), rows


def _key_of(df):
    return sorted((r["s"]["lex"], r["p"]["lex"], r["o"]["lex"],
                   r["o"]["kind"], r["o"]["datatype"])
                  for r in df.select("s", "p", "o").collect())


def test_write_turtle_distributed_roundtrip(spark, tmp_path):
    """write_turtle emits per-partition part files (no driver collect);
    turtle_to_ntriples over the part directory reads the same graph."""
    import os
    from oxigraph_spark.sources import rdf_io
    from oxigraph_spark.sources.ntriples import read_ntriples
    df, _ = _mk_triples(spark)
    out = str(tmp_path / "g.ttl.d")
    rdf_io.write_turtle(df, out)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) > 1           # actually distributed
    nt = str(tmp_path / "g.nt.d")
    rdf_io.turtle_to_ntriples(spark, out, nt)
    back = read_ntriples(spark, nt)
    assert _key_of(back) == _key_of(df)


def test_write_rdfxml_distributed_roundtrip(spark, tmp_path):
    """write_rdfxml: one complete self-contained document per partition;
    rdfxml_to_ntriples over the part set reads the same graph."""
    import os
    from oxigraph_spark.sources import rdfxml as RX
    from oxigraph_spark.sources.ntriples import read_ntriples
    df, _ = _mk_triples(spark)
    out = str(tmp_path / "g.rdf.d")
    RX.write_rdfxml(df, out)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) > 1
    # every part file is a well-formed standalone document
    import xml.etree.ElementTree as ET
    for f in parts:
        text = open(os.path.join(out, f)).read()
        if text.strip():
            ET.fromstring(text)
    nt = str(tmp_path / "g2.nt.d")
    RX.rdfxml_to_ntriples(spark, out, nt)
    back = read_ntriples(spark, nt)
    assert _key_of(back) == _key_of(df)


def test_write_jsonld_distributed_roundtrip(spark, tmp_path):
    """write_jsonld: one expanded root-array document per partition;
    jsonld_to_ntriples over the part set reads the same graph."""
    import json as _json, os
    from oxigraph_spark.sources import jsonld as JL
    from oxigraph_spark.sources.ntriples import read_ntriples
    df, _ = _mk_triples(spark)
    out = str(tmp_path / "g.jsonld.d")
    JL.write_jsonld(df, out)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) > 1
    for f in parts:
        text = open(os.path.join(out, f)).read()
        if text.strip():
            assert isinstance(_json.loads(text), list)
    nt = str(tmp_path / "g3.nq.d")
    JL.jsonld_to_ntriples(spark, out, nt)
    back = read_ntriples(spark, nt, quads=True)
    assert _key_of(back) == _key_of(df)


# -- round-7 ADVICE regressions ---------------------------------------------

def test_trig_block_relative_iris_resolve_against_base(spark, tmp_path):
    """ADVICE r6: relative IRIs INSIDE named-graph blocks of an @base
    document must resolve like default-graph ones (_read_trig_small
    previously dropped `base` for block text)."""
    path = str(tmp_path / "base.trig")
    with open(path, "w") as f:
        f.write("""@base <http://example.org/dir/> .
<top> <p> <o1> .
<g1> { <inner> <p> <o2> . }
""")
    df = rdf_io.load_rdf(spark, path)
    got = {(r["s"]["lex"], r["o"]["lex"]) for r in df.collect()}
    assert got == {
        ("http://example.org/dir/top", "http://example.org/dir/o1"),
        ("http://example.org/dir/inner", "http://example.org/dir/o2")}


def test_trig_block_final_dot_optional(spark, tmp_path):
    """ADVICE r6: TriG `wrappedGraph ::= '{' triplesBlock? '}'` makes
    the final '.' inside braces OPTIONAL — `:g { :s :p :o }` is valid
    TriG and must parse (top-level Turtle statements still require it)."""
    path = str(tmp_path / "nodot.trig")
    with open(path, "w") as f:
        f.write("""@prefix ex: <urn:ex:> .
ex:g1 { ex:a ex:p "one" }
GRAPH ex:g2 { ex:b ex:p "two" . ex:c ex:p "three" }
""")
    df = rdf_io.load_rdf(spark, path)
    got = {(r["s"]["lex"], r["g"]["lex"]) for r in df.collect()}
    assert got == {("urn:ex:a", "urn:ex:g1"), ("urn:ex:b", "urn:ex:g2"),
                   ("urn:ex:c", "urn:ex:g2")}


def test_turtle_missing_final_dot_still_rejected(spark, tmp_path):
    """The Turtle-level final-dot requirement survives the TriG fix."""
    from oxigraph_spark.algebra.parser import ParseError
    path = str(tmp_path / "nodot.ttl")
    with open(path, "w") as f:
        f.write('@prefix ex: <urn:ex:> .\nex:a ex:p "one"\n')
    with pytest.raises(ParseError, match="not terminated"):
        rdf_io.load_rdf(spark, path)


def test_directive_text_inside_literal_not_stripped(spark, tmp_path):
    """ADVICE r6: directive-looking text inside a (multi-line) string
    literal is DATA — _strip_directives must neither honor nor delete
    it (regex-over-raw-text previously corrupted the literal)."""
    path = str(tmp_path / "tricky2.ttl")
    body = 'use @base <http://evil.example/> .\nand @prefix p: <urn:no:> .'
    with open(path, "w") as f:
        f.write('@prefix ex: <urn:ex:> .\n'
                'ex:a ex:doc """' + body + '""" .\n'
                'ex:b ex:p ex:c .\n')
    df = rdf_io.load_rdf(spark, path)
    got = {(r["s"]["lex"], r["o"]["lex"]) for r in df.collect()}
    assert ("urn:ex:a", body) in got
    # the bogus @base inside the literal must NOT have affected ex:c
    assert ("urn:ex:b", "urn:ex:c") in got


def test_directive_in_comment_ignored(spark, tmp_path):
    path = str(tmp_path / "tricky3.ttl")
    with open(path, "w") as f:
        f.write('@prefix ex: <urn:ex:> .\n'
                '# @prefix zz: <urn:zz:> . not a directive\n'
                'ex:a ex:p "x # @base <urn:q:> ." .\n')
    df = rdf_io.load_rdf(spark, path)
    got = {(r["s"]["lex"], r["o"]["lex"]) for r in df.collect()}
    assert got == {("urn:ex:a", "x # @base <urn:q:> .")}
