"""Round-9 coverage: results-parser UCHAR/lang normalization, the
signature-cache concurrency contract, eager N-Triples validation, and
the Turtle writer round-trip contract on bnode-rich graphs."""

import os
import threading

import pytest

from oxigraph_spark.sources import results_io as R


# -- results parsers (pure python, no spark) -------------------------------

def test_tsv_uchar_escapes_decode():
    t = R.parse_tsv_term('"caf\\u00E9 \\U0001F600"')
    assert t == {"type": "literal", "value": "café 😀"}


def test_tsv_uchar_in_iri_token():
    t = R.parse_tsv_term("<http://ex/\\u0041>")
    assert t == {"type": "uri", "value": "http://ex/A"}


def test_tsv_bad_uchar_rejects():
    with pytest.raises(ValueError):
        R.parse_tsv_term('"bad \\u12"')
    with pytest.raises(ValueError):
        R.parse_tsv_term('"bad \\uZZZZ"')
    with pytest.raises(ValueError):
        R.parse_tsv_term('"surrogate \\uD800"')


def test_tsv_lang_tag_lowercased():
    t = R.parse_tsv_term('"x"@EN-GB')
    assert t["xml:lang"] == "en-gb"


def test_srj_lang_tag_lowercased():
    doc = ('{"head":{"vars":["v"]},"results":{"bindings":['
           '{"v":{"type":"literal","value":"x","xml:lang":"FR-ca"}}]}}')
    rows = R.parse_json_results(doc)
    assert rows[0]["v"]["xml:lang"] == "fr-ca"


def test_xml_results_lang_lowercased():
    doc = ('<sparql xmlns="http://www.w3.org/2005/sparql-results#">'
           "<head><variable name=\"v\"/></head><results><result>"
           '<binding name="v"><literal xml:lang="DE">x</literal>'
           "</binding></result></results></sparql>")
    rows = R.parse_xml_results(doc)
    assert rows[0]["v"]["xml:lang"] == "de"


# -- signature-cache concurrency (round-9: locked bounded FIFO) ------------

def test_sig_cache_concurrent_requests_keep_both(spark):
    """Two overlapping minhash runs must not unpersist each other's
    in-flight signature cache (the old one-slot swap did)."""
    from oxigraph_spark.pipeline import dedup as D

    texts = [(i, f"document number {i} with shared words " * 3)
             for i in range(40)]
    df1 = spark.createDataFrame(texts, ["id", "text"])
    df2 = spark.createDataFrame(
        [(i + 100, t) for i, t in texts], ["id", "text"])

    results, errors = {}, []

    def run(key, df):
        try:
            pairs = D.minhash_lsh_pairs(df, "text", "id", num_perm=16,
                                        bands=4)
            results[key] = pairs.count()
        except Exception as ex:  # noqa: BLE001
            errors.append(ex)

    t1 = threading.Thread(target=run, args=("a", df1))
    t2 = threading.Thread(target=run, args=("b", df2))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errors
    assert set(results) == {"a", "b"}
    # both runs' signature tables survive in the bounded cache
    with D._SIG_LOCK:
        cached = list(D._SIG_CACHE)
    assert len(cached) >= 2
    assert all(f.is_cached for f in cached)


# -- eager N-Triples validation -------------------------------------------

def test_read_ntriples_eager_raises_before_action(spark, tmp_path):
    p = tmp_path / "bad.nt"
    p.write_text('<http://ex/s> <http://ex/p> <http://ex/o> .\n'
                 'this line is garbage\n')
    from oxigraph_spark.sources.ntriples import read_ntriples
    with pytest.raises(ValueError, match="malformed"):
        read_ntriples(spark, str(p), eager=True)


def test_read_ntriples_lazy_strict_raises_on_materialize(spark, tmp_path):
    p = tmp_path / "bad.nt"
    p.write_text('<http://ex/s> <http://ex/p> <http://ex/o> .\n'
                 'garbage here\n')
    from oxigraph_spark.sources.ntriples import read_ntriples
    df = read_ntriples(spark, str(p))  # lazy: no error yet
    with pytest.raises(Exception, match="malformed"):
        df.collect()


# -- Turtle writer round-trip on a bnode-rich graph ------------------------

def test_turtle_writer_bnode_roundtrip(spark, tmp_path):
    """write_turtle emits plain subject-grouped statements (no nested
    bnode property lists) — the round-trip contract is ISOMORPHISM:
    a bnode-rich graph written as Turtle and read back is the same
    graph up to bnode relabeling."""
    from oxigraph_spark.operators.canonicalize import isomorphic
    from oxigraph_spark.sources.rdf_io import load_rdf, write_turtle

    src = tmp_path / "in.ttl"
    src.write_text("""
@prefix : <http://ex/> .
:r :child [ :name "kid" ; :child [ :name "grandkid" ] ] .
_:shared :name "s1" , "s2" .
:r :friend _:shared .
:r :tags ("a" "b" ("c")) .
""")
    g = load_rdf(spark, str(src))
    out = tmp_path / "out.ttl"
    write_turtle(g, str(out))
    # the distributed writer emits part files; read them all back
    import glob
    parts = sorted(glob.glob(str(out / "part-*")))
    assert parts
    merged = tmp_path / "merged.ttl"
    merged.write_text("\n".join(
        open(f, encoding="utf-8").read() for f in parts))
    g2 = load_rdf(spark, str(merged))
    assert isomorphic(g, g2)


# -- pluggable JSON-LD context resolver ------------------------------------

def test_jsonld_remote_context_resolver(spark, tmp_path):
    from oxigraph_spark.sources import jsonld as J

    ctxs = {
        "http://ctx.example/v1": {"@context": {
            "name": "http://xmlns.com/foaf/0.1/name",
            "ex": "http://ex/"}},
        "http://ctx.example/chain": {"@context":
                                     ["http://ctx.example/v1",
                                      {"age": "http://ex/age"}]},
    }

    def resolver(url):
        return ctxs.get(url)

    doc = ('{"@context": "http://ctx.example/chain",'
           ' "@id": "http://ex/alice", "name": "Alice", "age": 30}')
    p = tmp_path / "d.jsonld"
    p.write_text(doc)

    # without a resolver the remote context still raises
    import pytest as _pytest
    from oxigraph_spark.sources.rdf_io import load_rdf
    with _pytest.raises(NotImplementedError, match="context resolver"):
        load_rdf(spark, str(p)).collect()

    J.register_context_resolver(resolver)
    try:
        rows = {(r["s"]["lex"], r["p"]["lex"], r["o"]["lex"])
                for r in load_rdf(spark, str(p)).collect()}
    finally:
        J.unregister_context_resolver(resolver)
    assert rows == {
        ("http://ex/alice", "http://xmlns.com/foaf/0.1/name", "Alice"),
        ("http://ex/alice", "http://ex/age", "30"),
    }


def test_jsonld_context_cycle_raises(spark, tmp_path):
    from oxigraph_spark.sources import jsonld as J

    def resolver(url):
        return {"@context": "http://ctx.example/loop"}

    doc = '{"@context": "http://ctx.example/loop", "@id": "http://ex/x"}'
    p = tmp_path / "d.jsonld"
    p.write_text(doc)
    import pytest as _pytest
    from oxigraph_spark.sources.rdf_io import load_rdf
    J.register_context_resolver(resolver)
    try:
        with _pytest.raises(ValueError, match="depth"):
            load_rdf(spark, str(p)).collect()
    finally:
        J.unregister_context_resolver(resolver)
