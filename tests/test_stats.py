"""Tests for operators.stats: VoID summaries and graph diff."""

from pyspark.sql import functions as F

from oxigraph_spark.operators.stats import (class_partition, dataset_stats,
                                            graph_diff, predicate_partition)


def _load(spark, text):
    from oxigraph_spark.sources.rdf_io import load_rdf
    import tempfile, os
    f = tempfile.NamedTemporaryFile("w", suffix=".ttl", delete=False)
    f.write("@prefix ex: <urn:ex:> .\n"
            "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .\n"
            + text)
    f.close()
    return load_rdf(spark, f.name, "turtle")


def test_dataset_stats_and_partitions(spark):
    q = _load(spark, """
        ex:a rdf:type ex:Person ; ex:name "A" ; ex:knows ex:b .
        ex:b rdf:type ex:Person ; ex:name "B" .
        ex:c rdf:type ex:Org ; ex:name "C" .
    """)
    row = dataset_stats(q).collect()[0]
    assert row["triples"] == 7
    assert row["distinct_subjects"] == 3
    assert row["distinct_predicates"] == 3
    # objects: Person, Org, "A","B","C", ex:b -> 6
    assert row["distinct_objects"] == 6
    pp = {r["predicate"]: r for r in predicate_partition(q).collect()}
    assert pp["urn:ex:name"]["triples"] == 3
    assert pp["urn:ex:name"]["distinct_objects"] == 3
    assert pp["urn:ex:knows"]["distinct_subjects"] == 1
    cp = {r["cls"]: r["instances"] for r in class_partition(q).collect()}
    assert cp == {"urn:ex:Person": 2, "urn:ex:Org": 1}


def test_graph_diff(spark):
    a = _load(spark, 'ex:a ex:p "1" . ex:b ex:p "2" .')
    b = _load(spark, 'ex:a ex:p "1" . ex:b ex:p "3" .')
    d = graph_diff(a, b).collect()
    ops = sorted((r["op"], r["o"]["lex"]) for r in d)
    assert ops == [("+", "3"), ("-", "2")]


def test_graph_diff_canonical_isomorphic(spark):
    # same structure, different bnode labels -> empty diff only when
    # canonicalized
    a = _load(spark, "ex:a ex:knows _:x . _:x ex:name \"N\" .")
    b = _load(spark, "ex:a ex:knows _:y . _:y ex:name \"N\" .")
    assert graph_diff(a, b).count() == 4  # labels differ raw
    assert graph_diff(a, b, canonicalize=True).count() == 0


def test_stats_approx_mode(spark, sf_dir):
    """approx=True (HyperLogLog++) agrees with exact counts within the
    configured relative error on the direct-mapped graph."""
    from oxigraph_spark.operators.stats import (dataset_stats,
                                                predicate_partition)
    from oxigraph_spark.sources.direct_mapping import DirectMappingSource
    quads = DirectMappingSource(spark, sf_dir,
                                tables=["customer", "nation"]).quads()
    exact = dataset_stats(quads).first()
    est = dataset_stats(quads, approx=True, rsd=0.02).first()
    for c in ("triples", "distinct_subjects", "distinct_predicates",
              "distinct_objects"):
        assert abs(est[c] - exact[c]) <= max(2, 0.1 * exact[c]), c
    pp_exact = {r.predicate: r.distinct_subjects
                for r in predicate_partition(quads).collect()}
    pp_est = {r.predicate: r.distinct_subjects
              for r in predicate_partition(quads, approx=True).collect()}
    assert pp_exact.keys() == pp_est.keys()
    for k, v in pp_exact.items():
        assert abs(pp_est[k] - v) <= max(2, 0.1 * v), k


def test_store_profile(spark, sf_dir):
    from oxigraph_spark.store import Store
    st = Store.from_tables(spark, sf_dir, tables=["region", "nation"])
    rep = st.profile("""
        SELECT ?rn (COUNT(*) AS ?n) WHERE {
          ?x <urn:g:nation#ref_region> ?r .
          ?r <urn:g:region#r_name> ?rn
        } GROUP BY ?rn""")
    assert "Scan parquet" in rep
    assert "numOutputRows" in rep
    # aggregation executed: a HashAggregate node reports rows
    assert "HashAggregate" in rep
