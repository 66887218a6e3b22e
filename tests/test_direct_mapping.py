from pyspark.sql import functions as F

from oxigraph_spark.model import terms as T
from oxigraph_spark.sources.direct_mapping import DirectMappingSource, pred_iri, ref_pred_iri


def test_predicate_frames_cover_columns(spark, sf_dir):
    src = DirectMappingSource(spark, sf_dir)
    preds = src.predicates()
    assert pred_iri("lineitem", "l_quantity") in preds
    assert pred_iri("customer", "c_name") in preds
    assert ref_pred_iri("orders", "customer") in preds
    # embeddings (array col) intentionally unmapped
    assert not any("embedding#" in p for p in preds)


def test_region_quads_values(spark, sf_dir):
    src = DirectMappingSource(spark, sf_dir, tables=["region"])
    df = src.scan(pred_iri("region", "r_name"))
    rows = df.collect()
    assert len(rows) == 5
    r = rows[0]
    assert r.s.kind == T.KIND_IRI and r.s.lex.startswith("urn:g:region/")
    assert r.o.kind == T.KIND_LITERAL and r.o.datatype == T.XSD_STRING
    assert r.g.kind == T.KIND_DEFAULT_GRAPH


def test_int_literal_payload(spark, sf_dir):
    src = DirectMappingSource(spark, sf_dir, tables=["part"])
    df = src.scan(pred_iri("part", "p_size"))
    row = df.orderBy(F.col("s.lex")).first()
    assert row.o.datatype == T.XSD_INTEGER
    assert row.o.num == int(row.o.lex)


def test_fk_object_is_subject_iri(spark, sf_dir):
    src = DirectMappingSource(spark, sf_dir, tables=["orders", "customer"])
    fk = src.scan(ref_pred_iri("orders", "customer"))
    subj = src.scan(pred_iri("customer", "c_name")).select("s")
    joined = fk.join(subj, T.term_key(fk.o).eqNullSafe(T.term_key(subj.s)))
    assert joined.count() == fk.count()


def test_unbound_predicate_scan_unions_all(spark, sf_dir):
    src = DirectMappingSource(spark, sf_dir, tables=["region", "nation"])
    n = src.scan().count()
    # region: 2 cols * 5 rows; nation: 3 cols * 25 + 25 fk rows; plus one
    # rdf:type triple per row (W3C direct mapping): 5 + 25
    assert n == 10 + 75 + 25 + 30


def test_missing_predicate_scan_empty(spark, sf_dir):
    src = DirectMappingSource(spark, sf_dir, tables=["region"])
    assert src.scan("urn:g:nope#x").count() == 0


def test_rdf_type_triples(spark, sf_dir):
    """W3C direct mapping: every row gets `<row> a <table>` — `?x a ?t`
    and the VoID class partition read these."""
    from oxigraph_spark.store import Store
    st = Store.from_tables(spark, sf_dir, tables=["region", "nation"])
    rows = st.query(
        "SELECT ?t (COUNT(*) AS ?n) WHERE { ?x a ?t } GROUP BY ?t"
    ).collect()
    got = {r["t"]["lex"]: r["n"]["num"] for r in rows}
    assert {k: int(v) for k, v in got.items()} == {
        "urn:g:region": 5, "urn:g:nation": 25}
