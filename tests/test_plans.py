"""Physical-plan shape guards: the scale story as regression tests.
These assert the plan INVARIANTS the engine's design promises —
star-join collapse, pushdown, no cartesian joins — so a refactor that
silently regresses them fails fast (tools/audit_plans.py is the
full-gate version of this)."""

import re

from pyspark.sql import functions as F


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_star_collapse(spark, sf_dir):
    """Flagship Q1: k attributes of one entity = ONE scan, a pushed
    filter, and no more than 2 exchanges (partial+final aggregate)."""
    import __spark_entry__ as E
    df = E.queries()["flagship_q1"](spark, sf_dir)
    plan = _plan(df)
    assert len(re.findall(r"Scan parquet|FileScan parquet", plan)) == 1
    assert "PushedFilters: [" in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange") <= 2


def test_bound_predicate_scan_prunes_columns(spark, sf_dir):
    """A bound-predicate pattern reads exactly the 2 needed columns."""
    import __spark_entry__ as E
    store = E._store(spark, sf_dir)
    df = store.query(E.PFX + "SELECT ?n WHERE { ?x r:r_name ?n }")
    m = re.search(r"ReadSchema: struct<([^>]*)>", _plan(df))
    assert m is not None
    cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
    assert set(cols) <= {"r_regionkey", "r_name"}


def test_dedup_paths_no_cartesian(spark, sf_dir):
    """Every dedup candidate join is bucket/hash keyed, never all-pairs."""
    import __spark_entry__ as E
    for name in ("X_dedup_minhash", "X_dedup_ngram", "X_dedup_simhash",
                 "X_embed_dedup", "X_substring_spans"):
        plan = _plan(E.queries()[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_store_plan_cache_and_invalidation(spark, sf_dir):
    """Round-4 prepared-plan cache: repeated SPARQL text returns the SAME
    compiled DataFrame (no recompile); use_cache=False forces a fresh
    compile; a mutated source (new generation) never serves stale
    plans."""
    from oxigraph_spark.store import Store
    st = Store.from_tables(spark, sf_dir, tables=["region", "nation"])
    q = ("PREFIX r: <urn:g:region#> "
         "SELECT ?n WHERE { ?s r:r_name ?n }")
    d1 = st.query(q)
    d2 = st.query(q)
    assert d1 is d2
    d3 = st.query(q, use_cache=False)
    assert d3 is not d1
    assert sorted(x["n"]["lex"] for x in d1.collect()) \
        == sorted(x["n"]["lex"] for x in d3.collect())

    # mutation bumps the source generation -> cache key changes
    st2 = st.update('INSERT DATA { <urn:g:region/99> '
                    '<urn:g:region#r_name> "NOWHERE" }')
    e1 = st2.query(q)
    assert e1 is st2.query(q)
    before = {x["n"]["lex"] for x in d1.collect()}
    after = {x["n"]["lex"] for x in e1.collect()}
    assert after == before | {"NOWHERE"}
    st3 = st2.update('DELETE DATA { <urn:g:region/99> '
                     '<urn:g:region#r_name> "NOWHERE" }')
    assert {x["n"]["lex"] for x in st3.query(q).collect()} == before


def test_scan_memo_reuses_dataframes(spark, sf_dir):
    """star_scan / filtered scan results are memoized per source — the
    second query over the same shape skips scan re-derivation."""
    from oxigraph_spark.sources.direct_mapping import DirectMappingSource
    src = DirectMappingSource(spark, sf_dir, tables=["customer"])
    a = src.star_scan(["urn:g:customer#c_name", "urn:g:customer#c_acctbal"])
    b = src.star_scan(["urn:g:customer#c_name", "urn:g:customer#c_acctbal"])
    assert a is b
    f = [("gt", 100.0)]
    c = src.scan("urn:g:customer#c_acctbal", native_filters=f)
    d = src.scan("urn:g:customer#c_acctbal", native_filters=list(f))
    assert c is d
    # different filters -> different plan
    e = src.scan("urn:g:customer#c_acctbal", native_filters=[("gt", 5.0)])
    assert e is not c


def test_key_width_64_equivalence(spark, sf_dir):
    """Default compact 64-bit dictionary keys (source.key_width=64,
    SURVEY §1.4 variant): joins, closures, aggregates, MINUS and
    OPTIONAL produce results identical to the 128-bit fallback
    (key_width=128, for ≳10⁹-distinct-term corpora)."""
    from oxigraph_spark.store import Store
    queries = [
        """PREFIX c: <urn:g:customer#> PREFIX n: <urn:g:nation#>
           PREFIX r: <urn:g:region#>
           SELECT ?cn ?rn WHERE { ?c c:c_name ?cn ; c:ref_nation ?n .
             ?n n:ref_region ?r . ?r r:r_name ?rn }""",
        """PREFIX n: <urn:g:nation#>
           SELECT ?a ?b WHERE { ?a (n:ref_region|^n:ref_region)+ ?b }""",
        """PREFIX n: <urn:g:nation#>
           SELECT ?nn WHERE { ?n n:n_name ?nn .
             MINUS { ?n n:n_regionkey 0 } } ORDER BY ?nn LIMIT 5""",
        """PREFIX r: <urn:g:region#> PREFIX n: <urn:g:nation#>
           SELECT ?rn (COUNT(?n) AS ?cnt) WHERE { ?r r:r_name ?rn .
             OPTIONAL { ?n n:ref_region ?r } } GROUP BY ?rn""",
    ]
    st128 = Store.from_tables(spark, sf_dir, key_width=128)
    st64 = Store.from_tables(spark, sf_dir)  # 64 is the default
    for q in queries:
        a = sorted(map(str, st128.query(q).collect()))
        b = sorted(map(str, st64.query(q).collect()))
        assert a == b


def test_quad_store_64bit_keys_roundtrip(spark, sf_dir, tmp_path):
    """write(key_width=64) persists BIGINT sidecars; a Store over the
    64-keyed ParquetQuadStore answers queries correctly."""
    from oxigraph_spark.store import Store
    from oxigraph_spark.sources.quad_store import ParquetQuadStore
    src = Store.from_tables(spark, sf_dir, tables=["region", "nation"])
    p = str(tmp_path / "qs64")
    ParquetQuadStore.write(src.source.quads(), p, key_width=64)
    qs = ParquetQuadStore(spark, p, key_width=64)
    assert dict(qs.scan("urn:g:nation#n_name").dtypes)["s_key"] == "bigint"
    st = Store(spark, qs)
    rows = st.query("""PREFIX n: <urn:g:nation#> PREFIX r: <urn:g:region#>
        SELECT ?nn ?rn WHERE { ?n n:n_name ?nn ; n:ref_region ?r .
                               ?r r:r_name ?rn }""").collect()
    assert len(rows) == 25


def test_pred_card_footer_statistics(spark, sf_dir):
    """pred_card serves parquet-footer row counts with no Spark job and
    orders the relation sizes correctly (lineitem >> nation > region)."""
    from oxigraph_spark.sources.direct_mapping import (
        DirectMappingSource, pred_iri, RDF_TYPE)
    src = DirectMappingSource(spark, sf_dir)
    li = src.pred_card(pred_iri("lineitem", "l_quantity"))
    na = src.pred_card(pred_iri("nation", "n_name"))
    re_ = src.pred_card(pred_iri("region", "r_name"))
    assert li and na and re_ and li > na > re_
    # rdf:type spans every table; unknown predicates have no estimate
    assert src.pred_card(RDF_TYPE) >= li
    assert src.pred_card("urn:nope#p") is None


def test_cardinality_tiebreak_orders_small_relation_first(spark, sf_dir):
    """Equally-bound patterns start from the smaller relation: with
    `?c c:ref_nation ?n . ?n n:n_name ?nm` both patterns carry one
    constant (the predicate), so the statistics tie-break must pick the
    nation pattern (25 rows) before the customer pattern (150 rows at
    sf0.001)."""
    from oxigraph_spark.algebra import parser as P
    from oxigraph_spark.algebra import ast as A
    from oxigraph_spark.sources.direct_mapping import (
        DirectMappingSource, pred_iri, ref_pred_iri)
    from oxigraph_spark.plans.compiler import Compiler
    src = DirectMappingSource(spark, sf_dir)
    comp = Compiler(spark, src)
    pats = [
        A.TriplePattern(A.Var("c"), A.NamedNode(ref_pred_iri(
            "customer", "nation")), A.Var("n")),
        A.TriplePattern(A.Var("n"), A.NamedNode(pred_iri(
            "nation", "n_name")), A.Var("nm")),
    ]
    ordered = comp._order_patterns(pats)
    assert ordered[0].p.iri == pred_iri("nation", "n_name")
    # and the result stays correct end-to-end
    from oxigraph_spark.store import Store
    st = Store(spark, src)
    n = st.query("""
        PREFIX c: <urn:g:customer#> PREFIX n: <urn:g:nation#>
        SELECT ?nm WHERE { ?c c:ref_nation ?n . ?n n:n_name ?nm }
    """).count()
    assert n == src._table_rows("customer")


def test_quad_store_pred_card(spark, sf_dir, tmp_path):
    """The native layout serves per-predicate footer counts too."""
    from oxigraph_spark.sources.quad_store import ParquetQuadStore
    from oxigraph_spark.sources.direct_mapping import (
        DirectMappingSource, pred_iri)
    src = DirectMappingSource(spark, sf_dir, tables=["nation", "region"])
    path = str(tmp_path / "qs")
    ParquetQuadStore.write(src.quads(), path)
    qs = ParquetQuadStore(spark, path)
    na = qs.pred_card(pred_iri("nation", "n_name"))
    re_ = qs.pred_card(pred_iri("region", "r_name"))
    assert na == 25 and re_ == 5
    assert qs.pred_card("urn:nope#p") == 0


def test_const_object_star_collapse(spark, sf_dir):
    """Constant-object members of a subject star (?o o:o_totalprice ?tp ;
    o:o_orderstatus "O") collapse into the SAME scan as native equality
    predicates — no self-join, constant pushed to parquet."""
    import __spark_entry__ as E
    store = E._store(spark, sf_dir)
    df = store.query(E.PFX + """
        SELECT ?o ?tp WHERE { ?o o:o_totalprice ?tp ;
                                 o:o_orderstatus "O" }""", use_cache=False)
    plan = _plan(df)
    assert len(re.findall(r"Scan parquet|FileScan parquet", plan)) == 1
    assert "Join" not in plan
    assert re.search(r"PushedFilters: \[[^\]]*o_orderstatus,O", plan)
    # term semantics survive: results equal the unoptimized path
    from oxigraph_spark.store import Store
    un = Store(spark, store.source, optimize=False)
    q = E.PFX + 'SELECT ?nm WHERE { ?c c:c_mktsegment "BUILDING" ; c:c_name ?nm }'
    a = sorted(r["nm"]["lex"] for r in store.query(q, use_cache=False).collect())
    b = sorted(r["nm"]["lex"] for r in un.query(q, use_cache=False).collect())
    assert a == b and len(a) > 0


def test_const_subject_star_native_point_lookup(spark, sf_dir):
    """A constant-subject star (<urn:g:customer/7> c:c_name ?nm ;
    c:c_acctbal ?b) compiles to ONE scan with the primary key pushed as
    a native EqualTo — a parquet point lookup, not a string comparison
    over concatenated IRIs."""
    import __spark_entry__ as E
    store = E._store(spark, sf_dir)
    df = store.query(E.PFX + """
        SELECT ?nm ?b WHERE { <urn:g:customer/7> c:c_name ?nm ;
                                                 c:c_acctbal ?b }""",
                     use_cache=False)
    plan = _plan(df)
    assert len(re.findall(r"Scan parquet|FileScan parquet", plan)) == 1
    assert "Join" not in plan
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(c_custkey,7\)", plan)
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["nm"]["lex"]


def test_const_object_star_term_semantics(spark, sf_dir):
    """Non-canonical / lang-tagged / type-mismatched constants do NOT
    translate natively — term equality is preserved (they match nothing
    in the direct-mapped graph, same as the unoptimized path)."""
    import __spark_entry__ as E
    store = E._store(spark, sf_dir)
    xsd = "http://www.w3.org/2001/XMLSchema#"
    for q in (
        # non-canonical integer lexical is a DIFFERENT term
        f'SELECT ?o WHERE {{ ?o o:o_orderstatus "O" ; '
        f'o:o_custkey "07"^^<{xsd}integer> }}',
        # lang tag never matches a direct-mapped plain literal
        'SELECT ?nm WHERE { ?c c:c_mktsegment "BUILDING"@en ; c:c_name ?nm }',
        # IRI with a non-numeric key names no row
        'SELECT ?nm WHERE { ?c c:ref_nation <urn:g:nation/xx> ; c:c_name ?nm }',
    ):
        assert store.query(E.PFX + q, use_cache=False).count() == 0, q
    # canonical FK IRI object collapses and matches
    df = store.query(E.PFX + """
        SELECT ?c WHERE { ?c c:ref_nation <urn:g:nation/5> ;
                             c:c_mktsegment "BUILDING" }""", use_cache=False)
    plan = _plan(df)
    assert "Join" not in plan
    assert df.count() > 0


def test_bucketed_quad_store_colocated_join(spark, sf_dir, tmp_path):
    """Subject-bucketed native layout: an s-s join across predicate
    partitions runs with ZERO exchanges (both sides co-located by
    bucket), an FK-chain join shuffles only the probe side, and results
    equal the unbucketed store's."""
    from oxigraph_spark.sources.direct_mapping import DirectMappingSource
    from oxigraph_spark.sources.quad_store import (BucketedQuadStore,
                                                   ParquetQuadStore)
    from oxigraph_spark.store import Store
    src = DirectMappingSource(spark, sf_dir, tables=["customer", "nation"])
    BucketedQuadStore.write_bucketed(src.quads(), "bq_t",
                                     str(tmp_path / "bq"), n_buckets=8)
    bstore = Store(spark, BucketedQuadStore(spark, str(tmp_path / "bq"),
                                            "bq_t"))
    pfx = "PREFIX c: <urn:g:customer#> PREFIX n: <urn:g:nation#>\n"
    q = pfx + "SELECT ?a ?b WHERE { ?x c:c_name ?a . ?x c:c_acctbal ?b }"
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bstore.query(q, use_cache=False)
        assert _plan(df).count("Exchange") == 0
        ParquetQuadStore.write(src.quads(), str(tmp_path / "pq"),
                               key_width=64)
        pstore = Store(spark, ParquetQuadStore(spark, str(tmp_path / "pq"),
                                               key_width=64))
        dfp = pstore.query(q, use_cache=False)
        assert _plan(dfp).count("Exchange") == 2
        key = lambda rows: sorted(
            (r["a"]["lex"], r["b"]["lex"]) for r in rows)
        assert key(df.collect()) == key(dfp.collect())
        fk = pfx + "SELECT ?nm WHERE { ?c c:ref_nation ?n . ?n n:n_name ?nm }"
        dfk = bstore.query(fk, use_cache=False)
        assert _plan(dfk).count("Exchange") == 1  # probe side only
        assert dfk.count() == src._table_rows("customer")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bq_t")


def test_optional_star_fusion(spark, sf_dir):
    """LeftJoin of two same-subject stars over one table fuses into a
    single scan with nullable optional columns (sound because the
    direct mapping is single-valued per predicate): zero joins, and
    results identical to the unoptimized left-join path — including an
    erroring embedded filter (error ⇒ optional unbound, §8.3)."""
    import __spark_entry__ as E
    from oxigraph_spark.store import Store
    store = E._store(spark, sf_dir)
    un = Store(spark, store.source, optimize=False)
    q = E.PFX + """
        SELECT ?nm ?bal WHERE { ?s s:s_name ?nm .
          OPTIONAL { ?s s:s_acctbal ?bal . FILTER(?bal > 4000) } }"""
    df = store.query(q, use_cache=False)
    plan = _plan(df)
    assert "Join" not in plan
    assert len(re.findall(r"Scan parquet|FileScan parquet", plan)) == 1
    key = lambda rows: sorted(
        (r["nm"]["lex"], r["bal"]["lex"] if r["bal"] else None) for r in rows)
    assert key(df.collect()) == key(un.query(q, use_cache=False).collect())
    # bound vs unbound split is real (filter excludes some, not all)
    rows = df.collect()
    bound = sum(1 for r in rows if r["bal"] is not None)
    assert 0 < bound < len(rows)
    # erroring filter ⇒ optional unbound everywhere, rows kept
    qe = E.PFX + """
        SELECT ?nm ?bal WHERE { ?s s:s_name ?nm .
          OPTIONAL { ?s s:s_acctbal ?bal . FILTER(?bal > "abc") } }"""
    re_rows = store.query(qe, use_cache=False).collect()
    assert len(re_rows) == len(rows)
    assert all(r["bal"] is None for r in re_rows)


def test_optional_chain_star_fusion(spark, sf_dir):
    """A CHAIN of OPTIONALs on the same subject/table fuses into one
    scan; a later filter referencing an EARLIER optional var sees its
    post-fusion (unbound-when-unmatched) value, matching nested
    LeftJoin evaluation order."""
    import __spark_entry__ as E
    from oxigraph_spark.store import Store
    store = E._store(spark, sf_dir)
    un = Store(spark, store.source, optimize=False)
    q = E.PFX + """
        SELECT ?p ?st ?tp WHERE { ?o o:o_orderpriority ?p .
          OPTIONAL { ?o o:o_orderstatus ?st . FILTER(?st = "NOPE") }
          OPTIONAL { ?o o:o_totalprice ?tp . FILTER(!BOUND(?st)) } }"""
    df = store.query(q, use_cache=False)
    plan = _plan(df)
    assert "Join" not in plan
    assert len(re.findall(r"Scan parquet|FileScan parquet", plan)) == 1
    key = lambda rows: sorted(
        tuple("N" if r[f] is None else r[f]["lex"] for f in ("p", "st", "tp"))
        for r in rows)
    assert key(df.collect()) == key(un.query(q, use_cache=False).collect())
    # group 1 never matches, so group 2's !BOUND(?st) passes everywhere
    rows = df.collect()
    assert all(r["st"] is None for r in rows)
    assert all(r["tp"] is not None for r in rows)
