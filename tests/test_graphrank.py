"""PageRank / degree stats: NumPy power-iteration oracle, mass
conservation with dangling nodes, and the RDF-graph adapter."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from oxigraph_spark.operators.graphrank import (
    degree_stats, pagerank, pagerank_terms, rdf_edges)

EDGES = [  # Wikipedia's classic example shape + a dangling node (5)
    (0, 1), (1, 2), (2, 0), (2, 1), (3, 2), (4, 2), (4, 0), (0, 5),
]


def numpy_pagerank(edges, n, damping=0.85, iters=20, seeds=None):
    deg = np.zeros(n)
    for s, _ in edges:
        deg[s] += 1
    tele = np.zeros(n)
    if seeds is None:
        tele[:] = 1.0 / n
    else:
        tele[list(seeds)] = 1.0 / len(seeds)
    r = tele.copy()
    for _ in range(iters):
        dangling = r[deg == 0].sum()
        nxt = tele * ((1.0 - damping) + damping * dangling)
        for s, d in edges:
            nxt[d] += damping * r[s] / deg[s]
        r = nxt
    return r


def test_pagerank_matches_power_iteration(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {row["node"]: row["rank"]
           for row in pagerank(df, max_iter=20).collect()}
    want = numpy_pagerank(EDGES, 6)
    assert set(got) == set(range(6))
    for v in range(6):
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_pagerank_mass_conserved_and_checkpointed(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    ranks = pagerank(df, max_iter=9, checkpoint_every=2)
    total = ranks.agg(F.sum("rank")).first()[0]
    assert total == pytest.approx(1.0, abs=1e-9)
    # lineage stays bounded: the plan string must not grow with the
    # iteration count past the last checkpoint (scale invariant)
    assert len(ranks._jdf.queryExecution().logical().toString()) < 20_000


def test_pagerank_no_dangling_fast_path(spark):
    # a 3-cycle: every node has out-degree 1, stationary rank = 1/3
    df = spark.createDataFrame([(0, 1), (1, 2), (2, 0)],
                               "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, max_iter=5).collect()}
    for v in range(3):
        assert got[v] == pytest.approx(1 / 3, abs=1e-12)


def test_parallel_edges_deduped(spark):
    df = spark.createDataFrame([(0, 1), (0, 1), (1, 0)],
                               "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, max_iter=8).collect()}
    want = numpy_pagerank([(0, 1), (1, 0)], 2, iters=8)
    for v in range(2):
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_degree_stats(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node"]: (r["out_deg"], r["in_deg"])
           for r in degree_stats(df).collect()}
    assert got[2] == (2, 3)
    assert got[5] == (0, 1)   # dangling: in only
    assert got[3] == (1, 0)   # source: out only


@pytest.fixture(scope="module")
def link_quads(spark, sf_dir):
    from oxigraph_spark.store import Store
    st = Store.from_tables(spark, sf_dir,
                           tables=["region", "nation", "customer",
                                   "supplier"])
    return st.source.quads()


def test_rdf_graph_ranks(spark, link_quads):
    """Over the FK link graph, regions (the only sinks every chain ends
    in) must out-rank every nation, and nations every customer."""
    quads = link_quads
    ranked = pagerank_terms(quads, max_iter=10).collect()
    rank = {r["iri"]: r["rank"] for r in ranked}
    regions = [v for k, v in rank.items() if ":region/" in k]
    nations = [v for k, v in rank.items() if ":nation/" in k]
    custs = [v for k, v in rank.items() if ":customer/" in k]
    assert regions and nations and custs
    assert min(regions) > max(nations) > max(custs)
    total = sum(rank.values())
    assert total == pytest.approx(1.0, abs=1e-6)


def test_rdf_edges_predicate_filter(spark, link_quads):
    quads = link_quads
    edges, nodes = rdf_edges(quads, "urn:g:nation#ref_region")
    n_nations = quads.where(
        F.col("p")["lex"] == "urn:g:nation#ref_region").count()
    assert edges.count() == n_nations
    # dictionary decodes every endpoint
    ids = edges.select(F.col("src").alias("id")) \
        .unionAll(edges.select(F.col("dst").alias("id"))).distinct()
    assert ids.join(nodes, "id", "leftanti").count() == 0


def test_personalized_pagerank(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node"]: r["rank"]
           for r in pagerank(df, max_iter=15,
                             personalize=[0, 3]).collect()}
    want = numpy_pagerank(EDGES, 6, iters=15, seeds=[0, 3])
    for v in range(6):
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    # mass still conserved; non-reachable-from-seed nodes get ~0
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_random_graph_differential(spark):
    """Three seeded random digraphs (with dangling nodes and parallel
    edges) against the NumPy oracle — the shapes hand-picked cases
    miss."""
    rng = np.random.default_rng(7)
    for trial in range(3):
        n = int(rng.integers(5, 14))
        m = int(rng.integers(n, 4 * n))
        edges = [(int(rng.integers(0, n)), int(rng.integers(0, n)))
                 for _ in range(m)]
        uniq = sorted(set(edges))
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["rank"]
               for r in pagerank(df, max_iter=12).collect()}
        want = numpy_pagerank(uniq, n, iters=12)
        present = {s for s, _ in uniq} | {d for _, d in uniq}
        assert set(got) == present
        # oracle normalizes over n (isolated nodes included); the
        # engine's node set excludes isolated nodes, so compare after
        # renormalizing both over the present set
        w = {v: want[v] for v in present}
        scale = sum(w.values())
        g_total = sum(got.values())
        for v in present:
            assert got[v] / g_total == pytest.approx(w[v] / scale,
                                                     abs=1e-6)


def test_personalized_pagerank_terms(spark, link_quads):
    from oxigraph_spark.operators.graphrank import pagerank_terms
    ranked = pagerank_terms(
        link_quads, "urn:g:nation#ref_region", max_iter=8,
        personalize_iris=["urn:g:nation/0"]).collect()
    rank = {r["iri"]: r["rank"] for r in ranked}
    # the seed and its region hold all the mass; other regions get none
    seed_region = max((k for k in rank if ":region/" in k),
                      key=lambda k: rank[k])
    assert rank["urn:g:nation/0"] > 0.1
    others = [v for k, v in rank.items()
              if ":region/" in k and k != seed_region]
    assert all(v == pytest.approx(0.0, abs=1e-12) for v in others)


def numpy_hits(edges, n, iters=20):
    h = np.full(n, 1.0 / np.sqrt(n))
    a = np.zeros(n)
    for _ in range(iters):
        a = np.zeros(n)
        for s, d in edges:
            a[d] += h[s]
        if a.any():
            a /= np.sqrt((a ** 2).sum())
        h = np.zeros(n)
        for s, d in edges:
            h[s] += a[d]
        if h.any():
            h /= np.sqrt((h ** 2).sum())
    return h, a


def test_hits_matches_oracle(spark):
    from oxigraph_spark.operators.graphrank import hits
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node"]: (r["hub"], r["auth"])
           for r in hits(df, max_iter=12).collect()}
    h, a = numpy_hits(sorted(set(EDGES)), 6, iters=12)
    for v in range(6):
        assert got[v][0] == pytest.approx(h[v], abs=1e-9)
        assert got[v][1] == pytest.approx(a[v], abs=1e-9)
    # node 2 receives from the most hubs: top authority
    assert max(got, key=lambda v: got[v][1]) == 2


def test_connected_components_alias(spark):
    from oxigraph_spark.operators.graphrank import connected_components
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (12, 11)], "src long, dst long")
    got = {r["id"]: r["cluster"]
           for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_personalize_absent_and_duplicate_seeds(spark):
    """Absent seeds renormalize over the present ones (mass stays 1);
    duplicates don't double-weight; all-absent raises."""
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with_ghost = {r["node"]: r["rank"]
                  for r in pagerank(df, max_iter=10,
                                    personalize=[0, 999]).collect()}
    only_zero = {r["node"]: r["rank"]
                 for r in pagerank(df, max_iter=10,
                                   personalize=[0, 0]).collect()}
    want = numpy_pagerank(EDGES, 6, iters=10, seeds=[0])
    for v in range(6):
        assert with_ghost[v] == pytest.approx(want[v], abs=1e-9)
        assert only_zero[v] == pytest.approx(want[v], abs=1e-9)
    assert sum(with_ghost.values()) == pytest.approx(1.0, abs=1e-9)
    with pytest.raises(ValueError):
        pagerank(df, max_iter=3, personalize=[777]).collect()


def test_hits_zero_iters_raises(spark):
    from oxigraph_spark.operators.graphrank import hits
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        hits(df, max_iter=0)


def test_hits_halfstep_plan(spark):
    """Dual-orientation edge persistence (round-5): a half-step joining
    the score vector against an edge frame PRE-PARTITIONED on the join
    key plans exactly ONE Exchange — the (long, double) vector — while
    the mis-oriented frame needs a second, full-edge Exchange."""
    from oxigraph_spark.operators.graphrank import (
        _half_step, _pinned_cache_partitioning)
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with _pinned_cache_partitioning(df):
        e_fwd = df.repartition("src").persist()
        e_rev = e_fwd.repartition("dst").persist()
    e_fwd.count(), e_rev.count()
    scores = spark.createDataFrame([(i, 1.0) for i in range(6)],
                                   "node long, auth double")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def n_shuffles(plan_df):
        plan_df.collect()  # AQE: final plan exists only after execution
        out = []

        def walk(node):
            name = node.nodeName()
            out.append(name)
            if name.startswith("InMemoryTableScan"):
                return
            if name.startswith(("AdaptiveSparkPlan", "ShuffleQueryStage",
                                "BroadcastQueryStage", "ResultQueryStage",
                                "TableCacheQueryStage")):
                for acc in ("executedPlan", "plan"):
                    try:
                        walk(getattr(node, acc)())
                        return
                    except Exception:  # noqa: BLE001 — try next accessor
                        continue
            ch = node.children()
            for i in range(ch.size()):
                walk(ch.apply(i))

        walk(plan_df._jdf.queryExecution().executedPlan())
        return sum(1 for n in out if n.startswith("ShuffleQueryStage"))

    try:
        good = _half_step(e_rev, scores, "dst", "src", "auth")
        bad = _half_step(e_fwd, scores, "dst", "src", "auth")
        # right orientation: vector exchange + the aggregate's own = 2;
        # mis-oriented copy pays an extra full-edge re-shuffle = 3
        assert n_shuffles(good) == 2
        assert n_shuffles(bad) == 3
        got = {r["node"]: r["auth"] for r in good.collect()}
        want = {}
        for s, d in EDGES:
            want[s] = want.get(s, 0.0) + 1.0
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        e_fwd.unpersist()
        e_rev.unpersist()


def test_rdf_edges_uses_persisted_keys(spark, tmp_path, link_quads):
    """rdf_edges over a quad-store scan with 64-bit key sidecars uses
    the persisted ids (no string re-hashing) and yields IRI-level
    PageRank identical to the hash-from-lex path."""
    from oxigraph_spark.operators.graphrank import rdf_edges
    from oxigraph_spark.sources.quad_store import ParquetQuadStore

    path = str(tmp_path / "qsk")
    ParquetQuadStore.write(link_quads, path)          # key_width=64 default
    store = ParquetQuadStore(spark, path)
    scan = store.scan()
    assert dict(scan.dtypes)["s_key"] == "bigint"
    edges_k, nodes_k = rdf_edges(scan)
    # the plan reads the sidecar, not a fresh hash of the lex string
    assert "xxhash64(s_iri" not in edges_k._jdf.queryExecution() \
        .optimizedPlan().toString()

    got_k = {r["iri"]: r["rank"] for r in
             pagerank_terms(scan, max_iter=8).collect()}
    got_h = {r["iri"]: r["rank"] for r in
             pagerank_terms(link_quads, max_iter=8).collect()}
    assert set(got_k) == set(got_h)
    for iri in got_k:
        assert got_k[iri] == pytest.approx(got_h[iri], abs=1e-9)
