"""LLM-data-pipeline operators (SURVEY.md §2.11): planted-duplicate
recall for every dedup family, hot-bucket guard, ANN self-retrieval —
the UNFILTERED operator outputs (the gate entries project onto their
oracle-provable subsets; these tests cover the full surface)."""

import pytest
from pyspark.sql import functions as F

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "pack my box with five dozen liquor jugs for the long trip home"),
    (3, "sphinx of black quartz judge my vow said the old librarian"),
    (4, "a completely different sentence about distributed query engines"),
]


@pytest.fixture(scope="module")
def doubled(spark):
    df = spark.createDataFrame(DOCS, "id long, text string")
    return df.unionByName(
        df.withColumn("id", F.col("id") + 100))


def test_minhash_planted_recall(doubled):
    from oxigraph_spark.pipeline.dedup import minhash_lsh_pairs
    pairs = minhash_lsh_pairs(doubled, "text", "id",
                              num_perm=16, bands=4, threshold=0.5)
    got = {(r.id_a, r.id_b): r.sim for r in pairs.collect()}
    for i, _ in DOCS:
        assert got.get((i, i + 100)) == 1.0  # every planted dup, sim 1.0


def test_minhash_hot_bucket_cap(spark):
    from oxigraph_spark.pipeline.dedup import minhash_lsh_pairs
    # 30 identical docs = one 30-doc bucket per band → 435 pairs uncapped
    df = spark.createDataFrame(
        [(i, "same text everywhere forever and ever amen") for i in range(30)]
        + [(100, "another unique document"), (200, "another unique document")],
        "id long, text string")
    uncapped = minhash_lsh_pairs(df, "text", "id", num_perm=16, bands=4)
    capped = minhash_lsh_pairs(df, "text", "id", num_perm=16, bands=4,
                               max_bucket=10)
    assert uncapped.count() == 435 + 1
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(100, 200)}  # hot bucket dropped, small bucket kept


def test_minhash_degenerate_family_prefilter(spark):
    """Round-8: a DEGENERATE identical-text family is removed by the
    sampled pre-filter (broadcast anti-join) BEFORE the exact window,
    and the result is identical to the window-only guard: hot family
    gone, cold pairs intact.  prefilter_sample=1.0 makes the estimate
    exact so the 2k-row family deterministically triggers at test
    scale (at 100 TB the default 1% sample sees thousands of rows of
    any straggler-sized family)."""
    from oxigraph_spark.pipeline.dedup import (_band_buckets,
                                               _hot_bucket_keys,
                                               minhash_lsh_pairs,
                                               minhash_signatures)
    n_fam = 2000
    df = spark.createDataFrame(
        [(i, "boilerplate header repeated on every single page")
         for i in range(n_fam)]
        + [(100000, "another unique document"),
           (200000, "another unique document")],
        "id long, text string")
    capped = minhash_lsh_pairs(df, "text", "id", num_perm=16, bands=4,
                               max_bucket=10, prefilter_sample=1.0)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(100000, 200000)}
    # the pre-filter itself flags the family's bucket keys (all 4 bands)
    sig = minhash_signatures(df, "text", "id", num_perm=16)
    buckets = _band_buckets(sig, 16, 4)
    hot = _hot_bucket_keys(buckets, max_bucket=10, frac=1.0)
    assert hot.count() >= 4
    # and at the default 1% sample the same family still triggers
    hot_sampled = _hot_bucket_keys(buckets, max_bucket=10, frac=0.01)
    assert hot_sampled.count() >= 1


def test_simhash_planted_recall(doubled):
    from oxigraph_spark.pipeline.dedup import simhash_pairs
    pairs = simhash_pairs(doubled, "text", "id", max_hamming=3)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    for i, _ in DOCS:
        assert got.get((i, i + 100)) == 0


def test_simhash_hot_bucket_cap(spark):
    from oxigraph_spark.pipeline.dedup import simhash_pairs
    # 30 identical docs share every 16-bit chunk bucket → 435 pairs
    # uncapped; the cold 2-doc pair must survive the cap
    df = spark.createDataFrame(
        [(i, "same text everywhere forever and ever amen") for i in range(30)]
        + [(100, "another unique document entirely"),
           (200, "another unique document entirely")],
        "id long, text string")
    uncapped = simhash_pairs(df, "text", "id", max_hamming=3)
    capped = simhash_pairs(df, "text", "id", max_hamming=3, max_bucket=10)
    assert uncapped.count() == 435 + 1
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(100, 200)}


def test_ngram_jaccard_exact(doubled):
    from oxigraph_spark.pipeline.dedup import ngram_jaccard_pairs
    pairs = ngram_jaccard_pairs(doubled, "text", "id", n=3, threshold=0.9,
                                max_doc_freq=None)
    got = {(r.id_a, r.id_b): r.sim for r in pairs.collect()}
    for i, _ in DOCS:
        assert got.get((i, i + 100)) == 1.0


def test_ngram_jaccard_hot_shingle_cap(spark):
    from oxigraph_spark.pipeline.dedup import ngram_jaccard_pairs
    # 30 identical docs: every shingle has doc-frequency 30 → dropped
    # from the inverted index under the cap, so none of their 435 pairs
    # reach the join; the 2-doc pair's shingles (df=2) survive with
    # exact sim because set sizes are computed before the filter
    df = spark.createDataFrame(
        [(i, "same boilerplate header on every single page")
         for i in range(30)]
        + [(100, "xylophone quartz vibrant melody drifts softly tonight"),
           (200, "xylophone quartz vibrant melody drifts softly tonight")],
        "id long, text string")
    uncapped = ngram_jaccard_pairs(df, "text", "id", n=3, threshold=0.9,
                                   max_doc_freq=None)
    capped = ngram_jaccard_pairs(df, "text", "id", n=3, threshold=0.9,
                                 max_doc_freq=10)
    assert uncapped.count() == 435 + 1
    got = {(r.id_a, r.id_b): r.sim for r in capped.collect()}
    assert got == {(100, 200): 1.0}


def test_embedding_dedup_and_ann(spark):
    from oxigraph_spark.pipeline.dedup import embedding_cosine_pairs
    from oxigraph_spark.pipeline.simsearch import (brute_force_topk,
                                                   lsh_index, lsh_topk)
    vecs = [(i, [float((i * 7 + d * 3) % 11) - 5.0 for d in range(8)])
            for i in range(20)]
    df = spark.createDataFrame(vecs, "id long, vec array<float>")
    both = df.unionByName(df.withColumn("id", F.col("id") + 100))
    pairs = embedding_cosine_pairs(both, "vec", "id",
                                   threshold=0.9999, planes=6)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert all((i, i + 100) in got for i in range(20))
    # ANN self-retrieval agrees with brute force on the top hit
    q = vecs[3][1]
    exact = brute_force_topk(df, "vec", "id", q, k=3).collect()
    assert exact[0].id == 3 and abs(exact[0].sim - 1.0) < 1e-9
    ann = lsh_topk(lsh_index(df, "vec", "id", planes=6), q,
                   k=3, planes=6, multiprobe=1).collect()
    assert ann[0].id == 3


def test_embedding_hot_bucket_cap(spark):
    from oxigraph_spark.pipeline.dedup import embedding_cosine_pairs
    # 30 identical vectors share one hyperplane bucket (435 pairs
    # uncapped); the opposite-direction pair flips every plane's sign,
    # landing in a different, cold bucket that survives the cap
    rows = [(i, [1.0 + 0.1 * d for d in range(8)]) for i in range(30)] \
        + [(100, [-1.0 - 0.1 * d for d in range(8)]),
           (200, [-1.0 - 0.1 * d for d in range(8)])]
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    uncapped = embedding_cosine_pairs(df, "vec", "id", threshold=0.9999,
                                      planes=6)
    capped = embedding_cosine_pairs(df, "vec", "id", threshold=0.9999,
                                    planes=6, max_bucket=10)
    assert uncapped.count() == 435 + 1
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(100, 200)}


def test_ivf_ann(spark):
    """IVF index/probe: deterministic centroids, partition-pruned probe,
    self-retrieval agreement with brute force."""
    from oxigraph_spark.pipeline.simsearch import (brute_force_topk,
                                                   ivf_index, ivf_topk)
    vecs = [(i, [float((i * 13 + d * 5) % 17) - 8.0 for d in range(8)])
            for i in range(40)]
    df = spark.createDataFrame(vecs, "id long, vec array<float>")
    idx = ivf_index(df, "vec", "id", n_centroids=8)
    assert idx.select("centroid_id").distinct().count() <= 8
    assert idx.count() == 40  # every vector assigned exactly once
    q = vecs[7][1]
    ann = ivf_topk(idx, q, k=3, nprobe=3).collect()
    assert ann[0].id == 7 and abs(ann[0].sim - 1.0) < 1e-9
    exact = brute_force_topk(df, "vec", "id", q, k=3).collect()
    assert ann[0].id == exact[0].id
    # probing ALL lists must equal exact brute force
    full = ivf_topk(idx, q, k=5, nprobe=8).collect()
    exact5 = brute_force_topk(df, "vec", "id", q, k=5).collect()
    assert [r.id for r in full] == [r.id for r in exact5]


def test_multimodal_plumbing(spark):
    """Binary media columns: attach → feature-extract → resize →
    frame-sample; decode is a marked stub, the Spark plumbing (schemas,
    Arrow batches, payload round trip) is real."""
    from oxigraph_spark.pipeline.multimodal import (attach_binary,
                                                    extract_features,
                                                    frame_sample_stub, resize)
    df = spark.createDataFrame(
        [(1, "some media payload"), (2, "x" * 500)], "id long, text string")
    media = attach_binary(df, "text", "id")
    feats = {r.media_id: r for r in extract_features(media).collect()}
    assert feats[1].n_bytes == 18 and len(feats[1].checksum) == 64
    assert 1 <= feats[2].width <= 1920 and 1 <= feats[2].height <= 1080
    small = {r.media_id: r for r in resize(media, 8, 4).collect()}
    assert len(small[1].content) == 32 and len(small[2].content) == 32
    assert small[1].mime == "image/resized;8x4"
    frames = frame_sample_stub(media, every_n=10).collect()
    assert all(r.frame_no % 10 == 0 for r in frames)
    assert len({r.media_id for r in frames}) == 2


def test_text_stats_basics(spark):
    from oxigraph_spark.pipeline.textstats import text_stats
    df = spark.createDataFrame(
        [(1, "The quick brown fox."), (2, "")], "id long, text string")
    rows = {r.id: r for r in text_stats(df, "text", "id").collect()}
    assert rows[1].n_tokens == 4
    assert rows[1].lang_guess == "en"
    assert rows[2].n_tokens == 0 and rows[2].quality < 0.5
    assert rows[1].fp != rows[2].fp


def test_dedup_clusters_transitive(spark):
    """Connected components over pairs: chains merge transitively, min id
    labels the cluster, non-paired docs are singletons."""
    from oxigraph_spark.pipeline.dedup import assign_clusters, dedup_clusters
    # two components: {1,2,3,4} via a chain, {10,11}; 20 isolated
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long")
    labs = {r.id: r.cluster for r in dedup_clusters(pairs).collect()}
    assert labs == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 4, 10, 11, 20)],
        "id long, text string")
    out = assign_clusters(docs, pairs).collect()
    got = {r.id: (r.cluster, r.is_duplicate) for r in out}
    assert got[20] == (20, False)          # singleton
    assert got[1] == (1, False)            # representative
    assert got[4] == (1, True)
    assert got[11] == (10, True)


def test_dedup_clusters_long_chain(spark):
    """A path graph of diameter 12 still converges (label propagation
    rounds ≤ CC_MAX_ROUNDS)."""
    from oxigraph_spark.pipeline.dedup import dedup_clusters
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long")
    labs = dedup_clusters(pairs).collect()
    assert {r.cluster for r in labs} == {0}
    assert len(labs) == 13


def test_minhash_to_clusters_end_to_end(doubled):
    """minhash pairs → clusters: each planted duplicate pair becomes one
    two-member cluster whose representative is the original id."""
    from oxigraph_spark.pipeline.dedup import assign_clusters, minhash_lsh_pairs
    pairs = minhash_lsh_pairs(doubled, "text", "id")
    out = assign_clusters(doubled, pairs)
    kept = out.where(~F.col("is_duplicate"))
    dups = out.where(F.col("is_duplicate"))
    assert kept.count() == 4 and dups.count() == 4
    assert {r.cluster for r in dups.collect()} == {1, 2, 3, 4}


def test_minhash_incremental_vs_corpus(spark):
    """Incremental dedup: a new batch checked against a persisted corpus
    SIGNATURE table — exact re-ingests and within-batch dups are both
    recovered, corpus text never consulted."""
    from oxigraph_spark.pipeline.dedup import (
        minhash_lsh_pairs_incremental, minhash_signatures)
    corpus = spark.createDataFrame(DOCS, "id long, text string")
    corpus_sig = minhash_signatures(corpus, "text", "id",
                                    num_perm=16)
    # the new batch re-ingests docs 1 and 3 (shifted ids), adds one fresh
    # doc and one within-batch duplicate pair (201/202)
    new = spark.createDataFrame(
        [(201, DOCS[0][1]), (202, DOCS[0][1]), (203, DOCS[2][1]),
         (204, "entirely novel content never seen before by anyone")],
        "id long, text string")
    pairs = minhash_lsh_pairs_incremental(
        new, corpus_sig, "text", "id", num_perm=16, bands=4, threshold=0.5)
    got = {(r.id_a, r.id_b): r.sim for r in pairs.collect()}
    assert got.get((201, 1)) == 1.0      # new vs corpus
    assert got.get((202, 1)) == 1.0
    assert got.get((203, 3)) == 1.0
    assert got.get((201, 202)) == 1.0    # within-batch
    assert all(a in (201, 202, 203) for a, _ in got)  # 204 matches nothing


def test_minhash_incremental_id_collision_prefers_new(spark):
    """Re-ingest with CHANGED text under the same id: the new batch's
    signature must win deterministically (corpus side anti-joined
    against new ids), so sims reflect the new text."""
    from oxigraph_spark.pipeline.dedup import (
        minhash_lsh_pairs_incremental, minhash_signatures)
    corpus = spark.createDataFrame(DOCS, "id long, text string")
    corpus_sig = minhash_signatures(corpus, "text", "id", num_perm=16)
    # id 2 re-ingested with doc 1's text; id 300 is a fresh copy of the
    # SAME text — (300, 2) must score against the NEW text (sim 1.0),
    # not the stale corpus signature for id 2 (sim ~0)
    new = spark.createDataFrame(
        [(2, DOCS[0][1]), (300, DOCS[0][1])], "id long, text string")
    pairs = minhash_lsh_pairs_incremental(
        new, corpus_sig, "text", "id", num_perm=16, bands=4, threshold=0.5)
    got = {(r.id_a, r.id_b): r.sim for r in pairs.collect()}
    assert got.get((2, 300)) == 1.0 or got.get((300, 2)) == 1.0
    # and both new docs match corpus doc 1 (unchanged text) exactly
    assert got.get((2, 1)) == 1.0
    assert got.get((300, 1)) == 1.0


def test_l2_normalize_and_quantize(spark):
    from pyspark.sql import Row, functions as F
    from oxigraph_spark.pipeline.simsearch import (dequantize_int8,
                                                   l2_normalize, norm,
                                                   quantize_int8)
    df = spark.createDataFrame([Row(id=1, vec=[3.0, 4.0]),
                                Row(id=2, vec=[0.0, 0.0])])
    normed = l2_normalize(df, "vec").collect()
    v1 = [r for r in normed if r["id"] == 1][0]["vec"]
    assert abs(v1[0] - 0.6) < 1e-9 and abs(v1[1] - 0.8) < 1e-9
    assert [r for r in normed if r["id"] == 2][0]["vec"] == [0.0, 0.0]
    q = quantize_int8(df, "vec")
    rows = {r["id"]: r for r in q.collect()}
    assert rows[1]["vec_q8"] == [95, 127]  # 3/ (4/127) = 95.25 -> 95
    back = dequantize_int8(q, out_col="vec2").collect()
    r1 = [r for r in back if r["id"] == 1][0]
    assert abs(r1["vec2"][1] - 4.0) < 1e-6


def test_knn_join_planted_neighbors(spark, sf_dir):
    from pyspark.sql import functions as F
    from oxigraph_spark.pipeline.simsearch import knn_join
    from oxigraph_spark.sources.tables import load_table
    emb = load_table(spark, sf_dir, "embeddings") \
        .select("vec_id", "embedding").limit(200)
    both = emb.unionByName(
        emb.withColumn("vec_id", F.col("vec_id") + 1000000))
    out = knn_join(both, "embedding", "vec_id", k=3, planes=4).cache()
    # identical planted vector must be every doc's rank-1 neighbor
    top1 = out.where(F.col("rk") == 1)
    planted = top1.where(
        (F.col("nbr") == F.col("id") + 1000000)
        | (F.col("id") == F.col("nbr") + 1000000))
    n_ids = both.count()
    assert top1.count() == n_ids
    assert planted.count() == n_ids
    assert planted.where(F.col("sim") < 0.999999).count() == 0
    # hot-bucket cap bounds the candidate volume
    capped = knn_join(both, "embedding", "vec_id", k=3, planes=1,
                      max_bucket=10)
    assert capped.count() == 0 or capped.count() < out.count()


def test_kmeans_clusters_separates_planted_groups(spark):
    """Two well-separated direction bundles → 2 clusters, members
    co-assigned, high cosine to own centroid."""
    from oxigraph_spark.pipeline.simsearch import kmeans_clusters
    import random
    rng = random.Random(7)
    rows = []
    for i in range(30):  # bundle A: +x-ish, bundle B: +y-ish
        a = [10.0 + rng.uniform(-1, 1), rng.uniform(-1, 1),
             rng.uniform(-1, 1)]
        b = [rng.uniform(-1, 1), 10.0 + rng.uniform(-1, 1),
             rng.uniform(-1, 1)]
        rows.append((i, a))
        rows.append((100 + i, b))
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    out = kmeans_clusters(df, "vec", "id", k=2, iters=3).collect()
    assert len(out) == 60
    cids_a = {r.cid for r in out if r.id < 100}
    cids_b = {r.cid for r in out if r.id >= 100}
    assert len(cids_a) == 1 and len(cids_b) == 1 and cids_a != cids_b
    assert all(r.ccos > 0.9 for r in out)


def test_semantic_dedup_planted_pairs(spark, sf_dir):
    """SemDeDup property oracle: doubled corpus (identical vectors,
    shifted ids) → every planted pair shares one duplicate group with
    exactly one keeper; the keeper is the min id (identical ccos)."""
    from pyspark.sql import functions as F
    from oxigraph_spark.pipeline.dedup import semantic_dedup
    from oxigraph_spark.sources.tables import load_table
    emb = load_table(spark, sf_dir, "embeddings") \
        .select("vec_id", "embedding").limit(120)
    both = emb.unionByName(
        emb.withColumn("vec_id", F.col("vec_id") + 1000000))
    out = semantic_dedup(both, "embedding", "vec_id", n_clusters=4,
                         threshold=0.999999, iters=2).cache()
    n = out.count()
    assert n == both.count()
    # every planted pair: same group, one keep
    joined = (out.alias("x").join(
        out.alias("y"),
        F.col("x.id") + 1000000 == F.col("y.id")))
    assert joined.where(F.col("x.group") != F.col("y.group")).count() == 0
    per_group = out.groupBy("group").agg(
        F.sum(F.col("keep").cast("int")).alias("keeps"))
    assert per_group.where(F.col("keeps") != 1).count() == 0
    # keepers of planted pairs are the original (min) ids
    kept_planted = (joined.where(F.col("x.keep").cast("int") +
                                 F.col("y.keep").cast("int") == 1)
                          .where(F.col("y.keep")))
    assert kept_planted.count() == 0
    # hot-cluster cap: everything capped out → all singleton keepers
    capped = semantic_dedup(both, "embedding", "vec_id", n_clusters=2,
                            threshold=0.999999, iters=1, max_cluster=3)
    assert capped.where(~F.col("keep")).count() == 0


def test_ngram_jaccard_guard_default_on():
    """VERDICT r6 item 5: the doc-frequency skew guard is the DEFAULT
    (unguarded all-pairs is opt-in via max_doc_freq=None)."""
    import inspect
    from oxigraph_spark.pipeline.dedup import ngram_jaccard_pairs
    d = inspect.signature(ngram_jaccard_pairs).parameters["max_doc_freq"]
    assert d.default == 1000
