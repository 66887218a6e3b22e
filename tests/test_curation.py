"""Corpus-curation operators: stratified sampling, corpus stats,
winnowing overlap detection, sequence packing, streaming dedup."""

import pytest
from pyspark.sql import functions as F

from oxigraph_spark.pipeline.curation import (
    corpus_stats, pack_sequences, stratified_sample, streaming_exact_dedup,
    winnow_fingerprints, winnow_overlap_pairs)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "en" if i % 3 else "de",
             f"document number {i} talks about engines " * (1 + i % 5))
            for i in range(60)]
    return spark.createDataFrame(rows, "id long, lang string, text string")


def test_stratified_sample_cap(corpus):
    out = stratified_sample(corpus, "lang", cap_per_stratum=10, seed=7)
    counts = {r.lang: r.n for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # Bernoulli sampling: expect ≈10 per stratum, never more than input
    assert 0 < counts["en"] <= 20
    assert 0 < counts["de"] <= 20
    # deterministic across runs
    again = stratified_sample(corpus, "lang", cap_per_stratum=10, seed=7)
    assert sorted(r.id for r in out.collect()) == \
        sorted(r.id for r in again.collect())
    with pytest.raises(ValueError):
        stratified_sample(corpus, "lang")


def test_corpus_stats(corpus):
    one = corpus_stats(corpus, "text").collect()
    assert len(one) == 1 and one[0].n_docs == 60
    assert one[0].total_tokens > 0
    assert len(one[0].token_quantiles_50_90_99) == 3
    per = {r.lang: r.n_docs
           for r in corpus_stats(corpus, "text", "lang").collect()}
    assert per == {"en": 40, "de": 20}


def test_winnowing_shared_substring(spark):
    """Docs sharing a long substring share fingerprints; disjoint docs
    share (almost) none — the winnowing guarantee."""
    shared = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [(1, f"intro text alpha. {shared} outro one."),
            (2, f"completely different beginning here; {shared} and more."),
            (3, "unrelated content about spark catalyst optimizer rules")]
    df = spark.createDataFrame(rows, "id long, text string")
    pairs = winnow_overlap_pairs(df, "text", "id", min_shared=3).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]


def test_winnowing_containment(spark):
    """Containment: a short doc fully inside a long one is caught even
    though whole-doc Jaccard similarity is low."""
    inner = "neural networks approximate functions with composed layers"
    long_doc = ("a very long surrounding document " * 20) + inner + \
               (" trailing content of the host document " * 20)
    df = spark.createDataFrame([(1, inner), (2, long_doc)],
                               "id long, text string")
    pairs = winnow_overlap_pairs(df, "text", "id", min_shared=3).collect()
    assert len(pairs) == 1


def test_pack_sequences(spark):
    rows = [(i, 100 + (i * 37) % 500) for i in range(200)] + [(999, 5000)]
    df = spark.createDataFrame(rows, "id long, n_tokens long").repartition(4)
    packs = pack_sequences(df, "id", "n_tokens", max_tokens=2048).collect()
    ids = [i for p in packs for i in p.ids]
    assert sorted(ids) == sorted(r[0] for r in rows)       # every doc packed once
    for p in packs:
        if p.ids != [999]:
            assert p.total_tokens <= 2048
    # packing efficiency: mean fill of multi-doc packs is decent
    fills = [p.total_tokens / 2048 for p in packs if len(p.ids) > 1]
    assert sum(fills) / len(fills) > 0.7


def test_streaming_dedup_batch_mode(spark):
    import datetime
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(1, t0, "same text"), (2, t0, "Same  TEXT!"), (3, t0, "other")]
    df = spark.createDataFrame(rows, "id long, ts timestamp, text string")
    out = streaming_exact_dedup(df, "text")
    assert out.count() == 2


def test_decontaminate_planted_eval_leak(spark):
    """A benchmark question pasted verbatim into a long training doc is
    flagged; clean docs are not."""
    from oxigraph_spark.pipeline.curation import decontaminate
    question = "what is the capital of the ancient kingdom of wessex"
    filler = ("the web page rambles on about travel tips and hotel "
              "reviews and restaurant menus for many tokens ") * 5
    docs = spark.createDataFrame(
        [(1, filler + question + " " + filler),   # contaminated
         (2, filler + "completely unrelated closing paragraph here"),
         (3, "short clean document about something else entirely")],
        "doc_id long, text string")
    bench = spark.createDataFrame([(100, question)], "qid long, text string")
    flagged = decontaminate(docs, bench, min_shared=3)
    ids = {r.id for r in flagged.collect()}
    assert ids == {1}
    row = flagged.collect()[0]
    assert row.shared_fps >= 3


def test_sample_to_token_budget(spark):
    from pyspark.sql import Row, functions as F
    from oxigraph_spark.pipeline.curation import sample_to_token_budget
    rows = ([Row(doc_id=i, src="web", n_tok=100) for i in range(1000)]
            + [Row(doc_id=10_000 + i, src="wiki", n_tok=100)
               for i in range(50)])
    df = spark.createDataFrame(rows)
    # 50/50 weights with a 40k budget: web wants 20k of its 100k
    # (downsample ~0.2), wiki wants 20k of its 5k (upsample 4x exactly)
    out = sample_to_token_budget(df, "n_tok", "src", 40_000,
                                 weights={"web": 1.0, "wiki": 1.0},
                                 seed=7).cache()
    got = {r["src"]: r["t"] for r in
           out.groupBy("src").agg(F.sum("n_tok").alias("t")).collect()}
    assert got["wiki"] == 20_000          # exact 4 whole copies
    assert 14_000 < got["web"] < 26_000   # Bernoulli ~20k
    assert set(out.columns) == {"doc_id", "src", "n_tok"}
    # deterministic
    again = sample_to_token_budget(df, "n_tok", "src", 40_000,
                                   weights={"web": 1.0, "wiki": 1.0},
                                   seed=7)
    assert again.count() == out.count()
    # proportional default keeps shares
    prop = sample_to_token_budget(df, "n_tok", "src", 21_000)
    shares = {r["src"]: r["t"] for r in
              prop.groupBy("src").agg(F.sum("n_tok").alias("t")).collect()}
    # 5k/105k of 21k = 1k target, Bernoulli at fraction 0.2
    assert 300 <= shares.get("wiki", 0) <= 1700


def test_leakage_safe_split(spark):
    from pyspark.sql import Row, functions as F
    from oxigraph_spark.pipeline.curation import leakage_safe_split
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i}") for i in range(2000)])
    # plant near-dup pairs: i <-> i+1000 for i in [0, 500)
    pairs = spark.createDataFrame(
        [Row(id_a=i, id_b=i + 1000) for i in range(500)])
    out = leakage_safe_split(docs, pairs, "doc_id",
                             {"train": 0.8, "val": 0.1, "test": 0.1},
                             seed=3).cache()
    assert out.count() == 2000
    # near-duplicates never straddle splits
    a = out.select(F.col("doc_id").alias("id_a"),
                   F.col("split").alias("sa"))
    b = out.select(F.col("doc_id").alias("id_b"),
                   F.col("split").alias("sb"))
    straddle = pairs.join(a, "id_a").join(b, "id_b") \
                    .where(F.col("sa") != F.col("sb"))
    assert straddle.count() == 0
    # fractions roughly honored over clusters
    shares = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert shares["train"] > 1200 and shares["val"] > 50
    # deterministic under the same seed
    again = leakage_safe_split(docs, pairs, "doc_id",
                               {"train": 0.8, "val": 0.1, "test": 0.1},
                               seed=3)
    assert again.where(F.col("split") == "train").count() \
        == out.where(F.col("split") == "train").count()


def test_chunk_documents_chars(spark):
    from oxigraph_spark.pipeline.curation import chunk_documents
    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xy"), (3, ""), (4, None)],
        "doc_id long, text string")
    out = chunk_documents(df, size=4, overlap=1).orderBy(
        "doc_id", "chunk_id").collect()
    got = [(r.doc_id, r.chunk_id, r.chunk_start, r.chunk_text) for r in out]
    # step=3: starts 0,3,6,9 -> 'abcd','defg','ghij','j'
    assert got == [(1, 0, 0, "abcd"), (1, 1, 3, "defg"),
                   (1, 2, 6, "ghij"), (1, 3, 9, "j"),
                   (2, 0, 0, "xy")]
    # overlap property: consecutive chunks share `overlap` chars
    assert got[0][3][-1] == got[1][3][0]


def test_chunk_documents_tokens(spark):
    from oxigraph_spark.pipeline.curation import chunk_documents
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "  one   two  ")],
        "doc_id long, text string")
    out = chunk_documents(df, size=3, overlap=1, by="tokens").orderBy(
        "doc_id", "chunk_id").collect()
    got = [(r.doc_id, r.chunk_id, r.chunk_text) for r in out]
    # step=2: starts 0,2,4,6 -> 'a b c','c d e','e f g','g'
    assert got == [(1, 0, "a b c"), (1, 1, "c d e"), (1, 2, "e f g"),
                   (1, 3, "g"), (2, 0, "one two")]


def test_chunk_documents_no_python_in_plan(spark):
    """Chunking stays JVM-side: no BatchEvalPython / ArrowEvalPython in
    the physical plan (the 100 TB scan-speed property)."""
    from oxigraph_spark.pipeline.curation import chunk_documents
    df = spark.createDataFrame([(1, "hello world")],
                               "doc_id long, text string")
    out = chunk_documents(df, size=5, overlap=2)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted")
    assert "EvalPython" not in plan


def test_domain_authority(spark):
    """Hyperlink pairs → domain PageRank: heavily-cited domain wins;
    intra-domain links and invalid hosts are ignored."""
    from oxigraph_spark.pipeline.urls import domain_authority
    links = [
        ("http://a.com/1", "https://www.hub.co.uk/x"),
        ("http://b.org/2", "https://hub.co.uk/y"),
        ("http://c.net/3", "http://hub.co.uk/z"),
        ("http://hub.co.uk/a", "http://a.com/1"),
        ("http://a.com/5", "http://a.com/6"),      # intra-domain: dropped
        ("not a url", "http://a.com/1"),           # invalid src: dropped
    ]
    df = spark.createDataFrame(links, "src_url string, dst_url string")
    got = domain_authority(df, max_iter=20).collect()
    ranks = {r["domain"]: r["rank"] for r in got}
    assert set(ranks) == {"a.com", "b.org", "c.net", "hub.co.uk"}
    assert max(ranks, key=ranks.get) == "hub.co.uk"
    # www. and scheme/port variations collapsed into one domain node
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)


@pytest.mark.slow
def test_curate_corpus_end_to_end(spark, sf_dir):
    """The composed pipeline over the real documents table doubled with
    shifted ids (every original therefore has one exact duplicate):
    stage counts are monotone, exact dups all collapse, the mix
    respects the token budget."""
    from pyspark.sql import functions as F
    from oxigraph_spark.pipeline.curation import curate_corpus
    from oxigraph_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text", "source")
    n = docs.count()
    shifted = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    corpus = docs.unionByName(shifted)

    stages = curate_corpus(corpus, strata_col="source",
                           budget_tokens=5_000)
    kept = stages["kept"].count()
    exact = stages["exact"].count()
    curated = stages["curated"].count()
    assert kept <= 2 * n
    # every kept original's planted twin collapses in the exact stage
    assert exact == kept // 2
    assert 0 < curated <= exact
    # curated frame keeps the original columns + token_count
    assert set(stages["curated"].columns) == {
        "doc_id", "text", "source", "token_count"}
    mix = stages["mix"]
    total = mix.agg(F.sum("token_count")).first()[0]
    assert total <= 5_000 * 1.5     # sampling approaches, never explodes
    # deterministic: same seed, same mix
    again = curate_corpus(corpus, strata_col="source",
                          budget_tokens=5_000)["mix"]
    assert sorted(r["doc_id"] for r in mix.select("doc_id").collect()) \
        == sorted(r["doc_id"] for r in again.select("doc_id").collect())


def test_curate_corpus_validates(spark, sf_dir):
    import pytest as _pytest
    from oxigraph_spark.pipeline.curation import curate_corpus
    from oxigraph_spark.sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    with _pytest.raises(ValueError):
        curate_corpus(docs, budget_tokens=100)   # no strata_col
