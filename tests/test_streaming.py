"""True Structured Streaming execution: the SAME windowed transforms that
the gate checks in batch mode run under readStream with availableNow
trigger, and the streamed result must equal the batch result."""

import pytest
from pyspark.sql import functions as F

from oxigraph_spark.sources.tables import load_table
from oxigraph_spark.streaming.events import (stream_events, tumbling_counts,
                                             sliding_counts)

SF = "/root/testdata/sf0.001"


def _run_stream(df, name):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q


def test_tumbling_stream_equals_batch(spark):
    batch = tumbling_counts(load_table(spark, SF, "events"), "15 minutes")
    expected = {(r.win_start, r.event_type): (r.cnt, r.sum_value)
                for r in batch.collect()}

    stream = tumbling_counts(stream_events(spark, SF), "15 minutes")
    assert stream.isStreaming
    _run_stream(stream, "tumbling_t")
    got = {(r.win_start, r.event_type): (r.cnt, r.sum_value)
           for r in spark.table("tumbling_t").collect()}
    assert got == expected


def test_sliding_stream_equals_batch(spark):
    batch = sliding_counts(load_table(spark, SF, "events"),
                           "30 minutes", "15 minutes")
    expected = {r.win_start: r.cnt for r in batch.collect()}
    stream = sliding_counts(stream_events(spark, SF),
                            "30 minutes", "15 minutes")
    _run_stream(stream, "sliding_t")
    got = {r.win_start: r.cnt for r in spark.table("sliding_t").collect()}
    assert got == expected


@pytest.mark.slow
def test_stateful_stream_runs(spark):
    """applyInPandasWithState executes under a real stream."""
    from oxigraph_spark.streaming.events import stateful_running_sum
    stream = stateful_running_sum(stream_events(spark, SF))
    assert stream.isStreaming
    q = (stream.writeStream.format("memory").queryName("stateful_t")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.table("stateful_t").collect()
    assert len(rows) > 0
    batch = {r.user_id: (r.running_sum, r.n)
             for r in stateful_running_sum(
                 load_table(spark, SF, "events")).collect()}
    streamed = {r.user_id: (r.running_sum, r.n) for r in rows}
    assert streamed == batch


def test_stream_stream_join_equals_batch(spark):
    """correlate_events under two real watermarked streams matches the
    identical batch range join."""
    from oxigraph_spark.streaming.events import correlate_events
    ev = load_table(spark, SF, "events")
    clicks_b = ev.where(F.col("event_type") == "click")
    views_b = ev.where(F.col("event_type") == "view")
    batch = correlate_events(clicks_b, views_b, "2 hours")
    expected = {(r.left_id, r.right_id) for r in batch.collect()}
    assert expected  # fixture must actually produce pairs

    sa = stream_events(spark, SF).where(F.col("event_type") == "click")
    sb = stream_events(spark, SF).where(F.col("event_type") == "view")
    stream = correlate_events(sa, sb, "2 hours")
    assert stream.isStreaming
    q = (stream.writeStream.format("memory").queryName("corr_t")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r.left_id, r.right_id) for r in spark.table("corr_t").collect()}
    assert got == expected


def test_incremental_dedup_stream(spark, tmp_path):
    """foreachBatch ingest dedup: streamed new docs vs a persisted
    corpus signature table recovers every planted duplicate."""
    from oxigraph_spark.pipeline.dedup import minhash_signatures
    from oxigraph_spark.streaming.events import (incremental_dedup_stream,
                                                 stream_documents)
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    corpus = docs.withColumn("doc_id", F.col("doc_id") + 1000000)
    sig = minhash_signatures(corpus, "text", "doc_id", num_perm=16)
    out = str(tmp_path / "pairs.parquet")
    q = incremental_dedup_stream(stream_documents(spark, SF), sig, out,
                                 num_perm=16, bands=4, threshold=0.5)
    q.awaitTermination(180)
    pairs = spark.read.parquet(out)
    planted = pairs.where((F.col("id_b") == F.col("id_a") + 1000000)
                          & (F.col("sim") >= 0.999))
    assert planted.count() == docs.count()


def test_continuous_sparql(spark, tmp_path):
    """Standing queries re-evaluated per micro-batch over the quad log:
    two drops of N-Triples, snapshot reflects the union after drain."""
    import os
    from oxigraph_spark.streaming.sparql import (
        continuous_sparql, stream_ntriples)

    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "a.nt").write_text(
        '<urn:x:s1> <urn:x:p> "1"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
        '<urn:x:s2> <urn:x:p> "2"^^<http://www.w3.org/2001/XMLSchema#integer> .\n')
    (drop / "b.nt").write_text(
        '<urn:x:s3> <urn:x:p> "3"^^<http://www.w3.org/2001/XMLSchema#integer> .\n')

    lines = stream_ntriples(spark, str(drop))
    q = continuous_sparql(
        lines,
        {"sum": "SELECT (SUM(?v) AS ?total) WHERE { ?s <urn:x:p> ?v }",
         "all": "SELECT ?s WHERE { ?s <urn:x:p> ?v }"},
        quad_log=str(tmp_path / "log"),
        results_dir=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    total = spark.read.parquet(str(tmp_path / "out" / "sum")).collect()
    assert len(total) == 1
    assert total[0]["total"]["lex"] == "6"
    subs = spark.read.parquet(str(tmp_path / "out" / "all")).collect()
    assert {r["s"]["lex"] for r in subs} == {"urn:x:s1", "urn:x:s2",
                                             "urn:x:s3"}
    # quad log accumulated every batch
    assert spark.read.parquet(str(tmp_path / "log")).count() == 3


def test_continuous_sparql_windowed(spark, tmp_path):
    """window_batches=1: after draining two single-file batches, the
    snapshot reflects ONLY the newest batch; the quad log keeps all."""
    import os
    from oxigraph_spark.streaming.sparql import (
        continuous_sparql, stream_ntriples)

    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "a.nt").write_text('<urn:w:s1> <urn:w:p> "old" .\n')
    (drop / "b.nt").write_text('<urn:w:s2> <urn:w:p> "new" .\n')

    q = continuous_sparql(
        stream_ntriples(spark, str(drop)),
        {"win": "SELECT ?s WHERE { ?s <urn:w:p> ?v }"},
        quad_log=str(tmp_path / "log"),
        results_dir=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"),
        window_batches=1)
    q.awaitTermination(120)

    subs = {r["s"]["lex"] for r in
            spark.read.parquet(str(tmp_path / "out" / "win")).collect()}
    # one batch per file (maxFilesPerTrigger=1): only the second
    # batch's subject survives the 1-batch window
    assert len(subs) == 1
    # full log retains both, partitioned by batch for retention drops
    log = spark.read.parquet(str(tmp_path / "log"))
    assert log.count() == 2
    assert log.select("__batch").distinct().count() == 2


def test_continuous_sparql_replay_idempotent(spark, tmp_path):
    """Replaying batches (fresh checkpoint, same quad log) must not
    duplicate quads: each batch overwrites its own log partition."""
    from oxigraph_spark.streaming.sparql import (
        continuous_sparql, stream_ntriples)

    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "a.nt").write_text('<urn:r:s1> <urn:r:p> "1"^^<http://www.w3.org/2001/XMLSchema#integer> .\n')
    (drop / "b.nt").write_text('<urn:r:s2> <urn:r:p> "2"^^<http://www.w3.org/2001/XMLSchema#integer> .\n')
    queries = {"sum": "SELECT (SUM(?v) AS ?total) WHERE { ?s <urn:r:p> ?v }"}

    for run in range(2):   # second run = full replay after "crash"
        q = continuous_sparql(
            stream_ntriples(spark, str(drop)), queries,
            quad_log=str(tmp_path / "log"),
            results_dir=str(tmp_path / "out"),
            checkpoint=str(tmp_path / f"ckpt{run}"))
        q.awaitTermination(120)

    assert spark.read.parquet(str(tmp_path / "log")).count() == 2
    total = spark.read.parquet(str(tmp_path / "out" / "sum")).collect()
    assert total[0]["total"]["lex"] == "3"


def test_standing_query_registry_kill_and_resume(spark, tmp_path):
    """Crash-recovery for the standing-query tier: the registry sidecar
    persists queries + locations + last batch id; a driver 'restart'
    resumes via resume_standing_queries against the SAME checkpoint.
    Then a simulated crash (latest checkpoint commit marker deleted, so
    Structured Streaming replays that batch) appends exactly-once."""
    import json
    import os

    from oxigraph_spark.streaming.sparql import (resume_standing_queries,
                                                 start_standing_queries)

    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "a.nt").write_text('<urn:k:s1> <urn:k:p> "1" .\n'
                               '<urn:k:s2> <urn:k:p> "2" .\n')
    out = str(tmp_path / "out")
    queries = {"all": "SELECT DISTINCT ?s WHERE { ?s <urn:k:p> ?v }"}

    def drain(q):
        # availableNow terminates on its own; stop() + poll makes sure
        # the query has DEREGISTERED from the checkpoint before the next
        # start (Spark forbids two live queries on one checkpoint)
        import time
        q.awaitTermination(120)
        q.stop()
        for _ in range(100):
            if not q.isActive:
                return
            time.sleep(0.2)
        raise AssertionError("stream did not stop")

    q = start_standing_queries(
        spark, str(drop), queries, quad_log=str(tmp_path / "log"),
        results_dir=out)
    drain(q)
    reg_path = os.path.join(out, "_registry.json")
    with open(reg_path) as f:
        reg = json.load(f)
    assert reg["queries"] == queries and reg["last_batch"] == 0
    snap = lambda: sorted(  # noqa: E731
        r["s"]["lex"]
        for r in spark.read.parquet(os.path.join(out, "all")).collect())
    assert snap() == ["urn:k:s1", "urn:k:s2"]

    # driver restart: new file dropped while 'down', resume from registry
    (drop / "b.nt").write_text('<urn:k:s3> <urn:k:p> "3" .\n')
    q = resume_standing_queries(spark, reg_path)
    drain(q)
    assert snap() == ["urn:k:s1", "urn:k:s2", "urn:k:s3"]
    with open(reg_path) as f:
        assert json.load(f)["last_batch"] == 1

    # crash BETWEEN batch work and checkpoint commit: delete the last
    # commit marker -> the next start replays batch 1 -> snapshot and
    # quad log must be byte-identical (exactly-once append)
    ckpt = reg["checkpoint"]
    os.unlink(os.path.join(ckpt, "commits", "1"))
    # local-fs checksum sidecar: a real crash loses it with the commit
    # file; leaving it behind makes Hadoop's create-if-absent fail
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.unlink(crc)
    q = resume_standing_queries(spark, reg_path)
    drain(q)
    assert snap() == ["urn:k:s1", "urn:k:s2", "urn:k:s3"]
    assert spark.read.parquet(str(tmp_path / "log")).count() == 3


def test_delta_rewrites_eligibility():
    """Monotone DISTINCT BGP(+FILTER/BIND) → n per-pattern rewrites;
    anything non-monotone (no DISTINCT, OPTIONAL, EXISTS, paths) → None
    (snapshot fallback)."""
    from oxigraph_spark.algebra.parser import parse_query
    from oxigraph_spark.streaming.sparql import _delta_rewrites

    ok = parse_query("""SELECT DISTINCT ?s ?w WHERE {
        ?s <urn:x:p> ?v . ?v <urn:x:q> ?w .
        FILTER(STRLEN(STR(?w)) > 0) BIND(STR(?s) AS ?l) }""")
    rewrites = _delta_rewrites(ok)
    assert rewrites is not None and len(rewrites) == 2

    for bad in [
        "SELECT ?s WHERE { ?s <urn:x:p> ?v }",                  # no DISTINCT
        """SELECT DISTINCT ?s WHERE { ?s <urn:x:p> ?v
             OPTIONAL { ?s <urn:x:q> ?w } }""",                 # OPTIONAL
        """SELECT DISTINCT ?s WHERE { ?s <urn:x:p> ?v
             FILTER EXISTS { ?s <urn:x:q> ?w } }""",            # EXISTS
        "SELECT DISTINCT ?s WHERE { ?s <urn:x:p>+ ?v }",        # path
    ]:
        assert _delta_rewrites(parse_query(bad)) is None, bad


@pytest.mark.slow
def test_incremental_append_equals_snapshot(spark, tmp_path):
    """Monotone DISTINCT standing query under incremental (delta-append)
    evaluation equals full snapshot re-evaluation — including the
    cross-batch join case where one pattern's quad arrives a batch
    AFTER its join partner (the delta must join new quads against OLD
    data, not just the batch)."""
    from oxigraph_spark.streaming.sparql import (
        continuous_sparql, stream_ntriples)

    QUERY = {"j": """SELECT DISTINCT ?s ?w WHERE {
        ?s <urn:d:p> ?v . ?v <urn:d:q> ?w }"""}

    def run(sub, incremental):
        drop = tmp_path / sub / "drop"
        drop.mkdir(parents=True)
        # batch a: a full pair (s1) + a dangling p-edge (s2→v2)
        (drop / "a.nt").write_text(
            '<urn:d:s1> <urn:d:p> <urn:d:v1> .\n'
            '<urn:d:v1> <urn:d:q> "w1" .\n'
            '<urn:d:s2> <urn:d:p> <urn:d:v2> .\n')
        # batch b: v2's q-edge lands — joins BACKWARD against batch a
        (drop / "b.nt").write_text('<urn:d:v2> <urn:d:q> "w2" .\n')
        # batch c: a fully-new pair + a duplicate-producing re-send
        (drop / "c.nt").write_text(
            '<urn:d:s3> <urn:d:p> <urn:d:v3> .\n'
            '<urn:d:v3> <urn:d:q> "w3" .\n'
            '<urn:d:s1> <urn:d:p> <urn:d:v1> .\n')
        q = continuous_sparql(
            stream_ntriples(spark, str(drop)), QUERY,
            quad_log=str(tmp_path / sub / "log"),
            results_dir=str(tmp_path / sub / "out"),
            checkpoint=str(tmp_path / sub / "ckpt"),
            incremental=incremental)
        q.awaitTermination(180)
        rows = spark.read.parquet(str(tmp_path / sub / "out" / "j")).collect()
        return sorted((r["s"]["lex"], r["w"]["lex"]) for r in rows)

    inc = run("inc", True)
    snap = run("snap", False)
    want = [("urn:d:s1", "w1"), ("urn:d:s2", "w2"), ("urn:d:s3", "w3")]
    assert inc == want
    assert snap == want


def test_non_monotone_fallback_snapshot(spark, tmp_path):
    """An OPTIONAL standing query stays in snapshot mode: when a later
    batch binds the optional part, the earlier unbound-padded row is
    REPLACED (delta-append would have left it stale)."""
    from oxigraph_spark.streaming.sparql import (
        continuous_sparql, stream_ntriples)

    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "a.nt").write_text('<urn:f:s1> <urn:f:p> "v" .\n')
    (drop / "b.nt").write_text('<urn:f:s1> <urn:f:q> "w" .\n')
    q = continuous_sparql(
        stream_ntriples(spark, str(drop)),
        {"opt": """SELECT ?s ?w WHERE { ?s <urn:f:p> ?v
                     OPTIONAL { ?s <urn:f:q> ?w } }"""},
        quad_log=str(tmp_path / "log"),
        results_dir=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    rows = spark.read.parquet(str(tmp_path / "out" / "opt")).collect()
    assert len(rows) == 1
    assert rows[0]["s"]["lex"] == "urn:f:s1"
    assert rows[0]["w"] is not None and rows[0]["w"]["lex"] == "w"


def test_incremental_ignores_named_graph_quads(spark, tmp_path):
    """quads=True ingest: a NAMED-graph quad must not leak into a
    default-graph monotone query's delta append (review finding r5 —
    tagging it into the synthetic delta graph erased its real graph)."""
    from oxigraph_spark.streaming.sparql import (
        continuous_sparql, stream_ntriples)

    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "a.nq").write_text('<urn:g:s1> <urn:g:p> "1" .\n')
    (drop / "b.nq").write_text(
        '<urn:g:s2> <urn:g:p> "2" <urn:g:graph1> .\n'
        '<urn:g:s3> <urn:g:p> "3" .\n')
    q = continuous_sparql(
        stream_ntriples(spark, str(drop)),
        {"d": "SELECT DISTINCT ?s WHERE { ?s <urn:g:p> ?v }"},
        quad_log=str(tmp_path / "log"),
        results_dir=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"),
        quads=True)
    q.awaitTermination(120)
    rows = spark.read.parquet(str(tmp_path / "out" / "d")).collect()
    # s2 lives in <urn:g:graph1>, outside the default graph the BGP
    # matches — exactly what snapshot evaluation would return
    assert sorted(r["s"]["lex"] for r in rows) == ["urn:g:s1", "urn:g:s3"]


def test_delta_rejects_nondeterministic_builtins():
    """UUID/NOW/RAND in FILTER or BIND force snapshot mode (replay
    would re-mint values, breaking exactly-once-per-row appends)."""
    from oxigraph_spark.algebra.parser import parse_query
    from oxigraph_spark.streaming.sparql import _delta_rewrites
    for bad in [
        """SELECT DISTINCT ?s ?u WHERE { ?s <urn:x:p> ?o
             BIND(UUID() AS ?u) }""",
        """SELECT DISTINCT ?s WHERE { ?s <urn:x:p> ?o
             FILTER(RAND() < 0.5) }""",
        """SELECT DISTINCT ?s ?t WHERE { ?s <urn:x:p> ?o
             BIND(NOW() AS ?t) }""",
    ]:
        assert _delta_rewrites(parse_query(bad)) is None, bad


def test_delta_union_values_eligibility():
    """UNION and VALUES join the monotone fragment: variants enumerate
    one delta'd pattern per branch; VALUES contributes none itself."""
    from oxigraph_spark.algebra.parser import parse_query
    from oxigraph_spark.streaming.sparql import _delta_rewrites

    u = parse_query("""SELECT DISTINCT ?s WHERE {
        { ?s <urn:x:p> ?o } UNION { ?s <urn:x:q> ?o . ?o <urn:x:r> ?z } }""")
    assert len(_delta_rewrites(u)) == 3  # 1 + 2 patterns
    v = parse_query("""SELECT DISTINCT ?s ?o WHERE {
        VALUES ?o { 1 2 } ?s <urn:x:p> ?o }""")
    assert len(_delta_rewrites(v)) == 1  # VALUES delta-constant
    # VALUES alone: monotone but constant -> nothing new per batch ever
    c = parse_query("SELECT DISTINCT ?o WHERE { VALUES ?o { 1 2 } }")
    assert _delta_rewrites(c) is None


def test_incremental_union_equals_snapshot(spark, tmp_path):
    """A DISTINCT UNION standing query under delta evaluation equals
    snapshot re-evaluation across batches feeding different branches."""
    from oxigraph_spark.streaming.sparql import (
        continuous_sparql, stream_ntriples)

    QUERY = {"u": """SELECT DISTINCT ?s WHERE {
        { ?s <urn:u:p> ?v } UNION { ?s <urn:u:q> ?v . ?v <urn:u:r> ?z } }"""}

    def run(sub, incremental):
        drop = tmp_path / sub / "drop"
        drop.mkdir(parents=True)
        (drop / "a.nt").write_text(
            '<urn:u:s1> <urn:u:p> "x" .\n'
            '<urn:u:s2> <urn:u:q> <urn:u:m> .\n')   # dangling: no r yet
        (drop / "b.nt").write_text(
            '<urn:u:m> <urn:u:r> "z" .\n'           # completes branch 2
            '<urn:u:s3> <urn:u:p> "y" .\n')         # new branch-1 row
        q = continuous_sparql(
            stream_ntriples(spark, str(drop)), QUERY,
            quad_log=str(tmp_path / sub / "log"),
            results_dir=str(tmp_path / sub / "out"),
            checkpoint=str(tmp_path / sub / "ckpt"),
            incremental=incremental)
        q.awaitTermination(180)
        rows = spark.read.parquet(str(tmp_path / sub / "out" / "u")).collect()
        return sorted(r["s"]["lex"] for r in rows)

    want = ["urn:u:s1", "urn:u:s2", "urn:u:s3"]
    assert run("inc", True) == want
    assert run("snap", False) == want
