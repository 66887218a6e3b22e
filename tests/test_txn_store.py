"""TransactionalQuadStore: atomic version-manifest commits, snapshot
isolation, time travel, optimistic-concurrency conflicts, ACID SPARQL
update, compaction, vacuum, and the streaming quad-log fold."""

import pytest
from pyspark.sql import functions as F

from oxigraph_spark.sources.quad_store import (ConcurrentWriteError,
                                               TransactionalQuadStore)
from oxigraph_spark.store import Store

NT1 = ('<urn:t:s1> <urn:t:p> "1"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
       '<urn:t:s2> <urn:t:p> "2"^^<http://www.w3.org/2001/XMLSchema#integer> .\n')
NT2 = '<urn:t:s3> <urn:t:q> "x" .\n'


def _quads(spark, tmp_path, name, text):
    from oxigraph_spark.sources.ntriples import read_ntriples
    p = tmp_path / name
    p.write_text(text)
    return read_ntriples(spark, str(p))


def _lexes(df, col="s"):
    return sorted(r[col]["lex"] for r in df.collect())


def test_commit_append_snapshot_isolation(spark, tmp_path):
    path = str(tmp_path / "txn")
    ts = TransactionalQuadStore(spark, path)
    assert ts.version == 0 and ts.quads().count() == 0

    ts.overwrite_quads(_quads(spark, tmp_path, "a.nt", NT1))
    assert ts.version == 1
    assert _lexes(ts.quads()) == ["urn:t:s1", "urn:t:s2"]

    # a reader pinned BEFORE the append keeps its snapshot
    pinned = TransactionalQuadStore(spark, path)
    ts.append_quads(_quads(spark, tmp_path, "b.nt", NT2))
    assert ts.version == 2
    assert _lexes(ts.quads()) == ["urn:t:s1", "urn:t:s2", "urn:t:s3"]
    assert _lexes(pinned.quads()) == ["urn:t:s1", "urn:t:s2"]
    # time travel + refresh
    assert _lexes(ts.as_of(1).quads()) == ["urn:t:s1", "urn:t:s2"]
    assert pinned.refresh().version == 2


def test_concurrent_commit_conflict(spark, tmp_path):
    path = str(tmp_path / "txn")
    a = TransactionalQuadStore(spark, path)
    a.overwrite_quads(_quads(spark, tmp_path, "a.nt", NT1))
    b = TransactionalQuadStore(spark, path)
    df = _quads(spark, tmp_path, "b.nt", NT2)
    # simulate the race: both writers target version 2; the second
    # publish hits the exclusive-create and must fail cleanly
    d1 = a._write_data_dir(df)
    d2 = b._write_data_dir(df)
    a._commit(a._dirs + [d1], "append")
    with pytest.raises(ConcurrentWriteError):
        b._commit(b._dirs + [d2], "append")
    # loser retries against the refreshed snapshot and succeeds
    b2 = b.refresh()
    b2._commit(b2._dirs + [d2], "append")
    assert b2.version == 3


def test_update_is_one_atomic_commit(spark, tmp_path):
    path = str(tmp_path / "txn")
    ts = TransactionalQuadStore(spark, path)
    ts.overwrite_quads(_quads(spark, tmp_path, "a.nt", NT1))
    reader = TransactionalQuadStore(spark, path)  # pinned at v1
    v = ts.update("""
        DELETE { ?s <urn:t:p> ?v } INSERT { ?s <urn:t:r> ?v }
        WHERE { ?s <urn:t:p> ?v . FILTER(?v = 1) }""")
    assert v == 2
    got = {(r["s"]["lex"], r["p"]["lex"]) for r in ts.quads().collect()}
    assert got == {("urn:t:s1", "urn:t:r"), ("urn:t:s2", "urn:t:p")}
    # the pinned reader still sees pre-update data (snapshot isolation)
    assert {r["p"]["lex"] for r in reader.quads().collect()} == {"urn:t:p"}


def test_query_compact_vacuum(spark, tmp_path):
    path = str(tmp_path / "txn")
    ts = TransactionalQuadStore(spark, path)
    ts.overwrite_quads(_quads(spark, tmp_path, "a.nt", NT1))
    ts.append_quads(_quads(spark, tmp_path, "b.nt", NT2))
    st = Store(spark, ts)
    rows = st.query("SELECT ?s ?v WHERE { ?s <urn:t:p> ?v }").collect()
    assert sorted(r["s"]["lex"] for r in rows) == ["urn:t:s1", "urn:t:s2"]
    assert ts.pred_card("urn:t:p") == 2

    before = sorted(map(str, ts.quads().collect()))
    assert len(ts._dirs) == 2
    ts.compact()
    assert len(ts._dirs) == 1
    assert sorted(map(str, ts.quads().collect())) == before
    # vacuum drops the two pre-compaction dirs + old manifests
    assert ts.vacuum() == 2
    assert sorted(map(str, ts.quads().collect())) == before
    # Store.query over the compacted store still answers (new Store:
    # generation changed, plan cache must not serve stale frames)
    rows = Store(spark, ts).query(
        "SELECT ?s WHERE { ?s <urn:t:q> ?v }").collect()
    assert [r["s"]["lex"] for r in rows] == ["urn:t:s3"]


def test_stream_compaction_midstream(spark, tmp_path):
    """Continuous SPARQL with the quad log folded into a transactional
    store mid-stream: drain two batches, ingest_log + expire_log, then
    drain a third batch with the store as base — the standing query's
    snapshot equals the full expected result (each quad lives in base
    XOR log, never both)."""
    import os

    from oxigraph_spark.streaming.sparql import (continuous_sparql,
                                                 stream_ntriples)

    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "a.nt").write_text('<urn:c:s1> <urn:c:p> "1" .\n')
    (drop / "b.nt").write_text('<urn:c:s2> <urn:c:p> "2" .\n')
    log, out, ckpt = (str(tmp_path / d) for d in ("log", "out", "ckpt"))
    QUERY = {"q": "SELECT ?s WHERE { ?s <urn:c:p> ?v }"}

    q = continuous_sparql(stream_ntriples(spark, str(drop)), QUERY,
                          quad_log=log, results_dir=out, checkpoint=ckpt)
    q.awaitTermination(120)
    assert _lexes(spark.read.parquet(os.path.join(out, "q"))) == \
        ["urn:c:s1", "urn:c:s2"]

    # fold batches 0-1 into the store, drop them from the log
    ts = TransactionalQuadStore(spark, str(tmp_path / "base"))
    ts.ingest_log(log, upto_batch=1)
    assert TransactionalQuadStore.expire_log(log, upto_batch=1) == 2
    assert _lexes(ts.quads()) == ["urn:c:s1", "urn:c:s2"]

    # third batch continues the SAME checkpoint, base = folded store
    (drop / "c.nt").write_text('<urn:c:s3> <urn:c:p> "3" .\n')
    q = continuous_sparql(stream_ntriples(spark, str(drop)), QUERY,
                          quad_log=log, results_dir=out, checkpoint=ckpt,
                          base_store=Store(spark, ts))
    q.awaitTermination(120)
    assert _lexes(spark.read.parquet(os.path.join(out, "q"))) == \
        ["urn:c:s1", "urn:c:s2", "urn:c:s3"]


def test_store_update_commits_on_transactional_source(spark, tmp_path):
    """Store.update over a TransactionalQuadStore source commits one
    atomic version instead of detouring through an in-memory copy; the
    returned Store serves the new snapshot, the original keeps its old
    one (generation bump ⇒ no stale plan-cache hits)."""
    path = str(tmp_path / "txn")
    ts = TransactionalQuadStore(spark, path)
    ts.overwrite_quads(_quads(spark, tmp_path, "a.nt", NT1))
    st = Store(spark, TransactionalQuadStore(spark, path))
    st2 = st.update("INSERT DATA { <urn:t:s9> <urn:t:p> 9 }")
    assert _lexes(st2.query(
        "SELECT ?s WHERE { ?s <urn:t:p> ?v }")) == \
        ["urn:t:s1", "urn:t:s2", "urn:t:s9"]
    # durable: a brand-new reader over the SAME path sees the commit
    fresh = Store(spark, TransactionalQuadStore(spark, path))
    assert _lexes(fresh.query(
        "SELECT ?s WHERE { ?s <urn:t:p> ?v }")) == \
        ["urn:t:s1", "urn:t:s2", "urn:t:s9"]


def test_vacuum_refuses_stale_snapshot(spark, tmp_path):
    """vacuum() from a snapshot older than the latest commit must
    refuse (it would delete a newer writer's committed data)."""
    path = str(tmp_path / "txn")
    a = TransactionalQuadStore(spark, path)
    a.overwrite_quads(_quads(spark, tmp_path, "a.nt", NT1))
    stale = TransactionalQuadStore(spark, path)          # pinned at v1
    a.append_quads(_quads(spark, tmp_path, "b.nt", NT2))  # v2
    with pytest.raises(ConcurrentWriteError):
        stale.vacuum()
    # v2's data is intact and readable
    assert _lexes(a.refresh().quads()) == ["urn:t:s1", "urn:t:s2",
                                           "urn:t:s3"]


def test_vacuum_retention_horizon(spark, tmp_path):
    """vacuum(retain_last=N) keeps the newest N versions: an as_of
    reader pinned WITHIN the horizon stays correct after vacuum, one
    outside it loses time travel; retain_age_sec widens the horizon."""
    path = str(tmp_path / "txn")
    ts = TransactionalQuadStore(spark, path)
    ts.overwrite_quads(_quads(spark, tmp_path, "a.nt", NT1))   # v1
    ts.append_quads(_quads(spark, tmp_path, "b.nt", NT2))      # v2
    ts.append_quads(_quads(
        spark, tmp_path, "c.nt", '<urn:t:s4> <urn:t:q> "y" .\n'))  # v3
    ts.append_quads(_quads(
        spark, tmp_path, "d.nt", '<urn:t:s5> <urn:t:q> "z" .\n'))  # v4
    pinned_v3 = ts.as_of(3)   # inside a retain_last=2 horizon

    with pytest.raises(ValueError):
        ts.vacuum(retain_last=0)
    # all four manifests share v1's data dir etc. (appends reuse dirs):
    # only dirs referenced by NO retained manifest may die.  v1/v2's
    # dirs are all referenced by v3/v4 here, so nothing is removed —
    # but v1/v2 manifests are gone.
    ts.vacuum(retain_last=2)
    assert _lexes(pinned_v3.quads()) == \
        ["urn:t:s1", "urn:t:s2", "urn:t:s3", "urn:t:s4"]
    assert _lexes(ts.as_of(3).quads()) == \
        ["urn:t:s1", "urn:t:s2", "urn:t:s3", "urn:t:s4"]
    with pytest.raises(FileNotFoundError):
        ts.as_of(2).quads()

    # overwrite makes old dirs unreferenced; age horizon keeps them all
    ts = ts.refresh()
    ts.overwrite_quads(_quads(spark, tmp_path, "a.nt", NT1))   # v5
    assert ts.vacuum(retain_last=1, retain_age_sec=3600.0) == 0
    assert _lexes(ts.as_of(3).quads())[0] == "urn:t:s1"
    # zero age horizon: only v5 survives, its one dir keeps, rest die
    assert ts.vacuum(retain_last=1, retain_age_sec=None) == 4
    assert _lexes(ts.quads()) == ["urn:t:s1", "urn:t:s2"]
    with pytest.raises(FileNotFoundError):
        ts.as_of(4).quads()


def test_update_with_retry_under_contention(spark, tmp_path):
    """A writer that loses the optimistic race re-reads the latest
    snapshot and re-applies its update; both writers' effects land."""
    path = str(tmp_path / "txn")
    a = TransactionalQuadStore(spark, path)
    a.overwrite_quads(_quads(spark, tmp_path, "a.nt", NT1))   # v1
    b = TransactionalQuadStore(spark, path)                   # also v1
    a.update("INSERT DATA { <urn:t:sA> <urn:t:p> 7 }")        # v2: b stale
    v = b.update_with_retry("INSERT DATA { <urn:t:sB> <urn:t:p> 8 }")
    assert v == 3
    assert _lexes(b.quads()) == \
        ["urn:t:s1", "urn:t:s2", "urn:t:sA", "urn:t:sB"]
    # exhausted retries surface the conflict
    c = TransactionalQuadStore(spark, path, version=1)
    with pytest.raises(ConcurrentWriteError):
        c.update_with_retry("INSERT DATA { <urn:t:sC> <urn:t:p> 9 }",
                            max_retries=0)


def test_reopen_via_different_path_spelling(spark, tmp_path):
    """Manifests record store-relative data dirs, so the store survives
    being reopened through another path spelling (absolute vs
    dot-relative) — and vacuum() keeps every live dir."""
    import os
    path = str(tmp_path / "txn")
    ts = TransactionalQuadStore(spark, path)
    ts.overwrite_quads(_quads(spark, tmp_path, "a.nt", NT1))
    alias = os.path.join(str(tmp_path), ".", "txn")
    re_ts = TransactionalQuadStore(spark, alias)
    assert _lexes(re_ts.quads()) == ["urn:t:s1", "urn:t:s2"]
    assert re_ts.pred_card("urn:t:p") == 2
    assert re_ts.vacuum() == 0                  # nothing falsely dead
    assert _lexes(re_ts.quads()) == ["urn:t:s1", "urn:t:s2"]
