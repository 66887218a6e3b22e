"""Session-contract tests (round-4 VERDICT item 3).

``session.configure`` excludes Catalyst's ``PushDownPredicates`` rule and
disables constraint propagation SESSION-WIDE (rationale in session.py:
exponential alias substitution through the compiler's SSA temp chains; a
crash in ``UnionBase.rewriteConstraints`` on path-closure unions).  Spark
reads these confs lazily at ACTION time, so a set/restore scoped around
``Store.query`` cannot work — the optimizer would still see the restored
values when the user finally executes the returned DataFrame.  The
session contract is therefore: the exclusions stay active, and THESE
tests prove the things that matter for third-party DataFrames sharing
the session (parquet scan pushdown, column pruning) still hold.  The
README documents the one real degradation (a filter the USER writes
above a join is not re-pushed below it).
"""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_configured_session_confs_active(spark):
    assert "PushDownPredicates" in spark.conf.get(
        "spark.sql.optimizer.excludedRules")
    assert spark.conf.get(
        "spark.sql.constraintPropagation.enabled") == "false"


def test_plain_dataframe_parquet_pushdown_survives(spark):
    """A plain (non-SPARQL) parquet read + filter + narrow projection on
    the CONFIGURED session still reaches the scan as PushedFilters with
    a pruned ReadSchema: FileSourceStrategy collects adjacent
    Project/Filter at PLANNING time, independent of the excluded
    optimizer rule."""
    df = (spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
          .where(F.col("c_acctbal") > 100.0)
          .select("c_custkey", "c_acctbal"))
    plan = _formatted(df)
    assert "PushedFilters" in plan
    assert "GreaterThan(c_acctbal" in plan
    # pruned read schema: only the referenced columns
    rs = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "c_custkey" in rs and "c_acctbal" in rs and "c_name" not in rs


def test_plain_dataframe_filter_through_select_still_pushes(spark):
    """Filter placed above a simple column-aliasing Project (the common
    user shape) still reaches the parquet scan: ColumnPruning and
    planning-time collection handle it without PushDownPredicates."""
    df = (spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
          .select(F.col("c_custkey").alias("k"),
                  F.col("c_acctbal").alias("bal"))
          .where(F.col("bal") > 100.0))
    plan = _formatted(df)
    assert "PushedFilters" in plan and "GreaterThan(c_acctbal" in plan


def test_plain_dataframe_broadcast_join_still_works(spark):
    """Join planning (broadcast selection, AQE) is unaffected by the
    exclusions: a small-dim equi-join on the configured session still
    broadcasts, and per-side filters adjacent to their scans push."""
    c = (spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
         .where(F.col("c_acctbal") > 0.0))
    n = (spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))
         .where(F.col("n_regionkey") >= 0))
    j = c.join(F.broadcast(n),
               c["c_nationkey"] == n["n_nationkey"]).select(
                   "c_custkey", "n_name")
    plan = _formatted(j)
    assert "BroadcastHashJoin" in plan
    assert plan.count("PushedFilters") >= 2
    assert "GreaterThan(c_acctbal" in plan
    assert j.count() > 0


def test_full_optimizer_scope_pushes_filter_below_join(spark):
    """The session-contract degradation is NARROW on Spark 4.1: a plain
    filter above a join still pushes (test below), but a filter that
    must substitute through an ALIASING Project above a join needs
    PushDownPredicates' replaceAlias and stays put.  Inside the
    full_optimizer scope it pushes; the SPARQL-safe exclusions come
    back after the scope."""
    from oxigraph_spark.session import full_optimizer
    from oxigraph_spark.sources.tables import load_table

    nation = load_table(spark, SF_DIR, "nation")
    region = load_table(spark, SF_DIR, "region")

    def fresh():
        # build a NEW Dataset each time: QueryExecution materializes its
        # optimized plan once, under whatever confs are active then
        return (nation.join(region,
                            nation["n_regionkey"] == region["r_regionkey"])
                .select(F.col("r_name").alias("rn"), "n_name")
                .where(F.col("rn") == "EUROPE"))

    def filter_below_join(df):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        below = plan[plan.find("Join"):]
        return "Filter" in below and "r_name" in below

    excl = "spark.sql.optimizer.excludedRules"
    assert "PushDownPredicates" in (spark.conf.get(excl) or "")
    assert not filter_below_join(fresh())  # the documented degradation
    with full_optimizer(spark):
        assert spark.conf.get(excl, None) in (None, "")
        df = fresh()
        assert filter_below_join(df)       # full rules push it
        assert df.count() > 0
    assert "PushDownPredicates" in (spark.conf.get(excl) or "")
    assert spark.conf.get("spark.sql.constraintPropagation.enabled") \
        == "false"


def test_plain_filter_above_join_pushes_even_with_exclusions(spark):
    """Spark 4.1 pushes a NON-aliased filter written above a join even
    with PushDownPredicates excluded — the degradation documented in
    README applies only through aliasing Projects."""
    from oxigraph_spark.sources.tables import load_table
    nation = load_table(spark, SF_DIR, "nation")
    region = load_table(spark, SF_DIR, "region")
    j = nation.join(region, nation["n_regionkey"] == region["r_regionkey"]
                    ).where(F.col("r_name") == "EUROPE")
    plan = j._jdf.queryExecution().optimizedPlan().toString()
    below = plan[plan.find("Join"):]
    assert "Filter" in below and "r_name" in below


def test_reliable_checkpoint_mode_differential(spark, tmp_path):
    """VERDICT r6 item 2b: with set_reliable_checkpoints(dir), every
    fixpoint pin() becomes a reliable df.checkpoint() into the dir
    (executor-loss durable on a real cluster); results must be
    IDENTICAL to the default localCheckpoint mode and the directory
    must actually receive checkpoint files."""
    import os
    from oxigraph_spark.operators.graphalgo import shortest_paths
    from oxigraph_spark.operators.graphrank import pagerank
    from oxigraph_spark.session import set_reliable_checkpoints

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 4), (1, 4)],
        ["src", "dst"])

    def run():
        sp = sorted((r.node, r.landmark, r.dist)
                    for r in shortest_paths(edges, [4]).collect())
        pr = {r.node: round(r.rank, 9)
              for r in pagerank(edges, max_iter=5).collect()}
        return sp, pr

    base = run()
    ckdir = str(tmp_path / "reliable_ckpt")
    set_reliable_checkpoints(spark, ckdir)
    try:
        got = run()
    finally:
        set_reliable_checkpoints(spark, None)
    assert got == base
    # reliable checkpoints actually landed in the directory
    found = [os.path.join(dp, f) for dp, _, fs in os.walk(ckdir)
             for f in fs]
    assert found, "no checkpoint files written in reliable mode"
    # and the default mode is restored
    assert run() == base
