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
