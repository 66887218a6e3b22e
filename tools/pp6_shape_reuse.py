"""Measure closure cold-build reuse across predicates (round-5 verdict
item 3): after one PP6-style closure query has run, how much of the
4.5 s cold cost does a NOVEL query with a DIFFERENT predicate set but
the SAME plan shape still pay?  Spark-side caches that can carry over:
Janino codegen cache (keyed on generated source — structurally
identical plans hit it), parquet footer caches, JIT warm-up.  What
cannot carry over: the actual per-round jobs on the new edge set.

Usage: python tools/pp6_shape_reuse.py [sf_dir]
Prints one JSON line {first_cold, second_cold_other_pred, warm_first}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    import __spark_entry__ as entry
    from oxigraph_spark.session import get_spark

    spark = get_spark("pp6-shape-reuse")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm-up

    store = entry._store(spark, SF)
    q1 = entry.PFX + """
        SELECT ?x (COUNT(*) AS ?cnt) WHERE {
          ?o o:o_orderkey ?ok .
          FILTER(?ok < 50)
          ?o (o:ref_customer|c:ref_nation|n:ref_region)+ ?x .
        } GROUP BY ?x
    """
    # same shape, different predicate set + different filter constant:
    # a NOVEL query text the driver has never compiled
    q2 = entry.PFX + """
        SELECT ?x (COUNT(*) AS ?cnt) WHERE {
          ?l l:ref_orders ?o .
          ?l l:l_linenumber ?ln .
          FILTER(?ln > 6)
          ?l (l:ref_orders|o:ref_customer|c:ref_nation)+ ?x .
        } GROUP BY ?x
    """
    t0 = time.time()
    n1 = store.query(q1).count()
    first = round(time.time() - t0, 3)
    t0 = time.time()
    n2 = store.query(q2).count()
    second = round(time.time() - t0, 3)
    t0 = time.time()
    n1b = store.query(q1).count()
    warm = round(time.time() - t0, 3)
    print(json.dumps({"first_cold_sec": first, "rows1": n1,
                      "second_cold_other_pred_sec": second, "rows2": n2,
                      "warm_repeat_sec": warm, "rows1b": n1b}))


if __name__ == "__main__":
    main()
