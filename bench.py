"""Benchmark harness: runs headline queries at SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Times are per-query wall clock (action = count/collect), after one
warm-up action so JVM/codegen startup isn't attributed to query 1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline subset: scan+filter+agg, multi-join, paths/closure, top-k,
# dedup + simsearch + text + windows extensions
HEADLINE = [
    "flagship_q1", "J1_bgp_join", "A_aggregates", "SUB_select",
    "PP3_sequence", "PP6_plus", "O1_order_slice", "F_strings",
    "X_dedup_exact", "X_dedup_minhash", "X_simsearch_topk",
    "X_text_stats", "X_window_tumbling",
]


def main() -> None:
    import __spark_entry__ as entry
    from oxigraph_spark.session import get_spark

    spark = get_spark("oxigraph-spark-bench")
    qs = entry.queries()
    # warm-up: absorbs JVM/codegen startup AND the one-time store build
    # (parquet schema reads for all tables) so query 1 isn't charged for it
    spark.range(1000).selectExpr("sum(id)").collect()
    qs["O4_distinct"](spark, SF_DIR).count()

    times: dict[str, float] = {}
    compile_times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.time()
        df = fn(spark, SF_DIR)
        t1 = time.time()
        n = df.count()
        dt = round(time.time() - t0, 3)
        times[name] = dt
        compile_times[name] = round(t1 - t0, 3)
        total += dt
        print(f"# {name}: {n} rows in {dt}s "
              f"(plan {compile_times[name]}s)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "plan_sec": compile_times,  # driver-side compile/plan portion
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
