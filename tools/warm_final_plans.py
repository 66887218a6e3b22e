"""Dump the FINAL (post-AQE) physical plan of each headline entry's warm
count() — the actual executed shape behind the bench's timed action,
including InMemoryTableScans, reused exchanges, and AQE coalescing.

Usage: SPARK_GRAFT_SF_DIR=... python tools/warm_final_plans.py [outdir]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "flagship_q1", "J1_bgp_join", "A_aggregates", "SUB_select",
    "PP3_sequence", "PP6_plus", "O1_order_slice", "F_strings",
    "X_dedup_exact", "X_dedup_minhash", "X_simsearch_topk",
    "X_text_stats", "X_window_tumbling",
]


def main() -> None:
    import __spark_entry__ as entry
    from oxigraph_spark.session import get_spark

    spark = get_spark("warm-final-plans")
    qs = entry.queries()
    spark.range(1000).selectExpr("sum(id)").collect()
    qs["O4_distinct"](spark, SF_DIR).count()

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/warm_plans"
    os.makedirs(outdir, exist_ok=True)
    for name in HEADLINE:
        df = qs[name](spark, SF_DIR)
        df.count()  # cold: materializes pins/persists
        cnt = df.groupBy().count()  # the same plan count() executes
        cnt.collect()               # warm execution -> final AQE plan
        txt = cnt._jdf.queryExecution().executedPlan().toString()
        with open(os.path.join(outdir, f"{name}_warmfinal.txt"), "w") as f:
            f.write(txt)
        print(f"# wrote {name}", file=sys.stderr)


if __name__ == "__main__":
    main()
