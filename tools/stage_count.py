"""Measure per-entry fixed overhead: jobs + stages + tasks submitted by
ONE warm count() of each headline query (r10 verdict item 1 — the
8-vs-32-core ratios ~1 show the bench is overhead-bound at sf0.1, so the
lever is the number of scheduled jobs/stages, not plan shape).

Usage: SPARK_GRAFT_SF_DIR=... python tools/stage_count.py [out.json]
"""
from __future__ import annotations

import json
import os
import sys
import time

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

    spark = get_spark("stage-count")
    sc = spark.sparkContext
    qs = entry.queries()
    spark.range(1000).selectExpr("sum(id)").collect()
    qs["O4_distinct"](spark, SF_DIR).count()

    out = {}
    for name in HEADLINE:
        fn = qs[name]
        df = fn(spark, SF_DIR)
        df.count()  # warm (plan memo + any persist/checkpoint interior)
        df.count()
        tracker = sc.statusTracker()
        sc.setJobGroup(name, name)
        before = set(tracker.getJobIdsForGroup(name))
        t0 = time.time()
        df.count()
        wall = time.time() - t0
        jobs = [j for j in tracker.getJobIdsForGroup(name) if j not in before]
        # count only stages that actually RAN: a job's stageIds include
        # SKIPPED stages (shuffle output reused / cache hit) whose
        # numTasks is the would-be count — counting them overstated the
        # executed work ~10x on the cache-backed entries (r10)
        stages, tasks = 0, 0
        seen = set()
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if (si is not None and s not in seen
                        and si.numCompletedTasks > 0):
                    seen.add(s)
                    stages += 1
                    tasks += si.numCompletedTasks
        sc.setJobGroup("idle", "idle")
        out[name] = {"jobs": len(jobs), "stages": stages, "tasks": tasks,
                     "wall": round(wall, 3)}
        print(f"# {name}: jobs={len(jobs)} stages={stages} tasks={tasks} "
              f"wall={wall:.3f}", file=sys.stderr)

    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stage_count.json"
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
