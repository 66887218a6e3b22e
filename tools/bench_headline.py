"""Headline-only bench: the 13 HEADLINE queries, nothing else.

Round-8 bench-discipline tool (r7 verdict item 4): run this on an IDLE
box and compare its per-query medians against the full bench.py run —
driver-recorded BENCH_r{N}.json numbers should sit within ~±10% of
these, which pins any drift on box heat (soaks, suites) rather than
plan regressions.  Prints one JSON line {"queries": {...}, "n": N}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as entry
    from bench import HEADLINE, N_RUNS, SF_DIR
    from oxigraph_spark.session import get_spark

    spark = get_spark("oxigraph-spark-bench-headline")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm-up
    qs = entry.queries()
    times = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        walls = []
        for _ in range(N_RUNS):
            t0 = time.time()
            fn(spark, SF_DIR).count()
            walls.append(time.time() - t0)
        dt = round(statistics.median(walls), 3)
        times[name] = dt
        total += dt
        print(f"# {name}: median {dt}s (runs "
              f"{[round(w, 2) for w in walls]})", file=sys.stderr)
    print(json.dumps({"metric": "headline_only_sec",
                      "value": round(total, 3), "unit": "sec",
                      "queries": times, "n": N_RUNS, "sf": SF_DIR}))


if __name__ == "__main__":
    main()
