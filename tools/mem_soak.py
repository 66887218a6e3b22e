"""Memory-pressure soak (round-7 verdict item 2b/a): run the heavy
families against the 10x soak data in a DELIBERATELY SMALL heap so
sorts/aggregations/joins actually spill, and record per-family spill
metrics — the one scale behavior a 128 GiB sandbox never exercises.
A run is green when every family completes (spilling is EXPECTED and
healthy; an OOM or a cliff is the failure mode).

Usage (the small heap comes from the env the session builder reads):

    SPARK_GRAFT_DRIVER_MEM=3g python tools/mem_soak.py \
        [soak_dir=spark-warehouse/soak_sf1] [out=MEMSOAK_r07.json]

Spill numbers come from the AppStatusStore stage metrics
(memoryBytesSpilled / diskBytesSpilled deltas around each family), the
same source as the Web UI's stage table.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SOAK_DIR = sys.argv[1] if len(sys.argv) > 1 else "spark-warehouse/soak_sf1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "MEMSOAK_r07.json"


def _spill_totals(spark):
    """(memoryBytesSpilled, diskBytesSpilled, peakExecutionMemory) summed
    over all completed stages so far."""
    store = spark.sparkContext._jsc.sc().statusStore()
    # Spark 4 signature: stageList(statuses, withSummaries,
    # withDetails?, quantiles[], taskStatuses)
    jvm = spark._jvm
    empty = jvm.java.util.ArrayList()
    quantiles = spark.sparkContext._gateway.new_array(jvm.double, 0)
    stages = store.stageList(empty, False, False, quantiles, empty)
    mem = disk = 0
    n = stages.size()
    for i in range(n):
        s = stages.apply(i)
        mem += s.memoryBytesSpilled()
        disk += s.diskBytesSpilled()
    return mem, disk


def main() -> None:
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from oxigraph_spark.session import get_spark

    heap = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark("oxigraph-spark-mem-soak")
    spark.range(1000).selectExpr("sum(id)").collect()

    qs = entry.queries()
    # the families that buffer real state: wide aggregation, closure
    # fixpoint, guarded dedup self-joins, ANN index build, plus an
    # explicit full-corpus ORDER BY (sort is the canonical spiller)
    families = [
        ("flagship_q1", lambda: qs["flagship_q1"](spark, SOAK_DIR).count()),
        ("A_aggregates", lambda: qs["A_aggregates"](spark, SOAK_DIR).count()),
        ("PP6_plus", lambda: qs["PP6_plus"](spark, SOAK_DIR).count()),
        ("X_dedup_minhash",
         lambda: qs["X_dedup_minhash"](spark, SOAK_DIR).count()),
        ("X_embed_dedup",
         lambda: qs["X_embed_dedup"](spark, SOAK_DIR).count()),
        ("X_simsearch_topk",
         lambda: qs["X_simsearch_topk"](spark, SOAK_DIR).count()),
    ]

    def _fat_lineitem():
        # inflate the soak lineitem (~6M rows) 10x with a 96-byte pad:
        # ~6 GB of UnsafeRows, several times this run's execution
        # memory, so the sort/aggregate MUST spill to finish
        from oxigraph_spark.sources.tables import load_table
        li = load_table(spark, SOAK_DIR, "lineitem") \
            .select("l_orderkey", "l_partkey", "l_extendedprice")
        return (li.withColumn("copy", F.explode(F.sequence(F.lit(0),
                                                           F.lit(9))))
                  .withColumn("pad", F.concat(
                      F.lpad(F.col("l_orderkey").cast("string"), 48, "o"),
                      F.lpad(F.col("l_partkey").cast("string"), 48, "p"))))

    def full_sort():
        # noop sink keeps the global Sort in the executed plan (an
        # aggregate above it would let Catalyst eliminate the sort)
        (_fat_lineitem().orderBy("pad", "l_extendedprice", "copy")
         .write.mode("overwrite").format("noop").save())
        return -1

    def wide_group():
        # the returned value DEPENDS on the collect_list buffers, so
        # column pruning cannot drop them
        return int(_fat_lineitem()
                   .groupBy("l_partkey")
                   .agg(F.collect_list("pad").alias("pads"))
                   .select(F.sum(F.size("pads")).alias("n"))
                   .collect()[0]["n"])

    families += [("full_sort_60m_fat", full_sort),
                 ("wide_group_collect_60m", wide_group)]

    out: dict = {"heap": heap, "soak_dir": SOAK_DIR, "families": {},
                 "oom": False}
    for name, fn in families:
        m0, d0 = _spill_totals(spark)
        t0 = time.time()
        try:
            rows = fn()
            err = None
        except Exception as ex:  # noqa: BLE001
            rows, err = None, f"{type(ex).__name__}: {str(ex)[:200]}"
            traceback.print_exc()
            out["oom"] = "OutOfMemory" in (err or "")
        wall = round(time.time() - t0, 3)
        m1, d1 = _spill_totals(spark)
        out["families"][name] = {
            "sec": wall, "rows": rows, "err": err,
            "spill_mem_mb": round((m1 - m0) / 2**20, 1),
            "spill_disk_mb": round((d1 - d0) / 2**20, 1),
        }
        print(f"# {name}: {wall}s rows={rows} "
              f"spill_mem={out['families'][name]['spill_mem_mb']}MB "
              f"spill_disk={out['families'][name]['spill_disk_mb']}MB"
              + (f" ERR={err}" if err else ""), file=sys.stderr)
    out["total_spill_disk_mb"] = round(sum(
        f["spill_disk_mb"] for f in out["families"].values()), 1)
    out["all_completed"] = all(
        f["err"] is None for f in out["families"].values())
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"memsoak": out["all_completed"], "heap": heap,
                      "total_spill_disk_mb": out["total_spill_disk_mb"]}))


if __name__ == "__main__":
    main()
