"""Continuous SPARQL: registered queries re-evaluated over streaming
quad ingest.

The C-SPARQL / RSP re-evaluation model (Barbieri et al., "C-SPARQL:
SPARQL for continuous querying", WWW 2009): RDF arrives as a stream,
a set of standing queries is re-evaluated as data lands, and each
evaluation's result replaces the previous snapshot.  The reference
engine has no stream support (its store is RocksDB + a pull evaluator);
this is the Structured-Streaming-native re-expression:

- ingest is ``readStream.text`` over a drop directory of N-Triples /
  N-Quads files (the same lenient line parser as the batch reader —
  pure column expressions, so it runs wherever Spark schedules it);
- each micro-batch APPENDS parsed quads to a parquet quad log
  (predicate-partitioned is the store layout; the log is the cheap
  ingest tier) and re-evaluates every registered query over
  base ∪ log, overwriting that query's result snapshot;
- delivery is exactly-once per batch via ``foreachBatch`` +
  checkpointing; a crashed driver replays the last batch, and both
  the append and the snapshot overwrite are idempotent per batch id.

At 100 TB the quad log compacts into the bucketed store on a schedule
(``ParquetQuadStore.write``); re-evaluation cost is the query's normal
batch cost — Spark's incremental execution applies to the windowed
aggregate operators in :mod:`.events`, while full SPARQL re-evaluation
is the snapshot tier.  Windowed/stateful standing queries should
compose those operators instead.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.ntriples import parse_nt_lines

__all__ = ["stream_ntriples", "continuous_sparql"]


def stream_ntriples(spark: SparkSession, drop_dir: str,
                    max_files_per_trigger: int = 1,
                    pattern: str = "*.n[tq]") -> DataFrame:
    """Streaming frame of raw N-Triples/N-Quads lines from a drop
    directory (new ``.nt``/``.nq`` files appear → new micro-batch)."""
    return (spark.readStream
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .text(os.path.join(drop_dir, pattern)))


def continuous_sparql(lines: DataFrame, queries: Dict[str, str], *,
                      quad_log: str, results_dir: str,
                      base_store=None, quads: bool = False,
                      checkpoint: Optional[str] = None,
                      available_now: bool = True,
                      window_batches: Optional[int] = None):
    """Start the standing-query stream; returns the StreamingQuery
    (callers own ``awaitTermination``/``stop``).

    ``queries`` maps snapshot name → SPARQL text.  After each batch,
    ``results_dir/<name>`` holds that query's full re-evaluation over
    everything ingested so far (∪ ``base_store``'s quads if given).
    ``available_now=True`` drains what's already in the drop dir and
    stops — the testable mode; pass False for a long-running stream.

    ``window_batches=W`` gives C-SPARQL's sliding window: only quads
    from the most recent W micro-batches participate in re-evaluation
    (the base store, if given, always does).  The quad log carries a
    ``__batch`` partition column, so the window filter prunes log
    PARTITIONS — an evaluation never reads expired data, and expired
    partitions can be dropped by retention jobs without touching the
    stream.
    """
    from ..operators.update import MutableQuadSource
    from ..store import Store

    spark = lines.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch hands a CLONED session — confs must be set on
        # THAT session or the write below silently ignores them
        bspark = batch_df.sparkSession
        new_quads = parse_nt_lines(batch_df, quads=quads)
        # idempotent under batch REPLAY (driver crash between the log
        # write and the checkpoint commit re-runs this batch_id):
        # dynamic partition overwrite replaces ONLY this batch's
        # partition, so a replayed batch lands exactly once — a plain
        # append would double its quads forever
        prev = bspark.conf.get("spark.sql.sources.partitionOverwriteMode",
                               "static")
        bspark.conf.set("spark.sql.sources.partitionOverwriteMode",
                        "dynamic")
        try:
            new_quads.withColumn("__batch", F.lit(batch_id)) \
                .write.mode("overwrite").partitionBy("__batch") \
                .parquet(quad_log)
        finally:
            bspark.conf.set("spark.sql.sources.partitionOverwriteMode",
                            prev)
        log = spark.read.parquet(quad_log)
        if window_batches is not None:
            log = log.where(
                F.col("__batch") > batch_id - window_batches)
        all_quads = log.drop("__batch")
        if base_store is not None:
            all_quads = base_store.source.quads().unionByName(all_quads)
        # persist: every registered query pattern-scans this frame —
        # don't re-read the log per scan; released before the batch
        # ends so a long-running stream holds at most one copy
        cached = all_quads.persist()
        try:
            st = Store(spark, MutableQuadSource(spark, cached))
            for name, sparql in queries.items():
                st.query(sparql).write.mode("overwrite") \
                    .parquet(os.path.join(results_dir, name))
        finally:
            cached.unpersist()

    writer = lines.writeStream.foreachBatch(process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
