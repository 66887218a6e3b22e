"""True Structured Streaming execution: the SAME windowed transforms that
the gate checks in batch mode run under readStream with availableNow
trigger, and the streamed result must equal the batch result."""

import pytest
from pyspark.sql import functions as F

from oxigraph_spark.sources.tables import load_table
from oxigraph_spark.streaming.events import (stream_events, tumbling_counts,
                                             sliding_counts)

SF = "/root/testdata/sf0.001"


def _run_stream(df, name):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q


def test_tumbling_stream_equals_batch(spark):
    batch = tumbling_counts(load_table(spark, SF, "events"), "15 minutes")
    expected = {(r.win_start, r.event_type): (r.cnt, r.sum_value)
                for r in batch.collect()}

    stream = tumbling_counts(stream_events(spark, SF), "15 minutes")
    assert stream.isStreaming
    _run_stream(stream, "tumbling_t")
    got = {(r.win_start, r.event_type): (r.cnt, r.sum_value)
           for r in spark.table("tumbling_t").collect()}
    assert got == expected


def test_sliding_stream_equals_batch(spark):
    batch = sliding_counts(load_table(spark, SF, "events"),
                           "30 minutes", "15 minutes")
    expected = {r.win_start: r.cnt for r in batch.collect()}
    stream = sliding_counts(stream_events(spark, SF),
                            "30 minutes", "15 minutes")
    _run_stream(stream, "sliding_t")
    got = {r.win_start: r.cnt for r in spark.table("sliding_t").collect()}
    assert got == expected


def test_stateful_stream_runs(spark):
    """applyInPandasWithState executes under a real stream."""
    from oxigraph_spark.streaming.events import stateful_running_sum
    stream = stateful_running_sum(stream_events(spark, SF))
    assert stream.isStreaming
    q = (stream.writeStream.format("memory").queryName("stateful_t")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.table("stateful_t").collect()
    assert len(rows) > 0
    batch = {r.user_id: (r.running_sum, r.n)
             for r in stateful_running_sum(
                 load_table(spark, SF, "events")).collect()}
    streamed = {r.user_id: (r.running_sum, r.n) for r in rows}
    assert streamed == batch
