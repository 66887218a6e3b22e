"""Streaming extension over the ``events`` table.

The reference has NO event-time streaming (SURVEY.md §2.10 — its
"streaming" is incremental parser I/O); this module is an *extension*
using Structured Streaming idioms.  Every windowed operator is defined as
a pure DataFrame transform so the SAME code runs in batch mode (DuckDB
oracle-checkable) and under ``readStream`` (watermarked, incremental):

    batch:  tumbling_counts(load_table(spark, sf, "events"))
    stream: tumbling_counts(stream_events(spark, sf), streaming=True)
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType, TimestampType)


def stream_events(spark: SparkSession, sf_dir: str,
                  max_files_per_trigger: int = 1) -> DataFrame:
    """events.parquet replayed as a file-source stream."""
    from ..sources.tables import load_table, normalize_ntz
    batch = load_table(spark, sf_dir, "events")
    # the streaming file source requires a DIRECTORY; select the events
    # file from the sf dir via glob filter, and reapply the nano→micro
    # timestamp conversion (schema must match the raw file: ts is long)
    raw_schema = spark.read.option("pathGlobFilter", "events.parquet") \
        .parquet(sf_dir).schema
    stream = (spark.readStream
              .schema(raw_schema)
              .option("pathGlobFilter", "events.parquet")
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(sf_dir))
    for f in raw_schema.fields:
        if f.name == "ts" and f.dataType.simpleString() == "bigint":
            stream = stream.withColumn(
                "ts", F.timestamp_micros(F.expr("`ts` div 1000")))
    return normalize_ntz(stream)


def with_watermark(df: DataFrame, delay: str = "10 minutes") -> DataFrame:
    return df.withWatermark("ts", delay) if df.isStreaming else df


def tumbling_counts(events: DataFrame, width: str = "5 minutes") -> DataFrame:
    """Tumbling event-time window: count + sum(value) per (window, type)."""
    ev = with_watermark(events)
    out = (ev.groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
             .agg(F.count(F.lit(1)).alias("cnt"),
                  F.round(F.sum("value"), 6).alias("sum_value")))
    return out.select(F.col("w.start").alias("win_start"),
                      "event_type", "cnt", "sum_value")


def sliding_counts(events: DataFrame, width: str = "10 minutes",
                   slide: str = "5 minutes") -> DataFrame:
    ev = with_watermark(events)
    out = (ev.groupBy(F.window("ts", width, slide).alias("w"))
             .agg(F.count(F.lit(1)).alias("cnt")))
    return out.select(F.col("w.start").alias("win_start"), "cnt")


def session_windows(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Per-user session windows (gap-based).  Streaming uses the native
    ``session_window``; batch mode computes identical sessions with a
    gaps-and-islands window (lag + cumulative sum) so DuckDB can oracle it."""
    if events.isStreaming:
        ev = with_watermark(events)
        return (ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
                  .agg(F.count(F.lit(1)).alias("n_events"))
                  .select(F.col("w.start").alias("sess_start"), "user_id",
                          "n_events"))
    from pyspark.sql import Window
    gap_s = _duration_seconds(gap)
    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("ts").over(w)
    # microsecond precision — unix_timestamp() truncates to seconds and
    # flips borderline gap decisions vs the sub-second oracle
    gap_micros = gap_s * 1_000_000
    new_sess = (F.when(prev.isNull(), 1)
                 .when(F.unix_micros(F.col("ts")) - F.unix_micros(prev)
                       > gap_micros, 1)
                 .otherwise(0))
    sess_id = F.sum(new_sess).over(w)
    return (events.withColumn("__sid", sess_id)
            .groupBy("user_id", "__sid")
            .agg(F.min("ts").alias("sess_start"),
                 F.count(F.lit(1)).alias("n_events"))
            .select("sess_start", "user_id", "n_events"))


def _duration_seconds(s: str) -> int:
    n, unit = s.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600}[unit]
    return int(n) * mult


def correlate_events(left: DataFrame, right: DataFrame,
                     within: str = "10 minutes",
                     watermark: str = "10 minutes") -> DataFrame:
    """Stream-stream event correlation: pair every left event with the
    same user's right events that happen within ``within`` AFTER it →
    ``(user_id, left_id, right_id, left_type, right_type, lag_seconds)``.

    The canonical funnel/attribution join.  Under streaming both sides
    are watermarked and the join carries the event-time range condition,
    so Spark bounds the buffered state to the watermark horizon (no
    unbounded state); in batch mode the identical expression is a plain
    range join, so the DuckDB oracle and the stream agree row-for-row."""
    a = with_watermark(left, watermark).alias("a")
    b = with_watermark(right, watermark).alias("b")
    secs = _duration_seconds(within)
    cond = ((F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_id") != F.col("b.event_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts")
               + F.expr(f"INTERVAL {secs} SECONDS")))
    return a.join(b, cond).select(
        F.col("a.user_id").alias("user_id"),
        F.col("a.event_id").alias("left_id"),
        F.col("b.event_id").alias("right_id"),
        F.col("a.event_type").alias("left_type"),
        F.col("b.event_type").alias("right_type"),
        ((F.unix_micros(F.col("b.ts")) - F.unix_micros(F.col("a.ts")))
         / 1e6).alias("lag_seconds"))


def asof_join(left: DataFrame, right: DataFrame, *, on,
              left_time: str = "ts", right_time: Optional[str] = None,
              direction: str = "backward",
              tolerance: Optional[str] = None,
              right_cols: Optional[list] = None,
              suffix: str = "_r") -> DataFrame:
    """Point-in-time (as-of) LEFT join: each left row picks the single
    right row with the same key and the nearest event time —
    ``backward`` = latest right with ``rt <= lt`` (the market-data /
    feature-store lookup), ``forward`` = earliest right with
    ``rt >= lt``, ``nearest`` = whichever of the two is closer (ties →
    backward).  Unmatched left rows keep NULL right columns;
    ``tolerance`` (e.g. ``"10 minutes"``) voids matches further than
    that from the left time.

    Spark has no native ASOF join and the naive range join explodes to
    O(|L|·|R|) per key, so this is the union-tag formulation: tag both
    sides, union on ``(key, time)``, ONE shuffle, and a running
    ``last(right_payload, ignorenulls)`` window per key — each left row
    reads the latest right payload at or before it in sort order.
    Linear in |L|+|R| with exactly one exchange; at 100 TB the caveat
    is per-key sort locality: one pathological key serializes into one
    task (pre-split such keys by coarse time bucket and merge boundary
    rows if that ever bites — not done here).

    Batch-only (the window is unbounded-preceding per key; for
    streaming correlation use :func:`correlate_events`).  Right rows
    with NULL key or time are dropped; left rows always survive.
    """
    from pyspark.sql.window import Window

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"asof_join: unknown direction {direction!r} "
            "(backward, forward, or nearest)")
    keys = [on] if isinstance(on, str) else list(on)
    rt = right_time or left_time
    payload = right_cols or [c for c in right.columns
                             if c not in keys and c != rt]
    out_names = [(c, c + suffix if c in left.columns else c)
                 for c in payload]

    r = right.where(F.col(rt).isNotNull())
    for k in keys:
        r = r.where(F.col(k).isNotNull())
    r = r.select(*[F.col(k).alias(f"__k{i}") for i, k in enumerate(keys)],
                 F.col(rt).cast("timestamp").alias("__t"),
                 F.lit(0).alias("__is_left"),
                 F.struct(*[F.col(c) for c in payload],
                          F.col(rt).cast("timestamp").alias("__rt"))
                 .alias("__p"))
    # the left row rides the union as ONE opaque struct column, so the
    # operator imposes no left-schema restrictions; unpacked after the
    # window
    l = left.select(*[F.col(k).alias(f"__k{i}") for i, k in enumerate(keys)],
                    F.col(left_time).cast("timestamp").alias("__t"),
                    F.lit(1).alias("__is_left"),
                    F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
                    F.struct(*left.columns).alias("__l"))
    r = r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType))
    u = r.unionByName(l)

    kcols = [f"__k{i}" for i in range(len(keys))]
    # right rows sort BEFORE left rows at equal time in BOTH orderings,
    # so rt == lt matches inclusively either direction
    w_back = (Window.partitionBy(*kcols)
              .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_fwd = (Window.partitionBy(*kcols)
             .orderBy(F.col("__t").desc(), F.col("__is_left").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    secs = _duration_seconds(tolerance) if tolerance is not None else None

    def _void_outside_tolerance(col, back: bool):
        if secs is None:
            return col
        if back:
            ok = col["__rt"] >= F.col("__t") - F.expr(
                f"INTERVAL {secs} SECONDS")
        else:
            ok = col["__rt"] <= F.col("__t") + F.expr(
                f"INTERVAL {secs} SECONDS")
        return F.when(ok, col)

    if direction == "nearest":
        # both runnings share the one partitioning exchange; the second
        # window only adds a re-sort within partitions
        m = u.withColumn("__mb", F.last("__p", ignorenulls=True).over(w_back)) \
             .withColumn("__mf", F.last("__p", ignorenulls=True).over(w_fwd)) \
             .where(F.col("__is_left") == 1)
        mb = _void_outside_tolerance(F.col("__mb"), back=True)
        mf = _void_outside_tolerance(F.col("__mf"), back=False)
        db = F.unix_micros(F.col("__t")) - F.unix_micros(mb["__rt"])
        df_ = F.unix_micros(mf["__rt"]) - F.unix_micros(F.col("__t"))
        matched = m.withColumn(
            "__m",
            F.when(mb.isNull(), mf)
             .when(mf.isNull(), mb)
             .when(df_ < db, mf)            # ties (db == df_) → backward
             .otherwise(mb))
    else:
        w = w_back if direction == "backward" else w_fwd
        matched = u.withColumn(
            "__m", F.last("__p", ignorenulls=True).over(w)) \
            .where(F.col("__is_left") == 1)
        matched = matched.withColumn(
            "__m", _void_outside_tolerance(F.col("__m"),
                                           back=direction == "backward"))
    # a NULL left time never matches: under the desc (forward) ordering
    # nulls sort last and would otherwise see every right row
    matched = matched.withColumn(
        "__m", F.when(F.col("__t").isNotNull(), F.col("__m")))
    out = [F.col("__l")[c].alias(c) for c in left.columns]
    out += [F.col("__m")[c].alias(name) for c, name in out_names]
    return matched.select(*out)


def stream_documents(spark: SparkSession, sf_dir: str,
                     max_files_per_trigger: int = 1) -> DataFrame:
    """documents.parquet replayed as a file-source stream (ingest-shape
    testing for the incremental dedup sink)."""
    schema = spark.read.option("pathGlobFilter", "documents.parquet") \
        .parquet(sf_dir).schema
    return (spark.readStream
            .schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(sf_dir))


def incremental_dedup_stream(docs: DataFrame, corpus_sig: DataFrame,
                             out_path: str,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             num_perm: int = 16, bands: int = 4,
                             threshold: float = 0.5):
    """Streaming ingest dedup: every micro-batch of new documents is
    MinHash-checked against the persisted corpus signature table via
    ``foreachBatch``, and near-dup pairs append to ``out_path`` as
    parquet.  This is the production ingest shape — per batch the
    corpus text is never read, only its signature table
    (``pipeline/dedup.py`` ``minhash_lsh_pairs_incremental``), and the
    batch side is broadcast-sized so the corpus never shuffles.

    Returns the started StreamingQuery; callers own ``awaitTermination``
    / ``stop``."""
    from ..pipeline.dedup import minhash_lsh_pairs_incremental

    def process(batch_df: DataFrame, batch_id: int) -> None:
        pairs = minhash_lsh_pairs_incremental(
            batch_df, corpus_sig, text_col, id_col,
            num_perm=num_perm, bands=bands, threshold=threshold)
        pairs.write.mode("append").parquet(out_path)

    return (docs.writeStream.foreachBatch(process)
            .trigger(availableNow=True).start())


OUT_SCHEMA = StructType([StructField("user_id", LongType()),
                         StructField("running_sum", DoubleType()),
                         StructField("n", LongType())])
STATE_SCHEMA = StructType([StructField("total", DoubleType()),
                           StructField("n", LongType())])


def stateful_running_sum(events: DataFrame, timeout_minutes: int = 30) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-user
    running sum with processing-timeout state eviction.  Batch fallback
    computes the same final state with a groupBy (oracle-checkable)."""
    if not events.isStreaming:
        return (events.groupBy("user_id")
                .agg(F.round(F.sum("value"), 6).alias("running_sum"),
                     F.count(F.lit(1)).alias("n"))
                .select("user_id", "running_sum", "n"))

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs: Iterator["pandas.DataFrame"], state: GroupState):
        import pandas as pd
        total, n = (state.get if state.exists else (0.0, 0))
        for pdf in pdfs:
            total += float(pdf["value"].sum())
            n += len(pdf)
        state.update((total, n))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame({"user_id": [key[0]], "running_sum": [round(total, 6)],
                            "n": [n]})

    return (events.groupBy("user_id")
            .applyInPandasWithState(update, OUT_SCHEMA, STATE_SCHEMA,
                                    "update", GroupStateTimeout.ProcessingTimeTimeout))
