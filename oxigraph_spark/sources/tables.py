"""Loader for the driver's relational parquet tables.

``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]).  We read nanos as
longs (``spark.sql.legacy.parquet.nanosAsLong``) and convert to proper
timestamps — microsecond truncation is irrelevant for the driver data
(millisecond resolution) and documented here for anyone feeding true
nano-resolution data.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import List, Tuple

from pyspark.sql import DataFrame, SparkSession, functions as F


@lru_cache(maxsize=None)
def _nano_ts_columns(path: str) -> Tuple[str, ...]:
    try:
        import pyarrow.parquet as pq
        schema = pq.read_schema(_first_parquet_file(path))
        return tuple(f.name for f in schema
                     if str(f.type) == "timestamp[ns]")
    except Exception:
        return ()


def _first_parquet_file(path: str) -> str:
    if os.path.isfile(path):
        return path
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(".parquet"):
                return os.path.join(root, f)
    return path


_TABLE_EXTS = ("parquet", "csv", "jsonl", "json")


def table_exists(sf_dir: str, name: str) -> bool:
    """True when the table is present in any supported format."""
    return any(os.path.exists(os.path.join(sf_dir, f"{name}.{e}"))
               for e in _TABLE_EXTS)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read ``{sf_dir}/{name}.parquet`` handling nano-timestamp columns.

    Falls back to ``{name}.csv`` (header + schema inference) or
    ``{name}.jsonl``/``{name}.json`` (JSON Lines) when no parquet file
    of that name exists, so the relational→RDF direct mapping accepts
    the common interchange formats directly.  Parquet stays the scale
    path (columnar pruning, predicate pushdown, row-group skipping);
    the text formats are for ingest convenience — convert once via
    ``df.write.parquet`` for anything queried repeatedly."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(path):
        def _csv(p):
            # Spark's CSV filter pushdown (UnivocityParser OrderedFilters)
            # throws ArrayIndexOutOfBounds when a pushed filter meets a
            # zero-column required schema — exactly the shape of an
            # `?x a <table>` scan, which projects no data columns.  CSV
            # is the ingest-convenience tier, so trade its pushdown away —
            # but only for THIS read: eagerly cache the parsed frame under
            # the disabled conf, then restore the session value so other
            # CSV workloads sharing the SparkSession keep their pushdown.
            key = "spark.sql.csv.filterPushdown.enabled"
            prev = spark.conf.get(key, None)
            spark.conf.set(key, "false")
            try:
                df = spark.read.option("header", "true") \
                    .option("inferSchema", "true").csv(p)
                df = df.cache()
                df.count()  # materialize while pushdown is off
                return df
            finally:
                if prev is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, prev)
        for ext, reader in (("csv", _csv),
                            ("jsonl", spark.read.json),
                            ("json", spark.read.json)):
            alt = os.path.join(sf_dir, f"{name}.{ext}")
            if os.path.exists(alt):
                return normalize_ntz(reader(alt))
    nanos: List[str] = list(_nano_ts_columns(path))
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos:
        # the legacy conf surfaces ns-timestamps as LONG on some writer
        # layouts only; when Spark 4 reads the column natively as
        # TIMESTAMP already, there is nothing to convert
        if df.schema[c].dataType.simpleString() != "bigint":
            continue
        # integer division — `/` promotes to double and loses ~100 µs of
        # precision at 2024-epoch nanosecond magnitudes
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return normalize_ntz(df)


def normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to TIMESTAMP (LTZ).  The session is
    pinned to UTC so the wall-clock values are unchanged; LTZ is required
    by streaming watermarks ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]) and
    keeps batch/stream schemas identical."""
    for f in df.schema.fields:
        if f.dataType.simpleString() == "timestamp_ntz":
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


@lru_cache(maxsize=4096)
def parquet_num_rows(path: str) -> "int | None":
    """Total row count of a parquet file or directory, read driver-side
    from the file footers (pyarrow metadata — no Spark job).  Returns
    None when the path has no readable parquet footer.  This is the
    engine's zero-cost statistics source: cardinality-guided join
    ordering reads it once per (path) and memoizes."""
    try:
        import pyarrow.parquet as pq
    except Exception:  # pragma: no cover - pyarrow is baked in
        return None
    total = 0
    seen = False
    if os.path.isfile(path):
        candidates = [path]
    else:
        candidates = []
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    candidates.append(os.path.join(root, f))
    for f in candidates:
        try:
            total += pq.read_metadata(f).num_rows
            seen = True
        except Exception:
            continue
    return total if seen else None
