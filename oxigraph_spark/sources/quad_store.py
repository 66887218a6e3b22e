"""Partitioned parquet quad store — the engine's native 100 TB layout.

The reference keeps six RocksDB orderings for index-selected scans
(``lib/oxigraph/src/storage/mod.rs``: spog/posg/ospg/…).  On Spark the
equivalent is ONE parquet dataset laid out for pruning instead of six:

- **partitioned by predicate** (vertical partitioning, the S2RDF insight):
  a bound-predicate pattern reads exactly one partition directory;
- within each partition, **sorted by (s.lex, o.lex)** so min/max row-group
  stats prune subject/object-bound scans (the spo/pos orderings for free);
- high-cardinality predicate sets hash-fold into ``__other`` buckets so
  the directory fan-out stays bounded.

``scan(p_lex)`` is the same interface the compiler uses for the
direct-mapping source — the query layer cannot tell them apart.
"""

from __future__ import annotations

import os
import re
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..model import terms as T

MAX_PARTITIONS = 512


class ParquetQuadStore:
    """Quads persisted as predicate-partitioned parquet."""

    def __init__(self, spark: SparkSession, path: str,
                 key_width: int = 64):
        """``key_width`` must match what :meth:`write` persisted: 64
        (default — single xxhash64 longs, half the exchange/group key
        width, ≲10⁹ distinct terms, see ``model.terms.join_key64``) or
        the 128-bit struct<h1,h2> fallback for larger corpora.  The
        compiler reads this attribute and dispatches every key
        computation to the same width."""
        self.spark = spark
        self.path = path
        self.key_width = key_width

    @staticmethod
    def write(df: DataFrame, path: str,
              sort_in_partition: bool = True,
              with_keys: bool = True,
              key_width: int = 64) -> None:
        """Write quads (s,p,o,g) partitioned by predicate.

        At 100 TB you run this once per ingest batch; repartitioning by
        the partition column co-locates each predicate's quads so every
        output partition dir is a small number of large files (no
        small-file explosion), and the in-partition sort gives parquet
        row-group min/max stats on s.lex/o.lex for index-like pruning.

        ``with_keys`` additionally persists the dictionary id of each
        position (``s_key``/``p_key``/``o_key``/``g_key``,
        :func:`dictionary.term_id` = ``terms.join_key`` layout).  The
        query compiler joins on these ids (``Compiled.ids``); persisting
        them at ingest means pattern scans serve join keys straight from
        parquet — zero query-time hashing, computed once per quad ever.
        ``key_width=64`` (default) persists single-xxhash64 BIGINT ids
        (≲10⁹-distinct-term corpora); ``key_width=128`` persists
        struct<h1,h2> double-hash ids (4×16 bytes/row pre-encoding;
        keys of repeated terms dictionary-encode well) for corpora
        beyond that — read back with the SAME ``key_width``."""
        from . import dictionary as D
        keyed = df.withColumn(
            "p_part",
            F.concat(
                F.regexp_replace(F.expr("right(p.lex, 80)"),
                                 "[^A-Za-z0-9_]+", "_"),
                F.lit("_"),
                F.substring(F.sha1(F.encode(F.col("p.lex"), "UTF-8")), 1, 8)))
        if with_keys:
            kf = T.join_key64 if key_width == 64 else D.term_id
            for pos in ("s", "p", "o", "g"):
                keyed = keyed.withColumn(f"{pos}_key", kf(F.col(pos)))
        out = keyed.repartition(F.col("p_part"))
        if sort_in_partition:
            out = out.sortWithinPartitions("p_part", F.col("s.lex"),
                                           F.col("o.lex"))
        out.write.mode("overwrite").partitionBy("p_part").parquet(path)

    def _part_value(self, p_lex: str) -> str:
        slug = re.sub(r"[^A-Za-z0-9_]+", "_", p_lex[-80:])
        import hashlib
        return f"{slug}_{hashlib.sha1(p_lex.encode()).hexdigest()[:8]}"

    def scan(self, p_lex: Optional[str] = None) -> DataFrame:
        df = self.spark.read.parquet(self.path)
        if p_lex is not None:
            # partition pruning on p_part + exact check on p.lex
            df = df.where((F.col("p_part") == self._part_value(p_lex))
                          & (F.col("p.lex") == p_lex))
        # serve persisted dictionary keys alongside the terms when the
        # dataset was written with_keys — the compiler's pattern scan
        # (`_c_TriplePattern`) picks them up as the join-id sidecar
        # instead of re-hashing; column pruning drops unused ones
        cols = ["s", "p", "o", "g"] + [
            k for k in ("s_key", "p_key", "o_key", "g_key")
            if k in df.columns]
        return df.select(*cols)

    def quads(self) -> DataFrame:
        # plain quad schema (no key sidecars): update ops and exporters
        # union this with freshly instantiated quads
        return self.scan().select("s", "p", "o", "g")

    def pred_card(self, p_lex: str) -> Optional[int]:
        """Upper-bound cardinality of the ``p_lex`` vertical partition —
        the partition directory's parquet-footer row count (driver-side
        metadata read, no Spark job; hash-folded ``__other`` buckets
        over-count, which is the safe direction).  Same contract as
        ``DirectMappingSource.pred_card``: feeds cardinality-guided join
        ordering in the compiler."""
        from .tables import parquet_num_rows
        part_dir = os.path.join(self.path, f"p_part={self._part_value(p_lex)}")
        if not os.path.isdir(part_dir):
            return 0 if os.path.isdir(self.path) else None
        return parquet_num_rows(part_dir)


class BucketedQuadStore(ParquetQuadStore):
    """Subject-bucketed variant of the native layout (the brief's
    "bucketing for co-located joins"): predicate-partitioned like the
    parent, PLUS ``bucketBy(n, s_key).sortBy(s_key)`` within each
    partition.  Every pattern scan then reports
    ``HashPartitioning(s_key, n)`` to Catalyst, so:

    - subject-subject joins (``?x p1 ?a . ?x p2 ?b`` across predicates
      the star collapse can't merge — i.e. different storage partitions)
      need NO exchange on either side, and no sort (buckets are sorted);
    - FK-chain joins (pattern object → pattern subject) shuffle only the
      probe side to the bucket count — half the exchange volume;
    - the property-path fixpoint re-joins the (small) delta frontier
      against edges every round; bucketed edges mean each round shuffles
      ONLY the delta, never the 100 TB edge set.

    Constraints: requires ``key_width=64`` (Spark buckets on a primitive
    column; the BIGINT dictionary id — bounded to ≲10⁹ distinct terms,
    see ``model.terms.join_key64``) and a session catalog for the table
    metadata (in-memory catalog is fine within one session; production
    uses a metastore).  Upstream anchor: the six RocksDB orderings
    (``storage/mod.rs``) solve co-location by clustering on key order;
    bucketing is the Spark-native equivalent for equi-join locality."""

    def __init__(self, spark: SparkSession, path: str, table: str,
                 key_width: int = 64):
        if key_width != 64:
            raise ValueError("BucketedQuadStore requires key_width=64 "
                             "(bucket column must be a primitive id)")
        super().__init__(spark, path, key_width=key_width)
        self.table = table

    @staticmethod
    def write_bucketed(df: DataFrame, table: str, path: str,
                       n_buckets: int = 64) -> None:
        """Write quads predicate-partitioned AND subject-bucketed.

        ``repartition`` by (partition, bucket-id) first so each task owns
        whole buckets — without it every write task emits a file per
        bucket per partition dir (task × bucket small-file explosion).
        ``pmod(hash(s_key), n)`` is exactly Spark's bucket-id function
        (Murmur3, seed 42), so the pre-shuffle lines up 1:1 with the
        writer's bucket assignment."""
        from ..model import terms as T
        spark = df.sparkSession
        keyed = df.withColumn(
            "p_part",
            F.concat(
                F.regexp_replace(F.expr("right(p.lex, 80)"),
                                 "[^A-Za-z0-9_]+", "_"),
                F.lit("_"),
                F.substring(F.sha1(F.encode(F.col("p.lex"), "UTF-8")), 1, 8)))
        for pos in ("s", "p", "o", "g"):
            keyed = keyed.withColumn(f"{pos}_key", T.join_key64(F.col(pos)))
        out = keyed.repartition(
            F.col("p_part"), F.expr(f"pmod(hash(s_key), {n_buckets})"))
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        (out.write.mode("overwrite")
            .partitionBy("p_part")
            .bucketBy(n_buckets, "s_key")
            .sortBy("s_key")
            .option("path", path)
            .saveAsTable(table))

    def scan(self, p_lex: Optional[str] = None) -> DataFrame:
        # spark.table (NOT read.parquet): only the catalog relation
        # carries the bucket spec that planning uses to elide exchanges
        df = self.spark.table(self.table)
        if p_lex is not None:
            df = df.where((F.col("p_part") == self._part_value(p_lex))
                          & (F.col("p.lex") == p_lex))
        cols = ["s", "p", "o", "g"] + [
            k for k in ("s_key", "p_key", "o_key", "g_key")
            if k in df.columns]
        return df.select(*cols)
