"""Deterministic scale-soak data generator (round-6 verdict item 1).

Generates an sfN-style dataset with the exact TESTDATA.md schema
(`region nation customer supplier part orders lineitem events
documents embeddings`) at any multiple of sf0.1's row counts, PLUS
planted power-law skew — the shapes every 100 TB design claim is
supposed to survive but which the driver's uniform sf0.1 data never
exercises:

- ``orders.o_custkey``: HOT_FRAC of all orders hit customer 0 (hot key
  in FK joins and a high-in-degree node in the link graph used by
  PageRank/BFS);
- ``lineitem.l_partkey``: HOT_FRAC/2 of lineitems hit part 0;
- ``events.user_id``: HOT_FRAC of events from user 0 (skews
  sessionization / stateful windows / as-of);
- ``documents.text``: HOT_FRAC of documents share ONE identical text
  (a giant exact+near-dup family — the planted hot bucket for the
  dedup families' skew caps);
- ``documents.source``: src0 takes ~1/3 of the corpus (strata skew).

Everything is generated DISTRIBUTED and DETERMINISTIC: `spark.range`
plus pure column expressions seeded by ``xxhash64(id, seed)`` — no
driver-side loops, no RNG state, so any worker count yields the same
rows.  Writes only under the given output dir (never /root/testdata).

Usage: python tools/gen_scale_data.py <out_dir> [multiplier]
  multiplier 10 (default) ≈ "sf1": lineitem 6M, orders 1.5M, events 1M.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

# sf0.1 row counts (TESTDATA.md tables, measured from the parquet footers)
BASE = {
    "customer": 15_000, "supplier": 1_000, "part": 20_000,
    "orders": 150_000, "lineitem": 600_000, "events": 100_000,
    "documents": 5_000, "embeddings": 2_000,
}

HOT_FRAC = 0.05          # planted hot-key mass (fraction of rows)
HOT_DOC_TEXT_FRAC = 0.05  # fraction of documents sharing one text

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
            "MACHINERY"]
STATUSES = ["F", "O", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"]
FLAGS = ["A", "N", "R"]
LINESTATUS = ["F", "O"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "en", "en", "en", "en", "en", "de", "fr", "es", "zh"]
WORDS = ["spark", "table", "query", "scan", "join", "hash", "sort",
         "column", "row", "value", "batch", "vector", "window", "agg",
         "part", "line", "order", "small", "fast", "slow", "index",
         "store", "graph", "stream"]


def _h(seed: int, *cols) -> Column:
    """Deterministic non-negative 63-bit hash of (seed, *cols)."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def _uniform(seed: int, n: int, *cols) -> Column:
    return _h(seed, *cols) % F.lit(n)


def _money(seed: int, lo: float, hi: float, *cols) -> Column:
    cents = _h(seed, *cols) % F.lit(int((hi - lo) * 100))
    return F.round(F.lit(lo) + cents / F.lit(100.0), 2)


def _hot(seed: int, frac: float, hot_value, other: Column,
         *cols) -> Column:
    """``hot_value`` with probability ``frac``, else ``other``."""
    return F.when(_h(seed, *cols) % 10_000 < int(frac * 10_000),
                  F.lit(hot_value)).otherwise(other)


def _pick(arr, idx: Column) -> Column:
    return F.element_at(F.array(*[F.lit(x) for x in arr]), idx + 1)


def _words_text(seed: int, n_words: Column) -> Column:
    """Pseudo-random word sequence of per-row length (JVM-side)."""
    return F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_words - 1),
            lambda i: _pick(WORDS, (_h(seed, F.col("id"), i)
                                    % len(WORDS)).cast("int"))),
        " ")


def generate(spark: SparkSession, out_dir: str, mult: int = 10) -> None:
    os.makedirs(out_dir, exist_ok=True)
    n = {t: c * mult for t, c in BASE.items()}

    def write(df: DataFrame, name: str) -> None:
        df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet"))
        print(f"# wrote {name}", file=sys.stderr)

    region = spark.range(5).select(
        F.col("id").cast("int").alias("r_regionkey"),
        _pick(REGIONS, F.col("id").cast("int")).alias("r_name"))
    write(region, "region")

    nation = spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
        (F.col("id") % 5).cast("int").alias("n_regionkey"))
    write(nation, "nation")

    customer = spark.range(n["customer"]).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"),
                 F.lpad(F.col("id").cast("string"), 9, "0"))
        .alias("c_name"),
        _uniform(11, 25, F.col("id")).cast("int").alias("c_nationkey"),
        _money(12, -999.99, 9999.99, F.col("id")).alias("c_acctbal"),
        _pick(SEGMENTS, (_uniform(13, 5, F.col("id"))).cast("int"))
        .alias("c_mktsegment"))
    write(customer, "customer")

    supplier = spark.range(n["supplier"]).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"),
                 F.lpad(F.col("id").cast("string"), 9, "0"))
        .alias("s_name"),
        _uniform(21, 25, F.col("id")).cast("int").alias("s_nationkey"),
        _money(22, -999.99, 9999.99, F.col("id")).alias("s_acctbal"))
    write(supplier, "supplier")

    part = spark.range(n["part"]).select(
        F.col("id").alias("p_partkey"),
        F.concat(F.lit("part "), _pick(
            WORDS, (_uniform(31, len(WORDS), F.col("id"))).cast("int")),
            F.lit(" "), F.col("id")).alias("p_name"),
        F.concat(F.lit("Brand#"),
                 (_uniform(32, 5, F.col("id")) + 1).cast("string"),
                 (_uniform(33, 5, F.col("id"), F.lit(1)) + 1)
                 .cast("string")).alias("p_brand"),
        F.concat(
            _pick(["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY",
                   "PROMO"], (_uniform(34, 6, F.col("id"))).cast("int")),
            F.lit(" "),
            _pick(["ANODIZED", "BURNISHED", "PLATED", "POLISHED",
                   "BRUSHED"], (_uniform(35, 5, F.col("id"))).cast("int")),
            F.lit(" "),
            _pick(["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"],
                  (_uniform(36, 5, F.col("id"))).cast("int")))
        .alias("p_type"),
        (_uniform(37, 50, F.col("id")) + 1).cast("int").alias("p_size"),
        _money(38, 900.0, 2000.0, F.col("id")).alias("p_retailprice"))
    write(part, "part")

    orders = spark.range(n["orders"]).select(
        F.col("id").alias("o_orderkey"),
        # PLANTED SKEW: HOT_FRAC of all orders hit customer 0
        _hot(41, HOT_FRAC, 0,
             _uniform(42, n["customer"], F.col("id")), F.col("id"))
        .cast("long").alias("o_custkey"),
        _pick(STATUSES, (_uniform(43, 3, F.col("id"))).cast("int"))
        .alias("o_orderstatus"),
        _money(44, 850.0, 500_000.0, F.col("id")).alias("o_totalprice"),
        F.timestamp_seconds(
            F.lit(820_454_400)  # 1996-01-01
            + _uniform(45, 10 * 365, F.col("id")) * 86_400)
        .alias("o_orderdate"),
        _pick(PRIORITIES, (_uniform(46, 5, F.col("id"))).cast("int"))
        .alias("o_orderpriority"))
    write(orders, "orders")

    lineitem = spark.range(n["lineitem"]).select(
        _uniform(51, n["orders"], F.col("id")).alias("l_orderkey"),
        # PLANTED SKEW: HOT_FRAC/2 of lineitems hit part 0
        _hot(52, HOT_FRAC / 2, 0,
             _uniform(53, n["part"], F.col("id")), F.col("id"))
        .cast("long").alias("l_partkey"),
        _uniform(54, n["supplier"], F.col("id")).alias("l_suppkey"),
        (_uniform(55, 7, F.col("id")) + 1).cast("int")
        .alias("l_linenumber"),
        (_uniform(56, 50, F.col("id")) + 1).cast("double")
        .alias("l_quantity"),
        _money(57, 900.0, 100_000.0, F.col("id"))
        .alias("l_extendedprice"),
        (_uniform(58, 11, F.col("id")) / 100.0).alias("l_discount"),
        (_uniform(59, 9, F.col("id")) / 100.0).alias("l_tax"),
        _pick(FLAGS, (_uniform(60, 3, F.col("id"))).cast("int"))
        .alias("l_returnflag"),
        _pick(LINESTATUS, (_uniform(61, 2, F.col("id"))).cast("int"))
        .alias("l_linestatus"),
        F.timestamp_seconds(
            F.lit(820_454_400)
            + _uniform(62, 10 * 365, F.col("id")) * 86_400)
        .alias("l_shipdate"))
    write(lineitem, "lineitem")

    events = spark.range(n["events"]).select(
        F.col("id").alias("event_id"),
        # ordered, jittered timestamps from 2024-01-01 (~1 event/sec)
        F.timestamp_micros(
            F.lit(1_704_067_200_000_000)
            + F.col("id") * 1_000_000
            + (_h(71, F.col("id")) % 1_000_000)).alias("ts"),
        # PLANTED SKEW: HOT_FRAC of events from user 0
        _hot(72, HOT_FRAC, 0,
             _uniform(73, max(2_000, n["events"] // 50), F.col("id")),
             F.col("id"))
        .cast("long").alias("user_id"),
        _pick(EVENT_TYPES, (_uniform(74, 5, F.col("id"))).cast("int"))
        .alias("event_type"),
        _money(75, 0.0, 200.0, F.col("id")).alias("value"),
        F.concat(F.lit('{"k": '),
                 (_uniform(76, 100, F.col("id"))).cast("string"),
                 F.lit("}")).alias("props"))
    write(events, "events")

    n_words = (_uniform(81, 50, F.col("id")) + 10).cast("int")
    body = _words_text(82, n_words)
    hot_text = " ".join(
        WORDS[(i * 7) % len(WORDS)] for i in range(40))
    documents = spark.range(n["documents"]).select(
        F.col("id").alias("doc_id"),
        # PLANTED SKEW: one identical text for HOT_DOC_TEXT_FRAC of docs
        # (the dedup families' hot bucket), everything else pseudo-random
        F.when(_h(83, F.col("id")) % 10_000
               < int(HOT_DOC_TEXT_FRAC * 10_000), F.lit(hot_text))
        .otherwise(body).alias("text"),
        _pick(LANGS, (_uniform(84, len(LANGS), F.col("id"))).cast("int"))
        .alias("lang"),
        # PLANTED SKEW: src0 takes ~1/3 of the corpus
        F.concat(F.lit("src"), F.when(
            _h(85, F.col("id")) % 3 == 0, F.lit(0)).otherwise(
            _uniform(86, 20, F.col("id"))).cast("string")).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))
    write(documents, "documents")

    # clustered embeddings: 16 centers, center(label)·0.8 + noise·0.3 —
    # IVF/LSH quality measurements need real cluster structure
    dim = 64
    label = _uniform(91, 16, F.col("id")).cast("int")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            ((_h(92, label, i) % 2_001) / 1_000.0 - 1.0) * 0.8
            + ((_h(93, F.col("id"), i) % 2_001) / 1_000.0 - 1.0) * 0.3
        ).cast("float"))
    embeddings = spark.range(n["embeddings"]).select(
        F.col("id").alias("vec_id"),
        vec.alias("embedding"),
        label.alias("label"))
    write(embeddings, "embeddings")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "spark-warehouse/soak_sf1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from oxigraph_spark.session import get_spark
    spark = get_spark("gen-scale-data")
    generate(spark, out_dir, mult)
    print(f"# done: {out_dir} at {mult}x sf0.1", file=sys.stderr)


if __name__ == "__main__":
    main()
