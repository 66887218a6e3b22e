"""Blank-node canonicalization for graph/dataset comparison.

Reference: ``lib/oxrdf/src/dataset.rs`` · ``canonicalize`` — upstream
relabels blank nodes by iterative hash refinement so two isomorphic
graphs with different bnode labels serialize identically (and documents
that refinement-only labeling is not a complete isomorphism decision for
adversarially symmetric graphs; same caveat here).

Spark-first shape: the refinement loop is a per-round (join → explode →
groupBy-sum) over LONG hashes only — term structs are touched once at
encode and once at relabel; every per-round shuffle carries (bnode-label
hash, 8-byte contribution) rows.  Rounds are driver-iterated like the
property-path fixpoint (operators/paths.py), with a lazy
``localCheckpoint`` per round and the class-count action materializing
it; the loop stops when the number of distinct hash classes stops
growing, which isomorphic graphs reach after identical round counts.

Soundness: isomorphic inputs ALWAYS canonicalize identically (hashes are
label-independent).  Distinct-but-automorphic bnodes may share a final
hash; the multiset compare in :func:`isomorphic` keeps their quad counts,
so only adversarial symmetric constructions (equal counts, equal refined
hashes, non-isomorphic) can falsely compare equal — upstream's
documented trade-off as well.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..model import terms as T
from ..session import pin

MAX_ROUNDS = 32

_SEED = -7046029254386353131  # splitmix64 odd constant, shared with dedup


def _ground_hash(t: Column) -> Column:
    """64-bit content hash of a non-bnode term (null-sentinel fields as
    in terms.join_key)."""
    return F.xxhash64(t["kind"],
                      F.coalesce(t["lex"], F.lit("\x00L")),
                      F.coalesce(t["datatype"], F.lit("\x00D")),
                      F.coalesce(t["lang"], F.lit("\x00G")))


def _bl(t: Column) -> Column:
    """Blank-node label or NULL."""
    return F.when(t["kind"] == T.KIND_BNODE, t["lex"])


def canonical_bnode_hashes(df: DataFrame) -> DataFrame:
    """Quads → ``(b, h)``: one refined 64-bit hash per distinct blank
    node label.  The refinement neighborhood is (position, predicate,
    other endpoints, graph) per incident quad, summed commutatively so
    contribution order never matters."""
    enc = df.select(
        _bl(df["s"]).alias("sb"), _ground_hash(df["s"]).alias("sh0"),
        _ground_hash(df["p"]).alias("ph"),
        _bl(df["o"]).alias("ob"), _ground_hash(df["o"]).alias("oh0"),
        _bl(df["g"]).alias("gb"), _ground_hash(df["g"]).alias("gh0"),
    ).transform(pin)
    hashes = (enc.select(F.explode(F.array("sb", "ob", "gb")).alias("b"))
              .where(F.col("b").isNotNull())
              .distinct()
              .select("b", F.lit(0).cast("long").alias("h"))
              .transform(pin))
    n_classes = 1 if hashes.take(1) else 0
    if n_classes == 0:
        return hashes
    for _ in range(MAX_ROUNDS):
        hs = hashes.select(F.col("b").alias("__sb"), F.col("h").alias("__sh"))
        ho = hashes.select(F.col("b").alias("__ob"), F.col("h").alias("__oh"))
        hg = hashes.select(F.col("b").alias("__gb"), F.col("h").alias("__gh"))
        j = (enc.join(hs, enc["sb"] == hs["__sb"], "left")
                .join(ho, enc["ob"] == ho["__ob"], "left")
                .join(hg, enc["gb"] == hg["__gb"], "left"))
        sH = F.coalesce(j["__sh"], j["sh0"])
        oH = F.coalesce(j["__oh"], j["oh0"])
        gH = F.coalesce(j["__gh"], j["gh0"])
        contrib = F.array(
            F.struct(j["sb"].alias("b"),
                     F.xxhash64(F.lit(0), j["ph"], oH, gH).alias("c")),
            F.struct(j["ob"].alias("b"),
                     F.xxhash64(F.lit(1), j["ph"], sH, gH).alias("c")),
            F.struct(j["gb"].alias("b"),
                     F.xxhash64(F.lit(2), sH, j["ph"], oH).alias("c")))
        sums = (j.select(F.explode(contrib).alias("x"))
                 .where(F.col("x.b").isNotNull())
                 .groupBy(F.col("x.b").alias("b"))
                 .agg(F.sum("x.c").alias("cs")))
        prev = hashes.select(F.col("b").alias("__pb"), F.col("h").alias("__ph"))
        hashes = (sums.join(prev, sums["b"] == prev["__pb"])
                  .select("b", F.xxhash64(F.col("__ph"), F.col("cs"),
                                          F.lit(_SEED)).alias("h"))
                  .transform(pin))
        n2 = hashes.select("h").distinct().count()
        if n2 == n_classes:
            return hashes
        n_classes = n2
    return hashes


def canonical_quads(df: DataFrame) -> DataFrame:
    """Quads with every blank node relabeled to ``c<refined-hash>`` —
    label-independent, so isomorphic inputs produce identical outputs."""
    hashes = canonical_bnode_hashes(df)
    lbl = hashes.select(
        F.col("b"),
        F.concat(F.lit("c"), F.hex(F.col("h"))).alias("lbl"))
    out = df
    for col in ("s", "o", "g"):
        m = lbl.select(F.col("b").alias(f"__{col}b"),
                       F.col("lbl").alias(f"__{col}l"))
        out = out.join(m, _bl(out[col]) == m[f"__{col}b"], "left")
        out = out.withColumn(
            col,
            F.when(F.col(f"__{col}l").isNotNull(),
                   out[col].withField("lex", F.col(f"__{col}l")))
             .otherwise(out[col])) \
            .drop(f"__{col}b", f"__{col}l")
    return out.select("s", "p", "o", "g")


def isomorphic(a: DataFrame, b: DataFrame) -> bool:
    """Dataset isomorphism check (bnode-label-independent multiset
    equality of quads).  See module docstring for the refinement-only
    completeness caveat."""
    ka = _quad_counts(canonical_quads(a))
    kb = _quad_counts(canonical_quads(b))
    diff = (ka.join(kb, ["qk"], "full_outer")
              .where(F.coalesce(ka["n"], F.lit(0))
                     != F.coalesce(kb["n"], F.lit(0))))
    return len(diff.take(1)) == 0


def _quad_counts(df: DataFrame) -> DataFrame:
    qk = F.xxhash64(*[x for col in ("s", "p", "o", "g")
                      for x in (df[col]["kind"],
                                F.coalesce(df[col]["lex"], F.lit("\x00L")),
                                F.coalesce(df[col]["datatype"], F.lit("\x00D")),
                                F.coalesce(df[col]["lang"], F.lit("\x00G")))])
    return df.select(qk.alias("qk")).groupBy("qk") \
             .agg(F.count(F.lit(1)).alias("n"))
