"""Dictionary-encoded term storage (SURVEY.md §1.4 / M7+ optimization).

The reference interns every term to a fixed-size ``EncodedTerm`` whose
string payloads are 128-bit content hashes with an ``id2str`` side table
(``storage/numeric_encoder.rs`` · ``StrHash``).  The Spark analog: a
``terms(id, term)`` dictionary plus ``quads_ids(s_id, p_id, o_id, g_id)``
— joins/distinct/closures then shuffle 16-byte keys instead of full term
structs.  Ids are content hashes (two independently-seeded xxhash64
halves over the term-identity 4-tuple, :func:`model.terms.join_key`), so
encoding needs NO global coordination (no monotonically-increasing ids,
no driver round-trip) — the property that matters at 100 TB ingest.

Why 128-bit and not 64: at N distinct terms the collision odds are
≈ N²/2¹²⁹.  A 100 TB corpus can hold ~10¹² distinct terms, where 64-bit
ids expect hundreds of colliding pairs (N²/2⁶⁵ ≈ 3·10²) — silent wrong
joins — while 128-bit stays at ~10⁻¹⁵.  Same sizing call as upstream's
``StrHash``.

The compiler consumes this encoding two ways:
- ``plans/compiler.py`` materializes the same key once per variable at
  every pattern scan (``Compiled.ids`` sidecar columns) and joins on it;
- :class:`quad_store.ParquetQuadStore` persists the four key columns at
  ingest so scans serve them straight from parquet (zero query-time
  hashing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..model import terms as T


def term_id(t: Column) -> Column:
    """Deterministic 128-bit id (struct<h1,h2>) = content hash of the term
    identity 4-tuple — exactly :func:`model.terms.join_key`, re-exported
    here as the dictionary's id function so store/compiler/dictionary all
    share one key layout."""
    return T.join_key(t)


def encode(quads: DataFrame) -> tuple[DataFrame, DataFrame]:
    """quads(s,p,o,g) → (terms(id, term), quads_ids(s_id,p_id,o_id,g_id)).

    One pass for ids (map-side hashing, no shuffle); the dictionary is a
    distinct over the exploded terms (one shuffle on the 16-byte id)."""
    ids = quads.select(
        term_id(quads["s"]).alias("s_id"), term_id(quads["p"]).alias("p_id"),
        term_id(quads["o"]).alias("o_id"), term_id(quads["g"]).alias("g_id"))
    terms = None
    for c in ("s", "p", "o", "g"):
        part = quads.select(term_id(quads[c]).alias("id"),
                            quads[c].alias("term"))
        terms = part if terms is None else terms.unionByName(part)
    # dedup over (id, term), not id alone: the term struct is determined
    # by its content-hash id, and folding it into the grouping keys keeps
    # the aggregation buffer empty — HashAggregate instead of the
    # first(struct) Sort+SortAggregate path (r9, guide §5)
    terms = terms.dropDuplicates()
    return terms, ids


def decode(ids: DataFrame, terms: DataFrame, cols=None) -> DataFrame:
    """quads_ids → quads via dictionary joins (broadcast when the
    dictionary is small; at scale the terms table is bucketed by id so
    these are co-located joins)."""
    out = ids
    for c in (cols or ["s", "p", "o", "g"]):
        d = terms.select(F.col("id").alias(f"__{c}_id"),
                         F.col("term").alias(c))
        out = out.join(F.broadcast(d),
                       out[f"{c}_id"] == d[f"__{c}_id"], "left") \
                 .drop(f"__{c}_id")
    return out.select(*(cols or ["s", "p", "o", "g"]))
