"""Dictionary-encoded term storage (SURVEY.md §1.4 / M7+ optimization).

The reference interns every term to a fixed-size ``EncodedTerm`` with an
``id2str`` dictionary (``storage/numeric_encoder.rs``).  The Spark analog:
a ``terms(id BIGINT, term TERM)`` dictionary plus ``quads_ids(s_id, p_id,
o_id, g_id)`` — joins/distinct/closures then shuffle 8-byte longs instead
of 4-field structs.  ids are content hashes (xxhash64 of the term key), so
encoding needs NO global coordination (no monotonically-increasing ids, no
driver round-trip) — the property that matters at 100 TB ingest.

This module is self-contained (encode/decode/verify); wiring the compiler
to join on ids end-to-end is the planned M7+ step — the measured win only
appears when shuffle volume dominates, i.e. beyond local test scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..model import terms as T


def term_id(t: Column) -> Column:
    """Deterministic 64-bit id = hash of the term identity 4-tuple.
    Collision probability over N distinct terms ≈ N²/2⁶⁵ (≈ 3e-7 at one
    billion terms) — acceptable for analytics; a 128-bit variant (two
    xxhash64 seeds) is the belt-and-braces option."""
    # per-field null sentinels: Spark hash functions skip null inputs,
    # which would conflate (lex, null, lang) with (lex, lang, null) —
    # same scheme as model.terms.join_key
    return F.xxhash64(t["kind"],
                      F.coalesce(t["lex"], F.lit("\x00L")),
                      F.coalesce(t["datatype"], F.lit("\x00D")),
                      F.coalesce(t["lang"], F.lit("\x00G")))


def encode(quads: DataFrame) -> tuple[DataFrame, DataFrame]:
    """quads(s,p,o,g) → (terms(id, term), quads_ids(s_id,p_id,o_id,g_id)).

    One pass for ids (map-side hashing, no shuffle); the dictionary is a
    distinct over the exploded terms (one shuffle on the 8-byte id)."""
    ids = quads.select(
        term_id(quads["s"]).alias("s_id"), term_id(quads["p"]).alias("p_id"),
        term_id(quads["o"]).alias("o_id"), term_id(quads["g"]).alias("g_id"))
    terms = None
    for c in ("s", "p", "o", "g"):
        part = quads.select(term_id(quads[c]).alias("id"),
                            quads[c].alias("term"))
        terms = part if terms is None else terms.unionByName(part)
    terms = terms.dropDuplicates(["id"])
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
