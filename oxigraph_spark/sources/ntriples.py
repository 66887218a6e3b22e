"""N-Triples / N-Quads reader+writer (SURVEY.md §2.1 S2).

Reference: ``lib/oxttl/src/ntriples.rs`` / ``nquads.rs`` (line-based
streaming parsers over a shared lexer).  Spark-first: the formats are
line-delimited, so parsing is one distributed ``spark.read.text`` plus
JVM-side regex extraction — every line parses independently, which is why
these formats scale to 100 TB while Turtle (stateful prefixes) does not
(S3 is deliberately out of the distributed path).

No Python UDFs: term classification and unescaping are built-in column
expressions.  ``\\uXXXX`` escapes beyond the common control set are left
as-is (documented limitation; the reference decodes them in its lexer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..model import terms as T

# subject: IRI or bnode; predicate: IRI; object: IRI/bnode/literal;
# optional graph label (N-Quads); trailing dot.
_LINE = (r"^\s*(<[^>]*>|_:\S+)\s+(<[^>]*>)\s+"
         r"(<[^>]*>|_:\S+|\"(?:[^\"\\]|\\.)*\"(?:@[A-Za-z0-9-]+|\^\^<[^>]*>)?)"
         r"(?:\s+(<[^>]*>|_:\S+))?\s*\.\s*$")


def _unescape(c: Column) -> Column:
    for esc, rep in ((r"\\t", "\t"), (r"\\n", "\n"), (r"\\r", "\r"),
                     (r"\\\"", '"')):
        c = F.regexp_replace(c, esc, rep)
    return F.regexp_replace(c, r"\\\\", r"\\")


def _parse_term(raw: Column) -> Column:
    """Raw N-Triples token → TERM struct."""
    is_iri = raw.startswith("<")
    is_bnode = raw.startswith("_:")
    lex_iri = F.expr("substring({0}, 2, length({0}) - 2)".format("raw")) \
        if False else raw.substr(F.lit(2), F.length(raw) - 2)
    # literal parts
    quoted = F.regexp_extract(raw, r'^"((?:[^"\\]|\\.)*)"', 1)
    lang = F.nullif(F.regexp_extract(raw, r'"@([A-Za-z0-9-]+)$', 1), F.lit(""))
    dtype = F.nullif(F.regexp_extract(raw, r'\^\^<([^>]*)>$', 1), F.lit(""))
    lex = _unescape(quoted)
    dt = F.coalesce(
        dtype,
        F.when(lang.isNotNull(), F.lit(T.RDF_LANGSTRING))
         .otherwise(F.lit(T.XSD_STRING)))
    lit = T.make_typed(lex, dt)
    # make_typed loses lang; rebuild for language-tagged strings
    lit = F.when(lang.isNotNull(),
                 T.term_struct(T.KIND_LITERAL, lex,
                               datatype=F.lit(T.RDF_LANGSTRING), lang=lang)) \
           .otherwise(lit)
    return (F.when(is_iri, T.iri(lex_iri))
             .when(is_bnode, T.bnode(raw.substr(F.lit(3), F.length(raw))))
             .otherwise(lit))


def read_ntriples(spark: SparkSession, path: str,
                  quads: bool = False) -> DataFrame:
    """Parse N-Triples (or N-Quads with ``quads=True``) into a quads
    DataFrame (s, p, o, g).  Malformed/comment/blank lines are dropped
    (the reference's ``unchecked()`` lenient path; strict mode would
    count non-matching non-empty lines)."""
    lines = spark.read.text(path)
    parts = lines.select(
        F.regexp_extract("value", _LINE, 1).alias("rs"),
        F.regexp_extract("value", _LINE, 2).alias("rp"),
        F.regexp_extract("value", _LINE, 3).alias("ro"),
        F.regexp_extract("value", _LINE, 4).alias("rg"),
    ).where(F.col("rs") != "")
    g = F.when(F.col("rg") == "", T.default_graph()) \
         .otherwise(_parse_term(F.col("rg")))
    return parts.select(
        _parse_term(F.col("rs")).alias("s"),
        _parse_term(F.col("rp")).alias("p"),
        _parse_term(F.col("ro")).alias("o"),
        (g if quads else T.default_graph()).alias("g"))


def _escape(c: Column) -> Column:
    c = F.regexp_replace(c, r"\\", r"\\\\")
    c = F.regexp_replace(c, "\"", "\\\\\"")
    c = F.regexp_replace(c, "\n", r"\\n")
    c = F.regexp_replace(c, "\r", r"\\r")
    c = F.regexp_replace(c, "\t", r"\\t")
    return c


def format_term(t: Column) -> Column:
    """TERM struct → N-Triples token (serializer; oxttl writer analog)."""
    lit_suffix = (
        F.when(t["lang"].isNotNull(), F.concat(F.lit("@"), t["lang"]))
        .when(t["datatype"].isNotNull()
              & (t["datatype"] != T.XSD_STRING),
              F.concat(F.lit("^^<"), t["datatype"], F.lit(">")))
        .otherwise(F.lit("")))
    return (
        F.when(t["kind"] == T.KIND_IRI, F.concat(F.lit("<"), t["lex"], F.lit(">")))
        .when(t["kind"] == T.KIND_BNODE, F.concat(F.lit("_:"), t["lex"]))
        .when(t["kind"] == T.KIND_LITERAL,
              F.concat(F.lit("\""), _escape(t["lex"]), F.lit("\""), lit_suffix))
        .otherwise(F.lit(None)))


def write_ntriples(df: DataFrame, path: str, quads: bool = False) -> None:
    """Serialize quads (s,p,o[,g]) to N-Triples/N-Quads text files."""
    parts = [format_term(df["s"]), F.lit(" "), format_term(df["p"]),
             F.lit(" "), format_term(df["o"])]
    if quads:
        gtok = F.when(df["g"]["kind"] == T.KIND_DEFAULT_GRAPH, F.lit("")) \
                .otherwise(F.concat(F.lit(" "), format_term(df["g"])))
        parts.append(gtok)
    parts.append(F.lit(" ."))
    df.select(F.concat(*parts).alias("value")).write.mode("overwrite").text(path)
