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

# token grammar fragments (shared by the line regex and the RDF-star
# component extractors)
_T_IRI = r"<[^>]*>"
_T_BN = r"_:\S+"
_T_LIT = r"\"(?:[^\"\\]|\\.)*\"(?:@[A-Za-z0-9-]+|\^\^<[^>]*>)?"

# RDF-star quoted triple token.  Regex cannot count, so nesting is
# unrolled to a BOUNDED depth (subject and object positions may each hold
# a quoted triple of the next-lower depth, per the RDF-star grammar).
# Deeper documents drop those lines in the lenient reader; the TRIPLE()
# constructor and SUBJECT/PREDICATE/OBJECT accessors are exact at ANY
# depth (the accessors use a char-scan, not this regex).
QT_DEPTH = 4


def _qt_pattern(depth: int) -> str:
    s_alt = [_T_IRI, _T_BN]
    o_alt = [_T_IRI, _T_BN, _T_LIT]
    if depth > 0:
        inner = _qt_pattern(depth - 1)
        s_alt.append(inner)
        o_alt.append(inner)
    return (rf"<<\s*(?:{'|'.join(s_alt)})\s+{_T_IRI}\s+"
            rf"(?:{'|'.join(o_alt)})\s*>>")


_T_QT = _qt_pattern(QT_DEPTH)

# subject: IRI/bnode/quoted triple; predicate: IRI; object adds literals;
# optional graph label (N-Quads); trailing dot.  NB: the quoted-triple
# alternative must precede the IRI one (an IRI regex would eat "<<x>").
_LINE = (rf"^\s*({_T_QT}|{_T_IRI}|{_T_BN})\s+({_T_IRI})\s+"
         rf"({_T_QT}|{_T_IRI}|{_T_BN}|{_T_LIT})"
         rf"(?:\s+({_T_IRI}|{_T_BN}))?\s*\.\s*$")


# Sentinels for the multi-pass JVM-side decoder.  U+0001/U+0002 are legal
# (if wildly unusual) literal characters in N-Triples; a raw occurrence
# immediately followed by hex digits could be mis-decoded — documented
# trade-off for a UDF-free distributed parser.
_SENT_BS = "\x00"   # protected literal backslash
_MARK_U16 = "\x01"  # marker + 4 (or 8, surrogate pair) hex UTF-16 digits
_MARK_U32 = "\x02"  # marker + 8 hex codepoint digits (\UXXXXXXXX)
_HI = "[Dd][89ABab][0-9A-Fa-f]{2}"   # high-surrogate hex
_LO = "[Dd][C-Fc-f][0-9A-Fa-f]{2}"   # low-surrogate hex


def _rejoin(c: Column, marker: str, decode_seg) -> Column:
    """Split on ``marker``; pass every segment after the first through
    ``decode_seg`` (which decodes its hex prefix and re-appends the tail);
    concat back.  All built-ins — stays in codegen."""
    arr = F.split(c, marker)
    head = F.element_at(arr, 1)
    rest = F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0)))
    return F.concat(head, F.concat_ws("", F.transform(rest, decode_seg)))


def _decode_u16(seg: Column) -> Column:
    # 4 hex digits normally; 8 when the marker captured a surrogate pair
    # (UTF-16BE decodes the pair to one supplementary char)
    is_pair = F.regexp_like(F.substring(seg, 1, 8),
                            F.lit(f"^{_HI}{_LO}"))
    n = F.when(is_pair, F.lit(8)).otherwise(F.lit(4))
    ch = F.decode(F.unhex(F.substring(seg, F.lit(1), n)), "UTF-16BE")
    return F.concat(ch, F.substring(seg, n + 1, F.lit(0x7FFFFFF)))


def _decode_u32(seg: Column) -> Column:
    # \UXXXXXXXX codepoint → UTF-16 unit(s): BMP directly, else the
    # surrogate-pair arithmetic, then UTF-16BE byte decode
    cp = F.conv(F.substring(seg, 1, 8), 16, 10).cast("long")
    bmp = F.lpad(F.hex(cp), 4, "0")
    v = cp - F.lit(0x10000)
    hi = F.lit(0xD800) + F.floor(v / F.lit(1024))
    lo = F.lit(0xDC00) + (v % F.lit(1024))
    pair = F.concat(F.lpad(F.hex(hi), 4, "0"), F.lpad(F.hex(lo), 4, "0"))
    ch = F.decode(F.unhex(F.when(cp < 0x10000, bmp).otherwise(pair)),
                  "UTF-16BE")
    return F.concat(ch, F.substring(seg, 9, 0x7FFFFFF))


def _unescape(c: Column) -> Column:
    """Decode N-Triples string escapes (``lib/oxttl/src/lexer.rs`` analog).

    Order matters: ``\\\\`` is protected FIRST so a literal backslash
    followed by ``t``/``n``/``u…`` is never mis-decoded (the round-1 bug),
    then single-char escapes, then ``\\uXXXX`` (surrogate pairs coalesced)
    and ``\\UXXXXXXXX`` via hex→UTF-16BE byte decode."""
    c = F.regexp_replace(c, r"\\\\", _SENT_BS)
    for esc, rep in ((r"\\t", "\t"), (r"\\n", "\n"), (r"\\r", "\r"),
                     (r"\\b", "\b"), (r"\\f", "\f"), (r"\\'", "'"),
                     (r"\\\"", '"')):
        c = F.regexp_replace(c, esc, rep)
    # surrogate pair written as two \u escapes → one 8-hex UTF-16 unit
    c = F.regexp_replace(c, rf"\\u({_HI})\\u({_LO})", f"{_MARK_U16}$1$2")
    c = F.regexp_replace(c, r"\\u([0-9A-Fa-f]{4})", f"{_MARK_U16}$1")
    c = F.regexp_replace(c, r"\\U([0-9A-Fa-f]{8})", f"{_MARK_U32}$1")
    c = _rejoin(c, _MARK_U16, _decode_u16)
    c = _rejoin(c, _MARK_U32, _decode_u32)
    return F.regexp_replace(c, _SENT_BS, r"\\")


def _parse_term(raw: Column, canonicalize_qt: bool = False) -> Column:
    """Raw N-Triples token → TERM struct.

    A quoted-triple token (``<<…>>``) becomes a ``KIND_TRIPLE`` term whose
    ``lex`` is the space-separated component serialization.
    ``canonicalize_qt=True`` (the reader path) normalizes component
    SPACING so the lex matches what the TRIPLE() constructor produces and
    quoted-triple identity works through ordinary term keys.  Escape-form
    canonicalization inside nested literal tokens is deliberately NOT done
    here (a full component re-parse+re-serialize multiplies the unescape
    expression tree ~4x and bloats codegen); identity across differently-
    escaped but equal nested literals holds for data written by this
    engine's writer or any canonical serializer."""
    is_qt = raw.startswith("<<")
    is_iri = raw.startswith("<") & ~is_qt
    is_bnode = raw.startswith("_:")
    lex_iri = raw.substr(F.lit(2), F.length(raw) - 2)
    # literal parts
    quoted = F.regexp_extract(raw, r'^"((?:[^"\\]|\\.)*)"', 1)
    lang = F.nullif(F.regexp_extract(raw, r'"@([A-Za-z0-9-]+)$', 1), F.lit(""))
    dtype = F.nullif(F.regexp_extract(raw, r'\^\^<([^>]*)>$', 1), F.lit(""))
    dt = F.coalesce(
        dtype,
        F.when(lang.isNotNull(), F.lit(T.RDF_LANGSTRING))
         .otherwise(F.lit(T.XSD_STRING)))
    # let-bind the unescaped lexical form: make_typed inspects its input
    # ~30 times and the unescape chain is a ~6 KB tree — inlining it at
    # every reference made ONE parse_token a 222 KB expression (and an
    # RDF-star accessor query a 4.5 MB / 23 MiB-task-binary plan)
    lit = T.let1(_unescape(quoted), lambda lex: F.when(
        lang.isNotNull(),
        T.term_struct(T.KIND_LITERAL, lex,
                      datatype=F.lit(T.RDF_LANGSTRING), lang=lang))
        .otherwise(T.make_typed(lex, dt)))
    if canonicalize_qt:
        qt_lex = _norm_qt_body(raw, QT_DEPTH)
    else:
        qt_lex = F.trim(raw.substr(F.lit(3), F.length(raw) - 4))
    return (F.when(is_qt, T.term_struct(T.KIND_TRIPLE, qt_lex))
             .when(is_iri, T.iri(lex_iri))
             .when(is_bnode, T.bnode(raw.substr(F.lit(3), F.length(raw))))
             .otherwise(lit))


def _norm_qt_body(tok: Column, depth: int) -> Column:
    """Quoted-triple TOKEN (``<<…>>``) → canonical space-separated
    component body (the term's ``lex``), recursively normalizing the
    spacing of NESTED quoted-triple tokens in subject/object position so
    identity matches what the TRIPLE() constructor and the writer
    produce.  Bounded by ``depth`` — matching the reader's token regex;
    a level-k component can only hold a depth-(k-1) token, so the
    embedded patterns SHRINK with recursion (expression stays small)."""
    inner = F.trim(tok.substr(F.lit(3), F.length(tok) - 4))
    comp = _qt_pattern(depth - 1) if depth > 0 else None
    s_pat = rf"{comp}|{_T_IRI}|{_T_BN}" if comp else rf"{_T_IRI}|{_T_BN}"
    qs = F.regexp_extract(inner, rf"^({s_pat})", 1)
    qp = F.regexp_extract(inner, rf"^(?:{s_pat})\s+({_T_IRI})", 1)
    qo = F.regexp_extract(
        inner, rf"^(?:{s_pat})\s+{_T_IRI}\s+(.*?)\s*$", 1)
    if depth > 0:
        def norm(c: Column) -> Column:
            return F.when(
                c.startswith("<<"),
                F.concat(F.lit("<<"), _norm_qt_body(c, depth - 1),
                         F.lit(">>"))).otherwise(c)
        qs, qo = norm(qs), norm(qo)
    return F.concat_ws(" ", qs, qp, qo)


def parse_token(raw: Column) -> Column:
    """Public N-Triples token parser (used by the RDF-star accessors)."""
    return _parse_term(raw)


def read_ntriples(spark: SparkSession, path: str,
                  quads: bool = False, lenient: bool = False) -> DataFrame:
    """Parse N-Triples (or N-Quads with ``quads=True``) into a quads
    DataFrame (s, p, o, g).

    STRICT by default (round-7): a line that is neither a statement,
    a ``#`` comment, nor blank raises with samples — at 100 TB a
    silently-dropped malformed shard is unrecoverable data loss, so
    the default matches the reference's checked parser.  The check is
    one extra distributed pass over the raw lines (no shuffle; the
    text is OS-cached for the parse that follows).  ``lenient=True``
    restores the drop-malformed behavior (the reference's
    ``unchecked()`` path) for dirty corpora and is the streaming
    ingest default (a stream can't usefully abort mid-batch)."""
    lines = spark.read.text(path)
    if not lenient:
        v = F.trim(F.col("value"))
        bad = lines.where((v != "") & ~v.startswith("#")
                          & (F.regexp_extract("value", _LINE, 1) == ""))
        sample = [r["value"] for r in bad.take(3)]
        if sample:
            raise ValueError(
                f"malformed N-{'Quads' if quads else 'Triples'} line(s) "
                f"in {path}, e.g. {sample[0][:120]!r} "
                "(pass lenient=True to drop malformed lines)")
    return parse_nt_lines(lines, quads=quads)


def parse_nt_lines(lines: DataFrame, quads: bool = False) -> DataFrame:
    """:func:`read_ntriples` body over an existing frame of raw lines
    (column ``value``) — shared by the file reader and the streaming
    ingest path (continuous queries parse each micro-batch with the
    same pure-column expressions)."""
    parts = lines.select(
        F.regexp_extract("value", _LINE, 1).alias("rs"),
        F.regexp_extract("value", _LINE, 2).alias("rp"),
        F.regexp_extract("value", _LINE, 3).alias("ro"),
        F.regexp_extract("value", _LINE, 4).alias("rg"),
    ).where(F.col("rs") != "")
    g = F.when(F.col("rg") == "", T.default_graph()) \
         .otherwise(_parse_term(F.col("rg")))
    return parts.select(
        _parse_term(F.col("rs"), canonicalize_qt=True).alias("s"),
        _parse_term(F.col("rp")).alias("p"),
        _parse_term(F.col("ro"), canonicalize_qt=True).alias("o"),
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
        .when(t["kind"] == T.KIND_TRIPLE,
              F.concat(F.lit("<<"), t["lex"], F.lit(">>")))
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
