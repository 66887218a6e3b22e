"""RDF term model as a fixed-width Spark struct column.

The reference (oxigraph) models terms as a Rust enum
(``lib/oxrdf/src/named_node.rs`` · ``NamedNode``, ``blank_node.rs`` ·
``BlankNode``, ``literal.rs`` · ``Literal``, ``triple.rs`` · ``Term``) and
encodes them for storage with per-type discriminant tags plus pre-parsed
numeric/temporal payloads (``lib/oxigraph/src/storage/numeric_encoder.rs`` ·
``EncodedTerm``).  We reproduce that idea Spark-first: one fixed STRUCT
carries the discriminant (``kind``), the lexical identity
(``lex``/``datatype``/``lang``) and pre-parsed value payloads
(``num``/``dbl``/``ts``/``tz_min``/``bool``) so expression evaluation never
re-parses lexical forms and stays entirely inside whole-stage codegen.

Term identity (used by SPARQL joins / sameTerm) is the 4-tuple
``(kind, lex, datatype, lang)``; the payload fields are derived and MUST be
consistent with the lexical fields.  Equi-joins therefore join on
:func:`term_key`, never the full struct.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column, functions as F
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DecimalType,
    DoubleType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# kinds (discriminant values — mirrors the reference's term enum arms)
# ---------------------------------------------------------------------------
KIND_IRI = 0
KIND_BNODE = 1
KIND_LITERAL = 2
KIND_TRIPLE = 3  # RDF-star quoted triple (surrogate id in `lex`)
KIND_DEFAULT_GRAPH = 4

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

XSD_STRING = XSD + "string"
XSD_INTEGER = XSD + "integer"
XSD_DECIMAL = XSD + "decimal"
XSD_FLOAT = XSD + "float"
XSD_DOUBLE = XSD + "double"
XSD_BOOLEAN = XSD + "boolean"
XSD_DATETIME = XSD + "dateTime"
XSD_DATE = XSD + "date"
XSD_TIME = XSD + "time"
XSD_GYEAR = XSD + "gYear"
XSD_GYEARMONTH = XSD + "gYearMonth"
XSD_DURATION = XSD + "duration"
XSD_YM_DURATION = XSD + "yearMonthDuration"
XSD_DT_DURATION = XSD + "dayTimeDuration"
DURATION_DATATYPES = (XSD_DURATION, XSD_YM_DURATION, XSD_DT_DURATION)
RDF_LANGSTRING = RDF + "langString"

NUMERIC_DATATYPES = (XSD_INTEGER, XSD_DECIMAL, XSD_FLOAT, XSD_DOUBLE,
                     XSD + "long", XSD + "int", XSD + "short", XSD + "byte",
                     XSD + "nonNegativeInteger", XSD + "positiveInteger",
                     XSD + "negativeInteger", XSD + "nonPositiveInteger",
                     XSD + "unsignedLong", XSD + "unsignedInt",
                     XSD + "unsignedShort", XSD + "unsignedByte")
# integer-valued subset (everything numeric except decimal/float/double)
INTEGER_DATATYPES = tuple(d for d in NUMERIC_DATATYPES
                          if d not in (XSD_DECIMAL, XSD_FLOAT, XSD_DOUBLE))

DECIMAL_T = DecimalType(38, 18)

TERM_SCHEMA = StructType([
    StructField("kind", ByteType()),
    StructField("lex", StringType()),
    StructField("datatype", StringType()),
    StructField("lang", StringType()),
    StructField("num", DECIMAL_T),
    StructField("dbl", DoubleType()),
    StructField("ts", TimestampType()),
    StructField("tz_min", ShortType()),
    StructField("bool", BooleanType()),
])

TERM_FIELDS = [f.name for f in TERM_SCHEMA.fields]

ColumnOrName = Union[Column, str]


def _col(c: ColumnOrName) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def let1(val: Column, body) -> Column:
    """``let x = val in body(x)`` for Column expressions.

    Binds ``val`` once by wrapping it in a one-element array and applying
    ``body`` through a higher-order-function lambda: inside ``body`` the
    argument is a leaf ``NamedLambdaVariable``, so a body that references
    its argument N times yields a tree containing ``val`` ONCE instead of
    N times.  This collapses the multiplicative expression blowup when a
    large subtree (e.g. the unescape chain) feeds a kernel that inspects
    its input many times (e.g. XSD canonicalization) — the difference
    between a 5 KB and a 5 MB Catalyst plan.

    Trade-off: higher-order functions are ``CodegenFallback`` — the
    subtree evaluates interpreted.  For parse-heavy kernels the regex
    cost dominates either way, and janino compiling a multi-MB method
    (or bailing out to interpreted mode anyway) is strictly worse."""
    return F.element_at(F.transform(F.array(val), body), 1)


def _lit(v) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


# Column-object memo for the constant pieces every term_struct carries
# (typed-NULL fields, constant kind bytes, common datatype IRIs).
# Columns are immutable JVM-expression wrappers, safe to share across
# DataFrames; the cache clears if the SparkContext restarts.  Cuts
# term_struct from ~30 py4j round-trips to ~8 for the common
# constructors — a top-3 item in compile profiles.
_COL_CACHE: dict = {}
_COL_CTX: Optional[int] = None


def _cached(key, build) -> Column:
    from pyspark import SparkContext
    global _COL_CTX
    ctx = id(SparkContext._active_spark_context)
    if ctx != _COL_CTX:
        _COL_CACHE.clear()
        _COL_CTX = ctx
    col = _COL_CACHE.get(key)
    if col is None:
        col = _COL_CACHE[key] = build()
    return col


def term_struct(
    kind: ColumnOrName,
    lex: Column,
    datatype: Optional[Column] = None,
    lang: Optional[Column] = None,
    num: Optional[Column] = None,
    dbl: Optional[Column] = None,
    ts: Optional[Column] = None,
    tz_min: Optional[Column] = None,
    bool_: Optional[Column] = None,
) -> Column:
    """Assemble a TERM struct column with correct field types/names."""
    def nul(name, t):
        return _cached(("null", name),
                       lambda: F.lit(None).cast(t).alias(name))

    if isinstance(kind, int):
        k = _cached(("kind", kind),
                    lambda: F.lit(kind).cast(ByteType()).alias("kind"))
    else:
        k = _lit(kind).cast(ByteType()).alias("kind")
    return F.struct(
        k,
        lex.cast(StringType()).alias("lex"),
        (datatype.cast(StringType()).alias("datatype")
         if datatype is not None else nul("datatype", StringType())),
        (lang.cast(StringType()).alias("lang")
         if lang is not None else nul("lang", StringType())),
        (num.cast(DECIMAL_T).alias("num")
         if num is not None else nul("num", DECIMAL_T)),
        (dbl.cast(DoubleType()).alias("dbl")
         if dbl is not None else nul("dbl", DoubleType())),
        (ts.cast(TimestampType()).alias("ts")
         if ts is not None else nul("ts", TimestampType())),
        (tz_min.cast(ShortType()).alias("tz_min")
         if tz_min is not None else nul("tz_min", ShortType())),
        (bool_.cast(BooleanType()).alias("bool")
         if bool_ is not None else nul("bool", BooleanType())),
    )


# -- constructors -----------------------------------------------------------

def iri(lex: ColumnOrName) -> Column:
    """IRI term from a string column or Python str."""
    return term_struct(KIND_IRI, _lit(lex))


def bnode(label: ColumnOrName) -> Column:
    return term_struct(KIND_BNODE, _lit(label))


def default_graph() -> Column:
    return term_struct(KIND_DEFAULT_GRAPH, F.lit(""))



def _dtlit(iri_str: str) -> Column:
    """Cached F.lit of a constant datatype IRI (see _COL_CACHE)."""
    return _cached(("dtlit", iri_str), lambda: F.lit(iri_str))

def str_lit(lex: ColumnOrName) -> Column:
    return term_struct(KIND_LITERAL, _lit(lex), datatype=_dtlit(XSD_STRING))


def lang_lit(lex: ColumnOrName, lang: ColumnOrName) -> Column:
    return term_struct(KIND_LITERAL, _lit(lex),
                       datatype=_dtlit(RDF_LANGSTRING), lang=_lit(lang))


def int_lit(value: ColumnOrName) -> Column:
    v = _lit(value).cast("long")
    return term_struct(KIND_LITERAL, v.cast("string"),
                       datatype=_dtlit(XSD_INTEGER), num=v.cast(DECIMAL_T))


def decimal_lit(value: ColumnOrName) -> Column:
    v = _lit(value).cast(DECIMAL_T)
    return term_struct(KIND_LITERAL, v.cast("string"),
                       datatype=_dtlit(XSD_DECIMAL), num=v)


def double_lit(value: ColumnOrName) -> Column:
    v = _lit(value).cast("double")
    return term_struct(KIND_LITERAL, double_lex(v),
                       datatype=_dtlit(XSD_DOUBLE), dbl=v)


def double_lex(v: Column) -> Column:
    """Canonical XSD lexical for a double value: the special values are
    INF/-INF/NaN, not Java's Infinity strings."""
    return (F.when(F.isnan(v), F.lit("NaN"))
             .when(v == float("inf"), F.lit("INF"))
             .when(v == float("-inf"), F.lit("-INF"))
             .otherwise(v.cast("string")))


def bool_lit(value: ColumnOrName) -> Column:
    v = _lit(value).cast("boolean")
    return term_struct(KIND_LITERAL, v.cast("string"),
                       datatype=_dtlit(XSD_BOOLEAN), bool_=v)


def datetime_lit(value: ColumnOrName, tz_min: Optional[ColumnOrName] = None) -> Column:
    """xsd:dateTime literal from a timestamp column.

    ``tz_min`` is the original utc-offset in minutes (NULL = timezone-less),
    mirroring the reference's per-value optional timezone
    (``lib/oxsdatatypes/src/date_time.rs`` · ``TimezoneOffset``).
    """
    v = _lit(value).cast(TimestampType())
    # cast-to-string + one replace is ~4x cheaper per row than building
    # the lexical form from date_format calls, and keeps full microsecond
    # fidelity between lex and the ts payload
    lex = F.replace(v.cast(StringType()), F.lit(" "), F.lit("T"))
    return term_struct(KIND_LITERAL, lex, datatype=_dtlit(XSD_DATETIME),
                       ts=v, tz_min=None if tz_min is None else _lit(tz_min))


def typed_lit(lex: ColumnOrName, datatype: str) -> Column:
    """Literal with an arbitrary datatype IRI; payload fields derived when
    the datatype is one we understand (mirrors oxigraph's lazy decode)."""
    lexc = _lit(lex)
    if datatype in INTEGER_DATATYPES or datatype == XSD_DECIMAL:
        return term_struct(KIND_LITERAL, lexc, datatype=F.lit(datatype),
                           num=lexc.cast(DECIMAL_T))
    if datatype in (XSD_FLOAT, XSD_DOUBLE):
        return term_struct(KIND_LITERAL, lexc, datatype=F.lit(datatype),
                           dbl=_xsd_double(lexc))
    if datatype == XSD_BOOLEAN:
        b = F.when(lexc.isin("true", "1"), F.lit(True)).when(
            lexc.isin("false", "0"), F.lit(False))
        return term_struct(KIND_LITERAL, lexc, datatype=F.lit(datatype), bool_=b)
    if datatype in (XSD_DATETIME, XSD_DATE):
        return term_struct(KIND_LITERAL, lexc, datatype=F.lit(datatype),
                           ts=_parse_ts(lexc), tz_min=_parse_tz_min(lexc))
    if datatype == XSD_TIME:
        # time-of-day anchored on the epoch day so ordering/equality use
        # the same ts payload as dateTime (XPath orders times on an
        # arbitrary common date; offsets normalize to UTC)
        return term_struct(KIND_LITERAL, lexc, datatype=F.lit(datatype),
                           ts=_parse_ts(F.concat(F.lit("1970-01-01T"), lexc)),
                           tz_min=_parse_tz_min(lexc))
    if datatype in (XSD_GYEAR, XSD_GYEARMONTH):
        return term_struct(KIND_LITERAL, lexc, datatype=F.lit(datatype),
                           ts=_parse_ts(_gy_anchor(lexc, datatype)),
                           tz_min=_parse_tz_min(lexc))
    if datatype in DURATION_DATATYPES:
        return term_struct(KIND_LITERAL, lexc, datatype=F.lit(datatype),
                           num=_dur_months(lexc).cast(DECIMAL_T),
                           dbl=_dur_seconds(lexc))
    return term_struct(KIND_LITERAL, lexc, datatype=F.lit(datatype))


def _parse_tz_min(lex: Column) -> Column:
    """Per-value optional timezone (reference: oxsdatatypes
    ``TimezoneOffset``): minutes east of UTC, NULL when tz-less."""
    z = F.regexp_extract(lex, r"(Z|[+-]\d{2}:\d{2})$", 1)
    sign = F.when(z.startswith("-"), F.lit(-1)).otherwise(F.lit(1))
    hh = F.substring(z, 2, 2).cast("int")
    mm = F.substring(z, 5, 2).cast("int")
    return (F.when(z == "Z", F.lit(0))
             .when(z != "", sign * (hh * 60 + mm))
             .otherwise(F.lit(None))).cast("smallint")


def _parse_ts(lex: Column) -> Column:
    """dateTime lexical form → UTC-normalized instant (offset applied;
    tz-less forms read as UTC — session tz is pinned to UTC)."""
    return F.to_timestamp(lex)


def _gy_anchor(lex: Column, datatype: str) -> Column:
    """gYear/gYearMonth lexical form → period-start dateTime form
    ("1999" → "1999-01-01", "1999-05" → "1999-05-01"); a trailing
    timezone (rare but legal) is carried over behind the anchor."""
    tz = F.regexp_extract(lex, r"(Z|[+-]\d\d:\d\d)$", 1)
    body = F.regexp_replace(lex, r"(Z|[+-]\d\d:\d\d)$", "")
    suffix = "-01-01" if datatype == XSD_GYEAR else "-01"
    return F.concat(body, F.lit(suffix), tz)


# xsd:duration lexical form (anchored; groups: Y Mo D H Mi S).  The
# reference stores durations as (months, seconds-decimal) pairs
# (``lib/oxsdatatypes/src/duration.rs`` · ``Duration``); we mirror that
# with ``num`` = total months and ``dbl`` = total seconds.
_DUR_RE = (r"^-?P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)D)?"
           r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?$")


def _dur_group(lex: Column, i: int) -> Column:
    g = F.regexp_extract(lex, _DUR_RE, i)
    return F.when(g == "", F.lit(0.0)).otherwise(g.cast("double"))


def _dur_valid(lex: Column) -> Column:
    # must match the grammar AND carry at least one component
    return F.regexp_like(lex, F.lit(_DUR_RE)) \
        & F.regexp_like(lex, F.lit(r"\d"))


def _dur_months(lex: Column) -> Column:
    sign = F.when(lex.startswith("-"), F.lit(-1.0)).otherwise(F.lit(1.0))
    m = sign * (_dur_group(lex, 1) * 12 + _dur_group(lex, 2))
    return F.when(_dur_valid(lex), m).otherwise(F.lit(None))


def _dur_seconds(lex: Column) -> Column:
    sign = F.when(lex.startswith("-"), F.lit(-1.0)).otherwise(F.lit(1.0))
    s = sign * (_dur_group(lex, 3) * 86400 + _dur_group(lex, 4) * 3600
                + _dur_group(lex, 5) * 60 + _dur_group(lex, 6))
    return F.when(_dur_valid(lex), s).otherwise(F.lit(None))


def _xsd_double(lex: Column) -> Column:
    """XSD double lexical space includes INF/-INF/NaN (Spark cast → NULL)."""
    return (F.when(lex == "INF", F.lit(float("inf")))
             .when(lex == "-INF", F.lit(float("-inf")))
             .when(lex == "NaN", F.lit(float("nan")))
             .otherwise(lex.cast("double")))


def make_typed(lex: Column, datatype: Column) -> Column:
    """Literal with a *dynamic* datatype IRI column (STRDT); payload fields
    derived from the datatype at runtime."""
    num = F.when(datatype.isin(*INTEGER_DATATYPES) | (datatype == XSD_DECIMAL),
                 lex.cast(DECIMAL_T)) \
           .when(datatype.isin(*DURATION_DATATYPES),
                 _dur_months(lex).cast(DECIMAL_T))
    dbl = F.when(datatype.isin(XSD_FLOAT, XSD_DOUBLE), _xsd_double(lex)) \
           .when(datatype.isin(*DURATION_DATATYPES), _dur_seconds(lex))
    b = F.when(datatype == XSD_BOOLEAN,
               F.when(lex.isin("true", "1"), F.lit(True))
                .when(lex.isin("false", "0"), F.lit(False)))
    ts = F.when(datatype.isin(XSD_DATETIME, XSD_DATE), _parse_ts(lex)) \
          .when(datatype == XSD_TIME,
                _parse_ts(F.concat(F.lit("1970-01-01T"), lex))) \
          .when(datatype == XSD_GYEAR,
                _parse_ts(_gy_anchor(lex, XSD_GYEAR))) \
          .when(datatype == XSD_GYEARMONTH,
                _parse_ts(_gy_anchor(lex, XSD_GYEARMONTH)))
    tz = F.when(datatype.isin(XSD_DATETIME, XSD_DATE, XSD_TIME,
                              XSD_GYEAR, XSD_GYEARMONTH),
                _parse_tz_min(lex))
    return term_struct(KIND_LITERAL, lex, datatype=datatype,
                       num=num, dbl=dbl, ts=ts, tz_min=tz, bool_=b)


# -- predicates over terms --------------------------------------------------

def is_iri(t: Column) -> Column:
    return t["kind"] == KIND_IRI


def is_blank(t: Column) -> Column:
    return t["kind"] == KIND_BNODE


def is_literal(t: Column) -> Column:
    return t["kind"] == KIND_LITERAL


def is_numeric(t: Column) -> Column:
    # VALUE semantics: a numeric-datatype literal with an ill-formed
    # lexical ("abc"^^xsd:integer) is NOT a numeric value — its parsed
    # payload is NULL.  isNumeric() returns false for it (§17.4.2.4),
    # arithmetic/comparison kernels fall back to type error, and SUM/AVG
    # count it as an in-group error (the reference encodes terms at load,
    # so an unparsable integer never becomes an Int there either).
    return ((t["kind"] == KIND_LITERAL)
            & t["datatype"].isin(*NUMERIC_DATATYPES)
            & (t["num"].isNotNull() | t["dbl"].isNotNull()))


def term_key(t: Column) -> Column:
    """Term-identity key for joins: SPARQL solution compatibility compares
    *RDF terms* (spec §18.3 'compatible'), i.e. (kind, lex, datatype, lang).
    Joining on this 4-tuple instead of the 9-field struct keeps shuffle keys
    narrow — at 100 TB the payload fields never enter the exchange."""
    return F.struct(
        t["kind"].alias("kind"), t["lex"].alias("lex"),
        t["datatype"].alias("datatype"), t["lang"].alias("lang"))


def join_key(t: Column) -> Column:
    """16-byte content-hash join key over the term identity 4-tuple —
    the shuffle-narrow replacement for :func:`term_key` in JOIN
    conditions (our analog of the reference's dictionary-encoded id
    joins, ``storage/numeric_encoder.rs`` · ``EncodedTerm``, minus the
    global dictionary: content hashes need no coordination at ingest).

    ``term_key`` duplicates ``lex``/``datatype`` strings into the
    exchange alongside the term payload; this ships 16 bytes instead
    and makes sort-merge compares O(1).  Two independently-seeded
    xxhash64 halves → collision odds ≈ N²/2¹²⁹ (immaterial at any
    corpus size).  Per-field null sentinels because Spark hash
    functions SKIP null inputs (hash(a, null, b) == hash(a, b, null)
    otherwise).  Only for equality under non-null guards — term_key
    stays for group keys that rebuild the representative term."""
    parts = (t["kind"],
             F.coalesce(t["lex"], F.lit("\x00L")),
             F.coalesce(t["datatype"], F.lit("\x00D")),
             F.coalesce(t["lang"], F.lit("\x00G")))
    return F.struct(F.xxhash64(*parts).alias("h1"),
                    F.xxhash64(*parts, F.lit(_JK_SEED2)).alias("h2"))


_JK_SEED2 = -7046029254386353131


def _bq(name: str) -> str:
    """Backtick-quote a column name for SQL embedding."""
    return "`" + name.replace("`", "``") + "`"


def join_key_sql(name: str) -> str:
    """SQL text of :func:`join_key` over the NAMED term column — the
    plan-build fast path: one ``F.expr`` call instead of ~20 py4j
    round-trips per key (the single hottest builder in compile
    profiles).  Semantically identical to ``join_key(df[name])``
    (``\\u0000…`` escapes decode to the same NUL sentinels)."""
    c = _bq(name)
    args = (f"{c}.kind, coalesce({c}.lex, '\\u0000L'), "
            f"coalesce({c}.datatype, '\\u0000D'), "
            f"coalesce({c}.lang, '\\u0000G')")
    return (f"named_struct('h1', xxhash64({args}), "
            f"'h2', xxhash64({args}, {_JK_SEED2}L))")


def join_key_named(name: str) -> Column:
    """:func:`join_key` over a plain named column in the CURRENT frame
    (unqualified resolution — do not use inside two-sided join
    conditions where the name exists on both sides)."""
    return F.expr(join_key_sql(name))


def guarded_key_named(name: str) -> Column:
    """``join_key`` guarded to be NULL iff the term is NULL (the
    ``_key_col`` invariant), as one ``F.expr``."""
    return F.expr(f"CASE WHEN {_bq(name)} IS NOT NULL "
                  f"THEN {join_key_sql(name)} END")


# -- compact 64-bit key family (DEFAULT dictionary variant, SURVEY §1.4) ----
# Same content-hash identity as join_key but a SINGLE xxhash64: 8-byte
# exchange/group keys (half the width) at collision odds ≈ N²/2⁶⁵ —
# safe for corpora up to ~10⁹ distinct terms (odds ≈ 3·10⁻²·ε), NOT for
# the 10¹²-term 100 TB tier, where sources must opt back into the
# 128-bit struct keys (``key_width=128``; see sources/dictionary.py
# sizing note).  Selected per-source via ``source.key_width``; the
# compiler dispatches every key computation through one mode so
# mixed-width comparisons cannot occur.  Measured on the sf0.1 join
# and closure shapes the 64-bit keys are 1.3–1.6× faster
# (tools/ab_keywidth.py), hence the default.

def join_key64(t: Column) -> Column:
    return F.xxhash64(t["kind"],
                      F.coalesce(t["lex"], F.lit("\x00L")),
                      F.coalesce(t["datatype"], F.lit("\x00D")),
                      F.coalesce(t["lang"], F.lit("\x00G")))


def join_key64_sql(name: str) -> str:
    c = _bq(name)
    return (f"xxhash64({c}.kind, coalesce({c}.lex, '\\u0000L'), "
            f"coalesce({c}.datatype, '\\u0000D'), "
            f"coalesce({c}.lang, '\\u0000G'))")


def join_key64_named(name: str) -> Column:
    return F.expr(join_key64_sql(name))


def guarded_key64_named(name: str) -> Column:
    return F.expr(f"CASE WHEN {_bq(name)} IS NOT NULL "
                  f"THEN {join_key64_sql(name)} END")


def same_term(a: Column, b: Column) -> Column:
    return term_key(a).eqNullSafe(term_key(b))


# -- SPARQL total term order (ORDER BY / MIN / MAX) -------------------------

def sort_key(t: Column) -> Column:
    """Total order over terms per SPARQL §15.1 extended to a total order
    (reference: spareval term comparison): unbound < blank < IRI < literal;
    literals ordered within value class (numeric, boolean, dateTime, string),
    then by (datatype, lex) for unknown types.  Struct comparison in Spark is
    field-wise lexicographic, which realizes exactly this."""
    k = t["kind"]
    cls = (
        F.when(t.isNull() | k.isNull(), F.lit(0))
        .when(k == KIND_BNODE, F.lit(1))
        .when(k == KIND_IRI, F.lit(2))
        # durations carry (months, seconds) in num/dbl but are NOT
        # numerically ordered with numbers — class with unknown literals
        .when((k == KIND_LITERAL) & t["datatype"].isin(*DURATION_DATATYPES),
              F.lit(7))
        .when((k == KIND_LITERAL) & t["num"].isNotNull(), F.lit(3))
        .when((k == KIND_LITERAL) & t["dbl"].isNotNull(), F.lit(3))
        .when((k == KIND_LITERAL) & t["bool"].isNotNull(), F.lit(4))
        .when((k == KIND_LITERAL) & t["ts"].isNotNull(), F.lit(5))
        .when((k == KIND_LITERAL) & (t["datatype"].isin(XSD_STRING) | t["lang"].isNotNull()), F.lit(6))
        .when(k == KIND_LITERAL, F.lit(7))
        .otherwise(F.lit(8))
    )
    num_key = F.coalesce(t["dbl"], t["num"].cast("double"))
    return F.struct(
        cls.alias("cls"),
        num_key.alias("num_key"),
        t["bool"].cast("int").alias("bool_key"),
        t["ts"].alias("ts_key"),
        F.when(cls.isin(2, 6), t["lex"]).otherwise(F.lit(None)).alias("str_key"),
        t["datatype"].alias("dt_key"),
        t["lex"].alias("lex_key"),
        t["lang"].alias("lang_key"),
    )
