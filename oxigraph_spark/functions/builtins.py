"""SPARQL 1.1 §17 builtin functions over TERM structs.

Reference: expression evaluation in ``lib/spareval/src/eval.rs`` (the
per-``Function`` match arms) with numeric/temporal kernels in
``lib/oxsdatatypes/``.  Every function here is Column→Column (term in,
term out), errors are NULL, and everything stays JVM-side — no Python
UDFs anywhere in the expression path.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

from pyspark.sql import Column, functions as F

from ..model import terms as T
from . import kernels as K

def err() -> Column:
    """NULL TERM (a SPARQL evaluation error / unbound).  Cached Column
    (immutable, reused): this is the single most-constructed expression
    in the compiler — every builtin's otherwise-branch."""
    return T._cached(("err",), lambda: F.lit(None).cast(T.TERM_SCHEMA))


def bool_term(c: Column) -> Column:
    """Boolean Column (3-valued) → boolean TERM (NULL = error)."""
    return F.when(c.isNotNull(), T.bool_lit(c)).otherwise(err())


def _is_stringish(t: Column) -> Column:
    """simple literal / xsd:string / language-tagged string."""
    return (t["kind"] == T.KIND_LITERAL) & (
        t["datatype"].eqNullSafe(T.XSD_STRING)
        | t["datatype"].eqNullSafe(T.RDF_LANGSTRING)
        | (t["datatype"].isNull() & t["lang"].isNull())
        | t["lang"].isNotNull())


def _is_plain_string(t: Column) -> Column:
    return (t["kind"] == T.KIND_LITERAL) & t["lang"].isNull() & (
        t["datatype"].eqNullSafe(T.XSD_STRING) | t["datatype"].isNull())


def _arg_compatible(a: Column, b: Column) -> Column:
    """Argument-compatibility rule (§17.4.3.4.1) for two-string builtins."""
    return _is_stringish(a) & (
        _is_plain_string(b)
        | (a["lang"].isNotNull() & a["lang"].eqNullSafe(b["lang"])))


def _same_kind_string(src: Column, lex: Column) -> Column:
    """Build a string-ish literal carrying ``src``'s lang/datatype."""
    return T.term_struct(T.KIND_LITERAL, lex, datatype=src["datatype"],
                         lang=src["lang"])


# ---------------------------------------------------------------------------
# terms: accessors / constructors / tests
# ---------------------------------------------------------------------------

def fn_str(t: Column) -> Column:
    ok = (t["kind"] == T.KIND_IRI) | (t["kind"] == T.KIND_LITERAL)
    return F.when(ok, T.str_lit(t["lex"])).otherwise(err())


def fn_lang(t: Column) -> Column:
    return F.when(t["kind"] == T.KIND_LITERAL,
                  T.str_lit(F.coalesce(t["lang"], F.lit("")))).otherwise(err())


def fn_datatype(t: Column) -> Column:
    dt = F.coalesce(
        t["datatype"],
        F.when(t["lang"].isNotNull(), T._dtlit(T.RDF_LANGSTRING))
         .otherwise(T._dtlit(T.XSD_STRING)))
    return F.when(t["kind"] == T.KIND_LITERAL, T.iri(dt)).otherwise(err())


def fn_iri(t: Column, base: Optional[Column] = None) -> Column:
    """IRI()/URI().  ``base`` (a string-literal TERM of the query base,
    attached by the parser when a BASE is declared and the argument is
    dynamic) resolves relative strings per RFC 3986: scheme-relative,
    absolute-path, fragment and relative-path references, with bounded
    dot-segment normalization (4 passes — constant arguments resolve
    exactly at parse time instead)."""
    if base is None:
        return (F.when(t["kind"] == T.KIND_IRI, t)
                 .when(_is_plain_string(t), T.iri(t["lex"]))
                 .otherwise(err()))
    lex, b = t["lex"], base["lex"]
    scheme = F.regexp_extract(b, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    root = F.regexp_extract(b, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    b_noq = F.regexp_replace(b, r"[#?].*$", "")
    bdir = F.regexp_replace(b_noq, r"[^/]*$", "")
    # RFC 3986 §5.3.3 merge: an authority-only base (empty path, e.g.
    # <http://example.org>) merges as if its path were "/"
    bdir = F.when((root != "") & (bdir == F.concat(scheme, F.lit("://"))),
                  F.concat(root, F.lit("/"))).otherwise(bdir)
    merged = F.concat(bdir, lex)
    for _ in range(4):
        merged = F.regexp_replace(merged, r"/\./", "/")
        merged = F.regexp_replace(merged, r"/[^/]+/\.\./", "/")
    resolved = (
        F.when(lex.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:"), lex)
         .when(lex.startswith("//"), F.concat(scheme, F.lit(":"), lex))
         .when(lex.startswith("/"),
               F.when(root != "", F.concat(root, lex))
                .otherwise(F.concat(scheme, F.lit(":"), lex)))
         .when(lex == "", F.regexp_replace(b, r"#.*$", ""))
         .when(lex.startswith("#"),
               F.concat(F.regexp_replace(b, r"#.*$", ""), lex))
         # RFC 3986 §5.3: query-only reference keeps the base PATH
         # (merge against the full base sans query/fragment, not dirname)
         .when(lex.startswith("?"), F.concat(b_noq, lex))
         .otherwise(merged))
    return (F.when(t["kind"] == T.KIND_IRI, t)
             .when(_is_plain_string(t), T.iri(resolved))
             .otherwise(err()))


def fn_strdt(lex: Column, dt: Column) -> Column:
    ok = _is_plain_string(lex) & (dt["kind"] == T.KIND_IRI)
    return F.when(ok, T.make_typed(lex["lex"], dt["lex"])).otherwise(err())


def fn_strlang(lex: Column, lang: Column) -> Column:
    # the tag must be a well-formed (BCP47-shaped, non-empty) language
    # tag — STRLANG("x", "") is an error, not an empty-tagged literal
    ok = (_is_plain_string(lex) & _is_plain_string(lang)
          & lang["lex"].rlike(r"^[A-Za-z]+(-[A-Za-z0-9]+)*$"))
    return F.when(ok, T.lang_lit(lex["lex"], F.lower(lang["lex"]))).otherwise(err())


def fn_same_term(a: Column, b: Column) -> Column:
    return bool_term(T.same_term(a, b))


def fn_is_iri(t: Column) -> Column:
    return F.when(t.isNull(), err()).otherwise(bool_term(t["kind"] == T.KIND_IRI))


def fn_is_blank(t: Column) -> Column:
    return F.when(t.isNull(), err()).otherwise(bool_term(t["kind"] == T.KIND_BNODE))


def fn_is_literal(t: Column) -> Column:
    return F.when(t.isNull(), err()).otherwise(bool_term(t["kind"] == T.KIND_LITERAL))


def fn_is_numeric(t: Column) -> Column:
    return F.when(t.isNull(), err()).otherwise(bool_term(T.is_numeric(t)))


# ---------------------------------------------------------------------------
# strings
# ---------------------------------------------------------------------------

def fn_strlen(t: Column) -> Column:
    return F.when(_is_stringish(t), T.int_lit(F.length(t["lex"]))).otherwise(err())


def fn_substr(t: Column, start: Column, length: Column = None) -> Column:
    """XPath fn:substring window semantics (§17.4.3.3): the result is
    the chars at 1-indexed positions p with start <= p < start+length —
    so a zero/negative start SHRINKS the window instead of counting
    from the end (SUBSTR("hello", 0, 3) = "he"; SUBSTR("hello", -1) =
    "hello"), unlike Spark's substr which treats negatives as
    from-the-end offsets."""
    # XPath applies fn:round (half toward +inf) to BOTH args before the
    # window arithmetic: substring("12345", 1.6) = "2345".  floor(x+0.5)
    # is exactly fn:round for all signs (HALF_UP differs at -n.5).
    # xsd:double/xsd:float args carry their value in dbl with num NULL,
    # so coalesce across both; a non-numeric arg is an evaluation ERROR.
    start_v = F.coalesce(start["num"].cast("double"), start["dbl"])
    pos = F.floor(start_v + F.lit(0.5)).cast("int")
    args_ok = T.is_numeric(start)
    if length is not None:
        len_v = F.coalesce(length["num"].cast("double"), length["dbl"])
        end = pos + F.floor(len_v + F.lit(0.5)).cast("int")  # exclusive
        clamped = F.greatest(pos, F.lit(1))
        ln = F.greatest(end - clamped, F.lit(0))
        out_lex = t["lex"].substr(clamped, ln)
        args_ok = args_ok & T.is_numeric(length)
    else:
        out_lex = t["lex"].substr(F.greatest(pos, F.lit(1)),
                                  F.lit(2 ** 31 - 1))
    out = _same_kind_string(t, out_lex)
    return F.when(_is_stringish(t) & args_ok, out).otherwise(err())


def fn_ucase(t: Column) -> Column:
    return F.when(_is_stringish(t), _same_kind_string(t, F.upper(t["lex"]))).otherwise(err())


def fn_lcase(t: Column) -> Column:
    return F.when(_is_stringish(t), _same_kind_string(t, F.lower(t["lex"]))).otherwise(err())


def fn_strstarts(a: Column, b: Column) -> Column:
    return F.when(_arg_compatible(a, b),
                  bool_term(a["lex"].startswith(b["lex"]))).otherwise(err())


def fn_strends(a: Column, b: Column) -> Column:
    return F.when(_arg_compatible(a, b),
                  bool_term(a["lex"].endswith(b["lex"]))).otherwise(err())


def fn_contains(a: Column, b: Column) -> Column:
    return F.when(_arg_compatible(a, b),
                  bool_term(a["lex"].contains(b["lex"]))).otherwise(err())


def fn_strbefore(a: Column, b: Column) -> Column:
    pos = F.instr(a["lex"], b["lex"])
    found = pos > 0
    out = F.when(b["lex"] == "", _same_kind_string(a, F.lit(""))) \
           .when(found, _same_kind_string(a, a["lex"].substr(F.lit(1), pos - 1))) \
           .otherwise(T.str_lit(F.lit("")))
    return F.when(_arg_compatible(a, b), out).otherwise(err())


def fn_strafter(a: Column, b: Column) -> Column:
    pos = F.instr(a["lex"], b["lex"])
    found = pos > 0
    after = a["lex"].substr(pos + F.length(b["lex"]),
                            F.length(a["lex"]))
    out = F.when(b["lex"] == "", a) \
           .when(found, _same_kind_string(a, after)) \
           .otherwise(T.str_lit(F.lit("")))
    return F.when(_arg_compatible(a, b), out).otherwise(err())


def fn_encode_for_uri(t: Column) -> Column:
    # RFC 3986 percent-encoding; Spark url_encode is
    # application/x-www-form-urlencoded, so fix up the deltas.
    enc = F.url_encode(t["lex"])
    enc = F.replace(enc, F.lit("+"), F.lit("%20"))
    enc = F.replace(enc, F.lit("*"), F.lit("%2A"))
    enc = F.replace(enc, F.lit("%7E"), F.lit("~"))
    return F.when(_is_stringish(t), T.str_lit(enc)).otherwise(err())


def fn_concat(*args: Column) -> Column:
    all_str = F.lit(True)
    for a in args:
        all_str = all_str & _is_stringish(a)
    lex = F.concat(*[a["lex"] for a in args])
    if args:
        same_lang = F.lit(True)
        lang0 = args[0]["lang"]
        for a in args[1:]:
            same_lang = same_lang & lang0.eqNullSafe(a["lang"])
        lang = F.when(same_lang & lang0.isNotNull(), lang0)
    else:
        lang = F.lit(None).cast("string")
    dt = F.when(lang.isNotNull(), T._dtlit(T.RDF_LANGSTRING)).otherwise(T._dtlit(T.XSD_STRING))
    out = T.term_struct(T.KIND_LITERAL, lex, datatype=dt, lang=lang)
    return F.when(all_str, out).otherwise(err())


def fn_langmatches(tag: Column, rng: Column) -> Column:
    t, r = F.lower(tag["lex"]), F.lower(rng["lex"])
    m = F.when(rng["lex"] == "*", tag["lex"] != "") \
         .otherwise((t == r) | t.startswith(F.concat(r, F.lit("-"))))
    ok = _is_plain_string(tag) & _is_plain_string(rng)
    return F.when(ok, bool_term(m)).otherwise(err())


def _regex_pattern(pattern: Column, flags: Column = None) -> Column:
    """XPath regex pattern with flags (§17.4.3.14): ``smix`` map to Java
    inline flags; ``q`` (match as a literal string) has no Java inline
    form, so the pattern is wrapped in ``\\Q…\\E`` instead."""
    if flags is None:
        return pattern["lex"]
    has_q = flags["lex"].contains("q")
    rest = F.replace(flags["lex"], F.lit("q"), F.lit(""))
    # a literal "\E" inside the pattern would terminate the \Q quote and
    # leak the remainder as live regex — re-quote around it exactly the
    # way java.util.regex.Pattern.quote does (\E -> \E\\E\Q)
    quotable = F.replace(pattern["lex"], F.lit("\\E"), F.lit("\\E\\\\E\\Q"))
    base = F.when(has_q, F.concat(F.lit("\\Q"), quotable,
                                  F.lit("\\E"))).otherwise(pattern["lex"])
    return F.when(F.length(rest) > 0,
                  F.concat(F.lit("(?"), rest, F.lit(")"), base)) \
            .otherwise(base)


def _flags_ok(flags: Column = None) -> Column:
    # an invalid flag char is an evaluation ERROR, not a Java crash
    return (F.lit(True) if flags is None
            else flags["lex"].rlike(r"^[smixq]*$"))


def fn_regex(text: Column, pattern: Column, flags: Column = None) -> Column:
    ok = _is_stringish(text) & _is_plain_string(pattern) & _flags_ok(flags)
    return F.when(ok, bool_term(F.regexp_like(
        text["lex"], _regex_pattern(pattern, flags)))).otherwise(err())


def fn_replace(text: Column, pattern: Column, repl: Column, flags: Column = None) -> Column:
    # XPath fn:replace err:FORX0003: a pattern that matches the
    # zero-length string is an evaluation error (Java would happily
    # interleave the replacement between every char)
    ok = (_is_stringish(text) & _is_plain_string(pattern)
          & _is_plain_string(repl) & _flags_ok(flags)
          & ~F.regexp_like(F.lit(""), _regex_pattern(pattern, flags)))
    out = _same_kind_string(
        text, F.regexp_replace(text["lex"], _regex_pattern(pattern, flags), repl["lex"]))
    return F.when(ok, out).otherwise(err())


# ---------------------------------------------------------------------------
# numerics
# ---------------------------------------------------------------------------

def _rebuild_numeric(src: Column, num: Column, dbl: Column) -> Column:
    """Result term with the same numeric datatype as ``src``."""
    is_int = src["datatype"].isin(*T.INTEGER_DATATYPES)
    lex = F.when(is_int, num.cast("long").cast("string")) \
           .when(src["num"].isNotNull(), K._decimal_lex(num)) \
           .otherwise(T.double_lex(dbl))
    return T.term_struct(
        T.KIND_LITERAL, lex, datatype=src["datatype"],
        num=F.when(src["num"].isNotNull(), num),
        dbl=F.when(src["dbl"].isNotNull(), dbl))


def fn_abs(t: Column) -> Column:
    return F.when(T.is_numeric(t),
                  _rebuild_numeric(t, F.abs(t["num"]), F.abs(t["dbl"]))).otherwise(err())


def fn_ceil(t: Column) -> Column:
    return F.when(T.is_numeric(t),
                  _rebuild_numeric(t, F.ceil(t["num"]).cast(T.DECIMAL_T),
                                   F.ceil(t["dbl"]).cast("double"))).otherwise(err())


def fn_floor(t: Column) -> Column:
    return F.when(T.is_numeric(t),
                  _rebuild_numeric(t, F.floor(t["num"]).cast(T.DECIMAL_T),
                                   F.floor(t["dbl"]).cast("double"))).otherwise(err())


def fn_round(t: Column) -> Column:
    # XPath fn:round: half rounds toward +∞ (floor(x+0.5)), unlike Spark's
    # HALF_UP which rounds -2.5 to -3.
    rnum = F.floor(t["num"] + 0.5).cast(T.DECIMAL_T)
    rdbl = F.floor(t["dbl"] + 0.5).cast("double")
    return F.when(T.is_numeric(t), _rebuild_numeric(t, rnum, rdbl)).otherwise(err())


# ---------------------------------------------------------------------------
# temporal (reference kernels: lib/oxsdatatypes/src/date_time.rs)
# ---------------------------------------------------------------------------

def _dt_ok(t: Column) -> Column:
    return (t["kind"] == T.KIND_LITERAL) & t["ts"].isNotNull() \
        & t["datatype"].isin(T.XSD_DATETIME, T.XSD_DATE, T.XSD_TIME)


def _local_ts(t: Column) -> Column:
    """The LEXICAL-form timestamp: ``ts`` is normalized to UTC at parse
    time (session tz is UTC), but §17.4.5's component accessors
    (YEAR…MINUTES) operate on the original lexical value — e.g.
    ``HOURS("…T14:45:13-05:00") = 14``, not 19.  Re-apply the stored
    offset (``tz_min``; offsets are whole minutes, so SECONDS is
    unaffected)."""
    m = t["tz_min"]
    return F.when(m.isNotNull(),
                  F.timestamp_add("MINUTE", m, t["ts"])).otherwise(t["ts"])


def _int_part(f: Callable[[Column], Column]) -> Callable[[Column], Column]:
    def g(t: Column) -> Column:
        return F.when(_dt_ok(t), T.int_lit(f(_local_ts(t)))).otherwise(err())
    return g


fn_year = _int_part(F.year)
fn_month = _int_part(F.month)
fn_day = _int_part(F.day)
fn_hours = _int_part(F.hour)
fn_minutes = _int_part(F.minute)


def fn_seconds(t: Column) -> Column:
    micros = F.unix_micros(t["ts"]) % 60_000_000
    val = (micros.cast(T.DECIMAL_T) / 1_000_000).cast(T.DECIMAL_T)
    out = T.term_struct(T.KIND_LITERAL, K._decimal_lex(val),
                        datatype=T._dtlit(T.XSD_DECIMAL), num=val)
    return F.when(_dt_ok(t), out).otherwise(err())


def fn_tz(t: Column) -> Column:
    m = t["tz_min"]
    sign = F.when(m < 0, F.lit("-")).otherwise(F.lit("+"))
    hh = F.lpad(F.floor(F.abs(m) / 60).cast("string"), 2, "0")
    mm = F.lpad((F.abs(m) % 60).cast("string"), 2, "0")
    s = F.when(m.isNull(), F.lit("")) \
         .when(m == 0, F.lit("Z")) \
         .otherwise(F.concat(sign, hh, F.lit(":"), mm))
    return F.when(_dt_ok(t), T.str_lit(s)).otherwise(err())


def fn_timezone(t: Column) -> Column:
    m = t["tz_min"]
    sign = F.when(m < 0, F.lit("-")).otherwise(F.lit(""))
    h, mn = F.floor(F.abs(m) / 60), F.abs(m) % 60
    # canonical xsd:dayTimeDuration: zero duration is "PT0S" (the spec's
    # own TIMEZONE(...Z) example), minutes only when non-zero
    lex = F.when(m == 0, F.lit("PT0S")).otherwise(F.concat(
        sign, F.lit("PT"),
        F.when(h > 0, F.concat(h.cast("string"), F.lit("H"))).otherwise(F.lit("")),
        F.when(mn > 0, F.concat(mn.cast("string"), F.lit("M"))).otherwise(F.lit(""))))
    out = T.term_struct(T.KIND_LITERAL, lex,
                        datatype=T._dtlit(T.XSD_DT_DURATION),
                        num=F.lit(0).cast(T.DECIMAL_T),
                        dbl=(m * 60).cast("double"))
    return F.when(_dt_ok(t) & m.isNotNull(), out).otherwise(err())


# ---------------------------------------------------------------------------
# hashes
# ---------------------------------------------------------------------------

def _hash_fn(h: Callable[[Column], Column]) -> Callable[[Column], Column]:
    def g(t: Column) -> Column:
        return F.when(_is_plain_string(t), T.str_lit(h(t["lex"]))).otherwise(err())
    return g


fn_md5 = _hash_fn(lambda c: F.md5(F.encode(c, "UTF-8")))
fn_sha1 = _hash_fn(lambda c: F.sha1(F.encode(c, "UTF-8")))
fn_sha256 = _hash_fn(lambda c: F.sha2(F.encode(c, "UTF-8"), 256))
fn_sha384 = _hash_fn(lambda c: F.sha2(F.encode(c, "UTF-8"), 384))
fn_sha512 = _hash_fn(lambda c: F.sha2(F.encode(c, "UTF-8"), 512))


# ---------------------------------------------------------------------------
# casts (XSD constructor functions; reference: oxsdatatypes from_str/checked)
# ---------------------------------------------------------------------------

def _cast_numeric_exact(t: Column, datatype: str) -> Column:
    src_num = F.coalesce(
        t["num"],
        F.when(t["dbl"].isNotNull() & ~F.isnan(t["dbl"]), t["dbl"].cast(T.DECIMAL_T)),
        F.when(t["bool"].isNotNull(), t["bool"].cast("int").cast(T.DECIMAL_T)),
        F.when(_is_plain_string(t), t["lex"].cast(T.DECIMAL_T)))
    if datatype == T.XSD_INTEGER:
        v = src_num.cast("long")  # truncates toward zero ✓ (XPath semantics)
        # string → integer must reject non-integer lexical forms
        v = F.when(_is_plain_string(t) & ~t["lex"].rlike(r"^[+-]?\d+$"),
                   F.lit(None).cast("long")).otherwise(v)
        out = T.term_struct(T.KIND_LITERAL, v.cast("string"),
                            datatype=T._dtlit(T.XSD_INTEGER), num=v.cast(T.DECIMAL_T))
        return F.when(v.isNotNull(), out).otherwise(err())
    out = T.term_struct(T.KIND_LITERAL, K._decimal_lex(src_num),
                        datatype=T._dtlit(T.XSD_DECIMAL), num=src_num)
    return F.when(src_num.isNotNull(), out).otherwise(err())


def _cast_double(t: Column, datatype: str) -> Column:
    v = F.coalesce(t["dbl"], t["num"].cast("double"),
                   F.when(t["bool"].isNotNull(), t["bool"].cast("int").cast("double")),
                   F.when(_is_plain_string(t),
                          F.when(t["lex"] == "INF", F.lit(float("inf")))
                           .when(t["lex"] == "-INF", F.lit(float("-inf")))
                           .when(t["lex"] == "NaN", F.lit(float("nan")))
                           .otherwise(t["lex"].cast("double"))))
    # XSD canonical special values are INF/-INF/NaN, not Java's
    # Infinity/-Infinity (value payload is unaffected either way)
    lex = (F.when(F.isnan(v), F.lit("NaN"))
            .when(v == float("inf"), F.lit("INF"))
            .when(v == float("-inf"), F.lit("-INF"))
            .otherwise(v.cast("string")))
    out = T.term_struct(T.KIND_LITERAL, lex,
                        datatype=F.lit(datatype), dbl=v)
    return F.when(v.isNotNull(), out).otherwise(err())


def _cast_boolean(t: Column) -> Column:
    v = F.coalesce(
        t["bool"],
        F.when(t["num"].isNotNull(), t["num"] != 0),
        F.when(t["dbl"].isNotNull(), (t["dbl"] != 0) & ~F.isnan(t["dbl"])),
        F.when(_is_plain_string(t),
               F.when(t["lex"].isin("true", "1"), F.lit(True))
                .when(t["lex"].isin("false", "0"), F.lit(False))))
    return F.when(v.isNotNull(), T.bool_lit(v)).otherwise(err())


# XPath casting: string sources must match the TARGET type's lexical
# space exactly (xsd:dateTime("2020-01-01") is an ERROR — no time part);
# temporal-value sources convert (dateTime→date truncates, date→dateTime
# anchors at 00:00:00), both keeping the source's timezone.
_DT_LEX = r"^-?\d{4,}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?$"
_DATE_LEX = r"^-?\d{4,}-\d{2}-\d{2}(Z|[+-]\d{2}:\d{2})?$"
_TIME_LEX = r"^\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?$"


def _cast_datetime(t: Column, datatype: str) -> Column:
    date_part = F.regexp_extract(t["lex"], r"^(-?\d{4,}-\d{2}-\d{2})", 1)
    time_part = F.regexp_extract(
        t["lex"], r"T(\d{2}:\d{2}:\d{2}(?:\.\d+)?)", 1)
    tz_suf = F.regexp_extract(t["lex"], r"(Z|[+-]\d{2}:\d{2})$", 1)
    is_lit = t["kind"] == T.KIND_LITERAL
    is_dt_src = is_lit & (t["datatype"] == T.XSD_DATETIME)
    is_d_src = is_lit & (t["datatype"] == T.XSD_DATE)
    if datatype == T.XSD_DATETIME:
        str_ok = _is_plain_string(t) & t["lex"].rlike(_DT_LEX)
        conv = (F.when(is_dt_src | str_ok, t["lex"])
                 .when(is_d_src,
                       F.concat(date_part, F.lit("T00:00:00"), tz_suf)))
    elif datatype == T.XSD_DATE:
        str_ok = _is_plain_string(t) & t["lex"].rlike(_DATE_LEX)
        conv = (F.when(is_d_src | str_ok, t["lex"])
                 .when(is_dt_src, F.concat(date_part, tz_suf)))
    else:                                         # XSD_TIME
        str_ok = _is_plain_string(t) & t["lex"].rlike(_TIME_LEX)
        conv = (F.when(is_lit & (t["datatype"] == T.XSD_TIME), t["lex"])
                 .when(str_ok, t["lex"])
                 .when(is_dt_src, F.concat(time_part, tz_suf)))
    out = T.let1(conv, lambda lx: T.make_typed(lx, F.lit(datatype)))
    return T.let1(out, lambda o: F.when(
        o["lex"].isNotNull() & o["ts"].isNotNull(), o).otherwise(err()))


def fn_cast(datatype: str, t: Column) -> Column:
    if datatype == T.XSD_STRING:
        return fn_str(t)
    if datatype in (T.XSD_INTEGER, T.XSD_DECIMAL):
        return _cast_numeric_exact(t, datatype)
    if datatype in (T.XSD_DOUBLE, T.XSD_FLOAT):
        return _cast_double(t, datatype)
    if datatype == T.XSD_BOOLEAN:
        return _cast_boolean(t)
    if datatype in (T.XSD_DATETIME, T.XSD_DATE, T.XSD_TIME):
        return _cast_datetime(t, datatype)
    if datatype in T.DURATION_DATATYPES:
        src_dur = (t["kind"] == T.KIND_LITERAL) \
            & t["datatype"].isin(*T.DURATION_DATATYPES)
        ok = _is_plain_string(t) | src_dur
        return F.when(ok, T.typed_lit(t["lex"], datatype)).otherwise(err())
    raise ValueError(f"unsupported cast datatype: {datatype}")


# ---------------------------------------------------------------------------
# registry (name → kernel) — the compiler dispatches ECall through this;
# extension functions (§2.9 QueryOptions::with_custom_function analog)
# register here by IRI.
# ---------------------------------------------------------------------------

REGISTRY: Dict[str, Callable[..., Column]] = {
    "STR": fn_str, "LANG": fn_lang, "DATATYPE": fn_datatype, "IRI": fn_iri,
    "URI": fn_iri, "STRDT": fn_strdt, "STRLANG": fn_strlang,
    "SAMETERM": fn_same_term, "ISIRI": fn_is_iri, "ISURI": fn_is_iri,
    "ISBLANK": fn_is_blank, "ISLITERAL": fn_is_literal,
    "ISNUMERIC": fn_is_numeric,
    "STRLEN": fn_strlen, "SUBSTR": fn_substr, "UCASE": fn_ucase,
    "LCASE": fn_lcase, "STRSTARTS": fn_strstarts, "STRENDS": fn_strends,
    "CONTAINS": fn_contains, "STRBEFORE": fn_strbefore,
    "STRAFTER": fn_strafter, "ENCODE_FOR_URI": fn_encode_for_uri,
    "CONCAT": fn_concat, "LANGMATCHES": fn_langmatches, "REGEX": fn_regex,
    "REPLACE": fn_replace,
    "ABS": fn_abs, "CEIL": fn_ceil, "FLOOR": fn_floor, "ROUND": fn_round,
    "YEAR": fn_year, "MONTH": fn_month, "DAY": fn_day, "HOURS": fn_hours,
    "MINUTES": fn_minutes, "SECONDS": fn_seconds, "TZ": fn_tz,
    "TIMEZONE": fn_timezone,
    "MD5": fn_md5, "SHA1": fn_sha1, "SHA256": fn_sha256,
    "SHA384": fn_sha384, "SHA512": fn_sha512,
}


def register_custom(iri: str, fn: Callable[..., Column]) -> None:
    """Register an extension function addressed by IRI (mirrors
    ``QueryOptions::with_custom_function`` — lib/oxigraph/src/sparql/mod.rs)."""
    REGISTRY[iri] = fn


# RDF-star builtins live in their own module (which imports this one for
# err/bool_term); rdfstar registers itself into REGISTRY at the end of
# its own module body, so the import works from EITHER direction
# (importing rdfstar first used to AttributeError on the half-built
# module here).
from . import rdfstar as _rdfstar  # noqa: E402, F401
