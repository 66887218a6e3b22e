"""SPARQL expression kernels over TERM structs.

These reproduce the value semantics of the reference's evaluator
(``lib/spareval/src/eval.rs`` — expression evaluation over ``EncodedTerm``)
and its XSD kernels (``lib/oxsdatatypes/``): three-valued logic where a
SPARQL *evaluation error* is represented as SQL NULL, the numeric promotion
lattice integer→decimal→float→double (spec §17.4.4 — note int÷int is
decimal), and the Effective Boolean Value rules (§17.2.2).

Everything here is a pure Column→Column function built from
``pyspark.sql.functions`` — no Python UDFs — so the whole expression tree
stays inside Catalyst constant-folding and whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..model import terms as T


def _null_term():
    """Cached NULL TERM Column (see terms._cached)."""
    return T._cached(("err",), lambda: F.lit(None).cast(T.TERM_SCHEMA))

# value classes for operator dispatch
VC_NONLIT = -1
VC_OTHER = 0
VC_NUMERIC = 1
VC_BOOLEAN = 2
VC_DATETIME = 3
VC_STRING = 4       # simple literal / xsd:string
VC_LANGSTRING = 5


def vclass(t: Column) -> Column:
    return (
        F.when(t["kind"] != T.KIND_LITERAL, F.lit(VC_NONLIT))
        .when(t["datatype"].isin(*T.NUMERIC_DATATYPES), F.lit(VC_NUMERIC))
        .when(t["datatype"] == T.XSD_BOOLEAN, F.lit(VC_BOOLEAN))
        .when(t["datatype"].isin(T.XSD_DATETIME, T.XSD_DATE, T.XSD_TIME,
                                 T.XSD_GYEAR, T.XSD_GYEARMONTH),
              F.lit(VC_DATETIME))
        .when(t["datatype"].eqNullSafe(T.XSD_STRING) | t["datatype"].isNull(),
              F.lit(VC_STRING))
        .when(t["lang"].isNotNull(), F.lit(VC_LANGSTRING))
        .otherwise(F.lit(VC_OTHER))
    )


def as_double(t: Column) -> Column:
    return F.coalesce(t["dbl"], t["num"].cast("double"))


def _num_exact(a: Column, b: Column) -> Column:
    """True when both operands are in the exact (integer/decimal) lattice."""
    return (a["num"].isNotNull() & b["num"].isNotNull()
            & a["dbl"].isNull() & b["dbl"].isNull())


# ---------------------------------------------------------------------------
# Effective Boolean Value (spec §17.2.2; reference: spareval EBV eval)
# ---------------------------------------------------------------------------

def ebv(t: Column) -> Column:
    c = vclass(t)
    d = as_double(t)
    num_ebv = F.coalesce((d != 0.0) & ~F.isnan(d), F.lit(False))
    return (
        F.when(t.isNull() | t["kind"].isNull(), F.lit(None).cast("boolean"))
        .when(c == VC_BOOLEAN, F.coalesce(t["bool"], F.lit(False)))
        .when(c == VC_NUMERIC, num_ebv)
        .when((c == VC_STRING) | (c == VC_LANGSTRING), F.length(t["lex"]) > 0)
        .otherwise(F.lit(None).cast("boolean"))
    )


def ebv_typed(t: Column, st: "int | None") -> Column:
    """EBV when the operand's value class is statically known (type
    inference, SURVEY.md §4.2.3 — port of sparopt type_inference): the
    dynamic dispatch collapses to a field access.  A NULL term propagates
    through the field access as NULL (= error) in every branch."""
    if st == VC_BOOLEAN:
        return t["bool"]
    if st == VC_NUMERIC:
        d = as_double(t)
        return F.when(t.isNull(), F.lit(None).cast("boolean")) \
                .otherwise(F.coalesce((d != 0.0) & ~F.isnan(d), F.lit(False)))
    if st in (VC_STRING, VC_LANGSTRING):
        return F.length(t["lex"]) > 0
    return ebv(t)


# ---------------------------------------------------------------------------
# Comparisons (spec §17.4.1 operator mapping + RDF term equality fallback)
# ---------------------------------------------------------------------------

def _num_eq(a: Column, b: Column) -> Column:
    return F.when(_num_exact(a, b), a["num"] == b["num"]) \
            .otherwise(as_double(a) == as_double(b))


def eq(a: Column, b: Column) -> Column:
    ca, cb = vclass(a), vclass(b)
    same = T.same_term(a, b)
    return (
        F.when(a.isNull() | b.isNull(), F.lit(None).cast("boolean"))
        .when((ca == VC_NUMERIC) & (cb == VC_NUMERIC), _num_eq(a, b))
        .when((ca == VC_BOOLEAN) & (cb == VC_BOOLEAN), a["bool"] == b["bool"])
        .when((ca == VC_DATETIME) & (cb == VC_DATETIME), a["ts"] == b["ts"])
        .when((ca == VC_STRING) & (cb == VC_STRING), a["lex"] == b["lex"])
        .when((ca == VC_LANGSTRING) & (cb == VC_LANGSTRING)
              & a["lang"].eqNullSafe(b["lang"]), a["lex"] == b["lex"])
        # duration value equality: (months, seconds) pairs (P1Y = P12M)
        .when(_is_dur(a) & _is_dur(b),
              (a["num"] == b["num"]) & (a["dbl"] == b["dbl"]))
        # both literals, value spaces incomparable: true iff same term,
        # else type error (spec: RDF term equality errors for such literals)
        .when((ca >= 0) & (cb >= 0),
              F.when(same, F.lit(True)).otherwise(F.lit(None).cast("boolean")))
        # a non-literal involved: plain RDF term identity
        .otherwise(same)
    )


def neq(a: Column, b: Column) -> Column:
    return ~eq(a, b)


def _ordered(a: Column, b: Column, op: str) -> Column:
    def cmp(x: Column, y: Column) -> Column:
        return {"<": x < y, "<=": x <= y, ">": x > y, ">=": x >= y}[op]

    ca, cb = vclass(a), vclass(b)
    num_cmp = F.when(_num_exact(a, b), cmp(a["num"], b["num"])) \
               .otherwise(cmp(as_double(a), as_double(b)))
    return (
        F.when(a.isNull() | b.isNull(), F.lit(None).cast("boolean"))
        .when((ca == VC_NUMERIC) & (cb == VC_NUMERIC), num_cmp)
        .when((ca == VC_BOOLEAN) & (cb == VC_BOOLEAN),
              cmp(a["bool"].cast("int"), b["bool"].cast("int")))
        .when((ca == VC_DATETIME) & (cb == VC_DATETIME), cmp(a["ts"], b["ts"]))
        .when((ca == VC_STRING) & (cb == VC_STRING), cmp(a["lex"], b["lex"]))
        # durations order within one family (equal months → by seconds,
        # equal seconds → by months); cross-family compare is an error
        .when(_is_dur(a) & _is_dur(b) & (a["num"] == b["num"]),
              cmp(a["dbl"], b["dbl"]))
        .when(_is_dur(a) & _is_dur(b) & (a["dbl"] == b["dbl"]),
              cmp(a["num"], b["num"]))
        .otherwise(F.lit(None).cast("boolean"))
    )


_NULL_B = None


def _nb() -> Column:
    return F.lit(None).cast("boolean")


def eq_typed(a: Column, b: Column, sta, stb) -> Column:
    """Equality with static value-class knowledge on one or both sides.
    Collapses the 10-branch dynamic dispatch to a handful of nodes."""
    if sta is None and stb is not None:
        return eq_typed(b, a, stb, sta)  # symmetric
    if sta is not None and stb is not None:
        if sta != stb and VC_NONLIT not in (sta, stb):
            # distinct literal value spaces: equal only never; error unless
            # same term (impossible across classes) → error
            return _nb()
        if sta == stb == VC_NUMERIC:
            return _num_eq(a, b)
        if sta == stb == VC_BOOLEAN:
            return a["bool"] == b["bool"]
        if sta == stb == VC_DATETIME:
            return a["ts"] == b["ts"]
        if sta == stb == VC_STRING:
            return a["lex"] == b["lex"]
        if sta == stb == VC_LANGSTRING:
            return F.when(a["lang"].eqNullSafe(b["lang"]), a["lex"] == b["lex"]) \
                    .otherwise(_nb())
        return eq(a, b)
    # one side statically known (b), other dynamic (a)
    if stb == VC_NUMERIC:
        return (F.when(T.is_numeric(a), _num_eq(a, b))
                 .when(a.isNull() | b.isNull(), _nb())
                 .when(a["kind"] != T.KIND_LITERAL, F.lit(False))
                 .otherwise(_nb()))
    if stb == VC_STRING:
        plain = (a["kind"] == T.KIND_LITERAL) & a["lang"].isNull() \
            & a["datatype"].eqNullSafe(T.XSD_STRING)
        return (F.when(a.isNull() | b.isNull(), _nb())
                 .when(plain, a["lex"] == b["lex"])
                 .when(a["kind"] != T.KIND_LITERAL, F.lit(False))
                 .otherwise(_nb()))
    if stb == VC_BOOLEAN:
        return (F.when(a.isNull() | b.isNull(), _nb())
                 .when(a["bool"].isNotNull(), a["bool"] == b["bool"])
                 .when(a["kind"] != T.KIND_LITERAL, F.lit(False))
                 .otherwise(_nb()))
    if stb == VC_DATETIME:
        return (F.when(a.isNull() | b.isNull(), _nb())
                 .when(a["ts"].isNotNull(), a["ts"] == b["ts"])
                 .when(a["kind"] != T.KIND_LITERAL, F.lit(False))
                 .otherwise(_nb()))
    if stb == VC_NONLIT:  # IRI / bnode constant → term identity
        return T.same_term(a, b)
    return eq(a, b)


def cmp_typed(a: Column, b: Column, op: str, sta, stb) -> Column:
    """Ordered comparison with static class knowledge; class mismatch or
    non-literal operand is always an error (NULL)."""
    def c(x: Column, y: Column) -> Column:
        return {"<": x < y, "<=": x <= y, ">": x > y, ">=": x >= y}[op]

    known = sta if sta is not None else stb
    if sta is not None and stb is not None and sta != stb:
        return _nb()
    if known == VC_NUMERIC:
        num_cmp = F.when(_num_exact(a, b), c(a["num"], b["num"])) \
                   .otherwise(c(as_double(a), as_double(b)))
        if sta is not None and stb is not None:
            return num_cmp
        other = a if sta is None else b
        return F.when(T.is_numeric(other), num_cmp).otherwise(_nb())
    if known == VC_STRING:
        cond = c(a["lex"], b["lex"])
        if sta is not None and stb is not None:
            return cond
        other = a if sta is None else b
        plain = (other["kind"] == T.KIND_LITERAL) & other["lang"].isNull() \
            & other["datatype"].eqNullSafe(T.XSD_STRING)
        return F.when(plain, cond).otherwise(_nb())
    if known == VC_DATETIME:
        cond = c(a["ts"], b["ts"])
        if sta is not None and stb is not None:
            return cond
        other = a if sta is None else b
        return F.when(other["ts"].isNotNull()
                      & other["datatype"].isin(T.XSD_DATETIME, T.XSD_DATE,
                                               T.XSD_TIME, T.XSD_GYEAR,
                                               T.XSD_GYEARMONTH),
                      cond).otherwise(_nb())
    if known == VC_BOOLEAN:
        cond = c(a["bool"].cast("int"), b["bool"].cast("int"))
        if sta is not None and stb is not None:
            return cond
        other = a if sta is None else b
        return F.when(other["bool"].isNotNull(), cond).otherwise(_nb())
    return _ordered(a, b, op)


def lt(a: Column, b: Column) -> Column:
    return _ordered(a, b, "<")


def le(a: Column, b: Column) -> Column:
    return _ordered(a, b, "<=")


def gt(a: Column, b: Column) -> Column:
    return _ordered(a, b, ">")


def ge(a: Column, b: Column) -> Column:
    return _ordered(a, b, ">=")


# ---------------------------------------------------------------------------
# Arithmetic (spec §17.4.4; reference: oxsdatatypes checked ops)
# ---------------------------------------------------------------------------

def _decimal_lex(c: Column) -> Column:
    """Canonical lexical form for a decimal value (strip trailing zeros).

    Spark stringifies decimals via BigDecimal.toString, which switches
    to scientific notation when the adjusted exponent is < -6 — zero at
    scale renders "0E-18" and tiny magnitudes "1.2E-7".  xsd:decimal has
    no exponent form, so expand those back to plain notation.

    Known precision limit (documented divergence): Spark's decimal
    DIVISION result type keeps only 6 fractional digits when the scale
    would overflow (1/10000000.0 → 0.000000 → "0"); the reference's
    128-bit fixed-scale decimal keeps 18.  Sub-1e-6 quotients are the
    only affected shape."""
    s = c.cast("string")
    is_sci = s.contains("E")
    neg = s.startswith("-")
    # mantissa digits with '.' and trailing zeros removed; "" for zero
    digits = F.regexp_replace(
        F.regexp_replace(F.regexp_extract(s, r"^-?([0-9.]+)E", 1),
                         r"\.", ""), r"0+$", "")
    exp = F.regexp_extract(s, r"E-([0-9]+)$", 1).cast("int")
    sci_plain = F.when(digits == "", F.lit("0")).otherwise(
        F.concat(F.when(neg, F.lit("-")).otherwise(F.lit("")),
                 F.lit("0."), F.repeat(F.lit("0"), exp - 1), digits))
    plain = F.regexp_replace(
        F.regexp_replace(s, r"(\.\d*?)0+$", r"$1"), r"\.$", "")
    return F.when(is_sci, sci_plain).otherwise(plain)


_LONG_MIN, _LONG_MAX = -(2 ** 63), 2 ** 63 - 1


def _in_long(n: Column) -> Column:
    """True iff the exact value fits signed 64-bit (checked-i64 bound)."""
    return n.between(F.lit(_LONG_MIN).cast(T.DECIMAL_T),
                     F.lit(_LONG_MAX).cast(T.DECIMAL_T))


def arith_typed(op: str, a: Column, b: Column, nta, ntb) -> Column:
    """Arithmetic with static numeric-subtype hints ('integer', 'decimal',
    'double', or None).  The slim paths avoid building both promotion
    branches — the full kernel's struct-when duplication otherwise blows
    codegen past 64 KB for chained arithmetic."""
    if nta == "double" or ntb == "double":
        da, db_ = as_double(a), as_double(b)
        if op == "+":
            d = da + db_
        elif op == "-":
            d = da - db_
        elif op == "*":
            d = da * db_
        else:
            inf, nan = F.lit(float("inf")), F.lit(float("nan"))
            d = (F.when(db_ != 0.0, da / db_)
                 .when(F.isnan(da) | F.isnan(db_), nan)
                 .when(da > 0, inf).when(da < 0, -inf).otherwise(nan))
        # XPath promotion: double wins, else float + (float|exact) stays
        # FLOAT (ntype_of lumps float under 'double', so decide from the
        # runtime datatypes — one comparison per operand)
        has_dbl = (a["datatype"] == T.XSD_DOUBLE) \
            | (b["datatype"] == T.XSD_DOUBLE)
        has_flt = (a["datatype"] == T.XSD_FLOAT) \
            | (b["datatype"] == T.XSD_FLOAT)
        dt = F.when(~has_dbl & has_flt, T._dtlit(T.XSD_FLOAT)) \
              .otherwise(T._dtlit(T.XSD_DOUBLE))
        out = T.term_struct(T.KIND_LITERAL, T.double_lex(d),
                            datatype=dt, dbl=d)
        return F.when(d.isNotNull(), out).otherwise(_null_term())
    exact = ("integer", "decimal")
    if nta in exact and ntb in exact:
        na, nb = a["num"], b["num"]
        if op == "+":
            n = na + nb
        elif op == "-":
            n = na - nb
        elif op == "*":
            n = na * nb
        else:
            n = na / nb  # /0 → NULL = error ✓
        n = n.cast(T.DECIMAL_T)
        if nta == ntb == "integer" and op != "/":
            # checked 64-bit integer semantics (reference: oxsdatatypes
            # Integer = i64 with checked_add/sub/mul — overflow is an
            # evaluation error, never a wrap)
            out = T.term_struct(T.KIND_LITERAL, n.cast("long").cast("string"),
                                datatype=T._dtlit(T.XSD_INTEGER), num=n)
            return F.when(n.isNotNull() & _in_long(n), out) \
                    .otherwise(_null_term())
        else:
            out = T.term_struct(T.KIND_LITERAL, _decimal_lex(n),
                                datatype=T._dtlit(T.XSD_DECIMAL), num=n)
        return F.when(n.isNotNull(), out).otherwise(_null_term())
    return arith(op, a, b)


# ---------------------------------------------------------------------------
# durations (reference: lib/oxsdatatypes/src/duration.rs — a duration is a
# (months, seconds) pair; num carries months, dbl carries seconds)
# ---------------------------------------------------------------------------

def _is_dur(t: Column) -> Column:
    return ((t["kind"] == T.KIND_LITERAL)
            & t["datatype"].isin(*T.DURATION_DATATYPES)
            & t["num"].isNotNull() & t["dbl"].isNotNull())


def _is_dt_val(t: Column) -> Column:
    return ((t["kind"] == T.KIND_LITERAL)
            & t["datatype"].isin(T.XSD_DATETIME, T.XSD_DATE, T.XSD_TIME)
            & t["ts"].isNotNull())


def duration_term(months: Column, seconds: Column) -> Column:
    """(months, seconds) → canonical duration literal.  The datatype
    narrows like the reference does: no seconds → yearMonthDuration, no
    months → dayTimeDuration, else xsd:duration."""
    m = months.cast("long")
    s = seconds.cast(T.DECIMAL_T)
    neg = (m < 0) | (s < 0)
    am, as_ = F.abs(m), F.abs(s)
    y, mo = F.floor(am / 12).cast("long"), am % 12
    d = F.floor(as_ / 86400).cast("long")
    h = F.floor(as_ % 86400 / 3600).cast("long")
    mi = F.floor(as_ % 3600 / 60).cast("long")
    sec = (as_ % 60).cast(T.DECIMAL_T)
    part = lambda v, suf: F.when(v > 0, F.concat(v.cast("string"),
                                                 F.lit(suf))).otherwise(F.lit(""))
    # NB expression-size discipline: every composite below is referenced
    # exactly ONCE — emptiness tests use shallow re-derivations (sums),
    # never `when(x != "", x)`, which doubles the tree per nesting level
    # and blew whole-stage codegen past the 64 KB method limit
    has_time = (as_ % 86400) > 0
    has_any = (am > 0) | (as_ > 0)
    tpart = F.concat(part(h, "H"), part(mi, "M"),
                     F.when(sec > 0, F.concat(_decimal_lex(sec), F.lit("S")))
                      .otherwise(F.lit("")))
    body = F.concat(part(y, "Y"), part(mo, "M"), part(d, "D"),
                    F.when(has_time, F.concat(F.lit("T"), tpart))
                     .otherwise(F.lit("")))
    dt = (F.when((s == 0) & (m != 0), T._dtlit(T.XSD_YM_DURATION))
           .when(m == 0, T._dtlit(T.XSD_DT_DURATION))
           .otherwise(T._dtlit(T.XSD_DURATION)))
    lex = F.concat(F.when(neg, F.lit("-")).otherwise(F.lit("")), F.lit("P"),
                   F.when(has_any, body).otherwise(F.lit("T0S")))
    return T.term_struct(T.KIND_LITERAL, lex, datatype=dt,
                         num=m.cast(T.DECIMAL_T), dbl=s.cast("double"))


def _dt_shift(t: Column, dur: Column, sign: int) -> Column:
    """dateTime/date/time ± duration, PRESERVING the temporal subtype
    (XPath op:add-…-to-date returns xs:date of the resulting instant,
    op:add-…-to-time wraps on the clock): year-month part via calendar
    interval, day-time part via exact seconds."""
    months = (F.lit(sign) * dur["num"]).cast("int")
    secs = (F.lit(sign) * dur["dbl"]).cast("decimal(24,6)")
    ts2 = (t["ts"] + F.make_ym_interval(F.lit(0), months)
           + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), secs))
    date_ts = F.date_trunc("DAY", ts2)
    # time payloads are epoch-day anchored (see typed_lit): re-anchor
    time_ts = F.to_timestamp(F.concat(
        F.lit("1970-01-01 "),
        F.substring_index(ts2.cast("string"), " ", -1)))
    return (
        F.when(t["datatype"] == T.XSD_DATE,
               T.term_struct(T.KIND_LITERAL,
                             F.substring_index(date_ts.cast("string"),
                                               " ", 1),
                             datatype=T._dtlit(T.XSD_DATE), ts=date_ts,
                             tz_min=t["tz_min"]))
        .when(t["datatype"] == T.XSD_TIME,
              # XPath defines only op:add-dayTimeDuration-to-time — a
              # year-month component on a time is an error (NULL here)
              F.when(months == 0,
                     T.term_struct(T.KIND_LITERAL,
                                   F.substring_index(time_ts.cast("string"),
                                                     " ", -1),
                                   datatype=T._dtlit(T.XSD_TIME),
                                   ts=time_ts, tz_min=t["tz_min"])))
        .otherwise(T.datetime_lit(ts2, tz_min=t["tz_min"])))


def _dt_diff(a: Column, b: Column) -> Column:
    """dateTime - dateTime → dayTimeDuration (op:subtract-dateTimes)."""
    secs = ((F.unix_micros(a["ts"]) - F.unix_micros(b["ts"]))
            .cast(T.DECIMAL_T) / 1000000)
    return duration_term(F.lit(0), secs)


def _dur_arith(op: str, a: Column, b: Column) -> Column:
    sign = 1 if op == "+" else -1
    m = a["num"] + F.lit(sign) * b["num"]
    s = a["dbl"] + F.lit(sign) * b["dbl"]
    # components of one duration must share a sign (XSD restriction);
    # mixed-sign results are errors
    ok = (m == 0) | (s == 0.0) | (F.signum(m.cast("double")) == F.signum(s))
    return F.when(ok, duration_term(m, s)) \
            .otherwise(_null_term())


def arith(op: str, a: Column, b: Column) -> Column:
    """``op`` in ``+ - * /``; returns a TERM struct (NULL on error)."""
    ca, cb = vclass(a), vclass(b)
    valid = (ca == VC_NUMERIC) & (cb == VC_NUMERIC)

    use_double = a["dbl"].isNotNull() | b["dbl"].isNotNull()
    da, db_ = as_double(a), as_double(b)
    if op == "+":
        dres, nres = da + db_, a["num"] + b["num"]
    elif op == "-":
        dres, nres = da - db_, a["num"] - b["num"]
    elif op == "*":
        dres, nres = da * db_, a["num"] * b["num"]
    elif op == "/":
        # XSD: double/float division by zero yields ±Inf/NaN; Spark yields
        # NULL, so emulate IEEE explicitly.
        inf = F.lit(float("inf"))
        nan = F.lit(float("nan"))
        dres = (
            F.when(db_ != 0.0, da / db_)
            .when(F.isnan(da) | F.isnan(db_), nan)
            .when(da > 0, inf).when(da < 0, -inf).otherwise(nan)
        )
        nres = (a["num"] / b["num"]).cast(T.DECIMAL_T)  # /0 → NULL = error ✓
    else:  # pragma: no cover
        raise ValueError(op)

    both_integer = (a["datatype"].isin(*T.INTEGER_DATATYPES)
                    & b["datatype"].isin(*T.INTEGER_DATATYPES))
    # result datatype per the promotion lattice
    dt_exact = F.when(both_integer & F.lit(op != "/"), T._dtlit(T.XSD_INTEGER)) \
                .otherwise(T._dtlit(T.XSD_DECIMAL))
    has_float = (a["datatype"] == T.XSD_FLOAT) | (b["datatype"] == T.XSD_FLOAT)
    only_float = has_float & ~((a["datatype"] == T.XSD_DOUBLE)
                               | (b["datatype"] == T.XSD_DOUBLE))
    dt_dbl = F.when(only_float, T._dtlit(T.XSD_FLOAT)).otherwise(T._dtlit(T.XSD_DOUBLE))

    nres = nres.cast(T.DECIMAL_T)
    exact_term = T.term_struct(
        T.KIND_LITERAL,
        F.when(dt_exact == T.XSD_INTEGER, nres.cast("long").cast("string"))
         .otherwise(_decimal_lex(nres)),
        datatype=dt_exact, num=nres)
    dbl_term = T.term_struct(T.KIND_LITERAL, T.double_lex(dres),
                             datatype=dt_dbl, dbl=dres)

    result = F.when(use_double, dbl_term).otherwise(exact_term)
    # error (NULL) when: non-numeric operand, exact-path overflow/div0,
    # or an integer result outside signed-64 range (reference:
    # oxsdatatypes checked i64 — overflow errors, never wraps)
    payload_ok = F.when(use_double, dres.isNotNull()) \
                  .otherwise(nres.isNotNull()
                             & ((dt_exact != T.XSD_INTEGER) | _in_long(nres)))
    out = F.when(valid & payload_ok, result)
    # temporal arithmetic (XPath operator mapping; reference duration.rs):
    # dateTime ± duration, duration ± duration, dateTime - dateTime
    if op in ("+", "-"):
        sign = 1 if op == "+" else -1
        out = out.when(_is_dt_val(a) & _is_dur(b), _dt_shift(a, b, sign))
        out = out.when(_is_dur(a) & _is_dur(b), _dur_arith(op, a, b))
        if op == "+":
            out = out.when(_is_dur(a) & _is_dt_val(b), _dt_shift(b, a, 1))
        else:
            out = out.when(_is_dt_val(a) & _is_dt_val(b), _dt_diff(a, b))
    return out.otherwise(_null_term())


def neg(a: Column) -> Column:
    """Unary minus."""
    zero = T.int_lit(F.lit(0))
    return arith("-", zero, a)
