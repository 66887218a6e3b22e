"""Round-10 focused regressions.

Payload-consistency contract (r10 advisory): the full-row
``dropDuplicates()`` dedups introduced in r9 (``_dedup_det`` and friends)
are equivalent to the old keyed dedups ONLY IF the 5 derived payload
fields (num/dbl/ts/tz_min/bool) are byte-identical for equal identity
4-tuples across every term construction path: scan parsing
(read_ntriples), compiler constants (_const_term_col), and the typed_lit
kernels.  These tests pin that invariant for every literal value class.
"""

import datetime
import decimal
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from oxigraph_spark.algebra import ast as A  # noqa: E402
from oxigraph_spark.model import terms as T  # noqa: E402
from oxigraph_spark.plans.compiler import _const_term_col  # noqa: E402
from oxigraph_spark.sources.ntriples import read_ntriples  # noqa: E402


def _exact(v):
    """Byte-faithful comparison key per payload type: Decimal keeps its
    scale (str('1.000') != str('1')), doubles compare bit-exactly via
    hex, timestamps on the full value."""
    if v is None:
        return None
    if isinstance(v, float):
        return ("dbl", v.hex())
    if isinstance(v, decimal.Decimal):
        return ("num", str(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.isoformat())
    return (type(v).__name__, str(v))


def _row_key(row):
    return tuple(_exact(row[f]) for f in T.TERM_FIELDS)


# every literal value class the payload fields decode: integer,
# decimal (scale!), double (incl. special forms), boolean, dateTime
# with and without timezone, date, time, gYear, string, langString
LITERAL_CASES = [
    ("42", T.XSD_INTEGER, None),
    ("-7", T.XSD + "int", None),
    ("3.140", T.XSD_DECIMAL, None),  # trailing zero: scale must survive
    ("2.5E1", T.XSD_DOUBLE, None),
    ("NaN", T.XSD_DOUBLE, None),
    ("INF", T.XSD_DOUBLE, None),
    ("1.5", T.XSD_FLOAT, None),
    ("true", T.XSD_BOOLEAN, None),
    ("0", T.XSD_BOOLEAN, None),
    ("2024-03-01T12:30:45", T.XSD_DATETIME, None),
    ("2024-03-01T12:30:45Z", T.XSD_DATETIME, None),
    ("2024-03-01T12:30:45+05:30", T.XSD_DATETIME, None),
    ("2024-03-01T12:30:45.123456-08:00", T.XSD_DATETIME, None),
    ("2024-03-01", T.XSD_DATE, None),
    ("12:30:45", T.XSD_TIME, None),
    ("1999", T.XSD_GYEAR, None),
    ("plain string", None, None),
    ("bonjour", None, "fr"),
]


def _nt_literal(lex, datatype, lang):
    esc = lex.replace("\\", "\\\\").replace('"', '\\"')
    if lang is not None:
        return f'"{esc}"@{lang}'
    if datatype is None:
        return f'"{esc}"'
    return f'"{esc}"^^<{datatype}>'


@pytest.fixture(scope="module")
def parsed_terms(spark, tmp_path_factory):
    """One read_ntriples pass over every case → {case index: o-row}."""
    p = tmp_path_factory.mktemp("r10") / "terms.nt"
    lines = [
        f"<urn:case:{i}> <urn:p> {_nt_literal(lex, dt, lang)} ."
        for i, (lex, dt, lang) in enumerate(LITERAL_CASES)
    ]
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    df = read_ntriples(spark, str(p))
    rows = df.select(F.col("s.lex").alias("i"), "o").collect()
    return {int(r["i"].rsplit(":", 1)[1]): r["o"] for r in rows}


@pytest.mark.parametrize("idx", range(len(LITERAL_CASES)))
def test_term_payload_consistency(spark, parsed_terms, idx):
    lex, dt, lang = LITERAL_CASES[idx]

    scan_key = _row_key(parsed_terms[idx])

    const_col = _const_term_col(A.Literal(lex, datatype=dt, lang=lang))
    const_key = _row_key(
        spark.range(1).select(const_col.alias("t")).first()["t"])

    if lang is not None:
        kernel_col = T.lang_lit(F.lit(lex), F.lit(lang))
    else:
        kernel_col = T.typed_lit(F.lit(lex), dt or T.XSD_STRING)
    kernel_key = _row_key(
        spark.range(1).select(kernel_col.alias("t")).first()["t"])

    assert const_key == scan_key, (
        f"const vs scan diverge for {LITERAL_CASES[idx]}:\n"
        f"  const={const_key}\n  scan={scan_key}")
    assert kernel_key == scan_key, (
        f"kernel vs scan diverge for {LITERAL_CASES[idx]}:\n"
        f"  kernel={kernel_key}\n  scan={scan_key}")


def test_term_payload_consistency_parquet_roundtrip(spark, parsed_terms,
                                                    tmp_path):
    """Payload fields must also survive a parquet round-trip unchanged
    (the persisted-index / checkpoint paths re-read term structs)."""
    import pyspark.sql.types as PT

    rows = [(i, parsed_terms[i]) for i in sorted(parsed_terms)]
    schema = PT.StructType([
        PT.StructField("i", PT.IntegerType()),
        PT.StructField("t", T.TERM_SCHEMA),
    ])
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "terms.parquet")
    df.write.mode("overwrite").parquet(out)
    back = {r["i"]: r["t"] for r in spark.read.parquet(out).collect()}
    for i, t in rows:
        assert _row_key(back[i]) == _row_key(t), f"case {i} changed"
