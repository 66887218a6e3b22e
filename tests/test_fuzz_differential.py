"""Randomized self-differential fuzzing (SURVEY.md §5.2.3, the analog of
the reference's ``fuzz_targets/sparql_eval``): SEEDED random queries over
the TPC-H-ish graph vocabulary must produce identical multisets with
compiler optimizations on and off.

Deterministic by construction (fixed seeds, no LIMIT/OFFSET — a limited
subset under ties is legitimately nondeterministic and would flake)."""

import random

import pytest

from oxigraph_spark.algebra.parser import parse_query
from oxigraph_spark.model import terms as T
from oxigraph_spark.plans.compiler import Compiler
from oxigraph_spark.sources.direct_mapping import DirectMappingSource

PFX = """PREFIX c: <urn:g:customer#>
PREFIX n: <urn:g:nation#>
PREFIX o: <urn:g:orders#>
"""

# (qname, kind): num vars get numeric filters, str vars get string fns
CUST_PREDS = [("c:c_name", "str"), ("c:c_acctbal", "num"),
              ("c:c_mktsegment", "str")]
NUM_OPS = ["<", "<=", ">", ">=", "=", "!="]
STR_FNS = ["CONTAINS", "STRSTARTS", "STRENDS"]


def gen_query(seed: int) -> str:
    rng = random.Random(seed)
    pats, filters = [], []
    bound = {}  # var -> kind

    preds = rng.sample(CUST_PREDS, rng.randint(1, 3))
    for i, (p, kind) in enumerate(preds):
        v = f"?v{i}"
        pats.append(f"?s {p} {v} .")
        bound[v] = kind

    if rng.random() < 0.5:  # chain to nation
        pats.append("?s c:ref_nation ?nat .")
        pats.append("?nat n:n_name ?nn .")
        bound["?nn"] = "str"

    for v, kind in list(bound.items()):
        if rng.random() < 0.4:
            if kind == "num":
                filters.append(
                    f"FILTER(?{v[1:]} {rng.choice(NUM_OPS)} "
                    f"{rng.randint(-999, 9999)}.{rng.randint(0, 99):02d})")
            else:
                if rng.random() < 0.5:
                    filters.append(
                        f'FILTER({rng.choice(STR_FNS)}({v}, '
                        f'"{rng.choice("0123456789aeiou")}"))')
                else:
                    filters.append(
                        f"FILTER(STRLEN({v}) {rng.choice(NUM_OPS)} "
                        f"{rng.randint(5, 25)})")

    body = " ".join(pats + filters)
    if rng.random() < 0.35:  # OPTIONAL with its own filter half the time
        opt = "OPTIONAL { ?s c:c_acctbal ?ob "
        if rng.random() < 0.5:
            opt += f". FILTER(?ob > {rng.randint(0, 9000)}.0) "
        opt += "}"
        body += " " + opt
        bound["?ob"] = "num"

    if rng.random() < 0.3:  # UNION of two disjoint filter variants
        left = f'{{ ?s c:c_mktsegment ?seg . FILTER(CONTAINS(?seg, "A")) }}'
        right = f'{{ ?s c:c_mktsegment ?seg . FILTER(CONTAINS(?seg, "U")) }}'
        body += f" {{ {left} UNION {right} }}"
        bound["?seg"] = "str"

    if rng.random() < 0.25:  # MINUS sharing ?s (exercises §8.3 Minus)
        body += (" MINUS { ?s c:c_mktsegment ?mseg . "
                 f'FILTER(STRSTARTS(?mseg, "{rng.choice("ABFHM")}")) }}'
                 .replace("}}", "}"))

    if rng.random() < 0.25:  # correlated (NOT) EXISTS
        neg = "NOT " if rng.random() < 0.5 else ""
        body += (f" FILTER({neg}EXISTS {{ ?s c:ref_nation ?xn . "
                 "?xn n:n_regionkey ?xr . FILTER(?xr >= "
                 f"{rng.randint(0, 4)}) }})")

    if rng.random() < 0.3:  # BIND of a computed var (error→unbound ok)
        body += f" BIND(STRLEN(?v0) + {rng.randint(0, 5)} AS ?bl)"
        bound["?bl"] = "num"

    if rng.random() < 0.25:  # aggregate form replaces plain projection
        return (PFX + "SELECT ?g (COUNT(*) AS ?cnt) (MAX(?m) AS ?mx) "
                "WHERE { ?s c:c_mktsegment ?g ; c:c_acctbal ?m . "
                + " ".join(filters if filters else []) + " } GROUP BY ?g")

    proj = rng.sample(sorted(bound), k=max(1, rng.randint(1, len(bound))))
    distinct = "DISTINCT " if rng.random() < 0.3 else ""
    return PFX + f"SELECT {distinct}{' '.join(proj)} WHERE {{ {body} }}"


def _multiset(df):
    cols = sorted(df.columns)
    keyed = df.select(*[T.term_key(df[c]).cast("string").alias(c)
                        for c in cols])
    out = {}
    for r in keyed.collect():
        k = tuple(r)
        out[k] = out.get(k, 0) + 1
    return out


@pytest.mark.parametrize("seed", range(15))
def test_fuzz_optimized_matches_unoptimized(spark, sf_dir, seed):
    q = gen_query(seed)
    src = DirectMappingSource(spark, sf_dir)
    ast = parse_query(q)
    opt = Compiler(spark, src, optimize=True).compile_query(ast)
    raw = Compiler(spark, src, optimize=False).compile_query(ast)
    assert _multiset(opt) == _multiset(raw), q


@pytest.mark.parametrize("seed", range(15, 25))
def test_fuzz_key64_matches_key128(spark, sf_dir, seed):
    """Round-4 key-width differential: the same seeded random query over
    compact 64-bit dictionary keys must match the 128-bit default —
    continuously exercises the opt-in mode across joins, OPTIONAL,
    UNION, MINUS, EXISTS and aggregates."""
    q = gen_query(seed)
    ast = parse_query(q)
    w128 = DirectMappingSource(spark, sf_dir, key_width=128)
    w64 = DirectMappingSource(spark, sf_dir)  # 64 is the default
    a = Compiler(spark, w128, optimize=True).compile_query(ast)
    b = Compiler(spark, w64, optimize=True).compile_query(ast)
    assert _multiset(a) == _multiset(b), q


# Round-8 (r7 verdict item 7): structurally distinct seeds promoted from
# the 250-seed per-round sweep (tools/fuzz_sweep.py) so regressions in
# swept territory fail CI, not just the one-off sweep.  Signatures:
# 28 COUNT+MAX+FILTER+GROUP BY; 38 EXISTS; 34 EXISTS+OPTIONAL;
# 41 MINUS+OPTIONAL; 29 DISTINCT+UNION; 113 OPTIONAL+UNION.
@pytest.mark.parametrize("seed", [28, 29, 34, 38, 41, 113])
def test_fuzz_sweep_promoted_seeds(spark, sf_dir, seed):
    from oxigraph_spark.algebra.parser import parse_query
    from oxigraph_spark.plans.compiler import Compiler
    from oxigraph_spark.sources.direct_mapping import DirectMappingSource
    src = DirectMappingSource(spark, sf_dir)
    ast = parse_query(gen_query(seed))
    a = _multiset(Compiler(spark, src, optimize=True).compile_query(ast))
    b = _multiset(Compiler(spark, src, optimize=False).compile_query(ast))
    assert a == b
