"""Self-differential check (SURVEY.md §5.2.3): every query must produce
the same multiset with compiler optimizations disabled (no join
reordering, no star-collapse, no filter placement differences).

Mirrors the reference's ``fuzz_targets/sparql_eval`` differential oracle
(optimized vs unoptimized evaluation must agree).
"""

import pytest
from pyspark.sql import functions as F

from oxigraph_spark.sources.direct_mapping import DirectMappingSource
from oxigraph_spark.algebra.parser import parse_query
from oxigraph_spark.plans.compiler import Compiler
from oxigraph_spark.model import terms as T

QUERIES = [
    """PREFIX c: <urn:g:customer#>
       SELECT ?name ?bal WHERE {
         ?c c:c_name ?name ; c:c_acctbal ?bal .
         FILTER(?bal > 5000.0 && CONTAINS(?name, "1")) }""",
    """PREFIX c: <urn:g:customer#> PREFIX n: <urn:g:nation#>
       SELECT ?name ?nn WHERE {
         ?c c:c_name ?name ; c:ref_nation ?n .
         ?n n:n_name ?nn .
         OPTIONAL { ?c c:c_acctbal ?b . FILTER(?b < 0.0) } }""",
    """PREFIX c: <urn:g:customer#>
       SELECT ?seg (COUNT(*) AS ?cnt) (MAX(?b) AS ?mx) WHERE {
         ?c c:c_mktsegment ?seg ; c:c_acctbal ?b .
       } GROUP BY ?seg""",
    """PREFIX n: <urn:g:nation#>
       SELECT ?x WHERE { <urn:g:nation/3> (n:ref_region|^n:ref_region)+ ?x }""",
]


def _multiset(df):
    cols = sorted(df.columns)
    keyed = df.select(*[T.term_key(df[c]).cast("string").alias(c)
                        for c in cols])
    out = {}
    for r in keyed.collect():
        k = tuple(r)
        out[k] = out.get(k, 0) + 1
    return out


@pytest.mark.parametrize("q", QUERIES)
def test_optimized_matches_unoptimized(spark, sf_dir, q):
    src = DirectMappingSource(spark, sf_dir)
    ast = parse_query(q)
    opt = Compiler(spark, src, optimize=True).compile_query(ast)
    raw = Compiler(spark, src, optimize=False).compile_query(ast)
    assert _multiset(opt) == _multiset(raw)
