"""M1 smoke: hand-built algebra flagship query vs DuckDB oracle."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

from oxigraph_spark.session import get_spark
from oxigraph_spark.sources.direct_mapping import DirectMappingSource, pred_iri
from oxigraph_spark.algebra import ast as A
from oxigraph_spark.plans.compiler import Compiler

SF = "/root/testdata/sf0.001"

spark = get_spark("m1")
src = DirectMappingSource(spark, SF, tables=["lineitem"])
c = Compiler(spark, src)

li, rf, ls, qty, ep, d = (A.Var(v) for v in ["li", "rf", "ls", "qty", "ep", "d"])
P = lambda col: A.NamedNode(pred_iri("lineitem", col))

bgp = A.BGP((
    A.TriplePattern(li, P("l_returnflag"), rf),
    A.TriplePattern(li, P("l_linestatus"), ls),
    A.TriplePattern(li, P("l_quantity"), qty),
    A.TriplePattern(li, P("l_extendedprice"), ep),
    A.TriplePattern(li, P("l_shipdate"), d),
))
flt = A.Filter(
    A.EOp("<=", (A.EVar("d"), A.ETerm(A.Literal("1997-09-02T00:00:00",
                                                datatype="http://www.w3.org/2001/XMLSchema#dateTime")))),
    bgp)
grp = A.Group(flt, by=(rf, ls), aggregates=(
    (A.Var("sum_qty"), A.AggExpr("SUM", A.EVar("qty"))),
    (A.Var("sum_price"), A.AggExpr("SUM", A.EVar("ep"))),
    (A.Var("avg_qty"), A.AggExpr("AVG", A.EVar("qty"))),
    (A.Var("cnt"), A.AggExpr("COUNT", None)),
))
ob = A.OrderBy(grp, (A.OrderCond(A.EVar("rf")), A.OrderCond(A.EVar("ls"))))
q = A.SelectQuery(A.Project(ob, (rf, ls, A.Var("sum_qty"), A.Var("sum_price"),
                                 A.Var("avg_qty"), A.Var("cnt"))))

df = c.compile_query(q)
out = df.select(
    F.col("rf.lex").alias("rf"), F.col("ls.lex").alias("ls"),
    F.col("sum_qty.dbl").alias("sum_qty"),
    F.round(F.col("sum_price.dbl"), 2).alias("sum_price"),
    F.round(F.col("avg_qty.dbl"), 4).alias("avg_qty"),
    F.col("cnt.num").cast("long").alias("cnt"))
res = [tuple(r) for r in out.collect()]
print("spark:", res)

con = duckdb.connect()
oracle = con.execute(f"""
    SELECT l_returnflag rf, l_linestatus ls, SUM(l_quantity) sum_qty,
           ROUND(SUM(l_extendedprice), 2) sum_price,
           ROUND(AVG(l_quantity), 4) avg_qty, COUNT(*) cnt
    FROM '{SF}/lineitem.parquet'
    WHERE l_shipdate <= TIMESTAMP '1997-09-02'
    GROUP BY 1, 2 ORDER BY 1, 2
""").fetchall()
print("duckdb:", oracle)
assert len(res) == len(oracle), (len(res), len(oracle))
for a, b in zip(res, oracle):
    assert a[0] == b[0] and a[1] == b[1] and a[5] == b[5], (a, b)
    for i in (2, 3, 4):
        assert abs(a[i] - float(b[i])) < 1e-6, (a, b, i)
print("M1 FLAGSHIP MATCHES ORACLE")
