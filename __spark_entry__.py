"""Driver contract for the spark-graft builder (PySpark target).

The engine lives in ``oxigraph_spark``: a SPARQL 1.1 query engine over a
quads DataFrame (relational parquet direct-mapped to RDF, FIXTURES.md §3)
plus LLM-data-pipeline extension operators (SURVEY.md §2.11).

Every ``queries()`` entry names an operator from SURVEY.md §2 and has a
DuckDB oracle in ``oracle_sql()`` unless marked rows-only.  SPARQL entries
run the full parser→algebra→compiler pipeline; result TERM structs are
projected to native columns whose names/types match the oracle exactly.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_STORES: dict = {}


def _store(spark: SparkSession, sf_dir: str):
    from oxigraph_spark.session import configure
    from oxigraph_spark.store import Store
    key = (id(spark), sf_dir)
    if key not in _STORES:
        configure(spark)
        _STORES[key] = Store.from_tables(spark, sf_dir)
    return _STORES[key]


def _q(spark: SparkSession, sf_dir: str, sparql: str, spec: dict) -> DataFrame:
    from oxigraph_spark.store import to_native
    return to_native(_store(spark, sf_dir).query(sparql), spec)


PFX = """
PREFIX c: <urn:g:customer#>
PREFIX n: <urn:g:nation#>
PREFIX r: <urn:g:region#>
PREFIX o: <urn:g:orders#>
PREFIX l: <urn:g:lineitem#>
PREFIX s: <urn:g:supplier#>
PREFIX p: <urn:g:part#>
PREFIX e: <urn:g:events#>
PREFIX d: <urn:g:documents#>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
"""


# ---------------------------------------------------------------------------
# flagship (driver smoke at sf0.001)
# ---------------------------------------------------------------------------

FLAGSHIP = PFX + """
SELECT ?rf ?ls (SUM(?qty) AS ?sum_qty) (COUNT(*) AS ?cnt)
WHERE {
  ?li l:l_returnflag ?rf ; l:l_linestatus ?ls ; l:l_quantity ?qty ;
      l:l_shipdate ?d .
  FILTER(?d <= "1997-09-02T00:00:00"^^xsd:dateTime)
}
GROUP BY ?rf ?ls
ORDER BY ?rf ?ls
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q(spark, "/root/testdata/sf0.001", FLAGSHIP,
              {"rf": "str", "ls": "str", "sum_qty": "double", "cnt": "long"})


# ---------------------------------------------------------------------------
# per-operator queries (SURVEY.md §2) — SPARQL engine entries
# ---------------------------------------------------------------------------

def q_s1_quad_scan(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT ?s ?name WHERE { ?s c:c_name ?name }
    """, {"s": "str", "name": "str"})


def q_p2_filter(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT ?name ?bal WHERE {
          ?c c:c_name ?name ; c:c_acctbal ?bal .
          FILTER(?bal > 5000.0 && !(?name = "nobody"))
        }
    """, {"name": "str", "bal": "double"})


def q_p3_bind(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT ?ok ?net WHERE {
          ?li l:l_orderkey ?ok ; l:l_extendedprice ?ep ; l:l_discount ?disc .
          BIND(?ep * (1.0 - ?disc) AS ?net0)
          BIND(xsd:double(?net0) AS ?net)
        }
    """, {"ok": "long", "net": "double"})


def q_p4_values(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT ?rname ?nname WHERE {
          VALUES ?rname { "ASIA" "AMERICA" }
          ?r r:r_name ?rname .
          ?n n:ref_region ?r ; n:n_name ?nname .
        }
    """, {"rname": "str", "nname": "str"})


def q_j1_bgp_join(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT ?cname ?nname ?rname WHERE {
          ?c c:c_name ?cname ; c:ref_nation ?n .
          ?n n:n_name ?nname ; n:ref_region ?r .
          ?r r:r_name ?rname .
          FILTER(STRSTARTS(?rname, "A"))
        }
    """, {"cname": "str", "nname": "str", "rname": "str"})


def q_j4_optional(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT ?nname (COUNT(?c) AS ?ncust) WHERE {
          ?n n:n_name ?nname .
          OPTIONAL { ?c c:ref_nation ?n }
        } GROUP BY ?nname
    """, {"nname": "str", "ncust": "long"})


def q_j5_minus(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT ?name WHERE {
          ?c c:c_name ?name .
          MINUS { ?o o:ref_customer ?c ; o:o_totalprice ?tp .
                  ?c c:c_name ?name . FILTER(?tp > 400000.0) }
        }
    """, {"name": "str"})


def q_j6_not_exists(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT ?name WHERE {
          ?c c:c_name ?name .
          FILTER NOT EXISTS { ?o o:ref_customer ?c ; o:o_totalprice ?tp .
                              FILTER(?tp > 400000.0) }
        }
    """, {"name": "str"})


def q_j6_exists(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT ?name WHERE {
          ?s s:s_name ?name ; s:ref_nation ?n .
          FILTER EXISTS { ?c c:ref_nation ?n . ?c c:c_acctbal ?b . FILTER(?b > 9000.0) }
        }
    """, {"name": "str"})


def q_a_aggregates(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT ?prio (COUNT(*) AS ?cnt) (COUNT(DISTINCT ?cust) AS ?ncust)
               (MIN(?tp) AS ?min_tp) (MAX(?tp) AS ?max_tp)
        WHERE { ?o o:o_orderpriority ?prio ; o:o_totalprice ?tp ;
                   o:ref_customer ?cust . }
        GROUP BY ?prio
    """, {"prio": "str", "cnt": "long", "ncust": "long",
          "min_tp": "double", "max_tp": "double"})


def q_a6_group_concat(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT ?r (GROUP_CONCAT(?nname; SEPARATOR=",") AS ?nations) WHERE {
          ?n n:ref_region ?reg ; n:n_name ?nname .
          ?reg r:r_name ?r .
        } GROUP BY ?r
    """, {"r": "str", "nations": "str"})


def q_o1_order_slice(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT ?ok ?tp WHERE {
          ?o o:o_orderkey ?ok ; o:o_totalprice ?tp .
        } ORDER BY DESC(?tp) ?ok LIMIT 20 OFFSET 5
    """, {"ok": "long", "tp": "double"})


def q_o4_distinct(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT DISTINCT ?seg WHERE { ?c c:c_mktsegment ?seg }
    """, {"seg": "str"})


def q_o6_union(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT ?name ?kind WHERE {
          { ?s s:s_name ?name . BIND("supplier" AS ?kind) }
          UNION
          { ?c c:c_name ?name . ?c c:c_acctbal ?b . FILTER(?b < 0.0)
            BIND("debtor" AS ?kind) }
        }
    """, {"name": "str", "kind": "str"})


def q_pp2_inverse(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT ?nname ?cname WHERE {
          ?n n:n_name ?nname .
          ?n ^c:ref_nation ?c .
          ?c c:c_name ?cname .
          FILTER(STRSTARTS(?nname, "NATION_1"))
        }
    """, {"nname": "str", "cname": "str"})


def q_pp3_sequence(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT ?nname (COUNT(*) AS ?cnt) WHERE {
          ?o (o:ref_customer/c:ref_nation) ?n .
          ?n n:n_name ?nname .
        } GROUP BY ?nname
    """, {"nname": "str", "cnt": "long"})


def q_pp4_alternative(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT ?s ?nat WHERE {
          ?s (c:ref_nation|s:ref_nation) ?n .
          ?n n:n_name ?nat .
        }
    """, {"s": "str", "nat": "str"})


def q_pp6_plus(spark, sf):
    # multi-hop closure orders→customer→nation→region over an alternative
    # edge set: a real 3-iteration fixpoint
    return _q(spark, sf, PFX + """
        SELECT ?x (COUNT(*) AS ?cnt) WHERE {
          ?o o:o_orderkey ?ok .
          FILTER(?ok < 50)
          ?o (o:ref_customer|c:ref_nation|n:ref_region)+ ?x .
        } GROUP BY ?x
    """, {"x": "str", "cnt": "long"})


def q_pp7_star_seeded(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT ?x WHERE {
          <urn:g:customer/1> (c:ref_nation|n:ref_region)* ?x .
        }
    """, {"x": "str"})


def q_q2_ask(spark, sf):
    store = _store(spark, sf)
    return store.query(PFX + """
        ASK { ?c c:c_acctbal ?b . FILTER(?b > 9000.0) }
    """).select(F.col("ask"))


def q_q3_construct(spark, sf):
    df = _store(spark, sf).query(PFX + """
        CONSTRUCT { ?n <urn:g:inRegion> ?rname }
        WHERE { ?n n:ref_region ?r . ?r r:r_name ?rname . }
    """)
    return df.select(F.col("s.lex").alias("subj"), F.col("p.lex").alias("pred"),
                     F.col("o.lex").alias("obj"))


def q_sub_select(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT ?nname ?maxbal WHERE {
          { SELECT ?n (MAX(?b) AS ?maxbal) WHERE {
              ?c c:ref_nation ?n ; c:c_acctbal ?b . } GROUP BY ?n }
          ?n n:n_name ?nname .
          FILTER(?maxbal > 8000.0)
        }
    """, {"nname": "str", "maxbal": "double"})


def q_f_strings(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT ?name ?up ?sub ?len ?rep WHERE {
          ?c c:c_name ?name .
          BIND(UCASE(?name) AS ?up)
          BIND(SUBSTR(?name, 1, 8) AS ?sub)
          BIND(xsd:integer(STRLEN(?name)) AS ?len)
          BIND(REPLACE(?name, "Customer", "C") AS ?rep)
          FILTER(CONTAINS(?name, "1"))
        }
    """, {"name": "str", "up": "str", "sub": "str", "len": "long", "rep": "str"})


def q_f_numeric(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT ?name ?fl ?ce ?ab ?mix WHERE {
          ?c c:c_name ?name ; c:c_acctbal ?b .
          BIND(xsd:double(FLOOR(?b)) AS ?fl)
          BIND(xsd:double(CEIL(?b)) AS ?ce)
          BIND(xsd:double(ABS(?b)) AS ?ab)
          BIND(xsd:double(?b * 2.0 + 1.0) AS ?mix)
        }
    """, {"name": "str", "fl": "double", "ce": "double", "ab": "double",
          "mix": "double"})


def q_f_temporal(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT ?y ?m (COUNT(*) AS ?cnt) WHERE {
          ?o o:o_orderdate ?d .
          BIND(YEAR(?d) AS ?y) BIND(MONTH(?d) AS ?m)
        } GROUP BY ?y ?m
    """, {"y": "long", "m": "long", "cnt": "long"})


def q_f_hash(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT ?name ?h ?h2 WHERE {
          ?r r:r_name ?name .
          BIND(MD5(?name) AS ?h) BIND(SHA256(?name) AS ?h2)
        }
    """, {"name": "str", "h": "str", "h2": "str"})


def q_f_conditional(spark, sf):
    return _q(spark, sf, PFX + """
        SELECT ?name ?cls WHERE {
          ?c c:c_name ?name ; c:c_acctbal ?b .
          BIND(IF(?b > 5000.0, "rich", IF(?b < 0.0, "debt", "mid")) AS ?cls)
        }
    """, {"name": "str", "cls": "str"})


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB) — same column names & types
# ---------------------------------------------------------------------------

_ORACLES: dict[str, str] = {
    "flagship_q1": """
        SELECT l_returnflag rf, l_linestatus ls, SUM(l_quantity) sum_qty,
               COUNT(*) cnt
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1997-09-02'
        GROUP BY 1, 2""",
    "S1_quad_scan": """
        SELECT 'urn:g:customer/' || c_custkey AS s, c_name AS name
        FROM customer""",
    "P2_filter": """
        SELECT c_name AS name, c_acctbal AS bal FROM customer
        WHERE c_acctbal > 5000.0""",
    "P3_bind": """
        SELECT l_orderkey AS ok, l_extendedprice * (1.0 - l_discount) AS net
        FROM lineitem""",
    "P4_values": """
        SELECT r_name AS rname, n_name AS nname
        FROM region JOIN nation ON n_regionkey = r_regionkey
        WHERE r_name IN ('ASIA', 'AMERICA')""",
    "J1_bgp_join": """
        SELECT c_name AS cname, n_name AS nname, r_name AS rname
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name LIKE 'A%'""",
    "J4_optional": """
        SELECT n_name AS nname, COUNT(c_custkey) AS ncust
        FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        GROUP BY 1""",
    "J5_minus": """
        SELECT c_name AS name FROM customer
        WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)""",
    "J6_not_exists": """
        SELECT c_name AS name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 400000.0)""",
    "J6_exists": """
        SELECT s_name AS name FROM supplier s
        WHERE EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_nationkey = s.s_nationkey AND c.c_acctbal > 9000.0)""",
    "A_aggregates": """
        SELECT o_orderpriority AS prio, COUNT(*) AS cnt,
               COUNT(DISTINCT o_custkey) AS ncust,
               MIN(o_totalprice) AS min_tp, MAX(o_totalprice) AS max_tp
        FROM orders GROUP BY 1""",
    "A6_group_concat": """
        SELECT r_name AS r, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
        FROM region JOIN nation ON n_regionkey = r_regionkey GROUP BY 1""",
    "O1_order_slice": """
        SELECT o_orderkey AS ok, o_totalprice AS tp FROM orders
        ORDER BY tp DESC, ok LIMIT 20 OFFSET 5""",
    "O4_distinct": """
        SELECT DISTINCT c_mktsegment AS seg FROM customer""",
    "O6_union": """
        SELECT s_name AS name, 'supplier' AS kind FROM supplier
        UNION ALL
        SELECT c_name AS name, 'debtor' AS kind FROM customer WHERE c_acctbal < 0.0""",
    "PP2_inverse": """
        SELECT n_name AS nname, c_name AS cname
        FROM nation JOIN customer ON c_nationkey = n_nationkey
        WHERE starts_with(n_name, 'NATION_1')""",
    "PP3_sequence": """
        SELECT n_name AS nname, COUNT(*) AS cnt
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey GROUP BY 1""",
    "PP4_alternative": """
        SELECT 'urn:g:customer/' || c_custkey AS s, n_name AS nat
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        UNION ALL
        SELECT 'urn:g:supplier/' || s_suppkey AS s, n_name AS nat
        FROM supplier JOIN nation ON s_nationkey = n_nationkey""",
    "PP6_plus": """
        WITH RECURSIVE edges(src, dst) AS (
          SELECT 'urn:g:orders/' || o_orderkey, 'urn:g:customer/' || o_custkey
          FROM orders
          UNION ALL
          SELECT 'urn:g:customer/' || c_custkey, 'urn:g:nation/' || c_nationkey
          FROM customer
          UNION ALL
          SELECT 'urn:g:nation/' || n_nationkey, 'urn:g:region/' || n_regionkey
          FROM nation
        ), reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        )
        SELECT r.dst AS x, COUNT(*) AS cnt
        FROM reach r JOIN orders o ON r.src = 'urn:g:orders/' || o.o_orderkey
        WHERE o.o_orderkey < 50
        GROUP BY 1""",
    "PP7_star_seeded": """
        WITH RECURSIVE edges(src, dst) AS (
          SELECT 'urn:g:customer/' || c_custkey, 'urn:g:nation/' || c_nationkey
          FROM customer
          UNION ALL
          SELECT 'urn:g:nation/' || n_nationkey, 'urn:g:region/' || n_regionkey
          FROM nation
        ), reach(dst) AS (
          SELECT 'urn:g:customer/1'
          UNION
          SELECT e.dst FROM reach r JOIN edges e ON r.dst = e.src
        )
        SELECT dst AS x FROM reach""",
    "Q2_ask": """
        SELECT DISTINCT TRUE AS ask FROM customer WHERE c_acctbal > 9000.0""",
    "Q3_construct": """
        SELECT DISTINCT 'urn:g:nation/' || n_nationkey AS subj,
               'urn:g:inRegion' AS pred, r_name AS obj
        FROM nation JOIN region ON n_regionkey = r_regionkey""",
    "SUB_select": """
        SELECT n_name AS nname, maxbal FROM (
          SELECT c_nationkey, MAX(c_acctbal) AS maxbal FROM customer GROUP BY 1
        ) m JOIN nation ON n_nationkey = c_nationkey
        WHERE maxbal > 8000.0""",
    "F_strings": """
        SELECT c_name AS name, UPPER(c_name) AS up, SUBSTRING(c_name, 1, 8) AS sub,
               LENGTH(c_name) AS len, REPLACE(c_name, 'Customer', 'C') AS rep
        FROM customer WHERE c_name LIKE '%1%'""",
    "F_numeric": """
        SELECT c_name AS name, FLOOR(c_acctbal) AS fl, CEIL(c_acctbal) AS ce,
               ABS(c_acctbal) AS ab, c_acctbal * 2.0 + 1.0 AS mix
        FROM customer""",
    "F_temporal": """
        SELECT YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m, COUNT(*) AS cnt
        FROM orders GROUP BY 1, 2""",
    "F_hash": """
        SELECT r_name AS name, MD5(r_name) AS h, SHA256(r_name) AS h2
        FROM region""",
    "F_conditional": """
        SELECT c_name AS name,
               CASE WHEN c_acctbal > 5000.0 THEN 'rich'
                    WHEN c_acctbal < 0.0 THEN 'debt' ELSE 'mid' END AS cls
        FROM customer""",
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "flagship_q1": lambda spark, sf: _q(
            spark, sf, FLAGSHIP,
            {"rf": "str", "ls": "str", "sum_qty": "double", "cnt": "long"}),
        "S1_quad_scan": q_s1_quad_scan,
        "P2_filter": q_p2_filter,
        "P3_bind": q_p3_bind,
        "P4_values": q_p4_values,
        "J1_bgp_join": q_j1_bgp_join,
        "J4_optional": q_j4_optional,
        "J5_minus": q_j5_minus,
        "J6_not_exists": q_j6_not_exists,
        "J6_exists": q_j6_exists,
        "A_aggregates": q_a_aggregates,
        "A6_group_concat": q_a6_group_concat,
        "O1_order_slice": q_o1_order_slice,
        "O4_distinct": q_o4_distinct,
        "O6_union": q_o6_union,
        "PP2_inverse": q_pp2_inverse,
        "PP3_sequence": q_pp3_sequence,
        "PP4_alternative": q_pp4_alternative,
        "PP6_plus": q_pp6_plus,
        "PP7_star_seeded": q_pp7_star_seeded,
        "Q2_ask": q_q2_ask,
        "Q3_construct": q_q3_construct,
        "SUB_select": q_sub_select,
        "F_strings": q_f_strings,
        "F_numeric": q_f_numeric,
        "F_temporal": q_f_temporal,
        "F_hash": q_f_hash,
        "F_conditional": q_f_conditional,
    }


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
