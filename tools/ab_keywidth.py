"""A/B the compact 64-bit dictionary keys against the 128-bit default
(round-4 VERDICT item 2).  Runs the J1 join shape and the PP6 closure
shape at $SPARK_GRAFT_SF_DIR under both widths, n=3 medians, and prints
one JSON line.  Usage: python tools/ab_keywidth.py"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

J1 = """
PREFIX c: <urn:g:customer#>
PREFIX n: <urn:g:nation#>
PREFIX r: <urn:g:region#>
SELECT ?cname ?nname ?rname WHERE {
  ?c c:c_name ?cname ; c:ref_nation ?n .
  ?n n:n_name ?nname ; n:ref_region ?r .
  ?r r:r_name ?rname .
  FILTER(STRSTARTS(?rname, "A"))
}
"""

# the PP6_plus gate query: multi-hop seeded closure over an alternative
# edge set (same text as __spark_entry__.q_pp6_plus)
PP6 = """
PREFIX o: <urn:g:orders#>
PREFIX c: <urn:g:customer#>
PREFIX n: <urn:g:nation#>
SELECT ?x (COUNT(*) AS ?cnt) WHERE {
  ?o o:o_orderkey ?ok .
  FILTER(?ok < 50)
  ?o (o:ref_customer|c:ref_nation|n:ref_region)+ ?x .
} GROUP BY ?x
"""


def main() -> None:
    from oxigraph_spark.session import get_spark
    from oxigraph_spark.store import Store

    spark = get_spark("ab-keywidth")
    spark.range(1000).selectExpr("sum(id)").collect()
    out = {}
    for width in (128, 64):
        st = Store.from_tables(spark, SF_DIR, key_width=width)
        res = {}
        for name, text in (("J1", J1), ("PP6", PP6)):
            walls = []
            for _ in range(N):
                t0 = time.time()
                st.query(text, use_cache=False).count()
                walls.append(time.time() - t0)
            res[name] = round(statistics.median(walls), 3)
            print(f"# kw{width} {name}: median {res[name]}s "
                  f"runs {[round(w, 2) for w in walls]}", file=sys.stderr)
        out[f"kw{width}"] = res
    print(json.dumps({"metric": "keywidth_ab", "sf": SF_DIR, "n": N, **out}))


if __name__ == "__main__":
    main()
