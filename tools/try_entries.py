"""Run prospective w3c_mini manifest entries (before adding them to
manifest.ttl) with the same comparison logic as tests/test_manifest.py.

Usage: python tools/try_entries.py q1.rq:data.ttl:res.srj [more...]
Each arg is query:data:result (filenames under tests/w3c_mini).
A data or result of '-' means none (negative-syntax / ASK with inline).
Prints PASS/FAIL per entry with the diff on failure.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

HERE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "w3c_mini")


def main() -> None:
    from oxigraph_spark.operators.update import MutableQuadSource
    from oxigraph_spark.session import get_spark
    from oxigraph_spark.sources.rdf_io import load_rdf
    from oxigraph_spark.store import Store
    import test_manifest as tm

    spark = get_spark("try-entries")
    stores: dict[str, Store] = {}
    n_fail = 0
    for arg in sys.argv[1:]:
        qf, df, rf = arg.split(":")
        name = qf.rsplit(".", 1)[0]
        qtext = open(os.path.join(HERE, qf)).read()
        try:
            if rf == "-":  # negative syntax (query or rdf doc)
                try:
                    if qf.endswith((".ttl", ".trig", ".nt", ".nq",
                                    ".rdf", ".xml", ".jsonld")):
                        load_rdf(spark, os.path.join(HERE, qf)).collect()
                    else:
                        from oxigraph_spark.algebra.parser import (
                            parse_query, parse_update)
                        (parse_update if qf.endswith(".ru")
                         else parse_query)(qtext)
                    print(f"FAIL {name}: expected a parse error")
                    n_fail += 1
                except Exception as ex:  # noqa: BLE001
                    print(f"PASS {name} (rejected: {type(ex).__name__}: "
                          f"{str(ex)[:100]})")
                continue
            if df not in stores:
                quads = load_rdf(spark, os.path.join(HERE, df))
                stores[df] = Store(spark, MutableQuadSource(spark, quads))
            st = stores[df]
            rpath = os.path.join(HERE, rf)
            if rf.endswith((".ttl", ".trig")):  # CONSTRUCT / update result
                from oxigraph_spark.model import terms as T
                from oxigraph_spark.operators.canonicalize import isomorphic
                got = st.query(qtext)
                if "g" not in got.columns:
                    got = got.withColumn("g", T.default_graph())
                exp = load_rdf(spark, rpath)
                if isomorphic(got, exp):
                    print(f"PASS {name}")
                else:
                    print(f"FAIL {name}: CONSTRUCT not isomorphic")
                    print("  got:", got.collect())
                    n_fail += 1
                continue
            doc = json.loads(open(rpath).read())
            if "boolean" in doc:
                got_b = st.ask(qtext)
                ok = got_b == doc["boolean"]
                print(("PASS" if ok else "FAIL") + f" {name}"
                      + ("" if ok else f": ASK {got_b}"))
                n_fail += 0 if ok else 1
                continue
            variables = doc["head"]["vars"]
            exp = tm._solution_multiset(doc["results"]["bindings"], variables)
            df_res = st.query(qtext)
            got_rows = [{v: tm._row_term_binding(r[v]) for v in variables
                         if r[v] is not None} for r in df_res.collect()]
            got = tm._solution_multiset(got_rows, variables)
            if got == exp:
                print(f"PASS {name}")
            else:
                print(f"FAIL {name}:")
                print(f"  expected {exp}")
                print(f"  got      {got}")
                n_fail += 1
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: raised {type(ex).__name__}: {ex}")
            n_fail += 1
    print(f"# {n_fail} failures / {len(sys.argv) - 1} entries")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
