"""Extended one-off fuzz sweep (round-7 closing): run the committed
fuzzers' generators over MANY more seeds than the per-run pytest ranges
— the committed suites pin 15/10/16 seeds for runtime; this tool
sweeps hundreds once per round and reports divergences, loop-until-dry
style.

Usage: python tools/fuzz_sweep.py [n_diff=150] [n_oracle=100]
Exit 1 on any divergence (print the query for triage).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

N_DIFF = int(sys.argv[1]) if len(sys.argv) > 1 else 150
N_ORACLE = int(sys.argv[2]) if len(sys.argv) > 2 else 100
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    import duckdb

    import test_fuzz_differential as fd
    import test_fuzz_oracle as fo
    from oxigraph_spark.plans.compiler import Compiler
    from oxigraph_spark.session import get_spark
    from oxigraph_spark.sources.direct_mapping import DirectMappingSource
    from oxigraph_spark.store import Store

    spark = get_spark("fuzz-sweep")
    src = DirectMappingSource(spark, SF_DIR)
    fails = 0

    # 1) optimized-vs-unoptimized differential, seeds beyond the suite
    for seed in range(25, 25 + N_DIFF):
        q = fd.gen_query(seed)
        try:
            from oxigraph_spark.algebra.parser import parse_query
            ast = parse_query(q)
            a = fd._multiset(Compiler(spark, src,
                                      optimize=True).compile_query(ast))
            b = fd._multiset(Compiler(spark, src,
                                      optimize=False).compile_query(ast))
            if a != b:
                fails += 1
                print(f"DIFF seed {seed} diverged:\n{q}", file=sys.stderr)
        except Exception as ex:  # noqa: BLE001
            fails += 1
            print(f"DIFF seed {seed} raised {type(ex).__name__}: {ex}\n{q}",
                  file=sys.stderr)
        if (seed - 24) % 25 == 0:
            print(f"# diff {seed - 24}/{N_DIFF} clean so far "
                  f"({fails} fails)", file=sys.stderr)

    # 2) DuckDB-oracle differential, seeds beyond the suite
    st = Store(spark, src)
    con = duckdb.connect()
    for t in ("customer", "nation", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM '{SF_DIR}/{t}.parquet'")
    for seed in range(16, 16 + N_ORACLE):
        try:
            sparql, sql, spec = fo.gen_case(seed)
            got = fo._norm([tuple(r) for r in
                            fo.to_native(st.query(sparql),
                                         spec).collect()])
            want = fo._norm([tuple(r) for r in con.execute(sql).fetchall()])
            if got != want:
                fails += 1
                print(f"ORACLE seed {seed} diverged:\nSPARQL: {sparql}\n"
                      f"SQL: {sql}", file=sys.stderr)
        except Exception as ex:  # noqa: BLE001
            fails += 1
            print(f"ORACLE seed {seed} raised {type(ex).__name__}: {ex}",
                  file=sys.stderr)
        if (seed - 15) % 25 == 0:
            print(f"# oracle {seed - 15}/{N_ORACLE} clean so far "
                  f"({fails} fails)", file=sys.stderr)

    print(f'{{"fuzz_sweep_fails": {fails}, "diff_seeds": {N_DIFF}, '
          f'"oracle_seeds": {N_ORACLE}}}')
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
