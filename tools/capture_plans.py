"""Capture ``.explain("formatted")`` output for every ``queries()`` entry
into ``plans/<tag>/<query>_<suffix>.txt`` — the optimization-round evidence
files (OPTIMIZATION_r09.md contract: ``<query>_before.txt`` /
``<query>_after.txt``).

Usage:
    python tools/capture_plans.py --tag r09 --suffix before \
        [--sf /root/testdata/sf0.1] [--only name,name]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default="r09")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from oxigraph_spark.session import get_spark

    spark = get_spark("oxigraph-spark-capture-plans")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)

    only = set(args.only.split(",")) if args.only else None
    n_ok = 0
    for name, fn in entry.queries().items():
        if only is not None and name not in only:
            continue
        try:
            df = fn(spark, args.sf)
            formatted = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as ex:  # noqa: BLE001 — capture what we can
            formatted = f"ERROR {type(ex).__name__}: {ex}\n"
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {args.sf} — explain('formatted'), "
                    f"{args.suffix}\n")
            f.write(formatted)
        n_ok += 1
        print(f"# wrote {path}", file=sys.stderr)
    print(f"# captured {n_ok} plans into {out_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
