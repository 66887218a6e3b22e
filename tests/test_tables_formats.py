"""Direct-mapping ingest from CSV / JSON Lines table files (parquet
fallback path in sources/tables.py)."""

import os

from oxigraph_spark.sources.tables import load_table
from oxigraph_spark.store import Store


def test_csv_and_jsonl_tables_map_like_parquet(spark, sf_dir, tmp_path):
    pq = load_table(spark, sf_dir, "region")
    rows = pq.collect()
    cols = pq.columns

    # same table as CSV
    csv_lines = [",".join(cols)]
    for r in rows:
        csv_lines.append(",".join(str(r[c]) for c in cols))
    (tmp_path / "region.csv").write_text("\n".join(csv_lines) + "\n")
    got_csv = load_table(spark, str(tmp_path), "region")
    assert sorted(got_csv.columns) == sorted(cols)
    assert got_csv.count() == len(rows)

    # same table as JSON Lines
    import json
    jl = "\n".join(json.dumps({c: r[c] for c in cols}) for r in rows)
    (tmp_path / "nation.jsonl").write_text(jl + "\n")
    got_jl = load_table(spark, str(tmp_path), "nation")
    assert got_jl.count() == len(rows)

    # the SPARQL surface works over the CSV-backed table end to end
    st = Store.from_tables(spark, str(tmp_path), tables=["region"])
    out = st.query("""
        SELECT ?n WHERE {
          ?r <urn:g:region#r_name> ?n .
        } ORDER BY ?n""").collect()
    want = sorted(r["r_name"] for r in rows)
    assert [x["n"]["lex"] for x in out] == want


def test_parquet_still_preferred(spark, sf_dir, tmp_path):
    # a decoy CSV next to the parquet must not shadow it
    os.symlink(os.path.join(sf_dir, "region.parquet"),
               tmp_path / "region.parquet")
    (tmp_path / "region.csv").write_text("bogus\n1\n")
    df = load_table(spark, str(tmp_path), "region")
    assert "r_name" in df.columns
