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
    # the CSV pushdown workaround is scoped to the read — the session
    # conf is restored so other CSV workloads keep their filter pushdown
    assert spark.conf.get(
        "spark.sql.csv.filterPushdown.enabled", "true") == "true"

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


def test_custom_table_defs(spark, tmp_path):
    """User-supplied schema mapping: own tables, own pk/fk graph — the
    full SPARQL surface (FK link traversal included) over CSV files."""
    (tmp_path / "team.csv").write_text(
        "team_id,team_name\n1,red\n2,blue\n")
    (tmp_path / "player.csv").write_text(
        "player_id,player_name,team\n10,ana,1\n11,bo,1\n12,cy,2\n")
    st = Store.from_tables(
        spark, str(tmp_path),
        table_defs={"team": (("team_id",), {}),
                    "player": (("player_id",), {"team": "team"})})
    out = st.query("""
        SELECT ?p ?t WHERE {
          ?x <urn:g:player#player_name> ?p .
          ?x <urn:g:player#ref_team> ?y .
          ?y <urn:g:team#team_name> ?t .
        } ORDER BY ?p""").collect()
    assert [(r["p"]["lex"], r["t"]["lex"]) for r in out] == [
        ("ana", "red"), ("bo", "red"), ("cy", "blue")]
    # class partition: every row typed with its table IRI
    assert st.ask("ASK { ?x a <urn:g:player> }")


def test_from_dataframes(spark):
    """Direct mapping over in-memory frames — no files at all."""
    team = spark.createDataFrame([(1, "red"), (2, "blue")],
                                 "team_id int, team_name string")
    player = spark.createDataFrame([(10, "ana", 1), (12, "cy", 2)],
                                   "player_id int, player_name string, "
                                   "team int")
    st = Store.from_dataframes(
        spark, {"team": team, "player": player},
        table_defs={"team": (("team_id",), {}),
                    "player": (("player_id",), {"team": "team"})})
    out = st.query("""
        SELECT ?p ?t WHERE {
          ?x <urn:g:player#player_name> ?p .
          ?x <urn:g:player#ref_team> ?y .
          ?y <urn:g:team#team_name> ?t .
        } ORDER BY ?p""").collect()
    assert [(r["p"]["lex"], r["t"]["lex"]) for r in out] == [
        ("ana", "red"), ("cy", "blue")]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        Store.from_dataframes(spark, {"ghost": team},
                              table_defs={"team": (("team_id",), {})})


def test_parquet_still_preferred(spark, sf_dir, tmp_path):
    # a decoy CSV next to the parquet must not shadow it
    os.symlink(os.path.join(sf_dir, "region.parquet"),
               tmp_path / "region.parquet")
    (tmp_path / "region.csv").write_text("bogus\n1\n")
    df = load_table(spark, str(tmp_path), "region")
    assert "r_name" in df.columns
