"""Benchmark harness: runs headline queries at SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Each query runs N_RUNS times and reports the per-query MEDIAN —
single-run wall variance on this box is ±50%, so medians are the
minimum credible estimate (bench discipline note, README).  Run 1 pays
the cold driver-side plan build; runs 2+ exercise the engine's
prepared-plan caches (Store's compiled-plan cache / the entry memo) —
the steady-state shape of a repeated-query workload.  ``plan_sec`` is
the median driver-side compile/plan portion and ``plan_first_sec`` the
cold first-run build, reported separately so both paths stay visible.
One warm-up action absorbs JVM/codegen startup so run 1 of query 1
isn't charged for it.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# n=5 (round-8, r7 verdict item 4): the driver's bench can run right
# after the builder's soaks heat the box; 5-run medians shed the first
# hot-box outliers that 3-run medians inherited at r7 (+14% aggregate
# drift adjudicated environmental).
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

# headline subset: scan+filter+agg, multi-join, paths/closure, top-k,
# dedup + simsearch + text + windows extensions
HEADLINE = [
    "flagship_q1", "J1_bgp_join", "A_aggregates", "SUB_select",
    "PP3_sequence", "PP6_plus", "O1_order_slice", "F_strings",
    "X_dedup_exact", "X_dedup_minhash", "X_simsearch_topk",
    "X_text_stats", "X_window_tumbling",
]

# ---------------------------------------------------------------------------
# BSBM-explore-style mixed mix: 13 short-query templates × 3 parameter
# variants = 39 executions per pass.  Parameters vary PER EXECUTION, so
# every query text is new — this measures the COLD plan-build + execute
# path that dominates a many-short-query workload (round-3 verdict item
# 1: plan latency scales with query count, not data).
# ---------------------------------------------------------------------------

MIX_PFX = """
PREFIX c: <urn:g:customer#>
PREFIX n: <urn:g:nation#>
PREFIX r: <urn:g:region#>
PREFIX o: <urn:g:orders#>
PREFIX l: <urn:g:lineitem#>
PREFIX s: <urn:g:supplier#>
PREFIX p: <urn:g:part#>
"""

_SEGS = ["BUILDING", "AUTOMOBILE", "MACHINERY"]
_REGIONS = ["ASIA", "AMERICA", "EUROPE"]
_STATUS = ["F", "O", "P"]


def mixed_templates(i: int) -> list[str]:
    """The 13 templates instantiated with variant ``i`` (0..2)."""
    k = 7 + i * 13
    seg, reg, stat = _SEGS[i], _REGIONS[i], _STATUS[i]
    lo = 900.0 + 50 * i
    return [t.strip() for t in [
        # 1 point star lookup
        f"""SELECT ?nm ?b WHERE {{ <urn:g:customer/{k}> c:c_name ?nm ;
            c:c_acctbal ?b }}""",
        # 2 segment filter + range
        f"""SELECT ?nm WHERE {{ ?c c:c_mktsegment "{seg}" ; c:c_name ?nm ;
            c:c_acctbal ?bal . FILTER(?bal > {100.0 + i}) }} LIMIT 10""",
        # 3 two-hop join with bound leaf
        f"""SELECT (COUNT(*) AS ?cnt) WHERE {{ ?c c:ref_nation ?n .
            ?n n:ref_region ?r . ?r r:r_name "{reg}" }}""",
        # 4 numeric range count
        f"""SELECT (COUNT(*) AS ?cnt) WHERE {{ ?p p:p_retailprice ?pr .
            FILTER(?pr >= {lo} && ?pr < {lo + 100.0}) }}""",
        # 5 top-k by attribute
        f"""SELECT ?s ?b WHERE {{ ?s s:s_acctbal ?b .
            FILTER(?b > {i * 100.0}) }} ORDER BY DESC(?b) LIMIT 10""",
        # 6 group aggregate over a key range
        f"""SELECT ?st (COUNT(*) AS ?cnt) WHERE {{ ?o o:o_orderstatus ?st ;
            o:o_custkey ?ck . FILTER(?ck < {500 * (i + 1)}) }} GROUP BY ?st""",
        # 7 OPTIONAL with filter in the join condition (real left join:
        # s_acctbal exists, unlike the n_comment column this used before)
        f"""SELECT ?nm ?bal WHERE {{ ?s s:s_name ?nm .
            OPTIONAL {{ ?s s:s_acctbal ?bal . FILTER(?bal > {4000.0 + i}) }}
            FILTER(STRLEN(?nm) > {i}) }}""",
        # 8 EXISTS
        f"""SELECT ?nm WHERE {{ ?n n:n_name ?nm . FILTER EXISTS {{
            ?c c:ref_nation ?n ; c:c_mktsegment "{seg}" }} }}""",
        # 9 VALUES join
        f"""SELECT ?nn WHERE {{ VALUES ?rn {{ "{reg}" "AFRICA" }}
            ?r r:r_name ?rn . ?n n:ref_region ?r ; n:n_name ?nn }}""",
        # 10 sequence path
        f"""SELECT (COUNT(*) AS ?cnt) WHERE {{
            ?c (c:ref_nation/n:ref_region) ?r .
            ?r r:r_name "{reg}" }}""",
        # 11 DISTINCT
        f"""SELECT DISTINCT ?seg WHERE {{ ?c c:c_mktsegment ?seg ;
            c:c_custkey ?k . FILTER(?k > {i * 10}) }}""",
        # 12 order + slice
        f"""SELECT ?o ?tp WHERE {{ ?o o:o_totalprice ?tp ;
            o:o_orderstatus "{stat}" }} ORDER BY DESC(?tp) LIMIT 5""",
        # 13 entity page: star + OPTIONAL chain (BSBM explore Q2 shape;
        # exercises the OPTIONAL-star fusion)
        f"""SELECT ?nm ?bal ?nat WHERE {{ ?c c:c_mktsegment "{seg}" ;
            c:c_name ?nm .
            OPTIONAL {{ ?c c:c_acctbal ?bal . FILTER(?bal > {500.0 * i}) }}
            OPTIONAL {{ ?c c:ref_nation ?nat }} }} LIMIT 20""",
    ]]


def run_mixed(spark, store) -> tuple[float, int]:
    t0 = time.time()
    nq = 0
    for i in range(3):
        for q in mixed_templates(i):
            store.query(MIX_PFX + q, use_cache=False).count()
            nq += 1
    return time.time() - t0, nq


def main() -> None:
    import __spark_entry__ as entry
    from oxigraph_spark.session import get_spark

    spark = get_spark("oxigraph-spark-bench")
    qs = entry.queries()
    # warm-up: absorbs JVM/codegen startup AND the one-time store build
    # (parquet schema reads for all tables) so query 1 isn't charged for it
    spark.range(1000).selectExpr("sum(id)").collect()
    qs["O4_distinct"](spark, SF_DIR).count()

    times: dict[str, float] = {}
    compile_times: dict[str, float] = {}
    first_plan: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        walls, plans, rows = [], [], 0
        for _ in range(N_RUNS):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            t1 = time.time()
            rows = df.count()
            walls.append(time.time() - t0)
            plans.append(t1 - t0)
        dt = round(statistics.median(walls), 3)
        times[name] = dt
        compile_times[name] = round(statistics.median(plans), 3)
        first_plan[name] = round(plans[0], 3)
        total += dt
        print(f"# {name}: {rows} rows median {dt}s over n={N_RUNS} "
              f"(plan {compile_times[name]}s cold {first_plan[name]}s; "
              f"runs {[round(w, 2) for w in walls]})", file=sys.stderr)

    # mixed short-query mix (cold plans by construction: use_cache=False
    # and per-execution parameters)
    store = entry._store(spark, SF_DIR)
    mixed_walls, n_mixed = [], 0
    for _ in range(N_RUNS):
        wall, nq = run_mixed(spark, store)
        n_mixed = nq
        mixed_walls.append(wall)
        print(f"# mixed: {nq} queries in {round(wall, 2)}s "
              f"({round(nq / wall, 1)} q/s)", file=sys.stderr)
    mixed_sec = round(statistics.median(mixed_walls), 3)

    # informational extras (not part of the headline total): the round-4
    # graph-analytics and retrieval operators at the same SF
    from functools import reduce as _reduce

    from oxigraph_spark.operators.graphrank import pagerank_terms
    from oxigraph_spark.pipeline.retrieval import bm25_topk, build_text_index

    # FK link graph via per-predicate scans (pruned by construction —
    # a p-filter over the full quads union would still scan every
    # predicate frame); n=1: the fixpoint is inherently multi-job
    link_preds = ["urn:g:customer#ref_nation", "urn:g:nation#ref_region",
                  "urn:g:supplier#ref_nation", "urn:g:orders#ref_customer"]
    link_quads = _reduce(lambda a, b: a.unionByName(b),
                         [store.source.scan(p) for p in link_preds])
    t0 = time.time()
    pagerank_terms(link_quads, max_iter=5).count()
    pr_walls = [time.time() - t0]
    bm_walls = []
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for _ in range(N_RUNS):
        t0 = time.time()
        idx = build_text_index(docs)
        for q in ("hash join table", "window sort spark", "scan value row"):
            bm25_topk(idx, q, k=10).count()
        idx.unpersist()
        bm_walls.append(time.time() - t0)
    pagerank_sec = round(statistics.median(pr_walls), 3)
    bm25_sec = round(statistics.median(bm_walls), 3)
    print(f"# pagerank(5 iters): {pagerank_sec}s; bm25 build+3 queries: "
          f"{bm25_sec}s", file=sys.stderr)

    # ANN quality at the CHOSEN defaults (tools/ann_recall.py picked
    # IVF/nprobe from the recall-vs-cost grid: ivf_np1 0.96 recall @
    # 0.067 of corpus, np2 0.98 @ 0.129; LSH sign-projection measured
    # recall-limited for top-k — 0.40 @ 8 planes mp2 — and stays the
    # dedup-family primitive only): recall@10 vs brute force plus the
    # scanned-candidate fraction as the cost proxy.
    from pyspark.sql import functions as F

    from oxigraph_spark.pipeline.simsearch import (brute_force_topk,
                                                   ivf_index, ivf_topk)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_emb = emb.count()
    qrows = (emb.withColumn("__h", F.xxhash64(F.col("vec_id").cast("string")))
             .orderBy("__h").limit(3).collect())
    t0 = time.time()
    ivf = ivf_index(emb, "embedding", "vec_id", n_centroids=16).persist()
    ivf.count()
    list_sizes = {r["centroid_id"]: r["count"] for r in
                  ivf.groupBy("centroid_id").count().collect()}
    # centroid set is loop-invariant: derive + collect ONCE, pass the
    # frame into each probe (ivf_topk re-derives it when centroids=None)
    cents_df = (ivf.select(ivf["centroid_id"].alias("id")).distinct()
                .join(ivf.select("id", "vec"), "id")
                .dropDuplicates(["id"])).localCheckpoint()
    cents = cents_df.collect()
    from oxigraph_spark.pipeline.simsearch import _centroid_order
    hits = tot = cand = 0
    for r in qrows:
        qvec = list(r["embedding"])
        truth = {x["id"] for x in
                 brute_force_topk(emb, "embedding", "vec_id", qvec, 10)
                 .collect()}
        got = {x["id"] for x in
               ivf_topk(ivf, qvec, 10, nprobe=2,
                        centroids=cents_df).collect()}
        hits += len(got & truth)
        tot += len(truth)
        cand += sum(list_sizes.get(c, 0)
                    for c in _centroid_order(qvec, cents)[:2])
    ann_sec = round(time.time() - t0, 3)
    ivf.unpersist()
    ann_recall = round(hits / tot, 3) if tot else None
    ann_cand_frac = round(cand / (3 * n_emb), 3) if n_emb else None
    print(f"# ann (ivf nprobe=2): recall@10 {ann_recall} "
          f"cand_frac {ann_cand_frac} in {ann_sec}s", file=sys.stderr)

    # round-5 second-session operators, informational: as-of correlation
    # over the events table (attribution shape: each event of type A
    # joined to the same user's latest prior type-B event) and landmark
    # BFS distances over the FK link graph
    from oxigraph_spark.operators.graphalgo import shortest_paths
    from oxigraph_spark.operators.graphrank import rdf_edges
    from oxigraph_spark.sources.tables import load_table
    from oxigraph_spark.streaming.events import asof_join

    ev = load_table(spark, SF_DIR, "events")
    types = sorted(r["event_type"] for r in
                   ev.select("event_type").distinct().collect())[:2]
    t0 = time.time()
    left = ev.where(F.col("event_type") == types[0])
    right = ev.where(F.col("event_type") == types[1]) \
              .select("user_id", "ts", "event_id")
    n_asof = asof_join(left, right, on="user_id", left_time="ts",
                       right_cols=["event_id", "ts"]).count()
    asof_sec = round(time.time() - t0, 3)
    t0 = time.time()
    edges, nodes = rdf_edges(link_quads)
    lm = [r["id"] for r in
          nodes.where(F.col("iri") == "urn:g:region/0").collect()]
    n_bfs = shortest_paths(edges, lm).count()
    bfs_sec = round(time.time() - t0, 3)
    print(f"# asof: {n_asof} rows in {asof_sec}s; "
          f"bfs: {n_bfs} rows in {bfs_sec}s", file=sys.stderr)

    # endpoint under concurrency: the S11 protocol server over the same
    # store, 4 client threads x 2 passes of the 13-template mix (same
    # query TEXTS repeat across passes/threads, so this measures the
    # served/prepared path a protocol workload actually hits)
    import concurrent.futures as cf
    import urllib.parse
    import urllib.request

    from oxigraph_spark.server import SparqlEndpoint
    ep = SparqlEndpoint(store)
    host, port = ep.start()
    base = f"http://{host}:{port}"

    def _client(i: int) -> int:
        n = 0
        for q in mixed_templates(i % 3):
            url = f"{base}/query?query={urllib.parse.quote(MIX_PFX + q)}"
            req = urllib.request.Request(
                url, headers={"Accept": "application/sparql-results+json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                r.read()
            n += 1
        return n

    _client(0)  # warm the endpoint's plan cache outside the clock
    t0 = time.time()
    with cf.ThreadPoolExecutor(max_workers=4) as pool:
        served = sum(pool.map(_client, range(8)))
    endpoint_sec = time.time() - t0
    ep.stop()
    endpoint_qps = round(served / endpoint_sec, 2)
    print(f"# endpoint: {served} requests over 4 threads in "
          f"{round(endpoint_sec, 2)}s = {endpoint_qps} q/s", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "plan_sec": compile_times,      # median plan portion (cached path)
        "plan_first_sec": first_plan,   # cold first-run plan build
        "mixed_sec": mixed_sec,         # 39-query BSBM-style mix, cold plans
        "mixed_queries": n_mixed,
        "mixed_qps": round(n_mixed / mixed_sec, 2) if mixed_sec else None,
        "pagerank_sec": pagerank_sec,   # 5 power iterations, full FK graph
        "bm25_sec": bm25_sec,           # index build + 3 top-k queries
        "ann_recall": ann_recall,       # IVF nprobe=2 recall@10 vs brute
        "ann_cand_frac": ann_cand_frac,  # fraction of corpus scanned
        "ann_sec": ann_sec,
        "asof_sec": asof_sec,           # events attribution as-of join
        "bfs_sec": bfs_sec,             # landmark BFS over the FK graph
        "endpoint_qps": endpoint_qps,   # 4 HTTP clients, 13-template mix
        "n": N_RUNS,                    # per-query runs; values are medians
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # informational 10x scale-soak summary (tools/scale_soak.py over
        # self-generated sf1-style data with planted power-law skew);
        # refreshed whenever the soak is re-run, absent if never run
        "soak_10x": _soak_summary(),
        # round-7 evidence: constrained-heap spill soak (tools/mem_soak.py)
        # and transactional/standing-query churn soak (tools/txn_soak.py)
        "mem_soak": _mem_soak_summary(),
        "txn_soak": _txn_soak_summary(),
    }))


def _latest(pattern):
    import glob
    here = os.path.dirname(os.path.abspath(__file__))
    files = sorted(glob.glob(os.path.join(here, pattern)))
    return files[-1] if files else None


def _mem_soak_summary():
    try:
        with open(_latest("MEMSOAK_r*.json")) as f:
            d = json.load(f)
    except Exception:  # noqa: BLE001 — never run locally
        return None
    return {"heap": d.get("heap"),
            "all_completed": d.get("all_completed"),
            "total_spill_disk_mb": d.get("total_spill_disk_mb"),
            "oom": d.get("oom")}


def _txn_soak_summary():
    try:
        with open(_latest("TXNSOAK_r*.json")) as f:
            d = json.load(f)
    except Exception:  # noqa: BLE001 — never run locally
        return None
    return {"all_green": d.get("all_green"),
            "commits_per_sec": d.get("churn", {}).get("commits_per_sec"),
            "standing_query_exactly_once": d.get("standing_query", {}).get(
                "fold_matches_oracle")}


def _soak_summary():
    path = _latest("SOAK_r*.json")
    try:
        with open(path) as f:
            d = json.load(f)
    except Exception:  # noqa: BLE001 — soak never run locally
        return None
    return {
        "headline_warm_total_sec": d.get("value"),
        "max_warm_ratio_vs_sf0.1": max(d.get("ratio_vs_sf0.1", {}).values(),
                                       default=None),
        "cliffs": d.get("cliffs_over_ratio", {}).get("queries"),
        "skew_cap_held": d.get("dedup_skew", {}).get(
            "surviving_max_bucket", 10**9) <= d.get("dedup_skew", {}).get(
            "cap", 0),
        "pagerank_sec": d.get("pagerank_sec"),
        "bfs_sec": d.get("bfs_sec"),
        "weighted_sp_sec": d.get("weighted_sp_sec"),
    }


if __name__ == "__main__":
    main()
