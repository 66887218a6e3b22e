"""ANN recall@k vs brute force across a parameter grid (round-5 VERDICT
item 6): measures LSH (multiprobe radius) and IVF (nprobe) against
exact cosine top-k on the embeddings table, with the scanned candidate
fraction as the cost proxy.  Picks and prints the cheapest configs with
recall >= 0.9 at <= 1/3 of the corpus scanned — the numbers bench.py's
``ann_recall`` metric then reports for the CHOSEN defaults.

Usage: python tools/ann_recall.py  [env: SPARK_GRAFT_SF_DIR]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10
N_QUERIES = 5
PLANES = 8
N_CENTROIDS = 16


def run_grid(spark, emb, queries, k=K):
    """{config: {"recall": r, "cand_frac": f}} over the LSH/IVF grid."""
    from oxigraph_spark.pipeline.simsearch import (brute_force_topk,
                                                   ivf_index, ivf_topk,
                                                   lsh_index, lsh_topk)
    n = emb.count()
    truth = {}
    for qid, qvec in queries:
        truth[qid] = {r["id"] for r in
                      brute_force_topk(emb, "embedding", "vec_id",
                                       qvec, k).collect()}

    out = {}
    lsh = lsh_index(emb, "embedding", "vec_id", planes=PLANES).persist()
    lsh.count()
    bucket_sizes = {r["bucket"]: r["n"] for r in
                    lsh.groupBy("bucket").count()
                       .withColumnRenamed("count", "n").collect()}
    import itertools
    for mp in (0, 1, 2):
        hits = tot = cand = 0
        for qid, qvec in queries:
            got = {r["id"] for r in
                   lsh_topk(lsh, qvec, k, planes=PLANES,
                            multiprobe=mp).collect()}
            hits += len(got & truth[qid])
            tot += len(truth[qid])
            # candidate count = size of the probed buckets
            from pyspark.sql import functions as F
            from oxigraph_spark.pipeline.simsearch import _bucket
            qb = (lsh.sparkSession.range(1)
                  .select(_bucket(F.array(*[F.lit(float(x)) for x in qvec]),
                                  PLANES).alias("b")).first()["b"])
            buckets = {qb}
            if mp > 0:
                for flips in itertools.combinations(range(PLANES), mp):
                    b = list(qb)
                    for fl in flips:
                        b[fl] = "1" if b[fl] == "0" else "0"
                    buckets.add("".join(b))
            cand += sum(bucket_sizes.get(b, 0) for b in buckets)
        out[f"lsh_mp{mp}"] = {"recall": round(hits / tot, 3),
                              "cand_frac": round(cand / (len(queries) * n), 3)}
    lsh.unpersist()

    ivf = ivf_index(emb, "embedding", "vec_id",
                    n_centroids=N_CENTROIDS).persist()
    ivf.count()
    list_sizes = {r["centroid_id"]: r["n"] for r in
                  ivf.groupBy("centroid_id").count()
                     .withColumnRenamed("count", "n").collect()}
    cent_rows = (ivf.select(ivf["centroid_id"].alias("id")).distinct()
                 .join(ivf.select("id", "vec"), "id")
                 .dropDuplicates(["id"]).collect())
    from oxigraph_spark.pipeline.simsearch import _centroid_order
    for nprobe in (1, 2, 4):
        hits = tot = cand = 0
        for qid, qvec in queries:
            got = {r["id"] for r in
                   ivf_topk(ivf, qvec, k, nprobe=nprobe).collect()}
            hits += len(got & truth[qid])
            tot += len(truth[qid])
            probe = _centroid_order(qvec, cent_rows)[:nprobe]
            cand += sum(list_sizes.get(c, 0) for c in probe)
        out[f"ivf_np{nprobe}"] = {"recall": round(hits / tot, 3),
                                  "cand_frac": round(cand / (len(queries) * n), 3)}
    ivf.unpersist()
    return out


def sample_queries(emb, n=N_QUERIES):
    rows = (emb.withColumn("__h", __import__("pyspark.sql.functions",
                                             fromlist=["F"])
                           .xxhash64(emb["vec_id"].cast("string")))
            .orderBy("__h").limit(n).collect())
    return [(r["vec_id"], list(r["embedding"])) for r in rows]


def main() -> None:
    from oxigraph_spark.session import get_spark
    spark = get_spark("ann-recall")
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    queries = sample_queries(emb)
    grid = run_grid(spark, emb, queries)
    best = {}
    for fam in ("lsh", "ivf"):
        ok = [(cfg, m) for cfg, m in grid.items()
              if cfg.startswith(fam) and m["recall"] >= 0.9
              and m["cand_frac"] <= 1 / 3]
        if ok:
            best[fam] = min(ok, key=lambda x: x[1]["cand_frac"])[0]
    print(json.dumps({"metric": "ann_recall_grid", "k": K,
                      "n_queries": len(queries), "grid": grid,
                      "chosen": best, "sf": SF_DIR}))


if __name__ == "__main__":
    main()
