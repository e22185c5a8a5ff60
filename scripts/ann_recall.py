"""ANN quality/speed trade-off on the embeddings table: recall@k of the
SRP-LSH and IVF scale paths against the exact brute-force baseline, with
per-variant wall times → BENCH/ann_recall.json."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10
N_QUERIES = 50


def pairs(rows):
    return {(r.query_id, r.neighbor_id) for r in rows}


def main():
    from pyspark.sql import functions as F

    from dsm2dtm_spark.operators import simsearch as S
    from dsm2dtm_spark.session import get_spark

    spark = get_spark("ann-recall", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).repartition(32).cache()
    n = emb.count()
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") < N_QUERIES).selectExpr("vec_id AS query_id", "embedding").cache()
    queries.count()

    def timed(fn):
        fn().count()  # warm
        t0 = time.time()
        rows = fn().collect()
        return rows, round(time.time() - t0, 2)

    exact, t_exact = timed(lambda: S.brute_force_topk(emb, queries, k=K))
    lsh, t_lsh = timed(lambda: S.lsh_topk(emb, queries, k=K, dim=dim, n_planes=8))
    ivf, t_ivf = timed(lambda: S.ivf_topk(emb, queries, k=K, dim=dim, n_centroids=16, nprobe=4))

    e = pairs(exact)
    result = {
        "corpus": n,
        "dim": dim,
        "k": K,
        "n_queries": N_QUERIES,
        "exact_sec": t_exact,
        "lsh": {"sec": t_lsh, "recall": round(len(e & pairs(lsh)) / len(e), 3)},
        "ivf_nprobe4_of16": {"sec": t_ivf, "recall": round(len(e & pairs(ivf)) / len(e), 3)},
    }
    print(json.dumps(result))
    with open(os.path.join(ROOT, "BENCH", "ann_recall.json"), "w") as f:
        json.dump(result, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
