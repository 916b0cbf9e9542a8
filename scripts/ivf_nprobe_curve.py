"""IVF nprobe recall/latency curve — the tuning tradeoff a 100 TB ANN
deployment dials: more probed inverted lists = more exact re-scoring
work = higher recall, linearly more candidate volume. One run per
nprobe in {1, 2, 4, 8} on the sf embeddings, recall@k measured against
the brute-force cosine arm (the oracle the gate already checks).

Usage: python scripts/ivf_nprobe_curve.py [sf_dir] [out_json]
Writes one JSON blob (per-nprobe: seconds, candidate pairs via the
result's row count, recall_at_k) — recorded to BENCH_ivf_curve.json
and summarized in BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from kgforge.datapipe import similarity as sim
from kgforge.session import get_spark

K = 5


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/BENCH_ivf_curve.json"
    spark = get_spark("ivf-curve", cores=8, shuffle_partitions=8)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    emb.count()
    queries = emb.filter(F.col("vec_id") % 50 == 0).cache()
    n_queries = queries.count()

    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.cosine_topk(queries, emb, k=K).collect()
    }

    result = {"sf_dir": sf_dir, "cores": 8, "k": K, "n_queries": n_queries,
              "truth_pairs": len(truth)}
    for nprobe in (1, 2, 4, 8):
        plan = sim.ivf_ann_topk(queries, emb, k=K, nprobe=nprobe)
        plan._jdf.queryExecution().executedPlan()  # untimed planning
        t0 = time.perf_counter()
        got = {(r["query_id"], r["neighbor_id"]) for r in plan.collect()}
        secs = round(time.perf_counter() - t0, 2)
        row = {
            "seconds": secs,
            "result_pairs": len(got),
            "recall_at_k": round(len(got & truth) / max(len(truth), 1), 4),
        }
        result[f"nprobe_{nprobe}"] = row
        print(json.dumps({f"nprobe_{nprobe}": row}), flush=True)

    # trained-quantizer arm: 2 Lloyd iterations at the default nprobe —
    # what an offline k-means training job buys on this corpus
    t0 = time.perf_counter()
    cents = sim.ivf_refine_centroids(emb, iterations=2)
    train_s = round(time.perf_counter() - t0, 2)
    plan = sim.ivf_ann_topk(queries, emb, k=K, nprobe=4, cents=cents)
    plan._jdf.queryExecution().executedPlan()
    t0 = time.perf_counter()
    got = {(r["query_id"], r["neighbor_id"]) for r in plan.collect()}
    row = {
        "seconds": round(time.perf_counter() - t0, 2),
        "train_seconds": train_s,
        "result_pairs": len(got),
        "recall_at_k": round(len(got & truth) / max(len(truth), 1), 4),
    }
    result["nprobe_4_lloyd2"] = row
    print(json.dumps({"nprobe_4_lloyd2": row}), flush=True)

    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"written": out_path}))


if __name__ == "__main__":
    main()
