"""Third-pass 5x scale-holding check: rebuild documents/embeddings 5x
as MULTI-FILE parquet under /tmp/sfbig (so spread_scan takes its no-op
branch), then time every operator the pass touched.

Usage: python scripts/r06_scale5x.py [build|check|both]
"""

from __future__ import annotations

import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG = "/tmp/sfbig"
COPIES = 5


def build(spark):
    from pyspark.sql import DataFrame, functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    d5 = reduce(
        DataFrame.unionByName,
        [docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000)) for i in range(COPIES)],
    )
    e5 = reduce(
        DataFrame.unionByName,
        [emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000)) for i in range(COPIES)],
    )
    d5.repartition(64).write.mode("overwrite").parquet(f"{BIG}/documents.parquet")
    e5.repartition(64).write.mode("overwrite").parquet(f"{BIG}/embeddings.parquet")
    print(
        "docs:", spark.read.parquet(f"{BIG}/documents.parquet").count(),
        "emb:", spark.read.parquet(f"{BIG}/embeddings.parquet").count(),
        flush=True,
    )


def check(spark):
    from pyspark.sql import functions as F

    from kgforge.datapipe import curate as cu
    from kgforge.datapipe import dedup as dd
    from kgforge.datapipe import similarity as sim

    docs = spark.read.parquet(f"{BIG}/documents.parquet")
    emb = spark.read.parquet(f"{BIG}/embeddings.parquet")
    dupd = dd.docs_with_dups(docs)

    def t(name, fn):
        t0 = time.perf_counter()
        r = fn()
        print(f"{name}: {round(time.perf_counter() - t0, 3)} (n={r})", flush=True)

    t("lsh_pairs_5x", lambda: dd.lsh_candidate_pairs(dupd).count())
    t("simhash_5x", lambda: dd.simhash_near_dups(dupd).count())
    t("clusters_5x", lambda: dd.dedup_clusters(dupd, dd.lsh_candidate_pairs(dupd)).count())
    t("spans_5x", lambda: dd.repeated_spans(dupd).count())

    def curate_run():
        k, _f = cu.curate_corpus(dupd, lang="en", min_tokens=3, dedup="cluster", span_min_docs=2)
        n = k.count()
        k.unpersist()
        return n

    t("curate_5x", curate_run)
    t("cosine_5x", lambda: sim.cosine_topk(emb.filter(F.col("vec_id") % 50 == 0), emb, k=5).count())
    t("near_dups_5x", lambda: sim.embedding_near_dups(sim.vecs_with_dups(emb), threshold=0.9).count())
    t("ivf_5x", lambda: sim.ivf_ann_topk(emb.filter(F.col("vec_id") % 50 == 0), emb, k=5).count())


def main():
    from kgforge.session import get_spark

    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    spark = get_spark("r06-scale5x", cores=32, shuffle_partitions=32)
    if mode in ("build", "both"):
        build(spark)
    if mode in ("check", "both"):
        check(spark)


if __name__ == "__main__":
    main()
