"""Round-6 measurement probe: isolate each suite operator with the noop
sink (guide §1.4), label jobs (§1.5), and time sub-stages so the
optimization targets the measured cost, not the guessed one.

Usage: python scripts/r06_probe.py [op ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark.sql import functions as F

    from kgforge import extract, fixtures, graph, linking, materialize
    from kgforge.datapipe import dedup as dd
    from kgforge.datapipe import similarity as sim
    from kgforge.session import get_spark

    spark = get_spark("r06-probe", cores=CPUS, shuffle_partitions=CPUS)
    sc = spark.sparkContext
    spark.read.parquet(f"{SF_DIR}/part.parquet").count()
    spark.range(1000).select(F.sum("id")).collect()

    which = set(sys.argv[1:])
    out: dict[str, float] = {}

    def timed(name, fn, reps=1):
        if which and not any(name.startswith(w) for w in which):
            return
        best = None
        for _ in range(reps):
            sc.setJobDescription(name)
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        sc.setJobDescription(None)
        out[name] = round(best, 3)
        print(f"{name}: {best:.3f}", flush=True)

    transcripts = fixtures.load_transcripts(spark, SF_DIR)
    entities = fixtures.load_entities(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dupd = dd.docs_with_dups(docs)

    # --- transcripts / extraction ---
    timed("transcripts_scan.count", lambda: transcripts.count(), reps=2)
    timed("transcripts_scan.noop", lambda: noop(transcripts), reps=2)
    timed(
        "extract_mentions.noop",
        lambda: noop(extract.extract_mentions(transcripts)),
        reps=2,
    )
    timed(
        "dict_udf.names_collect",
        lambda: [r[0] for r in entities.select("name").distinct().collect()],
        reps=2,
    )
    names = [r[0] for r in entities.select("name").distinct().collect()]
    timed(
        "dict_udf.python.count",
        lambda: extract.detect_mentions_dictionary(
            transcripts, entities, names=names, engine="python"
        ).count(),
        reps=2,
    )
    timed(
        "dict_udf.jvm.count",
        lambda: extract.detect_mentions_dictionary(
            transcripts, entities, names=names, engine="jvm"
        ).count(),
        reps=2,
    )

    # --- closure ---
    mentions = extract.extract_mentions(transcripts)
    linked_b = linking.link_mentions(mentions, entities, strategy="broadcast")
    edges = graph.bom_edges_from_linked(linked_b).cache()
    timed("bom_edges.count", lambda: edges.count())
    sub = edges.filter(
        (F.col("parent").cast("bigint") + F.col("child").cast("bigint")) % 20 == 0
    )
    timed("closure.sub_count", lambda: sub.count())
    stats: dict = {}
    timed(
        "closure.full",
        lambda: graph.transitive_closure(sub, stats=stats).count(),
    )
    print("closure stats:", json.dumps(stats))

    # --- dedup section ---
    timed("dedup.docs_count", lambda: dupd.count(), reps=2)
    timed("dedup.exact.count", lambda: dd.exact_dedup(dupd).count(), reps=2)
    timed("dedup.shingles.noop", lambda: noop(dd.shingles(dupd)), reps=2)
    timed(
        "dedup.minhash_sigs.noop",
        lambda: noop(dd.minhash_signatures(dupd)),
        reps=2,
    )
    timed(
        "dedup.lsh_pairs.count", lambda: dd.lsh_candidate_pairs(dupd).count(), reps=2
    )
    timed(
        "dedup.simhash_hashed.noop",
        lambda: noop(dupd.select("doc_id", dd.simhash_udf(F.col("text")).alias("sh"))),
        reps=2,
    )
    timed(
        "dedup.simhash_pairs.count",
        lambda: dd.simhash_near_dups(dupd).count(),
        reps=2,
    )
    timed(
        "dedup.pos_shingles.noop",
        lambda: noop(dd.positional_shingles(dupd)),
        reps=2,
    )
    timed(
        "dedup.spans.count",
        lambda: dd.repeated_spans(dupd).count(),
        reps=2,
    )
    cc_stats: dict = {}

    def clusters_run():
        pairs = dd.lsh_candidate_pairs(dupd)
        return dd.dedup_clusters(dupd, pairs).count()

    timed("dedup.clusters.count", clusters_run, reps=2)
    edges_cc = dd.lsh_candidate_pairs(dupd).select(
        F.col("doc_a").cast("string").alias("parent"),
        F.col("doc_b").cast("string").alias("child"),
    )
    timed(
        "dedup.cc_only.count",
        lambda: graph.connected_components(edges_cc, stats=cc_stats).count(),
    )
    print("cc stats:", json.dumps(cc_stats))

    # --- curate ---
    from kgforge.datapipe import curate as cu

    def curate_run():
        kept, _f = cu.curate_corpus(
            dupd, lang="en", min_tokens=3, dedup="cluster", span_min_docs=2
        )
        n = kept.count()
        kept.unpersist()
        return n

    timed("curate.full", curate_run, reps=2)

    # --- similarity ---
    timed(
        "sim.cosine_topk.count",
        lambda: sim.cosine_topk(emb.filter(F.col("vec_id") % 50 == 0), emb, k=5).count(),
        reps=2,
    )
    timed(
        "sim.near_dups.count",
        lambda: sim.embedding_near_dups(sim.vecs_with_dups(emb), threshold=0.9).count(),
        reps=2,
    )
    timed(
        "sim.lsh_sigs.noop",
        lambda: noop(sim.lsh_signatures(sim.vecs_with_dups(emb))),
        reps=2,
    )
    timed(
        "sim.ivf.count",
        lambda: sim.ivf_ann_topk(emb.filter(F.col("vec_id") % 50 == 0), emb, k=5).count(),
        reps=2,
    )

    # --- multimodal ---
    from kgforge.datapipe import multimodal as mm

    timed("mm.decode.count", lambda: mm.decode_features(mm.attach_media(docs)).count(), reps=2)
    timed("mm.resize.count", lambda: mm.resize_images(mm.attach_media(docs), 8, 8).count(), reps=2)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
