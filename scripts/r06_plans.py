"""Capture .explain("formatted") for every suite operator bench.py times
(plus the flagship fused action) into plans/r06/<name>_<tag>.txt.

Usage: python scripts/r06_plans.py <tag>     # tag = before | after
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06"
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    os.makedirs(OUT_DIR, exist_ok=True)

    from pyspark.sql import functions as F

    from kgforge import extract, fixtures, graph, linking, materialize
    from kgforge.datapipe import dedup as dd
    from kgforge.datapipe import multimodal as mm
    from kgforge.datapipe import similarity as sim
    from kgforge.session import get_spark

    spark = get_spark("r06-plans", shuffle_partitions=32)

    transcripts = fixtures.load_transcripts(spark, SF_DIR)
    entities = fixtures.load_entities(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dupd = dd.docs_with_dups(docs)
    names = [r[0] for r in entities.select("name").distinct().collect()]

    mentions = extract.extract_mentions(transcripts)
    linked_b = linking.link_mentions(mentions, entities, strategy="broadcast")
    edges = graph.bom_edges_from_linked(linked_b)
    triples = materialize.union_triples(
        materialize.part_triples(entities),
        materialize.bom_triples(edges),
        materialize.used_in_triples(edges),
    )

    plans = {
        "transcripts_scan": lambda: transcripts,
        "extract_mentions": lambda: mentions,
        "dict_mention_udf": lambda: extract.detect_mentions_dictionary(
            transcripts, entities, names=names, engine="python"
        ),
        "dict_mention_auto": lambda: extract.detect_mentions_dictionary(
            transcripts, entities, names=names
        ),
        "link_broadcast": lambda: linked_b,
        "link_salted": lambda: linking.link_mentions(
            mentions, entities, strategy="salted"
        ),
        "bom_edges": lambda: edges,
        "triples_union": lambda: triples,
        "ntriples_render": lambda: materialize.ntriples_lines(triples),
        "triple_counts_agg": lambda: materialize.triple_counts(triples),
        "top_assemblies": lambda: materialize.top_assemblies(edges),
        "dedup_exact": lambda: dd.exact_dedup(dupd),
        "dedup_minhash_lsh": lambda: dd.lsh_candidate_pairs(dupd),
        "dedup_simhash": lambda: dd.simhash_near_dups(dupd),
        "dedup_spans": lambda: dd.repeated_spans(dupd),
        "ann_cosine_topk": lambda: sim.cosine_topk(
            emb.filter(F.col("vec_id") % 50 == 0), emb, k=5
        ),
        "embedding_near_dups_lsh": lambda: sim.embedding_near_dups(
            sim.vecs_with_dups(emb), threshold=0.9
        ),
        "ann_ivf_topk": lambda: sim.ivf_ann_topk(
            emb.filter(F.col("vec_id") % 50 == 0), emb, k=5
        ),
        "multimodal_decode": lambda: mm.decode_features(mm.attach_media(docs)),
        "multimodal_resize": lambda: mm.resize_images(mm.attach_media(docs), 8, 8),
    }

    for name, build in plans.items():
        try:
            df = build()
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}")
        except Exception as e:  # pragma: no cover
            print(f"FAILED {name}: {e}")

    # Fixpoint loops (closure, CC, dedup_clusters/curate) execute eagerly
    # during plan construction, so explain() of the *result* frame shows
    # only checkpoint scans; instead capture the per-round join plan.
    sub = edges.filter(
        (F.col("parent").cast("bigint") + F.col("child").cast("bigint")) % 20 == 0
    )
    base = sub.select("parent", "child").dropDuplicates().localCheckpoint(eager=True)
    if tag == "before":
        # round-5 round shape: delta-doubling join + dedup + anti
        grown = (
            base.alias("l")
            .join(base.alias("r"), F.col("l.child") == F.col("r.parent"))
            .select(F.col("l.parent").alias("parent"), F.col("r.child").alias("child"))
            .dropDuplicates()
            .join(base, ["parent", "child"], "left_anti")
        )
    else:
        # round-6 round shape: broadcast exact-prefix frontier over long
        # ids, min-dist aggregate, anti vs closure
        e = base.select(
            F.col("parent").cast("bigint").alias("p"),
            F.col("child").cast("bigint").alias("c"),
        ).withColumn("dist", F.lit(1).cast("long"))
        cp = e.localCheckpoint(eager=True)
        grown = (
            F.broadcast(cp)
            .alias("l")
            .join(cp.alias("r"), F.col("l.c") == F.col("r.p"))
            .select(
                F.col("l.p").alias("p"),
                F.col("r.c").alias("c"),
                (F.col("l.dist") + F.col("r.dist")).alias("dist"),
            )
            .groupBy("p", "c")
            .agg(F.min("dist").alias("dist"))
            .join(cp, ["p", "c"], "left_anti")
        )
    buf = io.StringIO()
    with redirect_stdout(buf):
        grown.explain("formatted")
    with open(os.path.join(OUT_DIR, f"transitive_closure_round_{tag}.txt"), "w") as f:
        f.write(buf.getvalue())
    print("wrote closure round plan")


if __name__ == "__main__":
    main()
