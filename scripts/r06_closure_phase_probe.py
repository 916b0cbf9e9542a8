"""Phase-level timing of the bench transitive_closure entry and the
curate_corpus stages at HEAD (guide §1: attribute before optimizing).

Times, in one fresh session mirroring the bench:
- closure: edges build, setup (probe agg), per-round loop, decode+count;
- curate: funnel agg, LSH pairs, CC kernel, member+keeper, span stage,
  boundary counts — each as the marginal cost of a staged rebuild.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    from kgforge import extract, fixtures, graph, linking
    from kgforge.datapipe import curate as cu
    from kgforge.datapipe import dedup as dd
    from kgforge.session import get_spark

    spark = get_spark("r06-phase-probe", cores=CPUS, shuffle_partitions=CPUS)
    sc = spark.sparkContext
    spark.read.parquet(f"{SF_DIR}/part.parquet").count()

    transcripts = fixtures.load_transcripts(spark, SF_DIR)
    entities = fixtures.load_entities(spark, SF_DIR)
    mentions = extract.extract_mentions(transcripts)
    linked_b = linking.link_mentions(mentions, entities, strategy="broadcast")
    edges = graph.bom_edges_from_linked(linked_b).cache()
    edges.count()
    sub = edges.filter(
        (F.col("parent").cast("bigint") + F.col("child").cast("bigint")) % 20 == 0
    )

    def t(name, fn):
        sc.setJobDescription(name)
        t0 = time.perf_counter()
        r = fn()
        dt = round(time.perf_counter() - t0, 3)
        sc.setJobDescription(None)
        print(f"{name}: {dt}", flush=True)
        return r

    # closure entry, twice (first-run + warm), with stats
    for lap in range(3):
        stats: dict = {}
        t(f"closure.lap{lap}", lambda: graph.transitive_closure(sub, stats=stats).count())
        print(f"  stats: {json.dumps(stats)}", flush=True)

    # curate staged attribution (warm session): marginal costs
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dupd = dd.docs_with_dups(docs)
    for lap in range(2):
        # a) funnel agg alone
        from kgforge.datapipe import text as dtext

        toks = dtext.token_count_ws(F.col("text"))
        run = (dtext.lang_id(F.col("text")) == "en") & (toks >= 3)
        t(f"curate.funnel_agg.lap{lap}", lambda: dupd.agg(
            F.count("*"), F.sum(run.cast("long"))
        ).first())
        filtered = dupd.filter(run)
        cached = t(f"curate.filter_cache_count.lap{lap}", lambda: (lambda d: (d.count(), d))(filtered.cache())[1])
        pairs = dd.lsh_candidate_pairs(cached)
        t(f"curate.lsh_pairs.lap{lap}", lambda: pairs.count())
        clusters = t(f"curate.cc_build.lap{lap}", lambda: dd.dedup_clusters(cached, pairs))
        t(f"curate.clusters_count.lap{lap}", lambda: clusters.count())
        losers = clusters.filter(~F.col("keep")).select("doc_id")
        kept = t(
            f"curate.keeper_anti_cache.lap{lap}",
            lambda: (lambda d: (d.count(), d))(cached.join(losers, "doc_id", "left_anti").cache())[1],
        )
        spans = dd.repeated_spans(kept, min_docs=2)
        t(f"curate.spans.lap{lap}", lambda: spans.count())
        rewritten = dd.remove_repeated_spans(kept, spans)
        t(
            f"curate.rewrite_join_count.lap{lap}",
            lambda: kept.drop("text").join(rewritten, "doc_id").count(),
        )
        cached.unpersist()
        kept.unpersist()
        # b) whole composed pipeline for comparison
        def curate_run():
            k, _f = cu.curate_corpus(
                dupd, lang="en", min_tokens=3, dedup="cluster", span_min_docs=2
            )
            n = k.count()
            k.unpersist()
            return n

        t(f"curate.full.lap{lap}", curate_run)


if __name__ == "__main__":
    main()
