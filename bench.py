"""Benchmark harness.

Runs the headline KG-construction stages at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries": {name:
sec}, "sf", plus throughput and two-parallelism scaling evidence
(local[8] vs local[32] flagship runs in fresh JVMs — the sandbox
stand-in for N vs 4N executors, BASELINE.md)}.

Usage:
  python bench.py                 # full suite + scaling evidence
  python bench.py --flagship N    # internal: flagship at N cores -> JSON
  python bench.py --no-scaling    # skip the subprocess scaling runs
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_flagship(cores: int) -> dict:
    """Full pipeline (extract -> link -> edges -> closure(sampled) ->
    triples -> counts) at the given parallelism; returns secs + triples."""
    from kgforge.pipeline import run_pipeline
    from kgforge.session import get_spark

    spark = get_spark(f"kgforge-bench-{cores}", cores=cores, shuffle_partitions=cores)
    # warm the JVM + parquet footers so we time the pipeline, not startup
    spark.read.parquet(f"{SF_DIR}/part.parquet").count()
    t0 = time.perf_counter()
    stats = run_pipeline(spark, SF_DIR, out_dir=None, closure_edge_mod=20)
    secs = time.perf_counter() - t0
    return {"seconds": secs, "triples": stats["total_triples"], "cores": cores}


def bench_queries() -> dict[str, float]:
    """Per-stage timings on the shared session."""
    from pyspark.sql import functions as F

    from kgforge import extract, fixtures, graph, linking, materialize
    from kgforge.session import get_spark

    spark = get_spark("kgforge-bench", cores=CPUS, shuffle_partitions=CPUS)
    spark.read.parquet(f"{SF_DIR}/part.parquet").count()  # warmup

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)

    transcripts = fixtures.load_transcripts(spark, SF_DIR)
    entities = fixtures.load_entities(spark, SF_DIR)
    timed("transcripts_scan", lambda: transcripts.count())

    mentions = extract.extract_mentions(transcripts)
    timed("extract_mentions", lambda: mentions.count())

    linked_b = linking.link_mentions(mentions, entities, strategy="broadcast")
    timed("link_broadcast", lambda: linked_b.count())
    linked_s = linking.link_mentions(mentions, entities, strategy="salted")
    timed("link_salted", lambda: linked_s.count())

    edges = graph.bom_edges_from_linked(linked_b).cache()
    timed("bom_edges", lambda: edges.count())

    sub = edges.filter(
        (F.col("parent").cast("bigint") + F.col("child").cast("bigint")) % 20 == 0
    )
    timed("transitive_closure", lambda: graph.transitive_closure(sub).count())

    triples = materialize.union_triples(
        materialize.part_triples(entities),
        materialize.bom_triples(edges),
        materialize.used_in_triples(edges),
    )
    timed("triples_union_count", lambda: triples.count())
    timed("triple_counts_agg", lambda: materialize.triple_counts(triples).collect())
    timed("top_assemblies", lambda: materialize.top_assemblies(edges).collect())

    det = extract.detect_mentions_dictionary(transcripts, entities)
    timed("dict_mention_udf", lambda: det.count())

    edges.unpersist()
    return timings


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--flagship":
        print(json.dumps(run_flagship(int(sys.argv[2]))))
        return

    no_scaling = "--no-scaling" in sys.argv
    timings = bench_queries()

    result = {
        "metric": "kg_construct_suite",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
    }

    if not no_scaling:
        scaling = {}
        for cores in (8, 32):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--flagship", str(cores)],
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
                env={**os.environ, "SPARK_GRAFT_SF_DIR": SF_DIR},
                timeout=1800,
            )
            line = out.stdout.strip().splitlines()[-1]
            scaling[f"local[{cores}]"] = json.loads(line)
        t8 = scaling["local[8]"]["seconds"]
        t32 = scaling["local[32]"]["seconds"]
        triples = scaling["local[32]"]["triples"]
        scaling["speedup_8_to_32"] = round(t8 / t32, 3)
        scaling["efficiency"] = round((t8 / t32) / 4.0, 3)
        scaling["throughput_triples_per_sec_32"] = round(triples / t32, 1)
        result["scaling"] = scaling

    print(json.dumps(result))


if __name__ == "__main__":
    main()
