"""First-run A/B for the similarity entries: codegen flat-Add cosine
fold vs the interpreted aggregate fold.

The suite times every entry ONCE per session, so per-plan costs
(whole-stage codegen compilation of the 64-term Add chains) count.
This probe runs each similarity entry in a FRESH subprocess session per
arm (first-run conditions, like the suite) and reports wall times.

Usage: python scripts/r06_sim_firstrun_ab.py            # run both arms x reps
       python scripts/r06_sim_firstrun_ab.py child <arm> # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def child(arm: str) -> None:
    from pyspark.sql import functions as F

    from kgforge.datapipe import similarity as sim
    from kgforge.session import get_spark

    if arm == "interp":
        sim._dot_fast = lambda a, b, dim=64: sim._dot(a, b)
        sim._norm_fast = lambda a, dim=64: sim._norm(a)

    spark = get_spark("sim-ab", cores=CPUS, shuffle_partitions=CPUS)
    spark.read.parquet(f"{SF_DIR}/part.parquet").count()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = {}
    for name, fn in (
        (
            "ann_cosine_topk",
            lambda: sim.cosine_topk(
                emb.filter(F.col("vec_id") % 50 == 0), emb, k=5
            ).count(),
        ),
        (
            "embedding_near_dups_lsh",
            lambda: sim.embedding_near_dups(sim.vecs_with_dups(emb), threshold=0.9).count(),
        ),
        (
            "ann_ivf_topk",
            lambda: sim.ivf_ann_topk(
                emb.filter(F.col("vec_id") % 50 == 0), emb, k=5
            ).count(),
        ),
    ):
        t0 = time.perf_counter()
        fn()
        out[name] = round(time.perf_counter() - t0, 3)
    print("CHILD_RESULT " + json.dumps({"arm": arm, "times": out}), flush=True)


def main() -> None:
    reps = int(os.environ.get("AB_REPS", "3"))
    results: dict[str, list[dict]] = {"fast": [], "interp": []}
    for r in range(reps):
        for arm in ("fast", "interp") if r % 2 == 0 else ("interp", "fast"):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "child", arm],
                capture_output=True,
                text=True,
                timeout=600,
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("CHILD_RESULT ")]
            if not line:
                print(f"arm {arm} rep {r} failed: {p.stderr[-500:]}")
                continue
            rec = json.loads(line[-1].split(" ", 1)[1])
            results[arm].append(rec["times"])
            print(f"rep{r} {arm}: {rec['times']}", flush=True)
    for arm, rows in results.items():
        if rows:
            mins = {k: min(row[k] for row in rows) for k in rows[0]}
            print(f"{arm} min: {mins}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(sys.argv[2])
    else:
        main()
