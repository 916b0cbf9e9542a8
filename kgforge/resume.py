"""Checkpoint/resume for graph materialization (SURVEY.md §2.9, §4.3).

The reference gets idempotency from per-batch Cypher MERGE
(/root/reference/src/utils/spreadsheet_loader.py:613-626) or full
clear-and-reload (:480-484). We replace both with a *per-partition
commit manifest*: triples are bucketed by subject hash (north rule:
subject-hash partitioning), each bucket group is written with dynamic
partition overwrite (so a re-run of an uncommitted bucket replaces any
partial files instead of duplicating them), and the manifest — bucket
ids, row counts, lineage — is committed atomically (tmp + rename) after
each group. Resume = anti-set of bucket ids vs the manifest.

On a cluster this manifest lives in Iceberg snapshot summary properties
and the write is `MERGE INTO`/replace-partition; the protocol is the
same, only the commit primitive changes.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 32


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.json")


def read_manifest(out_dir: str) -> dict:
    path = _manifest_path(out_dir)
    if not os.path.exists(path):
        return {"committed": {}}
    with open(path) as f:
        return json.load(f)


def _commit_manifest(out_dir: str, manifest: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=out_dir, prefix="_manifest", suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(out_dir))


class InjectedFailure(RuntimeError):
    """Raised by the fault-injection hook in the kill-and-rerun test."""


def write_triples_resumable(
    triples: DataFrame,
    out_dir: str,
    n_buckets: int = DEFAULT_BUCKETS,
    commit_every: int = 8,
    lineage: str = "",
    fail_after_commits: int | None = None,
) -> dict:
    """Write the triple table partitioned by subject-hash bucket, with
    incremental manifest commits; resumes past already-committed buckets.

    Returns the final manifest. ``fail_after_commits`` injects a crash
    after N successful commit groups (test hook).
    """
    spark = triples.sparkSession
    manifest = read_manifest(out_dir)
    committed = set(int(k) for k in manifest["committed"])
    todo = [b for b in range(n_buckets) if b not in committed]
    if not todo:
        return manifest

    bucketed = triples.withColumn(
        "subj_bucket", F.pmod(F.xxhash64("subj"), F.lit(n_buckets)).cast("int")
    )
    data_dir = os.path.join(out_dir, "triples")
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        commits_done = 0
        for i in range(0, len(todo), commit_every):
            group = todo[i : i + commit_every]
            chunk = bucketed.filter(F.col("subj_bucket").isin(group))
            # dynamic overwrite replaces exactly the partitions in `group`
            # -> idempotent under re-run of an uncommitted group.
            chunk.write.mode("overwrite").partitionBy("subj_bucket").parquet(data_dir)
            counts = {
                str(r["subj_bucket"]): r["n"]
                for r in chunk.groupBy("subj_bucket").agg(F.count("*").alias("n")).collect()
            }
            now = datetime.now(timezone.utc).isoformat()
            for b in group:
                manifest["committed"][str(b)] = {
                    "n_triples": counts.get(str(b), 0),
                    "lineage": lineage,
                    "committed_at": now,
                }
            # Iceberg-style snapshot log: every commit group appends one
            # snapshot whose id is a content hash chaining the parent —
            # the linear history a table's snapshot metadata carries, so
            # a resume's provenance (which run committed which buckets)
            # is auditable after the fact.
            snapshots = manifest.setdefault("snapshots", [])
            parent_id = snapshots[-1]["snapshot_id"] if snapshots else None
            payload = json.dumps(
                [parent_id, group, counts, lineage], sort_keys=True
            ).encode()
            snapshots.append(
                {
                    "snapshot_id": hashlib.sha256(payload).hexdigest()[:16],
                    "parent_snapshot_id": parent_id,
                    "buckets": group,
                    "n_triples": int(sum(counts.get(str(b), 0) for b in group)),
                    "lineage": lineage,
                    "committed_at": now,
                }
            )
            _commit_manifest(out_dir, manifest)
            commits_done += 1
            if fail_after_commits is not None and commits_done >= fail_after_commits:
                raise InjectedFailure(f"injected failure after {commits_done} commits")
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    return manifest


def read_triples(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "triples"))
