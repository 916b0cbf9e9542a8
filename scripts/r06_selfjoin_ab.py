"""A/B probe: self-join bucket pair generation vs single-pass bucket
enumeration for minhash-LSH and simhash candidate pairs.

The current operators self-join the banded signature frame; Spark 4.1
re-evaluates the signature subtree once per side (verified in round 6
with an accumulator probe). The candidate replacement groups by bucket
key and enumerates in-bucket (a < b) pairs from the sorted doc array
with pure expressions — one subtree evaluation, no self-join.

Checks output equality at sf0.001/sf0.01, then times both at sf0.1.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def new_lsh_pairs(documents, k=3, n_hashes=16, band_size=4):
    from pyspark.sql import functions as F

    from kgforge.datapipe import dedup as dd

    bands = dd.minhash_band_keys(documents, k, n_hashes, band_size)
    buckets = bands.groupBy("band", "band_key").agg(
        F.array_sort(F.collect_list("doc_id")).alias("ids")
    )
    exploded = buckets.select(
        F.col("ids"), F.posexplode("ids").alias("i", "doc_a")
    )
    return (
        exploded.select(
            "doc_a",
            F.explode(
                F.slice(F.col("ids"), F.col("i") + 2, F.size("ids"))
            ).alias("doc_b"),
        )
        .dropDuplicates()
    )


def new_simhash_pairs(documents, max_hamming=3, n_bands=4):
    from pyspark.sql import functions as F

    from kgforge.datapipe import dedup as dd

    hashed = documents.select("doc_id", dd.simhash_udf(F.col("text")).alias("sh"))
    chunk_bits = 64 // n_bands
    chunks = hashed.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("sh"), i * chunk_bits)
                        .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                        .alias("chunk"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bc"),
    ).select("doc_id", "sh", "bc.band", "bc.chunk")
    buckets = chunks.groupBy("band", "chunk").agg(
        F.array_sort(F.collect_list(F.struct("doc_id", "sh"))).alias("m")
    )
    exploded = buckets.select(
        F.col("m"), F.posexplode("m").alias("i", "a")
    )
    cand = (
        exploded.select(
            "a",
            F.explode(F.slice(F.col("m"), F.col("i") + 2, F.size("m"))).alias("b"),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def main() -> None:
    from pyspark.sql import functions as F

    from kgforge.datapipe import dedup as dd
    from kgforge.session import get_spark

    spark = get_spark("r06-selfjoin-ab", cores=CPUS, shuffle_partitions=CPUS)
    sc = spark.sparkContext
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()

    # --- equality at small SFs ---
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = dd.docs_with_dups(spark.read.parquet(f"{sf}/documents.parquet"))
        old_l = set(map(tuple, dd.lsh_candidate_pairs(docs).collect()))
        new_l = set(map(tuple, new_lsh_pairs(docs).collect()))
        assert old_l == new_l, (sf, "lsh", len(old_l), len(new_l))
        old_s = set(map(tuple, dd.simhash_near_dups(docs).collect()))
        new_s = set(map(tuple, new_simhash_pairs(docs).collect()))
        assert old_s == new_s, (sf, "simhash", len(old_s), len(new_s))
        print(f"{sf}: lsh {len(old_l)} pairs equal; simhash {len(old_s)} rows equal", flush=True)

    # --- timing at SF_DIR ---
    docs = dd.docs_with_dups(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    res = {}
    for name, fn in (
        ("lsh_old", lambda: dd.lsh_candidate_pairs(docs).count()),
        ("lsh_new", lambda: new_lsh_pairs(docs).count()),
        ("simhash_old", lambda: dd.simhash_near_dups(docs).count()),
        ("simhash_new", lambda: new_simhash_pairs(docs).count()),
    ):
        times = []
        for _ in range(4):
            sc.setJobDescription(name)
            t0 = time.perf_counter()
            n = fn()
            times.append(round(time.perf_counter() - t0, 3))
        sc.setJobDescription(None)
        res[name] = times
        print(f"{name}: n={n} laps={times} min={min(times)}", flush=True)
    print(res)


if __name__ == "__main__":
    main()
