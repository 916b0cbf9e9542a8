"""Similarity search over the embeddings table (vec_id, embedding:
array<float>, label).

- :func:`cosine_topk` — exact brute-force top-k: JVM-side
  ``zip_with``/``aggregate`` dot products (double accumulation, no
  Python in the loop), ranked per query with a window. The baseline.
- :func:`lsh_ann_topk` — random-hyperplane LSH bucketing: queries only
  score candidates sharing a signature bucket (multi-probe over bands).
  The scale path: at 10^9 vectors the cross product is impossible; the
  bucket join bounds comparisons. Planes are derived deterministically
  from md5 so results are reproducible everywhere.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_pairs(queries: DataFrame, corpus: DataFrame) -> DataFrame:
    """All (query, candidate) cosine similarities; callers rank/filter."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), _as_double(F.col("embedding")).alias("qv")
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"), _as_double(F.col("embedding")).alias("cv")
    )
    sim = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    return (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
    )


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k by cosine, deterministic tie-break on neighbor_id.
    cosine_e4 (floored 1e4 scale) keeps cross-engine compares exact."""
    ranked = cosine_pairs(queries, corpus).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
        ),
    )
    return ranked.filter(F.col("rank") <= k).select(
        "query_id",
        "neighbor_id",
        "rank",
        F.floor(F.col("cosine") * 10000).cast("bigint").alias("cosine_e4"),
    )


# ------------------------------------------------------------------ LSH ANN
def _hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes: component
    (p, d) = md5-derived uniform in [-1, 1). No RNG state, identical on
    every executor/engine."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int.from_bytes(hashlib.md5(f"plane:{p}:{d}".encode()).digest()[:8], "big")
            row.append(h / float(1 << 63) - 1.0)
        planes.append(row)
    return planes


def lsh_signatures(
    vectors: DataFrame, n_planes: int = 16, dim: int = 64, band_size: int = 4
) -> DataFrame:
    """Sign-bit signature per vector, split into bands of ``band_size``
    bits -> (vec_id, band, bucket). Multi-probe: a vector lands in one
    bucket per band; near vectors collide on >=1 band with high
    probability. Narrow bands raise recall (more collisions), wide
    bands raise selectivity — tune per corpus geometry."""
    planes = _hyperplanes(n_planes, dim)
    emb = _as_double(F.col("embedding"))
    bits = [
        (_dot(emb, F.array(*[F.lit(w) for w in plane])) > 0).cast("int").alias(f"b{i}")
        for i, plane in enumerate(planes)
    ]
    sig = vectors.select("vec_id", *bits)
    n_bands = max(1, n_planes // band_size)
    bands = []
    for band in range(n_bands):
        cols = [F.col(f"b{i}") for i in range(band * band_size, (band + 1) * band_size)]
        bucket = F.concat_ws("", *[c.cast("string") for c in cols])
        bands.append(
            sig.select(
                "vec_id", F.lit(band).alias("band"), bucket.alias("bucket")
            )
        )
    out = bands[0]
    for b in bands[1:]:
        out = out.unionByName(b)
    return out


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 16,
    dim: int = 64,
    band_size: int = 4,
) -> DataFrame:
    """Approximate top-k: score only bucket-colliding candidates."""
    qs = lsh_signatures(queries, n_planes, dim, band_size).withColumnRenamed("vec_id", "query_id")
    cs = lsh_signatures(corpus, n_planes, dim, band_size).withColumnRenamed("vec_id", "neighbor_id")
    cand = (
        qs.join(cs, ["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates()
    )
    q = queries.select(F.col("vec_id").alias("query_id"), _as_double(F.col("embedding")).alias("qv"))
    c = corpus.select(F.col("vec_id").alias("neighbor_id"), _as_double(F.col("embedding")).alias("cv"))
    sim = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    scored = (
        cand.join(q, "query_id")
        .join(c, "neighbor_id")
        .select("query_id", "neighbor_id", sim.alias("cosine"))
    )
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
        ),
    )
    return ranked.filter(F.col("rank") <= k).select(
        "query_id",
        "neighbor_id",
        "rank",
        F.floor(F.col("cosine") * 10000).cast("bigint").alias("cosine_e4"),
    )


def embedding_near_dups(vectors: DataFrame, threshold: float = 0.999) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (doc_a < doc_b) — the
    vector-space analogue of MinHash dedup; exact over the cross
    product here, LSH-bucketed (lsh_signatures) at scale."""
    pairs = cosine_pairs(vectors, vectors).filter(F.col("query_id") < F.col("neighbor_id"))
    return pairs.filter(F.col("cosine") >= threshold).select(
        F.col("query_id").alias("doc_a"),
        F.col("neighbor_id").alias("doc_b"),
        F.floor(F.col("cosine") * 10000).cast("bigint").alias("cosine_e4"),
    )
