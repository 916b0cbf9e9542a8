"""Behavioral tests for the training-data pipeline ops that have no SQL
oracle: SimHash (pure-python oracle), LSH ANN (recall vs brute force),
multimodal plumbing (sha256 vs hashlib), rolling fingerprints."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kgforge.datapipe import dedup as dd
from kgforge.datapipe import multimodal as mm
from kgforge.datapipe import similarity as sim


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_simhash_udf_matches_python(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(50)
    got = {
        r.doc_id: r.sh
        for r in docs.select("doc_id", dd.simhash_udf(F.col("text")).alias("sh")).collect()
    }
    want = {r.doc_id: dd.simhash64(r.text) for r in docs.collect()}
    assert got == want


def test_simhash_near_dups_finds_injected_clones(spark, sf_dir):
    dups = dd.simhash_near_dups(dd.docs_with_dups(_docs(spark, sf_dir)), max_hamming=0)
    pairs = {(r.doc_a, r.doc_b) for r in dups.collect()}
    clones = {
        (r.doc_id, r.doc_id + 1000000)
        for r in _docs(spark, sf_dir).filter(F.col("doc_id") % 10 == 0).collect()
    }
    assert clones <= pairs  # identical texts -> hamming 0


def test_minhash_lsh_finds_injected_clones(spark, sf_dir):
    cand = dd.lsh_candidate_pairs(dd.docs_with_dups(_docs(spark, sf_dir)))
    pairs = {(r.doc_a, r.doc_b) for r in cand.collect()}
    clones = {
        (r.doc_id, r.doc_id + 1000000)
        for r in _docs(spark, sf_dir).filter(F.col("doc_id") % 10 == 0).collect()
    }
    assert clones <= pairs  # identical signatures collide in every band


def test_lsh_ann_recall_vs_bruteforce(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = {
        (r.query_id, r.neighbor_id) for r in sim.cosine_topk(queries, emb, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id) for r in sim.lsh_ann_topk(queries, emb, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    # random 64-d embeddings are a worst case for 16-plane LSH; assert
    # the mechanism works at all and report the number for BENCH notes
    assert recall > 0.05, f"recall collapsed: {recall}"


def test_multimodal_decode_plumbing(spark, sf_dir):
    media = mm.attach_media(_docs(spark, sf_dir).limit(40))
    feats = mm.decode_features(media)
    rows = {r.media_id: r for r in feats.collect()}
    src = {r.media_id: r for r in media.collect()}
    assert rows.keys() == src.keys()
    for mid, r in rows.items():
        payload = bytes(src[mid].payload)
        assert r.n_bytes == len(payload)
        assert r.sha256 == hashlib.sha256(payload).hexdigest()
        assert r.feat_width == src[mid].width // 2
        if src[mid].mime == "video/mp4":
            assert 1 <= r.n_frames <= 4
        else:
            assert r.n_frames is None
    assert [f.name for f in feats.schema.fields] == [
        "media_id", "n_bytes", "sha256", "feat_width", "feat_height", "n_frames",
    ]


def test_rolling_fingerprint_stable_under_small_edit(spark):
    from kgforge.datapipe.text import rolling_fingerprints
    import pandas as pd

    base = "the quick brown fox jumps over the lazy dog " * 6
    edited = base.replace("lazy", "sleepy", 1)
    fps = rolling_fingerprints(pd.Series([base, base, edited]))
    assert fps[0] == fps[1]  # deterministic
    assert fps[0] != fps[2]  # edit changes the fingerprint set
