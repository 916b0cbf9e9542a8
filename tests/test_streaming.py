"""Structured Streaming ingest: availableNow backfill, watermarked dedup
on (conv_id, turn_idx), per-batch reuse of the batch operators."""

from __future__ import annotations

from kgforge import extract, fixtures, graph, linking, streaming


def test_stream_triples_matches_batch(spark, sf_dir, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    transcripts = fixtures.load_transcripts(spark, sf_dir)
    entities = fixtures.load_entities(spark, sf_dir)
    # drop the corpus into the stream source dir — WITH a duplicated
    # slice, which the watermarked dropDuplicates must eliminate
    transcripts.write.mode("overwrite").parquet(in_dir)
    transcripts.filter("turn_idx = 1").write.mode("append").parquet(in_dir)

    q = streaming.stream_triples(spark, in_dir, out_dir, ckpt, entities)
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir).select("parent", "child").dropDuplicates()
    want = graph.bom_edges_from_linked(
        linking.link_mentions(extract.extract_mentions(transcripts), entities)
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).isEmpty()
    assert want.exceptAll(got).isEmpty()


def test_stream_resume_is_incremental(spark, sf_dir, tmp_path):
    """Re-running with the same checkpoint processes nothing new."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    transcripts = fixtures.load_transcripts(spark, sf_dir).limit(2000)
    entities = fixtures.load_entities(spark, sf_dir)
    transcripts.write.mode("overwrite").parquet(in_dir)

    q = streaming.stream_triples(spark, in_dir, out_dir, ckpt, entities)
    q.awaitTermination(300)
    n1 = spark.read.parquet(out_dir).count()

    q2 = streaming.stream_triples(spark, in_dir, out_dir, ckpt, entities)
    q2.awaitTermination(300)
    n2 = spark.read.parquet(out_dir).count()
    assert n1 == n2, "checkpointed stream must not reprocess committed files"
