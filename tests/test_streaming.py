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


def test_stateful_mention_chain_spans_batches_and_restarts(spark, sf_dir, tmp_path):
    """The applyInPandasWithState chain must link a turn to the previous
    turn's mention even when they arrive in DIFFERENT streaming queries
    (state recovered from the checkpoint), and must equal the batch
    lag()-derived parent markup embedded in the fixture text."""
    from pyspark.sql import functions as F

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    transcripts = fixtures.load_transcripts(spark, sf_dir).filter(
        F.col("conv_id").isin([r.conv_id for r in
            fixtures.load_transcripts(spark, sf_dir).select("conv_id").distinct().limit(50).collect()])
    ).cache()

    # batch 1: early turns; batch 2 (separate query, same checkpoint): the rest
    transcripts.filter("turn_idx < 3").write.mode("overwrite").parquet(in_dir)
    streaming.stream_mention_chains(spark, in_dir, out_dir, ckpt).awaitTermination(300)
    transcripts.filter("turn_idx >= 3").write.mode("append").parquet(in_dir)
    streaming.stream_mention_chains(spark, in_dir, out_dir, ckpt).awaitTermination(300)

    got = {
        (r.conv_id, r.turn_idx): r.parent_mention
        for r in spark.read.parquet(out_dir).collect()
    }
    # expected: the parent=[...] markup the fixture embeds (= lag(mention))
    want = {
        (r.conv_id, r.turn_idx): r.mention
        for r in extract.extract_mentions(transcripts).filter("slot = 'parent'").collect()
    }
    # every turn with an embedded parent must be chained identically —
    # including turn 3, whose parent (turn 2) arrived in the earlier query
    assert want, "fixture must contain parent markup"
    for key, parent in want.items():
        assert got.get(key) == parent, (key, parent, got.get(key))
    # first turn of each conversation has no parent
    firsts = [k for k, v in got.items() if k[1] == 0]
    assert firsts and all(got[k] is None for k in firsts)
    transcripts.unpersist()


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


def test_stream_deliver_ntriples_exactly_once(spark, sf_dir, tmp_path):
    """Streaming delivery leg: every micro-batch's bom triples reach the
    transport as content-hash-keyed chunks; a flaky transport (first
    attempt per chunk fails) still lands every line exactly once on
    disk, and the delivered set equals the batch-computed triples."""
    from kgforge import materialize

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = tmp_path / "delivered"
    out.mkdir()
    out_s = str(out)

    transcripts = fixtures.load_transcripts(spark, sf_dir)
    entities = fixtures.load_entities(spark, sf_dir)
    transcripts.write.mode("overwrite").parquet(in_dir)

    def flaky_file_transport(payload: bytes, batch_id: str) -> bool:
        import os

        marker = os.path.join(out_s, batch_id + ".attempted")
        if not os.path.exists(marker):
            open(marker, "w").close()
            return False
        with open(os.path.join(out_s, batch_id + ".nt"), "wb") as f:
            f.write(payload)
        return True

    q = streaming.stream_deliver_ntriples(
        spark, in_dir, ckpt, entities, flaky_file_transport, batch_size=200
    )
    q.awaitTermination(300)

    delivered = set()
    for p in out.glob("*.nt"):
        delivered.update(p.read_text().splitlines())
    edges = graph.bom_edges_from_linked(
        linking.link_mentions(extract.extract_mentions(transcripts), entities)
    )
    want = {
        r["line"]
        for r in materialize.ntriples_lines(materialize.bom_triples(edges)).collect()
    }
    assert delivered == want and want
