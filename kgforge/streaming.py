"""Structured Streaming ingest for transcript tables.

The reference is purely batch (SURVEY.md §2.9) — its resumability ideas
map to resume.py. This module adds the streaming front door a
transcript KG needs in production: a file/table stream of turns,
watermarked dedup on the (conv_id, turn_idx) key, and incremental
extract+link+triples via ``foreachBatch`` (each micro-batch reuses the
exact batch operators, so streaming and batch semantics cannot drift).

Tested with ``trigger(availableNow=True)`` — the bounded-backfill mode
that replays a directory once and exits, which is also the idiomatic
pattern for incremental Iceberg ingestion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgforge import extract, graph, linking
from kgforge.schema import TRANSCRIPT_SCHEMA


def read_transcript_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of transcript rows (parquet parts dropped into
    ``path``). On a cluster this is ``spark.readStream.format("iceberg")``
    or Kafka; the transformation graph below is identical."""
    return spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(path)


def deduped_turns(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once turn stream: watermark on ts +
    ``dropDuplicatesWithinWatermark`` on the (conv_id, turn_idx) key —
    late replays of a turn inside the watermark window are dropped, per
    the stable-turn-ordering invariant. WithinWatermark (not plain
    dropDuplicates) because the event-time column is not part of the
    key: the plain form would never evict dedup state and grow it
    unboundedly in continuous mode."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )


def mention_chain_stream(stream: DataFrame) -> DataFrame:
    """Custom *stateful* streaming operator (``applyInPandasWithState``):
    per-conversation mention chaining across micro-batches.

    Each turn's ``ref`` mention is linked to the previous turn's mention
    *within the conversation* — the streaming analogue of the batch
    ``lag(mention) over (partition by conv_id order by turn_idx)``
    window. The last seen (turn_idx, mention) per conversation lives in
    the state store, so a chain spans micro-batches and survives query
    restarts (state is checkpoint-recovered); ``foreachBatch`` alone
    cannot express this because the linkage crosses batch boundaries.

    Assumes per-conversation turns arrive in order across batches (an
    append-only transcript log); within a batch rows are sorted by
    turn_idx. Output equals the batch-extracted ``parent=[...]`` markup
    on the fixture corpus (pytest-asserted, including a two-query
    restart).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from kgforge.extract import REF_PATTERN

    out_schema = "conv_id string, turn_idx int, mention string, parent_mention string"
    state_schema = "last_turn int, last_mention string"

    with_mention = stream.withColumn(
        "mention", F.regexp_extract("text", REF_PATTERN, 1)
    ).filter(F.col("mention") != "").select("conv_id", "turn_idx", "mention")

    def chain(key, pdfs, state):
        rows = pd.concat(list(pdfs)).sort_values("turn_idx")
        last_turn, last_mention = state.get if state.exists else (-1, None)
        out = []
        for r in rows.itertuples():
            out.append((key[0], int(r.turn_idx), r.mention, last_mention))
            last_turn, last_mention = int(r.turn_idx), r.mention
        state.update((last_turn, last_mention))
        yield pd.DataFrame(
            out, columns=["conv_id", "turn_idx", "mention", "parent_mention"]
        )

    return with_mention.groupBy("conv_id").applyInPandasWithState(
        chain, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_mention_chains(
    spark: SparkSession, in_path: str, out_path: str, checkpoint: str
):
    """Run the stateful chaining operator over a file stream, appending
    chained mention rows to parquet. Returns the started query."""
    chained = mention_chain_stream(read_transcript_stream(spark, in_path))
    return (
        chained.writeStream.option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_path)
        .start()
    )


def stream_triples(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    entities: DataFrame,
    watermark: str = "1 hour",
):
    """Incremental KG construction: per micro-batch, run the *batch*
    extract -> link -> edge pipeline and append hasComponent edges to a
    parquet table. Returns the started query (call awaitTermination).

    foreachBatch (not a continuous aggregation) because linking joins a
    static dictionary and edge assembly is per-turn — no cross-batch
    state beyond dedup, which the watermark handles.
    """
    turns = deduped_turns(read_transcript_stream(spark, in_path), watermark)

    def process(batch: DataFrame, batch_id: int) -> None:
        mentions = extract.extract_mentions(batch)
        linked = linking.link_mentions(mentions, entities, strategy="broadcast")
        edges = graph.bom_edges_from_linked(linked)
        (
            edges.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_path)
        )

    return (
        turns.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_deliver_ntriples(
    spark: SparkSession,
    in_path: str,
    checkpoint: str,
    entities: DataFrame,
    transport,
    batch_size: int = 1000,
    watermark: str = "1 hour",
):
    """Streaming graph-store delivery: per micro-batch, extract -> link
    -> edges -> bom triples -> N-Triples lines -> the connector's
    executor-parallel delivery leg (content-hash chunk ids, bounded
    backoff). Returns the started query.

    End-to-end semantics: the stream side is exactly-once per turn
    (watermarked dedup + checkpointed source offsets — a replayed
    micro-batch after a crash re-delivers the SAME content-hash chunk
    ids), and the delivery side is at-least-once + idempotent, so an
    id-deduping transport or a set-semantics RDF store lands each triple
    once. This is the streaming analogue of the reference's batch POST
    loop (spreadsheet_loader.py:1027-1038), which has no streaming
    story at all.
    """
    from kgforge import connector, materialize

    turns = deduped_turns(read_transcript_stream(spark, in_path), watermark)

    def process(batch: DataFrame, batch_id: int) -> None:
        mentions = extract.extract_mentions(batch)
        linked = linking.link_mentions(mentions, entities, strategy="broadcast")
        edges = graph.bom_edges_from_linked(linked)
        lines = materialize.ntriples_lines(materialize.bom_triples(edges))
        connector.deliver_ntriples(lines, transport, batch_size=batch_size)

    return (
        turns.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
