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
