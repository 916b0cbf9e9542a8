"""Graph-store delivery connector — the reference K1's HTTP leg
(spreadsheet_loader.py:1027-1038 batch_serialize + :415-434
GraphDBClient.post_ntriples) as a Spark ``foreachPartition`` sink.

The reference serializes <=batch_size triples per N-Triples chunk and
POSTs each chunk, logging-and-continuing on failure. Here every
*partition* renders its rows into <=batch_size-line chunks and hands
each chunk to a pluggable ``transport`` callable — executor-side, so a
1000-executor cluster delivers 1000 streams in parallel instead of the
reference's single loop. Semantics:

- **at-least-once + idempotent**: a chunk's ``batch_id`` is the content
  hash of its (sorted) lines, so Spark task retries or transport
  replays re-deliver the *same* id; an RDF store is a set, so replayed
  identical triples are a no-op (the reference relies on the same
  property), and a file/queue transport can dedupe on the id.
- **bounded backoff**: each chunk retries ``max_retries`` times with
  exponential backoff, then raises — the task fails and Spark's own
  task retry takes over (fail loudly; the reference's silent
  log-and-continue undercounts).
- **delivery accounting**: chunk/line counts come back through Spark
  accumulators (visible on the driver even though delivery runs on
  executors).

No HTTP client ships in this sandbox's hot path; the pytest transport
writes files (and injects transient failures). A real GraphDB transport
is the reference's urlopen POST with Content-Type application/n-triples.
"""

from __future__ import annotations

import hashlib
import time
from typing import Callable

from pyspark.sql import DataFrame

Transport = Callable[[bytes, str], bool]


def deliver_ntriples(
    lines: DataFrame,
    transport: Transport,
    batch_size: int = 1000,
    max_retries: int = 3,
    base_backoff_s: float = 0.05,
) -> dict:
    """Deliver a DataFrame of rendered N-Triples ``line`` strings through
    ``transport(payload, batch_id) -> bool``. Returns delivery stats.

    ``transport`` must be picklable (runs on executors). A False return
    or an exception counts as a failed attempt and is retried with
    exponential backoff; exhausting retries raises, failing the task.
    """
    spark = lines.sparkSession
    sc = spark.sparkContext
    chunks_acc = sc.accumulator(0)
    lines_acc = sc.accumulator(0)
    attempts_acc = sc.accumulator(0)

    def send(partition):
        buf: list[str] = []

        def flush():
            if not buf:
                return
            payload = ("\n".join(buf) + "\n").encode("utf-8")
            batch_id = hashlib.sha256("\n".join(sorted(buf)).encode("utf-8")).hexdigest()[:32]
            for attempt in range(max_retries):
                attempts_acc.add(1)
                try:
                    ok = transport(payload, batch_id)
                except Exception:
                    ok = False
                if ok:
                    chunks_acc.add(1)
                    lines_acc.add(len(buf))
                    buf.clear()
                    return
                if attempt < max_retries - 1:  # no pointless sleep before the raise
                    time.sleep(base_backoff_s * (2**attempt))
            raise RuntimeError(
                f"delivery failed after {max_retries} attempts (batch {batch_id})"
            )

        for row in partition:
            buf.append(row["line"])
            if len(buf) >= batch_size:
                flush()
        flush()

    lines.foreachPartition(send)
    return {
        "chunks_delivered": chunks_acc.value,
        "lines_delivered": lines_acc.value,
        "attempts": attempts_acc.value,
    }
