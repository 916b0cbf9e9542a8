"""Corpus curation: the composed training-data pipeline.

Every primitive in :mod:`kgforge.datapipe` is individually
oracle-checked; this module composes them into the shape a production
training-data build actually runs —

    language filter -> quality filter -> duplicate-cluster keeper
    -> (optional) cross-document repeated-span removal

— and returns both the curated corpus and the per-stage attrition
FUNNEL (the audit artifact every data pipeline publishes alongside its
output).  Pytest verifies the composition stage-by-stage against the
already-oracled primitives (tests/test_datapipe.py).

Scale shape: the filters are pure column expressions over one scan;
dedup adds the bucketed pair source + CC closure (never all-pairs);
span removal adds one shingle-keyed aggregate + equi-join.  The funnel
counts are one aggregate per stage boundary — at 100 TB those are
map-side-combined counts, not extra shuffles of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kgforge.datapipe import dedup as dd
from kgforge.datapipe import text as dtext


def curate_corpus(
    documents: DataFrame,
    *,
    lang: str | None = None,
    min_tokens: int | None = None,
    max_tokens: int | None = None,
    dedup: str = "cluster",
    span_min_docs: int | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Run the composed curation pipeline over ``documents``
    (doc_id, text, ...).

    - ``lang``: keep documents whose :func:`kgforge.datapipe.text
      .lang_id` prediction equals this code;
    - ``min_tokens`` / ``max_tokens``: whitespace-token length gate;
    - ``dedup``: ``"exact"`` (fingerprint groups, min-doc_id keeper),
      ``"cluster"`` (MinHash-LSH pairs -> connected-component clusters,
      longest-text keeper — catches near-dups pairwise banding alone
      would miss), or ``"none"``;
    - ``span_min_docs``: when set, additionally rewrite the surviving
      texts with cross-document repeated spans removed
      (:func:`kgforge.datapipe.dedup.repeated_spans` at this
      min-document threshold; output column ``text`` is the deduped
      text, ``n_tokens_removed`` records the cut).

    Returns ``(curated, funnel)`` where ``funnel`` is a list of
    ``{"stage", "n_in", "n_out"}`` dicts, one per applied stage.

    The frame returned after a shuffle-heavy stage (dedup, span
    removal) is CACHED and materialized by that stage's funnel count,
    and the previous stage's cache is released — so the LSH->CC subtree
    executes exactly once even though the funnel counts it and the
    caller then materializes the curated corpus (at 100 TB an uncached
    composition would replay the most expensive stage 2-3x).  The
    returned ``curated`` frame is the last such cache; callers should
    ``curated.unpersist()`` once it has been written out.
    """
    funnel: list[dict] = []
    cur = documents
    cached_prev: DataFrame | None = None

    def gate(stage: str, nxt: DataFrame, n_in: int, cache: bool = False) -> int:
        nonlocal cached_prev
        if cache:
            nxt = nxt.cache()
        n_out = nxt.count()  # materializes the new cache when cache=True
        if cache and cached_prev is not None:
            cached_prev.unpersist()  # only after the successor is materialized
        if cache:
            cached_prev = nxt
        funnel.append({"stage": stage, "n_in": n_in, "n_out": n_out})
        return n_out

    n = cur.count()
    if lang is not None:
        cur = cur.filter(dtext.lang_id(F.col("text")) == lang)
        n = gate("lang", cur, n)
    if min_tokens is not None or max_tokens is not None:
        toks = dtext.token_count_ws(F.col("text"))
        cond = F.lit(True)
        if min_tokens is not None:
            cond = cond & (toks >= min_tokens)
        if max_tokens is not None:
            cond = cond & (toks <= max_tokens)
        cur = cur.filter(cond)
        n = gate("quality", cur, n)

    if dedup == "exact":
        keep = cur.withColumn("fp", dtext.fingerprint_col(F.col("text"))).withColumn(
            "keep",
            F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")) == 1,
        )
        cur = keep.filter("keep").drop("fp", "keep")
        n = gate("dedup_exact", cur, n, cache=True)
    elif dedup == "cluster":
        pairs = dd.lsh_candidate_pairs(cur)
        clusters = dd.dedup_clusters(cur, pairs)
        losers = clusters.filter(~F.col("keep")).select("doc_id")
        cur = cur.join(losers, "doc_id", "left_anti")
        n = gate("dedup_cluster", cur, n, cache=True)
    elif dedup != "none":  # pragma: no cover
        raise ValueError(f"unknown dedup mode {dedup!r}")

    if span_min_docs is not None:
        spans = dd.repeated_spans(cur, min_docs=span_min_docs)
        rewritten = dd.remove_repeated_spans(cur, spans)
        cur = (
            cur.drop("text")
            .join(rewritten, "doc_id")
            .withColumnRenamed("deduped_text", "text")
        )
        n = gate("span_removal", cur, n, cache=True)

    return cur, funnel
