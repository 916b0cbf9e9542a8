"""Canonicalization: stable IRI assignment via connected components
(the north-rule pass: cluster equivalent entities, name each cluster by
its minimum member, derive the canonical IRI from that representative).

Equivalence here is the reference's same-display-name relation (the
SUPERSEDES self-join J5, snowmobile_neo4j_importer.py:250-264): two
numbers sharing a name are the same logical part across revisions. The
clustering runs as a distributed min-label-propagation fixpoint
(graph.connected_components) so it generalizes to any equivalence edge
set (e.g. alternate links, fuzzy-match edges) — for the pure same-name
relation the result provably equals min(number) per name group, which
is what the DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgforge import graph
from kgforge.normalize import iri_encode_col
from kgforge.schema import PART_NS


def equivalence_edges(entities: DataFrame) -> DataFrame:
    """Same-name equivalence pairs (undirected; one orientation kept)."""
    a = entities.select(F.col("name").alias("name"), F.col("number").alias("parent"))
    b = entities.select(F.col("name").alias("name"), F.col("number").alias("child"))
    return (
        a.join(b, "name")
        .filter(F.col("parent") < F.col("child"))
        .select("parent", "child")
        .dropDuplicates()
    )


def assign_canonical_iris(entities: DataFrame) -> DataFrame:
    """entities + (canonical_number, canonical_iri): cluster
    representative = min number in the connected component of the
    equivalence graph; singletons represent themselves."""
    comps = graph.connected_components(equivalence_edges(entities))
    out = entities.join(comps, entities.number == comps.node, "left").select(
        entities["*"],
        F.coalesce(F.col("component"), F.col("number")).alias("canonical_number"),
    )
    return out.withColumn(
        "canonical_iri", F.concat(F.lit(PART_NS), iri_encode_col(F.col("canonical_number")))
    )
