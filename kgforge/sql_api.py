"""SQL surface: the reference's documented SPARQL corpus
(/root/reference/docs/GRAPHDB_QUERIES.md) re-expressed as Spark SQL over
registered views — the query-side API a consumer uses instead of the
DataFrame builders. Catalyst plans these identically to the DataFrame
path (verified: gate entries *_sql share the DataFrame entries' DuckDB
oracles)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kgforge import extract, fixtures, graph, linking, materialize


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register transcripts/entities/edges/triples as temp views."""
    transcripts = fixtures.load_transcripts(spark, sf_dir)
    entities = fixtures.load_entities(spark, sf_dir)
    linked = linking.link_mentions(extract.extract_mentions(transcripts), entities)
    edges = graph.bom_edges_from_linked(linked)
    triples = materialize.union_triples(
        materialize.part_triples(entities),
        materialize.bom_triples(edges),
        materialize.used_in_triples(edges),
    )
    transcripts.createOrReplaceTempView("transcripts_v")
    entities.createOrReplaceTempView("entities_v")
    linked.createOrReplaceTempView("linked_v")
    edges.createOrReplaceTempView("edges_v")
    triples.createOrReplaceTempView("triples_v")


# GRAPHDB_QUERIES.md:73-85 — children per assembly, top 20
TOP_ASSEMBLIES_SQL = """
SELECT parent, count(*) AS n_children
FROM edges_v GROUP BY parent
ORDER BY n_children DESC, parent ASC LIMIT 20
"""

# GRAPHDB_QUERIES.md:362-378 — parts used in more than 5 assemblies
MULTI_USE_SQL = """
SELECT child, count(*) AS n_assemblies
FROM edges_v GROUP BY child HAVING count(*) > 5
"""

# GRAPHDB_QUERIES.md:89-102 — leaves: FILTER NOT EXISTS analogue
LEAF_PARTS_SQL = """
SELECT number FROM entities_v e
WHERE NOT EXISTS (SELECT 1 FROM edges_v x WHERE x.parent = e.number)
"""

# GRAPHDB_QUERIES.md:5-20 — triple counts per predicate
TRIPLE_COUNTS_SQL = """
SELECT pred, count(*) AS n FROM triples_v GROUP BY pred
"""


def run(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(sql)
