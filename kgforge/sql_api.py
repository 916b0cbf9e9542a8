"""SQL surface: the reference's documented SPARQL corpus
(/root/reference/docs/GRAPHDB_QUERIES.md) re-expressed as Spark SQL over
registered views — the query-side API a consumer uses instead of the
DataFrame builders. Catalyst plans these identically to the DataFrame
path; every query here is a gate entry whose DuckDB oracle replays the
same SQL over the fixture CTEs.

Recursive queries (#2 BOM tree, BOM explosion) use Spark 4.1's native
``WITH RECURSIVE`` — the engine executes the iteration, no driver loop.
Root/part pick rules are deterministic arithmetic (modular partkey
filters / min()), never LIMIT-order-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kgforge import extract, fixtures, graph, linking, materialize


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register transcripts/entities/edges/alternates/triples as temp views."""
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
    fixtures.load_alternate_links(spark, sf_dir).createOrReplaceTempView("alternates_v")


# GRAPHDB_QUERIES.md:73-85 (#4) — children per assembly, top 20
TOP_ASSEMBLIES_SQL = """
SELECT parent, count(*) AS n_children
FROM edges_v GROUP BY parent
ORDER BY n_children DESC, parent ASC LIMIT 20
"""

# GRAPHDB_QUERIES.md:116-143 — parts used in more than 5 assemblies
MULTI_USE_SQL = """
SELECT child, count(*) AS n_assemblies
FROM edges_v GROUP BY child HAVING count(*) > 5
"""

# GRAPHDB_QUERIES.md:89-102 (#5 leaves) + verify roots — FILTER NOT EXISTS
LEAF_ROOT_SQL = """
SELECT 'leaf' AS kind, number FROM entities_v e
WHERE NOT EXISTS (SELECT 1 FROM edges_v x WHERE x.parent = e.number)
UNION ALL
SELECT 'root' AS kind, number FROM entities_v e
WHERE NOT EXISTS (SELECT 1 FROM edges_v x WHERE x.child = e.number)
"""

# GRAPHDB_QUERIES.md:39-53 (#2) — complete BOM tree (all descendants,
# with depth); roots picked by modular partkey rule, recursion native
BOM_TREE_SQL = """
WITH RECURSIVE tree AS (
  SELECT parent AS root, child AS node, 1 AS depth FROM edges_v
  WHERE CAST(parent AS BIGINT) % 499 = 7
  UNION ALL
  SELECT t.root, e.child, t.depth + 1
  FROM tree t JOIN edges_v e ON t.node = e.parent
  WHERE t.depth < 3
)
SELECT t.root, t.node, e.name AS node_name, CAST(min(t.depth) AS INT) AS depth
FROM tree t JOIN entities_v e ON e.number = t.node
GROUP BY t.root, t.node, e.name
"""

# GRAPHDB_QUERIES.md:55-69 (#3) — find parts by name (regex search)
NAME_SEARCH_SQL = """
SELECT number AS part_number, name AS part_name
FROM entities_v
WHERE lower(name) RLIKE '(pool|red)'
"""

# GRAPHDB_QUERIES.md:104-128 (#6) — path from a root down 2 levels
# (nested OPTIONALs -> left joins); root = deterministic min(parent)
ROOT_PATH_SQL = """
WITH root AS (SELECT min(parent) AS r FROM edges_v)
SELECT er.name AS level0, e1.name AS level1, e2.name AS level2
FROM root ro
JOIN entities_v er ON er.number = ro.r
LEFT JOIN edges_v l1 ON l1.parent = ro.r
LEFT JOIN entities_v e1 ON e1.number = l1.child
LEFT JOIN edges_v l2 ON l2.parent = l1.child
LEFT JOIN entities_v e2 ON e2.number = l2.child
"""

# GRAPHDB_QUERIES.md:362-378 (#20) — released mechanical parts used in
# multiple assemblies (composite state+type filter + HAVING)
COMPOSITE_SQL = """
SELECT e.name AS part_name, count(*) AS usage_count
FROM edges_v x JOIN entities_v e ON e.number = x.child
WHERE e.state = 'RELEASED' AND e.part_type = 'MechanicalPart'
GROUP BY e.name HAVING count(*) > 5
"""

# GRAPHDB_QUERIES.md:186-218 (#11 bidirectional alternates + #12 color
# variants) — one analysis surface, kind-tagged
ALTERNATES_SQL = """
SELECT 'bidirectional' AS kind, a1.child_number AS part_a, a1.replacement_number AS part_b
FROM alternates_v a1 JOIN alternates_v a2
  ON a1.child_number = a2.replacement_number
 AND a1.replacement_number = a2.child_number
WHERE a1.child_number < a1.replacement_number
UNION ALL
SELECT 'color_variant' AS kind, a.child_number, a.replacement_number
FROM alternates_v a JOIN entities_v e ON e.number = a.replacement_number
WHERE lower(e.name) RLIKE '(black|red|blue|white|orange|lime|green)'
"""

# GRAPHDB_QUERIES.md:417-437 — impact analysis: direct usedIn + one
# optional higher assembly level; changed-part set by modular rule
IMPACT_SQL = """
SELECT DISTINCT x.child AS part_number, x.parent AS affected_assembly,
       e.name AS assembly_name, h.parent AS higher_level
FROM edges_v x
JOIN entities_v e ON e.number = x.parent
LEFT JOIN edges_v h ON h.child = x.parent
WHERE CAST(x.child AS BIGINT) % 251 = 3
"""

# GRAPHDB_QUERIES.md:5-20 — triple counts per predicate
TRIPLE_COUNTS_SQL = """
SELECT pred, count(*) AS n FROM triples_v GROUP BY pred
"""


def run(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(sql)
