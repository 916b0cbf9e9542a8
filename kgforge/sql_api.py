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

_WARMED: set[tuple[int, str]] = set()


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register transcripts/entities/edges/alternates/triples as temp views.

    ``edges_v`` is cached (eagerly): the query corpus scans the graph
    many times — UNION branches, anti-joins, recursive-CTE iterations —
    and each scan would otherwise re-run the whole extraction+linking
    chain. This mirrors production, where queries read the materialized
    graph table, not the raw transcript pipeline. Spark's CacheManager
    keys on the canonicalized plan, so repeated register_views calls
    reuse one cache entry instead of stacking new ones."""
    transcripts = fixtures.load_transcripts(spark, sf_dir)
    entities = fixtures.load_entities(spark, sf_dir)
    linked = linking.link_mentions(extract.extract_mentions(transcripts), entities)
    edges = graph.bom_edges_from_linked(linked).cache()
    key = (id(spark), sf_dir)
    if key not in _WARMED:  # eager-populate once per session+dataset
        edges.count()
        _WARMED.add(key)
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


# GRAPHDB_QUERIES.md #4 (:73-85 children per assembly, top 20), A5
# (:116-143 multi-use HAVING), #5 (:89-102 leaves) + roots — one
# kind-tagged edge-report surface
EDGE_REPORTS_SQL = """
SELECT 'top_assembly' AS kind, parent AS a, CAST(n_children AS STRING) AS b
FROM (SELECT parent, count(*) AS n_children FROM edges_v GROUP BY parent
      ORDER BY n_children DESC, parent ASC LIMIT 20)
UNION ALL
SELECT 'multi_use', child, CAST(count(*) AS STRING)
FROM edges_v GROUP BY child HAVING count(*) > 5
UNION ALL
SELECT 'leaf', number, NULL FROM entities_v e
WHERE NOT EXISTS (SELECT 1 FROM edges_v x WHERE x.parent = e.number)
UNION ALL
SELECT 'root', number, NULL FROM entities_v e
WHERE NOT EXISTS (SELECT 1 FROM edges_v x WHERE x.child = e.number)
"""

# The rest of the documented corpus as ONE kind-tagged catalog surface.
# The reference queries pin literal part URNs (urn:part:100%20SNOW,
# urn:part:7547332); fixtures have no such parts, so each focus part is
# picked by a deterministic rule (string-min), never LIMIT order.
# Reference SPARQL: GRAPHDB_QUERIES.md #1 :24-38 direct children,
# #7 :129-140 part details (?property ?value), #8 :141-156 assemblies
# with most components (by label), #9 :157-170 alternates of a part,
# #10 :171-185 parts with alternates, #13 :259-272 where-used,
# #16 :302-317 Manufacturing-view BOM, #17 :318-332 mechanical parts,
# #18 :333-345 count by state, #19 :346-361 make-vs-buy.
PART_CATALOG_SQL = """
WITH focus_root AS (SELECT min(parent) AS r FROM edges_v),
     focus_part AS (SELECT min(number) AS p FROM entities_v),
     focus_alt  AS (SELECT min(child_number) AS p FROM alternates_v),
     focus_child AS (SELECT min(child) AS c FROM edges_v)
SELECT 'direct_children' AS kind, x.child AS a, e.name AS b
FROM edges_v x JOIN focus_root r ON x.parent = r.r
LEFT JOIN entities_v e ON e.number = x.child
UNION ALL
SELECT 'part_details', kv.prop, kv.val
FROM entities_v e JOIN focus_part f ON e.number = f.p
LATERAL VIEW explode(map(
  'name', e.name, 'type', e.type, 'source', e.source, 'view', e.view,
  'state', e.state, 'revision', e.revision, 'container', e.container,
  'part_type', e.part_type)) kv AS prop, val
UNION ALL
SELECT 'top_components', a, CAST(n AS STRING) FROM (
  SELECT e.name AS a, count(*) AS n
  FROM edges_v x JOIN entities_v e ON e.number = x.parent
  GROUP BY e.name ORDER BY n DESC, a ASC LIMIT 10)
UNION ALL
SELECT 'alternates_for_part', a.replacement_number, e.name
FROM alternates_v a JOIN focus_alt f ON a.child_number = f.p
LEFT JOIN entities_v e ON e.number = a.replacement_number
UNION ALL
SELECT 'parts_with_alternates', coalesce(e.name, a.child_number),
       CAST(count(*) AS STRING)
FROM alternates_v a LEFT JOIN entities_v e ON e.number = a.child_number
GROUP BY coalesce(e.name, a.child_number)
UNION ALL
SELECT 'where_used', x.parent, e.name
FROM edges_v x JOIN focus_child f ON x.child = f.c
LEFT JOIN entities_v e ON e.number = x.parent
UNION ALL
SELECT 'mfg_view', ep.name, ec.name
FROM edges_v x
JOIN entities_v ep ON ep.number = x.parent AND ep.view = 'Manufacturing'
JOIN entities_v ec ON ec.number = x.child
UNION ALL
SELECT 'mech_part', e.name, e.number
FROM entities_v e WHERE e.part_type = 'MechanicalPart'
UNION ALL
SELECT 'count_by_state', state, CAST(count(*) AS STRING)
FROM entities_v GROUP BY state
UNION ALL
SELECT 'make_vs_buy', ec.name, ec.source
FROM edges_v x JOIN focus_root r ON x.parent = r.r
JOIN entities_v ec ON ec.number = x.child
"""

# GRAPHDB_QUERIES.md #14 :273-286 (complete BOM via partOfAssembly),
# #15 :287-301 (state-filtered BOM), advanced :382-396 (transitive +
# name-pattern, the "find all screws" query — fixture names have no
# 'SCR-', the deterministic analog pattern is 'pool'). partOfAssembly
# of one focus root = its recursive descendant set; depth-capped like
# bom_tree (the FULL closure is gated separately by
# transitive_closure_full against a recursive-CTE oracle).
BOM_CLOSURE_SQL = """
WITH RECURSIVE focus_root AS (SELECT min(parent) AS r FROM edges_v),
desc_tree (node, depth) AS (
  SELECT x.child, 1 FROM edges_v x JOIN focus_root r ON x.parent = r.r
  UNION ALL
  SELECT e.child, t.depth + 1
  FROM desc_tree t JOIN edges_v e ON e.parent = t.node
  WHERE t.depth < 3
),
bom AS (
  SELECT DISTINCT e.number, e.name, e.state
  FROM desc_tree t JOIN entities_v e ON e.number = t.node
)
SELECT 'complete_bom' AS kind, number AS a, name AS b FROM bom
UNION ALL
SELECT 'released_bom', number, name FROM bom WHERE state = 'RELEASED'
UNION ALL
SELECT 'name_pattern', number, name FROM bom WHERE lower(name) RLIKE 'pool'
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
