"""Driver-contract registry: one (Spark callable, DuckDB oracle SQL) pair
per implemented operator from SURVEY.md §2. ``__spark_entry__.py`` and the
pytest parity suite both consume this module, so the gate the driver runs
is exactly the gate we test locally.

Conventions: timestamps surface as epoch-second bigints; computed columns
are aliased identically on both sides; outputs are order-insensitive sets.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgforge import extract, fixtures, graph, linking, materialize
from kgforge.oracle import with_fixtures, with_linking

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None):
    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _linked(spark: SparkSession, sf_dir: str, strategy: str = "broadcast") -> DataFrame:
    t = fixtures.load_transcripts(spark, sf_dir)
    e = fixtures.load_entities(spark, sf_dir)
    return linking.link_mentions(extract.extract_mentions(t), e, strategy=strategy)


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return graph.bom_edges_from_linked(_linked(spark, sf_dir))


# ------------------------------------------------------------------ scans (S2-S7)
@_register(
    "transcripts_scan",
    with_fixtures(
        "SELECT conv_id, turn_idx, role, text, tool,"
        " CAST(epoch(ts) AS BIGINT) AS ts_epoch FROM transcripts"
    ),
)
def q_transcripts_scan(spark, sf_dir):
    return fixtures.load_transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "text", "tool", F.unix_timestamp("ts").alias("ts_epoch")
    )


@_register("entities_dict", with_fixtures("SELECT * FROM entities"))
def q_entities_dict(spark, sf_dir):
    return fixtures.load_entities(spark, sf_dir)


@_register(
    "alternate_links_scan", with_fixtures("SELECT * FROM alternate_links")
)
def q_alternate_links(spark, sf_dir):
    return fixtures.load_alternate_links(spark, sf_dir)


@_register("describe_links_scan", with_fixtures("SELECT * FROM describe_links"))
def q_describe_links(spark, sf_dir):
    return fixtures.load_describe_links(spark, sf_dir)


# ------------------------------------------------------------------ extraction (P10/T-UDTF)
@_register("extract_mentions", with_linking("SELECT * FROM mentions"))
def q_extract_mentions(spark, sf_dir):
    return extract.extract_mentions(fixtures.load_transcripts(spark, sf_dir))


# ------------------------------------------------------------------ linking (J1, A6)
@_register("link_mentions", with_linking("SELECT * FROM linked"))
def q_link_mentions(spark, sf_dir):
    return _linked(spark, sf_dir)


@_register("link_mentions_salted", with_linking("SELECT * FROM linked"))
def q_link_mentions_salted(spark, sf_dir):
    return _linked(spark, sf_dir, strategy="salted")


@_register(
    "resolution_stats",
    with_linking("SELECT status, count(*) AS n FROM linked GROUP BY status"),
)
def q_resolution_stats(spark, sf_dir):
    return linking.resolution_stats(_linked(spark, sf_dir))


# ------------------------------------------------------------------ edges (J4/G3/G5/P8)
@_register("bom_edges", with_linking("SELECT parent, child FROM edges"))
def q_bom_edges(spark, sf_dir):
    return _edges(spark, sf_dir)


@_register(
    "used_in_edges",
    with_linking("SELECT child AS parent, parent AS child FROM edges"),
)
def q_used_in_edges(spark, sf_dir):
    return graph.reverse_edges(_edges(spark, sf_dir))


@_register(
    "missing_parts",
    with_linking(
        """SELECT number, 'MissingPart' AS part_type FROM (
             SELECT parent AS number FROM edges UNION SELECT child FROM edges
           ) ep WHERE NOT EXISTS (SELECT 1 FROM entities e WHERE e.number = ep.number)"""
    ),
)
def q_missing_parts(spark, sf_dir):
    return graph.missing_parts(
        fixtures.load_entities(spark, sf_dir), _edges(spark, sf_dir)
    )


@_register(
    "leaf_parts",
    with_linking(
        "SELECT number FROM entities e WHERE NOT EXISTS"
        " (SELECT 1 FROM edges x WHERE x.parent = e.number)"
    ),
)
def q_leaf_parts(spark, sf_dir):
    return graph.leaf_parts(fixtures.load_entities(spark, sf_dir), _edges(spark, sf_dir))


@_register(
    "root_parts",
    with_linking(
        "SELECT number FROM entities e WHERE NOT EXISTS"
        " (SELECT 1 FROM edges x WHERE x.child = e.number)"
    ),
)
def q_root_parts(spark, sf_dir):
    return graph.root_parts(fixtures.load_entities(spark, sf_dir), _edges(spark, sf_dir))


# ------------------------------------------------------------------ closure (G4) on a
# deterministic subgraph — the derived fixture graph is far denser than a
# real BOM; the unrestricted closure is exercised in bench/pipeline.
CLOSURE_SQL = with_linking(
    """SELECT parent, child FROM closure""",
    extra_ctes="""
es AS (SELECT parent, child FROM edges
       WHERE (CAST(parent AS BIGINT) + CAST(child AS BIGINT)) % 20 = 0),
closure AS (
  SELECT parent, child FROM es
  UNION
  SELECT closure.parent, e.child FROM closure JOIN es e ON closure.child = e.parent
)""",
)


@_register("transitive_closure", CLOSURE_SQL)
def q_transitive_closure(spark, sf_dir):
    edges = _edges(spark, sf_dir)
    sub = edges.filter(
        (F.col("parent").cast("bigint") + F.col("child").cast("bigint")) % 20 == 0
    )
    return graph.transitive_closure(sub)


# ------------------------------------------------------------------ aggregates (A3/A5)
@_register(
    "top_assemblies",
    with_linking(
        "SELECT parent, count(*) AS n_children FROM edges GROUP BY parent"
        " ORDER BY n_children DESC, parent ASC LIMIT 20"
    ),
)
def q_top_assemblies(spark, sf_dir):
    return materialize.top_assemblies(_edges(spark, sf_dir))


@_register(
    "multi_use_parts",
    with_linking(
        "SELECT child, count(*) AS n_assemblies FROM edges GROUP BY child"
        " HAVING count(*) > 5"
    ),
)
def q_multi_use_parts(spark, sf_dir):
    return materialize.multi_use_parts(_edges(spark, sf_dir))


# ------------------------------------------------------------------ self-joins (J5-J8)
@_register(
    "supersedes",
    with_fixtures(
        """SELECT b.number AS newer, a.number AS older
           FROM entities a JOIN entities b ON a.name = b.name
           WHERE a.number < b.number"""
    ),
)
def q_supersedes(spark, sf_dir):
    return graph.supersedes(fixtures.load_entities(spark, sf_dir))


@_register(
    "part_of_prefix",
    with_linking(
        """SELECT a.number AS member, b.number AS assembly
           FROM entities a JOIN entities b
             ON substr(a.number, 1, 3) = substr(b.number, 1, 3)
           WHERE a.number <> b.number
             AND NOT EXISTS (SELECT 1 FROM edges x
                             WHERE x.child = a.number AND x.parent = b.number)"""
    ),
)
def q_part_of_prefix(spark, sf_dir):
    return graph.part_of_prefix(fixtures.load_entities(spark, sf_dir), _edges(spark, sf_dir))


@_register(
    "depends_on",
    with_fixtures(
        """SELECT DISTINCT b.change_id AS later, a.change_id AS earlier
           FROM changes a JOIN changes b ON a.affected_number = b.affected_number
           WHERE a.ts < b.ts"""
    ),
)
def q_depends_on(spark, sf_dir):
    return graph.depends_on(fixtures.load_changes(spark, sf_dir))


@_register(
    "related_to",
    with_fixtures(
        """SELECT later, earlier FROM (
             SELECT DISTINCT b.change_id AS later, a.change_id AS earlier
             FROM changes a JOIN changes b ON a.change_type = b.change_type
             WHERE a.ts < b.ts) p
           WHERE NOT EXISTS (
             SELECT 1 FROM changes a2 JOIN changes b2
               ON a2.affected_number = b2.affected_number
             WHERE a2.ts < b2.ts AND b2.change_id = p.later AND a2.change_id = p.earlier)"""
    ),
)
def q_related_to(spark, sf_dir):
    changes = fixtures.load_changes(spark, sf_dir)
    return graph.related_to(changes, graph.depends_on(changes))


@_register(
    "evolves_to",
    with_fixtures(
        """SELECT number, version, next_version FROM (
             SELECT number, version,
                    lead(version) OVER (PARTITION BY number ORDER BY version) AS next_version
             FROM versions)
           WHERE next_version IS NOT NULL"""
    ),
)
def q_evolves_to(spark, sf_dir):
    return graph.evolves_to(fixtures.load_versions(spark, sf_dir))


# ------------------------------------------------------------------ level-stack (G1)
LEVEL_STACK_SQL = with_fixtures(
    """SELECT DISTINCT
         CASE WHEN level = 1 THEN last_l0 WHEN level = 2 THEN last_l1 END AS parent,
         number AS child
       FROM (
         SELECT level, number,
           last_value(CASE WHEN level = 0 THEN number END IGNORE NULLS) OVER w AS last_l0,
           last_value(CASE WHEN level = 1 THEN number END IGNORE NULLS) OVER w AS last_l1
         FROM hierarchy
         WINDOW w AS (PARTITION BY group_id ORDER BY row_idx
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
       WHERE level > 0
         AND (CASE WHEN level = 1 THEN last_l0 WHEN level = 2 THEN last_l1 END) IS NOT NULL"""
)


@_register("level_stack_decode", LEVEL_STACK_SQL)
def q_level_stack(spark, sf_dir):
    rows = fixtures.load_hierarchy(spark, sf_dir)
    return graph.level_stack_decode(rows).dropDuplicates()


# ------------------------------------------------------------------ triples (T1-T9, A1/A2)
PART_TRIPLES_SQL = with_fixtures(
    """SELECT 'urn:part:' || number AS subj,
              'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
              'urn:ontology:Part' AS obj, FALSE AS obj_is_literal FROM entities
       UNION ALL
       SELECT 'urn:part:' || number, 'urn:ontology:name',
              COALESCE(NULLIF(name, ''), number), TRUE FROM entities
       UNION ALL
       SELECT 'urn:part:' || number, 'http://www.w3.org/2000/01/rdf-schema#label',
              COALESCE(NULLIF(name, ''), number), TRUE FROM entities
       UNION ALL
       SELECT 'urn:part:' || number, 'urn:ontology:hasPartType',
              'urn:ontology:' || part_type, FALSE FROM entities
       WHERE part_type IS NOT NULL AND part_type <> ''
       UNION ALL
       SELECT 'urn:part:' || number, 'urn:ontology:hasView',
              'urn:ontology:' || "view", FALSE FROM entities
       WHERE "view" IS NOT NULL AND "view" <> ''
       UNION ALL
       SELECT 'urn:part:' || number, 'urn:ontology:hasState',
              'urn:ontology:' || state, FALSE FROM entities
       WHERE state IS NOT NULL AND state <> ''
       UNION ALL
       SELECT 'urn:part:' || number, 'urn:ontology:hasSource',
              'urn:ontology:' || source, FALSE FROM entities
       WHERE source IS NOT NULL AND source <> ''
       UNION ALL
       SELECT 'urn:part:' || number, 'urn:ontology:hasRevision', revision, TRUE
       FROM entities WHERE revision IS NOT NULL AND revision <> ''
       UNION ALL
       SELECT 'urn:part:' || number, 'urn:ontology:inContainer', container, TRUE
       FROM entities WHERE container IS NOT NULL AND container <> ''"""
)


@_register("part_triples", PART_TRIPLES_SQL)
def q_part_triples(spark, sf_dir):
    return materialize.part_triples(fixtures.load_entities(spark, sf_dir))


DOC_TRIPLES_SQL = with_fixtures(
    """SELECT 'urn:document:' || document_number AS subj,
              'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
              'urn:ontology:Document' AS obj, FALSE AS obj_is_literal
       FROM docs WHERE rn = 1
       UNION ALL
       SELECT 'urn:document:' || document_number, 'urn:ontology:hasRevision',
              document_revision, TRUE FROM docs
       WHERE rn = 1 AND document_revision IS NOT NULL AND document_revision <> ''
       UNION ALL
       SELECT 'urn:document:' || document_number, 'urn:ontology:hasOrganization',
              document_org, TRUE FROM docs
       WHERE rn = 1 AND document_org IS NOT NULL AND document_org <> ''
       UNION ALL
       SELECT 'urn:document:' || document_number, 'urn:ontology:inContainer',
              document_container, TRUE FROM docs
       WHERE rn = 1 AND document_container IS NOT NULL AND document_container <> ''""",
    extra_ctes="""
docs AS (
  SELECT document_number, document_revision, document_org, document_container,
         ROW_NUMBER() OVER (PARTITION BY document_number ORDER BY document_number) AS rn
  FROM describe_links)""",
)


@_register("document_triples", DOC_TRIPLES_SQL)
def q_document_triples(spark, sf_dir):
    return materialize.document_triples(fixtures.load_describe_links(spark, sf_dir))


TRIPLE_COUNTS_SQL = with_linking(
    """SELECT pred, count(*) AS n FROM (
         SELECT 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred FROM entities
         UNION ALL SELECT 'urn:ontology:name' FROM entities
         UNION ALL SELECT 'http://www.w3.org/2000/01/rdf-schema#label' FROM entities
         UNION ALL SELECT 'urn:ontology:hasPartType' FROM entities
                   WHERE part_type IS NOT NULL AND part_type <> ''
         UNION ALL SELECT 'urn:ontology:hasView' FROM entities
                   WHERE "view" IS NOT NULL AND "view" <> ''
         UNION ALL SELECT 'urn:ontology:hasState' FROM entities
                   WHERE state IS NOT NULL AND state <> ''
         UNION ALL SELECT 'urn:ontology:hasSource' FROM entities
                   WHERE source IS NOT NULL AND source <> ''
         UNION ALL SELECT 'urn:ontology:hasRevision' FROM entities
                   WHERE revision IS NOT NULL AND revision <> ''
         UNION ALL SELECT 'urn:ontology:inContainer' FROM entities
                   WHERE container IS NOT NULL AND container <> ''
         UNION ALL SELECT 'urn:ontology:hasComponent' FROM edges
         UNION ALL SELECT 'urn:ontology:usedIn' FROM edges
         UNION ALL SELECT 'urn:ontology:hasAlternate' FROM alternate_links
         UNION ALL SELECT 'urn:ontology:describes' FROM describe_links
       ) t GROUP BY pred"""
)


@_register("triple_counts", TRIPLE_COUNTS_SQL)
def q_triple_counts(spark, sf_dir):
    edges = _edges(spark, sf_dir)
    desc = fixtures.load_describe_links(spark, sf_dir)
    triples = materialize.union_triples(
        materialize.part_triples(fixtures.load_entities(spark, sf_dir)),
        materialize.bom_triples(edges),
        materialize.used_in_triples(edges),
        materialize.alternate_triples(fixtures.load_alternate_links(spark, sf_dir)),
        materialize.describe_triples(desc),
    )
    return materialize.triple_counts(triples).filter(
        # document_triples counted separately (own query) to keep this
        # oracle free of the docs dedup subquery
        ~F.col("pred").isin("urn:ontology:hasOrganization")
    )


NTRIPLES_SQL = with_fixtures(
    """SELECT '<urn:part:' || number || '> '
           || '<urn:ontology:name> '
           || '"' || replace(replace(COALESCE(NULLIF(name,''), number), chr(92), chr(92)||chr(92)), '"', chr(92)||'"') || '" .' AS line
       FROM entities"""
)


@_register("ntriples_name_lines", NTRIPLES_SQL)
def q_ntriples_lines(spark, sf_dir):
    ents = fixtures.load_entities(spark, sf_dir)
    name_triples = materialize.part_triples(ents).filter(F.col("pred") == "urn:ontology:name")
    return materialize.ntriples_lines(name_triples)
