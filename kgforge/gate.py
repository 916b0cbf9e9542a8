"""Driver-contract registry: one (Spark callable, DuckDB oracle SQL) pair
per implemented operator from SURVEY.md §2. ``__spark_entry__.py`` and the
pytest parity suite both consume this module, so the gate the driver runs
is exactly the gate we test locally.

Round 2: consolidated to exactly **50 entries** (the driver verifies the
first 50) with **every entry oracle-checked** — no rows-only checks
remain. Small per-row scalar ops and aggregate tallies that each had
their own entry in round 1 are now kind-tagged unions (entity_scalar_ops,
report_stats, linking_reports, version_ops), so the whole SURVEY §2
inventory fits the driver's budget without shipping anything unverified.

Conventions: timestamps surface as epoch-second bigints; computed columns
are aliased identically on both sides; ratios/means are floored
scaled-ints; outputs are order-insensitive sets.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kgforge import canonicalize, extract, fixtures, graph, linking, materialize, normalize, reports
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
    """The BOM edge set, cached: ~half the registry derives from edges,
    and without the cache every entry re-runs the whole extract->link
    chain. CacheManager keys on the canonicalized plan (which embeds the
    sf_dir parquet paths), so repeated calls — and different sf_dirs —
    each resolve to their own single cache entry. Mirrors production,
    where query-side consumers read the materialized graph table."""
    return graph.bom_edges_from_linked(_linked(spark, sf_dir)).cache()


# ================================================================== 1-5
# scans + extraction + linking (S2, P2-P5, P10, J1)
@_register(
    "transcripts_scan",
    with_fixtures(
        """SELECT conv_id, turn_idx, role, text, tool,
                  CAST(epoch(ts) AS BIGINT) AS ts_epoch,
                  CASE WHEN role = 'tool' THEN COALESCE('Tool:' || tool, 'Tool')
                       WHEN role = 'assistant' THEN 'AssistantTurn'
                       WHEN role = 'user' THEN 'UserTurn'
                       ELSE 'Turn' END AS turn_class
           FROM transcripts"""
    ),
)
def q_transcripts_scan(spark, sf_dir):
    """S2 scan + P4 role/tool -> class projection in one pass."""
    return fixtures.load_transcripts(spark, sf_dir).select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        F.unix_timestamp("ts").alias("ts_epoch"),
        normalize.classify_role_col(F.col("role"), F.col("tool")).alias("turn_class"),
    )


@_register("entities_dict", with_fixtures("SELECT * FROM entities"))
def q_entities_dict(spark, sf_dir):
    return fixtures.load_entities(spark, sf_dir)


@_register("extract_mentions", with_linking("SELECT * FROM mentions"))
def q_extract_mentions(spark, sf_dir):
    return extract.extract_mentions(fixtures.load_transcripts(spark, sf_dir))


@_register("link_mentions", with_linking("SELECT * FROM linked"))
def q_link_mentions(spark, sf_dir):
    return _linked(spark, sf_dir)


@_register("link_mentions_salted", with_linking("SELECT * FROM linked"))
def q_link_mentions_salted(spark, sf_dir):
    return _linked(spark, sf_dir, strategy="salted")


# ================================================================== 6-7
# edges: forward + derived reverse in one direction-tagged set
# (G3/G5/P8/J4)
@_register(
    "bom_edges",
    with_linking(
        """SELECT 'forward' AS direction, parent, child FROM edges
           UNION ALL
           SELECT 'reverse', child, parent FROM edges"""
    ),
)
def q_bom_edges(spark, sf_dir):
    """T2 hasComponent edges + G3 usedIn reversal, kind-tagged."""
    edges = _edges(spark, sf_dir)
    fwd = edges.select(F.lit("forward").alias("direction"), "parent", "child")
    rev = graph.reverse_edges(edges).select(
        F.lit("reverse").alias("direction"), "parent", "child"
    )
    return fwd.unionByName(rev)


@_register(
    "missing_parts",
    with_linking(
        """SELECT number, 'MissingPart' AS part_type FROM (
             SELECT parent AS number FROM edges UNION SELECT child FROM edges
             UNION SELECT child_number FROM alternate_links
             UNION SELECT 'GH-' || replacement_number FROM alternate_links
           ) ep WHERE NOT EXISTS (SELECT 1 FROM entities e WHERE e.number = ep.number)"""
    ),
)
def q_missing_parts(spark, sf_dir):
    """J4 MissingPart placeholders (MERGE ... ON CREATE, :672-679). The
    BOM fixture's endpoints are all known by construction, so phantom
    'GH-' endpoints derived from alternate links are injected to make
    the anti-join produce real placeholder rows."""
    alt = fixtures.load_alternate_links(spark, sf_dir)
    phantom = alt.select(
        F.col("child_number").alias("parent"),
        F.concat(F.lit("GH-"), F.col("replacement_number")).alias("child"),
    )
    aug = _edges(spark, sf_dir).unionByName(phantom)
    return graph.missing_parts(fixtures.load_entities(spark, sf_dir), aug)


# ================================================================== 8-11
# graph: FULL transitive closure, k-hop, deepest paths, connected
# components (G4/G6/A9 + north-rule canonicalization clustering)
@_register(
    "transitive_closure_full",
    with_linking(
        "SELECT parent, child FROM closure",
        extra_ctes="""
closure AS (
  SELECT parent, child FROM edges
  UNION
  SELECT closure.parent, e.child FROM closure JOIN edges e ON closure.child = e.parent
)""",
    ),
)
def q_transitive_closure_full(spark, sf_dir):
    """G4/T7 on the FULL edge set (no sampling — round-2 fix), checked
    against a DuckDB recursive CTE. The fixture graph is dense (sf0.01:
    36.5k edges -> 3.25M closure pairs, 81% of all node pairs), so the
    semi-naive variant wins here: its per-round intermediate is
    |delta| x avg-degree, while doubling joins against the huge closure.
    Long-chain graphs (the bench's sampled subgraph) use the default
    delta path-doubling :func:`kgforge.graph.transitive_closure`."""
    return graph.transitive_closure_seminaive(_edges(spark, sf_dir))


KHOP_CTES = """
es AS (SELECT parent, child FROM edges
       WHERE (CAST(parent AS BIGINT) + CAST(child AS BIGINT)) % 10 = 0),
roots AS (SELECT number FROM entities WHERE CAST(number AS BIGINT) % 211 = 7),
walk AS (
  SELECT number AS root, number AS node, 0 AS depth FROM roots
  UNION ALL
  SELECT w.root, e.child, w.depth + 1 FROM walk w JOIN es e ON w.node = e.parent
  WHERE w.depth < 4
)"""


@_register(
    "khop_descendants",
    with_linking(
        "SELECT root, node, CAST(min(depth) AS INT) AS depth FROM walk GROUP BY root, node",
        extra_ctes=KHOP_CTES,
    ),
)
def q_khop_descendants(spark, sf_dir):
    edges = _edges(spark, sf_dir).filter(
        (F.col("parent").cast("bigint") + F.col("child").cast("bigint")) % 10 == 0
    )
    roots = fixtures.load_entities(spark, sf_dir).filter(
        F.col("number").cast("bigint") % 211 == 7
    )
    return graph.khop_descendants(edges, roots, max_depth=4)


@_register(
    "deepest_paths",
    with_linking(
        """SELECT root, CAST(max(depth) AS INT) AS max_depth FROM (
             SELECT root, node, min(depth) AS depth FROM walk GROUP BY root, node)
           GROUP BY root""",
        extra_ctes=KHOP_CTES,
    ),
)
def q_deepest_paths(spark, sf_dir):
    return materialize.deepest_paths(q_khop_descendants(spark, sf_dir))


@_register(
    "connected_components",
    with_fixtures(
        """SELECT number AS node, min(number) OVER (PARTITION BY name) AS component
           FROM entities
           QUALIFY count(*) OVER (PARTITION BY name) > 1"""
    ),
)
def q_connected_components(spark, sf_dir):
    """North-rule canonicalization clustering on the same-name
    equivalence graph — whose min-label components provably equal
    min(number) per name group, giving the distributed fixpoint an
    exact SQL oracle (round-2 upgrade from rows-only)."""
    eq = canonicalize.equivalence_edges(fixtures.load_entities(spark, sf_dir))
    return graph.connected_components(eq)


# ================================================================== 12-15
# self-joins (J5-J8)
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
             ON starts_with(a.number, substr(b.number, 1, 3))
           WHERE a.number <> b.number
             AND NOT EXISTS (SELECT 1 FROM edges x
                             WHERE (x.child = a.number AND x.parent = b.number)
                                OR (x.parent = a.number AND x.child = b.number))"""
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


# ================================================================== 16-17
# temporal versions: P13 date parse + J9 lead + is_latest in one row
# shape, plus G8 3-hop version chains
@_register(
    "version_ops",
    with_fixtures(
        """SELECT number, version,
                  CAST(epoch(CAST(strftime(created_ts, '%Y-%m-%d %H:%M:%S') AS TIMESTAMP)) AS BIGINT) AS parsed_epoch,
                  (version = max(version) OVER (PARTITION BY number)) AS is_latest,
                  lead(version) OVER (PARTITION BY number ORDER BY version) AS next_version
           FROM all_versions"""
    ),
)
def q_version_ops(spark, sf_dir):
    """P13 ISO-date parse, temporal is_latest flag, and J9 EVOLVES_TO
    next-version (lead) over one pass of the version rows — PartVersion
    AND DocumentVersion chains (import_temporal_history.py:92-136
    builds both node families with the same logic)."""
    v = fixtures.load_versions(spark, sf_dir).unionByName(
        fixtures.load_doc_versions(spark, sf_dir)
    )
    wp = Window.partitionBy("number")
    wo = Window.partitionBy("number").orderBy("version")
    iso = F.date_format("created_ts", "yyyy-MM-dd HH:mm:ss")
    return v.select(
        "number",
        "version",
        normalize.parse_date_col(iso).alias("parsed_epoch"),
        (F.col("version") == F.max("version").over(wp)).alias("is_latest"),
        F.lead("version").over(wo).alias("next_version"),
    )


@_register(
    "version_chains3",
    with_fixtures(
        """SELECT CAST(a.version AS VARCHAR) || '->' || CAST(a.next_version AS VARCHAR)
                  || '->' || CAST(b.next_version AS VARCHAR)
                  || '->' || CAST(c.next_version AS VARCHAR) AS path
           FROM ev a JOIN ev b ON a.next_version = b.version
                     JOIN ev c ON b.next_version = c.version""",
        extra_ctes="""
ev AS (SELECT number, version,
              lead(version) OVER (PARTITION BY number ORDER BY version) AS next_version
       FROM versions QUALIFY next_version IS NOT NULL)""",
    ),
)
def q_version_chains3(spark, sf_dir):
    ev = graph.evolves_to(fixtures.load_versions(spark, sf_dir))
    edges = ev.select(F.col("version").alias("src"), F.col("next_version").alias("dst"))
    return graph.chains(edges, n_hops=3)


# ================================================================== 18-19
# level-stack decodes (G1 with usage attrs subsumes the plain decode;
# G2 legacy round-robin)
@_register(
    "usage_edges",
    with_fixtures(
        """SELECT DISTINCT
             CASE WHEN level = 1 THEN last_l0 WHEN level = 2 THEN last_l1 END AS parent,
             number AS child, quantity, uom, find_number
           FROM (
             SELECT level, number, quantity, uom, find_number,
               last_value(CASE WHEN level = 0 THEN number END IGNORE NULLS) OVER w AS last_l0,
               last_value(CASE WHEN level = 1 THEN number END IGNORE NULLS) OVER w AS last_l1
             FROM hierarchy
             WINDOW w AS (PARTITION BY group_id ORDER BY row_idx
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
           WHERE level > 0
             AND (CASE WHEN level = 1 THEN last_l0 WHEN level = 2 THEN last_l1 END) IS NOT NULL"""
    ),
)
def q_usage_edges(spark, sf_dir):
    """G1 stack decode carrying usage attributes (reference
    parse_part_usage :1262-1318) — subsumes the attribute-less G1 entry
    (same decode, same emitted (parent, child)). Gated via the ROUTED
    decoder: clean groups take the pure window form (JVM-only scale
    path; ~6x faster than the Python crossing at sf0.01), and any group
    whose level sequence the window form can't decode exactly is routed
    to the general stateful decoder — so the gated path IS the
    guard-railed production path."""
    rows = fixtures.load_hierarchy(spark, sf_dir)
    return graph.level_stack_decode_routed(
        rows, max_level=2, attrs=("quantity", "uom", "find_number")
    ).dropDuplicates()


@_register(
    "level_stack_round_robin",
    with_fixtures(
        """SELECT p.parent, c.number AS child
           FROM pos c
           JOIN pcounts pc ON c.group_id = pc.group_id AND c.level = pc.level
           JOIN parents p ON p.group_id = c.group_id AND p.level = c.level
                          AND p.ppos = c.pos % pc.n_parents""",
        extra_ctes="""
pos AS (SELECT group_id, level, number, row_idx,
               ROW_NUMBER() OVER (PARTITION BY group_id, level ORDER BY row_idx) - 1 AS pos
        FROM hierarchy),
parents AS (SELECT group_id, level + 1 AS level, pos AS ppos, number AS parent FROM pos),
pcounts AS (SELECT group_id, level + 1 AS level, count(*) AS n_parents
            FROM pos GROUP BY group_id, level)""",
    ),
)
def q_level_stack_round_robin(spark, sf_dir):
    return graph.level_stack_round_robin(fixtures.load_hierarchy(spark, sf_dir))


# ================================================================== 20-23
# triple emission (T1-T9, A1/A2)
PART_TRIPLES_BODY = """
part_triples AS (
  SELECT 'urn:part:' || number AS subj,
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
  FROM entities WHERE container IS NOT NULL AND container <> '')"""


@_register(
    "ntriples_render",
    with_fixtures(
        """SELECT '<' || subj || '> <' || pred || '> '
               || CASE WHEN obj_is_literal
                       THEN '"' || replace(replace(obj, chr(92), chr(92)||chr(92)), '"', chr(92)||'"') || '"'
                       ELSE '<' || obj || '>' END
               || ' .' AS line
           FROM part_triples""",
        extra_ctes=PART_TRIPLES_BODY,
    ),
)
def q_ntriples_render(spark, sf_dir):
    """T1 part-triple emission + T9 N-Triples serialization in one
    entry: every emitted part triple rendered as its N-Triples line
    (URIRef-vs-Literal split visible in the <>/\"\" term form)."""
    triples = materialize.part_triples(fixtures.load_entities(spark, sf_dir))
    return materialize.ntriples_lines(triples)


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


@_register(
    "side_link_triples",
    with_fixtures(
        """SELECT 'urn:part:' || child_number AS subj,
                  'urn:ontology:hasAlternate' AS pred,
                  'urn:part:' || replacement_number AS obj,
                  FALSE AS obj_is_literal
           FROM alternate_links
           UNION ALL
           SELECT 'urn:document:' || document_number, 'urn:ontology:describes',
                  'urn:part:' || part_number, FALSE FROM describe_links
           UNION ALL
           SELECT 'urn:ontology:' || p, 'http://www.w3.org/2000/01/rdf-schema#label',
                  p, TRUE
           FROM (VALUES ('hasComponent'), ('usedIn'), ('partOfAssembly'),
                        ('hasAlternate'), ('describes')) t(p)"""
    ),
)
def q_side_link_triples(spark, sf_dir):
    """S6/S7 side-table scans + T3 alternate, T5 describes and T8
    edge-label triples in one union."""
    return materialize.union_triples(
        materialize.alternate_triples(fixtures.load_alternate_links(spark, sf_dir)),
        materialize.describe_triples(fixtures.load_describe_links(spark, sf_dir)),
        materialize.edge_label_triples(spark),
    )


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
        # document_triples counted separately (own entry) to keep this
        # oracle free of the docs dedup subquery
        ~F.col("pred").isin("urn:ontology:hasOrganization")
    )


# ================================================================== 24-26
# canonicalization + IRI emission + JSON source (north rule, P11, S8)
@_register(
    "canonical_iris",
    with_fixtures(
        """SELECT number, name,
                  min(number) OVER (PARTITION BY name) AS canonical_number,
                  'urn:part:' || replace(replace(min(number) OVER (PARTITION BY name), ' ', '%20'), '#', '%23') AS canonical_iri
           FROM entities"""
    ),
)
def q_canonical_iris(spark, sf_dir):
    out = canonicalize.assign_canonical_iris(fixtures.load_entities(spark, sf_dir))
    return out.select("number", "name", "canonical_number", "canonical_iri")


@_register(
    "canonical_equivalence_triples",
    with_fixtures(
        """SELECT 'urn:part:' || replace(replace(number, ' ', '%20'), '#', '%23') AS subj,
                  'urn:ontology:canonicalEquivalent' AS pred,
                  'urn:part:' || replace(replace(canonical, ' ', '%20'), '#', '%23') AS obj,
                  FALSE AS obj_is_literal
           FROM (SELECT number, min(number) OVER (PARTITION BY name) AS canonical
                 FROM entities)
           WHERE number <> canonical"""
    ),
)
def q_canonical_equivalence_triples(spark, sf_dir):
    c = canonicalize.assign_canonical_iris(fixtures.load_entities(spark, sf_dir))
    return materialize.canonical_equivalence_triples(c)


@_register("entities_json_source", with_fixtures("SELECT * FROM entities"))
def q_entities_json_source(spark, sf_dir):
    """S8 (scripts/generate_load_script.py:10-14): JSON parts source —
    round-trip the entity table through spark.read.json with an explicit
    schema (schema-on-read, no sniffing)."""
    import hashlib
    import os
    import tempfile

    from kgforge.schema import ENTITY_SCHEMA

    # cache tag: digest of the FULL path (two datasets sharing a
    # basename must not collide; Python hash() is run-unstable under
    # PYTHONHASHSEED) + the source parquet mtime, so a regenerated
    # fixture at the same path invalidates the dump.
    src = os.path.join(sf_dir, "part.parquet")
    mtime = int(os.stat(src).st_mtime) if os.path.exists(src) else 0
    tag = hashlib.sha1(f"{os.path.abspath(sf_dir)}@{mtime}".encode()).hexdigest()[:16]
    path = os.path.join(tempfile.gettempdir(), f"kgforge_entities_json_{tag}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        fixtures.load_entities(spark, sf_dir).write.mode("overwrite").json(path)
    return spark.read.schema(ENTITY_SCHEMA).json(path)


# ================================================================== 27-29
# report sinks + per-entity scalar ops + aggregate tallies, kind-tagged
# (K3/K4, J2, J10, P9/P11/P12/P14/P15, A4/A6/A7/A8)
@_register(
    "linking_reports",
    with_linking(
        """SELECT 'name_index' AS kind, name AS a, unnest(candidates) AS b,
                  CAST(len(candidates) AS VARCHAR) AS c, CAST(NULL AS VARCHAR) AS d
           FROM name_index
           UNION ALL
           SELECT 'bom_by_name', COALESCE(ep.name, x.parent), COALESCE(ec.name, x.child),
                  x.parent, x.child
           FROM edges x
           LEFT JOIN entities ep ON ep.number = x.parent
           LEFT JOIN entities ec ON ec.number = x.child
           UNION ALL
           SELECT 'change_part', c.change_id, e.number, NULL, NULL
           FROM changes c JOIN entities e ON c.affected_number = e.number"""
    ),
)
def q_linking_reports(spark, sf_dir):
    """K3 report family in one kind-tagged union: the name-index dump
    (+candidate counts, the candidates-emitter surface), the
    BOM-by-name report (J2 number->name enrichment with fallback), and
    J10 change->part links."""
    entities = fixtures.load_entities(spark, sf_dir)
    ni = reports.name_index_report(entities).select(
        F.lit("name_index").alias("kind"),
        F.col("name").alias("a"),
        F.col("number").alias("b"),
        F.col("n_candidates").cast("string").alias("c"),
        F.lit(None).cast("string").alias("d"),
    )
    bn = reports.bom_by_name(_edges(spark, sf_dir), entities).select(
        F.lit("bom_by_name").alias("kind"),
        F.col("parent_name").alias("a"),
        F.col("child_name").alias("b"),
        F.col("parent").alias("c"),
        F.col("child").alias("d"),
    )
    c = fixtures.load_changes(spark, sf_dir)
    cp = c.join(F.broadcast(entities), c.affected_number == entities.number).select(
        F.lit("change_part").alias("kind"),
        F.col("change_id").alias("a"),
        F.col("number").alias("b"),
        F.lit(None).cast("string").alias("c"),
        F.lit(None).cast("string").alias("d"),
    )
    return ni.unionByName(bn).unionByName(cp)


_GATE_KEYWORDS = ["widget", "rod", "plate", "pool"]

_COLOR_CASE = """CASE
  WHEN state = 'RELEASED' THEN '#27ae60' WHEN state = 'DESIGN' THEN '#3498db'
  WHEN state = 'INPLANNING' THEN '#f39c12' WHEN state = 'UNDERREVIEW' THEN '#e67e22'
  WHEN source = 'make' THEN '#27ae60' WHEN source = 'buy' THEN '#e67e22'
  WHEN part_type = 'MechanicalPart' THEN '#3498db' WHEN part_type = 'SoftwarePart' THEN '#9b59b6'
  WHEN part_type = 'Variant' THEN '#e74c3c' WHEN part_type = 'WTPart' THEN '#2ecc71'
  ELSE '#95a5a6' END"""

_SIZE_SQL = (
    "CAST(30 + 5 * ("
    + " + ".join(
        f"(CASE WHEN \"{c}\" IS NOT NULL AND \"{c}\" <> '' THEN 1 ELSE 0 END)"
        for c in ["type", "source", "view", "state", "revision", "container"]
    )
    + ") AS INT)"
)


@_register(
    "entity_scalar_ops",
    with_fixtures(
        f"""SELECT number,
                  {_COLOR_CASE} AS display_color,
                  {_SIZE_SQL} AS node_size,
                  regexp_matches(lower(number || ' ' || name), '{'|'.join(_GATE_KEYWORDS)}') AS is_match,
                  sha256(number || chr(31) || name) AS stable_id,
                  replace(replace(name, ' ', '%20'), '#', '%23') AS iri_name,
                  replace('urn:part:' || number, 'urn:part:', '') AS part_id
           FROM entities"""
    ),
)
def q_entity_scalar_ops(spark, sf_dir):
    """Per-entity scalar operators in one projection: P15 display
    color/size cascade, P9 keyword classifier, P14 stable content id
    (sha2, the documented deviation from the reference's run-unstable
    hash()), P11 IRI percent-encoding, P12 IRI->id strip."""
    e = fixtures.load_entities(spark, sf_dir)
    from kgforge.normalize import iri_encode_udf

    return e.select(
        "number",
        normalize.display_color_col(
            F.col("state"), F.col("source"), F.col("part_type")
        ).alias("display_color"),
        normalize.display_size_col(
            F.col("type"), F.col("source"), F.col("view"),
            F.col("state"), F.col("revision"), F.col("container"),
        ).alias("node_size"),
        normalize.keyword_classifier_col(
            F.col("number"), F.col("name"), _GATE_KEYWORDS
        ).alias("is_match"),
        normalize.stable_id_col(F.col("number"), F.col("name")).alias("stable_id"),
        iri_encode_udf(F.col("name")).alias("iri_name"),
        F.regexp_replace(
            F.concat(F.lit("urn:part:"), F.col("number")), "^urn:part:", ""
        ).alias("part_id"),
    )


@_register(
    "report_stats",
    with_linking(
        """SELECT 'resolution' AS kind, status AS key1, CAST(NULL AS VARCHAR) AS key2,
                  count(*) AS n
           FROM linked GROUP BY status
           UNION ALL
           SELECT 'skip', mention, status, count(*) FROM linked
           WHERE status <> 'resolved' GROUP BY mention, status
           UNION ALL
           SELECT 'validation', 'n_rows', NULL, count(*) FROM entities_raw
           UNION ALL
           SELECT 'validation', 'n_valid_number', NULL,
                  CAST(sum(CASE WHEN number IS NOT NULL AND number <> ''
                      AND NOT regexp_matches(number, '[<>:"|?*\\x00-\\x1f]') THEN 1 ELSE 0 END)
                      AS BIGINT)
           FROM entities_raw
           UNION ALL
           SELECT 'validation', 'n_valid_name', NULL,
                  CAST(sum(CASE WHEN name IS NOT NULL AND name <> ''
                      AND length(name) <= 200 THEN 1 ELSE 0 END) AS BIGINT)
           FROM entities_raw
           UNION ALL
           SELECT 'state', state, NULL, count(*) FROM entities GROUP BY state
           UNION ALL
           SELECT 'fallback', 'n_fallbacks', NULL,
                  CAST(sum(CASE WHEN ep.name IS NULL THEN 1 ELSE 0 END)
                  + sum(CASE WHEN ec.name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           FROM edges x
           LEFT JOIN entities ep ON ep.number = x.parent
           LEFT JOIN entities ec ON ec.number = x.child
           UNION ALL
           SELECT 'fallback', 'n_edges', NULL, count(*) FROM edges"""
    ),
)
def q_report_stats(spark, sf_dir):
    """Aggregate tallies in one kind-tagged union: A6 resolution stats,
    the K3 skip log, A7 validation counters (S3), A4 parts-by-state and
    A8 name-fallback counts."""
    linked = _linked(spark, sf_dir)
    entities = fixtures.load_entities(spark, sf_dir)
    raw = fixtures.load_entities_raw(spark, sf_dir)
    edges = _edges(spark, sf_dir)

    def tag(df, kind, key1, key2, n):
        return df.select(
            F.lit(kind).alias("kind"),
            key1.cast("string").alias("key1"),
            key2.cast("string").alias("key2"),
            n.cast("bigint").alias("n"),
        )

    res = tag(
        linking.resolution_stats(linked), "resolution", F.col("status"), F.lit(None), F.col("n")
    )
    skip = tag(
        reports.skip_log(linked), "skip", F.col("mention"), F.col("status"), F.col("n_occurrences")
    )
    val = raw.agg(
        F.count("*").alias("n_rows"),
        F.sum(normalize.valid_number_col(F.col("number")).cast("int")).alias("n_valid_number"),
        F.sum(normalize.valid_name_col(F.col("name")).cast("int")).alias("n_valid_name"),
    )
    val_rows = val.selectExpr(
        "stack(3, 'n_rows', n_rows, 'n_valid_number', n_valid_number,"
        " 'n_valid_name', n_valid_name) AS (key1, n)"
    )
    val_tagged = tag(val_rows, "validation", F.col("key1"), F.lit(None), F.col("n"))
    state = tag(
        entities.groupBy("state").agg(F.count("*").alias("n")),
        "state", F.col("state"), F.lit(None), F.col("n"),
    )
    named = reports.bom_by_name(edges, entities)
    fb = named.agg(
        (
            F.sum(F.col("parent_name_missing").cast("int"))
            + F.sum(F.col("child_name_missing").cast("int"))
        ).alias("n_fallbacks"),
        F.count("*").alias("n_edges"),
    ).selectExpr("stack(2, 'n_fallbacks', n_fallbacks, 'n_edges', n_edges) AS (key1, n)")
    fb_tagged = tag(fb, "fallback", F.col("key1"), F.lit(None), F.col("n"))
    out = res
    for part in (skip, val_tagged, state, fb_tagged):
        out = out.unionByName(part)
    return out


# ================================================================== 30
# dictionary mention detection over free text (P10 hard path) — the
# north-star UDF stage, oracle-checked via containment semantics
@_register(
    "dict_mentions",
    with_fixtures(
        """SELECT DISTINCT t.conv_id, t.turn_idx, k.name AS mention
           FROM transcripts t JOIN kept k ON contains(t.text, k.name)
           WHERE t.turn_idx % 17 = 0""",
        extra_ctes="""
kept AS (
  SELECT name FROM (SELECT DISTINCT name FROM entities) n1
  WHERE NOT EXISTS (SELECT 1 FROM (SELECT DISTINCT name FROM entities) n2
                    WHERE n2.name <> n1.name AND contains(n1.name, n2.name)))""",
    ),
)
def q_dict_mentions(spark, sf_dir):
    """Dictionary-based mention detection (the Arrow-batched trie UDF,
    extract.py) gated against a DuckDB containment oracle. The
    dictionary is restricted to substring-free names (no name contained
    in another) — the precondition under which overlapping trie
    detection equals containment — and the scan to every 17th turn so
    the oracle's contains-join stays tractable."""
    entities = fixtures.load_entities(spark, sf_dir)
    names = [r[0] for r in extract.substring_free_names(entities).collect()]
    turns = fixtures.load_transcripts(spark, sf_dir).filter(F.col("turn_idx") % 17 == 0)
    detected = extract.detect_mentions_dictionary(
        turns, entities, names=names, overlapping=True
    )
    return detected.dropDuplicates()


# ================================================================== 31-41
# LLM-training-data pipeline operators over documents/embeddings
from kgforge.datapipe import dedup as dd
from kgforge.datapipe import similarity as sim
from kgforge.datapipe import text as dtext


def _documents(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


DOCS_PLUS_CTE = """
docs_plus AS (
  SELECT * FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, lang, source, n_chars
  FROM documents WHERE doc_id % 10 = 0
),
doc_fp AS (
  SELECT doc_id, md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
  FROM docs_plus
),
doc_shingles AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
  FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM docs_plus),
       LATERAL (SELECT unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS i)
  WHERE array_to_string(toks[i:i+2], ' ') <> ''
)"""


_LANG_SCORE_SQL = {
    lang: " + ".join(
        f"(length(p) - length(replace(p, ' {w} ', ''))) // {len(w) + 2}" for w in words
    )
    for lang, words in dtext.LANG_INDICATORS.items()
}
_LANG_SCORES_UNION = " UNION ALL ".join(
    f"SELECT doc_id, '{lang}' AS cand, {ord_} AS ord, {_LANG_SCORE_SQL[lang]} AS score FROM padded"
    for ord_, lang in enumerate(dtext.LANG_ORDER)
)

LANG_ID_SQL = f"""
WITH padded AS (SELECT doc_id, lang, ' ' || text || ' ' AS p FROM documents),
scores AS ({_LANG_SCORES_UNION})
SELECT p.doc_id, p.lang AS actual_lang, s.cand AS predicted_lang
FROM padded p
JOIN (SELECT doc_id, cand,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, ord) AS rn
      FROM scores) s
  ON p.doc_id = s.doc_id AND s.rn = 1
"""


@_register("doc_lang_id", LANG_ID_SQL)
def q_doc_lang_id(spark, sf_dir):
    docs = _documents(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        dtext.lang_id(F.col("text")).alias("predicted_lang"),
    )


@_register(
    "doc_quality",
    """SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens_bpe,
       CAST(floor(length(replace(text, ' ', '')) * 1000.0
            / len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS avg_token_len_e3,
       CAST(floor(("""
    + " + ".join(
        f"(length(' '||text||' ') - length(replace(' '||text||' ', ' {w} ', ''))) // {len(w) + 2}"
        for ws in dtext.LANG_INDICATORS.values()
        for w in ws
    )
    + """) * 1000000.0
            / len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS stopword_ratio_e6
       FROM documents""",
)
def q_doc_quality(spark, sf_dir):
    """Quality features + both token counters (ws and BPE-ish regex) —
    the doc_token_counts entry folded in."""
    docs = _documents(spark, sf_dir)
    out = dtext.quality_features(docs)
    bpe = docs.select(
        "doc_id", dtext.token_count_regex(F.col("text")).cast("bigint").alias("n_tokens_bpe")
    )
    return out.join(bpe, "doc_id").select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "n_tokens_bpe",
        "avg_token_len_e3",
        "stopword_ratio_e6",
    )


@_register(
    "dedup_exact",
    f"WITH {DOCS_PLUS_CTE[1:]}\n"
    "SELECT fp, min(doc_id) AS canonical_doc_id, count(*) AS n_copies"
    " FROM doc_fp GROUP BY fp",
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup groups keyed by the md5 content fingerprint — the
    doc_fingerprints surface is visible in the fp output column."""
    return dd.exact_dedup(dd.docs_with_dups(_documents(spark, sf_dir)))


@_register(
    "dedup_ngram_jaccard",
    f"""WITH {DOCS_PLUS_CTE[1:]},
sizes AS (SELECT doc_id, count(*) AS n FROM doc_shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
  FROM doc_shingles a JOIN doc_shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id),
pos_shingles AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(toks[i:i+2], ' ') AS shingle
  FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM docs_plus),
       LATERAL (SELECT unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS i)
  WHERE array_to_string(toks[i:i+2], ' ') <> ''),
rep AS (
  SELECT shingle FROM pos_shingles GROUP BY shingle
  HAVING count(DISTINCT doc_id) >= 2),
span_islands AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM pos_shingles JOIN rep USING (shingle))
SELECT 'jaccard' AS kind, doc_a AS a, doc_b AS b,
       CAST(floor(n_shared * 1000000.0 / (sa.n + sb.n - n_shared)) AS BIGINT) AS c,
       CAST(-1 AS BIGINT) AS d
FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
WHERE floor(n_shared * 1000000.0 / (sa.n + sb.n - n_shared)) >= 800000
UNION ALL
SELECT 'span' AS kind, doc_id AS a, CAST(min(pos) AS BIGINT) AS b,
       CAST(max(pos) + 2 AS BIGINT) AS c, count(*) AS d
FROM span_islands GROUP BY doc_id, island""",
)
def q_dedup_ngram_jaccard(spark, sf_dir):
    """kind='jaccard': exact n-gram Jaccard near-dup pairs (a=doc_a,
    b=doc_b, c=jaccard_e6, d=-1); kind='span': substring-level dedup —
    maximal cross-document repeated spans at k-gram granularity
    (a=doc_id, b=span_start, c=span_end, d=n_grams), the suffix-array
    method's scalable shingle form (bucketed by shingle hash, no
    all-pairs; see datapipe.dedup.repeated_spans)."""
    docs = dd.docs_with_dups(_documents(spark, sf_dir))
    jac = dd.jaccard_pairs(docs).select(
        F.lit("jaccard").alias("kind"),
        F.col("doc_a").alias("a"),
        F.col("doc_b").alias("b"),
        F.col("jaccard_e6").alias("c"),
        F.lit(-1).cast("bigint").alias("d"),
    )
    spans = dd.repeated_spans(docs).select(
        F.lit("span").alias("kind"),
        F.col("doc_id").alias("a"),
        F.col("span_start").alias("b"),
        F.col("span_end").alias("c"),
        F.col("n_grams").alias("d"),
    )
    return jac.unionByName(spans)


@_register(
    "dedup_minhash_lsh",
    f"""WITH {DOCS_PLUS_CTE[1:]},
sigs AS (
  SELECT doc_id, seed, min(md5(CAST(seed AS VARCHAR) || ':' || shingle)) AS sig
  FROM doc_shingles, LATERAL (SELECT unnest(generate_series(0, 15)) AS seed)
  GROUP BY doc_id, seed),
bands AS (
  SELECT doc_id, seed // 4 AS band, md5(string_agg(sig, '|' ORDER BY seed)) AS band_key
  FROM sigs GROUP BY doc_id, seed // 4)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id""",
)
def q_dedup_minhash_lsh(spark, sf_dir):
    return dd.lsh_candidate_pairs(dd.docs_with_dups(_documents(spark, sf_dir)))


# SimHash oracle: per-token md5-derived 64-bit hashes, sign-aggregated
# into a '0'/'1' bit string (position p = bit p-1, LSB first), banded
# into 4 x 16-bit chunks; candidates agree on >=1 chunk, exact hamming
# filters — the same algorithm dedup.simhash_near_dups runs.
_SIMHASH_BITS = " || ".join(
    f"CASE WHEN sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, {16 - j // 4}, 1)) - 1)"
    f" // {2 ** (j % 4)}) % 2 = 1 THEN 1 ELSE -1 END) > 0 THEN '1' ELSE '0' END"
    for j in range(64)
)

SIMHASH_SQL = f"""WITH {DOCS_PLUS_CTE[1:]},
simtok AS (
  SELECT doc_id, md5(tok) AS h
  FROM (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
        FROM docs_plus)
  WHERE tok <> ''),
simbits AS (
  SELECT d.doc_id, COALESCE(s.bits, repeat('0', 64)) AS bits
  FROM docs_plus d LEFT JOIN (
    SELECT doc_id, {_SIMHASH_BITS} AS bits FROM simtok GROUP BY doc_id) s
  USING (doc_id)),
simcand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.bits AS ba, b.bits AS bb
  FROM simbits a JOIN simbits b
    ON a.doc_id < b.doc_id
   AND (substr(a.bits, 1, 16) = substr(b.bits, 1, 16)
     OR substr(a.bits, 17, 16) = substr(b.bits, 17, 16)
     OR substr(a.bits, 33, 16) = substr(b.bits, 33, 16)
     OR substr(a.bits, 49, 16) = substr(b.bits, 49, 16)))
SELECT doc_a, doc_b,
       CAST(len(list_filter(generate_series(1, 64),
            i -> substr(ba, i, 1) <> substr(bb, i, 1))) AS BIGINT) AS hamming
FROM simcand
WHERE len(list_filter(generate_series(1, 64),
      i -> substr(ba, i, 1) <> substr(bb, i, 1))) <= 3"""


@_register("dedup_simhash", SIMHASH_SQL)
def q_dedup_simhash(spark, sf_dir):
    out = dd.simhash_near_dups(dd.docs_with_dups(_documents(spark, sf_dir)))
    return out.withColumn("hamming", F.col("hamming").cast("bigint"))


NEAR_DUP_SQL = f"""WITH embeddings_plus AS (
  SELECT * FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, embedding, label FROM embeddings WHERE vec_id % 10 = 0
),{sim.lsh_sigs_cte(source="embeddings_plus")},
cand AS (
  SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM lsh_sigs a JOIN lsh_sigs b
    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings_plus),
scored AS (
  SELECT doc_a, doc_b,
         list_dot_product(a.v, b.v)
         / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
  FROM cand JOIN ev a ON a.vec_id = cand.doc_a JOIN ev b ON b.vec_id = cand.doc_b)
SELECT doc_a, doc_b, CAST(floor(cosine * 10000) AS BIGINT) AS cosine_e4
FROM scored WHERE cosine >= 0.9"""


@_register("embedding_near_dups", NEAR_DUP_SQL)
def q_embedding_near_dups(spark, sf_dir):
    """LSH-bucketed near-dup pairs over a duplicate-injected corpus
    (round-2 fix: no CartesianProduct; the oracle replays the identical
    quantized-plane bucketing). Threshold 0.9 = the true near-dup
    regime, where banded LSH recall is ~1 (identical vectors collide in
    every band); random 64-d pairs never reach it."""
    return sim.embedding_near_dups(
        sim.vecs_with_dups(_embeddings(spark, sf_dir)), threshold=0.9
    )


COSINE_TOPK_SQL = """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 50 = 0),
sims AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         list_dot_product(qv, c.v)
         / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(c.v, c.v))) AS cosine
  FROM q, e c WHERE c.vec_id <> q.query_id)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       CAST(floor(cosine * 10000) AS BIGINT) AS cosine_e4
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id) AS rank FROM sims)
WHERE rank <= 5
"""


@_register("ann_cosine_topk", COSINE_TOPK_SQL)
def q_ann_cosine_topk(spark, sf_dir):
    emb = _embeddings(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return sim.cosine_topk(queries, emb, k=5).withColumn("rank", F.col("rank").cast("bigint"))


ANN_LSH_SQL = f"""WITH {sim.lsh_sigs_cte()[1:]},
cand AS (
  SELECT DISTINCT qs.vec_id AS query_id, cs.vec_id AS neighbor_id
  FROM lsh_sigs qs JOIN lsh_sigs cs
    ON qs.band = cs.band AND qs.bucket = cs.bucket
  WHERE qs.vec_id % 50 = 0 AND qs.vec_id <> cs.vec_id),
ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(a.v, b.v)
         / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
  FROM cand JOIN ev a ON a.vec_id = cand.query_id JOIN ev b ON b.vec_id = cand.neighbor_id)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       CAST(floor(cosine * 10000) AS BIGINT) AS cosine_e4
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
WHERE rank <= 5"""


ANN_IVF_SQL = f"""WITH {sim.ivf_cte()[1:]},
ivf_cand AS (
  SELECT DISTINCT qp.vec_id AS query_id, cl.vec_id AS neighbor_id
  FROM ivf_ranked qp JOIN ivf_ranked cl ON qp.centroid_id = cl.centroid_id
  WHERE qp.vec_id % 50 = 0 AND qp.pr <= {sim.DEFAULT_NPROBE} AND cl.pr = 1
    AND qp.vec_id <> cl.vec_id),
scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(a.v, b.v)
         / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
  FROM ivf_cand JOIN iv a ON a.vec_id = ivf_cand.query_id
                JOIN iv b ON b.vec_id = ivf_cand.neighbor_id)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       CAST(floor(cosine * 10000) AS BIGINT) AS cosine_e4
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
WHERE rank <= 5"""


@_register(
    "ann_topk_bucketed",
    f"SELECT 'lsh' AS method, * FROM ({ANN_LSH_SQL})\n"
    f"UNION ALL\nSELECT 'ivf', * FROM ({ANN_IVF_SQL})",
)
def q_ann_topk_bucketed(spark, sf_dir):
    """Both bucketed ANN scale paths, kind-tagged and gated against full
    DuckDB replays of the identical quantized-integer index math:
    method=lsh (random-hyperplane band buckets) and method=ivf
    (inverted-file lists: deterministic centroids, nprobe=4 probe join).
    Candidates only from bucket/list collisions — no all-pairs stage in
    either path."""
    emb = _embeddings(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    lsh = sim.lsh_ann_topk(queries, emb, k=5).withColumn("method", F.lit("lsh"))
    ivf = sim.ivf_ann_topk(queries, emb, k=5).withColumn("method", F.lit("ivf"))
    return (
        lsh.unionByName(ivf)
        .withColumn("rank", F.col("rank").cast("bigint"))
        .select("method", "query_id", "neighbor_id", "rank", "cosine_e4")
    )


ROLLING_FP_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents),
grams AS (
  SELECT doc_id, i, md5(array_to_string(t[i:i+3], ' ')) AS h
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 3)) AS i)
  WHERE len(t) >= 4),
wins AS (
  SELECT doc_id, i,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m,
         count(*) OVER (PARTITION BY doc_id) AS ng
  FROM grams),
sel AS (SELECT DISTINCT doc_id, m FROM wins WHERE i <= greatest(ng - 3, 1)),
fps AS (SELECT doc_id, md5(string_agg(m, '|' ORDER BY m)) AS rfp FROM sel GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(f.rfp,
                md5(array_to_string(string_split_regex(trim(lower(d.text)), '\\s+'), ' '))) AS rfp
FROM documents d LEFT JOIN fps f USING (doc_id)
"""


@_register("doc_rolling_fingerprints", ROLLING_FP_SQL)
def q_doc_rolling_fingerprints(spark, sf_dir):
    """Winnowing fingerprint (Arrow-batched UDF) gated against a DuckDB
    window-function replay (round-2 upgrade from rows-only)."""
    docs = _documents(spark, sf_dir)
    return docs.select("doc_id", dtext.rolling_fingerprint_udf(F.col("text")).alias("rfp"))


MULTIMODAL_SQL = """
SELECT doc_id AS media_id,
  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
       WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/y4m' END AS mime,
  CAST(CASE WHEN doc_id % 3 = 0 THEN 4 + doc_id % 5
            WHEN doc_id % 3 = 2 THEN 4 + doc_id % 3 END AS INT) AS width,
  CAST(CASE WHEN doc_id % 3 = 0 THEN 3 + doc_id % 4
            WHEN doc_id % 3 = 2 THEN 2 + doc_id % 3 END AS INT) AS height,
  CAST(CASE WHEN doc_id % 3 = 1 THEN 64 + doc_id % 64
            WHEN doc_id % 3 = 2 THEN (2 + doc_id % 5 + 1) // 2 END AS INT) AS n_frames,
  CAST(CASE WHEN doc_id % 3 = 1 THEN 8000 + (doc_id % 4) * 4000 END AS INT) AS sample_rate,
  CAST(CASE
    WHEN doc_id % 3 = 0 THEN
      list_sum(flatten(list_transform(generate_series(0, 3 + doc_id % 4 - 1), y ->
        list_transform(generate_series(0, 4 + doc_id % 5 - 1), x ->
          (doc_id + 3 * x + 7 * y) % 256)))) * 1000
      // ((4 + doc_id % 5) * (3 + doc_id % 4))
    WHEN doc_id % 3 = 1 THEN
      list_sum(list_transform(generate_series(0, 64 + doc_id % 64 - 1), i ->
        abs(((doc_id * 31 + i * 7) % 65536) - 32768))) * 1000
      // (64 + doc_id % 64)
    ELSE
      list_sum(flatten(list_transform(list_filter(generate_series(0, 2 + doc_id % 5 - 1),
                                                  f -> f % 2 = 0), f ->
        flatten(list_transform(generate_series(0, 2 + doc_id % 3 - 1), y ->
          list_transform(generate_series(0, 4 + doc_id % 3 - 1), x ->
            (doc_id + 13 * f + x + 5 * y) % 256)))))) * 1000
      // ((4 + doc_id % 3) * (2 + doc_id % 3) * ((2 + doc_id % 5 + 1) // 2))
  END AS BIGINT) AS mean_value_e3
FROM documents
"""


@_register("multimodal_decode", MULTIMODAL_SQL)
def q_multimodal_decode(spark, sf_dir):
    """Real pure-stdlib codecs (PNG/WAV/Y4M, multimodal.py) gated
    against an arithmetic oracle: payload content is a pure function of
    doc_id, so DuckDB predicts every decoded feature while Spark
    genuinely parses the bytes. n_bytes/sha256 (not arithmetic-
    predictable) are covered by pytest round-trip tests."""
    from kgforge.datapipe import multimodal as mm

    feats = mm.decode_features(mm.attach_media(_documents(spark, sf_dir)))
    return feats.select(
        "media_id", "mime", "width", "height", "n_frames", "sample_rate", "mean_value_e3"
    )


# ================================================================== 42-50
# SQL query surface: the reference's documented SPARQL corpus
# (docs/GRAPHDB_QUERIES.md) as spark.sql over registered views
# (sql_api.py); each oracle replays the same logic in DuckDB dialect
# over the fixture CTEs.
from kgforge import sql_api


@_register(
    "edge_reports_sql",
    with_linking(
        """SELECT 'top_assembly' AS kind, parent AS a, CAST(n_children AS VARCHAR) AS b
           FROM (SELECT parent, count(*) AS n_children FROM edges GROUP BY parent
                 ORDER BY n_children DESC, parent ASC LIMIT 20)
           UNION ALL
           SELECT 'multi_use', child, CAST(count(*) AS VARCHAR)
           FROM edges GROUP BY child HAVING count(*) > 5
           UNION ALL
           SELECT 'leaf', number, NULL FROM entities e
           WHERE NOT EXISTS (SELECT 1 FROM edges x WHERE x.parent = e.number)
           UNION ALL
           SELECT 'root', number, NULL FROM entities e
           WHERE NOT EXISTS (SELECT 1 FROM edges x WHERE x.child = e.number)"""
    ),
)
def q_edge_reports_sql(spark, sf_dir):
    """#4 top-20 children per assembly (:73-85, A3), A5 multi-use HAVING
    (:116-143), #5 leaves (:89-102) + roots (G7) — kind-tagged."""
    return sql_api.run(spark, sf_dir, sql_api.EDGE_REPORTS_SQL)


@_register(
    "part_catalog_sql",
    with_linking(
        """SELECT 'direct_children' AS kind, x.child AS a, e.name AS b
           FROM edges x JOIN focus_root r ON x.parent = r.r
           LEFT JOIN entities e ON e.number = x.child
           UNION ALL
           SELECT 'part_details', kv.prop, kv.val FROM (
             SELECT 'name' AS prop, e.name AS val FROM entities e JOIN focus_part f ON e.number = f.p
             UNION ALL SELECT 'type', e."type" FROM entities e JOIN focus_part f ON e.number = f.p
             UNION ALL SELECT 'source', e.source FROM entities e JOIN focus_part f ON e.number = f.p
             UNION ALL SELECT 'view', e."view" FROM entities e JOIN focus_part f ON e.number = f.p
             UNION ALL SELECT 'state', e.state FROM entities e JOIN focus_part f ON e.number = f.p
             UNION ALL SELECT 'revision', e.revision FROM entities e JOIN focus_part f ON e.number = f.p
             UNION ALL SELECT 'container', e.container FROM entities e JOIN focus_part f ON e.number = f.p
             UNION ALL SELECT 'part_type', e.part_type FROM entities e JOIN focus_part f ON e.number = f.p
           ) kv
           UNION ALL
           SELECT 'top_components', a, CAST(n AS VARCHAR) FROM (
             SELECT e.name AS a, count(*) AS n
             FROM edges x JOIN entities e ON e.number = x.parent
             GROUP BY e.name ORDER BY n DESC, a ASC LIMIT 10)
           UNION ALL
           SELECT 'alternates_for_part', a.replacement_number, e.name
           FROM alternate_links a JOIN focus_alt f ON a.child_number = f.p
           LEFT JOIN entities e ON e.number = a.replacement_number
           UNION ALL
           SELECT 'parts_with_alternates', coalesce(e.name, a.child_number),
                  CAST(count(*) AS VARCHAR)
           FROM alternate_links a LEFT JOIN entities e ON e.number = a.child_number
           GROUP BY coalesce(e.name, a.child_number)
           UNION ALL
           SELECT 'where_used', x.parent, e.name
           FROM edges x JOIN focus_child f ON x.child = f.c
           LEFT JOIN entities e ON e.number = x.parent
           UNION ALL
           SELECT 'mfg_view', ep.name, ec.name
           FROM edges x
           JOIN entities ep ON ep.number = x.parent AND ep."view" = 'Manufacturing'
           JOIN entities ec ON ec.number = x.child
           UNION ALL
           SELECT 'mech_part', e.name, e.number
           FROM entities e WHERE e.part_type = 'MechanicalPart'
           UNION ALL
           SELECT 'count_by_state', state, CAST(count(*) AS VARCHAR)
           FROM entities GROUP BY state
           UNION ALL
           SELECT 'make_vs_buy', ec.name, ec.source
           FROM edges x JOIN focus_root r ON x.parent = r.r
           JOIN entities ec ON ec.number = x.child""",
        extra_ctes="""
focus_root AS (SELECT min(parent) AS r FROM edges),
focus_part AS (SELECT min(number) AS p FROM entities),
focus_alt AS (SELECT min(child_number) AS p FROM alternate_links),
focus_child AS (SELECT min(child) AS c FROM edges)""",
    ),
)
def q_part_catalog_sql(spark, sf_dir):
    """The documented catalog corpus, kind-tagged in one surface:
    #1 direct children (:24-38), #7 part details as property/value pairs
    (:129-140), #8 assemblies with most components by label (:141-156),
    #9 alternates of a part (:157-170), #10 parts with alternates
    (:171-185), #13 where-used (:259-272), #16 Manufacturing-view BOM
    (:302-317), #17 mechanical parts (:318-332), #18 count by state
    (:333-345), #19 make-vs-buy within a BOM (:346-361). Focus parts are
    deterministic string-min picks (the reference pins literal URNs)."""
    return sql_api.run(spark, sf_dir, sql_api.PART_CATALOG_SQL)


@_register(
    "bom_closure_sql",
    with_linking(
        """SELECT 'complete_bom' AS kind, number AS a, name AS b FROM bom
           UNION ALL
           SELECT 'released_bom', number, name FROM bom WHERE state = 'RELEASED'
           UNION ALL
           SELECT 'name_pattern', number, name FROM bom
           WHERE regexp_matches(lower(name), 'pool')""",
        extra_ctes="""
focus_root AS (SELECT min(parent) AS r FROM edges),
desc_tree (node, depth) AS (
  SELECT x.child, 1 FROM edges x JOIN focus_root r ON x.parent = r.r
  UNION ALL
  SELECT e.child, t.depth + 1
  FROM desc_tree t JOIN edges e ON e.parent = t.node
  WHERE t.depth < 3
),
bom AS (
  SELECT DISTINCT e.number, e.name, e.state
  FROM desc_tree t JOIN entities e ON e.number = t.node
)""",
    ),
)
def q_bom_closure_sql(spark, sf_dir):
    """#14 complete BOM via partOfAssembly (:273-286), #15 state-filtered
    BOM (:287-301), advanced transitive + name-pattern query (:382-396;
    fixture analog of 'SCR-' is 'pool') — over the depth-capped recursive
    descendant set of a deterministic focus root. The FULL unsampled
    closure is gated separately (transitive_closure_full)."""
    return sql_api.run(spark, sf_dir, sql_api.BOM_CLOSURE_SQL)


@_register(
    "bom_tree_sql",
    with_linking(
        """SELECT t.root, t.node, e.name AS node_name, CAST(min(t.depth) AS INT) AS depth
           FROM tree t JOIN entities e ON e.number = t.node
           GROUP BY t.root, t.node, e.name""",
        extra_ctes="""
tree AS (
  SELECT parent AS root, child AS node, 1 AS depth FROM edges
  WHERE CAST(parent AS BIGINT) % 499 = 7
  UNION ALL
  SELECT t.root, e.child, t.depth + 1
  FROM tree t JOIN edges e ON t.node = e.parent
  WHERE t.depth < 3
)""",
    ),
)
def q_bom_tree_sql(spark, sf_dir):
    """#2 (:39-53): complete BOM tree with depth — Spark 4.1 native
    WITH RECURSIVE, no driver loop."""
    return sql_api.run(spark, sf_dir, sql_api.BOM_TREE_SQL)


@_register(
    "name_search_sql",
    with_fixtures(
        """SELECT number AS part_number, name AS part_name
           FROM entities WHERE regexp_matches(lower(name), '(pool|red)')"""
    ),
)
def q_name_search_sql(spark, sf_dir):
    """#3 (:55-69): find parts by name (regex search)."""
    return sql_api.run(spark, sf_dir, sql_api.NAME_SEARCH_SQL)


@_register(
    "root_path_sql",
    with_linking(
        """SELECT er.name AS level0, e1.name AS level1, e2.name AS level2
           FROM root ro
           JOIN entities er ON er.number = ro.r
           LEFT JOIN edges l1 ON l1.parent = ro.r
           LEFT JOIN entities e1 ON e1.number = l1.child
           LEFT JOIN edges l2 ON l2.parent = l1.child
           LEFT JOIN entities e2 ON e2.number = l2.child""",
        extra_ctes="root AS (SELECT min(parent) AS r FROM edges)",
    ),
)
def q_root_path_sql(spark, sf_dir):
    """#6 (:104-128): root-to-part path levels (nested OPTIONALs as
    left joins), deterministic min() root."""
    return sql_api.run(spark, sf_dir, sql_api.ROOT_PATH_SQL)


@_register(
    "composite_filter_sql",
    with_linking(
        """SELECT e.name AS part_name, count(*) AS usage_count
           FROM edges x JOIN entities e ON e.number = x.child
           WHERE e.state = 'RELEASED' AND e.part_type = 'MechanicalPart'
           GROUP BY e.name HAVING count(*) > 5"""
    ),
)
def q_composite_filter_sql(spark, sf_dir):
    """#20 (:362-378): released mechanical parts in >5 assemblies."""
    return sql_api.run(spark, sf_dir, sql_api.COMPOSITE_SQL)


@_register(
    "alternates_analysis_sql",
    with_fixtures(
        """SELECT 'bidirectional' AS kind, a1.child_number AS part_a,
                  a1.replacement_number AS part_b
           FROM alternate_links a1 JOIN alternate_links a2
             ON a1.child_number = a2.replacement_number
            AND a1.replacement_number = a2.child_number
           WHERE a1.child_number < a1.replacement_number
           UNION ALL
           SELECT 'color_variant', a.child_number, a.replacement_number
           FROM alternate_links a JOIN entities e ON e.number = a.replacement_number
           WHERE regexp_matches(lower(e.name), '(black|red|blue|white|orange|lime|green)')"""
    ),
)
def q_alternates_analysis_sql(spark, sf_dir):
    """#11 bidirectional alternates + #12 color variants (:186-218)."""
    return sql_api.run(spark, sf_dir, sql_api.ALTERNATES_SQL)


@_register(
    "impact_analysis_sql",
    with_linking(
        """SELECT DISTINCT x.child AS part_number, x.parent AS affected_assembly,
                  e.name AS assembly_name, h.parent AS higher_level
           FROM edges x
           JOIN entities e ON e.number = x.parent
           LEFT JOIN edges h ON h.child = x.parent
           WHERE CAST(x.child AS BIGINT) % 251 = 3"""
    ),
)
def q_impact_analysis_sql(spark, sf_dir):
    """Impact analysis (:417-437): direct usedIn + optional higher
    assembly level for a deterministic changed-part set."""
    return sql_api.run(spark, sf_dir, sql_api.IMPACT_SQL)


assert len(QUERIES) == 50, f"driver cap is 50 entries, registry has {len(QUERIES)}"
assert set(ORACLES) == set(QUERIES), "every entry must be oracle-checked"

