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


# ================================================================== datapipe
# Training-data pipeline operators over documents/embeddings (the extra
# first-class ops beyond the reference: dedup, similarity, text analysis).
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


@_register(
    "doc_token_counts",
    "SELECT doc_id,"
    " CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens_ws,"
    " CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens_bpe"
    " FROM documents",
)
def q_doc_token_counts(spark, sf_dir):
    docs = _documents(spark, sf_dir)
    return docs.select(
        "doc_id",
        dtext.token_count_ws(F.col("text")).cast("bigint").alias("n_tokens_ws"),
        dtext.token_count_regex(F.col("text")).cast("bigint").alias("n_tokens_bpe"),
    )


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
    out = dtext.quality_features(_documents(spark, sf_dir))
    return out.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "avg_token_len_e3",
        "stopword_ratio_e6",
    )


@_register(
    "doc_fingerprints",
    f"WITH {DOCS_PLUS_CTE[1:]}\nSELECT doc_id, fp FROM doc_fp WHERE doc_id < 1000000",
)
def q_doc_fingerprints(spark, sf_dir):
    docs = _documents(spark, sf_dir)
    return docs.select("doc_id", dtext.fingerprint_col(F.col("text")).alias("fp"))


@_register(
    "dedup_exact",
    f"WITH {DOCS_PLUS_CTE[1:]}\n"
    "SELECT fp, min(doc_id) AS canonical_doc_id, count(*) AS n_copies"
    " FROM doc_fp GROUP BY fp",
)
def q_dedup_exact(spark, sf_dir):
    return dd.exact_dedup(dd.docs_with_dups(_documents(spark, sf_dir)))


@_register(
    "dedup_ngram_jaccard",
    f"""WITH {DOCS_PLUS_CTE[1:]},
sizes AS (SELECT doc_id, count(*) AS n FROM doc_shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
  FROM doc_shingles a JOIN doc_shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT doc_a, doc_b,
       CAST(floor(n_shared * 1000000.0 / (sa.n + sb.n - n_shared)) AS BIGINT) AS jaccard_e6
FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
WHERE floor(n_shared * 1000000.0 / (sa.n + sb.n - n_shared)) >= 800000""",
)
def q_dedup_ngram_jaccard(spark, sf_dir):
    return dd.jaccard_pairs(dd.docs_with_dups(_documents(spark, sf_dir)))


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


@_register(
    "embedding_near_dups",
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
       CAST(floor(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) * 10000) AS BIGINT) AS cosine_e4
FROM e a, e b
WHERE a.vec_id < b.vec_id
  AND list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35""",
)
def q_embedding_near_dups(spark, sf_dir):
    return sim.embedding_near_dups(_embeddings(spark, sf_dir), threshold=0.35)


# -------- weaker rows-only checks (not expressible / not worth SQL) --------
@_register("ann_lsh_topk", None)
def q_ann_lsh_topk(spark, sf_dir):
    emb = _embeddings(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return sim.lsh_ann_topk(queries, emb, k=5)


@_register("dedup_simhash", None)
def q_dedup_simhash(spark, sf_dir):
    return dd.simhash_near_dups(dd.docs_with_dups(_documents(spark, sf_dir)))


@_register("multimodal_decode", None)
def q_multimodal_decode(spark, sf_dir):
    from kgforge.datapipe import multimodal as mm

    return mm.decode_features(mm.attach_media(_documents(spark, sf_dir)))


@_register("doc_rolling_fingerprints", None)
def q_doc_rolling_fingerprints(spark, sf_dir):
    docs = _documents(spark, sf_dir)
    return docs.select("doc_id", dtext.rolling_fingerprint_udf(F.col("text")).alias("rfp"))


@_register("connected_components", None)
def q_connected_components(spark, sf_dir):
    edges = _edges(spark, sf_dir).filter(
        (F.col("parent").cast("bigint") + F.col("child").cast("bigint")) % 10 == 0
    )
    return graph.connected_components(edges)


# ================================================================== reports,
# scalar ops, k-hop, G2 — remaining SURVEY §2 coverage
from kgforge import normalize, reports


@_register(
    "name_index_report",
    with_linking(
        "SELECT name, unnest(candidates) AS number,"
        " CAST(len(candidates) AS INT) AS n_candidates FROM name_index"
    ),
)
def q_name_index_report(spark, sf_dir):
    return reports.name_index_report(fixtures.load_entities(spark, sf_dir))


@_register(
    "skip_log",
    with_linking(
        "SELECT mention, status, count(*) AS n_occurrences FROM linked"
        " WHERE status <> 'resolved' GROUP BY mention, status"
    ),
)
def q_skip_log(spark, sf_dir):
    return reports.skip_log(_linked(spark, sf_dir))


@_register(
    "bom_by_name",
    with_linking(
        """SELECT COALESCE(ep.name, x.parent) AS parent_name,
                  COALESCE(ec.name, x.child) AS child_name,
                  x.parent, x.child
           FROM edges x
           LEFT JOIN entities ep ON ep.number = x.parent
           LEFT JOIN entities ec ON ec.number = x.child"""
    ),
)
def q_bom_by_name(spark, sf_dir):
    return reports.bom_by_name(_edges(spark, sf_dir), fixtures.load_entities(spark, sf_dir))


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
    "display_attrs",
    with_fixtures(
        f"SELECT number, {_COLOR_CASE} AS display_color, {_SIZE_SQL} AS node_size FROM entities"
    ),
)
def q_display_attrs(spark, sf_dir):
    e = fixtures.load_entities(spark, sf_dir)
    return e.select(
        "number",
        normalize.display_color_col(
            F.col("state"), F.col("source"), F.col("part_type")
        ).alias("display_color"),
        normalize.display_size_col(
            F.col("type"), F.col("source"), F.col("view"),
            F.col("state"), F.col("revision"), F.col("container"),
        ).alias("node_size"),
    )


_GATE_KEYWORDS = ["widget", "rod", "plate", "pool"]


@_register(
    "keyword_classify",
    with_fixtures(
        "SELECT number, regexp_matches(lower(number || ' ' || name),"
        f" '{'|'.join(_GATE_KEYWORDS)}') AS is_match FROM entities"
    ),
)
def q_keyword_classify(spark, sf_dir):
    e = fixtures.load_entities(spark, sf_dir)
    return e.select(
        "number",
        normalize.keyword_classifier_col(
            F.col("number"), F.col("name"), _GATE_KEYWORDS
        ).alias("is_match"),
    )


@_register(
    "stable_ids",
    with_fixtures(
        "SELECT number, sha256(number || chr(31) || name) AS stable_id FROM entities"
    ),
)
def q_stable_ids(spark, sf_dir):
    e = fixtures.load_entities(spark, sf_dir)
    return e.select(
        "number", normalize.stable_id_col(F.col("number"), F.col("name")).alias("stable_id")
    )


@_register(
    "parse_dates",
    with_fixtures(
        """SELECT number, version,
                  CAST(epoch(CAST(strftime(created_ts, '%Y-%m-%d %H:%M:%S') AS TIMESTAMP)) AS BIGINT) AS parsed_epoch
           FROM versions"""
    ),
)
def q_parse_dates(spark, sf_dir):
    v = fixtures.load_versions(spark, sf_dir)
    iso = F.date_format("created_ts", "yyyy-MM-dd HH:mm:ss")
    return v.select(
        "number", "version", normalize.parse_date_col(iso).alias("parsed_epoch")
    )


@_register(
    "turn_classes",
    with_fixtures(
        """SELECT conv_id, turn_idx,
                  CASE WHEN role = 'tool' THEN COALESCE('Tool:' || tool, 'Tool')
                       WHEN role = 'assistant' THEN 'AssistantTurn'
                       WHEN role = 'user' THEN 'UserTurn'
                       ELSE 'Turn' END AS turn_class
           FROM transcripts"""
    ),
)
def q_turn_classes(spark, sf_dir):
    t = fixtures.load_transcripts(spark, sf_dir)
    return t.select(
        "conv_id",
        "turn_idx",
        normalize.classify_role_col(F.col("role"), F.col("tool")).alias("turn_class"),
    )


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


@_register(
    "edge_label_triples",
    """SELECT 'urn:ontology:' || p AS subj,
              'http://www.w3.org/2000/01/rdf-schema#label' AS pred,
              p AS obj, TRUE AS obj_is_literal
       FROM (VALUES ('hasComponent'), ('usedIn'), ('partOfAssembly'),
                    ('hasAlternate'), ('describes')) t(p)""",
)
def q_edge_label_triples(spark, sf_dir):
    return materialize.edge_label_triples(spark)


@_register(
    "validation_counters",
    with_fixtures(
        """SELECT count(*) AS n_rows,
                  CAST(sum(CASE WHEN number IS NOT NULL AND number <> ''
                       AND NOT regexp_matches(number, '[<>:"|?*\\x00-\\x1f]') THEN 1 ELSE 0 END) AS BIGINT) AS n_valid_number,
                  CAST(sum(CASE WHEN name IS NOT NULL AND name <> ''
                       AND length(name) <= 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid_name
           FROM entities_raw"""
    ),
)
def q_validation_counters(spark, sf_dir):
    raw = fixtures.load_entities_raw(spark, sf_dir)
    return raw.agg(
        F.count("*").alias("n_rows"),
        F.sum(normalize.valid_number_col(F.col("number")).cast("int"))
        .cast("bigint")
        .alias("n_valid_number"),
        F.sum(normalize.valid_name_col(F.col("name")).cast("int"))
        .cast("bigint")
        .alias("n_valid_name"),
    )


# ================================================================== canonicalization,
# IRI encoding, versions, JSON source, streaming coverage
from kgforge import canonicalize


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
    "iri_encoded_names",
    with_fixtures(
        "SELECT number, replace(replace(name, ' ', '%20'), '#', '%23') AS iri_name"
        " FROM entities"
    ),
)
def q_iri_encoded_names(spark, sf_dir):
    from kgforge.normalize import iri_encode_udf

    e = fixtures.load_entities(spark, sf_dir)
    return e.select("number", iri_encode_udf(F.col("name")).alias("iri_name"))


@_register(
    "version_is_latest",
    with_fixtures(
        """SELECT number, version,
                  (version = max(version) OVER (PARTITION BY number)) AS is_latest
           FROM versions"""
    ),
)
def q_version_is_latest(spark, sf_dir):
    from pyspark.sql import Window

    v = fixtures.load_versions(spark, sf_dir)
    w = Window.partitionBy("number")
    return v.select(
        "number", "version", (F.col("version") == F.max("version").over(w)).alias("is_latest")
    )


@_register("entities_json_source", with_fixtures("SELECT * FROM entities"))
def q_entities_json_source(spark, sf_dir):
    """S8 (scripts/generate_load_script.py:10-14): JSON parts source —
    round-trip the entity table through spark.read.json with an explicit
    schema (schema-on-read, no sniffing)."""
    import os
    import tempfile

    from kgforge.schema import ENTITY_SCHEMA

    # stable cache path: basename of sf_dir (NOT Python hash(), which is
    # run-unstable under PYTHONHASHSEED)
    tag = os.path.basename(sf_dir.rstrip("/")) or "default"
    path = os.path.join(tempfile.gettempdir(), f"kgforge_entities_json_{tag}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        fixtures.load_entities(spark, sf_dir).write.mode("overwrite").json(path)
    return spark.read.schema(ENTITY_SCHEMA).json(path)


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
    rows = fixtures.load_hierarchy(spark, sf_dir)
    return graph.level_stack_decode_usage(rows).dropDuplicates()


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


@_register(
    "name_fallback_count",
    with_linking(
        """SELECT CAST(sum(CASE WHEN ep.name IS NULL THEN 1 ELSE 0 END)
                  + sum(CASE WHEN ec.name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_fallbacks,
                  count(*) AS n_edges
           FROM edges x
           LEFT JOIN entities ep ON ep.number = x.parent
           LEFT JOIN entities ec ON ec.number = x.child"""
    ),
)
def q_name_fallback_count(spark, sf_dir):
    """A8 (:1113-1117): edges whose endpoint had no display name and fell
    back to the raw number in the generated name-BOM."""
    named = reports.bom_by_name(_edges(spark, sf_dir), fixtures.load_entities(spark, sf_dir))
    return named.agg(
        (
            F.sum((F.col("parent_name") == F.col("parent")).cast("int"))
            + F.sum((F.col("child_name") == F.col("child")).cast("int"))
        )
        .cast("bigint")
        .alias("n_fallbacks"),
        F.count("*").alias("n_edges"),
    )


@_register(
    "strip_iri_ids",
    with_fixtures(
        "SELECT DISTINCT replace('urn:part:' || number, 'urn:part:', '') AS part_id"
        " FROM entities"
    ),
)
def q_strip_iri_ids(spark, sf_dir):
    """P12 (docs/GRAPHDB_QUERIES.md:34): IRI -> id strip on the query side."""
    subj = materialize.part_triples(fixtures.load_entities(spark, sf_dir)).select("subj")
    return subj.select(
        F.regexp_replace("subj", "^urn:part:", "").alias("part_id")
    ).dropDuplicates()


@_register(
    "change_part_links",
    with_fixtures(
        """SELECT c.change_id, e.number AS part_number
           FROM changes c JOIN entities e ON c.affected_number = e.number"""
    ),
)
def q_change_part_links(spark, sf_dir):
    """J10 (helicopter_change_importer.py:348-376): AFFECTS_PART by exact
    part-number equi-join."""
    c = fixtures.load_changes(spark, sf_dir)
    e = fixtures.load_entities(spark, sf_dir)
    return c.join(F.broadcast(e), c.affected_number == e.number).select(
        "change_id", F.col("number").alias("part_number")
    )


@_register(
    "parts_by_state",
    with_fixtures("SELECT state, count(*) AS n FROM entities GROUP BY state"),
)
def q_parts_by_state(spark, sf_dir):
    """A4 (GRAPHDB_QUERIES.md:335-344): group-count by lifecycle state."""
    return fixtures.load_entities(spark, sf_dir).groupBy("state").agg(
        F.count("*").alias("n")
    )


# ================================================================== SQL surface
# (the reference's SPARQL corpus as spark.sql over registered views;
# shares the DataFrame entries' oracles — both paths must agree)
from kgforge import sql_api


@_register("top_assemblies_sql", ORACLES["top_assemblies"])
def q_top_assemblies_sql(spark, sf_dir):
    return sql_api.run(spark, sf_dir, sql_api.TOP_ASSEMBLIES_SQL)


@_register("multi_use_parts_sql", ORACLES["multi_use_parts"])
def q_multi_use_parts_sql(spark, sf_dir):
    return sql_api.run(spark, sf_dir, sql_api.MULTI_USE_SQL)


@_register("leaf_parts_sql", ORACLES["leaf_parts"])
def q_leaf_parts_sql(spark, sf_dir):
    return sql_api.run(spark, sf_dir, sql_api.LEAF_PARTS_SQL)
