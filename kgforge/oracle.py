"""DuckDB-SQL mirror of :mod:`kgforge.fixtures` — the oracle side.

Every CTE here implements the *same deterministic derivation spec* as
fixtures.py (see its module docstring). Oracle queries are written as
``with_fixtures("SELECT ... FROM transcripts ...")``. The driver runs
these against DuckDB views named region/nation/customer/supplier/part/
orders/lineitem/events/documents/embeddings.
"""

from __future__ import annotations

FIXTURE_CTES = """
turns_base AS (
  SELECT
    'conv-' || CAST(l.l_orderkey AS VARCHAR) AS conv_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY l.l_orderkey
         ORDER BY l.l_linenumber, l.l_partkey, l.l_suppkey) - 1 AS INT) AS turn_idx,
    l.l_orderkey,
    l.l_partkey,
    l.l_linenumber,
    l.l_shipdate AS ts,
    CAST(FLOOR(l.l_quantity) AS BIGINT) AS qty,
    CASE WHEN l.l_partkey % 19 = 3 THEN 'unknown widget ' || CAST(l.l_suppkey AS VARCHAR)
         WHEN l.l_partkey % 19 = 7 THEN CAST(l.l_partkey AS VARCHAR) || '.0'
         WHEN l.l_partkey % 20 = 9 THEN 'pool part ' || CAST(l.l_partkey % 5 AS VARCHAR)
         ELSE p.p_name || ' ' || p.p_brand || ' #' || CAST(l.l_partkey AS VARCHAR)
    END AS mention
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
turns AS (
  SELECT conv_id, turn_idx,
    CASE turn_idx % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
    CASE WHEN turn_idx % 3 = 2 THEN
      CASE WHEN l_orderkey % 2 = 0 THEN 'bom_lookup' ELSE 'part_search' END END AS tool,
    ts, qty, mention,
    LAG(mention) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS parent_mention
  FROM turns_base
),
transcripts AS (
  SELECT conv_id, turn_idx, role,
    role || ' turn: ref=[' || mention || ']'
      || COALESCE(' parent=[' || parent_mention || ']', '')
      || ' qty=' || CAST(qty AS VARCHAR) AS text,
    tool, ts
  FROM turns
),
entities_raw AS (
  SELECT 0 AS sheet_idx, p_partkey AS row_idx,
    CAST(p_partkey AS VARCHAR) AS number,
    CASE WHEN p_partkey % 20 = 9 THEN 'pool part ' || CAST(p_partkey % 5 AS VARCHAR)
         ELSE p_name || ' ' || p_brand || ' #' || CAST(p_partkey AS VARCHAR) END AS name,
    p_type AS "type",
    CASE WHEN p_partkey % 2 = 0 THEN 'make' ELSE 'buy' END AS source,
    CASE p_partkey % 3 WHEN 0 THEN 'Design' WHEN 1 THEN 'Manufacturing' ELSE 'Service' END AS "view",
    CASE p_partkey % 4 WHEN 0 THEN 'RELEASED' WHEN 1 THEN 'DESIGN'
         WHEN 2 THEN 'INPLANNING' ELSE 'CANCELLED' END AS state,
    CASE WHEN p_partkey % 5 = 0 THEN NULL
         ELSE chr(CAST(64 + p_partkey % 5 AS INT)) END AS revision,
    CASE WHEN p_partkey % 7 = 0 THEN NULL
         ELSE 'container-' || CAST(p_partkey % 7 AS VARCHAR) END AS container,
    CASE WHEN p_partkey % 101 = 100 THEN NULL
         ELSE CASE p_partkey % 4 WHEN 0 THEN 'MechanicalPart' WHEN 1 THEN 'SoftwarePart'
              WHEN 2 THEN 'Variant' ELSE 'WTPart' END END AS part_type
  FROM part
  UNION ALL
  SELECT 1, p_partkey,
    CAST(p_partkey AS VARCHAR),
    CASE WHEN p_partkey % 20 = 9 THEN 'pool part ' || CAST(p_partkey % 5 AS VARCHAR)
         ELSE p_name || ' ' || p_brand || ' #' || CAST(p_partkey AS VARCHAR) END,
    p_type,
    CASE WHEN p_partkey % 2 = 0 THEN 'make' ELSE 'buy' END,
    CASE p_partkey % 3 WHEN 0 THEN 'Design' WHEN 1 THEN 'Manufacturing' ELSE 'Service' END,
    'RELEASED',
    'Z',
    CASE WHEN p_partkey % 7 = 0 THEN NULL
         ELSE 'container-' || CAST(p_partkey % 7 AS VARCHAR) END,
    CASE WHEN p_partkey % 101 = 100 THEN NULL
         ELSE CASE p_partkey % 4 WHEN 0 THEN 'MechanicalPart' WHEN 1 THEN 'SoftwarePart'
              WHEN 2 THEN 'Variant' ELSE 'WTPart' END END
  FROM part WHERE p_partkey % 50 = 0
),
entities AS (
  SELECT number, name, "type", source, "view", state, revision, container, part_type
  FROM (SELECT * REPLACE (left(number, 50) AS number),
               ROW_NUMBER() OVER (PARTITION BY left(number, 50)
              ORDER BY sheet_idx DESC, row_idx DESC) AS rn
        FROM entities_raw)
  WHERE rn = 1
),
versions AS (
  SELECT CAST(o_custkey AS VARCHAR) AS number,
         o_orderkey AS version,
         o_orderstatus AS state,
         o_orderdate AS created_ts
  FROM orders
),
doc_versions AS (
  SELECT 'DOC-' || CAST(o_custkey % 997 AS VARCHAR) AS number,
         o_orderkey AS version,
         o_orderstatus AS state,
         o_orderdate AS created_ts
  FROM orders
),
all_versions AS (
  SELECT * FROM versions UNION ALL SELECT * FROM doc_versions
),
changes AS (
  SELECT 'CH-' || CAST(event_id AS VARCHAR) AS change_id,
         event_type AS change_type,
         CAST(user_id % (SELECT COUNT(*) FROM part) AS VARCHAR) AS affected_number,
         ts
  FROM events WHERE event_id % 20 = 0
),
alternate_links AS (
  SELECT CAST(p_partkey AS VARCHAR) AS child_number,
         CAST((p_partkey + 13) % (SELECT COUNT(*) FROM part) AS VARCHAR) AS replacement_number,
         'alternate' AS replacement_type
  FROM part WHERE p_partkey % 37 = 5
),
describe_links AS (
  SELECT 'DOC-' || CAST(s_suppkey AS VARCHAR) AS document_number,
         CAST(s_suppkey % (SELECT COUNT(*) FROM part) AS VARCHAR) AS part_number,
         CASE WHEN s_suppkey % 3 = 0 THEN NULL
              ELSE chr(CAST(65 + s_suppkey % 3 AS INT)) END AS document_revision,
         CASE WHEN s_suppkey % 4 = 0 THEN NULL
              ELSE 'org-' || CAST(s_suppkey % 4 AS VARCHAR) END AS document_org,
         CASE WHEN s_suppkey % 5 = 0 THEN NULL
              ELSE 'lib-' || CAST(s_suppkey % 5 AS VARCHAR) END AS document_container
  FROM supplier
),
hierarchy AS (
  SELECT conv_id AS group_id, turn_idx AS row_idx,
         CASE WHEN turn_idx = 0 THEN 0 ELSE 1 + turn_idx % 2 END AS level,
         CAST(l_partkey AS VARCHAR) AS number,
         qty AS quantity,
         CASE WHEN l_linenumber % 3 = 0 THEN NULL
              WHEN l_linenumber % 2 = 0 THEN 'ea' ELSE 'kg' END AS uom,
         'FN-' || CAST(l_linenumber % 10 AS VARCHAR) AS find_number
  FROM turns_base
)
"""

# Shared linking CTEs: mention extraction -> name-index join -> status
# classification -> BOM edges. Mirrors extract.extract_mentions,
# linking.link_mentions and graph.bom_edges_from_linked exactly.
LINK_CTES = r"""
mentions AS (
  SELECT conv_id, turn_idx, 'ref' AS slot,
         regexp_extract(text, 'ref=\[([^\]]+)\]', 1) AS mention
  FROM transcripts WHERE regexp_extract(text, 'ref=\[([^\]]+)\]', 1) <> ''
  UNION ALL
  SELECT conv_id, turn_idx, 'parent',
         regexp_extract(text, 'parent=\[([^\]]+)\]', 1)
  FROM transcripts WHERE regexp_extract(text, 'parent=\[([^\]]+)\]', 1) <> ''
),
name_index AS (
  -- reference indexes str(name or number).strip(): blank names fall
  -- back to the (trimmed) number (spreadsheet_loader.py:1041-1052)
  SELECT trim(coalesce(nullif(name, ''), number)) AS name,
         list_sort(list(DISTINCT number)) AS candidates
  FROM entities GROUP BY 1
),
known AS (SELECT DISTINCT number FROM entities),
linked AS (
  SELECT m.conv_id, m.turn_idx, m.slot, m.mention,
    CASE WHEN ni.name IS NOT NULL AND len(ni.candidates) = 1 THEN 'resolved'
         WHEN ni.name IS NOT NULL THEN 'ambiguous'
         WHEN kn.number IS NOT NULL THEN 'resolved'
         ELSE 'unknown' END AS status,
    CASE WHEN ni.name IS NOT NULL AND len(ni.candidates) = 1 THEN ni.candidates[1]
         WHEN ni.name IS NOT NULL THEN NULL
         ELSE kn.number END AS resolved_number
  FROM mentions m
  LEFT JOIN name_index ni ON m.mention = ni.name
  LEFT JOIN known kn
    ON (CASE WHEN regexp_matches(trim(m.mention), '^[0-9]+\.0+$')
             THEN regexp_replace(trim(m.mention), '\.0+$', '')
             ELSE trim(m.mention) END) = kn.number
),
edges AS (
  SELECT DISTINCT parent, child FROM (
    SELECT conv_id, turn_idx,
      max(CASE WHEN slot = 'ref' AND status = 'resolved' THEN resolved_number END) AS child,
      max(CASE WHEN slot = 'parent' AND status = 'resolved' THEN resolved_number END) AS parent
    FROM linked GROUP BY conv_id, turn_idx)
  WHERE parent IS NOT NULL AND child IS NOT NULL AND parent <> child
)
"""


def with_fixtures(query: str, extra_ctes: str = "") -> str:
    """Wrap a SELECT with the shared fixture CTEs (plus optional extras).
    RECURSIVE is always declared so callers may add recursive CTEs."""
    extra = ("," + extra_ctes) if extra_ctes else ""
    return f"WITH RECURSIVE {FIXTURE_CTES}{extra}\n{query}"


def with_linking(query: str, extra_ctes: str = "") -> str:
    """Fixtures + the full linking chain (mentions/linked/edges CTEs)."""
    extra = ("," + extra_ctes) if extra_ctes else ""
    return f"WITH RECURSIVE {FIXTURE_CTES},{LINK_CTES}{extra}\n{query}"
