"""Edge-list CSV sources (SURVEY.md §2.1 S4/S5) with sniffed shape
routing — the reference's ``parse_bom_csv``
(/root/reference/src/utils/spreadsheet_loader.py:1155-1205) as
distributed reads.

The reference accepts two CSV shapes and routes by header:

- *hierarchical* (``Number`` + ``Level`` columns, :1161-1182): rows are
  an indented BOM export whose parentage is ORDER-DEPENDENT — decoded
  with the level stack;
- *simple parent-child* (:1184-1205): two columns found by synonym
  priority (:mod:`kgforge.sniff`), normalized, one edge per row.

Scale strategy: the simple shape is a plain distributed CSV scan. The
hierarchical shape needs per-file row ORDER, which a split CSV scan does
not guarantee — each file is read whole (``wholetext``), split to
(file, row_idx, line), per-line CSV-parsed JVM-side (``from_csv``), and
decoded by :func:`kgforge.graph.level_stack_decode_routed` with the file
as the group. One export file is one bounded sheet (the reference loads
the whole CSV on one machine); a corpus of many exports parallelizes
across files. Embedded newlines inside quoted cells are not supported in
the hierarchical shape (documented limitation; the reference's exports
never produce them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgforge import graph, sniff
from kgforge.normalize import normalize_number_col


def read_bom_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read a BOM edge CSV (file, directory, or glob) into deduplicated
    ``(parent, child)`` edges, routing by the sniffed header shape. All
    files under one path must share one header (one export family).

    Raises ``ValueError`` when neither shape matches — the caller
    decides whether to skip the input (the reference logs and returns
    no edges) or fail.
    """
    header_df = spark.read.option("header", True).csv(path)
    columns = [c for c in header_df.columns]
    lower = {str(c).strip().lower(): c for c in columns}

    if "number" in lower and "level" in lower:
        return _read_hierarchical(
            spark, path, columns, lower["number"], lower["level"]
        )

    pair = sniff.resolve_edge_columns(columns)
    if pair is None:
        raise ValueError(
            f"no BOM shape in header {columns}: need Number+Level or a "
            "parent/child column pair"
        )
    parent_col, child_col = pair
    edges = header_df.select(
        normalize_number_col(F.col(parent_col)).alias("parent"),
        normalize_number_col(F.col(child_col)).alias("child"),
    )
    # reference drops rows where either side is empty (:1202-1204);
    # dedup is the importer's edge-dedup step (:1221), folded in here
    return (
        edges.filter((F.col("parent") != "") & (F.col("child") != ""))
        .dropDuplicates()
    )


def _read_hierarchical(
    spark: SparkSession,
    path: str,
    columns: list[str],
    number_col: str,
    level_col: str,
) -> DataFrame:
    """Order-preserving hierarchical decode: one file = one group."""
    n_idx = columns.index(number_col)
    l_idx = columns.index(level_col)
    # positional schema: header casing/spacing never breaks from_csv
    line_schema = ", ".join(f"c{i} string" for i in range(len(columns)))

    files = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("group_id"), F.col("value")
    )
    lines = files.select(
        "group_id",
        F.posexplode(F.split(F.col("value"), "\r?\n")).alias("row_idx", "line"),
    )
    parsed = (
        lines.filter((F.col("row_idx") > 0) & (F.trim(F.col("line")) != ""))
        .select(
            "group_id",
            "row_idx",
            F.from_csv(F.col("line"), line_schema).alias("r"),
        )
        .select(
            "group_id",
            "row_idx",
            # try_cast: an unparseable level must null out (ANSI cast
            # throws), matching the reference's try/except skip :1170-1172
            F.col(f"r.c{l_idx}").try_cast("int").alias("level"),
            normalize_number_col(F.col(f"r.c{n_idx}")).alias("number"),
        )
        # reference skips rows with an unparseable level or empty number
        # (:1167-1174); the int cast nulls the former
        .filter(F.col("level").isNotNull() & (F.col("number") != ""))
    )
    max_level = parsed.agg(F.max("level")).first()[0]
    if max_level is None:
        return spark.createDataFrame([], "parent string, child string")
    return graph.level_stack_decode_routed(
        parsed, max_level=int(max_level)
    ).dropDuplicates()


def read_bom_csv_by_name(
    spark: SparkSession,
    path: str,
    entities: DataFrame,
    strategy: str = "broadcast",
    strict: bool = False,
) -> DataFrame:
    """S5: NAME-based BOM CSV -> resolved (parent, child) number edges.

    Mirrors the reference's two-step flow: ``parse_bom_csv_by_name``
    (:254-296 — synonym column-pair detection, in-data duplicated-header
    drop) feeding ``resolve_edges_by_name`` (:1055-1080) — here the
    resolution is the SAME distributed dictionary join as transcript
    linking (:func:`kgforge.linking.link_mentions`, keyed on the edge
    pair instead of the turn): exactly-one-candidate resolves, ambiguous
    and unknown edges drop (or raise under ``strict``), a name that IS a
    known number passes through, self-loops drop, edges dedup.
    """
    from kgforge import linking

    df = spark.read.option("header", True).csv(path)
    pair_cols = sniff.resolve_name_pair_columns(df.columns)
    if pair_cols is None:
        raise ValueError(
            f"no name-based BOM shape in header {df.columns}: need one of "
            f"{sniff.NAME_PAIR_SYNONYMS}"
        )
    p_col, c_col = pair_cols
    pairs = (
        df.select(
            F.trim(F.col(p_col)).alias("p_name"), F.trim(F.col(c_col)).alias("c_name")
        )
        # reference drops a duplicated header row that leaked into the
        # data (:264-268); distributed form: drop any row that equals
        # the header literally
        .filter(~((F.col("p_name") == p_col) & (F.col("c_name") == c_col)))
        .filter((F.col("p_name") != "") & (F.col("c_name") != ""))
        # resolution is a pure function of the pair -> dedup before the
        # dictionary join, not after
        .dropDuplicates()
    )
    mentions = pairs.selectExpr(
        "p_name", "c_name",
        "stack(2, 'parent', p_name, 'ref', c_name) AS (slot, mention)",
    )
    linked = linking.link_mentions(
        mentions, entities, strategy=strategy, key_cols=("p_name", "c_name", "slot")
    )
    if strict:
        linking.check_strict(linked)
    per_pair = linked.groupBy("p_name", "c_name").agg(
        F.max(
            F.when((F.col("slot") == "parent") & (F.col("status") == "resolved"),
                   F.col("resolved_number"))
        ).alias("parent"),
        F.max(
            F.when((F.col("slot") == "ref") & (F.col("status") == "resolved"),
                   F.col("resolved_number"))
        ).alias("child"),
    )
    return (
        per_pair.filter(F.col("parent").isNotNull() & F.col("child").isNotNull())
        .filter(F.col("parent") != F.col("child"))
        .select("parent", "child")
        .dropDuplicates()
    )


# ------------------------------------------------------------ API source
def read_api_pages(
    spark: SparkSession,
    fetch,
    entity_set: str,
    schema,
    page_size: int = 1000,
    params: dict | None = None,
    start_page: int = 0,
    max_pages: int = 100_000,
):
    """S9: paginated JSON-API source (the reference's OData leg,
    scripts/windchill_odata_temporal_import.py:47-76 ``query_odata`` —
    one ``$top``-bounded GET whose response unwraps to a row list).

    ``fetch(entity_set, params) -> list[dict]`` is the pluggable HTTP
    leg (the reference's ``session.get(...).json()['value']``); this
    driver loops ``$skip``/``$top`` pages until a short page or
    ``max_pages``. Pages accumulate driver-side — API ingestion is
    inherently connector-bound; a cluster scales it by splitting the
    keyspace across many *calls* of this reader, not by parallelizing
    one HTTP conversation — and enter Spark as ONE ``createDataFrame``
    with the explicit ``schema`` (schema-on-read: declared fields are
    picked from each record, absent fields null out, extra fields
    drop). Returns ``(DataFrame, next_page)``; persist ``next_page`` as
    a cursor and pass it back as ``start_page`` to resume an
    interrupted pull (the same checkpoint idea as resume.py, applied to
    the source side).
    """
    names = [f.name for f in schema.fields]
    rows: list[tuple] = []
    page = start_page
    while page - start_page < max_pages:
        page_params = dict(params or {})
        page_params["$skip"] = page * page_size
        page_params["$top"] = page_size
        records = fetch(entity_set, page_params)
        rows.extend(tuple(r.get(n) for n in names) for r in records)
        page += 1
        if len(records) < page_size:
            break
    return spark.createDataFrame(rows, schema), page
