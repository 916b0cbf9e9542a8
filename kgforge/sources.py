"""Edge-list CSV + Excel workbook sources (SURVEY.md §2.1 S1-S7) with
sniffed shape routing — the reference's ``parse_bom_csv``
(/root/reference/src/utils/spreadsheet_loader.py:152-252) and
``generate_bom_from_excel``'s in-sheet hierarchical parse (:1160-1182)
as distributed reads.

The reference accepts two CSV shapes and routes by header:

- *hierarchical* (``Number`` + ``Level`` columns): rows are an indented
  BOM export whose parentage is ORDER-DEPENDENT.  NOTE a deliberate
  divergence: the reference's ``--bom`` CSV flow assigns children to
  previous-level parts ROUND-ROBIN by index
  (``_parse_hierarchical_bom_csv`` :194-252 — kept verbatim as
  :func:`kgforge.graph.level_stack_round_robin`), while its in-Excel
  hierarchical parse (:1160-1182) uses the order-correct LEVEL STACK.
  The level stack is what produced the reference's published Snowmobile
  graph (1,543 distinct hasComponent edges — reproduced by
  tests/test_snowmobile_golden.py), so this reader decodes
  hierarchical CSVs with the stack;
- *simple parent-child* (:172-193): two columns found by synonym
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
from pyspark.sql.window import Window

from kgforge import graph, sniff
from kgforge.normalize import normalize_number_col


def read_bom_csv(
    spark: SparkSession, path: str, hierarchical_mode: str = "stack"
) -> DataFrame:
    """Read a BOM edge CSV (file, directory, or glob) into deduplicated
    ``(parent, child)`` edges, routing by the sniffed header shape. All
    files under one path must share one header (one export family).

    ``hierarchical_mode`` selects the decode for Number+Level files:
    ``"stack"`` (default) is the order-correct level stack that produced
    the reference's published Snowmobile graph; ``"roundrobin"`` is the
    bit-compatible replay of the reference's *current* ``--bom`` code
    path (``_parse_hierarchical_bom_csv`` :194-252, positional
    assignment of level-L rows over level-(L-1) rows) for users
    migrating from that flow.

    Raises ``ValueError`` when neither shape matches — the caller
    decides whether to skip the input (the reference logs and returns
    no edges) or fail.
    """
    header_df = spark.read.option("header", True).csv(path)
    columns = [c for c in header_df.columns]
    lower = {str(c).strip().lower(): c for c in columns}

    if "number" in lower and "level" in lower:
        return _read_hierarchical(
            spark, path, columns, lower["number"], lower["level"],
            mode=hierarchical_mode,
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
    mode: str = "stack",
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
    if mode == "roundrobin":
        # the reference's current --bom semantics, no dedup (:252 returns
        # the raw edge list; the importer's edge store dedups by MERGE)
        return graph.level_stack_round_robin(parsed).dropDuplicates()
    if mode != "stack":  # pragma: no cover
        raise ValueError(f"unknown hierarchical_mode {mode!r}")
    max_level = parsed.agg(F.max("level")).first()[0]
    if max_level is None:
        return spark.createDataFrame([], "parent string, child string")
    return graph.level_stack_decode_routed(
        parsed, max_level=int(max_level)
    ).dropDuplicates()


def convert_hierarchical_bom(spark: SparkSession, path: str) -> DataFrame:
    """The reference's hierarchical→parent-child conversion utility
    (scripts/convert_hierarchical_bom.py): the level-stack decode with
    duplicates PRESERVED — the shipped ``data/bom_parent_child.csv``
    artifact is this script's raw output (2,072 dup-bearing rows whose
    distinct set is the published 1,543), so the converter keeps row
    multiplicity; the ``read_bom_csv`` ingestion path dedups.
    """
    header_df = spark.read.option("header", True).csv(path)
    columns = [c for c in header_df.columns]
    lower = {str(c).strip().lower(): c for c in columns}
    if "number" not in lower or "level" not in lower:
        raise ValueError(f"not a hierarchical BOM header: {columns}")
    n_idx = columns.index(lower["number"])
    l_idx = columns.index(lower["level"])
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
            F.col(f"r.c{l_idx}").try_cast("int").alias("level"),
            normalize_number_col(F.col(f"r.c{n_idx}")).alias("number"),
        )
        .filter(F.col("level").isNotNull() & (F.col("number") != ""))
    )
    max_level = parsed.agg(F.max("level")).first()[0]
    if max_level is None:
        return spark.createDataFrame([], "parent string, child string")
    return graph.level_stack_decode_routed(parsed, max_level=int(max_level))


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
    # reference drops a duplicated header row that leaked into the data
    # (:264-268, first data row only). Distributed form (no row order):
    # drop rows that mirror the header across EVERY column — a
    # legitimate row whose two name cells merely coincide with the
    # header strings survives as long as any other column differs
    # (eqNullSafe: a null cell never equals a header name)
    header_mirror = None
    for c in df.columns:
        cond = F.trim(F.col(c)).eqNullSafe(F.lit(str(c).strip()))
        header_mirror = cond if header_mirror is None else (header_mirror & cond)
    # the reference additionally drops a FIRST row whose values are a
    # superset of the two name-column headers (:264-268) — so a leaked
    # header row whose extra cells parsed as null (trailing commas)
    # would survive the all-columns mirror above and become a bogus
    # name edge. Distributed form: also drop rows whose name cells both
    # mirror their headers AND whose every other column is null or
    # mirrors its header. Residual divergence (documented): a first row
    # with header name cells plus a DIVERGENT non-null extra cell is
    # dropped by the reference (first-row superset) but kept here — in
    # a distributed read that row is indistinguishable from a
    # legitimate part actually named 'Parent Name' appearing anywhere
    # in the file, and keeping it matches the reference's own handling
    # of every row past the first.
    name_header_mirror = F.trim(F.col(p_col)).eqNullSafe(
        F.lit(str(p_col).strip())
    ) & F.trim(F.col(c_col)).eqNullSafe(F.lit(str(c_col).strip()))
    for c in df.columns:
        if c in (p_col, c_col):
            continue
        other_ok = F.col(c).isNull() | F.trim(F.col(c)).eqNullSafe(F.lit(str(c).strip()))
        name_header_mirror = name_header_mirror & other_ok
    pairs = (
        df.filter(~header_mirror & ~name_header_mirror)
        .select(
            F.trim(F.col(p_col)).alias("p_name"), F.trim(F.col(c_col)).alias("c_name")
        )
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


# ------------------------------------------------------------ Excel (S1-S3, S6, S7)
#
# Workbooks are DIMENSION inputs (parts catalogs / link sheets, 10^3-10^5
# rows) read once on the driver by the stdlib reader (kgforge.xlsx) and
# parallelized into DataFrames; every set-level semantic (last-wins
# overwrite, normalization, dedup, level-stack decode) runs IN SPARK so
# the same operators serve a 10^12-row fact-side source unchanged.

_PART_TYPE_TOKENS = (
    "MechanicalPart",
    "SoftwarePart",
    "Variant",
    "WTPart",
    "BasicNode",
    "StructureNode",
)

_PARTS_SCHEMA = (
    "seq bigint, number string, name string, type string, source string, "
    "view string, state string, revision string, container string, "
    "part_type string"
)


def _cell_str(v) -> str | None:
    """Reference cell-to-string semantics: missing -> None, integral
    float -> str(int) (normalize_part_number :35-42 for numbers; the
    metadata fields go through plain str() :99-107, where a pandas
    float column renders '1.0' — parts sheets store these as text, so
    the collapse only ever fires on true numeric cells)."""
    if v is None:
        return None
    if isinstance(v, float):
        return str(int(v)) if v.is_integer() else str(v)
    return str(v)


def _excel_tables(path: str, sheets: list[str] | None):
    from kgforge import xlsx

    wb = xlsx.read_workbook(path)
    for name in sheets or list(wb):
        grid = wb.get(name)
        if grid is None:
            continue
        t = xlsx.Table(grid, skiprows=4)
        if t.empty or not t.columns:
            t = xlsx.Table(grid, skiprows=0)
        yield name, t


def read_excel_parts(
    spark: SparkSession,
    path: str,
    sheets: list[str] | None = None,
    sniffed: bool = False,
) -> DataFrame:
    """S2: parts scan over every sheet of a workbook — the reference's
    ``SpreadsheetParser.parse_parts`` (spreadsheet_loader.py:54-111) as
    a DataFrame: sheets read with the skiprows-4-then-fallback pattern,
    first-data-row header promotion when the header row duplicated into
    the data (:64-70), sheets without Number+Name skipped, part_type
    derived from the sheet name (:85-97), and the dict's LAST-WINS
    overwrite (:98) expressed as a window over the row sequence.

    Faithfully keeps the reference's quirk that an unpromoted duplicated
    header row becomes a part numbered 'Number' — the published
    Snowmobile count of 939 parts includes it (docs/GRAPHDB_QUERIES.md:6
    vs 938 real parts; pinned by tests/test_snowmobile_golden.py).

    ``sniffed=True`` additionally recovers sheets the reference's fixed
    ``skiprows=4`` read CANNOT parse (header at any other row — e.g.
    Helicopter_Import.xlsx's header-at-row-0 export, which its loader
    silently skips): when the standard path finds no Number+Name
    header, the grid is re-scanned for the first row carrying the
    required headers (:func:`kgforge.sniff.find_header_row`) and
    leading rows that merely mirror that header are dropped instead of
    becoming artifact parts.
    """
    from kgforge import sniff as _sniff
    from kgforge import xlsx as _xlsx

    # loaded only if a sheet actually needs the header-anywhere rescue
    # (avoids a second driver-side workbook parse on the standard path)
    wb_grids: dict | None = None
    rows: list[tuple] = []
    seq = 0
    for sheet_name, t in _excel_tables(path, sheets):
        if t.rows:
            first_str = set(map(str, t.first_row_values()))
            req = {"Number", "Name"}
            if req.issubset(first_str) and not req.issubset(set(map(str, t.columns))):
                t = t.promote_first_row_header()
        if not {"Number", "Name"}.issubset(set(map(str, t.columns))):
            if not sniffed:
                continue
            if wb_grids is None:
                wb_grids = _xlsx.read_workbook(path)
            grid = wb_grids.get(sheet_name) or []
            idx = _sniff.find_header_row(grid)
            if idx is None:
                continue
            from kgforge.xlsx import Table as _Table

            t = _Table(grid[idx:], skiprows=0)
            # mirror-drop against the RAW header row (Table mangles
            # duplicate names, so the mangled columns never compare
            # equal to a literal header-duplicate row)
            width = len(t.columns)
            raw_header = [
                "" if v is None else str(v)
                for v in (list(grid[idx]) + [None] * width)[:width]
            ]
            while t.rows and [
                "" if v is None else str(v) for v in t.first_row_values()
            ] == raw_header:
                t.rows = t.rows[1:]
        part_type = next((tok for tok in _PART_TYPE_TOKENS if tok in sheet_name), None)
        present = set(t.columns)

        for r in t.rows:
            def cell(col: str):
                return _cell_str(t.get(r, col)) if col in present else None

            seq += 1
            rows.append(
                (
                    seq,
                    cell("Number"),
                    cell("Name"),
                    cell("Type"),
                    cell("Source"),
                    cell("View"),
                    cell("State"),
                    cell("Revision"),
                    cell("Container"),
                    part_type,
                )
            )
    # the workbook rows are materialized driver-side by design — parts
    # catalogs are DIMENSION inputs (thousands of rows). Guard the
    # assumption: someone pointing this at a multi-million-row export
    # should hit a loud error, not a silent driver OOM; fact-scale part
    # catalogs belong in the parquet/CSV scans.
    if len(rows) > 2_000_000:
        raise ValueError(
            f"workbook {path!r} yielded {len(rows)} part rows — beyond the "
            "driver-side dimension-catalog bound (2M); export to CSV/parquet "
            "and use the distributed scans instead"
        )
    df = spark.createDataFrame(rows, _PARTS_SCHEMA)
    w = Window.partitionBy("number").orderBy(F.desc("seq"))
    return (
        df.filter(F.col("number").isNotNull() & (F.col("number") != ""))
        # name falls back to the number when the cell is empty (:83)
        .withColumn("name", F.coalesce(F.col("name"), F.col("number")))
        .withColumn("source", F.lower(F.col("source")))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "seq")
    )


def read_excel_bom_levels(
    spark: SparkSession, path: str, sheets: list[str] | None = None
) -> DataFrame:
    """Hierarchical BOM rows from every workbook sheet with Number+Level
    columns (the reference's in-Excel hierarchical branch,
    generate_bom_from_excel :1160-1182, incl. its 'Action'-in-first-row
    header promotion :1144-1148), emitted as
    ``(group_id, row_idx, level, number)`` for the distributed
    level-stack decode. Feed to :func:`kgforge.graph
    .level_stack_decode_routed` (one sheet = one ordered group)."""
    rows: list[tuple] = []
    for sheet_name, t in _excel_tables(path, sheets):
        if t.rows:
            first = t.first_row_values()
            if "Action" in str(first) or set(map(str, first)) == set(map(str, t.columns)):
                t = t.promote_first_row_header()
        lower = {str(c).strip().lower(): c for c in t.columns}
        if "number" not in lower or "level" not in lower:
            continue
        for idx, r in enumerate(t.rows):
            rows.append(
                (
                    sheet_name,
                    idx,
                    _cell_str(t.get(r, lower["level"])),
                    _cell_str(t.get(r, lower["number"])),
                )
            )
    df = spark.createDataFrame(
        rows, "group_id string, row_idx bigint, level_raw string, number string"
    )
    # unparseable level or empty number -> row skipped (:1167-1174);
    # try_cast nulls the former exactly like the CSV leg above
    return (
        df.select(
            "group_id",
            "row_idx",
            F.col("level_raw").try_cast("double").try_cast("int").alias("level"),
            normalize_number_col(F.col("number")).alias("number"),
        )
        .filter(F.col("level").isNotNull() & (F.col("number") != ""))
    )


def read_excel_bom_edges(
    spark: SparkSession, path: str, sheets: list[str] | None = None
) -> DataFrame:
    """Level-stack decode of :func:`read_excel_bom_levels` into
    deduplicated ``(parent, child)`` edges (generate_bom_from_excel's
    hierarchical branch + its edge dedup :1223)."""
    levels = read_excel_bom_levels(spark, path, sheets)
    max_level = levels.agg(F.max("level")).first()[0]
    if max_level is None:
        return spark.createDataFrame([], "parent string, child string")
    return graph.level_stack_decode_routed(
        levels, max_level=int(max_level)
    ).dropDuplicates()


def read_excel_alternates(
    spark: SparkSession, path: str, sheet: str = "WTPartAlternateLink-Sheet"
) -> DataFrame:
    """S6: alternate/replacement links (parse_alternate_links :296-341):
    skiprows-4 read of the link sheet, 'Action'-row header promotion,
    Child/Replacement part number columns required (else empty result),
    missing replacement_type defaults to 'alternate'."""
    empty = spark.createDataFrame(
        [], "child_number string, replacement_number string, replacement_type string"
    )
    for name, t in _excel_tables(path, [sheet]):
        if t.rows and "Action" in str(t.first_row_values()):
            t = t.promote_first_row_header()
        if (
            "Child Part Number" not in t.columns
            or "Replacement Part Number" not in t.columns
        ):
            return empty
        has_type = "Replacement Type" in t.columns
        rows = [
            (
                _cell_str(t.get(r, "Child Part Number")),
                _cell_str(t.get(r, "Replacement Part Number")),
                (_cell_str(t.get(r, "Replacement Type")) if has_type else None),
            )
            for r in t.rows
        ]
        df = spark.createDataFrame(
            rows,
            "child_number string, replacement_number string, replacement_type string",
        )
        return (
            df.select(
                normalize_number_col(F.col("child_number")).alias("child_number"),
                normalize_number_col(F.col("replacement_number")).alias(
                    "replacement_number"
                ),
                F.coalesce(F.trim(F.col("replacement_type")), F.lit("alternate")).alias(
                    "replacement_type"
                ),
            )
            .filter((F.col("child_number") != "") & (F.col("replacement_number") != ""))
        )
    return empty


def read_excel_describe_links(
    spark: SparkSession, path: str, sheet: str = "WTPartDescribeLink-Sheet"
) -> DataFrame:
    """S7: document-describes-part links (parse_describe_links
    :342-376); absent sheet or missing required columns -> empty."""
    schema = (
        "document_number string, part_number string, document_revision string, "
        "document_org string, document_container string"
    )
    empty = spark.createDataFrame([], schema)
    for name, t in _excel_tables(path, [sheet]):
        if t.rows and "Action" in str(t.first_row_values()):
            t = t.promote_first_row_header()
        if not {"Document Number", "Part Number"}.issubset(set(t.columns)):
            return empty
        present = set(t.columns)

        def cell(r, col):
            return _cell_str(t.get(r, col)) if col in present else None

        rows = [
            (
                cell(r, "Document Number"),
                cell(r, "Part Number"),
                cell(r, "Document Revision"),
                cell(r, "Document Owning Organization"),
                cell(r, "Document Container"),
            )
            for r in t.rows
        ]
        df = spark.createDataFrame(rows, schema)
        return (
            df.select(
                normalize_number_col(F.col("document_number")).alias("document_number"),
                normalize_number_col(F.col("part_number")).alias("part_number"),
                F.trim(F.col("document_revision")).alias("document_revision"),
                F.trim(F.col("document_org")).alias("document_org"),
                F.trim(F.col("document_container")).alias("document_container"),
            )
            .filter((F.col("document_number") != "") & (F.col("part_number") != ""))
        )
    return empty


_CHANGE_KEYWORDS = ("Change", "Revision", "Version", "State")


def read_excel_changes(
    spark: SparkSession, path: str, render_dates: bool = False
) -> DataFrame:
    """Change-record scan over a workbook — the reference's
    ``_extract_change_information``
    (src/importers/helicopter_change_importer.py:178-217): per sheet,
    the header is the FIRST row whose values contain both 'Number' and
    'Name' (:192-196); columns matching the Change/Revision/Version/
    State keywords (:203) become the change payload, tagged with the
    source sheet and the part number/name.

    One documented repair: the reference reads the part ref via
    ``record.get('Number')`` AFTER projecting to the keyword columns
    (:209-213), which always yields '' — its own shipped artifact
    (data/helicopter_changes.csv) carries populated part numbers, so
    the intent is clearly to carry them; this reader keeps Number/Name
    (or the artifact's ``_part_number``/``_part_name`` spelling)
    alongside the change columns. change_id is a sha2 content hash
    (stable across executors; the reference's ``hash() % 1e6`` is
    run-unstable — same P14 deviation as stable_id_col).

    Returns (change_id, source_sheet, part_number, part_name,
    revision, state).
    """
    from kgforge import xlsx

    # render_dates: temporal exports style change dates as date cells;
    # opt-in ISO rendering (xlsx module docstring) keeps them parseable
    # downstream (normalize date parse, P13) instead of serial floats
    wb = xlsx.read_workbook(path, render_dates=render_dates)
    rows: list[tuple] = []
    for sheet_name, grid in wb.items():
        header_idx = None
        for i, r in enumerate(grid):
            vals = set(map(str, r))
            if ({"Number", "Name"} <= vals) or ({"_part_number", "_part_name"} <= vals):
                header_idx = i
                break
        if header_idx is None:
            continue
        t = xlsx.Table(grid[header_idx:], skiprows=0)
        cols = set(t.columns)
        if not any(any(k in str(c) for k in _CHANGE_KEYWORDS) for c in cols):
            continue
        num_col = "Number" if "Number" in cols else "_part_number"
        name_col = "Name" if "Name" in cols else "_part_name"

        for r in t.rows:
            num = _cell_str(t.get(r, num_col)) if num_col in cols else None
            name = _cell_str(t.get(r, name_col)) if name_col in cols else None
            rev = _cell_str(t.get(r, "Revision")) if "Revision" in cols else None
            state = _cell_str(t.get(r, "State")) if "State" in cols else None
            if not any((num, name, rev, state)):
                continue  # reference dropna(how='all') on the payload
            rows.append((sheet_name, num, name, rev, state))
    df = spark.createDataFrame(
        rows,
        "source_sheet string, part_number string, part_name string, "
        "revision string, state string",
    )
    # drop in-data duplicated header rows (the artifact CSV carries one)
    df = df.filter(
        ~(
            F.coalesce(F.col("part_number"), F.lit("")).isin("Number", "_part_number")
            & F.coalesce(F.col("revision"), F.lit("")).eqNullSafe(F.lit("Revision"))
        )
    )
    return df.select(
        F.sha2(
            F.concat_ws(
                "\x1f", "source_sheet", "part_number", "part_name", "revision", "state"
            ),
            256,
        ).alias("change_id"),
        "source_sheet",
        "part_number",
        "part_name",
        "revision",
        "state",
    )


def change_affects_links(changes: DataFrame, parts: DataFrame) -> DataFrame:
    """AFFECTS_PART links (reference ``_link_changes_to_parts``
    :348-377): change records joined to known parts by number; changes
    with an empty or unknown part number drop (the reference's MATCH
    simply finds nothing). Broadcast-sized dimension join."""
    return (
        changes.filter(
            F.col("part_number").isNotNull() & (F.col("part_number") != "")
        )
        .join(parts.select("number"), F.col("part_number") == F.col("number"), "inner")
        .select("change_id", "part_number", "revision", "state")
        .dropDuplicates(["change_id", "part_number"])
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


def read_api_pages_distributed(
    spark: SparkSession,
    fetch,
    entity_set: str,
    schema,
    page_size: int = 1000,
    start_page: int = 0,
    n_pages: int = 64,
    params: dict | None = None,
    partitions: int | None = None,
):
    """S9 at scale: the paged reader fanned out across EXECUTORS — a
    page-range table (``spark.range``) mapped through ``mapInPandas``,
    so a large pull is bounded by the API's aggregate throughput, not
    by one driver process's memory (:func:`read_api_pages` accumulates
    every page driver-side).

    Each task fetches its disjoint slice of the ``[start_page,
    start_page + n_pages)`` window with the same ``$skip``/``$top``
    protocol (reference query_odata,
    scripts/windchill_odata_temporal_import.py:47-76). ``fetch`` must be
    picklable and read-only/idempotent — Spark may re-run a page's task
    on retry or recompute, the same contract as any Spark source.

    Returns ``(DataFrame, next_page)``. The frame carries a ``_page``
    lineage column (which request produced each row — per-partition
    lineage, and the test hook proving disjoint assignment). The
    resumable cursor semantics match the sequential reader: the frame is
    materialized (cached) to count rows per page ONCE, and ``next_page``
    is the page after the last one that returned rows — equal to the
    window end when every page was full, so a caller loops windows
    (passing ``next_page`` back as ``start_page``) until a window comes
    back short, checkpointing the cursor between pulls exactly like the
    sequential reader's. The returned frame is FILTERED to
    ``_page < next_page``: when a mid-window page came back short while
    later pages still returned rows (appends racing the pull), rows past
    the cursor are excluded so resuming at ``next_page`` never
    re-ingests them. The frame is cached (that is what makes the
    page-count pass and the caller's consumption read the same fetch) —
    callers should ``.unpersist()`` it once consumed.
    """
    import pandas as pd  # noqa: PLC0415 — executor-side import partner

    from pyspark.sql.types import LongType, StructField, StructType

    names = [f.name for f in schema.fields]
    # fresh StructType: StructType.add mutates in place, and the
    # caller's schema must stay page-free
    out_schema = StructType(list(schema.fields) + [StructField("_page", LongType())])
    n_parts = partitions or min(n_pages, spark.sparkContext.defaultParallelism)
    pages = spark.range(start_page, start_page + n_pages, 1, n_parts)

    def fetch_pages(batches):
        for pdf in batches:
            rows = []
            for page in pdf["id"]:
                page_params = dict(params or {})
                page_params["$skip"] = int(page) * page_size
                page_params["$top"] = page_size
                for r in fetch(entity_set, page_params):
                    rows.append([r.get(n) for n in names] + [int(page)])
            yield pd.DataFrame(rows, columns=[*names, "_page"])

    raw = pages.mapInPandas(fetch_pages, out_schema).cache()
    per_page = {r["_page"]: r["n"] for r in raw.groupBy("_page").agg(F.count("*").alias("n")).collect()}
    # cursor = page after the first non-full page (the page the
    # sequential reader consumed last before stopping), or the window
    # end when every page was full
    full_through = start_page
    for p in range(start_page, start_page + n_pages):
        full_through = p + 1
        if per_page.get(p, 0) < page_size:
            break
    # drop rows past the cursor (racing-append duplicates on resume),
    # re-cache the consumable frame, and release the raw fetch cache
    df = raw.filter(F.col("_page") < F.lit(full_through)).cache()
    df.count()
    raw.unpersist()
    return df, full_through
