"""Behavioral tests: strict mode, resume idempotency, level-stack exact
semantics, dictionary mention detection, connected components, entry()."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kgforge import extract, fixtures, graph, linking, resume


def test_strict_mode_raises(spark, sf_dir):
    t = fixtures.load_transcripts(spark, sf_dir)
    e = fixtures.load_entities(spark, sf_dir)
    linked = linking.link_mentions(extract.extract_mentions(t), e)
    with pytest.raises(RuntimeError, match="strict name resolution failed"):
        linking.check_strict(linked)


def test_level_stack_stale_entry_cleared(spark):
    """The tricky case the window variant can't express: after a jump
    back to a shallow level, deeper stack entries are cleared, so a
    later deep row with no fresh parent emits nothing
    (reference stack-clear semantics, spreadsheet_loader.py:1171-1178)."""
    rows = spark.createDataFrame(
        [("g", 0, 0, "A"), ("g", 1, 1, "B"), ("g", 2, 2, "C"), ("g", 3, 0, "D"), ("g", 4, 2, "E")],
        "group_id string, row_idx int, level int, number string",
    )
    got = {(r.parent, r.child) for r in graph.level_stack_decode(rows).collect()}
    # E at level 2 must NOT attach to stale B; D cleared levels 1+.
    assert got == {("A", "B"), ("B", "C")}


def test_level_stack_window_matches_applyinpandas(spark, sf_dir):
    rows = fixtures.load_hierarchy(spark, sf_dir)
    a = {(r.parent, r.child) for r in graph.level_stack_decode(rows).dropDuplicates().collect()}
    b = {(r.parent, r.child) for r in graph.level_stack_decode_window(rows, max_level=2).dropDuplicates().collect()}
    assert a == b


def test_level_stack_routed_exact_on_stale_stack_groups(spark, sf_dir):
    """The combined router must equal the exact stateful decoder even
    when a group's level sequence has a down-jump followed by a level
    skip (the shape the pure window form silently mis-attaches on), and
    must still route well-formed groups through the JVM window path."""
    # g-bad replays the stale-entry case; g-ok is a clean hierarchy.
    rows = spark.createDataFrame(
        [
            ("g-bad", 0, 0, "A"), ("g-bad", 1, 1, "B"), ("g-bad", 2, 2, "C"),
            ("g-bad", 3, 0, "D"), ("g-bad", 4, 2, "E"),
            ("g-ok", 0, 0, "R"), ("g-ok", 1, 1, "S"), ("g-ok", 2, 2, "T"),
            ("g-ok", 3, 1, "U"), ("g-ok", 4, 2, "V"),
        ],
        "group_id string, row_idx int, level int, number string",
    )
    want = {(r.parent, r.child) for r in graph.level_stack_decode(rows).collect()}
    got = {
        (r.parent, r.child)
        for r in graph.level_stack_decode_routed(rows, max_level=2).collect()
    }
    assert got == want == {("A", "B"), ("B", "C"), ("R", "S"), ("S", "T"), ("R", "U"), ("U", "V")}
    # the pure window form alone WOULD mis-attach E to stale B
    wrong = {
        (r.parent, r.child)
        for r in graph.level_stack_decode_window(rows, max_level=2).collect()
    }
    assert ("B", "E") in wrong

    # fixture hierarchy (all clean groups): router == stateful, with attrs
    h = fixtures.load_hierarchy(spark, sf_dir)
    a = {tuple(r) for r in graph.level_stack_decode_usage(h).dropDuplicates().collect()}
    b = {
        tuple(r)
        for r in graph.level_stack_decode_routed(
            h, max_level=2, attrs=("quantity", "uom", "find_number")
        ).dropDuplicates().collect()
    }
    assert a == b


def test_level_stack_routed_undersized_max_level(spark):
    """An undersized caller max_level must not drop deep edges: groups
    holding level > max_level rows route to the exact stateful decoder,
    so the routed output stays identical to the exact decode while clean
    shallow groups keep the JVM window path."""
    rows = spark.createDataFrame(
        [
            # deep clean group: levels reach 3, caller will claim max 1
            ("deep", 0, 0, "A"), ("deep", 1, 1, "B"),
            ("deep", 2, 2, "C"), ("deep", 3, 3, "D"),
            # shallow clean group: within the bound, stays JVM-side
            ("shallow", 0, 0, "R"), ("shallow", 1, 1, "S"),
        ],
        "group_id string, row_idx int, level int, number string",
    )
    want = {(r.parent, r.child) for r in graph.level_stack_decode(rows).collect()}
    got = {
        (r.parent, r.child)
        for r in graph.level_stack_decode_routed(rows, max_level=1).collect()
    }
    assert got == want == {("A", "B"), ("B", "C"), ("C", "D"), ("R", "S")}


def test_usage_window_matches_applyinpandas(spark, sf_dir):
    """The gate's JVM-only usage decode must equal the general stateful
    decoder — full rows including the carried usage attributes."""
    rows = fixtures.load_hierarchy(spark, sf_dir)
    a = {tuple(r) for r in graph.level_stack_decode_usage(rows).dropDuplicates().collect()}
    b = {
        tuple(r)
        for r in graph.level_stack_decode_usage_window(rows, max_level=2)
        .dropDuplicates()
        .collect()
    }
    assert a == b


def test_dictionary_detector_finds_bracketed_names(spark, sf_dir):
    """The pandas-UDF dictionary detector must find at least every
    dictionary name that the structural extractor finds."""
    t = fixtures.load_transcripts(spark, sf_dir).limit(500).cache()
    e = fixtures.load_entities(spark, sf_dir)
    det = set(
        (r.conv_id, r.turn_idx, r.mention)
        for r in extract.detect_mentions_dictionary(t, e).collect()
    )
    names = {r.name for r in e.select("name").distinct().collect()}
    structural = set(
        (r.conv_id, r.turn_idx, r.mention)
        for r in extract.extract_mentions(t).collect()
        if r.mention in names
    )
    assert structural <= det
    t.unpersist()


def test_dictionary_detector_jvm_engine_matches_python(spark, sf_dir):
    """engine='jvm' (regexp_extract_all inside codegen, no Python
    crossing) must produce exactly the pandas-UDF rows, in both plain
    and overlapping (lookahead) modes, and its plan must contain no
    Python eval node. engine='auto' (the default) must route this
    small dictionary to the JVM fast path and produce the same rows."""
    t = fixtures.load_transcripts(spark, sf_dir)
    e = fixtures.load_entities(spark, sf_dir)
    for overlapping in (False, True):
        py = sorted(
            map(
                tuple,
                extract.detect_mentions_dictionary(
                    t, e, overlapping=overlapping, engine="python"
                ).collect(),
            )
        )
        jvm_df = extract.detect_mentions_dictionary(
            t, e, overlapping=overlapping, engine="jvm"
        )
        assert py == sorted(map(tuple, jvm_df.collect())) and py
        plan = jvm_df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "Arrow" not in plan

        auto_df = extract.detect_mentions_dictionary(t, e, overlapping=overlapping)
        assert py == sorted(map(tuple, auto_df.collect()))
        # fixture dictionary is under the crossover -> auto == jvm plan
        n_names = e.select("name").distinct().count()
        assert n_names <= extract.JVM_ENGINE_MAX_NAMES
        auto_plan = auto_df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in auto_plan and "Arrow" not in auto_plan


def test_dictionary_detector_broadcast_matches_closure(spark, sf_dir):
    """Broadcast-variable dictionary shipping (the 10^7-name path) must
    produce exactly the closure-shipped detector's output."""
    t = fixtures.load_transcripts(spark, sf_dir).limit(300).cache()
    e = fixtures.load_entities(spark, sf_dir)
    a = sorted(
        (r.conv_id, r.turn_idx, r.mention)
        for r in extract.detect_mentions_dictionary(t, e).collect()
    )
    b = sorted(
        (r.conv_id, r.turn_idx, r.mention)
        for r in extract.detect_mentions_dictionary(t, e, use_broadcast=True).collect()
    )
    assert a == b and a
    t.unpersist()


def test_connected_components_vs_union_find(spark, sf_dir):
    edges = graph.bom_edges_from_linked(
        linking.link_mentions(
            extract.extract_mentions(fixtures.load_transcripts(spark, sf_dir)),
            fixtures.load_entities(spark, sf_dir),
        )
    ).filter((F.col("parent").cast("bigint") + F.col("child").cast("bigint")) % 10 == 0)
    pdf = edges.toPandas()

    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in zip(pdf["parent"], pdf["child"]):
        union(a, b)
    want = {n: find(n) for n in parent}
    got = {r.node: r.component for r in graph.connected_components(edges).collect()}
    assert got == want


def test_bom_edges_direct_matches_mention_path(spark, sf_dir):
    """The shuffle-free direct edge assembly must equal the canonical
    mention-row path (extract -> link -> pivot) exactly."""
    t = fixtures.load_transcripts(spark, sf_dir)
    e = fixtures.load_entities(spark, sf_dir)
    classic = {
        (r.parent, r.child)
        for r in graph.bom_edges_from_linked(
            linking.link_mentions(extract.extract_mentions(t), e)
        ).collect()
    }
    direct = {(r.parent, r.child) for r in graph.bom_edges_direct(t, e).collect()}
    assert direct == classic and classic


def test_bounded_change_relations_match_exact(spark, sf_dir):
    """Time-bucketed related_to/depends_on (the scale path): with a
    horizon covering the fixture's whole time span the bounded form
    must equal the reference-exact all-pairs form; with a short horizon
    it must equal the exact form filtered to pairs within the horizon."""
    changes = fixtures.load_changes(spark, sf_dir)
    dep_exact = graph.depends_on(changes)
    exact = {(r.later, r.earlier) for r in graph.related_to(changes, dep_exact).collect()}

    span_days = changes.agg(
        F.datediff(F.max("ts"), F.min("ts")).alias("d")
    ).collect()[0]["d"] + 1
    wide = {
        (r.later, r.earlier)
        for r in graph.related_to(changes, dep_exact, horizon_days=span_days).collect()
    }
    assert wide == exact and exact

    horizon = max(span_days // 4, 1)
    ts = {r.change_id: r.ts for r in changes.collect()}
    want_near = {
        (l, e) for (l, e) in exact if (ts[l].date() - ts[e].date()).days <= horizon
    }
    got_near = {
        (r.later, r.earlier)
        for r in graph.related_to(changes, dep_exact, horizon_days=horizon).collect()
    }
    assert got_near == want_near
    assert len(got_near) < len(exact)  # the bound actually bit

    dep_wide = {
        (r.later, r.earlier)
        for r in graph.depends_on(changes, horizon_days=span_days).collect()
    }
    assert dep_wide == {(r.later, r.earlier) for r in dep_exact.collect()}


def test_supersedes_chain_closure_matches_exact(spark, sf_dir):
    """Bounded J5 (the scale path): the lead()-chain emits O(k) edges
    per same-name group whose transitive closure must recover the exact
    pairwise supersedes set; the exact form stays the gate oracle."""
    entities = fixtures.load_entities(spark, sf_dir)
    exact = {(r.newer, r.older) for r in graph.supersedes(entities).collect()}
    chain_df = graph.supersedes_chain(entities)
    chain = {(r.newer, r.older) for r in chain_df.collect()}
    assert chain <= exact and chain  # chain is a subset ...
    closed = graph.transitive_closure(
        chain_df.select(F.col("newer").alias("parent"), F.col("older").alias("child"))
    )
    got = {(r.parent, r.child) for r in closed.collect()}
    assert got == exact  # ... whose closure is the whole pair set
    # the bound actually bit: chain edges are linear in group size
    k_sizes = (
        entities.groupBy("name").count().filter(F.col("count") > 1).collect()
    )
    assert len(chain) == sum(r["count"] - 1 for r in k_sizes)
    assert len(exact) == sum(r["count"] * (r["count"] - 1) // 2 for r in k_sizes)


def test_bounded_related_to_shuffles_on_time_bucket(spark, sf_dir):
    """Plan shape of the scale path: the bounded self-join's shuffle key
    must include the time bucket alongside change_type, so one hot
    change_type can no longer collapse onto a single reducer."""
    changes = fixtures.load_changes(spark, sf_dir)
    bounded = graph.related_to(
        changes, graph.depends_on(changes), horizon_days=30
    )
    plan = bounded._jdf.queryExecution().executedPlan().toString()
    join_chunks = [
        c for c in plan.split("Join")[1:] if "change_type" in c[:400] and "bk" in c[:400]
    ]
    assert join_chunks, f"no (change_type, bk)-keyed join in plan:\n{plan[:2000]}"


def test_equivalence_edges_star_is_linear_in_group_size(spark):
    """Hot-name groups: k entities sharing one display name must yield
    k-1 star edges (member -> group-min), not the O(k²) clique, and the
    canonical assignment must still be min(number) per name group."""
    from kgforge import canonicalize

    k = 400
    rows = [(f"{10_000 + i}", "hot part") for i in range(k)]
    rows += [(f"{i}", f"unique {i}") for i in range(5)]
    ents = spark.createDataFrame(rows, "number string, name string")
    edges = canonicalize.equivalence_edges(ents)
    assert edges.count() == k - 1  # star, not clique (clique would be ~80k)
    assert edges.filter(F.col("parent") != "10000").count() == 0
    canon = canonicalize.assign_canonical_iris(ents)
    got = {r.number: r.canonical_number for r in canon.collect()}
    assert all(got[f"{10_000 + i}"] == "10000" for i in range(k))
    assert all(got[f"{i}"] == f"{i}" for i in range(5))  # singletons self-represent


def test_cc_star_matches_label_propagation_on_long_chain(spark):
    """large-star/small-star must agree with min-label propagation on a
    200-node chain — the diameter case star contraction exists for
    (label propagation needs O(diameter) rounds; star contraction
    O(log^2 n))."""
    chain = spark.createDataFrame(
        [(f"n{i:04d}", f"n{i + 1:04d}") for i in range(199)]
        + [("z1", "z2"), ("z2", "z3")],  # second small component
        "parent string, child string",
    )
    star = {r.node: r.component for r in graph.connected_components_star(chain).collect()}
    prop = {r.node: r.component for r in graph.connected_components(chain, max_iterations=256).collect()}
    assert star == prop
    assert star["n0150"] == "n0000" and star["z3"] == "z1"


def test_closure_variants_agree_with_python_dfs(spark):
    """Delta path-doubling and semi-naive closures must both equal a
    pure-Python DFS on a graph with a cycle, a diamond, and a chain
    (reference cycle-guard semantics, spreadsheet_loader.py:1002-1005)."""
    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),        # cycle
        ("d", "e"), ("d", "f"), ("e", "g"), ("f", "g"),  # diamond
        ("h", "i"), ("i", "j"), ("j", "k"),        # chain
        ("g", "h"),
    ]
    adj: dict[str, list[str]] = {}
    for p, c in edges:
        adj.setdefault(p, []).append(c)
    want = set()
    for start in {p for p, _ in edges} | {c for _, c in edges}:
        stack, seen = list(adj.get(start, [])), set()
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            want.add((start, n))
            stack.extend(adj.get(n, []))
    df = spark.createDataFrame(edges, "parent string, child string")
    doubling = {(r.parent, r.child) for r in graph.transitive_closure(df).collect()}
    seminaive = {(r.parent, r.child) for r in graph.transitive_closure_seminaive(df).collect()}
    assert doubling == want
    assert seminaive == want


def test_resume_kill_and_rerun(spark, sf_dir, tmp_path):
    """Crash after the first commit group, re-run, assert no duplicate or
    missing triples (idempotent MERGE analogue, SURVEY §5 item 5)."""
    from kgforge import materialize

    triples = materialize.part_triples(fixtures.load_entities(spark, sf_dir)).cache()
    expected = triples.count()
    out = str(tmp_path / "kg")
    with pytest.raises(resume.InjectedFailure):
        resume.write_triples_resumable(triples, out, n_buckets=8, commit_every=2, fail_after_commits=1)
    manifest = resume.read_manifest(out)
    assert 0 < len(manifest["committed"]) < 8
    # resume
    resume.write_triples_resumable(triples, out, n_buckets=8, commit_every=2)
    manifest = resume.read_manifest(out)
    assert len(manifest["committed"]) == 8
    got = resume.read_triples(spark, out)
    assert got.count() == expected
    assert got.dropDuplicates(["subj", "pred", "obj"]).count() == expected
    # manifest counts match data
    assert sum(v["n_triples"] for v in manifest["committed"].values()) == expected
    # snapshot log: a linear parent-chained history spanning BOTH runs
    # (crashed + resumed), covering every bucket exactly once, with
    # per-snapshot counts summing to the data
    snaps = manifest["snapshots"]
    assert len(snaps) >= 2  # at least one commit per run
    assert snaps[0]["parent_snapshot_id"] is None
    for prev, cur in zip(snaps, snaps[1:]):
        assert cur["parent_snapshot_id"] == prev["snapshot_id"]
    all_buckets = [b for s in snaps for b in s["buckets"]]
    assert sorted(all_buckets) == list(range(8))
    assert sum(s["n_triples"] for s in snaps) == expected
    triples.unpersist()


def test_entry_smoke(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"pred", "n"}
    preds = {r.pred for r in rows}
    assert "urn:ontology:hasComponent" in preds
    assert "urn:ontology:partOfAssembly" in preds
    assert "urn:ontology:usedIn" in preds


def test_normalize_py_matches_reference_semantics():
    from kgforge.normalize import normalize_part_number_py as n

    assert n(float("nan")) == ""
    assert n(None) == ""
    assert n(123.0) == "123"
    assert n(123.5) == "123.5"
    assert n(123) == "123"
    assert n("100 SNOW") == "100 SNOW"


def test_iri_encode_udf_matches_quote(spark):
    from kgforge.normalize import iri_encode_udf

    df = spark.createDataFrame([("100 SNOW",), ("a#b/c",), ("plain",)], "s string")
    got = {r[0] for r in df.select(iri_encode_udf("s")).collect()}
    assert got == {"100%20SNOW", "a%23b/c", "plain"}


def test_cli_report_flags(sf_dir, tmp_path):
    """The reference's early-exit CLI subcommands (main :1729-1739):
    each flag writes its report CSV and exits without materializing
    triples; --strict-names makes the run fail loudly (the fixture has
    deliberate unknown mentions)."""
    import subprocess
    import sys as _sys

    env = {**__import__("os").environ, "SPARK_GRAFT_CPUS": "4"}

    def cli(*flags):
        return subprocess.run(
            [_sys.executable, "-m", "kgforge.pipeline", sf_dir, *flags],
            capture_output=True, text=True, timeout=420, env=env, cwd="/root/repo",
        )

    idx_out = tmp_path / "name_index"
    proc = cli("--dump-name-index", str(idx_out))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert '"name_index"' in proc.stdout
    csvs = list(idx_out.glob("*.csv"))
    assert csvs
    header = csvs[0].read_text().splitlines()[0]
    assert header == "name,number,n_candidates"

    cand_out = tmp_path / "candidates"
    proc = cli("--emit-candidates", str(cand_out))
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = [
        ln
        for p in cand_out.glob("*.csv")
        for ln in p.read_text().splitlines()
        if ln and not ln.startswith("parent_number")
    ]
    assert rows and all(len(ln.split(",")) == 4 for ln in rows[:20])

    # success path keeps the documented 4-column report contract
    # (reference writes name columns only, :1107-1110 — not the internal
    # *_name_missing flags)
    bbn_out = tmp_path / "bbn_ok"
    proc = cli("--generate-bom-by-name", str(bbn_out))
    assert proc.returncode == 0, proc.stderr[-2000:]
    bbn_csvs = list(bbn_out.glob("*.csv"))
    assert bbn_csvs
    assert bbn_csvs[0].read_text().splitlines()[0] == "parent_name,child_name,parent,child"

    # strict mode propagates check_strict's failure through the CLI
    proc = cli("--generate-bom-by-name", str(tmp_path / "bbn"), "--strict-names")
    assert proc.returncode != 0
    assert "strict name resolution failed" in proc.stderr

    # --bom: extra CSV edges union into the edge set (reference --bom)
    import json as _json

    bom = tmp_path / "extra_bom.csv"
    bom.write_text("Parent Number,Child Number\n999001,999002\n999003,999004\n")
    base = _json.loads(cli().stdout)
    with_bom = _json.loads(cli("--bom", str(bom)).stdout)
    assert with_bom["n_edges"] == base["n_edges"] + 2
    assert (
        with_bom["per_predicate"]["urn:ontology:hasComponent"]
        == base["per_predicate"]["urn:ontology:hasComponent"] + 2
    )


def test_spark_submit_pyfiles_lifecycle(tmp_path):
    """North-rule lifecycle evidence: package kgforge as a --py-files
    zip and run the pipeline through a real ``spark-submit`` driver from
    a directory where the package is NOT importable — imports must
    resolve from the zip, the submitted --master must be respected (no
    local[N] override in get_spark), and the run must emit the stats
    block + a committed manifest."""
    import json
    import subprocess

    from kgforge.package import build

    zip_path = build(str(tmp_path / "kgforge.zip"))
    driver = tmp_path / "driver.py"
    driver.write_text(
        "import json, sys\n"
        "from kgforge.session import get_spark\n"
        "from kgforge.pipeline import run_pipeline\n"
        "spark = get_spark('kgforge-submit')\n"
        "assert spark.conf.get('spark.master') == 'local[4]', spark.conf.get('spark.master')\n"
        "print('STATS::' + json.dumps(run_pipeline(spark, sys.argv[1], sys.argv[2]), default=int))\n"
    )
    out_dir = tmp_path / "out"
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", str(zip_path),
            str(driver), "/root/testdata/sf0.001", str(out_dir),
        ],
        capture_output=True, text=True, cwd=tmp_path, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    stats_line = [ln for ln in proc.stdout.splitlines() if ln.startswith("STATS::")]
    assert stats_line, proc.stdout[-2000:]
    stats = json.loads(stats_line[0][len("STATS::"):])
    assert stats["total_triples"] > 0 and stats["n_edges"] > 0
    assert (out_dir / "_manifest.json").exists()


def test_connector_delivers_all_lines_with_flaky_transport(spark, sf_dir, tmp_path):
    """K1 HTTP-leg connector: every rendered N-Triples line is delivered
    exactly once per content chunk despite a transport that fails the
    first attempt for every batch; chunk ids are content-stable so
    replays dedupe on disk."""
    from kgforge import connector, fixtures, materialize

    ents = fixtures.load_entities(spark, sf_dir)
    lines = materialize.ntriples_lines(materialize.part_triples(ents))
    n_lines = lines.count()
    out = tmp_path / "delivered"
    out.mkdir()

    out_s = str(out)

    def flaky_file_transport(payload: bytes, batch_id: str) -> bool:
        import os

        marker = os.path.join(out_s, batch_id + ".attempted")
        if not os.path.exists(marker):  # fail every batch's first attempt
            open(marker, "w").close()
            return False
        with open(os.path.join(out_s, batch_id + ".nt"), "wb") as f:
            f.write(payload)
        return True

    stats = connector.deliver_ntriples(
        lines, flaky_file_transport, batch_size=100, max_retries=3
    )
    assert stats["lines_delivered"] == n_lines
    assert stats["attempts"] >= 2 * stats["chunks_delivered"]  # every chunk retried once
    delivered = []
    for p in out.glob("*.nt"):
        delivered.extend(p.read_text().splitlines())
    assert len(delivered) == n_lines
    want = {r["line"] for r in lines.collect()}
    assert set(delivered) == want


def test_connector_cypher_batches_idempotent_under_flaky_transport(spark, sf_dir, tmp_path):
    """K2 Cypher leg: edges ship as UNWIND $rows MERGE batches
    (reference Neo4jClient.import_bom_relationships :645-699). Batch
    shape: <= batch_size rows per statement payload; content-hash batch
    ids stay stable across retries, so a store/transport that dedupes on
    id sees every row exactly once even when every batch's first attempt
    fails; exhausted retries chain the transport's root cause."""
    import json as _json

    from pyspark.sql import functions as F

    from kgforge import connector, fixtures, graph, linking
    from kgforge.extract import extract_mentions

    t = fixtures.load_transcripts(spark, sf_dir)
    e = fixtures.load_entities(spark, sf_dir)
    edges = graph.bom_edges_from_linked(linking.link_mentions(extract_mentions(t), e))
    n_edges = edges.count()
    out = tmp_path / "cypher"
    out.mkdir()
    out_s = str(out)

    def flaky_recording_transport(payload: bytes, batch_id: str) -> bool:
        import os

        marker = os.path.join(out_s, batch_id + ".attempted")
        if not os.path.exists(marker):
            open(marker, "w").close()
            return False
        with open(os.path.join(out_s, batch_id + ".json"), "wb") as f:
            f.write(payload)  # same id -> same file: replay dedupes
        return True

    stats = connector.deliver_cypher_batches(
        edges,
        connector.BOM_MERGE_STATEMENT,
        flaky_recording_transport,
        batch_size=50,
        max_retries=3,
    )
    assert stats["rows_delivered"] == n_edges
    assert stats["attempts"] >= 2 * stats["chunks_delivered"]
    got = []
    for p in out.glob("*.json"):
        batch = _json.loads(p.read_text())
        assert batch["statement"] == connector.BOM_MERGE_STATEMENT
        rows = batch["parameters"]["rows"]
        assert 0 < len(rows) <= 50
        got.extend((r["parent"], r["child"]) for r in rows)
    assert len(got) == n_edges  # no duplicate delivery across replays
    want = {(r["parent"], r["child"]) for r in edges.collect()}
    assert set(got) == want

    # exhausted retries surface the executor-side root cause (chained)
    def always_broken(payload: bytes, batch_id: str) -> bool:
        raise ConnectionError("store unreachable")

    import pytest as _pytest

    with _pytest.raises(Exception) as exc_info:
        connector.deliver_cypher_batches(
            edges.limit(5), connector.PART_MERGE_STATEMENT, always_broken,
            batch_size=5, max_retries=2, base_backoff_s=0.0,
        )
    assert "store unreachable" in str(exc_info.getrepr(chain=True))


def test_http_ntriples_transport_against_local_server(spark, sf_dir):
    """The concrete GraphDB wire leg (reference post_ntriples :415-434)
    against a real local http.server: payload lands verbatim at the
    repository statements endpoint with Content-Type
    application/n-triples, a 500 answer reports failure to the retry
    loop (which then re-POSTs the same chunk), and end-to-end delivery
    through deliver_ntriples ships every line over real sockets."""
    import http.server
    import threading

    from kgforge import connector, fixtures, materialize

    received: list[tuple[str, str, bytes]] = []
    fail_first = {"pending": True}
    lock = threading.Lock()

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            with lock:
                if fail_first["pending"]:
                    fail_first["pending"] = False
                    self.send_response(500)
                    self.end_headers()
                    return
                received.append(
                    (self.path, self.headers.get("Content-Type", ""), body)
                )
            self.send_response(204)
            self.end_headers()

        def log_message(self, *a):  # quiet
            pass

    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        transport = connector.HttpNtriplesTransport(
            f"http://127.0.0.1:{port}", "Snowmobile"
        )
        ents = fixtures.load_entities(spark, sf_dir).limit(40)
        lines = materialize.ntriples_lines(materialize.part_triples(ents))
        n_lines = lines.count()
        stats = connector.deliver_ntriples(
            lines, transport, batch_size=64, max_retries=3, base_backoff_s=0.0
        )
        assert stats["lines_delivered"] == n_lines
        assert stats["attempts"] == stats["chunks_delivered"] + 1  # one 500 retry
        got_lines = []
        for path, ctype, body in received:
            assert path == "/repositories/Snowmobile/statements"
            assert ctype == "application/n-triples"
            assert body.endswith(b"\n")
            got_lines.extend(body.decode("utf-8").splitlines())
        assert sorted(got_lines) == sorted(r["line"] for r in lines.collect())
    finally:
        server.shutdown()
        server.server_close()


def test_http_transport_auth_header_and_unreachable(spark):
    """Basic-auth header shape (reference :383-390) and the
    connection-refused path returning False (retryable) instead of
    raising."""
    import base64

    t = connector_module().HttpNtriplesTransport(
        "http://127.0.0.1:9", "repo", username="admin", password="secret",
        timeout_s=0.5,
    )
    want = "Basic " + base64.b64encode(b"admin:secret").decode()
    assert t._auth == want
    assert t.endpoint == "http://127.0.0.1:9/repositories/repo/statements"
    assert t(b"<a> <b> <c> .\n", "batch0") is False  # port 9: refused


def connector_module():
    from kgforge import connector

    return connector


def test_cypher_payload_serializes_temporal_and_binary():
    """ADVICE fix: timestamp/date/Decimal/bytes row values must
    serialize into the Cypher batch payload (default=str), not raise
    TypeError in the executor."""
    import datetime
    import decimal
    import json as _json

    from kgforge import connector

    rows = [
        {
            "ts": datetime.datetime(2026, 1, 2, 3, 4, 5),
            "d": datetime.date(2026, 1, 2),
            "q": decimal.Decimal("1.50"),
            "b": b"\x00\x01",
        }
    ]
    payload = connector.cypher_batch_payload(connector.PART_MERGE_STATEMENT, rows)
    decoded = _json.loads(payload)
    got = decoded["parameters"]["rows"][0]
    assert got["ts"] == "2026-01-02 03:04:05"
    assert got["d"] == "2026-01-02"
    assert got["q"] == "1.50"


def _random_digraph(seed: int, n: int, m: int) -> list[tuple[str, str]]:
    import random

    rng = random.Random(seed)
    return list(
        {
            (f"n{rng.randrange(n):03d}", f"n{rng.randrange(n):03d}")
            for _ in range(m)
        }
    )


def _tarjan_scc(edges: list[tuple[str, str]]) -> dict[str, str]:
    """Iterative Tarjan; component label = max member id (matching the
    coloring algorithm's root choice)."""
    adj: dict[str, list[str]] = {}
    nodes = set()
    for a, b in edges:
        nodes.update((a, b))
        if a != b:
            adj.setdefault(a, []).append(b)
    index: dict[str, int] = {}
    low: dict[str, int] = {}
    on_stack: set[str] = set()
    stack: list[str] = []
    sccs: list[list[str]] = []
    counter = [0]

    def strongconnect(v0):
        work = [(v0, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            succs = adj.get(v, [])
            for i in range(pi, len(succs)):
                w = succs[i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if not recurse:
                if low[v] == index[v]:
                    comp = []
                    while True:
                        w = stack.pop()
                        on_stack.discard(w)
                        comp.append(w)
                        if w == v:
                            break
                    sccs.append(comp)
                if work:
                    parent = work[-1][0]
                    low[parent] = min(low[parent], low[v])

    for v in sorted(nodes):
        if v not in index:
            strongconnect(v)
    return {v: max(comp) for comp in sccs for v in comp}


def test_scc_matches_tarjan_on_random_digraphs(spark):
    from kgforge import graph as g

    for seed, n, m in [(7, 24, 40), (13, 18, 45)]:
        edges = _random_digraph(seed, n, m)
        df = spark.createDataFrame(edges, "parent string, child string")
        got = {r.node: r.scc for r in g.strongly_connected_components(df).collect()}
        want = _tarjan_scc(edges)
        assert got == want, f"seed={seed}: diff={ {k: (got.get(k), want[k]) for k in want if got.get(k) != want[k]} }"


def test_condensed_closure_matches_direct(spark):
    """SCC-condensed closure == delta-doubling closure == Python DFS on
    a graph with nested cycles, a self-loop, and DAG tails."""
    from kgforge import graph as g

    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),          # 3-cycle
        ("c", "d"), ("d", "e"), ("e", "d"),          # 2-cycle off the 3-cycle
        ("e", "f"), ("x", "a"), ("s", "s"),          # tail in, tail out, self-loop
        ("p", "q"), ("q", "r"),                      # separate chain
    ] + _random_digraph(3, 15, 25)
    df = spark.createDataFrame(edges, "parent string, child string")
    direct = {(r.parent, r.child) for r in g.transitive_closure(df).collect()}
    condensed = {(r.parent, r.child) for r in g.transitive_closure_condensed(df).collect()}
    assert condensed == direct
    assert ("s", "s") in condensed and ("a", "a") in condensed and ("d", "d") in condensed


def test_level_stack_routed_property_random_sequences(spark):
    """Property: on ARBITRARY level sequences (including down-jumps,
    level skips, repeated levels, deep nesting) the routed decoder must
    equal the exact stateful decoder. Random sequences are generated
    with a fixed-seed RNG across many groups so both router branches
    (clean window path and stale-stack Python path) are exercised in
    one run."""
    import random

    rng = random.Random(20260817)
    rows = []
    for g in range(40):
        n = rng.randint(1, 25)
        lvl = 0
        for i in range(n):
            # mix of +1 climbs, big up-jumps, and arbitrary drops
            r = rng.random()
            if r < 0.45:
                lvl = min(lvl + 1, 4)
            elif r < 0.6:
                lvl = min(lvl + rng.randint(2, 3), 4)  # up-jump >= 2
            elif r < 0.85:
                lvl = max(lvl - rng.randint(1, 3), 0)
            # else: stay
            rows.append((f"g{g:02d}", i, lvl, f"n{g:02d}-{i:02d}"))
    df = spark.createDataFrame(
        rows, "group_id string, row_idx int, level int, number string"
    )
    want = sorted(
        (r.parent, r.child) for r in graph.level_stack_decode(df).collect()
    )
    got = sorted(
        (r.parent, r.child)
        for r in graph.level_stack_decode_routed(df, max_level=4).collect()
    )
    assert got == want and want
