"""Reference-semantics parity harness (BASELINE.json metric: triple
P/R >= 0.95 vs the reference's N-Triples output).

A pure-Python oracle reimplements the reference's exact semantics —
dict-based parts table with last-wins overwrite (spreadsheet_loader.py
:98), name resolution with unknown/ambiguous/pass-through rules
(:1055-1080), reverse usedIn edges (:963-977), DFS transitive closure
(:980-1024), and triple emission with the URIRef/Literal split
(:878-917) — over a hand-built fixture that hits every rule. The Spark
pipeline must produce the identical N-Triples set (P = R = 1.0).
"""

from __future__ import annotations

import urllib.parse
from datetime import datetime

from kgforge import extract, graph, linking, materialize

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
ONT = "urn:ontology:"

# fixture: entities (number, name, part_type, view, state, source,
# revision, container) — includes an ambiguous pair (same name), a
# numeric-looking name is avoided, nullable metadata exercised
ENTITIES = [
    ("111", "Frame", "MechanicalPart", "Design", "RELEASED", "make", "A", "container-1"),
    ("222", "Ski", "MechanicalPart", None, "DESIGN", "buy", None, None),
    ("333", "Engine", "Variant", "Service", None, None, "B", "container-2"),
    ("444", "Bolt", None, None, None, None, None, None),
    ("555", "Bolt", None, None, None, None, None, None),  # ambiguous with 444
    ("666", "Track", "WTPart", "Design", "RELEASED", "make", "C", "container-3"),
    # URI-hostile number (the reference's own flagship part is
    # 'urn:part:100%20SNOW'); container literal stays unencoded
    ("100 SNOW", "Snow Mobile", "WTPart", "Design", "RELEASED", "make", "D", "container #4"),
]

# alternate links (original, replacement, type): duplicate rows collapse
# (rdflib Graph is a set); replacement '999' has no part row — the
# reference emits the triple anyway (build_alternate_triples :938-942
# has no existence check)
ALT_LINKS = [
    ("444", "555", "alternate"),
    ("222", "999", "replacement"),
    ("222", "999", "replacement"),
]

# describe links (doc, part, revision, org, container): DOC-2 describes
# two parts but its document-node triples emit once; null metadata
# skipped (build_document_triples :944-953, build_describe_triples
# :955-960)
DOC_LINKS = [
    ("DOC-1", "111", "A", "org-1", None),
    ("DOC-2", "100 SNOW", None, None, "lib #2"),
    ("DOC-2", "666", None, None, "lib #2"),
]

# transcripts: (conv_id, turn_idx, ref_mention, parent_mention)
# statuses hit: resolved (names), ambiguous (Bolt), unknown (Gadget),
# float pass-through ('333.0' -> number 333), cycle (Engine->Frame after
# Frame->...->Engine), self-loop attempt (Frame parent Frame)
TURNS = [
    ("c1", 0, "Frame", None),
    ("c1", 1, "Ski", "Frame"),
    ("c1", 2, "Engine", "Ski"),
    ("c1", 3, "Bolt", "Engine"),        # ambiguous child -> edge drops
    ("c1", 4, "Gadget", "Engine"),      # unknown child -> edge drops
    ("c2", 0, "Track", None),
    ("c2", 1, "333.0", "Track"),        # pass-through number
    ("c2", 2, "Frame", "Engine"),       # closes cycle Frame->Ski->Engine->Frame
    ("c3", 0, "Frame", "Frame"),        # self-loop -> filtered
    ("c4", 0, "100 SNOW", None),
    ("c4", 1, "Track", "100 SNOW"),     # raw-number pass-through parent with a space
]


def _oracle_triples() -> set[tuple[str, str, str, bool]]:
    """Reference-semantics oracle, pure Python (no Spark)."""
    parts: dict[str, dict] = {}
    for number, name, pt, view, state, source, rev, cont in ENTITIES:
        # dict overwrite = last-wins (:98)
        parts[number] = {
            "name": name, "part_type": pt, "view": view, "state": state,
            "source": source, "revision": rev, "container": cont,
        }
    name_to_pn: dict[str, list[str]] = {}
    for number, details in parts.items():
        name_to_pn.setdefault(details["name"], []).append(number)

    def resolve(mention: str) -> str | None:
        # :1055-1080 — exactly-one candidate, else pass-through, else None
        if mention in name_to_pn:
            cands = name_to_pn[mention]
            return cands[0] if len(cands) == 1 else None
        norm = mention
        if norm.replace(".", "").isdigit() and norm.endswith(".0"):
            norm = str(int(float(norm)))
        return norm if norm in parts else None

    edges: list[tuple[str, str]] = []
    for _, _, ref, parent in TURNS:
        if parent is None:
            continue
        p, c = resolve(parent), resolve(ref)
        if p is not None and c is not None and p != c and (p, c) not in edges:
            edges.append((p, c))

    # DFS closure (:980-1024): all reachable pairs, cycle-tolerant
    children: dict[str, list[str]] = {}
    for p, c in edges:
        children.setdefault(p, []).append(c)

    def descendants(node: str, visited=None) -> set[str]:
        if visited is None:
            visited = set()
        if node in visited:
            return set()
        visited.add(node)
        out = set()
        for ch in children.get(node, []):
            out.add(ch)
            out.update(descendants(ch, visited))
        return out

    triples: set[tuple[str, str, str, bool]] = set()

    def part_iri(n: str) -> str:
        return f"urn:part:{urllib.parse.quote(n)}"

    for number, d in parts.items():
        s = part_iri(number)
        nm = d["name"] or number
        triples.add((s, RDF_TYPE, ONT + "Part", False))
        triples.add((s, ONT + "name", nm, True))
        triples.add((s, RDFS_LABEL, nm, True))
        if d["part_type"]:
            triples.add((s, ONT + "hasPartType", ONT + d["part_type"], False))
        if d["view"]:
            triples.add((s, ONT + "hasView", ONT + d["view"], False))
        if d["state"]:
            triples.add((s, ONT + "hasState", ONT + d["state"], False))
        if d["source"]:
            triples.add((s, ONT + "hasSource", ONT + d["source"], False))
        if d["revision"]:
            triples.add((s, ONT + "hasRevision", d["revision"], True))
        if d["container"]:
            triples.add((s, ONT + "inContainer", d["container"], True))
    for p, c in edges:
        triples.add((part_iri(p), ONT + "hasComponent", part_iri(c), False))
        triples.add((part_iri(c), ONT + "usedIn", part_iri(p), False))
    for anc in set(children) | {c for cs in children.values() for c in cs}:
        for desc in descendants(anc):
            triples.add((part_iri(desc), ONT + "partOfAssembly", part_iri(anc), False))

    # alternates (:938-942): every link row, no existence check
    for orig, repl, _rtype in ALT_LINKS:
        triples.add((part_iri(orig), ONT + "hasAlternate", part_iri(repl), False))

    def doc_iri(n: str) -> str:
        return f"urn:document:{urllib.parse.quote(n)}"

    # describes (:955-960) + one document node per unique doc (:944-953)
    docs_seen: dict[str, tuple] = {}
    for dnum, pnum, drev, dorg, dcont in DOC_LINKS:
        triples.add((doc_iri(dnum), ONT + "describes", part_iri(pnum), False))
        docs_seen.setdefault(dnum, (drev, dorg, dcont))
    for dnum, (drev, dorg, dcont) in docs_seen.items():
        triples.add((doc_iri(dnum), RDF_TYPE, ONT + "Document", False))
        if drev:
            triples.add((doc_iri(dnum), ONT + "hasRevision", drev, True))
        if dorg:
            triples.add((doc_iri(dnum), ONT + "hasOrganization", dorg, True))
        if dcont:
            triples.add((doc_iri(dnum), ONT + "inContainer", dcont, True))
    return triples


def _spark_triples(spark) -> set[tuple[str, str, str, bool]]:
    ents = spark.createDataFrame(
        [
            (n, nm, None, src, vw, st, rev, cont, pt)
            for (n, nm, pt, vw, st, src, rev, cont) in ENTITIES
        ],
        "number string, name string, type string, source string, view string,"
        " state string, revision string, container string, part_type string",
    )
    rows = []
    for conv, idx, ref, parent in TURNS:
        text = f"user turn: ref=[{ref}]" + (f" parent=[{parent}]" if parent else "")
        rows.append((conv, idx, "user", text, None, datetime(2026, 1, 1)))
    transcripts = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    alt = spark.createDataFrame(
        ALT_LINKS, "child_number string, replacement_number string, replacement_type string"
    )
    desc = spark.createDataFrame(
        DOC_LINKS,
        "document_number string, part_number string, document_revision string,"
        " document_org string, document_container string",
    )
    mentions = extract.extract_mentions(transcripts)
    linked = linking.link_mentions(mentions, ents)
    edges = graph.bom_edges_from_linked(linked)
    closure = graph.transitive_closure(edges)
    triples = materialize.union_triples(
        materialize.part_triples(ents),
        materialize.bom_triples(edges),
        materialize.used_in_triples(edges),
        materialize.part_of_assembly_triples(closure),
        materialize.alternate_triples(alt),
        materialize.describe_triples(desc),
        materialize.document_triples(desc),
    )
    return {(r.subj, r.pred, r.obj, r.obj_is_literal) for r in triples.collect()}


def test_pipeline_matches_reference_semantics_exactly(spark):
    want = _oracle_triples()
    got = _spark_triples(spark)
    missing = want - got
    extra = got - want
    precision = len(got & want) / len(got)
    recall = len(got & want) / len(want)
    assert precision == 1.0 and recall == 1.0, (
        f"P={precision} R={recall}; missing={sorted(missing)[:5]} extra={sorted(extra)[:5]}"
    )


def test_oracle_golden_counts():
    """Reference-test-style pinned counts per predicate
    (tests/unit/test_spreadsheet_loader.py:81-93 pins totals; SURVEY §5
    lesson: pin per-predicate)."""
    want = _oracle_triples()
    by_pred: dict[str, int] = {}
    for _, p, _, _ in want:
        by_pred[p] = by_pred.get(p, 0) + 1
    # 7 Part type triples + 2 Document type triples
    assert by_pred[RDF_TYPE] == 9
    assert by_pred[ONT + "name"] == 7
    assert by_pred[RDFS_LABEL] == 7
    # edges: Frame->Ski, Ski->Engine, Engine->Frame (cycle),
    # Track->Engine ('333.0' pass-through), and '100 SNOW'->Track
    # (raw-number pass-through with a space)
    assert by_pred[ONT + "hasComponent"] == 5
    assert by_pred[ONT + "usedIn"] == 5
    # closure: cycle {Frame,Ski,Engine} = 3x3 pairs (incl. self-pairs,
    # reference DFS emits them) + Track reaches all 3 cycle members +
    # '100 SNOW' reaches Track and the 3 cycle members
    assert by_pred[ONT + "partOfAssembly"] == 16
    # alternates: 2 distinct links (duplicate row collapses)
    assert by_pred[ONT + "hasAlternate"] == 2
    # describes: 3 link rows; documents: 2 nodes, metadata only if truthy
    assert by_pred[ONT + "describes"] == 3
    assert by_pred[ONT + "hasOrganization"] == 1
    # hasRevision: 4 part revisions (A, B, C, D) + DOC-1's 'A'
    assert by_pred[ONT + "hasRevision"] == 5
    # inContainer: 4 part containers + DOC-2's 'lib #2'
    assert by_pred[ONT + "inContainer"] == 5
