"""Property-based fuzz of the name-resolution semantics (reference
spreadsheet_loader.py:1041-1080) — random entity tables and mention
streams compared against a pure-Python oracle. Covers the corners the
fixed fixtures can't enumerate: blank names falling back to (trimmed)
numbers, names that trim onto each other (merged candidate sets), names
that LOOK like numbers (name hit must beat number pass-through), float
residue normalization, unicode, and whitespace-padded mentions (the
index key trims, the join probe does not)."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kgforge import linking

NUM_ALPHABET = "0123456789"
TEXT_ALPHABET = " abcß日0123456789."


def _oracle_link(entities: list[tuple[str, str]], mentions: list[str]):
    """Reference semantics, pure Python: index str(name or number).strip()
    -> candidate set; exactly-one candidate resolves, 2+ is ambiguous
    (edge drops), a miss falls through to trimmed/.0-stripped number
    pass-through, else unknown."""
    index: dict[str, set[str]] = {}
    for number, name in entities:
        key = (name if name else number).strip()
        index.setdefault(key, set()).add(number)
    known = {number for number, _ in entities}
    out = []
    for m in mentions:
        cands = index.get(m)  # raw probe: the impl joins m.mention == index.name
        if cands is not None:
            if len(cands) == 1:
                out.append((m, "resolved", next(iter(cands))))
            else:
                out.append((m, "ambiguous", None))
        else:
            t = m.strip()
            norm = re.sub(r"\.0+$", "", t) if re.fullmatch(r"[0-9]+\.0+", t) else t
            if norm in known:
                out.append((m, "resolved", norm))
            else:
                out.append((m, "unknown", None))
    return out


@st.composite
def _linking_case(draw):
    entities = draw(
        st.lists(
            st.tuples(
                st.text(alphabet=NUM_ALPHABET, min_size=1, max_size=4),
                st.text(alphabet=TEXT_ALPHABET, min_size=0, max_size=6),
            ),
            min_size=1,
            max_size=10,
            unique_by=lambda t: t[0],
        )
    )
    pool = [n for _, n in entities if n.strip()] + [num for num, _ in entities]
    derived = st.sampled_from(pool).flatmap(
        lambda s: st.sampled_from([s, s + ".0", " " + s, s + " ", s.strip() or s])
    )
    mentions = draw(
        st.lists(
            st.one_of(derived, st.text(alphabet=TEXT_ALPHABET, min_size=1, max_size=6)),
            min_size=1,
            max_size=15,
        )
    )
    return entities, mentions


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_linking_case())
def test_link_mentions_matches_reference_oracle(spark, case):
    entities, mentions = case
    ents = spark.createDataFrame(
        [(num, name, None, None, None, None, None, None, None) for num, name in entities],
        "number string, name string, type string, source string, view string,"
        " state string, revision string, container string, part_type string",
    )
    m_df = spark.createDataFrame(
        [("c", i, "ref", m) for i, m in enumerate(mentions)],
        "conv_id string, turn_idx int, slot string, mention string",
    )
    got = {
        (r.turn_idx, r.mention, r.status, r.resolved_number)
        for r in linking.link_mentions(m_df, ents).collect()
    }
    want = {
        (i, m, status, num)
        for i, (m, status, num) in enumerate(_oracle_link(entities, mentions))
    }
    assert got == want, f"\nonly-spark={sorted(got - want)}\nonly-oracle={sorted(want - got)}"
