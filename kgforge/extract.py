"""Per-turn mention detection & extraction (SURVEY.md §2.5, T1-T6 analogues).

Two extractors:

1. :func:`extract_mentions` — structural extraction of the transcript
   markup (``ref=[...]`` / ``parent=[...]``) using built-in regexp
   functions. Pure JVM path, whole-stage codegen, oracle-checkable.

2. :func:`detect_mentions_dictionary` — dictionary-based batched mention
   detection as a vectorized pandas UDF (the north-star stage: scan free
   text for any canonical name). One compiled alternation automaton per
   executor, Arrow-batched; at cluster scale the dictionary rides a
   Spark broadcast variable exactly as here.
"""

from __future__ import annotations

import re
from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

REF_PATTERN = r"ref=\[([^\]]+)\]"
PARENT_PATTERN = r"parent=\[([^\]]+)\]"


def extract_mentions(transcripts: DataFrame) -> DataFrame:
    """One row per (turn, slot) mention. Slots: 'ref' (the turn's own
    subject mention) and 'parent' (the enclosing-assembly mention) —
    the transcript analogue of the reference's name-BOM columns
    (parse_bom_csv_by_name, spreadsheet_loader.py:254-294).

    Single scan + explode (not one scan per slot unioned): at 100 TB
    the corpus is read once, and the plan is one codegen stage instead
    of two scans and a union."""
    slots = F.array(
        *[
            F.struct(
                F.lit(slot).alias("slot"),
                F.regexp_extract("text", pat, 1).alias("mention"),
            )
            for slot, pat in (("ref", REF_PATTERN), ("parent", PARENT_PATTERN))
        ]
    )
    return (
        transcripts.select("conv_id", "turn_idx", F.explode(slots).alias("s"))
        .select("conv_id", "turn_idx", "s.slot", "s.mention")
        .filter(F.col("mention") != "")
    )


_TRIE_END = ""


def _trie_regex(words: list[str]) -> str:
    """Compile a word list into a prefix-trie regex — the classic
    alternation->trie rewrite. A flat ``a|b|c`` alternation is O(#words)
    per position; the trie form shares prefixes so the regex engine
    walks it like an automaton (near Aho-Corasick behavior using only
    the stdlib). Greedy optional suffixes give longest-match-at-position
    semantics ('red plate Brand#8 #12' beats 'red plate Brand#8')."""
    trie: dict = {}
    for w in words:
        node = trie
        for ch in w:
            node = node.setdefault(ch, {})
        node[_TRIE_END] = True

    def pat(node: dict) -> str:
        branches = [
            re.escape(ch) + pat(child)
            for ch, child in sorted(node.items())
            if ch != _TRIE_END
        ]
        if not branches:
            return ""
        body = branches[0] if len(branches) == 1 else "(?:" + "|".join(branches) + ")"
        if _TRIE_END in node:
            return "(?:" + body + ")?"
        return body

    return pat(trie)


def compile_dictionary_pattern(names: list[str], overlapping: bool = False):
    """Compile a name list into the trie-regex automaton (see
    :func:`_trie_regex`). Returns None for an empty dictionary."""
    ordered = sorted(set(n for n in names if n))
    if not ordered:
        return None
    if overlapping:
        return re.compile("(?=(" + _trie_regex(ordered) + "))")
    return re.compile(_trie_regex(ordered))


# Executor-local automaton cache: the compiled trie is rebuilt at most
# once per (pattern/broadcast id, mode) per Python worker process,
# regardless of how many Arrow batches or tasks it sees.
_DETECTOR_CACHE: dict = {}


def _detect_batch(texts: pd.Series, pattern_str: str | None, overlapping: bool) -> pd.Series:
    """Module-level batch kernel for the dictionary detector.

    Shipped by REFERENCE (functools.partial over a module function), not
    as a nested closure: a closure would carry the compiled pattern by
    value, re-running the ~0.3 s sre compilation of the 128 KB trie on
    every task's unpickle; here the pattern STRING crosses once and each
    worker compiles it once into _DETECTOR_CACHE (guide §4.5 — cache
    heavyweight state per worker process, which only works for functions
    importable on the executor, not notebook/nested closures)."""
    if pattern_str is None:
        return pd.Series([[] for _ in texts])
    key = (pattern_str, overlapping)
    pattern = _DETECTOR_CACHE.get(key)
    if pattern is None:
        pattern = re.compile(pattern_str)
        _DETECTOR_CACHE[key] = pattern
    return _scan(texts, pattern, overlapping)


def _detect_batch_broadcast(texts: pd.Series, bc, bc_id: int, overlapping: bool) -> pd.Series:
    """Broadcast-dictionary twin of :func:`_detect_batch`: the name list
    rides a Spark broadcast (once per executor); the automaton is
    compiled once per worker keyed by the broadcast id."""
    key = (bc_id, overlapping)
    pattern = _DETECTOR_CACHE.get(key)
    if pattern is None:
        pattern = compile_dictionary_pattern(bc.value, overlapping)
        _DETECTOR_CACHE[key] = pattern
    return _scan(texts, pattern, overlapping)


def make_dictionary_detector(names=None, overlapping: bool = False, broadcast=None):
    """Build a vectorized detector over the canonical-name dictionary.

    Dictionary shipping, by scale:

    - ``names`` (list): the word list rides the serialized UDF closure —
      fine for small dictionaries, but re-shipped with every task.
    - ``broadcast`` (``sc.broadcast(names)`` handle): the list crosses
      the wire once per executor via Spark's broadcast machinery (the
      10^7-name path); each Python worker compiles the automaton once
      and caches it process-wide (_DETECTOR_CACHE).

    The automaton is a prefix-trie regex — shared prefixes walked like
    an Aho-Corasick goto function using only the stdlib engine; a true
    A-C automaton (e.g. pyahocorasick, not in this container) drops in
    behind :func:`compile_dictionary_pattern` without touching callers.

    ``overlapping=True`` wraps the trie in a zero-width lookahead
    ``(?=(trie))`` so a match is reported at *every* starting position
    (matches may overlap) — containment semantics, the Aho-Corasick
    behavior. On a substring-free dictionary (no name contained in
    another; see :func:`substring_free_names`) the distinct overlapping
    matches equal exactly the set of dictionary names contained in the
    text, which is what the DuckDB oracle checks.
    """
    if (names is None) == (broadcast is None):
        raise ValueError("pass exactly one of names / broadcast")

    if broadcast is not None:
        # Spark's broadcast id is unique per broadcast for the app's
        # lifetime; captured driver-side it rides the closure as a plain
        # int. (id(broadcast.value) is NOT safe as a key: CPython ids are
        # reused after GC, so in a long-lived worker a second dictionary
        # could alias the first one's cached automaton.)
        bc_id = broadcast._jbroadcast.id()

        @pandas_udf("array<string>")
        def detect(texts):
            return _detect_batch_broadcast(texts, broadcast, bc_id, overlapping)

        return detect

    pattern = compile_dictionary_pattern(names, overlapping)
    pattern_str = None if pattern is None else pattern.pattern

    @pandas_udf("array<string>")
    def detect_closure(texts):
        return _detect_batch(texts, pattern_str, overlapping)

    return detect_closure


def _scan(texts: pd.Series, pattern, overlapping: bool) -> pd.Series:
    if pattern is None:
        return pd.Series([[] for _ in texts])
    if overlapping:
        return texts.map(lambda t: [m for m in pattern.findall(t) if m] if t else [])
    return texts.map(lambda t: pattern.findall(t) if t else [])


def substring_free_names(entities: DataFrame) -> DataFrame:
    """Dictionary names with no *other* dictionary name contained in
    them — the precondition under which overlapping trie detection
    equals containment detection (and under which the DuckDB oracle is
    expressible). The filter itself is a contains-theta anti-join; it
    runs once at dictionary-build time, never on the corpus."""
    names = entities.select("name").dropDuplicates()
    other = names.select(F.col("name").alias("inner_name"))
    return names.join(
        other,
        (F.col("name") != F.col("inner_name"))
        & F.col("name").contains(F.col("inner_name")),
        "left_anti",
    )


# engine="auto" crossover: the JVM regexp engine wins below this many
# dictionary names, the worker-cached Python trie automaton above it
# (measured on the sf corpora at 8 cores; see detect_mentions_dictionary).
# Conservative midpoint of the measured bracket [~2k jvm-faster,
# ~20k python-faster].
JVM_ENGINE_MAX_NAMES = 4000


def detect_mentions_dictionary(
    transcripts: DataFrame,
    entities: DataFrame,
    names: list[str] | None = None,
    overlapping: bool = False,
    use_broadcast: bool = False,
    engine: str = "auto",
) -> DataFrame:
    """Dictionary mention detection over free text -> exploded mention rows.

    The dictionary is collected on the driver (it is the *small* side by
    construction — same assumption the broadcast linking join makes).
    Pass ``names`` to reuse an already-collected dictionary across
    calls; ``use_broadcast=True`` ships it as a Spark broadcast variable
    (once per executor) instead of inside each task's UDF closure — the
    large-dictionary path.

    ``engine``: ``"python"`` scans with the trie automaton in an
    Arrow-batched pandas UDF; ``"jvm"`` evaluates the SAME trie
    pattern with ``regexp_extract_all`` inside whole-stage codegen — no
    Python crossing at all. Measured crossover (sf corpora, 8 cores):
    the JVM engine is ~1.7x faster up to a few thousand names but falls
    behind the worker-cached Python automaton at ~20k names (2.35 s vs
    4.24 s over 600k 800-byte turns) — Java's backtracking NFA degrades
    on very wide tries where CPython's ``re`` holds up. ``"auto"``
    (default) picks by dictionary size at that measured crossover
    (:data:`JVM_ENGINE_MAX_NAMES`), so the small-dictionary fast path
    is the default everywhere; identical rows in all three modes
    (pytest-asserted).
    """
    if names is None:
        names = [r[0] for r in entities.select("name").distinct().collect()]
    if engine == "auto":
        engine = "jvm" if len(names) <= JVM_ENGINE_MAX_NAMES else "python"
    if engine == "jvm":
        pattern = compile_dictionary_pattern(names, overlapping)
        if pattern is None:
            return transcripts.select(
                "conv_id", "turn_idx", F.lit(None).cast("string").alias("mention")
            ).filter(F.lit(False))
        # group 0 = the match itself; the overlapping form's match is
        # zero-width, so the detected name sits in capture group 1
        group = 1 if overlapping else 0
        return transcripts.select(
            "conv_id",
            "turn_idx",
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(pattern.pattern), group)
            ).alias("mention"),
        ).filter(F.col("mention") != "")
    if engine != "python":  # pragma: no cover
        raise ValueError(f"unknown engine {engine!r}")
    if use_broadcast:
        bc = transcripts.sparkSession.sparkContext.broadcast(names)
        detect = make_dictionary_detector(broadcast=bc, overlapping=overlapping)
    else:
        detect = make_dictionary_detector(names=names, overlapping=overlapping)
    return (
        transcripts.withColumn("mentions", detect(F.col("text")))
        .select(
            "conv_id",
            "turn_idx",
            F.explode("mentions").alias("mention"),
        )
    )


def turn_entities(transcripts: DataFrame) -> DataFrame:
    """Stable per-turn entity ids under the turn-ordering invariant:
    subj = urn:turn:{conv_id}:{turn_idx} (window ordering on
    (conv_id, turn_idx) per BASELINE.json north_star)."""
    return transcripts.select(
        F.concat(
            F.lit("urn:turn:"), F.col("conv_id"), F.lit(":"), F.col("turn_idx").cast("string")
        ).alias("turn_iri"),
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        "ts",
    )
