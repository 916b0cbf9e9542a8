"""Driver contract for the spark-graft builder (PySpark target).

Backed by :mod:`kgforge.gate`, the single registry pairing every
implemented operator (SURVEY.md §2) with its DuckDB oracle SQL. The
pytest suite runs the same registry, so local green == driver green.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG-construction pipeline on sf0.001 — extract ->
    link -> edges -> closure -> triple families -> counts per predicate."""
    from kgforge import materialize
    from kgforge.pipeline import build_graph

    build = build_graph(spark, "/root/testdata/sf0.001", closure_edge_mod=None)
    return materialize.triple_counts(build.triples)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kgforge.gate import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from kgforge.gate import ORACLES

    return dict(ORACLES)
