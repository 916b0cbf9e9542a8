"""kgforge — a PySpark-native knowledge-graph construction engine.

A from-scratch rebuild of the capabilities of Cars-10/xlsx_to_graphdb
(reference at /root/reference, read-only) as an idiomatic Spark
DataFrame pipeline: triple extraction -> entity linking ->
canonicalization -> graph materialization, over tables of multi-turn
conversation transcripts ``(conv_id, turn_idx, role, text, tool, ts)``.

Module map (SURVEY.md §7.0):

- :mod:`kgforge.session`       Spark session factory (AQE, Arrow, shuffle tuning)
- :mod:`kgforge.schema`        StructTypes for transcripts / entities / triples / manifest
- :mod:`kgforge.fixtures`      deterministic derivation of transcripts & side tables
- :mod:`kgforge.normalize`     scalar normalization & validation (SURVEY §2.2)
- :mod:`kgforge.extract`       mention detection + per-turn triple extraction (§2.5)
- :mod:`kgforge.linking`       dictionary entity linking, broadcast + salted (§2.3 J1/J2)
- :mod:`kgforge.graph`         hierarchy/graph operators: closure, reverse edges,
                               self-joins, level-stack decode (§2.3/§2.4)
- :mod:`kgforge.materialize`   triple builders, N-Triples rendering, statistics (§2.5/§2.6)
- :mod:`kgforge.resume`        per-partition manifest checkpoint/resume (§2.9)
- :mod:`kgforge.pipeline`      end-to-end driver (§3.1 analogue)
- :mod:`kgforge.datapipe`      training-data pipeline ops: dedup, similarity,
                               text analysis, multimodal plumbing
"""

__version__ = "0.1.0"
