"""Spark fixture derivation must match the DuckDB oracle derivation
byte-for-byte — this is the foundation every downstream operator parity
check stands on (per-turn text equality under stable turn ordering,
BASELINE.json input_hint)."""

from __future__ import annotations

from kgforge import fixtures
from kgforge.oracle import with_fixtures
from tests.util import assert_df_matches_oracle


def test_transcripts_parity(spark, sf_dir):
    df = fixtures.load_transcripts(spark, sf_dir)
    # epoch seconds for a timestamp-stable compare
    from pyspark.sql import functions as F

    got = df.select("conv_id", "turn_idx", "role", "text", "tool", F.unix_timestamp("ts").alias("ts_epoch"))
    sql = with_fixtures(
        "SELECT conv_id, turn_idx, role, text, tool, CAST(epoch(ts) AS BIGINT) AS ts_epoch FROM transcripts"
    )
    assert_df_matches_oracle(got, sql, sf_dir)


def test_transcripts_unique_key(spark, sf_dir):
    df = fixtures.load_transcripts(spark, sf_dir)
    assert df.count() == df.select("conv_id", "turn_idx").distinct().count()


def test_entities_parity(spark, sf_dir):
    df = fixtures.load_entities(spark, sf_dir)
    sql = with_fixtures("SELECT * FROM entities")
    assert_df_matches_oracle(df, sql, sf_dir)


def test_entities_last_wins(spark, sf_dir):
    ents = fixtures.load_entities(spark, sf_dir).filter("number = '0'").collect()
    assert len(ents) == 1
    # sheet 1 override wins (reference dict-overwrite :98)
    assert ents[0].revision == "Z"
    assert ents[0].state == "RELEASED"


def test_entities_have_ambiguous_names(spark, sf_dir):
    from pyspark.sql import functions as F

    dup = (
        fixtures.load_entities(spark, sf_dir)
        .groupBy("name")
        .agg(F.count("*").alias("c"))
        .filter("c > 1")
        .count()
    )
    assert dup > 0, "ambiguity fixture requires shared names"


def test_versions_changes_parity(spark, sf_dir):
    from pyspark.sql import functions as F

    v = fixtures.load_versions(spark, sf_dir).select(
        "number", "version", "state", F.unix_timestamp("created_ts").alias("ts_epoch")
    )
    assert_df_matches_oracle(
        v,
        with_fixtures(
            "SELECT number, version, state, CAST(epoch(created_ts) AS BIGINT) AS ts_epoch FROM versions"
        ),
        sf_dir,
    )
    c = fixtures.load_changes(spark, sf_dir).select(
        "change_id", "change_type", "affected_number", F.unix_timestamp("ts").alias("ts_epoch")
    )
    assert_df_matches_oracle(
        c,
        with_fixtures(
            "SELECT change_id, change_type, affected_number, CAST(epoch(ts) AS BIGINT) AS ts_epoch FROM changes"
        ),
        sf_dir,
    )
