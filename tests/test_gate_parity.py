"""Every gate query must match its DuckDB oracle — the same compare the
driver performs at sf0.01, run here at sf0.001 for speed."""

from __future__ import annotations

import pytest

from kgforge.gate import ORACLES, QUERIES
from tests.util import assert_df_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_gate_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert_df_matches_oracle(df, ORACLES[name], sf_dir)


def test_every_oracle_has_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing
