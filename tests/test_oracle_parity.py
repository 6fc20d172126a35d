"""Every declared query must hash-match its DuckDB oracle (the driver's
t2 gate, run locally at sf0.001 for fast iteration)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # full-run default; excluded by the -m 'not slow' fast tier

from telecom_competitor_analysis_spark.plans.oracles import ORACLES
from telecom_competitor_analysis_spark.plans.queries import QUERIES

from tests.oracle_utils import compare, duckdb_conn


def test_every_query_has_an_oracle_or_is_flagged():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    spark_df = QUERIES[name](spark, sf_dir)
    con = duckdb_conn(sf_dir)
    oracle_df = con.execute(ORACLES[name]).df()
    ok, msg = compare(spark_df, oracle_df)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
