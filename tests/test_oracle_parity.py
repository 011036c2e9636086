"""Every queries() entry vs its DuckDB oracle at sf0.001 — the same
comparison the driver makes at sf0.01, run in CI so divergences are
caught immediately."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from simple_etl_pipeline_spark.testing import compare_with_oracle

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


from simple_etl_pipeline_spark.testing import demoted_queries

DEMOTED = demoted_queries()


def test_demoted_queries_left_the_registry():
    assert set(DEMOTED) & set(QUERIES) == set()


@pytest.mark.parametrize("name", sorted(DEMOTED))
def test_demoted_query_matches_oracle(spark, sf_dir, name):
    fn, oracle = DEMOTED[name]
    compare_with_oracle(fn(spark, sf_dir), oracle, sf_dir)


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    compare_with_oracle(df, ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
