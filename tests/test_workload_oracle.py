"""Every workload query hash-matches its DuckDB oracle at sf0.001 (the
same check the driver runs at sf0.01)."""

from __future__ import annotations

import pytest

from sec_financial_data_pipeline_using_snowflake_dbt_spark.workload import (
    ORACLES,
    QUERIES,
)

from .conftest import SF_SMOKE
from .oracle_harness import compare, duckdb_conn


@pytest.fixture(scope="module")
def oracle(request):
    con = duckdb_conn(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, oracle, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert df.columns, f"{name}: empty schema"
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check
        return
    expected = oracle.execute(ORACLES[name]).df()
    problems = compare(df, expected, name)
    assert not problems, "\n".join(problems)
