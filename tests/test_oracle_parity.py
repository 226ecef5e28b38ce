"""Run every registered query against its DuckDB oracle at sf0.01 —
the same comparison the driver performs for CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

from matt3r_data_ingestion_serverless_spark.plans import all_queries
from tests.conftest import SF_CORRECTNESS
from tests.oracle_harness import compare, duckdb_con

_QUERIES = all_queries()


@pytest.fixture(scope="module")
def duck():
    con = duckdb_con(SF_CORRECTNESS)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_oracle_parity(spark, duck, name):
    fn, sql = _QUERIES[name]
    df = fn(spark, SF_CORRECTNESS)
    if sql is None:
        # rows-only check, mirroring the driver's weaker path
        assert df.count() >= 0
        return
    problems = compare(df, duck, sql)
    assert not problems, f"{name}: " + " | ".join(problems)
