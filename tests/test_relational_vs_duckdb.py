"""Every declared query (SURVEY.md §2.11) hash-matches the DuckDB oracle
at sf0.001 (fast inner loop; the driver re-checks at sf0.01)."""

from __future__ import annotations

import pytest

from fifteenmc_spark.operators.relational import QUERIES

from .oracle_util import compare, duckdb_conn


@pytest.fixture(scope="module")
def oracle(sf_small):
    con = duckdb_conn(sf_small)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_declared_query_matches_oracle(name, spark, sf_small, oracle):
    q = QUERIES[name]
    sdf = q.build(spark, sf_small)
    if q.oracle is None:
        assert sdf.count() >= 0
        return
    pdf = oracle.execute(q.oracle).fetchdf()
    compare(sdf, pdf, name)
