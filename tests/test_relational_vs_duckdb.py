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


def test_x5_prefix_filter_equivalence(spark, sf_small):
    """The PPJoin prefix-filtered plan (x5's scale path) is lossless: it
    returns exactly the pairs of the plain inverted-index plan."""
    from fifteenmc_spark.operators.dedup import ngram_jaccard_prefix_filtered

    base = QUERIES["x5_ngram_jaccard"].build(spark, sf_small).collect()
    pf = ngram_jaccard_prefix_filtered(spark, sf_small).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, pf))
    assert len(base) > 0
