"""x10 link-PageRank invariants beyond the DuckDB oracle sweep.

The oracle pins engine parity; these pin the ALGORITHM: damped-walk mass
conservation under integer fixed-point arithmetic, rank concentration on
the high-degree side of the bipartite trade graph, and t10's rule flags
carrying real signal (neither vacuously true nor vacuously false).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from fifteenmc_spark.operators.graphrank import PR_SCALE, x10
from fifteenmc_spark.operators.relational import QUERIES


def test_x10_rank_mass_is_conserved_up_to_floor_leakage(spark, sf_small):
    """Each damped update redistributes total mass N*SCALE exactly, except
    for the mass floored away by the two integer divisions (< 1 unit per
    edge contribution + < 1 per node per iteration).  With 3 iterations
    the retained fraction stays above 97% — a wrong join (dropped nodes,
    double-counted symmetric edges) moves this by whole percents."""
    df = x10(spark, sf_small).agg(
        F.count(F.lit(1)).alias("n"), F.sum("rank_scaled").alias("mass")
    )
    row = df.collect()[0]
    total = row["n"] * PR_SCALE
    assert 0.97 * total <= row["mass"] <= total


def test_x10_rank_concentrates_on_suppliers(spark, sf_small):
    """Suppliers are ~15x rarer than customers in the trade graph, so the
    stationary mass concentrates on them: every top-10 node by rank is a
    supplier and every supplier outranks the customer median."""
    rows = x10(spark, sf_small).limit(10).collect()
    assert all(r["node"].startswith("S") for r in rows)


def test_t10_rules_carry_signal(spark, sf_small):
    """The Gopher battery must discriminate on the synthetic corpus: some
    docs pass, some fail (a threshold that is vacuous on the testdata
    would make the oracle check meaningless)."""
    agg = (
        QUERIES["t10_gopher_rules"]
        .build(spark, sf_small)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("pass_gopher").cast("int")).alias("n_pass"),
        )
        .collect()[0]
    )
    assert 0 < agg["n_pass"] < agg["n"]


def test_x10_matches_independent_python_pagerank(spark, sf_small):
    """Algorithm-level oracle independent of BOTH engines: replay the
    exact integer damping iteration in pure Python over the same edge
    list (pandas-read parquet, dict arithmetic) and require bit-identical
    rank_scaled for every node.  This pins the SEMANTICS (who contributes
    to whom, the div order, the damping constants) separately from the
    DuckDB twin, which shares the SQL formulation and could in principle
    share a formulation bug."""
    import collections

    import pandas as pd

    from fifteenmc_spark.operators.graphrank import _BASE, PR_ITERATIONS, PR_SCALE
    from fifteenmc_spark.operators.relational import QUERIES

    li = pd.read_parquet(f"{sf_small}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"])
    orders = pd.read_parquet(f"{sf_small}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    m = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    w = collections.Counter(
        (f"S{s}", f"C{c}") for s, c in zip(m["l_suppkey"], m["o_custkey"])
    )
    edges = []
    for (src, dst), k in w.items():
        edges.append((src, dst, k))
        edges.append((dst, src, k))
    tot = collections.Counter()
    for src, _, k in edges:
        tot[src] += k
    rank = {n: PR_SCALE for n in tot}
    for _ in range(PR_ITERATIONS):
        m_in = collections.defaultdict(int)
        for src, dst, k in edges:
            m_in[dst] += (rank[src] * k) // tot[src]
        rank = {n: _BASE + (85 * m_in[n]) // 100 for n in tot}
    got = {
        r["node"]: r["rank_scaled"]
        for r in QUERIES["x10_link_pagerank"].build(spark, sf_small).collect()
    }
    assert got == rank
