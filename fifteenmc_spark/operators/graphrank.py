"""Iterative link-graph authority ranking (weighted PageRank).

The 100 TB training-data use case is crawl prioritization: rank the web's
domain link graph so the fetch frontier and the data-mixing weights favor
authoritative domains (the Common-Crawl-style harmonic/PageRank centrality
lists).  The testdata has no link table, so the declared query derives a
deterministic stand-in graph with the same shape — the supplier<->customer
trade graph from lineitem JOIN orders, edge weight = number of lineitems —
and runs the real operator on it.

Engine shape (the classic PageRank-on-Spark loop, expressed DataFrame-first,
measured at sf0.1 — each step below bought a real reduction from the naive
form's 6.5 s to ~3.0 s):

- Inputs are repartitioned off the single-row-group parquet scans before the
  join (the testdata files are one row group -> one scan partition, which
  serialized the whole edge build; the _docs idiom from textops).
- Node ids are INTEGERS internally (2*suppkey / 2*custkey+1); the 'S…'/'C…'
  labels render at the very end over |nodes| rows.  String keys paid hash +
  compare costs through every shuffle of the |edges| table.
- The deduped edge table (``base``) is pinned ONCE and the symmetrized
  union + degree table derive from it; without the pin, the expensive
  lineitem-join groupBy re-ran for every lineage that touched it (degree
  pass, edge-weight join, rank init — measured as repeated straggler
  stages).  ``deg`` is pinned too: it seeds the rank vector and joins the
  edge table.
- Each iteration is ONE join (ranks into edges on src) + ONE aggregation
  (contributions by dst).  The ranks side is |nodes| rows; below
  ``X10_BROADCAST_NODES_BOUND`` it is broadcast (measured dispatch, the
  x7 collect-bound pattern: one scalar probe), so the |edges| table never
  re-shuffles during iterations — at web scale (nodes beyond the bound)
  the same loop runs as a distributed shuffle join, and the right layout
  is pre-partitioning edges by src once so every iteration reuses it.
- The symmetrized graph gives every node in-degree >= 1, so the
  contribution aggregate covers every node and no left-join-back against
  a node table is needed (a node whose contributions all floor to 0 still
  yields a SUM(0) row).

Cross-engine exactness: ranks are BIGINTs at 1e9 scale and the damping
update is pure integer arithmetic — contrib = (r * w) div tot_w, r' =
(15*SCALE) div 100 + (85 * sum(contrib)) div 100 — so any engine reproduces
the iteration bit-identically (no float accumulates across iterations).
Overflow bounds: total rank mass is N*SCALE, so r*w needs N*SCALE*w_max <
2^63 — at 1e9 nodes and w_max 1e3, shrink SCALE to 1e6 or reorder the
contribution as (r div tot_w) * w; the testdata sits 5 orders of magnitude
inside the bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from .relational import _register

PR_SCALE = 1_000_000_000  # rank fixed-point scale (1e-9 resolution)
PR_ITERATIONS = 3
_BASE = 15 * PR_SCALE // 100  # (1-d) * SCALE with d = 0.85, exact

# Broadcast the |nodes|-row rank vector while it fits comfortably in one
# executor (~16 bytes/row -> ~32 MB at the bound); above it, the loop runs
# as a distributed shuffle join.  One scalar probe per query decides.
X10_BROADCAST_NODES_BOUND = 2_000_000


def _pagerank_oracle_sql() -> str:
    """Unrolled-CTE DuckDB twin: r0 .. r{K} with the identical integer
    update rule (DuckDB's // is floor division; all values are positive,
    so it agrees with Spark's `div`).  SUMs are cast back to BIGINT —
    DuckDB widens integer SUM to HUGEINT, which would be a schema
    mismatch."""
    parts = [
        """
    WITH base AS (
      SELECT 'S' || CAST(l_suppkey AS VARCHAR) AS src,
             'C' || CAST(o_custkey AS VARCHAR) AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY l_suppkey, o_custkey),
    e AS (SELECT src, dst, w FROM base UNION ALL SELECT dst AS src, src AS dst, w FROM base),
    deg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS tot_w FROM e GROUP BY src),
    n AS (SELECT src AS node FROM deg),
    r0 AS (SELECT node, CAST({scale} AS BIGINT) AS r FROM n)""".format(scale=PR_SCALE)
    ]
    for i in range(1, PR_ITERATIONS + 1):
        parts.append(
            """
    c{i} AS (
      SELECT e.dst AS node, CAST(SUM((r.r * e.w) // d.tot_w) AS BIGINT) AS m
      FROM e JOIN r{prev} r ON e.src = r.node JOIN deg d ON e.src = d.src
      GROUP BY e.dst),
    r{i} AS (
      SELECT n.node,
             CAST({base} + (85 * COALESCE(c.m, 0)) // 100 AS BIGINT) AS r
      FROM n LEFT JOIN c{i} c USING (node))""".format(i=i, prev=i - 1, base=_BASE)
        )
    final = """
    SELECT node, r AS rank_scaled,
           ROUND(CAST(r AS DOUBLE) / {scale}.0, 6) AS rank
    FROM r{k} ORDER BY rank_scaled DESC, node
    """.format(scale=PR_SCALE, k=PR_ITERATIONS)
    return ",".join(parts) + final


@_register(
    "x10_link_pagerank",
    f"Weighted PageRank ({PR_ITERATIONS} damped iterations, d = 0.85) over "
    "the symmetrized supplier<->customer trade graph — the crawl-"
    "prioritization operator (rank the domain link graph to steer the "
    "fetch frontier / mixing weights) run on the testdata's deterministic "
    "stand-in link graph.  Integer fixed-point ranks (1e9 scale) make the "
    "compounding iteration engine-exact: contrib = (r*w) div tot_w, "
    "r' = (15*S) div 100 + (85*sum) div 100 — the same scaled-BIGINT "
    "discipline as the trained-quantizer Lloyd steps.  One join + one "
    "aggregation per iteration; edge and degree tables built once and "
    "pinned; the rank vector broadcasts under a measured node-count "
    "bound (distributed shuffle join above it).",
    _pagerank_oracle_sql(),
    ("graph", "iterative", "pipeline"),
)
def x10(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = spark.sparkContext.defaultParallelism
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey").repartition(p)
    orders = (
        read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey").repartition(p)
    )
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_suppkey", "o_custkey")
        .agg(F.count(F.lit(1)).alias("w"))
        .select(
            (F.col("l_suppkey") * 2).alias("src"),
            (F.col("o_custkey") * 2 + 1).alias("dst"),
            "w",
        )
        .localCheckpoint(eager=False)
    )
    e = base.unionByName(base.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w"))
    deg = e.groupBy("src").agg(F.sum("w").alias("tot_w")).localCheckpoint(eager=False)
    n_nodes = deg.count()  # ONE scalar probe drives the broadcast dispatch
    small = n_nodes <= X10_BROADCAST_NODES_BOUND
    ew = e.join(F.broadcast(deg) if small else deg, "src").localCheckpoint(eager=False)
    ranks = deg.select(F.col("src").alias("node"), F.lit(PR_SCALE).cast("bigint").alias("r"))
    for _ in range(PR_ITERATIONS):
        rside = F.broadcast(ranks) if small else ranks
        # symmetrized graph => every node has in-degree >= 1, so the
        # contribution aggregate alone covers every node (a node whose
        # contributions all floor to 0 still yields a SUM(...)=0 row) —
        # no left-join-back against a node table needed
        ranks = (
            ew.join(rside, ew["src"] == rside["node"])
            .select("dst", F.expr("(r * w) div tot_w").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("m"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(_BASE).cast("bigint") + F.expr("(85 * m) div 100")).alias("r"),
            )
        )
    lbl = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("S"), (F.col("node") / 2).cast("bigint").cast("string")),
    ).otherwise(
        F.concat(F.lit("C"), ((F.col("node") - 1) / 2).cast("bigint").cast("string"))
    )
    return ranks.select(
        lbl.alias("node"),
        F.col("r").alias("rank_scaled"),
        F.round(F.col("r").cast("double") / float(PR_SCALE), 6).alias("rank"),
    ).orderBy(F.desc("rank_scaled"), "node")
