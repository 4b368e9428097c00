"""Declared-query contract (SURVEY.md §2.11, D1-D22).

Each entry pairs an idiomatic-Spark DataFrame builder with the equivalent
ANSI SQL the DuckDB oracle runs on the same parquet tables.  Conventions
(SURVEY.md §2.11): deterministic ORDER BY, ROUND(x,4) on float aggregates,
no approx functions, identical column aliases on both sides.

Determinism notes baked into the SQL:
- big double sums go through DECIMAL(25,6) so Spark and DuckDB produce the
  *exact* same value regardless of accumulation order (double += is
  order-dependent; decimal sum is exact);
- COUNT/SUM-of-int results are cast BIGINT on the DuckDB side (DuckDB
  widens integer SUM to HUGEINT, which would be a schema mismatch);
- YEAR/MONTH cast to INT on both sides;
- timestamps are never returned raw — always date_format'ed strings.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import geo
from ..io import read_table


@dataclass(frozen=True)
class DeclaredQuery:
    name: str
    doc: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver falls back to rows-only check
    tags: tuple[str, ...] = field(default=())


QUERIES: dict[str, DeclaredQuery] = {}


def _register(name: str, doc: str, oracle: str | None, tags: tuple[str, ...] = ()):
    def deco(fn):
        QUERIES[name] = DeclaredQuery(name, doc, fn, oracle, tags)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# Exact-sum helper: route a double expression through decimal so the sum is
# order-independent, then back to double for the oracle-matching schema.
def _dsum(col, alias: str, scale: int = 4):
    return F.round(F.sum(col.cast("decimal(25,6)")).cast("double"), scale).alias(alias)


def _i4(col):
    """10^4-scaled BIGINT of a value with <= 4 true decimal digits."""
    return F.round(col * 10000).cast("bigint")


def _isum4(col, alias: str, scale: int = 4):
    """Exact cross-engine sum for values with <= 4 DECIMAL DIGITS (TPC-H
    money/quantity: prices and discounts carry 2, their product 4 —
    verified max |x*1e4 - round(x*1e4)| ~ 2e-7 on the testdata): scale to
    BIGINT at the scan, ONE codegen long sum, descale to double.

    Why not _dsum here: DECIMAL(25,6) aggregation buffers exceed the
    long-backed precision-18 fast path, so every row updates an
    object-backed Decimal — measured 0.99 s vs 0.49 s on d6 at sf0.1.
    The integer sum is exact AND vectorized; both engines compute the
    identical ROUND(x*10000) on the same IEEE doubles, so parity is
    structural.  Bounds: the scaled sum must fit BIGINT (~9.2e14 of
    summed value mass); beyond that — sf ~1000 in one group — route
    through _dsum's DECIMAL instead.  Use ONLY for <=4-decimal-digit
    values: arbitrary doubles (events.value) stay on _dsum, where
    DECIMAL is the point, not a cost."""
    return F.round(F.sum(_i4(col)) / 10000.0, scale).alias(alias)


# ---------------------------------------------------------------------------
# D1 scan + filter + project (P2-style predicate algebra)
# ---------------------------------------------------------------------------
@_register(
    "d1_scan_filter",
    "Pushdown-friendly scan: filter + 2-column projection (ref walkability "
    "filter shape, graph_construction.py:49-72).",
    """
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity > 30
    ORDER BY l_orderkey, l_linenumber
    """,
    ("scan", "filter", "projection"),
)
def d1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 30))
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# D2 inner equi-join (J1)
# ---------------------------------------------------------------------------
@_register(
    "d2_inner_join",
    "Inner equi-join customer⋈orders (ref J1 dictionary join, "
    "graph_construction.py:243,250-255).",
    """
    SELECT c.c_name, o.o_orderkey
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_totalprice > 400000
    ORDER BY c_name, o_orderkey
    """,
    ("join",),
)
def d2(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "inner")
        .select("c_name", "o_orderkey")
        .orderBy("c_name", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# D3 broadcast dim chain join (J1 chain)
# ---------------------------------------------------------------------------
@_register(
    "d3_dim_chain_join",
    "customer⋈nation⋈region with small dims broadcast — the 100 TB plan: "
    "fact table streams, dims broadcast, zero shuffle on the dims.",
    """
    SELECT c.c_custkey, c.c_name, n.n_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    ORDER BY c_custkey
    """,
    ("join", "broadcast"),
)
def d3(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# D4 left outer + sentinel null handling (P8)
# ---------------------------------------------------------------------------
@_register(
    "d4_left_outer",
    "Left outer join with COALESCE sentinel (ref P8 fillna(-1), "
    "precompute_poi_reach.py:58-60).",
    """
    SELECT c.c_custkey, COALESCE(o.o_orderkey, -1) AS o_key
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
      ON c.c_custkey = o.o_custkey
    ORDER BY c_custkey, o_key
    """,
    ("join", "null-handling"),
)
def d4(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select("c_custkey", F.coalesce("o_orderkey", F.lit(-1).cast("bigint")).alias("o_key"))
        .orderBy("c_custkey", "o_key")
    )


# ---------------------------------------------------------------------------
# D5 semi / anti joins (J8, U3)
# ---------------------------------------------------------------------------
@_register(
    "d5_semi_join",
    "Left-semi join: customers having a big order (ref J8 existence join, "
    "validate_csr.py:23-29).",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
    ORDER BY c_custkey
    """,
    ("join", "semi"),
)
def d5a(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@_register(
    "d5_anti_join",
    "Left-anti join: customers with no big order (ref U3 membership split, "
    "poi_query.py:86-104).",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
    ORDER BY c_custkey
    """,
    ("join", "anti"),
)
def d5b(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# D6 group-by aggregation, TPC-H Q1 shape (A1-A4)
# ---------------------------------------------------------------------------
@_register(
    "d6_groupby_agg",
    "Hash aggregation with partial (map-side) combine — replaces the "
    "reference's hand-rolled lexsort+reduceat sort-agg "
    "(graph_construction.py:139-148).  Money sums go through 1e4-scaled "
    "BIGINT (_isum4) for cross-engine exactness inside codegen.",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS cnt,
           CAST(ROUND(SUM(CAST(ROUND(l_quantity * 10000) AS BIGINT)) / 10000.0, 4) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 4) AS DOUBLE) AS sum_disc_price,
           ROUND((SUM(CAST(ROUND(l_quantity * 10000) AS BIGINT)) / 10000.0) / COUNT(*), 4) AS avg_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    ("aggregate",),
)
def d6(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    qty_i = _i4(F.col("l_quantity"))
    disc_i = _i4(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum(qty_i) / 10000.0, 4).alias("sum_qty"),
            F.round(F.sum(disc_i) / 10000.0, 4).alias("sum_disc_price"),
            F.round((F.sum(qty_i) / 10000.0) / F.count(F.lit(1)), 4).alias("avg_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# D7 distinct / count distinct (A3)
# ---------------------------------------------------------------------------
@_register(
    "d7_count_distinct",
    "Exact COUNT(DISTINCT) per group (ref A3 unique categories, "
    "precompute_poi_reach.py:152).",
    """
    SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    ("aggregate", "distinct"),
)
def d7(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n_cust"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# D8 exact percentile / median (A4)
# ---------------------------------------------------------------------------
def grouped_rank_ranged(df, keys: list[str], value: str):
    """Per-group 0-based rank of ``value`` WITHOUT a per-group window.

    ``row_number() OVER (PARTITION BY g ORDER BY v)`` hashes every row of a
    group onto ONE reducer — with few groups (d8 has 3 return flags) that
    is a single-task sort of the whole table, a real collapse at 100 TB.
    Here the sort parallelism is independent of group count:

    1. repartitionByRange(keys..., value) + sortWithinPartitions: each
       partition holds a contiguous (group, value) range, sorted.
    2. per-(partition, group) counts (tiny) → two prefix sums: __start
       (rows of earlier groups within the partition) and __off (the
       group's rows in earlier partitions).
    3. rank = in-partition row number − __start + __off, all JVM-side
       (same mono-id bit layout as plans/graph_build.assign_dense_index).

    Returns df + columns __rank (0-based within group) and __n (group
    size).  localCheckpoint pins the sampled range boundaries so the
    counts job and the main job see identical partitions."""
    npart = df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(npart, *keys, value)
        .sortWithinPartitions(*keys, value)
        .select(
            F.spark_partition_id().alias("__pid"),
            F.monotonically_increasing_id().alias("__mid"),
            "*",
        )
        .localCheckpoint()
    )
    counts = ranged.groupBy("__pid", *keys).agg(F.count(F.lit(1)).alias("__cnt"))
    w_in_pid = (
        Window.partitionBy("__pid").orderBy(*keys).rowsBetween(Window.unboundedPreceding, -1)
    )
    w_in_grp = (
        Window.partitionBy(*keys).orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_grp = Window.partitionBy(*keys)
    offs = counts.select(
        "__pid",
        *keys,
        F.coalesce(F.sum("__cnt").over(w_in_pid), F.lit(0)).alias("__start"),
        F.coalesce(F.sum("__cnt").over(w_in_grp), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(w_grp).alias("__n"),
    )
    row_in_part = F.col("__mid") - F.col("__pid").cast("long") * F.lit(1 << 33)
    return (
        ranged.join(F.broadcast(offs), ["__pid", *keys])
        .withColumn("__rank", row_in_part - F.col("__start") + F.col("__off"))
        .drop("__pid", "__mid", "__start", "__off")
    )


@_register(
    "d8_median",
    "Exact median per group — the reference uses np.median for summary "
    "stats (precompute_poi_reach.py:206-207); engine computes it exactly "
    "via a parallel ranged rank, never approx, for oracle parity.",
    """
    SELECT l_returnflag, ROUND(MEDIAN(l_extendedprice), 4) AS med_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    ("aggregate", "percentile"),
)
def d8(spark, sf_dir):
    # Bracket-exact median: (1) one partial-aggregable pass computes each
    # group's count and an approx_percentile VALUE bracket around the
    # median; (2) a second pass counts rows strictly below the bracket
    # (the exact rank offset) and sorts ONLY the in-bracket values
    # (sort_array over a collect_list — a few % of the group), then picks
    # the middle rank(s) by element_at arithmetic.  Exactness: the
    # bracket only needs to CONTAIN the true middle ranks, and
    # approx_percentile's rank error is ≤ max(n/accuracy, 1) = 0.01%·n at
    # accuracy 10⁴ (exact below 10⁴ rows), far inside the ±2% bracket —
    # the values the median is computed FROM are exact order statistics.
    # Both passes are map-side-combinable aggregations: no per-group
    # reducer funnel (the previous window sort-median shuffled whole
    # groups to single tasks — its documented scale wall).  Re-measured
    # r14 (interleaved min-of-3 at sf0.1): bracket 1.42 s vs a
    # single-pass F.percentile(0.5) alternative at 1.96 s, identical
    # values — the two-pass shape wins here AND is the only one whose
    # aggregation buffer stays bounded at a 10⁹-row group (percentile's
    # buffer grows with distinct-value count).  The residual constant is
    # two serial passes over a single-row-group scan vs DuckDB's 0.046 s
    # vectorized multicore — a measured refusal, same verdict as d31.
    # At a 10⁹-row group, shrink the bracket toward ~2/accuracy so the
    # collected slice stays bounded (~2·n/accuracy values).
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").alias("p")
    )
    stats = (
        li.groupBy("l_returnflag")
        .agg(
            F.count("p").alias("n"),
            F.expr("approx_percentile(p, array(0.48D, 0.52D), 10000)").alias("b"),
        )
        .select("l_returnflag", "n", F.col("b")[0].alias("lo"), F.col("b")[1].alias("hi"))
    )
    agg = (
        li.join(F.broadcast(stats), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.first("n").alias("n"),
            F.sum((F.col("p") < F.col("lo")).cast("long")).alias("cnt_lo"),
            F.sort_array(
                F.collect_list(F.when(F.col("p").between(F.col("lo"), F.col("hi")), F.col("p")))
            ).alias("arr"),
        )
    )
    # middle ranks floor/ceil of (n+1)/2 → in-bracket 1-based positions;
    # median = their mean = percentile(0.5) interpolation = DuckDB MEDIAN
    r1 = F.floor((F.col("n") + 1) / 2) - F.col("cnt_lo")
    r2 = F.ceil((F.col("n") + 1) / 2) - F.col("cnt_lo")
    med = (
        F.element_at("arr", r1.cast("int")) + F.element_at("arr", r2.cast("int"))
    ) / 2
    return agg.select(
        "l_returnflag", F.round(med, 4).alias("med_price")
    ).orderBy("l_returnflag")


def grouped_prefix_sum_ranged(df, keys: list[str], order_col: str, measure: str, out: str = "cum"):
    """Per-group running SUM(measure) in ``order_col`` order WITHOUT a
    per-group window — the W1 running-total twin of grouped_rank_ranged,
    for the regime where one group outgrows a task (e.g. p3's packing if
    a single source dominated the corpus):

    1. range-repartition by (keys, order_col), sort within partitions;
    2. per-(partition, group) measure totals (tiny) → prefix offsets of
       earlier partitions per group;
    3. local running sum over the (partition, group) slice — bounded by
       the partition size, so every task does bounded work — plus the
       broadcast offset.

    Ties in order_col that straddle a partition boundary make the running
    total order-ambiguous exactly as they do for any non-unique sort; use
    a unique order column.  Returns df + ``out`` (inclusive running sum)."""
    npart = df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(npart, *keys, order_col)
        .sortWithinPartitions(*keys, order_col)
        .select(F.spark_partition_id().alias("__pid"), "*")
        .localCheckpoint()
    )
    part_sums = ranged.groupBy("__pid", *keys).agg(F.sum(measure).alias("__s"))
    w_prev = (
        Window.partitionBy(*keys).orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = part_sums.select(
        "__pid", *keys, F.coalesce(F.sum("__s").over(w_prev), F.lit(0)).alias("__off")
    )
    w_local = (
        Window.partitionBy("__pid", *keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.join(F.broadcast(offs), ["__pid", *keys])
        .withColumn(out, F.sum(measure).over(w_local) + F.col("__off"))
        .drop("__pid", "__off")
    )


def grouped_median_ranged(df, keys: list[str], value: str, out: str = "median"):
    """Exact per-group median on grouped_rank_ranged — the few-groups ×
    huge-table scale path for d8's operator (no per-group single-reducer
    sort).  Equivalence with the window form is pinned by
    test_grouped_median_ranged_equivalence."""
    ranked = grouped_rank_ranged(df, keys, value)
    rn = F.col("__rank") + 1  # 1-based
    mid = ranked.where(
        (rn == F.floor((F.col("__n") + 1) / 2)) | (rn == F.ceil((F.col("__n") + 1) / 2))
    )
    return mid.groupBy(*keys).agg(F.avg(value).alias(out))


# ---------------------------------------------------------------------------
# D9 rollup (reach-cube shape, §1.1)
# ---------------------------------------------------------------------------
@_register(
    "d9_rollup",
    "GROUP BY ROLLUP — grouping-set form of the reference's reach cube "
    "(precompute_poi_reach.py:168-170).  r16 floor decomposition of the "
    "driver's 18x ratio (sf0.1, warm, min-of-5): join-only 0.86 s of the "
    "1.04 s total, rollup +0.08, orderBy +0.10, against a 0.26 s session "
    "floor — the plan already has both joins BROADCAST (customer and "
    "nation build sides) and ONE hash exchange after the partial "
    "expand+aggregate, so the remainder is the floor plus the "
    "single-row-group orders scan (one task at sf0.1 regardless of "
    "config).  Refusal: nothing structural left to remove.",
    """
    SELECT n.n_name, o.o_orderpriority, COUNT(*) AS cnt
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP(n.n_name, o.o_orderpriority)
    ORDER BY n_name NULLS FIRST, o_orderpriority NULLS FIRST, cnt
    """,
    ("aggregate", "rollup"),
)
def d9(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    return (
        joined.rollup("n_name", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("n_name").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first(), "cnt")
    )


@_register(
    "d9_cube",
    "GROUP BY CUBE — all grouping-set combinations over two dims (the "
    "reach cube's full materialization shape).",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
           CAST(ROUND(SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) / 10000.0, 4) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    ("aggregate", "cube"),
)
def d9b(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"), _isum4(F.col("o_totalprice"), "total"))
        .orderBy(F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first())
    )


@_register(
    "d24_correlated_subquery",
    "Correlated subquery: orders above their customer's average order "
    "value — Catalyst decorrelates into an aggregate + self-join "
    "(SURVEY.md §4: subquery decorrelation is built-in).",
    """
    SELECT o_orderkey, o_custkey
    FROM orders o
    WHERE o_totalprice > (SELECT 1.5 * AVG(o2.o_totalprice)
                          FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    ORDER BY o_orderkey
    """,
    ("subquery", "join"),
)
def d24(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__d24_orders")
    return o.sparkSession.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM __d24_orders o
        WHERE o_totalprice > (SELECT 1.5 * AVG(o2.o_totalprice)
                              FROM __d24_orders o2 WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o_orderkey
        """
    )


@_register(
    "d25_scalar_subquery",
    "Uncorrelated scalar subquery: lineitems priced above the global "
    "average — one broadcast scalar, no per-row recompute.",
    """
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE l_extendedprice > (SELECT AVG(l_extendedprice) * 1.8 FROM lineitem)
    ORDER BY l_orderkey, l_linenumber
    """,
    ("subquery",),
)
def d25(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__d25_lineitem")
    return li.sparkSession.sql(
        """
        SELECT l_orderkey, l_linenumber
        FROM __d25_lineitem
        WHERE l_extendedprice > (SELECT AVG(l_extendedprice) * 1.8 FROM __d25_lineitem)
        ORDER BY l_orderkey, l_linenumber
        """
    )


# ---------------------------------------------------------------------------
# D10 ranking window: top-k per group (W2)
# ---------------------------------------------------------------------------
@_register(
    "d10_topk_per_group",
    "row_number() top-3 per customer — the reference's argmin-per-group "
    "(W2, snap_poi_to_nodes.py:183) generalized.",
    """
    SELECT c_custkey, o_orderkey, rn FROM (
      SELECT o_custkey AS c_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3 ORDER BY c_custkey, rn
    """,
    ("window", "topk"),
)
def d10(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(F.col("o_custkey").alias("c_custkey"), "o_orderkey", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
        .orderBy("c_custkey", "rn")
    )


@_register(
    "d10_rank_dense_ntile",
    "rank / dense_rank / ntile battery over orders per priority class — "
    "the rest of the §2.5 window surface.",
    """
    SELECT o_orderpriority, o_orderkey,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_orderpriority, rnk, o_orderkey
    """,
    ("window", "rank"),
)
def d10b(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    ).orderBy("o_orderpriority", "rnk", "o_orderkey")


# ---------------------------------------------------------------------------
# D11 running-total window (W1)
# ---------------------------------------------------------------------------
@_register(
    "d11_running_total",
    "Running sum over rows — the reference's cum_m path accumulation "
    "(test_path.py:313-330) as a window.",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run_total
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
    ("window",),
)
def d11(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey", F.round(F.sum("o_totalprice").over(w), 4).alias("run_total")
    ).orderBy("o_custkey", "o_orderkey")


@_register(
    "d11_range_frame",
    "RANGE frame window: count of same-user events in the preceding "
    "15 minutes (event-time range frame over epoch seconds).",
    """
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER (PARTITION BY user_id
                ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                RANGE BETWEEN 900 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_15m
    FROM events ORDER BY user_id, event_id
    """,
    ("window", "range-frame"),
)
def d11b(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    # unix_timestamp truncates to whole seconds; the oracle orders by
    # FLOOR(EPOCH(ts)) so frame membership agrees even for sub-second ts.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-900, Window.currentRow)
    )
    return e.select("event_id", "user_id", F.count(F.lit(1)).over(w).alias("n_15m")).orderBy(
        "user_id", "event_id"
    )


# ---------------------------------------------------------------------------
# D12 lag/lead (G5 pairing pattern)
# ---------------------------------------------------------------------------
@_register(
    "d12_lag",
    "LAG over event stream — the reference pairs consecutive path nodes "
    "the same way (G5, test_path.py:312-333).  NULLS FIRST is written out "
    "on both sides: it is Spark's default but DuckDB's is NULLS LAST, so "
    "an event with a NULL ts would otherwise shift every lag/lead in its "
    "partition (pinned by the edge-events test).",
    """
    SELECT event_id, user_id, event_type,
           LAG(event_type) OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)
    ORDER BY user_id, event_id
    """,
    ("window", "lag"),
)
def d12(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc_nulls_first(), "event_id")
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    ).orderBy("user_id", "event_id")


@_register(
    "d23_first_occurrence",
    "Dedup preserving first occurrence (ref A7 seen-set scan, "
    "extract_map_from_json.py:31-38): each user's earliest event by "
    "(ts, event_id) via a min-struct aggregate — map-side combinable, "
    "cheaper than a row_number sort-window.  Spark's struct MIN orders a "
    "NULL field first, so the oracle's rank spells NULLS FIRST explicitly "
    "(DuckDB defaults to NULLS LAST); pinned by the edge-events test.  "
    "r15 crossover adjudication (measured refusal): the events decades "
    "give Spark 0.55/1.14/1.39/1.90 s vs DuckDB 0.04/0.24/0.29/0.88 at "
    "1/10/30/100x — exponents 0.36 vs 0.63 with tail segments 0.60 vs "
    "0.92, so the gap closes ~0.3 decades/decade from 2.2x at 100x and "
    "the crossover projects ~2-3 decades beyond the sandbox lattice.  "
    "No faster Spark shape exists to switch to: the plan is already ONE "
    "partial->final aggregate (the minimum possible shuffle) and the "
    "residual is per-row struct-min constant vs DuckDB's specialized "
    "arg-min kernel; a row_number window was measured slower (the "
    "docstring's original adjudication), and the 100 TB story is "
    "unaffected — the aggregate is map-side combinable and "
    "skew-tolerant, which is what survives scale, and the per-decade "
    "trend is monotonically toward Spark.",
    """
    SELECT user_id, first_event_id, first_type FROM (
      SELECT user_id, event_id AS first_event_id, event_type AS first_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts NULLS FIRST, event_id) AS rn
      FROM events) t
    WHERE rn = 1 ORDER BY user_id
    """,
    ("dedup", "aggregate"),
)
def d23(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    best = e.groupBy("user_id").agg(
        F.min(F.struct("ts", "event_id", "event_type")).alias("b")
    )
    return best.select(
        "user_id",
        F.col("b.event_id").alias("first_event_id"),
        F.col("b.event_type").alias("first_type"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# D13 global top-k (O3)
# ---------------------------------------------------------------------------
@_register(
    "d13_topk",
    "ORDER BY ... LIMIT k — Spark plans TakeOrderedAndProject (no full "
    "sort); the reference's argsort[:500] (test_path.py:339-341).",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    ("sort", "limit"),
)
def d13(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy(F.col("o_totalprice").desc(), "o_orderkey").limit(10)


# ---------------------------------------------------------------------------
# D14 set operations (U1/U2 + declared INTERSECT/EXCEPT)
# ---------------------------------------------------------------------------
@_register(
    "d14_union",
    "UNION DISTINCT (ref U1 symmetrize, graph_construction.py:132-134).",
    """
    SELECT c_nationkey AS nk FROM customer
    UNION SELECT s_nationkey AS nk FROM supplier ORDER BY nk
    """,
    ("setop",),
)
def d14a(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct().orderBy("nk")


@_register(
    "d14_intersect",
    "INTERSECT — nation keys present on both customer and supplier sides.",
    """
    SELECT c_nationkey AS nk FROM customer
    INTERSECT SELECT s_nationkey AS nk FROM supplier ORDER BY nk
    """,
    ("setop",),
)
def d14b(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s).orderBy("nk")


@_register(
    "d14_except",
    "EXCEPT — customer nations with no high-balance supplier (supplier "
    "side filtered so the result is non-empty at every sf).",
    """
    SELECT c_nationkey AS nk FROM customer
    EXCEPT SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 5000
    ORDER BY nk
    """,
    ("setop",),
)
def d14c(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nk"))
    )
    return c.subtract(s).orderBy("nk")  # EXCEPT DISTINCT semantics


# ---------------------------------------------------------------------------
# D15 string functions (F7/F8)
# ---------------------------------------------------------------------------
@_register(
    "d15_strings",
    "LOWER/TRIM/REGEXP_REPLACE/SUBSTRING battery — the reference's tag "
    "normalizer (F8, graph_construction.py:34-35) and sanitize_key (F7, "
    "precompute_poi_reach.py:22-30).",
    """
    SELECT p_partkey,
           LOWER(TRIM(p_name)) AS name_norm,
           REGEXP_REPLACE(LOWER(p_type), '[^a-z0-9._-]+', '_', 'g') AS type_key,
           SUBSTRING(p_brand, 1, 6) AS brand6
    FROM part ORDER BY p_partkey
    """,
    ("string",),
)
def d15(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower(F.trim(F.col("p_name"))).alias("name_norm"),
        F.regexp_replace(F.lower(F.col("p_type")), "[^a-z0-9._-]+", "_").alias("type_key"),
        F.substring("p_brand", 1, 6).alias("brand6"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# D16 math/trig: haversine on the oracle (F1/F2)
# ---------------------------------------------------------------------------
_HAV_SQL = """
    SELECT p_partkey,
           ROUND(2.0 * 6371008.8 * ASIN(SQRT(LEAST(1.0, GREATEST(0.0,
               POW(SIN(RADIANS(lat2 - lat1) / 2), 2)
               + COS(RADIANS(lat1)) * COS(RADIANS(lat2))
                 * POW(SIN(RADIANS(lon2 - lon1) / 2), 2))))), 4) AS hav_m
    FROM (
      SELECT p_partkey,
             CAST(p_partkey % 360 AS DOUBLE) - 180.0 AS lon1,
             CAST(p_partkey % 170 AS DOUBLE) / 2.0 - 42.5 AS lat1,
             CAST((p_partkey * 7) % 360 AS DOUBLE) - 180.0 AS lon2,
             CAST((p_partkey * 3) % 170 AS DOUBLE) / 2.0 - 42.5 AS lat2
      FROM part) t
    ORDER BY p_partkey
    """


@_register(
    "d16_haversine",
    "Haversine (R=6371008.8, clip-guard) on synthetic coordinates — "
    "validates the F1 edge-weight formula (graph_construction.py:164-181) "
    "against the oracle.",
    _HAV_SQL,
    ("math", "geo"),
)
def d16(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    t = p.select(
        "p_partkey",
        ((pk % 360).cast("double") - 180.0).alias("lon1"),
        ((pk % 170).cast("double") / 2.0 - 42.5).alias("lat1"),
        (((pk * 7) % 360).cast("double") - 180.0).alias("lon2"),
        (((pk * 3) % 170).cast("double") / 2.0 - 42.5).alias("lat2"),
    )
    return t.select(
        "p_partkey",
        F.round(
            geo.haversine_m(F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2"), geo.R_EDGE_WEIGHTS_M), 4
        ).alias("hav_m"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# D17 conditional / sentinel battery (F10, P8)
# ---------------------------------------------------------------------------
@_register(
    "d17_conditionals",
    "CASE/LEAST/GREATEST/NULLIF/COALESCE — the reference's sentinel & guard "
    "functions (F10: isfinite/fillna/clip, poi_query.py:101, "
    "precompute_poi_reach.py:58).",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount > 0.05 THEN 'hi' ELSE 'lo' END AS disc_band,
           LEAST(l_quantity, 25.0) AS q_cap,
           GREATEST(l_tax, 0.02) AS tax_floor,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS rf
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    ("conditional",),
)
def d17(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_discount") > 0.05, "hi").otherwise("lo").alias("disc_band"),
        F.least("l_quantity", F.lit(25.0)).alias("q_cap"),
        F.greatest("l_tax", F.lit(0.02)).alias("tax_floor"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias("rf"),
    ).orderBy("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# D18 date/time (§2.7 gap coverage)
# ---------------------------------------------------------------------------
@_register(
    "d18_year_month",
    "YEAR/MONTH grouping over order dates.",
    """
    SELECT CAST(YEAR(o_orderdate) AS INT) AS y, CAST(MONTH(o_orderdate) AS INT) AS m,
           COUNT(*) AS cnt
    FROM orders GROUP BY 1, 2 ORDER BY y, m
    """,
    ("datetime", "aggregate"),
)
def d18a(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("y"), F.month("o_orderdate").cast("int").alias("m")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("y", "m")
    )


@_register(
    "d18_date_trunc",
    "date_trunc('week') buckets over the events stream table.",
    """
    SELECT STRFTIME(DATE_TRUNC('week', ts), '%Y-%m-%d') AS week_start, COUNT(*) AS cnt
    FROM events GROUP BY 1 ORDER BY week_start
    """,
    ("datetime", "aggregate"),
)
def d18b(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week_start"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("week_start")
    )


# ---------------------------------------------------------------------------
# D19 tumbling-window batch equivalent (§2.9)
# ---------------------------------------------------------------------------
@_register(
    "d19_tumbling_window",
    "15-minute tumbling buckets via epoch math — the batch-checkable twin "
    "of the Structured Streaming window() in streaming/windows.py.",
    """
    SELECT user_id, CAST(FLOOR(EPOCH(ts) / 900) AS BIGINT) AS w,
           COUNT(*) AS cnt,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(25,6))), 4) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2 ORDER BY user_id, w
    """,
    ("datetime", "window-agg", "streaming-equivalent"),
)
def d19(spark, sf_dir):
    # Constant audited r14 (interleaved min-of-3 at sf0.1, the r13
    # verdict's stretch item): full plan 0.79 s = ~0.2 s floor + ~0.3 s
    # the output ORDER BY's range exchange + ~0.3 s scan/agg.  The
    # DECIMAL(25,6) sum costs only ~0.12 s here (isum4 0.68 s, plain
    # double sum 0.67 s — identical rows on current testdata), and the
    # module discipline keeps events.value on _dsum (arbitrary-double
    # contract; _isum4 is only exact for <=4-decimal values).  The sort
    # is the declared contract.  Measured refusal: nothing left that
    # isn't floor or contract.
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.floor(F.unix_timestamp("ts") / 900).alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), _dsum(F.col("value"), "sum_value"))
        .orderBy("user_id", "w")
    )


# ---------------------------------------------------------------------------
# D20 array ops over embeddings (F13)
# ---------------------------------------------------------------------------
@_register(
    "d20_array_ops",
    "Array length + element access on array<float> embeddings (ref F13 "
    "coords[0]/coords[-1], graph_construction.py:87-89).",
    """
    SELECT vec_id, CAST(LEN(embedding) AS INT) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 4) AS e1,
           ROUND(CAST(embedding[-1] AS DOUBLE), 4) AS e_last
    FROM embeddings ORDER BY vec_id
    """,
    ("array",),
)
def d20(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("e1"),
        F.round(F.element_at("embedding", -1).cast("double"), 4).alias("e_last"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# D21 pivot / conditional aggregation (reach-cube shape)
# ---------------------------------------------------------------------------
@_register(
    "d21_pivot",
    "Conditional-agg pivot — the wide {metric}_{category} layout of the "
    "reach cube (precompute_poi_reach.py:168-170) is exactly "
    "groupBy().pivot(); spelled as portable CASE WHEN sums.",
    """
    SELECT o_custkey,
           CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(ROUND(o_totalprice * 10000) AS BIGINT) END) / 10000.0, 4) AS DOUBLE) AS total_f,
           CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(ROUND(o_totalprice * 10000) AS BIGINT) END) / 10000.0, 4) AS DOUBLE) AS total_o,
           CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(ROUND(o_totalprice * 10000) AS BIGINT) END) / 10000.0, 4) AS DOUBLE) AS total_p
    FROM orders GROUP BY o_custkey ORDER BY o_custkey
    """,
    ("pivot", "aggregate"),
)
def d21(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")

    def piv(status, alias):
        # scaled-BIGINT conditional sum (see _isum4); an all-NULL group
        # stays NULL through the descale, matching the CASE-without-ELSE
        return (
            F.round(
                F.sum(F.when(F.col("o_orderstatus") == status, _i4(F.col("o_totalprice"))))
                / 10000.0,
                4,
            ).alias(alias)
        )

    return (
        o.groupBy("o_custkey")
        .agg(piv("F", "total_f"), piv("O", "total_o"), piv("P", "total_p"))
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# D22 one Bellman-Ford relaxation round (G2 kernel)
# ---------------------------------------------------------------------------
@_register(
    "d22_graph_relax",
    "One shortest-path relaxation round = join + group-min — the exact "
    "DataFrame kernel the iterative bounded Dijkstra (plans/reach.py) "
    "repeats until the frontier drains (ref G2, "
    "precompute_poi_reach.py:86-125).  Edges synthesized from nation.",
    """
    SELECT e.src AS node_id, ROUND(MIN(s.d + e.w), 4) AS dist_m
    FROM (SELECT n_nationkey AS src, 100 + n_regionkey AS dst,
                 1.0 + CAST(n_nationkey AS DOUBLE) * 0.1 AS w FROM nation) e
    JOIN (SELECT 100 + r_regionkey AS node_id, 0.0 AS d FROM region) s
      ON e.dst = s.node_id
    GROUP BY e.src ORDER BY node_id
    """,
    ("graph", "iterative-kernel"),
)
def d22(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    edges = n.select(
        F.col("n_nationkey").alias("src"),
        (F.lit(100) + F.col("n_regionkey")).alias("dst"),
        (F.lit(1.0) + F.col("n_nationkey").cast("double") * 0.1).alias("w"),
    )
    seeds = r.select((F.lit(100) + F.col("r_regionkey")).alias("node_id"), F.lit(0.0).alias("d"))
    return (
        edges.join(F.broadcast(seeds), edges.dst == seeds.node_id)
        .groupBy(F.col("src").alias("node_id"))
        .agg(F.round(F.min(F.col("d") + F.col("w")), 4).alias("dist_m"))
        .orderBy("node_id")
    )


# ---------------------------------------------------------------------------
# D26 as-of join (time-series point-in-time lookup)
# ---------------------------------------------------------------------------
def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | tuple[str, str],
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Generic backward as-of join (Spark has no ASOF operator): every
    left row gains the ``payload_cols`` of the right row with the greatest
    ``right_time`` <= ``left_time`` within the same key (ties on time:
    greatest ``tiebreak``, defaulting to the first payload column; a NULL
    tiebreak loses to any non-NULL — i.e. oracle ``ORDER BY tb DESC NULLS
    LAST`` semantics); NULLs when no right row precedes.

    Plan: union-tag both sides, ONE hash shuffle on the key, sort within
    partitions by (time, side, tiebreak), then last-non-null over an
    unbounded-preceding frame — O(n log n) per key group and linear state,
    never the pairwise blow-up of a range join.  Equal timestamps resolve
    right-before-left, i.e. "<=" semantics.

    Left and payload column names must not collide.  Verified against
    pandas merge_asof on randomized cases (test_asof_join_matches_pandas)
    and against a DuckDB LATERAL oracle (d26)."""
    lkey, rkey = (on, on) if isinstance(on, str) else on
    tb = tiebreak or payload_cols[0]
    left_cols = [c for c in left.columns if c != lkey]
    pay_t = dict(right.dtypes)
    left_t = dict(left.dtypes)

    r = right.select(
        F.col(rkey).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(tb).alias("__tb"),
        F.struct(*payload_cols).alias("__pay"),
        *[F.lit(None).cast(left_t[c]).alias(c) for c in left_cols],
    )
    pay_struct_t = f"struct<{','.join(f'{c}:{pay_t[c]}' for c in payload_cols)}>"
    l = left.select(
        F.col(lkey).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(pay_t[tb]).alias("__tb"),
        F.lit(None).cast(pay_struct_t).alias("__pay"),
        *left_cols,
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        r.unionAll(l)
        .select(
            "__side",
            F.col("__k").alias(lkey),
            *left_cols,
            F.last("__pay", ignorenulls=True).over(w).alias("__a"),
        )
        .where(F.col("__side") == 1)
        .select(lkey, *left_cols, *[F.col(f"__a.{c}").alias(c) for c in payload_cols])
    )


@_register(
    "d26_asof_join",
    "As-of join: each event picks the most recent order of the same "
    "customer at or before the event time (ties: max orderkey).  Spark has "
    "no ASOF JOIN operator; the scalable form is union-tag both sides, one "
    "shuffle on (key), sort within partitions by (time, side), then "
    "last-non-null over an unbounded-preceding window — O(n log n) per key "
    "group, never the range-join pair explosion.",
    """
    SELECT e.event_id, e.user_id,
           x.o_orderkey AS asof_orderkey,
           ROUND(x.o_totalprice, 4) AS asof_totalprice
    FROM events e LEFT JOIN LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      ORDER BY o.o_orderdate DESC, o_orderkey DESC LIMIT 1
    ) x ON TRUE
    ORDER BY event_id
    """,
    ("join", "asof", "time-series"),
)
def d26(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    j = asof_join(
        e,
        o,
        on=("user_id", "o_custkey"),
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
    )
    return j.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("asof_orderkey"),
        F.round("o_totalprice", 4).alias("asof_totalprice"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# D27 range join (bounded time-interval join)
# ---------------------------------------------------------------------------
def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | tuple[str, str],
    left_time: str,
    right_start: str,
    right_end: str,
    max_interval_us: int,
) -> DataFrame:
    """Bounded range join (start <= t < end per key) without the pairwise
    blow-up: Spark plans a raw inequality join as BroadcastNestedLoopJoin —
    quadratic per key and non-shuffleable.  Here time is bucketed at the
    max interval width: each right interval explodes to the (<= 2, when
    its length <= the width) buckets it overlaps, each left row lives in
    exactly ONE bucket, and the join becomes an equi-join on (key, bucket)
    + exact predicate.  No dedup needed — a (left, interval) pair can meet
    in only the left row's bucket.  Fan-out is bounded by rows-per-bucket,
    the shuffle key is (key, bucket), and AQE can split hot buckets.

    Intervals longer than ``max_interval_us`` still join correctly (they
    explode to more buckets); size the width at the dominant interval
    length.  Empty/inverted intervals (end <= start) are dropped up front:
    they can never satisfy the exact predicate, and an inverted interval
    would otherwise make F.sequence step DOWNWARD and fan out to many
    spurious bucket rows before the predicate filters them.

    Join strategy is pinned to shuffle-hash on the probe side: Catalyst
    estimates the exploded side's size from its pre-explode file stats,
    so at scale it BROADCASTS a post-explode row set that can be
    arbitrarily large (measured on 30x events: broadcast plan 6.4 s and
    one-node build of a ~6M-row hashed relation, vs 2.35 s shuffled-hash
    — and at 100 TB the broadcast is an OOM, not a slowdown).  The
    probe side is the build side because it never explodes, so its
    partitions are the smaller of the two; the per-partition hash map
    holds ALL build-side rows in the partition (not one (key, bucket)
    group), so memory is bounded by rows-per-partition — tunable via
    shuffle parallelism — not by group size.  No sort is needed on
    either side (the sort-merge alternative pays two large sorts for
    nothing — the bucket groups are tiny)."""
    lkey, rkey = (on, on) if isinstance(on, str) else on
    w = int(max_interval_us)
    lb = left.hint("shuffle_hash").withColumn(
        "__b", F.expr(f"unix_micros({left_time}) div {w}")
    )
    right = right.where(F.col(right_end) > F.col(right_start))
    rb = right.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros({right_start}) div {w}"),
                F.expr(f"(unix_micros({right_end}) - 1) div {w}"),
            )
        ),
    )
    cond = (
        (lb["__b"] == rb["__b"])
        & (lb[lkey] == rb[rkey])
        & (lb[left_time] >= rb[right_start])
        & (lb[left_time] < rb[right_end])
    )
    return lb.join(rb, cond).drop("__b")


@_register(
    "d27_range_join",
    "Bounded range self-join over the event stream: pairs of same-user "
    "events within 15 minutes (earlier id first), with the whole-second "
    "gap.  Bucketed equi-join form — never a nested-loop inequality join.",
    """
    SELECT a.event_id AS a_id, b.event_id AS b_id,
           (epoch_us(b.ts) - epoch_us(a.ts)) // 1000000 AS gap_s
    FROM events a JOIN events b ON a.user_id = b.user_id
      AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 15 MINUTE
      AND a.event_id < b.event_id
    ORDER BY a_id, b_id
    """,
    ("join", "range", "time-series"),
)
def d27(spark, sf_dir):
    # Measured refusal (r14): checkpointing the projected scan once and
    # deriving both self-join sides from it wins ~20% locally (1.19 ->
    # 0.96 s at sf0.1; 5.44 -> 4.37 s at the 100x decade) — but a
    # localCheckpoint pins the whole projected corpus in the block
    # manager, which at 100 TB is an OOM, not an optimization.  Two
    # column-pruned scans of the same lake table are the shape that
    # survives scale; the slope rows (time_family_points) carry the
    # evidence that the bucketed join itself is the flat curve.
    e = _t(spark, sf_dir, "events")
    probe = e.select(F.col("event_id").alias("b_id"), "user_id", F.col("ts").alias("b_ts"))
    intervals = e.select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("a_uid"),
        F.col("ts").alias("a_ts"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTE")).alias("a_end"),
    )
    j = interval_join(
        probe,
        intervals,
        on=("user_id", "a_uid"),
        left_time="b_ts",
        right_start="a_ts",
        right_end="a_end",
        max_interval_us=15 * 60 * 1_000_000,
    )
    return (
        j.where(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.expr("(unix_micros(b_ts) - unix_micros(a_ts)) div 1000000").alias("gap_s"),
        )
        .orderBy("a_id", "b_id")
    )


# ---------------------------------------------------------------------------
# D28 sessionization (gap-based, batch form)
# ---------------------------------------------------------------------------
@_register(
    "d28_sessionize",
    "Gap-based sessionization of the event stream (batch twin of the "
    "streaming session_window): a session breaks after 20 idle minutes; "
    "lag + boundary flag + running sum assigns session ids, then one "
    "aggregate per session.  Two window passes over ONE (user, ts) sort.  "
    "Events with a NULL ts are un-sessionizable (no gap can be computed) "
    "and are excluded on both sides — pinned by the edge-events test.",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1200 * 1000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged)
    SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(25,6))), 4) AS DOUBLE) AS sum_value
    FROM sess GROUP BY user_id, sess_id ORDER BY user_id, sess_id
    """,
    ("window", "sessionize", "time-series"),
)
def d28(spark, sf_dir):
    e = _t(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 1200 * 1_000_000
    prev = F.lag(F.unix_micros("ts")).over(w)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(prev.isNull() | (F.unix_micros("ts") - prev > gap_us), 1)
        .otherwise(0)
        .alias("new_sess"),
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # note: wrun reuses the same (user, ts) partitioning+sort — the second
    # window pass is in-partition, no extra exchange
    sess = flagged.select(
        "user_id", "value", F.sum("new_sess").over(wrun).alias("sess_id")
    )
    return (
        sess.groupBy("user_id", "sess_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(25,6)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("user_id", "sess_id")
    )


# ---------------------------------------------------------------------------
# D29 semi-structured extraction (JSON column)
# ---------------------------------------------------------------------------
@_register(
    "d29_json_extract",
    "Semi-structured column: pull a typed field out of the JSON props "
    "string scan-side, aggregate per event type.  At scale the extraction "
    "runs inside codegen before the only shuffle (the groupBy).  Dirty "
    "props are data, not errors: Spark's get_json_object returns NULL for "
    "malformed JSON (the oracle mirrors that with a json_valid guard — "
    "DuckDB's extractor RAISES), and try_cast NULLs a non-numeric field "
    "value instead of failing the ANSI cast.  Pinned by the edge-events "
    "test.  r16 floor decomposition of the driver's 19.5x ratio (sf0.1, "
    "warm, min-of-5): scan-only 0.39 s ~= the 0.26 s session floor, "
    "agg+sort without JSON 0.57 s, full query 0.99 s — i.e. ~0.4 s of "
    "JSON parse executed on ONE core because the sf0.1 events parquet "
    "is a single row group (one scan task at any config; at scale the "
    "scan splits and the parse parallelizes with it).  The plan is "
    "already minimal: 2 exchanges (5-row agg + sort), extraction "
    "scan-side.  Refusal: repartitioning before the parse would add a "
    "full shuffle of the props strings to dodge a testdata artifact.",
    """
    SELECT event_type,
           CAST(SUM(TRY_CAST(CASE WHEN props IS NULL OR NOT json_valid(props) THEN NULL
                                  ELSE json_extract_string(props, '$.k') END AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    ("json", "semi-structured"),
)
def d29(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("bigint")
    return (
        e.groupBy("event_type")
        .agg(F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# D30 salted skew join — the manual form of the hot-key mitigation
# ---------------------------------------------------------------------------
# replication factor: a hot fact key is split across this many reducers
D30_SALT_R = 8


@_register(
    "d30_salted_join",
    "Skew-safe equi-join via key salting, answer-identical to the plain "
    "join (the oracle IS the plain join): the fact side gets a "
    f"deterministic salt (xxhash64(event_id) mod {D30_SALT_R}), the dim "
    f"side is replicated {D30_SALT_R}x with every salt value, and the "
    "join runs on (key, salt) — so a hot fact key's rows land on "
    f"{D30_SALT_R} reducers instead of one.  events.user_id is exactly "
    "that shape: ~67 events per user at every sf (fact multiplicity "
    "concentrated on few keys).  Why it exists when AQE skew-join is on "
    "(session.py): AQE splits skewed partitions only at runtime on "
    "sort-merge joins with materialized stats; salting is the "
    "DECLARATIVE form — it also protects the first shuffle of a "
    "streaming job or a join feeding a stateful op where AQE cannot "
    "re-plan, and its cost model is explicit (dim replicated R-fold — "
    "only correct when R * |dim| stays far below the fact side, the "
    "regime where the hot key, not the dim scan, is the bottleneck).  "
    "The join is hinted to sort-merge so the salted shape is structurally "
    "real at test scale instead of collapsing to a broadcast "
    "(plan-gated: SortMergeJoin on both user_id AND _salt, no "
    "BroadcastHashJoin).  At 100 TB the same two lines are the standard "
    "mitigation when one user/domain/url dominates the fact table.",
    """
    SELECT e.event_id, e.user_id, c.c_name
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    ORDER BY e.event_id
    """,
    ("join", "skew", "salting"),
)
def d30(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    fact = ev.withColumn(
        "_salt", F.pmod(F.xxhash64("event_id"), F.lit(D30_SALT_R)).cast("int")
    )
    dim = cust.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(D30_SALT_R)]))
    )
    joined = fact.hint("merge").join(
        dim,
        (fact["user_id"] == dim["c_custkey"]) & (fact["_salt"] == dim["_salt"]),
    )
    return joined.select("event_id", "user_id", "c_name").orderBy("event_id")


# ---------------------------------------------------------------------------
# D31 sketch aggregates with bounded-error gates (HLL + approx percentile)
# ---------------------------------------------------------------------------
D31_HLL_RSD = 0.05  # Spark approx_count_distinct relative-sd parameter
# The verdict booleans are computed from each ENGINE'S OWN sketch and then
# hash-compared across engines, so the bounds must hold for BOTH
# estimators with margin: 4 sigma of rsd=0.05 for the HLLs (tail
# probability ~6e-5 per group per engine; DuckDB's HLL typically lands
# under 1%), and 10% of the p50 value for the percentile sketches whose
# observed rank error at accuracy 10^4 / default t-digest is ~0.01%.
# A regenerated-testdata round that pushes one engine's estimate past a
# bound the other clears would surface as a driver mismatch on a correct
# engine — the margin is what makes that a ~never event.
D31_HLL_BOUND = 0.20  # accepted |approx-exact|/exact (4 sigma of rsd=0.05)
# The p50 gate is a RANK bound, not a value bound: the sketch's p50 must
# land inside the exact [p25, p75] band (rank error < 25%).  A value-
# relative bound breaks on small/discrete groups — Spark's GK sketch
# returns an ELEMENT while DuckDB's t-digest interpolates, so on an
# 8-row group the two p50 estimates legitimately differ by ~a quartile
# while both are rank-correct (caught by the edge-events fixture).
# Band endpoints are order statistics of the same exact percentile form
# both engines already agree on bit-for-bit.  Below D31_P50_MIN_N
# non-null values the gate passes trivially: sketch error bounds are
# asymptotic, and on a 2-element group an element-returning sketch
# (Spark GK) and an interpolating one (DuckDB t-digest) legitimately
# disagree about ANY interior band.
D31_P50_MIN_N = 30


@_register(
    "d31_sketch_bounds",
    "Sketch aggregates with MEASURED error gates: per event_type, exact "
    "distinct users and exact p50(value) alongside each engine's OWN "
    "HyperLogLog distinct and approx-percentile sketch, emitting only the "
    "exact values plus booleans asserting the sketch landed inside its "
    f"documented bound ({D31_HLL_BOUND:.0%} for HLL at rsd {D31_HLL_RSD}; "
    "the sketch p50 must land inside the exact interquartile band — a "
    "rank bound robust to small-group discreteness).  The sketches are "
    "the 100 TB path "
    "(one pass, bounded memory, map-side mergeable — the exact forms "
    "shuffle per-key state or sort within groups); this query is the "
    "CALIBRATION twin that keeps them honest on real data, the same "
    "measure-then-serve discipline as the ANN recall evals.  Raw sketch "
    "estimates never cross the engine boundary (Spark's HLL++ and "
    "DuckDB's HLL disagree by design) — only exact values and the "
    "in-bound verdicts, which is exactly what a drift monitor stores.",
    f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           ROUND(quantile_cont(value, 0.5), 4) AS exact_p50,
           ABS(CAST(approx_count_distinct(user_id) AS DOUBLE)
               - COUNT(DISTINCT user_id)) / GREATEST(COUNT(DISTINCT user_id), 1)
               < {D31_HLL_BOUND} AS hll_ok,
           (COUNT(value) < {D31_P50_MIN_N} OR approx_quantile(value, 0.5)
               BETWEEN quantile_cont(value, 0.25) AND quantile_cont(value, 0.75))
               AS p50_ok
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    ("aggregate", "sketch", "approx", "monitor"),
)
def d31(spark, sf_dir):
    # Plan history, all measured at sf0.1 (interleaved min-of-3, r14):
    # countDistinct in the SAME aggregate as the exact percentile forces
    # an Expand + one object-hash aggregate over 2x rows — 4.4 s.  The
    # r12 split (distinct/sketch aggregate joined back to the percentile
    # aggregate on the 5-row key) fixed that, but its up-front
    # repartition(defaultParallelism) pays a full shuffle of the scan
    # that costs MORE than the parallelism buys at this scale: split
    # with repartition 1.32-1.43 s; split without it 0.95-1.02 s.
    # Fusing the three exact percentiles into ONE
    # percentile(value, array(0.25, 0.5, 0.75)) call (one shared sort
    # buffer instead of three) cuts it again: 0.68-0.85 s — the shape
    # below.  (The r12 in-code claim of "1.4 s" was a non-interleaved
    # number; the honest interleaved figure for that plan is ~2.9 s
    # under bench load, ~1.35 s quiet — either way the repartition was
    # the regression.)  The remaining ~0.5 s over DuckDB's 0.04 s is
    # two near-floor actions on a single-row-group scan — a measured
    # refusal, not a plan gap: the split is the right 100 TB shape (the
    # percentile buffer and the HLL registers never share aggregation
    # state, and at real scale the scan parallelizes by row group with
    # no repartition needed).
    ev = _t(spark, sf_dir, "events").select("event_type", "user_id", "value")
    counts = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=D31_HLL_RSD).alias("_hll"),
    )
    pcts = ev.groupBy("event_type").agg(
        F.percentile("value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))).alias("_p"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10_000)).alias("_ap50"),
        F.count("value").alias("_nv"),
    ).select(
        "event_type",
        F.col("_p")[1].alias("_p50"),
        F.col("_p")[0].alias("_p25"),
        F.col("_p")[2].alias("_p75"),
        "_ap50",
        "_nv",
    )
    # null-safe equality: a NULL event_type group is retained by GROUP BY
    # in both engines (and by the oracle's single GROUP BY), so the
    # join-back must not silently drop it — <=> matches NULL to NULL
    # where a plain inner join would discard the row (r12 ADVICE; the
    # key is renamed on one side because both frames share ev's lineage)
    pcts = pcts.withColumnRenamed("event_type", "_et")
    agg = counts.join(pcts, F.expr("event_type <=> _et")).drop("_et")
    return agg.select(
        "event_type",
        "n_events",
        "exact_users",
        F.round(F.col("_p50"), 4).alias("exact_p50"),
        (
            # GREATEST(exact, 1): a group whose every user_id is NULL has
            # exact = 0 (both sketches also 0 -> error 0, flag true) and
            # must not divide by zero
            F.abs(F.col("_hll").cast("double") - F.col("exact_users"))
            / F.greatest(F.col("exact_users"), F.lit(1))
            < D31_HLL_BOUND
        ).alias("hll_ok"),
        (
            (F.col("_nv") < D31_P50_MIN_N)
            | F.col("_ap50").between(F.col("_p25"), F.col("_p75"))
        ).alias("p50_ok"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# D32 full outer join (completes the outer family: D2 inner, D4 left,
# D5 semi/anti — full outer is its own shuffle shape: BOTH sides
# null-extend, so no side can be the streamed/broadcast probe)
# ---------------------------------------------------------------------------
@_register(
    "d32_full_outer",
    "FULL OUTER join of two partial aggregates — per-customer order "
    "spend vs event activity, where either side may be missing (the "
    "reconciliation shape: join two independent pipelines' outputs and keep "
    "every key from both, null-extending the absent side).  Sentinels "
    "via COALESCE(-1/0) so the output is total.  Scale note: full outer "
    "cannot broadcast either side (both null-extend), so it is always a "
    "co-partitioned shuffle join — both inputs here are already "
    "aggregated to one row per key before the join, the shape that "
    "keeps the unavoidable shuffle minimal.",
    """
    WITH spend AS (
      SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders WHERE o_totalprice > 400000 GROUP BY o_custkey),
    act AS (
      SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events WHERE event_type = 'purchase' GROUP BY user_id)
    SELECT COALESCE(s.k, a.k) AS cust,
           COALESCE(s.n_orders, 0) AS n_orders,
           COALESCE(a.n_events, 0) AS n_events,
           (s.k IS NOT NULL AND a.k IS NOT NULL) AS both_sides
    FROM spend s FULL OUTER JOIN act a ON s.k = a.k
    ORDER BY cust
    """,
    ("join", "outer", "null-handling"),
)
def d32(spark, sf_dir):
    spend = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 400000)
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    act = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    j = spend.join(act, spend.k == act.k, "full_outer")
    return (
        j.select(
            F.coalesce(spend.k, act.k).alias("cust"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            (spend.k.isNotNull() & act.k.isNotNull()).alias("both_sides"),
        )
        .orderBy("cust")
    )
