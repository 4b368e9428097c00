"""Skew-salting helpers and bucketed co-located joins — the shuffle-side
scale toolkit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fifteenmc_spark.functions import skew


def test_salted_aggregate_matches_plain(spark):
    # heavily skewed: 90% of rows share one key
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(F.concat(F.lit("k"), F.col("id") % 7)).alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    got = skew.salted_aggregate(
        df,
        ["k"],
        aggs=[F.count(F.lit(1)).alias("c"), F.sum("v").alias("s")],
        finals=[F.sum("c").alias("cnt"), F.sum("s").alias("sum_v")],
    )
    want = df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sum_v"))
    a = {r["k"]: (r["cnt"], r["sum_v"]) for r in got.collect()}
    b = {r["k"]: (r["cnt"], r["sum_v"]) for r in want.collect()}
    assert a == b


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain(spark, how):
    big = spark.range(5_000).select(
        F.when(F.col("id") % 5 < 4, 0).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("row_id"),
    )
    small = spark.range(40).select(F.col("id").alias("k"), (F.col("id") * 10).alias("dim"))
    got = skew.salted_join(big, small, ["k"], how=how).orderBy("row_id")
    want = big.join(small, ["k"], how).orderBy("row_id")
    assert got.count() == want.count()
    assert [tuple(r) for r in got.select("k", "row_id", "dim").collect()] == [
        tuple(r) for r in want.select("k", "row_id", "dim").collect()
    ]


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key co-locates matching rows at
    WRITE time: the join plan has no Exchange on either side — at 100 TB
    this is how repeated fact⋈fact joins amortize their shuffle."""
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = spark.range(1000).select(F.col("id").alias("o_orderkey"), (F.col("id") % 97).alias("o_x"))
    li = spark.range(4000).select((F.col("id") % 1000).alias("l_orderkey"), F.col("id").alias("l_y"))
    # external tables: warehouse dir is a static conf, so point each table
    # at an explicit tmp path instead
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").option(
        "path", str(tmp_path / "b_orders")
    ).saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").option(
        "path", str(tmp_path / "b_lineitem")
    ).saveAsTable("b_lineitem")

    # disable broadcast so the join must pick a shuffle strategy — with
    # bucketed inputs it becomes a SortMergeJoin over the bucket files
    # with NO shuffle exchange on either side
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(
            spark.table("b_lineitem"), F.col("o_orderkey") == F.col("l_orderkey")
        )
        plan = j._sc._jvm.PythonSQLUtils.explainString(j._jdf.queryExecution(), "formatted")
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert j.count() == 4000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salt_spreads_identical_rows(spark):
    # the hot-key worst case: byte-identical rows.  A content-hash salt
    # sends them all to ONE salt value (the round-1 bug); the per-row salt
    # must spread them across (nearly) all salt values.
    n_salts = 16
    dup = spark.range(10_000).select(F.lit("hot").alias("k"), F.lit(1.0).alias("v"))
    counts = (
        skew.with_salt(dup, n_salts=n_salts)
        .groupBy("__salt")
        .count()
        .collect()
    )
    assert len(counts) == n_salts
    assert max(r["count"] for r in counts) < 10_000 * 2 / n_salts
