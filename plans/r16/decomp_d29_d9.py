"""Floor decomposition for d29_json_extract and d9_rollup (r15 verdict
item 8): time each query's components in one warm session so the ratio
can be attributed (floor / scan / expression / shuffle / sort) before
deciding whether any code change is warranted.  Noop-sink timings,
best-of-N after one warm pass.

Usage: python plans/r16/decomp_d29_d9.py [n_samples]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import functions as F  # noqa: E402

from fifteenmc_spark.io import read_table  # noqa: E402
from fifteenmc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def timed(label, build, spark, out):
    build(spark).write.format("noop").mode("overwrite").save()  # warm
    samples = []
    for i in range(N):
        spark.sparkContext.setJobDescription(f"{label} #{i}")
        t0 = time.perf_counter()
        build(spark).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    med = sorted(samples)[len(samples) // 2]
    out.append((label, min(samples), med))
    print(f"{label:44s} min={min(samples):.3f} med={med:.3f}")


def main() -> None:
    spark = get_spark(app_name="decomp-d29-d9")
    out = []

    # session floor
    par = spark.sparkContext.defaultParallelism
    timed("floor: 32-part noop", lambda s: s.range(par).repartition(par), spark, out)

    # ---- d29_json_extract components ----
    ev = lambda s: read_table(s, SF_DIR, "events")  # noqa: E731
    timed("d29 a: events scan only (props,event_type)", lambda s: ev(s).select("event_type", "props"), spark, out)
    timed(
        "d29 b: scan + get_json_object + try_cast",
        lambda s: ev(s).select(
            "event_type", F.get_json_object("props", "$.k").try_cast("bigint").alias("k")
        ),
        spark,
        out,
    )
    timed(
        "d29 c: groupBy agg WITHOUT json (count+sum value)",
        lambda s: ev(s)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type"),
        spark,
        out,
    )
    timed(
        "d29 d: full query",
        lambda s: ev(s)
        .groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").try_cast("bigint")).alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type"),
        spark,
        out,
    )

    # ---- d9_rollup components ----
    def joined(s):
        o = read_table(s, SF_DIR, "orders")
        c = read_table(s, SF_DIR, "customer")
        n = read_table(s, SF_DIR, "nation")
        return o.join(c, o.o_custkey == c.c_custkey).join(
            F.broadcast(n), c.c_nationkey == n.n_nationkey
        )

    timed(
        "d9 a: o JOIN c JOIN n only (project keys)",
        lambda s: joined(s).select("n_name", "o_orderpriority"),
        spark,
        out,
    )
    timed(
        "d9 b: join + flat groupBy (no rollup, no sort)",
        lambda s: joined(s).groupBy("n_name", "o_orderpriority").agg(F.count(F.lit(1)).alias("cnt")),
        spark,
        out,
    )
    timed(
        "d9 c: join + rollup (no sort)",
        lambda s: joined(s).rollup("n_name", "o_orderpriority").agg(F.count(F.lit(1)).alias("cnt")),
        spark,
        out,
    )
    timed(
        "d9 d: full query (rollup + orderBy)",
        lambda s: joined(s)
        .rollup("n_name", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(
            F.col("n_name").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
            "cnt",
        ),
        spark,
        out,
    )


if __name__ == "__main__":
    main()
