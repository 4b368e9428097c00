"""m3/m4 Arrow-boundary A/B at LOW parallelism (r15 verdict item 7):
m3_frame_sample was the slowest query in the driver's 8-core run
(4.36 s).  Measures spark.sql.execution.arrow.maxRecordsPerBatch
(session default vs smaller/larger) on m3 and m4 in an 8-core session,
alternating samples.  Run with SPARK_GRAFT_CPUS=8.

maxRecordsPerBatch is a session conf read at execution time, so it can
be flipped between runs inside one session — same JVM, same warm
Python workers, honest A/B.

Usage: SPARK_GRAFT_CPUS=8 python plans/r16/ab_m3_arrow_batch.py [n_samples]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from fifteenmc_spark.operators.relational import QUERIES  # noqa: E402
import fifteenmc_spark.operators  # noqa: E402,F401
from fifteenmc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(sys.argv[1]) if len(sys.argv) > 1 else 5
BATCH_SIZES = [1000, 10000, 40000]  # default is 10000


def timed(spark, name) -> float:
    t0 = time.perf_counter()
    QUERIES[name].build(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark(app_name="ab-m3-arrow")
    print("cores:", spark.sparkContext.defaultParallelism)
    for name in ("m3_frame_sample", "m4_frame_dedup", "m2_feature_extract"):
        timed(spark, name)  # warm (workers, feeds, codegen)
        results = {b: [] for b in BATCH_SIZES}
        for i in range(N):
            for b in BATCH_SIZES:
                spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(b))
                spark.sparkContext.setJobDescription(f"{name} batch={b} #{i}")
                results[b].append(timed(spark, name))
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        spark.sparkContext.setJobDescription(None)
        for b in BATCH_SIZES:
            xs = results[b]
            med = sorted(xs)[len(xs) // 2]
            print(
                f"{name:20s} batch={b:6d}: min={min(xs):.3f} med={med:.3f} all={[round(x,3) for x in xs]}"
            )


if __name__ == "__main__":
    main()
