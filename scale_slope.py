"""Scale-slope measurement: the six heaviest query families timed at two
scale factors (10x data apart) on BOTH engines, reporting the power-law
exponent b in t ~ (rows)^b — the measured evidence that the plans scale,
where the per-round bench (one SF, floor-dominated) can only argue it.

b = log(t_hi / t_lo) / log(10).  Reading guide:
- b ≈ 1: linear scaling (what a one-pass scan+shuffle plan should show).
- b < 1: the lower-SF time is floor/constant-dominated (scheduler floor,
  codebook/index builds whose cost is SF-independent) — scaling headroom,
  not a defect.  The Spark action floor is recorded alongside so this is
  readable.
- b > 1.1: superlinear — flagged in the output; a candidate-pair or
  window stage growing faster than the corpus.

Methodology matches bench.py: warm tables + Python worker fleet first,
median-of-$BENCH_RUNS (default 3) through a noop sink (Spark) /
fetchall (DuckDB), warm-session index semantics.  Writes
SCALE_SLOPE.json and prints one compact JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import fifteenmc_spark.operators  # noqa: F401  (registers all query modules)
from fifteenmc_spark.io import TABLES, read_table
from fifteenmc_spark.operators.relational import QUERIES
from fifteenmc_spark.session import get_spark

# the six heaviest families by the r9 bench, per the r9 verdict (Next #5),
# plus the r10-new heavy evals (two composed plans / fused sweep / trained
# composition)
SLOPE_QUERIES = (
    "x5_ngram_jaccard",
    "x9_span_dedup",
    "v1_cosine_topk",
    "v11_pq_topk",
    "v13_ivfpq_topk",
    "t9_unigram_logprob",
    "v17_encoding_recall",
    "v18_ivfpq_nprobe_sweep",
    "v21_tivfpq_topk",
)
SF_LO = os.environ.get("SLOPE_SF_LO", "/root/testdata/sf0.01")
SF_HI = os.environ.get("SLOPE_SF_HI", "/root/testdata/sf0.1")
SUPERLINEAR = 1.1


def _median(xs):
    import statistics

    return float(statistics.median(xs))


def _warm(spark, sf_dir):
    for t in TABLES:
        read_table(spark, sf_dir, t).count()
    par = spark.sparkContext.defaultParallelism

    def _identity(batches):
        yield from batches

    spark.range(par * 4).repartition(par).mapInPandas(_identity, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    floor = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(par).repartition(par).write.format("noop").mode("overwrite").save()
        floor = min(floor, time.perf_counter() - t0)
    return floor


def main() -> None:
    import duckdb

    runs = int(os.environ.get("BENCH_RUNS", "3"))
    spark = get_spark(app_name="fifteenmc-scale-slope")
    out: dict = {"metric": "scale_slope", "sf_lo": SF_LO, "sf_hi": SF_HI, "queries": {}}
    times: dict[str, dict[str, float]] = {}

    for sf_dir in (SF_LO, SF_HI):
        floor = _warm(spark, sf_dir)
        out[f"action_floor_s@{sf_dir.rsplit('sf', 1)[-1]}"] = round(floor, 4)
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in SLOPE_QUERIES:
            q = QUERIES[name]
            s_samples, d_samples = [], []
            for _ in range(runs):
                t0 = time.perf_counter()
                q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
                s_samples.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                con.execute(q.oracle).fetchall()
                d_samples.append(time.perf_counter() - t0)
            times.setdefault(name, {})[f"spark@{sf_dir}"] = _median(s_samples)
            times[name][f"duck@{sf_dir}"] = _median(d_samples)

    superlinear = []
    for name in SLOPE_QUERIES:
        s_lo, s_hi = times[name][f"spark@{SF_LO}"], times[name][f"spark@{SF_HI}"]
        d_lo, d_hi = times[name][f"duck@{SF_LO}"], times[name][f"duck@{SF_HI}"]
        bs = math.log(s_hi / s_lo) / math.log(10)
        bd = math.log(d_hi / d_lo) / math.log(10)
        out["queries"][name] = {
            "spark_s": [round(s_lo, 4), round(s_hi, 4)],
            "duckdb_s": [round(d_lo, 4), round(d_hi, 4)],
            "spark_exponent": round(bs, 3),
            "duckdb_exponent": round(bd, 3),
        }
        if bs > SUPERLINEAR:
            superlinear.append(name)
    out["superlinear_spark"] = superlinear

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALE_SLOPE.json"), "w") as f:
        json.dump(out, f, indent=1)
    compact = {
        "metric": "scale_slope",
        "spark_exponents": {k: v["spark_exponent"] for k, v in out["queries"].items()},
        "duckdb_exponents": {k: v["duckdb_exponent"] for k, v in out["queries"].items()},
        "superlinear_spark": superlinear,
    }
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
