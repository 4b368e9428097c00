"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``fifteenmc_spark`` package; this module just
exposes its declared-query registry (SURVEY.md §2.11 and the training-data
pipeline operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import fifteenmc_spark.operators  # noqa: E402,F401  (registers all query modules)
from fifteenmc_spark.operators.relational import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H-Q1-shaped aggregation (d6) on sf0.001."""
    return QUERIES["d6_groupby_agg"].build(spark, "/root/testdata/sf0.001")


# The driver checks a bounded window of queries per round (50 in r02).
# Queries with no driver CORRECTNESS row yet come first so every declared
# query accumulates at least one driver-checked green row across rounds:
# r8 rotation — all 34 queries with no r7 driver row (green in earlier
# windows + the judge's in-session pytest oracle over all 84 entries).
# The r8 session-index refactor touched the v-family, the x7/p7 cluster
# consumers, and the x3/x5/x6 pair generators — all inside this set or
# re-listed after it, so every touched query gets a fresh driver row.
_CHECK_FIRST = (
    # v-family: session index + _emb dispatch landed in r8
    "v3_embedding_near_dup",
    "v5_ivf_topk",
    "v6_lsh_recall",
    "v9_ivf_recall",
    "v7_lsh_banded_near_dup",
    "v8_embedding_clusters",
    "v2_lsh_bucket_16",
    "v4_embedding_stats",
    "v10_embedding_validity",
    # cluster consumers: cached pair graphs + fused convergence probe in r8
    "x7_hamming_clusters",
    "x5_ngram_jaccard_capped",
    "x6_simhash_hamming_64",
    "x3_minhash_lsh_pairs",
    "x3_minhash_lsh_pairs_16",
    "x8_decontaminate",
    "x1_dedup_exact",
    "x2_minhash_signature",
    "x4_simhash_64",
    "m4_frame_dedup",
    # remaining unwindowed (untouched since their last green row)
    "d10_rank_dense_ntile",
    "d11_running_total",
    "d11_range_frame",
    "d12_lag",
    "d29_json_extract",
    "t1_token_count",
    "t2_quality_score",
    "t3_lang_id",
    "t4_fingerprint",
    "t5_corpus_stats",
    "t6_vocab_topk",
    "t7_repetition",
    "p1_corpus_prep",
    "p4_stratified_sample",
    "p6_pii_scrub",
    # r8-touched queries that DID have an r7 row — re-check after the change
    "x7_near_dup_clusters",
    "x7_jaccard_clusters",
    "p7_dedup_apply",
    "v1_cosine_topk",
    "v2_lsh_bucket",
    "x5_ngram_jaccard",
)


def _ordered() -> dict:
    out = {n: QUERIES[n] for n in _CHECK_FIRST if n in QUERIES}
    out.update(QUERIES)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.build for name, q in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted entries get a
    weaker rows-only check)."""
    return {name: q.oracle for name, q in _ordered().items() if q.oracle is not None}
