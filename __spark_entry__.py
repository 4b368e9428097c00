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
# query accumulates at least one driver-checked green row across rounds.
_CHECK_FIRST = (
    # r14 rotation — the 19 queries whose newest driver row is r11 lead
    # (r13 verdict item 3: no query's newest row should age past two
    # rounds), then the queries whose PLAN or measurement changed this
    # round (d31 aggregate rework, d27 shuffle-hash pin, d8 re-measure),
    # then the r12-green backlog; with a 50-query window the tail spills
    # to lead r15.
    "m3_frame_sample",
    "v1_cosine_topk",
    "v3_embedding_near_dup",
    "v5_ivf_topk",
    "v6_lsh_recall",
    "v9_ivf_recall",
    "v11_pq_topk",
    "v12_pq_recall",
    "v13_ivfpq_topk",
    "v14_ivfpq_recall",
    "v22_tivf_nprobe_sweep",
    "v23_tencoding_recall",
    "v24_ncells_sweep",
    "v15_dedup_apply",
    "p2_hash_split",
    "p3_pack_sequences",
    "p5_chunk_dedup",
    "t8_length_quantiles",
    "t9_unigram_logprob",
    # changed in r14 — re-attest before the backlog
    "d31_sketch_bounds",
    "d27_range_join",
    "d8_median",
    # newest driver row is r12 — rotate back through
    "x7_near_dup_clusters",
    "x9_span_dedup",
    "x9_span_dedup_sampled",
    "x9_span_dedup_prefiltered",
    "g5_tile_occupancy",
    "v25_serving_tivf_topk",
    "v26_serving_ivfpq_topk",
    "g6_zorder_layout",
    "d30_salted_join",
    "t10_gopher_rules",
    "p9_temperature_mix",
    "x10_link_pagerank",
    "v27_filtered_tivf_topk",
    "t11_bpe_pretoken_count",
    "t12_winnowing_fingerprint",
    "v28_filtered_recall",
    "d32_full_outer",
    "d1_scan_filter",
    "d2_inner_join",
    "d3_dim_chain_join",
    "d4_left_outer",
    "d5_semi_join",
    "d5_anti_join",
    "d6_groupby_agg",
    "d7_count_distinct",
    "d9_rollup",
    "d10_rank_dense_ntile",
    "d11_running_total",
    "d11_range_frame",
    "d12_lag",
    "d29_json_extract",
    "m4_frame_dedup",
    "m5_image_meta",
    "p1_corpus_prep",
    "p4_stratified_sample",
    "p6_pii_scrub",
    "p8_domain_mix",
    "t1_token_count",
    "t2_quality_score",
    "t3_lang_id",
    "t4_fingerprint",
    "t5_corpus_stats",
    "t6_vocab_topk",
    "t7_repetition",
    "v2_lsh_bucket",
    "v2_lsh_bucket_16",
    "v4_embedding_stats",
    "v7_lsh_banded_near_dup",
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
