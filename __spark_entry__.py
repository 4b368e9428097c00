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
    # r16 rotation.  Lead: queries whose PLAN changes this round (x9 phase-1
    # prefilter restored to the h60 key; v17/v23 stacked rank tail) plus the
    # three r15-plan-changed queries the r15 window missed (v17/v18/v22
    # recall-stack broadcasts — r15 verdict item 2).
    "x9_span_dedup",
    "x9_span_dedup_sampled",
    "x9_span_dedup_prefiltered",
    "v17_encoding_recall",
    "v23_tencoding_recall",
    "v18_ivfpq_nprobe_sweep",
    "v22_tivf_nprobe_sweep",
    "t9_unigram_logprob",
    # newest driver row is r13 — the backlog tail the r15 50-query window
    # could not reach (alphabetical)
    "d25_scalar_subquery",
    "d26_asof_join",
    "d28_sessionize",
    "d9_cube",
    "g1_grid_tiles",
    "g4_tile_assign",
    "m1_asset_meta",
    "p7_dedup_apply",
    "v10_embedding_validity",
    "v16_rivfpq_topk",
    "v19_tivf_topk",
    "v21_tivfpq_topk",
    "v29_adaptive_filtered_topk",
    "v8_embedding_clusters",
    "x1_dedup_exact",
    "x2_minhash_signature",
    "x3_minhash_lsh_pairs",
    "x3_minhash_lsh_pairs_16",
    "x4_simhash",
    "x4_simhash_64",
    "x5_ngram_jaccard",
    "x5_ngram_jaccard_capped",
    "x6_simhash_hamming",
    "x6_simhash_hamming_64",
    "x7_hamming_clusters",
    "x7_jaccard_clusters",
    "x8_decontaminate",
    # newest driver row is r14 — fill the 50-query window (alphabetical;
    # the tail past the window leads the next rotation)
    "d10_rank_dense_ntile",
    "d11_running_total",
    "d1_scan_filter",
    "d27_range_join",
    "d2_inner_join",
    "d30_salted_join",
    "d31_sketch_bounds",
    "d32_full_outer",
    "d3_dim_chain_join",
    "d4_left_outer",
    "d5_anti_join",
    "d5_semi_join",
    "d6_groupby_agg",
    "d7_count_distinct",
    "d8_median",
    "d9_rollup",
    "g5_tile_occupancy",
    "g6_zorder_layout",
    "p2_hash_split",
    "p3_pack_sequences",
    "p5_chunk_dedup",
    "p9_temperature_mix",
    "t10_gopher_rules",
    "t11_bpe_pretoken_count",
    "t12_winnowing_fingerprint",
    "t8_length_quantiles",
    "v11_pq_topk",
    "v13_ivfpq_topk",
    "v15_dedup_apply",
    "v1_cosine_topk",
    "v25_serving_tivf_topk",
    "v26_serving_ivfpq_topk",
    "v27_filtered_tivf_topk",
    "v3_embedding_near_dup",
    "v5_ivf_topk",
    "v6_lsh_recall",
    "x10_link_pagerank",
    "x7_near_dup_clusters",
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
