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
    # r13 rotation — the 18 queries whose newest driver row is r10 lead
    # (verdict r12 item 2), then queries new in r13 (never checked), then
    # the 50 whose newest row is r11; with a 50-query window the tail
    # spills to lead r14.
    "x1_dedup_exact",
    "x2_minhash_signature",
    "x3_minhash_lsh_pairs",
    "x3_minhash_lsh_pairs_16",
    "x4_simhash_64",
    "x6_simhash_hamming_64",
    "x5_ngram_jaccard",
    "x7_hamming_clusters",
    "x7_jaccard_clusters",
    "x8_decontaminate",
    "v8_embedding_clusters",
    "v10_embedding_validity",
    "v16_rivfpq_topk",
    "v17_encoding_recall",
    "v18_ivfpq_nprobe_sweep",
    "v19_tivf_topk",
    "v20_tivf_recall",
    "v21_tivfpq_topk",
    # new in r13 — never driver-checked
    "v29_adaptive_filtered_topk",
    # newest driver row is r11 — rotate back through
    "d9_cube",
    "d24_correlated_subquery",
    "d25_scalar_subquery",
    "d10_topk_per_group",
    "d23_first_occurrence",
    "d13_topk",
    "d14_union",
    "d14_intersect",
    "d14_except",
    "d15_strings",
    "d16_haversine",
    "d17_conditionals",
    "d18_year_month",
    "d18_date_trunc",
    "d19_tumbling_window",
    "d20_array_ops",
    "d21_pivot",
    "d22_graph_relax",
    "d26_asof_join",
    "d27_range_join",
    "d28_sessionize",
    "x4_simhash",
    "x6_simhash_hamming",
    "x5_ngram_jaccard_capped",
    "p7_dedup_apply",
    "g1_grid_tiles",
    "g2_knn_snap",
    "g3_bounded_reach",
    "g4_tile_assign",
    "m1_asset_meta",
    "m2_feature_extract",
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
