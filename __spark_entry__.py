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
    # r15 rotation — the 20 queries whose newest driver row is r12 lead
    # (r14 verdict item 3: no query's newest row should age past two
    # rounds), then the queries whose PLAN or measurement changes this
    # round (x9 constant attack, batch-snap antimeridian mirror keys,
    # d23/g3 crossover work), then the r13-green backlog; with a
    # 50-query window the tail spills to lead r16.
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
    # plans touched or re-measured in r15 — re-attest before the backlog
    # (build half: x9 rework, seam snap, d23/g3 adjudications; optimization
    # half: x9 phase-1 fusion, mapInPandas column pruning, recall-stack
    # broadcasts)
    "x9_span_dedup",
    "x9_span_dedup_sampled",
    "x9_span_dedup_prefiltered",
    "g2_knn_snap",
    "g3_bounded_reach",
    "d23_first_occurrence",
    "m2_feature_extract",
    "m3_frame_sample",
    "v9_ivf_recall",
    "v12_pq_recall",
    "v14_ivfpq_recall",
    "v20_tivf_recall",
    "v23_tencoding_recall",
    "v24_ncells_sweep",
    "v28_filtered_recall",
    # newest driver row is r13 — rotate back through (alphabetical; the
    # tail past the 50-query window leads r16)
    "d10_topk_per_group",
    "d13_topk",
    "d14_except",
    "d14_intersect",
    "d14_union",
    "d15_strings",
    "d16_haversine",
    "d17_conditionals",
    "d18_date_trunc",
    "d18_year_month",
    "d19_tumbling_window",
    "d20_array_ops",
    "d21_pivot",
    "d22_graph_relax",
    "d24_correlated_subquery",
    "d25_scalar_subquery",
    "d26_asof_join",
    "d28_sessionize",
    "d9_cube",
    "g1_grid_tiles",
    "g4_tile_assign",
    "m1_asset_meta",
    "m2_feature_extract",
    "p7_dedup_apply",
    "v10_embedding_validity",
    "v16_rivfpq_topk",
    "v17_encoding_recall",
    "v18_ivfpq_nprobe_sweep",
    "v19_tivf_topk",
    "v20_tivf_recall",
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
