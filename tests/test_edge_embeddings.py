"""Edge-embeddings hardening: the similarity surface vs its DuckDB oracles
on a corpus of pathological vectors — NULL embedding, empty array, zero
vector, wrong dimension, NULL element, huge-magnitude values, an exact
duplicate.

Before the valid_embeddings gate, a zero vector crashed every cosine query
(ANSI divide-by-zero), a NULL embedding crashed the DuckDB oracles
(list_dot_product raises rather than returning NULL), and wrong-dim rows
NULLed the LSH signatures.  The gate (right dim, no NULL elements, finite
positive norm) is applied once in _emb and mirrored into every oracle;
v10 is the ungated monitor that reports exactly what the gate excludes.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fifteenmc_spark.operators.relational import QUERIES
from fifteenmc_spark.operators.similarity import EMB_DIM

from .oracle_util import compare

V_QUERIES = [
    "v1_cosine_topk",
    "v2_lsh_bucket",
    "v2_lsh_bucket_16",
    "v3_embedding_near_dup",
    "v4_embedding_stats",
    "v5_ivf_topk",
    "v6_lsh_recall",
    "v7_lsh_banded_near_dup",
    "v8_embedding_clusters",
    "v9_ivf_recall",
    "v10_embedding_validity",
    "v11_pq_topk",
    "v12_pq_recall",
    "v13_ivfpq_topk",
    "v14_ivfpq_recall",
    "v15_dedup_apply",
    # r10 family: residual IVFADC (residual codewords stay normal-scale
    # even with the 1e30 vector in-corpus — rc6/crosstab are codeword-
    # side), encoding/nprobe/quantizer evals (the huge vector becomes an
    # eval QUERY at V12_NQ=50 > corpus size — the unit-normalized query
    # side must stay scale-free), trained quantizer (only one IVF seed id
    # exists in this corpus, so training runs single-cell)
    "v16_rivfpq_topk",
    "v17_encoding_recall",
    "v18_ivfpq_nprobe_sweep",
    "v19_tivf_topk",
    "v20_tivf_recall",
    "v21_tivfpq_topk",
    "v22_tivf_nprobe_sweep",
    "v23_tencoding_recall",
    "v24_ncells_sweep",
    # r12/r13: the serving layout as declared queries — on this corpus
    # only the pool ids < 27 exist, so the serving layout degrades to
    # however many seeds survive, identically on both engines
    "v25_serving_tivf_topk",
    "v26_serving_ivfpq_topk",
    # r12: filtered search — the label predicate must compose with the
    # validity gate (the NULL/zero/wrong-dim vectors carry labels too and
    # must be excluded BEFORE the label match on both engines)
    "v27_filtered_tivf_topk",
    "v28_filtered_recall",
    # r13: the per-predicate probe dispatch — tiny label slices clamp the
    # budget rule at ncells (and a 1-member slice exercises the
    # GREATEST(cnt-1, 1) guard) identically on both engines
    "v29_adaptive_filtered_topk",
]


@pytest.fixture(scope="module")
def edge_emb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_emb_sf")
    rng = np.random.default_rng(7)
    rows = []
    for i in range(20):
        rows.append((i, rng.normal(size=EMB_DIM).astype("float32").tolist(), i % 3))
    rows.append((20, [0.0] * EMB_DIM, 0))  # zero vector → zero norm
    rows.append((21, None, 1))  # NULL embedding
    rows.append((22, [], 2))  # empty array
    rows.append((23, rows[0][1], 0))  # exact duplicate of vec 0
    rows.append((24, [1e30] * EMB_DIM, 1))  # huge but double-finite
    nulled = rows[1][1][:]
    nulled[5] = None
    rows.append((25, nulled, 2))  # NULL element
    rows.append((26, rng.normal(size=EMB_DIM // 2).astype("float32").tolist(), 0))  # wrong dim
    tb = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(tb, str(d / "embeddings.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_emb_oracle(edge_emb_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{edge_emb_dir}/embeddings.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", V_QUERIES)
def test_edge_embeddings_match_oracle(name, spark, edge_emb_dir, edge_emb_oracle):
    q = QUERIES[name]
    sdf = q.build(spark, edge_emb_dir)
    pdf = edge_emb_oracle.execute(q.oracle).fetchdf()
    compare(sdf, pdf, f"edge-emb:{name}")


def test_v10_reports_every_gate_category(spark, edge_emb_dir):
    """The monitor sees the raw table and each violation class lands in its
    own counter; the fixture plants exactly one of each."""
    totals = (
        QUERIES["v10_embedding_validity"]
        .build(spark, edge_emb_dir)
        .groupBy()
        .sum("n_total", "n_null", "n_wrong_dim", "n_null_elem", "n_bad_norm", "n_valid")
        .collect()[0]
    )
    n_total, n_null, n_dim, n_elem, n_norm, n_valid = totals
    assert (n_null, n_elem, n_norm) == (1, 1, 1)
    assert n_dim == 2  # the empty array and the half-width vector
    assert n_valid == n_total - 5
