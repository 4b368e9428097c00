"""The ANN serving DEFAULT is the trained quantizer (r10 verdict item 2).

v20/v21 measured the trained spherical-k-means cells strictly better
than the seed cells at identical query cost (membership recall
0.35 -> 0.51, composed IVFADC recall@5 0.27 -> 0.38), so every serving
surface — the batch dispatch helpers, the codes-only streaming index
builder, the streaming ANN tier's cells/centroids — defaults to the
trained layout.  These tests pin that default to the declared queries
v19/v21 so a silent flip back to seed cells (or a drift between the
dispatch table and the registry) fails loudly.  The seed-cell queries
(v5/v13) stay registered as calibration baselines with unchanged
oracles; tests that want them must name quantizer="seed" explicitly.
"""

from __future__ import annotations

from fifteenmc_spark import serving
from fifteenmc_spark.operators.relational import QUERIES
from fifteenmc_spark.operators.similarity import (
    IVF_SEED_IDS,
    N_PROBE,
    _emb,
    _ivf_cells_probes,
    _tivf_cells_probes,
)
from fifteenmc_spark.streaming.pq_ann import build_pq_serving_index


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_serving_default_is_trained():
    assert serving.DEFAULT_QUANTIZER == "trained"


def test_ann_topk_default_pins_to_v19(spark, sf_small):
    got = _rows(serving.ann_topk(spark, sf_small))
    assert got and got == _rows(QUERIES["v19_tivf_topk"].build(spark, sf_small))


def test_ivfpq_topk_default_pins_to_v21(spark, sf_small):
    got = _rows(serving.ivfpq_topk(spark, sf_small))
    assert got and got == _rows(QUERIES["v21_tivfpq_topk"].build(spark, sf_small))


def test_serving_centroids_are_the_trained_table_not_the_seeds(spark, sf_small):
    cents = dict(serving.serving_centroids(spark, sf_small))
    assert sorted(cents) == sorted(IVF_SEED_IDS)  # seed-initialized cids
    seeds = {
        r["vec_id"]: list(r["embedding"])
        for r in _emb(spark, sf_small)
        .where(_emb(spark, sf_small)["vec_id"].isin(*IVF_SEED_IDS))
        .collect()
    }
    # Lloyd training moved at least one centroid off its seed vector —
    # the default really serves the TRAINED table
    assert any(cents[c] != seeds[c] for c in cents)


def test_serving_cells_probes_default_equals_trained_index(spark, sf_small):
    _, dcells, dprobes = serving.serving_cells_probes(spark, sf_small, N_PROBE)
    _, tcells, tprobes = _tivf_cells_probes(spark, sf_small, N_PROBE)
    assert _rows(dcells) == _rows(tcells)
    assert _rows(dprobes) == _rows(tprobes)


def test_pq_serving_index_default_is_the_trained_layout(spark, sf_small):
    dstatic, _ = build_pq_serving_index(spark, sf_small, N_PROBE)
    tstatic, _ = build_pq_serving_index(spark, sf_small, N_PROBE, quantizer="trained")
    assert _rows(dstatic.select("vec_id", "cell")) == _rows(tstatic.select("vec_id", "cell"))
    # and the dispatch is real: the explicit seed layout assigns at
    # least one vector to a different cell on this corpus
    sstatic, _ = build_pq_serving_index(spark, sf_small, N_PROBE, quantizer="seed")
    _rows_seed = _rows(sstatic.select("vec_id", "cell"))
    assert _rows_seed != _rows(dstatic.select("vec_id", "cell"))


def test_seed_cells_remain_the_calibration_baseline(spark, sf_small):
    # flipping the default did NOT change the seed index or its queries:
    # the explicit seed layout still equals v5's cell table
    _, scells, _ = _ivf_cells_probes(spark, sf_small, N_PROBE)
    sstatic, _ = build_pq_serving_index(spark, sf_small, N_PROBE, quantizer="seed")
    assert _rows(sstatic.select("vec_id", "cell")) == _rows(scells)
