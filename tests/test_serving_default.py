"""The ANN serving DEFAULT is the trained quantizer at the SERVING layout
(r10 verdict item 2, r11 verdict item 2).

v20/v21 measured the trained spherical-k-means cells strictly better
than the seed cells at identical query cost (membership recall
0.35 -> 0.51, composed IVFADC recall@5 0.27 -> 0.38) — that flipped the
default quantizer in r11.  v24 then measured the ncells axis at CONSTANT
scan fraction (nprobe = ncells/4, every point reads 25% of the index):
membership recall 0.500 -> 0.520 (sf0.01) and 0.448 -> 0.572 (sf0.001)
moving 8 -> 16 cells, and the composed v21-shape check agreed
(recall@5 0.380 -> 0.408 and 0.332 -> 0.400) — that flips the serving
LAYOUT to 16 cells in r12.  These tests pin every serving surface to
that layout and gate the flip with strictly-no-worse recall asserts, so
a silent drift back (or a layout change that loses recall) fails loudly.
The 8-cell queries (v19/v21) and seed-cell queries (v5/v13) stay
registered as calibration baselines with unchanged oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fifteenmc_spark import serving
from fifteenmc_spark.operators.relational import QUERIES
from fifteenmc_spark.operators.similarity import (
    IVF_SEED_IDS,
    N_CELLS,
    N_PROBE,
    N_QUERY_VECS,
    TIVF_SEED_POOL,
    V25_POOL,
    V12_NQ,
    _emb,
    _exact_topk_v12,
    _ivf_cells_probes,
    _ivfpq_topk_plan,
    _recall_agg,
    _tivf_cells_probes,
    _tivf_topk_plan,
)
from fifteenmc_spark.streaming.pq_ann import build_pq_serving_index


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_serving_default_is_trained_at_16_cells():
    assert serving.DEFAULT_QUANTIZER == "trained"
    assert serving.SERVING_NCELLS == 16
    assert len(serving.serving_seeds()) == serving.SERVING_NCELLS
    # the first 8 seed ids ARE the calibration layout's, so the 8-cell
    # rows stay directly comparable (the v24 sweep's construction)
    assert serving.serving_seeds()[:8] == IVF_SEED_IDS
    # constant scan fraction: serving reads the same 25% of the index per
    # query as the 8-cell calibration default (N_PROBE / N_CELLS)
    assert serving.SERVING_NPROBE / serving.SERVING_NCELLS == N_PROBE / N_CELLS


def test_ann_topk_default_pins_to_v25(spark, sf_small):
    # the serving default IS the declared (driver-attested) query v25 —
    # the dispatch point and the registry cannot drift apart silently
    got = _rows(serving.ann_topk(spark, sf_small))
    assert got and got == _rows(QUERIES["v25_serving_tivf_topk"].build(spark, sf_small))
    assert got == _rows(
        _tivf_topk_plan(spark, sf_small, serving.SERVING_NPROBE, serving.serving_seeds())
    )
    # the layout flip is real: the serving default no longer equals the
    # 8-cell calibration query (whose oracle is unchanged)
    assert got != _rows(QUERIES["v19_tivf_topk"].build(spark, sf_small))


def test_ivfpq_topk_default_pins_to_v26(spark, sf_small):
    got = _rows(serving.ivfpq_topk(spark, sf_small))
    assert got and got == _rows(QUERIES["v26_serving_ivfpq_topk"].build(spark, sf_small))
    assert got == _rows(
        _ivfpq_topk_plan(
            spark,
            sf_small,
            N_QUERY_VECS,
            trained=True,
            nprobe=serving.SERVING_NPROBE,
            seeds=serving.serving_seeds(),
        )
    )
    assert got != _rows(QUERIES["v21_tivfpq_topk"].build(spark, sf_small))


def test_serving_centroids_are_the_16_cell_trained_table(spark, sf_small):
    cents = dict(serving.serving_centroids(spark, sf_small))
    assert sorted(cents) == sorted(V25_POOL)  # 16 seed-initialized cids
    seeds = {
        r["vec_id"]: list(r["embedding"])
        for r in _emb(spark, sf_small)
        .where(_emb(spark, sf_small)["vec_id"].isin(*V25_POOL))
        .collect()
    }
    # Lloyd training moved at least one centroid off its seed vector —
    # the default really serves the TRAINED table
    assert any(cents[c] != seeds[c] for c in cents)


def test_serving_cells_probes_default_equals_16_cell_trained_index(spark, sf_small):
    _, dcells, dprobes = serving.serving_cells_probes(spark, sf_small)
    _, tcells, tprobes = _tivf_cells_probes(
        spark, sf_small, serving.SERVING_NPROBE, seeds=V25_POOL
    )
    assert _rows(dcells) == _rows(tcells)
    assert _rows(dprobes) == _rows(tprobes)


def test_pq_serving_index_default_is_the_serving_layout(spark, sf_small):
    dstatic, _ = build_pq_serving_index(spark, sf_small, serving.SERVING_NPROBE)
    tstatic, _ = build_pq_serving_index(
        spark, sf_small, serving.SERVING_NPROBE, quantizer="trained"
    )
    assert _rows(dstatic.select("vec_id", "cell")) == _rows(tstatic.select("vec_id", "cell"))
    # 16 distinct cells actually serve (the capacity is real, not nominal)
    assert dstatic.select("cell").distinct().count() > 8
    # and the dispatch is real: the explicit seed layout assigns at
    # least one vector to a different cell on this corpus
    sstatic, _ = build_pq_serving_index(spark, sf_small, N_PROBE, quantizer="seed")
    assert _rows(sstatic.select("vec_id", "cell")) != _rows(dstatic.select("vec_id", "cell"))


def test_seed_cells_remain_the_calibration_baseline(spark, sf_small):
    # flipping the default did NOT change the seed index or its queries:
    # the explicit seed layout still equals v5's cell table
    _, scells, _ = _ivf_cells_probes(spark, sf_small, N_PROBE)
    sstatic, _ = build_pq_serving_index(spark, sf_small, N_PROBE, quantizer="seed")
    assert _rows(sstatic.select("vec_id", "cell")) == _rows(scells)


def _mean_recall(df) -> float:
    return float(df.agg(F.avg("recall")).first()[0])


def test_serving_layout_composed_recall_no_worse_at_equal_scan(spark, sf_small):
    """The r12 flip's gate (v21-shape composed-recall row at the new
    layout): trained-IVFADC recall@5 at (16 cells, nprobe 4) must be
    no worse than at (8 cells, nprobe 2) — the SAME 25% of the index
    read per query, so any gain is pure quantizer capacity.  Measured
    at flip time: 0.332 -> 0.400 (sf0.001), 0.380 -> 0.408 (sf0.01)."""
    exact = _exact_topk_v12(spark, sf_small).select("qid", "vec_id")
    base = _mean_recall(
        _recall_agg(exact, _ivfpq_topk_plan(spark, sf_small, V12_NQ, trained=True))
    )
    new = _mean_recall(
        _recall_agg(
            exact,
            _ivfpq_topk_plan(
                spark,
                sf_small,
                V12_NQ,
                trained=True,
                nprobe=serving.SERVING_NPROBE,
                seeds=serving.serving_seeds(),
            ),
        )
    )
    assert new >= base, (new, base)


def test_serving_layout_membership_recall_no_worse_at_equal_scan(spark, sf_small):
    """v20-shape gate at the new layout: cell-membership recall of the
    serving 16-cell index at nprobe 4 vs the 8-cell default at nprobe 2
    (equal scan fraction).  This is v24's ncells=16 vs ncells=8 rows,
    pinned as a serving invariant rather than a sweep observation."""
    exact = _exact_topk_v12(spark, sf_small).select("qid", "vec_id")

    def membership(ncells: int, npb: int):
        _, cells, probes = _tivf_cells_probes(
            spark, sf_small, npb, V12_NQ, seeds=TIVF_SEED_POOL[:ncells]
        )
        hit = cells.join(
            F.broadcast(probes.select("qid", "cell")), ["cell"]
        ).select("qid", "vec_id")
        return _mean_recall(_recall_agg(exact, hit))

    assert membership(16, serving.SERVING_NPROBE) >= membership(8, N_PROBE)
