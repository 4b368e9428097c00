"""Golden tests for the geospatial core (grid → graph build → snap →
bounded Dijkstra reach → point/path query) against independent
numpy/scipy oracles (tests/geo_fixtures.py; FIXTURES.md B1-B8).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fifteenmc_spark.functions import geo
from fifteenmc_spark.plans import graph_build, grid, query, reach, snap

from . import geo_fixtures as gf

BBOX = (18.40, 54.20, 18.90, 54.60)
LIMIT_M = 1000.0


@pytest.fixture(scope="module")
def fx(spark):
    nodes_pdf = gf.lattice_nodes()
    edges_pdf = gf.lattice_edges_raw(nodes_pdf)
    pois_pdf = gf.poi_fixture(nodes_pdf)
    gnodes_pdf, gedges_pdf = gf.golden_canonical_graph(nodes_pdf, edges_pdf)

    nodes_raw = spark.createDataFrame(nodes_pdf)
    edges_raw = spark.createDataFrame(edges_pdf)
    # pipeline order per SURVEY.md §3.1: walkability filter, then build
    gnodes, gedges = graph_build.build_graph(nodes_raw, graph_build.clean_walkable_edges(edges_raw))
    gnodes = gnodes.cache()
    gedges = gedges.cache()
    return {
        "nodes_pdf": nodes_pdf,
        "edges_pdf": edges_pdf,
        "pois_pdf": pois_pdf,
        "gnodes_pdf": gnodes_pdf,
        "gedges_pdf": gedges_pdf,
        "nodes_raw": nodes_raw,
        "edges_raw": edges_raw,
        "gnodes": gnodes,
        "gedges": gedges,
    }


# ---------------------------------------------------------------------------
# G6 grid generation vs golden (B4)
# ---------------------------------------------------------------------------
def test_grid_matches_golden(spark):
    got = (
        grid.generate_tiles(spark, BBOX, tile_km=10.0, buffer_km=2.0)
        .orderBy("grid_id")
        .toPandas()
    )
    want = gf.golden_grid(BBOX, 10.0, 2.0)
    assert list(got["grid_id"]) == list(want["grid_id"])
    for spark_col, want_col in [
        ("centroid", ("clon", "clat")),
    ]:
        np.testing.assert_allclose(
            [c["lon"] for c in got[spark_col]], want[want_col[0]], atol=1e-12
        )
        np.testing.assert_allclose(
            [c["lat"] for c in got[spark_col]], want[want_col[1]], atol=1e-12
        )
    np.testing.assert_allclose([b["minlon"] for b in got["tile_bbox"]], want["tminx"], atol=1e-12)
    np.testing.assert_allclose([b["maxlat"] for b in got["tile_bbox"]], want["tmaxy"], atol=1e-12)
    np.testing.assert_allclose([b["minlon"] for b in got["buffer_bbox"]], want["bminx"], atol=1e-12)
    np.testing.assert_allclose([b["maxlat"] for b in got["buffer_bbox"]], want["bmaxy"], atol=1e-12)


def test_buffer_halo_assignment(spark):
    tiles = grid.generate_tiles(spark, BBOX, tile_km=10.0, buffer_km=2.0).cache()
    # a point just inside one tile's edge must land in >= 2 buffer bboxes
    one = tiles.first()
    edge_lon = one["tile_bbox"]["minlon"] + 1e-4
    mid_lat = (one["tile_bbox"]["minlat"] + one["tile_bbox"]["maxlat"]) / 2
    pts = spark.createDataFrame(pd.DataFrame({"pid": [1], "lon": [edge_lon], "lat": [mid_lat]}))
    hits = grid.assign_points_to_tiles(pts, tiles).select("grid_id").collect()
    assert len(hits) >= 2  # own tile + west neighbor's buffer halo
    strict = grid.assign_points_to_tiles(pts, tiles, use_buffer=False).collect()
    assert len(strict) == 1  # tile bboxes partition the plane


def test_k_nearest_tiles(spark):
    tiles = grid.generate_tiles(spark, BBOX, tile_km=10.0, buffer_km=2.0)
    got = grid.k_nearest_tiles(tiles, 18.60, 54.35, k=5).toPandas()
    assert len(got) == 5
    assert got["dist_km"].is_monotonic_increasing


# ---------------------------------------------------------------------------
# P2 walkability + J1/W3/U1/P4/A1 canonical graph vs golden (B1/B2)
# ---------------------------------------------------------------------------
def test_walkability_filter(fx):
    got = graph_build.clean_walkable_edges(fx["edges_raw"]).count()
    want = int(gf.golden_walkable_mask(fx["edges_pdf"]).sum())
    assert got == want


def test_dense_index_matches_sorted_ids(fx):
    got = fx["gnodes"].orderBy("node_idx").toPandas()
    want = fx["gnodes_pdf"]
    assert list(got["node_idx"]) == list(want["node_idx"])
    assert list(got["osm_node_id"]) == list(want["osm_node_id"])


def test_dense_index_is_jvm_side(fx, spark):
    # the index must come from JVM partition-offset arithmetic (broadcast
    # offset join above the checkpointed range scan), not a Python
    # rdd.zipWithIndex round-trip — whose plan is a bare Scan ExistingRDD
    # with all the real work hidden in an opaque Python stage
    from fifteenmc_spark.plans import graph_build

    df = graph_build.assign_dense_index(fx["nodes_raw"])
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "BroadcastHashJoin" in plan  # offset map joined JVM-side
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_canonical_edges_match_golden(fx):
    got = fx["gedges"].orderBy("src", "dst").toPandas()
    want = fx["gedges_pdf"].sort_values(["src", "dst"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert list(got["src"]) == list(want["src"])
    assert list(got["dst"]) == list(want["dst"])
    np.testing.assert_allclose(got["w"], want["w"], rtol=1e-6)


def test_graph_invariants(fx):
    # J8 reciprocity: symmetrized graph has zero one-way pairs
    assert graph_build.reciprocity_violations(fx["gedges"]).isEmpty()
    # metamorphic weight check: stored w / recomputed haversine ≈ 1
    v = graph_build.validate_weights(fx["gedges"], fx["gnodes"]).first()
    assert abs(v["median_ratio"] - 1.0) < 1e-5
    assert v["n_bad"] == 0


def test_metamorphic_permuted_input(spark, fx):
    # permuting input row order must not change the canonical edge table
    shuffled = spark.createDataFrame(
        fx["edges_pdf"].sample(frac=1.0, random_state=99).reset_index(drop=True)
    )
    _, e2 = graph_build.build_graph(fx["nodes_raw"], graph_build.clean_walkable_edges(shuffled))
    a = fx["gedges"].orderBy("src", "dst").toPandas()
    b = e2.orderBy("src", "dst").toPandas()
    assert list(a["src"]) == list(b["src"])
    np.testing.assert_allclose(a["w"], b["w"], rtol=0)


# ---------------------------------------------------------------------------
# J2 snap vs golden (B3)
# ---------------------------------------------------------------------------
def test_snap_matches_golden(spark, fx):
    pois = spark.createDataFrame(fx["pois_pdf"])
    got = (
        snap.snap_points_to_nodes(pois, fx["gnodes"], max_snap_m=300.0)
        .orderBy("poi_id")
        .toPandas()
    )
    want = gf.golden_snap(fx["pois_pdf"], fx["gnodes_pdf"], max_snap_m=300.0).sort_values("poi_id").reset_index(drop=True)
    for g, w in zip(got.itertuples(), want.itertuples()):
        if w.node_idx == -1:
            assert g.node_idx is None or pd.isna(g.node_idx), f"poi {g.poi_id} should be rejected"
        else:
            assert g.node_idx == w.node_idx, f"poi {g.poi_id}: {g.node_idx} != {w.node_idx}"
            assert abs(g.dist_to_node_m - w.dist_to_node_m) < 1e-2


def test_snap_single_point(fx):
    # exactly on a node → that node, distance ~0
    row = fx["gnodes_pdf"].iloc[10]
    got = snap.snap_single_point(fx["gnodes"], float(row["lon"]), float(row["lat"]))
    assert got is not None and got[0] == row["node_idx"] and got[1] < 1e-6
    # far away → rejected by max_snap
    assert snap.snap_single_point(fx["gnodes"], 10.0, 50.0, max_snap_m=300.0) is None


def test_snap_batch_wraps_antimeridian(spark):
    """r15 (r14 verdict item 5): the BUCKETED batch snap must agree with
    the single-point path across lon=±180 — seam-adjacent nodes register
    ghost cell keys shifted by one world width, so a point near the seam
    sees other-side nodes and the Euclidean 3857 distance computed from
    the shifted x is the wrapped metric."""
    nodes = spark.createDataFrame(
        [
            (0, 179.9990, 0.0),  # ~89 m west of the east-side probe
            (1, -179.9999, 0.0),  # across the seam, ~33 m (the winner)
            (2, 179.5, 0.0),  # interior control, far from both probes
        ],
        "node_idx int, lon double, lat double",
    )
    points = spark.createDataFrame(
        [
            (10, 179.9998, 0.0),  # east-side probe: winner is node 1 ACROSS the seam
            (11, -179.9995, 0.0),  # west-side probe: winner node 1 same-side (~44 m)
            (12, 179.5002, 0.0),  # interior probe: winner node 2 (~22 m)
        ],
        "poi_id int, lon double, lat double",
    )
    got = {
        r["poi_id"]: r
        for r in snap.snap_points_to_nodes(points, nodes, max_snap_m=300.0).collect()
    }
    # batch ≡ single-point winner on every probe, seam and interior alike
    for pid, lon, lat in [(10, 179.9998, 0.0), (11, -179.9995, 0.0), (12, 179.5002, 0.0)]:
        single = snap.snap_single_point(nodes, lon, lat, max_snap_m=300.0)
        assert single is not None
        assert got[pid]["node_idx"] == single[0], f"poi {pid}"
        # metrics differ (Euclidean 3857 vs haversine) but at the equator
        # both reduce to R * dlon — agree to ~0.2%
        assert abs(got[pid]["dist_to_node_m"] - single[1]) <= 0.01 * single[1] + 0.1
    # the wrapped distance is the short way around (~33 m), not ~40000 km
    assert got[10]["dist_to_node_m"] < 40.0
    # no duplicate rows from ghost keys: one row per input point
    n_rows = snap.snap_points_to_nodes(points, nodes, max_snap_m=300.0).count()
    assert n_rows == 3


# ---------------------------------------------------------------------------
# G2 bounded multi-source Dijkstra vs scipy golden (B6)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def reach_ctx(spark, fx):
    snapped = gf.golden_snap(fx["pois_pdf"], fx["gnodes_pdf"], max_snap_m=300.0)
    snapped = snapped[snapped["node_idx"] >= 0].copy()
    pois_sdf = spark.createDataFrame(
        snapped[["poi_id", "category", "node_idx"]].astype({"node_idx": "int32"})
    )
    # dense=True: the golden/sentinel/pivot tests assert the reference's
    # full node x category cube; the engine default is the sparse form
    # (test_sparse_reach_default_equals_dense_reached_set)
    reach_df = reach.compute_reach(
        fx["gnodes"], fx["gedges"], pois_sdf, limit_m=LIMIT_M, dense=True
    ).cache()
    return {"snapped": snapped, "pois_sdf": pois_sdf, "reach": reach_df}


def test_reach_matches_scipy_golden(fx, reach_ctx):
    snapped = reach_ctx["snapped"]
    for cat in ("supermarket", "pharmacy"):
        sub = snapped[snapped["category"] == cat]
        dist, winners = gf.golden_reach(fx["gnodes_pdf"], fx["gedges_pdf"], sub, LIMIT_M)
        got = (
            reach_ctx["reach"]
            .where(F.col("category") == cat)
            .orderBy("node_idx")
            .toPandas()
        )
        assert len(got) == len(fx["gnodes_pdf"])
        for r in got.itertuples():
            want_d = dist[r.node_idx]
            if not np.isfinite(want_d):
                assert pd.isna(r.dist_m), f"node {r.node_idx} should be unreachable"
            else:
                assert abs(r.dist_m - want_d) < 1e-2, f"node {r.node_idx}"
                assert r.poi_id in winners[r.node_idx], f"node {r.node_idx} winner"
                assert abs(r.time_s - r.dist_m / 1.111) < 1e-3


@pytest.mark.parametrize("hops", [1, 4])
def test_reach_hop_batching_equivalent(fx, reach_ctx, hops):
    # the barrier-reduction knob must not change results: k=1 and k=4
    # produce the identical reach table as the auto-strategy baseline
    # (strategy="frontier" forced — auto would pick the local solver on
    # this small fixture and never exercise the loop)
    batched = (
        reach.compute_reach(
            fx["gnodes"],
            fx["gedges"],
            reach_ctx["pois_sdf"],
            limit_m=LIMIT_M,
            hops_per_round=hops,
            strategy="frontier",
            dense=True,
        )
        .orderBy("node_idx", "category")
        .toPandas()
    )
    base = reach_ctx["reach"].orderBy("node_idx", "category").toPandas()
    pd.testing.assert_frame_equal(batched, base, check_exact=False, atol=1e-6)


def test_reach_loop_does_not_leak_conf(fx, reach_ctx, spark):
    """The frontier loop's planner tuning (AQE off, graph-sized shuffle
    partitions) runs on a private newSession(): the CALLER session's conf
    is untouched both while the loop is live (polled from a concurrent
    thread) and after it returns."""
    import threading
    import time

    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")
    parts_before = spark.conf.get("spark.sql.shuffle.partitions")
    observed: list[tuple[str, str]] = []
    done = threading.Event()

    def poll():
        while not done.is_set():
            observed.append(
                (
                    spark.conf.get("spark.sql.adaptive.enabled"),
                    spark.conf.get("spark.sql.shuffle.partitions"),
                )
            )
            time.sleep(0.02)

    t = threading.Thread(target=poll)
    t.start()
    try:
        out = reach.compute_reach(
            fx["gnodes"], fx["gedges"], reach_ctx["pois_sdf"], limit_m=LIMIT_M,
            strategy="frontier",
        ).toPandas()
    finally:
        done.set()
        t.join()
    assert len(out) > 0
    assert spark.conf.get("spark.sql.adaptive.enabled") == aqe_before
    assert spark.conf.get("spark.sql.shuffle.partitions") == parts_before
    bad = [o for o in observed if o != (aqe_before, parts_before)]
    assert not bad, f"caller-session conf changed mid-loop: {bad[:3]}"


def test_reach_local_strategy_equivalent(fx, reach_ctx):
    # one-task heap Dijkstra and the distributed frontier loop are the
    # same operator: identical (node, category, dist, poi) tables
    frontier = (
        reach.compute_reach(
            fx["gnodes"], fx["gedges"], reach_ctx["pois_sdf"], limit_m=LIMIT_M,
            strategy="frontier", dense=True,
        )
        .orderBy("node_idx", "category")
        .toPandas()
    )
    local = (
        reach.compute_reach(
            fx["gnodes"], fx["gedges"], reach_ctx["pois_sdf"], limit_m=LIMIT_M,
            strategy="local", dense=True,
        )
        .orderBy("node_idx", "category")
        .toPandas()
    )
    pd.testing.assert_frame_equal(local, frontier, check_exact=False, atol=1e-6)


def test_sparse_reach_default_equals_dense_reached_set(fx, reach_ctx):
    # the engine-default SPARSE gold table is exactly the dense cube's
    # reached rows (row-count assert from the r10 verdict), and
    # densify_reach round-trips it to the reference's full cube
    sparse_sdf = reach.compute_reach(
        fx["gnodes"], fx["gedges"], reach_ctx["pois_sdf"], limit_m=LIMIT_M
    ).cache()
    sparse = sparse_sdf.orderBy("node_idx", "category").toPandas()
    dense = reach_ctx["reach"].orderBy("node_idx", "category").toPandas()
    assert not sparse["dist_m"].isna().any()  # no unreachable rows stored
    assert len(sparse) == int(dense["dist_m"].notna().sum())  # O(reached)
    # pandas renders the dense cube's nullable poi_id as float64
    want = dense[dense["dist_m"].notna()].astype({"poi_id": "int64"}).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        sparse.reset_index(drop=True), want, check_exact=False, atol=1e-6
    )
    re_dense = (
        reach.densify_reach(sparse_sdf, fx["gnodes"])
        .orderBy("node_idx", "category")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        re_dense, dense.reset_index(drop=True), check_exact=False, atol=1e-6
    )
    sparse_sdf.unpersist()


def test_reach_seed_nodes_zero(reach_ctx):
    # every valid snapped POI's node has dist 0 for its category
    seeds = reach_ctx["snapped"]
    got = reach_ctx["reach"].where(F.col("dist_m") == 0.0).toPandas()
    seed_pairs = {(int(r.node_idx), r.category) for r in seeds.itertuples()}
    got_pairs = {(int(r.node_idx), r.category) for r in got.itertuples()}
    assert seed_pairs == got_pairs


def test_reach_summary(fx, reach_ctx):
    s = reach.reach_summary(
        reach_ctx["reach"], reach_ctx["pois_sdf"], fx["gnodes"], LIMIT_M
    ).toPandas()
    snapped = reach_ctx["snapped"]
    for r in s.itertuples():
        sub = snapped[snapped["category"].map(lambda c: c == r.category)]
        assert r.n_sources == len(sub)
        dist, _ = gf.golden_reach(fx["gnodes_pdf"], fx["gedges_pdf"], sub, LIMIT_M)
        finite = dist[np.isfinite(dist)]
        assert r.n_within == len(finite)
        assert abs(r.median_dist_m - float(np.median(finite))) < 1e-2


def test_reach_pivot_shape(reach_ctx):
    wide = reach.reach_pivot(reach_ctx["reach"].limit(0).unionAll(reach_ctx["reach"]))
    cats = sorted(
        r["category"] for r in reach_ctx["reach"].select("category").distinct().collect()
    )
    cols = set(wide.columns)
    for c in cats:
        assert {f"{c}_dist", f"{c}_time", f"{c}_poi"} <= cols


def test_reach_sentinel_sink_roundtrip(reach_ctx, tmp_path):
    """SURVEY §1.2: NULL internally, inf/-1 only at the reference-shaped
    sink (precompute_poi_reach.py:8,58-60,95) — and the import path
    restores NULL semantics exactly."""
    base = reach_ctx["reach"]
    out = str(tmp_path / "reach_ref_shaped")
    reach.write_reference_shaped(base, out)
    back = base.sparkSession.read.parquet(out)
    bp = back.toPandas()
    # sentinel parity: the artifact has NO NULLs; unreachable = inf / -1
    assert not bp[["dist_m", "time_s", "poi_id"]].isna().any().any()
    n_null = base.where(F.col("dist_m").isNull()).count()
    assert n_null > 0, "fixture must exercise the unreachable case"
    assert int(np.isinf(bp["dist_m"]).sum()) == n_null
    assert int(np.isinf(bp["time_s"]).sum()) == n_null
    assert int((bp["poi_id"] == -1).sum()) == n_null
    # inverse restores NULL semantics exactly
    cols = ["node_idx", "category", "dist_m", "time_s", "poi_id"]
    restored = (
        reach.reach_from_sentinels(back).orderBy("node_idx", "category").toPandas()
    )
    want = base.select(*cols).orderBy("node_idx", "category").toPandas()
    pd.testing.assert_frame_equal(restored, want, check_exact=False, atol=1e-6)


def test_reference_sink_refuses_sparse_without_nodes(spark, tmp_path):
    """r11 ADVICE: the K3-parity sink must not silently write a sparse
    reach table — the reference artifact is dense, and a sparse write
    would drop every inf/-1 row with no local error."""
    sparse = spark.createDataFrame(
        # node 1 is missing the "cafe" row -> 3 rows != 2 nodes x 2 cats
        [(0, "cafe", 10.0, 7.5, 3), (0, "park", 20.0, 15.0, 4), (1, "park", 5.0, 3.8, 4)],
        "node_idx INT, category STRING, dist_m DOUBLE, time_s DOUBLE, poi_id BIGINT",
    )
    with pytest.raises(ValueError, match="DENSE"):
        reach.write_reference_shaped(sparse, str(tmp_path / "refuse"))
    # with nodes supplied the same sparse table densifies and writes fine
    nodes = spark.createDataFrame([(0,), (1,)], "node_idx INT")
    out = str(tmp_path / "densified")
    reach.write_reference_shaped(sparse, out, nodes=nodes)
    back = spark.read.parquet(out).toPandas()
    assert len(back) == 4
    assert int(np.isinf(back["dist_m"]).sum()) == 1  # the missing (1, cafe) row


# ---------------------------------------------------------------------------
# G7 point query + G4/G5 path query (B7)
# ---------------------------------------------------------------------------
def test_point_reachability(fx, reach_ctx):
    q = fx["gnodes_pdf"].iloc[150]
    got = query.point_reachability(
        reach_ctx["reach"], fx["gnodes"], float(q["lon"]), float(q["lat"]), radius_m=LIMIT_M
    ).toPandas()
    want = (
        reach_ctx["reach"]
        .where(F.col("node_idx") == int(q["node_idx"]))
        .where(F.col("dist_m").isNotNull() & (F.col("dist_m") <= LIMIT_M))
        .count()
    )
    assert len(got) == want
    assert got["dist_m"].is_monotonic_increasing


def test_point_to_point_path(fx):
    import heapq

    a = fx["gnodes_pdf"].iloc[30]
    b = fx["gnodes_pdf"].iloc[350]
    path = query.point_to_point_path(
        fx["gnodes"],
        fx["gedges"],
        (float(a["lon"]), float(a["lat"])),
        (float(b["lon"]), float(b["lat"])),
        limit_m=5000.0,
    ).toPandas()
    assert len(path) >= 2
    assert path.iloc[0]["node_idx"] == a["node_idx"]
    assert path.iloc[-1]["node_idx"] == b["node_idx"]
    # total distance equals the independent Dijkstra oracle's
    n = len(fx["gnodes_pdf"])
    adj = [[] for _ in range(n)]
    for r in fx["gedges_pdf"].itertuples():
        adj[int(r.src)].append((int(r.dst), float(r.w)))
    want = gf._single_source_dijkstra(adj, int(a["node_idx"]), n)[int(b["node_idx"])]
    assert abs(path["cum_m"].iloc[-1] - want) < 1e-2


def test_backtrack_collects_o_path_not_o_reached(spark, monkeypatch):
    # the pointer-doubling backtrack's driver transfer is the CHAIN, not
    # the settled state: a star of 5000 settled nodes hanging off a
    # 6-node spine must reach the driver as exactly 6 collected rows
    # (every .collect() in the helper is counted via a spy)
    # Spark 4: instances are the classic subclass, which overrides
    # collect — patching the abstract pyspark.sql.DataFrame misses it
    from pyspark.sql.classic.dataframe import DataFrame

    # spine: tip=5 at dist 5.0, prev chain 5->4->3->2->1->0, root 0
    spine = [(i, float(i), i - 1 if i > 0 else None) for i in range(6)]
    star = [(100 + j, 4.5, j % 6) for j in range(5000)]  # settled bystanders
    state = spark.createDataFrame(spine + star, "node_idx INT, dist_m DOUBLE, prev INT")

    counted = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        counted.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    chain = query._backtrack_chain(state, 5, 5.0)
    assert chain == [5, 4, 3, 2, 1, 0]
    assert sum(counted) == len(chain), counted  # O(path) driver transfer


def test_backtrack_raises_on_prev_cycle(spark, monkeypatch):
    # r11 ADVICE: corrupted prev pointers (a cycle) must raise, not
    # return a plausible-looking truncated chain with wrong cum_m
    monkeypatch.setattr(query, "_MAX_DOUBLINGS", 3)
    cyc = [(0, 1.0, 1), (1, 1.0, 2), (2, 1.0, 0)]  # 0 -> 1 -> 2 -> 0
    state = spark.createDataFrame(cyc, "node_idx INT, dist_m DOUBLE, prev INT")
    with pytest.raises(RuntimeError, match="did not converge"):
        query._backtrack_chain(state, 0, 1.0)


def test_path_to_nearest_poi(fx, reach_ctx):
    q = fx["gnodes_pdf"].iloc[150]
    path = query.path_to_nearest_poi(
        fx["gnodes"],
        fx["gedges"],
        reach_ctx["pois_sdf"],
        float(q["lon"]),
        float(q["lat"]),
        "supermarket",
        limit_m=LIMIT_M,
    ).toPandas()
    assert len(path) >= 1
    assert path["seq"].tolist() == list(range(len(path)))
    assert path.iloc[0]["node_idx"] == q["node_idx"]
    assert path.iloc[0]["step_m"] == 0.0
    # cum_m at the end equals the reach distance at the start node
    want = (
        reach_ctx["reach"]
        .where((F.col("node_idx") == int(q["node_idx"])) & (F.col("category") == "supermarket"))
        .first()
    )
    assert abs(path["cum_m"].iloc[-1] - want["dist_m"]) < 1e-2
    # last node is the winning POI's node
    snapped = reach_ctx["snapped"]
    end_node = int(path.iloc[-1]["node_idx"])
    assert end_node in set(snapped[snapped["category"] == "supermarket"]["node_idx"].astype(int))
    # every step's weight matches the edge table (float32 tolerance)
    ge = fx["gedges_pdf"].set_index(["src", "dst"])["w"]
    for i in range(1, len(path)):
        u, v = int(path.iloc[i - 1]["node_idx"]), int(path.iloc[i]["node_idx"])
        assert abs(path.iloc[i]["step_m"] - float(ge.loc[(u, v)])) < 1e-3


def test_snap_batch_seam_matches_numpy_golden(spark):
    """Randomized seam corpus vs a NumPy wrapped-Mercator argmin golden:
    200 nodes scattered within ~1 km of lon=±180 on both sides (plus an
    interior control cluster), 60 probe points — the batch snap's winner
    and distance must match the brute-force wrapped metric for every
    probe (r15 seam-ghost regression net)."""
    import numpy as np

    rng = np.random.RandomState(7)
    R = 6378137.0
    world_w = 2.0 * np.pi * R

    def lon_jitter(n, scale_deg):
        return (rng.rand(n) * 2 - 1) * scale_deg

    node_lons = np.concatenate([
        180.0 - np.abs(lon_jitter(80, 0.01)),          # east side of seam
        -180.0 + np.abs(lon_jitter(80, 0.01)),         # west side
        20.0 + lon_jitter(40, 0.01),                   # interior control
    ])
    node_lats = lon_jitter(200, 0.02)
    nodes_pdf = pd.DataFrame({
        "node_idx": np.arange(200, dtype=np.int32),
        "lon": node_lons, "lat": node_lats,
    })
    probe_lons = np.concatenate([
        180.0 - np.abs(lon_jitter(25, 0.004)),
        -180.0 + np.abs(lon_jitter(25, 0.004)),
        20.0 + lon_jitter(10, 0.004),
    ])
    probe_lats = lon_jitter(60, 0.015)
    pts_pdf = pd.DataFrame({
        "poi_id": np.arange(60, dtype=np.int32),
        "lon": probe_lons, "lat": probe_lats,
    })

    def merc(lon, lat):
        x = R * np.radians(lon)
        y = R * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2))
        return x, y

    nx, ny = merc(node_lons, node_lats)
    px, py = merc(probe_lons, probe_lats)
    # wrapped Euclidean 3857: dx reduced modulo the world width
    dx = np.abs(px[:, None] - nx[None, :])
    dx = np.minimum(dx, world_w - dx)
    dy = py[:, None] - ny[None, :]
    dist = np.sqrt(dx * dx + dy * dy)
    within = dist <= 300.0
    golden_idx = np.where(within.any(axis=1), dist.argmin(axis=1), -1)
    golden_d = dist.min(axis=1)

    got = {
        r["poi_id"]: r
        for r in snap.snap_points_to_nodes(
            spark.createDataFrame(pts_pdf),
            spark.createDataFrame(nodes_pdf),
            max_snap_m=300.0,
        ).collect()
    }
    for i in range(60):
        g = got[i]
        if golden_idx[i] < 0:
            assert g["node_idx"] is None, f"probe {i} should be unmatched"
        else:
            assert g["node_idx"] == golden_idx[i], (
                f"probe {i}: {g['node_idx']} != {golden_idx[i]}"
            )
            assert abs(g["dist_to_node_m"] - golden_d[i]) < 0.01 * golden_d[i] + 0.01
