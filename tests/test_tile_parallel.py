"""The scale-out invariant, tested: per-tile reach computation with a
buffer halo equals the whole-graph computation for every node inside the
tile core.

This is THE property that makes the engine tile-parallel at 100 TB
(SURVEY.md §3.1): because buffer > reach limit, no shortest path that ends
inside a tile's core can leave the tile's buffer, so tiles never need to
exchange state (grid_creation.py:235-236 + precompute_poi_reach.py:132 in
the reference: 2 km buffer vs 1 km limit).

Here: lattice fixture (~1.2 km × 0.7 km), tiles of 0.4 km with a 0.35 km
buffer, reach limit 300 m < buffer.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fifteenmc_spark.plans import graph_build, grid, reach, snap

from . import geo_fixtures as gf

LIMIT_M = 300.0
TILE_KM = 0.4
BUFFER_KM = 0.35


@pytest.fixture(scope="module")
def ctx(spark):
    nodes_pdf = gf.lattice_nodes()
    edges_pdf = gf.lattice_edges_raw(nodes_pdf)
    pois_pdf = gf.poi_fixture(nodes_pdf)
    gnodes, gedges = graph_build.build_graph(
        spark.createDataFrame(nodes_pdf), graph_build.clean_walkable_edges(spark.createDataFrame(edges_pdf))
    )
    gnodes = gnodes.cache()
    gedges = gedges.cache()
    pois = snap.snap_points_to_nodes(spark.createDataFrame(pois_pdf), gnodes, max_snap_m=300.0).where(
        "node_idx IS NOT NULL"
    ).cache()

    bbox = (
        float(nodes_pdf["lon"].min()),
        float(nodes_pdf["lat"].min()),
        float(nodes_pdf["lon"].max()) + 1e-9,
        float(nodes_pdf["lat"].max()) + 1e-9,
    )
    tiles = grid.generate_tiles(spark, bbox, tile_km=TILE_KM, buffer_km=BUFFER_KM).cache()
    whole = reach.compute_reach(gnodes, gedges, pois, limit_m=LIMIT_M).toPandas()
    return {
        "gnodes": gnodes,
        "gedges": gedges,
        "pois": pois,
        "tiles": tiles,
        "whole": whole,
        "spark": spark,
    }


def test_tiles_cover_and_buffer_exceeds_limit(ctx):
    t = ctx["tiles"].first()
    buf_margin_deg = t["buffer_deg"]["dlat"]
    # buffer must exceed the reach limit for the invariant to hold
    assert buf_margin_deg * 111.32 * 1000 > LIMIT_M
    assert ctx["tiles"].count() >= 4  # the lattice spans several tiles


def test_per_tile_reach_equals_whole_graph(ctx):
    spark = ctx["spark"]
    gnodes, gedges, pois, tiles = ctx["gnodes"], ctx["gedges"], ctx["pois"], ctx["tiles"]

    # assign nodes to tile buffers (1-to-many) and tile cores (1-to-1)
    node_pts = gnodes.select("node_idx", "lon", "lat")
    in_buffer = grid.assign_points_to_tiles(node_pts, tiles, use_buffer=True).select(
        "grid_id", "node_idx"
    )
    in_core = grid.assign_points_to_tiles(node_pts, tiles, use_buffer=False).select(
        "grid_id", "node_idx"
    )

    def tile_part(gid) -> pd.DataFrame | None:
        buf_nodes = in_buffer.where(F.col("grid_id") == gid).select("node_idx")
        core_nodes = {r["node_idx"] for r in in_core.where(F.col("grid_id") == gid).collect()}
        if not core_nodes:
            return None
        # tile subgraph: both endpoints inside the buffer
        sub_edges = (
            gedges.join(buf_nodes.withColumnRenamed("node_idx", "src"), "src")
            .join(buf_nodes.withColumnRenamed("node_idx", "dst"), "dst")
            .select("src", "dst", "w")
        )
        sub_pois = pois.join(buf_nodes, "node_idx")
        sub_nodes = gnodes.join(buf_nodes, "node_idx")
        r = reach.compute_reach(sub_nodes, sub_edges, sub_pois, limit_m=LIMIT_M).toPandas()
        return r[r["node_idx"].isin(core_nodes)]

    # tiles are independent BY CONSTRUCTION (the property under test), so
    # their reach jobs overlap from a small driver thread pool (guide
    # §2.6: back-fill the cluster during each job's straggler tail) —
    # identical per-tile inputs and results, ~3x less wall clock for this
    # suite's longest test
    from concurrent.futures import ThreadPoolExecutor

    gids = [row["grid_id"] for row in tiles.select("grid_id").collect()]
    with ThreadPoolExecutor(max_workers=3) as pool:
        got_parts = [p for p in pool.map(tile_part, gids) if p is not None]

    got = pd.concat(got_parts, ignore_index=True)
    whole = ctx["whole"]

    # every (node, category) in a tile core must match the whole-graph run
    w = whole.set_index(["node_idx", "category"]).sort_index()
    mismatches = []
    for r in got.itertuples():
        key = (r.node_idx, r.category)
        if key not in w.index:
            mismatches.append((key, "missing"))
            continue
        wd = w.loc[key, "dist_m"]
        if pd.isna(r.dist_m) != pd.isna(wd) or (
            not pd.isna(wd) and abs(r.dist_m - wd) > 1e-2
        ):
            mismatches.append((key, r.dist_m, wd))
    assert not mismatches, f"{len(mismatches)} divergent entries, first: {mismatches[:5]}"
    # coverage: a (node, category) pair absent from the per-tile union can
    # only be one the whole-graph run also found unreachable (a category
    # with no POI inside that tile's buffer → dist > limit by the halo
    # argument); everything reachable must be present
    got_keys = {(r.node_idx, r.category) for r in got.itertuples()}
    for r in whole.itertuples():
        if (r.node_idx, r.category) not in got_keys:
            assert pd.isna(r.dist_m), f"reachable entry missing from tile union: {r}"
