"""Iterative bounded multi-source shortest paths → the `reach` gold table
(SURVEY.md §2.8 G2, the reference's compute core).

The reference runs a binary-heap Dijkstra over CSR arrays per category
(`precompute_poi_reach.py:86-125`), bounded at `limit_m`.  A heap is a
single-address-space structure; the distributed equivalent is frontier
Bellman-Ford: each round relaxes every edge leaving the frontier
(join) and keeps the per-node minimum (groupBy-min) — exactly the kernel
declared as query d22.  Rounds ≈ hop diameter within `limit_m` (tens, on a
walking graph); every round is one co-partitioned join + one aggregation.

Differences from the reference, by design:
- ALL categories run in one pass (category is a state column) instead of
  the reference's per-category loop — one job, shared edge scan.
- Tie-break is deterministic set semantics: the winning source for a node
  is min(dist, poi_id) lexicographically.  The reference's winner on
  exact distance ties depends on heap pop order
  (`precompute_poi_reach.py:119-123`, strict `<` keeps first-settled);
  the engine pins the order-free rule instead, so results are stable
  under any partitioning.
- Unreachable = NULL (reference: inf / -1); sentinels are materialized
  only at reference-shaped sinks (SURVEY.md §1.2).

Scale notes
-----------
- The edge table is repartitioned by `src` once and cached; every round's
  frontier join reuses that partitioning, so only the (small) frontier
  shuffles per round.
- State and frontier are localCheckpoint'ed each round to truncate the
  growing lineage (on a cluster use a reliable checkpoint dir instead).
- The `limit_m` bound keeps the frontier from sweeping the whole graph;
  with per-tile processing (buffer 2 km > limit 1 km,
  grid_creation.py:235-236) tiles never exchange state, so the whole
  computation is tile-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import geo

LIMIT_M_DEFAULT = 1000.0  # precompute_poi_reach.py:132
MAX_ROUNDS_DEFAULT = 200
_CKPT_EVERY = 3
HOPS_PER_ROUND_DEFAULT = 2
# graphs at or below this edge count solve in ONE task (strategy="auto"):
# ~150k edges is a few MB of adjacency and milliseconds of heap Dijkstra —
# far below the per-round scheduling cost of even one frontier barrier
LOCAL_EDGE_THRESHOLD = 150_000


def _valid_sources(pois: DataFrame, nodes: DataFrame) -> DataFrame:
    """P3: sources snapped to a node that exists in the node table
    (precompute_poi_reach.py:177 checks node_idx in [0, N) against dense
    indices; membership semi-join is the form that also holds for
    subgraphs, e.g. per-tile node sets with global indices)."""
    return pois.where(F.col("node_idx") >= 0).join(
        nodes.select("node_idx"), "node_idx", "left_semi"
    )


def shortest_paths_bounded_local(
    edges: DataFrame,
    seeds: DataFrame,
    limit_m: float = LIMIT_M_DEFAULT,
    track_prev: bool = False,
) -> DataFrame:
    """G2 kernel, single-task strategy: classic binary-heap Dijkstra (the
    reference's own algorithm, precompute_poi_reach.py:86-125) inside ONE
    cogrouped applyInPandas task.

    This is the right plan whenever the (sub)graph fits in a task — which
    at 100 TB is the COMMON case: the buffer>limit tile design
    (grid_creation.py:235-236) makes every tile's reach independent, so
    the cluster runs thousands of these tasks in parallel, one per tile,
    with zero inter-tile shuffles (see tests/test_tile_parallel.py).  The
    frontier loop (shortest_paths_bounded) exists for the uncommon case —
    one connected region bigger than a task.

    Semantics are identical to the frontier loop: bounded by ``limit_m``,
    winner per (node, category) = lexicographic min (dist, poi_id[, prev])
    with NULL prev ordering first (seeds), matching Spark's struct-min."""
    out_schema = "node_idx INT, category STRING, dist_m DOUBLE, poi_id BIGINT" + (
        ", prev INT" if track_prev else ""
    )
    e = edges.select(
        F.lit(0).alias("g"),
        F.col("src").cast("int").alias("src"),
        F.col("dst").cast("int").alias("dst"),
        F.col("w").cast("double").alias("w"),
    )
    s = seeds.select(
        F.lit(0).alias("g"),
        F.col("node_idx").cast("int").alias("node_idx"),
        "category",
        F.col("poi_id").cast("bigint").alias("poi_id"),
    )
    lim = float(limit_m)

    def solve(e_pdf, s_pdf):
        import heapq
        from collections import defaultdict

        import pandas as pd

        adj = defaultdict(list)
        for src, dst, w in zip(e_pdf["src"], e_pdf["dst"], e_pdf["w"]):
            adj[int(src)].append((int(dst), float(w)))
        # state[(node, cat)] = (dist, poi, prev); prev -1 encodes NULL so
        # seeds order first on ties, exactly like struct-min nulls-first
        state: dict = {}
        heap: list = []
        for node, cat, poi in zip(s_pdf["node_idx"], s_pdf["category"], s_pdf["poi_id"]):
            k = (int(node), cat)
            cand = (0.0, int(poi), -1)
            if k not in state or cand < state[k]:
                state[k] = cand
                heapq.heappush(heap, (0.0, int(poi), -1, int(node), cat))
        while heap:
            d, p, pv, node, cat = heapq.heappop(heap)
            if state.get((node, cat)) != (d, p, pv):
                continue  # stale entry (lazy deletion, like the reference)
            for dst, w in adj.get(node, ()):
                nd = d + w
                if nd > lim:
                    continue
                k = (dst, cat)
                cand = (nd, p, node)
                if k not in state or cand < state[k]:
                    state[k] = cand
                    heapq.heappush(heap, (nd, p, node, dst, cat))
        rows = {
            "node_idx": [k[0] for k in state],
            "category": [k[1] for k in state],
            "dist_m": [v[0] for v in state.values()],
            "poi_id": [v[1] for v in state.values()],
        }
        if track_prev:
            rows["prev"] = [None if v[2] < 0 else v[2] for v in state.values()]
        out = pd.DataFrame(rows)
        out["node_idx"] = out["node_idx"].astype("int32")
        out["poi_id"] = out["poi_id"].astype("int64")
        if track_prev:
            out["prev"] = out["prev"].astype("Int32")
        return out

    return (
        e.groupBy("g")
        .cogroup(s.groupBy("g"))
        .applyInPandas(lambda el, sl: solve(el, sl), schema=out_schema)
    )


def shortest_paths_bounded(
    edges: DataFrame,
    seeds: DataFrame,
    limit_m: float = LIMIT_M_DEFAULT,
    max_rounds: int = MAX_ROUNDS_DEFAULT,
    track_prev: bool = False,
    hops_per_round: int = HOPS_PER_ROUND_DEFAULT,
    strategy: str = "auto",
) -> DataFrame:
    """G2 kernel: multi-source bounded shortest paths over
    ``edges(src, dst, w)`` from ``seeds(node_idx, category, poi_id)``.

    Returns ``(node_idx, category, dist_m, poi_id[, prev])`` for every
    node within ``limit_m`` of a seed of that category.  ``prev`` (with
    ``track_prev=True``) is the upstream node on the winning path, NULL at
    seeds — input to path backtracking (G4).

    ``hops_per_round`` batches k edge relaxations into one synchronization
    round: the candidate set is the union of 1..k-hop extensions of the
    frontier, min-merged once.  Rounds needed drop from hop-diameter D to
    ceil(D/k) — on a 1 km walking-graph reach (~70 hops at ~15 m edges)
    k=4 cuts ~70 global barriers to ~18.  Correctness is k-independent:
    every hop stays bounded by ``limit_m``, each hop is min-merged, and
    the round-end strict-improvement-vs-state check subsumes any
    non-shortest intermediates (golden Dijkstra tests run both k=1 and
    k=4).  Default is 2 — measured on local[32] it is ~20% faster than
    k=1 on a 30-hop lattice and neutral on a depth-7 tree, while k>=4
    loses on shallow graphs (wasted hops after the frontier empties
    mid-round).  Raise it on a real cluster where per-round scheduling +
    straggler barriers dominate shuffle cost, or on high-diameter graphs.

    ``strategy``: "auto" (default) solves graphs at or below
    LOCAL_EDGE_THRESHOLD edges with one-task heap Dijkstra
    (shortest_paths_bounded_local — at tile scale the dominant, shuffle-
    free plan) and larger graphs with the frontier loop; "local" /
    "frontier" force a path (equivalence pinned by
    test_reach_local_strategy_equivalent).
    """
    if strategy not in ("auto", "frontier", "local"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "local":
        return shortest_paths_bounded_local(edges, seeds, limit_m, track_prev)
    edges = edges.select("src", "dst", F.col("w").cast("double").alias("w"))
    n_edges = edges.count()
    if strategy == "auto" and n_edges <= LOCAL_EDGE_THRESHOLD:
        return shortest_paths_bounded_local(edges, seeds, limit_m, track_prev)
    spark = edges.sparkSession
    # The loop tunes session-global confs: AQE off (each tiny round
    # otherwise pays query-stage materialization + re-optimization —
    # measured 28% slower on a 10k-node lattice) and a graph-sized shuffle
    # partition count.  It runs on a PRIVATE spark.newSession() — same
    # SparkContext, block manager, and cache; its own SQLConf — so a
    # concurrent query on the caller's session keeps its own planner
    # settings (pinned by test_reach_loop_does_not_leak_conf).  DataFrames
    # can't cross sessions directly; global temp views (context-scoped)
    # carry the inputs in and the result out, and the result's lineage
    # bottoms out in localCheckpoint blocks, so it stays executable after
    # the views are dropped.
    import uuid

    tag = f"reach_loop_{uuid.uuid4().hex}"
    loop = spark.newSession()
    # Materialize both inputs to LogicalRDD leaves BEFORE registering the
    # views: edges and seeds typically derive from the same base frames
    # (nodes/graph), and carrying those shared subplans (and exprIds) into
    # the loop session trips Union constraint rewriting during the state
    # merge (NoSuchElementException in AttributeMap).  Checkpointing cuts
    # the lineage so each view is a self-contained leaf; the loop cached
    # the (repartitioned) edges anyway, so this adds no extra scan.
    edges.localCheckpoint().createOrReplaceGlobalTempView(f"{tag}_edges")
    seeds.localCheckpoint().createOrReplaceGlobalTempView(f"{tag}_seeds")
    edges = loop.table(f"global_temp.{tag}_edges")
    seeds = loop.table(f"global_temp.{tag}_seeds")
    # cap from the CALLER's conf, not the fresh session's: newSession()
    # resets runtime-set conf to builder defaults, and the cap's purpose
    # is to respect the tuning of the session that invoked the operator
    parts_was = spark.conf.get("spark.sql.shuffle.partitions", "200")
    loop.conf.set("spark.sql.adaptive.enabled", "false")
    # Constraint propagation off for the loop (another knob the private
    # session makes safe to set): Union constraint rewriting trips a
    # NoSuchElementException in AttributeMap when the state-merge union
    # mixes checkpointed LogicalRDDs with plans referencing the shared
    # CacheManager's in-memory relations, and inferred-filter pushdown
    # buys nothing for these tiny per-round plans anyway.
    loop.conf.set("spark.sql.constraintPropagation.enabled", "false")
    try:
        # with AQE off, every round would otherwise shuffle into the full
        # session partition count even for a tiny tile graph (32 scheduled
        # tasks for a few hundred frontier rows dominates round latency).
        # Size the loop's shuffles to the graph instead — exactly what AQE
        # coalescing would have picked (~50k edges per shuffle partition
        # keeps rounds in-memory); n_edges was counted at dispatch.
        loop_parts = max(1, min(int(parts_was), n_edges // 50_000 + 1))
        loop.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
        edges = edges.repartition(loop_parts, "src").cache()

        val_cols = ["dist_m", "poi_id"] + (["prev"] if track_prev else [])

        def as_state(df: DataFrame) -> DataFrame:
            # the lexicographic (dist, poi_id) struct IS the merge operator
            return df.select("node_idx", "category", F.struct(*val_cols).alias("v"))

        init = seeds.select(
            "node_idx", "category", F.lit(0.0).alias("dist_m"), "poi_id",
            *([F.lit(None).cast("int").alias("prev")] if track_prev else []),
        )
        # duplicate seeds on one node: min poi_id wins (deterministic twin of
        # the reference's first-in-list rule, precompute_poi_reach.py:99-104)
        state = as_state(init).groupBy("node_idx", "category").agg(F.min("v").alias("v")).localCheckpoint()
        frontier = state
        rounds_since_ckpt = 0

        def relax(fr: DataFrame) -> DataFrame:
            # one edge relaxation, returned in state shape and min-merged
            # (the merge bounds within-round growth: ≤ |nodes×categories|
            # candidates per hop, never out-degree^k)
            return (
                as_state(
                    fr.withColumnRenamed("node_idx", "src")
                    .join(edges, "src")
                    .select(
                        F.col("dst").alias("node_idx"),
                        "category",
                        (F.col("v.dist_m") + F.col("w")).alias("dist_m"),
                        F.col("v.poi_id").alias("poi_id"),
                        *([F.col("src").alias("prev")] if track_prev else []),
                    )
                    .where(F.col("dist_m") <= F.lit(float(limit_m)))  # bounded search
                )
                .groupBy("node_idx", "category")
                .agg(F.min("v").alias("v"))
            )

        hops = max(1, int(hops_per_round))
        for _ in range(max_rounds):
            # k chained relaxations, ONE synchronization round: the hops
            # pipeline inside a single job, so the driver pays one
            # isEmpty/checkpoint barrier per k hops instead of per hop
            hop = relax(frontier)
            cands = [hop]
            for _h in range(1, hops):
                hop = relax(hop)
                cands.append(hop)
            cand_min = cands[0]
            for extra in cands[1:]:
                cand_min = cand_min.unionAll(extra)
            if hops > 1:
                cand_min = cand_min.groupBy("node_idx", "category").agg(F.min("v").alias("v"))
            # strict improvement vs current state (reference's `nd < dist[v]`,
            # extended with the poi_id tie-break for determinism)
            improved = (
                cand_min.join(
                    state.select("node_idx", "category", F.col("v").alias("v_old")),
                    ["node_idx", "category"],
                    "left",
                )
                .where(F.col("v_old").isNull() | (F.col("v") < F.col("v_old")))
                .select("node_idx", "category", "v")
                .localCheckpoint()
            )
            if improved.isEmpty():
                break
            state = state.unionAll(improved).groupBy("node_idx", "category").agg(F.min("v").alias("v"))
            rounds_since_ckpt += 1
            # checkpoint every few rounds, not every round: each eager
            # localCheckpoint is a full job; a 3-deep union/agg chain over
            # already-checkpointed inputs re-plans cheaply
            if rounds_since_ckpt >= _CKPT_EVERY:
                state = state.localCheckpoint()
                rounds_since_ckpt = 0
            frontier = improved

        if rounds_since_ckpt:
            state = state.localCheckpoint()  # cut lineage before edges unpersist
        out = state.select("node_idx", "category", F.col("v.dist_m").alias("dist_m"), F.col("v.poi_id").alias("poi_id"),
                           *([F.col("v.prev").alias("prev")] if track_prev else []))
        # re-root the result in the CALLER's session: state is fully
        # checkpointed, so the resolved plan is a thin projection over
        # pinned blocks and survives the view drop below
        out.createOrReplaceGlobalTempView(f"{tag}_out")
        res = spark.table(f"global_temp.{tag}_out")
        edges.unpersist()
        return res
    finally:
        for v in ("edges", "seeds", "out"):
            spark.catalog.dropGlobalTempView(f"{tag}_{v}")


def compute_reach(
    nodes: DataFrame,
    edges: DataFrame,
    pois: DataFrame,
    limit_m: float = LIMIT_M_DEFAULT,
    speed_mps: float = geo.WALK_SPEED_MPS,
    max_rounds: int = MAX_ROUNDS_DEFAULT,
    hops_per_round: int = HOPS_PER_ROUND_DEFAULT,
    strategy: str = "auto",
    dense: bool = False,
) -> DataFrame:
    """The `reach` gold table (SURVEY.md §1.1, B6): ``node_idx, category,
    dist_m FLOAT, time_s FLOAT, poi_id BIGINT``.  Categories are
    sanitized keys (F7).

    SPARSE by default: one row per REACHED (node, category) pair.  The
    reference emits full length-N arrays per category (inf / -1 for
    unreachable, precompute_poi_reach.py:159-218), but at 100 TB the
    dense node × category cube stores the unreachable fraction as
    explicit rows — on a country-scale graph with sparse POI categories
    that fraction dominates, and every downstream aggregate/point query
    already treats absent and NULL identically.  ``dense=True`` (or
    ``densify_reach`` on an existing sparse table) materializes the
    reference's cube — NULL rows where unreachable — which is the shape
    the reference-hash parity sinks need.

    Materialized once, partitioned by category on write — point queries
    then read one node's rows, never touching the graph."""
    seeds = _valid_sources(pois, nodes).select(
        "node_idx", geo.sanitize_key(F.col("category")).alias("category"), "poi_id"
    )
    reached = shortest_paths_bounded(
        edges,
        seeds,
        limit_m=limit_m,
        max_rounds=max_rounds,
        hops_per_round=hops_per_round,
        strategy=strategy,
    )
    sparse = reached.select(
        "node_idx",
        "category",
        F.col("dist_m").cast("float").alias("dist_m"),
        geo.walking_time_s(F.col("dist_m"), speed_mps).cast("float").alias("time_s"),
        "poi_id",
    )
    if dense:
        return densify_reach(sparse, nodes, seeds.select("category").distinct())
    return sparse


def densify_reach(
    sparse: DataFrame, nodes: DataFrame, categories: DataFrame | None = None
) -> DataFrame:
    """Sparse reach → the reference's dense node × category cube (one row
    per (node, category) for EVERY node, NULL dist/time/poi when
    unreachable).  A sink-side projection: the grid is a lattice
    crossJoin of the node ids against the (tiny, broadcast) category
    list, and the sparse table left-joins onto it — no recompute."""
    cats = categories if categories is not None else sparse.select("category").distinct()
    grid = nodes.select("node_idx").crossJoin(F.broadcast(cats))
    return grid.join(sparse, ["node_idx", "category"], "left").select(
        "node_idx",
        "category",
        F.col("dist_m").cast("float").alias("dist_m"),
        F.col("time_s").cast("float").alias("time_s"),
        "poi_id",
    )


def reach_with_sentinels(reach: DataFrame) -> DataFrame:
    """SURVEY §1.2 sentinel-compat projection: the engine keeps NULL for
    not-reachable-within-limit internally (SQL-correct: NULLs drop out of
    aggregates and comparisons), but the reference's published artifact
    stores ``inf`` distances/times and ``-1`` poi_ids
    (precompute_poi_reach.py:8,58-60,95).  This materializes exactly those
    sentinels at the sink boundary so outputs are hash-comparable with
    reference .npz dumps."""
    return reach.select(
        "node_idx",
        "category",
        F.coalesce(F.col("dist_m"), F.lit(float("inf"))).cast("float").alias("dist_m"),
        F.coalesce(F.col("time_s"), F.lit(float("inf"))).cast("float").alias("time_s"),
        F.coalesce(F.col("poi_id"), F.lit(-1)).cast("bigint").alias("poi_id"),
    )


def reach_from_sentinels(df: DataFrame) -> DataFrame:
    """Inverse of reach_with_sentinels — import a reference-shaped table
    back into NULL semantics (inf→NULL, -1→NULL)."""
    return df.select(
        "node_idx",
        "category",
        F.when(F.col("dist_m") == float("inf"), F.lit(None)).otherwise(F.col("dist_m")).cast("float").alias("dist_m"),
        F.when(F.col("time_s") == float("inf"), F.lit(None)).otherwise(F.col("time_s")).cast("float").alias("time_s"),
        F.when(F.col("poi_id") == -1, F.lit(None)).otherwise(F.col("poi_id")).cast("bigint").alias("poi_id"),
    )


def write_reference_shaped(reach: DataFrame, path: str, nodes: DataFrame | None = None) -> None:
    """K3-parity sink: the reach table in the reference's sentinel
    convention, parquet partitioned by category (the Spark-native stand-in
    for one npz array set per category key,
    precompute_poi_reach.py:159-170).  The reference artifact is DENSE
    (full length-N arrays) — pass ``nodes`` to densify a sparse-form
    table at this sink boundary.  Without ``nodes`` the input is ASSERTED
    dense (count == n_distinct_nodes * n_categories): since r11 the reach
    gold table is sparse by default, and silently writing a sparse table
    would drop every inf/-1 sentinel row and break downstream
    reference-hash parity with no local error (r11 ADVICE)."""
    from ..io import write_parquet

    if nodes is not None:
        reach = densify_reach(reach, nodes)
    else:
        shape = reach.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("node_idx").alias("nodes"),
            F.countDistinct("category").alias("cats"),
        ).first()
        if shape["n"] != shape["nodes"] * shape["cats"]:
            raise ValueError(
                "write_reference_shaped requires a DENSE reach table when "
                f"nodes is not given: got {shape['n']} rows for "
                f"{shape['nodes']} nodes x {shape['cats']} categories "
                f"(expected {shape['nodes'] * shape['cats']}); the sparse "
                "default reach table must be densified (pass nodes=...)"
            )
    write_parquet(reach_with_sentinels(reach), path, partition_by=["category"])


def write_reach_zordered(
    reach: DataFrame,
    nodes: DataFrame,
    out_dir: str,
    layout_bbox: tuple[float, float, float, float],
) -> None:
    """Write the reach gold table through the Z-order layout, keyed on
    each row's NODE coordinates (r13 verdict item 7): reach is node-keyed
    (not spatial), so the spatial key comes from joining the node table
    once at write time — after that, a point query's reach lookup reads
    only the quadtree cells under its max-snap disc (the snapped node is
    within max_snap_m of the query point, so its reach rows are inside
    the pruned listing by the same containment argument as the node
    read).  The reference precomputes per-tile npz artifacts and loads a
    whole tile per query (poi_query.py); the Spark answer is write-once
    spatial clustering on the SAME layout geometry as the node table, so
    both halves of G7 prune together.  The written table carries
    (node_idx, category, dist_m, time_s, poi_id, lon, lat) + the layout
    columns."""
    from . import layout as layout_mod

    keyed = reach.join(nodes.select("node_idx", "lon", "lat"), "node_idx")
    layout_mod.write_zorder_layout(keyed, out_dir, layout_bbox)


def reach_summary(
    reach: DataFrame, pois: DataFrame, nodes: DataFrame, limit_m: float = LIMIT_M_DEFAULT
) -> DataFrame:
    """A4 per-category summary (precompute_poi_reach.py:204-228):
    category, n_sources, n_within, median_dist_m, median_time_s, limit_m.
    Exact percentile (np.median in the reference), never approx."""
    src_counts = (
        _valid_sources(pois, nodes)
        .select(geo.sanitize_key(F.col("category")).alias("category"))
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n_sources"))
    )
    stats = reach.groupBy("category").agg(
        F.sum(F.when(F.col("dist_m").isNotNull(), 1).otherwise(0)).cast("int").alias("n_within"),
        F.round(F.percentile("dist_m", F.lit(0.5)), 4).alias("median_dist_m"),
        F.round(F.percentile("time_s", F.lit(0.5)), 4).alias("median_time_s"),
    )
    return (
        stats.join(src_counts, "category", "left")
        .select(
            "category",
            F.coalesce("n_sources", F.lit(0)).cast("int").alias("n_sources"),
            "n_within",
            "median_dist_m",
            "median_time_s",
            F.lit(float(limit_m)).alias("limit_m"),
        )
        .orderBy("category")
    )


def reach_pivot(reach: DataFrame) -> DataFrame:
    """The reference's wide {dist,time,poi}_{category} layout
    (precompute_poi_reach.py:168-170) as a pivot over the long table —
    kept for sink parity; the long form is the queryable one."""
    cats = [r["category"] for r in reach.select("category").distinct().orderBy("category").collect()]
    return (
        reach.groupBy("node_idx")
        .pivot("category", cats)
        .agg(
            F.first("dist_m").alias("dist"),
            F.first("time_s").alias("time"),
            F.first("poi_id").alias("poi"),
        )
        .orderBy("node_idx")
    )
