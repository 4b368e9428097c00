"""K7 plot sinks — dependency-free SVG versions of the reference's
matplotlib previews (network: graph_construction.py:97-119 `save_network_png`;
grid overview: grid_creation.py:145-190 `plot_overview`).

A plot is a driver-side artifact by nature (one picture), so these sinks
collect — but BOUNDED and cheap: the network sink samples down to
``max_edges`` distributed-side (nothing unbounded reaches the driver), and
the grid sink draws tile records (thousands at country scale, trivially
small).  The heavy inputs (full edge table) stay in Spark; only the
to-be-drawn coordinates move.  No matplotlib in this container — SVG is
plain text, so the sink is stdlib-only and the output opens in any
browser.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tab20-ish categorical palette (hex), keyed by highway tag order of
# appearance — mirrors the reference's cmap("tab20") per-highway coloring.
_PALETTE = (
    "#1f77b4", "#aec7e8", "#ff7f0e", "#ffbb78", "#2ca02c", "#98df8a",
    "#d62728", "#ff9896", "#9467bd", "#c5b0d5", "#8c564b", "#c49c94",
    "#e377c2", "#f7b6d2", "#7f7f7f", "#c7c7c7", "#bcbd22", "#dbdb8d",
    "#17becf", "#9edae5",
)


def _hash_sample(df: DataFrame, n: int) -> list:
    """Deterministic, extent-covering down-sample: order by a hash of the
    row and take the top ``n`` (TakeOrderedAndProject — distributed-side).
    Unlike ``.limit(n)`` (first partitions ⇒ one spatially contiguous
    corner), a hash order draws a reproducible spread over the whole
    extent regardless of input partitioning."""
    return df.orderBy(F.hash(*df.columns)).limit(n).collect()


def _scaler(min_x, max_x, min_y, max_y, width, height, pad):
    span_x = max(max_x - min_x, 1e-12)
    span_y = max(max_y - min_y, 1e-12)
    sx = (width - 2 * pad) / span_x
    sy = (height - 2 * pad) / span_y

    def to_px(lon, lat):
        # SVG y grows downward; lat grows upward
        return (pad + (lon - min_x) * sx, height - pad - (lat - min_y) * sy)

    return to_px


def _network_scene(nodes, edges, width, height, max_edges, max_nodes, what):
    """Shared gather step for the network preview twins (SVG + PNG): the
    bounded hash samples and the pixel scaler."""
    e_cols = ["u_lon", "u_lat", "v_lon", "v_lat"] + (
        ["highway"] if "highway" in edges.columns else []
    )
    e = _hash_sample(edges.select(*e_cols), max_edges)
    n = _hash_sample(nodes.select("lon", "lat"), max_nodes)
    xs = [r["lon"] for r in n] + [r["u_lon"] for r in e] + [r["v_lon"] for r in e]
    ys = [r["lat"] for r in n] + [r["u_lat"] for r in e] + [r["v_lat"] for r in e]
    if not xs:
        raise ValueError(f"{what}: empty inputs")
    to_px = _scaler(min(xs), max(xs), min(ys), max(ys), width, height, pad=20)
    return e, n, e_cols, to_px


def write_network_svg(
    nodes: DataFrame,
    edges: DataFrame,
    path: str,
    width: int = 900,
    height: int = 900,
    max_edges: int = 50_000,
    max_nodes: int = 50_000,
) -> str:
    """Walking-network preview (K7 twin of `save_network_png`): one line
    per edge colored by highway class, one faint dot per node.

    ``edges`` needs (u_lon, u_lat, v_lon, v_lat[, highway]); ``nodes``
    needs (lon, lat).  Inputs above the caps are down-sampled
    distributed-side by deterministic hash order (see ``_hash_sample``) so
    the preview covers the whole extent reproducibly."""
    e, n, e_cols, to_px = _network_scene(
        nodes, edges, width, height, max_edges, max_nodes, "write_network_svg"
    )

    colors: dict[str, str] = {}
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
    ]
    for r in e:
        hw = (r["highway"] or "") if "highway" in e_cols else ""
        hw = str(hw).strip().lower()
        if hw not in colors:
            colors[hw] = _PALETTE[len(colors) % len(_PALETTE)] if hw else "#808080"
        x1, y1 = to_px(r["u_lon"], r["u_lat"])
        x2, y2 = to_px(r["v_lon"], r["v_lat"])
        parts.append(
            f'<line x1="{x1:.1f}" y1="{y1:.1f}" x2="{x2:.1f}" y2="{y2:.1f}" '
            f'stroke="{colors[hw]}" stroke-width="0.6"/>'
        )
    for r in n:
        x, y = to_px(r["lon"], r["lat"])
        parts.append(f'<circle cx="{x:.1f}" cy="{y:.1f}" r="1.5" fill="black" opacity="0.3"/>')
    parts.append("</svg>")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(parts))
    return path


def _path_scene(edges, path_steps, width, height, radius_m, max_edges, what):
    """Shared gather step for the path-overlay twins (SVG + PNG): the
    collected route, the halo-pruned + hash-sampled local network, and
    the pixel scaler."""
    steps = [
        (r["seq"], float(r["lon"]), float(r["lat"]))
        for r in path_steps.select("seq", "lon", "lat").orderBy("seq").collect()
    ]
    if not steps:
        raise ValueError(f"{what}: empty path")
    p_lons = [s[1] for s in steps]
    p_lats = [s[2] for s in steps]
    import math

    halo_lat = radius_m / 111_320.0
    halo_lon = halo_lat / max(math.cos(math.radians(sum(p_lats) / len(p_lats))), 1e-6)
    lo_x, hi_x = min(p_lons) - halo_lon, max(p_lons) + halo_lon
    lo_y, hi_y = min(p_lats) - halo_lat, max(p_lats) + halo_lat

    e_cols = ["u_lon", "u_lat", "v_lon", "v_lat"]
    # BOTH endpoints inside the halo — the reference's prune is
    # keep_mask[u] & keep_mask[v] (test_path.py:345-348), and a one-sided
    # filter would let a kept edge's far endpoint blow up the plot extent
    local = edges.select(*e_cols).where(
        (F.col("u_lon") >= lo_x) & (F.col("u_lon") <= hi_x)
        & (F.col("u_lat") >= lo_y) & (F.col("u_lat") <= hi_y)
        & (F.col("v_lon") >= lo_x) & (F.col("v_lon") <= hi_x)
        & (F.col("v_lat") >= lo_y) & (F.col("v_lat") <= hi_y)
    )
    e = _hash_sample(local, max_edges)

    xs = p_lons + [r["u_lon"] for r in e] + [r["v_lon"] for r in e]
    ys = p_lats + [r["u_lat"] for r in e] + [r["v_lat"] for r in e]
    to_px = _scaler(min(xs), max(xs), min(ys), max(ys), width, height, pad=20)
    return steps, e, to_px


def write_path_svg(
    edges: DataFrame,
    path_steps: DataFrame,
    path: str,
    width: int = 900,
    height: int = 900,
    radius_m: float = 1000.0,
    max_edges: int = 60_000,
) -> str:
    """Path-overlay preview (K7 twin of the reference's
    `test_path.py:336-364` `render_local_png`): the local walking network
    around the route, the route polyline on top, and start / destination-POI
    markers (edges + route only, like the reference render — no node
    scatter).

    ``path_steps`` is the §3.3 path output (seq, lon, lat, ...;
    `plans/query.py: path_to_nearest_poi`) — bounded by the reach limit, so
    collecting it is cheap.  The network context is pruned SPARK-SIDE to a
    ``radius_m`` halo around the route's bounding box (the reference prunes
    by haversine radius around the query point) and hash-down-sampled to
    ``max_edges`` — the reference uses `RandomState(0).choice`; a hash
    order is the distributed equivalent of that fixed-seed sample."""
    steps, e, to_px = _path_scene(
        edges, path_steps, width, height, radius_m, max_edges, "write_path_svg"
    )

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
    ]
    for r in e:
        x1, y1 = to_px(r["u_lon"], r["u_lat"])
        x2, y2 = to_px(r["v_lon"], r["v_lat"])
        parts.append(
            f'<line x1="{x1:.1f}" y1="{y1:.1f}" x2="{x2:.1f}" y2="{y2:.1f}" '
            f'stroke="#9e9e9e" stroke-width="0.4" opacity="0.6"/>'
        )
    pts = " ".join(f"{x:.1f},{y:.1f}" for x, y in (to_px(lo, la) for _, lo, la in steps))
    parts.append(
        f'<polyline points="{pts}" fill="none" stroke="#d62728" '
        f'stroke-width="2.5" class="route"/>'
    )
    sx, sy = to_px(steps[0][1], steps[0][2])
    ex, ey = to_px(steps[-1][1], steps[-1][2])
    parts.append(f'<circle cx="{sx:.1f}" cy="{sy:.1f}" r="5" fill="#2ca02c" class="start"/>')
    parts.append(f'<circle cx="{ex:.1f}" cy="{ey:.1f}" r="5" fill="#ff7f0e" class="poi"/>')
    parts.append("</svg>")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(parts))
    return path


def geojson_outline_rings(spark, path: str) -> DataFrame:
    """Flatten a GeoJSON FeatureCollection's Polygon/MultiPolygon
    boundaries to (ring_id, seq, lon, lat) rows — the country-outline
    layer input of ``write_grid_svg`` (reference: `grid_creation.py:157`
    reads `data/poland.geojson` and draws `country.boundary` under the
    grid).  Loads through the S8 ``read_json_records`` source; the
    inferred nesting depth of `coordinates` distinguishes Polygon
    (rings→points, depth 3) from MultiPolygon (polygons→rings→points,
    depth 4).  All flattening is posexplode — distributed, ordered by
    the explicit ring/seq indices, never a driver-side JSON walk."""
    from pyspark.sql.types import ArrayType, DoubleType

    from .io import read_json_records

    geom = (
        read_json_records(spark, path)
        .select(F.posexplode("features").alias("fid", "f"))
        .select(
            "fid",
            F.col("f.geometry.type").alias("gtype"),
            F.col("f.geometry.coordinates").alias("coords"),
        )
    )
    depth, dt = 0, geom.schema["coords"].dataType
    while isinstance(dt, ArrayType):
        depth, dt = depth + 1, dt.elementType
    if depth == 4:  # homogeneous MultiPolygon file
        rings = geom.select(
            "fid", F.posexplode("coords").alias("pi", "polys")
        ).select("fid", "pi", F.posexplode("polys").alias("ri", "ring"))
    elif depth == 3:  # homogeneous Polygon file
        rings = geom.select(
            "fid", F.lit(0).alias("pi"), F.posexplode("coords").alias("ri", "ring")
        )
    else:
        # MIXED geometry types (Polygon + MultiPolygon, or stray Point/
        # LineString features) — common in published boundary files.  The
        # JSON reader cannot merge depth-3 and depth-4 arrays, so
        # `coordinates` collapses to STRING holding the raw JSON token;
        # re-parse it per geometry type with the right nested-array
        # schema and draw only the polygon boundaries (an outline layer
        # has nothing to draw for points/lines).
        poly_t = ArrayType(ArrayType(ArrayType(DoubleType())))
        mpoly_t = ArrayType(poly_t)
        s = geom.select("fid", "gtype", F.col("coords").cast("string").alias("cs"))
        rings = (
            s.where(F.col("gtype") == "Polygon")
            .select(
                "fid",
                F.lit(0).alias("pi"),
                F.posexplode(F.from_json("cs", poly_t)).alias("ri", "ring"),
            )
            .unionByName(
                s.where(F.col("gtype") == "MultiPolygon")
                .select("fid", F.posexplode(F.from_json("cs", mpoly_t)).alias("pi", "polys"))
                .select("fid", "pi", F.posexplode("polys").alias("ri", "ring"))
            )
        )
    return rings.select(
        F.concat_ws("-", "fid", "pi", "ri").alias("ring_id"),
        F.posexplode("ring").alias("seq", "pt"),
    ).select(
        "ring_id",
        "seq",
        F.col("pt")[0].cast("double").alias("lon"),
        F.col("pt")[1].cast("double").alias("lat"),
    )


def write_grid_svg(
    tiles: DataFrame,
    path: str,
    width: int = 900,
    height: int = 800,
    outline: DataFrame | None = None,
) -> str:
    """Grid overview (K7 twin of `plot_overview`): tile rectangles with
    dashed buffer halos and grid_id labels at centroids, optionally over a
    country-outline layer (``outline`` = (ring_id, seq, lon, lat) rows,
    see ``geojson_outline_rings``) exactly as the reference draws its
    grid over `country.boundary` (grid_creation.py:145-229).  The outline
    collect is bounded by nature — a country boundary is thousands of
    points."""
    o: list = []
    if outline is not None:
        o = outline.select("ring_id", "seq", "lon", "lat").orderBy(
            "ring_id", "seq"
        ).collect()
    t = tiles.select(
        "grid_id",
        F.col("tile_bbox.minlon").alias("t0"),
        F.col("tile_bbox.minlat").alias("t1"),
        F.col("tile_bbox.maxlon").alias("t2"),
        F.col("tile_bbox.maxlat").alias("t3"),
        F.col("buffer_bbox.minlon").alias("b0"),
        F.col("buffer_bbox.minlat").alias("b1"),
        F.col("buffer_bbox.maxlon").alias("b2"),
        F.col("buffer_bbox.maxlat").alias("b3"),
        F.col("centroid.lon").alias("clon"),
        F.col("centroid.lat").alias("clat"),
    ).collect()
    if not t:
        raise ValueError("write_grid_svg: empty tile table")
    to_px = _scaler(
        min([r["b0"] for r in t] + [r["lon"] for r in o]),
        max([r["b2"] for r in t] + [r["lon"] for r in o]),
        min([r["b1"] for r in t] + [r["lat"] for r in o]),
        max([r["b3"] for r in t] + [r["lat"] for r in o]),
        width,
        height,
        pad=20,
    )
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
    ]
    # country outline UNDER the grid, one polyline per ring (the rings
    # arrive closed — GeoJSON repeats the first point — so a polyline
    # draws the full boundary loop)
    rings: dict[str, list] = {}
    for r in o:
        rings.setdefault(r["ring_id"], []).append((r["lon"], r["lat"]))
    for ring_pts in rings.values():
        pts = " ".join(
            f"{x:.1f},{y:.1f}" for x, y in (to_px(lo, la) for lo, la in ring_pts)
        )
        parts.append(
            f'<polyline points="{pts}" fill="none" stroke="#333333" '
            f'stroke-width="1" class="outline"/>'
        )

    def rect(x0, y0, x1, y1, style):
        (px0, py1), (px1, py0) = to_px(x0, y0), to_px(x1, y1)
        w, h = px1 - px0, py1 - py0
        parts.append(f'<rect x="{px0:.1f}" y="{py0:.1f}" width="{w:.1f}" height="{h:.1f}" {style}/>')

    for r in t:
        rect(r["b0"], r["b1"], r["b2"], r["b3"],
             'fill="none" stroke="#ff7f0e" stroke-width="0.7" stroke-dasharray="4 3"')
    for r in t:
        rect(r["t0"], r["t1"], r["t2"], r["t3"], 'fill="none" stroke="#1f77b4" stroke-width="1"')
        cx, cy = to_px(r["clon"], r["clat"])
        parts.append(
            f'<text x="{cx:.1f}" y="{cy:.1f}" font-size="8" text-anchor="middle" '
            f'fill="#444">{r["grid_id"]}</text>'
        )
    parts.append("</svg>")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(parts))
    return path


# ---------------------------------------------------------------------------
# K7 raster twins — real .png artifacts, stdlib encoder (zlib + struct)
# ---------------------------------------------------------------------------
# The reference's actual raster sinks are matplotlib PNGs
# (graph_construction.py:97-121 save_network_png; test_path.py:335-364
# render_local_png).  This container has no imaging library, but PNG
# itself is just zlib-compressed filtered scanlines in CRC-framed chunks
# — so the raster twins encode an RGB numpy buffer directly and stay
# dependency-free like the SVG twins.  Same bounded scene gathering
# (_network_scene/_path_scene), same palette; rasterization is dense
# point-plotting along each segment (the sampled scene is bounded, so
# the loop is driver-cheap by construction).


def _hex_rgb(h: str) -> tuple:
    return (int(h[1:3], 16), int(h[3:5], 16), int(h[5:7], 16))


def _png_bytes(rgb) -> bytes:
    """HxWx3 uint8 → PNG bytes: 8-bit/truecolor, filter 0 per scanline."""
    import struct
    import zlib

    h, w, _ = rgb.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def _blank(width: int, height: int):
    import numpy as np

    return np.full((height, width, 3), 255, dtype=np.uint8)


def _plot_segment(img, x0, y0, x1, y1, rgb):
    """Dense point-plot along the segment (one sample per pixel of the
    longer axis) — clipped to the buffer."""
    import numpy as np

    h, w, _ = img.shape
    n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
    xs = np.clip(np.round(np.linspace(x0, x1, n)).astype(int), 0, w - 1)
    ys = np.clip(np.round(np.linspace(y0, y1, n)).astype(int), 0, h - 1)
    img[ys, xs] = rgb


def _plot_disk(img, x, y, r, rgb):
    import numpy as np

    h, w, _ = img.shape
    y0, y1 = max(int(y - r), 0), min(int(y + r) + 1, h)
    x0, x1 = max(int(x - r), 0), min(int(x + r) + 1, w)
    if y0 >= y1 or x0 >= x1:
        return
    yy, xx = np.mgrid[y0:y1, x0:x1]
    mask = (yy - y) ** 2 + (xx - x) ** 2 <= r * r
    img[y0:y1, x0:x1][mask] = rgb


def write_network_png(
    nodes: DataFrame,
    edges: DataFrame,
    path: str,
    width: int = 900,
    height: int = 900,
    max_edges: int = 50_000,
    max_nodes: int = 50_000,
) -> str:
    """Raster twin of ``write_network_svg`` (the reference's
    `save_network_png` shape): per-highway-class edge colors over faint
    node dots, written as a real .png."""
    e, n, e_cols, to_px = _network_scene(
        nodes, edges, width, height, max_edges, max_nodes, "write_network_png"
    )
    img = _blank(width, height)
    colors: dict[str, tuple] = {}
    for r in e:
        hw = (r["highway"] or "") if "highway" in e_cols else ""
        hw = str(hw).strip().lower()
        if hw not in colors:
            colors[hw] = (
                _hex_rgb(_PALETTE[len(colors) % len(_PALETTE)]) if hw else (128, 128, 128)
            )
        x1, y1 = to_px(r["u_lon"], r["u_lat"])
        x2, y2 = to_px(r["v_lon"], r["v_lat"])
        _plot_segment(img, x1, y1, x2, y2, colors[hw])
    gray = (179, 179, 179)
    for r in n:
        x, y = to_px(r["lon"], r["lat"])
        _plot_disk(img, x, y, 1.2, gray)
    with open(path, "wb") as f:
        f.write(_png_bytes(img))
    return path


def write_path_png(
    edges: DataFrame,
    path_steps: DataFrame,
    path: str,
    width: int = 900,
    height: int = 900,
    radius_m: float = 1000.0,
    max_edges: int = 60_000,
) -> str:
    """Raster twin of ``write_path_svg`` (the reference's
    `render_local_png` shape): the halo-pruned local network in gray, the
    route polyline in red, start/POI marker disks."""
    steps, e, to_px = _path_scene(
        edges, path_steps, width, height, radius_m, max_edges, "write_path_png"
    )
    img = _blank(width, height)
    gray = (158, 158, 158)
    for r in e:
        x1, y1 = to_px(r["u_lon"], r["u_lat"])
        x2, y2 = to_px(r["v_lon"], r["v_lat"])
        _plot_segment(img, x1, y1, x2, y2, gray)
    route = _hex_rgb("#d62728")
    px = [to_px(lo, la) for _, lo, la in steps]
    for (x1, y1), (x2, y2) in zip(px, px[1:]):
        _plot_segment(img, x1, y1, x2, y2, route)
    _plot_disk(img, *px[0], 5, _hex_rgb("#2ca02c"))
    _plot_disk(img, *px[-1], 5, _hex_rgb("#ff7f0e"))
    with open(path, "wb") as f:
        f.write(_png_bytes(img))
    return path


def read_png_rgb(path: str):
    """Decode a filter-0 truecolor PNG written by ``_png_bytes`` back to
    an HxWx3 uint8 array — the test-side verifier (no imaging library in
    the container, so the roundtrip check is also stdlib)."""
    import struct
    import zlib

    import numpy as np

    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        assert crc == (zlib.crc32(tag + body) & 0xFFFFFFFF), f"bad CRC in {tag!r}"
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            assert (depth, ctype) == (8, 2), "not 8-bit truecolor"
        elif tag == b"IDAT":
            idat += body
        pos += 12 + ln
    raw = zlib.decompress(idat)
    out = np.empty((h, w, 3), dtype=np.uint8)
    stride = 1 + w * 3
    for y in range(h):
        row = raw[y * stride : (y + 1) * stride]
        assert row[0] == 0, "non-zero scanline filter"
        out[y] = np.frombuffer(row[1:], dtype=np.uint8).reshape(w, 3)
    return out
