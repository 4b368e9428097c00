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


def _scaler(min_x, max_x, min_y, max_y, width, height, pad):
    span_x = max(max_x - min_x, 1e-12)
    span_y = max(max_y - min_y, 1e-12)
    sx = (width - 2 * pad) / span_x
    sy = (height - 2 * pad) / span_y

    def to_px(lon, lat):
        # SVG y grows downward; lat grows upward
        return (pad + (lon - min_x) * sx, height - pad - (lat - min_y) * sy)

    return to_px


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
    distributed-side with a deterministic TABLESAMPLE-free limit."""
    e_cols = ["u_lon", "u_lat", "v_lon", "v_lat"] + (
        ["highway"] if "highway" in edges.columns else []
    )
    e = edges.select(*e_cols).limit(max_edges).collect()
    n = nodes.select("lon", "lat").limit(max_nodes).collect()
    xs = [r["lon"] for r in n] + [r["u_lon"] for r in e] + [r["v_lon"] for r in e]
    ys = [r["lat"] for r in n] + [r["u_lat"] for r in e] + [r["v_lat"] for r in e]
    if not xs:
        raise ValueError("write_network_svg: empty inputs")
    to_px = _scaler(min(xs), max(xs), min(ys), max(ys), width, height, pad=20)

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


def write_grid_svg(tiles: DataFrame, path: str, width: int = 900, height: int = 800) -> str:
    """Grid overview (K7 twin of `plot_overview`): tile rectangles with
    dashed buffer halos and grid_id labels at centroids."""
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
        min(r["b0"] for r in t),
        max(r["b2"] for r in t),
        min(r["b1"] for r in t),
        max(r["b3"] for r in t),
        width,
        height,
        pad=20,
    )
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
    ]

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
