"""Presentation layer: density-map rendering over collected results.

Reference: bike_density_map (bike_spatial_density_analysis.py:200-406)
renders a Plotly scatter-map of grid-density cells to HTML. This is
driver-side work over a tiny collect() (≤ grid cells rows) — outside
the query engine by design (SURVEY §2.10: sink-side rendering).

Plotly isn't installed in this container, so the renderer degrades to
a dependency-free inline-SVG heatmap with identical inputs; the
Plotly path is used when available.
"""

from __future__ import annotations

from pathlib import Path

try:  # pragma: no cover - not installed here
    import plotly.graph_objects as go

    HAVE_PLOTLY = True
except ImportError:
    HAVE_PLOTLY = False


def render_density_map(
    cells: list[dict],
    grid,
    out_path: str | Path,
    title: str = "Bike density",
) -> Path:
    """cells: collected rows of analytics.grid_density
    (bin_lat, bin_lon, bike_count, station_records, bike_records);
    grid: analytics.Grid. Writes a standalone HTML file."""
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    if HAVE_PLOTLY:  # pragma: no cover
        lats = [grid.min_lat + (c["bin_lat"] + 0.5) * grid.lat_delta for c in cells]
        lons = [grid.min_lon + (c["bin_lon"] + 0.5) * grid.lon_delta for c in cells]
        sizes = [max(4, min(40, c["bike_count"])) for c in cells]
        fig = go.Figure(
            go.Scattermap(
                lat=lats, lon=lons, mode="markers",
                marker={"size": sizes, "color": [c["bike_count"] for c in cells]},
                text=[f"bikes={c['bike_count']}" for c in cells],
            )
        )
        fig.update_layout(title=title, map_style="open-street-map")
        fig.write_html(str(out_path))
        return out_path

    side = grid.n_cells_side
    max_count = max((c["bike_count"] or 0) for c in cells) if cells else 1
    cell_px = max(8, 640 // max(side, 1))
    rects = []
    for c in cells:
        x = c["bin_lon"] * cell_px
        y = (side - 1 - c["bin_lat"]) * cell_px  # north up
        frac = (c["bike_count"] or 0) / max_count if max_count else 0
        shade = int(255 - 200 * frac)
        rects.append(
            f'<rect x="{x}" y="{y}" width="{cell_px}" height="{cell_px}" '
            f'fill="rgb(255,{shade},{shade})" stroke="#ccc">'
            f"<title>bin=({c['bin_lat']},{c['bin_lon']}) "
            f"bikes={c['bike_count']} stations={c['station_records']}</title></rect>"
        )
    svg = (
        f'<svg xmlns="http://www.w3.org/2000/svg" '
        f'width="{side * cell_px}" height="{side * cell_px}">{"".join(rects)}</svg>'
    )
    out_path.write_text(
        f"<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{title}</title></head><body><h1>{title}</h1>"
        f"<p>grid {side}x{side}, max bike_count {max_count}</p>{svg}</body></html>",
        encoding="utf-8",
    )
    return out_path
