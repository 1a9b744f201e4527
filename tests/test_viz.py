from __future__ import annotations

from bike_data_flow_spark.operators.analytics import Grid
from bike_data_flow_spark.viz import render_density_map


def test_density_map_svg_fallback(tmp_path):
    grid = Grid(min_lat=51.0, min_lon=17.0, lat_delta=0.01, lon_delta=0.01, n_cells_side=4)
    cells = [
        {"bin_lat": 0, "bin_lon": 0, "bike_count": 10, "station_records": 2, "bike_records": 1},
        {"bin_lat": 3, "bin_lon": 2, "bike_count": 3, "station_records": 1, "bike_records": 0},
    ]
    out = render_density_map(cells, grid, tmp_path / "maps" / "density.html")
    html = out.read_text()
    assert "<svg" in html and "bikes=10" in html
    assert out.exists() and out.parent.name == "maps"


def test_density_map_empty_cells(tmp_path):
    grid = Grid(min_lat=0, min_lon=0, lat_delta=1, lon_delta=1, n_cells_side=2)
    out = render_density_map([], grid, tmp_path / "empty.html")
    assert "<svg" in out.read_text()
