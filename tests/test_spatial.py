"""Spatial layer tests: cells, PIP join, kNN ring expansion, raster tiles.

Oracles: pure-NumPy brute force + the SQL generators run through DuckDB,
so the exact expressions the driver's correctness gate uses are also
pinned here.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from external_merge_sort_loser_tree_ovc_spark.sources.fixtures import pages_frame
from external_merge_sort_loser_tree_ovc_spark.spatial import cells
from external_merge_sort_loser_tree_ovc_spark.spatial.pip import Polygon, default_polygons


# --- cells -------------------------------------------------------------------

def test_encode_grid_roundtrip_and_bounds():
    lat = np.array([-90.0, -89.999, 0.0, 45.5, 89.999, 90.0])
    lon = np.array([-180.0, -179.9, 0.0, 12.25, 179.9, 180.0])
    for res in (0, 1, 4, 9, 15):
        xg, yg = cells.encode_grid(lat, lon, res)
        n = 1 << res
        assert xg.min() >= 0 and xg.max() < n
        assert yg.min() >= 0 and yg.max() < n
        cid = cells.cell_id(xg, yg, res)
        bx, by = cells.cell_to_xy(cid, res)
        assert (bx == xg).all() and (by == yg).all()


def test_cell_sql_expr_matches_numpy():
    rng = np.random.default_rng(7)
    lat = rng.uniform(-90, 90, 2000)
    lon = rng.uniform(-180, 180, 2000)
    res = 7
    expect = cells.encode_cell(lat, lon, res)
    df = pd.DataFrame({"lat": lat, "lon": lon})
    got = duckdb.sql(
        f"SELECT {cells.sql_cell_expr('lat', 'lon', res)} AS c FROM df"
    ).fetchnumpy()["c"]
    assert (got == expect).all()


def test_morton_roundtrip_and_locality():
    rng = np.random.default_rng(3)
    xg = rng.integers(0, 1 << 20, 5000)
    yg = rng.integers(0, 1 << 20, 5000)
    m = cells.morton_id(xg, yg)
    bx, by = cells.morton_to_xy(m)
    assert (bx == xg).all() and (by == yg).all()
    # locality: sorting by morton gives smaller mean neighbour distance
    # than sorting by row-major id
    order_m = np.argsort(m)
    order_r = np.argsort(cells.cell_id(xg, yg, 20))

    def mean_step(order):
        dx = np.diff(xg[order]).astype(float)
        dy = np.diff(yg[order]).astype(float)
        return np.hypot(dx, dy).mean()

    assert mean_step(order_m) < mean_step(order_r)


def test_parent_children():
    cid = cells.encode_cell(np.array([40.0]), np.array([-3.0]), 10)
    kids = cells.children_cells(int(cid[0]), 10, 12)
    assert len(kids) == 16
    back = cells.parent_cell(kids, 12, 10)
    assert (back == cid[0]).all()


def test_ring_offsets():
    assert len(cells.ring_offsets(0)) == 1
    for k in (1, 2, 5):
        ring = cells.ring_offsets(k)
        assert len(ring) == 8 * k
        cheb = np.abs(ring).max(axis=1)
        assert (cheb == k).all()
    disk = cells.disk_offsets(3)
    assert len(disk) == 49


def test_neighbours_wrap_and_clamp():
    res = 4  # 16x16 grid
    idx, nx, ny = cells.neighbours([0], [0], res, cells.disk_offsets(1))
    # lat clamps: ny=-1 dropped -> 6 of 9 remain; lon wraps: x=-1 -> 15
    assert len(nx) == 6
    assert 15 in nx.tolist()
    assert (ny >= 0).all()


# --- point in polygon ---------------------------------------------------------

def test_pip_numpy_vs_sql_and_bbox():
    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 180, 4000)
    lat = rng.uniform(-90, 90, 4000)
    df = pd.DataFrame({"lon": lon, "lat": lat})
    for poly in default_polygons():
        mask = poly.contains(lon, lat)
        got = duckdb.sql(
            f"SELECT {poly.sql_pip_expr('lon', 'lat')} AS m FROM df"
        ).fetchnumpy()["m"]
        assert (got == mask).all(), f"poly {poly.poly_id} sql mismatch"
        # everything inside must be inside the bbox
        lon_min, lat_min, lon_max, lat_max = poly.bbox
        assert (lon[mask] >= lon_min).all() and (lon[mask] <= lon_max).all()
        assert (lat[mask] >= lat_min).all() and (lat[mask] <= lat_max).all()
        assert 0 < mask.sum() < len(mask)


def test_pip_known_points():
    tri = Polygon(9, [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)])
    inside = tri.contains(np.array([1.0, 9.0, 5.01]), np.array([1.0, 0.5, 5.1]))
    assert inside.tolist() == [True, True, False]


def test_cover_cells_superset():
    poly = default_polygons()[0]
    res = 6
    cover = set(poly.cover_cells(res).tolist())
    rng = np.random.default_rng(5)
    lon = rng.uniform(-180, 180, 20000)
    lat = rng.uniform(-90, 90, 20000)
    mask = poly.contains(lon, lat)
    hit_cells = set(cells.encode_cell(lat[mask], lon[mask], res).tolist())
    assert hit_cells <= cover


# --- Spark integration --------------------------------------------------------

@pytest.fixture(scope="module")
def pages(spark):
    pdf = pages_frame(3000, seed=42)
    return spark.createDataFrame(pdf)


def test_with_grid_matches_numpy(spark, pages):
    from external_merge_sort_loser_tree_ovc_spark.spatial.ops import with_grid

    res = 7
    got = (
        with_grid(pages, "lat", "lon", res)
        .select("url", "lat", "lon", "cell")
        .toPandas()
        .sort_values("url", ignore_index=True)
    )
    expect = cells.encode_cell(got["lat"].to_numpy(), got["lon"].to_numpy(), res)
    assert (got["cell"].to_numpy() == expect).all()


def test_with_morton_matches_numpy(spark, pages):
    from external_merge_sort_loser_tree_ovc_spark.spatial.ops import with_grid, with_morton

    df = with_morton(with_grid(pages, "lat", "lon", 15))
    got = df.select("xg", "yg", "morton").toPandas()
    expect = cells.morton_id(got["xg"].to_numpy(), got["yg"].to_numpy())
    assert (got["morton"].to_numpy() == expect).all()


def test_pip_join_matches_bruteforce(spark, pages):
    from external_merge_sort_loser_tree_ovc_spark.spatial.ops import pip_join

    polys = default_polygons()
    got = (
        pip_join(pages, polys, res=6, keep_cols=["url"])
        .toPandas()
        .sort_values(["url", "poly_id"], ignore_index=True)
    )
    pdf = pages.select("url", "lat", "lon").toPandas()
    rows = []
    for p in polys:
        m = p.contains(pdf["lon"].to_numpy(), pdf["lat"].to_numpy())
        for u in pdf["url"].to_numpy()[m]:
            rows.append((u, p.poly_id))
    expect = pd.DataFrame(rows, columns=["url", "poly_id"]).sort_values(
        ["url", "poly_id"], ignore_index=True
    )
    assert len(got) == len(expect) > 0
    assert (got["url"].to_numpy() == expect["url"].to_numpy()).all()
    assert (got["poly_id"].to_numpy() == expect["poly_id"].to_numpy()).all()


def test_knn_matches_bruteforce(spark):
    from external_merge_sort_loser_tree_ovc_spark.spatial.knn import knn_join

    rng = np.random.default_rng(23)
    n = 1200
    pts = pd.DataFrame(
        {
            "point_id": np.arange(n, dtype=np.int64),
            "xi": rng.integers(0, 4096, n),
            "yi": rng.integers(0, 4096, n),
        }
    )
    qs = pts.iloc[::40].rename(columns={"point_id": "query_id"}).reset_index(drop=True)
    k = 5
    got = (
        knn_join(
            spark.createDataFrame(pts),
            spark.createDataFrame(qs),
            k,
            index_shift=9,
        )
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    # brute force in numpy with the same (dist2, point_id) tie-break
    rows = []
    for _, q in qs.iterrows():
        d2 = (pts.xi - q.xi) ** 2 + (pts.yi - q.yi) ** 2
        order = np.lexsort((pts.point_id.to_numpy(), d2.to_numpy()))[:k]
        for r, i in enumerate(order, 1):
            rows.append((q.query_id, pts.point_id[i], int(d2[i]), r))
    expect = pd.DataFrame(rows, columns=["query_id", "point_id", "dist2", "rank"])
    expect = expect.sort_values(["query_id", "rank"], ignore_index=True)
    assert len(got) == len(expect)
    for c in ["query_id", "point_id", "dist2", "rank"]:
        assert (got[c].to_numpy() == expect[c].to_numpy()).all(), c


def test_raster_tiles(spark, pages):
    from external_merge_sort_loser_tree_ovc_spark.spatial.ops import (
        polygon_tiles_df,
        with_tile,
    )

    zoom = 5
    tiled = with_tile(pages, "lat", "lon", zoom).select("tile_x", "tile_y", "tile_id")
    got = tiled.toPandas()
    assert ((got.tile_id == (got.tile_y * (1 << zoom) + got.tile_x))).all()
    pt = polygon_tiles_df(spark, default_polygons(), zoom).toPandas()
    assert len(pt) > 0 and pt.poly_id.nunique() == 3
