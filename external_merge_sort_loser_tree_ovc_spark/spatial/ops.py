"""Spark DataFrame spatial operators: cell encode, PIP join, raster tiles.

Design rules (SURVEY §4.3):
- cell/tile arithmetic is plain floor/shift math -> expressed with
  built-in column functions so it stays inside WholeStageCodegen (the
  whole scan+encode stage is JVM-side; zero Python in the hot path);
- the polygon cover set is tiny -> ``F.broadcast`` join, the page side
  never shuffles;
- exact point-in-polygon refinement is the only Python stage and runs
  vectorized (NumPy ray cast over Arrow batches via mapInPandas).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BooleanType, LongType, StructField, StructType

from .pip import Polygon


def with_grid(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    res: int,
    *,
    xg: str = "xg",
    yg: str = "yg",
    cell: str = "cell",
) -> DataFrame:
    """Add integer grid coords + row-major cell id. Pure built-in exprs
    (floor/least/greatest/shiftleft) — survives codegen, no UDF."""
    n = 1 << res
    xe = F.least(
        F.greatest(
            F.floor((F.col(lon_col) + F.lit(180.0)) / F.lit(360.0) * F.lit(n)).cast("bigint"),
            F.lit(0),
        ),
        F.lit(n - 1),
    )
    ye = F.least(
        F.greatest(
            F.floor((F.col(lat_col) + F.lit(90.0)) / F.lit(180.0) * F.lit(n)).cast("bigint"),
            F.lit(0),
        ),
        F.lit(n - 1),
    )
    out = df.withColumn(xg, xe).withColumn(yg, ye)
    return out.withColumn(cell, F.shiftleft(F.col(yg), res) + F.col(xg))


def with_morton(df: DataFrame, xg: str = "xg", yg: str = "yg", out: str = "morton") -> DataFrame:
    """Z-order key from grid coords, as built-in bit exprs (6-step
    magic-mask interleave unrolled into Catalyst expressions)."""

    def spread(col):
        masks = [
            (16, 0x0000FFFF0000FFFF),
            (8, 0x00FF00FF00FF00FF),
            (4, 0x0F0F0F0F0F0F0F0F),
            (2, 0x3333333333333333),
            (1, 0x5555555555555555),
        ]
        e = F.col(col).cast("bigint")
        for sh, mask in masks:
            e = (e.bitwiseOR(F.shiftleft(e, sh))).bitwiseAND(F.lit(mask))
        return e

    return df.withColumn(out, spread(xg).bitwiseOR(F.shiftleft(spread(yg), 1)))


def polygon_cover_df(spark, polygons: Iterable[Polygon], res: int) -> DataFrame:
    """(poly_id, cell) cover table — tiny, meant for F.broadcast."""
    rows = []
    for p in polygons:
        for c in p.cover_cells(res):
            rows.append((p.poly_id, int(c)))
    schema = StructType(
        [StructField("poly_id", LongType()), StructField("cell", LongType())]
    )
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["poly_id", "cell"]).astype("int64")
        if rows
        else pd.DataFrame({"poly_id": pd.Series(dtype="int64"), "cell": pd.Series(dtype="int64")}),
        schema=schema,
    )


def pip_join(
    pages: DataFrame,
    polygons: list[Polygon],
    res: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
    *,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Pages inside any polygon -> one row per (page, poly_id).

    Plan: encode cell (codegen) -> broadcast-join tiny cover set
    (candidates only; big side does NOT shuffle) -> vectorized ray-cast
    refine (mapInPandas) -> filter hits.
    """
    spark = pages.sparkSession
    keep_cols = keep_cols or pages.columns
    enc = with_grid(pages, lat_col, lon_col, res)
    cover = polygon_cover_df(spark, polygons, res)
    cand = enc.join(F.broadcast(cover), "cell")

    out_fields = [cand.schema[c] for c in keep_cols] + [
        StructField("poly_id", LongType()),
        StructField("inside", BooleanType()),
    ]
    out_schema = StructType(out_fields)
    polys = {p.poly_id: (p.vx.tolist(), p.vy.tolist()) for p in polygons}
    cols = list(keep_cols)

    def refine(it):
        pmap = {
            pid: Polygon(pid, list(zip(vx, vy))) for pid, (vx, vy) in polys.items()
        }
        for pdf in it:
            if pdf.empty:
                continue
            res_parts = []
            for pid, grp in pdf.groupby("poly_id", sort=False):
                mask = pmap[int(pid)].contains(
                    grp[lon_col].to_numpy(), grp[lat_col].to_numpy()
                )
                sub = grp[cols].copy()
                sub["poly_id"] = np.int64(pid)
                sub["inside"] = mask
                res_parts.append(sub)
            yield pd.concat(res_parts, ignore_index=True)

    # lat/lon must reach the refine kernel even when not in keep_cols
    sel = list(dict.fromkeys(cols + [lat_col, lon_col, "poly_id"]))
    refined = cand.select(*sel).mapInPandas(refine, schema=out_schema)
    return refined.filter(F.col("inside")).drop("inside")


# --- raster tiles -----------------------------------------------------------

def with_tile(
    df: DataFrame, lat_col: str, lon_col: str, zoom: int, *, tx: str = "tile_x", ty: str = "tile_y"
) -> DataFrame:
    """Equirectangular raster tile assignment at ``zoom`` (2^zoom x 2^zoom
    tile pyramid over [-180,180]x[-90,90]) — built-in exprs only."""
    return with_grid(df, lat_col, lon_col, zoom, xg=tx, yg=ty, cell="tile_id")


def polygon_tiles_df(spark, polygons: Iterable[Polygon], zoom: int) -> DataFrame:
    """raster-tile <-> vector assignment: (poly_id, tile_x, tile_y,
    tile_id) for every tile whose bbox intersects the polygon bbox."""
    from .cells import cell_to_xy

    rows = []
    for p in polygons:
        for c in p.cover_cells(zoom):
            x, y = cell_to_xy(np.asarray([c]), zoom)
            rows.append((p.poly_id, int(x[0]), int(y[0]), int(c)))
    cols = ["poly_id", "tile_x", "tile_y", "tile_id"]
    pdf = pd.DataFrame(rows, columns=cols).astype("int64") if rows else pd.DataFrame(
        {c: pd.Series(dtype="int64") for c in cols}
    )
    schema = StructType([StructField(c, LongType()) for c in cols])
    return spark.createDataFrame(pdf, schema=schema)
