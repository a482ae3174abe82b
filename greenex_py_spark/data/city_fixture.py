"""Full synthetic-city fixture (pytest + engine-pipeline inputs).

Extends the SQL-portable driver_city world with the pieces the driver
gate can't express in SQL: polygon greenspace *rings* (including
deliberately overlapping polygons for the dissolve operator and
sub-min-area ones for the area filter), a grid road network
(nodes/edges with both directions, for duplicate-edge removal), and
DSM/DTM/green-binary raster tiles with closed-form values so viewshed
results are hand-checkable (FIXTURES.md §2.4-2.5).

Deterministic — integer formulas only, no RNG.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..geo import kernels
from . import driver_city as city

# ---------------------------------------------------------------------------
# greenspace polygons (rings form) — driver_city rects + extras
# ---------------------------------------------------------------------------


def greenspace_rings_pdf() -> pd.DataFrame:
    """Pandas frame [gs_id, rings, minx..maxy, area, cx, cy, tag].

    gs_id 0..79: the driver_city rectangles (ring form).
    gs_id 80..89: L-shaped polygons (6-vertex) — non-rect clipping tests.
    gs_id 90..95: three overlapping pairs — dissolve tests.
    """
    g = city.greenspace_numpy()
    rows = []
    for i in range(city.N_GS):
        ring = kernels.box_ring(g["minx"][i], g["miny"][i], g["maxx"][i], g["maxy"][i])
        rows.append(
            dict(
                gs_id=int(g["gs_id"][i]),
                rings=[ring.ravel().tolist()],
                minx=g["minx"][i], miny=g["miny"][i],
                maxx=g["maxx"][i], maxy=g["maxy"][i],
                area=g["area"][i], cx=g["cx"][i], cy=g["cy"][i],
                tag=("landuse", "leisure", "natural")[i % 3],
            )
        )
    # L-shapes
    for j in range(10):
        gs_id = 80 + j
        x0 = city.X0 + 200.0 + j * 950.0
        y0 = city.Y0 + 8200.0
        w, h, t = 300.0, 300.0, 120.0  # outer square with a notch
        ring = np.array(
            [
                [x0, y0], [x0 + w, y0], [x0 + w, y0 + t],
                [x0 + t, y0 + t], [x0 + t, y0 + h], [x0, y0 + h],
            ]
        )
        rows.append(
            dict(
                gs_id=gs_id,
                rings=[ring.ravel().tolist()],
                minx=x0, miny=y0, maxx=x0 + w, maxy=y0 + h,
                area=kernels.polygon_area([ring]),
                cx=kernels.polygon_centroid([ring])[0],
                cy=kernels.polygon_centroid([ring])[1],
                tag=("landuse", "leisure", "natural")[gs_id % 3],
            )
        )
    # overlapping pairs
    for j in range(3):
        for k in range(2):
            gs_id = 90 + 2 * j + k
            x0 = city.X0 + 500.0 + j * 2000.0 + k * 150.0
            y0 = city.Y0 + 9200.0 + k * 100.0
            ring = kernels.box_ring(x0, y0, x0 + 250.0, y0 + 200.0)
            rows.append(
                dict(
                    gs_id=gs_id,
                    rings=[ring.ravel().tolist()],
                    minx=x0, miny=y0, maxx=x0 + 250.0, maxy=y0 + 200.0,
                    area=250.0 * 200.0,
                    cx=x0 + 125.0, cy=y0 + 100.0,
                    tag=("landuse", "leisure", "natural")[gs_id % 3],
                )
            )
    return pd.DataFrame(rows)


RINGS_SCHEMA = (
    "gs_id long, rings array<array<double>>, minx double, miny double, "
    "maxx double, maxy double, area double, cx double, cy double, tag string"
)


def greenspace_rings_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(greenspace_rings_pdf(), schema=RINGS_SCHEMA)


# ---------------------------------------------------------------------------
# road network — 200 m grid lattice (nodes/edges, both directions)
# ---------------------------------------------------------------------------

GRID_STEP = 200.0
GRID_N = 51  # 51×51 nodes over the 10 km city


def network_pdfs() -> tuple[pd.DataFrame, pd.DataFrame]:
    ids = np.arange(GRID_N * GRID_N, dtype=np.int64)
    gx = ids % GRID_N
    gy = ids // GRID_N
    nodes = pd.DataFrame(
        {
            "node_id": ids,
            "x": city.X0 + gx * GRID_STEP,
            "y": city.Y0 + gy * GRID_STEP,
        }
    )
    e = []
    for i in range(GRID_N * GRID_N):
        x, yv = gx[i], gy[i]
        if x + 1 < GRID_N:
            j = i + 1
            e.append((i, j)); e.append((j, i))  # both directions (T6 test)
        if yv + 1 < GRID_N:
            j = i + GRID_N
            e.append((i, j)); e.append((j, i))
    edges = pd.DataFrame(e, columns=["src", "dst"])
    edges = edges.merge(nodes.rename(columns={"node_id": "src", "x": "x1", "y": "y1"}), on="src")
    edges = edges.merge(nodes.rename(columns={"node_id": "dst", "x": "x2", "y": "y2"}), on="dst")
    edges["length"] = np.hypot(edges.x2 - edges.x1, edges.y2 - edges.y1)
    edges["geom_xs"] = edges.apply(lambda r: [float(r.x1), float(r.x2)], axis=1)
    edges["geom_ys"] = edges.apply(lambda r: [float(r.y1), float(r.y2)], axis=1)
    return nodes, edges[["src", "dst", "length", "geom_xs", "geom_ys"]]


def network_dfs(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    nodes, edges = network_pdfs()
    return (
        spark.createDataFrame(nodes, schema="node_id long, x double, y double"),
        spark.createDataFrame(
            edges,
            schema="src long, dst long, length double, geom_xs array<double>, geom_ys array<double>",
        ),
    )


# ---------------------------------------------------------------------------
# DSM / DTM / green-binary rasters (closed form; 5 m px for dsm/dtm)
# ---------------------------------------------------------------------------

DSM_RES = 5.0
DSM_NPX = 2000  # 10 km at 5 m


def surface_grid(tile_px: int = 256):
    """GridSpec of the 5 m dsm/dtm/green surface rasters."""
    from ..geo.grid import GridSpec

    return GridSpec.square(city.X0, city.Y0, DSM_RES, tile_px, DSM_NPX)


def dtm_value(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """Flat terrain — viewshed heights come from DSM blocks only."""
    return np.zeros(np.broadcast(ix, iy).shape, dtype=np.float64)


def dsm_value(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """DTM + building blocks: blocks on a 200 m pitch where
    (bx + by) % 7 == 0, with deterministic varying heights
    8..24 m (height ordering matters → the viewshed argument-swap bug
    produces different visibility than the fixed variant)."""
    ix, iy = np.broadcast_arrays(ix, iy)
    bx = ix // 20
    by = iy // 20
    block = ((bx + by) % 5 == 0)
    height = 8.0 + 4.0 * ((bx * 7 + by) % 5)
    return np.where(block, height, 0.0)


def green_value(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """Binary green at DSM resolution: green iff the pixel center falls
    inside any driver_city greenspace rectangle (consistency with the
    vector layer, FIXTURES.md §2.4)."""
    ix, iy = np.broadcast_arrays(ix, iy)
    px = city.X0 + (ix + 0.5) * DSM_RES
    py = city.Y0 + (iy + 0.5) * DSM_RES
    g = city.greenspace_numpy()
    out = np.zeros(px.shape, dtype=np.float64)
    for i in range(city.N_GS):
        out = np.where(
            (px >= g["minx"][i]) & (px < g["maxx"][i])
            & (py >= g["miny"][i]) & (py < g["maxy"][i]),
            1.0,
            out,
        )
    return out


_LAYER_FN = {"dsm": dsm_value, "dtm": dtm_value, "green": green_value}


def surface_tiles_df(spark: SparkSession, layer: str, tile_px: int = 256) -> DataFrame:
    """Tile table for dsm/dtm/green at 5 m px (mapInPandas ingest job)."""
    fn = _LAYER_FN[layer]
    n_tiles = (DSM_NPX + tile_px - 1) // tile_px

    def gen(batches):
        for pdf in batches:
            out = []
            for tid in pdf["id"].to_numpy():
                ty, tx = divmod(int(tid), n_tiles)
                w = min(tile_px, DSM_NPX - tx * tile_px)
                h = min(tile_px, DSM_NPX - ty * tile_px)
                ix = tx * tile_px + np.arange(w)
                iy = ty * tile_px + np.arange(h)
                vals = fn(ix[None, :], iy[:, None])
                out.append(
                    {
                        "layer": layer, "tx": tx, "ty": ty,
                        "x0": city.X0 + tx * tile_px * DSM_RES,
                        "y0": city.Y0 + ty * tile_px * DSM_RES,
                        "res": DSM_RES, "w": w, "h": h,
                        # float32 bytes: exact for these integer-valued
                        # layers, and the Arrow transfer through the 9x
                        # halo replication is 1/4 the array<double> cost
                        "px": vals.astype(np.float32).tobytes(),
                    }
                )
            yield pd.DataFrame(out)

    schema = (
        "layer string, tx int, ty int, x0 double, y0 double, "
        "res double, w int, h int, px binary"
    )
    return (
        spark.range(n_tiles * n_tiles)
        .repartition(max(spark.sparkContext.defaultParallelism, 4))
        .mapInPandas(gen, schema=schema)
    )


def full_raster(layer: str) -> np.ndarray:
    """In-process oracle: the whole raster as one (DSM_NPX, DSM_NPX)
    array (rows = iy, row-major from the south edge)."""
    fn = _LAYER_FN[layer]
    ix = np.arange(DSM_NPX)
    iy = np.arange(DSM_NPX)
    return fn(ix[None, :], iy[:, None])
