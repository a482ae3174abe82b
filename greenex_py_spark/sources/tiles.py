"""Slippy-map (XYZ / Web-Mercator) tile math (S7 in SURVEY.md §2.1).

The reference maps sample points to Mapillary vector tiles with
``mercantile.tile(lon, lat, 14)`` and fetches each tile once
(GreenExp/visibility.py:664-683).  The HTTP fetch is external; the
in-scope parts are the tile arithmetic and the grouping shape — points
group by tile id so each tile is fetched/decoded once however many
points land on it (exactly the engine's tile-cogroup pattern).

Pure codegen column expressions (standard OSM slippy-map formulas):
``x = floor((lon+180)/360·2^z)``,
``y = floor((1 − asinh(tan φ)/π)/2·2^z)``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# Web-Mercator latitude domain (mercantile clamps identically)
MAX_LAT = 85.0511287798066


def tile_x(lon_deg: Column, zoom: int) -> Column:
    n = 1 << zoom
    raw = F.floor((lon_deg + 180.0) / 360.0 * float(n)).cast("long")
    return F.least(F.lit(n - 1), F.greatest(F.lit(0), raw))


def tile_y(lat_deg: Column, zoom: int) -> Column:
    n = 1 << zoom
    lat = F.radians(F.least(F.lit(MAX_LAT), F.greatest(F.lit(-MAX_LAT), lat_deg)))
    raw = F.floor(
        (1.0 - F.log(F.tan(lat) + 1.0 / F.cos(lat)) / float(np.pi)) / 2.0 * float(n)
    ).cast("long")
    return F.least(F.lit(n - 1), F.greatest(F.lit(0), raw))


def with_tile(
    df: DataFrame, zoom: int = 14,
    lon_col: str = "lon", lat_col: str = "lat",
    out_prefix: str = "tile_",
) -> DataFrame:
    """+ [tile_x, tile_y] — the group-by-tile key for fetch-once-per-
    tile batching (visibility.py:675-683)."""
    return df.withColumn(f"{out_prefix}x", tile_x(F.col(lon_col), zoom)).withColumn(
        f"{out_prefix}y", tile_y(F.col(lat_col), zoom)
    )


def tile_of(lon: float, lat: float, zoom: int) -> tuple[int, int]:
    """NumPy/scalar mirror (mercantile.tile equivalent): lat clamps to
    the Web-Mercator domain ±85.0511°, indices clamp to [0, 2^z−1]
    (lon=180 / poles would otherwise index one past the grid)."""
    n = 1 << zoom
    x = int(np.floor((lon + 180.0) / 360.0 * n))
    latr = np.radians(min(MAX_LAT, max(-MAX_LAT, lat)))
    y = int(np.floor((1.0 - np.arcsinh(np.tan(latr)) / np.pi) / 2.0 * n))
    return min(n - 1, max(0, x)), min(n - 1, max(0, y))


def tiles_for_bbox(
    minx: float, miny: float, maxx: float, maxy: float, zoom: int
) -> list[tuple[int, int]]:
    """All (x, y) tiles intersecting a WGS84 bbox (mercantile.tiles
    equivalent) — the fetch list for an AoI.  Antimeridian-crossing
    boxes (minx > maxx) are rejected rather than silently returning an
    empty cover: split the box at ±180 and call twice."""
    if minx > maxx:
        raise ValueError(
            "antimeridian-crossing bbox: split at ±180 and cover each side"
        )
    x0, y1 = tile_of(minx, miny, zoom)  # south-west: max y (y grows south)
    x1, y0 = tile_of(maxx, maxy, zoom)
    return [(x, y) for y in range(y0, y1 + 1) for x in range(x0, x1 + 1)]
