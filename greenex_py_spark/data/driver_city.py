"""Deterministic synthetic "city" derived from the driver's tables.

The driver correctness gate (``__spark_entry__.py``) compares every Spark
query against DuckDB SQL over the same parquet.  Spatial inputs therefore
must be *derivable by pure arithmetic* from the driver tables — no files,
no RNG.  This module is the single source of truth for those formulas; it
emits both the Spark DataFrame and the equivalent DuckDB SQL text so the
two sides cannot drift.

World (FIXTURES.md §2): 10 km × 10 km projected city, origin
(100000, 450000).  Everything is integer LCG-style arithmetic → exact in
both engines.

- **Geocoder**: ``doc_id`` → (x, y).  60% of points land in a 1 km "urban
  core" to exercise skew handling (the reference's Amsterdam PoIs are
  likewise center-clustered).  Mirrors the url-hash geocoder used in the
  full pipeline (data/synth.py) but stays SQL-expressible.
- **Greenspace**: 80 axis-aligned rectangles on a 10×8 block grid (jitter
  < 500 m, size ≤ 480 m ⇒ never overlap, so union areas are exact sums).
  Rect k lives in block (k%10, k//10).  Some areas < 400 m² to exercise
  the min-area filter (GreenExp/accessibility.py:130-131).
- **NDVI raster**: value(x, y) = sin(x/500)·cos(y/500) at 10 m pixels —
  closed form ⇒ zonal stats hand-checkable; negatives exercise the
  ``clip(min=0)`` semantics (GreenExp/availability.py:289).
- **Landcover raster**: class = {0,10,30,50,80}[(ix+iy) % 5] ⇒ exact
  rational percentages (GreenExp/availability.py:553-558).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---- world constants -------------------------------------------------------
X0 = 100000.0
Y0 = 450000.0
EXTENT = 10000.0          # city side, m
CORE_X0 = 104500.0        # 1 km urban core
CORE_Y0 = 454500.0
CORE_EXTENT = 1000.0
RES = 10.0                # raster pixel size, m
NPX = 1000                # pixels per side
CELL = 100.0              # join-grid cell size, m
CELL_BASE = 1 << 20       # cell = gy * CELL_BASE + gx
N_GS = 80                 # greenspace rectangles
LC_CLASSES = (0, 10, 30, 50, 80)

# ---------------------------------------------------------------------------
# geocoder: doc_id -> (x, y)
# ---------------------------------------------------------------------------

_GEO_SQL_BODY = f"""
SELECT
  doc_id,
  CASE WHEN doc_id % 10 < 6
       THEN {CORE_X0} + ((doc_id * 48271) % 1000000) / 1000000.0 * {CORE_EXTENT}
       ELSE {X0} + ((doc_id * 48271) % 1000000) / 1000000.0 * {EXTENT}
  END AS x,
  CASE WHEN doc_id % 10 < 6
       THEN {CORE_Y0} + ((doc_id * 16807 + 12345) % 1000000) / 1000000.0 * {CORE_EXTENT}
       ELSE {Y0} + ((doc_id * 16807 + 12345) % 1000000) / 1000000.0 * {EXTENT}
  END AS y
FROM documents
"""


def points_sql() -> str:
    """DuckDB CTE body: documents → (doc_id, x, y)."""
    return _GEO_SQL_BODY


def points_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of the geocoder — same arithmetic, Catalyst-native
    (pure column expressions: stays in whole-stage codegen, no UDF)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    did = F.col("doc_id")
    in_core = (did % 10) < 6
    fx = ((did * 48271) % 1000000) / 1000000.0
    fy = ((did * 16807 + 12345) % 1000000) / 1000000.0
    return docs.select(
        "doc_id",
        F.when(in_core, CORE_X0 + fx * CORE_EXTENT).otherwise(X0 + fx * EXTENT).alias("x"),
        F.when(in_core, CORE_Y0 + fy * CORE_EXTENT).otherwise(Y0 + fy * EXTENT).alias("y"),
    )


def cell_expr_sql(x: str = "x", y: str = "y") -> str:
    return (
        f"(CAST(floor(({y} - {Y0}) / {CELL}) AS BIGINT) * {CELL_BASE} "
        f"+ CAST(floor(({x} - {X0}) / {CELL}) AS BIGINT))"
    )


def with_cell(df: DataFrame) -> DataFrame:
    return df.withColumn("cell", F.expr(cell_expr_sql("x", "y")))


# ---------------------------------------------------------------------------
# greenspace rectangles
# ---------------------------------------------------------------------------

_GS_SQL_BODY = f"""
SELECT
  gs_id,
  {X0} + (gs_id % 10) * 1000 + (gs_id * 7919) % 500               AS minx,
  {Y0} + CAST(floor(gs_id / 10.0) AS BIGINT) * 1000 + (gs_id * 104729) % 500 AS miny,
  {X0} + (gs_id % 10) * 1000 + (gs_id * 7919) % 500 + 10 + (gs_id * 131) % 470 AS maxx,
  {Y0} + CAST(floor(gs_id / 10.0) AS BIGINT) * 1000 + (gs_id * 104729) % 500 + 10 + (gs_id * 211) % 470 AS maxy,
  CAST((10 + (gs_id * 131) % 470) AS DOUBLE) * (10 + (gs_id * 211) % 470) AS area,
  {X0} + (gs_id % 10) * 1000 + (gs_id * 7919) % 500 + (10 + (gs_id * 131) % 470) / 2.0 AS cx,
  {Y0} + CAST(floor(gs_id / 10.0) AS BIGINT) * 1000 + (gs_id * 104729) % 500 + (10 + (gs_id * 211) % 470) / 2.0 AS cy,
  CASE gs_id % 3 WHEN 0 THEN 'landuse' WHEN 1 THEN 'leisure' ELSE 'natural' END AS tag
FROM gs_ids
"""


def greenspace_sql() -> str:
    """DuckDB CTE body; expects a prior CTE ``gs_ids(gs_id)`` = 0..N_GS-1."""
    return _GS_SQL_BODY


def gs_ids_sql() -> str:
    return f"SELECT CAST(r.range AS BIGINT) AS gs_id FROM range({N_GS}) r"


def greenspace_df(spark: SparkSession) -> DataFrame:
    """Spark side — same formulas over ``spark.range``."""
    g = spark.range(N_GS).withColumnRenamed("id", "gs_id")
    gid = F.col("gs_id")
    w = 10 + (gid * 131) % 470
    h = 10 + (gid * 211) % 470
    minx = F.lit(X0) + (gid % 10) * 1000 + (gid * 7919) % 500
    miny = F.lit(Y0) + F.floor(gid / 10.0).cast("bigint") * 1000 + (gid * 104729) % 500
    return g.select(
        "gs_id",
        minx.alias("minx"),
        miny.alias("miny"),
        (minx + w).alias("maxx"),
        (miny + h).alias("maxy"),
        (w.cast("double") * h).alias("area"),
        (minx + w / 2.0).alias("cx"),
        (miny + h / 2.0).alias("cy"),
        F.when(gid % 3 == 0, "landuse").when(gid % 3 == 1, "leisure")
         .otherwise("natural").alias("tag"),
    )


def greenspace_numpy() -> dict[str, np.ndarray]:
    """NumPy mirror for in-UDF use / oracle tests."""
    gs_id = np.arange(N_GS, dtype=np.int64)
    w = 10 + (gs_id * 131) % 470
    h = 10 + (gs_id * 211) % 470
    minx = X0 + (gs_id % 10) * 1000 + (gs_id * 7919) % 500
    miny = Y0 + (gs_id // 10) * 1000 + (gs_id * 104729) % 500
    return {
        "gs_id": gs_id,
        "minx": minx.astype(np.float64),
        "miny": miny.astype(np.float64),
        "maxx": (minx + w).astype(np.float64),
        "maxy": (miny + h).astype(np.float64),
        "area": (w * h).astype(np.float64),
        "cx": (minx + w / 2.0),
        "cy": (miny + h / 2.0),
    }


# ---------------------------------------------------------------------------
# rasters (closed form)
# ---------------------------------------------------------------------------


def ndvi_value(px_x: np.ndarray, px_y: np.ndarray) -> np.ndarray:
    """NDVI at pixel-center coords (float64, same op order as the SQL)."""
    return np.sin(px_x / 500.0) * np.cos(px_y / 500.0)


NDVI_SQL = "sin(({px_x}) / 500.0) * cos(({px_y}) / 500.0)"


def landcover_class(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """Landcover class code at pixel index (ix, iy)."""
    lut = np.array(LC_CLASSES, dtype=np.int64)
    return lut[(ix + iy) % 5]


LC_SQL = "(CASE ((({ix}) + ({iy})) % 5) WHEN 0 THEN 0 WHEN 1 THEN 10 WHEN 2 THEN 30 WHEN 3 THEN 50 ELSE 80 END)"


TILE_PX = 256  # pixels per tile side → 4×4 tiles cover the 1000-px city


def grid():
    """GridSpec of the 10 m driver-city rasters (the explicit descriptor
    gate queries hand the now-fixture-free raster operators)."""
    from ..geo.grid import GridSpec

    return GridSpec.square(X0, Y0, RES, TILE_PX, NPX)


def tiles_df(spark: SparkSession, layer: str = "ndvi") -> DataFrame:
    """Materialize the raster tile table [layer, tx, ty, x0, y0, res, w, h, px].

    Built by ``mapInPandas`` over the tile-id range — embarrassingly
    parallel, no shuffle; this is the ingest job S2 (SURVEY.md §2.1).
    """
    import pandas as pd

    n_tiles = (NPX + TILE_PX - 1) // TILE_PX

    def gen(batches):
        for pdf in batches:
            out = []
            for tid in pdf["id"].to_numpy():
                ty, tx = divmod(int(tid), n_tiles)
                w = min(TILE_PX, NPX - tx * TILE_PX)
                h = min(TILE_PX, NPX - ty * TILE_PX)
                ix = tx * TILE_PX + np.arange(w)
                iy = ty * TILE_PX + np.arange(h)
                if layer == "ndvi":
                    px_x = X0 + (ix + 0.5) * RES
                    px_y = Y0 + (iy + 0.5) * RES
                    vals = ndvi_value(px_x[None, :], px_y[:, None])  # (h, w)
                elif layer == "landcover":
                    vals = landcover_class(ix[None, :], iy[:, None]).astype(np.float64)
                else:
                    raise ValueError(layer)
                out.append(
                    {
                        "layer": layer, "tx": tx, "ty": ty,
                        "x0": X0 + tx * TILE_PX * RES, "y0": Y0 + ty * TILE_PX * RES,
                        "res": RES, "w": w, "h": h,
                        "px": vals.ravel(),  # row-major, row 0 = southmost
                    }
                )
            yield pd.DataFrame(out)

    schema = (
        "layer string, tx int, ty int, x0 double, y0 double, "
        "res double, w int, h int, px array<double>"
    )
    return (
        spark.range(n_tiles * n_tiles)
        .repartition(max(spark.sparkContext.defaultParallelism, 4))
        .mapInPandas(gen, schema=schema)
    )
