"""Custom Python DataSource (Spark 4 DataSource API) for synthetic
analytic rasters.

The engine's raster tables are normally built by a ``mapInPandas``
ingest job; this module exposes the same tile stream as a FIRST-CLASS
``spark.read.format(...)`` source instead — the Spark-4 Python
DataSource API (SPARK-44076): schema declared up front, one
``InputPartition`` per tile so Spark schedules tile generation exactly
like any other partitioned scan (parallelism, locality, AQE all apply),
and the reader yields Arrow ``RecordBatch`` objects so no Python-row
boxing happens on the read path.

The source is deliberately FIXTURE-FREE: every grid constant arrives
through reader options (the caller passes the city's numbers
explicitly), and the pixel field is the closed-form separable
``sin(x/xs)·cos(y/ys)`` family — callers choose the scales, so the
driver-city NDVI raster is options, not imports.

Registration is per-session and idempotent:
``spark.dataSource.register(SinCosTileSource)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SOURCE_NAME = "sincos_tiles"

_SCHEMA = (
    "tx int, ty int, x0 double, y0 double, res double, "
    "w int, h int, px array<double>"
)


class _TilePartition(InputPartition):
    def __init__(self, tx: int, ty: int):
        self.tx = tx
        self.ty = ty


class _TileReader(DataSourceReader):
    def __init__(self, options):
        self.x0 = float(options.get("x0", "0"))
        self.y0 = float(options.get("y0", "0"))
        self.res = float(options.get("res", "1"))
        self.tile_px = int(options.get("tile_px", "256"))
        self.npx = int(options.get("npx", "1000"))
        self.xs = float(options.get("x_scale", "500"))
        self.ys = float(options.get("y_scale", "500"))

    def partitions(self):
        n = (self.npx + self.tile_px - 1) // self.tile_px
        return [_TilePartition(tx, ty) for ty in range(n) for tx in range(n)]

    def read(self, partition):
        tx, ty = partition.tx, partition.ty
        w = min(self.tile_px, self.npx - tx * self.tile_px)
        h = min(self.tile_px, self.npx - ty * self.tile_px)
        ix = tx * self.tile_px + np.arange(w)
        iy = ty * self.tile_px + np.arange(h)
        px_x = self.x0 + (ix + 0.5) * self.res
        px_y = self.y0 + (iy + 0.5) * self.res
        vals = np.sin(px_x[None, :] / self.xs) * np.cos(px_y[:, None] / self.ys)
        batch = pa.RecordBatch.from_pydict(
            {
                "tx": pa.array([tx], pa.int32()),
                "ty": pa.array([ty], pa.int32()),
                "x0": pa.array([self.x0 + tx * self.tile_px * self.res]),
                "y0": pa.array([self.y0 + ty * self.tile_px * self.res]),
                "res": pa.array([self.res]),
                "w": pa.array([w], pa.int32()),
                "h": pa.array([h], pa.int32()),
                "px": pa.array([vals.ravel().tolist()],
                               pa.list_(pa.float64())),
            }
        )
        yield batch


class SinCosTileSource(DataSource):
    """spark.read.format("sincos_tiles") — tile-partitioned synthetic
    raster scan through the Spark-4 Python DataSource API."""

    @classmethod
    def name(cls):
        return SOURCE_NAME

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return _TileReader(self.options)
