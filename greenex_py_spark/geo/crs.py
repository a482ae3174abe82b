"""CRS projection (P2/R2 in SURVEY.md §2.2/§2.8) — pure math, no pyproj.

The reference forces every layer into a projected CRS, defaulting to
**EPSG:3395** (World Mercator, accessibility.py:40-50) before any
metric math.  This module implements that projection for the spherical/
ellipsoidal Mercator pair the pipeline needs:

- EPSG:4326 (lon/lat degrees, WGS84) → EPSG:3395 (World Mercator, m)
  and back, ellipsoidal formula (WGS84 a, e) — matches proj4's
  ``+proj=merc +ellps=WGS84`` to sub-mm;
- both as vectorized NumPy (for Arrow kernels / oracles) and as
  **codegen Column expressions** (the hot path: projection is plain
  log/tan/atan/exp arithmetic, so it stays inside WholeStageCodegen —
  no UDF at all).

The synthetic driver city lives in a single projected CRS, so gate
queries never call this; it exists so geographic PoI input (the real
Common-Crawl geocoding case) has a first-class, tested path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WGS84_A = 6378137.0
WGS84_E2 = 6.69437999014e-3  # first eccentricity squared
_E = float(np.sqrt(WGS84_E2))


# -- NumPy (Arrow kernels / in-process oracles) -----------------------------


def lonlat_to_mercator(lon_deg: np.ndarray, lat_deg: np.ndarray):
    """EPSG:4326 → EPSG:3395 (ellipsoidal World Mercator), vectorized."""
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    x = WGS84_A * lon
    es = _E * np.sin(lat)
    y = WGS84_A * np.log(
        np.tan(np.pi / 4.0 + lat / 2.0) * ((1.0 - es) / (1.0 + es)) ** (_E / 2.0)
    )
    return x, y


def mercator_to_lonlat(x: np.ndarray, y: np.ndarray, iters: int = 8):
    """EPSG:3395 → EPSG:4326 inverse (fixed-point iteration on the
    conformal latitude; converges to double precision in ≤8 rounds)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = x / WGS84_A
    t = np.exp(-y / WGS84_A)
    lat = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(iters):
        es = _E * np.sin(lat)
        lat = np.pi / 2.0 - 2.0 * np.arctan(t * ((1.0 - es) / (1.0 + es)) ** (_E / 2.0))
    return np.degrees(lon), np.degrees(lat)


# -- codegen Column expressions (the distributed hot path) ------------------


def mercator_x(lon_deg: Column) -> Column:
    return F.radians(lon_deg) * F.lit(WGS84_A)


def mercator_y(lat_deg: Column) -> Column:
    lat = F.radians(lat_deg)
    es = F.lit(_E) * F.sin(lat)
    return F.lit(WGS84_A) * F.log(
        F.tan(F.lit(float(np.pi / 4.0)) + lat / 2)
        * F.pow((F.lit(1.0) - es) / (F.lit(1.0) + es), F.lit(_E / 2.0))
    )


def project_points(
    df: DataFrame, lon_col: str = "lon", lat_col: str = "lat",
    x_col: str = "x", y_col: str = "y",
) -> DataFrame:
    """+ (x, y) in EPSG:3395 — pure codegen arithmetic, no UDF."""
    return df.withColumn(x_col, mercator_x(F.col(lon_col))).withColumn(
        y_col, mercator_y(F.col(lat_col))
    )
