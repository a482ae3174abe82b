"""Geodesic (great-circle) distance — the lat/lon complement of the
engine's planar kernels.

Everything else in the engine works in projected metres (the reference
reprojects to a metric CRS up front, e.g. availability.py's EPSG
handling); global-scale corpora carry WGS84 lat/lon, and distances at
that stage are great-circle.  ``haversine_m`` is the standard
numerically-stable form

    d = 2 R asin( sqrt( sin^2(dphi/2) + cos(phi1) cos(phi2) sin^2(dlam/2) ) )

as a pure-codegen Column expression — sin/cos/asin/sqrt in one fixed
IEEE chain, mirrored literally by the SQL oracle (the ln/exp/pow
portability precedent).  Degrees→radians uses an explicit shared
literal (RAD_PER_DEG) so both engines multiply by the identical double
rather than trusting dialect ``radians()``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["RAD_PER_DEG", "EARTH_R_M", "haversine_m", "nearest_geodesic",
           "spherical_rect_area_m2"]

RAD_PER_DEG = 0.017453292519943295  # pi / 180, one shared double
EARTH_R_M = 6371000.8  # IUGG mean Earth radius, metres


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in metres between two (lat, lon) degree
    pairs — single codegen expression, no UDF."""
    rl1 = lat1 * F.lit(RAD_PER_DEG)
    rl2 = lat2 * F.lit(RAD_PER_DEG)
    sdp = F.sin((rl2 - rl1) / F.lit(2.0))
    sdl = F.sin((lon2 - lon1) * F.lit(RAD_PER_DEG) / F.lit(2.0))
    h = sdp * sdp + F.cos(rl1) * F.cos(rl2) * sdl * sdl
    return F.lit(2.0 * EARTH_R_M) * F.asin(F.sqrt(h))


def nearest_geodesic(
    points: DataFrame,
    places: DataFrame,
    id_col: str = "doc_id",
    name_col: str = "name",
) -> DataFrame:
    """[id, name, dist_m] — nearest gazetteer place by great-circle
    distance; ties broken by name asc so the argmin is a total order.

    ``points``: [id, lat, lon]; ``places``: [name, plat, plon] — a
    broadcast dimension (gazetteers are dimension-sized; for
    million-place gazetteers switch the probe to a lat/lon cell
    prefilter exactly like the planar kNN, operators/accessibility.py).
    The candidate join is a broadcast nested loop over the dim; the
    argmin is a groupBy(min_struct) — no window, one shuffle by id.
    """
    d = haversine_m(F.col("lat"), F.col("lon"), F.col("plat"), F.col("plon"))
    cand = points.join(F.broadcast(places)).select(
        id_col,
        F.struct(
            F.round(d, 3).alias("dist_m"), F.col(name_col).alias("name")
        ).alias("_dn"),
    )
    best = cand.groupBy(id_col).agg(F.min("_dn").alias("_dn"))
    return best.select(
        id_col,
        F.col("_dn.name").alias("name"),
        F.col("_dn.dist_m").alias("dist_m"),
    )


def spherical_rect_area_m2(
    minlon: Column, minlat: Column, maxlon: Column, maxlat: Column
) -> Column:
    """Exact sphere area (m²) of a lat/lon-aligned rectangle: the
    Chamberlain–Duquette ring sum collapses for aligned edges to

        A = R² · Δλ · (sin φmax − sin φmin)

    (the two meridian edges contribute 0; each parallel edge
    contributes Δλ·(2 + 2·sin φ)/2).  Pure codegen — one fixed IEEE
    chain mirrored literally by the SQL oracle, shared RAD_PER_DEG
    literal, no dialect trig helpers."""
    return (
        F.lit(EARTH_R_M * EARTH_R_M)
        * ((maxlon - minlon) * F.lit(RAD_PER_DEG))
        * (F.sin(maxlat * F.lit(RAD_PER_DEG)) - F.sin(minlat * F.lit(RAD_PER_DEG)))
    )
