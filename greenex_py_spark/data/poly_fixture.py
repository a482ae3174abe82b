"""Rotated/concave polygon layer for the general-dissolve gate query
(r01 verdict item 2: the rect-only union kernel had no exact path for a
real OSM-shaped greenspace layer).

Deterministic formulas only.  Layout (each pair isolated in its own
block, so components are exactly the planted pairs — no triples):

- gs_id 0..11   : six pairs of ROTATED rectangles (convex∩convex);
- gs_id 12..23  : six pairs of (concave L-shape, rotated rectangle) —
  the rect overlaps one arm of the L, so the intersection is one
  connected piece and the independent inclusion–exclusion oracle can
  use the Sutherland–Hodgman clip (convex clip window);
- gs_id 24..31  : eight singleton rotated pentagons.

The DuckDB oracle is *generated* (literal VALUES): at generation time
two independent exact methods — the slab-decomposition union the engine
uses (geo/kernels.polygon_union_stats) and inclusion–exclusion
A ∪ B = A + B − A∩B over Sutherland–Hodgman intersections — are
computed driver-side and asserted to agree within FP tolerance; the
slab values are emitted as literals so the gate is an exact-match
regression pin on the distributed path (see dissolve_poly_oracle_sql).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..geo import kernels
from . import driver_city as city

N_POLY = 32


def _rot_rect(cx: float, cy: float, w: float, h: float, deg: float) -> np.ndarray:
    th = np.radians(deg)
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    base = np.array([[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]])
    return base @ R.T + np.array([cx, cy])


def _l_shape(x0: float, y0: float, w: float = 300.0, h: float = 300.0, t: float = 120.0) -> np.ndarray:
    return np.array(
        [[x0, y0], [x0 + w, y0], [x0 + w, y0 + t],
         [x0 + t, y0 + t], [x0 + t, y0 + h], [x0, y0 + h]]
    )


def _pentagon(cx: float, cy: float, r: float, deg: float) -> np.ndarray:
    th = np.radians(deg) + np.arange(5) * (2 * np.pi / 5)
    return np.column_stack([cx + r * np.cos(th), cy + r * np.sin(th)])


def members() -> list[tuple[int, np.ndarray, str]]:
    """[(gs_id, ring, tag)] — single-ring simple polygons."""
    out = []
    tags = ("landuse", "leisure", "natural")
    for j in range(6):
        bx = city.X0 + 300.0 + j * 1500.0
        by = city.Y0 + 300.0
        a = _rot_rect(bx + 200.0, by + 150.0, 300.0, 200.0, 10.0 + 17.0 * j)
        b = _rot_rect(bx + 330.0, by + 230.0, 260.0, 240.0, 55.0 + 23.0 * j)
        out.append((2 * j, a, tags[(2 * j) % 3]))
        out.append((2 * j + 1, b, tags[(2 * j + 1) % 3]))
    for j in range(6):
        bx = city.X0 + 300.0 + j * 1500.0
        by = city.Y0 + 1500.0
        l = _l_shape(bx, by)
        # rect over the lower arm of the L (one connected intersection)
        r = _rot_rect(bx + 250.0, by + 70.0, 180.0, 140.0, 20.0 + 11.0 * j)
        out.append((12 + 2 * j, l, tags[(12 + 2 * j) % 3]))
        out.append((13 + 2 * j, r, tags[(13 + 2 * j) % 3]))
    for j in range(8):
        p = _pentagon(city.X0 + 300.0 + j * 1100.0, city.Y0 + 2900.0, 150.0, 13.0 * j)
        out.append((24 + j, p, tags[(24 + j) % 3]))
    return out


POLY_SCHEMA = (
    "gs_id long, rings array<array<double>>, minx double, miny double, "
    "maxx double, maxy double, tag string"
)


def poly_layer_pdf() -> pd.DataFrame:
    rows = []
    for gs_id, ring, tag in members():
        rows.append(
            dict(
                gs_id=gs_id,
                rings=[ring.ravel().tolist()],
                minx=float(ring[:, 0].min()), miny=float(ring[:, 1].min()),
                maxx=float(ring[:, 0].max()), maxy=float(ring[:, 1].max()),
                tag=tag,
            )
        )
    return pd.DataFrame(rows)


def poly_layer_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(poly_layer_pdf(), schema=POLY_SCHEMA)


def _lit(v) -> str:
    if isinstance(v, str):
        return "'" + v + "'"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    return repr(float(v))


def dissolve_poly_oracle_sql(round_dp: int = 6, tol: float = 1e-4) -> str:
    """Literal-VALUES oracle for q_dissolve_poly.

    Two independent exact algorithms are evaluated driver-side at
    generation time: (a) the slab-decomposition union the engine's
    merge kernel uses, (b) inclusion–exclusion  A∪B = A + B − A∩B  with
    a Sutherland–Hodgman intersection.  They must agree within ``tol``
    (metres²/metres — rel ≈1e-9 at this scale; each method carries ~1e-5 of
    FP noise, so exact 6-dp equality between the two is not expected).
    The emitted literals are the (a) values, making the gate an exact
    regression pin on the distributed path, with (b) as the honesty
    check on the geometry itself.
    """
    ms = members()
    by_id = {g: (ring, tag) for g, ring, tag in ms}
    rows = []

    def stats(ring: np.ndarray) -> tuple[float, float, float]:
        a = kernels.polygon_area([ring])
        cx, cy = kernels.polygon_centroid([ring])
        return a, cx, cy

    for j in range(12):  # pairs: ids (2j, 2j+1) then (12+2j, 13+2j)
        ga = 2 * j if j < 6 else 12 + 2 * (j - 6)
        gb = ga + 1
        (ra, tag_a), (rb, _tag_b) = by_id[ga], by_id[gb]
        # method (b): S–H intersection (rb is always a rotated rect —
        # the convex clip window; ra may be concave)
        inter = kernels.clip_polygon_convex([ra], rb)
        assert inter, f"planted pair {ga},{gb} does not overlap"
        ia = sum(abs(kernels.ring_signed_area(r)) for r in inter)
        imx = imy = 0.0
        for r in inter:
            a_r = abs(kernels.ring_signed_area(r))
            cx_r, cy_r = kernels.ring_centroid(r)
            imx += cx_r * a_r
            imy += cy_r * a_r
        aa, acx, acy = stats(ra)
        ab, bcx, bcy = stats(rb)
        area_b = aa + ab - ia
        cx_b = (acx * aa + bcx * ab - imx) / area_b
        cy_b = (acy * aa + bcy * ab - imy) / area_b
        # method (a): the slab union (what the engine kernel computes)
        area, cx, cy = kernels.polygon_union_stats([[ra], [rb]])
        assert abs(area - area_b) < tol and abs(cx - cx_b) < tol and abs(cy - cy_b) < tol, (
            f"union methods disagree for pair {ga},{gb}: "
            f"{(area, cx, cy)} vs {(area_b, cx_b, cy_b)}"
        )
        allv = np.vstack([ra, rb])
        rows.append(
            (ga, 2, round(area, round_dp), round(cx, round_dp), round(cy, round_dp),
             float(allv[:, 0].min()), float(allv[:, 1].min()),
             float(allv[:, 0].max()), float(allv[:, 1].max()), tag_a)
        )
    for g in range(24, 32):
        ring, tag = by_id[g]
        a_b, cx_b, cy_b = stats(ring)
        a, cx, cy = kernels.polygon_union_stats([[ring]])
        assert abs(a - a_b) < tol and abs(cx - cx_b) < tol and abs(cy - cy_b) < tol
        rows.append(
            (g, 1, round(a, round_dp), round(cx, round_dp), round(cy, round_dp),
             float(ring[:, 0].min()), float(ring[:, 1].min()),
             float(ring[:, 0].max()), float(ring[:, 1].max()), tag)
        )
    body = ",\n  ".join("(" + ", ".join(_lit(v) for v in r) + ")" for r in rows)
    return (
        "WITH expected(component, n_members, area, cx, cy, minx, miny, maxx, maxy, tag)"
        f" AS (VALUES\n  {body}\n)\n"
        "SELECT CAST(component AS BIGINT) AS component,"
        " CAST(n_members AS BIGINT) AS n_members,"
        " CAST(area AS DOUBLE) AS area, CAST(cx AS DOUBLE) AS cx,"
        " CAST(cy AS DOUBLE) AS cy, CAST(minx AS DOUBLE) AS minx,"
        " CAST(miny AS DOUBLE) AS miny, CAST(maxx AS DOUBLE) AS maxx,"
        " CAST(maxy AS DOUBLE) AS maxy, tag FROM expected"
    )
