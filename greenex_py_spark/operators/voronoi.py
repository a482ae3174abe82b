"""Discrete Voronoi tessellation / nearest-facility allocation.

Assigns every raster/analysis cell to its nearest site (facility,
greenspace centroid, …) and aggregates per-site service areas — the
grid-sampled Voronoi diagram urban-accessibility studies use to answer
"which park serves this block" (the areal complement of the reference's
point-wise nearest-distance query, GreenExp/accessibility.py:118-160,
which keeps only the distance and discards the allocation).

Scale design: sites are a *dim* table (thousands of facilities) while
cells scale with world size (billions at continental 100 m resolution),
so the site table is broadcast and the per-cell argmin is a map-side
``min(struct(d2, site_id))`` — whole-stage codegen, zero shuffle until
the final per-site count (|sites| rows).  For site sets too large to
broadcast, the bounded cell-tier k-ring join in
operators/accessibility.py is the drop-in prefilter; this module keeps
the dim-table fast path.

Determinism: with half-unit-aligned coordinates (cell centers on .5 m,
centroids on .5 m) every dx, dx², and d² is IEEE-exact, so the argmin
and tie-break (lowest site id) are engine-portable with no quantization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def discrete_voronoi_assign(
    cells: DataFrame,
    sites: DataFrame,
    cell_id: str = "cid",
    site_id: str = "gs_id",
    cell_xy: tuple[str, str] = ("xc", "yc"),
    site_xy: tuple[str, str] = ("cx", "cy"),
) -> DataFrame:
    """[cell_id, site_id, d2] — each cell's nearest site (tie → lowest id)."""
    cx, cy = cell_xy
    sx, sy = site_xy
    dx = F.col(cx) - F.col(sx)
    dy = F.col(cy) - F.col(sy)
    d2 = (dx * dx + dy * dy).alias("d2")
    pairs = cells.select(cell_id, cx, cy).crossJoin(
        F.broadcast(sites.select(site_id, sx, sy))
    )
    best = (
        pairs.select(cell_id, F.struct(d2, F.col(site_id)).alias("cand"))
        .groupBy(cell_id)
        .agg(F.min("cand").alias("m"))
    )
    return best.select(
        cell_id,
        F.col(f"m.{site_id}").alias(site_id),
        F.col("m.d2").alias("d2"),
    )


def voronoi_service_areas(
    cells: DataFrame,
    sites: DataFrame,
    cell_area_m2: float,
    cell_id: str = "cid",
    site_id: str = "gs_id",
    cell_xy: tuple[str, str] = ("xc", "yc"),
    site_xy: tuple[str, str] = ("cx", "cy"),
) -> DataFrame:
    """[site_id, n_cells, area_km2, sum_d2] — per-site Voronoi cell
    aggregate.  sum_d2 is an exact sum of IEEE-exact squared distances
    (quarter-integer lattice keeps every partial < 2^53 ⇒ order-free)."""
    assigned = discrete_voronoi_assign(cells, sites, cell_id, site_id, cell_xy, site_xy)
    return assigned.groupBy(site_id).agg(
        F.count("*").alias("n_cells"),
        (F.count("*") * cell_area_m2 / 1e6).alias("area_km2"),
        F.sum("d2").alias("sum_d2"),
    )
