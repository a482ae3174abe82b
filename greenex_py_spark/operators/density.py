"""Grid density surface + DBSCAN-style hotspot clustering.

The reference computes per-location greenness indicators; a corpus-scale
engine also needs the *where is the corpus itself concentrated* questions
a training-data pipeline asks of geocoded web documents: a smoothed
density surface (where is exposure demand?) and densitybased clusters
(which contiguous regions are hot?).  Both operate on the per-cell
document-count table the geocoder's cell assignment already produces;
``grid_dbscan`` is the density-based clustering classic.

``kde_density`` is a kernel-density surface with an INTEGER parabolic
(Epanechnikov-shaped) kernel

    w(dx, dy) = max(0, R^2 + 1 - (dx^2 + dy^2))

so every density value is an exact integer — no FP anywhere, bit-identical
across engines by construction (the usual Gaussian KDE is a visual
smoother; at the 100 m grid granularity the integer kernel gives the same
ranking with an airtight oracle).

``grid_dbscan`` is DBSCAN on the occupancy grid (Ester et al. 1996 — the
grid specialisation: eps = one queen ring, a point's neighbour count =
the 3x3 population sum, weighted by per-cell counts):

    core    cell: 3x3 count sum (incl. self) >= min_pts
    cluster     : connected component over queen-adjacent CORE cells
                  (label = min cell key in the component)
    border  cell: occupied non-core cell queen-adjacent to >=1 core cell
                  (deterministically assigned the MIN neighbouring
                  cluster label; classic DBSCAN leaves this arbitrary)
    noise   cell: everything else (cluster null)

Spark shape (both): each cell explodes its bounded offset ring and
equi-joins back on (gx, gy) — O(cells x ring), never all-pairs, the same
scale-free shape as operators/spatial_stats.py.  The component step
reuses dissolve's adaptive connected-components (driver union-find below
1M edges, checkpointed Pregel loop above); core-cell graphs are tiny
relative to the corpus because min_pts should scale with corpus size
(the gate query derives it from count(*) — a fixed threshold would make
every cell core at 100x data and degenerate the graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geo.cells import CELL_BASE

__all__ = ["kde_offsets", "kde_density", "grid_dbscan"]


def kde_offsets(radius: int = 2) -> list[tuple[int, int, int]]:
    """[(dx, dy, weight)] for the integer parabolic kernel — the single
    source of truth both the Spark operator and the SQL oracle render."""
    r2 = radius * radius
    return [
        (dx, dy, r2 + 1 - (dx * dx + dy * dy))
        for dx in range(-radius, radius + 1)
        for dy in range(-radius, radius + 1)
        if r2 + 1 - (dx * dx + dy * dy) > 0
    ]


def kde_density(
    cells: DataFrame,
    radius: int = 2,
    gx_col: str = "gx",
    gy_col: str = "gy",
    cnt_col: str = "cnt",
) -> DataFrame:
    """[gx, gy, density] — exact-integer kernel density at every OCCUPIED
    cell (the surface is evaluated where mass exists; empty halo cells
    are a sink-side concern)."""
    c = cells.select(
        F.col(gx_col).alias("gx"),
        F.col(gy_col).alias("gy"),
        F.col(cnt_col).cast("long").alias("cnt"),
    )
    contrib = c.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("gx") + dx).alias("gx"),
                        (F.col("gy") + dy).alias("gy"),
                        (F.col("cnt") * w).alias("wc"),
                    )
                    for dx, dy, w in kde_offsets(radius)
                ]
            )
        ).alias("k")
    ).select("k.gx", "k.gy", "k.wc")
    return (
        contrib.join(c.select("gx", "gy"), ["gx", "gy"])
        .groupBy("gx", "gy")
        .agg(F.sum("wc").alias("density"))
    )


def grid_dbscan(
    cells: DataFrame,
    min_pts: int,
    gx_col: str = "gx",
    gy_col: str = "gy",
    cnt_col: str = "cnt",
) -> DataFrame:
    """[gx, gy, cnt, role, cluster] — DBSCAN over the occupancy grid.

    role in ('core', 'border', 'noise'); cluster = min cell key
    (gy * CELL_BASE + gx) of the component for core/border, null for
    noise.  ``min_pts`` compares against the 3x3 weighted population sum
    including the cell itself.
    """
    from .dissolve import connected_components

    c = cells.select(
        F.col(gx_col).alias("gx"),
        F.col(gy_col).alias("gy"),
        F.col(cnt_col).cast("long").alias("cnt"),
    )
    ring = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    nb = c.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("gx") + dx).alias("gx"), (F.col("gy") + dy).alias("gy")
                    )
                    for dx, dy in ring
                ]
            )
        ).alias("k"),
        F.col("cnt").alias("acnt"),
    ).select("k.gx", "k.gy", "acnt")
    pop = (
        nb.join(c.select("gx", "gy"), ["gx", "gy"])
        .groupBy("gx", "gy")
        .agg(F.sum("acnt").alias("m"))
    )
    key = (F.col("gy") * CELL_BASE + F.col("gx")).alias("cell")
    core = (
        c.join(pop, ["gx", "gy"])
        .filter(F.col("m") >= F.lit(min_pts))
        .select("gx", "gy", key)
        # consumed 4× below (shifted, edge build side, CC nodes, label
        # join) — materialize the small core-cell table once instead of
        # re-running the count+neighbourhood join per consumer
        .localCheckpoint()
    )
    # queen-adjacent core pairs, one direction (a < b) — an equi-join per
    # offset, never all-pairs; 4 of the 8 directed offsets suffice
    half = [(1, 0), (0, 1), (1, 1), (1, -1)]
    shifted = core.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("gx") + dx).alias("gx"), (F.col("gy") + dy).alias("gy")
                    )
                    for dx, dy in half
                ]
            )
        ).alias("k"),
        F.col("cell").alias("a"),
    ).select("k.gx", "k.gy", "a")
    edges = shifted.join(core.select("gx", "gy", F.col("cell").alias("b")), ["gx", "gy"]).select(
        "a", "b"
    )
    labels = connected_components(core.select("cell"), edges, key="cell").select(
        F.col("cell"), F.col("comp").alias("cluster")
    )
    core_lab = core.join(labels, "cell").select("gx", "gy", "cluster")
    # border assignment: occupied non-core cells take the min label among
    # queen-adjacent cores (deterministic tie-break)
    reach = core_lab.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("gx") + dx).alias("gx"), (F.col("gy") + dy).alias("gy")
                    )
                    for dx, dy in ring
                    if (dx, dy) != (0, 0)
                ]
            )
        ).alias("k"),
        F.col("cluster").alias("ncl"),
    ).select("k.gx", "k.gy", "ncl")
    border_lab = (
        c.select("gx", "gy")
        .join(core_lab.select("gx", "gy", F.lit(1).alias("is_core")), ["gx", "gy"], "left")
        .filter(F.col("is_core").isNull())
        .join(reach, ["gx", "gy"])
        .groupBy("gx", "gy")
        .agg(F.min("ncl").alias("cluster"))
    )
    out = (
        c.join(core_lab.withColumnRenamed("cluster", "ccl"), ["gx", "gy"], "left")
        .join(border_lab.withColumnRenamed("cluster", "bcl"), ["gx", "gy"], "left")
        .select(
            "gx",
            "gy",
            "cnt",
            F.when(F.col("ccl").isNotNull(), F.lit("core"))
            .when(F.col("bcl").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce(F.col("ccl"), F.col("bcl")).alias("cluster"),
        )
    )
    return out
