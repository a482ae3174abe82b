"""Quadtree adaptive grid — skew-adaptive spatial indexing.

A fixed-resolution grid is the wrong index for web-scale geocoded
corpora: urban cores put 10^6 documents in one 100 m cell while rural
cells hold 3.  The classic fix is a quadtree — refine exactly where the
data is dense — which is also the scale story of this engine's salted
PiP join (engine/skew.py detects hot CELLS; this operator instead
*re-grids* so no cell is hot to begin with, the index-side complement).

``adaptive_cells`` assigns every occupied base cell to the COARSEST
ancestor level whose occupancy is <= threshold (else the finest level),
producing a proper quadtree partition: all base cells below one chosen
ancestor share every coarser count and therefore choose the same level,
so chosen cells tile the occupied space without overlap.

Deterministic and closed-form — no iteration: level-l counts are
roll-ups of the base-cell counts by bit-shifted keys (``gx >> s``),
joined back per level.  With L levels that is L-1 aggregates of the
(already aggregated) base-cell table plus L-1 equi-joins — all
two-phase, no driver state, no loop, scale-free.

The caller passes ``threshold`` scaled to corpus size (the gate derives
it from count(*)): a FIXED threshold would degenerate to all-finest at
100x data, an occupancy-scaled one keeps the tree shape stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["adaptive_cells"]


def adaptive_cells(
    cells: DataFrame,
    threshold: int,
    levels: int = 4,
    gx_col: str = "gx",
    gy_col: str = "gy",
    cnt_col: str = "cnt",
) -> DataFrame:
    """[level, gxl, gyl, n_docs] — one row per chosen quadtree cell.

    ``level`` 0 = coarsest (side ``2^(levels-1)`` base cells) through
    ``levels-1`` = the base resolution; (gxl, gyl) are the cell coords
    at that level (base coords >> shift); ``n_docs`` the total count
    under the cell.  Requires non-negative base coords.
    """
    if levels < 1:
        raise ValueError("levels must be >= 1")
    c = cells.select(
        F.col(gx_col).alias("gx"),
        F.col(gy_col).alias("gy"),
        F.col(cnt_col).cast("long").alias("cnt"),
    )
    # per-level keys as pure projections of the base cell
    keyed = c.select(
        "gx",
        "gy",
        "cnt",
        *[
            x
            for lvl in range(levels)
            for x in (
                F.shiftright(F.col("gx"), levels - 1 - lvl).alias(f"gx{lvl}"),
                F.shiftright(F.col("gy"), levels - 1 - lvl).alias(f"gy{lvl}"),
            )
        ],
    )
    out = keyed
    for lvl in range(levels):
        dim = (
            keyed.groupBy(f"gx{lvl}", f"gy{lvl}")
            .agg(F.sum("cnt").alias(f"c{lvl}"))
        )
        out = out.join(dim, [f"gx{lvl}", f"gy{lvl}"])
    level = F.lit(levels - 1)
    for lvl in range(levels - 1, -1, -1):
        level = F.when(F.col(f"c{lvl}") <= threshold, F.lit(lvl)).otherwise(level)
    chosen = out.withColumn("level", level)
    # all base cells under one chosen ancestor agree on level and count;
    # the groupBy collapses them to one row per adaptive cell
    picks = [
        F.when(F.col("level") == lvl, F.col(f"gx{lvl}")) for lvl in range(levels)
    ]
    picky = [
        F.when(F.col("level") == lvl, F.col(f"gy{lvl}")) for lvl in range(levels)
    ]
    pickc = [
        F.when(F.col("level") == lvl, F.col(f"c{lvl}")) for lvl in range(levels)
    ]
    return (
        chosen.select(
            "level",
            F.coalesce(*picks).alias("gxl"),
            F.coalesce(*picky).alias("gyl"),
            F.coalesce(*pickc).alias("n_docs"),
        )
        .groupBy("level", "gxl", "gyl")
        .agg(F.max("n_docs").alias("n_docs"))
    )
