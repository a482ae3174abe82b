"""Areal interpolation — transfer a gridded variable onto target zones.

The reference aggregates rasters into buffers around points
(availability.py zonal stats); the general GIS form of that operation
is AREAL INTERPOLATION (Goodchild & Lam 1980): re-aggregate an
extensive variable from one zoning (here the engine's 100 m cell grid)
onto an incompatible one (arbitrary target rectangles), weighting each
source zone by its overlap fraction:

    T(t) = sum_src v(src) * |src n t| / |src|

``areal_interpolate`` keeps the house engine-exactness contract on a
fundamentally floating-point quantity by QUANTIZING the overlap weight:
the overlap fraction of a cell is computed with one fixed IEEE chain
and rounded to an integer micro-weight

    w = round(wx * wy * 100.0)           (= frac * 1e6 for 100 m cells)

after which the transfer sum  S = sum v * w  is exact DECIMAL(38,0) —
partial-aggregable in any order — and the result is one double division
+ round-6.  (An unquantized sum of v*frac doubles would hash-differ
across engines by summation order.)

Spark shape: target rects explode their covered cell-key ranges
(sequence x sequence — bounded by rect size / cell size) and equi-join
the cell table on (gx, gy); grouped per target id.  The big side (the
cell grid) never moves except by its join key; at 100 TB this is the
same cell-equi-join shape as the flagship PiP join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["areal_interpolate", "idw_interpolate"]


def areal_interpolate(
    cells: DataFrame,
    targets: DataFrame,
    cell_size: float,
    origin_x: float,
    origin_y: float,
    id_col: str = "gs_id",
    val_col: str = "v",
    out_scale: float = 1.0,
) -> DataFrame:
    """[id_col, n_cells, transferred] — extensive-variable transfer of
    integer ``val_col`` from the cell grid onto rect targets
    (minx/miny/maxx/maxy columns).

    ``n_cells`` counts source cells with positive quantized overlap.
    ``transferred`` = sum(v * w) / 1e6 / out_scale, round-6 — pass
    ``out_scale`` = the input's micro-unit factor to report in original
    units (the cast of the exact integer sum to double is deterministic
    at any magnitude; only the *rounding* needs O(<=1e9) values).
    """
    t = targets.select(
        F.col(id_col).alias("tid"), "minx", "miny", "maxx", "maxy"
    )
    gx0 = F.floor((F.col("minx") - origin_x) / cell_size).cast("long")
    gx1 = F.floor((F.col("maxx") - origin_x) / cell_size).cast("long")
    gy0 = F.floor((F.col("miny") - origin_y) / cell_size).cast("long")
    gy1 = F.floor((F.col("maxy") - origin_y) / cell_size).cast("long")
    cover = (
        t.withColumn("gx", F.explode(F.sequence(gx0, gx1)))
        .withColumn("gy", F.explode(F.sequence(gy0, gy1)))
    )
    cx0 = origin_x + F.col("gx").cast("double") * cell_size
    cy0 = origin_y + F.col("gy").cast("double") * cell_size
    wx = F.least(F.col("maxx"), cx0 + cell_size) - F.greatest(F.col("minx"), cx0)
    wy = F.least(F.col("maxy"), cy0 + cell_size) - F.greatest(F.col("miny"), cy0)
    # micro-weight: frac * 1e6 == wx*wy / cell^2 * 1e6 rendered as ONE
    # multiply so both engines run the identical chain
    wq = F.round(wx * wy * F.lit(1e6 / (cell_size * cell_size))).cast("long")
    c = cells.select(
        F.col("gx"), F.col("gy"), F.col(val_col).cast("long").alias("v")
    )
    joined = (
        cover.withColumn("w", wq)
        .filter(F.col("w") > 0)
        .join(c, ["gx", "gy"])
    )
    s = joined.groupBy("tid").agg(
        F.count("*").alias("n_cells"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("w")).alias("s"),
    )
    return s.select(
        F.col("tid").alias(id_col),
        "n_cells",
        F.round(
            F.col("s").cast("double") / F.lit(1e6 * float(out_scale)), 6
        ).alias("transferred"),
    )


def idw_interpolate(
    cells: DataFrame,
    targets: DataFrame,
    radius: float,
    cell_size: float,
    origin_x: float,
    origin_y: float,
    id_col: str = "gs_id",
    val_col: str = "v",
    weight_scale: float = 1e9,
    weight_cap: float = 1e12,
    out_scale: float = 1.0,
) -> DataFrame:
    """Inverse-distance-weighted interpolation (Shepard, p=2) of the
    integer cell variable ``val_col`` at point targets [id, cx, cy]:

        IDW(t) = sum_s w_s * v_s / sum_s w_s,   w_s = 1 / d(t, s)^2

    over source samples (cell centers) within ``radius`` of the target.
    This is the intensive-variable complement of ``areal_interpolate``
    and the deterministic stand-in for kriging on the fitted
    ``q_semivariogram`` (an exact-arithmetic engine cannot ship an
    iterative solver's FP orbit; IDW's quantized weights can be exact).

    Exactness contract: the weight is quantised to
    ``least(round(weight_scale / d2), weight_cap)`` BIGINT (d2 == 0
    degenerates to the cap) computed with one IEEE chain in both
    engines, so numerator and denominator are exact DECIMAL(38,0) /
    HUGEINT sums — order-free — and the result is a single double
    division + round-6.

    Spark shape: each target explodes its radius-box cell-key range
    (bounded by (2r/cell)^2 keys) and equi-joins the cell grid on
    (gx, gy) — the big side moves only by its join key; the exact
    circle test is codegen arithmetic.  Same flagship cell-equi-join
    shape at 100 TB; target count scales freely since the cover side
    is the one exploded.
    """
    t = targets.select(F.col(id_col).alias("tid"), "cx", "cy")
    r = float(radius)
    gx0 = F.floor((F.col("cx") - r - origin_x) / cell_size).cast("long")
    gx1 = F.floor((F.col("cx") + r - origin_x) / cell_size).cast("long")
    gy0 = F.floor((F.col("cy") - r - origin_y) / cell_size).cast("long")
    gy1 = F.floor((F.col("cy") + r - origin_y) / cell_size).cast("long")
    cover = (
        t.withColumn("gx", F.explode(F.sequence(gx0, gx1)))
        .withColumn("gy", F.explode(F.sequence(gy0, gy1)))
    )
    c = cells.select("gx", "gy", F.col(val_col).cast("long").alias("v"))
    half = cell_size / 2.0
    # cell-center coords: origin + g*cell + half, NEVER (g+0.5)*cell —
    # the former is the identical IEEE chain mirrored in the oracle SQL
    sx = origin_x + F.col("gx").cast("double") * cell_size + half
    sy = origin_y + F.col("gy").cast("double") * cell_size + half
    dx = F.col("cx") - sx
    dy = F.col("cy") - sy
    d2 = dx * dx + dy * dy
    wq = F.when(d2 == 0.0, F.lit(float(weight_cap))).otherwise(
        F.least(F.round(F.lit(float(weight_scale)) / d2), F.lit(float(weight_cap)))
    ).cast("long")
    pairs = (
        cover.join(c, ["gx", "gy"])
        .withColumn("d2", d2)
        .filter(F.col("d2") <= F.lit(r * r))
        .withColumn("wq", wq)
    )
    agg = pairs.groupBy("tid").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum(F.col("wq").cast("decimal(38,0)") * F.col("v")).alias("num"),
        F.sum(F.col("wq").cast("decimal(38,0)")).alias("den"),
    )
    return (
        t.select("tid").distinct()
        .join(agg, "tid", "left")
        .select(
            F.col("tid").alias(id_col),
            F.coalesce(F.col("n_samples"), F.lit(0)).cast("long").alias("n_samples"),
            F.round(
                F.col("num").cast("double")
                / F.col("den").cast("double")
                / F.lit(float(out_scale)),
                6,
            ).alias("idw_v"),
        )
    )
