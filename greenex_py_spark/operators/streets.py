"""Street-segment × grid overlay statistics.

Line-in-cell length density — the vector→raster LINE counterpart of the
polygon zonal family (operators/zonal.py): every street segment is
clipped to each grid cell it covers with the closed-form Liang–Barsky
parametric clip, lengths quantized to integer micrometers so the
per-cell sums are EXACT (order-free) integer aggregations, and the
single FP division runs once per output row in Catalyst.

The reference has no street-density stage (it consumes OSMnx networks
whole); this generalizes its raster tiling to linear features — street
density per cell is the standard walkability/urban-form covariate next
to NDVI and landcover.

Scale shape: cover explode is O(cells touched) per segment (map-side
``sequence``+``explode``), the only shuffle is the final cell
aggregate, and skewed cells (downtown) are absorbed by map-side
combine.  Pure codegen end-to-end; every formula below is rendered
identically in the DuckDB oracle.

Boundary semantics: the clip interval is CLOSED, but the bbox cover
uses the floor convention — a segment lying exactly ON a shared cell
boundary is assigned to the upper/right cell only (its bbox never
explodes to the lower one), while a segment CROSSING a boundary
credits both cells with their clipped parts; zero-length touches are
filtered.  Pick a grid origin/size that doesn't align with the street
lattice if boundary-lying segments matter (the gate query uses 260 m
cells offset 13 m for exactly this reason).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geo.cells import CELL_BASE

__all__ = [
    "street_length_per_cell",
    "street_orientation_hist",
    "orientation_thresholds",
    "sample_points_linspace",
    "N_ORIENT_BINS",
]

_INF = 1.0e30


def _axis_params(p1, d, lo, hi):
    """(enter, exit) clip params for one axis; closed-form CASE chain
    identical to the oracle's.  Degenerate axis (d == 0): inside the
    slab → (-INF, +INF), outside → (+INF, -INF) (empty interval)."""
    inside = (p1 >= lo) & (p1 <= hi)
    t_a = (lo - p1) / d
    t_b = (hi - p1) / d
    enter = (
        F.when(d != 0, F.least(t_a, t_b))
        .otherwise(F.when(inside, F.lit(-_INF)).otherwise(F.lit(_INF)))
    )
    exit_ = (
        F.when(d != 0, F.greatest(t_a, t_b))
        .otherwise(F.when(inside, F.lit(_INF)).otherwise(F.lit(-_INF)))
    )
    return enter, exit_


def street_length_per_cell(
    segments: DataFrame,
    size: float,
    ox: float,
    oy: float,
) -> DataFrame:
    """[cell, n_segments, street_len] — total clipped street length and
    contributing-segment count per ``size``-metre grid cell anchored at
    (ox, oy).  ``segments``: (edge_id, x1, y1, x2, y2).

    street_len is the round-6 de-quantization of an exact integer
    micrometer sum; n_segments counts segments with strictly positive
    in-cell length.
    """
    s = segments.select("edge_id", "x1", "y1", "x2", "y2")
    gx0 = F.floor((F.least("x1", "x2") - ox) / size).cast("long")
    gx1 = F.floor((F.greatest("x1", "x2") - ox) / size).cast("long")
    gy0 = F.floor((F.least("y1", "y2") - oy) / size).cast("long")
    gy1 = F.floor((F.greatest("y1", "y2") - oy) / size).cast("long")
    e = (
        s.withColumn("_gy", F.explode(F.sequence(gy0, gy1)))
        .withColumn("_gx", F.explode(F.sequence(gx0, gx1)))
    )
    cx0 = ox + F.col("_gx") * size
    cy0 = oy + F.col("_gy") * size
    dx = F.col("x2") - F.col("x1")
    dy = F.col("y2") - F.col("y1")
    tx_en, tx_ex = _axis_params(F.col("x1"), dx, cx0, cx0 + size)
    ty_en, ty_ex = _axis_params(F.col("y1"), dy, cy0, cy0 + size)
    t0 = F.greatest(F.lit(0.0), tx_en, ty_en)
    t1 = F.least(F.lit(1.0), tx_ex, ty_ex)
    seg_len = F.sqrt(dx * dx + dy * dy)
    len_q = F.round(F.greatest(F.lit(0.0), t1 - t0) * seg_len * 1.0e6, 0).cast(
        "long"
    )
    return (
        e.select(
            (F.col("_gy") * CELL_BASE + F.col("_gx")).alias("cell"),
            len_q.alias("_lq"),
        )
        .filter(F.col("_lq") > 0)
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.round(F.sum("_lq") / 1.0e6, 6).alias("street_len"),
        )
    )


import math

# undirected-bearing bin edges at 10° steps: (cos, sin) literal pairs —
# Python float repr round-trips, so the oracle's decimal literals parse
# to the SAME doubles and the threshold tests agree bit-for-bit
N_ORIENT_BINS = 18


def orientation_thresholds() -> list[tuple[float, float]]:
    return [
        (math.cos(math.radians(10 * k)), math.sin(math.radians(10 * k)))
        for k in range(1, N_ORIENT_BINS)
    ]


def street_orientation_hist(segments: DataFrame) -> DataFrame:
    """[bin, n_segments, len_share] — length-weighted undirected street
    bearing histogram in 10° bins (Boeing 2019 street-orientation
    order, the urban-form covariate): bearing θ ∈ [0°, 180°) from the
    +x axis after flipping each segment into the upper half-plane.

    NO atan2 anywhere (libm disagreement between JVM and C would flip
    bins at the exact axis bearings a street lattice is full of): the
    bin index is the count of half-plane tests passed,

        θ ≥ t_k  ⇔  dy·cos(t_k) − dx·sin(t_k) ≥ 0      (dy ≥ 0)

    with (cos, sin) literals shared with the oracle.  Lengths are
    quantized to integer micrometers so the per-bin sums are exact;
    the share division is the single FP step (round-6), computed
    against an unpartitioned-window total (the house side-statistics
    pattern — no join-back).  Zero-length segments are dropped.
    """
    s = segments.select("x1", "y1", "x2", "y2")
    dx0 = F.col("x2") - F.col("x1")
    dy0 = F.col("y2") - F.col("y1")
    flip = (dy0 < 0) | ((dy0 == 0) & (dx0 < 0))
    dx = F.when(flip, -dx0).otherwise(dx0)
    dy = F.when(flip, -dy0).otherwise(dy0)
    bin_expr = None
    for c, sn in orientation_thresholds():
        term = F.when(dy * F.lit(c) - dx * F.lit(sn) >= 0, 1).otherwise(0)
        bin_expr = term if bin_expr is None else bin_expr + term
    len_q = F.round(F.sqrt(dx * dx + dy * dy) * 1.0e6, 0).cast("long")
    from pyspark.sql import Window

    g = (
        s.filter((dx0 != 0) | (dy0 != 0))
        .select(bin_expr.alias("bin"), len_q.alias("_lq"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_segments"), F.sum("_lq").alias("_len"))
    )
    total = F.sum("_len").over(Window.partitionBy())
    return g.select(
        "bin",
        "n_segments",
        F.round(F.col("_len").cast("double") / total, 6).alias("len_share"),
    )


def sample_points_linspace(
    segments: DataFrame,
    sample_dist: float,
) -> DataFrame:
    """[edge_id, sp_id, x, y] — the viewshed road-sampling scheme
    (GreenExp/visibility.py:568-589) as a PURE-CODEGEN twin of
    ``geo.kernels.interpolate_linspace`` for 2-point segments:

    * length ``L < sample_dist`` → ONE point, the segment centroid
      (shapely ``LineString.centroid`` of a 2-vertex line,
      visibility.py:581);
    * else ``n = int(L / sample_dist) + 1`` points at
      ``np.linspace(0, L, n)`` distances (visibility.py:584-586) —
      BOTH endpoints included, replicated FP-exactly as
      ``d_k = k · (L / (n−1))`` with ``d_{n−1} = L`` (NumPy writes the
      stop value into the last slot), then ``t = d_k / L``,
      ``x = x1 + t·(x2−x1)``.

    Every arithmetic step is a single IEEE double op rendered
    identically in the DuckDB oracle, so the match is bit-exact; the
    kernel twin differs only in ``np.hypot`` vs ``sqrt(dx²+dy²)`` for
    L (≤1 ulp, observable only when L sits within that ulp of a
    ``sample_dist`` multiple — excluded by the fixture and asserted
    ≈ in tests/test_operators.test_sample_points_linspace_vs_kernel).

    Scale shape: map-side ``sequence``+``posexplode`` only (bounded by
    n per segment), zero shuffles, zero Python — the sampling stage of
    a planet-scale streetview pipeline is embarrassingly parallel and
    this keeps it inside WholeStageCodegen.

    Coordinates are round-6 (micrometer) — safe at 1e5..1e7 magnitude
    per BENCH/SCALE_AUDIT.md's round-portability bound.
    """
    s = segments.select("edge_id", "x1", "y1", "x2", "y2")
    dx = F.col("x2") - F.col("x1")
    dy = F.col("y2") - F.col("y1")
    length = F.sqrt(dx * dx + dy * dy)
    n = (F.floor(length / sample_dist) + 1).cast("long")
    e = (
        s.withColumn("_L", length)
        .withColumn("_n", n)
        .select(
            "edge_id", "x1", "y1", "x2", "y2", "_L", "_n",
            F.posexplode(F.sequence(F.lit(0).cast("long"), F.col("_n") - 1)),
        )
        .withColumnRenamed("pos", "sp_id")
    )
    k = F.col("sp_id").cast("double")
    last = F.col("sp_id") == F.col("_n") - 1
    dist = F.when(last, F.col("_L")).otherwise(
        k * (F.col("_L") / (F.col("_n") - 1).cast("double"))
    )
    t = dist / F.col("_L")
    dxe = F.col("x2") - F.col("x1")
    dye = F.col("y2") - F.col("y1")
    px = F.when(F.col("_n") == 1, (F.col("x1") + F.col("x2")) / 2).otherwise(
        F.col("x1") + t * dxe
    )
    py = F.when(F.col("_n") == 1, (F.col("y1") + F.col("y2")) / 2).otherwise(
        F.col("y1") + t * dye
    )
    return e.select(
        "edge_id",
        F.col("sp_id").cast("long").alias("sp_id"),
        F.round(px, 6).alias("x"),
        F.round(py, 6).alias("y"),
    )
