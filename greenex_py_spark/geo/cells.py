"""Hierarchy-free integer grid cell index (H3/S2 stand-in).

The sandbox has no ``h3``/``s2`` package, so the engine uses a deterministic
projected grid: ``gx = floor((x - origin_x)/size)``, ``gy = floor((y -
origin_y)/size)``, ``cell = gy * 2^20 + gx``.  For equi-join prefiltering
this is semantically equivalent to H3/S2 cell ids (the reference's
cKDTree/bbox pruning at GreenExp/accessibility.py:228,281 plays the same
role); only join *results* must match the reference, and they are refined
by exact geometry predicates after the cell join.

The encoding ``gy * 2^20 + gx`` (not Morton) is chosen deliberately: it is
expressible in ANSI SQL (``floor()``, ``*``, ``+``) so every cell-join
operator has a DuckDB oracle, and Spark min/max column stats on it still
prune whole y-bands of tiles.  ``morton_cell`` is provided for sinks that
want Z-order file clustering (write-time ``sortWithinPartitions``).
"""

from __future__ import annotations

import numpy as np

# Default grid for the synthetic city (FIXTURES.md §2): 10 km × 10 km,
# origin (100000, 450000), 100 m cells.
ORIGIN_X = 100000.0
ORIGIN_Y = 450000.0
CELL_SIZE = 100.0
_SHIFT = 20  # gx occupies the low 20 bits: cell = gy * 2^20 + gx
_BASE = 1 << _SHIFT
CELL_BASE = _BASE  # public alias (operators may not import data/ fixtures)


def cell_of(
    x: np.ndarray,
    y: np.ndarray,
    size: float = CELL_SIZE,
    origin_x: float = ORIGIN_X,
    origin_y: float = ORIGIN_Y,
) -> np.ndarray:
    """Vectorized cell id for point arrays (int64)."""
    gx = np.floor((np.asarray(x, dtype=np.float64) - origin_x) / size).astype(np.int64)
    gy = np.floor((np.asarray(y, dtype=np.float64) - origin_y) / size).astype(np.int64)
    return gy * _BASE + gx


def cell_xy(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`cell_of` → (gx, gy) grid coords."""
    cell = np.asarray(cell, dtype=np.int64)
    gy = cell >> _SHIFT
    gx = cell - (gy << _SHIFT)
    return gx, gy


def cell_sql(x_col: str, y_col: str, size: float = CELL_SIZE,
             origin_x: float = ORIGIN_X, origin_y: float = ORIGIN_Y) -> str:
    """ANSI-SQL expression computing the same cell id (Spark & DuckDB)."""
    return (
        f"(CAST(floor(({y_col} - {origin_y}) / {size}) AS BIGINT) * {_BASE} "
        f"+ CAST(floor(({x_col} - {origin_x}) / {size}) AS BIGINT))"
    )


def k_ring(cells: np.ndarray, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k of each input cell.

    Returns shape (len(cells), (2k+1)^2).  Candidate generation for the
    distance-bounded 1-NN join (SURVEY.md J3): ring radius =
    ceil(target_dist / cell_size).
    """
    cells = np.asarray(cells, dtype=np.int64)
    offs = np.arange(-k, k + 1, dtype=np.int64)
    d = (offs[:, None] * _BASE + offs[None, :]).ravel()  # dy*BASE + dx
    return cells[:, None] + d[None, :]


def bbox_cover(
    minx: float, miny: float, maxx: float, maxy: float,
    size: float = CELL_SIZE, origin_x: float = ORIGIN_X, origin_y: float = ORIGIN_Y,
) -> np.ndarray:
    """Cell ids of every grid cell intersecting the bbox (inclusive)."""
    gx0 = int(np.floor((minx - origin_x) / size))
    gx1 = int(np.floor((maxx - origin_x) / size))
    gy0 = int(np.floor((miny - origin_y) / size))
    gy1 = int(np.floor((maxy - origin_y) / size))
    gys, gxs = np.meshgrid(
        np.arange(gy0, gy1 + 1, dtype=np.int64),
        np.arange(gx0, gx1 + 1, dtype=np.int64),
        indexing="ij",
    )
    return (gys * _BASE + gxs).ravel()


def polygon_cover(
    rings: list[np.ndarray],
    size: float = CELL_SIZE,
    origin_x: float = ORIGIN_X,
    origin_y: float = ORIGIN_Y,
    pad: float = 0.0,
) -> np.ndarray:
    """Cells whose square intersects the polygon's bbox, refined so that
    cells entirely outside the polygon (by center-corner sampling) are kept
    only when the bbox test alone can't reject them.

    Cover sets are *supersets* of true intersection — safe for equi-join
    prefiltering (false positives are removed by the exact predicate after
    the join).  ``pad`` expands the bbox (e.g. for distance-d joins).
    """
    ext = rings[0]
    return bbox_cover(
        float(ext[:, 0].min()) - pad,
        float(ext[:, 1].min()) - pad,
        float(ext[:, 0].max()) + pad,
        float(ext[:, 1].max()) + pad,
        size=size, origin_x=origin_x, origin_y=origin_y,
    )


def morton_cell(x: np.ndarray, y: np.ndarray, size: float = CELL_SIZE,
                origin_x: float = ORIGIN_X, origin_y: float = ORIGIN_Y) -> np.ndarray:
    """Z-order (Morton) interleave of the grid coords — used only for
    write-time file clustering, never as a join key."""
    gx = np.floor((np.asarray(x) - origin_x) / size).astype(np.uint64)
    gy = np.floor((np.asarray(y) - origin_y) / size).astype(np.uint64)

    def _part(v: np.ndarray) -> np.ndarray:
        v &= np.uint64(0xFFFFFFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
        return v

    return (_part(gx) | (_part(gy) << np.uint64(1))).astype(np.int64)


def hilbert_xy2d(order: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized Hilbert index (classic per-bit rotate/reflect walk)
    of int64 grid coords in [0, 2^order) — the NumPy twin of
    engine/layout.hilbert_sql_ctes (same state machine, same round
    constants; cross-checked against it by the layout tests)."""
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = 1 << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        swap = ry == 0
        flip = swap & (rx == 1)
        xf = np.where(flip, s - 1 - x, x)
        yf = np.where(flip, s - 1 - y, y)
        x, y = np.where(swap, yf, xf), np.where(swap, xf, yf)
        s >>= 1
    return d


# ---------------------------------------------------------------------------
# Hexagonal binning (H3-style axial grid on the projected plane)
# ---------------------------------------------------------------------------

# axial-transform constants for a pointy-top hex lattice of circumradius
# ``size``:  qf = (x·HEX_QX − y·HEX_QY) / size,  rf = y·HEX_RY / size.
# Computed once here and rendered with repr() into the SQL oracle, so
# both engines evaluate the identical correctly-rounded double chain
# (the same no-per-row-transcendentals contract as hillshade_constants).
HEX_QX = 0.5773502691896257  # sqrt(3)/3
HEX_QY = 1.0 / 3.0
HEX_RY = 2.0 / 3.0


def hex_cell_cols(x_col, y_col, size: float):
    """(hq, hr) Spark Columns — axial hex coordinates of each point via
    cube rounding (Red Blob Games' canonical algorithm), entirely in
    Catalyst codegen: fractional axial coords, floor(·+0.5) per cube
    axis, then the largest-residual axis is recomputed from the other
    two so hq+hr+hs == 0 holds exactly.  Every op is a correctly-
    rounded IEEE primitive in a fixed association order, so the SQL
    twin (:func:`hex_cell_sql`) is bit-identical — ties in the residual
    comparison resolve the same way on both engines.

    This is the planar stand-in for H3 cell assignment (the true H3
    icosahedral projection needs the h3 lib, absent in the sandbox);
    downstream join/agg shapes are identical.
    """
    from pyspark.sql import functions as F

    xf = (x_col * F.lit(HEX_QX) - y_col * F.lit(HEX_QY)) / F.lit(float(size))
    zf = y_col * F.lit(HEX_RY) / F.lit(float(size))
    yf = -xf - zf
    rx = F.floor(xf + F.lit(0.5)).cast("double")
    ry = F.floor(yf + F.lit(0.5)).cast("double")
    rz = F.floor(zf + F.lit(0.5)).cast("double")
    dx, dy, dz = F.abs(rx - xf), F.abs(ry - yf), F.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    hq = F.when(fix_x, -ry - rz).otherwise(rx)
    hr = F.when(~fix_x & ~(dy > dz), -rx - ry).otherwise(rz)
    return hq.cast("long").alias("hq"), hr.cast("long").alias("hr")


def hex_cell_sql(x: str, y: str, size: float) -> tuple[str, str]:
    """SQL twin of :func:`hex_cell_cols` — (hq_expr, hr_expr) rendered
    from the same constants with the same association order."""
    xf = f"((({x}) * {HEX_QX!r} - ({y}) * {HEX_QY!r}) / {float(size)!r})"
    zf = f"(({y}) * {HEX_RY!r} / {float(size)!r})"
    yf = f"(-{xf} - {zf})"
    rx = f"CAST(floor({xf} + 0.5) AS DOUBLE)"
    ry = f"CAST(floor({yf} + 0.5) AS DOUBLE)"
    rz = f"CAST(floor({zf} + 0.5) AS DOUBLE)"
    dx, dy, dz = (f"abs({rx} - {xf})", f"abs({ry} - {yf})", f"abs({rz} - {zf})")
    fix_x = f"({dx} > {dy} AND {dx} > {dz})"
    hq = f"CAST(CASE WHEN {fix_x} THEN -{ry} - {rz} ELSE {rx} END AS BIGINT)"
    hr = (
        f"CAST(CASE WHEN NOT {fix_x} AND NOT ({dy} > {dz})"
        f" THEN -{rx} - {ry} ELSE {rz} END AS BIGINT)"
    )
    return hq, hr
