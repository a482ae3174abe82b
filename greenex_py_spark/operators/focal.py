"""Focal (neighborhood) raster statistics with tile halo exchange.

The reference processes rasters as single in-memory arrays; every
distributed raster engine instead stores tiles and must solve the
FOCAL problem: a 3x3 (or kxk) window at a tile edge needs pixels from
the neighbouring tile.  The canonical pattern — and what this module
implements — is **halo exchange**: each tile ships its 1-px border
strips to the (at most 8) adjacent tiles, every tile then assembles a
(h+2)x(w+2) padded canvas and convolves locally.  Data movement is
O(perimeter), not O(area): a 256px tile ships ~1.6% of itself.

Exactness: pixel values are quantised to integers on the producer side
(round-half-away, mirroring SQL ``round``), so focal SUMS are exact
int64 and the focal MEAN is one double division per pixel — the same
order-free contract as the rest of the engine.

Plan shape: one ``mapInPandas`` emits core + strips (bounded explode,
<= 9 parts per tile), one ``groupBy(tile).applyInPandas`` assembles
and convolves — a single shuffle keyed by tile id, identical to the
zonal join's co-partitioning, and per-task memory is one padded tile.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geo.grid import GridSpec

__all__ = [
    "focal_tile_stats", "slope_tile_stats", "pyramid_tile_stats",
    "quantize_half_away",
]


def quantize_half_away(v: np.ndarray, quant: float) -> np.ndarray:
    """round(v * quant) with ties away from zero — the NumPy twin of
    SQL ``round`` (np.round would bank-round .5 to even)."""
    s = v * quant
    return (np.sign(s) * np.floor(np.abs(s) + 0.5)).astype(np.int64)


def _halo_parts(tiles: DataFrame, grid: GridSpec, quant: float) -> DataFrame:
    """Core + 1-px border strips per tile (the halo exchange's map
    side), shared by every focal-family operator: <= 9 parts per tile,
    values quantised int64 on the producer."""
    tile_px = grid.tile_px
    n_tx, n_ty = grid.n_tiles_x, grid.n_tiles_y

    part_schema = (
        "dtx long, dty long, ix0 long, iy0 long, pw long, ph long, "
        "vals array<long>"
    )

    def emit_parts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for t in pdf.itertuples():
                w, h = int(t.w), int(t.h)
                arr = quantize_half_away(
                    np.asarray(t.px, dtype=np.float64).reshape(h, w), quant
                )
                tx, ty = int(t.tx), int(t.ty)
                gx0, gy0 = tx * tile_px, ty * tile_px
                # core: the whole tile to itself
                rows.append(
                    {"dtx": tx, "dty": ty, "ix0": gx0, "iy0": gy0,
                     "pw": w, "ph": h, "vals": arr.ravel().tolist()}
                )
                # strips: 1-px slabs to each existing neighbour
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        if dx == 0 and dy == 0:
                            continue
                        ntx, nty = tx + dx, ty + dy
                        if not (0 <= ntx < n_tx and 0 <= nty < n_ty):
                            continue
                        sx = slice(0, w) if dx == 0 else (
                            slice(w - 1, w) if dx > 0 else slice(0, 1)
                        )
                        sy = slice(0, h) if dy == 0 else (
                            slice(h - 1, h) if dy > 0 else slice(0, 1)
                        )
                        sub = arr[sy, sx]
                        rows.append(
                            {"dtx": ntx, "dty": nty,
                             "ix0": gx0 + sx.start, "iy0": gy0 + sy.start,
                             "pw": sub.shape[1], "ph": sub.shape[0],
                             "vals": sub.ravel().tolist()}
                        )
            yield pd.DataFrame(rows)

    return tiles.mapInPandas(emit_parts, schema=part_schema)


def _assemble_canvas(kdf: pd.DataFrame, grid: GridSpec):
    """(tx, ty, canvas, mask, w, h) from one tile's gathered parts."""
    tile_px = grid.tile_px
    tx, ty = int(kdf["dtx"].iloc[0]), int(kdf["dty"].iloc[0])
    gx0, gy0 = tx * tile_px, ty * tile_px
    w = min(tile_px, grid.npx_x - gx0)
    h = min(tile_px, grid.npx_y - gy0)
    canvas = np.zeros((h + 2, w + 2), dtype=np.int64)
    mask = np.zeros((h + 2, w + 2), dtype=np.int64)
    for p in kdf.itertuples():
        pw, ph = int(p.pw), int(p.ph)
        sub = np.asarray(p.vals, dtype=np.int64).reshape(ph, pw)
        ox = int(p.ix0) - gx0 + 1
        oy = int(p.iy0) - gy0 + 1
        canvas[oy:oy + ph, ox:ox + pw] = sub
        mask[oy:oy + ph, ox:ox + pw] = 1
    return tx, ty, canvas, mask, w, h


def focal_tile_stats(
    tiles: DataFrame,
    grid: GridSpec,
    quant: float = 1e6,
) -> DataFrame:
    """[tx, ty, n_px, tot_focal, min_focal, max_focal, tile_mean] —
    per-tile summary of the 3x3 focal surface over a quantised tile
    raster.

    Per pixel: ``focal_sum`` = exact int64 sum of the <=9 in-raster
    neighbours (edge pixels see fewer — the neighbour count divides,
    GDAL/ArcGIS edge semantics).  The per-tile outputs are all exact
    integers (total / min / max of focal sums, total neighbour count)
    plus ``tile_mean = tot_focal / tot_cnt / quant`` round-6 — the one
    FP step, evaluated in Catalyst so it is the same division+round
    chain the oracle runs.  Raster-sized results stay on the
    executors; only tile-count rows return.
    """
    parts = _halo_parts(tiles, grid, quant)

    out_schema = (
        "tx long, ty long, n_px long, tot_focal long, tot_cnt long, "
        "min_focal long, max_focal long"
    )

    def assemble(kdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty, canvas, mask, w, h = _assemble_canvas(kdf, grid)
        fsum = np.zeros((h, w), dtype=np.int64)
        fcnt = np.zeros((h, w), dtype=np.int64)
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                fsum += canvas[dy:dy + h, dx:dx + w]
                fcnt += mask[dy:dy + h, dx:dx + w]
        return pd.DataFrame(
            {
                "tx": [tx], "ty": [ty], "n_px": [int(h * w)],
                "tot_focal": [int(fsum.sum())],
                "tot_cnt": [int(fcnt.sum())],
                "min_focal": [int(fsum.min())],
                "max_focal": [int(fsum.max())],
            }
        )

    stats = parts.groupBy("dtx", "dty").applyInPandas(assemble, schema=out_schema)
    # the ONE floating-point step happens in Catalyst (not NumPy) so the
    # division + round-6 chain is the same engine pair the whole gate uses
    return stats.select(
        "tx", "ty", "n_px", "tot_focal", "min_focal", "max_focal",
        F.round(
            F.col("tot_focal").cast("double")
            / F.col("tot_cnt").cast("double")
            / F.lit(float(quant)),
            6,
        ).alias("tile_mean"),
    )


def slope_tile_stats(
    tiles: DataFrame,
    grid: GridSpec,
    quant: float = 1e6,
    steep_rise_run: float = 0.01,
) -> DataFrame:
    """[tx, ty, n_interior, n_steep, max_rr2, max_rise_run] — Horn-
    method surface gradient per tile (gdaldem-slope semantics, the
    standard DSM derivative) over the SAME halo exchange as
    ``focal_tile_stats``:

        nx = (z_ne + 2 z_e + z_se) − (z_nw + 2 z_w + z_sw)
        ny = (z_sw + 2 z_s + z_se) − (z_nw + 2 z_n + z_ne)
        rise/run = sqrt(nx² + ny²) / (8 · res · quant)

    Only INTERIOR pixels (full 3x3 neighbourhood after cross-tile
    halos — i.e. everything but the raster border) contribute.  nx, ny
    and rr2 = nx²+ny² are exact int64 on quantised values;
    ``n_steep`` counts pixels with rr2 strictly above the squared
    integer threshold (exact compare, no FP), and the single FP step —
    sqrt(max_rr2)/(8·res·quant), round-6 — runs in Catalyst so it is
    the same chain the oracle evaluates.
    """
    thr = int(round(steep_rise_run * 8.0 * grid.res * quant))
    thr2 = thr * thr

    out_schema = (
        "tx long, ty long, n_interior long, n_steep long, max_rr2 long"
    )

    def assemble(kdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty, canvas, mask, w, h = _assemble_canvas(kdf, grid)
        full = np.ones((h, w), dtype=bool)
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                full &= mask[dy:dy + h, dx:dx + w] == 1
        c = canvas
        nx = (
            (c[0:h, 2:w + 2] + 2 * c[1:h + 1, 2:w + 2] + c[2:h + 2, 2:w + 2])
            - (c[0:h, 0:w] + 2 * c[1:h + 1, 0:w] + c[2:h + 2, 0:w])
        )
        ny = (
            (c[2:h + 2, 0:w] + 2 * c[2:h + 2, 1:w + 1] + c[2:h + 2, 2:w + 2])
            - (c[0:h, 0:w] + 2 * c[0:h, 1:w + 1] + c[0:h, 2:w + 2])
        )
        rr2 = nx * nx + ny * ny
        rr2_in = rr2[full]
        n_int = int(full.sum())
        return pd.DataFrame(
            {
                "tx": [tx], "ty": [ty], "n_interior": [n_int],
                "n_steep": [int((rr2_in > thr2).sum()) if n_int else 0],
                "max_rr2": [int(rr2_in.max()) if n_int else 0],
            }
        )

    parts = _halo_parts(tiles, grid, quant)
    stats = parts.groupBy("dtx", "dty").applyInPandas(assemble, schema=out_schema)
    denom = 8.0 * grid.res * quant
    return stats.select(
        "tx", "ty", "n_interior", "n_steep", "max_rr2",
        F.round(
            F.sqrt(F.col("max_rr2").cast("double")) / F.lit(denom), 6
        ).alias("max_rise_run"),
    )


def pyramid_tile_stats(
    tiles: DataFrame,
    grid: GridSpec,
    levels: int = 2,
    quant: float = 1e6,
) -> DataFrame:
    """[level, tx, ty, n_px, tot_q, min_pool, max_pool, level_mean] —
    overview-pyramid construction (COG/ZYX overview semantics): level-L
    pixels are EXACT integer sums of their 2^L x 2^L base block, so
    pooling conserves mass (tot_q is level-invariant per tile — the
    gate's conservation property) while min/max genuinely coarsen.

    Requires tile origins and dims divisible by 2^levels (the fixture's
    256-px tiles with a 232-px remainder satisfy it for levels<=2), so
    per-tile pooling equals global pooling with NO halo exchange —
    zero shuffles: one mapInPandas emits every level's stats straight
    from the tile, and the single FP step (mean de-quantization) runs
    in Catalyst.
    """
    for lv in range(1, levels + 1):
        step = 1 << lv
        if grid.tile_px % step:
            raise ValueError("tile_px must divide by 2^levels")

    out_schema = (
        "level long, tx long, ty long, n_px long, tot_q long, "
        "min_pool long, max_pool long"
    )

    def emit(batches):
        for pdf in batches:
            rows = []
            for t in pdf.itertuples():
                w, h = int(t.w), int(t.h)
                arr = quantize_half_away(
                    np.asarray(t.px, dtype=np.float64).reshape(h, w), quant
                )
                cur = arr
                for lv in range(1, levels + 1):
                    hh, ww = cur.shape
                    cur = cur.reshape(hh // 2, 2, ww // 2, 2).sum(axis=(1, 3))
                    rows.append(
                        {
                            "level": lv, "tx": int(t.tx), "ty": int(t.ty),
                            "n_px": int(cur.size),
                            "tot_q": int(cur.sum()),
                            "min_pool": int(cur.min()),
                            "max_pool": int(cur.max()),
                        }
                    )
            yield pd.DataFrame(rows)

    stats = tiles.mapInPandas(emit, schema=out_schema)
    denom = F.col("n_px").cast("double") * F.pow(
        F.lit(4.0), F.col("level").cast("double")
    ) * F.lit(float(quant))
    return stats.withColumn(
        "level_mean", F.round(F.col("tot_q").cast("double") / denom, 6)
    )
