"""Raster regridding (R2 in SURVEY.md §2.8) — tile-table → tile-table
nearest-neighbour resample.

The reference leans on ``gdal.Warp`` to force every raster onto the
PoI grid (GreenExp/availability.py:181,457; visibility.py:123,149,185);
round 1 only had the identity case (single-CRS fixture world).  This is
the general kernel: given a source tile table and a target
:class:`GridSpec` (any origin/resolution/extent), emit the target tile
table where each target pixel takes the value of the SOURCE pixel whose
cell contains the target pixel's center (the classic nearest-neighbour
gather; ties at cell boundaries resolve by ``floor``, i.e. to the
containing cell, matching GDAL).

Plan shape (the halo-free regrid):

1. target tiles enumerate from ``spark.range`` (codegen — no driver
   loop, no data skew: one row per target tile);
2. each target tile explodes to the source tiles its extent overlaps
   (``sequence`` — bounded fan-out of (dst_tile_m / src_tile_m + 1)²);
3. equi-join to the source tile table;
4. ``groupBy(dst tile) → applyInPandas``: the Arrow kernel gathers with
   two 1-D index vectors (the x/y mappings are separable), so each
   target tile is one fancy-index — no per-pixel Python.

Coordinate transforms between CRSs compose here: project the target
pixel centers through geo/crs before the source-index computation (the
mixed-CRS NDVI-UTM vs landcover-4326 case).  Source gaps (target area
outside the source raster) yield NaN, the reference's nodata behavior.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geo.grid import GridSpec


def resample_nearest(
    src_tiles: DataFrame,
    dst_grid: GridSpec,
    src_grid: GridSpec | None = None,
    layer: str | None = None,
    transform: Callable[[np.ndarray, np.ndarray], tuple[np.ndarray, np.ndarray]] | None = None,
) -> DataFrame:
    """Source tile table → target tile table on ``dst_grid``.

    ``transform(cx, cy) -> (sx, sy)`` optionally maps target pixel
    centers into the source CRS before indexing (plain NumPy math, e.g.
    geo/crs.lonlat_to_mercator); identity when None.  With a transform
    the x/y index maps are no longer separable, so the kernel falls back
    to full 2-D index arrays — same gather, 2× the index memory.
    """
    spark = src_tiles.sparkSession
    if layer is not None and "layer" in src_tiles.columns:
        src_tiles = src_tiles.filter(F.col("layer") == layer)
    src_grid = src_grid or GridSpec.from_tiles(src_tiles)
    sg, dg = src_grid, dst_grid

    n_dst = dg.n_tiles_x * dg.n_tiles_y
    base = spark.range(n_dst).select(
        (F.col("id") % dg.n_tiles_x).cast("int").alias("tx"),
        (F.col("id") / dg.n_tiles_x).cast("int").alias("ty"),
    )
    w = F.least(F.lit(dg.tile_px), F.lit(dg.npx_x) - F.col("tx") * dg.tile_px)
    h = F.least(F.lit(dg.tile_px), F.lit(dg.npx_y) - F.col("ty") * dg.tile_px)
    dst = base.select(
        "tx", "ty", w.alias("w"), h.alias("h"),
        (F.lit(dg.origin_x) + F.col("tx") * F.lit(dg.tile_m)).alias("x0"),
        (F.lit(dg.origin_y) + F.col("ty") * F.lit(dg.tile_m)).alias("y0"),
    )
    # source tile span per target tile.  Identity: the tile's own bbox
    # (padded half a source pixel so a center exactly on a tile seam
    # still finds its source tile).  With a CRS transform the span must
    # be computed in SOURCE coordinates: map a boundary grid of the
    # target tile through the transform (projections are smooth, so
    # boundary extremes bound the interior; pad 2 src pixels for
    # residual curvature) — an Arrow pass over tile METADATA only.
    if transform is None:
        dst_s = dst.withColumns(
            {
                "sminx": F.col("x0"),
                "smaxx": F.col("x0") + F.col("w") * dg.res,
                "sminy": F.col("y0"),
                "smaxy": F.col("y0") + F.col("h") * dg.res,
            }
        )
        pad = sg.res * 0.5
    else:
        def bbox_kernel(batches):
            for pdf in batches:
                smnx, smxx, smny, smxy = [], [], [], []
                for t in pdf.itertuples(index=False):
                    xs = np.linspace(t.x0, t.x0 + int(t.w) * dg.res, 9)
                    ys = np.linspace(t.y0, t.y0 + int(t.h) * dg.res, 9)
                    X, Y = np.meshgrid(xs, ys)
                    with np.errstate(all="ignore"):
                        SX, SY = transform(X, Y)
                    fin = np.isfinite(SX) & np.isfinite(SY)
                    if fin.any():
                        smnx.append(float(SX[fin].min()))
                        smxx.append(float(SX[fin].max()))
                        smny.append(float(SY[fin].min()))
                        smxy.append(float(SY[fin].max()))
                    else:
                        # tile entirely outside the transform's domain:
                        # keep the row (degenerate span clamps to one
                        # source tile; the gather masks reject every
                        # pixel) so the output still carries a NaN tile
                        # instead of silently dropping it
                        smnx.append(sg.origin_x)
                        smxx.append(sg.origin_x)
                        smny.append(sg.origin_y)
                        smxy.append(sg.origin_y)
                out = pdf.copy()
                out["sminx"], out["smaxx"] = smnx, smxx
                out["sminy"], out["smaxy"] = smny, smxy
                yield out

        dst_s = dst.mapInPandas(
            bbox_kernel,
            schema=(
                "tx int, ty int, w int, h int, x0 double, y0 double, "
                "sminx double, smaxx double, sminy double, smaxy double"
            ),
        )
        pad = sg.res * 2.0
    stx0 = F.greatest(F.lit(0), F.floor((F.col("sminx") - pad - sg.origin_x) / sg.tile_m)).cast("int")
    stx1 = F.least(
        F.lit(sg.n_tiles_x - 1),
        F.floor((F.col("smaxx") + pad - sg.origin_x) / sg.tile_m),
    ).cast("int")
    sty0 = F.greatest(F.lit(0), F.floor((F.col("sminy") - pad - sg.origin_y) / sg.tile_m)).cast("int")
    sty1 = F.least(
        F.lit(sg.n_tiles_y - 1),
        F.floor((F.col("smaxy") + pad - sg.origin_y) / sg.tile_m),
    ).cast("int")
    spanned = (
        dst_s.withColumn("sty", F.explode(F.sequence(sty0, F.greatest(sty0, sty1))))
        .withColumn("stx", F.explode(F.sequence(stx0, F.greatest(stx0, stx1))))
        .drop("sminx", "smaxx", "sminy", "smaxy")
    )
    src = src_tiles.select(
        F.col("tx").alias("stx"), F.col("ty").alias("sty"),
        F.col("w").alias("sw"), F.col("h").alias("sh"), F.col("px").alias("spx"),
        *([F.col("layer").alias("slayer")] if "layer" in src_tiles.columns else []),
    )
    joined = spanned.join(src, ["stx", "sty"], "left")

    out_layer = layer
    tile_px = dg.tile_px

    def kernel(kdf: pd.DataFrame) -> pd.DataFrame:
        if "slayer" in kdf.columns:
            layers = kdf["slayer"].dropna().unique()
            if len(layers) > 1:
                raise ValueError(
                    f"resample_nearest got a multi-layer tile table {sorted(layers)}; "
                    "pass layer=<name> to select one (mixed layers would "
                    "overwrite each other nondeterministically)"
                )
        t = kdf.iloc[0]
        tw, th = int(t["w"]), int(t["h"])
        gx = t["tx"] * tile_px + np.arange(tw)
        gy = t["ty"] * tile_px + np.arange(th)
        cx = dg.origin_x + (gx + 0.5) * dg.res
        cy = dg.origin_y + (gy + 0.5) * dg.res
        out = np.full((th, tw), np.nan)
        if transform is None:
            six = np.floor((cx - sg.origin_x) / sg.res).astype(np.int64)
            siy = np.floor((cy - sg.origin_y) / sg.res).astype(np.int64)
            for srow in kdf.itertuples(index=False):
                if srow.spx is None:
                    continue
                buf = srow.spx
                if isinstance(buf, (bytes, bytearray)):
                    arr = np.frombuffer(buf, dtype=np.float32).astype(np.float64)
                else:
                    arr = np.asarray(buf, dtype=np.float64)
                arr = arr.reshape(int(srow.sh), int(srow.sw))
                gx0 = int(srow.stx) * sg.tile_px
                gy0 = int(srow.sty) * sg.tile_px
                cm = (six >= gx0) & (six < gx0 + int(srow.sw))
                rm = (siy >= gy0) & (siy < gy0 + int(srow.sh))
                if cm.any() and rm.any():
                    out[np.ix_(rm, cm)] = arr[np.ix_(siy[rm] - gy0, six[cm] - gx0)]
        else:
            X, Y = np.meshgrid(cx, cy)
            with np.errstate(all="ignore"):
                SX, SY = transform(X, Y)
            fin = np.isfinite(SX) & np.isfinite(SY)
            # out-of-domain centers get an impossible index (< any tile)
            six = np.where(fin, np.floor(np.where(fin, (SX - sg.origin_x) / sg.res, 0.0)), -1).astype(np.int64)
            siy = np.where(fin, np.floor(np.where(fin, (SY - sg.origin_y) / sg.res, 0.0)), -1).astype(np.int64)
            for srow in kdf.itertuples(index=False):
                if srow.spx is None:
                    continue
                buf = srow.spx
                if isinstance(buf, (bytes, bytearray)):
                    arr = np.frombuffer(buf, dtype=np.float32).astype(np.float64)
                else:
                    arr = np.asarray(buf, dtype=np.float64)
                arr = arr.reshape(int(srow.sh), int(srow.sw))
                gx0 = int(srow.stx) * sg.tile_px
                gy0 = int(srow.sty) * sg.tile_px
                m = (six >= gx0) & (six < gx0 + int(srow.sw)) & (siy >= gy0) & (siy < gy0 + int(srow.sh))
                out[m] = arr[siy[m] - gy0, six[m] - gx0]
        lay = out_layer
        if lay is None and "slayer" in kdf.columns:
            nn = kdf["slayer"].dropna()
            lay = str(nn.iloc[0]) if len(nn) else "resampled"
        return pd.DataFrame(
            [
                {
                    "layer": lay or "resampled",
                    "tx": int(t["tx"]), "ty": int(t["ty"]),
                    "x0": float(t["x0"]), "y0": float(t["y0"]),
                    "res": dg.res, "w": tw, "h": th,
                    "px": out.ravel(),
                }
            ]
        )

    schema = (
        "layer string, tx int, ty int, x0 double, y0 double, "
        "res double, w int, h int, px array<double>"
    )
    return joined.groupBy("tx", "ty").applyInPandas(kernel, schema=schema)


def resample_bilinear(
    src_tiles: DataFrame,
    dst_grid: GridSpec,
    src_grid: GridSpec | None = None,
    layer: str | None = None,
) -> DataFrame:
    """Source tile table → target tile table, BILINEAR kernel (the
    gdal.Warp -r bilinear companion to :func:`resample_nearest`):
    each target pixel center interpolates the 4 surrounding source
    pixel CENTERS with the fixed association order

        top = (1-fx)·v00 + fx·v10;  bot = (1-fx)·v01 + fx·v11
        val = (1-fy)·top + fy·bot

    (mirrored verbatim in the gate oracle — only correctly-rounded
    IEEE ops, so both engines agree to the last ulp given equal source
    values).  Target centers whose 2×2 source neighbourhood is not
    fully inside the raster yield NaN (no edge clamping — the oracle
    contract; GDAL would clamp, documented divergence).

    Plan shape = resample_nearest's halo-free gather: target tiles
    enumerate from ``spark.range``, explode to the source tiles their
    padded bbox overlaps (pad 1.5 source px: the 2×2 stencil reaches
    one source pixel beyond the bbox), one equi-join, one Arrow kernel
    per target tile assembling a local source canvas and doing four
    fancy-indexed gathers.  Identity CRS only (compose a transform by
    regridding through an intermediate grid with resample_nearest).
    """
    spark = src_tiles.sparkSession
    if layer is not None and "layer" in src_tiles.columns:
        src_tiles = src_tiles.filter(F.col("layer") == layer)
    src_grid = src_grid or GridSpec.from_tiles(src_tiles)
    sg, dg = src_grid, dst_grid

    n_dst = dg.n_tiles_x * dg.n_tiles_y
    base = spark.range(n_dst).select(
        (F.col("id") % dg.n_tiles_x).cast("int").alias("tx"),
        (F.col("id") / dg.n_tiles_x).cast("int").alias("ty"),
    )
    w = F.least(F.lit(dg.tile_px), F.lit(dg.npx_x) - F.col("tx") * dg.tile_px)
    h = F.least(F.lit(dg.tile_px), F.lit(dg.npx_y) - F.col("ty") * dg.tile_px)
    dst = base.select(
        "tx", "ty", w.alias("w"), h.alias("h"),
        (F.lit(dg.origin_x) + F.col("tx") * F.lit(dg.tile_m)).alias("x0"),
        (F.lit(dg.origin_y) + F.col("ty") * F.lit(dg.tile_m)).alias("y0"),
    )
    pad = sg.res * 1.5
    stx0 = F.greatest(F.lit(0), F.floor((F.col("x0") - pad - sg.origin_x) / sg.tile_m)).cast("int")
    stx1 = F.least(
        F.lit(sg.n_tiles_x - 1),
        F.floor((F.col("x0") + F.col("w") * dg.res + pad - sg.origin_x) / sg.tile_m),
    ).cast("int")
    sty0 = F.greatest(F.lit(0), F.floor((F.col("y0") - pad - sg.origin_y) / sg.tile_m)).cast("int")
    sty1 = F.least(
        F.lit(sg.n_tiles_y - 1),
        F.floor((F.col("y0") + F.col("h") * dg.res + pad - sg.origin_y) / sg.tile_m),
    ).cast("int")
    spanned = (
        dst.withColumn("sty", F.explode(F.sequence(sty0, F.greatest(sty0, sty1))))
        .withColumn("stx", F.explode(F.sequence(stx0, F.greatest(stx0, stx1))))
    )
    src = src_tiles.select(
        F.col("tx").alias("stx"), F.col("ty").alias("sty"),
        F.col("w").alias("sw"), F.col("h").alias("sh"), F.col("px").alias("spx"),
    )
    joined = spanned.join(src, ["stx", "sty"], "left")

    out_layer = layer or "bilinear"
    tile_px = dg.tile_px

    def kernel(kdf: pd.DataFrame) -> pd.DataFrame:
        t = kdf.iloc[0]
        tw, th = int(t["w"]), int(t["h"])
        gx = t["tx"] * tile_px + np.arange(tw)
        gy = t["ty"] * tile_px + np.arange(th)
        cx = dg.origin_x + (gx + 0.5) * dg.res
        cy = dg.origin_y + (gy + 0.5) * dg.res
        u = (cx - sg.origin_x) / sg.res - 0.5
        v = (cy - sg.origin_y) / sg.res - 0.5
        i0 = np.floor(u).astype(np.int64)
        j0 = np.floor(v).astype(np.int64)
        fx = u - i0
        fy = v - j0
        imin, imax = int(i0.min()), int(i0.max()) + 1
        jmin, jmax = int(j0.min()), int(j0.max()) + 1
        canvas = np.full((jmax - jmin + 1, imax - imin + 1), np.nan)
        for srow in kdf.itertuples(index=False):
            if srow.spx is None:
                continue
            arr = np.asarray(srow.spx, dtype=np.float64).reshape(
                int(srow.sh), int(srow.sw)
            )
            gx0 = int(srow.stx) * sg.tile_px
            gy0 = int(srow.sty) * sg.tile_px
            ci0 = max(imin, gx0)
            ci1 = min(imax + 1, gx0 + int(srow.sw))
            cj0 = max(jmin, gy0)
            cj1 = min(jmax + 1, gy0 + int(srow.sh))
            if ci0 < ci1 and cj0 < cj1:
                canvas[cj0 - jmin:cj1 - jmin, ci0 - imin:ci1 - imin] = (
                    arr[cj0 - gy0:cj1 - gy0, ci0 - gx0:ci1 - gx0]
                )
        # mask source indices outside the raster (NaN contract)
        bad_i = (i0 < 0) | (i0 + 1 > sg.npx_x - 1)
        bad_j = (j0 < 0) | (j0 + 1 > sg.npx_y - 1)
        ii = np.clip(i0 - imin, 0, canvas.shape[1] - 2)
        jj = np.clip(j0 - jmin, 0, canvas.shape[0] - 2)
        v00 = canvas[np.ix_(jj, ii)]
        v10 = canvas[np.ix_(jj, ii + 1)]
        v01 = canvas[np.ix_(jj + 1, ii)]
        v11 = canvas[np.ix_(jj + 1, ii + 1)]
        fxr = fx[None, :]
        fyr = fy[:, None]
        top = (1.0 - fxr) * v00 + fxr * v10
        bot = (1.0 - fxr) * v01 + fxr * v11
        out = (1.0 - fyr) * top + fyr * bot
        out[bad_j, :] = np.nan
        out[:, bad_i] = np.nan
        return pd.DataFrame(
            [
                {
                    "layer": out_layer,
                    "tx": int(t["tx"]), "ty": int(t["ty"]),
                    "x0": float(t["x0"]), "y0": float(t["y0"]),
                    "res": dg.res, "w": tw, "h": th,
                    "px": out.ravel(),
                }
            ]
        )

    schema = (
        "layer string, tx int, ty int, x0 double, y0 double, "
        "res double, w int, h int, px array<double>"
    )
    return joined.groupBy("tx", "ty").applyInPandas(kernel, schema=schema)
