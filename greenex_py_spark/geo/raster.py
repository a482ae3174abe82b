"""Raster kernels: Bresenham primitives + the viewshed-GVI kernel.

Pure NumPy re-implementations of the reference's raster path
(/root/reference/GreenExp/visibility.py:460-564), used inside Arrow
``applyInPandas`` on executors and as the in-process oracle in tests.

The line / circle-perimeter / disk primitives replicate
``skimage.draw``'s algorithms (the reference calls skimage; this sandbox
has none) — including the exact integer stepping and the *strict* ``< 1``
disk boundary test, because the GVI values depend on them.

⚠ Reference-bug parity (SURVEY.md §2.8): ``viewshed()`` passes
``(resolution, observerHeight, ...)`` positionally into a function whose
signature is ``(observer_height, resolution, ...)``
(visibility.py:475 vs 481) — the two are swapped, so the *effective*
observer height equals the raster resolution and the slope divisor uses
the observer height.  ``replicate_bug=True`` (default) reproduces this
bit-for-bit; ``False`` gives the corrected physics.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# skimage.draw ports (integer Bresenham)
# ---------------------------------------------------------------------------


def bresenham_line(r0: int, c0: int, r1: int, c1: int) -> np.ndarray:
    """All pixels from (r0,c0) to (r1,c1) inclusive — skimage.draw.line."""
    r, c = r0, c0
    dr = abs(r1 - r0)
    dc = abs(c1 - c0)
    sr = 1 if (r1 - r0) > 0 else -1
    sc = 1 if (c1 - c0) > 0 else -1
    steep = dr > dc
    if steep:
        r, c = c, r
        dr, dc = dc, dr
        sr, sc = sc, sr
    d = 2 * dr - dc
    out = np.empty((dc + 1, 2), dtype=np.int64)
    for i in range(dc):
        out[i] = (c, r) if steep else (r, c)
        while d >= 0:
            r += sr
            d -= 2 * dc
        c += sc
        d += 2 * dr
    out[dc] = (r1, c1)
    return out


def circle_perimeter(r0: int, c0: int, radius: int) -> np.ndarray:
    """Bresenham/midpoint circle perimeter — skimage.draw.circle_perimeter
    (method='bresenham'), duplicates at octant boundaries included, same
    emission order."""
    rr: list[int] = []
    cc: list[int] = []
    c = 0
    r = radius
    d = 3 - 2 * radius
    while r >= c:
        rr.extend([r, -r, r, -r, c, -c, c, -c])
        cc.extend([c, c, -c, -c, r, r, -r, -r])
        if d < 0:
            d += 4 * c + 6
        else:
            d += 4 * (c - r) + 10
            r -= 1
        c += 1
    return np.column_stack((np.asarray(rr) + r0, np.asarray(cc) + c0))


def disk_mask(radius: int) -> np.ndarray:
    """Bool mask (2R, 2R) of skimage.draw.disk((R, R), R, shape=(2R, 2R)):
    strict ``(dr/R)² + (dc/R)² < 1`` boundary test."""
    R = radius
    rr, cc = np.meshgrid(np.arange(2 * R), np.arange(2 * R), indexing="ij")
    return ((rr - R) / R) ** 2 + ((cc - R) / R) ** 2 < 1.0


# ---------------------------------------------------------------------------
# precomputed ray tables (center-relative, cached per radius)
# ---------------------------------------------------------------------------

_RAY_CACHE: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = {}


def _rays(radius_px: int):
    """Stacked Bresenham rays center→perimeter, padded to equal length.

    Returns (dr, dc, dist, valid): int arrays (n_rays, L) and the
    pixel-distance hypot matrix; first pixel of each line (the center)
    is excluded, matching visibility.py:495 (``[1:]``).
    """
    if radius_px in _RAY_CACHE:
        return _RAY_CACHE[radius_px]
    per = circle_perimeter(0, 0, radius_px)
    lines = [bresenham_line(0, 0, int(p[0]), int(p[1]))[1:] for p in per]
    L = max(len(l) for l in lines)
    n = len(lines)
    dr = np.zeros((n, L), dtype=np.int64)
    dc = np.zeros((n, L), dtype=np.int64)
    valid = np.zeros((n, L), dtype=bool)
    for i, l in enumerate(lines):
        dr[i, : len(l)] = l[:, 0]
        dc[i, : len(l)] = l[:, 1]
        valid[i, : len(l)] = True
    dist = np.hypot(dc, dr)  # hypot(c0-c, r0-r) with center at 0
    _RAY_CACHE[radius_px] = (dr, dc, dist, valid)
    return _RAY_CACHE[radius_px]


_WMASK_CACHE: dict[tuple[int, float], np.ndarray] = {}


def weighting_mask(radius_px: int, resolution: float) -> np.ndarray:
    """Distance-decay disk mask (visibility.py:533-535):
    ``exp(-0.0003 · hypot(R-c, R-r) · res)`` inside the disk, 0 outside."""
    key = (radius_px, resolution)
    if key in _WMASK_CACHE:
        return _WMASK_CACHE[key]
    R = radius_px
    rr, cc = np.meshgrid(np.arange(2 * R), np.arange(2 * R), indexing="ij")
    w = np.exp(-0.0003 * (np.hypot(R - cc, R - rr) * resolution))
    w = np.where(disk_mask(R), w, 0.0)
    _WMASK_CACHE[key] = w
    return w


# ---------------------------------------------------------------------------
# viewshed + GVI
# ---------------------------------------------------------------------------


def viewshed_window(
    dsm_w: np.ndarray,
    dtm_w: np.ndarray,
    radius_px: int,
    resolution: float,
    observer_height: float,
    target_height: float = 0.0,
    replicate_bug: bool = True,
) -> np.ndarray:
    """Visibility 0/1 array over a (2R+1)² window centered on the observer.

    Vectorized per-ray: a pixel is marked visible iff its slope strictly
    exceeds the running max along its ray (visibility.py:516-519 — note
    pixels *below* the horizon are never marked, and the center is
    pre-marked).  With ``replicate_bug``, the effective observer height
    is ``resolution`` and the slope divisor is ``observer_height``
    (the positional-argument swap at visibility.py:475/481).
    """
    R = radius_px
    if replicate_bug:
        eff_obs, eff_res = resolution, observer_height
    else:
        eff_obs, eff_res = observer_height, resolution
    dr, dc, dist, valid = _rays(R)
    out = np.zeros_like(dtm_w)
    out[R, R] = 1
    height0 = dtm_w[R, R] + eff_obs
    h = dsm_w[R + dr, R + dc]
    with np.errstate(divide="ignore", invalid="ignore"):
        cur = (h - height0) / (dist * eff_res)
    cur = np.where(valid, cur, -np.inf)  # padding never marks / never raises max
    run = np.maximum.accumulate(cur, axis=1)
    prev = np.concatenate([np.zeros((cur.shape[0], 1)), run[:, :-1]], axis=1)
    prev = np.maximum(prev, 0.0)  # max_dydx starts at 0
    mark = cur > prev
    out[R + dr[mark], R + dc[mark]] = 1
    return out


def gvi_at_point(
    dsm_w: np.ndarray,
    dtm_w: np.ndarray,
    green_w: np.ndarray,
    radius_px: int,
    resolution: float,
    observer_height: float,
    target_height: float = 0.0,
    replicate_bug: bool = True,
) -> float:
    """GVI for one observer given (2R+1)² windows (visibility.py:549-562).

    Weighting is applied to *both* factors, so green pixels carry w²
    exactly as the reference does.  Windows are the full-raster slices
    ``[r-R : r+R+1]``; the GVI extract drops the last row/col (the
    reference slices ``[r-R : r+R]``).
    """
    R = radius_px
    out = viewshed_window(dsm_w, dtm_w, R, resolution, observer_height,
                          target_height, replicate_bug)
    w = weighting_mask(R, resolution)
    visible = out[: 2 * R, : 2 * R] * w
    visible_green = visible * (green_w[: 2 * R, : 2 * R] * w)
    denom = visible.sum()
    if denom == 0.0:
        return float("nan")
    return float(visible_green.sum() / denom)


def gvi_batch(
    mos_dsm: np.ndarray,
    mos_dtm: np.ndarray,
    mos_green: np.ndarray,
    iy: np.ndarray,
    ix: np.ndarray,
    radius_px: int,
    resolution: float,
    observer_height: float,
    target_height: float = 0.0,
    replicate_bug: bool = True,
    chunk: int = 64,
) -> np.ndarray:
    """Vectorized :func:`gvi_at_point` over N observers sharing one
    mosaic — the per-tile-group batch kernel the distributed pipeline
    runs (one ray-table gather + one accumulate per `chunk` observers
    instead of per-point NumPy call chains).  ``chunk`` bounds the ray
    tensor at ~chunk·n_rays·L·8 B per worker — with 32 concurrent
    executors per box, big chunks cause allocator/memory-bandwidth
    thrash that *outweighs* the vectorization win (measured: chunk=2048
    was 20× slower than chunk=64 at R=50).

    (iy, ix) are observer pixel coords in *mosaic* indices; the caller
    guarantees every (2R+1)² window fits inside the mosaic.  All
    arithmetic is the same elementwise ops with a leading observer
    axis, and each observer's sums reduce over its own contiguous row,
    so results are **bit-identical** to gvi_at_point (pinned by
    tests/test_visibility.test_batch_kernel_bit_identical).
    """
    R = radius_px
    if replicate_bug:
        eff_obs, eff_res = resolution, observer_height
    else:
        eff_obs, eff_res = observer_height, resolution
    dr, dc, dist, valid = _rays(R)
    w = weighting_mask(R, resolution)
    iy = np.asarray(iy, dtype=np.int64)
    ix = np.asarray(ix, dtype=np.int64)
    n = len(iy)
    res_out = np.empty(n, dtype=np.float64)
    win = np.arange(2 * R, dtype=np.int64)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        yy = iy[s:e]
        xx = ix[s:e]
        m = e - s
        h = mos_dsm[yy[:, None, None] + dr[None], xx[:, None, None] + dc[None]]
        height0 = mos_dtm[yy, xx] + eff_obs
        with np.errstate(divide="ignore", invalid="ignore"):
            cur = (h - height0[:, None, None]) / (dist * eff_res)[None]
        cur = np.where(valid[None], cur, -np.inf)
        run = np.maximum.accumulate(cur, axis=2)
        prev = np.concatenate([np.zeros((m, cur.shape[1], 1)), run[:, :, :-1]], axis=2)
        prev = np.maximum(prev, 0.0)
        mark = cur > prev
        vis = np.zeros((m, 2 * R + 1, 2 * R + 1))
        vis[:, R, R] = 1.0
        pi, ri, si = np.nonzero(mark)
        vis[pi, R + dr[ri, si], R + dc[ri, si]] = 1.0
        visible = vis[:, : 2 * R, : 2 * R] * w[None]
        green = mos_green[
            (yy[:, None, None] - R) + win[None, :, None],
            (xx[:, None, None] - R) + win[None, None, :],
        ]
        visible_green = visible * (green * w[None])
        denom = visible.sum(axis=(1, 2))
        num = visible_green.sum(axis=(1, 2))
        with np.errstate(invalid="ignore", divide="ignore"):
            res_out[s:e] = np.where(denom == 0.0, np.nan, num / denom)
    return res_out
