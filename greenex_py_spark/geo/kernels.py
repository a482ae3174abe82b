"""Pure-NumPy geometry kernels.

Every geometric primitive the engine needs, implemented against NumPy only
(the sandbox has no shapely/geopandas/pyproj).  These run inside Arrow
pandas UDFs on executors, and double as the in-process "oracle" for tests.

Reference-parity notes (citations are into /root/reference/):

- circle buffers replicate shapely's ``Point.buffer(d)`` default
  ``quad_segs=8`` → a 32-segment regular polygon
  (used at GreenExp/accessibility.py:228, GreenExp/availability.py:236).
- area is the shoelace formula; holes carry negative contribution
  (matches ``gdf.geometry.area``, GreenExp/accessibility.py:131).
- centroid is the area-weighted ring centroid (``gdf.centroid``,
  GreenExp/accessibility.py:135).
- point-in-polygon is the even-odd ray cast — same predicate family
  ``gpd.sjoin(predicate='within')`` resolves to (GreenExp/visibility.py:653).
- polygon clipping is Sutherland–Hodgman (convex clip window), enough for
  circle/box buffers × arbitrary subject polygons
  (``greenspace_src.clip(buffer)``, GreenExp/accessibility.py:228,
  GreenExp/availability.py:764, 997).

Conventions
-----------
A *ring* is an (N, 2) float64 array of vertices, implicitly closed (last
vertex != first; closure is implied).  A *polygon* is a list of rings:
ring[0] is the exterior (CCW or CW accepted — signed area handles it),
rings[1:] are holes.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# areas / centroids / lengths
# ---------------------------------------------------------------------------


def ring_signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area of one ring (implicitly closed)."""
    x = ring[:, 0]
    y = ring[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def polygon_area(rings: list[np.ndarray]) -> float:
    """Absolute area of exterior minus holes (|signed| per ring)."""
    if not rings:
        return 0.0
    a = abs(ring_signed_area(rings[0]))
    for hole in rings[1:]:
        a -= abs(ring_signed_area(hole))
    return a


def ring_centroid(ring: np.ndarray) -> tuple[float, float]:
    """Area-weighted centroid of a single ring (shoelace moments)."""
    x = ring[:, 0]
    y = ring[:, 1]
    x1 = np.roll(x, -1)
    y1 = np.roll(y, -1)
    cross = x * y1 - x1 * y
    a = np.sum(cross) / 2.0
    if abs(a) < 1e-12:  # degenerate → vertex mean
        return float(x.mean()), float(y.mean())
    cx = float(np.sum((x + x1) * cross) / (6.0 * a))
    cy = float(np.sum((y + y1) * cross) / (6.0 * a))
    return cx, cy


def polygon_centroid(rings: list[np.ndarray]) -> tuple[float, float]:
    """Centroid of polygon-with-holes (signed-area weighted over rings)."""
    sa_tot = 0.0
    mx = 0.0
    my = 0.0
    for i, ring in enumerate(rings):
        sa = ring_signed_area(ring)
        w = abs(sa) if i == 0 else -abs(sa)
        cx, cy = ring_centroid(ring)
        sa_tot += w
        mx += w * cx
        my += w * cy
    if abs(sa_tot) < 1e-12:
        return ring_centroid(rings[0])
    return mx / sa_tot, my / sa_tot


def line_length(xs: np.ndarray, ys: np.ndarray) -> float:
    """Total length of a polyline."""
    return float(np.sum(np.hypot(np.diff(xs), np.diff(ys))))


# ---------------------------------------------------------------------------
# point predicates / distances (vectorized over many points, one geometry)
# ---------------------------------------------------------------------------


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd ray-cast point-in-polygon for one ring.

    Vectorized over points; boundary points are implementation-defined
    (consistent with the half-open edge rule, so shared edges don't
    double-count).  Returns a bool array.
    """
    x0 = ring[:, 0]
    y0 = ring[:, 1]
    x1 = np.roll(x0, -1)
    y1 = np.roll(y0, -1)
    px = np.asarray(px, dtype=np.float64)[:, None]  # (P,1)
    py = np.asarray(py, dtype=np.float64)[:, None]
    # edge straddles the horizontal ray through py
    cond = (y0[None, :] > py) != (y1[None, :] > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0[None, :] + (py - y0[None, :]) * (x1 - x0)[None, :] / (y1 - y0)[None, :]
    crossings = cond & (px < xint)
    return (np.count_nonzero(crossings, axis=1) % 2).astype(bool)


def points_in_polygon(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Inside exterior and not inside any hole."""
    inside = points_in_ring(px, py, rings[0])
    for hole in rings[1:]:
        inside &= ~points_in_ring(px, py, hole)
    return inside


def point_segment_distance(
    px: np.ndarray, py: np.ndarray, ax: float, ay: float, bx: float, by: float
) -> np.ndarray:
    """Distance from points to one segment AB (vectorized over points)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    dx = bx - ax
    dy = by - ay
    l2 = dx * dx + dy * dy
    if l2 == 0.0:
        return np.hypot(px - ax, py - ay)
    t = np.clip(((px - ax) * dx + (py - ay) * dy) / l2, 0.0, 1.0)
    return np.hypot(px - (ax + t * dx), py - (ay + t * dy))


def points_to_ring_distance(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Min distance from points to the ring boundary (all edges).

    Used for the "pseudo entrance" join: graph nodes within 20 m of a
    greenspace boundary (GreenExp/accessibility.py:242-246).
    """
    x0 = ring[:, 0]
    y0 = ring[:, 1]
    x1 = np.roll(x0, -1)
    y1 = np.roll(y0, -1)
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    dx = (x1 - x0)[None, :]
    dy = (y1 - y0)[None, :]
    l2 = dx * dx + dy * dy
    l2 = np.where(l2 == 0.0, 1.0, l2)
    t = np.clip(((px - x0[None, :]) * dx + (py - y0[None, :]) * dy) / l2, 0.0, 1.0)
    d = np.hypot(px - (x0[None, :] + t * dx), py - (y0[None, :] + t * dy))
    return d.min(axis=1)


def points_to_polygon_distance(
    px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]
) -> np.ndarray:
    """Distance to polygon (0 inside, else distance to boundary).

    Matches shapely ``geometry.distance(point)`` semantics used at
    GreenExp/accessibility.py:250,261.
    """
    d = points_to_ring_distance(px, py, rings[0])
    for hole in rings[1:]:
        d = np.minimum(d, points_to_ring_distance(px, py, hole))
    inside = points_in_polygon(px, py, rings)
    return np.where(inside, 0.0, d)


# ---------------------------------------------------------------------------
# buffers
# ---------------------------------------------------------------------------


def circle_polygon(cx: float, cy: float, radius: float, quad_segs: int = 8) -> np.ndarray:
    """Regular polygon approximating a circle, shapely-compatible.

    shapely's ``Point.buffer(d)`` with default ``quad_segs=8`` emits
    4*quad_segs=32 segments starting at angle 0 going CCW; the reference
    relies on that default everywhere (GreenExp/availability.py:236 etc.).
    """
    n = 4 * quad_segs
    theta = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    return np.column_stack((cx + radius * np.cos(theta), cy + radius * np.sin(theta)))


def box_ring(minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
    """Rectangle ring (``sg.box`` at GreenExp/accessibility.py:87)."""
    return np.array(
        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy]], dtype=np.float64
    )


# ---------------------------------------------------------------------------
# clipping (Sutherland–Hodgman, convex clip window)
# ---------------------------------------------------------------------------


def _clip_ring_halfplane(ring: np.ndarray, ax, ay, bx, by) -> np.ndarray:
    """Clip ring against the half-plane left of directed edge A→B."""
    if len(ring) == 0:
        return ring
    x = ring[:, 0]
    y = ring[:, 1]
    side = (bx - ax) * (y - ay) - (by - ay) * (x - ax)  # >0 = inside (CCW clip)
    inside = side >= 0.0
    out_x: list[float] = []
    out_y: list[float] = []
    n = len(ring)
    for i in range(n):
        j = (i + 1) % n
        if inside[i]:
            out_x.append(x[i])
            out_y.append(y[i])
        if inside[i] != inside[j]:
            t = side[i] / (side[i] - side[j])
            out_x.append(x[i] + t * (x[j] - x[i]))
            out_y.append(y[i] + t * (y[j] - y[i]))
    if not out_x:
        return np.empty((0, 2), dtype=np.float64)
    return np.column_stack((np.asarray(out_x), np.asarray(out_y)))


def ensure_ccw(ring: np.ndarray) -> np.ndarray:
    if len(ring) >= 3 and ring_signed_area(ring) < 0:
        return ring[::-1].copy()
    return ring


def clip_polygon_convex(subject: list[np.ndarray], clip_ring: np.ndarray) -> list[np.ndarray]:
    """Sutherland–Hodgman clip of a polygon-with-holes by a CONVEX window.

    Returns the clipped rings (exterior first, holes after).  Degenerate
    empty results drop rings.  Correct for the engine's uses: circle/box
    buffer windows are always convex.
    """
    clip_ring = ensure_ccw(np.asarray(clip_ring, dtype=np.float64))
    cx = clip_ring[:, 0]
    cy = clip_ring[:, 1]
    out: list[np.ndarray] = []
    for ring in subject:
        r = np.asarray(ring, dtype=np.float64)
        for i in range(len(clip_ring)):
            j = (i + 1) % len(clip_ring)
            r = _clip_ring_halfplane(r, cx[i], cy[i], cx[j], cy[j])
            if len(r) == 0:
                break
        if len(r) >= 3:
            out.append(r)
    return out


def clip_area(subject: list[np.ndarray], clip_ring: np.ndarray) -> float:
    """Area of subject ∩ convex clip window (holes subtracted)."""
    clip_ring = ensure_ccw(np.asarray(clip_ring, dtype=np.float64))
    cx = clip_ring[:, 0]
    cy = clip_ring[:, 1]
    total = 0.0
    for idx, ring in enumerate(subject):
        r = np.asarray(ring, dtype=np.float64)
        for i in range(len(clip_ring)):
            j = (i + 1) % len(clip_ring)
            r = _clip_ring_halfplane(r, cx[i], cy[i], cx[j], cy[j])
            if len(r) == 0:
                break
        if len(r) >= 3:
            a = abs(ring_signed_area(r))
            total += a if idx == 0 else -a
    return max(total, 0.0)


# ---------------------------------------------------------------------------
# segments / interpolation (street-edge sampling, GreenExp/visibility.py)
# ---------------------------------------------------------------------------


def interpolate_linspace(xs: np.ndarray, ys: np.ndarray, sample_dist: float) -> np.ndarray:
    """Viewshed sampling scheme: ``num = int(length/sample_dist) + 1``
    points evenly spaced over the full line (GreenExp/visibility.py:585-586).
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    seg = np.hypot(np.diff(xs), np.diff(ys))
    length = float(seg.sum())
    if length == 0.0:
        return np.column_stack((xs[:1], ys[:1]))
    num = int(length / sample_dist) + 1
    if num < 2:
        dists = np.array([0.0])
    else:
        dists = np.linspace(0.0, length, num)
    return _interp_along(xs, ys, seg, dists)


def interpolate_step(xs: np.ndarray, ys: np.ndarray, step: float) -> np.ndarray:
    """Streetview sampling scheme: ``range(0, int(length), step)``
    (GreenExp/visibility.py:633-635) — no endpoint, fixed stride.
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    seg = np.hypot(np.diff(xs), np.diff(ys))
    length = float(seg.sum())
    dists = np.arange(0.0, float(int(length)), step) if int(length) > 0 else np.array([0.0])
    return _interp_along(xs, ys, seg, dists)


def _interp_along(xs, ys, seg, dists):
    cum = np.concatenate(([0.0], np.cumsum(seg)))
    # segment index for each target distance
    idx = np.clip(np.searchsorted(cum, dists, side="right") - 1, 0, len(seg) - 1)
    seg_len = np.where(seg[idx] == 0.0, 1.0, seg[idx])
    t = (dists - cum[idx]) / seg_len
    px = xs[idx] + t * (xs[idx + 1] - xs[idx])
    py = ys[idx] + t * (ys[idx + 1] - ys[idx])
    return np.column_stack((px, py))


def segment_circle_intersects(
    ax: np.ndarray, ay: np.ndarray, bx: np.ndarray, by: np.ndarray,
    cx: float, cy: float, r: float,
) -> np.ndarray:
    """Does segment AB come within r of C?  Vectorized over segments.

    Edge×buffer intersection join (GreenExp/visibility.py:568-572).
    """
    ax = np.asarray(ax, dtype=np.float64)
    ay = np.asarray(ay, dtype=np.float64)
    bx = np.asarray(bx, dtype=np.float64)
    by = np.asarray(by, dtype=np.float64)
    dx = bx - ax
    dy = by - ay
    l2 = dx * dx + dy * dy
    l2s = np.where(l2 == 0.0, 1.0, l2)
    t = np.clip(((cx - ax) * dx + (cy - ay) * dy) / l2s, 0.0, 1.0)
    d = np.hypot(cx - (ax + t * dx), cy - (ay + t * dy))
    return d <= r


# ---------------------------------------------------------------------------
# exact union statistics for arbitrary simple polygons (J5/T5 general case)
# ---------------------------------------------------------------------------


def _ring_open(ring: np.ndarray) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64)
    if len(r) > 1 and r[0, 0] == r[-1, 0] and r[0, 1] == r[-1, 1]:
        r = r[:-1]
    return r


def polygon_union_stats(polys: list[list[np.ndarray]]) -> tuple[float, float, float]:
    """(area, cx, cy) of the union of arbitrary simple polygons (holes
    via even-odd), exact up to FP — the general-polygon replacement for
    :func:`operators.dissolve.rect_union_stats` (reference parity:
    ``unary_union`` at GreenExp/availability.py:937-940,
    accessibility.py:125-127).

    Vertical-slab decomposition: slab boundaries are every vertex x and
    every pairwise segment-intersection x, so within a slab no two edges
    cross and no vertex occurs.  The union's y-coverage at the slab
    midpoint is a set of merged intervals, each bounded below/above by a
    fixed *linear* edge; the interval structure is combinatorially
    constant across the slab (a structure change would require an edge
    crossing).  Area and both first moments are then closed-form
    integrals of those linear bounds per slab — no rasterization, no
    sampling.  O((E+I)·E log E) for E edges and I intersections; union
    components in real dissolve workloads have tens of edges.
    """
    # edge table: (poly, ax, ay, bx, by)
    ep: list[int] = []
    seg: list[tuple[float, float, float, float]] = []
    for pi, rings in enumerate(polys):
        for ring in rings:
            r = _ring_open(ring)
            n = len(r)
            for k in range(n):
                x1, y1 = r[k]
                x2, y2 = r[(k + 1) % n]
                ep.append(pi)
                seg.append((float(x1), float(y1), float(x2), float(y2)))
    ep_arr = np.asarray(ep, dtype=np.int64)
    s = np.asarray(seg, dtype=np.float64)
    ax, ay, bx, by = s[:, 0], s[:, 1], s[:, 2], s[:, 3]

    xs = set(ax.tolist()) | set(bx.tolist())
    # pairwise segment intersection x's (proper crossings only — shared
    # endpoints / collinear overlaps already contribute vertex x's)
    n_e = len(s)
    for i in range(n_e):
        d1x, d1y = bx[i] - ax[i], by[i] - ay[i]
        for j in range(i + 1, n_e):
            d2x, d2y = bx[j] - ax[j], by[j] - ay[j]
            den = d1x * d2y - d1y * d2x
            if den == 0.0:
                continue
            t = ((ax[j] - ax[i]) * d2y - (ay[j] - ay[i]) * d2x) / den
            u = ((ax[j] - ax[i]) * d1y - (ay[j] - ay[i]) * d1x) / den
            if 0.0 <= t <= 1.0 and 0.0 <= u <= 1.0:
                xs.add(ax[i] + t * d1x)
    xs_arr = np.array(sorted(xs))

    # per-edge linear form y(x) = c + m·x (verticals never cross a slab
    # midpoint: slab boundaries include their x)
    with np.errstate(divide="ignore", invalid="ignore"):
        m = np.where(bx != ax, (by - ay) / (bx - ax), 0.0)
    c = ay - m * ax
    lo_x = np.minimum(ax, bx)
    hi_x = np.maximum(ax, bx)
    n_poly = len(polys)

    area = mx = my = 0.0
    for si in range(len(xs_arr) - 1):
        x0, x1 = xs_arr[si], xs_arr[si + 1]
        if x1 <= x0:
            continue
        xm = 0.5 * (x0 + x1)
        hit = (lo_x <= xm) & (xm < hi_x)
        if not hit.any():
            continue
        intervals: list[tuple[float, float, int, int]] = []  # ylo, yhi, e_lo, e_hi
        idx_all = np.nonzero(hit)[0]
        for pi in range(n_poly):
            idx = idx_all[ep_arr[idx_all] == pi]
            if len(idx) == 0:
                continue
            yv = c[idx] + m[idx] * xm
            order = np.argsort(yv, kind="stable")
            idx, yv = idx[order], yv[order]
            # even-odd pairing (simple polygon ⇒ even crossing count)
            for k in range(0, len(idx) - 1, 2):
                intervals.append((yv[k], yv[k + 1], int(idx[k]), int(idx[k + 1])))
        intervals.sort()
        merged: list[tuple[int, int, float]] = []  # e_lo, e_hi, yhi_at_xm
        for ylo, yhi, e_lo, e_hi in intervals:
            if merged and ylo <= merged[-1][2]:
                pl, ph, py_hi = merged[-1]
                if yhi > py_hi:
                    merged[-1] = (pl, e_hi, yhi)
            else:
                merged.append((e_lo, e_hi, yhi))
        # integrate in slab-centred coordinates u = x − xm (odd ∫u du
        # vanishes): raw power differences (x1³ − x0³) carry ~ulp(x³)
        # absolute error which, multiplied by m² ~ (h/w_sliver)² of a
        # near-vertical edge, once produced metre-scale moment noise in
        # sliver slabs far from the origin (hypothesis seed 8831);
        # centred, every term is O(actual y / slab width).
        w1 = x1 - x0
        u2 = w1 * w1 * w1 / 12.0  # ∫ u² du over [−w1/2, w1/2]
        for e_lo, e_hi, _ in merged:
            yh = c[e_hi] + m[e_hi] * xm
            yl = c[e_lo] + m[e_lo] * xm
            mh, ml = m[e_hi], m[e_lo]
            d = yh - yl
            dm = mh - ml
            area += d * w1
            mx += xm * d * w1 + dm * u2
            # ∫ (hi² − lo²)/2 dx with h = y_h + m_h·u
            my += 0.5 * ((yh * yh - yl * yl) * w1 + (mh * mh - ml * ml) * u2)
    if area <= 0.0:
        return 0.0, float("nan"), float("nan")
    return float(area), float(mx / area), float(my / area)


def _segments_any_intersect(a: np.ndarray, b: np.ndarray) -> bool:
    """True iff any segment of edge-array a (n,4) touches any of b (m,4)
    — inclusive (endpoint touch / collinear overlap count), matching
    shapely ``intersects`` boundary semantics."""
    a1x, a1y, a2x, a2y = (a[:, k][:, None] for k in range(4))
    b1x, b1y, b2x, b2y = (b[:, k][None, :] for k in range(4))

    def cross(ox, oy, px, py, qx, qy):
        return (px - ox) * (qy - oy) - (py - oy) * (qx - ox)

    d1 = cross(b1x, b1y, b2x, b2y, a1x, a1y)
    d2 = cross(b1x, b1y, b2x, b2y, a2x, a2y)
    d3 = cross(a1x, a1y, a2x, a2y, b1x, b1y)
    d4 = cross(a1x, a1y, a2x, a2y, b2x, b2y)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) \
        & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)
    if proper.any():
        return True

    def on_seg(d, px, py, sx1, sy1, sx2, sy2):
        return (
            (d == 0)
            & (px >= np.minimum(sx1, sx2)) & (px <= np.maximum(sx1, sx2))
            & (py >= np.minimum(sy1, sy2)) & (py <= np.maximum(sy1, sy2))
        )

    touch = (
        on_seg(d1, a1x, a1y, b1x, b1y, b2x, b2y)
        | on_seg(d2, a2x, a2y, b1x, b1y, b2x, b2y)
        | on_seg(d3, b1x, b1y, a1x, a1y, a2x, a2y)
        | on_seg(d4, b2x, b2y, a1x, a1y, a2x, a2y)
    )
    return bool(touch.any())


def polygons_intersect(a_rings: list[np.ndarray], b_rings: list[np.ndarray]) -> bool:
    """shapely-``intersects`` equivalent for two simple polygons (holes
    respected): vertex containment either way, or any boundary touch."""

    def edges(rings):
        out = []
        for ring in rings:
            r = _ring_open(ring)
            out.append(np.column_stack([r, np.roll(r, -1, axis=0)]))
        return np.concatenate(out, axis=0)

    ea, eb = edges(a_rings), edges(b_rings)
    av = _ring_open(a_rings[0])
    bv = _ring_open(b_rings[0])
    if points_in_polygon(av[:, 0], av[:, 1], b_rings).any():
        return True
    if points_in_polygon(bv[:, 0], bv[:, 1], a_rings).any():
        return True
    return _segments_any_intersect(ea, eb)
