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
