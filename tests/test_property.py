"""Hypothesis property tests for the pure-NumPy geometry kernels.

No SparkSession — these pin the *math* every distributed operator leans
on (SURVEY.md §2.6) against brute-force/pixel oracles over randomized
inputs, where the hand-value unit tests in test_geo_kernels.py pin only
fixed cases.
"""

from __future__ import annotations

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from greenex_py_spark.geo import kernels
from greenex_py_spark.operators.dissolve import rect_union_stats

coord = st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, width=32)


def _rand_convex_ring(seed: int, n: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(1.0, 100.0, 1)  # common radius → convex (circle-ish)
    ring = np.column_stack([rad * np.cos(ang), rad * np.sin(ang)])
    return ring


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 10_000), st.integers(4, 12))
def test_shoelace_area_matches_triangle_fan(seed, n):
    ring = _rand_convex_ring(seed, n)
    got = abs(kernels.ring_signed_area(ring))
    # convex fan from vertex 0: area = Σ ½|cross(v_i − v_0, v_{i+1} − v_0)|
    v0 = ring[0]
    fan = 0.0
    for i in range(1, n - 1):
        a = ring[i] - v0
        b = ring[i + 1] - v0
        fan += 0.5 * abs(a[0] * b[1] - a[1] * b[0])
    np.testing.assert_allclose(got, fan, rtol=1e-9)


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 10_000))
def test_pip_convex_equals_halfplane_test(seed):
    rng = np.random.default_rng(seed)
    ring = _rand_convex_ring(seed, 8)
    ring = kernels.ensure_ccw(ring)
    px = rng.uniform(-120, 120, 200)
    py = rng.uniform(-120, 120, 200)
    got = kernels.points_in_ring(px, py, ring)
    # CCW convex polygon: inside ⇔ left of (or on) every edge.  The
    # ray-cast uses half-open boundary semantics, so exclude points
    # within ε of any edge from the comparison.
    n = len(ring)
    left = np.ones(len(px), dtype=bool)
    near_edge = np.zeros(len(px), dtype=bool)
    for i in range(n):
        ax, ay = ring[i]
        bx, by = ring[(i + 1) % n]
        cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        left &= cross >= 0
        seg_d = kernels.point_segment_distance(px, py, ax, ay, bx, by)
        near_edge |= seg_d < 1e-6
    cmp = ~near_edge
    np.testing.assert_array_equal(got[cmp], left[cmp])


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 10_000), st.integers(1, 8))
def test_rect_union_area_vs_pixel_oracle(seed, n_rects):
    """Scanline union area == exact brute force on integer-coordinate
    rects (every slab boundary representable ⇒ equality, not approx)."""
    rng = np.random.default_rng(seed)
    x0 = rng.integers(0, 50, n_rects)
    y0 = rng.integers(0, 50, n_rects)
    w = rng.integers(1, 30, n_rects)
    h = rng.integers(1, 30, n_rects)
    rects = np.column_stack([x0, y0, x0 + w, y0 + h]).astype(float)
    area, cx, cy = rect_union_stats(rects)
    # pixel oracle on the integer grid
    grid = np.zeros((100, 100), dtype=bool)
    for (a, b, c, d) in rects.astype(int):
        grid[b:d, a:c] = True
    assert area == float(grid.sum())
    jy, jx = np.nonzero(grid)
    np.testing.assert_allclose(cx, (jx + 0.5).mean(), rtol=1e-12)
    np.testing.assert_allclose(cy, (jy + 0.5).mean(), rtol=1e-12)


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 10_000))
def test_clip_area_bounded_and_idempotent(seed):
    """Sutherland–Hodgman: clip area ≤ min(subject, clip) areas; clipping
    by the subject's own bbox is identity."""
    ring = _rand_convex_ring(seed, 10)
    ring = kernels.ensure_ccw(ring)
    box = kernels.box_ring(-30.0, -30.0, 40.0, 40.0)
    a_subject = abs(kernels.ring_signed_area(ring))
    a_box = abs(kernels.ring_signed_area(box))
    a_clip = kernels.clip_area([ring], box)
    assert a_clip <= a_subject + 1e-9
    assert a_clip <= a_box + 1e-9
    bb = kernels.box_ring(
        ring[:, 0].min() - 1, ring[:, 1].min() - 1,
        ring[:, 0].max() + 1, ring[:, 1].max() + 1,
    )
    np.testing.assert_allclose(kernels.clip_area([ring], bb), a_subject, rtol=1e-9)


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 10_000))
def test_circle_clip_area_converges_to_overlap(seed):
    """clip_area(circle32, box) ≈ analytic circle∩halfplane when the box
    cuts the circle with one edge (tolerance = 32-gon discretization)."""
    rng = np.random.default_rng(seed)
    r = float(rng.uniform(5, 50))
    cut = float(rng.uniform(-r * 0.9, r * 0.9))  # vertical line x = cut
    circle = kernels.circle_polygon(0.0, 0.0, r, quad_segs=8)
    box = kernels.box_ring(cut, -2 * r, 2 * r, 2 * r)
    got = kernels.clip_area([kernels.ensure_ccw(circle)], box)
    # analytic circular-segment area right of x=cut
    theta = np.arccos(np.clip(cut / r, -1, 1))
    want = r * r * theta - cut * r * np.sin(theta)
    # inscribed 32-gon under-covers thin segments; tolerance follows the
    # discretization bound (relative + a chord-area absolute term)
    np.testing.assert_allclose(got, want, rtol=0.1, atol=0.05 * r)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 10_000))
def test_distance_consistent_with_membership(seed):
    """points_to_polygon_distance == 0 ⇔ inside-or-on-boundary (up to the
    ray-cast's half-open boundary rule)."""
    rng = np.random.default_rng(seed)
    ring = kernels.ensure_ccw(_rand_convex_ring(seed, 9))
    px = rng.uniform(-120, 120, 100)
    py = rng.uniform(-120, 120, 100)
    d = kernels.points_to_polygon_distance(px, py, [ring])
    inside = kernels.points_in_ring(px, py, ring)
    assert (d[inside] == 0).all()
    far = d > 1e-6
    assert not inside[far].any()


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 10_000))
@example(seed=6214).via("discovered failure")
@example(seed=6063).via("discovered failure")
@example(seed=5412).via("discovered failure")
def test_polygon_union_translation_and_monotone(seed):
    """polygon_union_stats invariances over random rotated-rect pairs:
    translation shifts the centroid exactly and preserves area; the
    union area is bounded by max(parts) and sum(parts)."""
    rng = np.random.default_rng(seed)

    def rect(c, w, h, deg):
        th = np.radians(deg)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        base = np.array([[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]])
        return base @ R.T + c

    c1 = rng.uniform(0, 50, 2)
    c2 = c1 + rng.uniform(-30, 30, 2)
    w1, h1, w2, h2 = rng.uniform(10, 60, 4)
    t1, t2 = rng.uniform(0, 180, 2)
    ra, rb = rect(c1, w1, h1, t1), rect(c2, w2, h2, t2)
    a, cx, cy = kernels.polygon_union_stats([[ra], [rb]])
    assert max(w1 * h1, w2 * h2) - 1e-6 <= a <= w1 * h1 + w2 * h2 + 1e-6
    dx, dy = 1234.5, -987.25
    a2, cx2, cy2 = kernels.polygon_union_stats([[ra + [dx, dy]], [rb + [dx, dy]]])
    # the kernel integrates each slab in centred coordinates
    # (u = x − xm), so translation error stays at ulp scale even for
    # near-axis-aligned sliver slabs — the raw-power formulation it
    # replaced drifted up to 0.46 m here (seeds 6063/5412/8831, where
    # (x1³ − x0³)/3 rounding was amplified by the sliver edge's m²)
    np.testing.assert_allclose(a2, a, rtol=1e-9, atol=1e-6)
    np.testing.assert_allclose(cx2, cx + dx, rtol=0, atol=1e-6)
    np.testing.assert_allclose(cy2, cy + dy, rtol=0, atol=1e-6)


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 10_000))
def test_projection_roundtrip_property(seed):
    """from_wgs84/to_wgs84 roundtrip across the whole supported CRS
    family at random in-domain points."""
    from greenex_py_spark.geo import proj as P

    rng = np.random.default_rng(seed)
    for epsg, lon_rng, lat_rng in (
        (32631, (0, 6), (-75, 75)),
        (32733, (12, 18), (-75, 0)),
        (27700, (-5, 1.5), (50, 58)),
        (28992, (3.5, 7), (50.8, 53.5)),
    ):
        lon = rng.uniform(*lon_rng, 20)
        lat = rng.uniform(*lat_rng, 20)
        E, N = P.from_wgs84(lon, lat, epsg)
        lo, la = P.to_wgs84(E, N, epsg)
        np.testing.assert_allclose(lo, lon, atol=2e-7)
        np.testing.assert_allclose(la, lat, atol=2e-7)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 10_000))
@example(seed=8831).via("discovered failure")
def test_polygon_union_matches_pixel_oracle(seed):
    """Slab-union (area, cx, cy) vs a 1200² point-sampling oracle on
    the same rect pair — absolute truth check, not just invariance
    (the translation test can't see an error that is itself
    translation-covariant)."""
    rng = np.random.default_rng(seed)

    def rect(c, w, h, deg):
        th = np.radians(deg)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        base = np.array(
            [[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]]
        )
        return base @ R.T + c

    c1 = rng.uniform(0, 50, 2)
    c2 = c1 + rng.uniform(-30, 30, 2)
    w1, h1, w2, h2 = rng.uniform(10, 60, 4)
    t1, t2 = rng.uniform(0, 180, 2)
    ra, rb = rect(c1, w1, h1, t1), rect(c2, w2, h2, t2)
    a, cx, cy = kernels.polygon_union_stats([[ra], [rb]])
    rings = [kernels.ensure_ccw(ra), kernels.ensure_ccw(rb)]
    x0 = min(r[:, 0].min() for r in rings) - 1.0
    x1 = max(r[:, 0].max() for r in rings) + 1.0
    y0 = min(r[:, 1].min() for r in rings) - 1.0
    y1 = max(r[:, 1].max() for r in rings) + 1.0
    n = 1200
    xs = x0 + (np.arange(n) + 0.5) * (x1 - x0) / n
    ys = y0 + (np.arange(n) + 0.5) * (y1 - y0) / n
    X, Y = np.meshgrid(xs, ys)
    ins = np.zeros(X.shape, dtype=bool)
    for r in rings:
        ins |= kernels.points_in_ring(
            X.ravel(), Y.ravel(), r
        ).reshape(X.shape)
    cell = ((x1 - x0) / n) * ((y1 - y0) / n)
    a_pix = cell * ins.sum()
    # sampling resolution: boundary cells ~ perimeter / cell side
    tol = 4.0 * max(x1 - x0, y1 - y0) * max(x1 - x0, y1 - y0) / n
    np.testing.assert_allclose(a, a_pix, atol=tol)
    np.testing.assert_allclose(cx, X[ins].mean(), atol=tol)
    np.testing.assert_allclose(cy, Y[ins].mean(), atol=tol)
