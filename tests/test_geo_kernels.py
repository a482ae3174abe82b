"""Unit tests for the pure-NumPy geometry kernels (hand-computed values)."""

from __future__ import annotations

import numpy as np
import pytest

from greenex_py_spark.geo import cells, kernels, wkb

SQ = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])  # 4x4 square
HOLE = np.array([[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0]])  # 2x2 hole
TRI = np.array([[0.0, 0.0], [6.0, 0.0], [0.0, 6.0]])


def test_area():
    assert kernels.polygon_area([SQ]) == 16.0
    assert kernels.polygon_area([SQ, HOLE]) == 12.0
    assert kernels.polygon_area([TRI]) == 18.0
    assert kernels.ring_signed_area(SQ) == 16.0  # CCW positive
    assert kernels.ring_signed_area(SQ[::-1]) == -16.0


def test_centroid():
    assert kernels.polygon_centroid([SQ]) == (2.0, 2.0)
    cx, cy = kernels.polygon_centroid([TRI])
    assert (cx, cy) == (2.0, 2.0)
    # hole is symmetric → centroid unchanged
    assert kernels.polygon_centroid([SQ, HOLE]) == (2.0, 2.0)
    # asymmetric hole shifts centroid away from the hole
    hole2 = np.array([[2.5, 0.5], [3.5, 0.5], [3.5, 1.5], [2.5, 1.5]])
    cx, cy = kernels.polygon_centroid([SQ, hole2])
    assert cx < 2.0 and cy > 2.0


def test_point_in_polygon():
    px = np.array([2.0, 2.0, 5.0, -1.0, 2.0])
    py = np.array([0.5, 2.0, 2.0, 2.0, 3.5])
    got = kernels.points_in_polygon(px, py, [SQ, HOLE])
    assert got.tolist() == [True, False, False, False, True]


def test_point_distances():
    d = kernels.points_to_ring_distance(np.array([2.0, 5.0, -3.0]), np.array([2.0, 2.0, 0.0]), SQ)
    np.testing.assert_allclose(d, [2.0, 1.0, 3.0])
    d = kernels.points_to_polygon_distance(np.array([2.0, 5.0]), np.array([2.0, 2.0]), [SQ])
    np.testing.assert_allclose(d, [0.0, 1.0])  # inside → 0
    d = kernels.points_to_polygon_distance(np.array([2.0]), np.array([2.0]), [SQ, HOLE])
    np.testing.assert_allclose(d, [1.0])  # in the hole → dist to hole boundary


def test_circle_polygon_matches_shapely_convention():
    ring = kernels.circle_polygon(0.0, 0.0, 10.0)
    assert len(ring) == 32
    # area of regular 32-gon with circumradius r: 0.5*n*r^2*sin(2pi/n)
    expected = 0.5 * 32 * 100.0 * np.sin(2 * np.pi / 32)
    np.testing.assert_allclose(kernels.polygon_area([ring]), expected, rtol=1e-12)
    np.testing.assert_allclose(ring[0], [10.0, 0.0], atol=1e-12)


def test_clip_area_box_box():
    # 4x4 square clipped by box shifted +2,+2 → 2x2 overlap
    clip = kernels.box_ring(2.0, 2.0, 6.0, 6.0)
    assert kernels.clip_area([SQ], clip) == pytest.approx(4.0)
    # with the hole, overlap loses the 1x1 hole corner → 4 - 1 = 3
    assert kernels.clip_area([SQ, HOLE], clip) == pytest.approx(3.0)
    # disjoint
    assert kernels.clip_area([SQ], kernels.box_ring(10, 10, 12, 12)) == 0.0
    # subject fully inside clip
    assert kernels.clip_area([SQ], kernels.box_ring(-1, -1, 5, 5)) == pytest.approx(16.0)


def test_clip_polygon_circle():
    # half of a big square overlapping a circle of r=2 centered at origin
    subject = [kernels.box_ring(0.0, -10.0, 10.0, 10.0)]
    circle = kernels.circle_polygon(0.0, 0.0, 2.0)
    a = kernels.clip_area(subject, circle)
    # half the 32-gon area
    expected = 0.5 * 0.5 * 32 * 4.0 * np.sin(2 * np.pi / 32)
    np.testing.assert_allclose(a, expected, rtol=1e-9)


def test_interpolate_linspace():
    # 100 m straight line, sample_dist 30 → num = int(100/30)+1 = 4 points
    pts = kernels.interpolate_linspace(np.array([0.0, 100.0]), np.array([0.0, 0.0]), 30.0)
    assert pts.shape == (4, 2)
    np.testing.assert_allclose(pts[:, 0], [0.0, 100 / 3, 200 / 3, 100.0])
    # multi-segment: L-shape 3+4
    pts = kernels.interpolate_linspace(np.array([0, 3, 3.0]), np.array([0, 0, 4.0]), 3.5)
    assert pts.shape == (3, 2)
    np.testing.assert_allclose(pts[1], [3.0, 0.5])  # 3.5 along the L


def test_interpolate_step():
    pts = kernels.interpolate_step(np.array([0.0, 100.0]), np.array([0.0, 0.0]), 50.0)
    # range(0, 100, 50) = [0, 50] — endpoint excluded
    np.testing.assert_allclose(pts[:, 0], [0.0, 50.0])


def test_segment_circle():
    hit = kernels.segment_circle_intersects(
        np.array([-5.0, 10.0]), np.array([3.0, 10.0]),
        np.array([5.0, 20.0]), np.array([3.0, 10.0]), 0.0, 0.0, 4.0)
    assert hit.tolist() == [True, False]


def test_cells_roundtrip():
    x = np.array([100000.0, 100150.0, 109999.0])
    y = np.array([450000.0, 450250.0, 459999.0])
    c = cells.cell_of(x, y)
    gx, gy = cells.cell_xy(c)
    assert gx.tolist() == [0, 1, 99]
    assert gy.tolist() == [0, 2, 99]
    ring = cells.k_ring(c[:1], 1)
    assert ring.shape == (1, 9)
    assert c[0] in ring[0]


def test_bbox_cover():
    got = cells.bbox_cover(100000.0, 450000.0, 100250.0, 450150.0)
    # 3 cells wide (gx 0,1,2) × 2 tall (gy 0,1)
    assert len(got) == 6


def test_cell_sql_matches_numpy(spark):
    import pandas as pd

    pdf = pd.DataFrame({"x": [100001.0, 103456.7, 109999.9], "y": [450001.0, 456789.0, 459000.1]})
    df = spark.createDataFrame(pdf)
    got = df.selectExpr(cells.cell_sql("x", "y") + " AS cell").toPandas()["cell"].to_numpy()
    want = cells.cell_of(pdf.x.to_numpy(), pdf.y.to_numpy())
    np.testing.assert_array_equal(got, want)


def test_wkb_roundtrip():
    poly = [SQ, HOLE]
    buf = wkb.encode_polygon(poly)
    back = wkb.decode(buf)
    assert len(back) == 1
    np.testing.assert_allclose(back[0][0], SQ)
    np.testing.assert_allclose(back[0][1], HOLE)
    mp = wkb.encode_multipolygon([[SQ], [TRI]])
    back = wkb.decode(mp)
    assert len(back) == 2
    np.testing.assert_allclose(back[1][0], TRI)


def test_morton_locality():
    c1 = cells.morton_cell(np.array([100000.0]), np.array([450000.0]))
    c2 = cells.morton_cell(np.array([100100.0]), np.array([450000.0]))
    assert c1[0] != c2[0]


def test_mercator_projection_hand_values_and_roundtrip():
    """EPSG:4326↔3395: known proj4 values + double-precision roundtrip."""
    import numpy as np

    from greenex_py_spark.geo import crs

    # anchors: (0,0) -> (0,0); lon 180 -> a·π exactly; x = a·λ
    x, y = crs.lonlat_to_mercator(np.array([0.0, 180.0, 4.9041]),
                                  np.array([0.0, 0.0, 52.3676]))
    assert x[0] == 0.0 and y[0] == 0.0
    np.testing.assert_allclose(x[1], 20037508.342789244, rtol=1e-12)
    np.testing.assert_allclose(x[2], np.radians(4.9041) * crs.WGS84_A, rtol=1e-15)
    # independent identity for the ellipsoidal y (isometric latitude via
    # atanh form): y = a·(atanh(sin φ) − e·atanh(e·sin φ))
    phi = np.radians(52.3676)
    e = np.sqrt(crs.WGS84_E2)
    y_id = crs.WGS84_A * (np.arctanh(np.sin(phi)) - e * np.arctanh(e * np.sin(phi)))
    np.testing.assert_allclose(y[2], y_id, rtol=1e-12)
    # roundtrip over a lon/lat grid
    rng = np.random.default_rng(11)
    lon = rng.uniform(-179, 179, 500)
    lat = rng.uniform(-84, 84, 500)
    mx, my = crs.lonlat_to_mercator(lon, lat)
    lon2, lat2 = crs.mercator_to_lonlat(mx, my)
    np.testing.assert_allclose(lon2, lon, rtol=0, atol=1e-11)
    np.testing.assert_allclose(lat2, lat, rtol=0, atol=1e-11)


def test_mercator_codegen_matches_numpy(spark):
    """The codegen Column projection == the NumPy kernel bit-for-bit-ish
    (same double formula; tolerances at 1 ulp scale)."""
    import numpy as np
    import pandas as pd

    from greenex_py_spark.geo import crs

    rng = np.random.default_rng(13)
    lon = rng.uniform(-179, 179, 300)
    lat = rng.uniform(-84, 84, 300)
    df = spark.createDataFrame(pd.DataFrame({"id": range(300), "lon": lon, "lat": lat}))
    out = crs.project_points(df).toPandas().sort_values("id")
    wx, wy = crs.lonlat_to_mercator(lon, lat)
    np.testing.assert_allclose(out.x.to_numpy(), wx, rtol=1e-15)
    np.testing.assert_allclose(out.y.to_numpy(), wy, rtol=1e-12)


def test_polygon_union_stats_hand_values():
    import numpy as np

    from greenex_py_spark.geo import kernels as K

    # overlapping unit squares: union 1.75, centroid (0.75, 0.75)
    a, cx, cy = K.polygon_union_stats(
        [[K.box_ring(0, 0, 1, 1)], [K.box_ring(0.5, 0.5, 1.5, 1.5)]]
    )
    np.testing.assert_allclose([a, cx, cy], [1.75, 0.75, 0.75], atol=1e-12)
    # disjoint squares
    a, cx, cy = K.polygon_union_stats(
        [[K.box_ring(0, 0, 1, 1)], [K.box_ring(3, 3, 4, 4)]]
    )
    np.testing.assert_allclose([a, cx, cy], [2.0, 2.0, 2.0], atol=1e-12)
    # diamond fully inside a square: union = the square
    d = np.array([[0.5, 0.1], [0.9, 0.5], [0.5, 0.9], [0.1, 0.5]])
    a, cx, cy = K.polygon_union_stats([[K.box_ring(0, 0, 1, 1)], [d]])
    np.testing.assert_allclose([a, cx, cy], [1.0, 0.5, 0.5], atol=1e-12)
    # polygon with a hole, overlapped by a square filling part of the hole:
    # ring [0,4]² minus hole [1,3]² (area 12) ∪ [2,2.5]×[2,2.5] in the hole
    outer = [K.box_ring(0, 0, 4, 4), K.box_ring(1, 1, 3, 3)]
    plug = [K.box_ring(2.0, 2.0, 2.5, 2.5)]
    a, cx, cy = K.polygon_union_stats([outer, plug])
    np.testing.assert_allclose(a, 12.0 + 0.25, atol=1e-10)


def test_polygon_union_matches_inclusion_exclusion_random():
    """Slab union vs A+B−A∩B (Sutherland–Hodgman) on random rotated
    rect pairs — two independent exact algorithms, FP-level agreement."""
    import numpy as np

    from greenex_py_spark.geo import kernels as K

    rng = np.random.default_rng(11)
    for _ in range(40):
        c1 = rng.uniform(0, 100, 2)
        c2 = c1 + rng.uniform(-40, 40, 2)
        w1, h1 = rng.uniform(20, 80, 2)
        w2, h2 = rng.uniform(20, 80, 2)
        t1, t2 = rng.uniform(0, 180, 2)

        def rect(c, w, h, deg):
            th = np.radians(deg)
            R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
            base = np.array([[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]])
            return base @ R.T + c

        ra, rb = rect(c1, w1, h1, t1), rect(c2, w2, h2, t2)
        inter = K.clip_polygon_convex([ra], rb)
        ia = sum(abs(K.ring_signed_area(r)) for r in inter)
        want = w1 * h1 + w2 * h2 - ia
        got, _, _ = K.polygon_union_stats([[ra], [rb]])
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-8)


def test_polygons_intersect_cases():
    import numpy as np

    from greenex_py_spark.geo import kernels as K

    sq = [K.box_ring(0, 0, 2, 2)]
    assert K.polygons_intersect(sq, [K.box_ring(1, 1, 3, 3)])
    assert not K.polygons_intersect(sq, [K.box_ring(3, 3, 4, 4)])
    # boundary touch counts (shapely intersects semantics)
    assert K.polygons_intersect(sq, [K.box_ring(2, 0, 3, 2)])
    # containment without boundary crossing
    assert K.polygons_intersect(sq, [K.box_ring(0.5, 0.5, 1.5, 1.5)])
    # cross shape: edges cross but no vertex inside
    thin_h = [np.array([[-1, 0.9], [3, 0.9], [3, 1.1], [-1, 1.1]])]
    assert K.polygons_intersect(sq, thin_h)


def test_hull_stats_matches_bruteforce_strict_edges():
    """Monotone-chain hull stats == the O(n³) edge oracle (the exact
    rule the gate SQL runs: no point strictly right, none strictly
    between — collinear boundary vertices included), on random AND
    structured-collinear integer point sets."""
    import numpy as np

    from greenex_py_spark.operators.hull import hull_stats_rows

    rng = np.random.default_rng(7)

    def brute(pts):
        n = len(pts)
        edges = []
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                a, b = pts[i], pts[j]
                ok = True
                for k in range(n):
                    if k in (i, j):
                        continue
                    c = pts[k]
                    cr = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (
                        c[0] - a[0]
                    )
                    between = (
                        cr == 0
                        and (c[0] - a[0]) * (b[0] - a[0])
                        + (c[1] - a[1]) * (b[1] - a[1]) > 0
                        and (c[0] - b[0]) * (a[0] - b[0])
                        + (c[1] - b[1]) * (a[1] - b[1]) > 0
                    )
                    if cr < 0 or between:
                        ok = False
                        break
                if ok:
                    edges.append((a, b))
        if n < 3 or not edges:
            return None
        area2 = sum(int(a[0]) * int(b[1]) - int(a[1]) * int(b[0])
                    for a, b in edges)
        if area2 <= 0:
            return None
        perim = sum(
            int(np.floor(np.sqrt(float((b[0] - a[0]) ** 2
                                       + (b[1] - a[1]) ** 2)) + 0.5))
            for a, b in edges
        )
        return n, len(edges), area2, perim

    # hand case: unit-ish square plus interior point
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [5, 5]], dtype=np.int64)
    sq = np.unique(sq, axis=0)
    assert hull_stats_rows(sq) == (5, 4, 200, 40) == brute(sq)

    # collinear midpoints ON the boundary count as hull vertices
    sqm = np.unique(np.array(
        [[0, 0], [10, 0], [10, 10], [0, 10], [5, 0], [0, 5]], dtype=np.int64
    ), axis=0)
    assert hull_stats_rows(sqm) == (6, 6, 200, 40) == brute(sqm)

    # degenerate: < 3 points and fully collinear → both sides None
    for pts in ([[0, 0], [5, 5]], [[0, 0], [3, 3], [7, 7], [9, 9]]):
        u = np.unique(np.array(pts, dtype=np.int64), axis=0)
        assert hull_stats_rows(u) is None and brute(u) is None

    # LCG-style structured sets: arithmetic progressions → collinear
    # triples everywhere (the fixture-geocoder regime)
    for salt in range(4):
        base = rng.integers(0, 1_000_000, size=2)
        step = rng.integers(-5_000, 5_000, size=2)
        prog = np.array([base + k * step for k in range(6)])
        extra = rng.integers(0, 1_000_000, size=(6, 2))
        pts = np.unique(np.vstack([prog, extra]), axis=0).astype(np.int64)
        assert hull_stats_rows(pts) == brute(pts), (salt, pts)

    for n in (3, 5, 17, 40):
        for _ in range(8):
            pts = np.unique(
                rng.integers(0, 1_000_000, size=(n, 2)), axis=0
            ).astype(np.int64)
            got = hull_stats_rows(pts)
            want = brute(pts)
            assert got == want, (pts, got, want)
