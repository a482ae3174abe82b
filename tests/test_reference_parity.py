"""Reference-parity: a NumPy transliteration of the reference's
euclidean accessibility algorithm (32-gon clip candidacy,
accessibility.py:226-322) vs the engine's exact path, the
circle-vs-32-gon sagitta divergence, and pinned golden outputs in the
README table format."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from greenex_py_spark.data import city_fixture as fx
from greenex_py_spark.data import driver_city as city
from greenex_py_spark.geo import kernels


def calculate_shortest_distance_euclid_centroids(
    px: float, py: float, greens: dict, target_dist: float, min_area: float
) -> tuple[bool, float]:
    """Direct port of the reference's per-row logic (euclidean +
    centroids): clip greens to buffer(target) [32-gon], kd-min over
    surviving centroids, round, outcome-before-clamp."""
    buf = kernels.circle_polygon(px, py, target_dist)
    dists = []
    for i in range(len(greens["gs_id"])):
        if greens["area"][i] < min_area:
            continue
        rect = [kernels.box_ring(greens["minx"][i], greens["miny"][i],
                                 greens["maxx"][i], greens["maxy"][i])]
        if kernels.clip_area(rect, buf) > 0.0:  # survives the clip
            dists.append(np.hypot(greens["cx"][i] - px, greens["cy"][i] - py))
    if dists:
        min_distance = round(min(dists), 0)
    else:
        min_distance = np.nan
    outcome = bool(min_distance <= target_dist) if not np.isnan(min_distance) else False
    if np.isnan(min_distance) or min_distance > target_dist:
        min_distance = target_dist
    return outcome, float(min_distance)


def test_engine_exact_matches_reference_transliteration(spark):
    from greenex_py_spark.operators.accessibility import shortest_distance_greenspace_exact

    g = city.greenspace_numpy()
    rng = np.random.default_rng(11)
    n = 150
    xs = rng.uniform(city.X0, city.X0 + city.EXTENT, n)
    ys = rng.uniform(city.Y0, city.Y0 + city.EXTENT, n)
    pts = spark.createDataFrame(pd.DataFrame({"id": np.arange(n), "x": xs, "y": ys}))
    got = (
        shortest_distance_greenspace_exact(pts, city.greenspace_df(spark),
                                           target_dist=300.0, min_area=400.0)
        .toPandas().set_index("id").sort_index()
    )
    for i in range(n):
        want_out, want_dist = calculate_shortest_distance_euclid_centroids(
            xs[i], ys[i], g, 300.0, 400.0
        )
        assert bool(got.loc[i, "greenspace_within"]) == want_out, i
        assert got.loc[i, "distance_to_greenspace"] == want_dist, i


def test_sagitta_band_divergence(spark):
    """A rect that clips the true circle but misses the 32-gon: the
    reference (exact path) calls it a miss; the circle-test default
    calls it a candidate.  Documents the deliberate divergence."""
    from greenex_py_spark.operators.accessibility import (
        shortest_distance_greenspace,
        shortest_distance_greenspace_exact,
    )

    # 32-gon inradius = R·cos(pi/32); at R=300 the band is ~1.44 m.
    # Put a thin rect edge inside the band on the +x axis midway
    # between two 32-gon vertices (angle pi/32).
    R = 300.0
    px0, py0 = city.X0 + 5000.0, city.Y0 + 5000.0
    ang = np.pi / 32
    edge_x = px0 + (R - 0.5) * np.cos(ang)   # inside circle, outside 32-gon
    rect_y = py0 + (R - 0.5) * np.sin(ang)
    pts = spark.createDataFrame(pd.DataFrame({"id": [1], "x": [px0], "y": [py0]}))
    greens = spark.createDataFrame(pd.DataFrame(
        {"gs_id": [7], "minx": [edge_x], "miny": [rect_y - 5.0],
         "maxx": [edge_x + 50.0], "maxy": [rect_y + 5.0],
         "area": [500.0], "cx": [edge_x + 25.0], "cy": [rect_y]}))
    circle = shortest_distance_greenspace(pts, greens, R, 400.0).toPandas()
    exact = shortest_distance_greenspace_exact(pts, greens, R, 400.0).toPandas()
    # circle test admits the rect as candidate → clamped hit-or-miss via
    # centroid; 32-gon test rejects it entirely → clean miss
    assert not bool(exact.greenspace_within[0])
    assert exact.distance_to_greenspace[0] == R
    # the circle variant found a candidate (centroid at ~324m → also
    # clamped) but the *candidate sets* differ — verify via raw candidates
    from greenex_py_spark.operators.accessibility import (
        rect_buffer_candidates,
        rect_buffer_candidates_polygon32,
    )

    assert rect_buffer_candidates(pts, greens, R, 400.0).count() == 1
    assert rect_buffer_candidates_polygon32(pts, greens, R, 400.0).count() == 0


# ---------------------------------------------------------------------------
# golden pinned outputs (README table format) for the canonical 3-PoI run
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pois3(spark):
    return spark.createDataFrame(pd.DataFrame(
        {"url": ["poi1", "poi2", "poi3"],
         "x": [city.X0 + 3000.0, city.X0 + 5200.0, city.X0 + 7400.0],
         "y": [city.Y0 + 3000.0, city.Y0 + 5200.0, city.Y0 + 2600.0]}))


def test_golden_mean_ndvi(spark, pois3):
    from greenex_py_spark import api

    out = api.get_mean_NDVI(pois3, city.tiles_df(spark, "ndvi"),
                            buffer_type="euclidean", buffer_dist=300)
    got = out.orderBy("url").select("url", "mean_NDVI", "std_NDVI").toPandas()
    assert got.values.tolist() == [
        ["poi1", 0.015, 0.043], ["poi2", 0.128, 0.153], ["poi3", 0.767, 0.152]
    ]


def test_golden_canopy_and_accessibility(spark, pois3):
    from greenex_py_spark import api

    canopy = api.get_canopy_percentage(
        pois3, fx.greenspace_rings_df(spark), buffer_type="euclidean", buffer_dist=250
    ).orderBy("url").toPandas()
    assert canopy.canopy_cover.tolist() == ["0.0%", "27.86%", "0.0%"]

    acc = api.get_shortest_distance_greenspace(
        pois3, city.greenspace_df(spark), target_dist=300, min_greenspace_area=400
    ).orderBy("url").toPandas()
    assert acc[["greenspace_within_300m", "distance_to_greenspace"]].values.tolist() == [
        [False, 300.0], [True, 96.0], [False, 300.0]
    ]


def test_golden_landcover(spark, pois3):
    from greenex_py_spark import api

    out = api.get_landcover_percentages(
        pois3, city.tiles_df(spark, "landcover"), buffer_type="euclidean", buffer_dist=500
    ).orderBy("url").toPandas()
    cls = [c for c in out.columns if c.startswith("class_")]
    # the (ix+iy)%5 pattern gives near-exact fifths in any 500 m disk
    assert out[cls].iloc[0].tolist() == [
        "19.949%", "20.025%", "20.025%", "19.949%", "20.051%"
    ]


def _lattice_sssp(start_gx, start_gy, radius):
    """Test-local Dijkstra on the 51×51/200 m lattice (plain BFS by
    rings since all weights equal) — independent of the engine kernel."""
    import collections

    step = fx.GRID_STEP
    dist = {(start_gx, start_gy): 0.0}
    dq = collections.deque([(start_gx, start_gy)])
    while dq:
        gx, gy = dq.popleft()
        d = dist[(gx, gy)]
        for nx_, ny_ in ((gx+1, gy), (gx-1, gy), (gx, gy+1), (gx, gy-1)):
            if 0 <= nx_ < fx.GRID_N and 0 <= ny_ < fx.GRID_N:
                nd = d + step
                if nd <= radius and nd < dist.get((nx_, ny_), 1e18):
                    dist[(nx_, ny_)] = nd
                    dq.append((nx_, ny_))
    return dist


def reference_network_centroids(px, py, greens, target, min_area):
    """Transliteration of the reference's network+centroids path on the
    lattice, with clipped-boundary entrances (accessibility.py:234-273)."""
    # snap (tie-break node id = gy*51+gx — matches engine ordering)
    best = None
    for gy in range(fx.GRID_N):
        for gx in range(fx.GRID_N):
            nx_ = city.X0 + gx * fx.GRID_STEP
            ny_ = city.Y0 + gy * fx.GRID_STEP
            d = np.hypot(nx_ - px, ny_ - py)
            nid = gy * fx.GRID_N + gx
            if best is None or (d, nid) < best[:2]:
                best = (d, nid, gx, gy)
    penalty_home, _nid, sgx, sgy = best
    sssp = _lattice_sssp(sgx, sgy, target * 1.5)
    buf = kernels.circle_polygon(px, py, target)
    dists = []
    for i in range(len(greens["gs_id"])):
        if greens["area"][i] < min_area:
            continue
        rect = [kernels.box_ring(greens["minx"][i], greens["miny"][i],
                                 greens["maxx"][i], greens["maxy"][i])]
        clipped = kernels.clip_polygon_convex(rect, buf)
        if not clipped:
            continue
        for (gx, gy), nd in sssp.items():
            ex = city.X0 + gx * fx.GRID_STEP
            ey = city.Y0 + gy * fx.GRID_STEP
            bd = kernels.points_to_ring_distance(
                np.array([ex]), np.array([ey]), clipped[0]
            )[0]
            if bd < 20.0:
                dists.append(
                    nd + penalty_home
                    + np.hypot(greens["cx"][i] - ex, greens["cy"][i] - ey)
                )
    if dists:
        md = round(min(dists), 0)
    else:
        md = np.nan
    outcome = bool(md <= target) if not np.isnan(md) else False
    if np.isnan(md) or md > target:
        md = target
    return outcome, float(md)


def test_network_exact_matches_reference_transliteration(spark):
    from greenex_py_spark.operators.network import (
        shortest_distance_greenspace_network_exact,
    )

    g = city.greenspace_numpy()
    rng = np.random.default_rng(23)
    n = 40
    xs = rng.uniform(city.X0 + 500, city.X0 + city.EXTENT - 500, n)
    ys = rng.uniform(city.Y0 + 500, city.Y0 + city.EXTENT - 500, n)
    pts = spark.createDataFrame(pd.DataFrame({"id": np.arange(n), "x": xs, "y": ys}))
    nodes, edges = fx.network_dfs(spark)
    got = (
        shortest_distance_greenspace_network_exact(
            pts, city.greenspace_df(spark), nodes, edges,
            target_dist=300.0, min_area=400.0,
        )
        .toPandas().set_index("id").sort_index()
    )
    for i in range(n):
        want_out, want_dist = reference_network_centroids(xs[i], ys[i], g, 300.0, 400.0)
        assert bool(got.loc[i, "greenspace_within"]) == want_out, i
        assert got.loc[i, "distance_to_greenspace"] == want_dist, i
