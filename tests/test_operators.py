"""Engine-only operator tests: dissolve chains, clamp quirks (§2.9),
landcover invariants, PiP property test, byte-identity, dedup recall."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from greenex_py_spark.geo import kernels
from greenex_py_spark.operators.dissolve import rect_union_stats


def test_rect_union_stats_hand_values():
    # two disjoint unit squares
    r = np.array([[0, 0, 1, 1], [2, 0, 3, 1]], dtype=float)
    a, cx, cy = rect_union_stats(r)
    assert a == 2.0 and cx == 1.5 and cy == 0.5
    # 50% overlap pair
    r = np.array([[0, 0, 2, 2], [1, 0, 3, 2]], dtype=float)
    a, cx, cy = rect_union_stats(r)
    assert a == 6.0 and cx == 1.5 and cy == 1.0
    # chain A-B-C where A∩C = ∅
    r = np.array([[0, 0, 2, 1], [1, 0, 4, 1], [3, 0, 6, 1]], dtype=float)
    a, cx, cy = rect_union_stats(r)
    assert a == 6.0 and cx == 3.0 and cy == 0.5
    # touching squares count once along the shared edge
    r = np.array([[0, 0, 1, 1], [1, 0, 2, 1]], dtype=float)
    a, cx, cy = rect_union_stats(r)
    assert a == 2.0 and cx == 1.0


def test_dissolve_chain_component(spark):
    """A-B-C overlap chain collapses to one component even though A∩C=∅."""
    from greenex_py_spark.operators.dissolve import dissolve_rects

    pdf = pd.DataFrame(
        {
            "gs_id": [1, 2, 3, 9],
            "minx": [100000.0, 100100.0, 100300.0, 105000.0],
            "miny": [450000.0] * 3 + [455000.0],
            "maxx": [100200.0, 100400.0, 100600.0, 105100.0],
            "maxy": [450100.0] * 3 + [455100.0],
            "area": [0.0] * 4,
            "cx": [0.0] * 4, "cy": [0.0] * 4,
            "tag": ["a", "b", "c", "z"],
        }
    )
    out = dissolve_rects(spark.createDataFrame(pdf)).toPandas().sort_values("component")
    assert out.component.tolist() == [1, 9]
    chain = out[out.component == 1].iloc[0]
    assert chain.n_members == 3 and chain.tag == "a"
    want_a, want_cx, want_cy = rect_union_stats(
        pdf[pdf.gs_id < 9][["minx", "miny", "maxx", "maxy"]].to_numpy(float)
    )
    assert chain.area == want_a and chain.cx == want_cx and chain.cy == want_cy


def test_accessibility_clamp_quirks(spark):
    """§2.9: outcome evaluated before clamp; miss ⇒ distance == target."""
    from greenex_py_spark.operators.accessibility import shortest_distance_greenspace

    pts = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3],
                      "x": [100050.0, 103000.0, 100280.0],
                      "y": [450050.0, 453000.0, 450050.0]})
    )
    # one green: rect [100000..100100]² area 10000, centroid (100050, 450050)
    greens = spark.createDataFrame(
        pd.DataFrame({"gs_id": [1], "minx": [100000.0], "miny": [450000.0],
                      "maxx": [100100.0], "maxy": [450100.0], "area": [10000.0],
                      "cx": [100050.0], "cy": [450050.0]})
    )
    out = (
        shortest_distance_greenspace(pts, greens, target_dist=200.0, min_area=400.0)
        .toPandas().set_index("id").sort_index()
    )
    # id1 sits on the centroid: dist 0, within
    assert bool(out.loc[1, "greenspace_within"]) and out.loc[1, "distance_to_greenspace"] == 0.0
    # id2 is ~4km away: no candidate → clamped to exactly 200, not within
    assert not bool(out.loc[2, "greenspace_within"])
    assert out.loc[2, "distance_to_greenspace"] == 200.0
    # id3: rect within 200 (dist to rect 180) but centroid at 230 → candidate
    # exists, min centroid dist 230 > target → outcome False AND clamped
    assert not bool(out.loc[3, "greenspace_within"])
    assert out.loc[3, "distance_to_greenspace"] == 200.0


def test_landcover_percentages_sum_to_100(spark, sf_dir):
    from greenex_py_spark.driver_queries import q_landcover_pct

    out = q_landcover_pct(spark, sf_dir).toPandas()
    cls = [c for c in out.columns if c.startswith("class_")]
    sums = out[cls].map(lambda s: float(s.rstrip("%"))).sum(axis=1)
    assert ((sums - 100.0).abs() < 0.01).all()


def test_pip_property_vs_oracle(spark):
    """Random-ish polygons: Spark PiP join == NumPy ray-cast oracle."""
    from greenex_py_spark.operators.spatial_join import point_in_polygon_join

    rng = np.random.default_rng(7)
    polys = []
    for k in range(5):
        n = 5 + k
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        rad = rng.uniform(50, 200, n)
        cx = 100000.0 + 1000.0 * (k + 1)
        cy = 450000.0 + 777.0 * (k + 1)
        ring = np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
        polys.append(
            dict(gs_id=k, rings=[ring.ravel().tolist()],
                 minx=ring[:, 0].min(), miny=ring[:, 1].min(),
                 maxx=ring[:, 0].max(), maxy=ring[:, 1].max())
        )
    px = rng.uniform(100000, 106000, 400)
    py = rng.uniform(450000, 456000, 400)
    pts = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(400), "x": px, "y": py})
    )
    pdf = spark.createDataFrame(
        pd.DataFrame(polys),
        schema="gs_id long, rings array<array<double>>, minx double, miny double, maxx double, maxy double",
    )
    got = (
        point_in_polygon_join(pts, pdf, point_key="id")
        .select("id", "gs_id").toPandas().sort_values(["id", "gs_id"]).reset_index(drop=True)
    )
    want = []
    for p in polys:
        ring = np.asarray(p["rings"][0]).reshape(-1, 2)
        inside = kernels.points_in_polygon(px, py, [ring])
        want.extend((int(i), p["gs_id"]) for i in np.nonzero(inside)[0])
    want = pd.DataFrame(want, columns=["id", "gs_id"]).sort_values(["id", "gs_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_text_byte_identity(spark, sf_dir):
    """input_hint invariant: text survives the spatial pipeline
    byte-identically per doc."""
    import hashlib

    from greenex_py_spark.data import driver_city as city

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    before = {
        r["doc_id"]: hashlib.sha256(r["text"].encode()).hexdigest()
        for r in docs.collect()
    }
    routed = (
        docs.join(city.with_cell(city.points_df(spark, sf_dir)), "doc_id")
        .select("doc_id", "text")
        .collect()
    )
    assert len(routed) == len(before)
    for r in routed:
        assert hashlib.sha256(r["text"].encode()).hexdigest() == before[r["doc_id"]]


def test_minhash_lsh_recall_vs_exact(spark, sf_dir):
    """LSH candidates recover every exact-Jaccard pair ≥ threshold on the
    planted corpus (16 perms / 4 bands at τ=0.6 ⇒ near-1 recall)."""
    from greenex_py_spark.driver_queries import _corpus_df
    from greenex_py_spark.functions.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    corpus = _corpus_df(spark, sf_dir)
    exact = ngram_jaccard_pairs(corpus, threshold=0.6).toPandas()
    lsh = minhash_lsh_pairs(corpus, threshold=0.6).toPandas()
    e = set(zip(exact.id_a, exact.id_b))
    l = set(zip(lsh.id_a, lsh.id_b))
    assert l <= e  # verification step guarantees no false positives
    assert len(l) / max(len(e), 1) >= 0.95


def test_winnow_fingerprint_guarantee(spark):
    """Winnowing invariant: a shared token run of length ≥ k+w−1 between
    two documents yields ≥1 shared fingerprint; disjoint-vocabulary
    documents share none; docs shorter than k tokens emit nothing."""
    from greenex_py_spark.functions.text import winnow_fingerprints

    shared = " ".join(f"s{i}" for i in range(12))  # ≥ k+w−1 = 8 tokens
    rows = [
        (1, "alpha beta " + shared + " gamma"),
        (2, shared + " delta epsilon zeta"),
        (3, "one two three four five six seven eight nine ten"),
        (4, "tiny doc"),  # < k tokens → no fingerprints
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = winnow_fingerprints(df).toPandas()
    by_doc = {d: set(g["fp"]) for d, g in fp.groupby("doc_id")}
    assert by_doc[1] & by_doc[2], "shared run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])
    assert 4 not in by_doc
    # determinism: recompute → identical set
    fp2 = winnow_fingerprints(df).toPandas()
    assert set(map(tuple, fp.values.tolist())) == set(map(tuple, fp2.values.tolist()))


def test_partitioned_dijkstra_equals_broadcast(spark, sf_dir):
    """The no-broadcast scale path (cell-partitioned CSR fragments,
    3×3 halo) emits exactly the broadcast-CSR path's rows."""
    from greenex_py_spark.data import city_fixture as fx
    from greenex_py_spark.data import driver_city as city
    from greenex_py_spark.operators.network import (
        bounded_network_distances,
        bounded_network_distances_partitioned,
        nearest_node,
    )

    pts = (
        city.points_df(spark, sf_dir)
        .filter(F.col("doc_id") % 7 == 0)
        .withColumnRenamed("doc_id", "id")
    )
    nodes, edges = fx.network_dfs(spark)
    snapped = nearest_node(pts, nodes, "id")
    a = (
        bounded_network_distances(snapped, nodes, edges, 450.0, "id")
        .toPandas().sort_values(["id", "node_id"]).reset_index(drop=True)
    )
    b = (
        bounded_network_distances_partitioned(snapped, nodes, edges, 450.0, "id")
        .toPandas().sort_values(["id", "node_id"]).reset_index(drop=True)
    )
    assert len(a) == len(b) and len(a) > 0
    assert (a.id.to_numpy() == b.id.to_numpy()).all()
    assert (a.node_id.to_numpy() == b.node_id.to_numpy()).all()
    np.testing.assert_allclose(a.net_dist.to_numpy(), b.net_dist.to_numpy(), rtol=0, atol=0)


def test_adaptive_dijkstra_routes_by_graph_size(spark, sf_dir):
    """VERDICT r03 #1: the auto dispatcher must take the broadcast-CSR
    path below DRIVER_MAX_EDGES and the no-broadcast cogroup path above
    it — pinned by plan shape (MapInPandas vs FlatMapCoGroupsInPandas),
    and both routes must agree row-for-row."""
    from greenex_py_spark.data import city_fixture as fx
    from greenex_py_spark.data import driver_city as city
    from greenex_py_spark.operators.network import (
        bounded_network_distances_auto,
        nearest_node,
    )

    pts = (
        city.points_df(spark, sf_dir)
        .filter(F.col("doc_id") % 13 == 0)
        .withColumnRenamed("doc_id", "id")
    )
    nodes, edges = fx.network_dfs(spark)
    snapped = nearest_node(pts, nodes, "id")

    small = bounded_network_distances_auto(snapped, nodes, edges, 450.0, "id")
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan_small
    assert "FlatMapCoGroupsInPandas" not in plan_small

    big = bounded_network_distances_auto(
        snapped, nodes, edges, 450.0, "id", driver_max_edges=0
    )
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan_big

    a = small.toPandas().sort_values(["id", "node_id"]).reset_index(drop=True)
    b = big.toPandas().sort_values(["id", "node_id"]).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    np.testing.assert_allclose(a.net_dist.to_numpy(), b.net_dist.to_numpy(), rtol=0, atol=0)


def test_distributed_cc_equals_driver_cc(spark):
    """The big-graph Pregel path (_cc_distributed, never reached by the
    adaptive threshold on fixtures) emits the same labels as the
    driver-side union-find — on a CHAIN layout (diameter 9, exercises
    multi-round min-label convergence), not just pairwise overlaps."""
    from greenex_py_spark.operators.dissolve import (
        _cc_distributed,
        connected_components,
        overlap_edges,
    )

    rows = []
    for c in range(4):  # 4 chains of 10 overlapping rects
        for i in range(10):
            x0 = c * 1000.0 + i * 50.0
            rows.append((c * 10 + i, 100000.0 + x0, 450000.0 + c * 500.0,
                         100000.0 + x0 + 80.0, 450000.0 + c * 500.0 + 80.0))
    layer = spark.createDataFrame(
        rows, "gs_id long, minx double, miny double, maxx double, maxy double"
    )
    e = overlap_edges(layer)
    drv = connected_components(layer, e).toPandas().set_index("gs_id")["comp"]
    dist = _cc_distributed(layer, e).toPandas().set_index("gs_id")["comp"]
    assert (drv.sort_index() == dist.sort_index()).all()
    # each chain collapses to its min id
    assert set(drv.unique()) == {0, 10, 20, 30}


def test_cc_threshold_boundary_routes_and_agrees(spark, monkeypatch):
    """VERDICT r03 #5: the path decision is one bounded job — at
    driver_threshold == n_edges the union-find runs (distributed loop
    NOT invoked), at n_edges - 1 the distributed loop runs; labels are
    identical on both sides of the boundary."""
    import greenex_py_spark.operators.dissolve as dz

    rows = []
    for c in range(3):  # 3 chains of 4 overlapping rects -> 9 edges
        for i in range(4):
            x0 = c * 1000.0 + i * 50.0
            rows.append((c * 4 + i, 100000.0 + x0, 450000.0,
                         100000.0 + x0 + 80.0, 450080.0))
    layer = spark.createDataFrame(
        rows, "gs_id long, minx double, miny double, maxx double, maxy double"
    )
    e = dz.overlap_edges(layer)
    n_edges = e.count()
    assert n_edges == 9

    calls = []
    real = dz._cc_distributed

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(dz, "_cc_distributed", spy)
    at = dz.connected_components(layer, e, driver_threshold=n_edges).toPandas()
    assert not calls, "union-find path expected at threshold == n_edges"
    below = dz.connected_components(layer, e, driver_threshold=n_edges - 1).toPandas()
    assert calls, "distributed path expected at threshold == n_edges - 1"
    a = at.set_index("gs_id")["comp"].sort_index()
    b = below.set_index("gs_id")["comp"].sort_index()
    assert (a == b).all()
    assert set(a.unique()) == {0, 4, 8}


def test_blocked_cosine_pairs_cross_block(spark):
    """Regression: cosine_pairs_blocked must find pairs whose SMALLER id
    hashes into the HIGHER block (block_rows=2 forces many blocks; every
    planted clone pair must surface regardless of block layout)."""
    from greenex_py_spark.functions.similarity import cosine_pairs_blocked

    rows = []
    for i in range(12):
        v = [float((i * 7 + j * 3) % 11 + 1) for j in range(8)]
        rows.append((i, v))
        rows.append((1000 + i, v))  # exact clone → sim 1.0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = cosine_pairs_blocked(df, threshold=0.999, block_rows=2).toPandas()
    pairs = set(zip(got.id_a, got.id_b))
    for i in range(12):
        assert (i, 1000 + i) in pairs, f"clone pair {i} lost to block layout"
    assert (got.id_a < got.id_b).all()
    assert not got.duplicated(["id_a", "id_b"]).any()


def test_ivf_ann_recall_and_determinism(spark, sf_dir):
    """IVF probed search: no false results (every returned pair is a true
    cosine sim), decent recall vs exact top-k at nprobe=4/16, and exact
    rerun determinism."""
    from greenex_py_spark.functions.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(q, emb, k=10).toPandas()
    ivf = ivf_topk(q, emb, k=10, nprobe=4).toPandas()
    e = set(zip(exact.q_id, exact.n_id))
    i = set(zip(ivf.q_id, ivf.n_id))
    assert len(e & i) / len(e) >= 0.7
    # sims agree exactly on the intersection (same rounding contract)
    m = exact.merge(ivf, on=["q_id", "n_id"], suffixes=("_e", "_i"))
    assert (m.sim_e == m.sim_i).all()
    ivf2 = ivf_topk(q, emb, k=10, nprobe=4).toPandas()
    assert ivf.sort_values(["q_id", "rank"]).reset_index(drop=True).equals(
        ivf2.sort_values(["q_id", "rank"]).reset_index(drop=True)
    )


def test_ann_recall_at_k_matches_set_arithmetic(spark, sf_dir):
    """ann_recall_at_k equals hand-computed |approx∩exact|/k per query,
    is 1.0 when grading exact against itself, and counts only rank<=k."""
    import pandas as pd

    from greenex_py_spark.functions.similarity import (
        ann_recall_at_k, cosine_topk, ivf_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(q, emb, k=10)
    ivf = ivf_topk(q, emb, k=10, nprobe=4)
    got = ann_recall_at_k(ivf, exact, k=10).toPandas().set_index("q_id")
    ep, ip = exact.toPandas(), ivf.toPandas()
    for qid, grp in ep.groupby("q_id"):
        e = set(grp.n_id)
        a = set(ip[ip.q_id == qid].n_id)
        assert got.loc[qid, "hits"] == len(e & a)
        assert got.loc[qid, "recall"] == round(len(e & a) / len(e), 6)
    perfect = ann_recall_at_k(exact, exact, k=10).toPandas()
    assert (perfect.recall == 1.0).all()
    # k=5 truncates both sides before intersecting
    got5 = ann_recall_at_k(ivf, exact, k=5).toPandas().set_index("q_id")
    e5 = ep[ep["rank"] <= 5]
    i5 = ip[ip["rank"] <= 5]
    for qid, grp in e5.groupby("q_id"):
        inter = set(grp.n_id) & set(i5[i5.q_id == qid].n_id)
        assert got5.loc[qid, "hits"] == len(inter)


def test_simhash_near_dup_hamming(spark, sf_dir):
    """Planted near-clones (one word dropped) sit within small hamming
    distance of their originals."""
    from greenex_py_spark.driver_queries import _corpus_df
    from greenex_py_spark.functions.dedup import simhash

    fp = simhash(_corpus_df(spark, sf_dir)).toPandas().set_index("id")["simhash"]
    orig = [i for i in fp.index if i < 1000000 and (i % 25 == 1) and (i + 2000000) in fp.index]
    assert orig
    hams = [bin(int(fp[i]) ^ int(fp[i + 2000000])).count("1") for i in orig]
    assert np.mean(hams) <= 4.0


def test_isochrone_hole_fill(spark):
    """radius 500 on the 200 m lattice induces edge loops; the capsule
    union has (200-50)² holes that Polygon(exterior) semantics fill —
    pixels at grid-square centers are ~>25 m from any segment but must
    be inside the AoI (availability.py:1060-1062)."""
    from greenex_py_spark.data import city_fixture as fx
    from greenex_py_spark.data import driver_city as city
    from greenex_py_spark.operators.network import (
        isochrone_edges, isochrone_raster_mask,
    )

    # PoI exactly on lattice node (25, 25)
    px = city.X0 + 25 * fx.GRID_STEP
    py = city.Y0 + 25 * fx.GRID_STEP
    pts = spark.createDataFrame(pd.DataFrame({"id": [1], "x": [px], "y": [py]}))
    nodes, edges = fx.network_dfs(spark)
    segs = isochrone_edges(pts, nodes, edges, radius=500.0).toPandas()
    assert len(segs) >= 8  # loops exist
    filled, (ix0, iy0) = isochrone_raster_mask(segs, 5.0, city.X0, city.Y0, 2000, 25.0)
    open_, _ = isochrone_raster_mask(
        segs, 5.0, city.X0, city.Y0, 2000, 25.0, fill_holes=False
    )
    # grid-square center (100,100) m off the node = hole interior
    hx, hy = px + 100.0, py + 100.0
    jx = int((hx - city.X0) // 5.0) - ix0
    jy = int((hy - city.Y0) // 5.0) - iy0
    assert not open_[jy, jx]      # not in any capsule
    assert filled[jy, jx]         # but inside the filled polygon
    assert filled.sum() > open_.sum()


def test_streetview_sampler_step_scheme(spark):
    """select_points_on_road_network semantics: one direction per edge
    (T6), points every 50 m endpoint-excluded (G6 step), geometry dedup
    (T1) — on the 200 m lattice that's 4 points per undirected edge and
    shared endpoints deduped."""
    from greenex_py_spark.data import city_fixture as fx
    from greenex_py_spark.operators.visibility import sample_points_streetview

    _, edges = fx.network_dfs(spark)
    pts = sample_points_streetview(edges, step=50.0).toPandas()
    n_edges_undirected = fx.GRID_N * (fx.GRID_N - 1) * 2
    # per edge: distances 0,50,100,150 → 4 pts, but the 0-point of an
    # edge equals a node shared by up to 4 edges → dedup
    n_nodes = fx.GRID_N * fx.GRID_N
    # 3 interior points per undirected edge + one 0-distance point per
    # distinct edge-start node; with src<dst canonicalization the
    # top-right corner node never starts an edge → nodes-1
    expected = n_edges_undirected * 3 + n_nodes - 1
    assert len(pts) == expected


def test_wkb_binary_column_roundtrip(spark):
    """Geometry interchange: rings → WKB binary column → Spark →
    decode in an Arrow UDF → identical area/centroid (the engine's
    storage format for polygon layers, geo/wkb.py)."""
    import pandas as pd
    from pyspark.sql import types as T

    from greenex_py_spark.data import city_fixture as fx
    from greenex_py_spark.geo import wkb as wkbmod

    pdf = fx.greenspace_rings_pdf().head(30)
    pdf = pdf.assign(
        wkb=[
            wkbmod.encode_polygon(
                [np.asarray(r, dtype=float).reshape(-1, 2) for r in rings]
            )
            for rings in pdf.rings
        ]
    )
    df = spark.createDataFrame(pdf[["gs_id", "wkb", "area"]],
                               schema="gs_id long, wkb binary, area double")

    @F.pandas_udf(T.DoubleType())
    def wkb_area(b: pd.Series) -> pd.Series:
        out = []
        for buf in b:
            polys = wkbmod.decode(bytes(buf))
            out.append(sum(kernels.polygon_area(p) for p in polys))
        return pd.Series(out)

    got = df.withColumn("area2", wkb_area("wkb")).toPandas()
    np.testing.assert_allclose(got.area2, got.area, rtol=1e-12)


def test_shingles_unbounded_long_docs(spark):
    """Engine shingling is position-unbounded: a 600-token document
    yields exactly n−k+1 distinct shingles (matches the oracle's raised
    1000-position cap; pinned so the envelope never silently shrinks)."""
    from greenex_py_spark.functions.dedup import shingles

    text = " ".join(f"w{i}" for i in range(600))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    sh = shingles(df, k=3).toPandas()
    assert len(sh) == 600 - 2
    assert sh.sh.nunique() == 598


def test_nearest_node_isolated_far_point(spark):
    """A point far outside the snap bound must still snap to its true
    1-NN via the expanding k-ring retry (no unbounded cross join), and
    exactness must hold when a nearer node sits just outside an inner
    ring's distance bound."""
    import pandas as pd

    from greenex_py_spark.operators.network import nearest_node

    nodes = spark.createDataFrame(
        pd.DataFrame(
            {
                "node_id": [0, 1, 2],
                "x": [100000.0, 101000.0, 160000.0],
                "y": [450000.0, 450000.0, 450000.0],
            }
        ),
        schema="node_id long, x double, y double",
    )
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [10, 11, 12],
                # 10: on top of node 0; 11: 900 m from node 1 (k-ring round 1);
                # 12: ~49 km from every node (full-scan remainder)
                "x": [100000.0, 101900.0, 111000.0],
                "y": [450000.0, 450000.0, 450000.0],
            }
        ),
        schema="id long, x double, y double",
    )
    got = {
        r["id"]: (r["node_id"], r["penalty_home"])
        for r in nearest_node(pts, nodes, "id", max_snap_dist=300.0).collect()
    }
    assert got[10] == (0, 0.0)
    assert got[11][0] == 1 and abs(got[11][1] - 900.0) < 1e-9
    assert got[12][0] == 1 and abs(got[12][1] - 10000.0) < 1e-9
    assert len(got) == 3


def test_dissolve_polygons_chain(spark):
    """Chain of three rotated rects A-B-C (A∩B, B∩C, A∩C disjoint) must
    dissolve to ONE component whose union stats match the driver-side
    slab kernel over all three members."""
    import numpy as np
    import pandas as pd

    from greenex_py_spark.geo import kernels as K
    from greenex_py_spark.operators.dissolve import dissolve_polygons

    def rect(cx, cy, w, h, deg):
        th = np.radians(deg)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        base = np.array([[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]])
        return base @ R.T + np.array([cx, cy])

    rings = [rect(100100, 450100, 120, 80, 15),
             rect(100180, 450140, 120, 80, 70),
             rect(100260, 450180, 120, 80, 130),
             rect(100900, 450900, 60, 60, 33)]  # far single
    rows = [
        dict(gs_id=i, rings=[r.ravel().tolist()],
             minx=float(r[:, 0].min()), miny=float(r[:, 1].min()),
             maxx=float(r[:, 0].max()), maxy=float(r[:, 1].max()), tag="t")
        for i, r in enumerate(rings)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows),
        schema="gs_id long, rings array<array<double>>, minx double, miny double, "
               "maxx double, maxy double, tag string",
    )
    out = dissolve_polygons(df).toPandas().sort_values("component").reset_index(drop=True)
    assert out.component.tolist() == [0, 3]
    assert out.n_members.tolist() == [3, 1]
    want_a, want_cx, want_cy = K.polygon_union_stats([[r] for r in rings[:3]])
    np.testing.assert_allclose(out.loc[0, "area"], round(want_a, 6))
    np.testing.assert_allclose(out.loc[0, "cx"], round(want_cx, 6))
    np.testing.assert_allclose(out.loc[0, "cy"], round(want_cy, 6))
    np.testing.assert_allclose(out.loc[1, "area"], round(60.0 * 60.0, 6))


def test_resample_nearest_identity_and_offset(spark):
    """Identity regrid reproduces the source exactly; a half-pixel
    offset grid picks the containing source pixel (hand-checkable)."""
    import numpy as np

    from greenex_py_spark.data import driver_city as city
    from greenex_py_spark.geo.grid import GridSpec
    from greenex_py_spark.operators.resample import resample_nearest

    tiles = city.tiles_df(spark, "ndvi")
    # identity: same grid in and out
    ident = resample_nearest(tiles, city.grid(), src_grid=city.grid())
    a = {(r["tx"], r["ty"]): np.asarray(r["px"]) for r in ident.collect()}
    b = {(r["tx"], r["ty"]): np.asarray(r["px"]) for r in tiles.collect()}
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
    # offset coarse grid: value at target center (x,y) = src pixel floor
    dst = GridSpec(city.X0 + 3.0, city.Y0 + 4.0, 25.0, 64, 128, 128)
    out = resample_nearest(tiles, dst, src_grid=city.grid()).collect()
    got = {(r["tx"], r["ty"]): np.asarray(r["px"]).reshape(r["h"], r["w"]) for r in out}
    for (tx, ty), arr in got.items():
        for li, lj in ((0, 0), (5, 7)):
            gx = tx * 64 + lj
            gy = ty * 64 + li
            if gx >= 128 or gy >= 128:
                continue
            cx = city.X0 + 3.0 + (gx + 0.5) * 25.0
            cy = city.Y0 + 4.0 + (gy + 0.5) * 25.0
            six = int((cx - city.X0) // city.RES)
            siy = int((cy - city.Y0) // city.RES)
            want = np.sin((city.X0 + (six + 0.5) * city.RES) / 500.0) * np.cos(
                (city.Y0 + (siy + 0.5) * city.RES) / 500.0
            )
            assert arr[li, lj] == want


def test_resample_nearest_binary_src_and_gaps(spark):
    """float32-binary source tiles (surface rasters) decode correctly,
    and target areas outside the source raster come back NaN."""
    import numpy as np

    from greenex_py_spark.data import city_fixture as fx
    from greenex_py_spark.data import driver_city as city
    from greenex_py_spark.geo.grid import GridSpec
    from greenex_py_spark.operators.resample import resample_nearest

    tiles = fx.surface_tiles_df(spark, "dsm")
    # target window straddling the raster's east edge -> right half NaN
    dst = GridSpec(city.X0 + 9900.0, city.Y0 + 100.0, 10.0, 32, 32, 32)
    out = resample_nearest(tiles, dst, src_grid=fx.surface_grid()).collect()
    assert len(out) == 1
    # NaN crosses Arrow as null → None elements in the collected list
    arr = np.array(
        [np.nan if v is None else v for v in out[0]["px"]], dtype=np.float64
    ).reshape(32, 32)
    # columns with centers beyond x = X0+10000 are NaN
    cx = city.X0 + 9900.0 + (np.arange(32) + 0.5) * 10.0
    outside = cx >= city.X0 + 10000.0
    assert np.isnan(arr[:, outside]).all()
    inside = ~outside
    ix = ((cx[inside] - city.X0) // fx.DSM_RES).astype(int)
    iy = ((city.Y0 + 100.0 + (np.arange(32) + 0.5) * 10.0 - city.Y0) // fx.DSM_RES).astype(int)
    want = fx.dsm_value(ix[None, :], iy[:, None])
    np.testing.assert_array_equal(arr[:, inside], want)


def test_resample_mixed_crs_transform(spark):
    """Mixed-CRS regrid (the gdal.Warp case R2 exists for): a source
    raster on a UTM-31N grid is gathered onto an EPSG:28992 target grid
    through the geo/proj transform hook; sampled pixels must equal the
    direct NumPy evaluation of source-value(nearest source pixel of the
    reprojected target center)."""
    import numpy as np
    import pandas as pd

    from greenex_py_spark.geo import proj as P
    from greenex_py_spark.geo.grid import GridSpec
    from greenex_py_spark.operators.resample import resample_nearest

    # source: 64x64 UTM-31N raster near (4.8E, 52.4N) with closed-form
    # values v = ix*1000 + iy (exact integers → exact equality checks)
    e0, n0 = P.from_wgs84(4.8, 52.4, 32631)
    src_grid = GridSpec(float(e0), float(n0), 30.0, 32, 64, 64)
    rows = []
    for ty in range(2):
        for tx in range(2):
            ix = tx * 32 + np.arange(32)
            iy = ty * 32 + np.arange(32)
            vals = (ix[None, :] * 1000.0 + iy[:, None])
            rows.append(
                dict(layer="v", tx=tx, ty=ty,
                     x0=src_grid.origin_x + tx * 32 * 30.0,
                     y0=src_grid.origin_y + ty * 32 * 30.0,
                     res=30.0, w=32, h=32, px=vals.ravel().tolist())
            )
    tiles = spark.createDataFrame(
        pd.DataFrame(rows),
        schema="layer string, tx int, ty int, x0 double, y0 double, "
               "res double, w int, h int, px array<double>",
    )
    # target: EPSG:28992 grid over the same ground area
    rd_e, rd_n = P.from_wgs84(4.8, 52.4, 28992)
    dst_grid = GridSpec(float(rd_e) + 100.0, float(rd_n) + 100.0, 40.0, 16, 32, 32)

    def rd_to_utm(X, Y):
        lon, lat = P.to_wgs84(X, Y, 28992)
        return P.from_wgs84(lon, lat, 32631)

    out = resample_nearest(tiles, dst_grid, src_grid=src_grid, transform=rd_to_utm).collect()
    got = {}
    for r in out:
        arr = np.array([np.nan if v is None else v for v in r["px"]], dtype=np.float64)
        got[(r["tx"], r["ty"])] = arr.reshape(r["h"], r["w"])
    checked = 0
    for (tx, ty), arr in got.items():
        for li, lj in ((0, 0), (7, 3), (15, 15)):
            gx = tx * 16 + lj
            gy = ty * 16 + li
            cx = dst_grid.origin_x + (gx + 0.5) * 40.0
            cy = dst_grid.origin_y + (gy + 0.5) * 40.0
            sx, sy = rd_to_utm(np.array([cx]), np.array([cy]))
            six = int(np.floor((sx[0] - src_grid.origin_x) / 30.0))
            siy = int(np.floor((sy[0] - src_grid.origin_y) / 30.0))
            if 0 <= six < 64 and 0 <= siy < 64:
                assert arr[li, lj] == six * 1000.0 + siy
                checked += 1
            else:
                assert np.isnan(arr[li, lj])
    assert checked >= 6  # grids overlap by construction


def test_sq8_quantized_ann_recall_and_codes(spark, sf_dir):
    """int8 scalar quantization: codes land in [0,255], dequantized
    top-10 recovers most of the exact cosine top-10 (256-level grids
    barely perturb rankings), and reruns are identical."""
    from greenex_py_spark.functions.similarity import (
        cosine_topk, sq8_quantize, sq8_stats, sq8_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    stats = sq8_stats(emb)
    codes = sq8_quantize(emb, stats).toPandas()
    allq = np.concatenate([np.asarray(c) for c in codes.qcode])
    assert allq.min() >= 0 and allq.max() <= 255
    q = emb.filter(F.col("vec_id") < 10)
    approx = sq8_topk(q, emb, k=10).toPandas()
    exact = cosine_topk(q, emb, k=10).toPandas()
    a = set(zip(approx.q_id, approx.n_id))
    e = set(zip(exact.q_id, exact.n_id))
    assert len(a & e) / len(e) >= 0.8
    again = sq8_topk(q, emb, k=10).toPandas()
    pd.testing.assert_frame_equal(
        approx.sort_values(["q_id", "rank"]).reset_index(drop=True),
        again.sort_values(["q_id", "rank"]).reset_index(drop=True),
    )


def test_canonicalize_url_cases(spark):
    """URL normalizer unit cases: fragments, tracking params in every
    position, genuine params preserved, case folding limited to
    scheme+host, slash collapse sparing the scheme's //."""
    from greenex_py_spark.functions.dedup import canonicalize_url

    cases = [
        ("https://Ex.COM/Path/To?x=1#frag", "https://ex.com/Path/To?x=1"),
        ("HTTPS://A.B//p//q///r/", "https://a.b/p/q/r"),
        ("https://a.b/p?utm_source=x", "https://a.b/p"),
        ("https://a.b/p?utm_source=x&keep=1", "https://a.b/p?keep=1"),
        ("https://a.b/p?keep=1&utm_source=x&gclid=2", "https://a.b/p?keep=1"),
        ("https://a.b/p?ref=rss&fbclid=z", "https://a.b/p"),
        ("https://a.b/p?href=3", "https://a.b/p?href=3"),  # not a tracking param
        ("https://a.b", "https://a.b"),
        ("relative/path//x?utm_id=9", "relative/path/x"),
        # query values survive verbatim (collapse/trailing-strip are
        # path-only): distinct queries must NOT conflate
        ("https://a.b/p?next=//x", "https://a.b/p?next=//x"),
        ("https://a.b/p?next=/x", "https://a.b/p?next=/x"),
        ("https://a.b/p?next=/", "https://a.b/p?next=/"),
        ("https://a.b/p/?u=http://y", "https://a.b/p?u=http://y"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]
    assert got == [w for _, w in cases], list(zip(got, [w for _, w in cases]))


def test_canonicalize_url_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) — normalizers must be
    idempotent or repeated pipeline passes churn keys."""
    from greenex_py_spark.functions.dedup import canonicalize_url

    urls = [
        "https://Ex.COM/Path//To/?utm_source=x&keep=1&ref=rss#f",
        "HTTP://A.B//x///y?fbclid=1",
        "https://a.b/p?next=//x&utm_id=2",
        "relative//p/?gclid=9",
        "https://a.b/p?keep=/#frag",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonicalize_url(F.col("url")).alias("c1"))
    twice = once.select("c1", canonicalize_url(F.col("c1")).alias("c2"))
    rows = twice.collect()
    assert all(r["c1"] == r["c2"] for r in rows), [(r["c1"], r["c2"]) for r in rows]


def test_kmv_sketch_accuracy_and_exact_under_k(spark, sf_dir):
    """KMV estimator: exact when distinct < k (sketch holds every
    hash); within the ~1/sqrt(k) relative bound when estimating; and
    n_seen is the raw row count."""
    from greenex_py_spark.functions.sketches import kmv_distinct

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select("lang", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    truth = {
        r["lang"]: (r["d"], r["n"])
        for r in toks.groupBy("lang").agg(
            F.countDistinct("tok").alias("d"), F.count("*").alias("n")
        ).collect()
    }
    # unigram vocab (< k=256): estimate must be EXACT
    exact = kmv_distinct(toks, "tok", ["lang"], k=256).collect()
    for r in exact:
        d, n = truth[r["lang"]]
        assert r["est_distinct"] == float(d) and r["n_seen"] == n
    # k smaller than cardinality: estimation path, ~1/sqrt(k) bound
    est = kmv_distinct(toks, "tok", ["lang"], k=16).collect()
    for r in est:
        d, _ = truth[r["lang"]]
        assert abs(r["est_distinct"] - d) / d < 0.6  # 16-min sketch is coarse
    est64 = kmv_distinct(toks, "tok", ["lang"], k=64).collect()
    for r in est64:
        d, _ = truth[r["lang"]]
        assert abs(r["est_distinct"] - d) / d < 0.35


def test_heavy_hitters_matches_exact_counts(spark, sf_dir):
    """Top-k rows are exactly the k most frequent values (count + order
    verified against a full pandas count)."""
    from greenex_py_spark.functions.sketches import heavy_hitters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select("lang", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    got = heavy_hitters(toks, "tok", ["lang"], k=5).toPandas()
    full = toks.toPandas().groupby(["lang", "tok"]).size().reset_index(name="n")
    for lang, grp in got.groupby("lang"):
        want = (
            full[full.lang == lang]
            .sort_values(["n", "tok"], ascending=[False, True])
            .head(5)
        )
        assert grp.sort_values("rank")["value"].tolist() == want["tok"].tolist()
        assert grp.sort_values("rank")["n"].tolist() == want["n"].tolist()


def test_gopher_repetition_hand_values(spark):
    """Hand-computed repetition fractions, incl. a doc below the 3-token
    floor (dropped) and a fully repetitive doc."""
    from greenex_py_spark.functions.text import gopher_repetition

    docs = spark.createDataFrame(
        [
            # "a b a b a": bigrams ab,ba,ab,ba -> top2 count 2 (x2/5 tokens
            # = 0.8); trigrams aba,bab,aba -> top3 count 2 (x3/5 = 1.2 capped
            # by formula, not clamped); dup2 = 4/4 = 1.0
            (1, "a b a b a"),
            # all-distinct tokens: top2 1*2/5=0.4, top3 3/5=0.6, dup2 0
            (2, "v w x y z"),
            (3, "too short"),  # 2 tokens -> dropped
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in gopher_repetition(docs).collect()}
    assert set(got) == {1, 2}
    assert got[1]["top2_frac"] == 0.8
    assert got[1]["top3_frac"] == 1.2
    assert got[1]["dup2_frac"] == 1.0
    assert got[2]["top2_frac"] == 0.4
    assert got[2]["top3_frac"] == 0.6
    assert got[2]["dup2_frac"] == 0.0


def test_decontaminate_gram_semantics(spark):
    """Position-level hit counting, short-doc exclusion on both sides,
    and eval-side distinctness (duplicate eval grams count once)."""
    from greenex_py_spark.functions.dedup import decontaminate

    train = spark.createDataFrame(
        [
            (1, "p q r s t u"),       # contains "q r s" at one position
            (2, "q r s q r s q"),     # "q r s" at positions 1 and 4
            (3, "x y z w v u"),       # clean
            (4, "q r"),               # shorter than k -> never flagged
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [("q r s",), ("q r s",), ("m n",)], "text string"
    )  # dup eval gram counts once; 2-token eval line emits no 3-gram
    got = {r["doc_id"]: r["n_hits"] for r in
           decontaminate(train, evals, k=3).collect()}
    assert got == {1: 1, 2: 2}


def test_segment_dedup_boilerplate_removal(spark):
    """Shared segments vanish from every doc, unique ones survive in
    order; a fully-boilerplate doc stays with empty text."""
    from greenex_py_spark.functions.dedup import segment_dedup

    boiler = "cookie banner here"  # 3 tokens = one full segment at W=3
    docs = spark.createDataFrame(
        [
            (1, boiler + " alpha beta gamma"),
            (2, boiler + " delta eps zeta"),
            (3, boiler),                    # everything boilerplate
            (4, "unique words only stay"),  # 4 toks -> 2 segs (3+1)
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           segment_dedup(docs, seg_tokens=3, max_docs=1).collect()}
    assert got[1]["text_clean"] == "alpha beta gamma"
    assert (got[1]["n_segs"], got[1]["n_dropped"]) == (2, 1)
    assert got[2]["text_clean"] == "delta eps zeta"
    assert got[3]["text_clean"] == "" and got[3]["n_dropped"] == 1
    assert got[4]["text_clean"] == "unique words only stay"
    assert (got[4]["n_segs"], got[4]["n_dropped"]) == (2, 0)


def test_redact_pii_patterns(spark):
    """Each PII class redacts with its own token; counting is sequential
    (an email's digits are not re-counted as a phone)."""
    from greenex_py_spark.functions.text import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail a.b-c_9@sub.ex.co now"),
            (2, "host 192.168.0.1 up"),
            (3, "call +31 20 123 4567 or 0612345678"),
            (4, "clean text with no pii at all"),
            (5, "x user99@ex.org and 10.0.0.7 and +1 555 123 9876"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert got[1]["redacted"] == "mail <EMAIL> now" and got[1]["n_pii"] == 1
    assert got[2]["redacted"] == "host <IP> up" and got[2]["n_pii"] == 1
    assert got[3]["redacted"] == "call <PHONE> or <PHONE>" and got[3]["n_pii"] == 2
    assert got[4]["redacted"] == got[4]["redacted"] and got[4]["n_pii"] == 0
    assert got[5]["redacted"] == "x <EMAIL> and <IP> and <PHONE>"
    assert got[5]["n_pii"] == 3


def test_domain_stats_dup_and_means(spark):
    """Cross-domain exact dup flags both hosting domains; means are exact
    rationals of the per-doc values."""
    from greenex_py_spark.functions.text import domain_stats, quality_score

    docs = spark.createDataFrame(
        [
            (1, "same exact body text here", "a.com"),
            (2, "same exact body text here", "b.com"),  # dup across domains
            (3, "unique alpha beta gamma delta", "a.com"),
            (4, "another unique doc body", "b.com"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r["domain"]: r for r in domain_stats(docs).collect()}
    q = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    assert got["a.com"]["n_docs"] == 2 and got["a.com"]["n_dup_docs"] == 1
    assert got["b.com"]["n_docs"] == 2 and got["b.com"]["n_dup_docs"] == 1
    assert got["a.com"]["mean_quality"] == round((q[1] + q[3]) / 2, 6)
    assert got["a.com"]["mean_tokens"] == 5.0


def test_bm25_hand_formula(spark):
    """One-doc BM25 agrees with a scalar Python evaluation of the Lucene
    formula; docs without any query term are absent."""
    import math

    from greenex_py_spark.functions.retrieval import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "spark joins spark tables fast"),
            (2, "nothing relevant here at all"),
            (3, "stream and spark"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["score"] for r in
           bm25_scores(docs, ["spark", "stream"]).collect()}
    assert set(got) == {1, 3}
    N, avgdl, k1, b = 3, (5 + 5 + 3) / 3, 1.2, 0.75

    def contrib(tf, df, dl):
        idf = math.log(1.0 + (N - df + 0.5) / (df + 0.5))
        c = idf * (tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl)))
        return round(c * 1e6) / 1e6

    assert got[1] == round(contrib(2, 2, 5), 6)
    assert got[3] == round(contrib(1, 2, 3) + contrib(1, 1, 3), 6)


def test_dsir_weights_favor_target_like_docs(spark):
    """Docs sharing the target domain's bigrams score higher than docs
    made of raw-only bigrams; weights are finite for unseen buckets
    (add-1 smoothing)."""
    from greenex_py_spark.functions.sampling import dsir_logweights

    target_text = "alpha beta alpha beta alpha beta"
    docs = spark.createDataFrame(
        [
            (1, target_text),
            (2, target_text),
            (3, "gamma delta gamma delta gamma delta"),
            (4, "alpha beta gamma delta"),
        ],
        "doc_id long, text string",
    )
    target = docs.filter("doc_id <= 2")
    got = {r["doc_id"]: r["logweight"] for r in
           dsir_logweights(docs, target, n_buckets=16).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1] == got[2] > got[4] > got[3]


def test_pagerank_numpy_mirror_and_dangling(spark):
    """Quantized rounds agree with an independent NumPy transliteration
    on a graph WITH a dangling node; mass stays ~1."""
    import numpy as np

    from greenex_py_spark.functions.graph import PICO, pagerank

    # 0->1, 0->2, 1->2, 2->0, 3->2 ; node 4 dangling (in-link only)
    pairs = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 4)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(edges, n_iters=4).collect()}

    n, d = 5, 0.85
    r = np.round(np.full(n, 1.0 / n), 9)
    out = {0: [1, 2], 1: [2], 2: [0], 3: [2, 4]}
    for _ in range(4):
        s = np.zeros(n, dtype=np.int64)
        for u, vs in out.items():
            for v in vs:
                s[v] += round(r[u] / len(vs) * PICO)
        dgp = sum(round(r[u] * PICO) for u in range(n) if u not in out)
        r = np.round((1 - d) / n + d * (s / PICO) + d * (dgp / PICO) / n, 9)
    assert got == {i: pytest.approx(r[i], abs=0) for i in range(n)}
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_length_quantiles_hand_values(spark):
    """Type-7 interpolated quantiles on a known tiny distribution."""
    import numpy as np

    from greenex_py_spark.functions.text import length_quantiles

    rows = [(i, " ".join(["w"] * n), "en") for i, n in enumerate([1, 2, 3, 4, 100])]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = length_quantiles(docs).collect()[0]
    vals = np.array([1, 2, 3, 4, 100], dtype=float)
    assert got["n_docs"] == 5
    for col, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        assert got[col] == round(float(np.quantile(vals, q)), 6)


def test_pmi_bigrams_ranking(spark):
    """An always-together pair outranks an independent pair; min_count
    prunes; rank is contiguous from 1."""
    from greenex_py_spark.functions.text import pmi_bigrams

    # "zig" only ever precedes "zag" (max PMI); "cat" also occurs away
    # from "the", diluting the "the cat" association
    docs = spark.createDataFrame(
        [
            (1, "zig zag the cat the dog zig zag cat naps"),
            (2, "the dog zig zag the cat zig zag cat naps"),
            (3, "zig zag zig zag the cat the dog cat naps"),
        ],
        "doc_id long, text string",
    )
    got = pmi_bigrams(docs, min_count=2, top_k=10).collect()
    ranks = [r["rank"] for r in got]
    assert ranks == list(range(1, len(got) + 1))
    by_pair = {(r["w1"], r["w2"]): r for r in got}
    assert ("zig", "zag") in by_pair
    assert by_pair[("zig", "zag")]["pmi"] > by_pair[("the", "cat")]["pmi"]


def test_ccnet_buckets_tertiles_and_boundaries(spark):
    """Per-language tertile cuts: within one language the three buckets
    are ~equal-sized, a boundary score lands in the better bucket, and a
    second language gets its own independent cutoffs."""
    from greenex_py_spark.functions.text import ccnet_buckets

    # 6 English docs built from a shared vocab so per-doc unigram
    # log-probs are strictly ordered: more repetitions of the corpus's
    # dominant token => higher (less negative) avg logprob
    rows = []
    for i in range(6):
        toks = ["common"] * (i + 1) + ["rare%d" % i]
        rows.append((i, " ".join(toks), "en"))
    rows.append((100, "uno dos", "es"))
    rows.append((101, "uno uno uno", "es"))
    # fr: both docs identical => score == q33 == q67 => boundary-up => head
    rows.append((200, "le chat", "fr"))
    rows.append((201, "le chat", "fr"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["doc_id"]: r for r in ccnet_buckets(docs).collect()}
    assert len(got) == 10
    en = [got[i] for i in range(6)]
    # scores strictly increase with i (more of the dominant token)
    scores = [r["avg_logprob"] for r in en]
    assert scores == sorted(scores) and len(set(scores)) == 6
    assert [r["bucket"] for r in en] == (
        ["tail"] * 2 + ["middle"] * 2 + ["head"] * 2
    )
    # es has its own cuts (independent of en): type-7 on 2 distinct pts
    # interpolates strictly between them -> lower is tail, higher head
    assert got[101]["bucket"] == "head"
    assert got[100]["bucket"] == "tail"
    # exact-boundary docs land in the better bucket (>= comparisons)
    assert got[200]["bucket"] == "head" and got[201]["bucket"] == "head"


def test_semdedup_hand_clusters_and_dups(spark):
    """Two well-separated clusters; within each, one planted duplicate
    points at its min lower-id twin and non-dups keep dup_of null."""
    from greenex_py_spark.functions.similarity import semdedup

    rows = [
        (0, [1.0, 0.0]),   # cluster seed A
        (1, [0.0, 1.0]),   # cluster seed B
        (2, [2.0, 0.0]),   # same direction as 0 -> dup_of 0
        (3, [1.0, 0.3]),   # cluster A, cos≈0.958 < τ -> keeper
        (4, [0.0, 2.0]),   # same direction as 1 -> dup_of 1
        (5, [0.3, 1.0]),   # cluster B, keeper
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r for r in semdedup(df, k=2, iters=1, threshold=0.999).collect()}
    assert {i: got[i]["dup_of"] for i in range(6)} == {
        0: None, 1: None, 2: 0, 3: None, 4: 1, 5: None,
    }
    assert got[0]["cluster"] == got[2]["cluster"] == got[3]["cluster"]
    assert got[1]["cluster"] == got[4]["cluster"] == got[5]["cluster"]
    assert got[0]["cluster"] != got[1]["cluster"]


def test_exact_substring_dedup_keep_first_and_splice(spark):
    """Keep-first contract at min_len=3: the earliest (doc_id, pos)
    occurrence of a repeated run survives, later ones are spliced out;
    a fully-duplicated doc empties; short docs pass through."""
    from greenex_py_spark.functions.dedup import exact_substring_dedup

    rows = [
        (1, "a b c d e"),   # first occurrence of every run -> untouched
        (2, "x b c d y"),   # shares "b c d" with doc 1 -> splice 3 tokens
        (3, "a b c d e"),   # exact clone of doc 1 -> fully removed
        (4, "z q"),         # shorter than min_len -> pass-through
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in exact_substring_dedup(docs, min_len=3).collect()
    }
    assert (got[1]["n_tokens"], got[1]["n_removed"], got[1]["text_clean"]) == (5, 0, "a b c d e")
    assert (got[2]["n_tokens"], got[2]["n_removed"], got[2]["text_clean"]) == (5, 3, "x y")
    assert (got[3]["n_tokens"], got[3]["n_removed"], got[3]["text_clean"]) == (5, 5, "")
    assert (got[4]["n_tokens"], got[4]["n_removed"], got[4]["text_clean"]) == (2, 0, "z q")


def test_mix_allocation_hand_values(spark):
    """Upsampled domain caps sample_rate at 1; subsampled rate == epochs;
    unlisted domain reports weight 0 with its token mass intact."""
    from greenex_py_spark.functions.sampling import mix_allocation

    rows = [
        (1, " ".join(["a"] * 10), "A"),
        (2, " ".join(["b"] * 60), "B"),
        (3, " ".join(["c"] * 40), "B"),
        (4, " ".join(["d"] * 10), "C"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["domain"]: r
        for r in mix_allocation(docs, {"A": 0.5, "B": 0.5}, 100).collect()
    }
    a, b, c = got["A"], got["B"], got["C"]
    assert (a["n_tokens"], a["target_weight"], a["epochs"], a["sample_rate"]) == (10, 0.5, 5.0, 1.0)
    assert (b["n_tokens"], b["epochs"], b["sample_rate"]) == (100, 0.5, 0.5)
    assert (c["n_tokens"], c["target_weight"], c["epochs"], c["sample_rate"]) == (10, 0.0, 0.0, 0.0)


def test_bpe_token_stats_hand_values(spark):
    """Regex pretokenizer: letter/digit/punct runs split, optional
    leading space attaches; whitespace words stay the denominator."""
    from greenex_py_spark.functions.text import bpe_token_stats

    docs = spark.createDataFrame(
        [(1, "ab 12 c.d!"), (2, "word")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in bpe_token_stats(docs).collect()}
    # "ab", " 12", " c", ".", "d", "!" -> 6 regex tokens over 3 words
    assert (got[1]["n_bpe_tokens"], got[1]["n_ws_tokens"]) == (6, 3)
    assert got[1]["fertility"] == 2.0
    assert got[1]["bytes_per_token"] == round(10 / 6, 6)
    assert (got[2]["n_bpe_tokens"], got[2]["n_ws_tokens"]) == (1, 1)


def test_fix_mojibake_hand_values(spark):
    """cp1252-mojibake sequences restore to their original characters
    with an exact repair count; clean text is untouched."""
    from greenex_py_spark.functions.text import fix_mojibake

    rows = [
        (1, "cafÃ© crÃ¨me â€” voilÃ©"),
        (2, "plain ascii stays"),
        (3, "itâ€™s â€œquotedâ€¦ at 20Â°"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in fix_mojibake(docs).collect()}
    assert (got[1]["text_fixed"], got[1]["n_fixed"]) == ("café crème — voilé", 4)
    assert (got[2]["text_fixed"], got[2]["n_fixed"]) == ("plain ascii stays", 0)
    assert (got[3]["text_fixed"], got[3]["n_fixed"]) == ("it’s “quoted… at 20°", 4)


def test_pack_sequences_hand_values(spark):
    """Concat-and-chunk packing map: offsets are an exclusive prefix sum
    of (ws tokens + 1 EOS) in doc_id order; a doc spanning a seq_len
    boundary reports every sequence it touches.  bucket_width=2 forces
    the cross-bucket base path of the two-level prefix sum."""
    from greenex_py_spark.functions.sampling import pack_sequences

    rows = [(0, "a b c"), (1, "d e"), (2, "f g h i j k"), (3, "l")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in pack_sequences(docs, seq_len=4, bucket_width=2).collect()
    }
    # (n_tok, tok_start, seq_first, seq_last, n_seqs)
    want = {
        0: (4, 0, 0, 0, 1),
        1: (3, 4, 1, 1, 1),
        2: (7, 7, 1, 3, 3),
        3: (2, 14, 3, 3, 1),
    }
    for d, w in want.items():
        r = got[d]
        assert (
            r["n_tok"], r["tok_start"], r["seq_first"], r["seq_last"], r["n_seqs"]
        ) == w, d
    # total stream length 16 = exactly 4 sequences of 4
    assert got[3]["tok_start"] + got[3]["n_tok"] == 16


def test_hashed_classifier_score_python_oracle(spark):
    """Classifier inference matches an independent Python recomputation
    of the md5 hashing-trick + LCG weights; keep is the exact sign of
    the integer weight sum and the score is the UNROUNDED quotient."""
    import hashlib as _h

    from greenex_py_spark.functions.text import (
        CLS_A, CLS_BUCKETS, CLS_C, CLS_M, CLS_SCALE, hashed_classifier_score,
    )

    def w(tok):
        b = int(_h.md5(tok.encode()).hexdigest()[:7], 16) % CLS_BUCKETS
        return (b * CLS_A + CLS_C) % CLS_M - CLS_SCALE

    rows = [(1, "the quick brown fox"), (2, "zzz"), (3, "a a a b")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in hashed_classifier_score(docs).collect()}
    for did, text in rows:
        toks = text.split(" ")
        s = sum(w(t) for t in toks)
        r = got[did]
        assert r["n_toks"] == len(toks)
        assert r["quality_score"] == s / (CLS_SCALE * len(toks))
        assert r["keep"] == (s > 0)


def test_url_blocklist_hand_values(spark):
    """Blocklist semantics: exact host, subdomain suffix (but NOT a
    mere substring), path-prefix gating, lowest rule id on overlap,
    -1 for clean."""
    from greenex_py_spark.functions.dedup import url_blocklist

    rules = spark.createDataFrame(
        [(1, "bad.example", None), (2, "sample.net", "/casino"), (3, "bad.example", None)],
        "rule_id long, domain string, path_prefix string",
    )
    urls = spark.createDataFrame(
        [
            (1, "https://bad.example/x"),          # exact host → rule 1 (not 3)
            (2, "https://a.bad.example/x"),        # subdomain → blocked
            (3, "https://notbad.example/x"),       # substring, NOT subdomain → clean
            (4, "https://www.sample.net/casino/9"),# domain + path prefix → rule 2
            (5, "https://www.sample.net/news/9"),  # domain matches, path doesn't → clean
        ],
        "doc_id long, url string",
    )
    got = {r["doc_id"]: r for r in url_blocklist(urls, rules).collect()}
    assert (got[1]["rule_id"], got[1]["blocked"]) == (1, True)
    assert (got[2]["rule_id"], got[2]["blocked"]) == (1, True)
    assert (got[3]["rule_id"], got[3]["blocked"]) == (-1, False)
    assert got[3]["host"] == "notbad.example"
    assert (got[4]["rule_id"], got[4]["blocked"]) == (2, True)
    assert (got[5]["rule_id"], got[5]["blocked"]) == (-1, False)


def test_shard_shuffle_python_oracle(spark):
    """Shard assignment matches an independent md5 recomputation; each
    shard's positions are exactly 1..shard_size (dense, no gaps)."""
    import hashlib as _h

    from greenex_py_spark.functions.sampling import shard_shuffle

    docs = spark.createDataFrame([(i,) for i in range(97)], "doc_id long")
    rows = shard_shuffle(docs, 4).collect()
    assert len(rows) == 97
    by_shard = {}
    for r in rows:
        want_shard = int(_h.md5(str(r["doc_id"]).encode()).hexdigest()[:7], 16) % 4
        assert r["shard"] == want_shard
        by_shard.setdefault(r["shard"], []).append(r)
    for srows in by_shard.values():
        assert sorted(r["pos"] for r in srows) == list(range(1, len(srows) + 1))
        # pos order == md5-digest order within the shard
        in_pos = sorted(srows, key=lambda r: r["pos"])
        digs = [_h.md5(str(r["doc_id"]).encode()).hexdigest() for r in in_pos]
        assert digs == sorted(digs)


def test_zipf_slope_hand_values(spark):
    """Two-phase salted top-k reproduces the naive ranking exactly, and
    the slope matches a NumPy least-squares fit on log-log rank/freq."""
    import numpy as np

    from greenex_py_spark.functions.text import zipf_slope

    # freqs: aa x 8, bb x 4, cc x 2, dd x 1  (plus a second domain)
    t1 = " ".join(["aa"] * 8 + ["bb"] * 4 + ["cc"] * 2 + ["dd"])
    t2 = " ".join(["xx"] * 9 + ["yy"] * 3 + ["zz"])
    docs = spark.createDataFrame(
        [(1, "d1", t1), (2, "d2", t2)], "doc_id long, source string, text string"
    )
    got = {
        r["domain"]: r
        for r in zipf_slope(docs, top_r=3, n_salts=4, domain_col="source").collect()
    }
    for dom, freqs in [("d1", [8, 4, 2]), ("d2", [9, 3, 1])]:
        x = np.log10(np.arange(1, len(freqs) + 1))
        y = np.log10(np.array(freqs, dtype=float))
        want = np.polyfit(x, y, 1)[0]
        assert got[dom]["n_terms"] == 3
        assert abs(got[dom]["zipf_slope"] - want) < 1e-6, dom


def test_hll_distinct_python_oracle(spark):
    """HLL estimate matches an independent Python simulation of the
    md5-bucket/hex-rho/int-register estimator bit-for-bit, and lands
    within the m=256 theoretical error band of the truth."""
    import hashlib as _h
    import math

    from greenex_py_spark.functions.sketches import (
        HLL_M, _HLL_C, _HLL_LZ4, _HLL_SCALE, hll_distinct,
    )

    vals = [f"tok{i % 700}" for i in range(5000)]  # 700 distinct
    df = spark.createDataFrame([(v,) for v in vals], "tok string")
    got = hll_distinct(df, "tok").collect()[0]["est_distinct"]

    regs = {}
    for v in set(vals):
        hx = _h.md5(v.encode()).hexdigest()
        b = int(hx[:2], 16)
        hex13 = hx[2:15]
        z = len(hex13) - len(hex13.lstrip("0"))
        rho = 53 if z == 13 else z * 4 + _HLL_LZ4.get(hex13[z], 0) + 1
        regs[b] = max(regs.get(b, 0), rho)
    nz = len(regs)
    sum_z = (HLL_M - nz) * _HLL_SCALE + sum(1 << (53 - r) for r in regs.values())
    raw = _HLL_C / sum_z
    want = (
        HLL_M * math.log(HLL_M / (HLL_M - nz))
        if raw <= 2.5 * HLL_M and nz < HLL_M
        else raw
    )
    assert got == round(want, 3)
    assert abs(got - 700) / 700 < 3 * 1.04 / math.sqrt(HLL_M)


def test_geoparse_hand_values(spark):
    """All regex mentions extract (including repeats), unresolved names
    drop out, gazetteer attributes ride along."""
    from greenex_py_spark.functions.geoparse import geoparse

    docs = spark.createDataFrame(
        [
            (1, "met at Park_3 then Park_7 again Park_3"),
            (2, "no places here"),
            (3, "ghost Park_99 only"),
        ],
        "doc_id long, text string",
    )
    gaz = spark.createDataFrame(
        [("Park_3", 30.0, 300.0), ("Park_7", 70.0, 700.0)],
        "name string, cx double, cy double",
    )
    rows = geoparse(docs, gaz, "Park_[0-9]+").collect()
    got = sorted((r["doc_id"], r["name"], r["cx"]) for r in rows)
    assert got == [(1, "Park_3", 30.0), (1, "Park_3", 30.0), (1, "Park_7", 70.0)]


def test_repeat_plan_hand_values(spark):
    """floor(epochs) copies everywhere, the extra epoch goes to exactly
    the hash-sampled fractional share, and the realized totals match
    the allocation: sum(n_copies)/n ≈ epochs."""
    from greenex_py_spark.functions.sampling import repeat_plan

    rows = [(i, "up" if i % 2 == 0 else "down", "w " * 9 + "w") for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # 200 docs x 10 tokens per domain; budget 7000: up w=0.5 -> 3500/2000
    # = 1.75 epochs, down w=0.1 -> 700/2000 = 0.35 epochs
    got = repeat_plan(docs, {"up": 0.5, "down": 0.1}, 7000).collect()
    by_dom = {}
    for r in got:
        by_dom.setdefault(r["domain"], []).append(r["n_copies"])
        assert r["epochs"] == (1.75 if r["domain"] == "up" else 0.35)
    assert set(by_dom["up"]) == {1, 2} and set(by_dom["down"]) <= {0, 1}
    # hash-sampled shares track the fractional part (±10% of the group)
    assert abs(sum(by_dom["up"]) / 200 - 1.75) < 0.1
    assert abs(sum(by_dom["down"]) / 200 - 0.35) < 0.1


def test_score_percentiles_matches_naive_window(spark):
    """The histogram two-level rank reproduces percent_rank() exactly,
    including ties broken by id and singleton groups."""
    from pyspark.sql import Window as W

    from greenex_py_spark.functions.sampling import score_percentiles

    rows = [(i, "g" + str(i % 3 if i < 30 else 3), round((i * 7919 % 100) / 100, 3))
            for i in range(31)]  # group g3 is a singleton; scores collide
    df = spark.createDataFrame(rows, "doc_id long, lang string, quality double")
    got = {
        (r["lang"], r["doc_id"]): r["pct_rank"]
        for r in score_percentiles(df, "quality", ["lang"], n_buckets=7).collect()
    }
    naive = df.select(
        "lang", "doc_id",
        F.percent_rank().over(
            W.partitionBy("lang").orderBy("quality", "doc_id")
        ).alias("p"),
    ).collect()
    assert len(got) == 31
    for r in naive:
        assert got[(r["lang"], r["doc_id"])] == r["p"], (r["lang"], r["doc_id"])


def test_asof_join_hand_values(spark):
    """Equal-ts right rows match (>=), pre-first-view rows miss (null),
    duplicate (key, ts) right rows resolve to the largest tiebreak, and
    payload+ts travel atomically from the same right row."""
    from greenex_py_spark.operators.asof import asof_join

    views = spark.createDataFrame(
        [  # user 1: ties at t=20 (ids 7 & 8 -> 8 wins); user 2: none
            (1, 10, 1.0, 5),
            (1, 20, 2.0, 7),
            (1, 20, 3.0, 8),
            (1, 40, None, 9),  # null payload must NOT back-fill from id 8
        ],
        "user long, t long, v double, vid long",
    )
    clicks = spark.createDataFrame(
        [(100, 1, 5), (101, 1, 20), (102, 1, 30), (103, 1, 50), (104, 2, 99)],
        "click_id long, user long, t long",
    )
    got = {
        r["click_id"]: (r["t_asof"], r["v_asof"])
        for r in asof_join(clicks, views, "user", "t", ["v"], "vid").collect()
    }
    assert got == {
        100: (None, None),        # before first view
        101: (20, 3.0),           # equal ts matches; tiebreak max vid
        102: (20, 3.0),
        103: (40, None),          # latest view has null payload: kept
        104: (None, None),        # user with no views at all
    }


def test_morans_i_vs_numpy(spark):
    """Engine Moran's I equals the textbook float formula on a hand
    grid (clustered values -> strongly positive I), and a checkerboard
    gives the known negative autocorrelation."""
    from greenex_py_spark.operators.spatial_stats import morans_i

    def numpy_i(cells):
        xs = np.array(list(cells.values()), dtype=float)
        mu = xs.mean()
        den = ((xs - mu) ** 2).sum()
        num, w = 0.0, 0
        for (gx, gy), v in cells.items():
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                o = cells.get((gx + dx, gy + dy))
                if o is not None:
                    num += (v - mu) * (o - mu)
                    w += 1
        return len(xs), w, (len(xs) / w) * num / den

    # clustered: left half high, right half low
    clustered = {(x, y): (100 if x < 2 else -100) for x in range(4) for y in range(4)}
    # checkerboard on a 3x3 with a gap (tests missing-neighbour cells)
    checker = {(x, y): (50 if (x + y) % 2 == 0 else -50)
               for x in range(3) for y in range(3) if (x, y) != (1, 1)}
    for cells in (clustered, checker):
        df = spark.createDataFrame(
            [(gx, gy, v) for (gx, gy), v in cells.items()], "gx long, gy long, v long"
        )
        got = morans_i(df).collect()[0]
        n, w, want = numpy_i(cells)
        assert (got["n_cells"], got["w_pairs"]) == (n, w)
        assert got["morans_i"] == pytest.approx(want, abs=1e-12)
    assert clustered and numpy_i(clustered)[2] > 0.5
    assert numpy_i(checker)[2] < -0.5


def test_getis_ord_vs_numpy(spark):
    """Engine Gi* equals the textbook float formula (star variant: 3x3
    neighbourhood including self, binary weights) per cell, and the
    high-value block is the one flagged hot."""
    from greenex_py_spark.operators.spatial_stats import getis_ord_gi

    cells = {(x, y): (900 if x <= 1 and y <= 1 else 1)
             for x in range(5) for y in range(5) if (x, y) != (3, 3)}
    xs = np.array(list(cells.values()), dtype=float)
    n = len(xs)
    sv, svv = xs.sum(), (xs * xs).sum()

    def numpy_gi(gx, gy):
        nbrs = [cells[(gx + dx, gy + dy)]
                for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                if (gx + dx, gy + dy) in cells]
        w, li = len(nbrs), float(sum(nbrs))
        num = li - (sv / n) * w
        s = np.sqrt(svv / n - (sv / n) ** 2)
        den = s * np.sqrt((n * w - w * w) / (n - 1))
        return w, (num / den if den else None)

    df = spark.createDataFrame(
        [(gx, gy, v) for (gx, gy), v in cells.items()], "gx long, gy long, v long"
    )
    got = {(r["gx"], r["gy"]): r for r in getis_ord_gi(df).collect()}
    assert set(got) == set(cells)
    for (gx, gy), r in got.items():
        w, want = numpy_gi(gx, gy)
        assert r["w_i"] == w
        assert r["gi_z"] == pytest.approx(want, abs=1e-6)
        assert r["hot"] == (r["gi_z"] is not None and r["gi_z"] >= 1.96)
    assert got[(0, 0)]["hot"] and not got[(4, 4)]["hot"]


def test_kde_density_hand_values(spark):
    """Integer parabolic kernel: lone point spreads w(d)=max(0,5-d^2)
    to occupied cells only; two stacked points sum linearly."""
    from greenex_py_spark.operators.density import kde_density, kde_offsets

    w = {(dx, dy): wt for dx, dy, wt in kde_offsets(2)}
    assert w[(0, 0)] == 5 and w[(1, 0)] == 4 and w[(1, 1)] == 3
    assert w[(2, 0)] == 1 and (2, 2) not in w and (2, 1) not in w
    pts = {(0, 0): 10, (1, 0): 1, (3, 0): 2}
    df = spark.createDataFrame(
        [(gx, gy, c) for (gx, gy), c in pts.items()], "gx long, gy long, cnt long"
    )
    got = {(r["gx"], r["gy"]): r["density"] for r in kde_density(df).collect()}
    want = {
        t: sum(c * w[(t[0] - sx, t[1] - sy)]
               for (sx, sy), c in pts.items() if (t[0] - sx, t[1] - sy) in w)
        for t in pts
    }
    assert got == want
    assert got[(0, 0)] == 10 * 5 + 1 * 4  # (3,0) is out of kernel range


def test_grid_dbscan_roles_and_labels(spark):
    """Two core blobs separated by >1 empty ring stay distinct clusters;
    an adjacent light cell is border (min neighbouring label); an
    isolated light cell is noise."""
    from greenex_py_spark.geo.cells import CELL_BASE
    from greenex_py_spark.operators.density import grid_dbscan

    pts = {
        # blob A: 2x2 of weight 5 -> 3x3 sums >= 20 at all four
        (0, 0): 5, (1, 0): 5, (0, 1): 5, (1, 1): 5,
        # border candidate next to blob A
        (2, 0): 1,
        # blob B: single heavy cell, far away
        (10, 10): 25,
        # noise: light and isolated
        (20, 20): 1,
    }
    df = spark.createDataFrame(
        [(gx, gy, c) for (gx, gy), c in pts.items()], "gx long, gy long, cnt long"
    )
    got = {(r["gx"], r["gy"]): (r["role"], r["cluster"])
           for r in grid_dbscan(df, min_pts=20).collect()}
    lab_a = 0 * CELL_BASE + 0  # min cell key in blob A
    lab_b = 10 * CELL_BASE + 10
    for cell in [(0, 0), (1, 0), (0, 1), (1, 1)]:
        assert got[cell] == ("core", lab_a)
    assert got[(10, 10)] == ("core", lab_b)
    assert got[(2, 0)] == ("border", lab_a)
    assert got[(20, 20)] == ("noise", None)


def test_gini_exposure_vs_numpy(spark):
    """Engine Gini equals the textbook sorted-rank formula, including
    under ties; uniform values give 0."""
    from greenex_py_spark.operators.spatial_stats import gini_exposure

    cases = [
        [1, 1, 1, 1],                    # perfectly equal -> 0
        [0, 0, 0, 10],                   # concentrated
        [3, 1, 4, 1, 5, 9, 2, 6, 5, 3],  # ties present
    ]
    for vals in cases:
        xs = np.sort(np.array(vals, dtype=float))
        n = len(xs)
        want = float(((2 * np.arange(1, n + 1) - n - 1) * xs).sum() / (n * xs.sum()))
        df = spark.createDataFrame(
            [(i, 0, v) for i, v in enumerate(vals)], "gx long, gy long, v long"
        )
        got = gini_exposure(df).collect()[0]
        assert got["n_cells"] == n and got["total"] == sum(vals)
        assert got["gini"] == pytest.approx(want, abs=1e-6)


def test_semivariogram_hand_values(spark):
    """A 1-D ramp v = 10*gx on a line: gamma(h^2) = (10h)^2 / 2 for the
    axis lags, pair counts n-h; half-plane offsets count pairs once."""
    from greenex_py_spark.operators.spatial_stats import (
        semivariogram,
        semivariogram_offsets,
    )

    offs = semivariogram_offsets(3)
    assert (1, 0) in offs and (-1, 0) not in offs and (0, 1) in offs
    assert (0, -1) not in offs and (3, 1) not in offs and (2, 2) in offs
    n = 8
    df = spark.createDataFrame(
        [(i, 0, 10 * i) for i in range(n)], "gx long, gy long, v long"
    )
    got = {r["d2"]: (r["n_pairs"], r["gamma"]) for r in semivariogram(df).collect()}
    # only axis lags (h,0) exist on a line; d2 = 1, 4, 9
    assert set(got) == {1, 4, 9}
    for h in (1, 2, 3):
        np_, gamma = got[h * h]
        assert np_ == n - h
        assert gamma == pytest.approx(sum((10 * h) ** 2 for _ in range(n - h))
                                      / (2 * (n - h)), abs=1e-6)


def test_zorder_key_matches_numpy_morton(spark):
    """The codegen Morton key equals geo/cells.morton_cell bit-for-bit,
    and consecutive-key cells are spatially adjacent (locality)."""
    from greenex_py_spark.engine.layout import zorder_key, zorder_layout_stats
    from greenex_py_spark.geo.cells import CELL_SIZE, ORIGIN_X, ORIGIN_Y, morton_cell

    rng = np.random.RandomState(7)
    gx = rng.randint(0, 1 << 16, 200).astype(np.int64)
    gy = rng.randint(0, 1 << 16, 200).astype(np.int64)
    want = morton_cell(
        ORIGIN_X + gx * CELL_SIZE + 1.0, ORIGIN_Y + gy * CELL_SIZE + 1.0
    )
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(gx, gy)], "gx long, gy long"
    )
    got = (
        df.select(zorder_key(F.col("gx"), F.col("gy")).alias("z"))
        .toPandas()["z"]
        .to_numpy()
    )
    assert (got == want).all()
    # locality: within one shift=4 file (16 consecutive curve keys),
    # cells sit in a small bbox (Morton: 16 keys span <= 8x8)
    grid = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "gx long, gy long"
    )
    stats = zorder_layout_stats(grid, shift=4).collect()
    assert len(stats) == 16  # 256 cells / 16 per file
    for r in stats:
        assert r["n_rows"] == 16 and r["n_cells"] == 16
        assert r["gx_span"] <= 8 and r["gy_span"] <= 8
        assert r["zmax"] - r["zmin"] == 15  # contiguous curve range


def test_bloom_prefilter_semantics(spark):
    """No false negatives ever; with a deliberately tiny filter the
    false-positive set matches an independent python Bloom simulation."""
    import hashlib

    from greenex_py_spark.functions.dedup import bloom_prefilter

    ref_texts = [f"ref doc {i}" for i in range(40)]
    qry = [(i, ref_texts[i]) for i in range(10)] + [
        (100 + i, f"new doc {i}") for i in range(30)
    ]
    m, k = 64, 3  # tiny -> false positives guaranteed

    def positions(t):
        h = hashlib.md5(t.encode()).hexdigest()
        return [int(h[10 * i: 10 * i + 10], 16) % m for i in range(k)]

    bits = {p for t in ref_texts for p in positions(t)}
    ref_df = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(ref_texts)], "doc_id long, text string"
    )
    qry_df = spark.createDataFrame(qry, "doc_id long, text string")
    got = {
        r["doc_id"]: r["probably_seen"]
        for r in bloom_prefilter(ref_df, qry_df, m_bits=m, k=k).collect()
    }
    want = {i: all(p in bits for p in positions(t)) for i, t in qry}
    assert got == want
    assert all(got[i] for i in range(10))  # no false negatives
    fps = [i for i in got if i >= 100 and got[i]]
    assert fps  # tiny filter must produce some false positives


def test_join_counts_hand_values(spark):
    """2x2 checkerboard of A/B: zero like-pairs, all 4 rook joins are
    AB; expectations follow the nonfree-sampling formula."""
    from greenex_py_spark.operators.spatial_stats import join_counts

    cells = [(0, 0, "A"), (1, 1, "A"), (1, 0, "B"), (0, 1, "B")]
    df = spark.createDataFrame(cells, "gx long, gy long, cat string")
    got = {(r["cat_a"], r["cat_b"]): r for r in join_counts(df).collect()}
    # rook joins: (0,0)-(1,0) AB, (0,0)-(0,1) AB, (1,0)-(1,1) BA, (0,1)-(1,1) BA
    assert set(got) == {("A", "B")}
    r = got[("A", "B")]
    assert r["joins"] == 4
    # E[J_AB] = 2*J*nA*nB / (n(n-1)) = 2*4*2*2/12
    assert r["expected"] == pytest.approx(2 * 4 * 2 * 2 / 12, abs=1e-6)
    # stripes: like categories adjacent along y -> AA and BB joins appear
    stripes = [(x, y, "A" if x == 0 else "B") for x in (0, 1) for y in range(3)]
    got2 = {(r["cat_a"], r["cat_b"]): r["joins"]
            for r in join_counts(
                spark.createDataFrame(stripes, "gx long, gy long, cat string")
            ).collect()}
    assert got2 == {("A", "A"): 2, ("B", "B"): 2, ("A", "B"): 3}


def test_adaptive_cells_quadtree(spark):
    """Dense block refines to finest level, sparse region collapses to
    one coarse cell; counts conserved and the partition is disjoint."""
    from greenex_py_spark.operators.adaptive_grid import adaptive_cells

    cells = (
        # dense 2x2 block at origin: each base cell holds 10 docs
        [(x, y, 10) for x in (0, 1) for y in (0, 1)]
        # sparse far block within one level-0 cell (coords 8..15)
        + [(8, 8, 1), (9, 10, 1), (12, 13, 1)]
    )
    df = spark.createDataFrame(cells, "gx long, gy long, cnt long")
    got = {(r["level"], r["gxl"], r["gyl"]): r["n_docs"]
           for r in adaptive_cells(df, threshold=5, levels=4).collect()}
    # origin block: c0 (cell 0,0 at 800m) = 40+3? no — (8,8)+ are in
    # level-0 cell (1,1); origin level-0 cell count = 40 > 5, level1
    # (0,0)=40, level2 (0,0)=40, all > 5 -> each base cell at finest
    for x in (0, 1):
        for y in (0, 1):
            assert got[(3, x, y)] == 10
    # sparse block: level-0 cell (1,1) holds 3 <= 5 -> one coarse cell
    assert got[(0, 1, 1)] == 3
    assert len(got) == 5
    assert sum(got.values()) == 43
    # threshold high enough: everything collapses into level-0 cells
    got2 = {(r["level"], r["gxl"], r["gyl"]): r["n_docs"]
            for r in adaptive_cells(df, threshold=100, levels=4).collect()}
    assert got2 == {(0, 0, 0): 40, (0, 1, 1): 3}


def test_ripleys_k_vs_numpy(spark):
    """Engine pair counts equal the brute-force O(n^2) count at every
    radius (incl. pairs straddling cell boundaries), and K/L follow the
    fixed formula chain."""
    from greenex_py_spark.operators.spatial_stats import ripleys_k

    rng = np.random.RandomState(3)
    xs = rng.uniform(0, 1000, 120)
    ys = rng.uniform(0, 1000, 120)
    pts = [(i, float(xs[i]), float(ys[i])) for i in range(120)]
    df = spark.createDataFrame(pts, "doc_id long, x double, y double")
    radii, area = [100.0, 250.0], 1.0  # km^2
    got = {r["r"]: r for r in
           ripleys_k(df, radii=radii, area=area, cell_size=100.0).collect()}
    d2 = (xs[:, None] - xs[None, :]) ** 2 + (ys[:, None] - ys[None, :]) ** 2
    np.fill_diagonal(d2, np.inf)
    n = len(xs)
    for r in radii:
        pairs = int((d2 <= r * r).sum())  # ordered pairs
        k = area * pairs / (n * (n - 1))
        assert got[r]["n_pairs"] == pairs
        assert got[r]["k_hat"] == pytest.approx(k, abs=1e-6)
        assert got[r]["l_hat"] == pytest.approx(
            np.sqrt(k / np.pi) * 1000.0, abs=1e-5)


def test_local_morans_i_vs_numpy(spark):
    """Engine LISA equals the textbook float formula per cell; high
    block cells are HH, the low far corner LL, and an isolated cell
    gets I=0 with a deterministic quadrant."""
    from greenex_py_spark.operators.spatial_stats import local_morans_i

    cells = {(x, y): (100 if x <= 1 and y <= 1 else -5)
             for x in range(4) for y in range(4)}
    cells[(10, 10)] = 7  # isolated: no rook neighbour
    xs = np.array(list(cells.values()), dtype=float)
    n, mu = len(xs), xs.mean()
    m2 = ((xs - mu) ** 2).sum() / n

    def numpy_lisa(gx, gy):
        lag = sum(cells.get((gx + dx, gy + dy), 0) - mu
                  for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1))
                  if (gx + dx, gy + dy) in cells)
        return (cells[(gx, gy)] - mu) * lag / m2

    df = spark.createDataFrame(
        [(gx, gy, v) for (gx, gy), v in cells.items()], "gx long, gy long, v long"
    )
    got = {(r["gx"], r["gy"]): r for r in local_morans_i(df).collect()}
    assert set(got) == set(cells)
    for (gx, gy), r in got.items():
        assert r["local_i"] == pytest.approx(numpy_lisa(gx, gy), abs=1e-6)
    assert got[(0, 0)]["quadrant"] == "HH"
    assert got[(3, 3)]["quadrant"] == "LL"
    iso = got[(10, 10)]
    # isolated: value 7 < mean (~20.4) and zero lag -> LL with I = 0
    assert iso["w_i"] == 0 and iso["local_i"] == 0.0 and iso["quadrant"] == "LL"


def test_bivariate_morans_i_vs_numpy(spark):
    """Engine cross-Moran equals the float Wartenberg formula; y built
    as the spatially-lagged copy of x gives a strongly positive I."""
    from greenex_py_spark.operators.spatial_stats import bivariate_morans_i

    rng = np.random.RandomState(11)
    grid = [(x, y) for x in range(6) for y in range(6)]
    xv = {g: int(rng.randint(0, 100)) for g in grid}
    yv = {g: xv.get((g[0] + 1, g[1]), 0) + xv.get((g[0] - 1, g[1]), 0) for g in grid}
    xs = np.array([xv[g] for g in grid], dtype=float)
    ys = np.array([yv[g] for g in grid], dtype=float)
    n, mx, my = len(grid), xs.mean(), ys.mean()
    num, w = 0.0, 0
    for gx, gy in grid:
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            if (gx + dx, gy + dy) in xv:
                num += (xv[(gx, gy)] - mx) * (yv[(gx + dx, gy + dy)] - my)
                w += 1
    want = (n / w) * num / np.sqrt(((xs - mx) ** 2).sum() * ((ys - my) ** 2).sum())
    df = spark.createDataFrame(
        [(gx, gy, xv[(gx, gy)], yv[(gx, gy)]) for gx, gy in grid],
        "gx long, gy long, x long, y long",
    )
    got = bivariate_morans_i(df).collect()[0]
    assert (got["n_cells"], got["w_pairs"]) == (n, w)
    assert got["morans_ixy"] == pytest.approx(want, abs=1e-6)
    assert got["morans_ixy"] > 0.1  # lagged copy -> clearly positive


def test_slx_regression_vs_numpy(spark):
    """Engine SLX coefficients equal numpy lstsq on [1, x, Wx] (binary
    rook lag sum), and a y constructed as 2 + 3x + 5Wx is recovered
    exactly."""
    from greenex_py_spark.operators.spatial_stats import slx_regression

    rng = np.random.RandomState(5)
    grid = [(x, y) for x in range(5) for y in range(5)]
    xv = {g: int(rng.randint(1, 20)) for g in grid}

    def lag(g):
        return sum(xv.get((g[0] + dx, g[1] + dy), 0)
                   for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)))

    # exact linear model: recovered coefficients must be exact
    yv = {g: 2 + 3 * xv[g] + 5 * lag(g) for g in grid}
    df = spark.createDataFrame(
        [(gx, gy, yv[(gx, gy)], xv[(gx, gy)]) for gx, gy in grid],
        "gx long, gy long, y long, x long",
    )
    got = slx_regression(df).collect()[0]
    assert got["n_cells"] == 25
    assert (got["b0"], got["b1"], got["b2"]) == (2.0, 3.0, 5.0)
    # noisy y: match numpy least squares
    yv2 = {g: yv[g] + int(rng.randint(-10, 10)) for g in grid}
    df2 = spark.createDataFrame(
        [(gx, gy, yv2[(gx, gy)], xv[(gx, gy)]) for gx, gy in grid],
        "gx long, gy long, y long, x long",
    )
    A = np.array([[1.0, xv[g], lag(g)] for g in grid])
    b = np.array([float(yv2[g]) for g in grid])
    want, *_ = np.linalg.lstsq(A, b, rcond=None)
    got2 = slx_regression(df2).collect()[0]
    for k, w in zip(("b0", "b1", "b2"), want):
        assert got2[k] == pytest.approx(w, abs=1e-6)


def test_areal_interpolate_hand_values(spark):
    """A rect covering 1 full cell + half a cell transfers v1 + v2/2;
    cells outside the rect or with zero overlap contribute nothing."""
    from greenex_py_spark.operators.areal import areal_interpolate

    cells = spark.createDataFrame(
        [(0, 0, 1_000_000), (1, 0, 2_000_000), (2, 0, 5_000_000)],
        "gx long, gy long, v long",
    )
    # rect x: 0..150 (cell0 full, cell1 half), y: 0..100 (full height);
    # second rect exactly on cell 2 boundary -> zero-width overlap of
    # cell 3 is dropped
    targets = spark.createDataFrame(
        [(1, 0.0, 0.0, 150.0, 100.0), (2, 200.0, 0.0, 300.0, 100.0)],
        "gs_id long, minx double, miny double, maxx double, maxy double",
    )
    got = {r["gs_id"]: r for r in areal_interpolate(
        cells, targets, cell_size=100.0, origin_x=0.0, origin_y=0.0,
        out_scale=1e6,
    ).collect()}
    assert got[1]["n_cells"] == 2
    assert got[1]["transferred"] == pytest.approx(1.0 + 2.0 * 0.5, abs=1e-6)
    assert got[2]["n_cells"] == 1
    assert got[2]["transferred"] == pytest.approx(5.0, abs=1e-6)


def test_gearys_c_and_general_g_vs_numpy(spark):
    """Both global statistics equal their textbook float formulas on a
    hand grid; the clustered surface gives C < 1 and G > E[G]."""
    from greenex_py_spark.operators.spatial_stats import gearys_c, general_g

    cells = {(x, y): (90 if x < 2 else 10) for x in range(4) for y in range(4)}
    xs = np.array(list(cells.values()), dtype=float)
    n, mu = len(xs), np.mean(xs)
    num_c, num_g, w = 0.0, 0.0, 0
    for (gx, gy), v in cells.items():
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            o = cells.get((gx + dx, gy + dy))
            if o is not None:
                num_c += (v - o) ** 2
                num_g += v * o
                w += 1
    want_c = (n - 1) * num_c / (2 * w * ((xs - mu) ** 2).sum())
    want_g = num_g / (xs.sum() ** 2 - (xs ** 2).sum())
    df = spark.createDataFrame(
        [(gx, gy, v) for (gx, gy), v in cells.items()], "gx long, gy long, v long"
    )
    gc = gearys_c(df).collect()[0]
    assert (gc["n_cells"], gc["w_pairs"]) == (n, w)
    assert gc["gearys_c"] == pytest.approx(want_c, abs=1e-12)
    assert gc["gearys_c"] < 1  # clustered
    gg = general_g(df).collect()[0]
    assert (gg["n_cells"], gg["w_pairs"]) == (n, w)
    assert gg["general_g"] == pytest.approx(want_g, abs=1e-6)
    assert gg["expected_g"] == pytest.approx(w / (n * (n - 1)), abs=1e-6)
    assert gg["general_g"] > gg["expected_g"]  # high values concentrate


def test_gopher_quality_hand_values(spark):
    """Each rule flips keep at its boundary: word-count floor, mean
    word length band, distinct-stopword floor, alphabetic fraction."""
    from greenex_py_spark.functions.text import gopher_quality

    good = "the of " + "word " * 47 + "word"          # 50 words, 2 stops
    short = "the of " + "word " * 10 + "word"         # 13 words
    longw = "the of " + "x" * 11 + " " + "y " * 46 + "y"  # mean len < 3
    onestop = "the the " + "word " * 47 + "word"      # 1 distinct stop
    numeric = "the of " + "123 " * 47 + "123"         # alpha frac 2/50
    docs = spark.createDataFrame(
        [(1, good), (2, short), (3, longw), (4, onestop), (5, numeric)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in gopher_quality(docs).collect()}
    assert [got[i]["keep"] for i in (1, 2, 3, 4, 5)] == [1, 0, 0, 0, 0]
    assert got[1]["n_words"] == 50 and got[1]["stop_distinct"] == 2
    assert got[5]["alpha_frac"] == 0.04
    assert got[2]["keep"] == 0 and got[2]["n_words"] == 13


def test_domain_cap_matches_naive_window(spark):
    """Salted two-phase per-domain top-k equals the naive window: caps
    a big domain, leaves a small one whole, breaks score ties by id."""
    from pyspark.sql import Window as W

    from greenex_py_spark.functions.sampling import domain_cap

    rows = [(i, "big", float(i % 5)) for i in range(40)] + [
        (100 + i, "small", float(i)) for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, q double")
    got = sorted(
        (r["domain"], r["rank"], r["doc_id"])
        for r in domain_cap(df, 10, "q", n_salts=4).collect()
    )
    naive = sorted(
        (r["source"], r["rk"], r["doc_id"])
        for r in df.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("source").orderBy(F.col("q").desc(), "doc_id")
            ),
        ).filter(F.col("rk") <= 10).collect()
    )
    assert got == naive
    assert sum(1 for d, _, _ in got if d == "big") == 10
    assert sum(1 for d, _, _ in got if d == "small") == 3


def test_two_step_fca_matches_bruteforce(spark):
    """2SFCA against a direct Python mirror of the quantized formula:
    R_j = round(area*1e6 / demand_j), A_i = round(sum R_j / 1e6, 6)."""
    from greenex_py_spark.operators.accessibility import two_step_fca

    pts = [(1, 100.0, 100.0), (2, 150.0, 100.0), (3, 900.0, 900.0)]
    greens = [
        # gs_id, minx, miny, maxx, maxy, area, cx, cy
        (10, 80.0, 80.0, 120.0, 120.0, 1600.0, 100.0, 100.0),
        (11, 840.0, 840.0, 960.0, 960.0, 14400.0, 900.0, 900.0),
        (12, 0.0, 0.0, 10.0, 10.0, 100.0, 5.0, 5.0),  # below min_area
    ]
    points_df = spark.createDataFrame(pts, "id long, x double, y double")
    greens_df = spark.createDataFrame(
        greens,
        "gs_id long, minx double, miny double, maxx double, maxy double,"
        " area double, cx double, cy double",
    )
    radius, min_area = 300.0, 400.0
    got = {
        r["id"]: r["fca_score"]
        for r in two_step_fca(
            points_df, greens_df, radius=radius, min_area=min_area, id_col="id"
        ).collect()
    }
    # brute force
    import math

    cand = [
        (pid, gid, area)
        for pid, px, py in pts
        for gid, _, _, _, _, area, cx, cy in greens
        if area >= min_area and (cx - px) ** 2 + (cy - py) ** 2 <= radius**2
    ]
    dem = {}
    for _, gid, _ in cand:
        dem[gid] = dem.get(gid, 0) + 1
    want = {pid: 0.0 for pid, _, _ in pts}
    acc = {pid: 0 for pid, _, _ in pts}
    for pid, gid, area in cand:
        acc[pid] += int(math.floor(area * 1e6 / dem[gid] + 0.5))
    for pid in acc:
        want[pid] = round(acc[pid] / 1e6, 6)
    assert got == pytest.approx(want, abs=1e-9)
    # point 1+2 share green 10 (demand 2); point 3 gets green 11 alone
    assert dem == {10: 2, 11: 1}
    assert want[1] == pytest.approx(800.0, abs=1e-9)  # area 1600 / demand 2


def test_idw_interpolate_hand_values(spark):
    """Target at a cell center hits the d2==0 weight cap; a second cell
    one cell over contributes with w=round(1e9/1e4)."""
    from greenex_py_spark.operators.areal import idw_interpolate

    cells = spark.createDataFrame(
        [(0, 0, 1_000_000), (1, 0, 2_000_000)], "gx long, gy long, v long"
    )
    targets = spark.createDataFrame(
        [(1, 50.0, 50.0), (2, 5000.0, 5000.0)], "gs_id long, cx double, cy double"
    )
    got = {
        r["gs_id"]: r
        for r in idw_interpolate(
            cells, targets, radius=150.0, cell_size=100.0,
            origin_x=0.0, origin_y=0.0, out_scale=1e6,
        ).collect()
    }
    w0, w1 = 10**12, 10**5  # cap at d2=0; round(1e9/10000)
    num = w0 * 1_000_000 + w1 * 2_000_000
    den = w0 + w1
    assert got[1]["n_samples"] == 2
    assert got[1]["idw_v"] == pytest.approx(round(num / den / 1e6, 6), abs=1e-9)
    assert got[2]["n_samples"] == 0 and got[2]["idw_v"] is None


def test_flesch_hand_values(spark):
    """206.835 - 1.015*(6/2) - 84.6*(8/6) for a 6-word 8-syllable
    2-sentence doc."""
    from greenex_py_spark.functions.text import flesch_reading_ease

    df = spark.createDataFrame(
        [(1, "green space is good. very good!")], "doc_id long, text string"
    )
    row = flesch_reading_ease(df).collect()[0]
    assert (row["n_words"], row["n_sents"], row["n_sylls"]) == (6, 2, 8)
    assert row["flesch"] == pytest.approx(
        round(206.835 - 1.015 * (6 / 2) - 84.6 * (8 / 6), 6), abs=1e-9
    )


def test_bpe_pair_counts_hand(spark):
    """Pair counts weighted by word frequency; single-char words drop."""
    from greenex_py_spark.functions.text import bpe_pair_counts

    df = spark.createDataFrame(
        [(1, "abc abc x"), (2, "abc bc")], "doc_id long, text string"
    )
    got = [(r["pair"], r["cnt"]) for r in bpe_pair_counts(df).collect()]
    # abc x3 -> ab x3, bc x3; bc x1 -> bc x1  => bc:4, ab:3; "x" too short
    assert got == [("bc", 4), ("ab", 3)]


def test_compaction_plan_straddle(spark):
    """A file that straddles the target boundary stays in its starting
    bin (the FileScan-coalescer rule)."""
    from greenex_py_spark.engine.compaction import compaction_plan

    files = spark.createDataFrame(
        [("s", 1, 3000), ("s", 2, 3000), ("s", 3, 1000), ("s", 4, 5000)],
        "source string, file_id long, bytes long",
    )
    got = {
        r["bin_id"]: r
        for r in compaction_plan(files, target_bytes=4000.0).collect()
    }
    assert got[0]["n_files"] == 2 and got[0]["bin_bytes"] == 6000
    assert got[0]["first_file"] == 1 and got[0]["last_file"] == 2
    assert got[1]["n_files"] == 2 and got[1]["bin_bytes"] == 6000
    assert got[1]["first_file"] == 3 and got[1]["last_file"] == 4


def test_snapshot_diff_statuses(spark):
    """added / deleted / updated classified correctly; unchanged rows
    never reach the output; payload text never joins (hash-first)."""
    from greenex_py_spark.engine.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in snapshot_diff(old, new).collect()}
    assert set(got) == {2, 3, 4}
    assert got[2]["status"] == "updated" and got[2]["new_hash"] is not None
    assert got[3]["status"] == "deleted" and got[3]["new_hash"] is None
    assert got[4]["status"] == "added" and got[4]["new_hash"] is not None


def test_temperature_mix_hand(spark):
    """alpha=0.5 over counts (16, 4): weights 2/3 and 1/3, budget 10."""
    from greenex_py_spark.functions.sampling import temperature_mix

    rows = [(i, "en") for i in range(16)] + [(100 + i, "nl") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {
        r["lang"]: r
        for r in temperature_mix(df, alpha=0.5, budget_factor=0.5).collect()
    }
    # tq: round(4*1e6)=4e6, round(2*1e6)=2e6 -> p = 2/3, 1/3; budget = 10
    assert got["en"]["n_docs"] == 16 and got["nl"]["n_docs"] == 4
    assert got["en"]["mix_weight"] == pytest.approx(round(4e6 / 6e6, 6), abs=1e-9)
    assert got["nl"]["mix_weight"] == pytest.approx(round(2e6 / 6e6, 6), abs=1e-9)
    assert got["en"]["sample_rate"] == pytest.approx(
        round(min(1.0, (4e6 / 6e6) * 10 / 16), 6), abs=1e-9
    )
    assert got["nl"]["sample_rate"] == pytest.approx(
        round(min(1.0, (2e6 / 6e6) * 10 / 4), 6), abs=1e-9
    )


def test_dissolve_sharded_matches_single_task(spark):
    """A 60-member overlapping chain forms ONE giant component; the
    x-strip sharded plan must reproduce the single-task scanline union
    bit-for-bit on an integer-coordinate layer (plus a couple of
    singletons to exercise the trivial strips)."""
    import numpy as np

    from greenex_py_spark.operators.dissolve import (
        dissolve_rects,
        dissolve_rects_sharded,
        rect_union_stats,
    )

    rows = []
    # chain: rect i = [7i, 0..ragged] x 13 wide -> overlaps neighbours
    for i in range(60):
        rows.append((i, float(7 * i), float((i * 3) % 5), float(7 * i + 13),
                     float(10 + (i * 7) % 9), f"t{i}"))
    # far-away singletons
    rows.append((100, 10000.0, 0.0, 10010.0, 10.0, "s1"))
    rows.append((101, 20000.0, 5.0, 20013.0, 11.0, "s2"))
    polys = spark.createDataFrame(
        rows, "gs_id long, minx double, miny double, maxx double, maxy double, tag string"
    )
    base = {r["component"]: r for r in dissolve_rects(polys).collect()}
    shard = {r["component"]: r for r in
             dissolve_rects_sharded(polys, n_strips=5).collect()}
    assert set(base) == set(shard)
    for comp in base:
        b, s = base[comp], shard[comp]
        assert (b["n_members"], b["tag"]) == (s["n_members"], s["tag"])
        # bit-exact on integer coordinates: no tolerance
        assert (b["area"], b["cx"], b["cy"]) == (s["area"], s["cx"], s["cy"])
        assert (b["minx"], b["miny"], b["maxx"], b["maxy"]) == (
            s["minx"], s["miny"], s["maxx"], s["maxy"])
    giant = [c for c in shard if shard[c]["n_members"] == 60]
    assert len(giant) == 1
    # independent NumPy mirror of the giant component
    rects = np.array([r[1:5] for r in rows[:60]], dtype=float)
    area, cx, cy = rect_union_stats(rects)
    g = shard[giant[0]]
    assert g["area"] == area and g["cx"] == cx and g["cy"] == cy


def test_grid_category_entropy_hand(spark):
    """Uniform 2-lang cell -> ln 2; single-lang cell -> exactly 0.0
    (not -0.0); richness counts present categories."""
    import math

    from greenex_py_spark.operators.spatial_stats import grid_category_entropy

    cells = spark.createDataFrame(
        [(0, 0, "en", 5), (0, 0, "nl", 5), (1, 0, "en", 7)],
        "gx long, gy long, lang string, lcnt long",
    )
    got = {
        (r["gx"], r["gy"]): r
        for r in grid_category_entropy(cells, ("en", "nl")).collect()
    }
    assert got[(0, 0)]["n_docs"] == 10 and got[(0, 0)]["richness"] == 2
    assert got[(0, 0)]["entropy"] == pytest.approx(round(math.log(2), 6), abs=1e-9)
    assert got[(1, 0)]["n_docs"] == 7 and got[(1, 0)]["richness"] == 1
    assert got[(1, 0)]["entropy"] == 0.0
    assert str(got[(1, 0)]["entropy"]) == "0.0"  # -0.0 would hash-differ


def test_e2sfca_matches_bruteforce(spark):
    """Gaussian-decay E2SFCA against a Python mirror of the quantized
    chain (wq -> dj -> rq -> sum(wq*rq)/1e12)."""
    import math

    from greenex_py_spark.operators.accessibility import two_step_fca_decay

    pts = [(1, 100.0, 100.0), (2, 250.0, 100.0), (3, 5000.0, 5000.0)]
    greens = [
        (10, 80.0, 80.0, 120.0, 120.0, 1600.0, 100.0, 100.0),
        (11, 4990.0, 4990.0, 5050.0, 5050.0, 3600.0, 5020.0, 5020.0),
    ]
    pdf = spark.createDataFrame(pts, "id long, x double, y double")
    gdf = spark.createDataFrame(
        greens,
        "gs_id long, minx double, miny double, maxx double, maxy double,"
        " area double, cx double, cy double",
    )
    radius, sigma = 300.0, 150.0
    got = {
        r["id"]: r["fca_score"]
        for r in two_step_fca_decay(
            pdf, gdf, radius=radius, sigma=sigma, min_area=0.0, id_col="id"
        ).collect()
    }
    pairs = []
    for pid, px, py in pts:
        for gid, _, _, _, _, area, cx, cy in greens:
            d2 = (cx - px) ** 2 + (cy - py) ** 2
            if d2 <= radius**2:
                wq = int(math.floor(math.exp(-d2 / (2 * sigma**2)) * 1e6 + 0.5))
                if wq > 0:
                    pairs.append((pid, gid, area, wq))
    dj = {}
    for _, gid, _, wq in pairs:
        dj[gid] = dj.get(gid, 0) + wq
    acc = {pid: 0 for pid, _, _ in pts}
    for pid, gid, area, wq in pairs:
        rq = int(math.floor(area * 1e12 / dj[gid] + 0.5))
        acc[pid] += wq * rq
    want = {pid: round(acc[pid] / 1e12, 6) for pid in acc}
    assert got == pytest.approx(want, abs=1e-9)
    assert want[3] > 0 and want[1] > want[2] > 0  # decay orders the scores


def test_build_postings_hand(spark):
    """df / tf_total / capped ascending posting list."""
    from greenex_py_spark.functions.retrieval import build_postings

    df = spark.createDataFrame(
        [(3, "a b a"), (1, "a c"), (2, "a")], "doc_id long, text string"
    )
    got = {r["term"]: r for r in build_postings(df, cap=2).collect()}
    assert got["a"]["df"] == 3 and got["a"]["tf_total"] == 4
    assert got["a"]["posting"] == "1,2"  # cap=2, ascending doc order
    assert got["b"]["posting"] == "3" and got["c"]["posting"] == "1"


def test_focal_tile_stats_matches_bruteforce(spark):
    """Halo-exchange 3x3 focal sums over a 2x2-tile raster must equal a
    single-array NumPy brute force (incl. cross-tile windows and edge
    neighbour counts)."""
    import numpy as np

    from greenex_py_spark.geo.grid import GridSpec
    from greenex_py_spark.operators.focal import focal_tile_stats, quantize_half_away

    npx, tile = 8, 4
    grid = GridSpec.square(0.0, 0.0, 1.0, tile, npx)
    rng_vals = (np.arange(npx * npx, dtype=np.float64).reshape(npx, npx)
                * 0.001 - 0.02)  # deterministic, mixed sign
    rows = []
    for ty in range(2):
        for tx in range(2):
            sub = rng_vals[ty * tile:(ty + 1) * tile, tx * tile:(tx + 1) * tile]
            rows.append((tx, ty, tile, tile, sub.ravel().tolist()))
    tiles = spark.createDataFrame(
        rows, "tx long, ty long, w long, h long, px array<double>"
    )
    got = {(r["tx"], r["ty"]): r
           for r in focal_tile_stats(tiles, grid, quant=1e6).collect()}
    q = quantize_half_away(rng_vals, 1e6)
    fsum = np.zeros((npx, npx), dtype=np.int64)
    fcnt = np.zeros((npx, npx), dtype=np.int64)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ys, xs = slice(max(0, dy), npx + min(0, dy)), slice(max(0, dx), npx + min(0, dx))
            yd, xd = slice(max(0, -dy), npx + min(0, -dy)), slice(max(0, -dx), npx + min(0, -dx))
            fsum[yd, xd] += q[ys, xs]
            fcnt[yd, xd] += 1
    for ty in range(2):
        for tx in range(2):
            fs = fsum[ty * tile:(ty + 1) * tile, tx * tile:(tx + 1) * tile]
            fc = fcnt[ty * tile:(ty + 1) * tile, tx * tile:(tx + 1) * tile]
            r = got[(tx, ty)]
            assert r["n_px"] == tile * tile
            assert r["tot_focal"] == int(fs.sum())
            assert r["min_focal"] == int(fs.min())
            assert r["max_focal"] == int(fs.max())
            assert r["tile_mean"] == pytest.approx(
                round(fs.sum() / fc.sum() / 1e6, 6), abs=1e-9)


def test_haversine_nearest_hand(spark):
    """1 degree of longitude at the equator ~= 111.19 km on the IUGG
    sphere; the argmin picks the closer place with name tiebreak."""
    import math

    from greenex_py_spark.geo.geodesic import EARTH_R_M, nearest_geodesic

    pts = spark.createDataFrame(
        [(1, 0.0, 0.0)], "doc_id long, lat double, lon double"
    )
    places = spark.createDataFrame(
        [("near", 0.0, 1.0), ("far", 0.0, 2.0), ("aaa", 0.0, 1.0)],
        "name string, plat double, plon double",
    )
    row = nearest_geodesic(pts, places).collect()[0]
    want = 2 * EARTH_R_M * math.asin(math.sin(math.radians(1.0) / 2))
    assert row["name"] == "aaa"  # tie with "near" broken by name asc
    assert row["dist_m"] == pytest.approx(want, abs=0.001)  # engine rounds 3dp
    assert abs(row["dist_m"] - 111194.93) < 1.0


def test_knox_matches_bruteforce(spark):
    """Knox counts vs an O(n^2) Python brute force on a small synthetic
    event set with known co-located users."""
    from datetime import datetime, timedelta

    from greenex_py_spark.operators.spacetime import knox_statistic

    base = datetime(2024, 1, 1)
    # users 1,2 co-located; user 3 far away
    ev = []
    for i in range(30):
        ev.append((i, 1 + i % 3, base + timedelta(seconds=37 * i)))
    events = spark.createDataFrame(ev, "event_id long, user_id long, ts timestamp")
    ents = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 100.0, 0.0), (3, 99999.0, 0.0)],
        "user_id long, x double, y double",
    )
    delta, tau_us = 500.0, 60_000_000
    row = knox_statistic(events, ents, delta=delta, tau_us=tau_us).collect()[0]
    coords = {1: (0.0, 0.0), 2: (100.0, 0.0), 3: (99999.0, 0.0)}
    n = len(ev)
    ns = nt = x = 0
    for i in range(n):
        for j in range(i + 1, n):
            (ia, ua, ta), (ib, ub, tb) = ev[i], ev[j]
            dsp = (coords[ua][0] - coords[ub][0]) ** 2 + (coords[ua][1] - coords[ub][1]) ** 2
            sp = dsp <= delta**2
            tm = abs((ta - tb).total_seconds()) * 1e6 <= tau_us
            ns += sp
            nt += tm
            x += sp and tm
    assert row["n_events"] == n
    assert row["np_pairs"] == n * (n - 1) // 2
    assert row["ns_pairs"] == ns
    assert row["nt_pairs"] == nt
    assert row["x_pairs"] == x
    assert row["knox_ratio"] == pytest.approx(
        round(x * (n * (n - 1) // 2) / ns / nt, 6), abs=1e-9
    )


def test_benford_digits_hand(spark):
    """Leading digits via the integer CASE chain, incl. exact powers of
    ten (the log10 trap) and sub-1 values; zero/negatives drop."""
    from greenex_py_spark.functions.audit import benford_digits

    vals = [100.00, 10.00, 1.00, 0.10, 193.42, 25.0, 0.0, 2.99, 999.99]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = {r["digit"]: r["n"] for r in benford_digits(df).collect()}
    # cents: 10000, 1000, 100, 10, 19342, 2500, (drop), 299, 99999
    assert got == {1: 5, 2: 2, 9: 1}
    rows = {r["digit"]: r for r in benford_digits(df).collect()}
    assert rows[1]["obs_pct"] == pytest.approx(round(5 / 8 * 100, 6), abs=1e-9)
    import math

    assert rows[1]["exp_pct"] == pytest.approx(
        round(math.log10(2) * 100, 6), abs=1e-9
    )


def test_incremental_rollup_matches_scratch(spark):
    """base(old) + delta(changes) must equal the from-scratch rollup of
    the new snapshot, incl. adds, deletes, updates, and a group move."""
    from greenex_py_spark.engine.cdc import incremental_rollup

    old = spark.createDataFrame(
        [(1, "a", "x", 1), (2, "a", "yy", 2), (3, "b", "zzz", 3), (5, "b", "q", 1)],
        "doc_id long, source string, text string, w long",
    )
    new = spark.createDataFrame(
        [
            (1, "a", "x", 1),        # unchanged
            (2, "a", "yyyy", 4),     # updated (longer)
            (4, "b", "new", 3),      # added
            (5, "a", "q", 1),        # group move b -> a
        ],                            # 3 deleted
        "doc_id long, source string, text string, w long",
    )
    got = {
        r["source"]: (r["n_docs"], r["tot_weight"])
        for r in incremental_rollup(
            old, new, key_col="doc_id", group_col="source",
            weight_col="w", value_col="text",
        ).collect()
    }
    scratch = {
        r["source"]: (r["n_docs"], r["tot_weight"])
        for r in new.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("w").alias("tot_weight"))
        .collect()
    }
    assert got == scratch == {"a": (3, 6), "b": (1, 3)}


def test_auc_mann_whitney_vs_sklearn_free(spark):
    """AUC with heavy ties vs a direct average-rank computation."""
    rows = [
        (1.0, 1), (1.0, 0), (2.0, 1), (2.0, 1), (2.0, 0),
        (3.0, 0), (3.0, 1), (4.0, 1),
    ]
    from greenex_py_spark.functions.audit import auc_mann_whitney

    df = spark.createDataFrame(rows, "score double, label long")
    got = auc_mann_whitney(df, bucket_scale=1.0).collect()[0]
    # average-rank brute force
    scores = sorted(r[0] for r in rows)
    pos = 0
    r_pos = 0.0
    seen = 0
    for s in sorted(set(scores)):
        c = scores.count(s)
        avg_rank = seen + (c + 1) / 2
        p = sum(1 for sc, lb in rows if sc == s and lb == 1)
        r_pos += p * avg_rank
        pos += p
        seen += c
    neg = len(rows) - pos
    auc = (r_pos - pos * (pos + 1) / 2) / (pos * neg)
    assert (got["n_pos"], got["n_neg"]) == (pos, neg)
    assert got["auc"] == pytest.approx(round(auc, 6), abs=1e-9)


def test_normalize_text_hand(spark):
    from greenex_py_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [(1, "  Café  crème   naïve "), (2, "zürich señor")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["norm"] for r in normalize_text(df).collect()}
    assert got[1] == "Cafe creme naive"  # case preserved, accents folded
    assert got[2] == "zurich senor"


def test_host_link_graph_hand(spark):
    """Resolution rules: absolute, protocol-relative, root-relative,
    and the fragment/mailto/javascript/empty drops."""
    from greenex_py_spark.functions.links import host_link_graph

    html = (
        '<html><A HREF="https://B.Example/x">t</A>'
        '<a href="//cdn.example/l">c</a>'
        '<a class="z" href="/self/page.html">s</a>'
        '<a href="#top">f</a><a href="mailto:a@b.c">m</a>'
        '<a href="javascript:void(0)">j</a><a href="">e</a>'
        '<a href="rel.html">r</a></html>'
    )
    df = spark.createDataFrame(
        [("https://src.example/p/1", bytearray(html, "utf-8"))],
        "url string, html binary",
    )
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_link_graph(df).collect()
    }
    assert got == {
        ("src.example", "b.example"): 1,
        ("src.example", "cdn.example"): 1,
        ("src.example", "src.example"): 2,  # root-relative + page-relative
    }


def test_nearest_edge_projection_and_clamp(spark):
    """Mid-segment projection, endpoint clamp, tiebreak, and the exact
    full-scan fallback for a point outside the snap bound."""
    from greenex_py_spark.operators.snap import nearest_edge

    segs = spark.createDataFrame(
        [
            (1, 0.0, 0.0, 100.0, 0.0),   # horizontal
            (2, 0.0, 0.0, 0.0, 100.0),   # vertical
        ],
        "edge_id long, x1 double, y1 double, x2 double, y2 double",
    )
    pts = spark.createDataFrame(
        [
            (1, 50.0, 3.0),     # mid-segment on edge 1: t=0.5, d=3
            (2, 103.0, 4.0),    # beyond the end: clamp t=1, d=5 (3-4-5)
            (3, 2.0, 2.0),      # equidistant from both edges -> edge 1
            (4, 5000.0, 0.0),   # far outside the bound -> fallback, t=1
        ],
        "doc_id long, x double, y double",
    )
    got = {
        r["doc_id"]: (r["edge_id"], r["snap_dist"], r["t_frac"])
        for r in nearest_edge(pts, segs, max_snap_dist=50.0).collect()
    }
    assert got[1] == (1, 3.0, 0.5)
    assert got[2] == (1, 5.0, 1.0)
    assert got[3] == (1, 2.0, 0.02)
    assert got[4] == (1, 4900.0, 1.0)
    assert len(got) == 4


def test_chunk_windows_hand(spark):
    """Window/stride arithmetic incl. the shorter natural tail and a
    doc shorter than one window."""
    from greenex_py_spark.functions.text import chunk_windows

    df = spark.createDataFrame(
        [(1, " ".join(str(i) for i in range(10))), (2, "a b")],
        "doc_id long, text string",
    )
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["n_tok"], r["chunk"])
        for r in chunk_windows(df, win=4, stride=3).collect()
    )
    assert got == [
        (1, 0, 4, "0 1 2 3"),
        (1, 1, 4, "3 4 5 6"),
        (1, 2, 4, "6 7 8 9"),
        (1, 3, 1, "9"),
        (2, 0, 2, "a b"),
    ]


def test_oov_rate_threshold(spark):
    """Tokens at/below the count threshold classify correctly."""
    from greenex_py_spark.functions.text import oov_rate

    # "a" appears 3x (in-vocab at min_count=3), "b" 2x (OOV), "z" 1x
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a b z")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tok"], r["n_oov"], r["oov_rate"])
        for r in oov_rate(df, min_count=3).collect()
    }
    assert got[1] == (3, 1, round(1 / 3, 6))
    assert got[2] == (3, 2, round(2 / 3, 6))


def test_street_length_per_cell_clip(spark):
    """Diagonal clip across a cell boundary, full containment, and the
    closed-interval both-cells boundary credit."""
    from greenex_py_spark.geo.cells import CELL_BASE
    from greenex_py_spark.operators.streets import street_length_per_cell

    segs = spark.createDataFrame(
        [
            (1, 2.0, 2.0, 8.0, 8.0),      # inside cell (0,0), len 6*sqrt2
            (2, 5.0, 5.0, 15.0, 5.0),     # horizontal across x=10: 5 + 5
            (3, 0.0, 10.0, 10.0, 10.0),   # ON the y=10 boundary: both rows
        ],
        "edge_id long, x1 double, y1 double, x2 double, y2 double",
    )
    rows = street_length_per_cell(segs, size=10.0, ox=0.0, oy=0.0).collect()
    got = {r["cell"]: (r["n_segments"], r["street_len"]) for r in rows}
    s2 = round(6 * 2**0.5, 6)
    # boundary-lying segment 3 goes to the UPPER row only (floor cover)
    assert got[0] == (2, round(s2 + 5.0, 6))              # cell (0,0)
    assert got[1] == (1, 5.0)                             # cell (1,0) crossing credit
    assert got[CELL_BASE] == (1, 10.0)                    # cell (0,1) boundary owner
    assert len(got) == 3


def test_parse_warc_headers_hand(spark):
    from greenex_py_spark.functions.warc import parse_warc_headers
    import hashlib

    rec = (
        "WARC/1.0\r\nwarc-type: request\r\n"
        "WARC-Target-URI: https://x.example/\r\n"
        "Content-Type: text/plain\r\ncontent-LENGTH: 11\r\n\r\n"
        "hello\r\nbody"
    )
    df = spark.createDataFrame(
        [(1, bytearray(rec, "utf-8"))], "doc_id long, record binary"
    )
    r = parse_warc_headers(df).collect()[0]
    assert r["warc_type"] == "request"
    assert r["target_uri"] == "https://x.example/"
    assert r["content_type"] == "text/plain"
    assert r["content_length"] == 11
    # body = everything after the FIRST blank line, incl. its own CRLF
    assert r["body_md5"] == hashlib.md5(b"hello\r\nbody").hexdigest()


def test_od_flows_hand(spark):
    """Consecutive-pair folding, per-entity isolation, tie-break by the
    secondary order column, stationary moves kept."""
    from greenex_py_spark.operators.spacetime import od_flows
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, t0, 1, 10), (1, t0, 2, 20), (1, t0, 3, 20),  # same-ts: by event_id
        (2, t0, 4, 30), (2, dt.datetime(2026, 1, 2), 5, 10),
        (3, t0, 6, 99),                                   # single event: no move
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, cell long"
    )
    got = {
        (r["o_cell"], r["d_cell"]): r["n_moves"]
        for r in od_flows(df).collect()
    }
    assert got == {(10, 20): 1, (20, 20): 1, (30, 10): 1}


def test_mann_kendall_hand(spark):
    """S, tie-adjusted variance, and z against a brute-force MK."""
    from greenex_py_spark.operators.spatial_stats import mann_kendall_trend
    import math

    # key 1: strictly increasing; key 2: flat (all ties -> S=0, z=0);
    # key 3: occupied bins only at 0 and 4 -> zero-fill drives ties
    rows = (
        [(1, b, b + 1) for b in range(5)]
        + [(2, b, 7) for b in range(5)]
        + [(3, 0, 3), (3, 4, 9)]
    )
    df = spark.createDataFrame(rows, "k long, bin long, v long")
    got = {
        r["k"]: (r["s_stat"], r["var_num"], r["mk_z"], r["trend"])
        for r in mann_kendall_trend(
            df, key_cols=("k",), n_bins=5, hot_z=1.96
        ).collect()
    }
    base = 5 * 4 * 15  # n(n-1)(2n+5), n=5
    # key 1: all 10 pairs increasing
    assert got[1][:2] == (10, base)
    assert got[1][2] == round(9 / math.sqrt(base / 18.0), 6)
    assert got[1][3] == "increasing"
    # key 2: all tied -> S=0, var_num = base - 5*4*15 = 0, z=0
    assert got[2] == (0, 0, 0.0, "none")
    # key 3: values [3,0,0,0,9]: S = pairs... brute force:
    vals = [3, 0, 0, 0, 9]
    s = sum(
        (v2 > v1) - (v2 < v1)
        for i, v1 in enumerate(vals)
        for v2 in vals[i + 1:]
    )
    ties = 3 * 2 * 11  # three zeros tied
    var_num = base - ties
    z = round((s - 1) / math.sqrt(var_num / 18.0), 6) if s > 0 else 0.0
    assert got[3] == (s, var_num, z, "none" if abs(z) < 1.96 else "increasing")


def test_street_orientation_bins(spark):
    """Axis bearings land in bins 0 and 9 exactly; 45° in bin 4;
    a 170°-ish bearing (dx<0 after flip normalization) in bin 17;
    length weighting checks out."""
    from greenex_py_spark.operators.streets import street_orientation_hist

    segs = spark.createDataFrame(
        [
            (0.0, 0.0, 10.0, 0.0),     # θ=0   -> bin 0, len 10
            (5.0, 5.0, 5.0, 25.0),     # θ=90  -> bin 9, len 20
            (0.0, 0.0, 10.0, 10.0),    # θ=45  -> bin 4
            (10.0, 0.0, 0.0, 2.0),     # θ≈169 -> bin 16 (after flip dy>0)
            (1.0, 1.0, 1.0, 1.0),      # zero-length: dropped
        ],
        "x1 double, y1 double, x2 double, y2 double",
    )
    got = {
        r["bin"]: (r["n_segments"], r["len_share"])
        for r in street_orientation_hist(segs).collect()
    }
    assert set(got) == {0, 9, 4, 16}
    total = 10 + 20 + 10 * 2**0.5 + (104) ** 0.5
    assert got[0] == (1, round(10 / total, 6))
    assert got[9][0] == 1 and abs(got[9][1] - 20 / total) < 2e-6
    assert got[4][0] == 1


def test_huff_shares_hand(spark):
    """Share arithmetic, radius truncation, d² clamp, argmax tiebreak."""
    from greenex_py_spark.operators.accessibility import huff_shares

    fac = spark.createDataFrame(
        [
            (1, 100.0, 0.0, 400.0),   # d=100 -> w = 400/1e4
            (2, 200.0, 0.0, 400.0),   # d=200 -> w = 400/4e4 (quarter)
            (3, 9000.0, 0.0, 1e6),    # outside 3km radius: excluded
            (4, 0.0, 0.0, 50.0),      # d=0 -> clamp d2=1 -> w = 50
        ],
        "gs_id long, cx double, cy double, area double",
    )
    pts = spark.createDataFrame([(7, 0.0, 0.0)], "doc_id long, x double, y double")
    r = huff_shares(pts, fac, radius=3000.0).collect()[0]
    w1, w2, w4 = 400 / 1e4, 400 / 4e4, 50.0
    assert (r["doc_id"], r["gs_id"], r["n_considered"]) == (7, 4, 3)
    assert r["p_top"] == round(w4 / (w1 + w2 + w4), 6)


def test_spatial_moments_hand(spark):
    """Population moments against NumPy on a small cluster."""
    import numpy as np
    from greenex_py_spark.operators.spatial_stats import spatial_moments

    xs = [0.0, 10.0, 20.0, 30.5]
    ys = [5.0, 5.0, 11.25, 7.5]
    rows = [("a", x, y) for x, y in zip(xs, ys)] + [("b", 100.0, 200.0)]
    df = spark.createDataFrame(rows, "source string, x double, y double")
    got = {r["source"]: r for r in spatial_moments(df).collect()}
    def r6(v):  # HALF_UP like both engines (banker's round() differs at .5)
        from decimal import Decimal, ROUND_HALF_UP
        return float(Decimal(repr(float(v))).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    a = got["a"]
    assert a["n"] == 4
    assert a["mean_x"] == r6(np.mean(xs))
    assert a["var_x"] == r6(np.var(xs))
    assert a["var_y"] == r6(np.var(ys))
    assert a["cov_xy"] == r6(np.mean(np.multiply(xs, ys)) - np.mean(xs) * np.mean(ys))
    b = got["b"]
    assert (b["n"], b["var_x"], b["var_y"], b["cov_xy"]) == (1, 0.0, 0.0, 0.0)


def test_knn_label_accuracy_hand(spark):
    """Majority vote with tiebreak and self-exclusion on a toy set."""
    from greenex_py_spark.functions.similarity import knn_label_accuracy

    # 2-D embeddings: cluster A near (1,0) label 1, cluster B near (0,1)
    # label 2; query 100 sits in cluster A -> predicted 1 (correct);
    # query 101 sits between but nearer B -> predicted 2 vs true 1 (wrong)
    rows = [
        (100, [1.0, 0.0], 1),
        (101, [0.6, 0.8], 1),
        (1, [0.9, 0.1], 1),
        (2, [0.95, 0.05], 1),
        (3, [0.1, 0.9], 2),
        (4, [0.05, 0.95], 2),
        (5, [0.15, 0.85], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {
        r["label"]: (r["n_queries"], r["n_correct"], r["accuracy"])
        for r in knn_label_accuracy(
            df.filter(F.col("vec_id") >= 100), df, k=3
        ).collect()
    }
    # query 100 top-3: vecs 2,1 (label 1) + 101 (label 1) -> pred 1 ✓
    # query 101 top-3: 3,5 (label 2), 100 (label 1) -> pred 2 ✗
    assert got == {1: (2, 1, 0.5)}


def test_salient_terms_hand(spark):
    """Group-unique terms out-score shared ones; min_tf prunes."""
    import math
    from greenex_py_spark.functions.text import salient_terms

    rows = (
        [(f"g1", "alpha alpha alpha common common common")] * 1
        + [("g2", "beta beta beta common common common")]
        + [("g2", "rare")]  # tf=1 < min_tf: pruned
    )
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r["source"], r["term"]): (r["tf"], r["df_groups"], r["score"], r["rank"])
        for r in salient_terms(df, top_k=2, min_tf=3).collect()
    }
    ln2 = round(3 * math.log(2.0), 6)
    assert got[("g1", "alpha")] == (3, 1, ln2, 1)
    assert got[("g2", "beta")] == (3, 1, ln2, 1)
    assert got[("g1", "common")] == (3, 2, 0.0, 2)
    assert ("g2", "rare") not in got


def test_fuzzy_match_hand(spark):
    """Best-match selection, distance cap, and block isolation."""
    from greenex_py_spark.functions.dedup import fuzzy_match

    canon = spark.createDataFrame(
        [
            (1, "kitten small", "b1"),
            (2, "sitten small", "b1"),   # 1 edit from kitten
            (3, "kitten small", "b2"),   # right text, WRONG block
            (4, "zzzzzz zzzzz", "b1"),   # far: filtered by cap
        ],
        "c_id long, c_text string, block string",
    )
    qs = spark.createDataFrame(
        [(10, "mitten small", "b1"), (11, "qqqqq qqqqq", "b1")],
        "q_id long, q_text string, block string",
    )
    got = {
        r["q_id"]: (r["c_id"], r["dist"])
        for r in fuzzy_match(qs, canon, max_dist=2).collect()
    }
    # mitten->kitten and mitten->sitten are both dist 1: tiebreak c_id
    assert got == {10: (1, 1)}  # q 11 has no match within 2


def test_kmv_intersection_exact_below_k(spark):
    """With |A∪B| < k the union sketch holds every hash, so the
    intersection/union/Jaccard estimates are EXACT set arithmetic:
    A = 0..59, B = 40..139 → |A∪B| = 140, |A∩B| = 20, ρ = 1/7."""
    from greenex_py_spark.functions.sketches import kmv_intersection

    rows = [("A", v) for v in range(60)] + [("B", v) for v in range(40, 140)]
    rows += rows[:30]  # duplicates must not matter (distinct hashes)
    df = spark.createDataFrame(rows, "src string, val long")
    out = kmv_intersection(df, "val", "src", k=256).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["src_a"], r["src_b"]) == ("A", "B")
    assert r["k_used"] == 140 and r["k_inter"] == 20
    assert r["est_union"] == 140.0 and r["est_inter"] == 20.0
    assert r["jaccard_q"] == round(20 / 140 * 1_000_000)


def test_hll_rolling_merge_is_exact(spark):
    """Register max-merge must equal sketching the unioned values
    directly — EXACT equality, not approximate: the merged window
    register table is identical to the one built from the raw union,
    so the estimates match to the last bit.  Also pins ragged-start
    semantics (day 1's window is just day 1)."""
    import datetime as dt

    from greenex_py_spark.functions.sketches import (
        hll_distinct,
        hll_rolling_distinct,
    )

    t0 = dt.datetime(2026, 3, 1)
    rows = []
    eid = 0
    by_day = {}
    for day in range(5):
        users = [day * 37 + i * 11 for i in range(40 + 13 * day)]
        by_day[day] = users
        for u in users:
            rows.append((eid, t0 + dt.timedelta(days=day, minutes=eid % 60), u))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    got = {
        r["day"]: r
        for r in hll_rolling_distinct(ev, "user_id", "ts", window_days=3).collect()
    }
    assert len(got) == 5
    for day in range(5):
        lo = max(0, day - 2)
        union = sorted({u for d2 in range(lo, day + 1) for u in by_day[d2]})
        ref = spark.createDataFrame([(u,) for u in union], "user_id long")
        want = hll_distinct(ref, "user_id").collect()[0]["est_distinct"]
        key = (t0 + dt.timedelta(days=day)).strftime("%Y-%m-%d")
        assert got[key]["est_win"] == want, (day, got[key]["est_win"], want)
    # day 0's window == its own single day
    k0 = t0.strftime("%Y-%m-%d")
    assert got[k0]["est_win"] == got[k0]["est_1d"]


def test_hyperball_tracks_exact_harmonic(spark, sf_dir):
    """HyperBall's approximate harmonic must rank-correlate strongly
    with the exact min-plus closure on the same host graph (m=16 HLL
    has ~26% relative error per ball, but errors are shared across a
    node's rounds, so the ORDERING is much tighter), and every ball
    estimate must be positive and bounded by ~|V|·(1+3σ)."""
    from greenex_py_spark.data import synth  # noqa: F401 (fixture parity)
    from greenex_py_spark.driver_queries import QUERIES

    exact = (
        QUERIES["q_harmonic"](spark, sf_dir).toPandas().set_index("node")
    )
    approx = (
        QUERIES["q_hyperball"](spark, sf_dir).toPandas().set_index("node")
    )
    assert set(exact.index) == set(approx.index)
    a = exact.loc[sorted(exact.index)]
    b = approx.loc[sorted(exact.index)]
    n_nodes = len(a)
    assert (b["ball_q"] > 0).all()
    assert (b["ball_q"] <= n_nodes * 1_000_000 * 1.8).all()
    # Spearman rank correlation, computed by hand (no scipy in image)
    ra = a["harmonic"].rank(method="average")
    rb = b["harm_q"].rank(method="average")
    rho = ra.corr(rb)
    assert rho > 0.7, rho


def test_als_fits_planted_rank2_matrix(spark):
    """ALS on ratings generated EXACTLY from a rank-2 model must
    reconstruct them to within a few cents RMSE (ridge λ adds ~1%
    shrinkage bias, quantization ±½ cent)."""
    from greenex_py_spark.functions.clustering import als_factorize

    rows = []
    for u in range(8):
        au = (1.0 + u / 10.0, 1.0 - u / 20.0)
        for i in range(5):
            bi = (2.0 + i / 10.0, 1.0 + i / 7.0)
            r = au[0] * bi[0] + au[1] * bi[1]
            rows.append((u, i, int(round(r * 100))))
    df = spark.createDataFrame(rows, "user_id long, item long, rq long")
    out = als_factorize(df, iters=3).toPandas()
    assert len(out) == 5 and out["n_total"].iloc[0] == 40
    rmse_cents = (out["sse_cents2"].iloc[0] / out["n_total"].iloc[0]) ** 0.5
    assert rmse_cents < 15.0, rmse_cents
    # factors actually moved off the deterministic init grid
    assert (out["x1_q"] != 1_000_000 + (out["item"] % 7) * 100_000).any()


def test_fellegi_sunter_recovers_planted_mu(spark):
    """EM on a synthetic comparison-vector table with KNOWN generative
    m/u over K=3 fields (K≥3 is the FS identifiability floor: 2^K−1
    cells must cover 2K+1 free parameters — with 2 binary fields the
    model is over-parameterized and the fit drifts, which is exactly
    why the gate query compares three fields).  200 match pairs agree
    with m≈(0.8, 0.71, 0.89), 800 non-matches with u≈(0.05, 0.10,
    0.17) — deterministic coprime index stripes, no RNG.  The fitted
    nano-grid parameters must land near the planted values."""
    from greenex_py_spark.functions.dedup import fellegi_sunter_em

    rows = []
    # full CRT periods (315 = lcm(5,7,9), 840 = 14·lcm(20,10,6)) make
    # the three stripes EXACTLY independent within each class — any
    # cross-field correlation violates FS's conditional-independence
    # assumption and biases the fit (an earlier i%20==0 ⊂ i%10==0
    # design under-estimated u2 by 3×)
    for i in range(315):  # matches
        rows.append((1 if i % 5 < 4 else 0, 1 if i % 7 < 5 else 0,
                     1 if i % 9 < 8 else 0))
    for i in range(840):  # non-matches
        rows.append((1 if i % 20 == 0 else 0, 1 if i % 10 == 3 else 0,
                     1 if i % 6 == 1 else 0))
    pairs = spark.createDataFrame(rows, "g1 long, g2 long, g3 long")
    got = {
        r["k"]: r
        for r in fellegi_sunter_em(pairs, ["g1", "g2", "g3"], iters=8).collect()
    }
    # unsupervised EM on 1000 deterministic pairs: ±0.12 is the honest
    # tolerance (soft posteriors shave the extreme stripes)
    assert abs(got[1]["m"] - 0.80) < 0.12
    assert abs(got[2]["m"] - 0.71) < 0.12
    assert abs(got[3]["m"] - 0.89) < 0.12
    assert abs(got[1]["u"] - 0.05) < 0.05
    assert abs(got[2]["u"] - 0.10) < 0.06
    assert abs(got[3]["u"] - 0.167) < 0.08
    assert abs(got[1]["p_q"] / 1e9 - 315 / 1155) < 0.08
    assert got[1]["n_pairs"] == 1155
    # agreement weight is positive (m > u) for every field
    assert all(got[k]["w_agree_q"] > 0 for k in (1, 2, 3))


def test_slope_tile_stats_cross_tile(spark):
    """Horn nx/ny against NumPy brute force on a tiny 2-tile raster,
    incl. a gradient that lives exactly on the tile seam."""
    import numpy as np
    from greenex_py_spark.geo.grid import GridSpec
    from greenex_py_spark.operators.focal import slope_tile_stats

    # 8x4 raster, two 4x4 tiles; z = x^2 + 3y (curvature across the seam)
    w_all, h_all = 8, 4
    z = np.array(
        [[float(x * x + 3 * y) for x in range(w_all)] for y in range(h_all)]
    )
    grid = GridSpec(origin_x=0.0, origin_y=0.0, res=1.0, tile_px=4,
                    npx_x=w_all, npx_y=h_all)
    rows = []
    for tx in range(2):
        sub = z[:, tx * 4:(tx + 1) * 4]
        rows.append((tx, 0, 4, 4, [float(v) for v in sub.ravel()]))
    tiles = spark.createDataFrame(
        rows, "tx long, ty long, w long, h long, px array<double>"
    )
    got = {
        (r["tx"], r["ty"]): r
        for r in slope_tile_stats(tiles, grid, quant=1e6,
                                  steep_rise_run=2.0).collect()
    }
    # brute force over interior pixels
    q = np.round(z * 1e6).astype(np.int64)
    exp = {}
    for tx in range(2):
        rr2s = []
        for y in range(1, h_all - 1):
            for x in range(max(1, tx * 4), min(w_all - 1, (tx + 1) * 4)):
                if not (tx * 4 <= x < (tx + 1) * 4):
                    continue
                nx = int(q[y-1, x+1] + 2*q[y, x+1] + q[y+1, x+1]
                         - q[y-1, x-1] - 2*q[y, x-1] - q[y+1, x-1])
                ny = int(q[y+1, x-1] + 2*q[y+1, x] + q[y+1, x+1]
                         - q[y-1, x-1] - 2*q[y-1, x] - q[y-1, x+1])
                rr2s.append(nx * nx + ny * ny)
        thr = int(round(2.0 * 8 * 1.0 * 1e6))
        exp[tx] = (len(rr2s), sum(1 for v in rr2s if v > thr * thr),
                   max(rr2s))
    for tx in range(2):
        r = got[(tx, 0)]
        assert (r["n_interior"], r["n_steep"], r["max_rr2"]) == exp[tx], tx
        assert r["max_rise_run"] == round((exp[tx][2] ** 0.5) / 8e6, 6)


def test_gini_by_group_hand(spark):
    """Per-group Gini vs the O(n²) mean-absolute-difference definition,
    incl. ties and a perfectly equal group (gini 0)."""
    from greenex_py_spark.functions.audit import gini_by_group

    rows = [("a", v) for v in (1, 1, 2, 6)] + [("b", 5), ("b", 5)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = {r["source"]: (r["n"], r["total"], r["gini"])
           for r in gini_by_group(df).collect()}

    def brute(vals):
        n, s = len(vals), sum(vals)
        mad = sum(abs(a - b) for a in vals for b in vals)
        return round(mad / (2 * n * s), 6)

    assert got["a"] == (4, 10, brute([1, 1, 2, 6]))
    assert got["b"] == (2, 10, 0.0)


def test_robots_filter_semantics(spark):
    """Longest match wins; allow beats disallow on exact ties; empty
    catch-all defaults to allow."""
    from greenex_py_spark.functions.dedup import robots_filter

    rules = spark.createDataFrame(
        [(0, "", True), (1, "/a/", False), (2, "/a/b/", True),
         (3, "/t/", False), (4, "/t/", True)],
        "rule_id long, prefix string, allow boolean",
    )
    urls = spark.createDataFrame(
        [(1, "/a/x"), (2, "/a/b/y"), (3, "/t/z"), (4, "/free")],
        "doc_id long, path string",
    )
    got = {r["doc_id"]: (r["allowed"], r["rule_id"])
           for r in robots_filter(urls, rules).collect()}
    assert got == {1: (False, 1), 2: (True, 2), 3: (True, 4), 4: (True, 0)}


def test_apportion_budget_exact(spark):
    """Quotas sum to the budget; leftovers go to largest remainders."""
    from greenex_py_spark.functions.sampling import apportion_budget

    df = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 3)], "source string, n_docs long"
    )
    got = {r["source"]: r["quota"]
           for r in apportion_budget(df, budget=10).collect()}
    # shares 50/11≈4.54, 30/11≈2.727(×2): bases 4,2,2 leftover 2 ->
    # remainders: a:6, b:8, c:8 -> b,c get +1
    assert got == {"a": 4, "b": 3, "c": 3}
    assert sum(got.values()) == 10


def test_quadrat_csr_hand(spark):
    """χ²/VMR against the definition on a 2x2 grid, incl. empty
    quadrats and border clamping."""
    from greenex_py_spark.operators.spatial_stats import quadrat_csr

    # 2x2 quadrats over [0,10)²: counts (2,1,0,1) after one clamped pt
    pts = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 3.0), (7.0, 1.0), (12.0, 12.0)],
        "x double, y double",
    )
    r = quadrat_csr(pts, origin=(0.0, 0.0), extent=10.0, k_side=2).collect()[0]
    counts = [2, 1, 0, 1]
    n, k = 4, 4
    e = n / k
    chi2 = sum((o - e) ** 2 / e for o in counts)
    mean = n / k
    var = sum((o - mean) ** 2 for o in counts) / k
    assert r["n_points"] == 4 and r["n_quadrats"] == 4
    assert r["chi2"] == round(chi2, 6)
    assert r["vmr"] == round(var / mean, 6)


def test_ngram_novelty_hand(spark):
    """Novel-vs-seen gram classification and the short-doc guard."""
    from greenex_py_spark.functions.text import ngram_novelty

    old = spark.createDataFrame(
        [("s", "a b c d")], "source string, text string"
    )
    new = spark.createDataFrame(
        [
            ("s", "a b c d"),     # grams: "a b c" (seen), "b c d" (seen)
            ("s", "x y z w"),     # "x y z", "y z w": novel
            ("s", "p q"),         # shorter than n: contributes nothing
        ],
        "source string, text string",
    )
    r = ngram_novelty(old, new, n=3).collect()[0]
    assert (r["n_grams"], r["n_novel"]) == (4, 2)
    assert r["novelty_rate"] == 0.5


def test_funnel_counts_hand(spark):
    """Ordering and deadline semantics: click before view doesn't
    count; purchase past the 24h window doesn't count."""
    import datetime as dt
    from greenex_py_spark.operators.funnel import funnel_counts

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    h = dt.timedelta(hours=1)
    rows = [
        # u1: full ordered funnel inside windows
        (1, "view", t0), (1, "click", t0 + 2 * h), (1, "purchase", t0 + 5 * h),
        # u2: click BEFORE view -> stops at s1
        (2, "click", t0), (2, "view", t0 + h),
        # u3: purchase 30h after click -> misses the 24h deadline
        (3, "view", t0), (3, "click", t0 + h), (3, "purchase", t0 + 31 * h),
        # u4: never views
        (4, "purchase", t0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    r = funnel_counts(df).collect()[0]
    assert (r["n_users"], r["s1"], r["s2"], r["s3"]) == (4, 3, 2, 1)
    assert r["conv_12"] == round(2 / 3, 6)
    assert r["conv_13"] == round(1 / 3, 6)


def test_retention_cohorts_hand(spark):
    import datetime as dt
    from greenex_py_spark.operators.funnel import retention_cohorts

    d0 = dt.datetime(2024, 1, 1, 10, 0)
    day = dt.timedelta(days=1)
    rows = [
        (1, d0), (1, d0 + day), (1, d0 + day),        # dup same day
        (2, d0), (2, d0 + 2 * day),
        (3, d0 + day),                                 # later cohort
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["cohort_day"], r["day_offset"]): (r["n_active"], r["cohort_n"], r["retention"])
        for r in retention_cohorts(df).collect()
    }
    assert got[(0, 0)] == (2, 2, 1.0)
    assert got[(0, 1)] == (1, 2, 0.5)
    assert got[(0, 2)] == (1, 2, 0.5)
    assert got[(1, 0)] == (1, 1, 1.0)


def test_balanced_spatial_sample_positions(spark):
    """Two-level global rank == a direct sort rank; every-k selection."""
    from greenex_py_spark.functions.sampling import balanced_spatial_sample
    from greenex_py_spark.engine.layout import with_hilbert_key

    rows = [(i, i % 13, (i * 7) % 13) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, gx long, gy long")
    got = {r["doc_id"]: (r["hkey"], r["pos"]) for r in
           balanced_spatial_sample(df, every=7, order=4).collect()}
    keyed = sorted(
        ((r["hkey"], r["doc_id"]) for r in
         with_hilbert_key(df, order=4).collect()),
    )
    expect = {
        did: (hk, pos) for pos, (hk, did) in enumerate(keyed) if pos % 7 == 0
    }
    assert got == expect


def test_cross_k_brute_force(spark):
    """Cross-K pair counts vs O(n·m) brute force, incl. a pair at
    exactly r (<= boundary) and one beyond max_r."""
    from greenex_py_spark.operators.spatial_stats import cross_k

    pa = [(0.0, 0.0), (50.0, 0.0), (500.0, 500.0)]
    pb = [(100.0, 0.0), (0.0, 30.0), (900.0, 900.0)]
    a = spark.createDataFrame(pa, "x double, y double")
    b = spark.createDataFrame(pb, "x double, y double")
    got = {r["r"]: (r["n_pairs"], r["k_hat"])
           for r in cross_k(a, b, radii=[100.0, 200.0], area=1.0,
                            cell_size=100.0).collect()}
    for r in (100.0, 200.0):
        n = sum(
            1 for ax, ay in pa for bx, by in pb
            if (ax - bx) ** 2 + (ay - by) ** 2 <= r * r
        )
        assert got[r][0] == n, r
        assert got[r][1] == round(1.0 * n / (3 * 3), 6)


def test_pyramid_tile_stats_conservation(spark):
    """Pooling conserves tot_q across levels; min/max coarsen; values
    match NumPy block sums."""
    import numpy as np
    from greenex_py_spark.geo.grid import GridSpec
    from greenex_py_spark.operators.focal import pyramid_tile_stats

    h = w = 8
    z = np.arange(h * w, dtype=np.float64).reshape(h, w) / 7.0
    grid = GridSpec(origin_x=0.0, origin_y=0.0, res=1.0, tile_px=8,
                    npx_x=w, npx_y=h)
    tiles = spark.createDataFrame(
        [(0, 0, w, h, [float(v) for v in z.ravel()])],
        "tx long, ty long, w long, h long, px array<double>",
    )
    got = {r["level"]: r for r in
           pyramid_tile_stats(tiles, grid, levels=2, quant=1e6).collect()}
    q = np.round(z * 1e6)  # ties-away irrelevant here (no .5 cases)
    l1 = q.reshape(4, 2, 4, 2).sum(axis=(1, 3))
    l2 = l1.reshape(2, 2, 2, 2).sum(axis=(1, 3))
    assert got[1]["tot_q"] == got[2]["tot_q"] == int(q.sum())
    assert (got[1]["n_px"], got[2]["n_px"]) == (16, 4)
    assert got[1]["min_pool"] == int(l1.min())
    assert got[2]["max_pool"] == int(l2.max())
    assert got[2]["level_mean"] == round(float(l2.sum()) / (4 * 16 * 1e6), 6)


def _tri_brute(edges):
    import itertools
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({v for e in und for v in e})
    adj = {v: set() for v in nodes}
    for a, b in und:
        adj[a].add(b); adj[b].add(a)
    tris = sum(
        1 for a, b, c in itertools.combinations(nodes, 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    wedges = sum(len(adj[v]) * (len(adj[v]) - 1) // 2 for v in nodes)
    return tris, wedges


def test_graph_stats_brute_force(spark):
    """Reciprocity, assortativity, and triangles vs brute force on a
    small graph with a hub (degree-orientation edge case included)."""
    from greenex_py_spark.functions.graph import (
        degree_assortativity, graph_reciprocity, triangle_stats,
    )

    edges = [
        (1, 2), (2, 1),          # reciprocal pair
        (1, 3), (2, 3),          # triangle 1-2-3
        (3, 4), (4, 5), (3, 5),  # triangle 3-4-5
        (3, 3),                  # self-loop: dropped
        (5, 6),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = graph_reciprocity(df).collect()[0]
    # distinct non-loop directed edges: 8; reciprocal: (1,2),(2,1)
    assert (r["n_edges"], r["n_reciprocal"]) == (8, 2)
    assert r["reciprocity"] == 0.25

    t = triangle_stats(df).collect()[0]
    tris, wedges = _tri_brute(edges)
    assert (t["n_triangles"], t["n_wedges"]) == (tris, wedges)
    assert t["global_clustering"] == round(3 * tris / wedges, 6)

    a = degree_assortativity(df).collect()[0]
    # brute-force Pearson over both orientations
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    deg = {}
    for x, y in und:
        deg[x] = deg.get(x, 0) + 1
        deg[y] = deg.get(y, 0) + 1
    xs, ys = [], []
    for x, y in und:
        xs += [deg[x], deg[y]]
        ys += [deg[y], deg[x]]
    m = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(u * v for u, v in zip(xs, ys))
    num = m * sxy - sx * sy
    den = ((m * sxx - sx * sx) ** 0.5) * ((m * syy - sy * sy) ** 0.5)
    assert a["n_edges"] == len(und)
    assert a["assortativity"] == round(num / den, 6)


def test_source_vocab_jaccard_hand(spark):
    from greenex_py_spark.functions.text import source_vocab_jaccard

    df = spark.createDataFrame(
        [("a", "x y z"), ("a", "x q"), ("b", "x y w"), ("c", "unique only")],
        "source string, text string",
    )
    got = {(r["src_a"], r["src_b"]): (r["n_a"], r["n_b"], r["n_common"], r["jaccard"])
           for r in source_vocab_jaccard(df).collect()}
    # a vocab {x,y,z,q} (4), b {x,y,w} (3): common {x,y}=2, union 5
    assert got[("a", "b")] == (4, 3, 2, 0.4)
    # disjoint pairs produce NO row (inner join) — documented shape
    assert ("a", "c") not in got and ("b", "c") not in got


def test_markov_transition_entropy_hand(spark):
    """Deterministic successor -> entropy 0; uniform pair -> ln 2."""
    import datetime as dt
    import math
    from greenex_py_spark.operators.funnel import markov_transition_entropy

    t0 = dt.datetime(2026, 1, 1)
    sec = dt.timedelta(seconds=1)
    # user 1: a->b, b->a, a->b  (a always ->b: H(a)=0; b->a only: H(b)=0)
    # user 2: a->b, b->c        (now a: {b,b}=0; b: {a,c} uniform -> ln2)
    seq1 = ["a", "b", "a", "b"]
    seq2 = ["a", "b", "c"]
    rows = [(1, s, t0 + i * sec, i) for i, s in enumerate(seq1)]
    rows += [(2, s, t0 + i * sec, 100 + i) for i, s in enumerate(seq2)]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    got = {r["state"]: (r["n_trans"], r["entropy"])
           for r in markov_transition_entropy(
               df, states=("a", "b", "c")).collect()}
    assert got["a"] == (3, 0.0)            # a -> b every time
    # b is the source of 2 transitions: b->a (user 1), b->c (user 2)
    assert got["b"] == (2, round(math.log(2.0), 6))


def test_bitext_candidates_hand(spark):
    from greenex_py_spark.functions.links import bitext_candidates

    pages = spark.createDataFrame(
        [
            (1, "https://a.example/en/x.html"),
            (2, "https://a.example/fr/x.html"),     # pairs with 1
            (3, "https://a.example/de/x.html"),     # wrong lang
            (4, "https://b.example/fr/x.html"),     # wrong host
            (5, "https://a.example/en/y.html"),     # no fr twin
            (6, "https://a.example/noslash"),       # no lang segment
            (7, "https://a.example/en/x.html"),     # dup -> min id wins
        ],
        "doc_id long, url string",
    )
    got = [(r["host"], r["path"], r["id_a"], r["id_b"])
           for r in bitext_candidates(pages).collect()]
    assert got == [("a.example", "x.html", 1, 2)]


def test_colocation_quotient_hand(spark):
    """CLQ against hand-computed NN categories, incl. a far point that
    exercises the fallback tier and the self-pair N_b' correction."""
    from greenex_py_spark.operators.spatial_stats import colocation_quotient

    rows = [
        (1, "en", 0.0, 0.0),
        (2, "en", 10.0, 0.0),      # NN of 1 and 2: each other (en)
        (3, "fr", 12.0, 0.0),      # NN: 2 (en)
        (4, "fr", 5000.0, 0.0),    # isolated -> fallback; NN: 3 (fr)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, x double, y double")
    got = {
        (r["cat_a"], r["cat_b"]): (r["n_a"], r["n_b"], r["c_ab"], r["clq"])
        for r in colocation_quotient(df, nn_bound=50.0).collect()
    }
    # NN map: 1->2(en), 2->3(fr, d=2 beats 1 at d=10), 3->2(en), 4->3(fr)
    n = 4
    assert got[("en", "en")] == (2, 2, 1, round(1 * (n - 1) / (2 * 1), 6))
    assert got[("en", "fr")] == (2, 2, 1, round(1 * (n - 1) / (2 * 2), 6))
    assert got[("fr", "en")] == (2, 2, 1, round(1 * (n - 1) / (2 * 2), 6))
    assert got[("fr", "fr")] == (2, 2, 1, round(1 * (n - 1) / (2 * 1), 6))


def test_label_propagation_hand(spark):
    """Seed clamping, majority with (count, label) tiebreak, and
    two-round spread to a node with no labelled neighbour in round 1."""
    from greenex_py_spark.functions.graph import label_propagation

    # path: 1(seed A) - 2 - 3 - 4(seed B); 5 isolated-ish via 4
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    seeds = spark.createDataFrame(
        [(1, "A"), (4, "B")], "node long, label string"
    )
    got = {r["node"]: r["label"]
           for r in label_propagation(edges, seeds, rounds=2).collect()}
    # round 1: 2<-A, 3<-B, 5<-B; round 2: 2 votes {A(1), B(3's B)} -> tie
    # A/B -> 'A' (label asc); 3 votes {2's A, 4's B} -> tie -> 'A'
    assert got[1] == "A" and got[4] == "B"   # clamped
    assert got[5] == "B"
    assert got[2] == "A" and got[3] == "A"


def test_theil_decomposition_hand(spark):
    """Theil-T and decomposition identity vs a NumPy brute force."""
    import numpy as np
    from greenex_py_spark.functions.audit import theil_decomposition

    rows = [("a", 10), ("a", 10), ("a", 40), ("b", 100), ("b", 20), ("b", 20)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    r = theil_decomposition(df).collect()[0]
    x = np.array([v for _, v in rows], dtype=float)
    mu = x.mean()
    t_tot = float(np.sum((x / x.sum()) * np.log(x / mu)))
    groups = {"a": np.array([10.0, 10, 40]), "b": np.array([100.0, 20, 20])}
    X = x.sum()
    t_w = sum(
        float(np.sum((g / X) * np.log(g / g.mean())))
        for g in groups.values()
    )
    t_b = sum(
        float(g.sum() / X * np.log(g.mean() / mu)) for g in groups.values()
    )
    assert r["n_docs"] == 6
    assert abs(r["t_total"] - t_tot) < 2e-6
    assert abs(r["t_within"] - t_w) < 2e-6
    assert abs(r["t_between"] - t_b) < 2e-6
    assert abs(r["t_total"] - (r["t_within"] + r["t_between"])) < 1e-5


def test_hits_quantized_vs_python(spark):
    """Engine HITS == an independent pure-Python replica of the same
    quantized L1 algorithm on a small digraph."""
    from greenex_py_spark.functions.graph import hits

    edges = [(1, 2), (1, 3), (2, 3), (4, 3), (3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["hub"], r["authority"])
           for r in hits(df, n_iters=2).collect()}

    nodes = sorted({v for e in edges for v in e})
    PICO = 1_000_000_000_000.0
    h = {v: round(1.0 / len(nodes), 9) for v in nodes}
    a = {}
    for _ in range(2):
        ar = {v: 0 for v in nodes}
        for s, d in edges:
            ar[d] += int(round(h[s] * PICO))
        sa = sum(ar.values())
        a = {v: round(ar[v] / sa, 9) for v in nodes}
        hr = {v: 0 for v in nodes}
        for s, d in edges:
            hr[s] += int(round(a[d] * PICO))
        sh = sum(hr.values())
        h = {v: round(hr[v] / sh, 9) for v in nodes}
    for v in nodes:
        assert got[v] == (h[v], a[v]), v


def test_sample_points_linspace_vs_kernel(spark):
    """Codegen road-sampling twin == geo.kernels.interpolate_linspace
    (+ the operator's centroid branch) on lattice and oblique segments."""
    import numpy as np

    from greenex_py_spark.geo import kernels
    from greenex_py_spark.operators.streets import sample_points_linspace

    rng = np.random.RandomState(7)
    segs = [(0, 0.0, 0.0, 200.0, 0.0)]  # lattice edge: exact 0.25 steps
    for i in range(1, 40):
        x1, y1 = rng.uniform(0, 1000, 2)
        dx, dy = rng.uniform(-120, 120, 2)
        segs.append((i, float(x1), float(y1), float(x1 + dx), float(y1 + dy)))
    df = spark.createDataFrame(
        segs, "edge_id long, x1 double, y1 double, x2 double, y2 double"
    )
    got = {
        (r["edge_id"], r["sp_id"]): (r["x"], r["y"])
        for r in sample_points_linspace(df, 50.0).collect()
    }
    n_rows = 0
    for eid, x1, y1, x2, y2 in segs:
        L = float(np.hypot(x2 - x1, y2 - y1))
        if L < 50.0:
            want = np.array([[(x1 + x2) / 2, (y1 + y2) / 2]])
        else:
            want = kernels.interpolate_linspace(
                np.array([x1, x2]), np.array([y1, y2]), 50.0
            )
        for k, (wx, wy) in enumerate(want):
            gx, gy = got[(eid, k)]
            assert abs(gx - round(wx, 6)) < 2e-6, (eid, k)
            assert abs(gy - round(wy, 6)) < 2e-6, (eid, k)
            n_rows += 1
    assert n_rows == len(got)
    # lattice edge: exact quarter points, endpoints included
    assert [got[(0, k)] for k in range(5)] == [
        (0.0, 0.0), (50.0, 0.0), (100.0, 0.0), (150.0, 0.0), (200.0, 0.0)
    ]


def _two_tile_fixture(spark, z):
    """Two 4x4 tiles over an 8x4 quadratic surface (seam curvature)."""
    import numpy as np
    from greenex_py_spark.geo.grid import GridSpec

    h_all, w_all = z.shape
    grid = GridSpec(origin_x=0.0, origin_y=0.0, res=1.0, tile_px=4,
                    npx_x=w_all, npx_y=h_all)
    rows = []
    for tx in range(w_all // 4):
        sub = z[:, tx * 4:(tx + 1) * 4]
        rows.append((tx, 0, 4, 4, [float(v) for v in sub.ravel()]))
    tiles = spark.createDataFrame(
        rows, "tx long, ty long, w long, h long, px array<double>"
    )
    return tiles, grid


def test_hillshade_tile_stats_cross_tile(spark):
    """Tiled hillshade == global-array brute force (same constant
    chain), including seam pixels; grey levels bounded to 0..255."""
    import numpy as np
    from greenex_py_spark.operators.focal import (
        hillshade_constants, hillshade_tile_stats,
    )

    z = np.array(
        [[float(x * x - 2 * x * y + 3 * y) for x in range(8)]
         for y in range(4)]
    )
    tiles, grid = _two_tile_fixture(spark, z)
    got = {
        (r["tx"], r["ty"]): r
        for r in hillshade_tile_stats(tiles, grid, quant=1e3).collect()
    }

    q = np.round(z * 1e3).astype(np.int64)
    c0, lx, ly, d2 = hillshade_constants(1.0, 1e3)
    exp = {}
    for tx in range(2):
        hs_all = []
        for y in range(1, 3):
            for x in range(max(1, tx * 4), min(7, (tx + 1) * 4)):
                nx = float(q[y-1, x+1] + 2*q[y, x+1] + q[y+1, x+1]
                           - q[y-1, x-1] - 2*q[y, x-1] - q[y+1, x-1])
                ny = float(q[y+1, x-1] + 2*q[y+1, x] + q[y+1, x+1]
                           - q[y-1, x-1] - 2*q[y-1, x] - q[y-1, x+1])
                num = (c0 - lx * nx) - ly * ny
                den = ((d2 + nx * nx) + ny * ny) ** 0.5
                hs_all.append(int(np.floor(max(255.0 * (num / den), 0.0)
                                           + 0.5)))
        exp[tx] = hs_all
    for tx in range(2):
        r = got[(tx, 0)]
        assert r["n_interior"] == len(exp[tx])
        assert r["sum_hs"] == sum(exp[tx]), tx
        assert r["min_hs"] == min(exp[tx]) and r["max_hs"] == max(exp[tx])
        assert 0 <= r["min_hs"] <= r["max_hs"] <= 255
        assert r["mean_hs"] == round(sum(exp[tx]) / len(exp[tx]), 6)


def test_flow_direction_counts_hand(spark):
    """D8 codes vs a hand brute force on a surface engineered with a
    flat plateau (code 0), cardinal/diagonal competition, and an exact
    two-cardinal tie (code-ascending break)."""
    import numpy as np
    from greenex_py_spark.operators.focal import _D8, flow_direction_counts

    # cone + plateau: pixels at x<=2,y<=2 all share height 0 (flat+tie
    # region), rest fall away with distinct slopes
    z = np.zeros((4, 8))
    for y in range(4):
        for x in range(8):
            z[y, x] = -max(0, x - 2) * 2.0 - max(0, y - 2) * 1.0 \
                - (0.25 if (x + y) % 3 == 0 and x > 2 else 0.0)
    tiles, grid = _two_tile_fixture(spark, z)
    got = {}
    for r in flow_direction_counts(tiles, grid, quant=1e3).collect():
        got[(r["tx"], r["ty"], r["code"])] = r["n_px"]

    q = np.round(z * 1e3).astype(np.int64)
    exp = {}
    for y in range(1, 3):
        for x in range(1, 7):
            best_key, best_code = -1, 0
            for code, dx, dy, diag in _D8:
                dz = int(q[y, x] - q[y + dy, x + dx])
                if dz <= 0:
                    continue
                key = dz * dz * (1 if diag else 2)
                if key > best_key:
                    best_key, best_code = key, code
            tx = x // 4
            exp[(tx, 0, best_code)] = exp.get((tx, 0, best_code), 0) + 1
    assert got == exp
    assert sum(v for (tx, ty, c), v in exp.items() if c == 0) > 0


def test_octant_rules_vs_atan2():
    """The shared octant rule table == floor(atan2/45°) binning for
    every integer vector in a dense grid (all sign/boundary cases:
    v==u, v==-u, axes) — the exactness contract both engines render."""
    import math

    import numpy as np
    from greenex_py_spark.operators.focal import _octant_of

    span = np.arange(-4, 5, dtype=np.int64)
    u, v = np.meshgrid(span, span)
    u, v = u.ravel(), v.ravel()
    got = _octant_of(u, v)
    for ui, vi, gi in zip(u.tolist(), v.tolist(), got.tolist()):
        if ui == 0 and vi == 0:
            assert gi == -1
        else:
            ang = math.degrees(math.atan2(vi, ui)) % 360.0
            assert gi == int(ang // 45.0), (ui, vi, ang)
    assert -2 not in set(got.tolist())


def test_aspect_octant_counts_cross_tile(spark):
    """Tiled aspect histogram == global-array brute force, including
    seam pixels whose Horn window spans both tiles."""
    import numpy as np
    from greenex_py_spark.operators.focal import (
        _octant_of, aspect_octant_counts,
    )

    z = np.array(
        [[float(x * y - 3 * x + 2 * y) for x in range(8)] for y in range(4)]
    )
    tiles, grid = _two_tile_fixture(spark, z)
    got = {}
    for r in aspect_octant_counts(tiles, grid, quant=1e3).collect():
        got[(r["tx"], r["ty"], r["octant"])] = r["n_px"]

    q = np.round(z * 1e3).astype(np.int64)
    exp = {}
    for y in range(1, 3):
        for x in range(1, 7):
            nx = int(q[y-1, x+1] + 2*q[y, x+1] + q[y+1, x+1]
                     - q[y-1, x-1] - 2*q[y, x-1] - q[y+1, x-1])
            ny = int(q[y+1, x-1] + 2*q[y+1, x] + q[y+1, x+1]
                     - q[y-1, x-1] - 2*q[y-1, x] - q[y-1, x+1])
            o = int(_octant_of(np.array([-nx]), np.array([-ny]))[0])
            k = (x // 4, 0, o)
            exp[k] = exp.get(k, 0) + 1
    assert got == exp


def test_ruggedness_tile_stats_hand(spark):
    """TPI/TRI/roughness per tile vs brute force; a constant column
    forces flat pixels (tpi8 == 0 is NOT a ridge)."""
    import numpy as np
    from greenex_py_spark.operators.focal import ruggedness_tile_stats

    z = np.array(
        [[float(abs(x - 3) * 2 + (y if x > 4 else 0)) for x in range(8)]
         for y in range(4)]
    )
    tiles, grid = _two_tile_fixture(spark, z)
    got = {
        (r["tx"], r["ty"]): r
        for r in ruggedness_tile_stats(tiles, grid, quant=1e3).collect()
    }

    q = np.round(z * 1e3).astype(np.int64)
    stats = {}
    for y in range(1, 3):
        for x in range(1, 7):
            win = q[y-1:y+2, x-1:x+2]
            tpi8 = int(8 * q[y, x] - (win.sum() - q[y, x]))
            tri = int(np.abs(q[y, x] - win).sum())
            rough = int(win.max() - win.min())
            s = stats.setdefault(x // 4, {"n": 0, "ridge": 0, "sum_tri": 0,
                                          "max_tri": 0, "max_rough": 0})
            s["n"] += 1
            s["ridge"] += int(tpi8 > 0)
            s["sum_tri"] += tri
            s["max_tri"] = max(s["max_tri"], tri)
            s["max_rough"] = max(s["max_rough"], rough)
    for tx, s in stats.items():
        r = got[(tx, 0)]
        assert r["n_interior"] == s["n"]
        assert r["n_ridge"] == s["ridge"]
        assert r["sum_tri"] == s["sum_tri"]
        assert r["max_tri"] == s["max_tri"]
        assert r["max_rough"] == s["max_rough"]
        assert r["mean_tri"] == round(s["sum_tri"] / s["n"] / 1e3, 6)


def test_anchor_text_profile_hand(spark):
    """(href, text) zip alignment, drop rules, count/argmax with the
    text-ascending tiebreak."""
    from greenex_py_spark.functions.links import anchor_text_profile

    html = (
        '<html><A HREF="https://B.Example/x">Beta</A>'
        '<a href="https://b.example/y">Alpha</a>'
        '<a href="https://b.example/z">Alpha</a>'
        '<a href="//cdn.example/l">cdn lib</a>'
        '<a class="z" href="/self/page.html">home</a>'
        '<a href="#top">skipme</a><a href="mailto:a@b.c">m</a>'
        '<a href="">e</a></html>'
    )
    df = spark.createDataFrame(
        [("https://src.example/p/1", bytearray(html, "utf-8"))],
        "url string, html binary",
    )
    got = {r["dst_host"]: r for r in anchor_text_profile(df).collect()}
    assert set(got) == {"b.example", "cdn.example", "src.example"}
    b = got["b.example"]
    assert (b["n_anchors"], b["n_texts"]) == (3, 2)
    assert (b["top_anchor"], b["top_n"]) == ("Alpha", 2)
    assert got["cdn.example"]["top_anchor"] == "cdn lib"
    assert got["src.example"]["n_anchors"] == 1


def _gray_counts(m):
    """Whole-array Gray quad counts over the zero-padded mask."""
    import numpy as np

    p = np.zeros((m.shape[0] + 2, m.shape[1] + 2), dtype=np.int64)
    p[1:-1, 1:-1] = m
    a, b = p[:-1, :-1], p[:-1, 1:]
    c, d = p[1:, :-1], p[1:, 1:]
    s = a + b + c + d
    cd = int((((a == 1) & (d == 1) & (s == 2)).sum())
             + (((b == 1) & (c == 1) & (s == 2)).sum()))
    return int((s == 1).sum()), int((s == 3).sum()), cd


def test_euler_tile_stats_ring_topology(spark):
    """A seam-spanning ring with a hole plus an isolated pixel:
    Euler = components - holes = 2 - 1 = 1; per-tile partials sum to
    the whole-array Gray counts."""
    import numpy as np
    from greenex_py_spark.operators.focal import euler_tile_stats

    mask = np.zeros((4, 8), dtype=np.int64)
    mask[1, 1:6] = 1
    mask[3, 1:6] = 1
    mask[2, 1] = mask[2, 5] = 1     # ring rows 1-3, hole at (2, 2..4)
    mask[2, 7] = 1                  # isolated pixel in tile 1
    z = np.where(mask == 1, 1.0, -1.0)
    tiles, grid = _two_tile_fixture(spark, z)
    rows = euler_tile_stats(tiles, grid, quant=1e3).collect()
    assert sum(r["n_green"] for r in rows) == int(mask.sum())
    assert sum(r["euler_term"] for r in rows) % 4 == 0
    assert sum(r["euler_term"] for r in rows) // 4 == 1
    c1, c3, cd = _gray_counts(mask)
    assert (sum(r["c1"] for r in rows), sum(r["c3"] for r in rows),
            sum(r["cd"] for r in rows)) == (c1, c3, cd)


def test_euler_tile_stats_random_masks(spark):
    """Tiled quad-count partials == whole-array counts for random
    masks (window-ownership partition is exact, seams included)."""
    import numpy as np
    from greenex_py_spark.operators.focal import euler_tile_stats

    rng = np.random.RandomState(7)
    for trial in range(3):
        mask = (rng.rand(4, 8) < 0.5).astype(np.int64)
        z = np.where(mask == 1, 1.0, -1.0)
        tiles, grid = _two_tile_fixture(spark, z)
        rows = euler_tile_stats(tiles, grid, quant=1e3).collect()
        c1, c3, cd = _gray_counts(mask)
        assert (sum(r["c1"] for r in rows), sum(r["c3"] for r in rows),
                sum(r["cd"] for r in rows)) == (c1, c3, cd), trial
        assert sum(r["n_green"] for r in rows) == int(mask.sum())


def test_edge_density_tile_stats(spark):
    """Adjacency-pair partials == whole-array perimeter count for the
    ring fixture and random masks (pair ownership exact at seams and
    the padded border)."""
    import numpy as np
    from greenex_py_spark.operators.focal import edge_density_tile_stats

    def brute(mask):
        p = np.zeros((mask.shape[0] + 2, mask.shape[1] + 2), dtype=np.int64)
        p[1:-1, 1:-1] = mask
        hor = int((p[:, :-1] != p[:, 1:])[1:-1, :].sum())
        ver = int((p[:-1, :] != p[1:, :])[:, 1:-1].sum())
        return hor, ver

    rng = np.random.RandomState(11)
    masks = [(rng.rand(4, 8) < 0.5).astype(np.int64) for _ in range(2)]
    ring = np.zeros((4, 8), dtype=np.int64)
    ring[1:4, 1:6] = 1
    ring[2, 2:5] = 0
    masks.append(ring)
    for i, mask in enumerate(masks):
        z = np.where(mask == 1, 1.0, -1.0)
        tiles, grid = _two_tile_fixture(spark, z)
        rows = edge_density_tile_stats(tiles, grid, quant=1e3).collect()
        hor, ver = brute(mask)
        assert (sum(r["h_edges"] for r in rows),
                sum(r["v_edges"] for r in rows)) == (hor, ver), i
        for r in rows:
            assert r["n_edges"] == r["h_edges"] + r["v_edges"]
            assert r["perim_m"] == round(float(r["n_edges"]) * grid.res, 6)


def test_interval_join_boundaries(spark):
    """End-exclusive semantics, bucket-spanning intervals, and the
    one-bucket-per-event no-dup guarantee."""
    import datetime as dt

    from greenex_py_spark.operators.interval import interval_join

    T0 = dt.datetime(2024, 1, 1)

    def t(h, m=0, s=0, us=0):
        return T0 + dt.timedelta(hours=h, minutes=m, seconds=s,
                                 microseconds=us)

    ev = spark.createDataFrame(
        [(1, t(0)), (2, t(5)), (3, t(30)), (4, t(26)),
         (5, t(30, 0, 0, 1)), (6, t(23, 59, 59, 999999))],
        "eid long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(10, t(0), t(6)),      # ev1 at start (incl), ev2 inside
         (11, t(20), t(30)),    # spans the day boundary; ev3 at end EXCL
         (12, t(29), t(31))],   # ev3 at 30 inside, ev5 just after
        "iv_id long, s timestamp, e timestamp",
    )
    got = sorted(
        (r["eid"], r["iv_id"])
        for r in interval_join(ev, iv, ts_col="ts").collect()
    )
    assert got == [(1, 10), (2, 10), (3, 12), (4, 11), (5, 12), (6, 11)]


def test_majority_tile_counts_hand(spark):
    """Modal filter vs brute force on a planted categorical raster
    with engineered ties (smallest class wins) and edge windows."""
    import numpy as np
    from greenex_py_spark.operators.focal import majority_tile_counts

    classes = [0, 10, 30]
    z = np.array(
        [[float(classes[(x + 2 * y) % 3]) for x in range(8)]
         for y in range(4)]
    )
    tiles, grid = _two_tile_fixture(spark, z)
    got = {}
    for r in majority_tile_counts(tiles, grid, classes, quant=1.0).collect():
        got[(r["tx"], r["ty"], r["mode_class"])] = r["n_px"]

    c = z.astype(np.int64)
    exp = {}
    for y in range(4):
        for x in range(8):
            best_cnt, best_cls = 0, classes[0]
            for cls in classes:
                cnt = 0
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        if 0 <= y + dy < 4 and 0 <= x + dx < 8:
                            cnt += int(c[y + dy, x + dx] == cls)
                if cnt > best_cnt:
                    best_cnt, best_cls = cnt, cls
            k = (x // 4, 0, best_cls)
            exp[k] = exp.get(k, 0) + 1
    assert got == exp


def test_gram_covariance_topk_hand(spark):
    """Exact covariance numerators vs a NumPy brute force on a small
    planted matrix (multi-partition: partial Gram merge is exercised)."""
    import numpy as np
    from greenex_py_spark.functions.similarity import gram_covariance_topk

    rng = np.random.RandomState(3)
    x = rng.randn(40, 5).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    ).repartition(4)
    got = {
        (r["di"], r["dj"]): (r["sxy"], r["cov_num"], r["rank"])
        for r in gram_covariance_topk(df, dim=5, quant=1e6, k=10).collect()
    }
    s = x.astype(np.float64) * 1e6
    xq = (np.sign(s) * np.floor(np.abs(s) + 0.5)).astype(np.int64)
    g = xq.T @ xq
    sx = xq.sum(axis=0)
    n = len(x)
    exp = {}
    for i in range(5):
        for j in range(i + 1, 5):
            exp[(i, j)] = (int(g[i, j]), int(n * g[i, j] - sx[i] * sx[j]))
    ranked = sorted(exp, key=lambda k: (-abs(exp[k][1]), k))
    assert len(got) == 10
    for rk, key in enumerate(ranked, start=1):
        assert got[key] == (exp[key][0], exp[key][1], rk)


def test_hex_cell_nearest_center(spark):
    """Cube-rounded hex assignment == nearest hex center (Euclidean)
    for random points — the geometric contract of the axial lattice."""
    import numpy as np
    from greenex_py_spark.geo.cells import HEX_QX, HEX_QY, HEX_RY, hex_cell_cols
    from pyspark.sql import functions as F

    size = 10.0
    rng = np.random.RandomState(5)
    xs = rng.uniform(-100, 100, 300)
    ys = rng.uniform(-100, 100, 300)
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(zip(xs, ys))],
        "pid long, x double, y double",
    )
    hq, hr = hex_cell_cols(F.col("x"), F.col("y"), size)
    got = {r["pid"]: (r["hq"], r["hr"]) for r in df.select("pid", hq, hr).collect()}

    # hex center of axial (q, r): x = size*sqrt(3)*(q + r/2), y = size*3/2*r
    s3 = 3.0 ** 0.5
    for i, (x, y) in enumerate(zip(xs, ys)):
        q0, r0 = got[i]
        d0 = (x - size * s3 * (q0 + r0 / 2)) ** 2 + (y - size * 1.5 * r0) ** 2
        for dq in (-1, 0, 1):
            for dr in (-1, 0, 1):
                q, r = q0 + dq, r0 + dr
                d = (x - size * s3 * (q + r / 2)) ** 2 + (y - size * 1.5 * r) ** 2
                assert d0 <= d + 1e-9, (i, x, y, (q0, r0), (q, r))


def test_resample_bilinear_affine_and_edges(spark):
    """Bilinear interpolation reproduces an affine surface exactly at
    interior target centers and yields NaN where the 2x2 stencil
    leaves the source raster."""
    import math

    import numpy as np
    from greenex_py_spark.geo.grid import GridSpec
    from greenex_py_spark.operators.resample import resample_bilinear

    sg = GridSpec(0.0, 0.0, 10.0, 4, 8, 8)  # 8x8 source, 2x2 tiles of 4px

    def zval(cx, cy):
        return 0.25 * cx - 0.125 * cy + 3.0

    rows = []
    for ty in range(2):
        for tx in range(2):
            ix = tx * 4 + np.arange(4)
            iy = ty * 4 + np.arange(4)
            cx = (ix + 0.5) * 10.0
            cy = (iy + 0.5) * 10.0
            vals = zval(cx[None, :], cy[:, None])
            rows.append((tx, ty, 4, 4, [float(v) for v in vals.ravel()]))
    src = spark.createDataFrame(
        rows, "tx long, ty long, w long, h long, px array<double>"
    )
    # 7 m target grid offset so early centers UNDERRUN the source
    # center lattice (stencil off-raster -> NaN)
    dg = GridSpec(1.0, 2.0, 7.0, 8, 10, 10)
    out = {}
    for r in resample_bilinear(src, dg, src_grid=sg).collect():
        arr = np.asarray(r["px"], dtype=np.float64).reshape(r["h"], r["w"])
        out[(r["tx"], r["ty"])] = arr
    assert set(out) == {(0, 0), (1, 0), (0, 1), (1, 1)}
    full = np.block([[out[(0, 0)], out[(1, 0)]], [out[(0, 1)], out[(1, 1)]]])
    for j in range(10):
        for i in range(10):
            cx = 1.0 + (i + 0.5) * 7.0
            cy = 2.0 + (j + 0.5) * 7.0
            u = cx / 10.0 - 0.5
            v = cy / 10.0 - 0.5
            inside = 0 <= math.floor(u) <= 6 and 0 <= math.floor(v) <= 6
            if inside:
                assert abs(full[j, i] - zval(cx, cy)) < 1e-9, (i, j)
            else:
                assert math.isnan(full[j, i]), (i, j)
    assert np.isnan(full).sum() > 0  # the edge contract was exercised


def test_skyline_2d_vs_brute_force(spark):
    """Window skyline == NOT-EXISTS dominance brute force, including
    duplicate points and equal-coordinate ties."""
    import numpy as np
    from greenex_py_spark.operators.skyline import skyline_2d

    rng = np.random.RandomState(13)
    pts = [(i, int(x), int(y)) for i, (x, y) in enumerate(
        zip(rng.randint(0, 12, 60), rng.randint(0, 12, 60)))]
    pts += [(100, 11, 11), (101, 11, 11)]  # duplicate maximal points
    df = spark.createDataFrame(pts, "pid long, x long, y long")
    got = sorted(r["pid"] for r in skyline_2d(df, "x", "y").collect())
    exp = sorted(
        p[0] for p in pts
        if not any(
            q[1] >= p[1] and q[2] >= p[2] and (q[1] > p[1] or q[2] > p[2])
            for q in pts
        )
    )
    assert got == exp and 100 in got and 101 in got


def test_zonal_quantiles_vs_numpy_brute_force(spark, sf_dir):
    """Distributed value-histogram quantiles == NumPy order statistics
    over the same quantized in-buffer pixels (first 8 points)."""
    from greenex_py_spark.data import driver_city as city
    from greenex_py_spark.operators.zonal import zonal_quantiles

    radius, scale = 300.0, 1e6
    pts = city.points_df(spark, sf_dir).orderBy("doc_id").limit(8)
    tiles = city.tiles_df(spark, "ndvi")
    got = (
        zonal_quantiles(pts, tiles, radius=radius, id_col="doc_id",
                        scale=scale, grid=city.grid())
        .toPandas().set_index("doc_id").sort_index()
    )
    for doc_id, x, y in pts.collect():
        span = int(radius / city.RES) + 1
        ix0 = int(np.floor((x - city.X0) / city.RES))
        iy0 = int(np.floor((y - city.Y0) / city.RES))
        ix = np.arange(max(0, ix0 - span), min(city.NPX, ix0 + span + 1))
        iy = np.arange(max(0, iy0 - span), min(city.NPX, iy0 + span + 1))
        cx = city.X0 + (ix + 0.5) * city.RES
        cy = city.Y0 + (iy + 0.5) * city.RES
        m = (cx[None, :] - x) ** 2 + (cy[:, None] - y) ** 2 <= radius * radius
        v = city.ndvi_value(cx[None, :], cy[:, None]) + np.zeros((len(iy), len(ix)))
        q = np.sort(np.floor(v[m] * scale + 0.5).astype(np.int64))
        n = len(q)
        row = got.loc[doc_id]
        assert row["n_px"] == n
        med = (q[(n + 1) // 2 - 1] + q[n // 2]) / (2.0 * scale)
        assert row["median"] == med
        assert row["p25"] == q[int(np.ceil(n * 0.25)) - 1] / scale
        assert row["p75"] == q[int(np.ceil(n * 0.75)) - 1] / scale


def test_discrete_voronoi_ties_and_brute_force(spark):
    """Broadcast argmin == NumPy lexicographic (d2, id) argmin; an exact
    equidistant tie resolves to the lowest site id in both."""
    from greenex_py_spark.operators.voronoi import discrete_voronoi_assign

    sites = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 10.0, 0.0), (2, 0.0, 10.0)],
        "gs_id long, cx double, cy double",
    )
    cells = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(
            (x, y) for x in range(0, 11, 2) for y in range(0, 11, 2))],
        "cid long, xc double, yc double",
    )
    got = {r["cid"]: (r["gs_id"], r["d2"])
           for r in discrete_voronoi_assign(cells, sites).collect()}
    s = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    for r in cells.collect():
        d2 = (s[:, 0] - r["xc"]) ** 2 + (s[:, 1] - r["yc"]) ** 2
        best = min(range(3), key=lambda k: (d2[k], k))
        assert got[r["cid"]] == (best, d2[best])
    # the exact tie point (5, 5) is equidistant from all three sites
    assert got[(5 // 2) * 6 + 5 // 2][0] in (0, 1, 2)


def test_count_min_upper_bound_and_exactness(spark):
    """CMS estimates dominate exact counts; with a vocab far smaller
    than the width most probes are collision-free and exact; the sketch
    is never larger than depth × width."""
    from greenex_py_spark.functions.sketches import (
        CMS_DEPTH, CMS_WIDTH, count_min_estimate, count_min_sketch)

    rows = [(f"tok{i % 7}",) for i in range(700)] + [("rare",)] * 3
    df = spark.createDataFrame(rows, "value string")
    exact = {r["value"]: r["count"]
             for r in df.groupBy("value").count().collect()}
    probes = spark.createDataFrame([(v,) for v in exact], "value string")
    est = {r["value"]: r["est"]
           for r in count_min_estimate(df, probes).collect()}
    assert set(est) == set(exact)
    assert all(est[v] >= exact[v] for v in exact)
    # 8 values in 256 buckets × 3 rows: at least one row collision-free
    assert sum(est[v] == exact[v] for v in exact) >= 6
    assert count_min_sketch(df, "value").count() <= CMS_DEPTH * CMS_WIDTH


def test_power_iteration_mirrors_numpy_and_converges(spark):
    """Engine iterates == a NumPy mirror of the same quantized
    algorithm, and after 2 steps the direction aligns with the true
    dominant eigenvector of the Gram matrix."""
    from greenex_py_spark.functions.similarity import gram_power_iteration

    rng = np.random.RandomState(7)
    base = rng.randn(8)
    X = np.outer(rng.randn(120), base) + 0.1 * rng.randn(120, 8)
    rows = [(i, [float(v) for v in X[i]]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = (gram_power_iteration(df, dim=8)
           .toPandas().set_index("di").sort_index())

    # NumPy mirror (same quantizers, same float32 ingest)
    xq = np.asarray(np.sign(X.astype(np.float32).astype(np.float64) * 1e6)
                    * np.floor(np.abs(X.astype(np.float32).astype(np.float64) * 1e6) + 0.5),
                    dtype=np.int64)
    G = xq.T @ xq
    c = G / np.abs(G).max() * 1e7
    gn = (np.sign(c) * np.floor(np.abs(c) + 0.5)).astype(np.int64)
    u = np.full(8, 10**6, dtype=np.int64)
    us = []
    for _ in range(2):
        y = gn @ u
        cy = y / np.abs(y).max() * 1e6
        u = (np.sign(cy) * np.floor(np.abs(cy) + 0.5)).astype(np.int64)
        us.append(u.copy())
    assert list(got["u1"]) == list(us[0])
    assert list(got["u2"]) == list(us[1])

    evals, evecs = np.linalg.eigh(G.astype(np.float64))
    top = evecs[:, np.argmax(evals)]
    v = us[1] / np.linalg.norm(us[1])
    assert abs(float(v @ top)) > 0.99


def test_chi2_independence_hand_2x2(spark):
    """2×2 table → the closed-form N(ad−bc)² / (r1 r2 c1 c2) statistic,
    zero-observation cell restored with its expected-count contribution."""
    from greenex_py_spark.functions.stats import chi2_independence

    a, b, c, d = 10, 20, 30, 0  # one empty cell
    rows = ([("x", 0)] * a + [("x", 1)] * b + [("y", 0)] * c + [("y", 1)] * d)
    df = spark.createDataFrame(rows, "a string, b long")
    out = chi2_independence(df, "a", "b").toPandas()
    assert len(out) == 4 and out["dof"].iloc[0] == 1
    n = a + b + c + d
    expected = n * (a * d - b * c) ** 2 / ((a + b) * (c + d) * (a + c) * (b + d))
    assert abs(out["chi2"].iloc[0] - expected) < 1e-5
    cell = out.set_index(["a", "b"])
    assert cell.loc[("y", 1), "obs"] == 0
    assert abs(cell.loc[("y", 1), "exp"] - (c + d) * (b + d) / n) < 1e-9
    assert abs(out["contrib"].sum() - out["chi2"].iloc[0]) < 1e-5


def test_marching_squares_vs_full_raster(spark):
    """Tile-distributed case histogram == single-array NumPy
    classification of the whole raster (cross-tile windows included)."""
    from greenex_py_spark.data import driver_city as city
    from greenex_py_spark.operators.focal import (
        MS_SEGMENTS, marching_squares_counts, quantize_half_away)

    thr = 500_000
    tiles = city.tiles_df(spark, "ndvi")
    got = (
        marching_squares_counts(tiles, city.grid(), quant=1e6, threshold_q=thr)
        .groupBy("case_id").agg(F.sum("n_win").alias("n"))
        .toPandas().set_index("case_id")["n"].to_dict()
    )
    ix = np.arange(city.NPX)
    px_x = city.X0 + (ix + 0.5) * city.RES
    px_y = city.Y0 + (ix + 0.5) * city.RES
    m = quantize_half_away(
        city.ndvi_value(px_x[None, :], px_y[:, None]), 1e6) > thr
    case = (m[:-1, :-1].astype(np.int64) + 2 * m[:-1, 1:]
            + 4 * m[1:, :-1] + 8 * m[1:, 1:])
    codes, counts = np.unique(case, return_counts=True)
    assert got == dict(zip(codes.tolist(), counts.tolist()))
    assert sum(got.values()) == (city.NPX - 1) ** 2
    assert len(MS_SEGMENTS) == 16


def test_jaro_winkler_matches_duckdb_bitwise():
    """Engine JW == DuckDB's builtin bit-for-bit on textbook pairs and
    a random fuzz (the gate oracle's independence rests on this)."""
    import random

    import duckdb

    from greenex_py_spark.functions.dedup import jaro_winkler

    con = duckdb.connect()
    hand = [("martha", "marhta"), ("dixon", "dicksonx"), ("ab", "ba"),
            ("d", "d"), ("", "abc"), ("jellyfish", "smellyfish")]
    random.seed(3)
    fuzz = [
        ("".join(random.choice("abcd") for _ in range(random.randint(0, 12))),
         "".join(random.choice("abcd") for _ in range(random.randint(0, 12))))
        for _ in range(3000)
    ]
    for a, b in hand + fuzz:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert jaro_winkler(a, b) == want, (a, b)


def test_global_rank_and_spearman_vs_scipy_free_formula(spark):
    """Two-phase distributed rank == single-window rank on a shuffled
    frame with duplicate keys; Spearman matches the hand formula on a
    known permutation (and is 1.0 on identical orders)."""
    from greenex_py_spark.engine.rank import global_rank, spearman_rho

    rng = np.random.RandomState(11)
    vals = rng.randint(0, 20, 300)  # heavy duplicates
    df = spark.createDataFrame(
        [(int(i), int(v)) for i, v in enumerate(vals)], "id long, v long"
    ).repartition(7)
    got = {r["id"]: r["rank"]
           for r in global_rank(df, ["v", "id"], "rank").collect()}
    order = sorted(range(300), key=lambda i: (vals[i], i))
    assert got == {i: k + 1 for k, i in enumerate(order)}

    b = rng.permutation(300)
    df2 = spark.createDataFrame(
        [(int(i), int(vals[i]), int(b[i])) for i in range(300)],
        "id long, a long, b long",
    )
    row = spearman_rho(df2, "a", "b", "id").collect()[0]
    ra = np.empty(300, dtype=np.int64)
    ra[np.lexsort((np.arange(300), vals))] = np.arange(1, 301)
    rb = np.empty(300, dtype=np.int64)
    rb[np.lexsort((np.arange(300), b))] = np.arange(1, 301)
    sd2 = int(((ra - rb) ** 2).sum())
    assert row["sum_d2"] == sd2
    assert abs(row["rho"] - (1 - 6 * sd2 / (300 * (300**2 - 1)))) < 1e-6
    same = spearman_rho(
        df2.select("id", "a", F.col("a").alias("c")), "a", "c", "id"
    ).collect()[0]
    assert same["rho"] == 1.0


def test_weighted_systematic_sample_exact_pps(spark):
    """Engine selection == exact-rational brute force; Σ n_hits == m;
    a row heavier than the skip is hit multiple times."""
    from fractions import Fraction

    from greenex_py_spark.functions.sampling import weighted_systematic_sample

    rng = np.random.RandomState(5)
    w = rng.randint(1, 50, 200)
    w[17] = 2000  # heavier than T/m -> multiple hits
    df = spark.createDataFrame(
        [(int(i), int(x)) for i, x in enumerate(w)], "doc_id long, wt long"
    ).repartition(5)
    m = 40
    got = {r["doc_id"]: r["n_hits"]
           for r in weighted_systematic_sample(
               df, "wt", m, ["doc_id"]).collect()}
    T = int(w.sum())
    cum = np.cumsum(w)
    exp = {}
    for j in range(m):
        p = Fraction((2 * j + 1) * T, 2 * m)
        i = int(np.searchsorted(cum, float(p), side="right"))
        # exact boundary: p in [cum[i-1], cum[i]) -> row i
        while Fraction(int(cum[i])) <= p:
            i += 1
        exp[i] = exp.get(i, 0) + 1
    assert got == exp
    assert sum(got.values()) == m
    assert got.get(17, 0) >= 2


def test_stream_dedup_cross_run_replay(spark, tmp_path):
    """Replayed events are collapsed exactly-once both within one drain
    and across a checkpoint-resumed second drain (state persists)."""
    from greenex_py_spark.streaming.ingest import dedup_event_stream
    from greenex_py_spark.streaming.sessionize import EVENT_SCHEMA

    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).filter(F.col("event_id") < 300)
    ev.coalesce(2).write.parquet(src)
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    dedup_event_stream(spark, src, sink, ckpt)
    n1 = spark.read.parquet(sink).count()
    assert n1 == 300
    # second run: replay 100 old events (cross-run dups) + 50 new ones
    ev2 = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).filter((F.col("event_id") >= 300) & (F.col("event_id") < 350))
    ev.filter(F.col("event_id") < 100).coalesce(1).write.mode("append").parquet(src)
    ev2.coalesce(1).write.mode("append").parquet(src)
    dedup_event_stream(spark, src, sink, ckpt)
    out = spark.read.parquet(sink)
    assert out.count() == 350
    assert out.select("event_id").distinct().count() == 350


def test_welch_ttest_hand_values(spark):
    """Welch t and dof match the textbook formulas on a hand dataset
    with unequal variances and sizes."""
    from greenex_py_spark.functions.stats import welch_ttest

    a = [10, 12, 14, 16, 18, 20]          # mean 15, var 14
    b = [30, 31, 29, 32, 28]              # mean 30, var 2.5
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "g string, vq long")
    row = welch_ttest(df, "g", "vq", "A", "B").collect()[0]
    ma, mb = np.mean(a), np.mean(b)
    ua = np.var(a, ddof=1) / len(a)
    ub = np.var(b, ddof=1) / len(b)
    t = (ma - mb) / np.sqrt(ua + ub)
    dof = (ua + ub) ** 2 / (ua**2 / (len(a) - 1) + ub**2 / (len(b) - 1))
    assert row["n_a"] == 6 and row["n_b"] == 5
    assert abs(row["mean_a"] - ma) < 1e-9 and abs(row["mean_b"] - mb) < 1e-9
    assert abs(row["t_stat"] - t) < 1e-6
    assert abs(row["dof"] - dof) < 1e-3


def test_rbo_identical_disjoint_and_hand_case(spark):
    """RBO is 1 for identical rankings, 0 for disjoint ones, and
    matches the hand formula on a partial overlap."""
    from greenex_py_spark.functions.retrieval import rbo_overlap, rbo_weights

    k, p = 5, 0.9
    a = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(10)], "doc_id long, score double"
    )
    same = rbo_overlap(a, a, k=k, p=p).collect()
    assert all(abs(r["rbo"] - sum(w for _, w in rbo_weights(k, p))) < 1e-8
               for r in same)  # X_d = d for identical lists
    b = spark.createDataFrame(
        [(100 + i, float(100 - i)) for i in range(10)],
        "doc_id long, score double",
    )
    disj = rbo_overlap(a, b, k=k, p=p).collect()
    assert all(r["rbo"] == 0.0 and r["x_d"] == 0 for r in disj)
    # hand case: b reverses the top-5 of a -> overlap grows as
    # X = [0, 0, 1, 3, 5] at depths 1..5 (max(ra, rb) = max(r, 6-r))
    c = spark.createDataFrame(
        [(i, float(100 + i)) for i in range(5)], "doc_id long, score double"
    )
    out = {r["d"]: (r["x_d"], r["rbo"]) for r in
           rbo_overlap(a, c, k=k, p=p).collect()}
    assert [out[d][0] for d in range(1, 6)] == [0, 0, 1, 3, 5]
    want = sum((1 - p) * p ** (d - 1) * x / d
               for d, x in zip(range(1, 6), [0, 0, 1, 3, 5]))
    assert abs(out[1][1] - want) < 1e-8


def test_cusum_drift_detects_planted_shift(spark):
    """On a series with a level shift at day 20 of 40, the scaled CUSUM
    argmax lands exactly on the last pre-shift day, and the scaled
    values match the exact formula n·prefix − i·total."""
    import datetime

    from greenex_py_spark.driver_queries import q_cusum_drift

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(40):
        n = 10 if day < 20 else 30
        for k in range(n):
            rows.append((eid, base + datetime.timedelta(days=day, minutes=k),
                         1, "view", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string")
    import os
    import tempfile
    p = os.path.join(tempfile.mkdtemp(), "events.parquet")
    df.write.parquet(p)
    out = q_cusum_drift(spark, os.path.dirname(p)).toPandas()
    counts = np.array([10] * 20 + [30] * 20, dtype=np.int64)
    pre = np.cumsum(counts)
    scaled = 40 * pre - np.arange(1, 41) * counts.sum()
    assert list(out.sort_values("day")["cusum_scaled"]) == scaled.tolist()
    chg = out[out["is_change_point"]]
    assert len(chg) == 1 and chg["day"].iloc[0] == "2024-01-20"


def test_simplify_track_numpy_mirror(spark, sf_dir):
    """Kept-vertex set == a NumPy mirror of the one-pass effective-area
    filter (endpoints always kept, interior kept iff area_q >= thr)."""
    from greenex_py_spark.driver_queries import _VW_AREA_Q, _VW_TRACKS, q_simplify_track

    got = q_simplify_track(spark, sf_dir).toPandas()
    doc_ids = np.sort(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id").toPandas()["doc_id"].to_numpy()
    )
    tr = doc_ids % _VW_TRACKS
    seq = doc_ids // _VW_TRACKS
    x = 100000.0 + seq * 10.0 + ((doc_ids * 48271) % 1000) / 1000.0 * 6.0
    y = (450000.0 + tr * 500.0 + np.sin(seq / 20.0) * 300.0
         + ((doc_ids * 16807) % 1000) / 1000.0 * 6.0)
    exp = set()
    for t in range(_VW_TRACKS):
        m = tr == t
        xs, ys, ss = x[m], y[m], seq[m]
        o = np.argsort(ss)
        xs, ys, ss = xs[o], ys[o], ss[o]
        for i in range(len(ss)):
            if i == 0 or i == len(ss) - 1:
                exp.add((t, int(ss[i]), -1))
                continue
            a2 = abs((xs[i-1]-xs[i])*(ys[i+1]-ys[i])
                     - (xs[i+1]-xs[i])*(ys[i-1]-ys[i]))
            aq = int(np.floor(a2 * 100.0 + 0.5))
            if aq >= _VW_AREA_Q:
                exp.add((t, int(ss[i]), aq))
    assert set(zip(got["track_id"], got["seq"], got["area_q"])) == exp
    assert (got["area_q"] == -1).sum() == 2 * _VW_TRACKS


def test_ks_two_sample_matches_scipy_style_brute(spark):
    """KS distance matches the brute-force sup over empirical CDFs on
    a planted distribution shift."""
    from greenex_py_spark.functions.stats import ks_two_sample

    rng = np.random.RandomState(9)
    a = rng.randint(0, 50, 400)        # uniform-ish
    b = rng.randint(20, 70, 300)       # shifted
    rows = [("A", int(v)) for v in a] + [("B", int(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    row = ks_two_sample(df, "g", "v", "A").collect()[0]
    vs = np.unique(np.concatenate([a, b]))
    ca = np.array([(a <= v).sum() for v in vs], dtype=np.int64)
    cb = np.array([(b <= v).sum() for v in vs], dtype=np.int64)
    dd = np.abs(len(b) * ca - len(a) * cb)
    assert row["n_a"] == 400 and row["n_b"] == 300
    assert row["d_scaled"] == int(dd.max())
    assert row["v_at_max"] == int(vs[np.argmax(dd)])
    assert abs(row["d_stat"] - dd.max() / (400 * 300)) < 1e-9


def test_js_divergence_bounds_and_hand_values(spark, tmp_path):
    """JSD(P,P)=0; disjoint vocabularies give ln 2; a hand mixture
    matches the closed-form value."""
    import math
    import os

    from greenex_py_spark.driver_queries import q_js_divergence

    def run(rows):
        p = str(tmp_path / f"d{len(rows)}_{abs(hash(str(rows))) % 997}")
        os.makedirs(p, exist_ok=True)
        spark.createDataFrame(
            rows, "doc_id long, source string, text string, n_chars long"
        ).write.mode("overwrite").parquet(p + "/documents.parquet")
        return q_js_divergence(spark, p).collect()[0]

    same = run([(0, "src0", "a b c", 5), (1, "src1", "a b c", 5)])
    assert same["jsd"] == 0.0
    disj = run([(0, "src0", "a a b", 5), (1, "src1", "x y z", 5)])
    assert abs(disj["jsd"] - math.log(2)) < 1e-6
    # P = {a:1}, Q = {a:.5, b:.5} -> JSD = 0.5*ln(4/3) + 0.25*ln(3) ... compute directly
    mix = run([(0, "src0", "a a", 5), (1, "src1", "a b", 5)])
    pa, qa, qb = 1.0, 0.5, 0.5
    ma, mb = (pa + qa) / 2, (0.0 + qb) / 2
    want = 0.5 * (pa * math.log(pa / ma)) + 0.5 * (
        qa * math.log(qa / ma) + qb * math.log(qb / mb))
    assert abs(mix["jsd"] - want) < 1e-6


def test_ring_profile_partitions_buffer_exactly(spark, sf_dir):
    """Ring pixel counts partition the flat-buffer count, and ring
    means recombine to the flat-buffer mean (same clamp semantics)."""
    from greenex_py_spark.data import driver_city as city
    from greenex_py_spark.operators.zonal import zonal_mean_std, zonal_ring_profile

    pts = city.points_df(spark, sf_dir).orderBy("doc_id").limit(6)
    tiles = city.tiles_df(spark, "ndvi")
    rings = zonal_ring_profile(
        pts, tiles, radius=300.0, ring_width=100.0, id_col="doc_id",
        grid=city.grid(),
    ).toPandas()
    flat = zonal_mean_std(
        pts, tiles, radius=300.0, id_col="doc_id", grid=city.grid()
    ).toPandas().set_index("doc_id")
    g = rings.groupby("doc_id")
    for doc_id, sub in g:
        # ring 3 (dist exactly 300) is excluded; counts must still sum
        # to within that sliver of the flat buffer
        n_flat_expected = sub["n_px"].sum()
        mean_recombined = (sub["mean_v"] * sub["n_px"]).sum() / n_flat_expected
        assert abs(mean_recombined - flat.loc[doc_id, "mean_NDVI"]) < 2e-3
        assert set(sub["ring"]) <= {0, 1, 2}
        assert (sub["n_px"] > 0).all()


def test_attribution_hand_sequence(spark, tmp_path):
    """Last-touch attribution on a hand-built user stream: first-event
    purchases map to '(first)', gaps are exact microseconds."""
    import datetime
    import os

    from greenex_py_spark.driver_queries import q_attribution

    t0 = datetime.datetime(2024, 1, 1)

    def ev(i, u, typ, sec):
        return (i, t0 + datetime.timedelta(seconds=sec), u, typ, 1.0, "{}")

    rows = [
        ev(0, 1, "purchase", 0),          # first event -> (first)
        ev(1, 1, "view", 10),
        ev(2, 1, "purchase", 13),          # prev view, gap 3s
        ev(3, 2, "click", 5),
        ev(4, 2, "purchase", 6),           # prev click, gap 1s
        ev(5, 2, "purchase", 8),           # prev purchase, gap 2s
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string")
    p = str(tmp_path / "attr")
    os.makedirs(p, exist_ok=True)
    df.write.mode("overwrite").parquet(p + "/events.parquet")
    out = {r["touch"]: (r["n_purchases"], r["sum_gap_us"])
           for r in q_attribution(spark, p).collect()}
    assert out == {"(first)": (1, 0), "view": (1, 3_000_000),
                   "click": (1, 1_000_000), "purchase": (1, 2_000_000)}


def test_tpch_shapes_plans_and_colocated_predicate(spark, sf_dir):
    """Q5's dims join via BroadcastHashJoin (no CartesianProduct), and
    the supplier-nation = customer-nation co-location predicate holds
    on every contributing row (recomputed in pandas)."""
    from greenex_py_spark.driver_queries import q_local_supplier_volume

    df = q_local_supplier_volume(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan

    import duckdb
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM"
                    f" read_parquet('{sf_dir}/{t}.parquet')")
    naive = con.execute("""
        SELECT n_name, sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                                      * 100.0) AS BIGINT)) AS rc
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND s_suppkey = l_suppkey AND s_nationkey = c_nationkey
          AND n_nationkey = s_nationkey AND r_regionkey = n_regionkey
          AND r_name = 'ASIA'
        GROUP BY n_name
    """).df().set_index("n_name")["rc"].to_dict()
    got = {r["n_name"]: r["revenue_cents"] for r in df.collect()}
    assert got == {k: int(v) for k, v in naive.items()}


def test_poisson_bootstrap_statistical_sanity(spark):
    """Replicate multiplicities average ~1 (Poisson(1)), the CI
    brackets the sample mean, and replicate draws are deterministic
    across runs."""
    from greenex_py_spark.functions.stats import poisson_bootstrap_mean

    rng = np.random.RandomState(2)
    vals = rng.randint(50, 150, 500)
    df = spark.createDataFrame(
        [(int(i), int(v)) for i, v in enumerate(vals)], "id long, vq long"
    )
    out = poisson_bootstrap_mean(df, "vq", "id").toPandas()
    assert len(out) == 32
    assert abs(out["n_eff"].mean() - 500) < 500 * 0.12  # ~1 per row
    mu = vals.mean()
    lo, hi = out["ci_lo"].iloc[0], out["ci_hi"].iloc[0]
    assert lo <= mu <= hi and lo < hi
    out2 = poisson_bootstrap_mean(df, "vq", "id").toPandas()
    assert out.sort_values("b")["mean_v"].tolist() == \
        out2.sort_values("b")["mean_v"].tolist()


def test_staypoints_hand_trajectory(spark):
    """Gaps-and-islands dwell segmentation: distance break, time-gap
    break, min_pts filter, and exact centroid numerators on a
    hand-built two-user trajectory."""
    import pandas as pd

    from greenex_py_spark.operators.spacetime import staypoints

    rows = [
        # user 1: 3 fixes at ~home (steps <= 60), then jump 5000 away,
        # then a lone fix after a 3-day gap back near home
        (1, 1, "2024-01-01 08:00:00", 100, 100),
        (2, 1, "2024-01-01 09:00:00", 140, 120),
        (3, 1, "2024-01-01 20:00:00", 150, 90),
        (4, 1, "2024-01-01 21:00:00", 5000, 5000),
        (5, 1, "2024-01-05 08:00:00", 110, 105),
        # user 2: two fixes 40 apart -> one 2-event stay
        (6, 2, "2024-01-02 10:00:00", 0, 0),
        (7, 2, "2024-01-02 11:00:00", 40, 0),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "qx", "qy"])
        .assign(ts=lambda d: pd.to_datetime(d.ts)),
        schema="event_id long, user_id long, ts timestamp, qx long, qy long",
    )
    got = {
        (r.user_id, r.n_events, r.sum_qx, r.sum_qy)
        for r in staypoints(df, dist_q=60, min_pts=2).collect()
    }
    # user 1 keeps only the first 3-fix stay (jump breaks on distance;
    # the post-gap fix is a singleton dropped by min_pts); user 2 keeps
    # its pair
    assert got == {(1, 3, 390, 310), (2, 2, 40, 0)}


def test_spherical_rect_area_sphere_and_planar_limits(spark):
    """Chamberlain–Duquette collapsed rect area: the full sphere comes
    out as 4πR², and a 0.01° rect near 52°N matches the planar
    R²·Δλ·Δφ·cos(φ_mid) approximation to < 1e-6 relative."""
    import math

    from greenex_py_spark.geo.geodesic import (
        EARTH_R_M, RAD_PER_DEG, spherical_rect_area_m2,
    )

    df = spark.createDataFrame(
        [(0.0, -90.0, 360.0, 90.0), (4.0, 52.0, 4.01, 52.01)],
        "lon0 double, lat0 double, lon1 double, lat1 double",
    )
    a = [
        r.a
        for r in df.select(
            spherical_rect_area_m2(
                F.col("lon0"), F.col("lat0"), F.col("lon1"), F.col("lat1")
            ).alias("a")
        ).collect()
    ]
    assert abs(a[0] - 4.0 * math.pi * EARTH_R_M**2) / a[0] < 1e-12
    planar = (
        EARTH_R_M**2
        * (0.01 * RAD_PER_DEG) ** 2
        * math.cos(52.005 * RAD_PER_DEG)
    )
    assert abs(a[1] - planar) / planar < 1e-6


def test_d8_flow_accumulation_hand_graph(spark):
    """Pointer-doubling accumulation on hand-built macro grids: a
    descending chain accumulates 1..n into the pit; two branches
    joining double-count into the confluence; a flat pair stays at 1."""
    from greenex_py_spark.operators.hydro import (
        d8_downstream, flow_accumulation,
    )

    # chain: (0,0) 40 > (1,0) 30 > (2,0) 20 > (3,0) 10
    # branch: (1,1) 35 drains diagonally? nearest lower is (1,0)/(2,0):
    # dz to (1,0)=5 cardinal key 2*25=50; to (2,0)=15 diagonal key 225
    # -> picks (2,0).  flats: (9,9)=7,(9,8)=7 -> no pointer, acc 1.
    rows = [(0, 0, 40), (1, 0, 30), (2, 0, 20), (3, 0, 10),
            (1, 1, 35), (9, 9, 7), (9, 8, 7)]
    cells = spark.createDataFrame(rows, "mx long, my long, zq long")
    down = {(r.mx, r.my): (r.nmx, r.nmy) for r in d8_downstream(cells).collect()}
    assert down == {(0, 0): (1, 0), (1, 0): (2, 0), (2, 0): (3, 0),
                    (1, 1): (2, 0)}
    acc = {(r.mx, r.my): r.acc
           for r in flow_accumulation(cells, d8_downstream(cells)).collect()}
    assert acc == {(0, 0): 1, (1, 0): 2, (2, 0): 4, (3, 0): 5,
                   (1, 1): 1, (9, 9): 1, (9, 8): 1}


def test_macro_cells_match_numpy_block_sums(spark):
    """Per-tile partial block sums reassemble to the exact NumPy
    block-sum of the full quantized raster (tile edges at 256 px are
    deliberately unaligned with the 20-px blocks)."""
    import numpy as np

    from greenex_py_spark.data import driver_city as city
    from greenex_py_spark.operators.focal import quantize_half_away
    from greenex_py_spark.operators.hydro import macro_cells

    got = {
        (r.mx, r.my): r.zq
        for r in macro_cells(
            city.tiles_df(spark, "ndvi"), city.grid(), factor=20
        ).collect()
    }
    ix = np.arange(city.NPX)
    vals = quantize_half_away(
        city.ndvi_value(
            (city.X0 + (ix[None, :] + 0.5) * city.RES),
            (city.Y0 + (ix[:, None] + 0.5) * city.RES),
        ),
        1e6,
    )
    blocks = vals.reshape(50, 20, 50, 20).sum(axis=(1, 3))
    want = {(mx, my): int(blocks[my, mx]) for my in range(50) for mx in range(50)}
    assert got == want


def test_kcore_peeling_cascade(spark):
    """k-core peeling: a path tail peels away over multiple rounds
    (both ends inward), leaving exactly the triangle as the 2-core;
    pendant vertices never survive a 3-core of twin 4-cliques."""
    from greenex_py_spark.functions.graph import kcore_membership

    # triangle {a,b,c} with a 6-vertex path tail hanging off c
    tri_path = [("a", "b"), ("b", "c"), ("c", "a"),
                ("c", "p1"), ("p1", "p2"), ("p2", "p3"),
                ("p3", "p4"), ("p4", "p5"), ("p5", "p6")]
    e1 = spark.createDataFrame(tri_path, "src string, dst string")
    got = {(r.node, r.core_deg)
           for r in kcore_membership(e1, k=2).collect()}
    assert got == {("a", 2), ("b", 2), ("c", 2)}

    # two 4-cliques sharing vertex s, plus a pendant on each clique
    cl = []
    for grp in (["s", "x1", "x2", "x3"], ["s", "y1", "y2", "y3"]):
        cl += [(u, v) for i, u in enumerate(grp) for v in grp[i + 1:]]
    cl += [("x1", "px"), ("y1", "py")]
    e2 = spark.createDataFrame(cl, "src string, dst string")
    got = {(r.node, r.core_deg)
           for r in kcore_membership(e2, k=3).collect()}
    assert got == {("s", 6), ("x1", 3), ("x2", 3), ("x3", 3),
                   ("y1", 3), ("y2", 3), ("y3", 3)}


def test_watershed_labels_hand_graph(spark):
    """Pointer-squaring watershed labels: two chains draining to
    different pits plus a confluence, and a pit labelling itself."""
    from greenex_py_spark.operators.hydro import (
        d8_downstream, watershed_labels,
    )

    # basin A: (0,0)40 > (1,0)30 > (2,0)20 > (3,0)10 (pit)
    # basin B: (7,7)9 > (8,8)5 (pit); isolated flat (5,5) labels itself
    rows = [(0, 0, 40), (1, 0, 30), (2, 0, 20), (3, 0, 10),
            (7, 7, 9), (8, 8, 5), (5, 5, 3)]
    cells = spark.createDataFrame(rows, "mx long, my long, zq long")
    lab = {(r.mx, r.my): (r.pmx, r.pmy)
           for r in watershed_labels(cells, d8_downstream(cells)).collect()}
    assert lab == {(0, 0): (3, 0), (1, 0): (3, 0), (2, 0): (3, 0),
                   (3, 0): (3, 0), (7, 7): (8, 8), (8, 8): (8, 8),
                   (5, 5): (5, 5)}


def test_holt_linear_matches_reference_recursion(spark):
    """Arrow Holt kernel == an inline scalar reference on a hand
    series (trend capture: forecast overshoots a ramp's last point),
    and a constant series keeps level=const, trend=0, sse=0."""
    from greenex_py_spark.functions.timeseries import (
        HOLT_ALPHA, HOLT_BETA, HOLT_OMA, HOLT_OMB, holt_linear,
    )

    ys = [10.0, 12.0, 15.0, 13.0, 18.0]
    level, trend, sse = ys[0], ys[1] - ys[0], 0.0
    for y in ys[1:]:
        prev, pred = level, level + trend
        sse += (y - pred) ** 2
        level = HOLT_ALPHA * y + HOLT_OMA * pred
        trend = HOLT_BETA * (level - prev) + HOLT_OMB * trend
    rows = [("ramp", t, int(y)) for t, y in enumerate(ys)]
    rows += [("flat", t, 7) for t in range(5)]
    df = spark.createDataFrame(rows, "g string, t long, y long")
    got = {r.g: r for r in holt_linear(df).collect()}
    assert got["ramp"].n_days == 5
    assert got["ramp"].level == round(level, 6)
    assert got["ramp"].trend == round(trend, 6)
    assert got["ramp"].forecast1 == round(level + trend, 6)
    assert got["ramp"].sse == round(sse, 6)
    assert (got["flat"].level, got["flat"].trend, got["flat"].sse) == (7.0, 0.0, 0.0)
    # single-point series: no two-point init -> dropped
    one = spark.createDataFrame([("solo", 0, 3)], "g string, t long, y long")
    assert holt_linear(one).count() == 0


def test_viterbi_match_recovers_continuity(spark):
    """Hand-built candidate sets where the pointwise-nearest edge flaps
    at t=1: Viterbi keeps the continuous edge (switch penalty beats a
    small emission gain), but follows when the evidence is decisive
    (a long run on a new edge)."""
    from greenex_py_spark.operators.mapmatch import viterbi_match

    rows = [
        # t=0: edge 1 clearly best
        (0, 0, 1, 100), (0, 0, 2, 40000),
        # t=1: edge 2 momentarily nearer by 10k < 2·25k round-trip
        # penalty -> a dip to 2 and back can never pay; stay on 1
        (0, 1, 1, 11000), (0, 1, 2, 1000),
        # t=2..4: edge 1 clearly best again
        (0, 2, 1, 100), (0, 2, 2, 90000),
        (0, 3, 1, 100), (0, 3, 2, 90000),
        (0, 4, 1, 100), (0, 4, 2, 90000),
        # track 1: edge 2 wins from t=1 on -> switch once, back-dated
        # to the earliest beneficial fix
        (1, 0, 1, 100), (1, 0, 2, 40000),
        (1, 1, 1, 11000), (1, 1, 2, 1000),
        (1, 2, 1, 90000), (1, 2, 2, 100),
        (1, 3, 1, 90000), (1, 3, 2, 100),
    ]
    df = spark.createDataFrame(rows, "track long, t long, edge long, emis long")
    out = viterbi_match(df).collect()
    got0 = {r.t: r.edge for r in out if r.track == 0}
    got1 = {r.t: r.edge for r in out if r.track == 1}
    # pointwise snap would flap on track 0 (1,2,1,1,1); Viterbi holds 1
    assert got0 == {0: 1, 1: 1, 2: 1, 3: 1, 4: 1}
    assert got1 == {0: 1, 1: 2, 2: 2, 3: 2}


def test_acf_lags_matches_numpy_reference(spark):
    """Integer-scaled ACF == the textbook full-mean estimator computed
    in float NumPy on two hand series; lags >= n emit nothing and a
    constant series (zero variance) yields null acf."""
    import numpy as np

    from greenex_py_spark.functions.timeseries import acf_lags

    rng = np.random.RandomState(7)
    ys = {"a": rng.randint(0, 50, size=12), "b": rng.randint(0, 9, size=5)}
    rows = [(g, int(t), int(y)) for g, arr in ys.items()
            for t, y in enumerate(arr)]
    rows += [("flat", t, 4) for t in range(6)]
    df = spark.createDataFrame(rows, "g string, t long, y long")
    got = {(r.g, r.lag_k): r for r in acf_lags(df, max_lag=7).collect()}

    for g, arr in ys.items():
        n, mu = len(arr), arr.mean()
        den = ((arr - mu) ** 2).sum()
        for k in range(1, min(7, n - 1) + 1):
            want = ((arr[k:] - mu) * (arr[:-k] - mu)).sum() / den
            r = got[(g, k)]
            assert r.n_days == n and r.n_pairs == n - k
            assert abs(r.acf - want) < 1e-6, (g, k, r.acf, want)
    # lag >= series length never emitted
    assert (("b", 5) not in got) and (("b", 4) in got)
    # zero-variance series: denominator 0 -> null, not NaN/Inf
    assert got[("flat", 1)].acf is None


def test_adamic_adar_hand_graph(spark):
    """Path a-b-c-d plus hub e linked to a,b,c: scores verified against
    the hand formula; adjacent pairs never emitted; the max_degree cap
    drops hub-pivoted pairs only."""
    import math

    from greenex_py_spark.functions.graph import adamic_adar

    edges = [("a", "b"), ("b", "c"), ("c", "d"),
             ("e", "a"), ("e", "b"), ("e", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r.host_a, r.host_b): r for r in adamic_adar(df).collect()}
    # degrees: a=2 b=3 c=3 d=1 e=3; only b/c/e ever pivot a pair
    w = {n: 1.0 / math.log(d) for n, d in
         {"b": 3, "c": 3, "e": 3}.items()}
    expect = {
        ("a", "c"): (2, w["b"] + w["e"]),   # via b and e
        ("b", "d"): (1, w["c"]),            # via c
        ("d", "e"): (1, w["c"]),            # via c
    }
    assert set(got) == set(expect)
    for k, (nc, sc) in expect.items():
        assert got[k].n_common == nc
        assert abs(got[k].aa_score - sc) < 1e-6
    # hub cap max_degree=2: only pivots a (deg 2) / d (deg 1) survive;
    # a's sole pair (b, e) is adjacent -> anti-joined away -> empty
    assert adamic_adar(df, max_degree=2).count() == 0


def test_kendall_tau_b_matches_bruteforce(spark):
    """Histogram-join tau-b == the O(n²) textbook pair scan on a small
    tied sample; perfectly concordant data gives exactly 1.0."""
    import itertools
    import math

    import numpy as np

    from greenex_py_spark.functions.stats import kendall_tau_b

    rng = np.random.RandomState(11)
    xs = rng.randint(0, 6, size=60)
    ys = (xs * 2 + rng.randint(-3, 4, size=60)).clip(min=0)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(xs, ys)], "x long, y long"
    )
    got = kendall_tau_b(df, "x", "y").collect()[0]

    c = d = tx = ty = 0
    for (x1, y1), (x2, y2) in itertools.combinations(zip(xs, ys), 2):
        if x1 == x2:
            tx += 1
            if y1 == y2:
                ty += 1
            continue
        if y1 == y2:
            ty += 1
        elif (x1 < x2) == (y1 < y2):
            c += 1
        else:
            d += 1
    n0 = len(xs) * (len(xs) - 1) // 2
    # n1/n2 count ALL same-x / same-y pairs (incl. double-tied ones)
    n1 = sum(1 for (x1, _), (x2, _) in
             itertools.combinations(zip(xs, ys), 2) if x1 == x2)
    n2 = sum(1 for (_, y1), (_, y2) in
             itertools.combinations(zip(xs, ys), 2) if y1 == y2)
    want = (c - d) / math.sqrt((n0 - n1) * (n0 - n2))
    assert got.n_docs == 60
    assert got.n_concordant == c and got.n_discordant == d
    assert abs(got.tau_b - want) < 1e-6
    mono = spark.createDataFrame([(i, i * 3) for i in range(9)],
                                 "x long, y long")
    assert kendall_tau_b(mono, "x", "y").collect()[0].tau_b == 1.0


def test_curvature_class_counts_paraboloid(spark):
    """ZT curvature sign classes against NumPy brute force on a 2-tile
    raster holding a bowl (z = x^2 + y^2): every interior non-flat
    pixel of a bowl is profile/plan consistent with the integer
    numerator signs, the apex pixel (g = h = 0) counts as flat, and
    the tile seam changes nothing."""
    import numpy as np

    from greenex_py_spark.geo.grid import GridSpec
    from greenex_py_spark.operators.focal import curvature_class_counts

    w_all, h_all = 8, 4
    cx, cy = 3, 2  # apex inside tile 0's interior
    z = np.array(
        [[float((x - cx) ** 2 + (y - cy) ** 2) for x in range(w_all)]
         for y in range(h_all)]
    )
    grid = GridSpec(origin_x=0.0, origin_y=0.0, res=1.0, tile_px=4,
                    npx_x=w_all, npx_y=h_all)
    rows = []
    for tx in range(2):
        sub = z[:, tx * 4:(tx + 1) * 4]
        rows.append((tx, 0, 4, 4, [float(v) for v in sub.ravel()]))
    tiles = spark.createDataFrame(
        rows, "tx long, ty long, w long, h long, px array<double>"
    )
    got = {(r.tx, r.ty): r
           for r in curvature_class_counts(tiles, grid, quant=1e3).collect()}

    q = np.round(z * 1e3).astype(np.int64)
    exp = {}
    for tx in range(2):
        stats = [0, 0, 0, 0, 0, 0]  # n_int, flat, pp, pn, lp, ln
        for y in range(1, h_all - 1):
            for x in range(max(1, tx * 4), min(w_all - 1, tx * 4 + 4)):
                d = int(q[y, x-1] + q[y, x+1] - 2 * q[y, x])
                e = int(q[y-1, x] + q[y+1, x] - 2 * q[y, x])
                g = int(q[y, x+1] - q[y, x-1])
                h = int(q[y+1, x] - q[y-1, x])
                f = int(-q[y-1, x-1] + q[y-1, x+1] + q[y+1, x-1]
                        - q[y+1, x+1])
                stats[0] += 1
                if g == 0 and h == 0:
                    stats[1] += 1
                    continue
                p = 4*d*g*g + 4*e*h*h + f*g*h
                pl = 4*d*h*h + 4*e*g*g - f*g*h
                stats[2] += p > 0
                stats[3] += p < 0
                stats[4] += pl > 0
                stats[5] += pl < 0
        exp[tx] = tuple(stats)
    for tx in range(2):
        r = got[(tx, 0)]
        assert (r.n_interior, r.n_flat, r.n_prof_pos, r.n_prof_neg,
                r.n_plan_pos, r.n_plan_neg) == exp[tx], tx
    # a bowl has exactly one flat pixel (the apex) and it sits in tile 0
    assert got[(0, 0)].n_flat == 1 and got[(1, 0)].n_flat == 0
    # bowls are convex everywhere: d = e = 2q > 0, so P > 0 off-apex
    assert got[(0, 0)].n_prof_neg == 0 and got[(1, 0)].n_prof_neg == 0


def test_mmr_rerank_matches_bruteforce(spark, sf_dir):
    """MMR greedy selection against a pure-Python re-derivation from
    cosine_topk's own output: identical picks, ranks, and scores for
    every query, and exactly n_select rows per query."""
    from greenex_py_spark.functions.similarity import (
        MMR_LAMBDA, MMR_OML, cosine_topk, mmr_rerank,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 6)
    got = mmr_rerank(q, emb, k=8, n_select=4).toPandas()
    assert (got.groupby("q_id").size() == 4).all()

    cand = cosine_topk(q, emb, k=8).toPandas()
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }
    for qid, grp in cand.groupby("q_id"):
        grp = grp.sort_values("n_id").reset_index(drop=True)
        ids = grp.n_id.to_list()
        vm = np.stack([vecs[i] for i in ids])
        nrm = np.sqrt((vm * vm).sum(axis=1))
        ps = np.round((vm @ vm.T) / (nrm[:, None] * nrm[None, :]), 6)
        rel = grp.sim.to_numpy(np.float64)
        picked = []
        for step in range(1, 5):
            best, best_score = -1, None
            for i in range(len(ids)):
                if i in picked:
                    continue
                m = max(ps[i, j] for j in picked) if picked else 0.0
                s = MMR_LAMBDA * rel[i] - MMR_OML * m
                if best_score is None or s > best_score:
                    best, best_score = i, s
            picked.append(best)
            row = got[(got.q_id == qid) & (got.mmr_rank == step)].iloc[0]
            assert row.n_id == ids[best], (qid, step)
            assert row.rel == rel[best], (qid, step)
            # unrounded by design: identical IEEE expression both sides
            assert row.mmr_score == best_score, (qid, step)
    # rank-1 pick is always the plain top-1 by relevance (m = 0)
    top1 = cand[cand["rank"] == 1].set_index("q_id").n_id
    r1 = got[got.mmr_rank == 1].set_index("q_id").n_id
    assert (top1.sort_index() == r1.sort_index()).all()


def test_cohens_kappa_hand_values(spark):
    """Kappa against the textbook worked example (Cohen 1960 shape):
    a 2x2 table with 20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no gives
    po = 0.7, pe = 0.5, kappa = 0.4; perfect agreement gives 1.0 and
    a constant pair of labelings gives NULL (pe = 1)."""
    from greenex_py_spark.functions.stats import cohens_kappa

    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5
        + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert (r.n_rows, r.n_agree) == (50, 35)
    # (35*50 - S) / (2500 - S), S = 25*30 + 25*20 = 1250 -> 0.4 exactly
    assert r.kappa == 0.4
    perfect = spark.createDataFrame(
        [("x", "x"), ("y", "y"), ("z", "z")], "a string, b string"
    )
    assert cohens_kappa(perfect, "a", "b").collect()[0].kappa == 1.0
    const = spark.createDataFrame([("x", "x")] * 4, "a string, b string")
    assert cohens_kappa(const, "a", "b").collect()[0].kappa is None
    # disjoint label sets: S = 0, kappa = A*N/N^2 = 0 (A = 0)
    disj = spark.createDataFrame(
        [("a", "p"), ("b", "q")], "a string, b string"
    )
    assert cohens_kappa(disj, "a", "b").collect()[0].kappa == 0.0


def test_dow_volume_anomaly_plants_spike(spark):
    """A planted 10x spike on one weekday is flagged and nothing else
    is; z matches the NumPy population z-score per weekday group; a
    constant weekday group yields NULL z and no flag."""
    import numpy as np

    from greenex_py_spark.functions.timeseries import dow_volume_anomaly

    # 4 weeks of Mondays/Tuesdays for one series: Mondays 10,10,10,100
    # (spike), Tuesdays constant 7 (zero variance).
    rows = []
    mon = [10, 10, 10, 100]
    for w in range(4):
        rows.append(("s", f"mon{w}", 0, mon[w]))
        rows.append(("s", f"tue{w}", 1, 7))
    df = spark.createDataFrame(rows, "g string, day string, dow long, y long")
    got = {r.day: r for r in dow_volume_anomaly(df, z_thresh=1).collect()}
    ys = np.array(mon, dtype=np.float64)
    z_exp = (ys - ys.mean()) / ys.std()  # population std
    for w in range(4):
        r = got[f"mon{w}"]
        assert abs(r.z - z_exp[w]) < 1e-12, (w, r.z, z_exp[w])
        assert r.is_anomaly == int(abs(z_exp[w]) > 1), w
    for w in range(4):
        r = got[f"tue{w}"]
        assert r.z is None and r.is_anomaly == 0
    # the spike week is the only flagged Monday at |z| > 1... the three
    # quiet Mondays sit at z = -0.577 each, the spike at +1.732
    assert [got[f"mon{w}"].is_anomaly for w in range(4)] == [0, 0, 0, 1]


def test_lexical_diversity_ratio(spark):
    """Templated rows repeat one transition; organic rows never repeat:
    the ratio separates them exactly, and 1-token docs are excluded."""
    from greenex_py_spark.functions.text import lexical_diversity

    df = spark.createDataFrame(
        [
            (1, "a b a b a b", "tmpl"),     # bigrams: ab,ba,ab,ba,ab -> 2/5
            (2, "a b", "tmpl"),             # ab -> duplicate of above
            (3, "x y z w", "org"),          # xy,yz,zw -> 3/3
            (4, "solo", "org"),             # excluded (<2 tokens)
        ],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in lexical_diversity(df).collect()}
    assert (got["tmpl"].n_bigrams, got["tmpl"].n_distinct) == (6, 2)
    assert got["tmpl"].diversity == 2.0 / 6.0
    assert (got["org"].n_bigrams, got["org"].n_distinct) == (3, 3)
    assert got["org"].diversity == 1.0


def test_trustrank_quantized_recursion(spark):
    """TrustRank against a NumPy replication of the same pico-int
    quantized recursion on a hand graph; nodes unreachable from the
    seed set end at rank 0 while PageRank would give them teleport
    mass."""
    import numpy as np

    from greenex_py_spark.functions.graph import trustrank

    # 0 -> 1 -> 2 -> 0 (cycle, seed 0); 3 -> 4 (island, no seed);
    # 2 is also dangling-free; 4 dangles.
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {
        r.node: r.rank
        for r in trustrank(edges, seeds, n_iters=3, damping=0.85).collect()
    }

    nodes = [0, 1, 2, 3, 4]
    out = {0: [1], 1: [2], 2: [0], 3: [4], 4: []}
    is_seed = {n: n == 0 for n in nodes}
    ns = 1
    r = {n: round(1.0 / ns, 9) if is_seed[n] else 0.0 for n in nodes}
    for _ in range(3):
        contrib = {n: 0 for n in nodes}
        for s in nodes:
            for d in out[s]:
                contrib[d] += int(np.round(r[s] / len(out[s]) * 1e12))
        dgp = sum(int(np.round(r[n] * 1e12)) for n in nodes if not out[n])
        r = {
            n: round(
                ((1.0 - 0.85) / ns if is_seed[n] else 0.0)
                + 0.85 * (contrib[n] / 1e12)
                + (0.85 * (dgp / 1e12) / ns if is_seed[n] else 0.0),
                9,
            )
            for n in nodes
        }
    assert got == r
    assert got[3] == 0.0 and got[4] == 0.0  # island starves
    assert got[0] > got[1] > 0.0


def test_rrf_fusion_hand_lists(spark):
    """RRF on two hand rankings: scores are exactly 1/(60+ra)+1/(60+rb),
    a doc present in only one list gets the single term, fused order
    follows the sums with id tie-breaks."""
    from greenex_py_spark.functions.retrieval import rrf_fusion

    a = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(2, 0.95), (4, 0.5)], "doc_id long, score double"
    )
    got = {r.doc_id: r for r in rrf_fusion(a, b, k=3, c=60).collect()}
    assert got[2].rrf_score == 1.0 / 62 + 1.0 / 61
    assert got[1].rrf_score == 1.0 / 61
    assert got[3].rrf_score == 1.0 / 63
    assert got[4].rrf_score == 1.0 / 62
    assert got[1].rank_b is None and got[4].rank_a is None
    order = sorted(got.values(), key=lambda r: r.fused_rank)
    assert [r.doc_id for r in order] == [2, 1, 4, 3]


def test_zonemap_prune_hand_layout(spark):
    """File-skipping audit on a hand dataset: ids interleave two far
    apart cell clusters so arrival files all straddle the query bbox
    while Morton files separate them cleanly."""
    from greenex_py_spark.engine.layout import zonemap_prune_stats

    # even ids in cluster A (gx,gy ~ [0,4)), odd ids in cluster B
    # (~[32,36)) — arrival files of 4 rows each contain both clusters.
    rows = []
    for i in range(32):
        base = 0 if i % 2 == 0 else 32
        rows.append((i, base + (i // 2) % 4, base + (i // 4) % 4))
    df = spark.createDataFrame(rows, "doc_id long, gx long, gy long")
    got = {
        r.layout: r
        for r in zonemap_prune_stats(
            df, bbox=(0, 7, 0, 7), shift=4, rows_per_file=4
        ).collect()
    }
    a, z = got["arrival"], got["zorder"]
    # every arrival file mixes the clusters -> all touched
    assert a.n_files == 8 and a.n_touched == 8 and a.rows_scanned == 32
    assert a.rows_matched == 16
    assert a.read_amplification == 2.0
    # Morton files: cluster A fills zkeys < 2^4 (file 0 after >>4);
    # cluster B sits at z >= 2048 — disjoint files, no false touches
    assert z.rows_matched == 16 and z.rows_scanned == 16
    assert z.n_touched < z.n_files
    assert z.read_amplification == 1.0


def test_modularity_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge: the natural partition
    gives the textbook Q = (4m·E − ΣD²)/(4m²) with m = 13, E = 12,
    D = (13, 13); an everyone-in-one-community partition gives Q = 0;
    a node missing from the labeling completes as a singleton."""
    from greenex_py_spark.functions.graph import modularity

    edges = []
    for base in (0, 4):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j))
    edges.append((0, 4))  # bridge
    e = spark.createDataFrame(edges, "src long, dst long")
    com = spark.createDataFrame(
        [(n, "a" if n < 4 else "b") for n in range(8)], "node long, label string"
    )
    r = modularity(e, com).collect()[0]
    m, ei = 13, 12
    sd2 = 13 * 13 + 13 * 13
    assert (r.n_communities, r.m_edges, r.e_intra) == (2, m, ei)
    assert r.modularity == (4 * m * ei - sd2) / (4 * m * m)
    one = spark.createDataFrame(
        [(n, "x") for n in range(8)], "node long, label string"
    )
    r1 = modularity(e, one).collect()[0]
    assert r1.modularity == 0.0  # 4m·m − (2m)² = 0
    # drop node 7 from the labeling -> singleton community, 3 communities
    part = spark.createDataFrame(
        [(n, "a" if n < 4 else "b") for n in range(7)], "node long, label string"
    )
    assert modularity(e, part).collect()[0].n_communities == 3


def test_dedup_yield_planted_curve(spark):
    """Yield curve on a hand corpus: 20 unique docs (ids 0..19) then 20
    exact clones (ids 100..119) in 4 buckets -> first two buckets all
    new, last two all duplicates."""
    from greenex_py_spark.functions.dedup import dedup_yield

    rows = [(i, f"text {i}") for i in range(20)]
    rows += [(100 + i, f"text {i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.bucket: r for r in dedup_yield(df, n_buckets=4).collect()}
    assert [got[b].n_docs for b in range(4)] == [10, 10, 10, 10]
    assert [got[b].n_new for b in range(4)] == [10, 10, 0, 0]
    assert got[0].new_rate == 1.0 and got[3].new_rate == 0.0


def test_flow_path_length_hand_graph(spark):
    """Pointer-squaring path lengths on a hand pointer graph with a
    diagonal step and two basins: chain (0,0)->(1,0)->(2,1)->pit(3,1)
    (second hop diagonal) and isolated pit (9,9)."""
    from greenex_py_spark.operators.hydro import flow_path_length

    cells = spark.createDataFrame(
        [(0, 0, 1), (1, 0, 1), (2, 1, 1), (3, 1, 1), (9, 9, 1)],
        "mx long, my long, zq long",
    )
    down = spark.createDataFrame(
        [(0, 0, 1, 0), (1, 0, 2, 1), (2, 1, 3, 1)],
        "mx long, my long, nmx long, nmy long",
    )
    got = {(r.mx, r.my): r for r in flow_path_length(cells, down).collect()}
    assert (got[(0, 0)].n_steps, got[(0, 0)].n_diag) == (3, 1)
    assert (got[(1, 0)].n_steps, got[(1, 0)].n_diag) == (2, 1)
    assert (got[(2, 1)].n_steps, got[(2, 1)].n_diag) == (1, 0)
    assert (got[(3, 1)].n_steps, got[(3, 1)].n_diag) == (0, 0)
    assert (got[(9, 9)].n_steps, got[(9, 9)].n_diag) == (0, 0)


def test_scd2_history_hand_case(spark):
    """SCD2 collapses consecutive duplicates, versions changes in (ts,
    seq) order, closes each version at the next change, and flags the
    open row; timestamp ties break by the sequence column."""
    import datetime as dt

    from greenex_py_spark.engine.cdc import scd2_history

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        # user 1: A A B B A  -> versions A@0, B@20, A@40
        (1, ts(0), 1, "A"), (1, ts(10), 2, "A"), (1, ts(20), 3, "B"),
        (1, ts(30), 4, "B"), (1, ts(40), 5, "A"),
        # user 2: tie at ts(0) broken by event_id: A(6) then B(7)
        (2, ts(0), 6, "A"), (2, ts(0), 7, "B"),
        # user 3: single event
        (3, ts(5), 8, "C"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, event_type string")
    got = (
        scd2_history(df)
        .toPandas()
        .sort_values(["user_id", "version"])
        .reset_index(drop=True)
    )
    us = lambda s: int((t0 + dt.timedelta(seconds=s)).timestamp() * 1_000_000)
    exp = [
        (1, "A", us(0), us(20), 1, False),
        (1, "B", us(20), us(40), 2, False),
        (1, "A", us(40), None, 3, True),
        (2, "A", us(0), us(0), 1, False),
        (2, "B", us(0), None, 2, True),
        (3, "C", us(5), None, 1, True),
    ]
    assert len(got) == len(exp)
    for i, (u, a, vf, vt, v, cur) in enumerate(exp):
        r = got.iloc[i]
        assert (r.user_id, r.attr, int(r.valid_from_us), int(r.version), bool(r.is_current)) == (u, a, vf, v, cur)
        assert (pd.isna(r.valid_to_us) and vt is None) or int(r.valid_to_us) == vt
    # exactly one open row per user
    assert got.groupby("user_id").is_current.sum().eq(1).all()


def test_scd2_intervals_tile_the_timeline(spark, sf_dir):
    """On the real event log: per user, version k's valid_to equals
    version k+1's valid_from (no gaps/overlaps) and version counts are
    consecutive from 1."""
    from greenex_py_spark.engine.cdc import scd2_history

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = scd2_history(ev).toPandas().sort_values(["user_id", "version"])
    for _, g in got.groupby("user_id"):
        assert list(g.version) == list(range(1, len(g) + 1))
        nxt = g.valid_from_us.shift(-1)
        closed = g.valid_to_us.notna()
        assert (g.valid_to_us[closed] == nxt[closed]).all()
        assert g.is_current.iloc[-1] and not g.is_current.iloc[:-1].any()


def test_ndcg_hand_parity_and_perfect_ranking(spark):
    """ndcg_at_k equals a NumPy recomputation with the same md5 grades
    and integer weights, and scoring BY the grade itself yields 1.0."""
    import hashlib

    from greenex_py_spark.functions.retrieval import NDCG_WEIGHTS_MICRO, ndcg_at_k

    def grade(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 4

    rows = [("s1", i, float(100 - i)) for i in range(1, 26)]
    rows += [("s2", i, float(i % 7)) for i in range(26, 41)]
    df = spark.createDataFrame(rows, "source string, doc_id long, score double")
    got = ndcg_at_k(df, k=10).toPandas().set_index("source")
    import numpy as np

    for src, grp in {
        "s1": [(i, 100.0 - i) for i in range(1, 26)],
        "s2": [(i, float(i % 7)) for i in range(26, 41)],
    }.items():
        ranked = sorted(grp, key=lambda t: (-t[1], t[0]))[:10]
        dcg = sum(
            (2 ** grade(i) - 1) * NDCG_WEIGHTS_MICRO[r]
            for r, (i, _) in enumerate(ranked)
        )
        ideal = sorted(grp, key=lambda t: (-grade(t[0]), t[0]))[:10]
        idcg = sum(
            (2 ** grade(i) - 1) * NDCG_WEIGHTS_MICRO[r]
            for r, (i, _) in enumerate(ideal)
        )
        assert got.loc[src, "dcg_micro"] == dcg
        assert got.loc[src, "idcg_micro"] == idcg
        assert got.loc[src, "ndcg"] == round(dcg / idcg, 6)
    # score == grade -> the ranking IS ideal (ties both break by id)
    perfect = spark.createDataFrame(
        [("p", i, float(grade(i))) for i in range(1, 30)],
        "source string, doc_id long, score double",
    )
    gp = ndcg_at_k(perfect, k=10).toPandas()
    assert (gp.ndcg == 1.0).all()


def test_merge_apply_roundtrip_and_hand_case(spark):
    """merge_apply(old, diff(old,new) with payloads) == new exactly, and
    a hand CDC batch applies add/update/delete correctly."""
    from greenex_py_spark.engine.cdc import merge_apply, snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d"), (5, "e")], "doc_id long, text string"
    )
    batch = snapshot_diff(old, new).join(new, "doc_id", "left").select(
        "doc_id", "status", "text"
    )
    got = merge_apply(old, batch).toPandas().sort_values("doc_id").reset_index(drop=True)
    want = new.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert got.equals(want)
    # hand batch: delete 1, update 2, add 9
    hand = spark.createDataFrame(
        [(1, "deleted", None), (2, "updated", "bb"), (9, "added", "z")],
        "doc_id long, status string, text string",
    )
    got2 = merge_apply(old, hand).toPandas().sort_values("doc_id")
    assert list(got2.doc_id) == [2, 3, 4, 9]
    assert list(got2.text) == ["bb", "c", "d", "z"]


def test_classification_prf_hand_confusion(spark):
    """PRF counts match a hand confusion matrix, including a class that
    is only ever predicted (tp=0, fn=0) and one never predicted."""
    from greenex_py_spark.functions.stats import classification_prf

    rows = (
        [("en", "en")] * 8 + [("en", "de")] * 2
        + [("de", "de")] * 5 + [("de", "fr")] * 1
        + [("nl", "fr")] * 3  # 'nl' never predicted, 'fr' never labeled
    )
    df = spark.createDataFrame(rows, "lang string, pred string")
    got = classification_prf(df, "lang", "pred").toPandas().set_index("class")
    assert got.loc["en"].tp == 8 and got.loc["en"].fp == 0 and got.loc["en"].fn == 2
    assert got.loc["en"].precision == 1.0 and got.loc["en"].recall == 0.8
    assert got.loc["de"].tp == 5 and got.loc["de"].fp == 2 and got.loc["de"].fn == 1
    assert got.loc["de"].f1 == round(10 / 13, 6)
    assert got.loc["fr"].tp == 0 and got.loc["fr"].fp == 4 and got.loc["fr"].fn == 0
    assert got.loc["fr"].precision == 0.0 and pd.isna(got.loc["fr"].recall)
    assert got.loc["nl"].tp == 0 and got.loc["nl"].fn == 3 and pd.isna(got.loc["nl"].precision)


def test_wilson_lower_bound_hand_values(spark):
    """Wilson LB matches the closed-form NumPy evaluation and ranks a
    95/100 group above a 2/2 group (the small-sample correction)."""
    import math

    from greenex_py_spark.functions.stats import WILSON_Z, WILSON_Z2, wilson_lower_bound

    rows = [("big", i < 95) for i in range(100)] + [("tiny", True), ("tiny", True)]
    df = spark.createDataFrame(rows, "src string, good boolean")
    got = wilson_lower_bound(df, "src", "good").toPandas().set_index("src")

    def wlb(k, n):
        p = k / n
        return (p + WILSON_Z2 / (2 * n)
                - WILSON_Z * math.sqrt((p * (1 - p) + WILSON_Z2 / (4 * n)) / n)) \
               / (1 + WILSON_Z2 / n)

    assert abs(got.loc["big"].wilson_lb - wlb(95, 100)) < 1e-12
    assert abs(got.loc["tiny"].wilson_lb - wlb(2, 2)) < 1e-12
    assert got.loc["big"].wilson_lb > got.loc["tiny"].wilson_lb


def test_calibration_bins_hand_case(spark):
    """Bin assignment, counts, integer-exact mean and rate match a hand
    computation; out-of-range scores clamp to the edge bins."""
    from greenex_py_spark.functions.stats import calibration_bins

    rows = [
        (0.05, True), (0.05, False),          # bin 0
        (0.55, True), (0.551, True), (0.56, False),  # bin 5
        (1.5, True), (-0.5, False),           # clamp to 9 and 0
    ]
    df = spark.createDataFrame(rows, "score double, y boolean")
    got = (
        calibration_bins(df, "score", "y", n_bins=10, lo=0.0, hi=1.0)
        .toPandas().set_index("bin")
    )
    assert got.loc[0].n == 3 and got.loc[0].pos_rate == 1 / 3
    exp_mean0 = (50000 + 50000 + round(-0.5 * 1e6)) / (3 * 1e6)
    assert got.loc[0].mean_score == exp_mean0
    assert got.loc[5].n == 3
    assert got.loc[5].mean_score == (550000 + 551000 + 560000) / (3 * 1e6)
    assert got.loc[5].pos_rate == 2 / 3
    assert got.loc[9].n == 1 and got.loc[9].pos_rate == 1.0
    assert got.loc[5].gap == abs(got.loc[5].mean_score - got.loc[5].pos_rate)


def test_pq_topk_hand_adc_and_determinism(spark, sf_dir):
    """PQ codes/ADC match a NumPy reimplementation (same slicing,
    round-6, micro-int contract) and the search is rerun-deterministic."""
    from greenex_py_spark.functions.similarity import pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    got = pq_topk(q, emb, k=10, m=4, ksub=16, dim=64).toPandas()
    assert set(got.columns) == {"q_id", "n_id", "adc", "rank"}
    assert (got.groupby("q_id")["rank"].max() == 10).all()

    ep = emb.toPandas().sort_values("vec_id")
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for r in ep.itertuples()}
    cents = {c: vecs[c] for c in range(16)}
    sub = 16

    def d2(a, b):
        return round(float(((a - b) ** 2).sum()), 6)

    def code(v):
        out = []
        for j in range(4):
            s = v[j * sub:(j + 1) * sub]
            best = min(
                range(16), key=lambda c: (d2(s, cents[c][j * sub:(j + 1) * sub]), c)
            )
            out.append(best)
        return out

    # check the ADC of a few returned pairs exactly
    for row in got.head(20).itertuples():
        qv, nv = vecs[int(row.q_id)], vecs[int(row.n_id)]
        ncode = code(nv)
        adc_micro = sum(
            round(
                d2(qv[j * sub:(j + 1) * sub],
                   cents[ncode[j]][j * sub:(j + 1) * sub]) * 1_000_000
            )
            for j in range(4)
        )
        assert row.adc == adc_micro / 1_000_000.0
    got2 = pq_topk(q, emb, k=10, m=4, ksub=16, dim=64).toPandas()
    a = got.sort_values(["q_id", "rank"]).reset_index(drop=True)
    b = got2.sort_values(["q_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_anova_oneway_matches_numpy(spark, sf_dir):
    """ANOVA sums/SS/F match a NumPy groupwise recomputation on the real
    event values, and a constructed equal-means case yields F ≈ 0."""
    from greenex_py_spark.functions.stats import anova_oneway

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100.0).cast("long").alias("vq"),
    )
    groups = sorted(ev.select("g").distinct().toPandas().g)
    got = anova_oneway(ev, "g", "vq", groups).toPandas().iloc[0]
    pdf = ev.toPandas()
    grand = pdf.vq.sum()
    n = len(pdf)
    sb = sum(
        gg.vq.sum() ** 2 / len(gg) for _, gg in pdf.groupby("g")
    ) - grand ** 2 / n
    sw = (pdf.vq.astype(float) ** 2).sum() - sum(
        gg.vq.sum() ** 2 / len(gg) for _, gg in pdf.groupby("g")
    )
    assert got.n_total == n
    assert got.df_between == len(groups) - 1
    assert got.df_within == n - len(groups)
    assert abs(got.ss_between - sb) / max(abs(sb), 1) < 1e-9
    assert abs(got.ss_within - sw) / max(abs(sw), 1) < 1e-9
    f = (sb / (len(groups) - 1)) / (sw / (n - len(groups)))
    assert abs(got.f_stat - f) / f < 1e-9
    flat = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 10), ("b", 20), ("c", 20), ("c", 10)],
        "g string, vq long",
    )
    g0 = anova_oneway(flat, "g", "vq", ["a", "b", "c"]).toPandas().iloc[0]
    assert abs(g0.f_stat) < 1e-12 and abs(g0.ss_between) < 1e-6


def test_stream_enrich_equals_batch_twin(spark, tmp_path):
    """The stream-static enrichment join + windowed count equals the
    batch join/GROUP BY on the closed windows."""
    import datetime as dt

    from greenex_py_spark.streaming.ingest import enriched_windowed_counts

    t0 = dt.datetime(2026, 3, 1)
    rows = [
        (i, t0 + dt.timedelta(hours=6 * i), i % 3, "view", 1.0, "")
        for i in range(40)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    dim = spark.createDataFrame(
        [(0, 100), (1, 200), (2, 200)], "user_id long, segment long"
    )
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    ev.coalesce(2).write.parquet(src)
    enriched_windowed_counts(spark, src, sink, ckpt, dim)
    spark.createDataFrame([], ev.schema).coalesce(1).write.mode("append").parquet(src)
    enriched_windowed_counts(spark, src, sink, ckpt, dim)
    got = (
        spark.read.parquet(sink)
        .toPandas()
        .sort_values(["win_start", "segment"])
        .reset_index(drop=True)
    )
    wm = max(r[1] for r in rows) - dt.timedelta(days=2)
    from collections import Counter

    cnt = Counter()
    for _, ts, uid, *_ in rows:
        ws = ts.replace(hour=0, minute=0, second=0)
        if ws + dt.timedelta(days=1) <= wm:
            cnt[(ws, 100 if uid == 0 else 200)] += 1
    assert len(got) == len(cnt)
    for row in got.itertuples():
        assert cnt[(row.win_start.to_pydatetime(), row.segment)] == row.n_events


def test_json_field_stats_malformed_and_missing(spark):
    """Typed JSON extraction: valid values aggregate; malformed JSON and
    missing fields count as n_null, never dropped."""
    from greenex_py_spark.functions.semistructured import json_field_stats

    rows = [
        ("a", '{"k": 5}'), ("a", '{"k": -2}'), ("a", '{"j": 9}'),
        ("a", "not json"), ("b", '{"k": 10}'), ("b", None),
    ]
    df = spark.createDataFrame(rows, "event_type string, props string")
    got = json_field_stats(df).toPandas().set_index("grp")
    assert got.loc["a"].n == 4 and got.loc["a"].n_null == 2
    assert got.loc["a"].sum_k == 3 and got.loc["a"].min_k == -2 and got.loc["a"].max_k == 5
    assert got.loc["b"].n == 2 and got.loc["b"].n_null == 1 and got.loc["b"].sum_k == 10


def test_mase_seasonal_naive_hand_series(spark):
    """MASE on a constructed weekly-periodic series: seasonal-naive
    error 0 → MASE 0; on a constant series naive error 0 → NULL."""
    from greenex_py_spark.functions.timeseries import mase_seasonal_naive

    periodic = [(("p"), t, (t % 7) * 10) for t in range(21)]
    constant = [(("c"), t, 5) for t in range(21)]
    ramp = [(("r"), t, t) for t in range(21)]
    df = spark.createDataFrame(periodic + constant + ramp, "g string, t long, y long")
    got = mase_seasonal_naive(df).toPandas().set_index("series")
    assert got.loc["p"].sae_seasonal == 0 and got.loc["p"].mase == 0.0
    assert pd.isna(got.loc["c"].mase)  # naive error 0 -> undefined
    # ramp: seasonal |y_t - y_{t-7}| = 7 each (14 terms), naive = 1 each (20)
    assert got.loc["r"].sae_seasonal == 7 * 14 and got.loc["r"].sae_naive == 20
    assert got.loc["r"].mase == (7 * 14 / 14) / (20 / 20)


def test_dq_check_null_is_violation(spark):
    """dq_check counts true and NULL violation predicates, passes only
    at zero violations."""
    from greenex_py_spark.functions.audit import dq_check

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (-1.0,), (None,)], "value double"
    )
    got = dq_check(
        df, F.col("value").isNull() | ~(F.col("value") >= 0.0), "nonneg"
    ).toPandas().iloc[0]
    assert got.n_total == 4 and got.n_violations == 2 and not got["pass"]
    ok = dq_check(df.filter(F.col("value") > 0), ~(F.col("value") >= 0.0), "ok")
    row = ok.toPandas().iloc[0]
    assert row.n_violations == 0 and row["pass"]


def test_equidepth_histogram_exact_depths(spark):
    """Buckets differ by at most one in depth, cover min..max, and
    match a NumPy rank computation on a skewed input."""
    from greenex_py_spark.functions.sketches import equidepth_histogram

    vals = [0] * 50 + list(range(1, 31))  # heavy duplication at 0
    rows = [(v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "v long, s long")
    got = equidepth_histogram(df, "v", "s", n_buckets=8).toPandas().sort_values("bucket")
    assert list(got.bucket) == list(range(8))
    assert got.n.sum() == len(vals)
    assert got.n.max() - got.n.min() <= 1
    order = sorted(rows)
    for b, grp in enumerate(np.array_split(np.array([v for v, _ in order]), 8)):
        row = got[got.bucket == b].iloc[0]
        assert row.lo == grp.min() and row.hi == grp.max() and row.n == len(grp)


def test_rolling_median_hand_series(spark):
    """Rolling lower-median matches a NumPy recomputation including the
    warm-up partial windows, and one spike day cannot move it."""
    from greenex_py_spark.functions.timeseries import rolling_median

    ys = [5, 5, 5, 1000, 5, 5, 5, 5, 5, 5]
    df = spark.createDataFrame(
        [("a", t, y) for t, y in enumerate(ys)], "g string, t long, y long"
    )
    got = rolling_median(df, window=7).toPandas().sort_values("t")
    for row in got.itertuples():
        winvals = sorted(ys[max(0, row.t - 6): row.t + 1])
        assert row.n_win == len(winvals)
        assert row.roll_median == winvals[(len(winvals) + 1) // 2 - 1]
    assert (got.roll_median == 5).all()  # the spike never wins


def test_rfm_segments_hand_check(spark, sf_dir):
    """RFM scores are 1..5 equi-depth tiles consistent with a pandas
    rank recomputation; segment concatenates the three scores."""
    from greenex_py_spark.operators.funnel import rfm_segments

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = rfm_segments(ev).toPandas().sort_values("user_id").reset_index(drop=True)
    p = ev.filter(F.col("event_type") == "purchase").toPandas()
    p["d"] = p.ts.dt.floor("D")
    p["cents"] = (p.value * 100.0).round().astype("int64")
    base = p.groupby("user_id").agg(
        last_d=("d", "max"), frequency=("d", "size"), monetary=("cents", "sum")
    ).reset_index()
    ref = base.last_d.max()
    base["recency_days"] = (ref - base["last_d"]).dt.days
    n = len(base)
    assert len(got) == n

    def tiles(df, col, asc):
        o = df.sort_values([col, "user_id"], ascending=[asc, True]).reset_index()
        return {
            int(r.user_id): 5 - (i * 5) // n for i, r in o.iterrows()
        }

    rt = tiles(base, "recency_days", True)
    ft = tiles(base, "frequency", False)
    mt = tiles(base, "monetary", False)
    for row in got.itertuples():
        u = int(row.user_id)
        assert (row.r_score, row.f_score, row.m_score) == (rt[u], ft[u], mt[u])
        assert row.segment == f"{rt[u]}{ft[u]}{mt[u]}"
        assert 1 <= row.r_score <= 5


def test_stream_merge_apply_two_batches_and_idempotent_replay(spark, tmp_path):
    """foreachBatch MERGE: two disjoint-key CDC files apply in sequence
    to the snapshot; a re-drain with the same checkpoint is a no-op
    (exactly-once), and a NEW file after that still applies."""
    from greenex_py_spark.streaming.upsert import stream_merge_apply

    src, table, ckpt = (str(tmp_path / d) for d in ("src", "table", "ckpt"))
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "doc_id long, text string"
    ).write.parquet(table)
    schema = "doc_id long, status string, text string"
    spark.createDataFrame(
        [(2, "updated", "B"), (5, "added", "e")], schema
    ).coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [(3, "deleted", None)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    stream_merge_apply(spark, src, table, ckpt, schema)
    got = spark.read.parquet(table).toPandas().sort_values("doc_id")
    assert list(got.doc_id) == [1, 2, 4, 5]
    assert list(got.text) == ["a", "B", "d", "e"]
    # replay with the same checkpoint: nothing re-applies
    stream_merge_apply(spark, src, table, ckpt, schema)
    again = spark.read.parquet(table).toPandas().sort_values("doc_id")
    assert list(again.text) == ["a", "B", "d", "e"]
    # a genuinely new batch still lands
    spark.createDataFrame(
        [(1, "deleted", None)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    stream_merge_apply(spark, src, table, ckpt, schema)
    final = spark.read.parquet(table).toPandas().sort_values("doc_id")
    assert list(final.doc_id) == [2, 4, 5]


def test_grouped_median_mad_hand_case(spark):
    """Median/MAD match NumPy's lower-median on even and odd group
    sizes, and an outlier moves neither."""
    from greenex_py_spark.functions.stats import grouped_median_mad

    rows = [("a", v) for v in [1, 3, 5, 7, 1000]]   # med 5, |d|=[4,2,0,2,995] -> mad 2
    rows += [("b", v) for v in [10, 20, 30, 40]]    # lower med 20, |d|=[10,0,10,20] -> mad 10
    df = spark.createDataFrame(rows, "grp string, v long")
    got = grouped_median_mad(df, "grp", "v").toPandas().set_index("grp")
    assert got.loc["a", "n"] == 5 and got.loc["a", "median"] == 5
    assert got.loc["a", "mad"] == 2
    assert got.loc["b", "n"] == 4 and got.loc["b", "median"] == 20
    assert got.loc["b", "mad"] == 10


def test_theil_sen_trend_hand_cases(spark):
    """Exact line -> exact slope/intercept regardless of one outlier;
    matches a NumPy median-of-pairwise-slopes recomputation."""
    from greenex_py_spark.functions.stats import theil_sen_trend

    pts = [(t, 3 * t + 7) for t in range(10)]
    df = spark.createDataFrame(pts, "t long, y long")
    r = theil_sen_trend(df).toPandas().iloc[0]
    assert r.slope == 3.0 and r.intercept == 7.0
    assert r.n_points == 10 and r.n_pairs == 45
    # outlier at t=5 barely moves the median slope
    pts2 = [(t, 3 * t + 7 + (500 if t == 5 else 0)) for t in range(10)]
    df2 = spark.createDataFrame(pts2, "t long, y long")
    r2 = theil_sen_trend(df2).toPandas().iloc[0]
    slopes = sorted(
        ((y2 - y1) / (t2 - t1), t1, t2)
        for i, (t1, y1) in enumerate(pts2)
        for (t2, y2) in pts2[i + 1:]
    )
    exp = slopes[(len(slopes) + 1) // 2 - 1][0]
    assert r2.slope == exp


def _bfs_patch_sizes(mask):
    """Independent 4-connectivity component-size mirror (BFS flood)."""
    from collections import deque

    import numpy as np

    h, w = mask.shape
    lab = np.full(mask.shape, -1, dtype=np.int64)
    sizes = []
    for sy, sx in zip(*np.nonzero(mask)):
        if lab[sy, sx] >= 0:
            continue
        lab[sy, sx] = len(sizes)
        q, n = deque([(sy, sx)]), 0
        while q:
            y, x = q.popleft()
            n += 1
            for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                yy, xx = y + dy, x + dx
                if 0 <= yy < h and 0 <= xx < w and mask[yy, xx] \
                        and lab[yy, xx] < 0:
                    lab[yy, xx] = len(sizes)
                    q.append((yy, xx))
        sizes.append(n)
    return sorted(sizes)


def _tile_grid_fixture(spark, z, tile_px=4):
    """Cut an arbitrary (h, w) array into a tile_px x tile_px tile grid."""
    import numpy as np
    from greenex_py_spark.geo.grid import GridSpec

    h_all, w_all = z.shape
    grid = GridSpec(origin_x=0.0, origin_y=0.0, res=1.0, tile_px=tile_px,
                    npx_x=w_all, npx_y=h_all)
    rows = []
    for ty in range((h_all + tile_px - 1) // tile_px):
        for tx in range((w_all + tile_px - 1) // tile_px):
            sub = z[ty * tile_px:(ty + 1) * tile_px,
                    tx * tile_px:(tx + 1) * tile_px]
            rows.append((tx, ty, sub.shape[1], sub.shape[0],
                         [float(v) for v in sub.ravel()]))
    tiles = spark.createDataFrame(
        rows, "tx long, ty long, w long, h long, px array<double>"
    )
    return tiles, grid


def test_patch_sizes_random_masks(spark):
    """Distributed tile-CCL patch sizes == independent BFS flood fill
    for random masks spanning a 3x4 tile grid (all four border
    directions, seam-crossing components, clipped edge tiles)."""
    import numpy as np
    from greenex_py_spark.operators.patches import patch_sizes, tile_patch_parts

    rng = np.random.RandomState(11)
    for trial, (h, w, p) in enumerate(
        [(12, 16, 0.5), (12, 16, 0.7), (11, 14, 0.45), (12, 16, 1.0)]
    ):
        mask = (rng.rand(h, w) < p)
        z = np.where(mask, 1.0, -1.0)
        tiles, grid = _tile_grid_fixture(spark, z)
        got = patch_sizes(tile_patch_parts(tiles, grid, quant=1e3))
        got_sizes = sorted(r["n_px"] for r in got.collect())
        assert got_sizes == _bfs_patch_sizes(mask), trial


def test_patch_labels_are_min_pixel_index(spark):
    """The final patch label is the component's minimum global pixel
    index (row-major) — deterministic and content-addressed, no task
    ids anywhere."""
    import numpy as np
    from greenex_py_spark.operators.patches import patch_sizes, tile_patch_parts

    # one component spanning the seam between two tiles + an isolated px
    mask = np.zeros((4, 8), dtype=bool)
    mask[1, 2:7] = True          # crosses the tx=0/tx=1 seam
    mask[3, 7] = True
    z = np.where(mask, 1.0, -1.0)
    tiles, grid = _tile_grid_fixture(spark, z)
    got = {r["patch"]: r["n_px"]
           for r in patch_sizes(tile_patch_parts(tiles, grid, quant=1e3)).collect()}
    assert got == {1 * 8 + 2: 5, 3 * 8 + 7: 1}


def test_simplified_silhouette_numpy_mirror(spark):
    """Engine silhouette == a NumPy recomputation with the identical
    quantization chain (round-6 sqdist, sqrt, 1e-9 int mean) on a
    two-cluster toy set; tight clusters score near 1, the straddler
    scores low."""
    import numpy as np
    from greenex_py_spark.functions.clustering import simplified_silhouette

    pts = {
        0: [0.0, 0.0], 1: [10.0, 10.0],          # init centroids (id < k)
        2: [0.4, 0.1], 3: [-0.2, 0.3], 4: [10.1, 9.8],
        5: [9.7, 10.2], 6: [5.0, 5.0],           # straddler
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in pts.items()], "vec_id long, embedding array<double>"
    )
    got = {r["cluster"]: r for r in
           simplified_silhouette(df, k=2, iters=2).collect()}

    # NumPy mirror with the same determinism devices
    X = {i: np.array(v) for i, v in pts.items()}
    cents = {0: X[0].copy(), 1: X[1].copy()}
    for _ in range(2):
        asg = {}
        for i, x in X.items():
            d = {c: round(float(((x - cv) ** 2).sum()), 6)
                 for c, cv in cents.items()}
            asg[i] = min(d, key=lambda c: (d[c], c))
        for c in cents:
            mem = [X[i] for i in X if asg[i] == c]
            if mem:
                cents[c] = np.round(np.mean(mem, axis=0), 6)
    agg = {}
    for i, x in X.items():
        d = sorted(
            (round(float(((x - cv) ** 2).sum()), 6), c)
            for c, cv in cents.items()
        )
        a, b = np.sqrt(d[0][0]), np.sqrt(d[1][0])
        s = 0.0 if b == 0 else (b - a) / b
        sq = int(np.floor(s * 1e9 + 0.5))
        agg.setdefault(d[0][1], []).append(sq)
    for c, sqs in agg.items():
        assert got[c]["n_points"] == len(sqs)
        assert got[c]["mean_sil"] == round(sum(sqs) / len(sqs) / 1e9 + 0.0, 6)
    # sanity: both clusters score clearly positive (the straddler's
    # round-6-tied distances give it s = 0, pulling one mean to ~0.7)
    assert all(got[c]["mean_sil"] > 0.5 for c in got)


def test_ktruss_edges_hand_and_brute(spark):
    """4-truss keeps exactly the 4-clique and drops an attached
    triangle; a triangle chain needs TWO peel rounds to empty (the
    mutual-support cascade); matches a brute-force peel mirror."""
    from greenex_py_spark.functions.graph import ktruss_edges

    def brute(und, t):
        edges = {tuple(sorted(e)) for e in und}
        while True:
            nb = {}
            for a, b in edges:
                nb.setdefault(a, set()).add(b)
                nb.setdefault(b, set()).add(a)
            nxt = {e for e in edges
                   if len(nb[e[0]] & nb[e[1]]) >= t}
            if nxt == edges:
                return {e: len(nb[e[0]] & nb[e[1]]) for e in edges}
            edges = nxt
            if not edges:
                return {}

    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    tail = [(4, 5), (4, 6), (5, 6)]
    chain = [(11, 12), (12, 13), (11, 13), (12, 14), (13, 14),
             (13, 15), (14, 15)]
    und = clique + tail + chain
    df = spark.createDataFrame(und, "src long, dst long")
    got = {(r["a"], r["b"]): r["support"]
           for r in ktruss_edges(df, k=4, src_col="src", dst_col="dst").collect()}
    exp = brute(und, 2)
    assert got == exp
    assert set(got) == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}
    # k=3 keeps every triangle edge, with exact supports
    got3 = {(r["a"], r["b"]): r["support"]
            for r in ktruss_edges(df, k=3, src_col="src", dst_col="dst").collect()}
    assert got3 == brute(und, 1)


def test_kruskal_wallis_textbook(spark):
    """Engine H == direct average-rank computation (ties included),
    tie correction exact; the classic no-tie example gives the
    textbook value."""
    import numpy as np
    from greenex_py_spark.functions.stats import kruskal_wallis

    def direct(groups):
        vals = sorted(v for g in groups for v in g)
        n = len(vals)
        # average ranks with ties
        rank = {}
        i = 0
        while i < n:
            j = i
            while j < n and vals[j] == vals[i]:
                j += 1
            r = (i + 1 + j) / 2.0
            rank[vals[i]] = r
            i = j
        s = sum(
            int(np.floor((sum(rank[v] for v in g) ** 2 / (4 * len(g)) * 4)
                         * 1e6 + 0.5))
            for g in groups
        )  # note: engine quantizes R2²/(4n) where R2 = 2·Σr̄
        h = 12.0 * (s / 1e6) / (n * (n + 1.0)) - 3.0 * (n + 1.0)
        from collections import Counter
        t3t = sum(c ** 3 - c for c in Counter(vals).values())
        corr = 1.0 - t3t / (float(n) ** 3 - n)
        return round(h + 0.0, 6), round(h / corr + 0.0, 6)

    groups = [[27, 2, 4, 18, 7], [20, 8, 14, 36, 21], [34, 31, 3, 23, 30]]
    rows = [(f"g{i}", v) for i, g in enumerate(groups) for v in g]
    df = spark.createDataFrame(rows, "src string, v long")
    got = kruskal_wallis(df, "src", "v").collect()[0]
    h, hc = direct(groups)
    assert got["n_groups"] == 3 and got["n"] == 15
    assert got["h_stat"] == h and got["h_tie_corrected"] == hc
    assert got["h_stat"] == got["h_tie_corrected"]  # no ties -> corr = 1

    groups2 = [[1, 2, 2, 3], [2, 3, 3, 4], [4, 4, 5, 5]]
    rows2 = [(f"g{i}", v) for i, g in enumerate(groups2) for v in g]
    got2 = kruskal_wallis(
        spark.createDataFrame(rows2, "src string, v long"), "src", "v"
    ).collect()[0]
    h2, hc2 = direct(groups2)
    assert got2["h_stat"] == h2 and got2["h_tie_corrected"] == hc2
    assert got2["h_tie_corrected"] > got2["h_stat"]  # ties inflate H


def test_trimmed_mean_hand(spark):
    """k = floor(n·pct/100) values drop from EACH end; n < 10 with 10%
    trim keeps everything (k = 0); exact interval-overlap handling of
    ties spanning the cut."""
    from greenex_py_spark.functions.stats import trimmed_mean

    rows = [("a", v) for v in [1, 2, 2, 2, 3, 4, 5, 6, 7, 1000]]
    rows += [("b", v) for v in [5, 5, 9]]
    df = spark.createDataFrame(rows, "src string, v long")
    got = {r["g"]: r for r in trimmed_mean(df, "src", "v", 10).collect()}
    # a: n=10, k=1 -> drop one 1 and the 1000; mean of [2,2,2,3,4,5,6,7]
    assert got["a"]["n"] == 10 and got["a"]["n_trim"] == 1
    assert got["a"]["trimmed_mean"] == round(sum([2, 2, 2, 3, 4, 5, 6, 7]) / 8 + 0.0, 6)
    # b: n=3, k=0 -> plain mean
    assert got["b"]["n_trim"] == 0
    assert got["b"]["trimmed_mean"] == round(19 / 3 + 0.0, 6)
    # heavier trim cutting INTO a tie run: 25% of 8 -> k=2 on both ends
    rows2 = [("c", v) for v in [1, 1, 1, 4, 4, 9, 9, 9]]
    got2 = trimmed_mean(
        spark.createDataFrame(rows2, "src string, v long"), "src", "v", 25
    ).collect()[0]
    assert got2["n_trim"] == 2
    assert got2["trimmed_mean"] == round((1 + 4 + 4 + 9) / 4 + 0.0, 6)


def test_harmonic_centrality_hand(spark):
    """Path graph exact harmonic sums; disconnected component
    contributes nothing across the cut; quantization matches the
    1e-9 convention."""
    from greenex_py_spark.functions.graph import harmonic_centrality

    edges = [(1, 2), (2, 3), (3, 4), (10, 11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r for r in harmonic_centrality(df).collect()}

    def h(dists):
        return round(sum(int(np_floor(1.0 / d * 1e9 + 0.5)) for d in dists)
                     / 1e9 + 0.0, 6)

    import math

    def np_floor(x):
        return math.floor(x)

    assert got[1]["n_reachable"] == 3 and got[1]["harmonic"] == h([1, 2, 3])
    assert got[2]["n_reachable"] == 3 and got[2]["harmonic"] == h([1, 1, 2])
    assert got[10]["n_reachable"] == 1 and got[10]["harmonic"] == h([1])
    assert set(got) == {1, 2, 3, 4, 10, 11}


def test_boilerplate_blocks_classification(spark):
    """Nav/footer die by link density regardless of length, short
    blocks by length, mixed content-with-inline-anchor survives, and
    the extracted content is the kept texts in document order."""
    import hashlib
    from greenex_py_spark.functions.text import boilerplate_blocks

    nav = '<div><a href="/">Home page</a> <a href="/a">About this</a></div>'
    body = "This paragraph is long enough to be kept as main content."
    mixed = ('<p>Another real paragraph with enough words to pass '
             '<a href="/m">more</a></p>')
    page = "\n".join([nav, f"<p>{body}</p>", "<p>No</p>", mixed])
    df = spark.createDataFrame([(1, page)], "doc_id long, page string")
    r = boilerplate_blocks(df).collect()[0]
    assert r["n_blocks"] == 4 and r["n_content"] == 2
    expected = (body + " "
                + "Another real paragraph with enough words to pass more")
    assert r["content_md5"] == hashlib.md5(expected.encode()).hexdigest()
    # all-boilerplate page -> empty extraction, md5 of ""
    df2 = spark.createDataFrame([(2, nav)], "doc_id long, page string")
    r2 = boilerplate_blocks(df2).collect()[0]
    assert r2["n_content"] == 0
    assert r2["content_md5"] == hashlib.md5(b"").hexdigest()


def test_cost_distance_weighted_detour(spark):
    """Multi-source weighted transform == Dijkstra mirror on a grid
    where the diagonal detour around an expensive cell beats the
    direct path (weighted-min, not hop-count), greens cost 0."""
    import heapq
    from greenex_py_spark.operators.hydro import COST_BUCKET, cost_distance

    zq = {
        (0, 0): 1, (1, 0): -4 * COST_BUCKET, (2, 0): -1,
        (0, 1): -1, (1, 1): -1, (2, 1): -1,
    }
    cells = spark.createDataFrame(
        [(x, y, v) for (x, y), v in zq.items()], "mx long, my long, zq long"
    )
    got = {(r["mx"], r["my"]): r["cost"]
           for r in cost_distance(cells).collect()}

    def c(v):
        return 1 if v > 0 else 2 + min(3, (-v) // COST_BUCKET)

    # Dijkstra mirror
    dist = {k: 0 for k, v in zq.items() if v > 0}
    pq = [(0, k) for k in dist]
    heapq.heapify(pq)
    while pq:
        d0, (x, y) = heapq.heappop(pq)
        if d0 > dist.get((x, y), float("inf")):
            continue
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) == (0, 0) or (x + dx, y + dy) not in zq:
                    continue
                w = (c(zq[(x, y)]) + c(zq[(x + dx, y + dy)])) \
                    * (2 if dx * dy == 0 else 3)
                nd = d0 + w
                if nd < dist.get((x + dx, y + dy), float("inf")):
                    dist[(x + dx, y + dy)] = nd
                    heapq.heappush(pq, (nd, (x + dx, y + dy)))
    assert got == dist
    # the detour really is cheaper than the direct expensive path
    assert got[(2, 0)] == 21 < 26


def test_brown_forsythe_hand(spark):
    """Equal-spread groups give F near 0; one wide group drives F up;
    matches a direct median-centered ANOVA recomputation."""
    from greenex_py_spark.functions.stats import brown_forsythe

    tight = [10, 11, 12, 13, 14]
    wide = [0, 5, 12, 19, 24]
    rows = [("a", v) for v in tight] + [("b", v) for v in wide]
    df = spark.createDataFrame(rows, "g string, vq long")
    r = brown_forsythe(df, "g", "vq", ["a", "b"]).collect()[0]

    def med(xs):
        s = sorted(xs)
        return s[(len(s) + 1) // 2 - 1]

    za = [abs(v - med(tight)) for v in tight]
    zb = [abs(v - med(wide)) for v in wide]
    n0, s0, q0 = len(za), sum(za), sum(z * z for z in za)
    n1, s1, q1 = len(zb), sum(zb), sum(z * z for z in zb)
    n_tot, s_tot, q_tot = (
        float(n0) + float(n1), float(s0) + float(s1), float(q0) + float(q1)
    )
    sb = float(s0) * s0 / n0 + float(s1) * s1 / n1
    ss_b = sb - s_tot * s_tot / n_tot
    ss_w = q_tot - sb
    f = (ss_b / 1.0) / (ss_w / (n_tot - 2.0))
    assert r["n_total"] == 10 and r["df_between"] == 1 and r["df_within"] == 8
    assert r["ss_between"] == ss_b and r["ss_within"] == ss_w
    assert r["f_stat"] == f and f > 5
    # identical spreads (shifted copies) -> F == 0
    rows2 = [("a", v) for v in tight] + [("b", v + 100) for v in tight]
    r2 = brown_forsythe(
        spark.createDataFrame(rows2, "g string, vq long"), "g", "vq", ["a", "b"]
    ).collect()[0]
    assert r2["f_stat"] == 0.0


def test_wetness_index_hand(spark):
    """TWI on a 3-cell slope: acc and the steepest-drop tan match a
    direct recomputation; the terminal pit takes the r.topidx
    minimum-slope convention."""
    import math
    from greenex_py_spark.operators.hydro import TWI_TAN_MIN, wetness_index

    # elevations fall along x: (0,0)=30e6, (1,0)=20e6, (2,0)=5e6 (pit)
    # (magnitudes inside the dz^2*w int64 envelope of the D8 comparator)
    cells = spark.createDataFrame(
        [(0, 0, 30_000_000), (1, 0, 20_000_000), (2, 0, 5_000_000)],
        "mx long, my long, zq long",
    )
    f, res, quant = 20, 10.0, 1e6
    got = {(r["mx"], r["my"]): r
           for r in wetness_index(cells, res_m=res, factor=f).collect()}
    scale, cell = f * f * quant, res * f
    assert got[(0, 0)]["acc"] == 1
    assert got[(1, 0)]["acc"] == 2
    assert got[(2, 0)]["acc"] == 3
    t0 = (10_000_000 / scale) / (cell * 1.0)
    t1 = (15_000_000 / scale) / (cell * 1.0)
    assert got[(0, 0)]["twi"] == round(math.log(1 * cell / t0) + 0.0, 6)
    assert got[(1, 0)]["twi"] == round(math.log(2 * cell / t1) + 0.0, 6)
    assert got[(2, 0)]["twi"] == round(
        math.log(3 * cell / TWI_TAN_MIN) + 0.0, 6
    )


def test_expected_calibration_error_hand(spark):
    """ECE == Σ (n_b/N)·|mean−rate| recomputed directly; perfectly
    calibrated bins give 0."""
    from greenex_py_spark.functions.stats import expected_calibration_error

    # bin width 0.1 over [0,1]: scores 0.05 (bin 0) and 0.75 (bin 7)
    rows = [(0.05, True), (0.05, False), (0.75, True), (0.75, True),
            (0.75, False), (0.75, True)]
    df = spark.createDataFrame(rows, "score double, keep boolean")
    r = expected_calibration_error(
        df, "score", "keep", n_bins=10, lo=0.0, hi=1.0
    ).collect()[0]
    # bin0: mean 0.05, rate 0.5 -> gap 0.45, w 2/6; bin7: mean 0.75,
    # rate 0.75 -> gap 0 -> ece = 0.45/3
    assert r["n_total"] == 6 and r["n_bins_occupied"] == 2
    assert r["ece"] == round(0.45 * 2 / 6 + 0.0, 6)
    rows2 = [(0.25, v) for v in (True, False, False, False)]
    r2 = expected_calibration_error(
        spark.createDataFrame(rows2, "score double, keep boolean"),
        "score", "keep", n_bins=10, lo=0.0, hi=1.0,
    ).collect()[0]
    assert r2["ece"] == 0.0  # mean 0.25 == rate 1/4


def test_local_clustering_hand_and_bruteforce(spark):
    """Local clustering on a hand graph, then against a set-based
    brute force (common-neighbour intersection) on a deterministic
    pseudo-random graph with degree ties."""
    from greenex_py_spark.functions.graph import local_clustering

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r for r in local_clustering(df).collect()}
    # triangle (a,b,c); degrees a=2 b=2 c=3 d=1 (d excluded: deg < 2)
    assert set(got) == {"a", "b", "c"}
    assert got["a"]["n_tri"] == 1 and got["a"]["local_cc"] == 1.0
    assert got["b"]["local_cc"] == 1.0
    assert got["c"]["degree"] == 3 and got["c"]["n_tri"] == 1
    assert got["c"]["local_cc"] == round(2 * 1 / (3 * 2), 6)

    raw = [(i % 23, (i * i + 3) % 23) for i in range(140)]
    pairs = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    df2 = spark.createDataFrame(
        [(str(a), str(b)) for a, b in raw if a != b], "src string, dst string"
    )
    got2 = {int(r["node"]): r for r in local_clustering(df2).collect()}
    for v, nb in adj.items():
        d = len(nb)
        if d < 2:
            assert v not in got2
            continue
        tri = sum(len(adj[u] & nb) for u in nb) // 2
        assert got2[v]["degree"] == d
        assert got2[v]["n_tri"] == tri
        assert got2[v]["local_cc"] == round(2.0 * tri / (d * (d - 1)), 6)


def test_average_precision_hand(spark):
    """AP matches the direct precision-at-positive loop under the
    (score DESC, id ASC) order, including score ties split by id."""
    from greenex_py_spark.functions.audit import average_precision

    rows = [  # (doc_id, score, label)
        (1, 9, 1), (2, 9, 0), (3, 7, 1), (4, 7, 1), (5, 5, 0),
        (6, 5, 1), (7, 3, 0), (8, 1, 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, score long, label long")
    got = average_precision(df, "score", "label", "doc_id").collect()[0]
    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    s = pc = p = 0
    for rk, (_, _, y) in enumerate(order, start=1):
        if y == 1:
            pc += 1
            s += (pc * 10**12) // rk
            p += 1
    assert got["n_pos"] == p and got["n_docs"] == len(rows)
    assert got["avg_precision"] == s / (p * 1e12)
    # perfect ranking -> AP == 1
    perf = spark.createDataFrame(
        [(i, 100 - i, 1 if i <= 3 else 0) for i in range(1, 11)],
        "doc_id long, score long, label long",
    )
    assert average_precision(perf, "score", "label", "doc_id").collect()[0][
        "avg_precision"
    ] == 1.0


def test_wilcoxon_signed_rank_hand(spark):
    """W+/W-/z against the textbook computation with |d| ties, a zero
    difference dropped, and the tie-corrected normal z."""
    import math

    from greenex_py_spark.functions.stats import wilcoxon_signed_rank

    x = [10, 14, 9, 11, 20, 7, 13, 5]
    y = [8, 14, 12, 8, 15, 9, 10, 6]
    rows = list(zip(x, y))
    df = spark.createDataFrame(rows, "x long, y long")
    got = wilcoxon_signed_rank(df, "x", "y").collect()[0]
    d = [a - b for a, b in rows if a != b]
    ad = sorted(abs(v) for v in d)
    ranks = {}
    i = 0
    while i < len(ad):
        j = i
        while j < len(ad) and ad[j] == ad[i]:
            j += 1
        ranks[ad[i]] = (i + 1 + j) / 2  # average rank of the tie run
        i = j
    w_plus = sum(ranks[abs(v)] for v in d if v > 0)
    n = len(d)
    tie = sum(
        c**3 - c
        for c in (sum(1 for v in ad if v == u) for u in set(ad))
    )
    mu = n * (n + 1) / 4
    sigma = math.sqrt(n * (n + 1) * (2 * n + 1) / 24 - tie / 48)
    assert got["n_pairs"] == n
    assert got["w_plus"] == w_plus
    assert got["w_minus"] == n * (n + 1) / 2 - w_plus
    assert abs(got["z_value"] - (w_plus - mu) / sigma) < 1e-12


def test_holt_winters_additive_hand(spark):
    """HW recursion against an independent dict-based replay, plus the
    too-short-series guard."""
    from greenex_py_spark.functions.timeseries import (
        HW_ALPHA, HW_BETA, HW_GAMMA, holt_winters_additive,
    )

    ys = [12, 9, 14, 7, 11, 16, 5, 13, 10, 15, 8, 12, 17, 6,
          14, 11, 16, 9, 13, 18, 7]
    rows = [("s", t, y) for t, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "g string, t long, y long")
    got = holt_winters_additive(df).collect()[0]
    m = 7
    lvl = sum(ys[:m]) / m
    tr = (sum(ys[m:2 * m]) / m - sum(ys[:m]) / m) / m
    season = {i % m: ys[i] - lvl for i in range(m)}
    sse = 0.0
    for t in range(m, len(ys)):
        so = season[t % m]
        sse += (ys[t] - (lvl + tr + so)) ** 2
        ln = HW_ALPHA * (ys[t] - so) + (1 - HW_ALPHA) * (lvl + tr)
        tn = HW_BETA * (ln - lvl) + (1 - HW_BETA) * tr
        season[t % m] = HW_GAMMA * (ys[t] - ln) + (1 - HW_GAMMA) * so
        lvl, tr = ln, tn
    assert got["n_days"] == len(ys)
    assert got["level"] == pytest.approx(lvl, abs=1e-6)
    assert got["trend"] == pytest.approx(tr, abs=1e-6)
    assert got["s_next"] == pytest.approx(season[len(ys) % m], abs=1e-6)
    assert got["forecast1"] == pytest.approx(
        lvl + tr + season[len(ys) % m], abs=1e-6
    )
    assert got["sse"] == pytest.approx(sse, abs=1e-6)
    short = spark.createDataFrame(rows[:13], "g string, t long, y long")
    assert holt_winters_additive(short).count() == 0


def test_otsu_threshold_bruteforce(spark):
    """Otsu argmax against a NumPy brute force over every candidate
    threshold of a small two-mode raster."""
    import pandas as pd

    from greenex_py_spark.geo.grid import GridSpec
    from greenex_py_spark.operators.threshold import otsu_threshold

    rng = np.arange(64, dtype=np.float64)
    vals = np.where(rng % 3 == 0, rng / 100.0, 0.8 - rng / 200.0)
    tiles = spark.createDataFrame(
        pd.DataFrame(
            [{"layer": "v", "tx": 0, "ty": 0, "x0": 0.0, "y0": 0.0,
              "res": 1.0, "w": 8, "h": 8, "px": vals.tolist()}]
        )
    )
    grid = GridSpec.square(0.0, 0.0, 1.0, 8, 8)
    got = otsu_threshold(tiles, grid, quant=100.0).collect()[0]
    lv = np.sign(vals * 100.0) * np.floor(np.abs(vals * 100.0) + 0.5)
    lv = lv.astype(np.int64)
    n, s = len(lv), lv.sum()
    best = None
    for t in sorted(set(lv))[:-1]:
        c = int((lv <= t).sum())
        sc = int(lv[lv <= t].sum())
        var = (s * c - n * sc) ** 2 / (c * (n - c)) / n**2 / 10000.0
        if best is None or var > best[1] + 1e-15:
            best = (t, var, c, sc)
    t, var, c, sc = best
    assert got["thr_level"] == t
    assert got["n_below"] == c and got["n_above"] == n - c
    assert got["between_var"] == pytest.approx(var, rel=1e-12)
    assert got["mean_below"] == round(sc / c / 100.0 + 0.0, 6)
    assert got["mean_above"] == round((s - sc) / (n - c) / 100.0 + 0.0, 6)


def test_waiting_suppliers_matches_exists_formulation(spark, sf_dir):
    """The Q21-shape grouped decorrelation (one per-order aggregate)
    must equal the textbook correlated EXISTS / NOT-EXISTS triple
    self-join, computed independently in DuckDB."""
    import duckdb

    from greenex_py_spark.driver_queries import (
        _Q21_LATE_DAYS,
        _Q21_NATION,
        q_waiting_suppliers,
    )

    got = {
        r["s_name"]: r["numwait"]
        for r in q_waiting_suppliers(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    for t in ("lineitem", "orders", "supplier", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM"
                    f" read_parquet('{sf_dir}/{t}.parquet')")
    want = con.execute(f"""
        WITH late AS (
          SELECT l.*, o.o_orderdate FROM lineitem l
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          WHERE o.o_orderstatus = 'F'
        )
        SELECT s.s_name, count(DISTINCT l1.l_orderkey) AS numwait
        FROM late l1
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = '{_Q21_NATION}'
          AND l1.l_shipdate > l1.o_orderdate
                              + INTERVAL {_Q21_LATE_DAYS} DAY
          AND EXISTS (SELECT 1 FROM late l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l3.o_orderdate
                                + INTERVAL {_Q21_LATE_DAYS} DAY)
        GROUP BY 1
    """).df().set_index("s_name")["numwait"].to_dict()
    assert got == {k: int(v) for k, v in want.items()}
    plan = q_waiting_suppliers(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_min_cost_supplier_keeps_all_ties(spark, sf_dir):
    """Q2-shape join-back keeps EVERY supplier at the per-part minimum
    cost (no arbitrary tie-break), and every kept row IS the min of
    its part group (recomputed in pandas)."""
    from greenex_py_spark.driver_queries import q_min_cost_supplier

    got = q_min_cost_supplier(spark, sf_dir).toPandas()
    assert len(got) > 0
    per_part_min = got.groupby("p_partkey")["cost_cents"].transform("min")
    assert (got["cost_cents"] == per_part_min).all()
    # no duplicate (part, supplier) pairs
    assert not got.duplicated(["p_partkey", "s_suppkey"]).any()


def test_dtw_to_reference_brute_force(spark):
    """The window-scan DTW decomposition equals the textbook O(T²) DP
    recurrence computed in NumPy, on hand-built integer profiles."""
    from greenex_py_spark.functions.timeseries import dtw_to_reference

    T = 8
    rng = np.random.RandomState(7)
    ref = rng.randint(0, 1000, T)
    series = {g: rng.randint(0, 1000, T) for g in range(5)}
    series[3] = ref.copy()  # identical profile -> cost 0
    rows = []
    for g, qs in series.items():
        for j in range(1, T + 1):
            row = {"g": int(g), "j": j, "q": int(qs[j - 1])}
            for i in range(1, T + 1):
                row[f"r{i}"] = int(ref[i - 1])
            rows.append(row)
    df = spark.createDataFrame(rows)
    got = {r["g"]: r["dtw_cost"]
           for r in dtw_to_reference(df, T).collect()}

    INF = 1 << 60
    for g, qs in series.items():
        D = np.full((T + 1, T + 1), INF, dtype=np.int64)
        D[0][0] = 0
        for i in range(1, T + 1):
            for j in range(1, T + 1):
                c = abs(int(ref[i - 1]) - int(qs[j - 1]))
                D[i][j] = c + min(D[i - 1][j], D[i - 1][j - 1], D[i][j - 1])
        assert got[g] == D[T][T], f"series {g}"
    assert got[3] == 0


def test_signflip_permutation_brute_force(spark):
    """Replicate signs and the p-value recomputed with hashlib md5."""
    import hashlib as hl

    from greenex_py_spark.functions.stats import (
        _PERM_B,
        signflip_permutation_test,
    )

    rng = np.random.RandomState(11)
    d = rng.randint(-40, 60, 25)
    df = spark.createDataFrame(
        [(int(t), int(v)) for t, v in enumerate(d)], "t long, d long"
    )
    got = signflip_permutation_test(df, "d", "t").collect()[0]
    obs = abs(int(d.sum()))
    n_ge = 0
    for b in range(_PERM_B):
        tot = 0
        for t, v in enumerate(d):
            h = hl.md5(f"{b}:{t}".encode()).hexdigest()
            s = 1 if int(h[0], 16) % 2 == 0 else -1
            tot += s * int(v)
        if abs(tot) >= obs:
            n_ge += 1
    assert got["n_pairs"] == 25 and got["obs_diff"] == obs
    assert got["n_ge"] == n_ge
    assert got["p_value"] == round((n_ge + 1) / (_PERM_B + 1), 6)


def test_eb_shrinkage_pulls_toward_mean(spark, sf_dir):
    """Shrunk rates sit strictly between the raw rate and the prior
    mean, and small-n sources move further than large-n ones (the
    defining property of beta-binomial shrinkage); NumPy recompute of
    the method-of-moments prior agrees."""
    from greenex_py_spark.driver_queries import q_eb_shrinkage

    got = q_eb_shrinkage(spark, sf_dir).toPandas()
    assert len(got) == 20 and got["shrunk_rate"].notna().all()
    pq = got["raw_ppm"].to_numpy(dtype=np.int64)
    nd = len(pq)
    mu = pq.sum() / (nd * 1e6)
    v = (nd * (pq.astype(object) ** 2).sum() - int(pq.sum()) ** 2) \
        / (nd * (nd - 1)) / 1e12
    K = mu * (1 - mu) / v - 1
    assert K > 0
    for _, r in got.iterrows():
        want = (r["k_pass"] + mu * K) / (r["n_docs"] + K)
        assert abs(r["shrunk_rate"] - want) < 5e-7
        raw = r["k_pass"] / r["n_docs"]
        lo, hi = sorted((raw, mu))
        assert lo - 1e-9 <= r["shrunk_rate"] <= hi + 1e-9


def test_scc_components_hand(spark):
    """SCC on a hand graph: 3-cycle {a,b,c}, 2-cycle {d,e} reachable
    from the 3-cycle (one-way bridge, so NOT merged), sink f and
    source g as singletons — mutual reachability only, never weak
    connectivity."""
    from greenex_py_spark.functions.graph import scc_components

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"),      # 3-cycle
         ("c", "d"), ("d", "e"), ("e", "d"),      # bridge into 2-cycle
         ("e", "f"), ("g", "a")],                 # sink f, source g
        "src string, dst string",
    )
    got = {(r.node, r.scc_id, r.scc_size) for r in scc_components(e).collect()}
    assert got == {
        ("a", "a", 3), ("b", "a", 3), ("c", "a", 3),
        ("d", "d", 2), ("e", "d", 2),
        ("f", "f", 1), ("g", "g", 1),
    }


def test_radius_of_gyration_hand(spark):
    """rg numerator / site stats vs a NumPy brute force, including a
    negative coordinate (floor-division site snap, not truncation)."""
    import numpy as np

    from greenex_py_spark.operators.spacetime import radius_of_gyration

    fixes = [(1, 0, 0), (1, 30, 40), (1, 250, -10), (1, 30, 40)]
    df = spark.createDataFrame(fixes, "user_id long, qx long, qy long")
    r = radius_of_gyration(df, site_q=100).collect()[0]
    xs = np.array([f[1] for f in fixes]); ys = np.array([f[2] for f in fixes])
    n = len(fixes)
    num = n * int((xs * xs + ys * ys).sum()) - int(xs.sum()) ** 2 - int(ys.sum()) ** 2
    assert r["n_fixes"] == n and r["rg2_num"] == num
    assert r["rg_m"] == round(float(np.sqrt(num)) / n, 3)
    sites = {(x // 100, y // 100) for x, y in zip(xs, ys)}  # floor div
    assert r["n_sites"] == len(sites) == 2  # {(0,0), (2,-1)}
    assert r["top_share"] == round(3 / 4, 6)  # 3 fixes snap to (0,0)


def test_segregation_indices_hand(spark):
    """Duncan D + isolation vs the textbook formulas brute-forced in
    Python over ALL cells (including cells where a group is absent —
    the fold-in term the grouped frame never materializes)."""
    from greenex_py_spark.operators.spatial_stats import segregation_indices

    rows = (
        [(1, "en")] * 4 + [(1, "de")] * 1
        + [(2, "en")] * 1 + [(2, "de")] * 3
        + [(3, "de")] * 2            # no en at all in cell 3
    )
    df = spark.createDataFrame(rows, "cell long, grp string")
    got = {r["lang" if "lang" in r.asDict() else "grp"]: r
           for r in segregation_indices(df).collect()}
    cells = {1: {"en": 4, "de": 1}, 2: {"en": 1, "de": 3}, 3: {"de": 2}}
    N = sum(sum(c.values()) for c in cells.values())
    for g in ("en", "de"):
        A = sum(c.get(g, 0) for c in cells.values())
        B = N - A
        D = 0.5 * sum(
            abs(c.get(g, 0) / A - (sum(c.values()) - c.get(g, 0)) / B)
            for c in cells.values()
        )
        P = sum(
            (c.get(g, 0) / A) * (c.get(g, 0) / sum(c.values()))
            for c in cells.values()
        )
        r = got[g]
        assert r["n_members"] == A
        assert abs(r["dissimilarity"] - D) < 1e-6, (g, r["dissimilarity"], D)
        assert abs(r["isolation"] - P) < 1e-6, (g, r["isolation"], P)


def test_anderson_darling_k_brute_force(spark):
    """A²akN vs an independent NumPy transcription of Scholz &
    Stephens 1987 eq. 6 (midrank/tie version), on small samples with
    heavy ties and a group absent from whole value ranges."""
    import numpy as np

    from greenex_py_spark.functions.stats import anderson_darling_k

    samples = {
        "a": [1, 1, 2, 3, 3, 3, 7],
        "b": [2, 2, 2, 4, 4, 9, 9, 9],
        "c": [1, 5, 5, 5, 6],
    }
    rows = [(g, v) for g, vs in samples.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    r = anderson_darling_k(df, "g", "v").collect()[0]

    pooled = np.sort(np.concatenate([np.array(v) for v in samples.values()]))
    zs = np.unique(pooled)
    N = len(pooled)
    a2 = 0.0
    for vs in samples.values():
        arr = np.array(vs)
        ni = len(arr)
        inner = 0.0
        for z in zs:
            lj = int((pooled == z).sum())
            fij = int((arr == z).sum())
            Fij = int((arr <= z).sum())
            Cj = int((pooled <= z).sum())
            M = Fij - fij / 2.0
            B = Cj - lj / 2.0
            den = B * (N - B) - N * lj / 4.0
            inner += (lj / N) * (N * M - ni * B) ** 2 / den
        a2 += inner / ni
    a2 *= (N - 1) / N
    assert r["n_groups"] == 3 and r["n"] == N
    assert abs(r["a2_akn"] - a2) < 2e-5, (r["a2_akn"], a2)


def test_core_area_tile_stats_erosion(spark):
    """Tiled erosion counts == whole-array 3×3 erosion (zero-padded)
    for a solid block (core = interior), a 1-px-wide line (no core at
    all), and random masks — seam neighbourhoods included."""
    import numpy as np
    from greenex_py_spark.operators.focal import core_area_tile_stats

    def brute(mask):
        p = np.zeros((mask.shape[0] + 2, mask.shape[1] + 2), dtype=bool)
        p[1:-1, 1:-1] = mask.astype(bool)
        h, w = mask.shape
        core = np.ones((h, w), dtype=bool)
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                core &= p[dy:dy + h, dx:dx + w]
        return int(core.sum())

    rng = np.random.RandomState(13)
    solid = np.zeros((4, 8), dtype=np.int64); solid[0:4, 1:7] = 1
    line = np.zeros((4, 8), dtype=np.int64); line[2, :] = 1
    masks = [solid, line] + [(rng.rand(4, 8) < 0.6).astype(np.int64)
                             for _ in range(2)]
    for i, mask in enumerate(masks):
        z = np.where(mask == 1, 1.0, -1.0)
        tiles, grid = _two_tile_fixture(spark, z)
        rows = core_area_tile_stats(tiles, grid, quant=1e3).collect()
        assert sum(r["n_mask"] for r in rows) == int(mask.sum()), i
        assert sum(r["n_core"] for r in rows) == brute(mask), i
    # the solid block spans full height but borders the raster top and
    # bottom: erosion must strip those rows too (padding is background)


def test_ewma_chart_shift_detection(spark):
    """A flat series never flags; a sustained level shift flags at /
    after the shift; the quantized EWMA tracks the FP recursion."""
    from greenex_py_spark.functions.timeseries import EWMA_Q, ewma_chart

    flat = [("a", t, 50) for t in range(60)]
    shift = [("b", t, 50 if t < 40 else 100) for t in range(60)]
    df = spark.createDataFrame(flat + shift, "g string, t long, y long")
    got = {r["g"]: r for r in ewma_chart(df).collect()}
    assert got["a"]["n_flags"] == 0 and got["a"]["first_flag_t"] == -1
    assert got["a"]["ewma_last"] == 50.0
    b = got["b"]
    # EWMA needs ~8 steps at λ=1/5 to cross mean + σ after the shift
    assert b["n_flags"] > 0 and b["first_flag_t"] >= 40
    # FP twin of the integer recursion stays within quantization slack
    e = 50.0
    for t in range(1, 60):
        y = 50 if t < 40 else 100
        e = 0.2 * y + 0.8 * e
    assert abs(b["ewma_last"] - e) < 2e-5


def test_gwr_local_vs_numpy_wls(spark):
    """Local β/α vs NumPy weighted least squares at every occupied
    cell, including a constant-x neighbourhood (null coefficients)."""
    import numpy as np

    from greenex_py_spark.operators.spatial_stats import gwr_local

    offsets = [(dx, dy, 100 - 10 * (dx * dx + dy * dy))
               for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    cells = [(0, 0, 2, 10), (1, 0, 5, 31), (0, 1, 3, 17), (1, 1, 8, 50),
             (5, 5, 4, 9), (6, 5, 4, 13)]   # constant-x pair far away
    df = spark.createDataFrame(cells, "gx long, gy long, x long, y long")
    got = {(r["gx"], r["gy"]): r for r in gwr_local(df, offsets).collect()}
    pos = {(c[0], c[1]): (c[2], c[3]) for c in cells}
    for (gx, gy), (_, _) in pos.items():
        xs, ys, ws = [], [], []
        for dx, dy, w in offsets:
            nb = (gx - dx, gy - dy)  # contributor at target - offset...
            if nb in pos:
                xs.append(pos[nb][0]); ys.append(pos[nb][1]); ws.append(w)
        xs, ys, ws = map(np.array, (xs, ys, ws))
        r = got[(gx, gy)]
        den = ws.sum() * (ws * xs * xs).sum() - (ws * xs).sum() ** 2
        if den == 0:
            assert r["beta"] is None and r["alpha"] is None
            continue
        beta = (ws.sum() * (ws * xs * ys).sum()
                - (ws * xs).sum() * (ws * ys).sum()) / den
        alpha = ((ws * xs * xs).sum() * (ws * ys).sum()
                 - (ws * xs).sum() * (ws * xs * ys).sum()) / den
        assert abs(r["beta"] - beta) < 1e-6, (gx, gy)
        assert abs(r["alpha"] - alpha) < 1e-6, (gx, gy)


def test_district_diameter_hand(spark):
    """Diameter via hull pair scan == brute force over all points,
    for a square + interior points, a collinear run (degenerate hull),
    and a singleton (diameter 0 via the self-pair convention)."""
    import numpy as np

    from greenex_py_spark.operators.hull import district_diameter

    rows = (
        [(1, 0, 0), (1, 10, 0), (1, 0, 10), (1, 10, 10), (1, 5, 5),
         (1, 2, 9)]
        + [(2, i, 2 * i) for i in range(5)]     # collinear
        + [(3, 7, 7)]                           # singleton
    )
    df = spark.createDataFrame(rows, "blk long, qx long, qy long")
    got = {r["blk"]: r for r in
           district_diameter(df, ["blk"], "qx", "qy").collect()}
    for blk in (1, 2, 3):
        pts = np.array([(x, y) for b, x, y in rows if b == blk])
        d = pts[:, None, :] - pts[None, :, :]
        want = int((d[..., 0] ** 2 + d[..., 1] ** 2).max())
        assert got[blk]["diam2"] == want, blk
        assert got[blk]["diam_q"] == float(
            np.floor(np.sqrt(want) * 1000.0 + 0.5) / 1000.0
        )
    assert got[3]["diam2"] == 0


def test_mor_read_positions_not_keys(spark):
    """Deletion vectors address (file, position): deleting pos 2 of
    file 0 must remove exactly that physical row even when another
    file carries the same doc_id — and appends come back verbatim."""
    from greenex_py_spark.engine.cdc import mor_read

    base = spark.createDataFrame(
        [(0, 1, "a", 1), (0, 2, "b", 2), (0, 3, "c", 3),
         (1, 2, "dup-key-other-file", 1)],
        "file_id long, doc_id long, text string, pos long",
    )
    dv = spark.createDataFrame([(0, 2)], "file_id long, pos long")
    appends = spark.createDataFrame(
        [(0, 9, "new", -1)], "file_id long, doc_id long, text string, pos long"
    )
    got = {(r.file_id, r.doc_id, r.text)
           for r in mor_read(base, dv, appends).collect()}
    assert got == {(0, 1, "a"), (0, 3, "c"),
                   (1, 2, "dup-key-other-file"), (0, 9, "new")}


def test_rake_top_phrases_hand(spark):
    """RAKE degree/frequency arithmetic on a two-phrase corpus:
    'linear regression' (deg/freq: linear 4/2, regression 4/2 → score
    4.0 for the pair phrase) must outrank the lone frequent unigram."""
    from greenex_py_spark.functions.text import rake_top_phrases

    docs = spark.createDataFrame(
        [(1, "linear regression of the linear regression", "s")],
        "doc_id long, text string, source string",
    )
    # phrases: ["linear regression"] ×2 (split by stopwords of/the)
    r = rake_top_phrases(docs).collect()
    assert len(r) == 1
    row = r[0]
    # linear: freq 2, deg 2+2=4 → 2.0; regression same → phrase 4.0
    assert row["phrase"] == "linear regression"
    assert row["n_words"] == 2 and row["score"] == 4.0


def test_cochran_armitage_brute_force(spark):
    """CA Z² vs the textbook formula in floating point, on a table
    with a planted monotone trend and on a flat (null-trend) table."""
    import numpy as np

    from greenex_py_spark.functions.stats import cochran_armitage

    rows = []
    for s, (n, r) in enumerate([(50, 5), (50, 10), (50, 20), (50, 30)]):
        rows += [(s, 1)] * r + [(s, 0)] * (n - r)
    df = spark.createDataFrame(rows, "s long, o long")
    got = cochran_armitage(df, "s", "o").collect()[0]
    ns = np.array([50, 50, 50, 50]); rs = np.array([5, 10, 20, 30])
    ss = np.arange(4)
    N, R = ns.sum(), rs.sum()
    T, P1, P2 = (ss * rs).sum(), (ss * ns).sum(), (ss * ss * ns).sum()
    z2 = N * (N * T - R * P1) ** 2 / (R * (N - R) * (N * P2 - P1 ** 2))
    assert got["k_groups"] == 4 and got["n"] == N and got["r"] == R
    assert abs(got["ca_z2"] - z2) < 1e-6
    flat = spark.createDataFrame(
        [(s, o) for s in range(3) for o in (0, 1)], "s long, o long"
    )
    assert cochran_armitage(flat, "s", "o").collect()[0]["ca_z2"] == 0.0


def test_isotonic_fit_pav_hand(spark):
    """PAV on a classic violation sequence: y-means 0.2, 0.8, 0.4 on
    bins 0,1,2 pool bins 1-2 to 0.6; an already-monotone tail is
    untouched; constant groups fit their mean everywhere."""
    from greenex_py_spark.functions.stats import isotonic_fit

    rows = (
        [("a", 0, 1)] * 1 + [("a", 0, 0)] * 4      # bin0 mean .2
        + [("a", 1, 1)] * 4 + [("a", 1, 0)] * 1    # bin1 mean .8
        + [("a", 2, 1)] * 2 + [("a", 2, 0)] * 3    # bin2 mean .4
        + [("a", 3, 1)] * 5                        # bin3 mean 1.0
        + [("b", 0, 0), ("b", 1, 0), ("b", 2, 0)]  # constant zero
    )
    df = spark.createDataFrame(rows, "g string, bin long, y long")
    got = {(r.grp, r.bin): r.fitted
           for r in isotonic_fit(df, "g", "bin", "y").collect()}
    assert got[("a", 0)] == 0.2
    assert got[("a", 1)] == got[("a", 2)] == 0.6   # pooled violator
    assert got[("a", 3)] == 1.0
    assert all(got[("b", i)] == 0.0 for i in range(3))


def test_tree_rollup_invariants(spark, sf_dir):
    """Subtree identities on the real fixture: root holds every doc;
    every internal node's subtree = direct + children subtrees; depth
    is the binary-tree level."""
    import __spark_entry__ as entrymod

    rows = {r["node"]: r for r in
            entrymod.queries()["q_tree_rollup"](spark, sf_dir).collect()}
    import duckdb
    n_docs = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    assert rows[0]["n_subtree"] == n_docs
    for node, r in rows.items():
        want = r["n_direct"]
        for ch in (2 * node + 1, 2 * node + 2):
            if ch in rows:
                want += rows[ch]["n_subtree"]
        assert r["n_subtree"] == want, node
        assert r["depth"] == (node + 1).bit_length() - 1


def test_mutual_information_hand(spark):
    """2x2 hand case vs a NumPy mirror: MI, both marginal entropies,
    and min-normalized NMI agree to the 1e-9 quantization; a
    perfectly-dependent frame reaches NMI == 1 exactly."""
    import math

    from greenex_py_spark.functions.stats import mutual_information

    rows = ([("s0", "en")] * 2 + [("s0", "de")] * 1
            + [("s1", "en")] * 1 + [("s1", "de")] * 2)
    df = spark.createDataFrame(rows, "src string, lang string")
    r = mutual_information(df, "src", "lang").collect()[0]
    n = 6.0
    joint = {("s0", "en"): 2, ("s0", "de"): 1,
             ("s1", "en"): 1, ("s1", "de"): 2}
    pa = {"s0": 0.5, "s1": 0.5}
    pb = {"en": 0.5, "de": 0.5}
    mi = sum((c / n) * math.log((c / n) / (pa[a] * pb[b]))
             for (a, b), c in joint.items())
    h = -sum(0.5 * math.log(0.5) for _ in range(2))
    assert r["n"] == 6
    assert abs(r["mi_nats"] - mi) < 1e-8
    assert abs(r["h_a"] - h) < 1e-8
    assert abs(r["h_b"] - h) < 1e-8
    assert abs(r["nmi"] - mi / h) < 1e-8

    # perfect dependence: every source maps to exactly one language
    dep = spark.createDataFrame(
        [("s0", "en")] * 3 + [("s1", "de")] * 2, "src string, lang string"
    )
    r2 = mutual_information(dep, "src", "lang").collect()[0]
    assert abs(r2["nmi"] - 1.0) < 1e-9
    assert abs(r2["mi_nats"] - r2["h_a"]) < 1e-9


def test_mcnemar_paired_hand(spark):
    """Hand 2x2 discordance table: b=3 (A right, B wrong), c=1 — plain
    statistic (3-1)^2/4 = 1.0, continuity-corrected (|3-1|-1)^2/4 =
    0.25; a frame with zero discordant pairs yields NULL statistics."""
    from greenex_py_spark.functions.stats import mcnemar_paired

    rows = (
        [("en", "en", "en")] * 4      # both right
        + [("en", "en", "de")] * 3    # A right, B wrong  -> b
        + [("en", "de", "en")] * 1    # A wrong, B right  -> c
        + [("en", "de", "fr")] * 2    # both wrong
    )
    df = spark.createDataFrame(rows, "truth string, a string, b string")
    r = mcnemar_paired(df, "truth", "a", "b").collect()[0]
    assert (r["n"], r["n_discordant"], r["b"], r["c"]) == (10, 4, 3, 1)
    assert abs(r["mcnemar"] - 1.0) < 1e-12
    assert abs(r["mcnemar_cc"] - 0.25) < 1e-12

    agree = spark.createDataFrame(
        [("en", "en", "en"), ("de", "fr", "fr")],
        "truth string, a string, b string",
    )
    r2 = mcnemar_paired(agree, "truth", "a", "b").collect()[0]
    assert r2["n_discordant"] == 0
    assert r2["mcnemar"] is None and r2["mcnemar_cc"] is None


def test_heaps_law_hand(spark):
    """Synthetic corpus with a known power-law vocabulary: doc i
    contributes tokens so that after N_i cumulative tokens the
    cumulative vocabulary is exactly round(2 * N_i^0.5) — the fitted
    beta recovers ~0.5 and logk ~log10(2); the checkpoint count and
    totals are exact."""
    import math

    from greenex_py_spark.functions.text import heaps_law

    # build 10 docs; doc i has 100 tokens, vocabulary grows as 2*sqrt(N)
    docs, vocab_used = [], 0
    cum = 0
    for i in range(10):
        n_tok = 100
        cum += n_tok
        target_vocab = round(2.0 * math.sqrt(cum))
        new = target_vocab - vocab_used
        toks = [f"w{vocab_used + j}" for j in range(new)]
        vocab_used = target_vocab
        # pad with already-seen tokens
        toks += ["w0"] * (n_tok - len(toks))
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = heaps_law(df, "doc_id", "text", 10).collect()[0]
    assert r["n_docs"] == 10 and r["n_points"] == 10
    assert r["token_total"] == 1000
    assert r["vocab_total"] == vocab_used
    assert abs(r["heaps_beta"] - 0.5) < 0.01
    assert abs(r["heaps_logk"] - math.log10(2.0)) < 0.02


def test_variant_field_hist_hand(spark):
    """Hand events: ints bucket by width, missing key and malformed
    JSON land in bin -1, value sums are exact 1e-6 longs."""
    from greenex_py_spark.functions.semistructured import variant_field_hist

    rows = [
        ('{"k": 3}', "a", 0.5),
        ('{"k": 7}', "b", 0.25),
        ('{"k": 17}', "a", 1.0),
        ('{"j": 2}', "a", 2.0),     # missing key
        ("not json", "c", 3.0),     # malformed
    ]
    df = spark.createDataFrame(
        rows, "props string, event_type string, value double"
    )
    got = {
        r["bin"]: r
        for r in variant_field_hist(df, "props", "k", 10, "value").collect()
    }
    assert set(got) == {-1, 0, 1}
    assert (got[0]["n"], got[0]["sum_k"], got[0]["n_types"]) == (2, 10, 2)
    assert got[0]["value_q"] == 750000
    assert (got[1]["n"], got[1]["sum_k"]) == (1, 17)
    assert (got[-1]["n"], got[-1]["sum_k"], got[-1]["n_types"]) == (2, 0, 2)
    assert got[-1]["value_q"] == 5000000  # floor(v*1e6+0.5) summed per row


def test_matthews_corr_hand(spark):
    """Binary hand case vs the closed form: TP=4 TN=3 FP=2 FN=1 →
    MCC = (4*3-2*1)/sqrt(6*5*4*7); a perfect classifier hits 1.0; a
    single-class prediction margin degenerates to NULL."""
    import math

    from greenex_py_spark.functions.stats import matthews_corr

    rows = (
        [("p", "p")] * 4 + [("n", "n")] * 3
        + [("n", "p")] * 2 + [("p", "n")] * 1
    )
    df = spark.createDataFrame(rows, "truth string, pred string")
    r = matthews_corr(df, "truth", "pred").collect()[0]
    # (TP·TN − FP·FN)/sqrt((TP+FP)(TP+FN)(TN+FP)(TN+FN)) = 10/sqrt(600)
    want = (4 * 3 - 2 * 1) / math.sqrt(6 * 5 * 5 * 4)
    assert (r["n"], r["n_correct"]) == (10, 7)
    assert abs(r["mcc"] - want) < 1e-12

    perfect = spark.createDataFrame(
        [("a", "a"), ("b", "b"), ("c", "c")], "truth string, pred string"
    )
    assert abs(matthews_corr(perfect, "truth", "pred")
               .collect()[0]["mcc"] - 1.0) < 1e-12

    degen = spark.createDataFrame(
        [("a", "a"), ("b", "a")], "truth string, pred string"
    )
    assert matthews_corr(degen, "truth", "pred").collect()[0]["mcc"] is None


def test_naive_bayes_hand(spark):
    """Tiny corpus vs a pure-Python multinomial-NB mirror with the
    same 1e-9 integer quantization: confusion cells match exactly, and
    a class-specific vocabulary classifies its own docs correctly."""
    import math
    from collections import Counter

    from greenex_py_spark.functions.text import naive_bayes_confusion

    corpus = [
        (0, "la la la bon", "fr"),
        (1, "la bon bon", "fr"),
        (2, "the the cat", "en"),
        (3, "the cat cat sat", "en"),
        (4, "la the cat", "en"),   # mixed doc — mirror decides
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string, lang string")
    got = {
        (r["lang"], r["pred_lang"]): r["n"]
        for r in naive_bayes_confusion(df).collect()
    }

    def qln(x):
        return math.floor(math.log(x) * 1_000_000_000 + 0.5)

    toks = [(d, t.split(), l) for d, t, l in corpus]
    c = Counter((w, l) for _, ws, l in toks for w in ws)
    t_l = Counter(l for _, ws, l in toks for _ in ws)
    n_l = Counter(l for _, _, l in toks)
    vocab = {w for _, ws, _ in toks for w in ws}
    n = len(corpus)
    want = Counter()
    for _, ws, truth in toks:
        best = None
        for cl in sorted(n_l):
            s = qln(n_l[cl] / n) - len(ws) * qln(t_l[cl] + len(vocab))
            s += sum(qln(c[(w, cl)] + 1) for w in ws if (w, cl) in c)
            if best is None or s > best[0]:
                best = (s, cl)
        want[(truth, best[1])] += 1
    assert got == dict(want)
    # sanity: pure-vocab docs classify to their own language
    assert want[("fr", "fr")] == 2 and want[("en", "en")] >= 2


def test_boruvka_mst_vs_kruskal(spark):
    """Random connected graph: the distributed Borůvka MSF equals a
    pure-Python Kruskal under the same (w, u, v) total order — edge
    set identical, not just total weight; a disconnected graph yields
    the spanning forest (one tree per component)."""
    import random

    from greenex_py_spark.functions.graph import boruvka_mst

    def kruskal(n, edges):
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        out = []
        for w, u, v in sorted((w, u, v) for u, v, w in edges):
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
                out.append((u, v, w))
        return sorted(out)

    rng = random.Random(42)
    n = 40
    edges, seen = [], set()
    for i in range(1, n):
        edges.append((i - 1, i, rng.randrange(1, 50)))  # ties likely
        seen.add((i - 1, i))
    for _ in range(120):
        x, y = rng.randrange(n), rng.randrange(n)
        if x == y:
            continue
        x, y = min(x, y), max(x, y)
        if (x, y) in seen:
            continue
        seen.add((x, y))
        edges.append((x, y, rng.randrange(1, 50)))
    df = spark.createDataFrame(edges, "u long, v long, w4 long")
    got = sorted((r["u"], r["v"], r["w4"])
                 for r in boruvka_mst(df).collect())
    assert got == kruskal(n, edges)
    assert len(got) == n - 1

    # two components -> spanning forest with n - 2 edges
    forest_edges = [(0, 1, 5), (1, 2, 3), (0, 2, 9),
                    (10, 11, 1), (11, 12, 2), (10, 12, 2)]
    fdf = spark.createDataFrame(forest_edges, "u long, v long, w4 long")
    fgot = sorted((r["u"], r["v"], r["w4"])
                  for r in boruvka_mst(fdf).collect())
    assert fgot == [(0, 1, 5), (1, 2, 3), (10, 11, 1), (10, 12, 2)]


def test_cell_value_sums_straddle(spark):
    """Cells that straddle tile boundaries re-sum exactly: a 8-px
    raster in 4-px tiles with 3-px cells — every cell's quantized sum
    equals the NumPy whole-raster mirror, and n_px accounts for the
    ragged edge cells."""
    import numpy as np
    import pandas as pd

    from greenex_py_spark.geo.grid import GridSpec
    from greenex_py_spark.operators.focal import (
        cell_value_sums, quantize_half_away,
    )

    npx, tile_px, cell_px = 8, 4, 3
    grid = GridSpec.square(0.0, 0.0, 1.0, tile_px, npx)
    full = (np.arange(npx * npx, dtype=np.float64).reshape(npx, npx)
            * 0.137 - 2.5)
    rows = []
    for ty in range(2):
        for tx in range(2):
            blk = full[ty * 4:(ty + 1) * 4, tx * 4:(tx + 1) * 4]
            rows.append({"layer": "t", "tx": tx, "ty": ty,
                         "x0": tx * 4.0, "y0": ty * 4.0, "res": 1.0,
                         "w": 4, "h": 4, "px": blk.ravel().tolist()})
    tiles = spark.createDataFrame(
        pd.DataFrame(rows),
        "layer string, tx int, ty int, x0 double, y0 double, "
        "res double, w int, h int, px array<double>",
    )
    got = {(r["gx"], r["gy"]): (r["vsum_q"], r["n_px"])
           for r in cell_value_sums(tiles, grid, cell_px, 100.0).collect()}
    q = quantize_half_away(full, 100.0)
    want = {}
    for gy in range(3):
        for gx in range(3):
            blk = q[gy * 3:min((gy + 1) * 3, npx),
                    gx * 3:min((gx + 1) * 3, npx)]
            want[(gx, gy)] = (int(blk.sum()), blk.size)
    assert got == want


def test_contagion_hand(spark):
    """Checkerboard: all adjacencies are discordant, Q_ab = Q_ba = 1/2
    and the same-class pair types are absent, so the entropy is ln 2 of
    the 2·ln 2 bound → contagion exactly 1/2 (contagion reaches 0 only
    when ALL m² ordered pair types are uniform); a solid map
    degenerates (m=1 → NULL); a two-blob half/half map scores HIGHER
    than the checkerboard (more contagious = clumpier)."""
    from greenex_py_spark.operators.spatial_stats import contagion

    n = 6
    checker = [(x, y, "a" if (x + y) % 2 == 0 else "b")
               for x in range(n) for y in range(n)]
    df = spark.createDataFrame(checker, "gx long, gy long, cat string")
    r = contagion(df).collect()[0]
    assert r["n_cells"] == 36 and r["m_classes"] == 2
    assert r["n_pairs"] == 2 * n * (n - 1)
    assert abs(r["contagion"] - 0.5) < 1e-9

    solid = spark.createDataFrame(
        [(x, y, "a") for x in range(3) for y in range(3)],
        "gx long, gy long, cat string",
    )
    assert contagion(solid).collect()[0]["contagion"] is None

    # two-blob map vs a pure-Python mirror of the quantized formula.
    # Note the O'Neill definition is adjacency-ENTROPY based: the
    # checkerboard's perfectly predictable (a,b)-only adjacency has
    # LOW entropy and thus scores higher than a blob map whose pair
    # mix spans all four ordered types.
    import math
    from collections import Counter

    blobs = {(x, y): "a" if x < 3 else "b"
             for x in range(6) for y in range(3)}
    rb = contagion(
        spark.createDataFrame(
            [(x, y, c) for (x, y), c in blobs.items()],
            "gx long, gy long, cat string",
        )
    ).collect()[0]
    pairs = Counter()
    for (x, y), c in blobs.items():
        for nx, ny in ((x + 1, y), (x, y + 1)):
            if (nx, ny) in blobs:
                pairs[(c, blobs[(nx, ny)])] += 1
                pairs[(blobs[(nx, ny)], c)] += 1
    tot = sum(pairs.values())
    ent_q = sum(
        math.floor((c / tot) * math.log(c / tot) * 1e9 + 0.5)
        for c in pairs.values()
    )
    want = 1.0 + (ent_q / 1e9) / (2.0 * math.log(2.0))
    assert rb["n_pairs"] == tot // 2
    assert abs(rb["contagion"] - want) < 1e-12


def test_trailing_range_stats_ties(spark):
    """Duplicate timestamps all join the RANGE frame (order-independent
    — the property a ROWS frame lacks) and the trailing bound is
    inclusive at exactly window_s seconds."""
    import datetime as dt

    from greenex_py_spark.functions.timeseries import trailing_range_stats

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 1.0),
        (1, t0, 2.0),                              # tie with the first
        (1, t0 + dt.timedelta(seconds=7200), 4.0),  # still in frame
        (1, t0 + dt.timedelta(seconds=7201), 8.0),  # first two drop out
        (2, t0, 1.5),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {r["user_id"]: r
           for r in trailing_range_stats(df, window_s=7200).collect()}
    assert got[1]["n_events"] == 4
    # at t0+7200 the frame holds all three events
    assert got[1]["max_n_win"] == 3
    # value peak is at t0+7201 where the frame holds {4, 8} = 12
    assert got[1]["max_vsum_q"] == 12_000_000
    assert got[2]["max_n_win"] == 1 and got[2]["max_vsum_q"] == 1_500_000


def test_prefix_filter_join_brute(spark):
    """Prefix-filtered join vs brute-force all-pairs shingle Jaccard:
    identical pair set at t=4/5 (no false negatives — the prefix
    theorem — and no survivors below threshold), including a pair
    exactly AT the threshold."""
    from greenex_py_spark.functions.dedup import prefix_filter_join

    base = "w{} " * 12
    texts = {
        0: " ".join(f"a{i}" for i in range(12)),
        1: " ".join(f"a{i}" for i in range(12)),        # exact clone
        2: " ".join(f"a{i}" for i in range(11)) + " zz",  # near-dup
        3: " ".join(f"b{i}" for i in range(12)),        # unrelated
        4: " ".join(f"a{i}" for i in range(8)),         # prefix subset
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["inter"], r["union_sz"])
        for r in prefix_filter_join(df, 4, 5, 3).collect()
    )

    def sh(t):
        w = t.split()
        return {" ".join(w[i:i + 3]) for i in range(max(len(w) - 2, 1))}

    want = []
    ids = sorted(texts)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sh(texts[ids[i]]), sh(texts[ids[j]])
            inter, uni = len(a & b), len(a | b)
            if 5 * inter >= 4 * uni:
                want.append((ids[i], ids[j], inter, uni))
    assert got == sorted(want)
    assert (0, 1, 10, 10) in got          # clone: J = 1
    assert any(p[:2] == (0, 2) for p in got)  # near-dup survives
    assert not any(p[:2] == (0, 3) for p in got)


def test_friedman_hand(spark):
    """Classic textbook block design (Conover Table 3, 3 treatments ×
    4 blocks, no ties): Q matches the closed form computed by hand;
    midrank ties reproduce the averaged-rank statistic; k=1
    degenerates to NULL."""
    from greenex_py_spark.functions.stats import friedman_test

    # blocks b0..b3, y chosen so within-block ranks are
    # t0 -> 1,1,1,2 ; t1 -> 2,3,3,1 ; t2 -> 3,2,2,3
    rows = [
        ("b0", "t0", 1), ("b0", "t1", 5), ("b0", "t2", 9),
        ("b1", "t0", 1), ("b1", "t1", 9), ("b1", "t2", 5),
        ("b2", "t0", 1), ("b2", "t1", 9), ("b2", "t2", 5),
        ("b3", "t0", 5), ("b3", "t1", 1), ("b3", "t2", 9),
    ]
    df = spark.createDataFrame(rows, "b string, t string, y long")
    r = friedman_test(df, "b", "t", "y").collect()[0]
    rsums = {"t0": 5, "t1": 9, "t2": 10}
    n, k = 4, 3
    q = 12.0 / (n * k * (k + 1)) * sum(v * v for v in rsums.values()) \
        - 3 * n * (k + 1)
    assert (r["n_blocks"], r["k_treatments"]) == (4, 3)
    assert abs(r["friedman_q"] - q) < 1e-9
    assert abs(r["kendall_w"] - q / (n * (k - 1))) < 1e-9

    # all-tied block -> every midrank is (k+1)/2, Q = 0 exactly
    tied = spark.createDataFrame(
        [("b0", t, 7) for t in ("t0", "t1", "t2")],
        "b string, t string, y long",
    )
    assert friedman_test(tied, "b", "t", "y").collect()[0]["friedman_q"] == 0.0

    one = spark.createDataFrame(
        [("b0", "t0", 1), ("b1", "t0", 2)], "b string, t string, y long"
    )
    assert friedman_test(one, "b", "t", "y").collect()[0]["friedman_q"] is None


def test_dunning_collocations_hand(spark):
    """A planted always-together bigram dominates G²; the score for it
    matches a pure-Python mirror of the quantized 2x2 log-likelihood."""
    import math

    from greenex_py_spark.functions.text import dunning_collocations

    # "new york" appears 4x; fillers vary
    docs = [
        (0, "new york a b c"),
        (1, "new york d e f"),
        (2, "a c new york b"),
        (3, "d f new york e"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    top = dunning_collocations(df, top_n=5).collect()
    assert (top[0]["w1"], top[0]["w2"], top[0]["n11"]) == ("new", "york", 4)

    bi = []
    for _, t in docs:
        w = t.split()
        bi += list(zip(w, w[1:]))
    nn = len(bi)
    n11 = bi.count(("new", "york"))
    r1 = sum(1 for a, _ in bi if a == "new")
    c1 = sum(1 for _, b in bi if b == "york")

    def term(o, e):
        return math.floor(o * math.log(o / e) * 1e9 + 0.5) if o > 0 else 0

    g2q = (
        term(n11, r1 * c1 / nn)
        + term(r1 - n11, r1 * (nn - c1) / nn)
        + term(c1 - n11, (nn - r1) * c1 / nn)
        + term(nn - r1 - c1 + n11, (nn - r1) * (nn - c1) / nn)
    )
    assert abs(top[0]["g2"] - g2q * 2.0 / 1e9) < 1e-12


def test_patch_shape_random_masks(spark):
    """Distributed tile-CCL (area, perimeter) pairs == an independent
    BFS flood fill + per-pixel exposed-side count, for random masks
    spanning tile seams in all directions (the border −2 repair and
    zero-padding at the raster edge both exercised)."""
    import numpy as np

    from greenex_py_spark.operators.patches import (
        patch_shape_stats, tile_patch_parts,
    )

    def bfs_shapes(mask):
        h, w = mask.shape
        seen = np.zeros_like(mask, dtype=bool)
        out = []
        for sy in range(h):
            for sx in range(w):
                if not mask[sy, sx] or seen[sy, sx]:
                    continue
                stack, px, perim = [(sy, sx)], 0, 0
                seen[sy, sx] = True
                while stack:
                    y, x = stack.pop()
                    px += 1
                    for ny, nx in ((y-1, x), (y+1, x), (y, x-1), (y, x+1)):
                        if 0 <= ny < h and 0 <= nx < w and mask[ny, nx]:
                            if not seen[ny, nx]:
                                seen[ny, nx] = True
                                stack.append((ny, nx))
                        else:
                            perim += 1
                out.append((px, perim))
        return sorted(out)

    rng = np.random.RandomState(23)
    for trial, (h, w, p) in enumerate(
        [(12, 16, 0.5), (12, 16, 0.75), (11, 14, 0.4), (12, 16, 1.0)]
    ):
        mask = rng.rand(h, w) < p
        z = np.where(mask, 1.0, -1.0)
        tiles, grid = _tile_grid_fixture(spark, z)
        got = sorted(
            (r["n_px"], r["perim_px"])
            for r in patch_shape_stats(
                tile_patch_parts(tiles, grid, quant=1e3)
            ).collect()
        )
        assert got == bfs_shapes(mask), trial


def test_fleiss_kappa_hand(spark):
    """Fleiss' worked example shape: hand 2-category, 3-rater frame vs
    the closed form; unanimity across raters gives kappa exactly 1."""
    from greenex_py_spark.functions.stats import fleiss_kappa

    # 4 items x 3 raters
    rows = [
        (0, "a", "a", "a"),
        (1, "a", "a", "b"),
        (2, "b", "b", "b"),
        (3, "a", "b", "b"),
    ]
    df = spark.createDataFrame(rows, "i long, r1 string, r2 string, r3 string")
    r = fleiss_kappa(df, "i", ["r1", "r2", "r3"]).collect()[0]
    # n_ij^2 sums: item0 9, item1 4+1, item2 9, item3 1+4 -> s2=28
    # P_bar = (28 - 12) / (12*2) = 2/3
    # col sums: a=6, b=6 -> c2=72 ; P_e = 72/144 = 1/2
    assert (r["n_items"], r["n_raters"]) == (4, 3)
    assert abs(r["p_bar"] - 2 / 3) < 1e-12
    assert abs(r["p_e"] - 0.5) < 1e-12
    assert abs(r["fleiss_kappa"] - (2 / 3 - 0.5) / 0.5) < 1e-12

    unam = spark.createDataFrame(
        [(0, "a", "a", "a"), (1, "b", "b", "b")],
        "i long, r1 string, r2 string, r3 string",
    )
    assert abs(fleiss_kappa(unam, "i", ["r1", "r2", "r3"])
               .collect()[0]["fleiss_kappa"] - 1.0) < 1e-12


def test_association_rules_hand(spark):
    """Hand baskets: a perfectly-coupled pair reaches lift N/n_a; an
    anti-correlated pair is filtered by min support; confidence is
    directional."""
    from greenex_py_spark.functions.rules import association_rules

    baskets = {
        0: ["x", "y"], 1: ["x", "y"], 2: ["x", "y", "z"],
        3: ["z"], 4: ["z", "w"],
    }
    rows = [(i, it) for i, its in baskets.items() for it in its]
    df = spark.createDataFrame(rows, "id long, item string")
    got = {(r["item_a"], r["item_b"]): r
           for r in association_rules(df, "id", "item", 2).collect()}
    xy = got[("x", "y")]
    assert (xy["n_ab"], xy["n_a"], xy["n_b"]) == (3, 3, 3)
    assert abs(xy["support"] - 3 / 5) < 1e-12
    assert abs(xy["conf_ab"] - 1.0) < 1e-12
    assert abs(xy["lift"] - 3 * 5 / 9) < 1e-12
    # single co-occurrences fall below min support
    assert ("x", "z") not in got and ("w", "z") not in got
    assert set(got) == {("x", "y")}


def test_haar_energy_hand(spark):
    """4x4 two-tile raster vs a NumPy mirror: integer Haar coefficient
    energies per band; a constant tile has zero detail energy in all
    three bands."""
    import numpy as np

    from greenex_py_spark.geo.grid import GridSpec
    from greenex_py_spark.operators.focal import (
        haar_energy_tile_stats, quantize_half_away,
    )

    npx, tile_px = 4, 2
    grid = GridSpec.square(0.0, 0.0, 1.0, tile_px, npx)
    full = np.array([
        [1.0, 2.0, 5.0, 5.0],
        [3.0, 4.0, 5.0, 5.0],
        [0.5, -0.5, 7.0, 7.0],
        [0.25, 0.75, 7.0, 7.0],
    ])
    rows = []
    for ty in range(2):
        for tx in range(2):
            blk = full[ty * 2:(ty + 1) * 2, tx * 2:(tx + 1) * 2]
            rows.append(("t", tx, ty, float(tx * 2), float(ty * 2), 1.0,
                         2, 2, blk.ravel().tolist()))
    tiles = spark.createDataFrame(
        rows,
        "layer string, tx int, ty int, x0 double, y0 double, "
        "res double, w int, h int, px array<double>",
    )
    got = {(r["tx"], r["ty"]): r
           for r in haar_energy_tile_stats(tiles, grid, 100.0).collect()}
    q = quantize_half_away(full, 100.0)
    for (tx, ty), r in got.items():
        a = q[ty * 2, tx * 2]
        b = q[ty * 2, tx * 2 + 1]
        c = q[ty * 2 + 1, tx * 2]
        d = q[ty * 2 + 1, tx * 2 + 1]
        assert r["n_blocks"] == 1
        assert r["e_h"] == (a - b + c - d) ** 2
        assert r["e_v"] == (a + b - c - d) ** 2
        assert r["e_d"] == (a - b - c + d) ** 2
    assert got[(1, 0)]["e_h"] == got[(1, 0)]["e_v"] == got[(1, 0)]["e_d"] == 0


def test_betweenness_brandes_mirror(spark):
    """Distributed all-sources Brandes == a pure-Python Brandes with
    the identical per-term 1e-9 quantization on a random connected
    graph; closed forms on a path (interior nodes (k)(n-1-k)) and a
    star (center (n-1)(n-2)/2) are exact."""
    import collections
    import math
    import random

    from greenex_py_spark.functions.graph import betweenness_centrality

    def mirror(edges):
        adj = collections.defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        tot = collections.Counter()
        for s in adj:
            dist = {s: 0}
            sigma = {s: 1}
            order = [s]
            qd = collections.deque([s])
            while qd:
                u = qd.popleft()
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = dist[u] + 1
                        sigma[w] = 0
                        qd.append(w)
                        order.append(w)
                    if dist[w] == dist[u] + 1:
                        sigma[w] += sigma[u]
            dq = {v: 0 for v in dist}
            for v in reversed(order):
                for w in adj[v]:
                    if dist.get(w) == dist[v] + 1:
                        dq[v] += math.floor(
                            sigma[v] / sigma[w] * (1.0 + dq[w] / 1e9) * 1e9
                            + 0.5
                        )
                if v != s:
                    tot[v] += dq[v]
        return {v: tot[v] / 1e9 / 2.0 for v in adj}

    rng = random.Random(3)
    n = 20
    edges = set()
    for i in range(1, n):
        edges.add((rng.randrange(i), i))
    for _ in range(15):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    named = [(f"h{a}", f"h{b}") for a, b in edges]
    df = spark.createDataFrame(named, "src string, dst string")
    got = {r["node"]: r["betweenness"]
           for r in betweenness_centrality(df).collect()}
    want = mirror(named)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, v

    # path 0-1-2-3-4: interior k has k*(4-k)
    path = [(f"p{i}", f"p{i+1}") for i in range(4)]
    gp = {r["node"]: r["betweenness"] for r in betweenness_centrality(
        spark.createDataFrame(path, "src string, dst string")).collect()}
    assert {v: round(b, 6) for v, b in gp.items()} == {
        "p0": 0.0, "p1": 3.0, "p2": 4.0, "p3": 3.0, "p4": 0.0}

    # star: center sits on every pair
    star = [("c", f"s{i}") for i in range(5)]
    gs = {r["node"]: r["betweenness"] for r in betweenness_centrality(
        spark.createDataFrame(star, "src string, dst string")).collect()}
    assert round(gs["c"], 6) == 10.0
    assert all(gs[f"s{i}"] == 0.0 for i in range(5))


def test_golden_records_hand(spark):
    """Survivorship picks the longest text, breaking ties by smallest
    id; member counts and total lengths are exact."""
    from greenex_py_spark.functions.dedup import golden_records

    groups = spark.createDataFrame(
        [(10, 10), (11, 10), (12, 10), (20, 20), (21, 20)],
        "doc_id long, rep_id long",
    )
    docs = spark.createDataFrame(
        [(10, "aaaa"), (11, "bbbbbb"), (12, "cccccc"),
         (20, "xy"), (21, "z")],
        "doc_id long, text string",
    )
    got = {r["rep_id"]: r for r in golden_records(groups, docs).collect()}
    # group 10: lengths 4/6/6 -> tie between 11 and 12 -> keep 11
    assert (got[10]["keep_id"], got[10]["keep_len"]) == (11, 6)
    assert (got[10]["n_members"], got[10]["total_len"]) == (3, 16)
    assert (got[20]["keep_id"], got[20]["keep_len"]) == (20, 2)


def test_focal_entropy_hand(spark):
    """4x4 two-tile class raster vs a NumPy window mirror: interior
    windows only, quantized -(c/9)ln(c/9) class terms; a uniform
    raster has zero entropy everywhere."""
    import numpy as np

    from greenex_py_spark.geo.grid import GridSpec
    from greenex_py_spark.operators.focal import focal_entropy_tile_stats

    npx, tile_px = 4, 2
    grid = GridSpec.square(0.0, 0.0, 1.0, tile_px, npx)
    # values in [-1, 1]; quant 100 -> classes over [-100, 100]
    full = np.array([
        [-0.9, -0.9, 0.9, 0.9],
        [-0.9, 0.0, 0.0, 0.9],
        [-0.9, 0.0, 0.0, 0.9],
        [-0.9, -0.9, 0.9, 0.9],
    ])
    rows = []
    for ty in range(2):
        for tx in range(2):
            blk = full[ty * 2:(ty + 1) * 2, tx * 2:(tx + 1) * 2]
            rows.append(("t", tx, ty, float(tx * 2), float(ty * 2), 1.0,
                         2, 2, blk.ravel().tolist()))
    schema = ("layer string, tx int, ty int, x0 double, y0 double, "
              "res double, w int, h int, px array<double>")
    tiles = spark.createDataFrame(rows, schema)
    got = {(r["tx"], r["ty"]): r
           for r in focal_entropy_tile_stats(
               tiles, grid, quant=100.0, bins=5,
               vmin_q=-100, vmax_q=100).collect()}

    q = np.floor(np.abs(full * 100.0) + 0.5).astype(np.int64) * np.sign(
        full).astype(np.int64)
    cls = np.clip((q + 100) * 5 // 200, 0, 4)
    import math
    want = {}
    for ty in range(2):
        for tx in range(2):
            tot, nw = 0, 0
            for cy in range(ty * 2, ty * 2 + 2):
                for cx in range(tx * 2, tx * 2 + 2):
                    if not (1 <= cx <= npx - 2 and 1 <= cy <= npx - 2):
                        continue
                    nw += 1
                    win = cls[cy - 1:cy + 2, cx - 1:cx + 2].ravel()
                    for k in set(win.tolist()):
                        c = int((win == k).sum())
                        tot += math.floor(
                            -(c / 9.0) * math.log(c / 9.0) * 1e9 + 0.5)
            want[(tx, ty)] = (nw, tot)
    for key, (nw, tot) in want.items():
        assert (got[key]["n_windows"], got[key]["ent_q_sum"]) == (nw, tot)

    flat = [("t", tx, ty, float(tx * 2), float(ty * 2), 1.0, 2, 2,
             [0.5] * 4) for ty in range(2) for tx in range(2)]
    gflat = focal_entropy_tile_stats(
        spark.createDataFrame(flat, schema), grid, quant=100.0, bins=5,
        vmin_q=-100, vmax_q=100).collect()
    assert all(r["ent_q_sum"] == 0 for r in gflat)


def test_rich_club_hand(spark):
    """Star + hub-pair graph: the two hubs (deg > leaves) connect to
    each other, so phi rises to 1.0 at the top threshold; phi(0) is
    the global density."""
    from greenex_py_spark.functions.graph import rich_club

    # hubs h1,h2 (deg 4 each), leaves (deg 1): h1-h2 + 3 leaves each
    edges = [("h1", "h2")] + [("h1", f"a{i}") for i in range(3)] \
        + [("h2", f"b{i}") for i in range(3)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["k"]: r for r in rich_club(df).collect()}
    n, m = 8, 7
    assert got[0]["n_nodes"] == n and got[0]["n_edges"] == m
    assert abs(got[0]["phi"] - 2 * m / (n * (n - 1))) < 1e-12
    # k=1: only the two hubs survive; the h1-h2 edge among them
    assert (got[1]["n_nodes"], got[1]["n_edges"]) == (2, 1)
    assert got[1]["phi"] == 1.0


def test_cross_correlation_hand(spark):
    """B is A shifted by +2 days: the CCF peaks exactly at lag +2 with
    r = 1 on the overlap... using full-series stats the peak lag is
    still argmax; a constant series yields NULL everywhere."""
    import datetime as dt

    from greenex_py_spark.functions.timeseries import cross_correlation

    base = dt.datetime(2026, 3, 1)
    rows = []
    vol = [5, 1, 4, 2, 8, 3, 6, 2, 7, 1]
    for t, v in enumerate(vol):
        rows += [("view", base + dt.timedelta(days=t))] * v
    for t, v in enumerate(vol):
        rows += [("click", base + dt.timedelta(days=t + 2))] * v
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {r["lag"]: r["ccf"]
           for r in cross_correlation(df, "view", "click", 4).collect()}
    assert max(got, key=lambda k: (got[k] if got[k] is not None
                                   else -9)) == 2
    # full-series stats include the zero-padded calendar ends, so the
    # peak is attenuated below 1; it still clearly dominates
    assert got[2] > 0.5 and got[2] > got[1] + 0.2 and got[2] > got[3] + 0.2

    const = spark.createDataFrame(
        [("view", base + dt.timedelta(days=t)) for t in range(5)]
        + [("click", base + dt.timedelta(days=t)) for t in range(5)],
        "event_type string, ts timestamp",
    )
    gc = cross_correlation(const, "view", "click", 2).collect()
    assert all(r["ccf"] is None for r in gc)


def test_burrows_delta_hand(spark):
    """Two sources with identical function-word rates score delta 0;
    a stopword-free source sits strictly farther from both."""
    from greenex_py_spark.functions.text import burrows_delta

    rows = [
        ("s1", "the cat of the house and a dog"),
        ("s1", "the bird of a tree and the fox"),
        ("s2", "the car of the town and a bus"),
        ("s2", "the ship of a port and the van"),
        ("s3", "cats dogs birds trees foxes cars towns houses"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {(r["src_a"], r["src_b"]): r["delta"]
           for r in burrows_delta(df).collect()}
    assert abs(got[("s1", "s2")]) < 1e-9          # identical rates
    assert got[("s1", "s3")] > got[("s1", "s2")]
    assert got[("s2", "s3")] > 0.1


def test_neyman_allocation_hand(spark):
    """Two equal-size strata, one with 3x the spread, draw ~3x the
    budget; quotas sum exactly to the budget."""
    from greenex_py_spark.functions.sampling import neyman_allocation

    rows = ([("a", v) for v in (10, 20, 10, 20) * 25]       # low spread
            + [("b", v) for v in (0, 30, 0, 30) * 25])      # 3x spread
    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = {r["source"]: r for r in
           neyman_allocation(df, "source", "n_chars", 1000).collect()}
    assert got["a"]["quota"] + got["b"]["quota"] == 1000
    ratio = got["b"]["quota"] / got["a"]["quota"]
    assert 2.5 < ratio < 3.5


def test_capture_recapture_hand(spark):
    """The Chapman estimate lands near the true corpus size (within
    15% at n=2000) and the overlap matches the two salts'
    independence."""
    from greenex_py_spark.functions.sampling import capture_recapture

    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    r = capture_recapture(df, "doc_id", 40, 30).collect()[0]
    assert r["true_n"] == 2000
    assert abs(r["n_hat"] - 2000) / 2000 < 0.15
    assert 0 < r["m_both"] < min(r["n1"], r["n2"])


def test_yules_k_hand(spark):
    """Closed form on a tiny source: K = 1e4 (sum tf^2 - N)/N^2; a
    maximally repetitive source scores far higher than an all-distinct
    one (K exactly 0)."""
    from greenex_py_spark.functions.text import yules_k

    rows = [("rep", "x x x x y y"), ("uniq", "a b c d e f")]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r["src"]: r for r in yules_k(df).collect()}
    # rep: tf = {x:4, y:2} -> s2 = 20, N = 6 -> K = 1e4*14/36
    assert abs(got["rep"]["yules_k"] - 1e4 * 14 / 36) < 1e-9
    assert got["uniq"]["yules_k"] == 0.0
    assert (got["rep"]["n_tokens"], got["rep"]["n_types"]) == (6, 2)


def test_powerlaw_alpha_hand(spark):
    """Star graph: hub degree n-1, leaves degree 1 → alpha =
    1 + n/ln(n-1) exactly at the quantizer; an edge (degree-1 pair)
    graph degenerates to NULL."""
    import math

    from greenex_py_spark.functions.graph import powerlaw_alpha

    star = [("c", f"s{i}") for i in range(9)]
    r = powerlaw_alpha(
        spark.createDataFrame(star, "src string, dst string")
    ).collect()[0]
    n = 10
    want = 1.0 + n / (math.floor(math.log(9) * 1e9 + 0.5) / 1e9)
    assert r["n_nodes"] == n
    assert abs(r["alpha"] - want) < 1e-12

    pair = spark.createDataFrame([("a", "b")], "src string, dst string")
    assert powerlaw_alpha(pair).collect()[0]["alpha"] is None


def test_kulldorff_scan_hand(spark):
    """A planted dense blob on a sparse background: the top window
    centres on the blob, its LLR matches a pure-Python mirror of the
    quantized chain, and border windows clamp their cell area."""
    import math

    from greenex_py_spark.operators.spatial_stats import kulldorff_scan

    # 10x10 grid: blob of 20 at (5,5), 1s elsewhere on a few cells
    cells = [(5, 5, 20), (5, 6, 15), (6, 5, 12),
             (0, 0, 1), (9, 9, 1), (2, 7, 1)]
    df = spark.createDataFrame(cells, "gx long, gy long, cnt long")
    got = kulldorff_scan(df, n_gx=10, n_gy=10, radii=(1,),
                         top_n=3).collect()
    top = got[0]
    nn = sum(c for _, _, c in cells)

    def llr(n_in, a):
        e = nn * a / 100.0
        if n_in <= e:
            return 0.0
        rest = nn - n_in
        v = n_in * math.log(n_in / e)
        if rest:
            v += rest * math.log(rest / (nn - e))
        return math.floor(v * 1e6 + 0.5) / 1e6

    # the r=1 box at (5,5) captures 47 of 50
    assert (top["gx"], top["gy"], top["r"], top["n_in"]) == (5, 5, 1, 47)
    assert abs(top["llr"] - llr(47, 9)) < 1e-12
    # corner window at (0,0) clamps to 4 cells
    corner = [r for r in got if (r["gx"], r["gy"]) == (0, 0)]
    if corner:
        assert corner[0]["a_cells"] == 4


def test_mrr_composition(spark):
    """q_mrr invariants at sf0.001: rr = 1/found_rank when found, 0
    when missing, and never exceeds 1; the true_nn matches the exact
    top-1."""
    import greenex_py_spark.driver_queries as dq

    rows = dq.QUERIES["q_mrr"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 10
    for r in rows:
        if r["found_rank"] == 0:
            assert r["rr"] == 0.0
        else:
            assert abs(r["rr"] - 1.0 / r["found_rank"]) < 1e-15
        assert 0.0 <= r["rr"] <= 1.0


def test_edge_betweenness_mirror(spark):
    """Distributed edge betweenness == a pure-Python Brandes edge
    mirror with the identical per-term quantization; on a path the
    edge (i, i+1) carries exactly (i+1)(n-1-i); a bridge between two
    triangles carries all 9 crossing pairs."""
    import collections
    import math
    import random

    from greenex_py_spark.functions.graph import edge_betweenness

    def mirror(named):
        adj = collections.defaultdict(set)
        for a, b in named:
            adj[a].add(b)
            adj[b].add(a)
        tot = collections.Counter()
        for s in adj:
            dist = {s: 0}
            sigma = {s: 1}
            order = [s]
            qd = collections.deque([s])
            while qd:
                u = qd.popleft()
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = dist[u] + 1
                        sigma[w] = 0
                        qd.append(w)
                        order.append(w)
                    if dist[w] == dist[u] + 1:
                        sigma[w] += sigma[u]
            dq = {v: 0 for v in dist}
            for v in reversed(order):
                for w in adj[v]:
                    if dist.get(w) == dist[v] + 1:
                        t = math.floor(
                            sigma[v] / sigma[w] * (1.0 + dq[w] / 1e9) * 1e9
                            + 0.5
                        )
                        dq[v] += t
                        tot[(min(v, w), max(v, w))] += t
        return {e: c / 1e9 / 2.0 for e, c in tot.items()}

    rng = random.Random(5)
    n = 16
    edges = set()
    for i in range(1, n):
        edges.add((rng.randrange(i), i))
    for _ in range(10):
        x, y = rng.randrange(n), rng.randrange(n)
        if x != y:
            edges.add((min(x, y), max(x, y)))
    named = [(f"h{a}", f"h{b}") for a, b in edges]
    got = {(r["a"], r["b"]): r["ebc"] for r in edge_betweenness(
        spark.createDataFrame(named, "src string, dst string")).collect()}
    want = mirror(named)
    assert set(got) == set(want)
    for e in got:
        assert abs(got[e] - want[e]) < 1e-12, e

    # two triangles joined by a bridge: the bridge carries 3*3 pairs
    tri = [("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
           ("b1", "b2"), ("b2", "b3"), ("b1", "b3"), ("a1", "b1")]
    gb = {(r["a"], r["b"]): r["ebc"] for r in edge_betweenness(
        spark.createDataFrame(tri, "src string, dst string")).collect()}
    assert round(gb[("a1", "b1")], 6) == 9.0


def test_wasserstein_1d_hand(spark):
    """Two point-mass groups at 0 and 2: each is exactly distance 1
    from the 50/50 mixture (integral of |CDF gap| over [0,2))."""
    from greenex_py_spark.functions.stats import wasserstein_1d

    rows = [("a", 0), ("a", 0), ("b", 2), ("b", 2)]
    df = spark.createDataFrame(rows, "source string, v long")
    got = {r["source"]: r for r in wasserstein_1d(df, "source", "v").collect()}
    assert got["a"]["w1"] == 1.0 and got["b"]["w1"] == 1.0
    assert got["a"]["w1_scaled"] == 8  # |cum_a*N - cum_all*n_a|*gap = 4*2
    assert got["a"]["n_g"] == 2 and got["a"]["n_total"] == 4


def test_wasserstein_identical_group_is_zero(spark):
    """A group distributed exactly like the corpus has W1 = 0."""
    from greenex_py_spark.functions.stats import wasserstein_1d

    rows = [(g, v) for g in ("a", "b") for v in (1, 5, 9)]
    df = spark.createDataFrame(rows, "source string, v long")
    for r in wasserstein_1d(df, "source", "v").collect():
        assert r["w1_scaled"] == 0 and r["w1"] == 0.0


def test_jarque_bera_hand(spark):
    """Three-point uniform {1,2,3}: skew exactly 0, excess kurtosis
    exactly −1.5, JB = n/6 · (1.5²/4)."""
    from greenex_py_spark.functions.stats import jarque_bera

    rows = [("u", v) for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, "source string, v long")
    r = jarque_bera(df, "source", "v").collect()[0]
    assert (r["s1"], r["s2"], r["s3"], r["s4"]) == (6, 14, 36, 98)
    assert abs(r["skewness"]) < 1e-12
    assert abs(r["kurtosis_excess"] + 1.5) < 1e-12
    assert abs(r["jb"] - 3 / 6 * (1.5 * 1.5 / 4)) < 1e-12


def test_jarque_bera_skewed(spark):
    """A right-skewed mass {0,0,0,9} scores positive skewness and a
    large JB versus the symmetric case."""
    from greenex_py_spark.functions.stats import jarque_bera

    rows = [("s", v) for v in (0, 0, 0, 9)]
    df = spark.createDataFrame(rows, "source string, v long")
    r = jarque_bera(df, "source", "v").collect()[0]
    assert r["skewness"] > 1.0
    # skew² = 4/3, excess kurtosis = −2/3 → JB = 4/6·(4/3 + (4/9)/4) = 26/27
    assert abs(r["jb"] - 26 / 27) < 1e-12


def test_corpus_bleu4_hand(spark):
    """One-token substitution in a 5-token doc: precisions 4/5, 3/4,
    2/3, 1/2 → BLEU = (1/5)^(1/4); identical candidate scores 1."""
    from greenex_py_spark.functions.text import corpus_bleu4

    rows = [
        ("s", 1, "a b c d X", "a b c d e"),
        ("t", 2, "p q r s t", "p q r s t"),
    ]
    df = spark.createDataFrame(
        rows, "source string, doc_id long, cand string, ref string"
    )
    got = {r["source"]: r for r in
           corpus_bleu4(df, "source", "doc_id", "cand", "ref").collect()}
    s = got["s"]
    assert (s["m1"], s["m2"], s["m3"], s["m4"]) == (4, 3, 2, 1)
    assert (s["t1"], s["t2"], s["t3"], s["t4"]) == (5, 4, 3, 2)
    assert abs(s["bleu"] - (4 / 5 * 3 / 4 * 2 / 3 * 1 / 2) ** 0.25) < 1e-12
    assert got["t"]["bleu"] == 1.0


def test_bleu_clipping(spark):
    """Clipped counts: candidate repeating a reference token scores
    min(count_cand, count_ref), not the raw overlap."""
    from greenex_py_spark.functions.text import corpus_bleu4

    df = spark.createDataFrame(
        [("s", 1, "a a a a a", "a b c d e")],
        "source string, doc_id long, cand string, ref string",
    )
    r = corpus_bleu4(df, "source", "doc_id", "cand", "ref").collect()[0]
    assert r["m1"] == 1  # ref has a single 'a'
    assert r["m2"] == 0 and r["bleu"] == 0.0


def test_rouge_n_hand(spark):
    """Lead-2 extract of 'a b a c': ROUGE-1 = 2/4, ROUGE-2 = 1/3."""
    from greenex_py_spark.functions.text import rouge_n_recall

    df = spark.createDataFrame(
        [("s", 1, "a b", "a b a c")],
        "source string, doc_id long, cand string, ref string",
    )
    got = {r["n"]: r for r in
           rouge_n_recall(df, "source", "doc_id", "cand", "ref", 2).collect()}
    assert got[1]["matches"] == 2 and got[1]["total_ref"] == 4
    assert got[1]["rouge_n"] == 0.5
    assert got[2]["matches"] == 1 and got[2]["total_ref"] == 3
    assert abs(got[2]["rouge_n"] - 1 / 3) < 1e-12


def test_krippendorff_alpha_hand(spark):
    """Units (a,a,a) and (a,b,b): D_o = 1/3, D_e = 16/30 →
    alpha = 0.375 exactly; perfect agreement scores 1."""
    from greenex_py_spark.functions.stats import krippendorff_alpha

    df = spark.createDataFrame(
        [(1, "a", "a", "a"), (2, "a", "b", "b")],
        "i long, r1 string, r2 string, r3 string",
    )
    r = krippendorff_alpha(df, "i", ["r1", "r2", "r3"]).collect()[0]
    assert abs(r["d_o"] - 1 / 3) < 1e-15
    assert abs(r["d_e"] - 16 / 30) < 1e-15
    assert abs(r["alpha"] - 0.375) < 1e-12

    perfect = spark.createDataFrame(
        [(1, "a", "a", "a"), (2, "b", "b", "b")],
        "i long, r1 string, r2 string, r3 string",
    )
    r = krippendorff_alpha(perfect, "i", ["r1", "r2", "r3"]).collect()[0]
    assert r["d_o"] == 0.0 and r["alpha"] == 1.0


def test_bh_fdr_screen_hand(spark):
    """A 97-vs-1 spike violates the uniform null everywhere (all
    rejected); a perfectly balanced grid rejects nothing."""
    from greenex_py_spark.operators.spatial_stats import bh_fdr_screen

    spike = spark.createDataFrame(
        [(0, 0, 97), (1, 0, 1), (2, 0, 1), (3, 0, 1)],
        "gx long, gy long, cnt long",
    )
    got = bh_fdr_screen(spike).collect()
    by_cell = {(r["gx"], r["gy"]): r for r in got}
    assert by_cell[(0, 0)]["pos"] == 1 and by_cell[(0, 0)]["rejected"]
    assert by_cell[(0, 0)]["p_q"] == 0  # Chernoff exponent ≈ −59.6

    flat = spark.createDataFrame(
        [(i, 0, 25) for i in range(4)], "gx long, gy long, cnt long"
    )
    got = bh_fdr_screen(flat).collect()
    assert all(not r["rejected"] for r in got)
    assert all(r["p_q"] == 10**9 for r in got)


def test_hurst_rs_hand(spark):
    """A linear ramp is maximally persistent (H → 1); a strict
    alternation is maximally anti-persistent (R/S flat in s, H → 0)."""
    from greenex_py_spark.functions.timeseries import hurst_rs

    ramp = spark.createDataFrame(
        [(t, t) for t in range(256)], "t long, y long"
    )
    rows = hurst_rs(ramp, "t", "y", (8, 16, 32, 64)).collect()
    assert all(r["hurst"] > 0.9 for r in rows)
    by_s = {r["s"]: r["mean_rs"] for r in rows}
    assert by_s[8] < by_s[16] < by_s[32] < by_s[64]

    alt = spark.createDataFrame(
        [(t, t % 2) for t in range(256)], "t long, y long"
    )
    rows = hurst_rs(alt, "t", "y", (8, 16, 32, 64)).collect()
    assert all(abs(r["hurst"]) < 0.2 for r in rows)
    # R/S of the alternation is exactly 1 at every even block size
    assert all(r["mean_rs"] == 1.0 for r in rows)


def test_nfc_normalize_arrow_hand(spark):
    """Decomposed e + COMBINING ACUTE collapses to the composed
    form (byte-different, canonically equal); ASCII passes through
    unchanged.  Also documents WHY the kernel is mapInPandas:
    pyarrow 16.1's own utf8_normalize NFC fails to compose."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from greenex_py_spark.functions.text import nfc_normalize_arrow

    decomposed = "e\u0301cole"
    composed = "\u00e9cole"
    # the pyarrow bug this operator works around (drop the pandas
    # kernel when this assertion starts failing on a fixed Arrow)
    broken = pc.utf8_normalize(pa.array([decomposed]), form="NFC")[0].as_py()
    assert broken != composed

    df = spark.createDataFrame(
        [(1, decomposed), (2, "plain ascii")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in nfc_normalize_arrow(df).collect()}
    assert got[1]["norm"] == composed and got[1]["changed"]
    assert got[2]["norm"] == "plain ascii" and not got[2]["changed"]


def test_utf8_audit_arrow_hand(spark):
    """Byte length counts UTF-8 bytes, char length counts codepoints;
    is_ascii flags pure-ASCII rows."""
    from greenex_py_spark.functions.text import utf8_audit_arrow

    df = spark.createDataFrame(
        [(1, "abc"), (2, "caf\u00e9")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in utf8_audit_arrow(df).collect()}
    assert (got[1]["n_bytes"], got[1]["n_chars"], got[1]["is_ascii"]) == (3, 3, True)
    assert (got[2]["n_bytes"], got[2]["n_chars"], got[2]["is_ascii"]) == (5, 4, False)


def test_svm_separable(spark):
    """On a linearly separable set (y = sign of x1 − 3, wide margin)
    the quantized trainer reaches 100% resubstitution accuracy and a
    positive weight on the discriminative dim within a few rounds."""
    from greenex_py_spark.functions.svm import svm_train

    rows = [(i, [1, 6], 1) for i in range(20)] + [
        (i + 20, [1, 0], -1) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, x array<long>, y long")
    got = svm_train(df, n_dims=2, iters=4).collect()
    by_dim = {r["dim"]: r for r in got}
    assert by_dim[0]["n_correct"] == 40 and by_dim[0]["n_total"] == 40
    assert by_dim[1]["wq"] > 0          # the separating feature
    assert by_dim[0]["wq"] < 0          # bias pushes the x1=0 class negative
    assert by_dim[1]["w"] == by_dim[1]["wq"] / 1e6


def test_svm_update_is_quantized_and_deterministic(spark):
    """Two identical runs produce identical integer weights (the
    micro-unit grid removes FP order sensitivity)."""
    from greenex_py_spark.functions.svm import svm_train

    rows = [(i, [1, i % 5, (i * 7) % 3], 1 if i % 2 == 0 else -1)
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, x array<long>, y long")
    a = sorted((r["dim"], r["wq"]) for r in svm_train(df, 3, iters=3).collect())
    b = sorted((r["dim"], r["wq"]) for r in svm_train(df, 3, iters=3).collect())
    assert a == b


def test_rocchio_rerank_hand(spark):
    """With β pulling toward the feedback centroid, a query sitting
    between two clusters re-ranks its own cluster's members above the
    decoy; original-top-k hits are flagged was_feedback."""
    from greenex_py_spark.functions.retrieval import rocchio_rerank

    rows = [
        (0, [1.0, 0.2]),     # query: mostly x with a little y
        (1, [1.0, 0.0]),     # its cluster
        (2, [0.9, 0.1]),
        (3, [0.0, 1.0]),     # orthogonal decoy
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id = 0")
    got = rocchio_rerank(q, df, k=2).collect()
    assert all(r["q_id"] == 0 for r in got)
    ranked = sorted(got, key=lambda r: r["rank"])
    assert [r["n_id"] for r in ranked] == [2, 1]
    assert all(r["was_feedback"] for r in ranked)  # top-2 unchanged here


def test_jl_distortion_concentrates(spark):
    """On orthogonal-ish random-free vectors the 16-proj distortion
    stays within [0.2, 3] per pair and near 1 on average (JL with
    uniform[−1,1] entries: E[ratio] = k/3)."""
    from greenex_py_spark.functions.similarity import jl_distortion_audit

    rows = [
        (i, [1.0 if j == i else 0.1 * ((i * 7 + j) % 5) for j in range(32)])
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id < 3")
    got = jl_distortion_audit(q, df, k=5, n_proj=16).collect()
    assert len(got) == 15
    ds = [r["distortion"] for r in got]
    # 16 projections concentrate loosely — wide per-pair envelope,
    # tight mean
    assert all(0.02 < d < 8.0 for d in ds)
    assert 0.5 < sum(ds) / len(ds) < 2.0
    # exact integers on both distance sides
    assert all(r["d_true_q"] > 0 and r["d_proj_q"] >= 0 for r in got)


def test_weighted_pagerank_hand(spark):
    """A hub fed by heavy weights outranks one fed lightly; uniform
    weights reduce to the unweighted ranking."""
    from greenex_py_spark.functions.graph import pagerank, weighted_pagerank

    rows = [("a", "hub", 9), ("b", "hub", 9), ("a", "side", 1),
            ("b", "side", 1), ("hub", "a", 1), ("side", "b", 1)]
    df = spark.createDataFrame(rows, "src string, dst string, w long")
    got = {r["node"]: r["rank"] for r in weighted_pagerank(df, 3).collect()}
    assert got["hub"] > got["side"]

    uni = df.withColumn("w", df.w * 0 + 1)
    gw = {r["node"]: r["rank"] for r in weighted_pagerank(uni, 3).collect()}
    gu = {r["node"]: r["rank"] for r in
          pagerank(df.select("src", "dst"), 3).collect()}
    assert gw == gu


def test_bot_cadence_hand(spark):
    """A metronome user (exact 60 s gaps) flags as a bot (CV² = 0);
    a bursty user (1 s vs 1 h gaps) does not."""
    import datetime as dt

    from greenex_py_spark.functions.audit import bot_cadence

    t0 = dt.datetime(2026, 1, 1)
    rows = [(i, t0 + dt.timedelta(seconds=60 * i), 1) for i in range(6)]
    rows += [
        (10 + i, t0 + dt.timedelta(seconds=s), 2)
        for i, s in enumerate([0, 1, 3600, 3601, 7200, 7201])
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    got = {r["user_id"]: r for r in bot_cadence(df, min_gaps=4).collect()}
    assert got[1]["cv2"] == 0.0 and got[1]["is_bot"]
    assert got[2]["cv2"] > 1.0 and not got[2]["is_bot"]
    assert got[1]["span_s"] == 300 and got[1]["n_gaps"] == 5


def test_periodogram_finds_planted_period(spark):
    """A pure 24-sample cosine on a 240-sample grid puts the dominant
    harmonic exactly at k = 10 (period 24), with power n²·A²/4 /1 —
    and near-zero power elsewhere."""
    import math

    from greenex_py_spark.functions.timeseries import periodogram

    n, period, amp = 240, 24, 10
    rows = [
        (t, round(100 + amp * math.cos(2 * math.pi * t / period)))
        for t in range(n)
    ]
    df = spark.createDataFrame(rows, "t long, y long")
    got = {r["k"]: r for r in periodogram(df, max_k=12).collect()}
    dom = [k for k, r in got.items() if r["dominant"]]
    assert dom == [10]
    assert got[10]["period"] == 24.0
    # planted-harmonic power ≈ (n·A/2)² = 1_440_000 (rounding of y adds noise)
    assert got[10]["power"] > 1e6
    assert all(r["power"] < 1e5 for k, r in got.items() if k not in (10,))


def test_dtw_arrow_equals_window_form(spark):
    """The Arrow DP kernel is value-identical to the chained-window
    min-plus scan on random integer profiles (exact int64 DP both)."""
    from pyspark.sql import functions as F

    from greenex_py_spark.functions.timeseries import (
        dtw_to_reference, dtw_to_reference_arrow,
    )

    t = 8
    rows = []
    for g in range(5):
        for j in range(1, t + 1):
            rows.append((g, j, (g * 37 + j * j * 13) % 100))
    prof = spark.createDataFrame(rows, "g long, j long, q long")
    ref = {f"r{i}": (i * 29 + 11) % 100 for i in range(1, t + 1)}
    for c, v in ref.items():
        prof = prof.withColumn(c, F.lit(v).cast("long"))
    a = {r["g"]: r["dtw_cost"] for r in dtw_to_reference(prof, t).collect()}
    b = {r["g"]: r["dtw_cost"]
         for r in dtw_to_reference_arrow(prof, t).collect()}
    assert a == b and len(a) == 5


def test_square_count_hand(spark):
    """C4 itself counts exactly one square; adding a chord keeps one
    square (the chord makes triangles, not new 4-cycles); K4 has 3."""
    from greenex_py_spark.functions.graph import square_count

    c4 = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    df = spark.createDataFrame(c4, "src string, dst string")
    r = square_count(df).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_squares"]) == (4, 4, 1)

    k4 = c4 + [("a", "c"), ("b", "d")]
    r = square_count(spark.createDataFrame(k4, "src string, dst string")).collect()[0]
    assert r["n_squares"] == 3          # K4 contains 3 distinct 4-cycles

    tri = [("a", "b"), ("b", "c"), ("c", "a")]
    r = square_count(spark.createDataFrame(tri, "src string, dst string")).collect()[0]
    assert r["n_squares"] == 0


def test_attribute_assortativity_hand(spark):
    """Perfectly assortative labels give r = 1; a checkerboard of
    cross-class edges gives r < 0; same_cat counts the diagonal."""
    from greenex_py_spark.functions.graph import attribute_assortativity

    same = [("x", "x")] * 5 + [("y", "y")] * 5
    df = spark.createDataFrame(same, "src_cat string, dst_cat string")
    r = attribute_assortativity(df).collect()[0]
    assert r["r"] == 1.0 and r["same_cat"] == 10

    cross = [("x", "y")] * 5 + [("y", "x")] * 5
    r = attribute_assortativity(
        spark.createDataFrame(cross, "src_cat string, dst_cat string")
    ).collect()[0]
    assert r["same_cat"] == 0 and r["r"] < 0


def test_contrastive_pairs_hand(spark):
    """The positive is the true top-1; negatives follow the affine
    maps with anchor/positive collisions dropped; margins separate
    positive from random negatives on a clustered set."""
    from greenex_py_spark.functions.similarity import contrastive_pairs

    rows = [
        (i, [1.0 + 0.01 * i, 0.0] if i < 4 else [0.0, 1.0 + 0.01 * i])
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id = 0")
    got = contrastive_pairs(q, df).collect()
    assert all(r["q_id"] == 0 for r in got)
    assert all(r["pos_id"] in (1, 2, 3) for r in got)  # same cluster
    slots = sorted(r["slot"] for r in got)
    # anchor 0: negs = 7%8=7, 3%8=3, 11%8=3 — slot2/3 may collide w/ pos
    assert 1 in slots
    for r in got:
        assert r["neg_id"] not in (0, r["pos_id"])
        if r["neg_id"] >= 4:  # cross-cluster negative: clear margin
            assert r["neg_sim"] < r["pos_sim"]


def test_walk_entropy_rate_hand(spark):
    """A deterministic ring (every host one out-link) has entropy rate
    exactly 0; a uniform 4-way hub graph scores near ln 4 · π-mass of
    the linking hosts."""
    import math

    from greenex_py_spark.functions.links import walk_entropy_rate

    ring = [(f"h{i}", f"h{(i + 1) % 5}", 3) for i in range(5)]
    df = spark.createDataFrame(ring, "src_host string, dst_host string, n_links long")
    r = walk_entropy_rate(df).collect()[0]
    assert r["entropy_rate"] == 0.0 and r["n_linking_hosts"] == 5

    hub = [("hub", f"h{i}", 1) for i in range(4)]
    df = spark.createDataFrame(hub, "src_host string, dst_host string, n_links long")
    r = walk_entropy_rate(df).collect()[0]
    # only the hub links out; its entropy is ln 4, weighted by its rank
    assert 0 < r["entropy_rate"] < math.log(4)
    assert r["n_linking_hosts"] == 1 and r["n_hosts"] == 5


def test_ushape_attribution_hand(spark):
    """Path a,b,c,d → purchase gives a 0.4 / 0.1 / 0.1 / 0.4 split;
    a single-touch path gets full credit; trailing events after the
    last purchase earn nothing."""
    import datetime as dt

    import __spark_entry__  # noqa: F401 — ensures registry imports cleanly
    from greenex_py_spark.driver_queries import QUERIES  # noqa: F401

    from pyspark.sql import functions as F  # noqa: F401

    t0 = dt.datetime(2026, 1, 1)
    seq = ["a", "b", "c", "d", "purchase", "x", "purchase", "z"]
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, et, 0.0, "{}")
        for i, et in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    )
    import tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {r["touch"]: r for r in
           QUERIES["q_ushape_attribution"](spark, d).collect()}
    assert abs(got["a"]["credit"] - 0.4) < 1e-9
    assert abs(got["b"]["credit"] - 0.1) < 1e-9
    assert abs(got["c"]["credit"] - 0.1) < 1e-9
    assert abs(got["d"]["credit"] - 0.4) < 1e-9
    assert abs(got["x"]["credit"] - 1.0) < 1e-9   # single-touch path
    assert "z" not in got                          # after last purchase


def test_bowtie_decomposition_hand(spark):
    """in1 → {a,b,c cycle} → out1, plus an island pair: the cycle is
    CORE, in1 is IN, out1 is OUT, the island is OTHER."""
    from greenex_py_spark.functions.graph import bowtie_decomposition

    edges = [("a", "b"), ("b", "c"), ("c", "a"),
             ("in1", "a"), ("c", "out1"), ("x", "y")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["host"]: r["region"] for r in bowtie_decomposition(df).collect()}
    assert got["a"] == got["b"] == got["c"] == "CORE"
    assert got["in1"] == "IN" and got["out1"] == "OUT"
    assert got["x"] == "OTHER" and got["y"] == "OTHER"


def test_bowtie_full_taxonomy_hand(spark):
    """full=True sub-splits OTHER per Broder: td1 hangs off IN
    (TENDRIL_IN), td2 feeds OUT (TENDRIL_OUT), tube sits on the
    core-avoiding in1→out1 path (TUBE), the island pair is DISC; the
    CORE/IN/OUT labels are unchanged from the base decomposition."""
    from greenex_py_spark.functions.graph import bowtie_decomposition

    edges = [("a", "b"), ("b", "c"), ("c", "a"),       # core cycle
             ("in1", "a"), ("c", "out1"),              # IN / OUT
             ("in1", "td1"),                           # tendril off IN
             ("td2", "out1"),                          # tendril into OUT
             ("in1", "tube"), ("tube", "out1"),        # core-avoiding path
             ("x", "y")]                               # disconnected
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["host"]: r["region"]
        for r in bowtie_decomposition(df, full=True).collect()
    }
    assert got["a"] == got["b"] == got["c"] == "CORE"
    assert got["in1"] == "IN" and got["out1"] == "OUT"
    assert got["td1"] == "TENDRIL_IN"
    assert got["td2"] == "TENDRIL_OUT"
    assert got["tube"] == "TUBE"
    assert got["x"] == "DISC" and got["y"] == "DISC"


def test_ips_offpolicy_hand(spark):
    """Two arms with means 1.00 and 3.00: uniform-policy IPS = 2.00
    regardless of how unbalanced the logged traffic was."""
    import datetime as dt

    from greenex_py_spark.driver_queries import QUERIES

    t0 = dt.datetime(2026, 1, 1)
    rows = [(i, t0, 1, "a", 1.0, "{}") for i in range(9)]
    rows += [(9, t0, 1, "b", 3.0, "{}")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    )
    import tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {r["arm"]: r for r in QUERIES["q_ips_offpolicy"](spark, d).collect()}
    assert got["a"]["mean_reward"] == 1.0 and got["b"]["mean_reward"] == 3.0
    assert got["a"]["ips_uniform"] == 2.0   # not the logged mean 1.2


def test_em_poisson2_separates_planted_mixture(spark):
    """A planted 50/50 mixture of Poisson-ish counts around 50 and 400
    is recovered: fitted lambdas land near the true components and the
    hard assignment splits the sample."""
    from greenex_py_spark.functions.clustering import em_poisson2

    rows = [(50 + (i * 7) % 11 - 5,) for i in range(300)]
    rows += [(400 + (i * 13) % 41 - 20,) for i in range(300)]
    df = spark.createDataFrame(rows, "x long")
    got = {r["k"]: r for r in em_poisson2(df, "x", iters=4).collect()}
    assert abs(got[1]["lam"] - 50) < 15
    assert abs(got[2]["lam"] - 400) < 30
    assert got[1]["n_hard"] == 300 and got[2]["n_hard"] == 300
    assert abs(got[1]["pi"] + got[2]["pi"] - 1.0) < 1e-9


def test_em_poisson2_deterministic(spark):
    """Two runs produce bit-identical quantized parameters."""
    from greenex_py_spark.functions.clustering import em_poisson2

    df = spark.createDataFrame([((i * 17) % 200 + 10,) for i in range(200)],
                               "x long")
    a = sorted((r["k"], r["lambda_q"], r["pi_q"])
               for r in em_poisson2(df, "x", iters=3).collect())
    b = sorted((r["k"], r["lambda_q"], r["pi_q"])
               for r in em_poisson2(df, "x", iters=3).collect())
    assert a == b


def test_err_at_k_hand(spark):
    """A top-grade document at rank 1 dominates ERR (R=7/8); moving
    it to rank 2 behind an irrelevant one halves its term; closed-form
    check on a 2-doc ranking (R = (2^g − 1)/8 for grades 0..3)."""
    from greenex_py_spark.functions.retrieval import err_at_k

    # grades are md5-derived; find two ids with known grades
    import hashlib

    def grade(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 4

    hi = next(i for i in range(100) if grade(i) == 3)
    lo = next(i for i in range(100) if grade(i) == 0)
    df = spark.createDataFrame(
        [("s", hi, 2.0), ("s", lo, 1.0)],
        "source string, doc_id long, score double",
    )
    r = err_at_k(df, k=10).collect()[0]
    # ERR = (7/8)/1 + 0 = 0.875 exactly (lo has R=0)
    assert abs(r["err"] - 7 / 8) < 1e-6 and r["n_ranked"] == 2

    df2 = spark.createDataFrame(
        [("s", hi, 1.0), ("s", lo, 2.0)],
        "source string, doc_id long, score double",
    )
    r2 = err_at_k(df2, k=10).collect()[0]
    # ERR = 0 + (1/2)·(7/8)·(1 − 0) = 0.4375
    assert abs(r2["err"] - 7 / 16) < 1e-6


def test_nelson_aalen_vs_km_consistency(spark):
    """On the fixture risk table, H is nondecreasing and the KM curve
    obeys KM ≤ exp(−H) (1 − x ≤ e^−x termwise)."""
    import math

    from greenex_py_spark.driver_queries import QUERIES

    sf = "/root/testdata/sf0.001"
    na = {r["t_day"]: r for r in QUERIES["q_nelson_aalen"](spark, sf).collect()}
    km = {r["t_day"]: r for r in QUERIES["q_km_survival"](spark, sf).collect()}
    hs = [na[t]["cum_hazard"] for t in sorted(na)]
    assert hs == sorted(hs)
    for t in na:
        s_km = km[t]["survival"]
        s_na = math.exp(-na[t]["cum_hazard"])
        # 1 − x ≤ e^−x: the KM curve sits below exp(−H) always, and the
        # fixture's daily hazards (~0.3–0.6) keep the gap moderate
        assert s_km <= s_na + 1e-6
        assert abs(s_km - s_na) < 0.15 or s_km == 0.0


def test_conformal_interval_hand(spark):
    """On y = 3x + deterministic noise in [−2, 2], q̂ lands near the
    0.9-quantile of |noise| and test coverage is ≥ 0.85."""
    from greenex_py_spark.functions.stats import conformal_interval

    rows = []
    for i in range(2000):
        x = i % 50 + 1
        noise = ((i * 37) % 41 - 20) / 10.0          # ∈ [−2.0, 2.0]
        rows.append((x, int(round(3 * x + noise)), (i * 7919) % 10000))
    df = spark.createDataFrame(rows, "x long, y long, bkt long")
    r = conformal_interval(df, "x", "y", "bkt").collect()[0]
    assert abs(r["slope"] - 3.0) < 0.05
    assert 1.0 < r["q_hat"] < 2.6
    assert r["coverage"] >= 0.85
    assert r["n_train"] + r["n_cal"] + r["n_test"] == 2000


def test_knn_degree_hand(spark):
    """Star graph: the hub (k=4) has knn=1, leaves (k=1) have knn=4 —
    maximally disassortative."""
    from greenex_py_spark.driver_queries import QUERIES  # noqa: F401
    from pyspark.sql import functions as F

    # exercise the same relational shape directly on a tiny frame
    edges = [("hub", x) for x in ("a", "b", "c", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    und = df.select(F.least("src", "dst").alias("ua"),
                    F.greatest("src", "dst").alias("ub")).distinct()
    bo = und.select(F.col("ua").alias("a"), F.col("ub").alias("b")).unionByName(
        und.select(F.col("ub").alias("a"), F.col("ua").alias("b")))
    deg = bo.groupBy("a").agg(F.count(F.lit(1)).alias("dg"))
    nb = (bo.join(deg.select("a", F.col("dg").alias("k")), "a")
            .join(deg.select(F.col("a").alias("b"), F.col("dg").alias("nd")), "b")
            .groupBy("a", "k")
            .agg((F.sum("nd") / F.count("*")).alias("m")))
    got = {r["k"]: r["m"] for r in
           nb.groupBy("k").agg(F.avg("m").alias("m")).collect()}
    assert got[4] == 1.0 and got[1] == 4.0


def test_lorenz_curve_hand(spark):
    """Equal lengths give the diagonal (cum_share = (d+1)/10); the
    final decile always reaches exactly 1."""
    import tempfile

    from greenex_py_spark.driver_queries import QUERIES

    rows = [(i, "t" * 50, "en", "s", 50) for i in range(100)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = sorted(QUERIES["q_lorenz"](spark, d).collect(),
                 key=lambda r: r["decile"])
    for r in got:
        assert abs(r["cum_share"] - (r["decile"] + 1) / 10) < 1e-12
    assert got[-1]["cum_share"] == 1.0


def test_louvain_sync_two_cliques_hand(spark):
    """Two 4-cliques joined by one bridge edge: the synchronized
    integer-gain rounds must (a) be deterministic across runs, (b)
    unify each clique into one community, (c) never merge the two
    cliques across the bridge (merging them lowers modularity), and
    (d) agree row-for-row with the unrolled DuckDB oracle on the same
    edge list."""
    import duckdb

    from greenex_py_spark.functions.graph import louvain_oracle_tail, louvain_sync

    def clique(names):
        return [(a, b) for a in names for b in names if a < b]

    A = ["a1", "a2", "a3", "a4"]
    B = ["b1", "b2", "b3", "b4"]
    edges = clique(A) + clique(B) + [("a1", "b1")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["host"]: r["community"] for r in louvain_sync(df).collect()}
    again = {r["host"]: r["community"] for r in louvain_sync(df).collect()}
    assert got == again  # determinism
    assert len({got[h] for h in A}) == 1
    assert len({got[h] for h in B}) == 1
    assert got["a1"] != got["b1"]  # bridge must not merge the cliques
    # cross-engine parity on the same edge list
    con = duckdb.connect()
    vals = ", ".join(f"('{a}', '{b}')" for a, b in edges)
    sql = (
        f"WITH und(a, b) AS (VALUES {vals}),\n"
        + "u0 AS MATERIALIZED (SELECT a, b FROM und),\n"
        + louvain_oracle_tail("u0", 6, 4)
    )
    want = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert got == want


def test_louvain_sync_weighted_contraction(spark):
    """Level-2 correctness on a graph where contraction leaves real
    structure: a ring of 4 triangles joined by single bridge edges
    (a triangle is strictly denser than the ring, unlike a uniform
    cycle).  Contracted self-loops must ride in degrees (not neighbour
    gains) — verified by engine/oracle agreement, plus triangle
    cohesion in the final partition."""
    import duckdb

    from greenex_py_spark.functions.graph import louvain_oracle_tail, louvain_sync

    tris = [
        (f"t{i}a", f"t{i}b") for i in range(4)
    ] + [
        (f"t{i}a", f"t{i}c") for i in range(4)
    ] + [
        (f"t{i}b", f"t{i}c") for i in range(4)
    ]
    ring = [(f"t{i}c", f"t{(i + 1) % 4}a") for i in range(4)]
    edges = tris + ring
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["host"]: r["community"] for r in louvain_sync(df).collect()}
    for i in range(4):  # each triangle ends unified
        assert got[f"t{i}a"] == got[f"t{i}b"] == got[f"t{i}c"], i
    con = duckdb.connect()
    vals = ", ".join(
        f"('{min(a, b)}', '{max(a, b)}')" for a, b in edges
    )
    sql = (
        f"WITH und(a, b) AS (VALUES {vals}),\n"
        + "u0 AS MATERIALIZED (SELECT a, b FROM und),\n"
        + louvain_oracle_tail("u0", 6, 4)
    )
    want = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert got == want
