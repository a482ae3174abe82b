"""Salted hybrid join == plain equi-join, row for row."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from greenex_py_spark.data import driver_city as city, synth
from greenex_py_spark.engine.skew import cell_histogram, hot_cells, plan_salted_cell_join
from greenex_py_spark.operators.spatial_join import bbox_cover_cells


def test_salted_join_equals_plain_join(spark):
    docs = synth.documents(spark, 5000)
    pts = synth.geocode(docs.select("url"))
    cover = bbox_cover_cells(city.greenspace_df(spark))

    plain = pts.join(cover, "cell").select("url", "gs_id")
    hybrid = plan_salted_cell_join(pts, cover, threshold=20, n_salt=4).select("url", "gs_id")

    p = plain.toPandas().sort_values(["url", "gs_id"]).reset_index(drop=True)
    h = hybrid.toPandas().sort_values(["url", "gs_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(p, h)


def test_histogram_finds_urban_core(spark):
    docs = synth.documents(spark, 20000)
    pts = synth.geocode(docs.select("url"))
    hist = cell_histogram(pts).toPandas()
    # 60% of points in the 1 km core = 100 cells out of 10000 → the top
    # cells must be core cells with ~60x the cold-cell density
    top = hist.sort_values("n_rows", ascending=False).head(50)
    gx = top.cell % (1 << 20)
    gy = top.cell // (1 << 20)
    assert ((gx >= 45) & (gx < 55) & (gy >= 45) & (gy < 55)).all()
    hot = hot_cells(pts, threshold=50).count()
    assert 50 <= hot <= 150
