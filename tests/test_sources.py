"""Catalog-table STAC selection (S5) + slippy-map tile math (S7)."""

from __future__ import annotations

import pandas as pd
import pytest


def _items(spark):
    rows = [
        # item_id, bbox, datetime, cloud, href
        ("s2_a", 4.0, 52.0, 5.0, 53.0, "2023-06-10 10:00:00", 12.5, "a.tif"),
        ("s2_b", 4.0, 52.0, 5.0, 53.0, "2023-06-20 10:00:00", 3.1, "b.tif"),
        ("s2_c", 4.0, 52.0, 5.0, 53.0, "2023-07-05 10:00:00", 3.1, "c.tif"),  # tie with b
        ("s2_d", 4.0, 52.0, 5.0, 53.0, "2023-06-15 10:00:00", 45.0, "d.tif"),  # too cloudy
        ("s2_e", 9.0, 45.0, 10.0, 46.0, "2023-06-15 10:00:00", 0.5, "e.tif"),  # wrong bbox
        # intersects but does NOT contain the AoI (covers its west half
        # only) with the lowest cloud of all — the reference's
        # contains() filter (availability.py:169) must reject it
        ("s2_f", 4.0, 52.0, 4.5, 53.0, "2023-06-18 10:00:00", 0.1, "f.tif"),
    ]
    pdf = pd.DataFrame(
        rows, columns=["item_id", "minx", "miny", "maxx", "maxy", "datetime", "cloud_cover", "asset_href"]
    )
    pdf["datetime"] = pd.to_datetime(pdf["datetime"])
    return spark.createDataFrame(pdf)


def test_stac_least_cloudy_selection(spark):
    """Reference selection semantics (availability.py:156-177): bbox ∩,
    date range, cloud<20, lowest cloud wins, deterministic tie-break."""
    from greenex_py_spark.sources.stac import filter_items, least_cloudy_item

    items = _items(spark)
    got = least_cloudy_item(items, 4.4, 52.3, 4.6, 52.4,
                            start="2023-06-01", end="2023-07-31").collect()
    # s2_f intersects with the lowest cloud but doesn't CONTAIN the AoI
    assert len(got) == 1 and got[0]["item_id"] == "s2_b"  # tie: b < c
    # date range excludes b and c → d blocked by cloud → a
    got2 = least_cloudy_item(items, 4.4, 52.3, 4.6, 52.4,
                             start="2023-06-01", end="2023-06-12").collect()
    assert got2[0]["item_id"] == "s2_a"
    n = filter_items(items, 4.4, 52.3, 4.6, 52.4).count()
    assert n == 3  # a, b, c (d too cloudy, e wrong bbox)


def test_slippy_tile_math(spark):
    """Known slippy-map values (OSM wiki worked example: Berlin
    13.41,52.52 at z14 → tile 8802/5373) + codegen == scalar mirror +
    bbox cover shape."""
    from pyspark.sql import functions as F

    from greenex_py_spark.sources.tiles import (
        tile_of, tiles_for_bbox, with_tile,
    )

    assert tile_of(0.0, 0.0, 0) == (0, 0)
    assert tile_of(13.41, 52.52, 14) == (8802, 5373)
    assert tile_of(-0.1276, 51.5072, 10) == (511, 340)  # London
    pdf = pd.DataFrame({"lon": [13.41, -0.1276, 0.0], "lat": [52.52, 51.5072, 0.0]})
    df = with_tile(spark.createDataFrame(pdf), zoom=14)
    got = {(r["tile_x"], r["tile_y"]) for r in df.collect()}
    want = {tile_of(lon, lat, 14) for lon, lat in zip(pdf.lon, pdf.lat)}
    assert got == want
    cover = tiles_for_bbox(13.3, 52.4, 13.6, 52.6, 14)
    assert tile_of(13.41, 52.52, 14) in cover
    xs = {t[0] for t in cover}
    ys = {t[1] for t in cover}
    assert len(cover) == len(xs) * len(ys) and len(cover) >= 4
    # Web-Mercator domain: poles / lon=180 clamp into the grid
    assert tile_of(180.0, 0.0, 5) == (31, 16)
    assert tile_of(0.0, -89.9, 5) == (16, 31)
    assert tile_of(0.0, 89.9, 5) == (16, 0)
    for x, y in tiles_for_bbox(-180.0, -86.0, -170.0, -80.0, 10):
        assert 0 <= x < 1024 and 0 <= y < 1024
    with pytest.raises(ValueError, match="antimeridian"):
        tiles_for_bbox(170.0, 0.0, -170.0, 1.0, 10)


def test_pysource_equals_mapinpandas_ingest(spark):
    """The Spark-4 Python DataSource scan is bit-identical to the
    mapInPandas ingest job on the same grid (per-tile quantized sums
    agree), and Spark schedules one InputPartition per tile."""
    from pyspark.sql import functions as F

    from greenex_py_spark.data import driver_city as city
    from greenex_py_spark.sources.pysource import SinCosTileSource

    spark.dataSource.register(SinCosTileSource)
    via_source = (
        spark.read.format("sincos_tiles")
        .options(x0=str(city.X0), y0=str(city.Y0), res=str(city.RES),
                 tile_px=str(city.TILE_PX), npx=str(city.NPX),
                 x_scale="500", y_scale="500")
        .load()
    )

    def tile_sums(df):
        return {
            (r["tx"], r["ty"]): r["s"]
            for r in df.select(
                "tx", "ty", F.explode("px").alias("v")
            ).groupBy("tx", "ty").agg(
                F.sum(F.round(F.col("v") * 1e6).cast("long")).alias("s")
            ).collect()
        }

    assert tile_sums(via_source) == tile_sums(
        city.tiles_df(spark, "ndvi").select("tx", "ty", "px")
    )
    assert via_source.rdd.getNumPartitions() == 16


def test_term_freq_udtf_lateral(spark):
    """The UDTF expansion equals the relational explode+groupBy and
    runs through the Arrow UDTF path."""
    from pyspark.sql import functions as F

    from greenex_py_spark.functions.udtfs import register_term_freq

    register_term_freq(spark)
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "x")], "doc_id long, text string"
    )
    df.createOrReplaceTempView("_udtf_t")
    got = {
        (r["doc_id"], r["tok"]): r["cnt"]
        for r in spark.sql(
            "SELECT d.doc_id, t.tok, t.cnt "
            "FROM _udtf_t d, LATERAL term_freq(d.text) t"
        ).collect()
    }
    assert got == {(1, "a"): 2, (1, "b"): 1, (2, "x"): 1}
    rel = {
        (r["doc_id"], r["tok"]): r["cnt"]
        for r in df.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok").count()
        .withColumnRenamed("count", "cnt").collect()
    }
    assert got == rel
