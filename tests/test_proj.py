"""Projection family (geo/proj): published worked examples, roundtrips,
datum shifts, and the Spark projection UDF."""

from __future__ import annotations

import numpy as np

from greenex_py_spark.geo import proj as P


def test_osgb36_published_worked_example():
    """OS 'A guide to coordinate systems in Great Britain' worked
    example: OSGB36 φ=52°39'27.2531"N λ=1°43'4.5177"E →
    E 651409.903, N 313177.270 (projection only, no datum shift)."""
    phi = 52 + 39 / 60 + 27.2531 / 3600
    lam = 1 + 43 / 60 + 4.5177 / 3600
    E, N = P.tm_forward(lam, phi, P.AIRY1830, -2.0, 49.0, 0.9996012717, 400000.0, -100000.0)
    assert abs(float(E) - 651409.903) < 1e-3
    assert abs(float(N) - 313177.270) < 1e-3
    lo, la = P.tm_inverse(E, N, P.AIRY1830, -2.0, 49.0, 0.9996012717, 400000.0, -100000.0)
    assert abs(float(lo) - lam) < 1e-8 and abs(float(la) - phi) < 1e-8


def test_rd_new_published_worked_example():
    """EPSG Guidance Note 7-2 oblique-stereographic example
    (Amersfoort / RD New): φ=53°N λ=6°E → E 196105.283, N 557057.739
    (Bessel lat/lon, projection only)."""
    E, N = P.sterea_forward(
        6.0, 53.0, P.BESSEL1841,
        5 + 23 / 60 + 15.5 / 3600, 52 + 9 / 60 + 22.178 / 3600,
        0.9999079, 155000.0, 463000.0,
    )
    assert abs(float(E) - 196105.283) < 1e-3
    assert abs(float(N) - 557057.739) < 1e-3
    lo, la = P.sterea_inverse(
        E, N, P.BESSEL1841,
        5 + 23 / 60 + 15.5 / 3600, 52 + 9 / 60 + 22.178 / 3600,
        0.9999079, 155000.0, 463000.0,
    )
    assert abs(float(lo) - 6.0) < 1e-9 and abs(float(la) - 53.0) < 1e-9


def test_utm_basics_and_roundtrip():
    E, N = P.from_wgs84(3.0, 0.0, 32631)  # central meridian, equator
    assert float(E) == 500000.0 and abs(float(N)) < 1e-9
    assert P.utm_zone_epsg(3.0, 52.0) == 32631
    assert P.utm_zone_epsg(3.0, -33.0) == 32731
    assert P.utm_zone_epsg(-122.3, 47.6) == 32610
    rng = np.random.default_rng(7)
    lon = rng.uniform(0, 6, 300)
    lat = rng.uniform(-80, 80, 300)
    E, N = P.from_wgs84(lon, lat, 32631)
    lo, la = P.to_wgs84(E, N, 32631)
    np.testing.assert_allclose(lo, lon, atol=2e-8)
    np.testing.assert_allclose(la, lat, atol=2e-8)
    # southern-hemisphere false northing
    _, Ns = P.from_wgs84(3.0, -1.0, 32731)
    assert 9.8e6 < float(Ns) < 1e7


def test_datum_shift_roundtrips_and_magnitude():
    """WGS84↔OSGB36 / Amersfoort roundtrips close to mm; the shift
    itself moves coordinates by the expected ~50-120 m."""
    rng = np.random.default_rng(9)
    for epsg, lon_rng, lat_rng in ((27700, (-5, 1.5), (50, 58)), (28992, (3.5, 7), (50.8, 53.5))):
        lon = rng.uniform(*lon_rng, 50)
        lat = rng.uniform(*lat_rng, 50)
        E, N = P.from_wgs84(lon, lat, epsg)
        lo, la = P.to_wgs84(E, N, epsg)
        np.testing.assert_allclose(lo, lon, atol=1e-7)
        np.testing.assert_allclose(la, lat, atol=1e-7)
    # datum shift is material: skipping it moves BNG coords by >40 m
    E1, N1 = P.from_wgs84(-1.0, 52.0, 27700)
    E0, N0 = P.tm_forward(-1.0, 52.0, P.AIRY1830, -2.0, 49.0, 0.9996012717, 400000.0, -100000.0)
    assert np.hypot(float(E1 - E0), float(N1 - N0)) > 40.0


def test_geocentric_roundtrip():
    rng = np.random.default_rng(1)
    lon = rng.uniform(-180, 180, 100)
    lat = rng.uniform(-89, 89, 100)
    x, y, z = P.geodetic_to_geocentric(lon, lat, P.WGS84)
    lo, la = P.geocentric_to_geodetic(x, y, z, P.WGS84)
    np.testing.assert_allclose(lo, lon, atol=1e-9)
    np.testing.assert_allclose(la, lat, atol=1e-9)


def test_project_points_epsg_spark(spark):
    """Spark UDF path equals the NumPy path bit-for-bit; EPSG:3395
    dispatches to the codegen column expressions."""
    import pandas as pd

    pdf = pd.DataFrame({"id": [1, 2, 3], "lon": [0.7, 3.0, 5.9], "lat": [45.5, 50.0, 54.9]})
    df = spark.createDataFrame(pdf, schema="id long, lon double, lat double")
    got = P.project_points_epsg(df, 32631).toPandas().sort_values("id")
    E, N = P.from_wgs84(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 32631)
    np.testing.assert_array_equal(got["x"].to_numpy(), E)
    np.testing.assert_array_equal(got["y"].to_numpy(), N)
    got2 = P.project_points_epsg(df, 3395).toPandas().sort_values("id")
    from greenex_py_spark.geo.crs import lonlat_to_mercator

    Em, Nm = lonlat_to_mercator(pdf["lon"].to_numpy(), pdf["lat"].to_numpy())
    # JVM codegen vs NumPy: pow/** differ in the last ulp (~3e-9 m here)
    np.testing.assert_allclose(got2["x"].to_numpy(), Em, rtol=0, atol=1e-7)
    np.testing.assert_allclose(got2["y"].to_numpy(), Nm, rtol=0, atol=1e-7)
