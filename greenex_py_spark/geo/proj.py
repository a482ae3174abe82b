"""Projected-CRS family (P2 in SURVEY.md §2.2) — pure NumPy, no pyproj.

The reference accepts any ``epsg_code`` and re-projects every layer
before metric math (GreenExp/accessibility.py:40-50); its own test data
is EPSG:28992 (Amersfoort / RD New) and EPSG:27700 (British National
Grid) — see FIXTURES.md.  geo/crs.py covers the default EPSG:3395
World Mercator; this module adds the projections those datasets need:

- **Transverse Mercator** (forward + inverse) with the OS/Snyder series
  (ν, ρ, η² terms to ΔL⁶ — sub-mm over a UTM zone width): all UTM
  zones 326xx/327xx (WGS84) and EPSG:27700 (Airy 1830, OSGB36);
- **Oblique (double) Stereographic** per EPSG Guidance Note 7-2:
  EPSG:28992 (Bessel 1841, Amersfoort);
- **7-parameter Helmert** datum shift through geocentric coordinates
  (position-vector convention), with the published WGS84→OSGB36 and
  WGS84→Amersfoort parameter sets.  NOTE: national grid transforms
  (OSTN15 / RDNAPTRANS) are grid-based; the Helmert sets here are the
  published single-set approximations (decimetre-level), which is the
  documented accuracy bound of this no-external-data implementation —
  the *projection* math itself is exact to sub-mm (tested against the
  published OS and EPSG worked examples).

Everything is vectorized NumPy (for Arrow kernels / oracles); the
Spark-level entry point ``project_points_epsg`` uses a pandas UDF
(Arrow-batched) for these transcendental-series projections and the
codegen path in geo/crs for EPSG:3395.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Ellipsoid:
    a: float
    inv_f: float

    @property
    def f(self) -> float:
        return 1.0 / self.inv_f

    @property
    def b(self) -> float:
        return self.a * (1.0 - self.f)

    @property
    def e2(self) -> float:
        return self.f * (2.0 - self.f)


WGS84 = Ellipsoid(6378137.0, 298.257223563)
GRS80 = Ellipsoid(6378137.0, 298.257222101)
AIRY1830 = Ellipsoid(6377563.396, 299.3249646)
BESSEL1841 = Ellipsoid(6377397.155, 299.1528128)


# ---------------------------------------------------------------------------
# Transverse Mercator (OS/Snyder series)
# ---------------------------------------------------------------------------


def _meridian_arc(phi: np.ndarray, phi0: float, ell: Ellipsoid, k0: float) -> np.ndarray:
    n = (ell.a - ell.b) / (ell.a + ell.b)
    n2, n3 = n * n, n * n * n
    dphi = phi - phi0
    sphi = phi + phi0
    return ell.b * k0 * (
        (1 + n + 1.25 * n2 + 1.25 * n3) * dphi
        - (3 * n + 3 * n2 + 21.0 / 8.0 * n3) * np.sin(dphi) * np.cos(sphi)
        + (15.0 / 8.0 * (n2 + n3)) * np.sin(2 * dphi) * np.cos(2 * sphi)
        - 35.0 / 24.0 * n3 * np.sin(3 * dphi) * np.cos(3 * sphi)
    )


def tm_forward(
    lon_deg, lat_deg, ell: Ellipsoid,
    lon0_deg: float, lat0_deg: float, k0: float, fe: float, fn: float,
):
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lam0 = np.radians(lon0_deg)
    phi0 = np.radians(lat0_deg)
    e2 = ell.e2
    s = np.sin(phi)
    c = np.cos(phi)
    t2 = np.tan(phi) ** 2
    nu = ell.a * k0 / np.sqrt(1 - e2 * s * s)
    rho = ell.a * k0 * (1 - e2) / (1 - e2 * s * s) ** 1.5
    eta2 = nu / rho - 1.0
    M = _meridian_arc(phi, phi0, ell, k0)
    I = M + fn
    II = nu / 2.0 * s * c
    III = nu / 24.0 * s * c ** 3 * (5 - t2 + 9 * eta2)
    IIIA = nu / 720.0 * s * c ** 5 * (61 - 58 * t2 + t2 * t2)
    IV = nu * c
    V = nu / 6.0 * c ** 3 * (nu / rho - t2)
    VI = nu / 120.0 * c ** 5 * (5 - 18 * t2 + t2 * t2 + 14 * eta2 - 58 * t2 * eta2)
    dl = lam - lam0
    north = I + II * dl ** 2 + III * dl ** 4 + IIIA * dl ** 6
    east = fe + IV * dl + V * dl ** 3 + VI * dl ** 5
    return east, north


def tm_inverse(
    east, north, ell: Ellipsoid,
    lon0_deg: float, lat0_deg: float, k0: float, fe: float, fn: float,
):
    E = np.asarray(east, dtype=np.float64)
    N = np.asarray(north, dtype=np.float64)
    lam0 = np.radians(lon0_deg)
    phi0 = np.radians(lat0_deg)
    e2 = ell.e2
    # footpoint latitude: iterate M(phi') = N - FN
    phi_p = (N - fn) / (ell.a * k0) + phi0
    for _ in range(16):
        M = _meridian_arc(phi_p, phi0, ell, k0)
        phi_p = phi_p + (N - fn - M) / (ell.a * k0)
    s = np.sin(phi_p)
    c = np.cos(phi_p)
    t = np.tan(phi_p)
    t2 = t * t
    nu = ell.a * k0 / np.sqrt(1 - e2 * s * s)
    rho = ell.a * k0 * (1 - e2) / (1 - e2 * s * s) ** 1.5
    eta2 = nu / rho - 1.0
    VII = t / (2 * rho * nu)
    VIII = t / (24 * rho * nu ** 3) * (5 + 3 * t2 + eta2 - 9 * t2 * eta2)
    IX = t / (720 * rho * nu ** 5) * (61 + 90 * t2 + 45 * t2 * t2)
    X = 1.0 / (c * nu)
    XI = 1.0 / (c * 6 * nu ** 3) * (nu / rho + 2 * t2)
    XII = 1.0 / (c * 120 * nu ** 5) * (5 + 28 * t2 + 24 * t2 * t2)
    XIIA = 1.0 / (c * 5040 * nu ** 7) * (61 + 662 * t2 + 1320 * t2 * t2 + 720 * t2 ** 3)
    de = E - fe
    phi = phi_p - VII * de ** 2 + VIII * de ** 4 - IX * de ** 6
    lam = lam0 + X * de - XI * de ** 3 + XII * de ** 5 - XIIA * de ** 7
    return np.degrees(lam), np.degrees(phi)


# ---------------------------------------------------------------------------
# Oblique (double) Stereographic — EPSG Guidance Note 7-2
# ---------------------------------------------------------------------------


def _sterea_consts(ell: Ellipsoid, lat0_deg: float, k0: float):
    e = np.sqrt(ell.e2)
    phi0 = np.radians(lat0_deg)
    s0 = np.sin(phi0)
    rho0 = ell.a * (1 - ell.e2) / (1 - ell.e2 * s0 * s0) ** 1.5
    nu0 = ell.a / np.sqrt(1 - ell.e2 * s0 * s0)
    R = np.sqrt(rho0 * nu0)
    n = np.sqrt(1 + ell.e2 * np.cos(phi0) ** 4 / (1 - ell.e2))
    S1 = (1 + s0) / (1 - s0)
    S2 = (1 - e * s0) / (1 + e * s0)
    w1 = (S1 * S2 ** e) ** n
    sin_chi0 = (w1 - 1) / (w1 + 1)
    c = (n + s0) * (1 - sin_chi0) / ((n - s0) * (1 + sin_chi0))
    w2 = c * w1
    chi0 = np.arcsin((w2 - 1) / (w2 + 1))
    return e, n, R, c, chi0


def sterea_forward(
    lon_deg, lat_deg, ell: Ellipsoid,
    lon0_deg: float, lat0_deg: float, k0: float, fe: float, fn: float,
):
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lam0 = np.radians(lon0_deg)
    e, n, R, c, chi0 = _sterea_consts(ell, lat0_deg, k0)
    Lam = n * (lam - lam0)
    Sa = (1 + np.sin(phi)) / (1 - np.sin(phi))
    Sb = (1 - e * np.sin(phi)) / (1 + e * np.sin(phi))
    w = c * (Sa * Sb ** e) ** n
    chi = np.arcsin((w - 1) / (w + 1))
    B = 1 + np.sin(chi) * np.sin(chi0) + np.cos(chi) * np.cos(chi0) * np.cos(Lam)
    east = fe + 2 * R * k0 * np.cos(chi) * np.sin(Lam) / B
    north = fn + 2 * R * k0 * (np.sin(chi) * np.cos(chi0) - np.cos(chi) * np.sin(chi0) * np.cos(Lam)) / B
    return east, north


def sterea_inverse(
    east, north, ell: Ellipsoid,
    lon0_deg: float, lat0_deg: float, k0: float, fe: float, fn: float,
):
    E = np.asarray(east, dtype=np.float64)
    N = np.asarray(north, dtype=np.float64)
    lam0 = np.radians(lon0_deg)
    e, n, R, c, chi0 = _sterea_consts(ell, lat0_deg, k0)
    # inverse stereographic on the conformal sphere (scale 2·R·k0)
    de = (E - fe) / (2 * R * k0)
    dn = (N - fn) / (2 * R * k0)
    rho = np.hypot(de, dn)
    ce = 2.0 * np.arctan(rho)
    safe = np.where(rho == 0.0, 1.0, rho)
    chi = np.where(
        rho == 0.0,
        chi0,
        np.arcsin(np.cos(ce) * np.sin(chi0) + dn * np.sin(ce) * np.cos(chi0) / safe),
    )
    dlam_s = np.arctan2(
        de * np.sin(ce),
        safe * np.cos(chi0) * np.cos(ce) - dn * np.sin(chi0) * np.sin(ce),
    )
    lam = np.where(rho == 0.0, lam0, lam0 + dlam_s / n)
    # conformal → geodetic latitude: w_full = (1+sinχ)/(1−sinχ) = c·(Sa·Sb^e)^n
    # so the ellipsoidal isometric latitude ψ = ln(w_full/c)/(2n); invert by
    # fixed-point iteration on φ (converges to double precision fast)
    w_full = (1 + np.sin(chi)) / (1 - np.sin(chi))
    psi = np.log(w_full / c) / (2.0 * n)
    phi = 2 * np.arctan(np.exp(psi)) - np.pi / 2
    for _ in range(16):
        es = e * np.sin(phi)
        phi = 2 * np.arctan(np.exp(psi) * ((1 + es) / (1 - es)) ** (e / 2.0)) - np.pi / 2
    return np.degrees(lam), np.degrees(phi)


# ---------------------------------------------------------------------------
# Helmert 7-parameter datum shift (position-vector sign convention)
# ---------------------------------------------------------------------------


def geodetic_to_geocentric(lon_deg, lat_deg, ell: Ellipsoid, h=0.0):
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    s = np.sin(phi)
    nu = ell.a / np.sqrt(1 - ell.e2 * s * s)
    x = (nu + h) * np.cos(phi) * np.cos(lam)
    y = (nu + h) * np.cos(phi) * np.sin(lam)
    z = (nu * (1 - ell.e2) + h) * s
    return x, y, z


def geocentric_to_geodetic(x, y, z, ell: Ellipsoid):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    lam = np.arctan2(y, x)
    p = np.hypot(x, y)
    phi = np.arctan2(z, p * (1 - ell.e2))
    for _ in range(10):
        s = np.sin(phi)
        nu = ell.a / np.sqrt(1 - ell.e2 * s * s)
        phi = np.arctan2(z + ell.e2 * nu * s, p)
    return np.degrees(lam), np.degrees(phi)


def helmert(x, y, z, params):
    """(tx, ty, tz [m], rx, ry, rz [arc-sec], s [ppm]) position-vector."""
    tx, ty, tz, rx, ry, rz, s_ppm = params
    asec = np.pi / (180.0 * 3600.0)
    rx, ry, rz = rx * asec, ry * asec, rz * asec
    m = 1.0 + s_ppm * 1e-6
    x2 = tx + m * (x - rz * y + ry * z)
    y2 = ty + m * (rz * x + y - rx * z)
    z2 = tz + m * (-ry * x + rx * y + z)
    return x2, y2, z2


def _inv_params(p):
    return tuple(-v for v in p)


# published single-set approximations (see module docstring)
WGS84_TO_OSGB36 = (-446.448, 125.157, -542.060, -0.1502, -0.2470, -0.8421, 20.4894)
WGS84_TO_AMERSFOORT = (-565.417, -50.3319, -465.552, 0.398957, -0.343988, 1.87740, -4.0725)


# ---------------------------------------------------------------------------
# EPSG registry
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class _ProjCRS:
    kind: str          # "tm" | "sterea" | "merc"
    ell: Ellipsoid
    lon0: float
    lat0: float
    k0: float
    fe: float
    fn: float
    datum_from_wgs84: tuple | None = None  # Helmert params, None = WGS84/identity


def parse_epsg(crs) -> int:
    """Accept ``28992`` / ``'28992'`` / ``'epsg:28992'`` / ``'EPSG:28992'``
    — the pyproj-style strings the reference passes straight through to
    geopandas (GreenExp/accessibility.py:40-50) — and return the integer
    code.  Unsupported CODES still fail in :func:`crs_from_epsg` with
    the actionable supported-list error; this only normalizes the
    SPELLING so real-data fixtures using CRS strings onboard unchanged."""
    if isinstance(crs, str):
        s = crs.strip().lower()
        if s.startswith("epsg:"):
            s = s[5:]
        if not s.isdigit():
            raise ValueError(
                f"cannot parse CRS {crs!r}: expected an integer EPSG code "
                "or an 'epsg:<code>' string"
            )
        return int(s)
    return int(crs)


def crs_from_epsg(code) -> _ProjCRS:
    code = parse_epsg(code)
    if 32601 <= code <= 32660:  # UTM north
        zone = code - 32600
        return _ProjCRS("tm", WGS84, zone * 6.0 - 183.0, 0.0, 0.9996, 500000.0, 0.0)
    if 32701 <= code <= 32760:  # UTM south
        zone = code - 32700
        return _ProjCRS("tm", WGS84, zone * 6.0 - 183.0, 0.0, 0.9996, 500000.0, 10000000.0)
    if code == 27700:  # British National Grid (OSGB36 / Airy 1830)
        return _ProjCRS("tm", AIRY1830, -2.0, 49.0, 0.9996012717, 400000.0, -100000.0,
                        WGS84_TO_OSGB36)
    if code == 28992:  # Amersfoort / RD New (Bessel 1841, double stereographic)
        return _ProjCRS("sterea", BESSEL1841,
                        5.0 + 23.0 / 60.0 + 15.500 / 3600.0,
                        52.0 + 9.0 / 60.0 + 22.178 / 3600.0,
                        0.9999079, 155000.0, 463000.0,
                        WGS84_TO_AMERSFOORT)
    if code == 3395:
        return _ProjCRS("merc", WGS84, 0.0, 0.0, 1.0, 0.0, 0.0)
    raise ValueError(f"unsupported epsg:{code} (supported: 326xx/327xx UTM, 27700, 28992, 3395)")


def from_wgs84(lon_deg, lat_deg, epsg: int):
    """WGS84 lon/lat (deg) → projected (x, y) in ``epsg``, incl. the
    datum shift when the target CRS is not WGS84-based."""
    crs = crs_from_epsg(epsg)
    lon, lat = np.asarray(lon_deg, np.float64), np.asarray(lat_deg, np.float64)
    if crs.datum_from_wgs84 is not None:
        x, y, z = geodetic_to_geocentric(lon, lat, WGS84)
        x, y, z = helmert(x, y, z, crs.datum_from_wgs84)
        lon, lat = geocentric_to_geodetic(x, y, z, crs.ell)
    if crs.kind == "tm":
        return tm_forward(lon, lat, crs.ell, crs.lon0, crs.lat0, crs.k0, crs.fe, crs.fn)
    if crs.kind == "sterea":
        return sterea_forward(lon, lat, crs.ell, crs.lon0, crs.lat0, crs.k0, crs.fe, crs.fn)
    from .crs import lonlat_to_mercator

    return lonlat_to_mercator(lon, lat)


def to_wgs84(x, y, epsg: int):
    """Projected (x, y) in ``epsg`` → WGS84 lon/lat (deg)."""
    crs = crs_from_epsg(epsg)
    if crs.kind == "tm":
        lon, lat = tm_inverse(x, y, crs.ell, crs.lon0, crs.lat0, crs.k0, crs.fe, crs.fn)
    elif crs.kind == "sterea":
        lon, lat = sterea_inverse(x, y, crs.ell, crs.lon0, crs.lat0, crs.k0, crs.fe, crs.fn)
    else:
        from .crs import mercator_to_lonlat

        return mercator_to_lonlat(x, y)
    if crs.datum_from_wgs84 is not None:
        gx, gy, gz = geodetic_to_geocentric(lon, lat, crs.ell)
        gx, gy, gz = helmert(gx, gy, gz, _inv_params(crs.datum_from_wgs84))
        lon, lat = geocentric_to_geodetic(gx, gy, gz, WGS84)
    return lon, lat


def utm_zone_epsg(lon_deg: float, lat_deg: float) -> int:
    """EPSG code of the UTM zone containing a WGS84 point (the
    reference's 'pick a metric CRS for this AoI' behavior)."""
    zone = int(np.floor((lon_deg + 180.0) / 6.0)) % 60 + 1
    return (32600 if lat_deg >= 0 else 32700) + zone


def project_points_epsg(
    df: DataFrame, epsg: int,
    lon_col: str = "lon", lat_col: str = "lat",
    x_col: str = "x", y_col: str = "y",
) -> DataFrame:
    """+ (x, y) in ``epsg``.  EPSG:3395 stays pure codegen
    (geo/crs.project_points); the series projections run as one
    Arrow-batched pandas UDF (vectorized NumPy, no per-row Python).
    ``epsg`` may be an int or an ``'epsg:<code>'`` string."""
    epsg = parse_epsg(epsg)
    if epsg == 3395:
        from .crs import project_points

        return project_points(df, lon_col, lat_col, x_col, y_col)
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StructType([T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]))
    def proj_udf(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        x, y = from_wgs84(lon.to_numpy(np.float64), lat.to_numpy(np.float64), epsg)
        return pd.DataFrame({"x": x, "y": y})

    out = df.withColumn("_xy", proj_udf(F.col(lon_col), F.col(lat_col)))
    return (
        out.withColumn(x_col, F.col("_xy.x")).withColumn(y_col, F.col("_xy.y")).drop("_xy")
    )


def tm_forward_sql(
    lon_expr: str, lat_expr: str, ell: Ellipsoid,
    lon0: float, lat0: float, k0: float, fe: float, fn: float,
) -> tuple[str, str]:
    """(east_sql, north_sql) — the identical Transverse Mercator series
    as ANSI-SQL text (DuckDB/Spark-runnable), literal-for-literal the
    same arithmetic as :func:`tm_forward`.  Agreement is ulp-level
    (~1e-9 m — pow() vs ** differ in the last bit), so oracle queries
    built on this should quantize to whole meters or coarser.
    """
    a, b, e2 = ell.a, ell.b, ell.e2
    n_ = (a - b) / (a + b)
    n2, n3 = n_ * n_, n_ * n_ * n_

    def D(v: float) -> str:
        return f"CAST({v!r} AS DOUBLE)"

    lam = f"radians({lon_expr})"
    phi = f"radians({lat_expr})"
    lam0 = f"radians({D(lon0)})"
    phi0 = f"radians({D(lat0)})"
    s = f"sin({phi})"
    c = f"cos({phi})"
    t2 = f"pow(tan({phi}),2)"
    nu = f"({D(a)} * {D(k0)} / sqrt(1 - {D(e2)} * {s} * {s}))"
    rho = f"({D(a)} * {D(k0)} * (1 - {D(e2)}) / pow(1 - {D(e2)} * {s} * {s}, 1.5))"
    eta2 = f"({nu} / {rho} - 1.0)"
    dphi = f"({phi} - {phi0})"
    sphi = f"({phi} + {phi0})"
    M = (
        f"({D(b)} * {D(k0)} * ((1 + {D(n_)} + 1.25*{D(n2)} + 1.25*{D(n3)}) * {dphi}"
        f" - (3*{D(n_)} + 3*{D(n2)} + 21.0/8.0*{D(n3)}) * sin({dphi}) * cos({sphi})"
        f" + (15.0/8.0*({D(n2)} + {D(n3)})) * sin(2*{dphi}) * cos(2*{sphi})"
        f" - 35.0/24.0*{D(n3)} * sin(3*{dphi}) * cos(3*{sphi})))"
    )
    I = f"({M} + {D(fn)})"
    II = f"({nu}/2.0 * {s} * {c})"
    III = f"({nu}/24.0 * {s} * pow({c},3) * (5 - {t2} + 9*{eta2}))"
    IIIA = f"({nu}/720.0 * {s} * pow({c},5) * (61 - 58*{t2} + {t2}*{t2}))"
    IV = f"({nu} * {c})"
    V = f"({nu}/6.0 * pow({c},3) * ({nu}/{rho} - {t2}))"
    VI = f"({nu}/120.0 * pow({c},5) * (5 - 18*{t2} + {t2}*{t2} + 14*{eta2} - 58*{t2}*{eta2}))"
    dl = f"({lam} - {lam0})"
    north = f"({I} + {II}*pow({dl},2) + {III}*pow({dl},4) + {IIIA}*pow({dl},6))"
    east = f"({D(fe)} + {IV}*{dl} + {V}*pow({dl},3) + {VI}*pow({dl},5))"
    return east, north
