"""GeoPackage (OGC GPKG 1.x) vector-layer reader — real-data onboarding.

The reference reads and writes GeoPackage for every vector layer
(GreenExp/accessibility.py:31,173; availability.py and visibility.py use
the same ``gpd.read_file`` paths), so a user switching from it arrives
holding ``.gpkg`` files.  A GeoPackage is a SQLite container with two
metadata tables (``gpkg_contents``, ``gpkg_geometry_columns``) and one
row per feature whose geometry BLOB is a small "GP" header followed by
standard WKB — Python's stdlib ``sqlite3`` reads the container and
:mod:`greenex_py_spark.geo.wkb` decodes the payload; no GDAL/fiona
needed.

Scale envelope (documented, by design): a ``.gpkg`` is a single SQLite
file, i.e. an inherently driver-side, dim-sized source — the
reference's park layers, AOI polygons and address points, not fact
data.  The reader materializes the table on the driver (bounded by
``max_rows``) and parallelizes the decoded frame; 100 TB fact tables
belong in parquet/Iceberg, never GPKG.

Blob format (GPKG spec §2.1.3): magic ``GP``, 1-byte version, 1-byte
flags (bit 0 = srs_id byte order, bits 1-3 = envelope contents code,
bit 4 = empty-geometry flag), int32 srs_id, optional envelope of
4/6/8 doubles, then standard WKB.
"""

from __future__ import annotations

import sqlite3
import struct

import numpy as np
import pandas as pd

_ENVELOPE_DOUBLES = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}

# driver-side materialization guard (the DRIVER_MAX_EDGES device for
# this source): a dim layer is thousands of polygons; a file with more
# rows than this is being used as a fact table and should be converted
MAX_GPKG_ROWS = 2_000_000


def split_gpkg_blob(blob: bytes) -> tuple[int, bytes]:
    """GPKG geometry BLOB → (srs_id, standard WKB payload).

    Raises ValueError on a non-GPKG blob or an empty geometry (the
    reference drops empty geometries too, accessibility.py:119-122).
    """
    if len(blob) < 8 or blob[0:2] != b"GP":
        raise ValueError("not a GPKG geometry blob (missing 'GP' magic)")
    flags = blob[3]
    env_code = (flags >> 1) & 0b111
    if env_code not in _ENVELOPE_DOUBLES:
        raise ValueError(f"invalid GPKG envelope contents code {env_code}")
    if (flags >> 4) & 1:
        raise ValueError("empty GPKG geometry")
    order = "<" if flags & 1 else ">"
    (srs_id,) = struct.unpack_from(f"{order}i", blob, 4)
    off = 8 + 8 * _ENVELOPE_DOUBLES[env_code]
    return srs_id, blob[off:]


def make_gpkg_blob(wkb: bytes, srs_id: int = 0, envelope: tuple | None = None) -> bytes:
    """Standard WKB → GPKG geometry BLOB (little-endian header); the
    writer half of the round trip, also what the tests synthesize.
    ``envelope`` is (minx, maxx, miny, maxy) per the spec's XY order."""
    env_code = 1 if envelope is not None else 0
    flags = (env_code << 1) | 1  # little-endian srs_id
    head = b"GP" + bytes([0, flags]) + struct.pack("<i", srs_id)
    if envelope is not None:
        head += struct.pack("<4d", *envelope)
    return head + wkb


def list_feature_tables(path: str) -> list[tuple[str, str, int]]:
    """[(table_name, geometry_column, srs_id)] for every features layer
    declared in ``gpkg_contents`` ∩ ``gpkg_geometry_columns``."""
    with sqlite3.connect(f"file:{path}?mode=ro", uri=True) as con:
        rows = con.execute(
            "SELECT c.table_name, g.column_name, g.srs_id "
            "FROM gpkg_contents c "
            "JOIN gpkg_geometry_columns g ON g.table_name = c.table_name "
            "WHERE c.data_type = 'features' ORDER BY c.table_name"
        ).fetchall()
    return [(str(t), str(g), int(s)) for t, g, s in rows]


def read_gpkg_pdf(
    path: str, table: str | None = None, max_rows: int = MAX_GPKG_ROWS
) -> pd.DataFrame:
    """One feature table → pandas frame: all attribute columns verbatim
    plus ``wkb`` (standard WKB bytes) and ``srs_id``; rows with NULL
    geometry are dropped (the reference's dropna on geometry)."""
    tables = list_feature_tables(path)
    if not tables:
        raise ValueError(f"{path} declares no GPKG feature tables")
    if table is None:
        if len(tables) > 1:
            raise ValueError(
                f"{path} has several feature tables "
                f"{[t for t, _, _ in tables]}; pass table="
            )
        name, geom_col, _ = tables[0]
    else:
        match = [t for t in tables if t[0] == table]
        if not match:
            raise ValueError(
                f"table {table!r} not in {path} (has {[t for t, _, _ in tables]})"
            )
        name, geom_col, _ = match[0]
    with sqlite3.connect(f"file:{path}?mode=ro", uri=True) as con:
        n = con.execute(
            f'SELECT count(*) FROM (SELECT 1 FROM "{name}" LIMIT {max_rows + 1})'
        ).fetchone()[0]
        if n > max_rows:
            raise ValueError(
                f"GPKG table {name!r} exceeds {max_rows} rows; a layer this "
                "size is fact data — convert it to parquet instead of "
                "onboarding through the driver-side GPKG shim"
            )
        pdf = pd.read_sql_query(f'SELECT * FROM "{name}"', con)
    pdf = pdf[pdf[geom_col].notna()].reset_index(drop=True)
    parsed = [split_gpkg_blob(bytes(b)) for b in pdf[geom_col]]
    pdf = pdf.drop(columns=[geom_col])
    pdf["srs_id"] = [s for s, _ in parsed]
    pdf["wkb"] = [w for _, w in parsed]
    return pdf


def gpkg_polygons_df(spark, path: str, table: str | None = None):
    """Feature table → Spark DataFrame in the engine's polygon-layer
    shape: attribute columns plus ``wkb`` (binary), ``srs_id``, and the
    derived ``minx/miny/maxx/maxy/cx/cy/area`` columns every polygon
    operator keys on (the columns ``data/driver_city.greenspace_df``
    carries).  Decode runs driver-side over the dim-sized layer with
    the same NumPy kernels the distributed operators use, so stats are
    bit-identical to the engine's own fixtures."""
    from ..geo import kernels
    from ..geo import wkb as wkbmod

    pdf = read_gpkg_pdf(path, table)
    stats = {k: [] for k in ("minx", "miny", "maxx", "maxy", "cx", "cy", "area")}
    for buf in pdf["wkb"]:
        polys = wkbmod.decode(bytes(buf))
        pts = np.vstack([r for rings in polys for r in rings])
        area = sum(kernels.polygon_area(rings) for rings in polys)
        # area-weighted centroid over multipolygon parts
        cxs, cys, ws = [], [], []
        for rings in polys:
            c = kernels.polygon_centroid(rings)
            w = kernels.polygon_area(rings)
            cxs.append(c[0]), cys.append(c[1]), ws.append(w)
        wsum = sum(ws) or 1.0
        stats["minx"].append(float(pts[:, 0].min()))
        stats["miny"].append(float(pts[:, 1].min()))
        stats["maxx"].append(float(pts[:, 0].max()))
        stats["maxy"].append(float(pts[:, 1].max()))
        stats["cx"].append(float(sum(c * w for c, w in zip(cxs, ws)) / wsum))
        stats["cy"].append(float(sum(c * w for c, w in zip(cys, ws)) / wsum))
        stats["area"].append(float(area))
    for k, v in stats.items():
        pdf[k] = v
    return spark.createDataFrame(pdf)
