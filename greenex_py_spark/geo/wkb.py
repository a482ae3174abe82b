"""Minimal pure-NumPy WKB codec (Polygon / MultiPolygon, little-endian).

Geometry travels between Spark stages as a ``binary`` column in standard
WKB, so the tables stay interoperable with real geo tooling (Sedona, DuckDB
spatial, PostGIS) even though this sandbox has none of them.  Only the two
geometry types the reference pipeline produces are supported
(GreenExp/accessibility.py:119-122 filters everything else out).
"""

from __future__ import annotations

import struct

import numpy as np

_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6


def encode_polygon(rings: list[np.ndarray]) -> bytes:
    """rings[0] = exterior, rings[1:] = holes; implicitly-closed input,
    explicitly-closed WKB output."""
    out = [struct.pack("<BI", 1, _WKB_POLYGON), struct.pack("<I", len(rings))]
    for ring in rings:
        r = np.asarray(ring, dtype="<f8")
        closed = np.vstack([r, r[:1]])
        out.append(struct.pack("<I", len(closed)))
        out.append(closed.tobytes())
    return b"".join(out)


def encode_multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    out = [struct.pack("<BI", 1, _WKB_MULTIPOLYGON), struct.pack("<I", len(polys))]
    for rings in polys:
        out.append(encode_polygon(rings))
    return b"".join(out)


def decode(buf: bytes) -> list[list[np.ndarray]]:
    """Decode WKB → list of polygons, each a list of open rings.

    Polygon decodes to a 1-element list; MultiPolygon to N elements.
    """
    geom_type, off = _header(buf, 0)
    if geom_type == _WKB_POLYGON:
        poly, _ = _read_polygon_body(buf, off)
        return [poly]
    if geom_type == _WKB_MULTIPOLYGON:
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        polys = []
        for _ in range(n):
            gt, off = _header(buf, off)
            if gt != _WKB_POLYGON:
                raise ValueError(f"nested geometry type {gt} unsupported")
            poly, off = _read_polygon_body(buf, off)
            polys.append(poly)
        return polys
    raise ValueError(f"unsupported WKB geometry type {geom_type}")


def _header(buf: bytes, off: int) -> tuple[int, int]:
    byte_order = buf[off]
    if byte_order != 1:
        raise ValueError("only little-endian WKB supported")
    (geom_type,) = struct.unpack_from("<I", buf, off + 1)
    return geom_type & 0xFF, off + 5


def _read_polygon_body(buf: bytes, off: int) -> tuple[list[np.ndarray], int]:
    (n_rings,) = struct.unpack_from("<I", buf, off)
    off += 4
    rings = []
    for _ in range(n_rings):
        (n_pts,) = struct.unpack_from("<I", buf, off)
        off += 4
        r = np.frombuffer(buf, dtype="<f8", count=n_pts * 2, offset=off).reshape(n_pts, 2)
        off += n_pts * 16
        if n_pts > 1 and np.array_equal(r[0], r[-1]):
            r = r[:-1]  # reopen
        rings.append(np.ascontiguousarray(r, dtype=np.float64))
    return rings, off
