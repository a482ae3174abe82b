"""Registry of driver-checkable queries (the CORRECTNESS gate).

Each entry pairs a Spark implementation (an engine operator run over the
deterministic driver-city inputs, see data/driver_city.py) with the
equivalent DuckDB SQL over the same parquet tables.  Column names/aliases
match exactly; all formulas come from the shared driver_city module so
the two sides cannot drift.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .data import driver_city as city

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# shared CTE header for the oracle SQL
_CTE = f"""WITH pts AS ({city.points_sql()}),
gs_ids AS ({city.gs_ids_sql()}),
greens AS ({city.greenspace_sql()})
"""


# ---------------------------------------------------------------------------
# q_geocode_cells — deterministic geocode + grid cell (tile) assignment
# ---------------------------------------------------------------------------

@register(
    "q_geocode_cells",
    _CTE + f"""
SELECT doc_id, x, y, {city.cell_expr_sql('x', 'y')} AS cell
FROM pts
""",
)
def q_geocode_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    return city.with_cell(city.points_df(spark, sf_dir)).select("doc_id", "x", "y", "cell")


# ---------------------------------------------------------------------------
# q_pip_join — flagship point-in-polygon join (cell prefilter + exact test)
# ---------------------------------------------------------------------------

@register(
    "q_pip_join",
    _CTE + """
SELECT p.doc_id, g.gs_id
FROM pts p JOIN greens g
  ON p.x >= g.minx AND p.x < g.maxx AND p.y >= g.miny AND p.y < g.maxy
""",
)
def q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.spatial_join import point_in_rect_join

    pts = city.points_df(spark, sf_dir)
    greens = city.greenspace_df(spark)
    return point_in_rect_join(pts, greens, point_key="doc_id").select("doc_id", "gs_id")


# ---------------------------------------------------------------------------
# q_accessibility — distance to nearest greenspace centroid (clamped)
# ---------------------------------------------------------------------------

_TARGET = 300.0
_MIN_AREA = 400.0

@register(
    "q_accessibility",
    _CTE + f"""
, cand AS (
  SELECT p.doc_id,
         round(sqrt((g.cx - p.x)*(g.cx - p.x) + (g.cy - p.y)*(g.cy - p.y)), 0) AS dist
  FROM pts p JOIN greens g
    ON g.area >= {_MIN_AREA}
   AND (power(greatest(0.0, g.minx - p.x, p.x - g.maxx), 2)
      + power(greatest(0.0, g.miny - p.y, p.y - g.maxy), 2)) <= {_TARGET * _TARGET}
), near AS (
  SELECT doc_id, min(dist) AS min_dist FROM cand GROUP BY doc_id
)
SELECT p.doc_id,
       coalesce(near.min_dist <= {_TARGET}, false) AS greenspace_within,
       coalesce(least(near.min_dist, {_TARGET}), {_TARGET}) AS distance_to_greenspace
FROM (SELECT DISTINCT doc_id FROM pts) p
LEFT JOIN near ON p.doc_id = near.doc_id
""",
)
def q_accessibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.accessibility import shortest_distance_greenspace

    pts = city.points_df(spark, sf_dir)
    greens = city.greenspace_df(spark)
    return shortest_distance_greenspace(
        pts, greens, target_dist=_TARGET, min_area=_MIN_AREA, id_col="doc_id"
    )


# ---------------------------------------------------------------------------
# q_mean_ndvi — zonal mean/std of the closed-form NDVI raster (A1)
# ---------------------------------------------------------------------------

_NDVI_R = 300.0


def _pixel_cte(radius: float) -> str:
    """CTE text: every raster pixel whose center falls in each point's
    circular buffer — expects a prior ``pts`` CTE."""
    span = int(radius / city.RES) + 1
    return f"""
, px0 AS (
  SELECT p.doc_id, p.x, p.y,
         CAST(floor((p.x - {city.X0}) / {city.RES}) AS BIGINT) + a.range AS ix,
         CAST(floor((p.y - {city.Y0}) / {city.RES}) AS BIGINT) + b.range AS iy
  FROM pts p, range(-{span}, {span + 1}) a, range(-{span}, {span + 1}) b
), pxc AS (
  SELECT doc_id, x, y, ix, iy,
         {city.X0} + (ix + 0.5) * {city.RES} AS cx,
         {city.Y0} + (iy + 0.5) * {city.RES} AS cy
  FROM px0
  WHERE ix BETWEEN 0 AND {city.NPX - 1} AND iy BETWEEN 0 AND {city.NPX - 1}
), pxin AS (
  SELECT doc_id, ix, iy, cx, cy FROM pxc
  WHERE (cx - x) * (cx - x) + (cy - y) * (cy - y) <= {radius * radius}
)"""


@register(
    "q_mean_ndvi",
    _CTE + _pixel_cte(_NDVI_R) + f"""
, px AS (
  SELECT doc_id, greatest({city.NDVI_SQL.format(px_x='cx', px_y='cy')}, 0.0) AS v
  FROM pxin
)
SELECT doc_id,
       round(avg(v), 3) AS mean_NDVI,
       round(sqrt(greatest(avg(v * v) - avg(v) * avg(v), 0.0)), 3) AS std_NDVI
FROM px GROUP BY doc_id
""",
)
def q_mean_ndvi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.zonal import zonal_mean_std

    pts = city.points_df(spark, sf_dir)
    tiles = city.tiles_df(spark, "ndvi")
    return zonal_mean_std(
        pts, tiles, radius=_NDVI_R, id_col="doc_id", out_prefix="NDVI", grid=city.grid()
    )


# ---------------------------------------------------------------------------
# q_landcover_pct — class-percentage pivot with %-strings (A2)
# ---------------------------------------------------------------------------

_LC_R = 500.0
_lc_cls_sql = city.LC_SQL.format(ix="ix", iy="iy")

_lc_cols_sql = ",\n       ".join(
    f"CAST(round(100.0 * sum(CASE WHEN cls = {v} THEN 1 ELSE 0 END) / count(*), 3) AS VARCHAR)"
    f" || '%' AS class_{v}"
    for v in city.LC_CLASSES
)

@register(
    "q_landcover_pct",
    _CTE + _pixel_cte(_LC_R) + f"""
, px AS (
  SELECT doc_id, {_lc_cls_sql} AS cls FROM pxin
)
SELECT doc_id, {_lc_cols_sql}
FROM px GROUP BY doc_id
""",
)
def q_landcover_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.zonal import zonal_class_percentages

    pts = city.points_df(spark, sf_dir)
    tiles = city.tiles_df(spark, "landcover")
    return zonal_class_percentages(
        pts, tiles, radius=_LC_R, class_values=list(city.LC_CLASSES), id_col="doc_id",
        grid=city.grid(),
    )


@register(
    "q_zonal_variety",
    _CTE + _pixel_cte(_LC_R) + f"""
, px AS (
  SELECT doc_id, {_lc_cls_sql} AS cls FROM pxin
),
c AS (SELECT doc_id, cls, count(*) AS cnt FROM px GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY cnt DESC, cls ASC) AS rn
      FROM c)
SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_px,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(max(CASE WHEN rn = 1 THEN cls END) AS BIGINT) AS majority_cls,
       CAST(max(CASE WHEN rn = 1 THEN cnt END) AS BIGINT) AS majority_cnt
FROM r GROUP BY doc_id
""",
)
def q_zonal_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal variety + majority over the categorical landcover raster
    (FRAGSTATS richness beside q_landcover_pct's percentage pivot):
    distinct classes per 500 m buffer plus the dominant class and its
    pixel count — all integers, argmax ties to the smaller class id on
    both sides.  Same cell-cogrouped circle-mask kernel, so the pixel
    membership semantics cannot drift from the A2 family."""
    from .operators.zonal import zonal_class_variety

    pts = city.points_df(spark, sf_dir)
    tiles = city.tiles_df(spark, "landcover")
    return zonal_class_variety(
        pts, tiles, radius=_LC_R, id_col="doc_id", grid=city.grid()
    )


# ---------------------------------------------------------------------------
# q_project_utm — P2 projection family: WGS84 lon/lat → UTM 31N through
# the Transverse Mercator series; oracle is the SAME series generated as
# SQL (tm_forward_sql).  Agreement is ulp-level (~1e-9 m), so the gate
# quantizes to whole meters; sub-mm accuracy is pinned in pytest against
# the published OS / EPSG worked examples (tests/test_proj.py).
# ---------------------------------------------------------------------------

_LONLAT = (
    "(0.5 + ((doc_id * 48271) % 1000000) / 1000000.0 * 5.0)",
    "(45.0 + ((doc_id * 16807 + 12345) % 1000000) / 1000000.0 * 10.0)",
)


def _project_utm_oracle() -> str:
    from .geo.proj import WGS84, tm_forward_sql

    e_sql, n_sql = tm_forward_sql(_LONLAT[0], _LONLAT[1], WGS84, 3.0, 0.0, 0.9996, 500000.0, 0.0)
    return (
        f"SELECT doc_id, CAST(floor({e_sql}) AS BIGINT) AS easting_m,"
        f" CAST(floor({n_sql}) AS BIGINT) AS northing_m FROM documents"
    )


@register("q_project_utm", None)  # generated oracle attached below
def q_project_utm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: project deterministic WGS84 lon/lat (derived from doc_id) to
    EPSG:32631 via the Arrow-batched projection UDF; whole-meter floor
    on both sides (reference: accessibility.py:40-50 CRS forcing)."""
    from .geo.proj import project_points_epsg

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    did = F.col("doc_id")
    pts = docs.select(
        "doc_id",
        (0.5 + ((did * 48271) % 1000000) / 1000000.0 * 5.0).alias("lon"),
        (45.0 + ((did * 16807 + 12345) % 1000000) / 1000000.0 * 10.0).alias("lat"),
    )
    out = project_points_epsg(pts, 32631)
    return out.select(
        "doc_id",
        F.floor(F.col("x")).cast("long").alias("easting_m"),
        F.floor(F.col("y")).cast("long").alias("northing_m"),
    )


ORACLES["q_project_utm"] = _project_utm_oracle()


# ---------------------------------------------------------------------------
# q_resample — R2 nearest-neighbour regrid onto a deliberately offset
# 7 m grid; per-target-tile integer checksums (each value quantized to
# 1e-6 BEFORE summing so FP summation order can't flip the hash)
# ---------------------------------------------------------------------------

_RS_OX, _RS_OY, _RS_RES, _RS_NPX, _RS_TPX = 3.0, 4.0, 7.0, 500, 128

# ORACLE PRECONDITION (ADVICE r02): the DuckDB oracle below evaluates the
# NDVI formula unconditionally at the mapped source index, while the
# engine emits null (excluded from the checksum) for target centers
# OUTSIDE the source raster.  The two agree only while the target grid
# sits entirely inside the source — assert it here so changing any
# constant fails loudly instead of as an opaque hash mismatch.
for _off, _n in ((_RS_OX, _RS_NPX), (_RS_OY, _RS_NPX)):
    assert _off >= 0 and _off + _n * _RS_RES <= city.NPX * city.RES, (
        "q_resample target grid must be contained in the source raster; "
        "guard the oracle with CASE WHEN six/siy BETWEEN 0 AND NPX-1 "
        "before moving it outside"
    )

_rs_six = f"CAST(floor(({city.X0 + _RS_OX} + (i.range + 0.5) * {_RS_RES} - {city.X0}) / {city.RES}) AS BIGINT)"
_rs_siy = f"CAST(floor(({city.Y0 + _RS_OY} + (j.range + 0.5) * {_RS_RES} - {city.Y0}) / {city.RES}) AS BIGINT)"

@register(
    "q_resample",
    f"""
WITH v AS (
  SELECT CAST(i.range // {_RS_TPX} AS BIGINT) AS tx,
         CAST(j.range // {_RS_TPX} AS BIGINT) AS ty,
         {city.NDVI_SQL.format(
             px_x=f"{city.X0} + ({_rs_six} + 0.5) * {city.RES}",
             px_y=f"{city.Y0} + ({_rs_siy} + 0.5) * {city.RES}")} AS val
  FROM range({_RS_NPX}) i, range({_RS_NPX}) j
)
SELECT tx, ty,
       CAST(sum(CAST(floor(val * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS checksum_e6,
       count(*) AS n_px
FROM v GROUP BY tx, ty
""",
)
def q_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2 regrid: the 10 m NDVI raster gathered onto a 7 m grid offset
    by (3, 4) m — every target pixel crosses source-pixel boundaries, so
    identity shortcuts can't pass.  Output is a per-target-tile integer
    checksum of the quantized values (gdal.Warp parity surface:
    availability.py:181,457; visibility.py:123)."""
    from .geo.grid import GridSpec
    from .operators.resample import resample_nearest

    tiles = city.tiles_df(spark, "ndvi")
    dst = GridSpec(city.X0 + _RS_OX, city.Y0 + _RS_OY, _RS_RES, _RS_TPX, _RS_NPX, _RS_NPX)
    out = resample_nearest(tiles, dst, src_grid=city.grid())
    return (
        out.select(
            F.col("tx").cast("long").alias("tx"),
            F.col("ty").cast("long").alias("ty"),
            F.explode("px").alias("v"),
        )
        .groupBy("tx", "ty")
        .agg(
            F.sum(F.floor(F.col("v") * 1000000 + 0.5).cast("long")).alias("checksum_e6"),
            F.count("*").alias("n_px"),
        )
    )


# ---------------------------------------------------------------------------
# q_resample_reproject — R2 + P2 composed: a UTM-31N source raster
# gathered onto a WGS84 lon/lat target grid (the reference reprojects
# with gdal.Warp before zonal math, visibility.py:123-127).  The target
# pixel centers run through the Transverse Mercator forward series —
# NumPy in the engine kernel, the IDENTICAL series as SQL text in the
# oracle (geo/proj.tm_forward_sql, ulp-level agreement) — then index the
# source grid; the value at (six, siy) is exact integer-modular math so
# any index disagreement flips the hash.
# ---------------------------------------------------------------------------

_RP_LON0, _RP_LAT0, _RP_RES_DEG, _RP_NPX, _RP_TPX = 3.05, 45.1, 0.001, 256, 128
_RP_SX0, _RP_SY0, _RP_SRES, _RP_SNPX, _RP_STPX = 500000.0, 4990000.0, 50.0, 1000, 250
_RP_UTM = (3.0, 0.0, 0.9996, 500000.0, 0.0)  # lon0/lat0/k0/fe/fn, EPSG:32631


def _rp_value(six, siy):
    """Deterministic source raster value — integer modular arithmetic,
    bit-identical across NumPy and DuckDB doubles."""
    return ((six * 7 + siy * 13) % 401) / 400.0


def _rp_guard() -> None:
    """ORACLE PRECONDITION: (a) every target center maps inside the
    source raster (the engine emits NaN outside, the oracle evaluates
    unconditionally — same contract as q_resample); (b) no mapped
    coordinate sits within 1e-6 source-pixel of an index boundary, so
    the ~1e-9 m NumPy-vs-SQL series difference can never flip floor().
    Pure NumPy over the 256² target centers — runs once, at gate build."""
    from .geo.proj import WGS84, tm_forward

    i = np.arange(_RP_NPX)
    lon = _RP_LON0 + (i + 0.5) * _RP_RES_DEG
    lat = _RP_LAT0 + (i + 0.5) * _RP_RES_DEG
    LON, LAT = np.meshgrid(lon, lat)
    E, N = tm_forward(LON, LAT, WGS84, *_RP_UTM)
    for v, o in ((E, _RP_SX0), (N, _RP_SY0)):
        f = (v - o) / _RP_SRES
        assert f.min() >= 0 and f.max() < _RP_SNPX, "target maps outside source"
        frac = np.abs(f - np.round(f))
        assert frac.min() > 1e-6, "target center too close to a source-pixel seam"


def _rp_src_tiles(spark: SparkSession) -> DataFrame:
    """Synthetic UTM-31N source tile table (same mapInPandas ingest shape
    as data/driver_city.tiles_df)."""
    n_tiles = (_RP_SNPX + _RP_STPX - 1) // _RP_STPX

    def gen(batches):
        for pdf in batches:
            out = []
            for tid in pdf["id"].to_numpy():
                ty, tx = divmod(int(tid), n_tiles)
                w = min(_RP_STPX, _RP_SNPX - tx * _RP_STPX)
                h = min(_RP_STPX, _RP_SNPX - ty * _RP_STPX)
                ix = tx * _RP_STPX + np.arange(w)
                iy = ty * _RP_STPX + np.arange(h)
                vals = _rp_value(ix[None, :], iy[:, None])
                out.append(
                    {
                        "layer": "utm_ndvi", "tx": tx, "ty": ty,
                        "x0": _RP_SX0 + tx * _RP_STPX * _RP_SRES,
                        "y0": _RP_SY0 + ty * _RP_STPX * _RP_SRES,
                        "res": _RP_SRES, "w": w, "h": h,
                        "px": vals.ravel(),
                    }
                )
            yield pd.DataFrame(out)

    schema = (
        "layer string, tx int, ty int, x0 double, y0 double, "
        "res double, w int, h int, px array<double>"
    )
    return (
        spark.range(n_tiles * n_tiles)
        .repartition(max(spark.sparkContext.defaultParallelism, 4))
        .mapInPandas(gen, schema=schema)
    )


def _rp_oracle() -> str:
    from .geo.proj import WGS84, tm_forward_sql

    east, north = tm_forward_sql(
        f"({_RP_LON0} + (i.range + 0.5) * {_RP_RES_DEG})",
        f"({_RP_LAT0} + (j.range + 0.5) * {_RP_RES_DEG})",
        WGS84, *_RP_UTM,
    )
    return f"""
WITH idx AS (
  SELECT CAST(i.range // {_RP_TPX} AS BIGINT) AS tx,
         CAST(j.range // {_RP_TPX} AS BIGINT) AS ty,
         CAST(floor(({east} - {_RP_SX0}) / {_RP_SRES}) AS BIGINT) AS six,
         CAST(floor(({north} - {_RP_SY0}) / {_RP_SRES}) AS BIGINT) AS siy
  FROM range({_RP_NPX}) i, range({_RP_NPX}) j
)
SELECT tx, ty,
       CAST(sum(CAST(floor(((six * 7 + siy * 13) % 401) / 400.0 * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS checksum_e6,
       count(*) AS n_px
FROM idx GROUP BY tx, ty
"""


@register("q_resample_reproject", None)  # oracle attached below (generated SQL)
def q_resample_reproject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2+P2 composed (VERDICT r02 #4): nearest-neighbour regrid ACROSS
    CRSs — UTM-31N source raster onto a WGS84 degree grid, target
    centers projected through the TM forward series inside the Arrow
    gather kernel (resample_nearest's transform hook); per-target-tile
    integer checksums (gdal.Warp parity: visibility.py:123-127)."""
    from .geo.grid import GridSpec
    from .geo.proj import WGS84, tm_forward
    from .operators.resample import resample_nearest

    _rp_guard()
    dst = GridSpec(_RP_LON0, _RP_LAT0, _RP_RES_DEG, _RP_TPX, _RP_NPX, _RP_NPX)
    src_grid = GridSpec(_RP_SX0, _RP_SY0, _RP_SRES, _RP_STPX, _RP_SNPX, _RP_SNPX)
    out = resample_nearest(
        _rp_src_tiles(spark), dst, src_grid=src_grid,
        transform=lambda X, Y: tm_forward(X, Y, WGS84, *_RP_UTM),
    )
    return (
        out.select(
            F.col("tx").cast("long").alias("tx"),
            F.col("ty").cast("long").alias("ty"),
            F.explode("px").alias("v"),
        )
        .groupBy("tx", "ty")
        .agg(
            F.sum(F.floor(F.col("v") * 1000000 + 0.5).cast("long")).alias("checksum_e6"),
            F.count("*").alias("n_px"),
        )
    )


ORACLES["q_resample_reproject"] = _rp_oracle()


# ---------------------------------------------------------------------------
# q_greenspace_cover — % of square buffer covered by greenspace (A3)
# ---------------------------------------------------------------------------

_GS_R = 250.0

@register(
    "q_greenspace_cover",
    _CTE + f"""
, ov AS (
  SELECT p.doc_id,
         greatest(0.0, least(g.maxx, p.x + {_GS_R}) - greatest(g.minx, p.x - {_GS_R}))
       * greatest(0.0, least(g.maxy, p.y + {_GS_R}) - greatest(g.miny, p.y - {_GS_R})) AS ovl
  FROM pts p JOIN greens g
    ON g.maxx > p.x - {_GS_R} AND g.minx < p.x + {_GS_R}
   AND g.maxy > p.y - {_GS_R} AND g.miny < p.y + {_GS_R}
), s AS (
  SELECT doc_id, sum(ovl) AS ov_sum FROM ov GROUP BY doc_id
)
SELECT p.doc_id,
       CAST(round(coalesce(s.ov_sum, 0.0) / {4.0 * _GS_R * _GS_R} * 100.0, 2) AS VARCHAR)
       || '%' AS greenspace_cover
FROM (SELECT DISTINCT doc_id FROM pts) p
LEFT JOIN s ON p.doc_id = s.doc_id
""",
)
def q_greenspace_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.zonal import cover_percentage_square

    pts = city.points_df(spark, sf_dir)
    greens = city.greenspace_df(spark)
    return cover_percentage_square(pts, greens, radius=_GS_R, id_col="doc_id")


# ===========================================================================
# Web-scale text / dedup / similarity operators (SURVEY.md "beyond the
# reference" families) — all relational, all with exact DuckDB oracles.
# ===========================================================================

# corpus with planted duplicates: exact clones (+1e6) and near clones with
# the last word dropped (+2e6) — otherwise a random corpus has no dups and
# the dedup oracles would compare empty sets.
_CORPUS_SQL = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 25 = 0
  UNION ALL
  SELECT doc_id + 2000000,
         array_to_string(
           list_slice(string_split(text, ' '), 1, len(string_split(text, ' ')) - 1), ' ')
  FROM documents WHERE doc_id % 25 = 1
)
"""


def _corpus_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    near = docs.filter(F.col("doc_id") % 25 == 1).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.array_join(F.slice(toks, 1, F.size(toks) - 1), " ").alias("text"),
    )
    exact = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return docs.unionByName(exact).unionByName(near)


_STOP_SQL = "('the','a','of','to','and','in','for','on','with','at','by','from')"


@register(
    "q_exact_dedup",
    f"WITH {_CORPUS_SQL.strip()}\n"
    """
SELECT min(doc_id) AS rep_id, count(*) AS n_dups
FROM corpus GROUP BY text HAVING count(*) >= 2
""",
)
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.dedup import exact_duplicates

    return exact_duplicates(_corpus_df(spark, sf_dir))


@register(
    "q_dedup_yield",
    f"WITH {_CORPUS_SQL.strip()},\n"
    """
h AS (SELECT doc_id, md5(text) AS h FROM corpus),
f AS (SELECT doc_id,
             CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY h)
                  THEN 1 ELSE 0 END AS fst
      FROM h),
r AS (SELECT doc_id, fst,
             row_number() OVER (ORDER BY doc_id) AS rnk,
             count(*) OVER () AS n
      FROM f)
SELECT CAST((rnk - 1) * 10 // n AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(fst) AS BIGINT) AS n_new,
       CAST(sum(fst) AS DOUBLE) / count(*) AS new_rate
FROM r GROUP BY 1
""",
)
def q_dedup_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal dedup yield by crawl-order decile over the planted
    corpus: first-occurrence rate per rank bucket — the saturation
    curve that says whether the next snapshot is still worth crawling
    (the planted exact clones at doc_id+1e6 drag the late deciles
    below 1.0 while the early ones stay pristine).  Hash-first; the
    global rank is the two-phase range-partition form, never a
    single-task window."""
    from .functions.dedup import dedup_yield

    return dedup_yield(_corpus_df(spark, sf_dir), n_buckets=10)


def _url_canonical_oracle() -> str:
    from .functions.dedup import canonicalize_url_sql

    variants = (
        "CASE doc_id % 3 "
        "WHEN 0 THEN 'https://Site' || CAST(doc_id // 3 AS VARCHAR) || '.Example/a//b/' "
        "WHEN 1 THEN 'https://site' || CAST(doc_id // 3 AS VARCHAR) || '.example/a/b?utm_source=x&utm_campaign=y#frag' "
        "ELSE 'HTTPS://SITE' || CAST(doc_id // 3 AS VARCHAR) || '.EXAMPLE/a/b?ref=rss&keep=1&gclid=z' END"
    )
    canon = canonicalize_url_sql("raw_url")
    return f"""
WITH u AS (SELECT doc_id, {variants} AS raw_url FROM documents),
c AS (SELECT doc_id, {canon} AS canonical_url FROM u)
SELECT canonical_url, min(doc_id) AS rep_id, count(*) AS n_dups
FROM c GROUP BY canonical_url HAVING count(*) >= 2
"""


@register("q_url_canonical", None)  # generated oracle attached below
def q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup over planted crawl-URL variants
    (case-folded host, tracking params, fragments, duplicate/trailing
    slashes): groups of 3 raw variants must collapse to one canonical
    URL, except every third group where a genuine '?keep=1' param
    survives — the RE2-portable regexp chain is mirrored literally in
    the DuckDB oracle."""
    from .functions.dedup import url_duplicates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    did = F.col("doc_id")
    base = (did / 3).cast("long").cast("string")
    raw = (
        F.when(did % 3 == 0, F.concat(F.lit("https://Site"), base, F.lit(".Example/a//b/")))
        .when(did % 3 == 1, F.concat(F.lit("https://site"), base, F.lit(".example/a/b?utm_source=x&utm_campaign=y#frag")))
        .otherwise(F.concat(F.lit("HTTPS://SITE"), base, F.lit(".EXAMPLE/a/b?ref=rss&keep=1&gclid=z")))
    )
    urls = docs.select("doc_id", raw.alias("url"))
    return url_duplicates(urls)


ORACLES["q_url_canonical"] = _url_canonical_oracle()


# shared blocklist spec for q_url_blocklist: rules and URL variants both
# generated from these literals so Spark and the oracle cannot drift
_BLOCK_RULES: list[tuple[int, str, str | None]] = [
    (1, "ads.example", None),
    (2, "adnet.io", None),
    (3, "sample.net", "/casino"),
]
_BLOCK_URL_CASES: list[str] = [
    "'https://site' || CAST(doc_id // 7 AS VARCHAR) || '.example/a/b'",
    "'https://ads.example/banner?x=1'",
    "'https://sub.adnet.io/t' || CAST(doc_id // 7 AS VARCHAR)",
    "'https://blog.sample.net/casino/room' || CAST(doc_id // 7 AS VARCHAR)",
    "'https://blog.sample.net/news/' || CAST(doc_id // 7 AS VARCHAR)",
]


def _url_blocklist_oracle() -> str:
    from .functions.dedup import _URL_HOST_RE, _URL_PREFIX_RE

    variants = (
        "CASE doc_id % 5 "
        + " ".join(f"WHEN {i} THEN {c}" for i, c in enumerate(_BLOCK_URL_CASES))
        + " END"
    )
    rules = ", ".join(
        f"({rid}, '{dom}', " + (f"'{pre}'" if pre is not None else "CAST(NULL AS VARCHAR)") + ")"
        for rid, dom, pre in _BLOCK_RULES
    )
    return f"""
WITH u AS (SELECT doc_id, {variants} AS url FROM documents),
h AS (SELECT doc_id,
        lower(regexp_extract(url, '{_URL_HOST_RE}', 1)) AS host,
        regexp_extract(regexp_replace(url, '{_URL_PREFIX_RE}', '', 'g'),
                       '^[^?#]*', 0) AS path
      FROM u),
r(rule_id, domain, path_prefix) AS (VALUES {rules}),
j AS (SELECT h.doc_id, h.host,
        CAST(COALESCE(min(r.rule_id), -1) AS BIGINT) AS rule_id
      FROM h LEFT JOIN r
        ON (h.host = r.domain OR ends_with(h.host, '.' || r.domain))
       AND (r.path_prefix IS NULL OR starts_with(h.path, r.path_prefix))
      GROUP BY h.doc_id, h.host)
SELECT doc_id, host, rule_id, rule_id != -1 AS blocked FROM j
"""


@register("q_url_blocklist")
def q_url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UT1-style URL blocklist filter over planted crawl URLs: exact
    and subdomain matches on blocked domains plus one domain+path-prefix
    rule, with a clean case sharing the blocked domain but not the path
    (proves the prefix is actually checked).  Blocklist broadcast into a
    non-equi LEFT join; lowest matching rule wins."""
    from .functions.dedup import url_blocklist

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    did = F.col("doc_id")
    k = (did / 7).cast("long").cast("string")
    url = (
        F.when(did % 5 == 0, F.concat(F.lit("https://site"), k, F.lit(".example/a/b")))
        .when(did % 5 == 1, F.lit("https://ads.example/banner?x=1"))
        .when(did % 5 == 2, F.concat(F.lit("https://sub.adnet.io/t"), k))
        .when(did % 5 == 3, F.concat(F.lit("https://blog.sample.net/casino/room"), k))
        .otherwise(F.concat(F.lit("https://blog.sample.net/news/"), k))
    )
    urls = docs.select("doc_id", url.alias("url"))
    rules = spark.createDataFrame(
        [(rid, dom, pre) for rid, dom, pre in _BLOCK_RULES],
        "rule_id long, domain string, path_prefix string",
    )
    return url_blocklist(urls, rules)


ORACLES["q_url_blocklist"] = _url_blocklist_oracle()


@register(
    "q_token_stats",
    f"""
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       length(text) AS n_chars,
       round((length(text) - len(toks) + 1) / CAST(len(toks) AS DOUBLE), 3) AS avg_token_len,
       round(len(list_filter(toks, x -> x IN {_STOP_SQL})) / CAST(len(toks) AS DOUBLE), 3)
         AS stop_ratio
FROM t
""",
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import token_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return token_stats(docs)


def _bpe_oracle() -> str:
    from .functions.text import BPE_PATTERN

    return f"""
WITH a AS (
  SELECT doc_id,
         text || ' v1.' || CAST(doc_id % 10 AS VARCHAR)
              || '; id=' || CAST(doc_id AS VARCHAR) || '!?' AS text
  FROM documents
),
t AS (
  SELECT doc_id, text,
         len(regexp_extract_all(text, '{BPE_PATTERN}')) AS nb,
         len(string_split(text, ' ')) AS nw
  FROM a
)
SELECT doc_id, nb AS n_bpe_tokens, nw AS n_ws_tokens,
       round(nb / CAST(nw AS DOUBLE), 6) AS fertility,
       round(length(text) / CAST(nb AS DOUBLE), 6) AS bytes_per_token
FROM t
"""


@register("q_bpe_token_stats")
def q_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting under the BPE-style regex pretokenizer (the raw
    fixture is letter-only word soup, so each doc gets a digit/punct
    suffix derived from doc_id appended on BOTH sides — the
    q_redact_pii augmentation device); BPE_PATTERN is shared between
    the operator and this oracle so the dialects cannot drift."""
    from .functions.text import bpe_token_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" v1."), (F.col("doc_id") % 10).cast("string"),
            F.lit("; id="), F.col("doc_id").cast("string"), F.lit("!?"),
        ).alias("text"),
    )
    return bpe_token_stats(aug)


ORACLES["q_bpe_token_stats"] = _bpe_oracle()


@register(
    "q_quality_score",
    f"""
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n,
         CAST(len(list_filter(toks, x -> x IN {_STOP_SQL})) AS DOUBLE) AS nstop,
         (length(text) - len(toks) + 1) / CAST(len(toks) AS DOUBLE) AS mean_len
  FROM t
)
SELECT doc_id,
       round(least(n / 64.0, 1.0)
             * (1.0 - least(nstop / n * 4.0, 1.0))
             * (CASE WHEN mean_len >= 3.0 AND mean_len <= 10.0 THEN 1.0 ELSE 0.5 END), 3)
         AS quality
FROM s
""",
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return quality_score(docs)


@register(
    "q_unigram_logprob",
    """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
freqs AS (SELECT tok, count(*) AS tf FROM toks GROUP BY tok),
tot AS (SELECT sum(tf) AS total FROM freqs)
SELECT doc_id, round(avg(log10(CAST(tf AS DOUBLE) / total)), 6) AS avg_logprob
FROM toks JOIN freqs USING (tok) CROSS JOIN tot
GROUP BY doc_id
""",
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM-quality signal: mean log10 unigram probability of
    each document under the corpus's own empirical distribution."""
    from .functions.text import unigram_logprob

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return unigram_logprob(docs)


_BUCKET_SQL = (
    "CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT) % 10000"
)


@register(
    "q_bigram_logprob",
    """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
bi AS (
  SELECT doc_id, tk[i.range] AS w1, tk[i.range + 1] AS w2
  FROM t, range(1, 1001) i
  WHERE len(tk) >= 2 AND i.range <= len(tk) - 1
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY w1, w2),
c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY w1)
SELECT bi.doc_id, round(avg(log10(CAST(c2.c2 AS DOUBLE) / c1.c1)), 6) AS avg_logprob2
FROM bi JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
GROUP BY bi.doc_id
""",
)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-2 LM-quality signal: mean log10 conditional bigram
    probability under the corpus's own distribution (the n-gram step
    toward CCNet's 5-gram scoring; q_unigram_logprob is order 1)."""
    from .functions.text import bigram_logprob

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bigram_logprob(docs)


# Oracle n-gram position cap: `range(1, 1001)` bounds DuckDB's position
# generator at 1000 grams/document — an ORACLE-side simplification only
# (the Spark operators are unbounded); exact as long as fixture documents
# stay under 1000 tokens (they are 10–99; asserted in test_driver_gate).
@register(
    "q_gopher_repetition",
    """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
bi AS (
  SELECT doc_id, tk[i.range] AS w1, tk[i.range + 1] AS w2,
         CASE WHEN i.range + 2 <= len(tk) THEN tk[i.range + 2] END AS w3
  FROM t, range(1, 1001) i
  WHERE i.range <= len(tk) - 1
),
c2 AS (SELECT doc_id, w1, w2, count(*) AS c2 FROM bi GROUP BY doc_id, w1, w2),
a2 AS (
  SELECT doc_id, max(c2) AS mx2,
         sum(CASE WHEN c2 >= 2 THEN c2 ELSE 0 END) AS dup2,
         sum(c2) AS nb
  FROM c2 GROUP BY doc_id
),
c3 AS (
  SELECT doc_id, w1, w2, w3, count(*) AS c3
  FROM bi WHERE w3 IS NOT NULL GROUP BY doc_id, w1, w2, w3
),
a3 AS (SELECT doc_id, max(c3) AS mx3 FROM c3 GROUP BY doc_id)
SELECT a2.doc_id,
       round(mx2 * 2 / CAST(nb + 1 AS DOUBLE), 6) AS top2_frac,
       round(mx3 * 3 / CAST(nb + 1 AS DOUBLE), 6) AS top3_frac,
       round(dup2 / CAST(nb AS DOUBLE), 6) AS dup2_frac
FROM a2 JOIN a3 USING (doc_id)
""",
)
def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition quality filters (top-2/3-
    gram token fraction + duplicated-bigram fraction)."""
    from .functions.text import gopher_repetition

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return gopher_repetition(docs)


@register(
    "q_decontaminate",
    """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
ev AS (
  SELECT DISTINCT md5(array_to_string(tk[3:15], ' ')) AS gh
  FROM t WHERE doc_id % 50 = 0 AND len(tk) >= 15
),
g AS (
  SELECT doc_id, md5(array_to_string(tk[i.range : i.range + 12], ' ')) AS gh
  FROM t, range(1, 1001) i
  WHERE i.range <= len(tk) - 12
)
SELECT g.doc_id, count(*) AS n_hits
FROM g JOIN ev USING (gh)
GROUP BY g.doc_id
""",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3-style 13-gram overlap): the eval
    set is derived deterministically from the corpus itself — tokens
    3..15 of every doc_id % 50 == 0 document (benchmarks leak INTO
    crawls, so self-derived snippets are the realistic fixture) — and
    every training document containing any eval 13-gram is flagged with
    its hit count."""
    from .functions.dedup import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.col("text"), " ")
    evals = (
        docs.filter((F.col("doc_id") % 50 == 0) & (F.size(toks) >= 15))
        .select(F.array_join(F.slice(toks, 3, 13), " ").alias("text"))
    )
    return decontaminate(docs, evals, k=13)


@register(
    "q_segment_dedup",
    """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
base AS (SELECT doc_id, CAST(ceil(len(tk) / 8.0) AS INT) AS n_segs FROM t),
seg AS (
  SELECT doc_id, i.range AS pos,
         array_to_string(tk[(i.range - 1) * 8 + 1 : i.range * 8], ' ') AS s
  FROM t, range(1, 1001) i
  WHERE (i.range - 1) * 8 < len(tk)
),
boiler AS (SELECT s FROM seg GROUP BY s HAVING count(DISTINCT doc_id) > 1),
kept AS (
  SELECT doc_id, string_agg(s, ' ' ORDER BY pos) AS text_clean,
         count(*) AS n_kept
  FROM seg WHERE s NOT IN (SELECT s FROM boiler)
  GROUP BY doc_id
)
SELECT base.doc_id,
       coalesce(text_clean, '') AS text_clean,
       n_segs,
       n_segs - coalesce(n_kept, 0) AS n_dropped
FROM base LEFT JOIN kept USING (doc_id)
""",
)
def q_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document segment (line-analogue) dedup: 8-token segments
    occurring in ≥ 2 distinct documents are boilerplate and removed;
    survivors reassemble in order.  The oracle compares the CLEANED
    TEXT itself, not just counts — proving the reassembly contract.
    (Oracle side groups on raw segment strings where the engine groups
    on md5 — identical barring an md5 collision, the documented
    portable-hash assumption.)"""
    from .functions.dedup import segment_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return segment_dedup(docs, seg_tokens=8, max_docs=1)


@register(
    "q_substring_dedup",
    """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
base AS (SELECT doc_id, len(tk) AS n_tokens FROM t),
p AS (
  SELECT doc_id, unnest(generate_series(1, len(tk) - 12)) AS pos, tk
  FROM t WHERE len(tk) >= 13
),
g AS (
  SELECT doc_id, pos,
         md5(array_to_string(tk[pos : pos + 12], ' ')) AS gh
  FROM p
),
occ AS (
  SELECT doc_id, pos,
         count(*) OVER (PARTITION BY gh) AS c,
         row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn
  FROM g
),
rem AS (
  SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + 12)) AS pos
  FROM occ WHERE c >= 2 AND rn > 1
),
tok AS (
  SELECT doc_id, unnest(tk) AS tok,
         unnest(generate_series(1, len(tk))) AS pos
  FROM t
),
kept AS (
  SELECT k.doc_id, string_agg(k.tok, ' ' ORDER BY k.pos) AS text_clean,
         count(*) AS n_kept
  FROM tok k LEFT JOIN rem r ON r.doc_id = k.doc_id AND r.pos = k.pos
  WHERE r.pos IS NULL GROUP BY k.doc_id
)
SELECT base.doc_id, base.n_tokens,
       base.n_tokens - coalesce(n_kept, 0) AS n_removed,
       coalesce(text_clean, '') AS text_clean
FROM base LEFT JOIN kept USING (doc_id)
""",
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup (Lee et al. 2021) at 13 tokens (the corpus's
    docs are 20-79 words, so the paper's 50-BPE-token threshold maps to
    the repo's standard 13-gram window): repeated runs keep only the
    globally first occurrence; the oracle compares the SPLICED TEXT.
    Both sides hash windows with md5 (portable across engines), so the
    match is exact, not modulo a collision assumption."""
    from .functions.dedup import exact_substring_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return exact_substring_dedup(docs, min_len=13)


def _redact_oracle() -> str:
    from .functions.text import PII_PATTERNS

    steps, prev, counts = [], "t0", []
    for i, (pat, tok) in enumerate(PII_PATTERNS, start=1):
        steps.append(
            f"s{i} AS (SELECT doc_id, "
            f"len(regexp_extract_all({prev}, '{pat}')) AS c{i}, "
            f"regexp_replace({prev}, '{pat}', '{tok}', 'g') AS t{i}, "
            + (", ".join(f"c{j}" for j in range(1, i)) + " " if i > 1 else "")
            + f"FROM {'aug' if i == 1 else f's{i-1}'})"
        )
        counts.append(f"c{i}")
        prev = f"t{i}"
    return (
        "WITH aug AS (SELECT doc_id, text || ' reach u' || doc_id"
        " || '@ex.org or 10.2.' || (doc_id % 250) || '.9 tel"
        " +44 20 7946 0' || (doc_id % 900 + 100) AS t0 FROM documents),\n"
        + ",\n".join(steps)
        + f"\nSELECT doc_id, {prev} AS redacted, "
        + " + ".join(counts)
        + f" AS n_pii FROM s{len(PII_PATTERNS)}"
    )


@register("q_redact_pii")
def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over deterministically PII-augmented text (the raw
    fixture is letter-only word soup, so each doc gets an email + IP +
    phone derived from doc_id appended on BOTH sides; the oracle then
    mirrors the sequential regexp_replace/count chain pattern-for-
    pattern — Java regex and RE2 agree on the restricted dialect
    PII_PATTERNS uses)."""
    from .functions.text import redact_pii

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach u"), F.col("doc_id").cast("string"),
            F.lit("@ex.org or 10.2."), (F.col("doc_id") % 250).cast("string"),
            F.lit(".9 tel +44 20 7946 0"),
            (F.col("doc_id") % 900 + 100).cast("string"),
        ).alias("text"),
    )
    return redact_pii(aug)


ORACLES["q_redact_pii"] = _redact_oracle()


def _mojibake_oracle() -> str:
    """Generated from the SAME MOJIBAKE_TABLE as the operator and the
    same doc_id-keyed augmentation as the Spark side (the q_redact_pii
    device: the raw fixture is clean ASCII, so each doc gets two
    corrupted sequences appended before repair)."""
    from .functions.text import MOJIBAKE_TABLE

    n = len(MOJIBAKE_TABLE)
    case1 = "CASE doc_id % {n} {w} END".format(
        n=n,
        w=" ".join(
            f"WHEN {i} THEN '{s}'" for i, (s, _) in enumerate(MOJIBAKE_TABLE)
        ),
    )
    case2 = "CASE (doc_id + 5) % {n} {w} END".format(
        n=n,
        w=" ".join(
            f"WHEN {i} THEN '{s}'" for i, (s, _) in enumerate(MOJIBAKE_TABLE)
        ),
    )
    fixed = "text"
    counts = []
    for seq, rep in MOJIBAKE_TABLE:
        counts.append(
            f"CAST((length(text) - length(replace(text, '{seq}', ''))) / {len(seq)} AS BIGINT)"
        )
        fixed = f"replace({fixed}, '{seq}', '{rep}')"
    return f"""
WITH a AS (
  SELECT doc_id, text || ' x' || {case1} || 'y ' || {case2} AS text
  FROM documents
)
SELECT doc_id, {fixed} AS text_fixed, {" + ".join(counts)} AS n_fixed
FROM a
"""


@register("q_fix_mojibake")
def q_fix_mojibake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding repair over deterministically corrupted text: each doc
    gets two cp1252-mojibake sequences (selected by doc_id from the
    shared MOJIBAKE_TABLE) appended, then the literal replace chain
    restores the original characters; the oracle compares the REPAIRED
    text and the per-doc repair count."""
    from .functions.text import MOJIBAKE_TABLE, fix_mojibake

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seqs = F.array(*[F.lit(s) for s, _ in MOJIBAKE_TABLE])
    n = len(MOJIBAKE_TABLE)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" x"), F.element_at(seqs, (F.col("doc_id") % n + 1).cast("int")),
            F.lit("y "), F.element_at(seqs, ((F.col("doc_id") + 5) % n + 1).cast("int")),
        ).alias("text"),
    )
    return fix_mojibake(aug)


ORACLES["q_fix_mojibake"] = _mojibake_oracle()


@register(
    "q_domain_stats",
    f"""
WITH t AS (SELECT doc_id, source, text, string_split(text, ' ') AS toks
           FROM documents),
s AS (
  SELECT source AS domain, doc_id, md5(text) AS dg, strlen(text) AS ln,
         CAST(round(round(
           least(len(toks) / 64.0, 1.0)
           * (1.0 - least(len(list_filter(toks, x -> x IN {_STOP_SQL}))
                     / CAST(len(toks) AS DOUBLE) * 4.0, 1.0))
           * (CASE WHEN (length(text) - len(toks) + 1) / CAST(len(toks) AS DOUBLE)
                     BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END), 3) * 1000)
           AS BIGINT) AS qm,
         len(toks) AS nt
  FROM t
),
d AS (SELECT dg, ln FROM s GROUP BY dg, ln HAVING count(*) >= 2)
SELECT domain, count(*) AS n_docs,
       CAST(sum(CASE WHEN d.dg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_docs,
       round(sum(qm) / 1000.0 / count(*), 6) AS mean_quality,
       round(sum(nt) / CAST(count(*) AS DOUBLE), 6) AS mean_tokens
FROM s LEFT JOIN d ON s.dg = d.dg AND s.ln = d.ln
GROUP BY domain
""",
)
def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain reputation rollup (doc count, corpus-wide exact-dup
    membership, mean quality, mean tokens) — the host-level allow/block
    signal.  Quality is summed as exact milli-ints so the float mean is
    FP-order independent."""
    from .functions.text import domain_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return domain_stats(docs)


_BM25_TERMS = ["spark", "merge", "vector", "stream"]


@register("q_bm25")
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 scores against a fixed 4-term query (Lucene idf flavor,
    k1=1.2 b=0.75); oracle generated by the operator's own
    `bm25_oracle_sql` so arithmetic cannot drift."""
    from .functions.retrieval import bm25_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bm25_scores(docs, _BM25_TERMS)


def _bm25_oracle() -> str:
    from .functions.retrieval import bm25_oracle_sql

    return bm25_oracle_sql(_BM25_TERMS)


ORACLES["q_bm25"] = _bm25_oracle()


@register(
    "q_dsir_weights",
    """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
           WHERE len(string_split(text, ' ')) >= 2),
bi AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(tk[i.range] || ' ' || tk[i.range + 1]), 1, 7)
              AS UBIGINT) % 64 AS bkt
  FROM t, range(1, 1001) i WHERE i.range <= len(tk) - 1
),
feats AS (SELECT doc_id, bkt, count(*) AS cnt FROM bi GROUP BY doc_id, bkt),
d AS (SELECT doc_id FROM documents WHERE source = 'src0'),
rb AS (SELECT bkt, sum(cnt) AS rc FROM feats GROUP BY bkt),
tb AS (SELECT bkt, sum(cnt) AS tc FROM feats JOIN d USING (doc_id) GROUP BY bkt),
rt AS (SELECT sum(cnt) AS rtot FROM feats),
tt AS (SELECT sum(cnt) AS ttot FROM feats JOIN d USING (doc_id)),
dims AS (
  SELECT coalesce(rb.bkt, tb.bkt) AS bkt,
         ln((coalesce(tc, 0) + 1.0) / (ttot + 64.0))
         - ln((coalesce(rc, 0) + 1.0) / (rtot + 64.0)) AS dlp
  FROM rb FULL JOIN tb ON rb.bkt = tb.bkt CROSS JOIN rt CROSS JOIN tt
)
SELECT doc_id, round(sum(c) / 1000000.0, 6) AS logweight
FROM (SELECT doc_id, CAST(round(cnt * dlp * 1000000.0) AS BIGINT) AS c
      FROM feats JOIN dims USING (bkt)) j
GROUP BY doc_id
""",
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: target domain = the `src0` source
    (deterministic subset), raw = the whole corpus; hashed-bigram
    64-bucket features, add-1 smoothing, micro-int contribution sums."""
    from .functions.sampling import dsir_logweights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dsir_logweights(docs, docs.filter(F.col("source") == "src0"))


def _pagerank_oracle() -> str:
    from .functions.graph import pagerank_oracle_sql

    return pagerank_oracle_sql(n_iters=3, damping=0.85)


@register("q_pagerank")
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized damped PageRank (3 rounds) over the deterministic
    synthetic doc link graph; oracle is the operator's own generated
    unrolled-CTE SQL (kmeans convention).  The doc count read in the
    builder is eager pre-work (annotated by the plan inventory)."""
    from .functions.graph import doc_link_edges, pagerank

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    return pagerank(doc_link_edges(docs, n), n_iters=3, damping=0.85)


ORACLES["q_pagerank"] = _pagerank_oracle()


_TRUST_SEED_MOD = 13


@register("q_trustrank")
def q_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank (seed-personalized PageRank, 3 quantized rounds) over
    the same deterministic doc link graph — teleport and dangling mass
    land only on trusted seeds (doc_id % 13 = 0), the crawl-curation
    spam demoter beside q_pagerank's global prior.  Oracle is the
    operator's own generated unrolled-CTE SQL (pagerank convention);
    the doc count / seed count reads are eager pre-work."""
    from .functions.graph import doc_link_edges, trustrank

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    seeds = docs.filter(F.col("doc_id") % _TRUST_SEED_MOD == 0).select(
        F.col("doc_id").alias("node")
    )
    return trustrank(
        doc_link_edges(docs, n), seeds, n_iters=3, damping=0.85
    )


def _trustrank_oracle() -> str:
    from .functions.graph import trustrank_oracle_sql

    return trustrank_oracle_sql(
        n_iters=3, damping=0.85, seed_mod=_TRUST_SEED_MOD
    )


ORACLES["q_trustrank"] = _trustrank_oracle()


@register(
    "q_length_quantiles",
    """
WITH t AS (SELECT lang, len(string_split(text, ' ')) AS n FROM documents)
SELECT lang, count(*) AS n_docs,
       round(quantile_cont(n, 0.5), 6) AS p50,
       round(quantile_cont(n, 0.9), 6) AS p90,
       round(quantile_cont(n, 0.99), 6) AS p99
FROM t GROUP BY lang
""",
)
def q_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-length quantiles (exact Hyndman–Fan type-7 —
    Spark `percentile` and DuckDB `quantile_cont` implement the same
    interpolation, which is what makes this oracle closed-form)."""
    from .functions.text import length_quantiles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return length_quantiles(docs)


@register(
    "q_grouping_sets",
    """
SELECT coalesce(source, '(all)') AS source, coalesce(lang, '(all)') AS lang,
       CAST(GROUPING(source) AS BIGINT) AS g_source,
       CAST(GROUPING(lang) AS BIGINT) AS g_lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(n_chars) AS DOUBLE) / count(*) AS mean_chars
FROM documents
GROUP BY GROUPING SETS ((source, lang), (source), (lang))
""",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity corpus profile in ONE pass — per (source,
    lang), per source, and per lang — via GROUPING SETS (the exact
    subset CUBE can't express without wasting the grand-total and
    single-axis extras q_cube_rollup already covers).  Catalyst plans
    this as one Expand + a single shuffle instead of three scans;
    GROUPING() markers disambiguate the coalesced '(all)' sentinels.
    Counts exact int64; mean divides them once, portable unrounded."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.groupingSets(
            [["source", "lang"], ["source"], ["lang"]], "source", "lang"
        )
        .agg(
            F.grouping("source").cast("long").alias("g_source"),
            F.grouping("lang").cast("long").alias("g_lang"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .select(
            F.coalesce(F.col("source"), F.lit("(all)")).alias("source"),
            F.coalesce(F.col("lang"), F.lit("(all)")).alias("lang"),
            "g_source", "g_lang", "n_docs", "total_chars",
            (F.col("total_chars").cast("double") / F.col("n_docs").cast("double"))
            .alias("mean_chars"),
        )
    )


@register(
    "q_lexical_diversity",
    """
WITH t AS (SELECT source, string_split(text, ' ') AS tk FROM documents
           WHERE len(string_split(text, ' ')) >= 2),
bi AS (SELECT source, tk[i.range] AS w1, tk[i.range + 1] AS w2
       FROM t, range(1, 1001) i WHERE i.range <= len(tk) - 1)
SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(count(DISTINCT (w1, w2)) AS BIGINT) AS n_distinct,
       CAST(count(DISTINCT (w1, w2)) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         AS diversity
FROM bi GROUP BY source
""",
)
def q_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-bigram ratio per source — the templated/boilerplate
    detector (repeated transitions → 0, organic prose → 1), the
    within-corpus counterpart of q_ngram_novelty.  Two exact int64
    counts divide once, so the double is portable unrounded; the
    oracle's 1000-position bigram cap rides the documented ≤79-word
    corpus invariant (see the shingle-cap note above q_minhash_lsh)."""
    from .functions.text import lexical_diversity

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return lexical_diversity(docs)


@register(
    "q_pmi_bigrams",
    """
WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents
           WHERE len(string_split(text, ' ')) >= 2),
bi AS (SELECT tk[i.range] AS w1, tk[i.range + 1] AS w2
       FROM t, range(1, 1001) i WHERE i.range <= len(tk) - 1),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY w1, w2
       HAVING count(*) >= 5),
uni AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
c1 AS (SELECT w, count(*) AS c1 FROM uni GROUP BY w),
tot AS (SELECT sum(len(string_split(text, ' '))) AS nt FROM documents),
s AS (
  SELECT w1, w2, c2,
         round(ln(c2 * nt / CAST(a.c1 * b.c1 AS DOUBLE)), 6) AS pmi
  FROM c2 JOIN c1 a ON c2.w1 = a.w JOIN c1 b ON c2.w2 = b.w CROSS JOIN tot
),
r AS (SELECT *, row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rank FROM s)
SELECT w1, w2, c2, pmi, rank FROM r WHERE rank <= 20
""",
)
def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by PMI with count≥5 support; PMI rounded to
    6 dp BEFORE ranking, ties broken on (w1, w2)."""
    from .functions.text import pmi_bigrams

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pmi_bigrams(docs, min_count=5, top_k=20)


@register(
    "q_ccnet_buckets",
    f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
freqs AS (SELECT tok, count(*) AS tf FROM toks GROUP BY tok),
tot AS (SELECT sum(len(string_split(text, ' '))) AS t FROM documents),
lp AS (
  SELECT doc_id,
         round(avg(log(tf / CAST(t AS DOUBLE))), 6) AS avg_logprob
  FROM toks JOIN freqs USING (tok) CROSS JOIN tot
  GROUP BY doc_id
),
s AS (
  SELECT d.doc_id, d.lang, lp.avg_logprob
  FROM documents d JOIN lp ON d.doc_id = lp.doc_id
),
cuts AS (
  SELECT lang, quantile_cont(avg_logprob, {1 / 3!r}) AS q33,
         quantile_cont(avg_logprob, {2 / 3!r}) AS q67
  FROM s GROUP BY lang
)
SELECT s.doc_id, s.lang, s.avg_logprob,
       CASE WHEN s.avg_logprob >= cuts.q67 THEN 'head'
            WHEN s.avg_logprob >= cuts.q33 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM s JOIN cuts USING (lang)
""",
)
def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail quality buckets from per-language unigram
    LM-score tertiles (oracle note: DuckDB log() is log10, matching the
    operator's log10 LM; tertile positions spelled as Python float reprs
    on both sides so the interpolation arithmetic is bit-identical)."""
    from .functions.text import ccnet_buckets

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ccnet_buckets(docs)


@register(
    "q_hash_split",
    f"""
WITH b AS (SELECT doc_id, lang, {_BUCKET_SQL} AS bkt FROM documents)
SELECT lang,
       CASE WHEN bkt < 500 THEN 'val'
            WHEN bkt < 1000 THEN 'test'
            ELSE 'train' END AS split,
       count(*) AS n_docs
FROM b GROUP BY lang, split
""",
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (md5-mod buckets — stable per
    key across runs/engines/scales) summarized per language."""
    from .functions.sampling import hash_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        hash_split(docs)
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "q_stratified_sample",
    f"""
WITH b AS (SELECT doc_id, lang, {_BUCKET_SQL} AS bkt FROM documents)
SELECT doc_id, lang FROM b
WHERE bkt < (CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2500 ELSE 1000 END)
""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language keep rates (hash-mod sampleBy)."""
    from .functions.sampling import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return stratified_sample(
        docs, {"en": 5000, "de": 2500}, default_bp=1000
    ).select("doc_id", "lang")


# shared mixture spec for q_mix_allocation: the SQL CASE and the Spark
# literal map are both generated from THIS dict so they cannot drift
_MIX_TARGETS = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.05, "src4": 0.05}
_MIX_BUDGET = 50000
_MIX_CASE = (
    "CASE domain "
    + " ".join(
        f"WHEN '{d}' THEN CAST({w!r} AS DOUBLE)" for d, w in _MIX_TARGETS.items()
    )
    + " ELSE CAST(0.0 AS DOUBLE) END"
)


@register(
    "q_mix_allocation",
    f"""
WITH per AS (
  SELECT source AS domain,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
)
SELECT domain, n_tokens,
       {_MIX_CASE} AS target_weight,
       round({_MIX_CASE} * CAST({_MIX_BUDGET} AS DOUBLE) / n_tokens, 6) AS epochs,
       least(CAST(1.0 AS DOUBLE),
             round({_MIX_CASE} * CAST({_MIX_BUDGET} AS DOUBLE) / n_tokens, 6))
         AS sample_rate
FROM per
""",
)
def q_mix_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture planning (LLaMA/DoReMi mixture table): per-domain
    epochs and sampling rate to hit a target token mixture under a
    fixed budget; unlisted domains report weight 0."""
    from .functions.sampling import mix_allocation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return mix_allocation(docs, _MIX_TARGETS, _MIX_BUDGET)


@register(
    "q_geoparse_green",
    _CTE + f""",
gaz AS (SELECT 'Park_' || CAST(gs_id AS VARCHAR) AS name, gs_id, cx, cy
        FROM greens),
a AS (SELECT doc_id,
        text || ' see Park_' || CAST(doc_id % {{n_gs}} AS VARCHAR)
             || ' and Park_' || CAST((doc_id * 7 + 3) % 97 AS VARCHAR)
             || ' .' AS text
      FROM documents),
m AS (SELECT doc_id, unnest(regexp_extract_all(text, 'Park_[0-9]+')) AS name
      FROM a)
SELECT m.doc_id, m.name, g.gs_id,
       {{cell}} AS cell,
       round({{ndvi}}, 6) AS ndvi
FROM m JOIN gaz g USING (name)
""".format(
        n_gs=city.N_GS,
        cell=city.cell_expr_sql("g.cx", "g.cy"),
        ndvi=city.NDVI_SQL.format(px_x="g.cx", px_y="g.cy"),
    ),
)
def q_geoparse_green(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Toponym geoparsing composite — the webtext → geospatial bridge:
    two park mentions planted per document (the second often missing
    from the gazetteer, so the resolution gap shows as dropped rows),
    regex-extracted, broadcast-resolved against the greenspace-centroid
    gazetteer, then cell-indexed and NDVI-scored at the resolved
    coordinates via the shared city formulas."""
    from .functions.geoparse import geoparse

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    did = F.col("doc_id")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see Park_"), (did % city.N_GS).cast("string"),
            F.lit(" and Park_"), ((did * 7 + 3) % 97).cast("string"),
            F.lit(" ."),
        ).alias("text"),
    )
    gaz = city.greenspace_df(spark).select(
        F.concat(F.lit("Park_"), F.col("gs_id").cast("string")).alias("name"),
        "gs_id", "cx", "cy",
    )
    res = geoparse(aug, gaz, "Park_[0-9]+")
    return res.select(
        "doc_id",
        "name",
        "gs_id",
        F.expr(city.cell_expr_sql("cx", "cy")).alias("cell"),
        F.round(F.expr(city.NDVI_SQL.format(px_x="cx", px_y="cy")), 6).alias(
            "ndvi"
        ),
    )


def _hll_oracle() -> str:
    from .functions.sketches import hll_distinct_sql

    return hll_distinct_sql(
        "(SELECT source AS domain, unnest(string_split(text, ' ')) AS tok"
        " FROM documents)",
        "tok",
        ["domain"],
    )


@register("q_hll_distinct")
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain vocabulary size via the portable deterministic HLL
    sketch (md5 buckets, hex-run rho, exact int64 register sum): no
    distinct shuffle, at most 256 sketch rows per domain move."""
    from .functions.sketches import hll_distinct

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.col("source").alias("domain"),
        F.explode(F.split("text", " ")).alias("tok"),
    )
    return hll_distinct(toks, "tok", ["domain"])


ORACLES["q_hll_distinct"] = _hll_oracle()


def _kmv_inter_oracle() -> str:
    from .functions.sketches import kmv_intersection_sql

    return kmv_intersection_sql(
        "(SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)",
        "tok", "source", k=256,
    )


@register("q_kmv_intersection", _kmv_inter_oracle())
def q_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise shared-vocabulary estimates between sources from KMV
    sketches — the set-OPERATION companion to HLL's union-only merge:
    the union k-min sketch of any pair is computable from the two
    per-source sketches alone, and side membership of its elements is
    provably decidable from the side sketches, so the pair stage fans
    out k-row sketches, never vocabularies
    (functions/sketches.kmv_intersection)."""
    from .functions.sketches import kmv_intersection

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    )
    return kmv_intersection(toks, "tok", "source", k=256)


def _hll_rolling_oracle() -> str:
    from .functions.sketches import hll_rolling_sql

    return hll_rolling_sql("events", "user_id", "ts", window_days=7)


@register("q_hll_rolling", _hll_rolling_oracle())
def q_hll_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users from merged DAILY HLL sketches —
    the mergeability property as a first-class op: the window estimate
    max-merges the tiny per-day register tables (≤256 rows each) and
    never rescans raw events, which is how a lakehouse answers
    "trailing-week uniques over 100 TB of history" (persist daily
    sketches, max-merge any window/backfill).  Same portable
    deterministic estimator as q_hll_distinct."""
    from .functions.sketches import hll_rolling_distinct

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return hll_rolling_distinct(ev, "user_id", "ts", window_days=7)


_ZIPF_TOP_R = 50


@register(
    "q_zipf_slope",
    f"""
WITH c AS (
  SELECT source AS domain, tok, count(*) AS cnt
  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY source, tok
), r AS (
  SELECT domain, cnt,
         row_number() OVER (PARTITION BY domain
                            ORDER BY cnt DESC, tok ASC) AS rank
  FROM c
)
SELECT domain,
       round(regr_slope(log10(cnt), log10(rank)), 6) AS zipf_slope,
       CAST(count(*) AS BIGINT) AS n_terms
FROM r WHERE rank <= {_ZIPF_TOP_R} GROUP BY domain
""",
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain Zipf exponent over the top-50 terms via the exact
    salted two-phase top-k (no task sorts a full domain vocabulary);
    the oracle is the naive single-window SQL."""
    from .functions.text import zipf_slope

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return zipf_slope(docs, _ZIPF_TOP_R)


_N_SHARDS = 8


@register(
    "q_shard_shuffle",
    f"""
WITH t AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS k,
         CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)
              AS UBIGINT) % {_N_SHARDS} AS BIGINT) AS shard
  FROM documents
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
            AS BIGINT) AS pos
FROM t
""",
)
def q_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-order reproducibility:
    md5-bucket shard + md5-ranked position within shard — replayable
    from ids alone, no RNG state, window parallelism = n_shards."""
    from .functions.sampling import shard_shuffle

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return shard_shuffle(docs, _N_SHARDS)


_PACK_SEQ_LEN = 128


@register(
    "q_pack_sequences",
    f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) + 1 AS BIGINT) AS n_tok
  FROM documents
), c AS (
  SELECT doc_id, n_tok,
         CAST(COALESCE(sum(n_tok) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tok_start
  FROM t
)
SELECT doc_id, n_tok, tok_start,
       tok_start // {_PACK_SEQ_LEN} AS seq_first,
       (tok_start + n_tok - 1) // {_PACK_SEQ_LEN} AS seq_last,
       (tok_start + n_tok - 1) // {_PACK_SEQ_LEN}
         - tok_start // {_PACK_SEQ_LEN} + 1 AS n_seqs
FROM c
""",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for a pretraining loader: docs (ws tokens + 1
    EOS each) concatenated in doc_id order and sliced into seq_len=128
    training sequences — per-doc global offset and spanned-sequence
    range via the two-level distributed prefix sum (the oracle's flat
    global window is exactly what the operator must NOT do at scale)."""
    from .functions.sampling import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pack_sequences(docs, _PACK_SEQ_LEN, bucket_width=1024)


def _classifier_oracle() -> str:
    """Generated from the SAME shared constants as the operator (the
    mojibake device): md5-hashing-trick bucket, LCG weight, exact
    integer sum, one final division."""
    from .functions.text import CLS_A, CLS_BUCKETS, CLS_C, CLS_M, CLS_SCALE

    w = (
        f"(CAST(CAST('0x' || substr(md5(t), 1, 7) AS UBIGINT) AS BIGINT)"
        f" % {CLS_BUCKETS} * {CLS_A} + {CLS_C}) % {CLS_M} - {CLS_SCALE}"
    )
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
         CAST(list_sum(list_transform(string_split(text, ' '), t -> {w}))
              AS BIGINT) AS s
  FROM documents
)
SELECT doc_id, n_toks,
       s / ({CLS_SCALE}.0 * n_toks) AS quality_score,
       s > 0 AS keep
FROM t
"""


@register("q_classifier_score")
def q_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed linear classifier inference (the CCNet /
    LLaMA quality keep/drop stage): hashing-trick buckets, deterministic
    LCG weights, per-doc mean score, sign-exact keep flag — a pure map
    stage with no vocabulary join."""
    from .functions.text import hashed_classifier_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return hashed_classifier_score(docs)


ORACLES["q_classifier_score"] = _classifier_oracle()


@register(
    "q_score_percentiles",
    f"""
WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS toks
           FROM documents),
s AS (
  SELECT doc_id, lang,
         CAST(len(toks) AS DOUBLE) AS n,
         CAST(len(list_filter(toks, x -> x IN {_STOP_SQL})) AS DOUBLE) AS nstop,
         (length(text) - len(toks) + 1) / CAST(len(toks) AS DOUBLE) AS mean_len
  FROM t
), q AS (
  SELECT doc_id, lang,
         round(least(n / 64.0, 1.0)
               * (1.0 - least(nstop / n * 4.0, 1.0))
               * (CASE WHEN mean_len >= 3.0 AND mean_len <= 10.0
                       THEN 1.0 ELSE 0.5 END), 3) AS score
  FROM s
)
SELECT lang, doc_id, score,
       percent_rank() OVER (PARTITION BY lang ORDER BY score, doc_id)
         AS pct_rank
FROM q
""",
)
def q_score_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language percentile calibration of the quality score (the
    CCNet normalize-before-bucketing step) via the histogram two-level
    rank — exact percent_rank semantics without a per-language
    single-task window; the oracle IS that naive window."""
    from .functions.sampling import score_percentiles
    from .functions.text import quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = quality_score(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    return score_percentiles(scored, "quality", ["lang"])


@register(
    "q_repeat_plan",
    f"""
WITH per AS (
  SELECT source AS domain,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), a AS (
  SELECT domain,
         round({_MIX_CASE} * CAST({_MIX_BUDGET} AS DOUBLE) / n_tokens, 6)
           AS epochs
  FROM per
)
SELECT doc_id, domain, epochs,
       CAST(floor(epochs) AS BIGINT)
       + CASE WHEN CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                         AS UBIGINT) % 10000 AS BIGINT)
                   < CAST(trunc((epochs - floor(epochs)) * 10000) AS BIGINT)
              THEN 1 ELSE 0 END AS n_copies
FROM (SELECT doc_id, source AS domain FROM documents) d
JOIN a USING (domain)
""",
)
def q_repeat_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loader-side mixture realization: per-document repeat counts
    (floor(epochs) everywhere + a deterministic md5-bucket extra epoch
    for the fractional share), broadcast-joined from the per-domain
    allocation dim."""
    from .functions.sampling import repeat_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return repeat_plan(docs, _MIX_TARGETS, _MIX_BUDGET)


# documented fixture embedding dim (TESTDATA.md) — import-time fallback
# only, used when the grading fixtures are absent (spark-submit dist zip,
# bench on a foreign host); the grading path always reads the real dim
_EMBEDDING_DIM_FALLBACK = 64


def _embedding_dim() -> int:
    """Embedding dimensionality read from the fixtures themselves
    (ADVICE r01: a hardcoded dim would silently average the wrong
    positions).  Checks every SF dir the tri-scale sweep uses and fails
    LOUDLY on disagreement or on an unreadable fixture.  When NO fixture
    exists at all (ADVICE r02: importing the registry must not hard-fail
    on hosts without the grading testdata — bench.py, plan_inventory,
    the dist zip) it warns loudly and returns the documented fallback;
    any oracle built from the fallback only ever runs against those same
    fixtures, so a wrong fallback cannot silently pass the gate."""
    import glob
    import warnings

    import pyarrow.parquet as pq

    dims = {}
    for p in sorted(glob.glob("/root/testdata/sf*/embeddings.parquet")):
        try:
            dims[p] = len(pq.read_table(p, columns=["embedding"]).column(0)[0])
        except Exception as e:  # unreadable fixture → loud
            raise RuntimeError(f"cannot read embedding dim from {p}: {e}") from e
    if not dims:
        warnings.warn(
            "no /root/testdata/sf*/embeddings.parquet fixtures found; "
            f"falling back to documented embedding dim={_EMBEDDING_DIM_FALLBACK} "
            "(oracles built from it are only valid against those fixtures)",
            RuntimeWarning,
            stacklevel=2,
        )
        return _EMBEDDING_DIM_FALLBACK
    if len(set(dims.values())) != 1:
        raise RuntimeError(f"embedding dim differs across fixtures: {dims}")
    return next(iter(dims.values()))


# 2-gram stream per language (vocab² cardinality, so the KMV sketch's
# estimation path — not just the exact under-k path — is exercised).
# ORACLE ASYMMETRY (documented): the DuckDB side enumerates positions
# via range(1, 1001) — a 1000-position cap the Spark side does not have.
# Exact equivalence therefore requires every document ≤ 1001 tokens;
# the fixture documents are 20–79 words (TESTDATA.md), asserted by
# tests/test_driver_gate.py::test_oracle_position_cap_headroom.
_BIGRAM_TBL = (
    "(SELECT lang, array_to_string(list_slice(tk, i.range, i.range + 1), ' ') AS tok"
    " FROM (SELECT lang, string_split(text, ' ') AS tk FROM documents) t,"
    " range(1, 1001) i WHERE i.range <= greatest(len(tk) - 1, 1))"
)


def _bigrams_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Eval-once bigram stream (slice + arrays_zip, no interpreted HOF
    # lambda re-evaluating split() per element).  A single-token doc
    # emits its lone token (concat_ws skips the null zip pad), matching
    # the oracle's array_to_string(list_slice(tk, i, i+1)) at i=1.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "lang", F.split(F.col("text"), " ").alias("tk")
    )
    n1 = F.greatest(F.size("tk") - 1, F.lit(1))
    pairs = docs.select(
        "lang", F.slice("tk", 1, n1).alias("w1s"), F.slice("tk", 2, n1).alias("w2s")
    )
    return pairs.select(
        "lang", F.explode(F.arrays_zip("w1s", "w2s")).alias("g")
    ).select("lang", F.concat_ws(" ", F.col("g.w1s"), F.col("g.w2s")).alias("tok"))


def _kmv_oracle() -> str:
    from .functions.sketches import kmv_distinct_sql

    return kmv_distinct_sql(_BIGRAM_TBL, "tok", ["lang"], k=256)


@register("q_kmv_distinct", None)  # generated oracle attached below
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch per language over the bigram stream —
    a cardinality estimator whose ARITHMETIC (portable md5 unit-hash,
    k-th-minimum estimate) has an exact DuckDB oracle, not just its
    inputs; the bounded-state shape dictionaries can't scale to."""
    from .functions.sketches import kmv_distinct

    return kmv_distinct(_bigrams_df(spark, sf_dir), "tok", ["lang"], k=256)


ORACLES["q_kmv_distinct"] = _kmv_oracle()


@register(
    "q_heavy_hitters",
    """
WITH toks AS (SELECT lang, unnest(string_split(text, ' ')) AS value FROM documents),
c AS (SELECT lang, value, count(*) AS n FROM toks GROUP BY lang, value),
r AS (
  SELECT lang, value, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, value ASC) AS rank
  FROM c
)
SELECT lang, value, n, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 20
""",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language top-20 vocabulary (two-phase count, then the
    rank window over one row per DISTINCT token — the vocabulary-
    building primitive at corpus scale)."""
    from .functions.sketches import heavy_hitters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select("lang", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    return heavy_hitters(toks, "tok", ["lang"], k=20)


def _kmeans_oracle() -> str:
    from .functions.clustering import kmeans_oracle_sql

    return kmeans_oracle_sql(k=4, iters=2, dim=_embedding_dim())


@register("q_kmeans", None)  # oracle attached below (generated SQL)
def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed quantized k-means (iterative Lloyd rounds made
    engine-reproducible via 6-dp rounding of distances and centroid
    updates) — exact SQL oracle for an ITERATIVE algorithm."""
    from .functions.clustering import kmeans_fit_predict

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return kmeans_fit_predict(emb, k=4, iters=2)


ORACLES["q_kmeans"] = _kmeans_oracle()


def _silhouette_oracle() -> str:
    from .functions.clustering import silhouette_oracle_sql

    return silhouette_oracle_sql(k=4, iters=2, dim=_embedding_dim())


@register("q_silhouette", None)  # oracle attached below (generated SQL)
def q_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette of the q_kmeans
    clustering — the O(n·k) cluster-quality eval (a = own-centroid
    distance, b = second-nearest, s = 1 − a/b) with per-point 1e-9
    int-quantization before the per-cluster mean so FP summation order
    can never move the rounded score.  Completes the clustering family
    with its evaluation metric, sharing the Lloyd CTE chain with the
    q_kmeans oracle so the two cannot drift."""
    from .functions.clustering import simplified_silhouette

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return simplified_silhouette(emb, k=4, iters=2)


ORACLES["q_silhouette"] = _silhouette_oracle()


# clone-augmented corpus shared by q_embedding_neardup / q_semdedup:
# every vec_id < 100 gets a perturbed twin at vec_id + 1e6 (first
# coordinate +0.05) so a planted near-dup structure exists at every SF
_CLONES_CTE = """emb2 AS (
  SELECT vec_id, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000,
         [CAST(embedding[1] AS DOUBLE) + 0.05]
           || list_transform(embedding[2:], e -> CAST(e AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id < 100
)"""


def _with_clones(emb: DataFrame) -> DataFrame:
    """Spark twin of _CLONES_CTE (the q_embedding_neardup planting)."""
    base = emb.select(
        "vec_id", F.transform("embedding", lambda e: e.cast("double")).alias("embedding")
    )
    clones = emb.filter(F.col("vec_id") < 100).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1).cast("double") + 0.05),
            F.transform(F.slice("embedding", 2, 10000), lambda e: e.cast("double")),
        ).alias("embedding"),
    )
    return base.unionByName(clones)


def _semdedup_oracle() -> str:
    from .functions.similarity import semdedup_oracle_sql

    sql = semdedup_oracle_sql(
        k=4, iters=2, dim=_embedding_dim(), threshold=0.99, table="emb2"
    )
    # the generated chain reads FROM emb2 — splice the clone CTE in
    # front of its WITH list.  kmeans's v-CTE re-casts to double; the
    # clone CTE already emits doubles, so the cast is a no-op there.
    assert sql.startswith("WITH v AS")
    return sql.replace("WITH v AS", f"WITH {_CLONES_CTE},\nv AS", 1).replace(
        "list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v FROM emb2",
        "v FROM emb2",
    )


@register("q_semdedup", None)  # oracle attached below (generated SQL)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup composition: quantized k-means clusters → per-cluster
    Arrow gram-matrix sweep → min-lower-id duplicate assignment, over
    the corpus plus planted perturbed clones.  Both halves are
    independently oracle-green (q_kmeans, q_embedding_neardup); this
    gates the COMPOSITION end-to-end against one generated SQL chain."""
    from .functions.similarity import semdedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return semdedup(_with_clones(emb), k=4, iters=2, threshold=0.99)


ORACLES["q_semdedup"] = _semdedup_oracle()


@register("q_multimodal_gvi", None)  # rows-only: sha-derived fake decode has no SQL twin
def q_multimodal_gvi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multimodal Python/Arrow chain in the gate: binary media
    (synthesized from text bytes) → deterministic fake decode
    (mapInPandas) → green-fraction segmentation stub → per-language
    mean GVI.  Deterministic end-to-end; the real codec/model swap in
    behind the same signatures on a cluster image."""
    from .functions.multimodal import decode_images, segment_green_fraction

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("media"),
        "lang",
    )
    decoded = decode_images(media, "media", "media_id")
    gvi = segment_green_fraction(decoded, "media_id")
    return (
        gvi.join(media.select("media_id", "lang"), "media_id")
        .groupBy("lang")
        .agg(
            F.round(F.avg("GVI"), 6).alias("mean_gvi"),
            F.count("*").alias("n_media"),
        )
    )


@register("q_stream_ingest", None)  # rows-only: xxhash64 geocode has no DuckDB twin
def q_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming in the driver gate: AvailableNow incremental
    ingest (readStream over a crawl-batch directory → geocode →
    checkpointed parquet sink) of a deterministic synthetic documents
    batch; returns the drained sink.  The incremental-delta and
    watermarked-window paths are pytest-covered
    (test_engine.test_streaming_incremental_ingest)."""
    import atexit
    import os
    import shutil
    import tempfile

    from .data import synth
    from .streaming.ingest import geocode_stream

    # fixed per-process dir (pid-keyed): repeated gate/bench invocations
    # reuse it instead of leaking a fresh mkdtemp per run; removed on
    # interpreter exit (ADVICE r01)
    base = os.path.join(tempfile.gettempdir(), f"q_stream_ingest_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    src, sink, ckpt = (os.path.join(base, d) for d in ("src", "sink", "ckpt"))
    synth.documents(spark, 400).write.mode("overwrite").parquet(src)
    geocode_stream(spark, src, sink, ckpt)
    return spark.read.parquet(sink).select("url", "x", "y", "cell")


def _winnow_sql(k: int = 5, window: int = 4) -> str:
    """Oracle for winnow_fingerprints: the same Horner rolling hash
    unrolled (k is small), same window-min winnowing."""
    h = "(ti[i] % 1000000007)"
    for j in range(1, k):
        h = f"(({h} * 1000003 + ti[i+{j}]) % 1000000007)"
    return f"""
WITH t AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
                        tok -> CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT) AS BIGINT))
           AS ti
  FROM documents
),
g AS (
  SELECT doc_id,
         CASE WHEN len(ti) >= {k}
              THEN list_transform(range(1, len(ti) - {k} + 2), i -> {h})
              ELSE CAST([] AS BIGINT[]) END AS grams
  FROM t
),
w AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(grams) - {window - 1}, 1) + 1),
                        j -> list_aggregate(list_slice(grams, j, j + {window - 1}), 'min'))
           AS fps
  FROM g
)
SELECT DISTINCT doc_id, fp
FROM (SELECT doc_id, unnest(fps) AS fp FROM w)
WHERE fp IS NOT NULL
"""


@register("q_fingerprint", _winnow_sql())
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) document fingerprints — rolling-hash k-grams,
    window-min selection; the corpus-wide copy-detection primitive."""
    from .functions.text import winnow_fingerprints

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return winnow_fingerprints(docs)


@register(
    "q_media_meta",
    """
SELECT doc_id AS media_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS sha256,
       CAST((n_chars % 97) // 10 + 1 AS BIGINT) AS n_sampled_frames
FROM documents
""",
)
def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing, JVM-side half: opaque binary media column
    (synthesized from the text bytes — deterministic, no codec needed)
    → typed metadata (octet_length/sha256 codegen) → video-style frame
    sampling plan (sequence/explode) aggregated to a per-media count.
    The Python/Arrow half (decode/resize/features/segment stubs) is
    exercised in tests/test_engine.test_multimodal_plumbing."""
    from .functions.multimodal import attach_binary_metadata, frame_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("media"),
        (F.col("n_chars") % 97 + 1).alias("n_frames"),
    )
    meta = attach_binary_metadata(media, "media", "media_id").drop("media")
    frames = (
        frame_sample(media, "n_frames", every=10, id_col="media_id")
        .groupBy("media_id")
        .agg(F.count("*").alias("n_sampled_frames"))
    )
    return meta.join(frames, "media_id")


def _langid_sql() -> str:
    from .functions.text import LANG_STOPWORDS

    score_cols = ",\n         ".join(
        f"len(list_filter(toks, x -> x IN ({', '.join(repr(w) for w in sw)}))) AS s_{lg}"
        for lg, sw in LANG_STOPWORDS.items()
    )
    langs = sorted(LANG_STOPWORDS)
    best = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    case = "CASE " + " ".join(f"WHEN s_{lg} = {best} THEN '{lg}'" for lg in langs) + " END"
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id,
         {score_cols}
      FROM t)
SELECT doc_id, {case} AS pred_lang FROM s
"""


@register("q_lang_id", None)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import language_id

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return language_id(docs)


ORACLES["q_lang_id"] = _langid_sql()


@register("q_cohens_kappa", None)  # generated oracle attached below
def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ between the heuristic language-ID prediction and the
    corpus lang label — the chance-corrected agreement eval that
    closes the classifier loop (accuracy alone flatters a skewed label
    mix).  κ = (A·N − S)/(N² − S) over exact int64 counts, so the two
    engines divide the same integers; the oracle recomputes the
    prediction through the generated stopword-score SQL and the margin
    algebra independently."""
    from .functions.stats import cohens_kappa
    from .functions.text import language_id

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pred = language_id(docs).select("doc_id", "pred_lang")
    j = docs.select("doc_id", "lang").join(pred, "doc_id")
    return cohens_kappa(j, "lang", "pred_lang")


ORACLES["q_cohens_kappa"] = f"""
WITH j AS (
  SELECT d.lang AS ca, p.pred_lang AS cb
  FROM documents d JOIN ({_langid_sql()}) p ON p.doc_id = d.doc_id
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN ca = cb THEN 1 ELSE 0 END) AS BIGINT) AS agree
  FROM j
),
rm AS (SELECT ca AS cls, CAST(count(*) AS BIGINT) AS ra FROM j GROUP BY ca),
cm AS (SELECT cb AS cls, CAST(count(*) AS BIGINT) AS cbn FROM j GROUP BY cb),
pe AS (
  SELECT CAST(coalesce(sum(ra * cbn), 0) AS BIGINT) AS s
  FROM rm JOIN cm USING (cls)
)
SELECT n AS n_rows, agree AS n_agree,
       CASE WHEN n * n <> s
            THEN CAST(agree * n - s AS DOUBLE) / CAST(n * n - s AS DOUBLE)
       END AS kappa
FROM tot, pe
"""


# Engine/oracle asymmetries, both documented here (ADVICE r01):
# 1. gram start positions cap at 1000 (range(1,1001)); the engine's
#    shingles() is unbounded.  Corpus invariant this relies on: synthetic
#    documents are 20..79 words (data/synth.py), planted near-dups drop
#    one word — far below 1002 tokens at every SF.  A fixture with longer
#    documents must raise the cap (tests/test_driver_gate.py asserts the
#    invariant).
# 2. the engine joins shingles on xxhash64(gram) (8-byte shuffle key)
#    while the oracle intersects exact strings; a 64-bit collision between
#    distinct grams of two compared docs would inflate the intersection
#    (~n²/2⁶⁵ — negligible, and it would surface as a gate hash mismatch).
_SHINGLE_SQL = """
toks AS (SELECT doc_id AS id, string_split(text, ' ') AS tk FROM corpus),
sh AS (
  SELECT DISTINCT id, array_to_string(list_slice(tk, i.range, i.range + 2), ' ') AS sh
  FROM toks, range(1, 1001) i
  WHERE i.range <= greatest(len(tk) - 2, 1)
),
sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id)
"""


@register(
    "q_ngram_jaccard",
    f"WITH {_CORPUS_SQL.strip()},\n{_SHINGLE_SQL.strip()},\n"
    """
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b,
       round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
WHERE round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) >= 0.6
""",
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_corpus_df(spark, sf_dir), threshold=0.6, k=3)


_MINHASH_SQL = (
    f"WITH {_CORPUS_SQL.strip()},\n{_SHINGLE_SQL.strip()},\n"
    """
sids AS (
  SELECT id, CAST(CAST(('0x' || substr(md5(sh), 1, 7)) AS UBIGINT) AS BIGINT) % 268435456 AS sid
  FROM sh
),
perms AS (
  SELECT CAST(j.range AS INT) AS j,
         ((j.range + 1) * 2654435761) % 1000000007 AS a,
         ((j.range + 1) * 40503) % 1000000007 AS b
  FROM range(16) j
),
sig AS (
  SELECT id, j, min((a * sid + b) % 1000000007) AS mh
  FROM sids, perms GROUP BY id, j
),
bands AS (
  SELECT id, CAST(j / 4 AS INT) AS band,
         CAST(sum((mh * (CASE j % 4 WHEN 0 THEN 1 WHEN 1 THEN 31 WHEN 2 THEN 961 ELSE 29791 END))
                  % 1000000007) AS BIGINT) AS bsig
  FROM sig GROUP BY id, CAST(j / 4 AS INT)
),
ok AS (SELECT band, bsig FROM bands GROUP BY band, bsig HAVING count(*) <= 1000),
bs AS (SELECT bands.* FROM bands JOIN ok USING (band, bsig)),
cand AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b
  FROM bs l JOIN bs r USING (band, bsig) WHERE l.id < r.id
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c JOIN sh a ON a.id = c.id_a JOIN sh b ON b.id = c.id_b AND b.sh = a.sh
  GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b,
       round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
WHERE round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) >= 0.6
"""
)


@register("q_minhash_lsh", _MINHASH_SQL)
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_corpus_df(spark, sf_dir), threshold=0.6)


# near-dup GROUP assignment: engine runs real connected components over
# the LSH pair graph; the oracle computes the same labels via a
# recursive transitive closure (exact for arbitrary chain topologies,
# not just the planted pair structure)
_NEAR_DUP_GROUPS_SQL = (
    f"WITH RECURSIVE {_CORPUS_SQL.strip()},\n{_SHINGLE_SQL.strip()},\n"
    """
sids AS (
  SELECT id, CAST(CAST(('0x' || substr(md5(sh), 1, 7)) AS UBIGINT) AS BIGINT) % 268435456 AS sid
  FROM sh
),
perms AS (
  SELECT CAST(j.range AS INT) AS j,
         ((j.range + 1) * 2654435761) % 1000000007 AS a,
         ((j.range + 1) * 40503) % 1000000007 AS b
  FROM range(16) j
),
sig AS (
  SELECT id, j, min((a * sid + b) % 1000000007) AS mh
  FROM sids, perms GROUP BY id, j
),
bands AS (
  SELECT id, CAST(j / 4 AS INT) AS band,
         CAST(sum((mh * (CASE j % 4 WHEN 0 THEN 1 WHEN 1 THEN 31 WHEN 2 THEN 961 ELSE 29791 END))
                  % 1000000007) AS BIGINT) AS bsig
  FROM sig GROUP BY id, CAST(j / 4 AS INT)
),
ok AS (SELECT band, bsig FROM bands GROUP BY band, bsig HAVING count(*) <= 1000),
bs AS (SELECT bands.* FROM bands JOIN ok USING (band, bsig)),
cand AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b
  FROM bs l JOIN bs r USING (band, bsig) WHERE l.id < r.id
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c JOIN sh a ON a.id = c.id_a JOIN sh b ON b.id = c.id_b AND b.sh = a.sh
  GROUP BY c.id_a, c.id_b
),
pairs AS (
  SELECT id_a, id_b
  FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
  WHERE round(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) >= 0.6
),
sym AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs),
reach(n, m) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.n, s.b FROM reach r JOIN sym s ON s.a = r.m
)
SELECT n AS doc_id, CAST(least(n, min(m)) AS BIGINT) AS rep_id
FROM reach GROUP BY n
"""
)


@register("q_near_dup_groups", _NEAR_DUP_GROUPS_SQL)
def q_near_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate GROUP assignment (the composite curation pipelines
    run on LSH output): minhash pairs → real connected components
    (dissolve's CC machinery) → min-id representative per document.
    The oracle resolves the same labels with a recursive transitive
    closure, so chains — not just planted pairs — must agree."""
    from .functions.dedup import near_dup_groups

    return near_dup_groups(_corpus_df(spark, sf_dir), threshold=0.6)


@register(
    "q_group_sample",
    """
WITH h AS (
  SELECT doc_id, lang,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) AS hk
  FROM documents
),
r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY hk ASC, doc_id ASC) AS rn
  FROM h
)
SELECT doc_id, lang FROM r WHERE rn <= 25
""",
)
def q_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform 25-per-language sample (hash-rank — the
    reservoir-sampling equivalent with per-key stability across
    runs/engines/scales)."""
    from .functions.sampling import group_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return group_sample(docs, ["lang"], k=25).select("doc_id", "lang")


@register(
    "q_simhash",
    """
WITH toks AS (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok FROM documents),
th AS (
  SELECT id, CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT) AS BIGINT) AS th FROM toks
),
votes AS (
  SELECT id, b.range AS b, CAST(power(2.0, b.range) AS BIGINT) AS pw,
         sum(CAST(floor(th / power(2.0, b.range)) AS BIGINT) % 2 * 2 - 1) AS v
  FROM th, range(32) b GROUP BY id, b.range
)
SELECT id AS doc_id,
       CAST(sum(CASE WHEN v > 0 THEN pw ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY id
""",
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.dedup import simhash

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash(docs).withColumnRenamed("id", "doc_id")


_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)
_NRM = "sqrt(list_sum(list_transform({a}, e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE))))"


_COSINE_TOPK_SQL = f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
p AS (
  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         round({_DOT.format(a='q.embedding', b='c.embedding')}
               / ({_NRM.format(a='q.embedding')} * {_NRM.format(a='c.embedding')}), 6) AS sim
  FROM q, embeddings c WHERE c.vec_id <> q.vec_id
),
r AS (
  SELECT q_id, n_id, sim,
         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
  FROM p
)
SELECT q_id, n_id, sim, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 10
"""


@register("q_cosine_topk", _COSINE_TOPK_SQL)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_topk(emb.filter(F.col("vec_id") < 10), emb, k=10).withColumn(
        "rank", F.col("rank").cast("long")
    )


_IVF_CSIM = (
    "round(" + _DOT.format(a="{v}", b="c.cv") + " / ("
    + _NRM.format(a="{v}") + " * " + _NRM.format(a="c.cv") + "), 6)"
)

_IVF_ANN_SQL = f"""
WITH v AS (SELECT vec_id, embedding FROM embeddings),
c AS (SELECT vec_id AS c_id, embedding AS cv FROM embeddings WHERE vec_id < 16),
asg0 AS (
  SELECT v.vec_id AS n_id, c.c_id,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY {_IVF_CSIM.format(v='v.embedding')} DESC, c.c_id ASC) AS r
  FROM v, c
),
asg AS (SELECT n_id, c_id AS list_id FROM asg0 WHERE r = 1),
q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
pr0 AS (
  SELECT q.q_id, c.c_id,
         row_number() OVER (PARTITION BY q.q_id
                            ORDER BY {_IVF_CSIM.format(v='q.qv')} DESC, c.c_id ASC) AS r
  FROM q, c
),
pr AS (SELECT q_id, c_id AS list_id FROM pr0 WHERE r <= 4),
cand AS (SELECT pr.q_id, asg.n_id FROM pr JOIN asg USING (list_id) WHERE asg.n_id <> pr.q_id),
p AS (
  SELECT cand.q_id, cand.n_id,
         round({_DOT.format(a='q.qv', b='n.embedding')}
               / ({_NRM.format(a='q.qv')} * {_NRM.format(a='n.embedding')}), 6) AS sim
  FROM cand JOIN q ON q.q_id = cand.q_id JOIN v n ON n.vec_id = cand.n_id
),
r AS (
  SELECT q_id, n_id, sim,
         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
  FROM p
)
SELECT q_id, n_id, sim, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 10
"""


@register("q_ivf_ann", _IVF_ANN_SQL)
def q_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN (deterministic coarse quantizer → inverted lists →
    probed exact re-rank) — the oracle-exact scale path beside the
    sign-LSH one (q_lsh_ann)."""
    from .functions.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ivf_topk(emb.filter(F.col("vec_id") < 10), emb, k=10, nprobe=4).withColumn(
        "rank", F.col("rank").cast("long")
    )


# ---------------------------------------------------------------------------
# q_ann_recall — recall@10 of the IVF probe against the exact top-k
# ---------------------------------------------------------------------------

@register(
    "q_ann_recall",
    f"""
WITH approx AS ({_IVF_ANN_SQL}),
exact AS ({_COSINE_TOPK_SQL})
SELECT e.q_id,
       CAST(count(a.n_id) AS BIGINT) AS hits,
       round(count(a.n_id) * 1.0 / count(*), 6) AS recall
FROM exact e
LEFT JOIN approx a ON a.q_id = e.q_id AND a.n_id = e.n_id
GROUP BY e.q_id
""",
)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of IVF-flat ANN vs the exact brute-force top-k — the
    standard ANN quality gate; grades q_ivf_ann's probe quality with an
    oracle composed verbatim from the two searches it compares."""
    from .functions.similarity import ann_recall_at_k, cosine_topk, ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    return ann_recall_at_k(ivf_topk(q, emb, k=10, nprobe=4), cosine_topk(q, emb, k=10), k=10)


# ---------------------------------------------------------------------------
# q_mmr_rerank — maximal-marginal-relevance diversification of the top-k
# ---------------------------------------------------------------------------


def _mmr_oracle(k: int = 10, n_select: int = 5) -> str:
    """Unrolled greedy MMR: n_select explicit argmax stages (no
    recursion — each stage is a plain window top-1 over the candidates
    not yet picked, with m = greatest(sim to each prior pick)).  The
    score is the literal two-multiply expression ``0.7*rel - 0.3*m``
    in BOTH engines so the greedy argmax is FP-portable; ties break by
    n_id ascending, mirroring the kernel's sorted-by-n_id scan with a
    strict ``>`` comparison."""
    stages = []
    for t in range(1, n_select + 1):
        if t == 1:
            m = "0.3 * 0.0"
            joins, notpicked = "", ""
        else:
            joins = "\n  ".join(
                f"JOIN s{j} ON s{j}.q_id = c.q_id "
                f"JOIN ps p{j} ON p{j}.q_id = c.q_id AND p{j}.a = c.n_id "
                f"AND p{j}.b = s{j}.n_id"
                for j in range(1, t)
            )
            m = "0.3 * greatest(" + ", ".join(
                f"p{j}.sim" for j in range(1, t)
            ) + ")"
            notpicked = " WHERE " + " AND ".join(
                f"c.n_id <> s{j}.n_id" for j in range(1, t)
            )
        stages.append(f"""s{t} AS (
  SELECT q_id, n_id, rel, score FROM (
    SELECT c.q_id, c.n_id, c.rel, 0.7 * c.rel - {m} AS score,
           row_number() OVER (PARTITION BY c.q_id
                              ORDER BY 0.7 * c.rel - {m} DESC,
                                       c.n_id ASC) AS r
    FROM cand c
  {joins}{notpicked}
  ) WHERE r = 1
)""")
        # ps.a <> ps.b always holds for a pick vs a survivor, so the
        # p{{j}} joins never drop rows: c.n_id <> s{{j}}.n_id is enforced.
    # mmr_score stays UNROUNDED: identical round-6 inputs through the
    # identical 0.7·rel − 0.3·m expression give bit-identical doubles
    # in both engines, while round-6 of a 7-decimal-digit product hits
    # the Spark-HALF_UP vs binary-rounding split (similarity.mmr_rerank
    # docstring) — the driver's round-9 hash is safe on raw doubles.
    union = "\nUNION ALL\n".join(
        f"SELECT q_id, n_id, CAST({t} AS BIGINT) AS mmr_rank, rel, "
        f"score AS mmr_score FROM s{t}"
        for t in range(1, n_select + 1)
    )
    stages_sql = ",\n".join(stages)
    return f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
p0 AS (
  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         round({_DOT.format(a='q.embedding', b='c.embedding')}
               / ({_NRM.format(a='q.embedding')} * {_NRM.format(a='c.embedding')}), 6) AS sim
  FROM q, embeddings c WHERE c.vec_id <> q.vec_id
),
cand AS (
  SELECT q_id, n_id, sim AS rel FROM (
    SELECT q_id, n_id, sim,
           row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
    FROM p0
  ) WHERE rank <= {k}
),
cv AS (SELECT cand.q_id, cand.n_id, e.embedding AS v
       FROM cand JOIN embeddings e ON e.vec_id = cand.n_id),
ps AS (
  SELECT a.q_id, a.n_id AS a, b.n_id AS b,
         round({_DOT.format(a='a.v', b='b.v')}
               / ({_NRM.format(a='a.v')} * {_NRM.format(a='b.v')}), 6) AS sim
  FROM cv a JOIN cv b ON a.q_id = b.q_id AND a.n_id <> b.n_id
),
{stages_sql}
{union}
"""


@register("q_mmr_rerank", None)  # generated oracle attached below
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-rank of the exact cosine top-10:
    greedily select 5 diversified neighbours per query maximising
    λ·rel − (1−λ)·max-sim-to-selected — the standard redundancy
    suppressor a RAG serving stage runs on its retrieval shortlist.
    Retrieval (the corpus-scale part) IS cosine_topk; the greedy
    recursion touches only k rows per query in one Arrow kernel.  The
    oracle unrolls the same greedy loop into 5 window-argmax stages —
    the two sides share no code path."""
    from .functions.similarity import mmr_rerank

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return mmr_rerank(emb.filter(F.col("vec_id") < 10), emb, k=10, n_select=5)


ORACLES["q_mmr_rerank"] = _mmr_oracle()


def _sq8_oracle() -> str:
    dim = _embedding_dim()
    dq_case = (
        "CASE WHEN p[3] - p[2] = 0 THEN p[2] "
        "ELSE p[2] + least(255.0, greatest(0.0, "
        "floor((p[1] - p[2]) / (p[3] - p[2]) * 255.0 + 0.5))) / 255.0 * (p[3] - p[2]) END"
    )
    return f"""
WITH v AS (SELECT vec_id, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v FROM embeddings),
st AS (
  SELECT i.range AS pos, min(v[i.range]) AS mn, max(v[i.range]) AS mx
  FROM v, range(1, {dim + 1}) i GROUP BY i.range
),
stats AS (SELECT list(mn ORDER BY pos) AS mn, list(mx ORDER BY pos) AS mx FROM st),
dq AS (
  SELECT v.vec_id, list_transform(list_zip(v.v, s.mn, s.mx), p -> {dq_case}) AS dv
  FROM v CROSS JOIN stats s
),
q AS (SELECT vec_id AS q_id, dv AS qv FROM dq WHERE vec_id < 10),
p AS (
  SELECT q.q_id, c.vec_id AS n_id,
         round({_DOT.format(a='q.qv', b='c.dv')}
               / ({_NRM.format(a='q.qv')} * {_NRM.format(a='c.dv')}), 6) AS sim
  FROM q, dq c WHERE c.vec_id <> q.q_id
),
r AS (
  SELECT q_id, n_id, sim,
         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
  FROM p
)
SELECT q_id, n_id, sim, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 10
"""


@register("q_sq8_ann", None)  # generated oracle attached below
def q_sq8_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar-quantized ANN: per-dim min/max codebook trained on
    the corpus, both sides quantized→dequantized, exact cosine top-k on
    the dequantized vectors — the stored-embedding compression path,
    fully relational and exact-oracle-gated."""
    from .functions.similarity import sq8_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return sq8_topk(emb.filter(F.col("vec_id") < 10), emb, k=10)


ORACLES["q_sq8_ann"] = _sq8_oracle()


@register("q_lsh_ann", None)  # pinned-VALUES oracle attached at module end
def q_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH ANN (recall<1 by design, so no closed-form SQL twin);
    exact-match gated against the pinned independent mirror
    (scripts/pin_oracles.py: same public hyperplane formula,
    sequential-fold cosine, HALF_UP rounding)."""
    from .functions.similarity import lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return lsh_topk(emb.filter(F.col("vec_id") < 10), emb, k=10).withColumn(
        "rank", F.col("rank").cast("long")
    )


@register(
    "q_embedding_neardup",
    """
WITH emb2 AS (
  SELECT vec_id, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000,
         [CAST(embedding[1] AS DOUBLE) + 0.05]
           || list_transform(embedding[2:], e -> CAST(e AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id < 100
),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_sum(list_transform(list_zip(a.v, b.v), q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(a.v, e -> e * e)))
                * sqrt(list_sum(list_transform(b.v, e -> e * e)))), 6) AS sim
  FROM emb2 a, emb2 b WHERE a.vec_id < b.vec_id
)
SELECT id_a, id_b, sim FROM p WHERE sim >= 0.99
""",
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding near-dup sweep (block-matmul cogroup) over the
    corpus plus planted perturbed clones (vec_id+1e6, first coord +0.05);
    the LSH-bucketed scale path is exercised by q_lsh_ann."""
    from .functions.similarity import cosine_pairs_blocked

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.select(
        "vec_id", F.transform("embedding", lambda e: e.cast("double")).alias("embedding")
    )
    clones = emb.filter(F.col("vec_id") < 100).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1).cast("double") + 0.05),
            F.transform(F.slice("embedding", 2, 10000), lambda e: e.cast("double")),
        ).alias("embedding"),
    )
    return cosine_pairs_blocked(
        base.unionByName(clones), threshold=0.99, block_rows=1024
    )


@register(
    "q_text_invariant",
    """
SELECT doc_id, md5(text) AS text_md5 FROM documents
""",
)
def q_text_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-identity invariant (input_hint): text rides through the whole
    geocode → cell join pipeline untouched; md5 proves it per doc."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    pts = city.with_cell(city.points_df(spark, sf_dir))
    routed = docs.join(pts, "doc_id").select("doc_id", "text", "cell")
    return routed.select("doc_id", F.md5(F.col("text")).alias("text_md5"))


# ---------------------------------------------------------------------------
# network family (SURVEY.md §2.7) — real Dijkstra in the engine, closed-form
# Manhattan shortest paths on the lattice as the oracle
# ---------------------------------------------------------------------------

_NODES_SQL = f"""
nodes AS (
  SELECT CAST(g.range AS BIGINT) AS node_id,
         CAST(g.range % 51 AS BIGINT) AS gx,
         CAST(floor(g.range / 51.0) AS BIGINT) AS gy,
         {city.X0} + (g.range % 51) * 200.0 AS nx,
         {city.Y0} + CAST(floor(g.range / 51.0) AS BIGINT) * 200.0 AS ny
  FROM range(2601) g
)
"""


@register(
    "q_accessibility_network",
    _CTE + f"""
, {_NODES_SQL.strip()},
snap AS (
  SELECT doc_id, x, y, node_id, gx, gy, d AS penalty_home FROM (
    SELECT p.doc_id, p.x, p.y, n.node_id, n.gx, n.gy,
           sqrt((n.nx - p.x) * (n.nx - p.x) + (n.ny - p.y) * (n.ny - p.y)) AS d,
           row_number() OVER (
             PARTITION BY p.doc_id
             ORDER BY sqrt((n.nx - p.x) * (n.nx - p.x) + (n.ny - p.y) * (n.ny - p.y)) ASC,
                      n.node_id ASC) AS rn
    FROM pts p, nodes n
  ) WHERE rn = 1
),
ent AS (
  SELECT g.gs_id, n.node_id, n.gx, n.gy, n.nx AS ex, n.ny AS ey
  FROM nodes n JOIN greens g
    ON g.area >= 400
   AND (CASE WHEN n.nx >= g.minx AND n.nx <= g.maxx AND n.ny >= g.miny AND n.ny <= g.maxy
             THEN least(n.nx - g.minx, g.maxx - n.nx, n.ny - g.miny, g.maxy - n.ny)
             ELSE sqrt(power(greatest(0.0, g.minx - n.nx, n.nx - g.maxx), 2)
                     + power(greatest(0.0, g.miny - n.ny, n.ny - g.maxy), 2))
        END) < 20.0
),
cand AS (
  SELECT p.doc_id, g.gs_id, g.cx, g.cy
  FROM pts p JOIN greens g
    ON g.area >= 400
   AND (power(greatest(0.0, g.minx - p.x, p.x - g.maxx), 2)
      + power(greatest(0.0, g.miny - p.y, p.y - g.maxy), 2)) <= 90000.0
),
paths AS (
  SELECT c.doc_id,
         200.0 * (abs(e.gx - s.gx) + abs(e.gy - s.gy)) + s.penalty_home
         + sqrt((c.cx - e.ex) * (c.cx - e.ex) + (c.cy - e.ey) * (c.cy - e.ey)) AS d
  FROM cand c
  JOIN ent e ON e.gs_id = c.gs_id
  JOIN snap s ON s.doc_id = c.doc_id
  WHERE 200.0 * (abs(e.gx - s.gx) + abs(e.gy - s.gy)) <= 450.0
),
near AS (SELECT doc_id, round(min(d), 0) AS min_dist FROM paths GROUP BY doc_id)
SELECT p.doc_id,
       coalesce(near.min_dist <= 300.0, false) AS greenspace_within,
       coalesce(least(near.min_dist, 300.0), 300.0) AS distance_to_greenspace
FROM (SELECT DISTINCT doc_id FROM pts) p
LEFT JOIN near ON p.doc_id = near.doc_id
""",
)
def q_accessibility_network(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Network+centroids accessibility: real bounded Dijkstra in the
    engine; the oracle exploits that shortest paths on the uniform
    200 m lattice are Manhattan distances (entrances on the *unclipped*
    rect boundary — the reference-exact clipped-boundary variant is
    pytest-only, see tests/test_network.py)."""
    from .data import city_fixture as fx
    from .operators.network import shortest_distance_greenspace_network

    pts = city.points_df(spark, sf_dir).withColumnRenamed("doc_id", "id")
    greens = city.greenspace_df(spark)
    nodes, edges = fx.network_dfs(spark)
    out = shortest_distance_greenspace_network(
        pts, greens, nodes, edges, target_dist=300.0, min_area=400.0,
        destination="centroids", id_col="id",
    )
    return out.withColumnRenamed("id", "doc_id")


@register("q_accessibility_network_part", None)  # oracle attached below
def q_accessibility_network_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same query as q_accessibility_network, routed through the
    no-broadcast cell-partitioned Dijkstra (the sharded-network scale
    path) — held to the same exact oracle."""
    from .data import city_fixture as fx
    from .operators.network import shortest_distance_greenspace_network

    pts = city.points_df(spark, sf_dir).withColumnRenamed("doc_id", "id")
    greens = city.greenspace_df(spark)
    nodes, edges = fx.network_dfs(spark)
    out = shortest_distance_greenspace_network(
        pts, greens, nodes, edges, target_dist=300.0, min_area=400.0,
        destination="centroids", id_col="id", partitioned=True,
    )
    return out.withColumnRenamed("id", "doc_id")


ORACLES["q_accessibility_network_part"] = ORACLES["q_accessibility_network"]


@register(
    "q_dissolve",
    _CTE + """
, greens2 AS (
  SELECT gs_id, minx, miny, maxx, maxy, area, cx, cy, tag FROM greens
  UNION ALL
  SELECT gs_id + 100, minx + 17, miny + 13, maxx + 17, maxy + 13, area,
         cx + 17, cy + 13, tag
  FROM greens
),
dims AS (SELECT gs_id, maxx - minx AS w, maxy - miny AS h FROM greens),
paired AS (SELECT gs_id FROM dims WHERE w >= 17 AND h >= 13)
SELECT g.gs_id AS component,
       2 AS n_members,
       2 * g.area - (d.w - 17) * (d.h - 13) AS area,
       (g.cx * g.area + (g.cx + 17) * g.area
        - (g.minx + 17 + g.maxx) / 2.0 * ((d.w - 17) * (d.h - 13)))
         / (2 * g.area - (d.w - 17) * (d.h - 13)) AS cx,
       (g.cy * g.area + (g.cy + 13) * g.area
        - (g.miny + 13 + g.maxy) / 2.0 * ((d.w - 17) * (d.h - 13)))
         / (2 * g.area - (d.w - 17) * (d.h - 13)) AS cy,
       g.minx AS minx, g.miny AS miny, g.maxx + 17 AS maxx, g.maxy + 13 AS maxy,
       g.tag
FROM greens g JOIN dims d ON d.gs_id = g.gs_id
WHERE g.gs_id IN (SELECT gs_id FROM paired)
UNION ALL
SELECT g2.gs_id AS component, 1, g2.area, g2.cx, g2.cy,
       g2.minx, g2.miny, g2.maxx, g2.maxy, g2.tag
FROM greens2 g2
WHERE (g2.gs_id % 100) NOT IN (SELECT gs_id FROM paired)
""",
)
def q_dissolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic dissolve (cell self-join → CC loop → exact scanline
    union) over the greenspace layer plus shifted clones; the oracle is
    the closed-form pairwise union (clones only ever overlap their own
    original on this layout — chains/hole cases are pytest-covered)."""
    from .operators.dissolve import dissolve_rects

    return dissolve_rects(_dissolve_layer(spark))


def _dissolve_layer(spark: SparkSession) -> DataFrame:
    """Greenspace layer + shifted clones — shared input of q_dissolve
    and q_dissolve_sharded so the two plans dissolve the same table."""
    g = city.greenspace_df(spark)
    clones = g.select(
        (F.col("gs_id") + 100).alias("gs_id"),
        (F.col("minx") + 17).alias("minx"), (F.col("miny") + 13).alias("miny"),
        (F.col("maxx") + 17).alias("maxx"), (F.col("maxy") + 13).alias("maxy"),
        "area",
        (F.col("cx") + 17).alias("cx"), (F.col("cy") + 13).alias("cy"),
        "tag",
    )
    return g.unionByName(clones)


@register("q_dissolve_sharded", None)  # same closed-form oracle as q_dissolve
def q_dissolve_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Giant-component-parallel dissolve: same output as q_dissolve,
    different physical plan — each component's scanline union is split
    into integer-boundary x-strips integrated independently and
    re-summed (exact on integer layers, so the SAME closed-form oracle
    hash-gates both plans; the component-task envelope drops from
    O(component) to O(component/n_strips))."""
    from .operators.dissolve import dissolve_rects_sharded

    return dissolve_rects_sharded(_dissolve_layer(spark), n_strips=4)


ORACLES["q_dissolve_sharded"] = ORACLES["q_dissolve"]


def _dissolve_poly_oracle() -> str:
    from .data.poly_fixture import dissolve_poly_oracle_sql

    return dissolve_poly_oracle_sql()


@register("q_dissolve_poly", None)  # generated inclusion–exclusion oracle below
def q_dissolve_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General-polygon dissolve (rotated + concave members): engine runs
    the slab-decomposition union (geo/kernels.polygon_union_stats); the
    oracle is inclusion–exclusion over Sutherland–Hodgman intersections
    — two independent exact algorithms must agree to 6 dp.  Reference:
    availability.py:937-940, accessibility.py:125-127 (unary_union over
    arbitrary OSM (Multi)Polygons)."""
    from .data.poly_fixture import poly_layer_df
    from .operators.dissolve import dissolve_polygons

    return dissolve_polygons(poly_layer_df(spark))


ORACLES["q_dissolve_poly"] = _dissolve_poly_oracle()


@register(
    "q_greenspace_iso",
    _CTE + f"""
, {_NODES_SQL.strip()},
sub AS (SELECT doc_id, x, y FROM pts WHERE doc_id % 20 = 0),
snap AS (
  SELECT doc_id, node_id, gx, gy, nx AS sx, ny AS sy FROM (
    SELECT p.doc_id, n.node_id, n.gx, n.gy, n.nx, n.ny,
           row_number() OVER (
             PARTITION BY p.doc_id
             ORDER BY sqrt((n.nx - p.x) * (n.nx - p.x) + (n.ny - p.y) * (n.ny - p.y)) ASC,
                      n.node_id ASC) AS rn
    FROM sub p, nodes n
  ) WHERE rn = 1
),
reach AS (
  SELECT s.doc_id, n.node_id, n.gx, n.gy, n.nx, n.ny
  FROM snap s, nodes n
  WHERE 200.0 * (abs(n.gx - s.gx) + abs(n.gy - s.gy)) <= 350.0
),
segs AS (
  SELECT a.doc_id, a.nx AS ax, a.ny AS ay, b.nx AS bx, b.ny AS by
  FROM reach a JOIN reach b
    ON a.doc_id = b.doc_id AND a.node_id < b.node_id
   AND abs(a.gx - b.gx) + abs(a.gy - b.gy) = 1
),
pxc AS (
  SELECT s.doc_id,
         CAST(floor((s.sx - {city.X0}) / 5.0) AS BIGINT) + a.range AS ix,
         CAST(floor((s.sy - {city.Y0}) / 5.0) AS BIGINT) + b.range AS iy
  FROM snap s, range(-86, 87) a, range(-86, 87) b
),
pxb AS (
  SELECT doc_id, ix, iy,
         {city.X0} + (ix + 0.5) * 5.0 AS cx,
         {city.Y0} + (iy + 0.5) * 5.0 AS cy
  FROM pxc WHERE ix BETWEEN 0 AND 1999 AND iy BETWEEN 0 AND 1999
),
inmask AS (
  SELECT DISTINCT p.doc_id, p.ix, p.iy, p.cx, p.cy
  FROM pxb p JOIN segs g ON g.doc_id = p.doc_id
   AND (
     (p.cx - (g.ax + least(greatest(((p.cx - g.ax) * (g.bx - g.ax) + (p.cy - g.ay) * (g.by - g.ay)) / 40000.0, 0.0), 1.0) * (g.bx - g.ax)))
   * (p.cx - (g.ax + least(greatest(((p.cx - g.ax) * (g.bx - g.ax) + (p.cy - g.ay) * (g.by - g.ay)) / 40000.0, 0.0), 1.0) * (g.bx - g.ax)))
   + (p.cy - (g.ay + least(greatest(((p.cx - g.ax) * (g.bx - g.ax) + (p.cy - g.ay) * (g.by - g.ay)) / 40000.0, 0.0), 1.0) * (g.by - g.ay)))
   * (p.cy - (g.ay + least(greatest(((p.cx - g.ax) * (g.bx - g.ax) + (p.cy - g.ay) * (g.by - g.ay)) / 40000.0, 0.0), 1.0) * (g.by - g.ay)))
   ) <= 625.0
),
cnt AS (
  SELECT m.doc_id,
         count(*) AS total,
         sum(CASE WHEN EXISTS (
               SELECT 1 FROM greens g
               WHERE m.cx >= g.minx AND m.cx < g.maxx
                 AND m.cy >= g.miny AND m.cy < g.maxy) THEN 1 ELSE 0 END) AS grn
  FROM inmask m GROUP BY m.doc_id
)
SELECT s.doc_id,
       CAST(round(100.0 * cnt.grn / cnt.total, 2) AS VARCHAR) || '%' AS greenspace_cover
FROM snap s JOIN cnt ON cnt.doc_id = s.doc_id
""",
)
def q_greenspace_iso(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenspace % over a network-isochrone AoI (15-min-walk analogue,
    README.md:266-270 semantics at raster resolution).  radius=350 m on
    the 200 m lattice keeps the capsule union hole-free, so the SQL
    oracle needs no flood fill — the engine still runs its general
    hole-filling path (a no-op here; hole cases are pytest-covered)."""
    from .data import city_fixture as fx
    from .operators.network import greenspace_pct_isochrone

    pts = (
        city.points_df(spark, sf_dir)
        .filter(F.col("doc_id") % 20 == 0)
        .withColumnRenamed("doc_id", "id")
    )
    nodes, edges = fx.network_dfs(spark)
    out = greenspace_pct_isochrone(
        pts, nodes, edges, city.greenspace_df(spark), radius=350.0, res=5.0,
        id_col="id", origin_x=city.X0, origin_y=city.Y0, npx=2000,
    )
    return out.withColumnRenamed("id", "doc_id").filter(F.col("greenspace_cover").isNotNull())


# ---------------------------------------------------------------------------
# visibility family (SURVEY.md §3.3)
# ---------------------------------------------------------------------------

_SV_R = 150.0


@register(
    "q_streetview_gvi",
    _CTE + f"""
, gvi_pts AS (
  SELECT doc_id, x, y,
         CASE WHEN doc_id % 17 = 0 THEN NULL
              ELSE round(((doc_id * 48271) % 1000) / 1000.0, 3) END AS GVI
  FROM pts
), bufs AS (SELECT doc_id AS id, x AS bx, y AS by FROM pts WHERE doc_id % 50 = 0)
SELECT b.id,
       round(avg(g.GVI), 3) AS GVI,
       count(g.GVI) AS nr_of_points
FROM bufs b JOIN gvi_pts g
  ON (g.x - b.bx) * (g.x - b.bx) + (g.y - b.by) * (g.y - b.by) <= {_SV_R * _SV_R}
WHERE g.GVI IS NOT NULL
GROUP BY b.id
""",
)
def q_streetview_gvi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streetview GVI A6 aggregation (visibility.py:1040-1052) over a
    deterministic per-point GVI table (the external Mapillary/Mask2Former
    stage is out of engine scope; see functions/multimodal)."""
    from .operators.visibility import streetview_gvi_aggregate

    pts = city.points_df(spark, sf_dir)
    gvi_pts = pts.select(
        "doc_id", "x", "y",
        F.when(F.col("doc_id") % 17 == 0, None)
        .otherwise(F.round(((F.col("doc_id") * 48271) % 1000) / 1000.0, 3))
        .alias("GVI"),
    )
    bufs = pts.filter(F.col("doc_id") % 50 == 0).select("doc_id", "x", "y")
    return streetview_gvi_aggregate(gvi_pts, bufs, buffer_dist=_SV_R, id_col="doc_id").withColumnRenamed("doc_id", "id")


@register("q_viewshed_gvi", None)  # raster kernel — not SQL-expressible;
def q_viewshed_gvi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viewshed GVI over the synthetic DSM/DTM/green tiles for a PoI
    subset (rows-only driver check; exact-parity oracle lives in
    tests/test_visibility.py against the full-raster transliteration)."""
    from .data import city_fixture as fx
    from .operators.visibility import viewshed_gvi

    pois = city.points_df(spark, sf_dir).filter(F.col("doc_id") % 10 == 0).withColumnRenamed(
        "doc_id", "id"
    )
    _, edges = fx.network_dfs(spark)
    tiles = (
        fx.surface_tiles_df(spark, "dsm")
        .unionByName(fx.surface_tiles_df(spark, "dtm"))
        .unionByName(fx.surface_tiles_df(spark, "green"))
    )
    agg, _pp = viewshed_gvi(
        pois, edges, tiles, buffer_dist=100.0, viewing_dist=250.0, sample_dist=50.0,
        grid=fx.surface_grid(),
    )
    return agg


@register("q_viewshed_fixed", None)  # pinned oracle (scripts/pin_oracles.py)
def q_viewshed_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrected-physics viewshed twin (VERDICT r03 #7): same pipeline
    as q_viewshed_gvi with ``replicate_bug=False`` — the observer
    stands ``observer_height`` above the terrain and slopes divide by
    ``dist*resolution`` (the reference's swapped-argument bug undone;
    geo/raster.py viewshed_window).  Both behaviors are now
    oracle-locked: this one against its own independently-mirrored
    pinned VALUES table."""
    from .data import city_fixture as fx
    from .operators.visibility import viewshed_gvi

    pois = city.points_df(spark, sf_dir).filter(F.col("doc_id") % 10 == 0).withColumnRenamed(
        "doc_id", "id"
    )
    _, edges = fx.network_dfs(spark)
    tiles = (
        fx.surface_tiles_df(spark, "dsm")
        .unionByName(fx.surface_tiles_df(spark, "dtm"))
        .unionByName(fx.surface_tiles_df(spark, "green"))
    )
    agg, _pp = viewshed_gvi(
        pois, edges, tiles, buffer_dist=100.0, viewing_dist=250.0, sample_dist=50.0,
        grid=fx.surface_grid(), replicate_bug=False,
    )
    return agg


# ---------------------------------------------------------------------------
# event-stream analytics (windowed aggs + sessionization — the batch
# mirror of streaming/ingest's watermarked path, oracle-checkable)
# ---------------------------------------------------------------------------


@register(
    "q_event_windows",
    """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type,
       count(*) AS n_events,
       CAST(round(sum(value) * 100) AS BIGINT) AS sum_cents,
       CAST(floor(CAST(round(sum(value) * 100) AS BIGINT) * 100.0 / count(*)) AS BIGINT)
         AS avg_e4
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
)
def q_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type (the batch twin of the
    watermarked streaming agg in streaming/ingest.windowed_counts)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value") * 100).cast("long").alias("sum_cents"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type", "n_events", "sum_cents",
            # integer-exact average (1e-4 units): value data has 2
            # decimals, so sum_cents is exact — float rounding of
            # near-half averages can't diverge between engines
            F.floor(F.col("sum_cents") * 100.0 / F.col("n_events")).cast("long").alias("avg_e4"),
        )
    )


@register(
    "q_sessionize",
    """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess,
         event_id
  FROM events
), s AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_no
  FROM g
)
SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
       count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_end
FROM s GROUP BY user_id, sess_no
""",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → flag → running
    sum → session key, all window functions (the batch equivalent of
    ``applyInPandasWithState`` session windows)."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts") - F.lag(F.col("ts")).over(w)
    flagged = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > F.expr("INTERVAL 30 MINUTES")), 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "sess_no", F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "sess_no").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("sess_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("sess_end"),
    )


# closed-session predicate mirrors Spark's state-timeout firing rule:
# timeout_ms = floor(epoch_us(end + gap)/1000) + 1 fires when the final
# watermark (max event time ms − 1 min delay) exceeds it strictly
_SESS_STREAM_SQL = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess,
         event_id
  FROM events
), s AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_no
  FROM g
), sess AS (
  SELECT user_id, sess_no, count(*) AS n_events,
         min(ts) AS t0, max(ts) AS t1,
         max(sess_no) OVER (PARTITION BY user_id) AS last_sess
  FROM s GROUP BY user_id, sess_no
), wm AS (
  SELECT CAST(floor(epoch_us(max(ts)) / 1000) AS BIGINT) - 60000 AS wm_ms FROM events
)
SELECT user_id,
       strftime(t0, '%Y-%m-%d %H:%M:%S.%f') AS sess_start,
       strftime(t1, '%Y-%m-%d %H:%M:%S.%f') AS sess_end,
       n_events
FROM sess, wm
WHERE sess_no < last_sess  -- closed by a successor event in the drain
   OR wm.wm_ms > CAST(floor((epoch_us(t1) + 1800000000) / 1000) AS BIGINT) + 1
"""


@register("q_sessionize_stream", _SESS_STREAM_SQL)
def q_sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STATEFUL streaming operator in the gate:
    ``applyInPandasWithState`` gap-sessionization (GroupState carries
    open sessions across micro-batches; event-time timeouts close them
    when the watermark passes end+gap).  Two AvailableNow drains — the
    second fires the stored timeouts — then the closed-session sink is
    hash-matched against the batch window-function sessionization
    filtered by the same closure rule."""
    import atexit
    import os
    import shutil
    import tempfile

    from .streaming.sessionize import sessionize_stream
    from .streaming.stage import (
        append_empty_delta,
        drain_shuffle_partitions,
        stage_events,
    )

    base = os.path.join(tempfile.gettempdir(), f"q_sessionize_stream_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    src, sink, ckpt = (os.path.join(base, d) for d in ("src", "sink", "ckpt"))
    stage_events(sf_dir, src)  # one-file copy, no Spark job
    # the timeout delta is staged UP FRONT (mtime-pinned last); the
    # single rate-limited drain then plans two micro-batches — events,
    # then the empty delta in which the state-store timeouts fire
    # against the watermark advanced by batch one.  One drain, one
    # query startup, identical state/watermark semantics to the old
    # two-drain restart (VERDICT r04 #4).
    append_empty_delta(src)
    with drain_shuffle_partitions(spark):
        sessionize_stream(spark, src, sink, ckpt, max_files_per_trigger=1)
    out = spark.read.parquet(sink)
    return out.select(
        "user_id",
        F.date_format("sess_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("sess_start"),
        F.date_format("sess_end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("sess_end"),
        "n_events",
    )


# synthetic crawl-page head: CSS + a script whose body contains bare `<`
# and a quoted "</div>" — exactly the content a naive tag-strip leaks or
# mangles; the extraction chain must drop the element BODIES
_HTML_HEAD = (
    '<html>\n <head><style type="text/css">body { color: #0f0; }</style>\n'
    '<script>if (1 < 2 && x !== "</div>") { track("noise") }</script>'
    "</head>\n<!-- ad slot: <div class=\"banner\">buy now</div> -->"
    '<body class="page">&nbsp;'
)
_HTML_TAIL = "&nbsp;</body>\n</html>"


def _html_extract_sql() -> str:
    """The oracle regexp chain generated from the SAME steps (incl. the
    shared HTML_ENTITIES order) the operator applies — the two cannot
    drift.  The comment and &nbsp; in the synthetic page head/tail
    exercise comment-body removal and entity decoding while keeping the
    extracted == text identity (nbsp decodes to a collapsible space;
    the other entities are covered by the unit test, since decoding
    them would inject characters the fixture text lacks)."""
    from .functions.text import HTML_ENTITIES

    expr = "decode(html)"
    for pat, rep in (
        ("(?is)<script\\b[^>]*>.*?</script\\s*>", " "),
        ("(?is)<style\\b[^>]*>.*?</style\\s*>", " "),
        ("(?s)<!--.*?-->", " "),
        ("<[^>]*>", ""),
        *HTML_ENTITIES,
        ("\\s+", " "),
    ):
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return f"trim({expr})"


_HTML_EXTRACT_SQL = _html_extract_sql()


@register(
    "q_html_extract",
    f"""
WITH h AS (
  SELECT doc_id, text,
         encode('{_HTML_HEAD.replace("'", "''")}' || text || '{_HTML_TAIL}') AS html
  FROM documents
)
SELECT doc_id,
       md5({_HTML_EXTRACT_SQL}) AS extracted_md5,
       {_HTML_EXTRACT_SQL} = text AS matches_text
FROM h
""",
)
def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML->text extraction over the raw crawl bytes (decode +
    script/style-BODY removal + tag strip + whitespace collapse, all
    codegen); the synthetic page head embeds CSS and a script with a
    bare `<` and a quoted "</div>", so extraction must both survive the
    corrupted-tag case and drop element bodies to reproduce the text
    column byte-for-byte (matches_text true everywhere) -- the
    boilerplate-removal stage of a web-corpus pipeline,
    exact-oracle-gated."""
    from .functions.text import html_extract_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # the driver table carries text only; synthesize the crawl-page
    # bytes (markup + script/style noise + stray whitespace) the synth
    # pipeline's html column has, then run the real extraction chain
    pages = docs.select(
        "doc_id", "text",
        F.encode(
            F.concat(F.lit(_HTML_HEAD), F.col("text"), F.lit(_HTML_TAIL)),
            "UTF-8",
        ).alias("html"),
    )
    out = html_extract_text(pages)
    return out.select(
        "doc_id",
        F.md5(F.col("extracted")).alias("extracted_md5"),
        (F.col("extracted") == F.col("text")).alias("matches_text"),
    )


@register(
    "q_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_e4,
       CAST(floor(sum(CAST(round(l_quantity) AS BIGINT)) * 10000.0 / count(*)) AS BIGINT) AS avg_qty_e4,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped relational sanity check: predicate pushdown +
    two-phase agg on the biggest driver table."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .withColumn("qty_i", F.round("l_quantity").cast("long"))
        .withColumn("cents", F.round(F.col("l_extendedprice") * 100).cast("long"))
        .withColumn("disc_i", F.round(F.col("l_discount") * 100).cast("long"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # integer-domain money math: exact and engine-independent
            # (per-row 2dp values -> cents; discount -> percent points)
            F.sum("qty_i").alias("sum_qty"),
            F.sum("cents").alias("sum_base_cents"),
            F.sum(F.col("cents") * (100 - F.col("disc_i"))).alias("sum_disc_e4"),
            F.count("*").alias("count_order"),
        )
        .withColumn(
            "avg_qty_e4",
            F.floor(F.col("sum_qty") * 10000.0 / F.col("count_order")).cast("long"),
        )
        .select("l_returnflag", "l_linestatus", "sum_qty", "sum_base_cents",
                "sum_disc_e4", "avg_qty_e4", "count_order")
    )


@register(
    "q_asof_join",
    """
SELECT l.event_id, l.user_id,
       coalesce(strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f'), '-') AS view_ts,
       coalesce(round(r.value, 6), -1.0) AS view_value
FROM (SELECT * FROM events WHERE event_type <> 'view') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
""",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal attribution: every non-view event joined as-of to the
    latest view at-or-before it per user (the "which page view preceded
    this click" join).  The oracle is DuckDB's native ASOF LEFT JOIN;
    the engine realizes it with zero joins — one shuffle on user_id and
    an ordered window carrying the latest view struct forward.  Misses
    surface as '-'/-1.0 sentinels (both engines) so the hash never
    depends on null-dtype coercion; the matched ts is a formatted
    string because the parquet ts is TIMESTAMP_NTZ (tz-free on both
    engines, same convention as q_sessionize)."""
    from .operators.asof import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value", "event_id"
    )
    clicks = ev.filter(F.col("event_type") != "view").select(
        "event_id", "user_id", "ts"
    )
    res = asof_join(clicks, views, "user_id", "ts", ["value"], tiebreak_col="event_id")
    return res.select(
        "event_id",
        "user_id",
        F.coalesce(
            F.date_format("ts_asof", "yyyy-MM-dd HH:mm:ss.SSSSSS"), F.lit("-")
        ).alias("view_ts"),
        F.coalesce(F.round("value_asof", 6), F.lit(-1.0)).alias("view_value"),
    )


# the same stop set as a DuckDB list literal (for list_intersect)
_STOP_LIST_SQL = "[" + _STOP_SQL.strip("()") + "]"


@register(
    "q_domain_cap",
    f"""
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n,
         CAST(len(list_filter(toks, x -> x IN {_STOP_SQL})) AS DOUBLE) AS nstop,
         (length(text) - len(toks) + 1) / CAST(len(toks) AS DOUBLE) AS mean_len
  FROM t
), q AS (
  SELECT doc_id,
         round(least(n / 64.0, 1.0)
               * (1.0 - least(nstop / n * 4.0, 1.0))
               * (CASE WHEN mean_len >= 3.0 AND mean_len <= 10.0
                       THEN 1.0 ELSE 0.5 END), 3) AS score
  FROM s
), r AS (
  SELECT q.doc_id, d.source AS domain, q.score,
         CAST(row_number() OVER (PARTITION BY d.source
                                 ORDER BY q.score DESC, q.doc_id) AS BIGINT)
           AS rank
  FROM q JOIN documents d ON q.doc_id = d.doc_id
)
SELECT doc_id, domain, score, rank FROM r WHERE rank <= 20
""",
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap: keep the best 20 documents per source
    by (quality desc, id) — the FineWeb-style anti-SEO-farm cap —
    realized with the exact salted two-phase top-k so no task sorts a
    whole domain; the oracle is the naive per-domain window."""
    from .functions.sampling import domain_cap
    from .functions.text import quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = quality_score(docs).join(docs.select("doc_id", "source"), "doc_id")
    return domain_cap(scored, 20, "quality").withColumn(
        "rank", F.col("rank").cast("long")
    )


@register(
    "q_gopher_quality",
    f"""
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id,
         len(toks) AS n,
         (length(text) - len(toks) + 1) / CAST(len(toks) AS DOUBLE) AS ml,
         len(list_intersect(list_distinct(toks), {_STOP_LIST_SQL})) AS sd,
         len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))
           / CAST(len(toks) AS DOUBLE) AS af
  FROM t
)
SELECT doc_id, n AS n_words, round(ml, 6) AS mean_word_len,
       sd AS stop_distinct, round(af, 6) AS alpha_frac,
       CASE WHEN n BETWEEN 50 AND 100000 AND ml >= 3.0 AND ml <= 10.0
                 AND sd >= 2 AND af >= 0.8 THEN 1 ELSE 0 END AS keep
FROM s
""",
)
def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher word-shape quality rules (word count / mean word length /
    distinct-stopword floor / alphabetic-word fraction) — the doc-level
    half of the Gopher filter pair; q_gopher_repetition is the
    repetition half.  Pure single-projection codegen over the scan."""
    from .functions.text import gopher_quality

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return gopher_quality(docs)


@register(
    "q_morans_i",
    _CTE + f""",
d AS (
  SELECT CAST(floor((x - {city.X0}) / {city.CELL}) AS BIGINT) AS gx,
         CAST(floor((y - {city.Y0}) / {city.CELL}) AS BIGINT) AS gy,
         CAST(round(({city.NDVI_SQL.format(px_x='x', px_y='y')}) * 1000000)
              AS BIGINT) AS vd
  FROM pts
),
c AS (SELECT gx, gy, sum(vd) AS v FROM d GROUP BY gx, gy),
s AS (SELECT count(*) AS n, sum(CAST(v AS HUGEINT)) AS sv,
             sum(CAST(v AS HUGEINT) * v) AS svv FROM c),
p AS (
  SELECT count(*) AS w,
         coalesce(sum(pp), 0) AS spp, coalesce(sum(ab), 0) AS sab
  FROM (
    SELECT CAST(a.v AS HUGEINT) * b.v AS pp, CAST(a.v AS HUGEINT) + b.v AS ab
    FROM c a JOIN c b ON b.gx = a.gx + 1 AND b.gy = a.gy
    UNION ALL
    SELECT CAST(a.v AS HUGEINT) * b.v, CAST(a.v AS HUGEINT) + b.v
    FROM c a JOIN c b ON b.gx = a.gx - 1 AND b.gy = a.gy
    UNION ALL
    SELECT CAST(a.v AS HUGEINT) * b.v, CAST(a.v AS HUGEINT) + b.v
    FROM c a JOIN c b ON b.gx = a.gx AND b.gy = a.gy + 1
    UNION ALL
    SELECT CAST(a.v AS HUGEINT) * b.v, CAST(a.v AS HUGEINT) + b.v
    FROM c a JOIN c b ON b.gx = a.gx AND b.gy = a.gy - 1
  )
)
SELECT n AS n_cells, w AS w_pairs,
       CAST(n * n * spp - n * sv * sab + w * sv * sv AS DOUBLE)
       / nullif(CAST(w AS DOUBLE) * CAST(n * svv - sv * sv AS DOUBLE), 0.0)
         AS morans_i
FROM s, p
""",
)
def q_morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Moran's I of per-cell greenness-exposure mass: geocoded
    documents binned to the 100 m city grid, per-cell value = exact
    integer sum of round-6 NDVI micro-units at each document's
    coordinates (so both engines aggregate integers — no FP-order
    escape hatch), rook adjacency as an equi-join.  The only FP step is
    the final double division of two exact DECIMAL/HUGEINT integers,
    bit-identical across engines."""
    from .operators.spatial_stats import morans_i

    pts = city.points_df(spark, sf_dir)
    vd = F.round(
        F.expr(city.NDVI_SQL.format(px_x="x", px_y="y")) * 1000000
    ).cast("long")
    cells = (
        pts.select(
            F.floor((F.col("x") - city.X0) / city.CELL).cast("long").alias("gx"),
            F.floor((F.col("y") - city.Y0) / city.CELL).cast("long").alias("gy"),
            vd.alias("vd"),
        )
        .groupBy("gx", "gy")
        .agg(F.sum("vd").alias("v"))
    )
    return morans_i(cells)


# ---------------------------------------------------------------------------
# shared per-cell fragments for the spatial-statistics family
# ---------------------------------------------------------------------------

# per-cell greenness-exposure MASS (exact integer micro-unit sums — same
# construction q_morans_i inlines; kept as one fragment so the new local
# statistics cannot drift from it)
_MASS_CELLS_SQL = f"""
d AS (
  SELECT CAST(floor((x - {city.X0}) / {city.CELL}) AS BIGINT) AS gx,
         CAST(floor((y - {city.Y0}) / {city.CELL}) AS BIGINT) AS gy,
         CAST(round(({city.NDVI_SQL.format(px_x='x', px_y='y')}) * 1000000)
              AS BIGINT) AS vd
  FROM pts
),
c AS (SELECT gx, gy, sum(vd) AS v FROM d GROUP BY gx, gy)
"""

# per-cell document COUNT (for the density / clustering statistics)
_COUNT_CELLS_SQL = f"""
c AS (
  SELECT CAST(floor((x - {city.X0}) / {city.CELL}) AS BIGINT) AS gx,
         CAST(floor((y - {city.Y0}) / {city.CELL}) AS BIGINT) AS gy,
         count(*) AS cnt
  FROM pts GROUP BY 1, 2
)
"""


def _mass_cells_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _MASS_CELLS_SQL: [gx, gy, v]."""
    pts = city.points_df(spark, sf_dir)
    vd = F.round(
        F.expr(city.NDVI_SQL.format(px_x="x", px_y="y")) * 1000000
    ).cast("long")
    return (
        pts.select(
            F.floor((F.col("x") - city.X0) / city.CELL).cast("long").alias("gx"),
            F.floor((F.col("y") - city.Y0) / city.CELL).cast("long").alias("gy"),
            vd.alias("vd"),
        )
        .groupBy("gx", "gy")
        .agg(F.sum("vd").alias("v"))
    )


def _count_cells_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _COUNT_CELLS_SQL: [gx, gy, cnt]."""
    pts = city.points_df(spark, sf_dir)
    return (
        pts.select(
            F.floor((F.col("x") - city.X0) / city.CELL).cast("long").alias("gx"),
            F.floor((F.col("y") - city.Y0) / city.CELL).cast("long").alias("gy"),
        )
        .groupBy("gx", "gy")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "q_getis_ord",
    _CTE + f""",
{_MASS_CELLS_SQL.strip()},
s AS (SELECT count(*) AS n, sum(CAST(v AS HUGEINT)) AS sv,
             sum(CAST(v AS HUGEINT) * v) AS svv FROM c),
o AS (SELECT a.dx, b.dy
      FROM (SELECT unnest([-1, 0, 1]) AS dx) a,
           (SELECT unnest([-1, 0, 1]) AS dy) b),
l AS (
  SELECT t.gx, t.gy, count(*) AS w_i, sum(CAST(nbr.v AS HUGEINT)) AS li
  FROM c t JOIN o ON true
  JOIN c nbr ON nbr.gx = t.gx + o.dx AND nbr.gy = t.gy + o.dy
  GROUP BY t.gx, t.gy
),
g AS (
  SELECT l.gx, l.gy, l.w_i,
         round(CAST(n * li - sv * w_i AS DOUBLE)
               * sqrt(CAST(n - 1 AS DOUBLE))
               / nullif(sqrt(CAST(n * svv - sv * sv AS DOUBLE)
                             * CAST(n * w_i - CAST(w_i AS HUGEINT) * w_i
                                    AS DOUBLE)), 0.0), 6) AS gi_z
  FROM l, s
)
SELECT gx, gy, w_i, gi_z, coalesce(gi_z >= 1.96, false) AS hot FROM g
""",
)
def q_getis_ord(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local Getis-Ord Gi* hotspot z-score per 100 m cell over the same
    per-cell greenness-exposure mass q_morans_i aggregates globally —
    "WHICH cells are exposure hot spots", the per-cell drill-down of the
    corpus-level clustering question.  Same exactness contract: all sums
    are exact integers (DECIMAL/HUGEINT); the z-score is a fixed chain of
    correctly-rounded IEEE ops, then round-6."""
    from .operators.spatial_stats import getis_ord_gi

    return getis_ord_gi(_mass_cells_df(spark, sf_dir))


def _kde_values_sql() -> str:
    from .operators.density import kde_offsets

    return ", ".join(f"({dx}, {dy}, {w})" for dx, dy, w in kde_offsets(2))


@register(
    "q_kde_density",
    _CTE + f""",
{_COUNT_CELLS_SQL.strip()},
o AS (SELECT * FROM (VALUES {_kde_values_sql()}) AS t(dx, dy, w))
SELECT t.gx, t.gy, CAST(sum(s.cnt * o.w) AS BIGINT) AS density
FROM c t JOIN o ON true
JOIN c s ON s.gx = t.gx + o.dx AND s.gy = t.gy + o.dy
GROUP BY t.gx, t.gy
""",
)
def q_kde_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kernel-density surface of the geocoded corpus over the 100 m grid
    (integer parabolic kernel, radius 2) — exact integers end-to-end, the
    smoothed "where is the corpus concentrated" surface.  The offsets
    VALUES list is rendered from the same kde_offsets() the operator
    explodes, so kernel and oracle cannot drift."""
    from .operators.density import kde_density

    return kde_density(_count_cells_df(spark, sf_dir), radius=2)


# min_pts for grid DBSCAN scales with corpus size (exact integer
# ceil(3n/100)): a FIXED threshold would flip every cell to core at 100x
# data, degenerating the core graph; this keeps the cluster structure —
# and the oracle's transitive closure — scale-free across SFs.
_DBSCAN_MIN_PTS_SQL = "greatest(3, (3 * count(*) + 99) // 100)"


@register(
    "q_dbscan_cells",
    f"""WITH RECURSIVE pts AS ({city.points_sql()}),
{_COUNT_CELLS_SQL.strip()},
mp AS (SELECT {_DBSCAN_MIN_PTS_SQL} AS v FROM pts),
r AS (SELECT a.dx, b.dy
      FROM (SELECT unnest([-1, 0, 1]) AS dx) a,
           (SELECT unnest([-1, 0, 1]) AS dy) b),
pop AS (
  SELECT t.gx, t.gy, t.cnt, sum(s.cnt) AS m
  FROM c t JOIN r ON true
  JOIN c s ON s.gx = t.gx + r.dx AND s.gy = t.gy + r.dy
  GROUP BY t.gx, t.gy, t.cnt
),
core AS (SELECT gx, gy, gy * {city.CELL_BASE} + gx AS cell
         FROM pop, mp WHERE m >= mp.v),
e AS (
  SELECT a.cell AS src, b.cell AS dst
  FROM core a JOIN r ON NOT (r.dx = 0 AND r.dy = 0)
  JOIN core b ON b.gx = a.gx + r.dx AND b.gy = a.gy + r.dy
),
reach(src, dst) AS (
  SELECT cell, cell FROM core
  UNION
  SELECT reach.src, e.dst FROM reach JOIN e ON e.src = reach.dst
),
lab AS (SELECT src AS cell, min(dst) AS cluster FROM reach GROUP BY src),
clab AS (SELECT core.gx, core.gy, lab.cluster
         FROM core JOIN lab ON lab.cell = core.cell),
bord AS (
  SELECT t.gx, t.gy, min(nl.cluster) AS cluster
  FROM c t
  LEFT JOIN core sc ON sc.gx = t.gx AND sc.gy = t.gy
  JOIN r ON NOT (r.dx = 0 AND r.dy = 0)
  JOIN clab nl ON nl.gx = t.gx + r.dx AND nl.gy = t.gy + r.dy
  WHERE sc.cell IS NULL
  GROUP BY t.gx, t.gy
)
SELECT t.gx, t.gy, t.cnt,
       CASE WHEN cl.cluster IS NOT NULL THEN 'core'
            WHEN b.cluster IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       coalesce(cl.cluster, b.cluster) AS cluster
FROM c t
LEFT JOIN clab cl ON cl.gx = t.gx AND cl.gy = t.gy
LEFT JOIN bord b ON b.gx = t.gx AND b.gy = t.gy
""",
)
def q_dbscan_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid DBSCAN over geocoded-document occupancy: core cells by 3x3
    weighted population >= min_pts (min_pts = exact ceil(3n/100), derived
    from the corpus size so the structure is scale-free), clusters =
    connected components over queen-adjacent core cells (dissolve's
    adaptive CC), borders take the min neighbouring label, rest is noise.
    The oracle resolves components with a recursive transitive closure —
    bounded because the scaled min_pts keeps the core graph at the dense
    urban-core scale, not the corpus scale."""
    from .operators.density import grid_dbscan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    min_pts = max(3, (3 * n + 99) // 100)
    return grid_dbscan(_count_cells_df(spark, sf_dir), min_pts=min_pts)


@register(
    "q_gini_exposure",
    _CTE + f""",
{_COUNT_CELLS_SQL.strip()},
s AS (SELECT count(*) AS n, sum(CAST(cnt AS HUGEINT)) AS total FROM c),
r AS (SELECT cnt, row_number() OVER (ORDER BY cnt) AS rn FROM c)
SELECT n AS n_cells, CAST(total AS BIGINT) AS total,
       round(CAST(sum((2 * CAST(rn AS HUGEINT) - n - 1) * cnt) AS DOUBLE)
             / nullif(CAST(n AS DOUBLE) * CAST(total AS DOUBLE), 0.0), 6) AS gini
FROM r, s GROUP BY n, total
""",
)
def q_gini_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of corpus mass across occupied 100 m cells —
    "how unequally is the geocoded corpus spread over space".  The
    oracle is the naive row_number window (tie order irrelevant: a tie
    group's coefficient sum depends only on which ranks it occupies);
    the engine uses the two-level distinct-value rank so no task ever
    sorts the full cell table — both numerators are the same exact
    integer, gini one division + round-6."""
    from .operators.spatial_stats import gini_exposure

    return gini_exposure(_count_cells_df(spark, sf_dir), val_col="cnt")


def _vario_values_sql() -> str:
    from .operators.spatial_stats import semivariogram_offsets

    return ", ".join(
        f"({dx}, {dy}, {dx * dx + dy * dy})" for dx, dy in semivariogram_offsets(3)
    )


@register(
    "q_semivariogram",
    _CTE + f""",
{_MASS_CELLS_SQL.strip()},
o AS (SELECT * FROM (VALUES {_vario_values_sql()}) AS t(dx, dy, d2))
SELECT o.d2, count(*) AS n_pairs,
       round(CAST(sum((CAST(a.v AS HUGEINT) - b.v)
                      * (CAST(a.v AS HUGEINT) - b.v)) AS DOUBLE)
             / (2.0 * CAST(count(*) AS DOUBLE))
             / 1000000000000.0, 6) AS gamma
FROM c a JOIN o ON true
JOIN c b ON b.gx = a.gx + o.dx AND b.gy = a.gy + o.dy
GROUP BY o.d2
""",
)
def q_semivariogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical semivariogram of per-cell exposure mass by squared lag
    distance (half-plane pairs counted once) — "over what range is
    exposure spatially structured", the geostatistics companion of
    q_morans_i.  Offsets VALUES rendered from the operator's own
    semivariogram_offsets(); squared differences exact HUGEINT/DECIMAL;
    gamma is de-scaled by unit^2=1e12 back to original NDVI-mass units
    BEFORE round-6 (round of a ~1e11 double is not engine-portable —
    see the operator docstring), then one division chain + round-6."""
    from .operators.spatial_stats import semivariogram

    return semivariogram(_mass_cells_df(spark, sf_dir), max_lag=3, unit=1e6)


# per-point (ungrouped) cell coords for the layout query
_POINT_CELLS_SQL = f"""
d AS (
  SELECT CAST(floor((x - {city.X0}) / {city.CELL}) AS BIGINT) AS gx,
         CAST(floor((y - {city.Y0}) / {city.CELL}) AS BIGINT) AS gy
  FROM pts
)
"""


def _zorder_oracle() -> str:
    from .engine.layout import zorder_sql

    return (
        _CTE
        + f""",
{_POINT_CELLS_SQL.strip()},
k AS (SELECT gx, gy, {zorder_sql('gx', 'gy')} AS zkey FROM d)
SELECT zkey >> 6 AS file_id, count(*) AS n_rows,
       count(DISTINCT gy * {city.CELL_BASE} + gx) AS n_cells,
       max(gx) - min(gx) + 1 AS gx_span, max(gy) - min(gy) + 1 AS gy_span,
       min(zkey) AS zmin, max(zkey) AS zmax
FROM k GROUP BY 1
"""
    )


@register("q_zorder_layout", None)  # generated oracle attached below
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) write-layout audit: assign every geocoded point
    to the fixed-width curve range ``zkey >> 6`` (the static-binning
    layout job — map-side only, no global sort) and report per-file
    locality (rows, distinct cells, bbox spans, curve range).  The
    oracle renders the identical bit-spread chain from the shared mask
    table (engine/layout.zorder_sql), so key and oracle cannot drift.
    At 100 TB this is the OPTIMIZE ZORDER shape: curve-clustered files
    make a 2-D cell-range scan touch O(k) files instead of O(k^2)."""
    from .engine.layout import zorder_layout_stats

    pts = city.points_df(spark, sf_dir)
    cells = pts.select(
        F.floor((F.col("x") - city.X0) / city.CELL).cast("long").alias("gx"),
        F.floor((F.col("y") - city.Y0) / city.CELL).cast("long").alias("gy"),
    )
    return zorder_layout_stats(cells, shift=6)


ORACLES["q_zorder_layout"] = _zorder_oracle()


_ZM_BBOX = (40, 59, 40, 59)  # 20x20-cell query range over the urban core
_ZM_SHIFT, _ZM_ROWS_PER_FILE = 6, 64


def _zonemap_oracle() -> str:
    from .engine.layout import zorder_sql

    qx0, qx1, qy0, qy1 = _ZM_BBOX
    return (
        _CTE
        + f""",
d AS (
  SELECT doc_id,
         CAST(floor((x - {city.X0}) / {city.CELL}) AS BIGINT) AS gx,
         CAST(floor((y - {city.Y0}) / {city.CELL}) AS BIGINT) AS gy
  FROM pts
),
k AS (
  SELECT doc_id, gx, gy,
         CASE WHEN gx BETWEEN {qx0} AND {qx1}
               AND gy BETWEEN {qy0} AND {qy1} THEN 1 ELSE 0 END AS m,
         {zorder_sql('gx', 'gy')} AS zkey
  FROM d
),
fa AS (SELECT doc_id // {_ZM_ROWS_PER_FILE} AS file_id, count(*) AS n_rows,
              sum(m) AS n_match, min(gx) AS x0, max(gx) AS x1,
              min(gy) AS y0, max(gy) AS y1
       FROM k GROUP BY 1),
fz AS (SELECT zkey >> {_ZM_SHIFT} AS file_id, count(*) AS n_rows,
              sum(m) AS n_match, min(gx) AS x0, max(gx) AS x1,
              min(gy) AS y0, max(gy) AS y1
       FROM k GROUP BY 1),
ta AS (SELECT *, CASE WHEN x0 <= {qx1} AND x1 >= {qx0}
                       AND y0 <= {qy1} AND y1 >= {qy0}
                      THEN 1 ELSE 0 END AS t FROM fa),
tz AS (SELECT *, CASE WHEN x0 <= {qx1} AND x1 >= {qx0}
                       AND y0 <= {qy1} AND y1 >= {qy0}
                      THEN 1 ELSE 0 END AS t FROM fz),
u AS (
  SELECT 'arrival' AS layout, CAST(count(*) AS BIGINT) AS n_files,
         CAST(sum(t) AS BIGINT) AS n_touched,
         CAST(sum(t * n_rows) AS BIGINT) AS rows_scanned,
         CAST(sum(n_match) AS BIGINT) AS rows_matched
  FROM ta
  UNION ALL
  SELECT 'zorder', CAST(count(*) AS BIGINT), CAST(sum(t) AS BIGINT),
         CAST(sum(t * n_rows) AS BIGINT), CAST(sum(n_match) AS BIGINT)
  FROM tz
)
SELECT layout, n_files, n_touched, rows_scanned, rows_matched,
       CASE WHEN rows_matched > 0
            THEN CAST(rows_scanned AS DOUBLE) / CAST(rows_matched AS DOUBLE)
       END AS read_amplification
FROM u
"""
    )


@register("q_zonemap_prune", None)  # generated oracle attached below
def q_zonemap_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map file-skipping audit: the SAME 20×20-cell range query
    against two write layouts — arrival order (doc_id // 64, the
    un-clustered ingest default) vs Morton-curve ranges (zkey >> 6,
    the OPTIMIZE ZORDER shape) — with per-file min/max of (gx, gy)
    standing in for parquet column statistics.  The read-amplification
    column (rows in touched files / rows actually matching) quantifies
    exactly what curve clustering buys a 100 TB scan; the oracle
    renders the same bit-spread key and interval tests."""
    from .engine.layout import zonemap_prune_stats

    pts = city.points_df(spark, sf_dir)
    cells = pts.select(
        "doc_id",
        F.floor((F.col("x") - city.X0) / city.CELL).cast("long").alias("gx"),
        F.floor((F.col("y") - city.Y0) / city.CELL).cast("long").alias("gy"),
    )
    return zonemap_prune_stats(
        cells, bbox=_ZM_BBOX, shift=_ZM_SHIFT,
        rows_per_file=_ZM_ROWS_PER_FILE,
    )


ORACLES["q_zonemap_prune"] = _zonemap_oracle()

# Bloom sizing: 2^17 bits / k=3 md5 slices.  At sf0.1 the reference side
# inserts ~1.5e5 positions (fill ~0.67, fp ~3%) — the gate intentionally
# spans near-empty (sf0.001, fp ~0) to well-loaded (sf0.1) filters.
_BLOOM_M = 1 << 17


def _bloom_oracle() -> str:
    from .functions.dedup import bloom_positions_sql

    p = bloom_positions_sql("text", _BLOOM_M, 3)
    return f"WITH {_CORPUS_SQL.strip()},\n" + f"""
ref AS (SELECT doc_id, text FROM corpus WHERE doc_id < 1000000),
qry AS (SELECT doc_id, text FROM corpus WHERE doc_id >= 1000000),
bits AS (
  SELECT DISTINCT bit FROM (
    SELECT {p[0]} AS bit FROM ref
    UNION ALL SELECT {p[1]} FROM ref
    UNION ALL SELECT {p[2]} FROM ref)
),
probes AS (
  SELECT doc_id, {p[0]} AS bit FROM qry
  UNION ALL SELECT doc_id, {p[1]} FROM qry
  UNION ALL SELECT doc_id, {p[2]} FROM qry
),
hits AS (SELECT probes.doc_id FROM probes JOIN bits USING (bit)
         GROUP BY probes.doc_id HAVING count(*) >= 3),
seen AS (SELECT DISTINCT q.doc_id FROM qry q JOIN ref r ON r.text = q.text)
SELECT q.doc_id, h.doc_id IS NOT NULL AS probably_seen,
       s.doc_id IS NOT NULL AS actually_seen
FROM qry q LEFT JOIN hits h ON h.doc_id = q.doc_id
LEFT JOIN seen s ON s.doc_id = q.doc_id
"""


@register("q_bloom_prefilter", None)  # generated oracle attached below
def q_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot Bloom pre-screen: the previous snapshot (original
    corpus docs) folds its content digests into a 2^17-bit Bloom filter;
    every new-snapshot doc (the injected exact/near clones) is flagged
    ``probably_seen`` (no false negatives) next to the ground-truth
    ``actually_seen`` exact-text match, so the gate hash also pins the
    false-positive pattern.  The filter travels as a DISTINCT-positions
    dim bounded by m_bits rows — broadcast-sized regardless of corpus
    scale (functions/dedup.bloom_prefilter)."""
    from .functions.dedup import bloom_prefilter

    corpus = _corpus_df(spark, sf_dir)
    ref = corpus.filter(F.col("doc_id") < 1000000)
    qry = corpus.filter(F.col("doc_id") >= 1000000)
    flags = bloom_prefilter(ref, qry, m_bits=_BLOOM_M, k=3)
    seen = qry.join(
        ref.select("text").distinct().withColumn("_s", F.lit(True)), "text", "left"
    ).select("doc_id", F.coalesce("_s", F.lit(False)).alias("actually_seen"))
    return flags.join(seen, "doc_id")


ORACLES["q_bloom_prefilter"] = _bloom_oracle()


# per-cell dominant document language (deterministic tiebreak: higher
# count first, then lexicographically smaller lang) — the categorical
# surface for the join-count statistics
_DOM_LANG_SQL = f"""
lc AS (
  SELECT CAST(floor((x - {city.X0}) / {city.CELL}) AS BIGINT) AS gx,
         CAST(floor((y - {city.Y0}) / {city.CELL}) AS BIGINT) AS gy,
         d.lang, count(*) AS lcnt
  FROM pts p JOIN documents d USING (doc_id)
  GROUP BY 1, 2, d.lang
),
dom AS (
  SELECT gx, gy, lang AS cat FROM lc
  QUALIFY row_number() OVER (PARTITION BY gx, gy ORDER BY lcnt DESC, lang) = 1
)
"""


def _dom_lang_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _DOM_LANG_SQL: [gx, gy, cat]."""
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    pts = city.points_df(spark, sf_dir).join(docs, "doc_id")
    lc = (
        pts.select(
            F.floor((F.col("x") - city.X0) / city.CELL).cast("long").alias("gx"),
            F.floor((F.col("y") - city.Y0) / city.CELL).cast("long").alias("gy"),
            "lang",
        )
        .groupBy("gx", "gy", "lang")
        .agg(F.count("*").alias("lcnt"))
    )
    w = Window.partitionBy("gx", "gy").orderBy(F.col("lcnt").desc(), "lang")
    return (
        lc.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("gx", "gy", F.col("lang").alias("cat"))
    )


@register(
    "q_join_counts",
    _CTE + f""",
{_DOM_LANG_SQL.strip()},
sh AS (SELECT gx + 1 AS gx, gy, cat FROM dom
       UNION ALL SELECT gx, gy + 1, cat FROM dom),
p AS (SELECT least(s.cat, d.cat) AS cat_a, greatest(s.cat, d.cat) AS cat_b
      FROM sh s JOIN dom d USING (gx, gy)),
obs AS (SELECT cat_a, cat_b, count(*) AS joins FROM p GROUP BY 1, 2),
t AS (SELECT cat, count(*) AS nc FROM dom GROUP BY 1),
g AS (SELECT count(*) AS n FROM dom),
j AS (SELECT count(*) AS jtot FROM p)
SELECT obs.cat_a, obs.cat_b, obs.joins,
       round(CAST(CASE WHEN obs.cat_a = obs.cat_b
                       THEN CAST(jtot AS HUGEINT) * ta.nc * (ta.nc - 1)
                       ELSE 2 * CAST(jtot AS HUGEINT) * ta.nc * tb.nc END
                  AS DOUBLE)
             / nullif(CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE), 0.0),
             6) AS expected
FROM obs
JOIN t ta ON ta.cat = obs.cat_a
JOIN t tb ON tb.cat = obs.cat_b, g, j
""",
)
def q_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-count statistics over the per-cell dominant document
    language — "do same-language regions clump in space?", the
    categorical autocorrelation complement of q_morans_i and the
    webtext x geospatial cross: observed rook-adjacent language pairs
    vs the nonfree-sampling expectation (exact-integer numerators, one
    division + round-6)."""
    from .operators.spatial_stats import join_counts

    return join_counts(_dom_lang_df(spark, sf_dir))


# quadtree threshold scales with corpus size (same reasoning as the
# DBSCAN min_pts): fixed T degenerates to all-finest at 100x data
_QT_T_SQL = "greatest(16, (count(*) + 63) // 64)"


@register(
    "q_adaptive_grid",
    _CTE + f""",
{_COUNT_CELLS_SQL.strip()},
k AS (SELECT gx, gy, cnt,
             gx >> 3 AS gx0, gy >> 3 AS gy0, gx >> 2 AS gx1, gy >> 2 AS gy1,
             gx >> 1 AS gx2, gy >> 1 AS gy2, gx AS gx3, gy AS gy3
      FROM c),
d0 AS (SELECT gx0, gy0, CAST(sum(cnt) AS BIGINT) AS c0 FROM k GROUP BY 1, 2),
d1 AS (SELECT gx1, gy1, CAST(sum(cnt) AS BIGINT) AS c1 FROM k GROUP BY 1, 2),
d2 AS (SELECT gx2, gy2, CAST(sum(cnt) AS BIGINT) AS c2 FROM k GROUP BY 1, 2),
d3 AS (SELECT gx3, gy3, CAST(sum(cnt) AS BIGINT) AS c3 FROM k GROUP BY 1, 2),
mp AS (SELECT {_QT_T_SQL} AS t FROM pts),
lv AS (
  SELECT k.*, c0, c1, c2, c3,
         CASE WHEN c0 <= t THEN 0 WHEN c1 <= t THEN 1
              WHEN c2 <= t THEN 2 ELSE 3 END AS level
  FROM k
  JOIN d0 USING (gx0, gy0) JOIN d1 USING (gx1, gy1)
  JOIN d2 USING (gx2, gy2) JOIN d3 USING (gx3, gy3), mp
)
SELECT level,
       CASE level WHEN 0 THEN gx0 WHEN 1 THEN gx1 WHEN 2 THEN gx2 ELSE gx3 END AS gxl,
       CASE level WHEN 0 THEN gy0 WHEN 1 THEN gy1 WHEN 2 THEN gy2 ELSE gy3 END AS gyl,
       max(CASE level WHEN 0 THEN c0 WHEN 1 THEN c1 WHEN 2 THEN c2 ELSE c3 END) AS n_docs
FROM lv GROUP BY 1, 2, 3
""",
)
def q_adaptive_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadtree adaptive re-grid of the geocoded corpus: every occupied
    100 m cell is assigned the coarsest ancestor (800/400/200/100 m)
    whose occupancy is <= T (T = exact max(16, ceil(n/64)), scaled to
    corpus size so the tree shape is SF-stable) — the index-side answer
    to urban-core skew: no adaptive cell is hot, so downstream joins
    partition evenly without salting."""
    from .operators.adaptive_grid import adaptive_cells

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    t = max(16, (n + 63) // 64)
    return adaptive_cells(_count_cells_df(spark, sf_dir), threshold=t, levels=4)


@register(
    "q_local_moran",
    _CTE + f""",
{_MASS_CELLS_SQL.strip()},
s AS (SELECT count(*) AS n, sum(CAST(v AS HUGEINT)) AS sv,
             sum(CAST(v AS HUGEINT) * v) AS svv FROM c),
o AS (SELECT * FROM (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS t(dx, dy)),
l AS (
  SELECT t.gx, t.gy, count(*) AS w_i, sum(CAST(nbr.v AS HUGEINT)) AS li
  FROM c t JOIN o ON true
  JOIN c nbr ON nbr.gx = t.gx + o.dx AND nbr.gy = t.gy + o.dy
  GROUP BY t.gx, t.gy
),
f AS (SELECT c.gx, c.gy, c.v, coalesce(l.w_i, 0) AS w_i,
             coalesce(l.li, 0) AS li
      FROM c LEFT JOIN l USING (gx, gy))
SELECT gx, gy, w_i,
       round(CAST((n * CAST(v AS HUGEINT) - sv) * (n * li - w_i * sv)
                  AS DOUBLE)
             / nullif(CAST(n * svv - sv * sv AS DOUBLE), 0.0), 6) AS local_i,
       (CASE WHEN n * CAST(v AS HUGEINT) - sv > 0 THEN 'H' ELSE 'L' END)
       || (CASE WHEN n * li - w_i * sv > 0 THEN 'H' ELSE 'L' END) AS quadrant
FROM f, s
""",
)
def q_local_moran(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local Moran's I (Anselin LISA) per 100 m cell over the exposure
    mass — "which cells are HH/LL clusters vs HL/LH outliers", the
    signed-cluster companion of q_getis_ord (Gi* ranks hot spots, LISA
    also exposes spatial outliers).  Exact-integer numerators, quadrant
    from exact sign tests, one division + round-6."""
    from .operators.spatial_stats import local_morans_i

    return local_morans_i(_mass_cells_df(spark, sf_dir))


@register(
    "q_bivariate_moran",
    _CTE + f""",
{_MASS_CELLS_SQL.strip()},
cc AS (SELECT gx, gy, count(*) AS cnt FROM d GROUP BY 1, 2),
m AS (SELECT c.gx, c.gy, c.v AS x, cc.cnt AS y FROM c JOIN cc USING (gx, gy)),
s2 AS (SELECT count(*) AS n, sum(CAST(x AS HUGEINT)) AS sx,
              sum(CAST(y AS HUGEINT)) AS sy,
              sum(CAST(x AS HUGEINT) * x) AS sxx,
              sum(CAST(y AS HUGEINT) * y) AS syy FROM m),
o AS (SELECT * FROM (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS t(dx, dy)),
pr AS (SELECT a.x AS ax, b.y AS yb
       FROM m a JOIN o ON true
       JOIN m b ON b.gx = a.gx + o.dx AND b.gy = a.gy + o.dy),
p2 AS (SELECT count(*) AS w,
              coalesce(sum(CAST(ax AS HUGEINT) * yb), 0) AS pxy,
              coalesce(sum(CAST(ax AS HUGEINT)), 0) AS sxp,
              coalesce(sum(CAST(yb AS HUGEINT)), 0) AS syp FROM pr)
SELECT n AS n_cells, w AS w_pairs,
       round(CAST(n * n * pxy - n * sy * sxp - n * sx * syp + w * sx * sy
                  AS DOUBLE)
             / nullif(CAST(w AS DOUBLE)
                      * sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                             * CAST(n * syy - sy * sy AS DOUBLE)), 0.0),
             6) AS morans_ixy
FROM s2, p2
""",
)
def q_bivariate_moran(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate (cross) Moran's I between greenness-exposure mass and
    document density on adjacent cells — "do corpus-dense cells sit
    NEXT TO green-heavy cells?", the exposure-equity cross statistic
    tying the webtext corpus to the geospatial surface.  Directed
    pairs; exact-integer A/Bx/By, one sqrt-multiply-divide chain +
    round-6."""
    from .operators.spatial_stats import bivariate_morans_i

    mass = _mass_cells_df(spark, sf_dir)
    cnt = _count_cells_df(spark, sf_dir)
    cells = mass.join(cnt, ["gx", "gy"]).select(
        "gx", "gy", F.col("v").alias("x"), F.col("cnt").alias("y")
    )
    return bivariate_morans_i(cells)


_BLOOM_STREAM_M = 1 << 15


def _bloom_stream_oracle() -> str:
    from .functions.dedup import bloom_positions_sql

    p = bloom_positions_sql("key", _BLOOM_STREAM_M, 3)
    return f"""
WITH d AS (SELECT doc_id, doc_id % 3 AS lab,
                  array_to_string(list_slice(string_split(text, ' '), 1, 3),
                                  ' ') AS key
           FROM documents),
pb AS (
  SELECT doc_id, lab, {p[0]} AS bit FROM d
  UNION ALL SELECT doc_id, lab, {p[1]} FROM d
  UNION ALL SELECT doc_id, lab, {p[2]} FROM d
),
ins AS (SELECT DISTINCT lab, bit FROM pb),
hit AS (SELECT p.doc_id, count(*) AS c
        FROM pb p
        WHERE EXISTS (SELECT 1 FROM ins i
                      WHERE i.bit = p.bit AND i.lab < p.lab)
        GROUP BY p.doc_id)
SELECT d.doc_id, d.lab, coalesce(h.c, 0) >= 3 AS probably_seen
FROM d LEFT JOIN hit h ON h.doc_id = d.doc_id
"""


@register("q_bloom_stream", None)  # generated oracle attached below
def q_bloom_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING cross-snapshot Bloom pre-screen: documents labelled
    into three crawl snapshots (lab = doc_id % 3) stream through the
    sharded stateful filter (streaming/bloom_dedup, GroupState per bit
    shard); each doc's 3-token content prefix is flagged
    ``probably_seen`` iff all k digest bits were set by a STRICTLY
    EARLIER snapshot.  Unlike the other stateful streaming entries this
    one has a CLOSED-FORM SQL oracle, because the semantics are defined
    on the monotone snapshot label, not on micro-batch boundaries —
    the per-shard fold makes the output invariant to how the stream is
    chopped.  Cross-RUN checkpoint resume (state surviving a second
    AvailableNow drain) is pytest-covered."""
    import atexit
    import os
    import shutil
    import tempfile

    from .streaming.bloom_dedup import run_bloom_stream
    from .streaming.stage import drain_shuffle_partitions, stage_documents_bloom

    base = os.path.join(tempfile.gettempdir(), f"q_bloom_stream_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    src, sink, ckpt = (os.path.join(base, d) for d in ("src", "sink", "ckpt"))
    stage_documents_bloom(sf_dir, src, mod=3)
    key = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 3), " ")
    with drain_shuffle_partitions(spark):
        run_bloom_stream(
            spark, src, sink, ckpt,
            key_expr=key,
            schema="doc_id long, lab long, text string",
            m_bits=_BLOOM_STREAM_M,
            k=3,
        )
    flags = spark.read.parquet(sink)
    return flags.groupBy("doc_id", "lab").agg(
        (F.count(F.when(F.col("prior"), 1)) >= 3).alias("probably_seen")
    )


ORACLES["q_bloom_stream"] = _bloom_stream_oracle()


@register(
    "q_gearys_c",
    _CTE + f""",
{_MASS_CELLS_SQL.strip()},
s AS (SELECT count(*) AS n, sum(CAST(v AS HUGEINT)) AS sv,
             sum(CAST(v AS HUGEINT) * v) AS svv FROM c),
o AS (SELECT * FROM (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS t(dx, dy)),
p AS (SELECT count(*) AS w,
             coalesce(sum((CAST(a.v AS HUGEINT) - b.v)
                          * (CAST(a.v AS HUGEINT) - b.v)), 0) AS p2
      FROM c a JOIN o ON true
      JOIN c b ON b.gx = a.gx + o.dx AND b.gy = a.gy + o.dy)
SELECT n AS n_cells, w AS w_pairs,
       CAST((n - 1) * n * p2 AS DOUBLE)
       / nullif(CAST(2 * w * (n * svv - sv * sv) AS DOUBLE), 0.0) AS gearys_c
FROM s, p
""",
)
def q_gearys_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geary's C contiguity ratio of the per-cell exposure mass — the
    difference-based global autocorrelation twin of q_morans_i (C < 1
    = clustered; like morans_i, exact integers until ONE double
    division, no rounding needed)."""
    from .operators.spatial_stats import gearys_c

    return gearys_c(_mass_cells_df(spark, sf_dir))


@register(
    "q_general_g",
    _CTE + f""",
{_COUNT_CELLS_SQL.strip()},
s AS (SELECT count(*) AS n, sum(CAST(cnt AS HUGEINT)) AS sv,
             sum(CAST(cnt AS HUGEINT) * cnt) AS svv FROM c),
o AS (SELECT * FROM (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS t(dx, dy)),
p AS (SELECT count(*) AS w,
             coalesce(sum(CAST(a.cnt AS HUGEINT) * b.cnt), 0) AS pp
      FROM c a JOIN o ON true
      JOIN c b ON b.gx = a.gx + o.dx AND b.gy = a.gy + o.dy)
SELECT n AS n_cells, w AS w_pairs,
       round(CAST(pp AS DOUBLE)
             / nullif(CAST(sv * sv - svv AS DOUBLE), 0.0), 6) AS general_g,
       round(CAST(w AS DOUBLE)
             / nullif(CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE), 0.0),
             6) AS expected_g
FROM s, p
""",
)
def q_general_g(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord General G of per-cell document counts (non-negative by
    construction) vs its CSR expectation W/(n(n-1)) — "do HIGH-density
    cells concentrate?", the global yes/no that q_getis_ord drills into
    per cell.  Exact-integer ratios, one division + round-6 each."""
    from .operators.spatial_stats import general_g

    return general_g(_count_cells_df(spark, sf_dir), val_col="cnt")


@register(
    "q_areal_interp",
    _CTE + f""",
{_MASS_CELLS_SQL.strip()},
cover AS (
  SELECT g.gs_id AS tid, g.minx, g.miny, g.maxx, g.maxy, gxs.gx, gys.gy
  FROM greens g,
       LATERAL (SELECT unnest(generate_series(
                  CAST(floor((g.minx - {city.X0}) / {city.CELL}) AS BIGINT),
                  CAST(floor((g.maxx - {city.X0}) / {city.CELL}) AS BIGINT)))
                AS gx) gxs,
       LATERAL (SELECT unnest(generate_series(
                  CAST(floor((g.miny - {city.Y0}) / {city.CELL}) AS BIGINT),
                  CAST(floor((g.maxy - {city.Y0}) / {city.CELL}) AS BIGINT)))
                AS gy) gys
),
w AS (
  SELECT tid, gx, gy,
         CAST(round((least(maxx, {city.X0} + gx * {city.CELL} + {city.CELL})
                     - greatest(minx, {city.X0} + gx * {city.CELL}))
                    * (least(maxy, {city.Y0} + gy * {city.CELL} + {city.CELL})
                       - greatest(miny, {city.Y0} + gy * {city.CELL}))
                    * 100.0) AS BIGINT) AS w
  FROM cover
),
j AS (SELECT w.tid, w.w, c.v FROM w JOIN c USING (gx, gy) WHERE w.w > 0)
SELECT tid AS gs_id, count(*) AS n_cells,
       round(CAST(sum(CAST(v AS HUGEINT) * w) AS DOUBLE)
             / 1000000000000.0, 6) AS transferred
FROM j GROUP BY tid
""",
)
def q_areal_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Areal interpolation of the per-cell exposure mass onto the
    greenspace rectangles — zone-to-zone transfer with QUANTIZED
    overlap micro-weights (w = round(frac*1e6)) so the transfer sum is
    an exact order-free integer; result reported in original NDVI-mass
    units (out_scale=1e6).  The cell-edge expressions are the identical
    IEEE chain in both engines (X0 + gx*CELL + CELL — never
    (gx+1)*CELL, which can differ in the last ULP)."""
    from .operators.areal import areal_interpolate

    return areal_interpolate(
        _mass_cells_df(spark, sf_dir),
        city.greenspace_df(spark),
        cell_size=city.CELL,
        origin_x=city.X0,
        origin_y=city.Y0,
        id_col="gs_id",
        val_col="v",
        out_scale=1e6,
    )


def _det3_sql(a11, a12, a13, a21, a22, a23, a31, a32, a33):
    """Cramer cofactor expansion — the SQL twin of slx_regression's
    det3, same fixed form (exact integers, so order is immaterial)."""
    return (
        f"({a11} * ({a22} * {a33} - {a23} * {a32}) "
        f"- {a12} * ({a21} * {a33} - {a23} * {a31}) "
        f"+ {a13} * ({a21} * {a32} - {a22} * {a31}))"
    )


_SLX_D = _det3_sql("n", "sx", "sz", "sx", "sxx", "sxz", "sz", "sxz", "szz")
_SLX_D0 = _det3_sql("sy", "sx", "sz", "sxy", "sxx", "sxz", "szy", "sxz", "szz")
_SLX_D1 = _det3_sql("n", "sy", "sz", "sx", "sxy", "sxz", "sz", "szy", "szz")
_SLX_D2 = _det3_sql("n", "sx", "sy", "sx", "sxx", "sxy", "sz", "sxz", "szy")


@register(
    "q_slx_regression",
    _CTE + f""",
{_MASS_CELLS_SQL.strip()},
cc AS (SELECT gx, gy, count(*) AS cnt FROM d GROUP BY 1, 2),
m AS (SELECT c.gx, c.gy, c.v AS y, cc.cnt AS x FROM c JOIN cc USING (gx, gy)),
o AS (SELECT * FROM (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS t(dx, dy)),
lg AS (SELECT t.gx, t.gy, sum(CAST(b.x AS HUGEINT)) AS z
       FROM m t JOIN o ON true
       JOIN m b ON b.gx = t.gx + o.dx AND b.gy = t.gy + o.dy
       GROUP BY t.gx, t.gy),
f AS (SELECT m.y, m.x, coalesce(lg.z, 0) AS z FROM m LEFT JOIN lg USING (gx, gy)),
s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(z AS HUGEINT)) AS sz,
             sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(z AS HUGEINT) * z) AS szz,
             sum(CAST(x AS HUGEINT) * z) AS sxz,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(z AS HUGEINT) * y) AS szy FROM f)
SELECT CAST(n AS BIGINT) AS n_cells,
       round(CAST({_SLX_D0} AS DOUBLE)
             / nullif(CAST({_SLX_D} AS DOUBLE), 0.0), 6) AS b0,
       round(CAST({_SLX_D1} AS DOUBLE)
             / nullif(CAST({_SLX_D} AS DOUBLE), 0.0), 6) AS b1,
       round(CAST({_SLX_D2} AS DOUBLE)
             / nullif(CAST({_SLX_D} AS DOUBLE), 0.0), 6) AS b2
FROM s
""",
)
def q_slx_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLX spatial regression of per-cell exposure mass on document
    count AND rook-lagged neighbour count — "after the cell's own
    density, does the neighbourhood's density predict exposure?".  The
    whole fit is distributed exact arithmetic: 9 DECIMAL/HUGEINT sums,
    Cramer determinants as integer polynomials, one double division +
    round-6 per coefficient — no iterative solver, no FP summation
    order anywhere."""
    from .operators.spatial_stats import slx_regression

    mass = _mass_cells_df(spark, sf_dir)
    cnt = _count_cells_df(spark, sf_dir)
    cells = mass.join(cnt, ["gx", "gy"]).select(
        "gx", "gy", F.col("v").alias("y"), F.col("cnt").alias("x")
    )
    return slx_regression(cells)


@register(
    "q_ripleys_k",
    _CTE + """,
pr AS (
  SELECT (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
  FROM pts a JOIN pts b
    ON b.doc_id != a.doc_id
   AND b.x BETWEEN a.x - 300 AND a.x + 300
   AND b.y BETWEEN a.y - 300 AND a.y + 300
),
s AS (SELECT CAST(unnest([100, 200, 300]) AS DOUBLE) AS r),
n AS (SELECT count(*) AS n FROM pts),
cr AS (SELECT s.r, count(*) FILTER (WHERE pr.d2 <= s.r * s.r) AS n_pairs
       FROM s JOIN pr ON true GROUP BY s.r)
SELECT r, n_pairs,
       round(100.0 * CAST(n_pairs AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)), 6) AS k_hat,
       round(sqrt((100.0 * CAST(n_pairs AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                  / 3.141592653589793) * 1000.0, 6) AS l_hat
FROM cr, n
""",
)
def q_ripleys_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ripley's K / L of the geocoded corpus at r = 100/200/300 m —
    "is the corpus more clumped than CSR at radius r" (it is: 60% of
    points sit in the 1 km urban core), the point-pattern complement of
    q_morans_i / q_semivariogram.  area passed in km^2 (city = 100) so
    k_hat stays O(10) and round-6 is engine-portable; the oracle's
    banded self-join (DuckDB IEJoin) mirrors the engine's bounded cell
    k-ring equi-join pair-for-pair."""
    from .operators.spatial_stats import ripleys_k

    return ripleys_k(
        city.points_df(spark, sf_dir),
        radii=[100.0, 200.0, 300.0],
        area=100.0,
        cell_size=city.CELL,
    )


# ---------------------------------------------------------------------------
# q_2sfca — two-step floating catchment area accessibility
# ---------------------------------------------------------------------------

_FCA_R = 300.0
_FCA_MIN_AREA = 400.0


@register(
    "q_2sfca",
    _CTE + f""",
cand AS (
  SELECT p.doc_id, g.gs_id, g.area
  FROM pts p JOIN greens g
    ON g.area >= {_FCA_MIN_AREA}
   AND (g.cx - p.x) * (g.cx - p.x) + (g.cy - p.y) * (g.cy - p.y)
       <= {_FCA_R * _FCA_R}
),
dem AS (SELECT doc_id, gs_id, area,
               count(*) OVER (PARTITION BY gs_id) AS dj
        FROM cand),
rq AS (SELECT doc_id, CAST(round(area * 1000000.0 / dj) AS BIGINT) AS rq
       FROM dem),
sc AS (SELECT doc_id, sum(rq) AS s FROM rq GROUP BY doc_id)
SELECT p.doc_id,
       round(coalesce(CAST(s AS DOUBLE), 0.0) / 1000000.0, 6) AS fca_score
FROM (SELECT DISTINCT doc_id FROM pts) p LEFT JOIN sc USING (doc_id)
""",
)
def q_2sfca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step floating catchment area (Luo & Wang 2003) over the
    geocoded corpus: greenspace supply (area) rationed by catchment
    demand, then summed per point — the supply/demand accessibility
    index complementing q_accessibility's distance-to-nearest
    (reference semantics: accessibility.py:24-322 measures distance
    only; 2SFCA is the standard congestion-aware extension).  R_j is
    quantized to an integer micro-ratio so the per-point sum is exact
    in any order; demand counts are a window over the SAME candidate
    pair frame (single evaluation, no join-back)."""
    from .operators.accessibility import two_step_fca

    return two_step_fca(
        city.points_df(spark, sf_dir),
        city.greenspace_df(spark),
        radius=_FCA_R,
        min_area=_FCA_MIN_AREA,
        id_col="doc_id",
    )


# ---------------------------------------------------------------------------
# q_idw_surface — inverse-distance-weighted interpolation at centroids
# ---------------------------------------------------------------------------

_IDW_R = 250.0


@register(
    "q_idw_surface",
    _CTE + f""",
{_MASS_CELLS_SQL.strip()},
pr AS (
  SELECT g.gs_id,
         (g.cx - ({city.X0} + gx * {city.CELL} + {city.CELL / 2.0}))
         * (g.cx - ({city.X0} + gx * {city.CELL} + {city.CELL / 2.0}))
         + (g.cy - ({city.Y0} + gy * {city.CELL} + {city.CELL / 2.0}))
         * (g.cy - ({city.Y0} + gy * {city.CELL} + {city.CELL / 2.0})) AS d2,
         c.v
  FROM greens g JOIN c ON true
),
f AS (SELECT gs_id, d2, v FROM pr WHERE d2 <= {_IDW_R * _IDW_R}),
wq AS (SELECT gs_id,
              CAST(CASE WHEN d2 = 0.0 THEN 1000000000000.0
                   ELSE least(round(1000000000.0 / d2), 1000000000000.0)
                   END AS BIGINT) AS wq,
              v
       FROM f),
a AS (SELECT gs_id, count(*) AS n_samples,
             sum(CAST(wq AS HUGEINT) * v) AS num,
             sum(CAST(wq AS HUGEINT)) AS den
      FROM wq GROUP BY gs_id)
SELECT g.gs_id,
       coalesce(a.n_samples, 0) AS n_samples,
       round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 1000000.0, 6) AS idw_v
FROM gs_ids g LEFT JOIN a USING (gs_id)
""",
)
def q_idw_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDW (Shepard p=2) interpolation of the per-cell exposure mass at
    the 80 greenspace centroids, radius-bounded — the deterministic
    interpolation complement of q_semivariogram (kriging's FP solve is
    not engine-portable; quantized-weight IDW is).  Weights are
    integer-quantized so numerator/denominator are exact
    DECIMAL/HUGEINT sums; out_scale=1e6 de-scales the micro-NDVI mass
    before round-6 per the scale-audit rule."""
    from .operators.areal import idw_interpolate

    return idw_interpolate(
        _mass_cells_df(spark, sf_dir),
        city.greenspace_df(spark),
        radius=_IDW_R,
        cell_size=city.CELL,
        origin_x=city.X0,
        origin_y=city.Y0,
        id_col="gs_id",
        val_col="v",
        out_scale=1e6,
    )


# ---------------------------------------------------------------------------
# q_flesch — Flesch reading-ease readability scoring
# ---------------------------------------------------------------------------


def _flesch_sql() -> str:
    from .functions.text import (
        FLESCH_SENT_RE,
        FLESCH_SUFFIXES,
        FLESCH_SYLL_RE,
        FLESCH_WORD_RE,
    )

    suffix = (
        "CASE doc_id % 3 "
        + " ".join(f"WHEN {i} THEN '{s}'" for i, s in enumerate(FLESCH_SUFFIXES[:-1]))
        + f" ELSE '{FLESCH_SUFFIXES[-1]}' END"
    )
    return f"""
WITH v AS (SELECT doc_id, text || {suffix} AS t FROM documents),
n AS (SELECT doc_id,
             len(regexp_extract_all(t, '{FLESCH_WORD_RE}')) AS n_words,
             greatest(len(regexp_extract_all(t, '{FLESCH_SENT_RE}')), 1) AS n_sents,
             len(regexp_extract_all(t, '{FLESCH_SYLL_RE}')) AS n_sylls
      FROM v)
SELECT doc_id, n_words, n_sents, n_sylls,
       round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
             - 84.6 * (CAST(n_sylls AS DOUBLE) / nullif(n_words, 0)), 6) AS flesch
FROM n
"""


@register("q_flesch", None)  # generated oracle attached below
def q_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease over the corpus with doc_id-planted sentence
    punctuation (the fixture text carries none) — the stock
    readability quality signal.  Three regexp_counts per doc, pure
    codegen; regex classes shared with the oracle generator."""
    from .functions.text import FLESCH_SUFFIXES, flesch_reading_ease

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    suffix = (
        F.when(did % 3 == 0, F.lit(FLESCH_SUFFIXES[0]))
        .when(did % 3 == 1, F.lit(FLESCH_SUFFIXES[1]))
        .otherwise(F.lit(FLESCH_SUFFIXES[2]))
    )
    v = docs.select("doc_id", F.concat(F.col("text"), suffix).alias("text"))
    return flesch_reading_ease(v)


ORACLES["q_flesch"] = _flesch_sql()


# ---------------------------------------------------------------------------
# q_bpe_pairs — one BPE-training merge round (top adjacent char pairs)
# ---------------------------------------------------------------------------

_BPE_PAIR_TOP = 20


@register(
    "q_bpe_pairs",
    f"""
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
wf AS (SELECT word, count(*) AS wf FROM w WHERE word != '' GROUP BY word),
p AS (
  SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, wf
  FROM wf, LATERAL (SELECT unnest(generate_series(1, length(word) - 1)) AS i) t
  WHERE length(word) >= 2
),
a AS (SELECT pair, CAST(sum(wf) AS BIGINT) AS cnt FROM p GROUP BY pair)
SELECT pair, cnt FROM a ORDER BY cnt DESC, pair ASC LIMIT {_BPE_PAIR_TOP}
""",
)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed BPE-training merge round: corpus word counts
    (map-side-combinable), then adjacent-pair extraction over the
    VOCABULARY — bounded by distinct words, not corpus size — and the
    top-20 pair cut under a total order (cnt desc, pair asc)."""
    from .functions.text import bpe_pair_counts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bpe_pair_counts(docs, top_n=_BPE_PAIR_TOP)


# ---------------------------------------------------------------------------
# q_compaction_plan — small-file binpack planning over a file manifest
# ---------------------------------------------------------------------------

_COMPACT_TARGET = 4000.0
_COMPACT_SHARDS = 16


@register(
    "q_compaction_plan",
    f"""
WITH files AS (
  SELECT source, doc_id % {_COMPACT_SHARDS} AS file_id,
         CAST(sum(n_chars) AS BIGINT) AS bytes
  FROM documents GROUP BY source, doc_id % {_COMPACT_SHARDS}
),
b AS (
  SELECT source, file_id, bytes,
         CAST(floor(CAST(coalesce(sum(bytes) OVER (
                PARTITION BY source ORDER BY file_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
              / {_COMPACT_TARGET}) AS BIGINT) AS bin_id
  FROM files)
SELECT source, bin_id, CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(bytes) AS BIGINT) AS bin_bytes,
       min(file_id) AS first_file, max(file_id) AS last_file
FROM b GROUP BY source, bin_id
""",
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-binpack-style compaction plan over a synthetic file
    manifest (one file per (source, doc_id%16) shard, bytes = exact
    n_chars sum): bin = floor(exclusive-cumsum / target) within each
    table partition, straddling files stay in their starting bin —
    the FileScan-coalescer rule, closed-form, no greedy loop."""
    from .engine.compaction import compaction_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    files = (
        docs.groupBy("source", (F.col("doc_id") % _COMPACT_SHARDS).alias("file_id"))
        .agg(F.sum("n_chars").alias("bytes"))
    )
    return compaction_plan(
        files, target_bytes=_COMPACT_TARGET, partition_col="source"
    )


# ---------------------------------------------------------------------------
# q_snapshot_diff — CDC between two synthesized crawl snapshots
# ---------------------------------------------------------------------------

_CDC_UPDATE_SUFFIX = " updated v2"


@register(
    "q_snapshot_diff",
    f"""
WITH s1 AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 7 != 0),
s2 AS (SELECT doc_id,
              md5(CASE WHEN doc_id % 5 = 0 THEN text || '{_CDC_UPDATE_SUFFIX}'
                       ELSE text END) AS h
       FROM documents WHERE doc_id % 11 != 0),
j AS (SELECT coalesce(s1.doc_id, s2.doc_id) AS doc_id, s1.h AS oh, s2.h AS nh
      FROM s1 FULL OUTER JOIN s2 ON s1.doc_id = s2.doc_id),
st AS (SELECT doc_id,
              CASE WHEN oh IS NULL THEN 'added'
                   WHEN nh IS NULL THEN 'deleted'
                   WHEN oh != nh THEN 'updated'
                   ELSE 'unchanged' END AS status,
              nh AS new_hash
       FROM j)
SELECT doc_id, status, new_hash FROM st WHERE status != 'unchanged'
""",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two synthesized recrawl snapshots
    (old = docs except id%7==0, new = docs except id%11==0 with id%5==0
    contents rewritten): added/deleted/updated rows from one hash-first
    full-outer join — payload text never crosses the shuffle, only
    md5 digests (the CDX-new-capture / Iceberg-changelog shape)."""
    from .engine.cdc import snapshot_diff

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    old = docs.filter(did % 7 != 0).select("doc_id", "text")
    new = docs.filter(did % 11 != 0).select(
        "doc_id",
        F.when(did % 5 == 0, F.concat(F.col("text"), F.lit(_CDC_UPDATE_SUFFIX)))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return snapshot_diff(old, new)


# ---------------------------------------------------------------------------
# q_temperature_mix — alpha-temperature multilingual mixture weights
# ---------------------------------------------------------------------------

_TMIX_ALPHA = 0.3
_TMIX_BUDGET = 0.5


@register(
    "q_temperature_mix",
    f"""
WITH per AS (SELECT lang AS grp, count(*) AS n_docs FROM documents GROUP BY lang),
t AS (SELECT grp, n_docs,
             CAST(round(pow(CAST(n_docs AS DOUBLE), {_TMIX_ALPHA}) * 1000000.0)
                  AS BIGINT) AS tq
      FROM per),
s AS (SELECT grp, n_docs, tq,
             sum(tq) OVER () AS tsum, sum(n_docs) OVER () AS total
      FROM t)
SELECT grp AS lang, CAST(n_docs AS BIGINT) AS n_docs,
       round(CAST(tq AS DOUBLE) / CAST(tsum AS DOUBLE), 6) AS mix_weight,
       round(least(1.0, CAST(tq AS DOUBLE) / CAST(tsum AS DOUBLE)
             * CAST(floor(CAST(total AS DOUBLE) * {_TMIX_BUDGET}) AS DOUBLE)
             / n_docs), 6) AS sample_rate
FROM s
""",
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based multilingual mixture (p_l = n_l^0.3 / sum,
    the mBERT/XLM-R exponential-smoothing rebalance) with sample rates
    realizing the mixture against a half-corpus budget — observed-count
    counterpart of q_mix_allocation's explicit target table.  The
    temperature terms are quantized BIGINTs so the normalizer is an
    exact order-free sum; pow runs once per language, not per doc."""
    from .functions.sampling import temperature_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return temperature_mix(
        docs, alpha=_TMIX_ALPHA, budget_factor=_TMIX_BUDGET, group_col="lang"
    )


# ---------------------------------------------------------------------------
# q_lang_entropy — per-cell Shannon language diversity (webtext × geo)
# ---------------------------------------------------------------------------

_LANGS = ("de", "en", "es", "fr", "zh")


def _lang_entropy_oracle() -> str:
    pivots = ",\n             ".join(
        f"sum(CASE WHEN lang = '{c}' THEN lcnt ELSE 0 END) AS n{i}"
        for i, c in enumerate(_LANGS)
    )
    terms = " + ".join(
        f"(CASE WHEN n{i} = 0 THEN 0.0 ELSE (CAST(n{i} AS DOUBLE) / CAST(n_docs AS DOUBLE))"
        f" * ln(CAST(n{i} AS DOUBLE) / CAST(n_docs AS DOUBLE)) END)"
        for i in range(len(_LANGS))
    )
    rich = " + ".join(
        f"(CASE WHEN n{i} > 0 THEN 1 ELSE 0 END)" for i in range(len(_LANGS))
    )
    return (
        _CTE
        + f""",
lc AS (
  SELECT CAST(floor((x - {city.X0}) / {city.CELL}) AS BIGINT) AS gx,
         CAST(floor((y - {city.Y0}) / {city.CELL}) AS BIGINT) AS gy,
         d.lang, count(*) AS lcnt
  FROM pts p JOIN documents d USING (doc_id)
  GROUP BY 1, 2, d.lang
),
g AS (SELECT gx, gy, sum(lcnt) AS n_docs,
             {pivots}
      FROM lc GROUP BY gx, gy)
SELECT gx, gy, CAST(n_docs AS BIGINT) AS n_docs,
       CAST({rich} AS BIGINT) AS richness,
       round(-({terms}) + 0.0, 6) AS entropy
FROM g
"""
    )


@register("q_lang_entropy", None)  # generated oracle attached below
def q_lang_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon language diversity per 100 m cell — "how multilingual is
    this neighbourhood's corpus" (the diversity complement of
    q_join_counts' dominant-language adjacency).  The category set is a
    fixed ordered tuple shared with the oracle generator, so the
    entropy sum is a fixed-length IEEE chain, not a data-ordered
    aggregate."""
    from .operators.spatial_stats import grid_category_entropy

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    pts = city.points_df(spark, sf_dir).join(docs, "doc_id")
    lc = (
        pts.select(
            F.floor((F.col("x") - city.X0) / city.CELL).cast("long").alias("gx"),
            F.floor((F.col("y") - city.Y0) / city.CELL).cast("long").alias("gy"),
            "lang",
        )
        .groupBy("gx", "gy", "lang")
        .agg(F.count(F.lit(1)).alias("lcnt"))
    )
    return grid_category_entropy(lc, _LANGS, cat_col="lang", count_col="lcnt")


ORACLES["q_lang_entropy"] = _lang_entropy_oracle()


# ---------------------------------------------------------------------------
# q_e2sfca — Gaussian-decay enhanced two-step floating catchment area
# ---------------------------------------------------------------------------

_E2_SIGMA = 150.0


@register(
    "q_e2sfca",
    _CTE + f""",
cand AS (
  SELECT p.doc_id, g.gs_id, g.area,
         (g.cx - p.x) * (g.cx - p.x) + (g.cy - p.y) * (g.cy - p.y) AS d2
  FROM pts p JOIN greens g
    ON g.area >= {_FCA_MIN_AREA}
   AND (g.cx - p.x) * (g.cx - p.x) + (g.cy - p.y) * (g.cy - p.y)
       <= {_FCA_R * _FCA_R}
),
wp AS (SELECT doc_id, gs_id, area,
              CAST(round(exp(-d2 / {2.0 * _E2_SIGMA**2}) * 1000000.0) AS BIGINT)
                AS wq
       FROM cand),
wf AS (SELECT * FROM wp WHERE wq > 0),
dm AS (SELECT doc_id, gs_id, wq, area,
              sum(wq) OVER (PARTITION BY gs_id) AS dj
       FROM wf),
rr AS (SELECT doc_id, wq,
              CAST(round(area * 1000000000000.0 / CAST(dj AS DOUBLE)) AS BIGINT)
                AS rq
       FROM dm),
sc AS (SELECT doc_id, sum(CAST(wq AS HUGEINT) * rq) AS s FROM rr GROUP BY doc_id)
SELECT p.doc_id,
       round(coalesce(CAST(s AS DOUBLE), 0.0) / 1000000000000.0, 6) AS fca_score
FROM (SELECT DISTINCT doc_id FROM pts) p LEFT JOIN sc USING (doc_id)
""",
)
def q_e2sfca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enhanced 2SFCA (Luo & Qi 2009): Gaussian distance decay inside
    the catchment instead of q_2sfca's binary membership — nearer
    greenspace counts more, both in the demand a greenspace sees and
    the supply a point receives.  Weights and ratios are quantized
    BIGINTs so every aggregate is an exact order-free sum; exp runs in
    one mirrored IEEE chain per pair."""
    from .operators.accessibility import two_step_fca_decay

    return two_step_fca_decay(
        city.points_df(spark, sf_dir),
        city.greenspace_df(spark),
        radius=_FCA_R,
        sigma=_E2_SIGMA,
        min_area=_FCA_MIN_AREA,
        id_col="doc_id",
    )


# ---------------------------------------------------------------------------
# q_postings — inverted-index build (df / tf / capped posting list)
# ---------------------------------------------------------------------------

_POSTING_CAP = 15


@register(
    "q_postings",
    f"""
WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
pairs AS (SELECT term, doc_id, count(*) AS tf FROM tk WHERE term != ''
          GROUP BY term, doc_id),
r AS (SELECT term, doc_id, tf,
             row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rk
      FROM pairs)
SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS tf_total,
       string_agg(CASE WHEN rk <= {_POSTING_CAP} THEN CAST(doc_id AS VARCHAR) END,
                  ',' ORDER BY doc_id) AS posting
FROM r GROUP BY term
""",
)
def q_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build over the corpus: per-term document
    frequency, total term frequency, and a capped ascending posting
    list — the index-side complement of q_bm25's scoring.  The window
    and the final agg share the term partitioning (one exchange), and
    the cap bounds hot-term reducer state."""
    from .functions.retrieval import build_postings

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_postings(docs, cap=_POSTING_CAP)


# ---------------------------------------------------------------------------
# q_focal_mean — 3x3 focal statistics over tiles with halo exchange
# ---------------------------------------------------------------------------


def _focal_oracle() -> str:
    """Closed-form focal oracle: the NDVI raster is a formula, so each
    pixel's 3x3 focal sum is nine guarded formula terms — no join."""
    npx = city.NPX
    vterm = (
        "CAST(round(("
        + city.NDVI_SQL.format(
            px_x=f"{city.X0} + ((ix + {{dx}}) + 0.5) * {city.RES}",
            px_y=f"{city.Y0} + ((iy + {{dy}}) + 0.5) * {city.RES}",
        )
        + ") * 1000000.0) AS BIGINT)"
    )
    sums = " + ".join(
        f"(CASE WHEN ix + {dx} BETWEEN 0 AND {npx - 1}"
        f" AND iy + {dy} BETWEEN 0 AND {npx - 1}"
        f" THEN {vterm.format(dx=dx, dy=dy)} ELSE 0 END)"
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    )
    cnts = " + ".join(
        f"(CASE WHEN ix + {dx} BETWEEN 0 AND {npx - 1}"
        f" AND iy + {dy} BETWEEN 0 AND {npx - 1} THEN 1 ELSE 0 END)"
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    )
    return f"""
WITH px AS (
  SELECT i % {npx} AS ix, i // {npx} AS iy
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
),
f AS (SELECT ix, iy, {sums} AS fsum, {cnts} AS fcnt FROM px),
t AS (SELECT ix // {city.TILE_PX} AS tx, iy // {city.TILE_PX} AS ty,
             fsum, fcnt
      FROM f)
SELECT tx, ty, CAST(count(*) AS BIGINT) AS n_px,
       CAST(sum(fsum) AS BIGINT) AS tot_focal,
       CAST(min(fsum) AS BIGINT) AS min_focal,
       CAST(max(fsum) AS BIGINT) AS max_focal,
       round(CAST(sum(fsum) AS DOUBLE) / CAST(sum(fcnt) AS DOUBLE)
             / 1000000.0, 6) AS tile_mean
FROM t GROUP BY tx, ty
"""


@register("q_focal_mean", None)  # generated oracle attached below
def q_focal_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3x3 focal statistics over the tiled NDVI raster via HALO
    EXCHANGE — each tile ships 1-px border strips to its <=8
    neighbours (O(perimeter) movement), assembles a padded canvas, and
    convolves locally; per-pixel focal sums are exact quantised int64,
    edge pixels divide by their true neighbour count (GDAL edge
    semantics).  The oracle expands the closed-form NDVI into nine
    guarded terms per pixel — the two sides share no code path at all."""
    from .operators.focal import focal_tile_stats

    return focal_tile_stats(city.tiles_df(spark, "ndvi"), city.grid(), quant=1e6)


ORACLES["q_focal_mean"] = _focal_oracle()


# ---------------------------------------------------------------------------
# q_haversine_nn — geodesic nearest gazetteer place (WGS84 lat/lon)
# ---------------------------------------------------------------------------

# shared gazetteer: (name, lat, lon) inside the synthetic 1 deg x 1.5 deg box
_GEO_PLACES: tuple[tuple[str, float, float], ...] = (
    ("alpha", 51.05, 4.10),
    ("bravo", 51.12, 4.95),
    ("charlie", 51.25, 4.40),
    ("delta", 51.33, 5.20),
    ("echo", 51.48, 4.05),
    ("foxtrot", 51.55, 4.72),
    ("golf", 51.62, 5.35),
    ("hotel", 51.78, 4.30),
    ("india", 51.85, 5.05),
    ("juliet", 51.95, 4.60),
)


def _haversine_oracle() -> str:
    from .geo.geodesic import EARTH_R_M, RAD_PER_DEG

    vals = ", ".join(f"('{n}', {la}, {lo})" for n, la, lo in _GEO_PLACES)
    rad = repr(RAD_PER_DEG)
    sdp = f"sin((plat * {rad} - lat * {rad}) / 2.0)"
    sdl = f"sin((plon - lon) * {rad} / 2.0)"
    h = f"{sdp} * {sdp} + cos(lat * {rad}) * cos(plat * {rad}) * {sdl} * {sdl}"
    dist = f"round({repr(2.0 * EARTH_R_M)} * asin(sqrt({h})), 3)"
    return (
        _CTE
        + f""",
pl AS (SELECT * FROM (VALUES {vals}) AS t(name, plat, plon)),
pp AS (SELECT doc_id,
              51.0 + (y - {city.Y0}) / {city.EXTENT} AS lat,
              4.0 + (x - {city.X0}) / {city.EXTENT} * 1.5 AS lon
       FROM pts),
d AS (SELECT doc_id, name, {dist} AS dist_m FROM pp, pl)
SELECT doc_id, name, dist_m FROM d
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY dist_m, name) = 1
"""
    )


@register("q_haversine_nn", None)  # generated oracle attached below
def q_haversine_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geodesic nearest-gazetteer-place per document over synthetic
    WGS84 lat/lon (the great-circle complement of the engine's planar
    kNN — global corpora carry lat/lon before any metric projection):
    one codegen haversine chain against a broadcast place dim, argmin
    as a min-struct with (round-3 dist, name) total order."""
    from .geo.geodesic import nearest_geodesic

    pts = city.points_df(spark, sf_dir).select(
        "doc_id",
        (F.lit(51.0) + (F.col("y") - city.Y0) / city.EXTENT).alias("lat"),
        (F.lit(4.0) + (F.col("x") - city.X0) / city.EXTENT * 1.5).alias("lon"),
    )
    places = spark.createDataFrame(
        list(_GEO_PLACES), "name string, plat double, plon double"
    )
    return nearest_geodesic(pts, places, id_col="doc_id")


ORACLES["q_haversine_nn"] = _haversine_oracle()


# ---------------------------------------------------------------------------
# q_knox — space-time interaction (Knox test) over geocoded events
# ---------------------------------------------------------------------------

_KNOX_DELTA = 500.0
_KNOX_TAU_US = 300_000_000  # 5 minutes

_KNOX_ENT_SQL = f"""
ent AS (SELECT DISTINCT user_id AS ent,
               {city.X0} + ((user_id * 48271) % 1000000) / 1000000.0 * {city.EXTENT} AS x,
               {city.Y0} + ((user_id * 16807 + 12345) % 1000000) / 1000000.0 * {city.EXTENT} AS y
        FROM events)
"""


@register(
    "q_knox",
    f"""
WITH ue AS (SELECT event_id AS eid, user_id AS ent, epoch_us(ts) AS t FROM events),
{_KNOX_ENT_SQL.strip()},
per AS (SELECT ent, count(*) AS n_ev FROM ue GROUP BY ent),
ep AS (SELECT a.ent AS ea, b.ent AS eb
       FROM ent a JOIN ent b
         ON a.ent < b.ent
        AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
            <= {_KNOX_DELTA * _KNOX_DELTA}),
nsx AS (SELECT coalesce(sum(na.n_ev * nb.n_ev), 0) AS v
        FROM ep JOIN per na ON na.ent = ep.ea JOIN per nb ON nb.ent = ep.eb),
nsw AS (SELECT coalesce(sum(n_ev * (n_ev - 1)), 0) AS v2 FROM per),
tp AS (SELECT a.eid AS ea, a.ent AS enta, b.eid AS eb2, b.ent AS entb
       FROM ue a JOIN ue b
         ON b.eid > a.eid AND b.t BETWEEN a.t - {_KNOX_TAU_US} AND a.t + {_KNOX_TAU_US}),
ntc AS (SELECT count(*) AS nt FROM tp),
xc AS (SELECT count(*) AS x FROM tp
       WHERE enta = entb
          OR EXISTS (SELECT 1 FROM ep
                     WHERE (ep.ea = tp.enta AND ep.eb = tp.entb)
                        OR (ep.ea = tp.entb AND ep.eb = tp.enta))),
nn AS (SELECT count(*) AS n FROM ue)
SELECT CAST(n AS BIGINT) AS n_events,
       CAST(n * (n - 1) / 2 AS BIGINT) AS np_pairs,
       CAST(v + v2 / 2 AS BIGINT) AS ns_pairs,
       CAST(nt AS BIGINT) AS nt_pairs,
       CAST(x AS BIGINT) AS x_pairs,
       round(CAST(x AS DOUBLE) * CAST(n * (n - 1) / 2 AS DOUBLE)
             / CAST(v + v2 / 2 AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS knox_ratio
FROM nn, nsx, nsw, ntc, xc
""",
)
def q_knox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Knox space-time interaction over events located at their user's
    deterministic home coordinates: are event pairs close in space ALSO
    close in time beyond independence?  All four pair counts are exact
    integers (time pairs from a bucket equi-join, space pairs from the
    user-dim distance table — never all-pairs over events); the single
    FP step is the final ratio, round-6."""
    from .operators.spacetime import knox_statistic

    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    uid = F.col("user_id")
    entities = events.select("user_id").distinct().select(
        "user_id",
        (city.X0 + ((uid * 48271) % 1000000) / 1000000.0 * city.EXTENT).alias("x"),
        (city.Y0 + ((uid * 16807 + 12345) % 1000000) / 1000000.0 * city.EXTENT).alias("y"),
    )
    return knox_statistic(
        events, entities, delta=_KNOX_DELTA, tau_us=_KNOX_TAU_US
    )


# ---------------------------------------------------------------------------
# q_benford — leading-digit (Benford) audit of the event value feed
# ---------------------------------------------------------------------------


def _benford_oracle() -> str:
    from .functions.audit import leading_digit_sql

    dg = leading_digit_sql("c")
    return f"""
WITH q AS (SELECT CAST(round(value * 100.0) AS BIGINT) AS c
           FROM events WHERE value > 0),
per AS (SELECT {dg} AS digit, count(*) AS n FROM q GROUP BY 1),
t AS (SELECT digit, n, sum(n) OVER () AS total FROM per)
SELECT digit, CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE) * 100.0, 6) AS obs_pct,
       round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) * 100.0, 6) AS exp_pct,
       round((CAST(n AS DOUBLE) / CAST(total AS DOUBLE)
              - log10(1.0 + 1.0 / CAST(digit AS DOUBLE))) * 100.0, 6) AS dev_pct
FROM t
"""


@register("q_benford", None)  # generated oracle attached below
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of the event value feed — the
    forensic data-quality screen for scraped numeric columns.  The
    leading digit comes from an exact integer CASE chain (values
    quantised to cents first; NO log10 on the digit path — libm
    disagreement at exact powers of ten would mis-digit), so the
    9-row output is exact counts plus round-6 shares."""
    from .functions.audit import benford_digits

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return benford_digits(events, value_col="value", scale=100.0)


ORACLES["q_benford"] = _benford_oracle()


# ---------------------------------------------------------------------------
# q_incremental_rollup — IVM: base rollup + CDC delta == from-scratch
# ---------------------------------------------------------------------------


@register(
    "q_incremental_rollup",
    f"""
WITH s2 AS (SELECT doc_id, source,
                   CASE WHEN doc_id % 5 = 0 THEN text || '{_CDC_UPDATE_SUFFIX}'
                        ELSE text END AS t
            FROM documents WHERE doc_id % 11 != 0)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(t)) AS BIGINT) AS tot_weight
FROM s2 GROUP BY source
""",
)
def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance over the q_snapshot_diff snapshots:
    the per-source rollup of the NEW snapshot computed as base(old) +
    change-row contributions only — the oracle recomputes it from
    scratch, so the hash match PROVES base + delta == scratch while the
    engine's delta aggregation touched only the diff."""
    from .engine.cdc import incremental_rollup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    old = docs.filter(did % 7 != 0).select(
        "doc_id", "source", "text", F.length("text").alias("w")
    )
    nt = F.when(
        did % 5 == 0, F.concat(F.col("text"), F.lit(_CDC_UPDATE_SUFFIX))
    ).otherwise(F.col("text"))
    new = docs.filter(did % 11 != 0).select(
        "doc_id", "source", nt.alias("text"), F.length(nt).alias("w")
    )
    return incremental_rollup(
        old, new, key_col="doc_id", group_col="source",
        weight_col="w", value_col="text",
    )


# ---------------------------------------------------------------------------
# q_auc — Mann-Whitney AUC with exact tie handling
# ---------------------------------------------------------------------------


@register(
    "q_auc",
    """
WITH s AS (SELECT len(string_split(text, ' ')) AS score,
                  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
           FROM documents),
g AS (SELECT score, count(*) AS cnt, sum(label) AS pos FROM s GROUP BY score),
o AS (SELECT score, cnt, pos,
             coalesce(sum(cnt) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
      FROM g),
t AS (SELECT sum(CAST(pos AS HUGEINT) * (2 * cumb + cnt + 1)) AS r2,
             sum(pos) AS npos, sum(cnt) AS n
      FROM o)
SELECT CAST(npos AS BIGINT) AS n_pos, CAST(n - npos AS BIGINT) AS n_neg,
       round(CAST(r2 - CAST(npos AS HUGEINT) * (npos + 1) AS DOUBLE)
             / 2.0 / CAST(npos AS DOUBLE) / CAST(n - npos AS DOUBLE), 6) AS auc
FROM t
""",
)
def q_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of document length against the English label via the
    Mann-Whitney rank statistic with EXACT average-rank tie handling
    (20..79-token scores over thousands of docs — ties dominate, the
    hard case): the doubled rank sum stays integer, the engine ranks
    through the two-level bucket cumsum (no full-domain sort task), and
    the oracle uses the naive single window."""
    from .functions.audit import auc_mann_whitney

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s = docs.select(
        F.size(F.split(F.col("text"), " ")).alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
    )
    return auc_mann_whitney(s, bucket_scale=0.125)


# ---------------------------------------------------------------------------
# q_normalize_text — accent folding + whitespace collapse
# ---------------------------------------------------------------------------

_NORM_SUFFIXES: tuple[str, ...] = (
    " café crème",
    "  naïve  señor ",
    " zürich  ",
    "",
)


def _normalize_oracle() -> str:
    from .functions.text import ACCENT_FROM, ACCENT_TO

    suffix = (
        "CASE doc_id % 4 "
        + " ".join(
            f"WHEN {i} THEN '{s}'" for i, s in enumerate(_NORM_SUFFIXES[:-1])
        )
        + f" ELSE '{_NORM_SUFFIXES[-1]}' END"
    )
    return f"""
WITH a AS (SELECT doc_id, text || {suffix} AS t FROM documents)
SELECT doc_id,
       trim(regexp_replace(translate(t, '{ACCENT_FROM}', '{ACCENT_TO}'),
                           '\\s+', ' ', 'g')) AS norm
FROM a
"""


@register("q_normalize_text", None)  # generated oracle attached below
def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accent folding (single shared-table translate) + whitespace-run
    collapse + trim over doc_id-planted accented suffixes — the
    crawl-side normalization stage between mojibake repair and
    tokenization."""
    from .functions.text import normalize_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    suffix = (
        F.when(did % 4 == 0, F.lit(_NORM_SUFFIXES[0]))
        .when(did % 4 == 1, F.lit(_NORM_SUFFIXES[1]))
        .when(did % 4 == 2, F.lit(_NORM_SUFFIXES[2]))
        .otherwise(F.lit(_NORM_SUFFIXES[3]))
    )
    v = docs.select("doc_id", F.concat(F.col("text"), suffix).alias("text"))
    return normalize_text(v)


ORACLES["q_normalize_text"] = _normalize_oracle()


# ---------------------------------------------------------------------------
# q_link_graph — anchor extraction from page bytes -> host-level edge list
# ---------------------------------------------------------------------------


# planted crawl pages -> resolved host edges: the SHARED oracle CTE body
# for every link-graph-family query (q_link_graph and the graph-statistics
# queries below all render from this one string so they cannot drift)
_LINK_GRAPH_CTE = r"""p AS (
  SELECT doc_id,
    'https://host' || CAST(doc_id % 97 AS VARCHAR) || '.example/p/'
      || CAST(doc_id AS VARCHAR) AS url,
    '<html><body>'
      || '<A HREF="https://host' || CAST((doc_id * 7 + 3) % 97 AS VARCHAR)
         || '.example/x">t</A>'
      || '<a class="n" href="/local/' || CAST(doc_id % 5 AS VARCHAR)
         || '.html">l</a>'
      || CASE WHEN doc_id % 3 = 0 THEN '<a rel="x" href="//cdn'
              || CAST(doc_id % 11 AS VARCHAR) || '.example/lib">c</a>'
              ELSE '' END
      || CASE WHEN doc_id % 4 = 0 THEN '<a href="#top">top</a>' ELSE '' END
      || CASE WHEN doc_id % 5 = 0
              THEN '<a href="mailto:ab@example.org">m</a>' ELSE '' END
      || CASE WHEN doc_id % 7 = 0 THEN '<a href="">e</a>' ELSE '' END
      || text || '</body></html>' AS page
  FROM documents),
e AS (SELECT lower(regexp_extract(url, '^https?://([^/]+)', 1)) AS src_host,
             unnest(regexp_extract_all(page,
               '(?i)<a\s[^>]*?href\s*=\s*"([^"]*)"', 1)) AS href
      FROM p),
r AS (SELECT src_host,
             CASE WHEN regexp_matches(href, '(?i)^https?://')
                    THEN lower(regexp_extract(href,
                           '(?i)^https?://([^/]+)', 1))
                  WHEN href LIKE '//%'
                    THEN lower(regexp_extract(href, '^//([^/]+)', 1))
                  ELSE src_host END AS dst_host
      FROM e
      WHERE NOT (href = ''
                 OR regexp_matches(href, '(?i)^(#|mailto:|javascript:)')))
"""


@register(
    "q_link_graph",
    "WITH " + _LINK_GRAPH_CTE + """
SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n_links
FROM r GROUP BY src_host, dst_host
""",
)
def q_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level web-graph construction straight from the raw page
    bytes (the PageRank input): anchors planted deterministically by
    doc_id — an absolute cross-host link, a root-relative self-link, a
    protocol-relative CDN link every 3rd doc, and fragment / mailto /
    empty hrefs (every 4th/5th/7th doc) that must be DROPPED — are
    pulled out by one regexp_extract_all, resolved to destination
    hosts by a CASE chain, and counted with a two-phase aggregate.
    The oracle renders the same RE2-safe regexes and resolution CASE
    over the same planted markup.  Pure codegen: zero UDFs."""
    from .functions.links import host_link_graph

    return host_link_graph(_link_pages_df(spark, sf_dir))


def _link_pages_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _LINK_GRAPH_CTE's planted pages (url, html)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")

    def s(e):  # noqa: E731 - integer -> string, matching DuckDB CAST
        return e.cast("string")

    url = F.concat(
        F.lit("https://host"), s(did % 97), F.lit(".example/p/"), s(did)
    )
    a_abs = F.concat(
        F.lit('<A HREF="https://host'), s((did * 7 + 3) % 97),
        F.lit('.example/x">t</A>'),
    )
    a_rel = F.concat(
        F.lit('<a class="n" href="/local/'), s(did % 5), F.lit('.html">l</a>')
    )
    a_cdn = F.when(
        did % 3 == 0,
        F.concat(
            F.lit('<a rel="x" href="//cdn'), s(did % 11),
            F.lit('.example/lib">c</a>'),
        ),
    ).otherwise(F.lit(""))
    a_frag = F.when(did % 4 == 0, F.lit('<a href="#top">top</a>')).otherwise(
        F.lit("")
    )
    a_mail = F.when(
        did % 5 == 0, F.lit('<a href="mailto:ab@example.org">m</a>')
    ).otherwise(F.lit(""))
    a_empty = F.when(did % 7 == 0, F.lit('<a href="">e</a>')).otherwise(F.lit(""))
    page = F.concat(
        F.lit("<html><body>"), a_abs, a_rel, a_cdn, a_frag, a_mail, a_empty,
        F.col("text"), F.lit("</body></html>"),
    )
    return docs.select(
        url.alias("url"), F.encode(page, "UTF-8").alias("html")
    )


@register(
    "q_intrahost_links",
    "WITH " + _LINK_GRAPH_CTE + """
SELECT src_host, CAST(count(*) AS BIGINT) AS n_links,
       CAST(sum(CASE WHEN dst_host = src_host THEN 1 ELSE 0 END) AS BIGINT)
         AS n_self,
       CAST(sum(CASE WHEN dst_host = src_host THEN 1 ELSE 0 END) AS DOUBLE)
       / CAST(count(*) AS DOUBLE) AS self_ratio
FROM r GROUP BY src_host
""",
)
def q_intrahost_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host navigation profile from the raw page bytes: what
    fraction of a host's anchors resolve back to itself (relative
    links + absolute self-references) vs point outbound — the
    template-navigation vs content-link signal crawl schedulers use
    beside q_link_graph's edge list.  Two exact int64 counts divide
    once (portable unrounded); same planted markup + resolution CASE
    as the whole link-graph family."""
    from .functions.links import extract_outlinks

    resolved = extract_outlinks(_link_pages_df(spark, sf_dir))
    return resolved.groupBy("src_host").agg(
        F.count(F.lit(1)).cast("long").alias("n_links"),
        F.sum(
            F.when(F.col("dst_host") == F.col("src_host"), 1).otherwise(0)
        ).cast("long").alias("n_self"),
    ).select(
        "src_host", "n_links", "n_self",
        (F.col("n_self").cast("double") / F.col("n_links").cast("double"))
        .alias("self_ratio"),
    )


@register(
    "q_outlink_entropy",
    "WITH " + _LINK_GRAPH_CTE + """,
dc AS (SELECT src_host, dst_host, count(*) AS c
       FROM r GROUP BY src_host, dst_host),
n AS (SELECT src_host, dst_host, c,
             sum(c) OVER (PARTITION BY src_host) AS n
      FROM dc),
t AS (SELECT src_host, n,
             CAST(floor((CAST(c AS DOUBLE) / n)
                        * ln(CAST(c AS DOUBLE) / n) * 1000000000.0 + 0.5)
                  AS BIGINT) AS tq
      FROM n)
SELECT src_host, CAST(max(n) AS BIGINT) AS n_links,
       CAST(count(*) AS BIGINT) AS n_dsts,
       round(-(CAST(sum(tq) AS DOUBLE) / 1000000000.0) + 0.0, 6) AS entropy
FROM t GROUP BY src_host
""",
)
def q_outlink_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each host's outbound-destination distribution
    (link-diversity signal: a host whose anchors all point one place is
    a mirror/doorway, a high-entropy host is a genuine hub — beside
    q_intrahost_links' self-ratio).  The destination set is unbounded,
    so the fixed-chain trick can't apply; instead each p·ln p term is
    1e-9-quantized and summed as exact integers (the JS-divergence
    convention — FP order can never move the rounded total), with the
    +0.0 flush before round-6 for the single-destination −0.0 case."""
    from .functions.links import extract_outlinks

    from pyspark.sql import Window

    dc = (
        extract_outlinks(_link_pages_df(spark, sf_dir))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wn = Window.partitionBy("src_host")
    p = F.col("c").cast("double") / F.col("n")
    t = dc.withColumn("n", F.sum("c").over(wn)).select(
        "src_host", "n",
        F.floor(p * F.log(p) * 1e9 + F.lit(0.5)).cast("long").alias("tq"),
    )
    return t.groupBy("src_host").agg(
        F.max("n").cast("long").alias("n_links"),
        F.count(F.lit(1)).cast("long").alias("n_dsts"),
        F.round(
            -(F.sum("tq").cast("double") / 1e9) + F.lit(0.0), 6
        ).alias("entropy"),
    )


# ---------------------------------------------------------------------------
# q_nearest_edge — point -> nearest network segment (map-matching snap)
# ---------------------------------------------------------------------------


@register(
    "q_nearest_edge",
    f"""
WITH pts AS ({{points_sql}}),
ids AS (SELECT CAST(range AS BIGINT) AS i FROM range(2601)),
ed AS (
  SELECT i AS src, i + 1 AS dst FROM ids WHERE i % 51 < 50
  UNION ALL
  SELECT i AS src, i + 51 AS dst FROM ids WHERE i // 51 < 50
),
seg AS (SELECT src * 100000 + dst AS edge_id,
               {{X0}} + (src % 51) * 200.0 AS x1,
               {{Y0}} + (src // 51) * 200.0 AS y1,
               {{X0}} + (dst % 51) * 200.0 AS x2,
               {{Y0}} + (dst // 51) * 200.0 AS y2
        FROM ed),
c AS (SELECT doc_id, edge_id, x, y, x1, y1,
             x2 - x1 AS dx, y2 - y1 AS dy
      FROM pts, seg),
c2 AS (SELECT doc_id, edge_id, x, y, x1, y1, dx, dy,
              CASE WHEN dx * dx + dy * dy = 0 THEN 0.0
                   ELSE least(greatest(((x - x1) * dx + (y - y1) * dy)
                                       / (dx * dx + dy * dy), 0.0), 1.0)
              END AS t
       FROM c),
c3 AS (SELECT doc_id, edge_id,
              round(sqrt((x - (x1 + t * dx)) * (x - (x1 + t * dx))
                       + (y - (y1 + t * dy)) * (y - (y1 + t * dy))), 6)
                AS snap_dist,
              round(t + 0.0, 6) AS t_frac
       FROM c2),
r AS (SELECT doc_id, edge_id, snap_dist, t_frac,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY snap_dist, edge_id) AS rn
      FROM c3)
SELECT doc_id, edge_id, snap_dist, t_frac FROM r WHERE rn = 1
""",
)
def q_nearest_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-matching snap: every geocoded point to its nearest street
    SEGMENT (not vertex — ox.distance.nearest_edges semantics, the half
    of J4 the reference's pre-snapped notebooks skip) over the 51x51
    lattice, cell-prefiltered with a 150 m bound (every interior point
    of a 200 m lattice block is <=100*sqrt(2) m from a street, so the
    bounded tier is provably exact and the full-scan fallback stays
    empty); the oracle is the brute-force points x segments argmin
    under the same (round-6 dist, edge_id) total order."""
    from .data.city_fixture import network_dfs
    from .operators.snap import nearest_edge

    pts = city.points_df(spark, sf_dir)
    _, edges = network_dfs(spark)
    seg = edges.filter(F.col("src") < F.col("dst")).select(
        (F.col("src") * 100000 + F.col("dst")).alias("edge_id"),
        F.col("geom_xs")[0].alias("x1"),
        F.col("geom_ys")[0].alias("y1"),
        F.col("geom_xs")[1].alias("x2"),
        F.col("geom_ys")[1].alias("y2"),
    )
    return nearest_edge(pts, seg, id_col="doc_id", max_snap_dist=150.0)


ORACLES["q_nearest_edge"] = ORACLES["q_nearest_edge"].format(
    points_sql=city.points_sql(), X0=city.X0, Y0=city.Y0
)


# ---------------------------------------------------------------------------
# q_chunk_windows — overlapping token windows (RAG/embedding splitter)
# ---------------------------------------------------------------------------


@register(
    "q_chunk_windows",
    """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
e AS (SELECT doc_id, toks, len(toks) AS n,
             unnest(range(0, ((len(toks) - 1) // 24) + 1)) AS k
      FROM t),
c AS (SELECT doc_id, CAST(k AS INT) AS chunk_id, k * 24 AS s,
             least(32, n - k * 24) AS take, toks
      FROM e)
SELECT doc_id, chunk_id, CAST(take AS INT) AS n_tok,
       array_to_string(list_slice(toks, s + 1, s + take), ' ') AS chunk
FROM c
""",
)
def q_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 32-token windows every 24 tokens (the RAG /
    embedding-ingestion splitter; natural shorter tail kept): token
    array materialized ONCE per row, window starts fanned out by
    posexplode(sequence), slice() with column-typed bounds — shuffle-
    free map-side fan-out; the oracle mirrors it with range()/unnest +
    list_slice (end-index form)."""
    from .functions.text import chunk_windows

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return chunk_windows(docs, win=32, stride=24)


# ---------------------------------------------------------------------------
# q_oov_rate — vocabulary coverage against a corpus-derived vocab
# ---------------------------------------------------------------------------


@register(
    "q_oov_rate",
    """
WITH d AS (SELECT doc_id,
                  text || ' uniq' || CAST(doc_id AS VARCHAR)
                       || ' rare' || CAST(doc_id % 300 AS VARCHAR) AS t
           FROM documents),
tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM d),
v AS (SELECT tok FROM tok GROUP BY tok HAVING count(*) >= 5),
j AS (SELECT t.doc_id, CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
      FROM tok t LEFT JOIN v ON t.tok = v.tok)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
       CAST(sum(oov) AS BIGINT) AS n_oov,
       round(CAST(sum(oov) AS DOUBLE) / count(*), 6) AS oov_rate
FROM j GROUP BY doc_id
""",
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document OOV fraction against the corpus-derived vocabulary
    (count >= 5): every doc carries a planted always-unique token
    (guaranteed OOV) and a shared `rare{doc_id%300}` token whose
    count crosses the threshold only at the larger SFs — so the
    tri-scale sweep exercises BOTH branches of the vocab join.  The
    vocabulary is corpus-sized and deliberately NOT broadcast (the
    r02 bigram-LM verdict item): AQE picks the join strategy."""
    from .functions.text import oov_rate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    t = F.concat(
        F.col("text"),
        F.lit(" uniq"), did.cast("string"),
        F.lit(" rare"), (did % 300).cast("string"),
    )
    return oov_rate(docs.select("doc_id", t.alias("text")), min_count=5)


# ---------------------------------------------------------------------------
# q_street_density — line-in-cell clipped length per grid cell
# ---------------------------------------------------------------------------

# 260 m cells offset 13 m so NO lattice street lies exactly on a cell
# boundary (60k + 13 is never 0 mod 200): the closed-interval clip's
# credit-both-cells boundary case stays out of the gate data
_SD_SIZE = 260.0


def _street_density_oracle() -> str:
    from .geo.cells import CELL_BASE

    ax = ("x", "y")
    parts = []
    for a, p, c in (("x", "x1", "cx0"), ("y", "y1", "cy0")):
        d = f"d{a}"
        lo, hi = c, f"{c} + {_SD_SIZE}"
        parts.append(
            f"CASE WHEN {d} <> 0 THEN least(({lo} - {p}) / {d}, ({hi} - {p}) / {d}) "
            f"ELSE CASE WHEN {p} >= {lo} AND {p} <= {hi} THEN -1e30 ELSE 1e30 END END AS t{a}en,\n"
            f"CASE WHEN {d} <> 0 THEN greatest(({lo} - {p}) / {d}, ({hi} - {p}) / {d}) "
            f"ELSE CASE WHEN {p} >= {lo} AND {p} <= {hi} THEN 1e30 ELSE -1e30 END END AS t{a}ex"
        )
    assert ax  # silence linters
    return f"""
WITH ids AS (SELECT CAST(range AS BIGINT) AS i FROM range(2601)),
ed AS (SELECT i AS src, i + 1 AS dst FROM ids WHERE i % 51 < 50
       UNION ALL
       SELECT i AS src, i + 51 AS dst FROM ids WHERE i // 51 < 50),
pts AS ({city.points_sql()}),
seg AS (SELECT {city.X0} + (src % 51) * 200.0 AS x1,
               {city.Y0} + (src // 51) * 200.0 AS y1,
               {city.X0} + (dst % 51) * 200.0 AS x2,
               {city.Y0} + (dst // 51) * 200.0 AS y2
        FROM ed
        UNION ALL
        SELECT x AS x1, y AS y1,
               x + (37 + doc_id % 50) AS x2, y + (23 + doc_id % 70) AS y2
        FROM pts),
g AS (SELECT *,
        CAST(floor((least(x1, x2) - {city.X0 + 13.0}) / {_SD_SIZE}) AS BIGINT) AS gx0,
        CAST(floor((greatest(x1, x2) - {city.X0 + 13.0}) / {_SD_SIZE}) AS BIGINT) AS gx1,
        CAST(floor((least(y1, y2) - {city.Y0 + 13.0}) / {_SD_SIZE}) AS BIGINT) AS gy0,
        CAST(floor((greatest(y1, y2) - {city.Y0 + 13.0}) / {_SD_SIZE}) AS BIGINT) AS gy1
      FROM seg),
e1 AS (SELECT *, unnest(range(gy0, gy1 + 1)) AS gy FROM g),
e2 AS (SELECT *, unnest(range(gx0, gx1 + 1)) AS gx FROM e1),
c AS (SELECT gy, gx, x1, y1, x2 - x1 AS dx, y2 - y1 AS dy,
             {city.X0 + 13.0} + gx * {_SD_SIZE} AS cx0,
             {city.Y0 + 13.0} + gy * {_SD_SIZE} AS cy0
      FROM e2),
t AS (SELECT gy, gx, dx, dy,
{parts[0]},
{parts[1]}
      FROM c),
q AS (SELECT gy * {CELL_BASE} + gx AS cell,
             CAST(round(greatest(0.0, least(1.0, txex, tyex)
                                      - greatest(0.0, txen, tyen))
                        * sqrt(dx * dx + dy * dy) * 1000000.0) AS BIGINT) AS lq
      FROM t)
SELECT cell, CAST(count(*) AS BIGINT) AS n_segments,
       round(CAST(sum(lq) AS BIGINT) / 1000000.0, 6) AS street_len
FROM q WHERE lq > 0 GROUP BY cell
"""


@register("q_street_density", None)  # generated oracle attached below
def q_street_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Street length per 260 m grid cell over the 51x51 lattice via the
    closed-form Liang-Barsky parametric clip — the LINE counterpart of
    the polygon zonal family (walkability covariate next to NDVI /
    landcover): lengths quantized to integer micrometers so per-cell
    sums are exact order-free integer aggregations; the grid is offset
    13 m so no street lies exactly on a cell boundary."""
    from .data.city_fixture import network_dfs
    from .operators.streets import street_length_per_cell

    _, edges = network_dfs(spark)
    seg = edges.filter(F.col("src") < F.col("dst")).select(
        (F.col("src") * 100000 + F.col("dst")).alias("edge_id"),
        F.col("geom_xs")[0].alias("x1"),
        F.col("geom_ys")[0].alias("y1"),
        F.col("geom_xs")[1].alias("x2"),
        F.col("geom_ys")[1].alias("y2"),
    )
    # per-document diagonal "GPS trace" segments: scale with SF and
    # exercise the oblique-clip branches the axis-aligned lattice can't
    pts = city.points_df(spark, sf_dir)
    did = F.col("doc_id")
    traces = pts.select(
        (F.lit(1000000000) + did).alias("edge_id"),
        F.col("x").alias("x1"),
        F.col("y").alias("y1"),
        (F.col("x") + (37 + did % 50)).alias("x2"),
        (F.col("y") + (23 + did % 70)).alias("y2"),
    )
    return street_length_per_cell(
        seg.unionByName(traces), size=_SD_SIZE, ox=city.X0 + 13.0, oy=city.Y0 + 13.0
    )


ORACLES["q_street_density"] = _street_density_oracle()


# ---------------------------------------------------------------------------
# q_road_sample — viewshed road sampling (linspace scheme) gate
# ---------------------------------------------------------------------------


def _road_sample_oracle() -> str:
    return f"""
WITH ids AS (SELECT CAST(range AS BIGINT) AS i FROM range(2601)),
ed AS (SELECT i AS src, i + 1 AS dst FROM ids WHERE i % 51 < 50
       UNION ALL
       SELECT i AS src, i + 51 AS dst FROM ids WHERE i // 51 < 50),
pts AS ({city.points_sql()}),
seg AS (SELECT src * 100000 + dst AS edge_id,
               {city.X0} + (src % 51) * 200.0 AS x1,
               {city.Y0} + (src // 51) * 200.0 AS y1,
               {city.X0} + (dst % 51) * 200.0 AS x2,
               {city.Y0} + (dst // 51) * 200.0 AS y2
        FROM ed
        UNION ALL
        SELECT 1000000000 + doc_id AS edge_id, x AS x1, y AS y1,
               x + (37 + doc_id % 50) AS x2, y + (23 + doc_id % 70) AS y2
        FROM pts),
s2 AS (SELECT *, sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)) AS L
       FROM seg),
s3 AS (SELECT *, CAST(floor(L / {_RS_DIST}) AS BIGINT) + 1 AS n FROM s2),
e AS (SELECT *, unnest(range(n)) AS sp_id FROM s3),
d AS (SELECT *,
        CASE WHEN sp_id = n - 1 THEN L
             ELSE CAST(sp_id AS DOUBLE) * (L / CAST(n - 1 AS DOUBLE)) END
          AS dist
      FROM e),
t AS (SELECT *, dist / L AS tt FROM d)
SELECT edge_id, sp_id,
       round(CASE WHEN n = 1 THEN (x1 + x2) / 2
                  ELSE x1 + tt * (x2 - x1) END, 6) AS x,
       round(CASE WHEN n = 1 THEN (y1 + y2) / 2
                  ELSE y1 + tt * (y2 - y1) END, 6) AS y
FROM t
"""


_RS_DIST = 50.0


@register("q_road_sample", None)  # generated oracle attached below
def q_road_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Road sample points for the streetview/viewshed stage — the
    reference samples `int(len/d)+1` linspace points per edge within
    the PoI buffer, centroid when shorter than sample_dist
    (GreenExp/visibility.py:568-589).  Gate runs the pure-codegen twin
    of geo.kernels.interpolate_linspace over the SAME lattice+trace
    segment fixture as q_street_density (oblique SF-scaling traces
    exercise the irrational-length / centroid branches the 200 m
    lattice cannot); the oracle replicates NumPy's linspace FP order
    (d_k = k*(L/(n-1)), last slot = L) step for step."""
    from .data.city_fixture import network_dfs
    from .operators.streets import sample_points_linspace

    _, edges = network_dfs(spark)
    seg = edges.filter(F.col("src") < F.col("dst")).select(
        (F.col("src") * 100000 + F.col("dst")).alias("edge_id"),
        F.col("geom_xs")[0].alias("x1"),
        F.col("geom_ys")[0].alias("y1"),
        F.col("geom_xs")[1].alias("x2"),
        F.col("geom_ys")[1].alias("y2"),
    )
    pts = city.points_df(spark, sf_dir)
    did = F.col("doc_id")
    traces = pts.select(
        (F.lit(1000000000) + did).alias("edge_id"),
        F.col("x").alias("x1"),
        F.col("y").alias("y1"),
        (F.col("x") + (37 + did % 50)).alias("x2"),
        (F.col("y") + (23 + did % 70)).alias("y2"),
    )
    return sample_points_linspace(seg.unionByName(traces), sample_dist=_RS_DIST)


ORACLES["q_road_sample"] = _road_sample_oracle()


# ---------------------------------------------------------------------------
# q_hillshade — trig-free Lambertian hillshade over tiles (halo exchange)
# ---------------------------------------------------------------------------


def _horn_terms_sql(quant: float = 1e6) -> tuple[str, str]:
    """(nx, ny) Horn-gradient SQL strings over quantised NDVI pixels —
    shared by the slope-family oracles (literal-offset form)."""

    def v(dx: int, dy: int) -> str:
        return (
            "CAST(round(("
            + city.NDVI_SQL.format(
                px_x=f"{city.X0} + ((ix + {dx}) + 0.5) * {city.RES}",
                px_y=f"{city.Y0} + ((iy + {dy}) + 0.5) * {city.RES}",
            )
            + f") * {quant}) AS BIGINT)"
        )

    nx = (
        f"({v(1, -1)} + 2 * {v(1, 0)} + {v(1, 1)})"
        f" - ({v(-1, -1)} + 2 * {v(-1, 0)} + {v(-1, 1)})"
    )
    ny = (
        f"({v(-1, 1)} + 2 * {v(0, 1)} + {v(1, 1)})"
        f" - ({v(-1, -1)} + 2 * {v(0, -1)} + {v(1, -1)})"
    )
    return nx, ny


def _hillshade_oracle() -> str:
    from .operators.focal import hillshade_constants

    npx = city.NPX
    c0, lx, ly, d2 = hillshade_constants(city.RES, 1e6)
    nx, ny = _horn_terms_sql()
    return f"""
WITH px AS (
  SELECT i % {npx} AS ix, i // {npx} AS iy
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
  WHERE i % {npx} BETWEEN 1 AND {npx - 2}
    AND i // {npx} BETWEEN 1 AND {npx - 2}
),
g AS (SELECT ix // {city.TILE_PX} AS tx, iy // {city.TILE_PX} AS ty,
             ({nx}) AS nx, ({ny}) AS ny
      FROM px),
h AS (SELECT tx, ty,
        CAST(floor(greatest(
          255.0 * ((({c0!r} - {lx!r} * CAST(nx AS DOUBLE))
                    - {ly!r} * CAST(ny AS DOUBLE))
                   / sqrt(({d2!r} + CAST(nx AS DOUBLE) * CAST(nx AS DOUBLE))
                          + CAST(ny AS DOUBLE) * CAST(ny AS DOUBLE))),
          0.0) + 0.5) AS BIGINT) AS hs
      FROM g)
SELECT tx, ty, CAST(count(*) AS BIGINT) AS n_interior,
       CAST(sum(hs) AS BIGINT) AS sum_hs,
       min(hs) AS min_hs, max(hs) AS max_hs,
       round(CAST(CAST(sum(hs) AS BIGINT) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS mean_hs
FROM h GROUP BY tx, ty
"""


@register("q_hillshade", None)  # generated oracle attached below
def q_hillshade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lambertian hillshade per tile (gdaldem-hillshade semantics —
    the map-rendering companion the reference delegates to matplotlib,
    GreenExp/visibility.py:214-231) over the SAME halo exchange as
    q_terrain_slope.  Trig runs ONCE on four driver-side scalars
    (operators/focal.py:hillshade_constants); per pixel only
    correctly-rounded IEEE primitives execute in a fixed association
    order, so the NumPy kernel and the DuckDB oracle produce
    bit-identical int grey levels and exact per-tile sums."""
    from .operators.focal import hillshade_tile_stats

    return hillshade_tile_stats(city.tiles_df(spark, "ndvi"), city.grid())


ORACLES["q_hillshade"] = _hillshade_oracle()


# ---------------------------------------------------------------------------
# q_flow_direction — D8 steepest-descent histogram over tiles
# ---------------------------------------------------------------------------


def _flow_direction_oracle() -> str:
    npx = city.NPX
    vq = (
        "CAST(round(("
        + city.NDVI_SQL.format(
            px_x=f"{city.X0} + ((ix + dx) + 0.5) * {city.RES}",
            px_y=f"{city.Y0} + ((iy + dy) + 0.5) * {city.RES}",
        )
        + ") * 1000000.0) AS BIGINT)"
    )
    vc = (
        "CAST(round(("
        + city.NDVI_SQL.format(
            px_x=f"{city.X0} + (ix + 0.5) * {city.RES}",
            px_y=f"{city.Y0} + (iy + 0.5) * {city.RES}",
        )
        + ") * 1000000.0) AS BIGINT)"
    )
    return f"""
WITH px AS (
  SELECT i % {npx} AS ix, i // {npx} AS iy
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
  WHERE i % {npx} BETWEEN 1 AND {npx - 2}
    AND i // {npx} BETWEEN 1 AND {npx - 2}
),
dirs(code, dx, dy, w) AS (VALUES
  (1, 1, 0, 2), (2, 1, 1, 1), (4, 0, 1, 2), (8, -1, 1, 1),
  (16, -1, 0, 2), (32, -1, -1, 1), (64, 0, -1, 2), (128, 1, -1, 1)),
cand AS (SELECT ix, iy, code, w, ({vc}) - ({vq}) AS dz
         FROM px CROSS JOIN dirs),
best AS (SELECT ix, iy, max(dz * dz * w * 256 + (255 - code)) AS k
         FROM cand WHERE dz > 0 GROUP BY ix, iy),
f AS (SELECT px.ix // {city.TILE_PX} AS tx, px.iy // {city.TILE_PX} AS ty,
             coalesce(255 - (b.k % 256), 0) AS code
      FROM px LEFT JOIN best b ON b.ix = px.ix AND b.iy = px.iy)
SELECT tx, ty, CAST(code AS BIGINT) AS code,
       CAST(count(*) AS BIGINT) AS n_px
FROM f GROUP BY tx, ty, code
"""


@register("q_flow_direction", None)  # generated oracle attached below
def q_flow_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 steepest-descent flow-direction histogram per tile — the
    hydrology primitive under flow accumulation / watershed tools,
    exact-integer end to end: the cardinal-vs-diagonal drop compare
    ``dz_c/res`` vs ``dz_d/(res·√2)`` is the int64 compare
    ``2·dz_c² > dz_d²`` (no nonzero integer solves 2a² = b², so a
    cardinal and a diagonal can never tie at dz>0), ESRI-code-ascending
    tiebreak, code 0 for flats/pits.  The oracle unnests the 8
    candidate drops per pixel and packs the argmax into a single
    ``key·256 + (255−code)`` max — the two sides share no code path."""
    from .operators.focal import flow_direction_counts

    return flow_direction_counts(city.tiles_df(spark, "ndvi"), city.grid())


ORACLES["q_flow_direction"] = _flow_direction_oracle()


# ---------------------------------------------------------------------------
# q_aspect — steepest-descent octant histogram over tiles
# ---------------------------------------------------------------------------


def _aspect_oracle() -> str:
    from .operators.focal import octant_case_sql

    npx = city.NPX
    nx, ny = _horn_terms_sql()
    case = octant_case_sql("-nx", "-ny")
    return f"""
WITH px AS (
  SELECT i % {npx} AS ix, i // {npx} AS iy
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
  WHERE i % {npx} BETWEEN 1 AND {npx - 2}
    AND i // {npx} BETWEEN 1 AND {npx - 2}
),
g AS (SELECT ix // {city.TILE_PX} AS tx, iy // {city.TILE_PX} AS ty,
             ({nx}) AS nx, ({ny}) AS ny
      FROM px),
o AS (SELECT tx, ty, {case} AS octant FROM g)
SELECT tx, ty, CAST(octant AS BIGINT) AS octant,
       CAST(count(*) AS BIGINT) AS n_px
FROM o GROUP BY tx, ty, octant
"""


@register("q_aspect", None)  # generated oracle attached below
def q_aspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect histogram per tile in eight 45°-wide octants of the
    steepest-DESCENT direction (gdaldem-aspect's binned companion —
    the reference plots rasters but derives no aspect,
    GreenExp/visibility.py:214-231).  Bin edges sit on exact 45°
    multiples so every boundary decision is an int64 sign/magnitude
    compare on the Horn gradients — no trig, no FP anywhere; the
    engine kernel and this oracle render the SAME rule table
    (operators/focal.py:_OCTANT_RULES) so they cannot drift."""
    from .operators.focal import aspect_octant_counts

    return aspect_octant_counts(city.tiles_df(spark, "ndvi"), city.grid())


ORACLES["q_aspect"] = _aspect_oracle()


# ---------------------------------------------------------------------------
# q_ruggedness — TPI / TRI / roughness terrain texture over tiles
# ---------------------------------------------------------------------------


def _ruggedness_oracle(quant: float = 1e6) -> str:
    npx = city.NPX

    def v(dx: int, dy: int) -> str:
        return (
            "CAST(round(("
            + city.NDVI_SQL.format(
                px_x=f"{city.X0} + ((ix + {dx}) + 0.5) * {city.RES}",
                px_y=f"{city.Y0} + ((iy + {dy}) + 0.5) * {city.RES}",
            )
            + f") * {quant}) AS BIGINT)"
        )

    offs = [(dx, dy) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            if not (dx == 0 and dy == 0)]
    zcols = ", ".join(
        f"({v(dx, dy)}) AS z{i}" for i, (dx, dy) in enumerate(offs)
    )
    nine = ", ".join(["z"] + [f"z{i}" for i in range(8)])
    tpi8 = "8 * z - (" + " + ".join(f"z{i}" for i in range(8)) + ")"
    tri = " + ".join(f"abs(z - z{i})" for i in range(8))
    return f"""
WITH px AS (
  SELECT i % {npx} AS ix, i // {npx} AS iy
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
  WHERE i % {npx} BETWEEN 1 AND {npx - 2}
    AND i // {npx} BETWEEN 1 AND {npx - 2}
),
vals AS (SELECT ix // {city.TILE_PX} AS tx, iy // {city.TILE_PX} AS ty,
                ({v(0, 0)}) AS z, {zcols}
         FROM px),
t AS (SELECT tx, ty, ({tpi8}) AS tpi8, ({tri}) AS tri,
             greatest({nine}) - least({nine}) AS rough
      FROM vals)
SELECT tx, ty, CAST(count(*) AS BIGINT) AS n_interior,
       CAST(count(*) FILTER (WHERE tpi8 > 0) AS BIGINT) AS n_ridge,
       CAST(sum(tri) AS BIGINT) AS sum_tri,
       max(tri) AS max_tri, max(rough) AS max_rough,
       round((CAST(CAST(sum(tri) AS BIGINT) AS DOUBLE)
              / CAST(count(*) AS DOUBLE)) / {quant!r}, 6) AS mean_tri
FROM t GROUP BY tx, ty
"""


@register("q_ruggedness", None)  # generated oracle attached below
def q_ruggedness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson TPI / Riley TRI / roughness terrain-texture triple per
    tile — the DSM texture screen a viewshed pipeline runs before
    paying for ray casts (flat tiles skip straight to the GVI ratio).
    Every per-pixel statistic is exact int64 on quantised pixels
    (TPI kept as 8·z − Σnb to avoid the /8); the single division
    (mean_tri) runs in Catalyst mirroring the oracle's chain."""
    from .operators.focal import ruggedness_tile_stats

    return ruggedness_tile_stats(city.tiles_df(spark, "ndvi"), city.grid())


ORACLES["q_ruggedness"] = _ruggedness_oracle()


# ---------------------------------------------------------------------------
# q_euler_green — Euler-characteristic patch topology of the green mask
# ---------------------------------------------------------------------------


def _euler_oracle(quant: float = 1e6) -> str:
    npx = city.NPX

    def mq(x_expr: str, y_expr: str) -> str:
        q = (
            "CAST(round(("
            + city.NDVI_SQL.format(
                px_x=f"{city.X0} + (({x_expr}) + 0.5) * {city.RES}",
                px_y=f"{city.Y0} + (({y_expr}) + 0.5) * {city.RES}",
            )
            + f") * {quant}) AS BIGINT)"
        )
        return (
            f"(CASE WHEN ({x_expr}) BETWEEN 0 AND {npx - 1}"
            f" AND ({y_expr}) BETWEEN 0 AND {npx - 1}"
            f" AND ({q}) > 0 THEN 1 ELSE 0 END)"
        )

    nw = npx + 1
    return f"""
WITH wins AS (
  SELECT i % {nw} - 1 AS wx, i // {nw} - 1 AS wy
  FROM (SELECT unnest(generate_series(0, {nw * nw - 1})) AS i)
),
quad AS (SELECT least(wx + 1, {npx - 1}) // {city.TILE_PX} AS tx,
                least(wy + 1, {npx - 1}) // {city.TILE_PX} AS ty,
                {mq('wx', 'wy')} AS a, {mq('wx + 1', 'wy')} AS b,
                {mq('wx', 'wy + 1')} AS c, {mq('wx + 1', 'wy + 1')} AS d
         FROM wins),
wagg AS (SELECT tx, ty,
           CAST(count(*) FILTER (WHERE a + b + c + d = 1) AS BIGINT) AS c1,
           CAST(count(*) FILTER (WHERE a + b + c + d = 3) AS BIGINT) AS c3,
           CAST(count(*) FILTER (WHERE a + b + c + d = 2
                                 AND ((a = 1 AND d = 1)
                                      OR (b = 1 AND c = 1))) AS BIGINT) AS cd
         FROM quad GROUP BY tx, ty),
px AS (
  SELECT i % {npx} AS ix, i // {npx} AS iy
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
),
pagg AS (SELECT ix // {city.TILE_PX} AS tx, iy // {city.TILE_PX} AS ty,
                CAST(count(*) FILTER (WHERE {mq('ix', 'iy')} = 1)
                     AS BIGINT) AS n_green
         FROM px GROUP BY tx, ty)
SELECT w.tx, w.ty, p.n_green, w.c1, w.c3, w.cd,
       w.c1 - w.c3 + 2 * w.cd AS euler_term
FROM wagg w JOIN pagg p ON p.tx = w.tx AND p.ty = w.ty
"""


@register("q_euler_green", None)  # generated oracle attached below
def q_euler_green(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Patch TOPOLOGY of the green mask (quantised NDVI > 0) without a
    label-merge: Gray's-algorithm 2×2 quad counts per tile, whose
    global sum / 4 is the 4-connectivity Euler number = #green patches
    − #holes (scikit-image ``euler_number`` semantics).  Every window
    of the zero-padded mask is owned by exactly ONE tile, so the
    statistic is perfectly distributive — the landscape-ecology
    fragmentation metric a 100 TB raster can actually afford.  The
    oracle enumerates all (npx+1)² windows independently; the engine
    runs one halo exchange."""
    from .operators.focal import euler_tile_stats

    return euler_tile_stats(city.tiles_df(spark, "ndvi"), city.grid())


ORACLES["q_euler_green"] = _euler_oracle()


# ---------------------------------------------------------------------------
# q_edge_density — green-mask perimeter per tile (FRAGSTATS edge metric)
# ---------------------------------------------------------------------------


def _edge_density_oracle(quant: float = 1e6) -> str:
    npx = city.NPX

    def mq(x_expr: str, y_expr: str) -> str:
        q = (
            "CAST(round(("
            + city.NDVI_SQL.format(
                px_x=f"{city.X0} + (({x_expr}) + 0.5) * {city.RES}",
                px_y=f"{city.Y0} + (({y_expr}) + 0.5) * {city.RES}",
            )
            + f") * {quant}) AS BIGINT)"
        )
        return (
            f"(CASE WHEN ({x_expr}) BETWEEN 0 AND {npx - 1}"
            f" AND ({y_expr}) BETWEEN 0 AND {npx - 1}"
            f" AND ({q}) > 0 THEN 1 ELSE 0 END)"
        )

    nw = npx + 1
    return f"""
WITH hp AS (
  SELECT i % {nw} - 1 AS hx, i // {nw} AS hy
  FROM (SELECT unnest(generate_series(0, {nw * npx - 1})) AS i)
),
ha AS (SELECT least(hx + 1, {npx - 1}) // {city.TILE_PX} AS tx,
              hy // {city.TILE_PX} AS ty,
              CAST(count(*) FILTER (
                WHERE {mq('hx', 'hy')} <> {mq('hx + 1', 'hy')}
              ) AS BIGINT) AS h_edges
       FROM hp GROUP BY tx, ty),
vp AS (
  SELECT i % {npx} AS vx, i // {npx} - 1 AS vy
  FROM (SELECT unnest(generate_series(0, {npx * nw - 1})) AS i)
),
va AS (SELECT vx // {city.TILE_PX} AS tx,
              least(vy + 1, {npx - 1}) // {city.TILE_PX} AS ty,
              CAST(count(*) FILTER (
                WHERE {mq('vx', 'vy')} <> {mq('vx', 'vy + 1')}
              ) AS BIGINT) AS v_edges
       FROM vp GROUP BY tx, ty)
SELECT h.tx, h.ty, h.h_edges, v.v_edges,
       h.h_edges + v.v_edges AS n_edges,
       round(CAST(h.h_edges + v.v_edges AS DOUBLE) * {city.RES!r}, 6)
         AS perim_m
FROM ha h JOIN va v ON v.tx = h.tx AND v.ty = h.ty
"""


@register("q_edge_density", None)  # generated oracle attached below
def q_edge_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Green-mask boundary length per tile — the count of 4-adjacent
    (green, non-green) pixel pairs (raster border zero-padded) times
    the 10 m pixel size.  Together with q_mean_ndvi's area terms and
    q_euler_green's patch topology this is the FRAGSTATS core
    (area / perimeter / fragmentation), every term an exact int64
    partial sum over tiles with each adjacency owned by exactly one
    tile.  The oracle enumerates all horizontal and vertical pairs
    independently; the engine runs the shared halo exchange."""
    from .operators.focal import edge_density_tile_stats

    return edge_density_tile_stats(city.tiles_df(spark, "ndvi"), city.grid())


ORACLES["q_edge_density"] = _edge_density_oracle()


# ---------------------------------------------------------------------------
# q_window_stream — watermarked tumbling-window streaming aggregate
# ---------------------------------------------------------------------------


@register(
    "q_window_stream",
    """
WITH cutoff AS (SELECT max(ts) - INTERVAL 2 DAY AS wm FROM events),
w AS (SELECT event_type, date_trunc('day', ts) AS ws FROM events)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
       strftime(ws + INTERVAL 1 DAY, '%Y-%m-%d %H:%M:%S') AS win_end,
       event_type, CAST(count(*) AS BIGINT) AS n_events
FROM w, cutoff
WHERE ws + INTERVAL 1 DAY <= wm
GROUP BY ws, event_type
""",
)
def q_window_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregate in the gate: two
    AvailableNow drains of the event table (the second — an empty
    delta file — advances the watermark past the last closed windows
    and flushes them from the state store), append-mode semantics: a
    window reaches the sink iff its end <= final watermark
    (max event time − 2 days).  The oracle is the batch twin —
    date_trunc GROUP BY plus the same closure predicate — so the
    streaming state machine is hash-checked against closed-form SQL.
    Session timezone is UTC (greenex_py_spark/session.py), making
    Spark's epoch-aligned 1-day windows equal date_trunc('day')."""
    import atexit
    import os
    import shutil
    import tempfile

    from .streaming.ingest import windowed_event_counts
    from .streaming.stage import (
        append_empty_delta,
        drain_shuffle_partitions,
        stage_events,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"q_window_stream_{os.getpid()}"
    )
    shutil.rmtree(base, ignore_errors=True)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    src, sink, ckpt = (os.path.join(base, d) for d in ("src", "sink", "ckpt"))
    stage_events(sf_dir, src)
    with drain_shuffle_partitions(spark):
        windowed_event_counts(spark, src, sink, ckpt)
        # empty delta: one more micro-batch in which the watermark-closed
        # windows are evicted from state into the sink
        append_empty_delta(src)
        windowed_event_counts(spark, src, sink, ckpt)
    out = spark.read.parquet(sink)
    return out.select(
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        F.date_format("win_end", "yyyy-MM-dd HH:mm:ss").alias("win_end"),
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "q_pivot_unpivot",
    f"""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type, CAST(count(*) AS BIGINT) AS n_events
FROM events
WHERE event_type IN {_EVENT_TYPES}
GROUP BY 1, 2
""",
)
def q_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot → unpivot round trip: daily counts pivoted wide (one
    column per event type — the report/export shape) then melted back
    to long form with ``DataFrame.unpivot`` (Spark's UNPIVOT/stack
    surface).  The round trip is lossless for present cells — the
    oracle is the plain GROUP BY the composition must reproduce;
    absent (day, type) cells surface as NULL in the wide frame and
    are dropped on the way back, matching the grouped form exactly.
    Pivot values are an explicit literal list, so the wide schema is
    static and NO extra distinct-scan job runs at plan time."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type").isin(*_EVENT_TYPES)
    )
    wide = (
        ev.groupBy(
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
            .alias("day")
        )
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    long = wide.unpivot(
        ["day"], list(_EVENT_TYPES), "event_type", "n_events"
    )
    return long.filter(F.col("n_events").isNotNull()).select(
        "day", "event_type", F.col("n_events").cast("long").alias("n_events")
    )


# ---------------------------------------------------------------------------
# q_sliding_stream — watermarked SLIDING-window streaming aggregate
# ---------------------------------------------------------------------------


@register(
    "q_sliding_stream",
    """
WITH cutoff AS (SELECT max(ts) - INTERVAL 2 DAY AS wm FROM events),
w AS (
  SELECT event_type,
         date_trunc('day', ts) - k.k * INTERVAL 1 DAY AS ws
  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) k
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
       strftime(ws + INTERVAL 2 DAY, '%Y-%m-%d %H:%M:%S') AS win_end,
       event_type, CAST(count(*) AS BIGINT) AS n_events
FROM w, cutoff
WHERE ws + INTERVAL 2 DAY <= wm
GROUP BY ws, event_type
""",
)
def q_sliding_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked SLIDING-window aggregate (2-day window hopping by
    1 day) — the overlapping-window Structured Streaming surface
    beside q_window_stream's tumbling one: every event lands in TWO
    windows (Spark expands before the stateful agg; state grows by
    the overlap factor).  Same two-drain AvailableNow harness; the
    oracle replicates the expansion with an explicit k ∈ {0,1} offset
    cross join plus the identical closure predicate."""
    import atexit
    import os
    import shutil
    import tempfile

    from .streaming.ingest import windowed_event_counts
    from .streaming.stage import (
        append_empty_delta,
        drain_shuffle_partitions,
        stage_events,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"q_sliding_stream_{os.getpid()}"
    )
    shutil.rmtree(base, ignore_errors=True)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    src, sink, ckpt = (os.path.join(base, d) for d in ("src", "sink", "ckpt"))
    stage_events(sf_dir, src)
    with drain_shuffle_partitions(spark):
        windowed_event_counts(
            spark, src, sink, ckpt, window="2 days", slide="1 day"
        )
        append_empty_delta(src)
        windowed_event_counts(
            spark, src, sink, ckpt, window="2 days", slide="1 day"
        )
    out = spark.read.parquet(sink)
    return out.select(
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        F.date_format("win_end", "yyyy-MM-dd HH:mm:ss").alias("win_end"),
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# q_interval_join — bucketed point-in-interval join on the event stream
# ---------------------------------------------------------------------------


_IV_EPOCH0 = 1704067200  # 2024-01-01 00:00:00 UTC
_IV_N = 40


@register(
    "q_interval_join",
    f"""
WITH iv AS (
  SELECT i AS iv_id,
         TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 17 HOUR AS s,
         TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 17 HOUR
           + (i % 5 + 1) * INTERVAL 1 HOUR AS e,
         'w' || CAST(i % 3 AS VARCHAR) AS tag
  FROM (SELECT unnest(generate_series(0, {_IV_N - 1})) AS i)
)
SELECT iv.iv_id, iv.tag, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(ev.value * 1000000) AS BIGINT)) AS BIGINT)
         AS sum_vq
FROM iv JOIN events ev ON ev.ts >= iv.s AND ev.ts < iv.e
GROUP BY iv.iv_id, iv.tag
""",
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join (events × planted campaign windows:
    40 closed-form intervals, 1-5 h long, every 17 h) via the bucketed
    equi-join of operators/interval.py — a hash join on the day
    bucket plus a residual range filter, never the
    BroadcastNestedLoopJoin Spark would pick for a raw BETWEEN join.
    Values are quantised to int64 before summing so the aggregate is
    order-free; the oracle runs the naive range join directly."""
    from .operators.interval import interval_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    iid = F.col("id")
    iv = spark.range(_IV_N).select(
        iid.alias("iv_id"),
        F.timestamp_seconds(F.lit(_IV_EPOCH0) + iid * 17 * 3600).alias("s"),
        F.timestamp_seconds(
            F.lit(_IV_EPOCH0) + iid * 17 * 3600 + (iid % 5 + 1) * 3600
        ).alias("e"),
        F.concat(F.lit("w"), (iid % 3).cast("string")).alias("tag"),
    )
    j = interval_join(ev, iv, ts_col="ts", start_col="s", end_col="e")
    return j.groupBy("iv_id", "tag").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 1000000).cast("long")).alias("sum_vq"),
    )


# ---------------------------------------------------------------------------
# q_focal_majority — 3×3 modal filter on the landcover raster
# ---------------------------------------------------------------------------


def _focal_majority_oracle() -> str:
    npx = city.NPX
    cls_nb = city.LC_SQL.format(ix="ix + dx", iy="iy + dy")
    return f"""
WITH px AS (
  SELECT i % {npx} AS ix, i // {npx} AS iy
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
),
offs(dx, dy) AS (VALUES (-1,-1),(0,-1),(1,-1),(-1,0),(0,0),(1,0),
                        (-1,1),(0,1),(1,1)),
nb AS (SELECT ix, iy, ({cls_nb}) AS cls
       FROM px CROSS JOIN offs
       WHERE ix + dx BETWEEN 0 AND {npx - 1}
         AND iy + dy BETWEEN 0 AND {npx - 1}),
cnts AS (SELECT ix, iy, cls, count(*) AS cnt
         FROM nb GROUP BY ix, iy, cls),
md AS (SELECT ix, iy, max(cnt * 128 + (127 - cls)) AS k
       FROM cnts GROUP BY ix, iy)
SELECT ix // {city.TILE_PX} AS tx, iy // {city.TILE_PX} AS ty,
       CAST(127 - (k % 128) AS BIGINT) AS mode_class,
       CAST(count(*) AS BIGINT) AS n_px
FROM md GROUP BY tx, ty, mode_class
"""


@register("q_focal_majority", None)  # generated oracle attached below
def q_focal_majority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3×3 focal MAJORITY filter over the categorical landcover raster
    (ArcGIS Focal Statistics MAJORITY / GRASS r.neighbors mode — the
    salt-and-pepper smoothing pass before zonal landcover stats such
    as q_landcover_pct), histogrammed per tile.  Ties break to the
    smallest class code; edge pixels see fewer neighbours.  Exact
    integer counts end to end; the oracle packs the per-pixel argmax
    into one ``cnt·128 + (127 − class)`` max while the engine runs
    per-class shifted adds over the shared halo canvas — the two
    sides share no code path."""
    from .operators.focal import majority_tile_counts

    return majority_tile_counts(
        city.tiles_df(spark, "landcover"), city.grid(),
        class_values=list(city.LC_CLASSES), quant=1.0,
    )


ORACLES["q_focal_majority"] = _focal_majority_oracle()


# ---------------------------------------------------------------------------
# q_gram_cov — exact distributed Gram / covariance screen on embeddings
# ---------------------------------------------------------------------------


def _gram_cov_oracle(k: int = 20, quant: float = 1e6) -> str:
    dim = _embedding_dim()
    return f"""
WITH x AS (SELECT vec_id, i - 1 AS di,
                  -- cast BEFORE the multiply: FLOAT * DOUBLE runs in
                  -- float32 in DuckDB and flips quantisation boundaries
                  CAST(round(CAST(embedding[i] AS DOUBLE) * {quant!r})
                       AS BIGINT) AS xq
           FROM embeddings,
                (SELECT unnest(generate_series(1, {dim})) AS i) dims),
nn AS (SELECT count(*) AS n FROM embeddings),
s AS (SELECT di, CAST(sum(xq) AS BIGINT) AS sx FROM x GROUP BY di),
p AS (SELECT a.di AS di, b.di AS dj,
             CAST(sum(a.xq * b.xq) AS BIGINT) AS sxy
      FROM x a JOIN x b ON b.vec_id = a.vec_id AND b.di > a.di
      GROUP BY a.di, b.di),
c AS (SELECT p.di, p.dj, p.sxy,
             nn.n * p.sxy - sa.sx * sb.sx AS cov_num
      FROM p CROSS JOIN nn
      JOIN s sa ON sa.di = p.di
      JOIN s sb ON sb.di = p.dj),
r AS (SELECT di, dj, sxy, cov_num,
             row_number() OVER (ORDER BY abs(cov_num) DESC, di, dj) AS rank
      FROM c)
SELECT di, dj, sxy, cov_num, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


@register("q_gram_cov", None)  # generated oracle attached below
def q_gram_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 dimension pairs of the embedding store by |covariance| —
    the feature-correlation screen before whitening/PCA — via exact
    integer Gram partials: each Arrow batch reduces to one O(d²)
    partial (XᵀX upper triangle + sums + count) so raw vectors never
    shuffle; the covariance numerator n·Σxy − Σx·Σy is exact int64,
    order-free on both engines.  The oracle unnests components and
    runs the naive pair join — no shared code path."""
    from .functions.similarity import gram_covariance_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return gram_covariance_topk(emb, dim=_embedding_dim())


ORACLES["q_gram_cov"] = _gram_cov_oracle()


# ---------------------------------------------------------------------------
# q_hex_bin — H3-style hexagonal cell assignment + density
# ---------------------------------------------------------------------------


_HEX_SIZE = 400.0  # hex circumradius, m


def _hex_bin_oracle() -> str:
    from .geo.cells import hex_cell_sql

    hq, hr = hex_cell_sql("x", "y", _HEX_SIZE)
    return f"""
WITH pts AS ({city.points_sql()}),
h AS (SELECT {hq} AS hq, {hr} AS hr,
             CASE WHEN doc_id % 10 < 6 THEN 1 ELSE 0 END AS core
      FROM pts)
SELECT hq, hr, CAST(count(*) AS BIGINT) AS n_pts,
       CAST(sum(core) AS BIGINT) AS n_core
FROM h GROUP BY hq, hr
"""


@register("q_hex_bin", None)  # generated oracle attached below
def q_hex_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hexagonal cell density of the geocoded corpus points — the
    H3-style binning of the north star (planar axial lattice; true
    icosahedral H3 needs the h3 lib, absent here — join/agg shapes are
    identical).  Cell assignment is cube rounding rendered from ONE
    constant set into both engines (geo/cells.py:hex_cell_cols /
    hex_cell_sql) — every per-row op a correctly-rounded IEEE
    primitive in fixed order, so the int cell ids are bit-identical.
    Pure codegen: no UDF, one map-side-combinable aggregate."""
    from .geo.cells import hex_cell_cols

    pts = city.points_df(spark, sf_dir)
    hq, hr = hex_cell_cols(F.col("x"), F.col("y"), _HEX_SIZE)
    return (
        pts.select(
            hq, hr,
            F.when(F.col("doc_id") % 10 < 6, F.lit(1)).otherwise(F.lit(0)).alias("core"),
        )
        .groupBy("hq", "hr")
        .agg(
            F.count(F.lit(1)).alias("n_pts"),
            F.sum("core").cast("long").alias("n_core"),
        )
    )


ORACLES["q_hex_bin"] = _hex_bin_oracle()


# ---------------------------------------------------------------------------
# q_resample_bilinear — R2 with the bilinear kernel on an offset grid
# ---------------------------------------------------------------------------

_RB_OX, _RB_OY, _RB_RES, _RB_NPX, _RB_TPX = 6.0, 9.0, 7.0, 500, 128

# ORACLE PRECONDITION (same shape as q_resample's): the oracle evaluates
# the 2×2 stencil unconditionally, the engine emits NaN when any of the
# 4 source neighbours is outside the raster — so the target grid must
# keep every stencil inside: first center >= half a source px past the
# left/bottom source CENTER row, last center < the right/top one.
for _off, _n in ((_RB_OX, _RB_NPX), (_RB_OY, _RB_NPX)):
    assert _off + 0.5 * _RB_RES >= 0.5 * city.RES, "q_resample_bilinear stencil underrun"
    assert _off + (_n - 0.5) * _RB_RES <= (city.NPX - 0.5) * city.RES, (
        "q_resample_bilinear stencil overrun"
    )


def _rb_oracle() -> str:
    u = f"((({city.X0 + _RB_OX} + (i.range + 0.5) * {_RB_RES}) - {city.X0}) / {city.RES} - 0.5)"
    v = f"((({city.Y0 + _RB_OY} + (j.range + 0.5) * {_RB_RES}) - {city.Y0}) / {city.RES} - 0.5)"

    def val(io: str, jo: str) -> str:
        return city.NDVI_SQL.format(
            px_x=f"{city.X0} + ((i0 + {io}) + 0.5) * {city.RES}",
            px_y=f"{city.Y0} + ((j0 + {jo}) + 0.5) * {city.RES}",
        )

    return f"""
WITH g AS (
  SELECT CAST(i.range // {_RB_TPX} AS BIGINT) AS tx,
         CAST(j.range // {_RB_TPX} AS BIGINT) AS ty,
         CAST(floor({u}) AS BIGINT) AS i0,
         CAST(floor({v}) AS BIGINT) AS j0,
         {u} - floor({u}) AS fx,
         {v} - floor({v}) AS fy
  FROM range({_RB_NPX}) i, range({_RB_NPX}) j
),
b AS (
  SELECT tx, ty,
         ((1.0 - fy) * ((1.0 - fx) * ({val('0', '0')}) + fx * ({val('1', '0')}))
          + fy * ((1.0 - fx) * ({val('0', '1')}) + fx * ({val('1', '1')}))) AS val
  FROM g
)
SELECT tx, ty,
       CAST(sum(CAST(floor(val * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS checksum_e6,
       count(*) AS n_px
FROM b GROUP BY tx, ty
"""


@register("q_resample_bilinear", None)  # generated oracle attached below
def q_resample_bilinear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2 with the BILINEAR kernel (gdal.Warp -r bilinear companion to
    q_resample's nearest gather): the 10 m NDVI raster interpolated
    onto a 7 m grid offset by (6, 9) m, per-target-tile quantized
    integer checksums.  The mixing chain (top/bot/val association
    order) is rendered identically in the Arrow kernel and this
    oracle; fractional offsets fx/fy are exact doubles on both
    engines, so agreement is ulp-level before the 1e-6 quantize."""
    from .geo.grid import GridSpec
    from .operators.resample import resample_bilinear

    tiles = city.tiles_df(spark, "ndvi")
    dst = GridSpec(
        city.X0 + _RB_OX, city.Y0 + _RB_OY, _RB_RES, _RB_TPX, _RB_NPX, _RB_NPX
    )
    out = resample_bilinear(tiles, dst, src_grid=city.grid())
    return (
        out.select(
            F.col("tx").cast("long").alias("tx"),
            F.col("ty").cast("long").alias("ty"),
            F.explode("px").alias("v"),
        )
        .groupBy("tx", "ty")
        .agg(
            F.sum(F.floor(F.col("v") * 1000000 + 0.5).cast("long")).alias("checksum_e6"),
            F.count("*").alias("n_px"),
        )
    )


ORACLES["q_resample_bilinear"] = _rb_oracle()


# ---------------------------------------------------------------------------
# q_clark_evans — nearest-neighbour aggregation index of the corpus points
# ---------------------------------------------------------------------------


@register(
    "q_clark_evans",
    f"""
WITH pts AS ({city.points_sql()}),
pr AS (SELECT a.doc_id,
              (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2,
              row_number() OVER (
                PARTITION BY a.doc_id
                ORDER BY (a.x - b.x) * (a.x - b.x)
                         + (a.y - b.y) * (a.y - b.y), b.doc_id) AS rn
       FROM pts a JOIN pts b ON b.doc_id != a.doc_id),
nn AS (SELECT CAST(floor(sqrt(d2) * 1000000.0 + 0.5) AS BIGINT) AS dq
       FROM pr WHERE rn = 1),
ag AS (SELECT CAST(count(*) AS BIGINT) AS n_pts,
              CAST(sum(dq) AS BIGINT) AS sum_dq FROM nn)
SELECT n_pts, sum_dq,
       round((CAST(sum_dq AS DOUBLE) / CAST(n_pts AS DOUBLE) / 1000000.0)
             / (0.5 * sqrt({city.EXTENT * city.EXTENT!r}
                           / CAST(n_pts AS DOUBLE))), 6) AS r_ce
FROM ag
""",
)
def q_clark_evans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clark & Evans nearest-neighbour index of the geocoded corpus —
    the one-number clustered-vs-dispersed verdict (R << 1 here: 60% of
    pages geocode into the 1 km urban core).  Completes the
    point-pattern family next to quadrat CSR and Ripley's K.  1-NN by
    the bounded cell tier with exact-d² ranking; each distance
    quantised floor(sqrt·1e6+0.5) (IEEE sqrt is correctly rounded →
    engine-portable int) and summed exactly; the oracle runs the
    brute-force all-pairs window."""
    from .operators.spatial_stats import clark_evans

    pts = city.points_df(spark, sf_dir)
    return clark_evans(pts, area=city.EXTENT * city.EXTENT, nn_bound=300.0)


# ---------------------------------------------------------------------------
# q_skyline — Pareto frontier of documents on (length, vocabulary)
# ---------------------------------------------------------------------------


@register(
    "q_skyline",
    """
WITH m AS (SELECT doc_id, n_chars,
                  CAST(length(list_distinct(string_split(text, ' ')))
                       AS BIGINT) AS n_uniq
           FROM documents),
g AS (SELECT n_chars, max(n_uniq) AS ymax FROM m GROUP BY n_chars),
f AS (SELECT n_chars, ymax,
             max(ymax) OVER (ORDER BY n_chars DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS prev
      FROM g)
SELECT m.doc_id, m.n_chars, m.n_uniq
FROM m JOIN f ON f.n_chars = m.n_chars AND m.n_uniq = f.ymax
WHERE f.prev IS NULL OR f.ymax > f.prev
""",
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) selection of documents maximising
    (n_chars, distinct-token count) — the dominance-based shortlist a
    curation pipeline runs when it refuses to pick weights between
    quality axes (Börzsönyi et al., ICDE 2001).  2-D case needs no
    pairwise join: two map-side aggregates + one window over the
    frontier-sized distinct-x set (operators/skyline.py); integer
    metrics make dominance engine-exact.  The oracle mirrors the
    closed-form window characterisation."""
    from .operators.skyline import skyline_2d

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = docs.select(
        "doc_id", "n_chars",
        F.size(F.array_distinct(F.split(F.col("text"), " ")))
        .cast("long").alias("n_uniq"),
    )
    return skyline_2d(m, "n_chars", "n_uniq")


# ---------------------------------------------------------------------------
# q_anchor_text — per-destination-host anchor-text index
# ---------------------------------------------------------------------------


_ANCHOR_RE_SQL = r'(?i)<a\s[^>]*?href\s*=\s*"([^"]*)"[^>]*>([^<]*)</a>'


@register(
    "q_anchor_text",
    "WITH " + _LINK_GRAPH_CTE + f""",
ea AS (SELECT lower(regexp_extract(url, '^https?://([^/]+)', 1)) AS src_host,
              unnest(regexp_extract_all(page, '{_ANCHOR_RE_SQL}', 1)) AS href,
              unnest(regexp_extract_all(page, '{_ANCHOR_RE_SQL}', 2)) AS anchor
       FROM p),
ra AS (SELECT CASE WHEN regexp_matches(href, '(?i)^https?://')
                     THEN lower(regexp_extract(href,
                            '(?i)^https?://([^/]+)', 1))
                   WHEN href LIKE '//%'
                     THEN lower(regexp_extract(href, '^//([^/]+)', 1))
                   ELSE src_host END AS dst_host,
              anchor
       FROM ea
       WHERE NOT (href = ''
                  OR regexp_matches(href, '(?i)^(#|mailto:|javascript:)'))),
ca AS (SELECT dst_host, anchor, count(*) AS cnt
       FROM ra GROUP BY dst_host, anchor),
wa AS (SELECT dst_host, anchor, cnt,
              row_number() OVER (PARTITION BY dst_host
                                 ORDER BY cnt DESC, anchor) AS rn,
              sum(cnt) OVER (PARTITION BY dst_host) AS tot,
              count(*) OVER (PARTITION BY dst_host) AS ntex
       FROM ca)
SELECT dst_host, CAST(tot AS BIGINT) AS n_anchors,
       CAST(ntex AS BIGINT) AS n_texts,
       anchor AS top_anchor, CAST(cnt AS BIGINT) AS top_n
FROM wa WHERE rn = 1
""",
)
def q_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text index per destination host over the SAME planted
    crawl pages as q_link_graph: the (href, text) pairs come out of
    one two-group regex run twice and zipped positionally, hrefs
    resolve by the shared CASE rules, and the per-host top anchor is
    a window argmax with a deterministic text-ascending tiebreak —
    what OTHER pages call a host, the classic search/quality
    relevance signal mined from crawls.  Pure codegen + one window;
    no UDFs."""
    from .functions.links import anchor_text_profile

    return anchor_text_profile(_link_pages_df(spark, sf_dir))


# ---------------------------------------------------------------------------
# q_warc_headers — WARC record-envelope parsing at scan speed
# ---------------------------------------------------------------------------


@register(
    "q_warc_headers",
    r"""
WITH k AS (SELECT chr(13) || chr(10) AS nl),
w AS (SELECT doc_id, text,
        'WARC/1.0' || nl
        || CASE WHEN doc_id % 2 = 0 THEN 'WARC-Type: response'
                ELSE 'warc-type: response' END || nl
        || 'WARC-Target-URI: https://host' || CAST(doc_id % 97 AS VARCHAR)
        || '.example/p/' || CAST(doc_id AS VARCHAR) || nl
        || 'Content-Type: text/html; charset=UTF-8' || nl
        || CASE WHEN doc_id % 3 = 0 THEN 'content-length: '
                ELSE 'Content-Length: ' END
        || CAST(n_chars AS VARCHAR) || nl || nl || text AS rec
      FROM documents, k)
SELECT doc_id,
       regexp_extract(rec, '(?i)\r\nwarc-type: *([^\r\n]*)', 1) AS warc_type,
       regexp_extract(rec, '(?i)\r\nwarc-target-uri: *([^\r\n]*)', 1)
         AS target_uri,
       regexp_extract(rec, '(?i)\r\ncontent-type: *([^\r\n]*)', 1)
         AS content_type,
       CAST(regexp_extract(rec, '(?i)\r\ncontent-length: *([^\r\n]*)', 1)
            AS BIGINT) AS content_length,
       md5(regexp_extract(rec, '(?s)\r\n\r\n(.*)$', 1)) AS body_md5,
       md5(regexp_extract(rec, '(?s)\r\n\r\n(.*)$', 1)) = md5(text)
         AS matches_text
FROM w
""",
)
def q_warc_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC envelope parsing over planted Common-Crawl-style records
    (CRLF header lines, case-alternating header names to exercise the
    RFC case-insensitivity, Content-Length from n_chars): pure-codegen
    regexp extraction at scan speed, and the body survives
    BYTE-IDENTICAL — matches_text proves body == text for every row,
    the per-row invariant the pipeline carries end-to-end."""
    from .functions.warc import parse_warc_headers

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    nl = "\r\n"
    rec = F.concat(
        F.lit("WARC/1.0" + nl),
        F.when(did % 2 == 0, F.lit("WARC-Type: response")).otherwise(
            F.lit("warc-type: response")
        ),
        F.lit(nl + "WARC-Target-URI: https://host"),
        (did % 97).cast("string"),
        F.lit(".example/p/"),
        did.cast("string"),
        F.lit(nl + "Content-Type: text/html; charset=UTF-8" + nl),
        F.when(did % 3 == 0, F.lit("content-length: ")).otherwise(
            F.lit("Content-Length: ")
        ),
        F.col("n_chars").cast("string"),
        F.lit(nl + nl),
        F.col("text"),
    )
    recs = docs.select(
        "doc_id", "text", F.encode(rec, "UTF-8").alias("record")
    )
    out = parse_warc_headers(recs)
    return out.join(
        recs.select("doc_id", F.md5(F.col("text")).alias("_tm")), "doc_id"
    ).select(
        "doc_id", "warc_type", "target_uri", "content_type",
        "content_length", "body_md5",
        (F.col("body_md5") == F.col("_tm")).alias("matches_text"),
    )


# ---------------------------------------------------------------------------
# q_od_matrix — origin→destination cell flows from event trajectories
# ---------------------------------------------------------------------------


@register(
    "q_od_matrix",
    f"""
WITH pos AS (SELECT user_id, ts, event_id,
    {city.X0} + ((event_id * 48271) % 1000000) / 1000000.0 * {city.EXTENT} AS x,
    {city.Y0} + ((event_id * 16807 + 12345) % 1000000) / 1000000.0 * {city.EXTENT} AS y
  FROM events),
c AS (SELECT user_id, ts, event_id, {city.cell_expr_sql("x", "y")} AS cell
      FROM pos),
l AS (SELECT cell,
             lag(cell) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS o
      FROM c)
SELECT o AS o_cell, cell AS d_cell, CAST(count(*) AS BIGINT) AS n_moves
FROM l WHERE o IS NOT NULL GROUP BY o, cell
""",
)
def q_od_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell→cell movement flows: events geocoded with the house LCG
    placement, per-user trajectories ordered by (ts, event_id) — the
    unique id breaks equal-timestamp ties identically in both engines —
    consecutive positions folded to directed (origin, destination) cell
    pairs and counted.  The flow-mapping / commuter-corridor shape over
    the events stream."""
    from .operators.spacetime import od_flows

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id")
    pos = ev.select(
        "user_id", "ts", "event_id",
        (F.lit(city.X0) + ((eid * 48271) % 1000000) / 1000000.0 * city.EXTENT).alias("x"),
        (F.lit(city.Y0) + ((eid * 16807 + 12345) % 1000000) / 1000000.0 * city.EXTENT).alias("y"),
    )
    return od_flows(city.with_cell(pos).drop("x", "y"))


# ---------------------------------------------------------------------------
# q_emerging_hotspots — Mann-Kendall trend over per-day cell activity
# ---------------------------------------------------------------------------


@register(
    "q_emerging_hotspots",
    f"""
WITH pos AS (SELECT event_id, ts,
    {city.X0} + ((event_id * 48271) % 1000000) / 1000000.0 * {city.EXTENT} AS x,
    {city.Y0} + ((event_id * 16807 + 12345) % 1000000) / 1000000.0 * {city.EXTENT} AS y
  FROM events),
g AS (SELECT CAST(floor((x - {city.X0}) / 1000.0) AS BIGINT) AS gx,
             CAST(floor((y - {city.Y0}) / 1000.0) AS BIGINT) AS gy,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS b
      FROM pos),
cnt AS (SELECT gx, gy, b, count(*) AS v FROM g GROUP BY gx, gy, b),
keys AS (SELECT DISTINCT gx, gy FROM cnt),
bins AS (SELECT CAST(range AS BIGINT) AS b FROM range(30)),
dense AS (SELECT k.gx, k.gy, bins.b, COALESCE(cnt.v, 0) AS v
          FROM keys k CROSS JOIN bins
          LEFT JOIN cnt ON cnt.gx = k.gx AND cnt.gy = k.gy AND cnt.b = bins.b),
s AS (SELECT a.gx, a.gy,
             CAST(SUM(CASE WHEN p.v > a.v THEN 1
                           WHEN p.v < a.v THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM dense a JOIN dense p
        ON a.gx = p.gx AND a.gy = p.gy AND a.b < p.b
      GROUP BY a.gx, a.gy),
t AS (SELECT gx, gy,
             CAST(SUM(tt * (tt - 1) * (2 * tt + 5)) AS BIGINT) AS ties
      FROM (SELECT gx, gy, v, count(*) AS tt
            FROM dense GROUP BY gx, gy, v) q
      GROUP BY gx, gy),
j AS (SELECT s.gx, s.gy, s_stat,
             CAST(56550 - ties AS BIGINT) AS var_num
      FROM s JOIN t ON s.gx = t.gx AND s.gy = t.gy),
z AS (SELECT gx, gy, s_stat, var_num,
             round(CASE WHEN s_stat > 0
                          THEN (s_stat - 1) / sqrt(var_num / 18.0)
                        WHEN s_stat < 0
                          THEN (s_stat + 1) / sqrt(var_num / 18.0)
                        ELSE 0.0 END + 0.0, 6) AS mk_z
      FROM j)
SELECT gx, gy, s_stat, var_num, mk_z,
       CASE WHEN mk_z >= 1.96 THEN 'increasing'
            WHEN mk_z <= -1.96 THEN 'decreasing'
            ELSE 'none' END AS trend
FROM z
""",
)
def q_emerging_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emerging-hotspot core (ESRI space-time-cube shape): events
    geocoded to 1 km cells, binned per day (30 dense bins, absent days
    zero-filled), Mann-Kendall S / tie-adjusted variance / z computed
    per cell — all integers until one sqrt+divide — and labelled
    increasing / decreasing / none on the ROUNDED z."""
    from .operators.spatial_stats import mann_kendall_trend

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id")
    pos = ev.select(
        "ts",
        (F.lit(city.X0) + ((eid * 48271) % 1000000) / 1000000.0 * city.EXTENT).alias("x"),
        (F.lit(city.Y0) + ((eid * 16807 + 12345) % 1000000) / 1000000.0 * city.EXTENT).alias("y"),
    )
    cnt = (
        pos.select(
            F.floor((F.col("x") - city.X0) / 1000.0).cast("long").alias("gx"),
            F.floor((F.col("y") - city.Y0) / 1000.0).cast("long").alias("gy"),
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("b"),
        )
        .groupBy("gx", "gy", "b")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    return mann_kendall_trend(
        cnt, key_cols=("gx", "gy"), bin_col="b", val_col="v", n_bins=30
    )


# ---------------------------------------------------------------------------
# q_street_orientation — length-weighted bearing histogram, no atan2
# ---------------------------------------------------------------------------


def _street_orientation_oracle() -> str:
    from .operators.streets import orientation_thresholds

    terms = " + ".join(
        f"CASE WHEN dy * {c!r} - dx * {s!r} >= 0 THEN 1 ELSE 0 END"
        for c, s in orientation_thresholds()
    )
    return f"""
WITH ids AS (SELECT CAST(range AS BIGINT) AS i FROM range(2601)),
ed AS (SELECT i AS src, i + 1 AS dst FROM ids WHERE i % 51 < 50
       UNION ALL
       SELECT i AS src, i + 51 AS dst FROM ids WHERE i // 51 < 50),
pts AS ({city.points_sql()}),
seg AS (SELECT {city.X0} + (src % 51) * 200.0 AS x1,
               {city.Y0} + (src // 51) * 200.0 AS y1,
               {city.X0} + (dst % 51) * 200.0 AS x2,
               {city.Y0} + (dst // 51) * 200.0 AS y2
        FROM ed
        UNION ALL
        SELECT x AS x1, y AS y1,
               x + (37 + doc_id % 50) AS x2, y + (23 + doc_id % 70) AS y2
        FROM pts),
n AS (SELECT CASE WHEN (y2 - y1) < 0 OR ((y2 - y1) = 0 AND (x2 - x1) < 0)
                  THEN -(x2 - x1) ELSE x2 - x1 END AS dx,
             CASE WHEN (y2 - y1) < 0 OR ((y2 - y1) = 0 AND (x2 - x1) < 0)
                  THEN -(y2 - y1) ELSE y2 - y1 END AS dy
      FROM seg WHERE NOT (x2 - x1 = 0 AND y2 - y1 = 0)),
b AS (SELECT ({terms}) AS bin,
             CAST(round(sqrt(dx * dx + dy * dy) * 1000000.0) AS BIGINT) AS lq
      FROM n),
g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_segments,
             CAST(sum(lq) AS BIGINT) AS len
      FROM b GROUP BY bin)
SELECT bin, n_segments,
       round(CAST(len AS DOUBLE)
             / (SELECT CAST(sum(lq) AS BIGINT) FROM b), 6) AS len_share
FROM g
"""


@register("q_street_orientation", None)  # generated oracle attached below
def q_street_orientation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boeing-style length-weighted street-bearing histogram (10° bins,
    undirected) over lattice + per-doc diagonal traces: bin = count of
    half-plane threshold tests passed (shared cos/sin literals — NO
    atan2, whose JVM-vs-libm ulp differences would flip bins at the
    exact axis bearings a lattice is full of); micrometer-exact
    length sums, one round-6 share division."""
    from .data.city_fixture import network_dfs
    from .operators.streets import street_orientation_hist

    _, edges = network_dfs(spark)
    seg = edges.filter(F.col("src") < F.col("dst")).select(
        F.col("geom_xs")[0].alias("x1"),
        F.col("geom_ys")[0].alias("y1"),
        F.col("geom_xs")[1].alias("x2"),
        F.col("geom_ys")[1].alias("y2"),
    )
    pts = city.points_df(spark, sf_dir)
    did = F.col("doc_id")
    traces = pts.select(
        F.col("x").alias("x1"),
        F.col("y").alias("y1"),
        (F.col("x") + (37 + did % 50)).alias("x2"),
        (F.col("y") + (23 + did % 70)).alias("y2"),
    )
    return street_orientation_hist(seg.unionByName(traces))


ORACLES["q_street_orientation"] = _street_orientation_oracle()


# ---------------------------------------------------------------------------
# q_huff_shares — truncated Huff gravity market shares
# ---------------------------------------------------------------------------


@register(
    "q_huff_shares",
    f"""
WITH pts AS ({city.points_sql()}),
gs_ids AS ({city.gs_ids_sql()}),
gs AS ({city.greenspace_sql()}),
c AS (SELECT p.doc_id, g.gs_id,
             CAST(round(g.area
                        / greatest((p.x - g.cx) * (p.x - g.cx)
                                   + (p.y - g.cy) * (p.y - g.cy), 1.0)
                        * 1000000000.0) AS BIGINT) AS wq
      FROM pts p, gs g
      WHERE (p.x - g.cx) * (p.x - g.cx)
            + (p.y - g.cy) * (p.y - g.cy) <= 9000000.0),
w AS (SELECT doc_id, gs_id, wq,
             CAST(sum(wq) OVER (PARTITION BY doc_id) AS BIGINT) AS den,
             count(*) OVER (PARTITION BY doc_id) AS n
      FROM c),
p2 AS (SELECT doc_id, gs_id, round(CAST(wq AS DOUBLE) / den, 6) AS p,
              CAST(n AS BIGINT) AS n_considered
       FROM w),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY p DESC, gs_id) AS rn
      FROM p2)
SELECT doc_id, gs_id, p AS p_top, n_considered FROM r WHERE rn = 1
""",
)
def q_huff_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated Huff gravity model over the greenspace layer: each
    point splits patronage among facilities within 3 km by area/d²
    (d² clamped ≥ 1), keeping the argmax facility and its share.
    Gravity terms are integer-quantized BEFORE the per-point
    normalizer so the denominator is an exact order-free sum; the
    facility layer is a broadcast dim (the gazetteer assumption,
    documented swap to cell-cover join at planetary scale)."""
    from .operators.accessibility import huff_shares

    pts = city.points_df(spark, sf_dir)
    gs = city.greenspace_df(spark)
    return huff_shares(pts, gs, radius=3000.0)


# ---------------------------------------------------------------------------
# q_hilbert_layout — Hilbert-curve write-layout audit (Morton's sibling)
# ---------------------------------------------------------------------------


def _hilbert_oracle() -> str:
    from .engine.layout import hilbert_sql_ctes

    return (
        _CTE
        + f""",
{_POINT_CELLS_SQL.strip()},
{hilbert_sql_ctes('d', order=7)}
SELECT hd >> 6 AS file_id, count(*) AS n_rows,
       count(DISTINCT gy * {city.CELL_BASE} + gx) AS n_cells,
       max(gx) - min(gx) + 1 AS gx_span, max(gy) - min(gy) + 1 AS gy_span,
       min(hd) AS hmin, max(hd) AS hmax
FROM h7 GROUP BY 1
"""
    )


@register("q_hilbert_layout", None)  # generated oracle attached below
def q_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve write-layout audit — the locality-tighter sibling
    of q_zorder_layout (Iceberg 1.4+ OPTIMIZE's other curve): the
    classic per-bit rotate/reflect walk as a FIXED 7-round integer
    state machine, rendered for Spark as a chained projection and for
    the oracle as chained CTE levels from the SAME generator
    (engine/layout.hilbert_sql_ctes).  Same static curve-range binning
    and per-file locality report as the Morton twin, so the two
    layouts are directly comparable file-for-file."""
    from .engine.layout import hilbert_layout_stats

    pts = city.points_df(spark, sf_dir)
    cells = pts.select(
        F.floor((F.col("x") - city.X0) / city.CELL).cast("long").alias("gx"),
        F.floor((F.col("y") - city.Y0) / city.CELL).cast("long").alias("gy"),
    )
    return hilbert_layout_stats(cells, shift=6, order=7)


ORACLES["q_hilbert_layout"] = _hilbert_oracle()


# ---------------------------------------------------------------------------
# q_spatial_moments — per-source geographic footprint (SDE core)
# ---------------------------------------------------------------------------


@register(
    "q_spatial_moments",
    f"""
WITH pts AS ({city.points_sql()}),
j AS (SELECT d.source, CAST(round(p.x * 1000000.0) AS BIGINT) AS xq,
             CAST(round(p.y * 1000000.0) AS BIGINT) AS yq
      FROM pts p JOIN documents d ON d.doc_id = p.doc_id),
a AS (SELECT source, count(*) AS n,
             sum(CAST(xq AS HUGEINT)) AS sx, sum(CAST(yq AS HUGEINT)) AS sy,
             sum(CAST(xq AS HUGEINT) * xq) AS sxx,
             sum(CAST(yq AS HUGEINT) * yq) AS syy,
             sum(CAST(xq AS HUGEINT) * yq) AS sxy
      FROM j GROUP BY source)
SELECT source, CAST(n AS BIGINT) AS n,
  round(CAST(sx AS DOUBLE) / n / 1000000.0, 6) AS mean_x,
  round(CAST(sy AS DOUBLE) / n / 1000000.0, 6) AS mean_y,
  round(CAST(n * sxx - sx * sx AS DOUBLE) / n / n / 1000000000000.0
        + 0.0, 6) AS var_x,
  round(CAST(n * syy - sy * sy AS DOUBLE) / n / n / 1000000000000.0
        + 0.0, 6) AS var_y,
  round(CAST(n * sxy - sx * sy AS DOUBLE) / n / n / 1000000000000.0
        + 0.0, 6) AS cov_xy
FROM a
""",
)
def q_spatial_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source geographic footprint: mean centre + covariance of
    each domain's geocoded pages (the standard-deviational-ellipse
    core — which sources publish locally vs city-wide, the webtext×geo
    cross).  Micrometer-quantized exact DECIMAL/HUGEINT sums; centered
    second moments via the integer numerator (n·Sxx − Sx²) so there is
    NO floating-point cancellation; one division chain de-scaled to m²
    before round-6."""
    from .operators.spatial_stats import spatial_moments

    pts = city.points_df(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    return spatial_moments(pts.join(docs, "doc_id"), group_col="source")


# ---------------------------------------------------------------------------
# q_knn_accuracy — embedding-quality eval by kNN majority-vote labels
# ---------------------------------------------------------------------------


@register(
    "q_knn_accuracy",
    f"""
WITH q AS (SELECT vec_id, embedding, label FROM embeddings
           WHERE vec_id % 37 = 0),
p AS (
  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         round({_DOT.format(a='q.embedding', b='c.embedding')}
               / ({_NRM.format(a='q.embedding')}
                  * {_NRM.format(a='c.embedding')}), 6) AS sim
  FROM q, embeddings c WHERE c.vec_id <> q.vec_id
),
r AS (
  SELECT q_id, n_id,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY sim DESC, n_id ASC) AS rank
  FROM p
),
v AS (SELECT r.q_id, e.label AS nl, count(*) AS c
      FROM r JOIN embeddings e ON e.vec_id = r.n_id
      WHERE r.rank <= 10 GROUP BY r.q_id, e.label),
w AS (SELECT q_id, nl,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY c DESC, nl ASC) AS rn
      FROM v),
j AS (SELECT q.label AS label,
             CASE WHEN w.nl = q.label THEN 1 ELSE 0 END AS ok
      FROM w JOIN q ON q.vec_id = w.q_id WHERE w.rn = 1)
SELECT label, CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(ok) AS BIGINT) AS n_correct,
       round(CAST(sum(ok) AS DOUBLE) / count(*), 6) AS accuracy
FROM j GROUP BY label
""",
)
def q_knn_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality eval: every 37th vector's label predicted by
    majority vote over its exact cosine top-10 neighbours (self
    excluded, integer votes under a (count desc, label asc) total
    order), accuracy per true label — the eval a pipeline runs before
    trusting an embedding column for semantic dedup; brute-force SQL
    twin."""
    from .functions.similarity import knn_label_accuracy

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return knn_label_accuracy(emb.filter(F.col("vec_id") % 37 == 0), emb, k=10)


# ---------------------------------------------------------------------------
# q_salient_terms — tf-idf terms that distinguish each source
# ---------------------------------------------------------------------------


@register(
    "q_salient_terms",
    """
WITH d AS (SELECT source, text || ' marker_' || source AS t FROM documents),
tok AS (SELECT source AS grp, unnest(string_split(t, ' ')) AS term FROM d),
tf AS (SELECT grp, term, count(*) AS tf FROM tok GROUP BY grp, term
       HAVING count(*) >= 3),
gdf AS (SELECT term, count(*) AS df_groups FROM tf GROUP BY term),
ng AS (SELECT count(DISTINCT source) AS g FROM documents),
s AS (SELECT grp, term, tf, df_groups,
             round(tf * ln(CAST(g AS DOUBLE) / df_groups), 6) AS score
      FROM tf JOIN gdf USING (term) CROSS JOIN ng),
r AS (SELECT *, row_number() OVER (PARTITION BY grp
                                   ORDER BY score DESC, term ASC) AS rank
      FROM s)
SELECT grp AS source, term, CAST(tf AS BIGINT) AS tf,
       CAST(df_groups AS BIGINT) AS df_groups, score,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 5
""",
)
def q_salient_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 tf-idf terms per source (domain profiling / corpus-card
    summaries) over text with a planted per-source marker token: tf/df
    exact integers, hapax tail pruned before the idf join (the bound
    that keeps the term table corpus-scale-safe), ln once per
    surviving pair, round-6 before the (score desc, term asc) rank."""
    from .functions.text import salient_terms

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = docs.select(
        "source",
        F.concat(F.col("text"), F.lit(" marker_"), F.col("source")).alias(
            "text"
        ),
    )
    return salient_terms(d, top_k=5, min_tf=3)


# ---------------------------------------------------------------------------
# q_fuzzy_match — blocked Levenshtein record linkage
# ---------------------------------------------------------------------------


@register(
    "q_fuzzy_match",
    """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
c AS (SELECT doc_id AS c_id,
             array_to_string(list_slice(tk, 1, 4), ' ') AS c_text,
             tk[3] || '|' || tk[4] AS block
      FROM toks),
v AS (SELECT doc_id + 10000000 AS q_id,
             CASE WHEN doc_id % 8 = 0
                  THEN substr(array_to_string(list_slice(tk, 1, 4), ' '), 2)
                  ELSE 'X' || array_to_string(list_slice(tk, 1, 4), ' ')
             END AS q_text,
             tk[3] || '|' || tk[4] AS block
      FROM toks WHERE doc_id % 4 = 0),
j AS (SELECT q_id, c_id, levenshtein(q_text, c_text) AS dist
      FROM v JOIN c USING (block)
      WHERE levenshtein(q_text, c_text) <= 2),
r AS (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY dist, c_id) AS rn
      FROM j)
SELECT q_id, c_id, CAST(dist AS BIGINT) AS dist FROM r WHERE rn = 1
""",
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy record linkage (title/citation matching): every
    4th doc's 4-token title gets a planted typo (leading char dropped
    or prepended), blocking on the UNTOUCHED 3rd|4th tokens, best
    Levenshtein ≤ 2 match under a (dist, c_id) total order — exact
    integer distances from the engines' built-in levenshtein; the
    quadratic distance only ever runs inside blocks."""
    from .functions.dedup import fuzzy_match

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("tk"))
    title = F.array_join(F.slice(F.col("tk"), 1, 4), " ")
    block = F.concat(
        F.element_at(F.col("tk"), 3), F.lit("|"), F.element_at(F.col("tk"), 4)
    )
    canon = toks.select(
        F.col("doc_id").alias("c_id"), title.alias("c_text"),
        block.alias("block"),
    )
    did = F.col("doc_id")
    typo = F.when(did % 8 == 0, F.substring(title, 2, 1 << 30)).otherwise(
        F.concat(F.lit("X"), title)
    )
    variants = toks.filter(did % 4 == 0).select(
        (did + 10000000).alias("q_id"), typo.alias("q_text"),
        block.alias("block"),
    )
    return fuzzy_match(variants, canon, max_dist=2)


# ---------------------------------------------------------------------------
# q_als — rank-2 ALS matrix factorization of the user×item matrix
# ---------------------------------------------------------------------------


def _als_oracle() -> str:
    from .functions.clustering import als_oracle_sql

    return als_oracle_sql(
        "SELECT user_id AS u, event_id % 40 AS i, "
        "CAST(round(value * 100.0) AS BIGINT) AS rq FROM events"
    )


@register("q_als", _als_oracle())
def q_als(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-2 ALS over the implicit user×item matrix (items = event_id
    mod 40, ratings = event value in cents): closed-form per-entity
    ridge solves with EXACT-int64 normal-equation sums — the
    FP-summation-order hazard of distributed ALS never arises, so the
    unrolled MATERIALIZED-CTE oracle iterates bit-identically (see
    functions/clustering.als_factorize).  Completes the trainer family
    (k-means / EM / SVM / naive Bayes / Fellegi–Sunter)."""
    from .functions.clustering import als_factorize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ratings = ev.select(
        F.col("user_id"),
        (F.col("event_id") % 40).alias("item"),
        F.round(F.col("value") * 100.0).cast("long").alias("rq"),
    )
    return als_factorize(ratings)


# ---------------------------------------------------------------------------
# q_fellegi_sunter — probabilistic record-linkage weights by EM
# ---------------------------------------------------------------------------


_FS_PAIRS_CTE = """
SELECT CAST(a1 = b1 AS BIGINT) AS g1,
       CAST(a2 = b2 AS BIGINT) AS g2,
       CAST(ab = bb AS BIGINT) AS g3
FROM (SELECT doc_id % 32 AS blk,
             CASE WHEN doc_id % 16 = 0 THEN 'X' || tk[1] ELSE tk[1] END AS b1,
             CASE WHEN doc_id % 12 = 0 THEN 'X' || tk[2] ELSE tk[2] END AS b2,
             (n_chars // 32)
               + CASE WHEN doc_id % 20 = 0 THEN 1 ELSE 0 END AS bb
      FROM (SELECT doc_id, string_split(text, ' ') AS tk, n_chars
            FROM documents)
      WHERE doc_id % 4 = 0) vb
JOIN (SELECT doc_id % 32 AS blk, tk[1] AS a1, tk[2] AS a2,
             n_chars // 32 AS ab
      FROM (SELECT doc_id, string_split(text, ' ') AS tk, n_chars
            FROM documents)) ca USING (blk)
"""


def _fellegi_sunter_oracle() -> str:
    from .functions.dedup import fellegi_sunter_oracle_sql

    return fellegi_sunter_oracle_sql(_FS_PAIRS_CTE, ["g1", "g2", "g3"])


@register("q_fellegi_sunter", _fellegi_sunter_oracle())
def q_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter m/u-probability EM over blocked comparison
    vectors (VERDICT r03 #4) — completes the record-linkage family
    beside the deterministic fuzzy_match / jaro_winkler_linkage:
    a duplicate-bearing B-file is synthesized from documents (every
    4th doc re-described with deterministic field noise: 1/4 lose
    their first token, 1/3 their second, 1/5 shift a length band),
    candidate pairs come from a hash block (doc_id % 32 — every true
    pair co-blocks, non-matches supply the u-distribution), and the
    quantized EM estimates per-field match/non-match agreement
    probabilities plus log2 m/u agreement weights.  Same nano-grid
    iteration contract as the other trainers (em_poisson2 docstring);
    oracle = the identical rounds unrolled as MATERIALIZED CTEs."""
    from .functions.dedup import fellegi_sunter_em

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tk = F.split(F.col("text"), " ")
    did = F.col("doc_id")
    band = F.expr("n_chars div 32")
    base = docs.select(
        did.alias("doc_id"), tk.alias("tk"), F.col("n_chars"), band.alias("band")
    )
    ca = base.select(
        (did % 32).alias("blk"),
        F.element_at("tk", 1).alias("a1"),
        F.element_at("tk", 2).alias("a2"),
        F.col("band").alias("ab"),
    )
    vb = base.filter(did % 4 == 0).select(
        (did % 32).alias("blk"),
        F.when(did % 16 == 0, F.concat(F.lit("X"), F.element_at("tk", 1)))
        .otherwise(F.element_at("tk", 1)).alias("b1"),
        F.when(did % 12 == 0, F.concat(F.lit("X"), F.element_at("tk", 2)))
        .otherwise(F.element_at("tk", 2)).alias("b2"),
        (F.col("band") + F.when(did % 20 == 0, F.lit(1)).otherwise(F.lit(0)))
        .alias("bb"),
    )
    pairs = vb.join(ca, "blk").select(
        (F.col("a1") == F.col("b1")).cast("long").alias("g1"),
        (F.col("a2") == F.col("b2")).cast("long").alias("g2"),
        (F.col("ab") == F.col("bb")).cast("long").alias("g3"),
    )
    return fellegi_sunter_em(pairs, ["g1", "g2", "g3"])


# ---------------------------------------------------------------------------
# q_terrain_slope — Horn-method gradient over tiles (halo exchange)
# ---------------------------------------------------------------------------


def _slope_oracle() -> str:
    """Closed-form Horn oracle: interior pixels only (no guards), the
    same 9 formula terms the kernel's padded canvas sees."""
    npx = city.NPX
    quant = 1e6

    def v(dx: int, dy: int) -> str:
        return (
            "CAST(round(("
            + city.NDVI_SQL.format(
                px_x=f"{city.X0} + ((ix + {dx}) + 0.5) * {city.RES}",
                px_y=f"{city.Y0} + ((iy + {dy}) + 0.5) * {city.RES}",
            )
            + f") * {quant}) AS BIGINT)"
        )

    nx = (
        f"({v(1, -1)} + 2 * {v(1, 0)} + {v(1, 1)})"
        f" - ({v(-1, -1)} + 2 * {v(-1, 0)} + {v(-1, 1)})"
    )
    ny = (
        f"({v(-1, 1)} + 2 * {v(0, 1)} + {v(1, 1)})"
        f" - ({v(-1, -1)} + 2 * {v(0, -1)} + {v(1, -1)})"
    )
    thr = int(round(0.01 * 8.0 * city.RES * quant))
    denom = 8.0 * city.RES * quant
    return f"""
WITH px AS (
  SELECT i % {npx} AS ix, i // {npx} AS iy
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
  WHERE i % {npx} BETWEEN 1 AND {npx - 2}
    AND i // {npx} BETWEEN 1 AND {npx - 2}
),
g AS (SELECT ix // {city.TILE_PX} AS tx, iy // {city.TILE_PX} AS ty,
             ({nx}) AS nx, ({ny}) AS ny
      FROM px),
r AS (SELECT tx, ty, nx * nx + ny * ny AS rr2 FROM g)
SELECT tx, ty, CAST(count(*) AS BIGINT) AS n_interior,
       CAST(count(*) FILTER (rr2 > {thr * thr}) AS BIGINT) AS n_steep,
       CAST(max(rr2) AS BIGINT) AS max_rr2,
       round(sqrt(CAST(max(rr2) AS DOUBLE)) / {denom!r}, 6) AS max_rise_run
FROM r GROUP BY tx, ty
"""


@register("q_terrain_slope", None)  # generated oracle attached below
def q_terrain_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horn-method surface gradient (gdaldem-slope semantics) over the
    tiled raster via the SAME halo exchange as q_focal_mean: nx/ny/rr2
    exact int64 on quantised pixels, interior-only (full 3x3 after
    cross-tile halos), steep-pixel counts by exact integer threshold
    compare, and the single sqrt+divide runs in Catalyst.  The oracle
    expands the closed-form surface into the nine Horn terms per
    interior pixel — the two sides share no code path."""
    from .operators.focal import slope_tile_stats

    return slope_tile_stats(
        city.tiles_df(spark, "ndvi"), city.grid(), quant=1e6,
        steep_rise_run=0.01,
    )


ORACLES["q_terrain_slope"] = _slope_oracle()


# ---------------------------------------------------------------------------
# q_curvature — Zevenbergen–Thorne profile/plan curvature classes
# ---------------------------------------------------------------------------

_CURV_QUANT = 1e5  # |terms| <= 12*(4*quant)^3 must stay inside int64


def _curvature_oracle() -> str:
    """Closed-form ZT oracle: the same integer sign tests the kernel
    runs, expanded over the nine quantised surface samples."""
    npx = city.NPX

    def v(dx: int, dy: int) -> str:
        return (
            "CAST(round(("
            + city.NDVI_SQL.format(
                px_x=f"{city.X0} + ((ix + {dx}) + 0.5) * {city.RES}",
                px_y=f"{city.Y0} + ((iy + {dy}) + 0.5) * {city.RES}",
            )
            + f") * {_CURV_QUANT}) AS BIGINT)"
        )

    d = f"({v(-1, 0)} + {v(1, 0)} - 2 * {v(0, 0)})"
    e = f"({v(0, -1)} + {v(0, 1)} - 2 * {v(0, 0)})"
    g = f"({v(1, 0)} - {v(-1, 0)})"
    h = f"({v(0, 1)} - {v(0, -1)})"
    f_ = f"(- {v(-1, -1)} + {v(1, -1)} + {v(-1, 1)} - {v(1, 1)})"
    return f"""
WITH px AS (
  SELECT i % {npx} AS ix, i // {npx} AS iy
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
  WHERE i % {npx} BETWEEN 1 AND {npx - 2}
    AND i // {npx} BETWEEN 1 AND {npx - 2}
),
t AS (SELECT ix // {city.TILE_PX} AS tx, iy // {city.TILE_PX} AS ty,
             {d} AS d, {e} AS e, {g} AS g, {h} AS h, {f_} AS f
      FROM px),
s AS (SELECT tx, ty, g = 0 AND h = 0 AS flat,
             4 * d * g * g + 4 * e * h * h + f * g * h AS p,
             4 * d * h * h + 4 * e * g * g - f * g * h AS pl
      FROM t)
SELECT tx, ty, CAST(count(*) AS BIGINT) AS n_interior,
       CAST(count(*) FILTER (flat) AS BIGINT) AS n_flat,
       CAST(count(*) FILTER (NOT flat AND p > 0) AS BIGINT) AS n_prof_pos,
       CAST(count(*) FILTER (NOT flat AND p < 0) AS BIGINT) AS n_prof_neg,
       CAST(count(*) FILTER (NOT flat AND pl > 0) AS BIGINT) AS n_plan_pos,
       CAST(count(*) FILTER (NOT flat AND pl < 0) AS BIGINT) AS n_plan_neg
FROM s GROUP BY tx, ty
"""


@register("q_curvature", None)  # generated oracle attached below
def q_curvature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zevenbergen–Thorne profile/plan curvature landform classes per
    tile (ridge/valley/planar texture — the terrain-family companion
    to q_terrain_slope and q_ruggedness) over the SAME halo exchange.
    Both classifications reduce to integer SIGN tests on the quantised
    quadric numerators, so no FP exists anywhere; the oracle expands
    the closed-form surface into the nine ZT terms per interior pixel
    — the two sides share no code path."""
    from .operators.focal import curvature_class_counts

    return curvature_class_counts(
        city.tiles_df(spark, "ndvi"), city.grid(), quant=_CURV_QUANT
    )


ORACLES["q_curvature"] = _curvature_oracle()


# ---------------------------------------------------------------------------
# q_length_gini — per-source doc-length inequality
# ---------------------------------------------------------------------------


@register(
    "q_length_gini",
    """
WITH c AS (SELECT source AS grp, n_chars AS v FROM documents),
bv AS (SELECT grp, v, count(*) AS c FROM c GROUP BY grp, v),
rk AS (SELECT grp, v, c,
              coalesce(sum(c) OVER (PARTITION BY grp ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base,
              sum(c) OVER (PARTITION BY grp) AS n,
              sum(CAST(c AS HUGEINT) * v) OVER (PARTITION BY grp) AS total
       FROM bv),
nm AS (SELECT grp, n, total,
              sum(CAST(c AS HUGEINT) * (2 * base + c - n) * v) AS gnum
       FROM rk GROUP BY grp, n, total)
SELECT grp AS source, CAST(n AS BIGINT) AS n, CAST(total AS BIGINT) AS total,
       round(CAST(gnum AS DOUBLE)
             / nullif(CAST(n AS DOUBLE) * CAST(total AS DOUBLE), 0.0)
             + 0.0, 6) AS gini
FROM nm
""",
)
def q_length_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gini of document length (burstiness / boilerplate
    audit): the exact tie-block construction of q_gini_exposure,
    partitioned per group — distinct-value cumsum, DECIMAL/HUGEINT
    numerator, group totals as within-group window sums (no
    join-back), one division + round-6."""
    from .functions.audit import gini_by_group

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return gini_by_group(docs, group_col="source", val_col="n_chars")


# ---------------------------------------------------------------------------
# q_robots_filter — longest-match robots.txt path rules
# ---------------------------------------------------------------------------

# (rule_id, prefix, allow) — rule 0 is the default-allow catch-all;
# rules 1/2 exercise the longest-match override, 3/4 the allow-wins tie
_ROBOTS_RULES: tuple[tuple[int, str, bool], ...] = (
    (0, "", True),
    (1, "/private/", False),
    (2, "/private/public/", True),
    (3, "/mixed/", False),
    (4, "/mixed/", True),
    (5, "/tmp", False),
)

_ROBOTS_PATHS: tuple[str, ...] = (
    "/private/a",
    "/private/public/x",
    "/mixed/page",
    "/tmp9/file",
    "/blog/post",
    "/private",
)


def _robots_oracle() -> str:
    rules = ", ".join(
        f"({rid}, '{p}', {str(a).lower()})" for rid, p, a in _ROBOTS_RULES
    )
    paths = (
        "CASE doc_id % 6 "
        + " ".join(
            f"WHEN {i} THEN '{p}'" for i, p in enumerate(_ROBOTS_PATHS[:-1])
        )
        + f" ELSE '{_ROBOTS_PATHS[-1]}' END"
    )
    return f"""
WITH rules(rule_id, prefix, allow) AS (VALUES {rules}),
u AS (SELECT doc_id, {paths} AS path FROM documents),
m AS (SELECT doc_id, path, allow AS allowed, rule_id,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY length(prefix) DESC, allow DESC, rule_id ASC) AS rn
      FROM u JOIN rules ON starts_with(path, prefix))
SELECT doc_id, path, allowed, CAST(rule_id AS BIGINT) AS rule_id
FROM m WHERE rn = 1
""".replace("starts_with(path, prefix)",
            "substr(path, 1, length(prefix)) = prefix")


@register("q_robots_filter", None)  # generated oracle attached below
def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt path filtering, Google longest-match-wins semantics
    (allow wins exact-length ties; empty-prefix catch-all makes
    default-allow fall out of the same ranking — no join-back):
    planted paths exercise the nested allow-inside-disallow, the tie,
    and the no-slash prefix ('/tmp' matching '/tmp9/...')."""
    from .functions.dedup import robots_filter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    path = (
        F.when(did % 6 == 0, F.lit(_ROBOTS_PATHS[0]))
        .when(did % 6 == 1, F.lit(_ROBOTS_PATHS[1]))
        .when(did % 6 == 2, F.lit(_ROBOTS_PATHS[2]))
        .when(did % 6 == 3, F.lit(_ROBOTS_PATHS[3]))
        .when(did % 6 == 4, F.lit(_ROBOTS_PATHS[4]))
        .otherwise(F.lit(_ROBOTS_PATHS[5]))
    )
    urls = docs.select("doc_id", path.alias("path"))
    rules = spark.createDataFrame(
        list(_ROBOTS_RULES), "rule_id long, prefix string, allow boolean"
    )
    return robots_filter(urls, rules)


ORACLES["q_robots_filter"] = _robots_oracle()


# ---------------------------------------------------------------------------
# q_budget_allocation — largest-remainder crawl-budget apportionment
# ---------------------------------------------------------------------------


@register(
    "q_budget_allocation",
    """
WITH c AS (SELECT source AS k, count(*) AS n FROM documents GROUP BY source),
t AS (SELECT k, n,
             sum(n) OVER () AS tot
      FROM c),
b AS (SELECT k, n, (1000 * n) // tot AS base, (1000 * n) % tot AS rem,
             tot
      FROM t),
r AS (SELECT k, n, base, rem,
             1000 - sum(base) OVER () AS leftover,
             row_number() OVER (ORDER BY rem DESC, k ASC) AS rk
      FROM b)
SELECT k AS source, CAST(n AS BIGINT) AS n,
       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS quota
FROM r
""",
)
def q_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a 1000-unit crawl
    budget across sources proportional to doc counts — exact integer
    arithmetic (BIGINT `div`, never a double quotient), quotas sum to
    the budget by construction; the scheduler-facing quota plan."""
    from .functions.sampling import apportion_budget

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return apportion_budget(counts, key_col="source", count_col="n_docs",
                            budget=1000)


# ---------------------------------------------------------------------------
# q_quadrat_csr — quadrat-count complete-spatial-randomness test
# ---------------------------------------------------------------------------


@register(
    "q_quadrat_csr",
    f"""
WITH pts AS ({city.points_sql()}),
q AS (SELECT least({10 - 1}, greatest(0,
        CAST(floor((x - {city.X0}) / {city.EXTENT / 10}) AS BIGINT))) AS qx,
             least({10 - 1}, greatest(0,
        CAST(floor((y - {city.Y0}) / {city.EXTENT / 10}) AS BIGINT))) AS qy
      FROM pts),
c AS (SELECT qx, qy, count(*) AS o FROM q GROUP BY qx, qy),
t AS (SELECT CAST(sum(o) AS BIGINT) AS n,
             CAST(sum(o * o) AS BIGINT) AS soq
      FROM c)
SELECT n AS n_points, CAST(100 AS BIGINT) AS n_quadrats,
       round(CAST(100 * soq AS DOUBLE) / CAST(n AS DOUBLE)
             - CAST(n AS DOUBLE), 6) AS chi2,
       round(CAST(soq AS DOUBLE) / CAST(n AS DOUBLE)
             - CAST(n AS DOUBLE) / 100.0, 6) AS vmr
FROM t
""",
)
def q_quadrat_csr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadrat-count CSR test over the geocoded points (10×10 equal
    quadrats; the urban-core planting makes χ²/VMR scream 'clustered'):
    ΣO² and N exact integers, each statistic one division chain +
    round-6 — the χ² companion of q_ripleys_k."""
    from .operators.spatial_stats import quadrat_csr

    pts = city.points_df(spark, sf_dir)
    return quadrat_csr(
        pts, origin=(city.X0, city.Y0), extent=city.EXTENT, k_side=10
    )


# ---------------------------------------------------------------------------
# q_ngram_novelty — cross-snapshot 5-gram freshness per source
# ---------------------------------------------------------------------------


@register(
    "q_ngram_novelty",
    f"""
WITH o1 AS (SELECT string_split(text, ' ') AS tk FROM documents
            WHERE doc_id % 7 != 0),
o2 AS (SELECT tk, unnest(range(0, len(tk) - 4)) AS i
       FROM o1 WHERE len(tk) >= 5),
og AS (SELECT DISTINCT
         md5(array_to_string(list_slice(tk, i + 1, i + 5), ' ')) AS g
       FROM o2),
n1 AS (SELECT source,
              string_split(CASE WHEN doc_id % 5 = 0
                                THEN text || '{_CDC_UPDATE_SUFFIX}'
                                ELSE text END, ' ') AS tk
       FROM documents WHERE doc_id % 11 != 0),
n2 AS (SELECT source, tk, unnest(range(0, len(tk) - 4)) AS i
       FROM n1 WHERE len(tk) >= 5),
ng AS (SELECT DISTINCT source,
         md5(array_to_string(list_slice(tk, i + 1, i + 5), ' ')) AS g
       FROM n2),
j AS (SELECT ng.source, CASE WHEN og.g IS NULL THEN 1 ELSE 0 END AS novel
      FROM ng LEFT JOIN og ON ng.g = og.g)
SELECT source, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(novel) AS BIGINT) AS n_novel,
       round(CAST(sum(novel) AS DOUBLE) / count(*), 6) AS novelty_rate
FROM j GROUP BY source
""",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-gram freshness of the CDC new snapshot vs the old one, per
    source (the recrawl boilerplate-vs-new-text signal): distinct gram
    md5 digests only cross the shuffle, novelty is a left-join flag
    (the new-gram subtree evaluates once), updated docs contribute
    novel tail grams."""
    from .functions.text import ngram_novelty

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    old = docs.filter(did % 7 != 0).select("source", "text")
    nt = F.when(
        did % 5 == 0, F.concat(F.col("text"), F.lit(_CDC_UPDATE_SUFFIX))
    ).otherwise(F.col("text"))
    new = docs.filter(did % 11 != 0).select("source", nt.alias("text"))
    return ngram_novelty(old, new, n=5)


# ---------------------------------------------------------------------------
# q_funnel / q_retention / q_cube_rollup — event-stream product analytics
# ---------------------------------------------------------------------------


@register(
    "q_funnel",
    """
WITH e AS (SELECT user_id, event_type AS et, epoch_us(ts) AS us FROM events),
e1 AS (SELECT *, min(CASE WHEN et = 'view' THEN us END)
                 OVER (PARTITION BY user_id) AS t1 FROM e),
e2 AS (SELECT *, min(CASE WHEN et = 'click' AND us >= t1
                          AND us <= t1 + 21600000000 THEN us END)
                 OVER (PARTITION BY user_id) AS t2 FROM e1),
e3 AS (SELECT *, min(CASE WHEN et = 'purchase' AND us >= t2
                          AND us <= t2 + 86400000000 THEN us END)
                 OVER (PARTITION BY user_id) AS t3 FROM e2),
p AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
      FROM e3 GROUP BY user_id),
t AS (SELECT count(*) AS n_users,
             sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS s1,
             sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS s2,
             sum(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS s3
      FROM p)
SELECT CAST(n_users AS BIGINT) AS n_users, CAST(s1 AS BIGINT) AS s1,
       CAST(s2 AS BIGINT) AS s2, CAST(s3 AS BIGINT) AS s3,
       round(CAST(s2 AS DOUBLE) / nullif(CAST(s1 AS DOUBLE), 0.0), 6)
         AS conv_12,
       round(CAST(s3 AS DOUBLE) / nullif(CAST(s2 AS DOUBLE), 0.0), 6)
         AS conv_23,
       round(CAST(s3 AS DOUBLE) / nullif(CAST(s1 AS DOUBLE), 0.0), 6)
         AS conv_13
FROM t
""",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch ordered conversion funnel view → click (≤6 h) →
    purchase (≤24 h): every per-user step time is a window aggregate
    over the SAME user partitioning — one shuffle, no join-backs;
    timestamps as exact epoch-µs integers, divisions round-6."""
    from .operators.funnel import funnel_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return funnel_counts(ev)


@register(
    "q_retention",
    """
WITH e AS (SELECT user_id AS u,
                  date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d
           FROM events),
f AS (SELECT u, min(d) AS c0 FROM e GROUP BY u),
a AS (SELECT DISTINCT e.u, f.c0, e.d - f.c0 AS off FROM e JOIN f USING (u)),
p AS (SELECT c0, off, count(*) AS n_active FROM a GROUP BY c0, off),
w AS (SELECT c0, off, n_active,
             max(CASE WHEN off = 0 THEN n_active END)
               OVER (PARTITION BY c0) AS cohort_n
      FROM p)
SELECT c0 AS cohort_day, off AS day_offset,
       CAST(n_active AS BIGINT) AS n_active,
       CAST(cohort_n AS BIGINT) AS cohort_n,
       round(CAST(n_active AS DOUBLE) / CAST(cohort_n AS DOUBLE), 6)
         AS retention
FROM w
""",
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle retention cohorts (cohort = first active day): distinct
    (user, offset) activity, cohort sizes as within-cohort window maxes
    (no join-back), exact integers + one round-6 division."""
    from .operators.funnel import retention_cohorts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return retention_cohorts(ev)


@register(
    "q_cube_rollup",
    """
WITH e AS (SELECT event_type,
                  date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7
                    AS dow,
                  CAST(round(value * 1000000.0) AS BIGINT) AS vq
           FROM events)
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(CAST(dow AS VARCHAR), 'ALL') AS dow,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(vq) AS BIGINT) AS val_sum_q
FROM e GROUP BY CUBE (event_type, dow)
""",
)
def q_cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE rollup of event counts and quantized value sums over
    (event_type, day-of-week) — day index from a portable datediff-mod
    (Spark dayofweek is 1-based-Sunday, DuckDB 0-based: neither is
    used); values integer-quantized BEFORE the sum so every cube cell
    is exact; Catalyst expands the cube into one Expand + two-phase
    aggregate."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(
        "event_type",
        (F.datediff(F.to_date("ts"), F.lit("2024-01-01")) % 7).alias("dow"),
        F.round(F.col("value") * 1.0e6, 0).cast("long").alias("vq"),
    )
    return (
        e.cube("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("vq").alias("val_sum_q"))
        .select(
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("dow").cast("string"), F.lit("ALL")).alias("dow"),
            "n",
            "val_sum_q",
        )
    )


# ---------------------------------------------------------------------------
# q_balanced_sample — systematic sampling along the Hilbert curve
# ---------------------------------------------------------------------------


def _balanced_sample_oracle() -> str:
    from .engine.layout import hilbert_sql_ctes

    return (
        _CTE
        + f""",
dd AS (
  SELECT doc_id,
         CAST(floor((x - {city.X0}) / {city.CELL}) AS BIGINT) AS gx,
         CAST(floor((y - {city.Y0}) / {city.CELL}) AS BIGINT) AS gy
  FROM pts
),
{hilbert_sql_ctes('dd', order=7, carry=('doc_id',))},
r AS (SELECT doc_id, hd AS hkey,
             row_number() OVER (ORDER BY hd, doc_id) - 1 AS pos
      FROM h7)
SELECT doc_id, hkey, CAST(pos AS BIGINT) AS pos FROM r WHERE pos % 10 = 0
"""
    )


@register("q_balanced_sample", None)  # generated oracle attached below
def q_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic spatially balanced sample (the GRTS idea): points
    ordered along the Hilbert curve, every 10th taken — consecutive
    positions are spatially spread because the curve never jumps,
    unlike an id-hash sample that can clump in the urban core.  Global
    positions via the house two-level bucket rank (no full-corpus
    sort task); ties break by id in both engines."""
    from .functions.sampling import balanced_spatial_sample

    pts = city.points_df(spark, sf_dir)
    cells = pts.select(
        "doc_id",
        F.floor((F.col("x") - city.X0) / city.CELL).cast("long").alias("gx"),
        F.floor((F.col("y") - city.Y0) / city.CELL).cast("long").alias("gy"),
    )
    return balanced_spatial_sample(cells, every=10, order=7)


ORACLES["q_balanced_sample"] = _balanced_sample_oracle()


# ---------------------------------------------------------------------------
# q_cross_k — bivariate Ripley's K: corpus vs greenspace centroids
# ---------------------------------------------------------------------------


@register(
    "q_cross_k",
    f"""
WITH pts AS ({city.points_sql()}),
gs_ids AS ({city.gs_ids_sql()}),
gs AS ({city.greenspace_sql()}),
pr AS (
  SELECT (a.x - g.cx) * (a.x - g.cx) + (a.y - g.cy) * (a.y - g.cy) AS d2
  FROM pts a JOIN gs g
    ON g.cx BETWEEN a.x - 300 AND a.x + 300
   AND g.cy BETWEEN a.y - 300 AND a.y + 300
),
s AS (SELECT CAST(unnest([100, 200, 300]) AS DOUBLE) AS r),
na AS (SELECT count(*) AS na FROM pts),
nb AS (SELECT count(*) AS nb FROM gs),
cr AS (SELECT s.r, count(*) FILTER (WHERE pr.d2 <= s.r * s.r) AS n_pairs
       FROM s JOIN pr ON true GROUP BY s.r)
SELECT r, n_pairs,
       round(100.0 * CAST(n_pairs AS DOUBLE)
             / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS k_hat
FROM cr, na, nb
""",
)
def q_cross_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate (cross) Ripley's K between the geocoded corpus and
    greenspace centroids at r = 100/200/300 m — "does the corpus
    cluster around greenspace beyond independence?", the attraction
    companion of q_ripleys_k; same bounded cell k-ring pair production,
    area in km² so k_hat rounds portably; the oracle's banded IEJoin
    mirrors the ring join pair-for-pair."""
    from .operators.spatial_stats import cross_k

    gs = city.greenspace_df(spark).select(
        F.col("cx").alias("x"), F.col("cy").alias("y")
    )
    return cross_k(
        city.points_df(spark, sf_dir), gs,
        radii=[100.0, 200.0, 300.0], area=100.0, cell_size=300.0,
    )


# ---------------------------------------------------------------------------
# q_raster_pyramid — overview pyramid with exact mass conservation
# ---------------------------------------------------------------------------


def _pyramid_oracle() -> str:
    npx = city.NPX
    vterm = (
        "CAST(round(("
        + city.NDVI_SQL.format(
            px_x=f"{city.X0} + (ix + 0.5) * {city.RES}",
            px_y=f"{city.Y0} + (iy + 0.5) * {city.RES}",
        )
        + ") * 1000000.0) AS BIGINT)"
    )
    t1 = city.TILE_PX // 2
    t2 = city.TILE_PX // 4
    return f"""
WITH px AS (
  SELECT i % {npx} AS ix, i // {npx} AS iy
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
),
base AS (SELECT ix, iy, {vterm} AS v FROM px),
l1 AS (SELECT ix // 2 AS ix, iy // 2 AS iy, sum(v) AS v
       FROM base GROUP BY 1, 2),
l2 AS (SELECT ix // 2 AS ix, iy // 2 AS iy, sum(v) AS v
       FROM l1 GROUP BY 1, 2),
s1 AS (SELECT 1 AS level, ix // {t1} AS tx, iy // {t1} AS ty,
              count(*) AS n_px, sum(v) AS tot_q,
              min(v) AS min_pool, max(v) AS max_pool
       FROM l1 GROUP BY 2, 3),
s2 AS (SELECT 2 AS level, ix // {t2} AS tx, iy // {t2} AS ty,
              count(*) AS n_px, sum(v) AS tot_q,
              min(v) AS min_pool, max(v) AS max_pool
       FROM l2 GROUP BY 2, 3),
u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
SELECT CAST(level AS BIGINT) AS level, CAST(tx AS BIGINT) AS tx,
       CAST(ty AS BIGINT) AS ty, CAST(n_px AS BIGINT) AS n_px,
       CAST(tot_q AS BIGINT) AS tot_q,
       CAST(min_pool AS BIGINT) AS min_pool,
       CAST(max_pool AS BIGINT) AS max_pool,
       round(CAST(tot_q AS DOUBLE)
             / (CAST(n_px AS DOUBLE)
                * pow(4.0, CAST(level AS DOUBLE)) * 1000000.0), 6)
         AS level_mean
FROM u
""".replace("pow(", "power(")


@register("q_raster_pyramid", None)  # generated oracle attached below
def q_raster_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level overview pyramid (COG overviews): level-L pixels are
    exact integer sums of their 2^L-block, so mass is conserved per
    tile while min/max coarsen; fixture tile origins/dims divide by 4,
    so per-tile pooling equals global pooling with ZERO shuffles (one
    mapInPandas); the oracle pools globally by index-halving CTEs —
    no shared code path."""
    from .operators.focal import pyramid_tile_stats

    return pyramid_tile_stats(
        city.tiles_df(spark, "ndvi"), city.grid(), levels=2, quant=1e6
    )


ORACLES["q_raster_pyramid"] = _pyramid_oracle()


# ---------------------------------------------------------------------------
# q_graph_reciprocity / q_degree_assortativity / q_triangles — webgraph stats
# ---------------------------------------------------------------------------

# distinct directed host edges, self-loops dropped — shared by all three
_LINK_EDGE_CTE = (
    _LINK_GRAPH_CTE
    + """,
le AS (SELECT DISTINCT src_host AS s, dst_host AS d FROM r
       WHERE src_host <> dst_host),
und AS (SELECT DISTINCT least(s, d) AS ua, greatest(s, d) AS ub FROM le),
bo AS (SELECT ua AS a, ub AS b FROM und
       UNION ALL SELECT ub AS a, ua AS b FROM und),
deg AS (SELECT a, count(*) AS dg FROM bo GROUP BY a)"""
)


@register(
    "q_graph_reciprocity",
    "WITH " + _LINK_EDGE_CTE + """
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(CASE WHEN rv.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_reciprocal,
       round(CAST(sum(CASE WHEN rv.s IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS reciprocity
FROM le LEFT JOIN le rv ON rv.s = le.d AND rv.d = le.s
""",
)
def q_graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed-edge reciprocity of the extracted host graph (link-farm
    signal): distinct self-loop-free edges, ONE co-partitioned
    reversed-key self-join, exact counts + round-6."""
    from .functions.graph import graph_reciprocity
    from .functions.links import host_link_graph

    edges = host_link_graph(_link_pages_df(spark, sf_dir)).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    return graph_reciprocity(edges)


@register(
    "q_degree_assortativity",
    "WITH " + _LINK_EDGE_CTE + """,
j AS (SELECT CAST(dx.dg AS HUGEINT) AS x, CAST(dy.dg AS HUGEINT) AS y
      FROM bo JOIN deg dx ON dx.a = bo.a JOIN deg dy ON dy.a = bo.b),
st AS (SELECT CAST(count(*) AS HUGEINT) AS m, sum(x) AS sx, sum(y) AS sy,
              sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
       FROM j)
SELECT CAST(m // 2 AS BIGINT) AS n_edges,
       round(CAST(m * sxy - sx * sy AS DOUBLE)
             / nullif(sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                      * sqrt(CAST(m * syy - sy * sy AS DOUBLE)), 0.0)
             + 0.0, 6) AS assortativity
FROM st
""",
)
def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the undirected host graph (do hub
    hosts link to hubs?): integer-numerator correlation over exact
    DECIMAL/HUGEINT moment sums (the SLX/Cramer convention — zero FP
    cancellation), one sqrt+division round-6."""
    from .functions.graph import degree_assortativity
    from .functions.links import host_link_graph

    edges = host_link_graph(_link_pages_df(spark, sf_dir)).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    return degree_assortativity(edges)


@register(
    "q_triangles",
    "WITH " + _LINK_EDGE_CTE + """,
o AS (SELECT CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND ua < ub)
                  THEN ua ELSE ub END AS x,
             CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND ua < ub)
                  THEN ub ELSE ua END AS y,
             CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND ua < ub)
                  THEN db.dg ELSE da.dg END AS yd
      FROM und JOIN deg da ON da.a = ua JOIN deg db ON db.a = ub),
cand AS (SELECT w1.y AS x, w2.y AS y
         FROM o w1 JOIN o w2 ON w1.x = w2.x
          AND (w1.yd < w2.yd OR (w1.yd = w2.yd AND w1.y < w2.y))),
tri AS (SELECT sum(CASE WHEN o.x IS NOT NULL THEN 1 ELSE 0 END) AS t
        FROM cand LEFT JOIN o ON o.x = cand.x AND o.y = cand.y),
wg AS (SELECT sum(CAST(dg AS HUGEINT) * (dg - 1) // 2) AS w FROM deg)
SELECT CAST(t AS BIGINT) AS n_triangles, CAST(w AS BIGINT) AS n_wedges,
       round(3.0 * CAST(t AS DOUBLE) / nullif(CAST(w AS DOUBLE), 0.0)
             + 0.0, 6) AS global_clustering
FROM tri, wg
""",
)
def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count + global clustering of the undirected host
    graph via degree-ordered edge orientation (each triangle counted
    once at its lowest-(degree,id) vertex; oriented out-degree bounded
    O(sqrt m) — the Suri-Vassilvitskii shape that keeps the pivot join
    polynomial at webgraph scale); wedges from exact degree sums."""
    from .functions.graph import triangle_stats
    from .functions.links import host_link_graph

    edges = host_link_graph(_link_pages_df(spark, sf_dir)).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    return triangle_stats(edges)


# ---------------------------------------------------------------------------
# q_adamic_adar — common-neighbour link prediction over the host graph
# ---------------------------------------------------------------------------


@register(
    "q_adamic_adar",
    "WITH " + _LINK_EDGE_CTE + """,
pv AS (SELECT bo.a AS z, bo.b AS y,
              1.0 / ln(CAST(deg.dg AS DOUBLE)) AS w
       FROM bo JOIN deg ON deg.a = bo.a),
pr AS (SELECT p1.y AS a, p2.y AS b,
              CAST(count(*) AS BIGINT) AS n_common, sum(p1.w) AS score
       FROM pv p1 JOIN pv p2 ON p1.z = p2.z AND p1.y < p2.y
       GROUP BY 1, 2)
SELECT pr.a AS host_a, pr.b AS host_b, pr.n_common,
       round(pr.score + 0.0, 6) AS aa_score
FROM pr LEFT JOIN und ON und.ua = pr.a AND und.ub = pr.b
WHERE und.ua IS NULL
""",
)
def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar link prediction over the extracted host graph
    (which unlinked host pairs share weighty common neighbours —
    the crawl-frontier expansion signal).  Pivot-on-the-common-
    neighbour pair generation with the 1/ln(deg) weight attached
    BEFORE the fan-out, one grouped sum, LEFT ANTI against the edge
    set; the hub cap (``max_degree``) documented in
    functions/graph.py is OFF here so the oracle is exact."""
    from .functions.graph import adamic_adar
    from .functions.links import host_link_graph

    edges = host_link_graph(_link_pages_df(spark, sf_dir)).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    return adamic_adar(edges)


# ---------------------------------------------------------------------------
# q_source_similarity — pairwise vocabulary Jaccard between sources
# ---------------------------------------------------------------------------


@register(
    "q_source_similarity",
    """
WITH v AS (SELECT DISTINCT source AS g, unnest(string_split(
             text || ' marker_' || source, ' ')) AS tok
           FROM documents),
sizes AS (SELECT g, count(*) AS nv FROM v GROUP BY g),
inter AS (SELECT a.g AS ga, b.g AS gb, count(*) AS n_common
          FROM v a JOIN v b ON a.tok = b.tok AND a.g < b.g
          GROUP BY a.g, b.g)
SELECT ga AS src_a, gb AS src_b,
       CAST(sa.nv AS BIGINT) AS n_a, CAST(sb.nv AS BIGINT) AS n_b,
       CAST(n_common AS BIGINT) AS n_common,
       round(CAST(n_common AS DOUBLE)
             / CAST(sa.nv + sb.nv - n_common AS DOUBLE), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.g = ga JOIN sizes sb ON sb.g = gb
""",
)
def q_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources (domain-similarity
    matrix) over text with the per-source marker planted (so no pair
    ever reaches jaccard 1.0): the distinct (group, token) table
    self-joins on the token key — per-token fan-out bounded by groups²
    regardless of corpus size — exact counts, inclusion-exclusion
    union, one round-6 division."""
    from .functions.text import source_vocab_jaccard

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = docs.select(
        "source",
        F.concat(F.col("text"), F.lit(" marker_"), F.col("source")).alias(
            "text"
        ),
    )
    return source_vocab_jaccard(d)


# ---------------------------------------------------------------------------
# q_markov_entropy — per-state successor entropy of the event chain
# ---------------------------------------------------------------------------

_EVENT_STATES: tuple[str, ...] = ("click", "error", "purchase", "signup", "view")


def _markov_entropy_oracle() -> str:
    sums = ",\n             ".join(
        f"sum(CASE WHEN t = '{s}' THEN 1 ELSE 0 END) AS n{i}"
        for i, s in enumerate(_EVENT_STATES)
    )
    terms = " + ".join(
        f"CASE WHEN n{i} = 0 THEN 0.0 "
        f"ELSE (CAST(n{i} AS DOUBLE) / CAST(n_trans AS DOUBLE)) "
        f"* ln(CAST(n{i} AS DOUBLE) / CAST(n_trans AS DOUBLE)) END"
        for i in range(len(_EVENT_STATES))
    )
    return f"""
WITH tr AS (SELECT lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS f,
                   event_type AS t
            FROM events),
g AS (SELECT f AS state, count(*) AS n_trans,
             {sums}
      FROM tr WHERE f IS NOT NULL GROUP BY f)
SELECT state, CAST(n_trans AS BIGINT) AS n_trans,
       round(-({terms}) + 0.0, 6) AS entropy
FROM g
"""


@register("q_markov_entropy", None)  # generated oracle attached below
def q_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state successor entropy of the event Markov chain
    (behavioural predictability; ln(5) = uniform): transitions from one
    per-user lag window under the (ts, event_id) total order, entropy
    as a FIXED 5-term expression chain over the known state alphabet
    (the grid_category_entropy precedent) — both engines evaluate the
    identical IEEE chain, -0.0 flushed before round-6."""
    from .operators.funnel import markov_transition_entropy

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return markov_transition_entropy(ev, states=_EVENT_STATES)


ORACLES["q_markov_entropy"] = _markov_entropy_oracle()


# ---------------------------------------------------------------------------
# q_bitext_candidates — URL-structure language-pair mining
# ---------------------------------------------------------------------------


@register(
    "q_bitext_candidates",
    """
WITH u AS (SELECT doc_id,
             'https://h' || CAST((doc_id // 3) % 40 AS VARCHAR)
             || '.example/'
             || CASE doc_id % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'fr'
                ELSE 'de' END
             || '/p' || CAST(doc_id // 3 AS VARCHAR) || '.html' AS url
           FROM documents
           WHERE NOT (doc_id % 3 = 1 AND (doc_id // 3) % 4 = 0)),
m AS (SELECT doc_id,
             regexp_extract(url, '^https?://([^/]+)/([a-z]{2})/(.*)$', 1)
               AS host,
             regexp_extract(url, '^https?://([^/]+)/([a-z]{2})/(.*)$', 2)
               AS lang,
             regexp_extract(url, '^https?://([^/]+)/([a-z]{2})/(.*)$', 3)
               AS path
      FROM u),
ea AS (SELECT host, path, min(doc_id) AS id_a FROM m
       WHERE lang = 'en' GROUP BY host, path),
eb AS (SELECT host, path, min(doc_id) AS id_b FROM m
       WHERE lang = 'fr' GROUP BY host, path)
SELECT host, path, id_a, id_b FROM ea JOIN eb USING (host, path)
""",
)
def q_bitext_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitext mining by URL structure (ParaCrawl first pass): planted
    /en/ and /fr/ URL twins share (host, tail-path) — one regexp split
    + a KEY equi-join, never a similarity scan; every 4th group's fr
    twin is withheld so unpaired pages prove the inner-join contract;
    /de/ pages same-path prove language slicing."""
    from .functions.links import bitext_candidates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    grp = (did / 3).cast("long")
    lang = (
        F.when(did % 3 == 0, F.lit("en"))
        .when(did % 3 == 1, F.lit("fr"))
        .otherwise(F.lit("de"))
    )
    url = F.concat(
        F.lit("https://h"), (grp % 40).cast("string"), F.lit(".example/"),
        lang, F.lit("/p"), grp.cast("string"), F.lit(".html"),
    )
    pages = docs.filter(~((did % 3 == 1) & (grp % 4 == 0))).select(
        "doc_id", url.alias("url")
    )
    return bitext_candidates(pages)


# ---------------------------------------------------------------------------
# q_colocation — co-location quotient of language categories
# ---------------------------------------------------------------------------


@register(
    "q_colocation",
    f"""
WITH pts AS ({city.points_sql()}),
p AS (SELECT p.doc_id, d.lang, p.x, p.y
      FROM pts p JOIN documents d ON d.doc_id = p.doc_id),
pr AS (SELECT a.doc_id, a.lang AS cat_a, b.lang AS cat_b,
              row_number() OVER (
                PARTITION BY a.doc_id
                ORDER BY (a.x - b.x) * (a.x - b.x)
                         + (a.y - b.y) * (a.y - b.y), b.doc_id) AS rn
       FROM p a JOIN p b ON b.doc_id != a.doc_id),
nn AS (SELECT cat_a, cat_b FROM pr WHERE rn = 1),
c AS (SELECT cat_a, cat_b, count(*) AS c_ab FROM nn GROUP BY cat_a, cat_b),
sz AS (SELECT lang, count(*) AS n FROM p GROUP BY lang),
nt AS (SELECT count(*) AS n_tot FROM p)
SELECT cat_a, cat_b, CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
       CAST(c_ab AS BIGINT) AS c_ab,
       round(CAST(c_ab * (n_tot - 1) AS DOUBLE)
             / CAST(na.n * (nb.n - CASE WHEN cat_a = cat_b THEN 1 ELSE 0 END)
                    AS DOUBLE), 6) AS clq
FROM c JOIN sz na ON na.lang = cat_a JOIN sz nb ON nb.lang = cat_b
CROSS JOIN nt
""",
)
def q_colocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-location quotient between language categories over the
    geocoded corpus ("is an English page's nearest neighbour another
    English page beyond chance?"): exact-d² 1-NN (never sqrt — sqrt
    compresses distinct d² and would flip id tiebreaks) via the
    bounded cell tier + one fallback where the MISSED side is the
    broadcast; CLQ as an exact integer ratio, one round-6 division.
    The oracle is the brute-force all-pairs window."""
    from .operators.spatial_stats import colocation_quotient

    pts = city.points_df(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    return colocation_quotient(
        pts.join(docs, "doc_id"), cat_col="lang", nn_bound=300.0
    )


# ---------------------------------------------------------------------------
# q_label_prop — semi-supervised host categorization over the link graph
# ---------------------------------------------------------------------------


# the clamped two-round label-propagation CTE chain, shared by
# q_label_prop and q_modularity so the two oracles cannot drift
_LABEL_PROP_CTE = """
seeds AS (SELECT a AS node,
                 'c' || CAST(CAST(regexp_extract(a, '([0-9]+)', 1) AS BIGINT)
                             % 3 AS VARCHAR) AS label
          FROM (SELECT DISTINCT a FROM bo) n
          WHERE CAST(regexp_extract(a, '([0-9]+)', 1) AS BIGINT) % 4 = 0),
v1 AS (SELECT bo.a, l.label, count(*) AS c
       FROM bo JOIN seeds l ON l.node = bo.b GROUP BY bo.a, l.label),
n1 AS (SELECT a AS node, label FROM
        (SELECT a, label,
                row_number() OVER (PARTITION BY a
                                   ORDER BY c DESC, label ASC) AS rn
         FROM v1) q WHERE rn = 1),
l1 AS (SELECT * FROM seeds
       UNION ALL
       SELECT * FROM n1 WHERE node NOT IN (SELECT node FROM seeds)),
v2 AS (SELECT bo.a, l.label, count(*) AS c
       FROM bo JOIN l1 l ON l.node = bo.b GROUP BY bo.a, l.label),
n2 AS (SELECT a AS node, label FROM
        (SELECT a, label,
                row_number() OVER (PARTITION BY a
                                   ORDER BY c DESC, label ASC) AS rn
         FROM v2) q WHERE rn = 1),
l2 AS (SELECT * FROM seeds
       UNION ALL
       SELECT * FROM n2 WHERE node NOT IN (SELECT node FROM seeds))"""


@register(
    "q_label_prop",
    "WITH " + _LINK_EDGE_CTE + "," + _LABEL_PROP_CTE + """
SELECT node AS host, label FROM l2
""",
)
def q_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised host categorization: every 4th host (by its
    numeric part) is seeded with a class, two clamped synchronous
    label-propagation rounds spread the labels over the undirected
    host graph under a (count desc, label asc) majority order — the
    webgraph topic/spam-classification shape; the oracle renders one
    CTE level per round from the SAME shared planted-graph CTE."""
    from .functions.graph import label_propagation
    from .functions.links import host_link_graph

    edges = host_link_graph(_link_pages_df(spark, sf_dir)).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    und = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).filter(F.col("a") != F.col("b")).distinct()
    nodes = und.select(F.col("a").alias("node")).unionByName(
        und.select(F.col("b").alias("node"))
    ).distinct()
    num = F.regexp_extract(F.col("node"), r"([0-9]+)", 1).cast("long")
    seeds = nodes.filter(num % 4 == 0).select(
        "node", F.concat(F.lit("c"), (num % 3).cast("string")).alias("label")
    )
    out = label_propagation(edges, seeds, rounds=2)
    return out.select(F.col("node").alias("host"), "label")


@register(
    "q_modularity",
    "WITH " + _LINK_EDGE_CTE + "," + _LABEL_PROP_CTE + """,
lab AS (SELECT deg.a AS node, deg.dg,
               coalesce(l2.label, 'u:' || deg.a) AS lab
        FROM deg LEFT JOIN l2 ON l2.node = deg.a),
mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
ei AS (SELECT CAST(sum(CASE WHEN x.lab = y.lab THEN 1 ELSE 0 END) AS BIGINT)
         AS e_intra
       FROM und JOIN lab x ON x.node = und.ua
                JOIN lab y ON y.node = und.ub),
d2 AS (SELECT CAST(sum(ds * ds) AS BIGINT) AS sd2
       FROM (SELECT lab, sum(dg) AS ds FROM lab GROUP BY lab)),
nc AS (SELECT CAST(count(DISTINCT lab) AS BIGINT) AS n_communities FROM lab)
SELECT nc.n_communities, mm.m AS m_edges, ei.e_intra,
       CAST(4 * mm.m * ei.e_intra - d2.sd2 AS DOUBLE)
       / CAST(4 * mm.m * mm.m AS DOUBLE) AS modularity
FROM nc, mm, ei, d2
""",
)
def q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the label-propagation communities over
    the host graph — the partition-quality readout that closes the
    q_label_prop loop (Q ≫ 0 ⇔ propagated labels track real link
    structure).  Unlabelled hosts complete as singletons on BOTH
    sides; Q = (4m·E − ΣD_c²)/(4m²) divides two exact int64s, and the
    oracle re-renders the same two propagation rounds from the shared
    CTE chain plus the margin algebra."""
    from .functions.graph import label_propagation, modularity
    from .functions.links import host_link_graph

    edges = host_link_graph(_link_pages_df(spark, sf_dir)).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    und = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).filter(F.col("a") != F.col("b")).distinct()
    nodes = und.select(F.col("a").alias("node")).unionByName(
        und.select(F.col("b").alias("node"))
    ).distinct()
    num = F.regexp_extract(F.col("node"), r"([0-9]+)", 1).cast("long")
    seeds = nodes.filter(num % 4 == 0).select(
        "node", F.concat(F.lit("c"), (num % 3).cast("string")).alias("label")
    )
    return modularity(edges, label_propagation(edges, seeds, rounds=2))


# ---------------------------------------------------------------------------
# q_theil — Theil-T inequality decomposition of doc length by source
# ---------------------------------------------------------------------------

_TQ = "1000000000000.0"  # per-term quantizer (1e12)


@register(
    "q_theil",
    f"""
WITH c AS (SELECT source AS g, n_chars AS v FROM documents),
by0 AS (SELECT g, v, count(*) AS c FROM c GROUP BY g, v),
by1 AS (SELECT g, v, c,
               sum(c * v) OVER (PARTITION BY g) AS xg,
               sum(c) OVER (PARTITION BY g) AS ng,
               sum(c * v) OVER () AS x,
               sum(c) OVER () AS n
        FROM by0),
t AS (SELECT
        sum(CAST(round((CAST(c * v AS DOUBLE) / CAST(x AS DOUBLE))
            * ln(CAST(v AS DOUBLE)
                 / (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)))
            * {_TQ}) AS BIGINT)) AS tt,
        sum(CAST(round((CAST(c * v AS DOUBLE) / CAST(x AS DOUBLE))
            * ln(CAST(v AS DOUBLE)
                 / (CAST(xg AS DOUBLE) / CAST(ng AS DOUBLE)))
            * {_TQ}) AS BIGINT)) AS tw,
        max(n) AS n_docs
      FROM by1),
gd AS (SELECT DISTINCT g, xg, ng, x, n FROM by1),
tb AS (SELECT sum(CAST(round((CAST(xg AS DOUBLE) / CAST(x AS DOUBLE))
            * ln((CAST(xg AS DOUBLE) / CAST(ng AS DOUBLE))
                 / (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)))
            * {_TQ}) AS BIGINT)) AS tb
      FROM gd)
SELECT CAST(n_docs AS BIGINT) AS n_docs,
       round(CAST(tt AS DOUBLE) / {_TQ} + 0.0, 6) AS t_total,
       round(CAST(tw AS DOUBLE) / {_TQ} + 0.0, 6) AS t_within,
       round(CAST(tb AS DOUBLE) / {_TQ} + 0.0, 6) AS t_between
FROM t, tb
""",
)
def q_theil(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality of document length with the between/within-
    source decomposition (is length inequality a between-domain or
    within-domain phenomenon? T_total = within + between): per-term
    doubles rendered from identical trees and quantized to integers
    (·1e12) BEFORE the sums, so aggregation is order-free and libm ln
    ulp noise is invisible at round-6; totals/means ride as window
    sums, no join-backs."""
    from .functions.audit import theil_decomposition

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return theil_decomposition(docs, group_col="source", val_col="n_chars")


# ---------------------------------------------------------------------------
# q_hits — Kleinberg hubs/authorities over the host graph
# ---------------------------------------------------------------------------


def _hits_oracle(n_iters: int = 2) -> str:
    pico = "1000000000000.0"
    parts = [
        "nodes AS (SELECT s AS node FROM le UNION SELECT d FROM le)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "h0 AS (SELECT node, round(1.0 / n, 9) AS h FROM nodes, nn)",
    ]
    for i in range(n_iters):
        parts += [
            f"ar{i} AS (SELECT le.d AS node, "
            f"sum(CAST(round(h{i}.h * {pico}) AS BIGINT)) AS ar "
            f"FROM le JOIN h{i} ON h{i}.node = le.s GROUP BY le.d)",
            f"sa{i} AS (SELECT sum(ar) AS sa FROM ar{i})",
            f"a{i} AS (SELECT nodes.node, "
            f"round(CAST(coalesce(ar, 0) AS DOUBLE) / CAST(sa AS DOUBLE), 9)"
            f" AS a FROM nodes LEFT JOIN ar{i} ON ar{i}.node = nodes.node "
            f"CROSS JOIN sa{i})",
            f"hr{i} AS (SELECT le.s AS node, "
            f"sum(CAST(round(a{i}.a * {pico}) AS BIGINT)) AS hr "
            f"FROM le JOIN a{i} ON a{i}.node = le.d GROUP BY le.s)",
            f"sh{i} AS (SELECT sum(hr) AS sh FROM hr{i})",
            f"h{i + 1} AS (SELECT nodes.node, "
            f"round(CAST(coalesce(hr, 0) AS DOUBLE) / CAST(sh AS DOUBLE), 9)"
            f" AS h FROM nodes LEFT JOIN hr{i} ON hr{i}.node = nodes.node "
            f"CROSS JOIN sh{i})",
        ]
    body = ",\n".join(parts)
    last = n_iters
    return (
        "WITH " + _LINK_EDGE_CTE + ",\n" + body + f"""
SELECT h{last}.node AS host, h AS hub, a AS authority
FROM h{last} JOIN a{n_iters - 1} ON a{n_iters - 1}.node = h{last}.node
"""
    )


@register("q_hits", None)  # generated oracle attached below
def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg HITS over the extracted host graph (self-loops
    dropped to match the shared `le` edge CTE): 2 quantized rounds
    from the uniform hub start, L1 normalizers as EXACT pico-int sums
    (the pagerank contract), one double division + round-9 per score;
    the oracle renders one CTE pair per round from the same params."""
    from .functions.graph import hits
    from .functions.links import host_link_graph

    edges = host_link_graph(_link_pages_df(spark, sf_dir)).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    out = hits(edges, n_iters=2)
    return out.select(F.col("node").alias("host"), "hub", "authority")


ORACLES["q_hits"] = _hits_oracle()


# ---------------------------------------------------------------------------
# q_zonal_median — EXACT distributed zonal quantiles (median + IQR) of the
# raw (un-clamped) NDVI raster per point buffer
# ---------------------------------------------------------------------------

_ZQ_SCALE = 1_000_000.0


@register(
    "q_zonal_median",
    _CTE + _pixel_cte(_NDVI_R) + f"""
, qv AS (
  SELECT doc_id,
         CAST(floor(({city.NDVI_SQL.format(px_x='cx', px_y='cy')}) * {_ZQ_SCALE}
                    + 0.5) AS BIGINT) AS q
  FROM pxin
), cnts AS (
  SELECT doc_id, q, CAST(count(*) AS BIGINT) AS cnt FROM qv GROUP BY doc_id, q
), cum AS (
  SELECT doc_id, q, cnt,
         sum(cnt) OVER (PARTITION BY doc_id) AS n,
         sum(cnt) OVER (PARTITION BY doc_id ORDER BY q
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM cnts
)
SELECT doc_id,
       CAST(max(n) AS BIGINT) AS n_px,
       min(CASE WHEN cum >= CAST(ceil(n * 0.25) AS BIGINT) THEN q END)
         / {_ZQ_SCALE} AS p25,
       (min(CASE WHEN cum >= CAST(floor((n + 1) / 2) AS BIGINT) THEN q END)
        + min(CASE WHEN cum >= CAST(floor(n / 2) + 1 AS BIGINT) THEN q END))
         / (2.0 * {_ZQ_SCALE}) AS median,
       min(CASE WHEN cum >= CAST(ceil(n * 0.75) AS BIGINT) THEN q END)
         / {_ZQ_SCALE} AS p75
FROM cum GROUP BY doc_id
""",
)
def q_zonal_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-buffer NDVI median/IQR — the robust-statistics twin of
    q_mean_ndvi (reference computes only mean/std, availability.py:289;
    robust zonal summaries are the standard extension).  Exactness comes
    from the value-histogram design: pixels quantize to 1e-6 integer
    buckets inside the tile kernel, only (id, bucket, count) rows
    shuffle (bounded by value domain, not raster size), and order
    statistics read off a per-zone cumulative window — no global sort,
    no approx sketch.  The oracle mirrors the same order-statistic
    characterisation over the raw pixel CTE."""
    from .operators.zonal import zonal_quantiles

    pts = city.points_df(spark, sf_dir)
    tiles = city.tiles_df(spark, "ndvi")
    return zonal_quantiles(
        pts, tiles, radius=_NDVI_R, id_col="doc_id", scale=_ZQ_SCALE, grid=city.grid()
    )


# ---------------------------------------------------------------------------
# q_voronoi_areas — discrete Voronoi tessellation: per-greenspace service
# areas over the 100 m city grid + corpus-document allocation counts
# ---------------------------------------------------------------------------

_N_VCELLS = 10_000  # 100×100 CELL-sized analysis cells over the city


@register(
    "q_voronoi_areas",
    _CTE + f"""
, cells AS (
  SELECT CAST(r.range AS BIGINT) AS cid,
         {city.X0} + (CAST(r.range AS BIGINT) % 100 + 0.5) * {city.CELL} AS xc,
         {city.Y0} + (CAST(floor(r.range / 100.0) AS BIGINT) + 0.5) * {city.CELL} AS yc
  FROM range({_N_VCELLS}) r
), ca AS (
  SELECT cid, gs_id, d2,
         row_number() OVER (PARTITION BY cid ORDER BY d2, gs_id) AS rn
  FROM (SELECT c.cid, g.gs_id,
               (c.xc - g.cx) * (c.xc - g.cx) + (c.yc - g.cy) * (c.yc - g.cy) AS d2
        FROM cells c, greens g)
), cagg AS (
  SELECT gs_id, CAST(count(*) AS BIGINT) AS n_cells,
         count(*) * {city.CELL * city.CELL} / 1000000.0 AS area_km2,
         sum(d2) AS sum_d2
  FROM ca WHERE rn = 1 GROUP BY gs_id
), pa AS (
  SELECT doc_id, gs_id,
         row_number() OVER (PARTITION BY doc_id ORDER BY d2, gs_id) AS rn
  FROM (SELECT p.doc_id, g.gs_id,
               (p.x - g.cx) * (p.x - g.cx) + (p.y - g.cy) * (p.y - g.cy) AS d2
        FROM pts p, greens g)
), pagg AS (
  SELECT gs_id, CAST(count(*) AS BIGINT) AS n_docs FROM pa WHERE rn = 1 GROUP BY gs_id
)
SELECT g.gs_id,
       coalesce(c.n_cells, 0) AS n_cells,
       coalesce(c.area_km2, 0.0) AS area_km2,
       coalesce(c.sum_d2, 0.0) AS sum_d2,
       coalesce(p.n_docs, 0) AS n_docs
FROM greens g
LEFT JOIN cagg c ON g.gs_id = c.gs_id
LEFT JOIN pagg p ON g.gs_id = p.gs_id
""",
)
def q_voronoi_areas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-sampled Voronoi service areas of the greenspaces (which park
    is nearest from every 100 m block) + how many corpus documents each
    park serves — the areal complement of q_accessibility's point-wise
    nearest distance (reference keeps only the distance,
    accessibility.py:118-160).  Sites are a broadcast dim; both argmins
    are map-side min(struct(d2, id)) in codegen; cell-center/centroid
    coordinates sit on the quarter-integer lattice so every d² and its
    per-site sum are IEEE-exact (order-free, engine-portable)."""
    from .operators.voronoi import discrete_voronoi_assign, voronoi_service_areas

    greens = city.greenspace_df(spark)
    rng = spark.range(_N_VCELLS).withColumnRenamed("id", "cid")
    cid = F.col("cid")
    cells = rng.select(
        "cid",
        (F.lit(city.X0) + (cid % 100 + 0.5) * city.CELL).alias("xc"),
        (F.lit(city.Y0) + (F.floor(cid / 100.0).cast("bigint") + 0.5) * city.CELL).alias("yc"),
    )
    cagg = voronoi_service_areas(cells, greens, cell_area_m2=city.CELL * city.CELL)
    pts = city.points_df(spark, sf_dir)
    pagg = (
        discrete_voronoi_assign(
            pts, greens, cell_id="doc_id", cell_xy=("x", "y")
        )
        .groupBy("gs_id")
        .agg(F.count("*").alias("n_docs"))
    )
    return (
        greens.select("gs_id")
        .join(cagg, "gs_id", "left")
        .join(pagg, "gs_id", "left")
        .select(
            "gs_id",
            F.coalesce("n_cells", F.lit(0)).alias("n_cells"),
            F.coalesce("area_km2", F.lit(0.0)).alias("area_km2"),
            F.coalesce("sum_d2", F.lit(0.0)).alias("sum_d2"),
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# q_countmin — Count-Min sketch point estimates for the exact top-20
# tokens (deterministic md5 row-hashes ⇒ the overcount itself is exact)
# ---------------------------------------------------------------------------


def _countmin_oracle() -> str:
    from .functions.sketches import count_min_sql

    return count_min_sql(
        "SELECT unnest(string_split(text, ' ')) AS value FROM documents"
    )


@register("q_countmin", None)  # generated oracle attached below
def q_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS frequency estimation (Cormode–Muthukrishnan 2005) over the
    corpus token stream, probed at the exact global top-20 — completes
    the sketch family (KMV, HLL, Bloom, heavy hitters).  The sketch
    build shuffles ≤ depth·width=768 partials per task regardless of
    vocabulary size (the 100 TB shape: no per-token state); the probe
    join broadcasts the 768-row sketch.  Deterministic md5 row-hashes
    make est and overcount engine-exact, so the oracle checks the
    sketch's collision arithmetic, not just its inputs."""
    from .functions.sketches import count_min_estimate, heavy_hitters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("value"))
    top = heavy_hitters(toks, "value", k=20)
    est = count_min_estimate(toks, top.select("value"))
    return (
        top.select("value", F.col("n").alias("exact_n"))
        .join(est, "value")
        .select(
            "value", "exact_n", "est",
            (F.col("est") - F.col("exact_n")).alias("overcount"),
        )
    )


ORACLES["q_countmin"] = _countmin_oracle()


# ---------------------------------------------------------------------------
# q_power_iteration — dominant principal direction of the embedding Gram
# matrix: distributed exact-integer Gram + two in-registry matvec steps
# ---------------------------------------------------------------------------


def _power_iteration_oracle(quant: float = 1e6, g_scale: float = 1e7,
                            u_scale: float = 1e6) -> str:
    dim = _embedding_dim()
    qz = lambda c: f"CAST(sign({c}) * floor(abs({c}) + 0.5) AS BIGINT)"  # noqa: E731
    cg = f"CAST(v AS DOUBLE) / CAST(mg.m AS DOUBLE) * {g_scale!r}"
    c1 = f"CAST(y AS DOUBLE) / CAST(m1.m AS DOUBLE) * {u_scale!r}"
    c2 = f"CAST(y AS DOUBLE) / CAST(m2.m AS DOUBLE) * {u_scale!r}"
    return f"""
WITH x AS (SELECT vec_id, i - 1 AS di,
                  CAST(round(CAST(embedding[i] AS DOUBLE) * {quant!r})
                       AS BIGINT) AS xq
           FROM embeddings,
                (SELECT unnest(generate_series(1, {dim})) AS i) dims),
g AS (SELECT a.di AS di, b.di AS dj, CAST(sum(a.xq * b.xq) AS BIGINT) AS v
      FROM x a JOIN x b ON b.vec_id = a.vec_id GROUP BY a.di, b.di),
mg AS (SELECT max(abs(v)) AS m FROM g),
gn AS (SELECT di, dj, {qz(cg)} AS v FROM g, mg),
y1 AS (SELECT di, CAST(sum(v * {int(u_scale)}) AS BIGINT) AS y
       FROM gn GROUP BY di),
m1 AS (SELECT max(abs(y)) AS m FROM y1),
u1 AS (SELECT di, {qz(c1)} AS u FROM y1, m1),
y2 AS (SELECT gn.di, CAST(sum(gn.v * u1.u) AS BIGINT) AS y
       FROM gn JOIN u1 ON u1.di = gn.dj GROUP BY gn.di),
m2 AS (SELECT max(abs(y)) AS m FROM y2),
u2 AS (SELECT di, {qz(c2)} AS u FROM y2, m2)
SELECT u1.di AS di, u1.u AS u1, u2.u AS u2
FROM u1 JOIN u2 ON u2.di = u1.di
"""


@register("q_power_iteration", None)  # generated oracle attached below
def q_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two power-iteration steps toward the top eigenvector of the
    embedding Gram matrix — the spectral screen (dominant PCA direction
    / energy axis) that follows q_gram_cov's covariance scan.  The
    corpus-sized work is one exact-int64 Gram reduction (O(d²) partial
    per Arrow batch, vectors never shuffle); iteration then runs on the
    d²-row aggregate via broadcast matvecs, localCheckpoint per round.
    Renormalizing G and each iterate to bounded integers keeps every
    matvec product exact (< 2^63), so both engines agree bit-for-bit —
    the oracle re-derives the same iterates from an unnest self-join."""
    from .functions.similarity import gram_power_iteration

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return gram_power_iteration(emb, dim=_embedding_dim())


ORACLES["q_power_iteration"] = _power_iteration_oracle()


# ---------------------------------------------------------------------------
# q_chi2 — chi-square independence test: event_type × user cohort
# ---------------------------------------------------------------------------


@register(
    "q_chi2",
    """
WITH e AS (SELECT event_type AS a, CAST(user_id % 4 AS BIGINT) AS b FROM events),
obs AS (SELECT a, b, CAST(count(*) AS BIGINT) AS obs FROM e GROUP BY a, b),
grid AS (SELECT da.a, db.b, coalesce(o.obs, 0) AS obs
         FROM (SELECT DISTINCT a FROM obs) da
         CROSS JOIN (SELECT DISTINCT b FROM obs) db
         LEFT JOIN obs o ON o.a = da.a AND o.b = db.b),
m AS (SELECT a, b, obs,
             CAST(sum(obs) OVER (PARTITION BY a) AS BIGINT) AS rt,
             CAST(sum(obs) OVER (PARTITION BY b) AS BIGINT) AS ct,
             CAST(sum(obs) OVER () AS BIGINT) AS nn
      FROM grid),
x AS (SELECT a, b, obs,
             CAST(rt * ct AS DOUBLE) / CAST(nn AS DOUBLE) AS exp0
      FROM m),
q AS (SELECT a, b, obs, exp0,
             CAST(floor((CAST(obs AS DOUBLE) - exp0) * (CAST(obs AS DOUBLE) - exp0)
                        / exp0 * 1000000.0 + 0.5) AS BIGINT) AS cq
      FROM x),
d AS (SELECT count(DISTINCT a) AS na, count(DISTINCT b) AS nb FROM grid)
SELECT a, b, obs, round(exp0, 6) AS exp, cq / 1000000.0 AS contrib,
       CAST(sum(cq) OVER () AS BIGINT) / 1000000.0 AS chi2,
       CAST((d.na - 1) * (d.nb - 1) AS BIGINT) AS dof
FROM q, d
""",
)
def q_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and a user
    cohort (user_id mod 4) — the A/B-analysis primitive over the event
    stream.  One corpus-sized groupBy; margins come from unpartitioned
    window sums over the dim-sized completed contingency table (zero
    cells restored by a distinct-levels cross join so expected mass is
    conserved); the statistic is an exact integer sum of 1e-6-quantized
    contributions, immune to FP summation order."""
    from .functions.stats import chi2_independence

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(
        F.col("event_type").alias("a"),
        (F.col("user_id") % 4).cast("long").alias("b"),
    )
    return chi2_independence(e, "a", "b")


# ---------------------------------------------------------------------------
# q_marching_squares — contour-cell case histogram of the NDVI 0.5
# iso-level (midpoint marching squares over the tile halo exchange)
# ---------------------------------------------------------------------------

_MS_THR_Q = 500_000  # iso-level 0.5 on 1e-6-quantized NDVI


def _marching_squares_oracle(quant: float = 1e6) -> str:
    from .operators.focal import MS_SEGMENTS

    npx = city.NPX

    def bit(x_expr: str, y_expr: str) -> str:
        q = (
            "CAST(round(("
            + city.NDVI_SQL.format(
                px_x=f"{city.X0} + (({x_expr}) + 0.5) * {city.RES}",
                px_y=f"{city.Y0} + (({y_expr}) + 0.5) * {city.RES}",
            )
            + f") * {quant}) AS BIGINT)"
        )
        return f"(CASE WHEN ({q}) > {_MS_THR_Q} THEN 1 ELSE 0 END)"

    nw = npx - 1
    seg_case = " ".join(
        f"WHEN {c} THEN {s}" for c, s in enumerate(MS_SEGMENTS) if s != 1
    )
    return f"""
WITH wins AS (
  SELECT i % {nw} AS wx, i // {nw} AS wy
  FROM (SELECT unnest(generate_series(0, {nw * nw - 1})) AS i)
),
q AS (
  SELECT {bit('wx', 'wy')} + 2 * {bit('wx + 1', 'wy')}
         + 4 * {bit('wx', 'wy + 1')} + 8 * {bit('wx + 1', 'wy + 1')} AS case_id
  FROM wins
)
SELECT case_id, CAST(count(*) AS BIGINT) AS n_windows,
       CAST(count(*) * (CASE case_id {seg_case} ELSE 1 END) AS BIGINT) AS n_segments
FROM q GROUP BY case_id
"""


@register("q_marching_squares", None)  # generated oracle attached below
def q_marching_squares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marching-squares classification of the NDVI 0.5 contour: global
    16-case histogram + total midpoint-rule segment count.  The engine
    runs the tile-distributive form (each 2×2 window owned by its
    lower-left pixel's tile, corners via the 1-px halo exchange —
    contour extraction over 100 TB of raster with O(perimeter) traffic
    and no stitching); the oracle classifies every window directly from
    the closed-form raster.  Iso-side tests are exact-int64 compares on
    quantised values, so the case of every window is engine-portable."""
    from .operators.focal import MS_SEGMENTS, marching_squares_counts

    tiles = city.tiles_df(spark, "ndvi")
    per_tile = marching_squares_counts(
        tiles, city.grid(), quant=1e6, threshold_q=_MS_THR_Q
    )
    lut = F.array(*[F.lit(s) for s in MS_SEGMENTS])
    return (
        per_tile.groupBy("case_id")
        .agg(F.sum("n_win").alias("n_windows"))
        .select(
            "case_id", "n_windows",
            (F.col("n_windows")
             * F.element_at(lut, F.col("case_id").cast("int") + 1)).alias("n_segments"),
        )
    )


ORACLES["q_marching_squares"] = _marching_squares_oracle()


# ---------------------------------------------------------------------------
# q_jaro_linkage — blocked Jaro-Winkler record linkage (the prefix-
# weighted complement of q_fuzzy_match's Levenshtein)
# ---------------------------------------------------------------------------


@register(
    "q_jaro_linkage",
    """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
c AS (SELECT doc_id AS c_id,
             array_to_string(list_slice(tk, 1, 4), ' ') AS c_text,
             tk[3] || '|' || tk[4] AS block
      FROM toks),
v AS (SELECT doc_id + 10000000 AS q_id,
             CASE WHEN doc_id % 8 = 0
                  THEN substr(array_to_string(list_slice(tk, 1, 4), ' '), 2)
                  ELSE 'X' || array_to_string(list_slice(tk, 1, 4), ' ')
             END AS q_text,
             tk[3] || '|' || tk[4] AS block
      FROM toks WHERE doc_id % 4 = 0),
j AS (SELECT q_id, c_id,
             round(jaro_winkler_similarity(q_text, c_text), 6) AS sim
      FROM v JOIN c USING (block)),
r AS (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY sim DESC, c_id) AS rn
      FROM j WHERE sim >= 0.8)
SELECT q_id, c_id, sim FROM r WHERE rn = 1
""",
)
def q_jaro_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked Jaro-Winkler linkage over the same planted-typo titles
    as q_fuzzy_match: best match per variant by (sim desc, id), sim ≥
    0.8, ranked on 6-dp-rounded values.  The Arrow kernel's JW doubles
    are bit-identical to DuckDB's ``jaro_winkler_similarity`` builtin
    (fuzz-verified over 120k random pairs) — a genuinely independent
    oracle, not a mirrored formula.  Quadratic string work stays inside
    blocking-key groups; one block-key shuffle, one window."""
    from .functions.dedup import jaro_winkler_linkage

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("tk"))
    title = F.array_join(F.slice(F.col("tk"), 1, 4), " ")
    block = F.concat(
        F.element_at(F.col("tk"), 3), F.lit("|"), F.element_at(F.col("tk"), 4)
    )
    canon = toks.select(
        F.col("doc_id").alias("c_id"), title.alias("c_text"), block.alias("block")
    )
    did = F.col("doc_id")
    typo = F.when(did % 8 == 0, F.substring(title, 2, 1 << 30)).otherwise(
        F.concat(F.lit("X"), title)
    )
    variants = toks.filter(did % 4 == 0).select(
        (did + 10000000).alias("q_id"), typo.alias("q_text"), block.alias("block")
    )
    return jaro_winkler_linkage(variants, canon, min_sim=0.8)


# ---------------------------------------------------------------------------
# q_spearman — rank correlation between document length and vocabulary
# ---------------------------------------------------------------------------


@register(
    "q_spearman",
    """
WITH m AS (SELECT doc_id, n_chars,
                  CAST(length(list_distinct(string_split(text, ' ')))
                       AS BIGINT) AS n_uniq
           FROM documents),
r AS (SELECT doc_id,
             row_number() OVER (ORDER BY n_chars, doc_id) AS ra,
             row_number() OVER (ORDER BY n_uniq, doc_id) AS rb
      FROM m),
s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum((ra - rb) * (ra - rb)) AS BIGINT) AS sum_d2
      FROM r)
SELECT n, sum_d2,
       round(1.0 - CAST(6 * sum_d2 AS DOUBLE)
                   / CAST(n * (n * n - 1) AS DOUBLE), 6) AS rho
FROM s
""",
)
def q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between document length (n_chars) and
    vocabulary size (distinct tokens) — the monotone-association check
    a curation pipeline runs between quality signals before mixing
    them.  Ranks come from the two-phase distributed global rank
    (engine/rank.py: range partition + local row_number + broadcast
    offsets — NO single-task global window), ties broken by doc_id so
    every rank is distinct and the closed form is exact; Σd² is an
    exact int64 sum, the one division mirrored in both engines."""
    from .engine.rank import spearman_rho

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = docs.select(
        "doc_id", "n_chars",
        F.size(F.array_distinct(F.split(F.col("text"), " ")))
        .cast("long").alias("n_uniq"),
    )
    return spearman_rho(m, "n_chars", "n_uniq", "doc_id")


# ---------------------------------------------------------------------------
# q_kendall_tau — tie-corrected rank correlation via the joint histogram
# ---------------------------------------------------------------------------

_KT_BUCKET = 16


@register(
    "q_kendall_tau",
    f"""
WITH m AS (SELECT n_chars // {_KT_BUCKET} AS x,
                  length(text) - length(replace(text, ' ', '')) AS y
           FROM documents),
cell AS (SELECT x, y, CAST(count(*) AS HUGEINT) AS c FROM m GROUP BY x, y),
cd AS (SELECT coalesce(sum(CASE WHEN a.y < b.y THEN a.c * b.c END),
                       CAST(0 AS HUGEINT)) AS cc,
              coalesce(sum(CASE WHEN a.y > b.y THEN a.c * b.c END),
                       CAST(0 AS HUGEINT)) AS dd
       FROM cell a JOIN cell b ON a.x < b.x),
tot AS (SELECT sum(c) AS n, sum(c) * (sum(c) - 1) AS n0 FROM cell),
t1 AS (SELECT sum(t * (t - 1)) AS n1
       FROM (SELECT sum(c) AS t FROM cell GROUP BY x)),
t2 AS (SELECT sum(t * (t - 1)) AS n2
       FROM (SELECT sum(c) AS t FROM cell GROUP BY y))
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST(cc AS BIGINT) AS n_concordant,
       CAST(dd AS BIGINT) AS n_discordant,
       round(2.0 * CAST(cc - dd AS DOUBLE)
             / nullif(sqrt(CAST(n0 - n1 AS DOUBLE))
                      * sqrt(CAST(n0 - n2 AS DOUBLE)), 0.0)
             + 0.0, 6) AS tau_b
FROM cd, tot, t1, t2
""",
)
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between bucketed document length (n_chars/16) and
    whitespace token count — the tie-aware companion to q_spearman.
    The statistic is computed ENTIRELY from the joint histogram (one
    corpus-sized groupBy, then an O(k²) dim-sized histogram self-join
    — never n² pairs), with 2×-scaled integer tie terms so no halving
    happens before the final sqrt (functions/stats.py
    ``kendall_tau_b``)."""
    from .functions.stats import kendall_tau_b

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = docs.select(
        F.floor(F.col("n_chars") / _KT_BUCKET).cast("long").alias("x"),
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        ).cast("long").alias("y"),
    )
    return kendall_tau_b(m, "x", "y")


# ---------------------------------------------------------------------------
# q_weighted_sample — PPS systematic sampling by document length
# ---------------------------------------------------------------------------

_WS_M = 100


@register(
    "q_weighted_sample",
    f"""
WITH c AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS wt,
                  CAST(sum(n_chars) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum
           FROM documents),
t AS (SELECT CAST(sum(n_chars) AS BIGINT) AS tt FROM documents),
x AS (SELECT doc_id, wt, cum, cum - wt AS cwp, tt FROM c, t),
h AS (SELECT doc_id, wt, cum,
             least({_WS_M}, CASE WHEN 2 * {_WS_M} * cum > tt
                  THEN (2 * {_WS_M} * cum - tt - 1) // (2 * tt) + 1 ELSE 0 END)
           - least({_WS_M}, CASE WHEN 2 * {_WS_M} * cwp > tt
                  THEN (2 * {_WS_M} * cwp - tt - 1) // (2 * tt) + 1 ELSE 0 END)
             AS n_hits
      FROM x)
SELECT doc_id, wt, cum, CAST(n_hits AS BIGINT) AS n_hits
FROM h WHERE n_hits > 0
""",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted systematic (PPS) sampling of ~{m} documents with
    inclusion probability ∝ length — the token-budgeted corpus
    subsampling primitive (selecting by doc count biases against long
    documents; PPS by n_chars samples by token mass).  Prefix sums via
    the two-phase distributed cumsum, point membership via guarded
    integer division — zero FP, exact at any scale/skew; the oracle
    mirrors the integer formula over a plain window.""".replace(
        "{m}", str(_WS_M)
    )
    from .functions.sampling import weighted_systematic_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.col("n_chars").cast("long").alias("wt")
    )
    return weighted_systematic_sample(
        docs, weight_col="wt", m=_WS_M, order_cols=["doc_id"]
    ).select("doc_id", "wt", "cum", "n_hits")


# ---------------------------------------------------------------------------
# q_stream_dedup — streaming exactly-once dedup of a replayed event feed
# ---------------------------------------------------------------------------


@register(
    "q_stream_dedup",
    """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY event_type
""",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once → exactly-once repair: the event feed is written
    twice-overlapping (a full copy plus a replay of every 3rd event)
    and drained through ``dropDuplicatesWithinWatermark`` on event_id —
    bounded state (keys live only inside the duplicate horizon), append
    sink.  The oracle is plain per-type counts/cent-sums over the clean
    table: the gate passes iff the stream collapsed every replica."""
    import atexit
    import os
    import shutil
    import tempfile

    from .streaming.ingest import dedup_event_stream
    from .streaming.stage import drain_shuffle_partitions, stage_events_with_replay

    base = os.path.join(tempfile.gettempdir(), f"q_stream_dedup_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    src, sink, ckpt = (os.path.join(base, d) for d in ("src", "sink", "ckpt"))
    stage_events_with_replay(sf_dir, src, mod=3)
    with drain_shuffle_partitions(spark):
        dedup_event_stream(spark, src, sink, ckpt)
    out = spark.read.parquet(sink)
    return out.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100.0).cast("long")).alias("sum_cents"),
    )


# ---------------------------------------------------------------------------
# q_welch_ttest — Welch two-sample test: purchase vs error event values
# ---------------------------------------------------------------------------


@register(
    "q_welch_ttest",
    """
WITH e AS (SELECT event_type AS g,
                  CAST(round(value * 100.0) AS BIGINT) AS vq
           FROM events WHERE event_type IN ('purchase', 'error')),
a AS (SELECT
        CAST(sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(sum(CASE WHEN g = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(sum(CASE WHEN g = 'purchase' THEN vq ELSE 0 END) AS BIGINT) AS s_a,
        CAST(sum(CASE WHEN g = 'error' THEN vq ELSE 0 END) AS BIGINT) AS s_b,
        CAST(sum(CASE WHEN g = 'purchase' THEN vq * vq ELSE 0 END) AS BIGINT) AS q_a,
        CAST(sum(CASE WHEN g = 'error' THEN vq * vq ELSE 0 END) AS BIGINT) AS q_b
      FROM e),
d AS (SELECT n_a, n_b,
             CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
             CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
             (CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)
                / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0)
               / CAST(n_a AS DOUBLE) AS ua,
             (CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)
                / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0)
               / CAST(n_b AS DOUBLE) AS ub
      FROM a)
SELECT n_a, n_b, round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
       round((ma - mb) / sqrt(ua + ub), 6) AS t_stat,
       round((ua + ub) * (ua + ub)
             / (ua * ua / (CAST(n_a AS DOUBLE) - 1.0)
                + ub * ub / (CAST(n_b AS DOUBLE) - 1.0)), 3) AS dof
FROM d
""",
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between purchase and error event
    values (quantized to cents on ingest) — the continuous-outcome
    experiment readout next to q_chi2.  Six exact int64 sums in one
    map-side-combinable aggregation; t and the Welch–Satterthwaite dof
    assemble from those integers through identical FP expressions in
    both engines."""
    from .functions.stats import welch_ttest

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100.0).cast("long").alias("vq"),
    )
    return welch_ttest(ev, "g", "vq", "purchase", "error")


# ---------------------------------------------------------------------------
# q_rbo — rank-biased overlap between the BM25 and tf-idf rankings
# ---------------------------------------------------------------------------

_RBO_K, _RBO_P = 20, 0.9


def _rbo_oracle() -> str:
    from .functions.retrieval import bm25_oracle_sql, rbo_weights, tfidf_oracle_sql

    vals = ", ".join(
        f"({d}, {w!r})" for d, w in rbo_weights(_RBO_K, _RBO_P)
    )
    return f"""
WITH ra AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS ra
  FROM ({bm25_oracle_sql(_BM25_TERMS)}) QUALIFY ra <= {_RBO_K}
),
rb AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rb
  FROM ({tfidf_oracle_sql(_BM25_TERMS)}) QUALIFY rb <= {_RBO_K}
),
e AS (SELECT greatest(ra.ra, rb.rb) AS entry FROM ra JOIN rb USING (doc_id)),
w(d, wd) AS (VALUES {vals}),
x AS (SELECT d, wd, count(e.entry) AS x_d
      FROM w LEFT JOIN e ON e.entry <= w.d GROUP BY d, wd)
SELECT CAST(d AS BIGINT) AS d, CAST(x_d AS BIGINT) AS x_d,
       CAST(sum(CAST(floor(wd * CAST(x_d AS DOUBLE) / CAST(d AS DOUBLE)
                           * 1000000000.0 + 0.5) AS BIGINT)) OVER ()
            AS BIGINT) / 1000000000.0 AS rbo
FROM x
"""


@register("q_rbo", None)  # generated oracle attached below
def q_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010, truncated @20, p=0.9)
    between the BM25 and plain-tf·idf top-20 rankings for the same
    query — the ranking-agreement eval a pipeline runs when swapping
    retrieval scorers.  Per-depth overlap X_d from the two rank joins
    (dim-sized after the top-k windows); geometric weights are driver
    literals (no per-row pow) and the weighted sum is an exact integer
    sum of 1e-9-quantized terms."""
    from .functions.retrieval import bm25_scores, rbo_overlap, tfidf_query_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return rbo_overlap(
        bm25_scores(docs, _BM25_TERMS),
        tfidf_query_scores(docs, _BM25_TERMS),
        k=_RBO_K, p=_RBO_P,
    )


ORACLES["q_rbo"] = _rbo_oracle()


_RRF_K, _RRF_C = 20, 60


def _rrf_oracle() -> str:
    from .functions.retrieval import bm25_oracle_sql, tfidf_oracle_sql

    return f"""
WITH ra AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS ra
  FROM ({bm25_oracle_sql(_BM25_TERMS)}) QUALIFY ra <= {_RRF_K}
),
rb AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rb
  FROM ({tfidf_oracle_sql(_BM25_TERMS)}) QUALIFY rb <= {_RRF_K}
),
f AS (
  SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
         CAST(ra.ra AS BIGINT) AS rank_a, CAST(rb.rb AS BIGINT) AS rank_b,
         coalesce(1.0 / ({_RRF_C} + ra.ra), 0.0)
         + coalesce(1.0 / ({_RRF_C} + rb.rb), 0.0) AS rrf_score
  FROM ra FULL JOIN rb ON ra.doc_id = rb.doc_id
)
SELECT doc_id, rank_a, rank_b, rrf_score,
       CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT)
         AS fused_rank
FROM f
"""


@register("q_rrf_fusion", None)  # generated oracle attached below
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank fusion of the BM25 and tf·idf top-20 for the
    same query (RRF: Σ 1/(60+rank), missing list contributes 0) — the
    score-free merge a retrieval stage runs between scorers whose
    scales don't calibrate; the fused order is portable because each
    score is the same fixed two-term double expression in both
    engines, ties by doc_id."""
    from .functions.retrieval import bm25_scores, rrf_fusion, tfidf_query_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return rrf_fusion(
        bm25_scores(docs, _BM25_TERMS),
        tfidf_query_scores(docs, _BM25_TERMS),
        k=_RRF_K, c=_RRF_C,
    )


ORACLES["q_rrf_fusion"] = _rrf_oracle()


# ---------------------------------------------------------------------------
# q_cusum_drift — integer CUSUM change-point scan over daily volumes
# ---------------------------------------------------------------------------


@register(
    "q_cusum_drift",
    """
WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                  CAST(count(*) AS BIGINT) AS n_events
           FROM events GROUP BY 1),
s AS (SELECT day, n_events,
             CAST(sum(n_events) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS pre,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
             CAST(sum(n_events) OVER () AS BIGINT) AS tot,
             CAST(count(*) OVER () AS BIGINT) AS nd
      FROM d),
c AS (SELECT day, n_events, nd * pre - i * tot AS cusum_scaled FROM s),
m AS (SELECT day, n_events, cusum_scaled,
             max(abs(cusum_scaled)) OVER () AS mx
      FROM c),
g AS (SELECT day, n_events, cusum_scaled,
             min(CASE WHEN abs(cusum_scaled) = mx THEN day END) OVER () AS chg
      FROM m)
SELECT strftime(day, '%Y-%m-%d') AS day, n_events, cusum_scaled,
       day IS NOT DISTINCT FROM chg AS is_change_point
FROM g
""",
)
def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point scan over daily event volume — the snapshot
    drift detector a pipeline runs between crawl ingests.  The centered
    cumulative sum is kept EXACT by scaling with the day count
    (n_days·prefix − i·total, all int64 — no mean division ever
    happens), so the argmax day (ties → earliest) is engine-portable;
    the day table after the one corpus-sized groupBy is dim-sized, so
    the ordered windows cost nothing."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    d = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count("*").alias("n_events"))
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    s = d.select(
        "day", "n_events",
        F.sum("n_events").over(w_cum).alias("pre"),
        F.row_number().over(Window.orderBy("day")).cast("long").alias("i"),
        F.sum("n_events").over(w_all).alias("tot"),
        F.count("*").over(w_all).alias("nd"),
    )
    c = s.select(
        "day", "n_events",
        (F.col("nd") * F.col("pre") - F.col("i") * F.col("tot")).alias("cusum_scaled"),
    )
    mx = F.max(F.abs(F.col("cusum_scaled"))).over(w_all)
    chg = F.min(
        F.when(F.abs(F.col("cusum_scaled")) == mx, F.col("day"))
    ).over(w_all)
    return c.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_events", "cusum_scaled",
        F.col("day").eqNullSafe(chg).alias("is_change_point"),
    )


# ---------------------------------------------------------------------------
# q_simplify_track — one-pass Visvalingam effective-area polyline filter
# ---------------------------------------------------------------------------

_VW_TRACKS = 16
_VW_AREA_Q = 5_000  # keep vertices with 2·area ≥ 50 m² (q = ×100)


@register(
    "q_simplify_track",
    f"""
WITH p AS (
  SELECT doc_id % {_VW_TRACKS} AS track_id, doc_id // {_VW_TRACKS} AS seq,
         {city.X0} + (doc_id // {_VW_TRACKS}) * 10.0
           + ((doc_id * 48271) % 1000) / 1000.0 * 6.0 AS x,
         {city.Y0} + (doc_id % {_VW_TRACKS}) * 500.0
           + sin((doc_id // {_VW_TRACKS}) / 20.0) * 300.0
           + ((doc_id * 16807) % 1000) / 1000.0 * 6.0 AS y
  FROM documents
),
n AS (
  SELECT track_id, seq, x, y,
         lag(x)  OVER w AS xp, lag(y)  OVER w AS yp,
         lead(x) OVER w AS xn, lead(y) OVER w AS yn
  FROM p WINDOW w AS (PARTITION BY track_id ORDER BY seq)
),
a AS (
  SELECT track_id, seq, x, y,
         CASE WHEN xp IS NULL OR xn IS NULL THEN -1
              ELSE CAST(floor(abs((xp - x) * (yn - y) - (xn - x) * (yp - y))
                              * 100.0 + 0.5) AS BIGINT) END AS area_q
  FROM n
)
SELECT track_id, seq, round(x, 6) AS x, round(y, 6) AS y, area_q
FROM a WHERE area_q = -1 OR area_q >= {_VW_AREA_Q}
""",
)
def q_simplify_track(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass Visvalingam–Whyatt polyline simplification of 16
    deterministic GPS-like tracks (doc_id → track/seq, sinusoidal drift
    + LCG jitter): a vertex survives iff its effective triangle area
    (×2, quantized ×100 to int) clears the threshold; endpoints always
    survive.  Pure codegen lag/lead windows PARTITIONED PER TRACK — the
    scale unit of trajectory data, so a 100 TB GPS corpus simplifies
    with per-track parallelism and no global sort.  (The classic
    iterative VW re-ranks after each removal; the one-pass filter is
    the standard streaming variant and is what this operator
    implements, stated openly.)  Cross products evaluate identically in
    both engines, so the integer threshold compare is portable."""
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    did = F.col("doc_id")
    seq = (did / _VW_TRACKS).cast("long")
    p = docs.select(
        (did % _VW_TRACKS).alias("track_id"),
        seq.alias("seq"),
        (F.lit(city.X0) + seq * 10.0
         + ((did * 48271) % 1000) / 1000.0 * 6.0).alias("x"),
        (F.lit(city.Y0) + (did % _VW_TRACKS) * 500.0
         + F.sin(seq / 20.0) * 300.0
         + ((did * 16807) % 1000) / 1000.0 * 6.0).alias("y"),
    )
    w = Window.partitionBy("track_id").orderBy("seq")
    n = p.select(
        "track_id", "seq", "x", "y",
        F.lag("x").over(w).alias("xp"), F.lag("y").over(w).alias("yp"),
        F.lead("x").over(w).alias("xn"), F.lead("y").over(w).alias("yn"),
    )
    a2 = F.abs(
        (F.col("xp") - F.col("x")) * (F.col("yn") - F.col("y"))
        - (F.col("xn") - F.col("x")) * (F.col("yp") - F.col("y"))
    )
    area_q = F.when(
        F.col("xp").isNull() | F.col("xn").isNull(), F.lit(-1).cast("long")
    ).otherwise(F.floor(a2 * 100.0 + 0.5).cast("long"))
    return (
        n.withColumn("area_q", area_q)
        .filter((F.col("area_q") == -1) | (F.col("area_q") >= _VW_AREA_Q))
        .select(
            "track_id", "seq",
            F.round("x", 6).alias("x"), F.round("y", 6).alias("y"), "area_q",
        )
    )


# ---------------------------------------------------------------------------
# q_ks_test — two-sample Kolmogorov–Smirnov: src0 lengths vs the rest
# ---------------------------------------------------------------------------


@register(
    "q_ks_test",
    """
WITH c AS (SELECT n_chars AS v,
                  CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
                       AS BIGINT) AS c_a,
                  CAST(sum(CASE WHEN source != 'src0' THEN 1 ELSE 0 END)
                       AS BIGINT) AS c_b
           FROM documents GROUP BY n_chars),
s AS (SELECT v,
             CAST(sum(c_a) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_a,
             CAST(sum(c_b) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_b,
             CAST(sum(c_a) OVER () AS BIGINT) AS n_a,
             CAST(sum(c_b) OVER () AS BIGINT) AS n_b
      FROM c),
d AS (SELECT v, n_a, n_b, abs(n_b * cum_a - n_a * cum_b) AS dd FROM s),
m AS (SELECT v, n_a, n_b, dd, max(dd) OVER () AS mx FROM d)
SELECT n_a, n_b, CAST(max(dd) AS BIGINT) AS d_scaled,
       CAST(min(v) AS BIGINT) AS v_at_max,
       round(CAST(max(dd) AS DOUBLE) / CAST(n_a * n_b AS DOUBLE), 6) AS d_stat
FROM m WHERE dd = mx GROUP BY n_a, n_b
""",
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS test: does the src0 source draw document lengths
    from the same distribution as the rest of the corpus?  The
    source-shift detector that complements q_cusum_drift (time) and
    q_welch_ttest (means).  Distances stay exact int64 — the sup is
    max|n_b·cumA − n_a·cumB| over the value-domain-sized count table;
    one corpus-sized groupBy, one final division."""
    from .functions.stats import ks_two_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", F.col("n_chars").cast("long").alias("v")
    )
    return ks_two_sample(docs, "source", "v", "src0")


# ---------------------------------------------------------------------------
# q_js_divergence — Jensen–Shannon divergence between the src0 unigram
# distribution and the rest of the corpus (content-level source shift)
# ---------------------------------------------------------------------------


@register(
    "q_js_divergence",
    """
WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS t FROM documents),
c AS (SELECT t,
             CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN source != 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS b
      FROM toks GROUP BY t),
tt AS (SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb,
              CAST(count(*) AS BIGINT) AS nv
       FROM c),
x AS (SELECT nv, ta, tb,
             CAST(round((
               0.5 * (CASE WHEN a > 0 THEN
                 (CAST(a AS DOUBLE) / CAST(ta AS DOUBLE))
                 * ln((CAST(a AS DOUBLE) / CAST(ta AS DOUBLE))
                      / ((CAST(a AS DOUBLE) / CAST(ta AS DOUBLE)
                          + CAST(b AS DOUBLE) / CAST(tb AS DOUBLE)) / 2.0))
                 ELSE 0.0 END)
               + 0.5 * (CASE WHEN b > 0 THEN
                 (CAST(b AS DOUBLE) / CAST(tb AS DOUBLE))
                 * ln((CAST(b AS DOUBLE) / CAST(tb AS DOUBLE))
                      / ((CAST(a AS DOUBLE) / CAST(ta AS DOUBLE)
                          + CAST(b AS DOUBLE) / CAST(tb AS DOUBLE)) / 2.0))
                 ELSE 0.0 END)
             ) * 1000000000.0) AS BIGINT) AS cq
      FROM c, tt)
SELECT nv AS n_vocab, ta AS tok_a, tb AS tok_b,
       round(CAST(sum(cq) AS BIGINT) / 1000000000.0, 6) AS jsd
FROM x GROUP BY nv, ta, tb
""",
)
def q_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between src0's unigram distribution
    and the rest — the CONTENT-level source-shift detector next to
    q_ks_test's length-level one (0 = same distribution, ln 2 =
    disjoint support).  One vocabulary groupBy; per-token contributions
    quantize to 1e-9 integers before the sum (FP order can't move the
    6-dp result), and the smoothed mixture M = (P+Q)/2 makes every log
    finite without add-k distortion."""
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("t")
    )
    src = F.col("source") == "src0"
    c = toks.groupBy("t").agg(
        F.sum(F.when(src, 1).otherwise(0)).alias("a"),
        F.sum(F.when(~src, 1).otherwise(0)).alias("b"),
    )
    w_all = Window.partitionBy()
    c = c.select(
        "a", "b",
        F.sum("a").over(w_all).alias("ta"),
        F.sum("b").over(w_all).alias("tb"),
        F.count("*").over(w_all).alias("nv"),
    )
    p = F.col("a").cast("double") / F.col("ta").cast("double")
    q = F.col("b").cast("double") / F.col("tb").cast("double")
    m = (p + q) / 2.0
    term = (
        0.5 * F.when(F.col("a") > 0, p * F.log(p / m)).otherwise(0.0)
        + 0.5 * F.when(F.col("b") > 0, q * F.log(q / m)).otherwise(0.0)
    )
    cq = F.round(term * 1e9).cast("long")
    return (
        c.withColumn("cq", cq)
        .groupBy(
            F.col("nv").alias("n_vocab"),
            F.col("ta").alias("tok_a"),
            F.col("tb").alias("tok_b"),
        )
        .agg(F.round(F.sum("cq") / 1e9, 6).alias("jsd"))
    )


# ---------------------------------------------------------------------------
# q_ring_profile — distance-decay NDVI gradient in 100 m rings
# ---------------------------------------------------------------------------


@register(
    "q_ring_profile",
    _CTE + _pixel_cte(_NDVI_R) + f"""
, rp AS (
  SELECT doc_id,
         CAST(floor(sqrt((cx - x) * (cx - x) + (cy - y) * (cy - y))
              / 100.0) AS BIGINT) AS ring,
         greatest({city.NDVI_SQL.format(px_x='cx', px_y='cy')}, 0.0) AS v
  FROM (SELECT pxin.*, p.x, p.y FROM pxin JOIN pts p USING (doc_id))
)
SELECT doc_id, ring, CAST(count(*) AS BIGINT) AS n_px,
       round(sum(v) / count(*), 3) AS mean_v
FROM rp WHERE ring < 3 GROUP BY doc_id, ring
""",
)
def q_ring_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-decay exposure profile: clamped NDVI mean per 100 m
    concentric ring (0–300 m) around every point — the gradient version
    of q_mean_ndvi's flat buffer (availability.py:289 computes one
    number; exposure studies fit decay curves on exactly these bands).
    Same tile-cogroup partials, keyed by (id, ring); IEEE sqrt makes
    band assignment engine-portable."""
    from .operators.zonal import zonal_ring_profile

    pts = city.points_df(spark, sf_dir)
    tiles = city.tiles_df(spark, "ndvi")
    return zonal_ring_profile(
        pts, tiles, radius=_NDVI_R, ring_width=100.0, id_col="doc_id",
        grid=city.grid(),
    )


# ---------------------------------------------------------------------------
# q_attribution — last-touch attribution of purchase events
# ---------------------------------------------------------------------------


@register(
    "q_attribution",
    """
WITH s AS (
  SELECT user_id, event_type, event_id,
         epoch_us(ts) AS t,
         lag(event_type) OVER w AS prev_type,
         lag(epoch_us(ts)) OVER w AS prev_t
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT coalesce(prev_type, '(first)') AS touch,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(coalesce(t - prev_t, 0)) AS BIGINT) AS sum_gap_us
FROM s WHERE event_type = 'purchase'
GROUP BY coalesce(prev_type, '(first)')
""",
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: which event type immediately precedes
    each purchase in the same user's stream, with the exact total
    microsecond gap — the conversion-path primitive next to q_funnel.
    One per-user window (lag over ts, event_id tie-break); gaps are
    exact int64 epoch-microsecond differences, so no FP anywhere."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; the cast's session-tz offset is a constant
    # that cancels in the gap difference (the only thing emitted)
    em = F.unix_micros(F.col("ts").cast("timestamp"))
    s = ev.select(
        "event_type",
        em.alias("t"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag(em).over(w).alias("prev_t"),
    )
    return (
        s.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("prev_type", F.lit("(first)")).alias("touch"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(F.coalesce(F.col("t") - F.col("prev_t"), F.lit(0)))
            .alias("sum_gap_us"),
        )
    )


# ---------------------------------------------------------------------------
# q_shipping_priority / q_local_supplier_volume — TPC-H Q3/Q5 shapes over
# the relational fixture tables (join-agg-topk + 6-way star join)
# ---------------------------------------------------------------------------

_Q3_CUT = "1998-06-01"


@register(
    "q_shipping_priority",
    f"""
WITH j AS (
  SELECT l.l_orderkey,
         CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0)
              AS BIGINT) AS cents,
         strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
         o.o_orderpriority
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '{_Q3_CUT}'
    AND l.l_shipdate > TIMESTAMP '{_Q3_CUT}'
),
g AS (
  SELECT l_orderkey, CAST(sum(cents) AS BIGINT) AS revenue_cents,
         o_orderdate, o_orderpriority
  FROM j GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
SELECT l_orderkey, revenue_cents, o_orderdate, o_orderpriority
FROM (SELECT *, row_number() OVER (ORDER BY revenue_cents DESC, l_orderkey)
             AS rn FROM g)
WHERE rn <= 10
""",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): segment-filtered
    customer⋈orders⋈lineitem, unshipped revenue per order, top-10 —
    the join-agg-topk pattern that proves predicate pushdown, join
    ordering and partial aggregation on the relational fixtures.
    Revenue quantizes to cents per line BEFORE summing (exact int64,
    order-free); ranking ties break by order key."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderdate") < _Q3_CUT
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_shipdate") > _Q3_CUT
    )
    cents = F.round(
        F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100.0
    ).cast("long")
    g = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum(cents).alias("revenue_cents"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("revenue_cents").desc(), F.col("l_orderkey"))
    return (
        g.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("l_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority")
    )


@register(
    "q_local_supplier_volume",
    """
SELECT n.n_name,
       CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_items
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
              AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): the 6-way star join —
    region/nation dims broadcast, the customer-nation = supplier-nation
    co-location predicate, cent-exact revenue per nation.  Exercises
    multi-join reordering + dim broadcast on the relational fixtures;
    at 100 TB the fact-side joins shuffle on their keys and AQE picks
    broadcast for every dim."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet").filter(
        F.col("r_name") == "ASIA"
    )
    cents = F.round(
        F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100.0
    ).cast("long")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("n_name")
        .agg(
            F.sum(cents).alias("revenue_cents"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q_small_lot_revenue / q_idle_customers — TPC-H Q17/Q22 shapes
# (aggregate-then-rejoin threshold; scalar-subquery filter + anti join)
# ---------------------------------------------------------------------------

_Q17_BRAND = "Brand#23"
_Q17_MAX_SIZE = 15
_Q22_NATIONS = (10, 11, 12, 13, 14, 15, 16)
_Q22_CUT = "2000-08-01"  # "idle" = no order since this date (every fixture
# customer has SOME order, so the classic no-orders-ever cut is empty)


@register(
    "q_small_lot_revenue",
    f"""
WITH p AS (
  SELECT p_partkey FROM part
  WHERE p_brand = '{_Q17_BRAND}' AND p_size < {_Q17_MAX_SIZE}
),
l AS (
  SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(round(l.l_extendedprice * 100.0) AS BIGINT) AS cents
  FROM lineitem l JOIN p ON p.p_partkey = l.l_partkey
),
s AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(qty) AS BIGINT) AS sum_qty
  FROM l GROUP BY l_partkey
)
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       CAST(coalesce(sum(l.cents), 0) AS BIGINT) AS revenue_cents,
       round(CAST(coalesce(sum(l.cents), 0) AS DOUBLE) / 700.0, 6)
         AS avg_yearly
FROM l JOIN s ON s.l_partkey = l.l_partkey
WHERE 5 * l.qty * s.cnt < s.sum_qty
""",
)
def q_small_lot_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-lot revenue): per-part average quantity
    is aggregated FROM the fact table, then joined back to filter the
    same fact — the aggregate-then-rejoin threshold pattern (Catalyst
    can't dedup the scan; the agg side is part-cardinality so at scale
    it broadcasts).  The 20%-of-average cut is evaluated as the
    integer cross-product 5·qty·cnt < Σqty (quantities are integral),
    so no FP boundary exists; revenue quantizes to cents per line."""
    p = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .filter(
            (F.col("p_brand") == _Q17_BRAND)
            & (F.col("p_size") < _Q17_MAX_SIZE)
        )
        .select("p_partkey")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").join(
        F.broadcast(p), F.col("p_partkey") == F.col("l_partkey")
    ).select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100.0).cast("long").alias("cents"),
    )
    s = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("qty").alias("sum_qty"),
    )
    j = li.join(s, "l_partkey").filter(
        F.lit(5) * F.col("qty") * F.col("cnt") < F.col("sum_qty")
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.coalesce(F.sum("cents"), F.lit(0)).cast("long")
        .alias("revenue_cents"),
    ).select(
        "n_lines", "revenue_cents",
        F.round(F.col("revenue_cents").cast("double") / 700.0, 6)
        .alias("avg_yearly"),
    )


@register(
    "q_idle_customers",
    f"""
WITH cset AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100.0) AS BIGINT) AS bal_cents
  FROM customer
  WHERE c_nationkey IN {_Q22_NATIONS}
),
thr AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pos,
         CAST(sum(bal_cents) AS BIGINT) AS sum_pos
  FROM cset WHERE bal_cents > 0
),
rich AS (
  SELECT c.* FROM cset c, thr
  WHERE c.bal_cents * thr.n_pos > thr.sum_pos
),
idle AS (
  SELECT r.* FROM rich r
  LEFT JOIN (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '{_Q22_CUT}') o
    ON o.o_custkey = r.c_custkey
  WHERE o.o_custkey IS NULL
)
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_custs,
       CAST(sum(bal_cents) AS BIGINT) AS total_bal_cents
FROM idle GROUP BY c_nationkey
""",
)
def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers in a
    nation subset with above-average positive balance and NO RECENT
    orders — a scalar-subquery threshold (1-row broadcast) feeding a
    LEFT ANTI join against the date-filtered fact table, grouped per
    nation.  The average cut compares integer cross-products
    (bal·n > Σbal, balances in cents) so no FP boundary; the anti
    join shuffles on custkey at scale and the date predicate pushes
    to the orders scan."""
    c = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_nationkey").isin(*_Q22_NATIONS))
        .select(
            "c_custkey", "c_nationkey",
            F.round(F.col("c_acctbal") * 100.0).cast("long")
            .alias("bal_cents"),
        )
    )
    thr = c.filter(F.col("bal_cents") > 0).agg(
        F.count(F.lit(1)).cast("long").alias("n_pos"),
        F.sum("bal_cents").alias("sum_pos"),
    )
    rich = c.crossJoin(F.broadcast(thr)).filter(
        F.col("bal_cents") * F.col("n_pos") > F.col("sum_pos")
    )
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderdate") >= _Q22_CUT)
        .select("o_custkey")
    )
    idle = rich.join(
        o, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
    )
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_custs"),
        F.sum("bal_cents").cast("long").alias("total_bal_cents"),
    )


# ---------------------------------------------------------------------------
# q_order_priority / q_supplier_diversity — TPC-H Q4/Q16 shapes
# (correlated-EXISTS semi join; anti-joined grouped distinct counting)
# ---------------------------------------------------------------------------

_Q4_LO, _Q4_HI = "1997-01-01", "1997-04-01"
_Q4_LATE_DAYS = 45  # fixture lineitem has no commit/receipt dates, so
# "late" = shipped more than this many days after the order date


@register(
    "q_order_priority",
    f"""
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{_Q4_LO}'
  AND o.o_orderdate <  TIMESTAMP '{_Q4_HI}'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate
                                   + INTERVAL {_Q4_LATE_DAYS} DAY)
GROUP BY o.o_orderpriority
""",
)
def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): orders in a quarter
    with at least one line shipped late, counted per priority — the
    correlated-EXISTS pattern, planned as a LEFT SEMI join whose
    condition mixes the equi key with a cross-table timestamp
    predicate (Catalyst keys the shuffle on orderkey and evaluates the
    lateness filter inside the join).  Existence semantics mean
    multi-late orders count once — a plain inner join + distinct would
    pay an extra shuffle.  Timestamp arithmetic is exact in both
    engines (+45 days on microsecond timestamps)."""
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(
            (F.col("o_orderdate") >= _Q4_LO) & (F.col("o_orderdate") < _Q4_HI)
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate"
    )
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {_Q4_LATE_DAYS} DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )


@register(
    "q_supplier_diversity",
    """
SELECT p.p_brand, CAST(p.p_size // 10 AS BIGINT) AS size_bucket,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS n_suppliers,
       CAST(count(DISTINCT l.l_partkey) AS BIGINT) AS n_parts
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, size_bucket
""",
)
def q_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): supplier and
    part diversity per (brand, size bucket), excluding flagged
    suppliers — a LEFT ANTI join against a dim-sized exclusion list
    (broadcast: suppliers ≪ facts at any scale, the fixture has no
    partsupp so lineitem provides the part-supplier pairs and
    negative balance stands in for the complaints predicate) feeding
    TWO grouped exact count-distincts (Catalyst's Expand: each input
    row fans to one replica per distinct column, then two-phase
    de-dup + count — still a single shuffle on the group key)."""
    excl = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(excl),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_anti",
        )
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand",
        F.expr("CAST(p_size DIV 10 AS BIGINT)").alias("size_bucket"),
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "size_bucket")
        .agg(
            F.countDistinct("l_suppkey").cast("long").alias("n_suppliers"),
            F.countDistinct("l_partkey").cast("long").alias("n_parts"),
        )
    )


# ---------------------------------------------------------------------------
# q_bootstrap_ci — deterministic Poisson-bootstrap CI of the mean
# purchase value
# ---------------------------------------------------------------------------


def _bootstrap_oracle() -> str:
    from .functions.stats import poisson_bootstrap_sql

    return poisson_bootstrap_sql(
        "SELECT event_id, CAST(round(value * 100.0) AS BIGINT) AS vq"
        " FROM events WHERE event_type = 'purchase'",
        "vq", "event_id",
    )


@register("q_bootstrap_ci", None)  # generated oracle attached below
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (the cluster-scale resampling standard: per-row
    independent Poisson(1) multiplicities, no global coordination) of
    the mean purchase value in cents, 32 replicates, nearest-rank 5/95%
    CI.  Multiplicities come from an md5 unit hash through driver-
    literal Poisson thresholds, so both engines draw the identical
    resample and every Σw, Σw·v is exact int64."""
    from .functions.stats import poisson_bootstrap_mean

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type") == "purchase"
    ).select(
        "event_id", F.round(F.col("value") * 100.0).cast("long").alias("vq")
    )
    return poisson_bootstrap_mean(ev, "vq", "event_id")


ORACLES["q_bootstrap_ci"] = _bootstrap_oracle()


# ---------------------------------------------------------------------------
# q_stream_join — watermarked stream-stream view→purchase join
# ---------------------------------------------------------------------------


@register(
    "q_stream_join",
    """
SELECT strftime(date_trunc('day', p.ts), '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(epoch_us(p.ts) - epoch_us(v.ts)) AS BIGINT) AS sum_gap_us,
       CAST(count(DISTINCT v.user_id) AS BIGINT) AS n_users
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
WHERE v.event_type = 'view' AND p.event_type = 'purchase'
GROUP BY day
""",
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream event-time join in the gate: the view and purchase
    feeds are written to two directories and drained through the
    watermarked inner join of streaming/join.py (key = user_id,
    purchase within [view_ts, view_ts + 1 h], 2 h watermarks bounding
    the state store).  Inner-join emission is eager so one AvailableNow
    drain is complete — no closing empty delta needed.  The sink is
    rolled up per purchase day (pair count, exact µs gap sum, distinct
    converting users); the oracle is the identical batch range join,
    so the streaming join's match set is hash-checked end-to-end."""
    import atexit
    import os
    import shutil
    import tempfile

    from .streaming.join import stream_stream_join
    from .streaming.stage import drain_shuffle_partitions, stage_events

    base = os.path.join(tempfile.gettempdir(), f"q_stream_join_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    srcl, srcr, sink, ckpt = (
        os.path.join(base, d) for d in ("views", "purchases", "sink", "ckpt")
    )
    stage_events(sf_dir, srcl, event_type="view")
    stage_events(sf_dir, srcr, event_type="purchase")
    with drain_shuffle_partitions(spark):
        stream_stream_join(spark, srcl, srcr, sink, ckpt)
    out = spark.read.parquet(sink)
    return out.groupBy(
        F.date_format(F.date_trunc("day", "r_ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.unix_micros("r_ts") - F.unix_micros("l_ts")).alias("sum_gap_us"),
        F.countDistinct("k").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# q_convex_hull — per-district convex hull of geocoded documents
# ---------------------------------------------------------------------------

_HULL_CAP = 48  # hash-ranked per-block point cap (bounds kernel AND O(n³) oracle)


def _convex_hull_oracle() -> str:
    # integer-quantized coords (exact: the geocoder emits k/100-metre
    # grid positions) → O(n³) hull-edge characterization, collinear
    # boundary points included (the LCG geocoder makes arithmetic
    # doc-id progressions collinear routinely, so a strictly-left rule
    # is ambiguous on these fixtures): a directed pair (a,b) is a hull
    # edge iff NO other sampled point lies strictly right of a→b AND
    # none lies strictly between a and b on the segment (consecutive
    # boundary vertices only).  Summing the edge cross products about
    # the origin gives the exact doubled CCW area; degenerate (zero
    # area) blocks drop via HAVING, matching the kernel.
    return f"""{_CTE},
q AS (
  SELECT doc_id,
         CAST(floor((x - {city.X0}) / 1000.0) AS BIGINT) AS blk_x,
         CAST(floor((y - {city.Y0}) / 1000.0) AS BIGINT) AS blk_y,
         CAST(round((x - {city.X0}) * 100.0) AS BIGINT) AS qx,
         CAST(round((y - {city.Y0}) * 100.0) AS BIGINT) AS qy
  FROM pts
),
r AS (
  SELECT *, row_number() OVER (
      PARTITION BY blk_x, blk_y
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM q
),
s AS (SELECT DISTINCT blk_x, blk_y, qx, qy FROM r WHERE rn <= {_HULL_CAP}),
e AS (
  SELECT a.blk_x, a.blk_y,
         a.qx AS ax, a.qy AS ay, b.qx AS ex, b.qy AS ey
  FROM s a JOIN s b
    ON a.blk_x = b.blk_x AND a.blk_y = b.blk_y
   AND (a.qx <> b.qx OR a.qy <> b.qy)
  WHERE NOT EXISTS (
    SELECT 1 FROM s c
    WHERE c.blk_x = a.blk_x AND c.blk_y = a.blk_y
      AND (c.qx <> a.qx OR c.qy <> a.qy)
      AND (c.qx <> b.qx OR c.qy <> b.qy)
      AND ((b.qx - a.qx) * (c.qy - a.qy)
             - (b.qy - a.qy) * (c.qx - a.qx) < 0
           OR ((b.qx - a.qx) * (c.qy - a.qy)
                 - (b.qy - a.qy) * (c.qx - a.qx) = 0
               AND (c.qx - a.qx) * (b.qx - a.qx)
                   + (c.qy - a.qy) * (b.qy - a.qy) > 0
               AND (c.qx - b.qx) * (a.qx - b.qx)
                   + (c.qy - b.qy) * (a.qy - b.qy) > 0))
  )
),
n AS (
  SELECT blk_x, blk_y, CAST(count(*) AS BIGINT) AS n_pts
  FROM s GROUP BY blk_x, blk_y
)
SELECT n.blk_x, n.blk_y, n.n_pts,
       CAST(count(*) AS BIGINT) AS n_hull,
       CAST(sum(ax * ey - ay * ex) AS BIGINT) AS area2,
       CAST(sum(CAST(floor(sqrt(CAST((ex - ax) * (ex - ax)
              + (ey - ay) * (ey - ay) AS DOUBLE)) + 0.5) AS BIGINT))
            AS BIGINT) AS perim_q
FROM e JOIN n ON e.blk_x = n.blk_x AND e.blk_y = n.blk_y
GROUP BY n.blk_x, n.blk_y, n.n_pts
HAVING CAST(sum(ax * ey - ay * ex) AS BIGINT) > 0
"""


@register("q_convex_hull", _convex_hull_oracle())
def q_convex_hull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """District footprints: per 1-km block, the convex hull of the
    block's geocoded documents (hash-ranked cap of 48 points/block
    bounding both the Arrow kernel and the O(n³) oracle), reported as
    exact integer statistics — distinct sampled points, hull boundary
    vertex count (collinear included: the LCG geocoder makes doc-id
    progressions collinear routinely), doubled shoelace area,
    integer-rounded perimeter.  Coordinates quantize to the geocoder's
    exact 1-cm grid so every orientation test is int64 arithmetic in
    BOTH engines; degenerate (zero-area) blocks drop on both sides.
    Kernel: operators/hull.py monotone chain (two-level refinement
    documented there for un-capped corpora)."""
    from pyspark.sql.window import Window

    from .operators.hull import convex_hull_stats

    pts = city.points_df(spark, sf_dir)
    q = pts.select(
        "doc_id",
        F.floor((F.col("x") - city.X0) / 1000.0).cast("long").alias("blk_x"),
        F.floor((F.col("y") - city.Y0) / 1000.0).cast("long").alias("blk_y"),
        F.round((F.col("x") - city.X0) * 100.0).cast("long").alias("qx"),
        F.round((F.col("y") - city.Y0) * 100.0).cast("long").alias("qy"),
    )
    w = Window.partitionBy("blk_x", "blk_y").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    s = (
        q.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _HULL_CAP)
        .select("blk_x", "blk_y", "qx", "qy")
        .dropDuplicates()
    )
    return convex_hull_stats(s, ["blk_x", "blk_y"], "qx", "qy")


# ---------------------------------------------------------------------------
# q_staypoints — dwell segmentation of per-user home/work trajectories
# ---------------------------------------------------------------------------

_SP_DIST = 60                      # step threshold, integer metres
_SP_GAP_US = 48 * 3600 * 1_000_000  # 48 h max step gap


@register(
    "q_staypoints",
    f"""
WITH e AS (
  SELECT user_id, ts, event_id,
         (CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
               THEN (user_id * 48271) % 9000
               ELSE (user_id * 7919 + 211) % 9000 END)
           + ((event_id * 131) % 41 - 20) AS qx,
         (CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
               THEN (user_id * 16807) % 9000
               ELSE (user_id * 104729 + 57) % 9000 END)
           + ((event_id * 211) % 41 - 20) AS qy
  FROM events
),
l AS (
  SELECT *, lag(qx) OVER w AS px, lag(qy) OVER w AS py,
         lag(ts) OVER w AS pts
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
b AS (
  SELECT *, CASE WHEN pts IS NULL
                   OR (qx - px) * (qx - px) + (qy - py) * (qy - py)
                      > {_SP_DIST * _SP_DIST}
                   OR epoch_us(ts) - epoch_us(pts) > {_SP_GAP_US}
                 THEN 1 ELSE 0 END AS brk
  FROM l
),
i AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM b
)
SELECT user_id, CAST(epoch_us(min(ts)) AS BIGINT) AS stay_start_us,
       CAST(epoch_us(max(ts)) AS BIGINT) AS stay_end_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(qx) AS BIGINT) AS sum_qx,
       CAST(sum(qy) AS BIGINT) AS sum_qy
FROM i GROUP BY user_id, island
HAVING count(*) >= 2
""",
)
def q_staypoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stay-point (dwell) segmentation over a deterministic home/work
    mobility model: each user's position is their LCG home site during
    hours 0-11 and their work site otherwise, plus ±20 m per-event
    jitter — all int64 arithmetic, so the step test (≤ 60 m, ≤ 48 h
    between consecutive fixes under the (ts, event_id) total order) is
    exact in both engines.  The operator (operators/spacetime.py
    ``staypoints``) is gaps-and-islands: break-flag lag window +
    running-sum island ids + per-island aggregate, all sharing ONE
    per-user exchange; stays report µs-exact bounds and exact centroid
    numerators.  Dwells at home straddle nights (the 48 h gap keeps
    next-morning fixes in the same stay); home→work transitions break
    on distance."""
    from .operators.spacetime import staypoints

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    uid, eid = F.col("user_id"), F.col("event_id")
    at_home = F.expr(
        "(unix_micros(cast(ts as timestamp)) div 3600000000) % 24 < 12"
    )
    e = ev.select(
        "user_id", "ts", "event_id",
        (
            F.when(at_home, (uid * 48271) % 9000)
            .otherwise((uid * 7919 + 211) % 9000)
            + ((eid * 131) % 41 - 20)
        ).alias("qx"),
        (
            F.when(at_home, (uid * 16807) % 9000)
            .otherwise((uid * 104729 + 57) % 9000)
            + ((eid * 211) % 41 - 20)
        ).alias("qy"),
    )
    out = staypoints(
        e, dist_q=_SP_DIST, max_gap_us=_SP_GAP_US, min_pts=2
    )
    return out.select(
        "user_id",
        F.unix_micros(F.col("stay_start").cast("timestamp")).alias(
            "stay_start_us"
        ),
        F.unix_micros(F.col("stay_end").cast("timestamp")).alias("stay_end_us"),
        "n_events", "sum_qx", "sum_qy",
    )


# ---------------------------------------------------------------------------
# q_geodesic_area — sphere-exact greenspace areas at WGS84 lat/lon
# ---------------------------------------------------------------------------


def _geodesic_area_oracle() -> str:
    from .geo.geodesic import EARTH_R_M, RAD_PER_DEG

    r2 = EARTH_R_M * EARTH_R_M
    return f"""{_CTE},
g AS (
  SELECT gs_id, tag,
         4.0 + (minx - {city.X0}) / 66000.0 AS lon0,
         4.0 + (maxx - {city.X0}) / 66000.0 AS lon1,
         52.0 + (miny - {city.Y0}) / 111000.0 AS lat0,
         52.0 + (maxy - {city.Y0}) / 111000.0 AS lat1
  FROM greens
)
SELECT gs_id, tag,
       round({r2!r} * ((lon1 - lon0) * {RAD_PER_DEG!r})
             * (sin(lat1 * {RAD_PER_DEG!r}) - sin(lat0 * {RAD_PER_DEG!r})),
             3) AS geo_area_m2
FROM g
"""


@register("q_geodesic_area", _geodesic_area_oracle())
def q_geodesic_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sphere-exact (Chamberlain–Duquette, collapsed for aligned
    rects) greenspace areas after mapping the projected city onto
    WGS84 near 52°N 4°E — the global-scale complement of the planar
    area used everywhere else (the reference assumes a metric CRS
    throughout, availability.py's reprojection prologue; a worldwide
    webtext corpus cannot).  One codegen FP chain with shared
    RAD_PER_DEG / R² literals mirrored by the oracle; round-3 at 1e5
    magnitude is portable per BENCH/SCALE_AUDIT."""
    from .geo.geodesic import spherical_rect_area_m2

    g = city.greenspace_df(spark).select(
        "gs_id", "tag",
        (F.lit(4.0) + (F.col("minx") - city.X0) / 66000.0).alias("lon0"),
        (F.lit(4.0) + (F.col("maxx") - city.X0) / 66000.0).alias("lon1"),
        (F.lit(52.0) + (F.col("miny") - city.Y0) / 111000.0).alias("lat0"),
        (F.lit(52.0) + (F.col("maxy") - city.Y0) / 111000.0).alias("lat1"),
    )
    return g.select(
        "gs_id", "tag",
        F.round(
            spherical_rect_area_m2(
                F.col("lon0"), F.col("lat0"), F.col("lon1"), F.col("lat1")
            ),
            3,
        ).alias("geo_area_m2"),
    )


# ---------------------------------------------------------------------------
# q_flow_accum — D8 flow accumulation over the macro-coarsened raster
# ---------------------------------------------------------------------------

_FA_FACTOR = 20  # 1000-px raster → 50×50 macro blocks


def _flow_accum_oracle() -> str:
    from .operators.hydro import D8_DIRS

    npx = city.NPX
    vq = (
        "CAST(round(("
        + city.NDVI_SQL.format(
            px_x=f"{city.X0} + (ix + 0.5) * {city.RES}",
            px_y=f"{city.Y0} + (iy + 0.5) * {city.RES}",
        )
        + ") * 1000000.0) AS BIGINT)"
    )
    dirs = ", ".join(f"({c}, {dx}, {dy}, {w})" for c, dx, dy, w in D8_DIRS)
    return f"""
WITH RECURSIVE px AS (
  SELECT i % {npx} AS ix, i // {npx} AS iy
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
),
blk AS (
  SELECT ix // {_FA_FACTOR} AS mx, iy // {_FA_FACTOR} AS my,
         sum({vq}) AS zq
  FROM px GROUP BY 1, 2
),
dirs(code, dx, dy, w) AS (VALUES {dirs}),
cand AS (
  SELECT b.mx, b.my, d.code, d.w, n.mx AS nmx, n.my AS nmy,
         b.zq - n.zq AS dz
  FROM blk b JOIN dirs d ON true
  JOIN blk n ON n.mx = b.mx + d.dx AND n.my = b.my + d.dy
  WHERE b.zq - n.zq > 0
),
down AS (
  SELECT mx, my, nmx, nmy FROM (
    SELECT c.*, row_number() OVER (
        PARTITION BY mx, my ORDER BY dz * dz * w DESC, code ASC) AS rn
    FROM cand c) WHERE rn = 1
),
walk AS (
  SELECT mx AS smx, my AS smy, mx, my FROM blk
  UNION ALL
  SELECT w.smx, w.smy, d.nmx, d.nmy
  FROM walk w JOIN down d ON d.mx = w.mx AND d.my = w.my
)
SELECT mx, my, CAST(count(*) AS BIGINT) AS acc
FROM walk GROUP BY mx, my
"""


@register("q_flow_accum", _flow_accum_oracle())
def q_flow_accum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 flow accumulation (upstream drainage count, self included)
    over 20×20-px macro blocks of the NDVI surface-as-DEM: per-tile
    partial block sums (no shuffle) → two-phase macro aggregate →
    exact-int D8 pointers (dz²·{2,1} comparator, code-asc ties) →
    pointer-doubling transitive closure in ⌈log₂ L⌉ join rounds with
    per-round localCheckpoint (operators/hydro.py).  The oracle walks
    the SAME pointer graph with a recursive CTE — every (source, cell)
    path pair counted once; strictly-positive drops make the graph
    acyclic so both sides terminate.  Raster-only: the result is
    fixture-constant across SFs like the rest of the terrain family."""
    from .operators.hydro import d8_downstream, flow_accumulation, macro_cells

    cells = macro_cells(
        city.tiles_df(spark, "ndvi"), city.grid(), factor=_FA_FACTOR
    ).localCheckpoint()
    down = d8_downstream(cells)
    return flow_accumulation(cells, down)


# ---------------------------------------------------------------------------
# q_kcore — k-core of the host graph by recursive peeling
# ---------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_MAXIT = 120  # ≥ node count (97 hosts + 11 CDNs) ⇒ safely past the
                    # fixpoint; the recursive term re-emits the converged
                    # set each round so iter=_KCORE_MAXIT IS the core


@register(
    "q_kcore",
    "WITH RECURSIVE " + _LINK_GRAPH_CTE + f""",
und AS (
  SELECT DISTINCT least(src_host, dst_host) AS a,
                  greatest(src_host, dst_host) AS b
  FROM r WHERE src_host <> dst_host
),
du AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
peel(iter, node) AS (
  SELECT 0, a FROM (SELECT DISTINCT a FROM du)
  UNION ALL
  SELECT p.iter + 1, e.a
  FROM peel p JOIN du e ON e.b = p.node
  WHERE p.iter < {_KCORE_MAXIT}
  GROUP BY p.iter, e.a
  HAVING count(*) >= {_KCORE_K}
),
core AS (SELECT node FROM peel WHERE iter = {_KCORE_MAXIT})
SELECT e.a AS host, CAST(count(*) AS BIGINT) AS core_deg
FROM du e JOIN core c1 ON e.a = c1.node JOIN core c2 ON e.b = c2.node
GROUP BY e.a
""",
)
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_KCORE_K}-core of the undirected host graph (hosts + CDN
    hosts from the planted anchor markup): the maximal subgraph where
    every host keeps ≥ 3 distinct neighbours — the classic
    link-farm/seed-set density filter next to PageRank/HITS.  Peeling
    runs as a monotone fixpoint (one hash join + map-side-combinable
    count per round, removed hosts provably never re-qualify —
    functions/graph.py ``kcore_membership``); the oracle executes the
    SAME step under DuckDB's recursive-CTE working-table semantics,
    over-iterating to a node-count bound so the final iteration is the
    converged core.  Output: each core member with its inside-core
    degree."""
    from .functions.graph import kcore_membership
    from .functions.links import host_link_graph

    edges = host_link_graph(_link_pages_df(spark, sf_dir))
    out = kcore_membership(
        edges, k=_KCORE_K, src_col="src_host", dst_col="dst_host"
    )
    return out.select(F.col("node").alias("host"), "core_deg")


# ---------------------------------------------------------------------------
# q_watershed — terminal-pit labels + basin sizes over the macro grid
# ---------------------------------------------------------------------------


def _watershed_oracle() -> str:
    from .operators.hydro import D8_DIRS

    npx = city.NPX
    vq = (
        "CAST(round(("
        + city.NDVI_SQL.format(
            px_x=f"{city.X0} + (ix + 0.5) * {city.RES}",
            px_y=f"{city.Y0} + (iy + 0.5) * {city.RES}",
        )
        + ") * 1000000.0) AS BIGINT)"
    )
    dirs = ", ".join(f"({c}, {dx}, {dy}, {w})" for c, dx, dy, w in D8_DIRS)
    return f"""
WITH RECURSIVE px AS (
  SELECT i % {npx} AS ix, i // {npx} AS iy
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
),
blk AS (
  SELECT ix // {_FA_FACTOR} AS mx, iy // {_FA_FACTOR} AS my,
         sum({vq}) AS zq
  FROM px GROUP BY 1, 2
),
dirs(code, dx, dy, w) AS (VALUES {dirs}),
cand AS (
  SELECT b.mx, b.my, d.code, d.w, n.mx AS nmx, n.my AS nmy,
         b.zq - n.zq AS dz
  FROM blk b JOIN dirs d ON true
  JOIN blk n ON n.mx = b.mx + d.dx AND n.my = b.my + d.dy
  WHERE b.zq - n.zq > 0
),
down AS (
  SELECT mx, my, nmx, nmy FROM (
    SELECT c.*, row_number() OVER (
        PARTITION BY mx, my ORDER BY dz * dz * w DESC, code ASC) AS rn
    FROM cand c) WHERE rn = 1
),
walk AS (
  SELECT mx, my, mx AS cx, my AS cy FROM blk
  UNION ALL
  SELECT w.mx, w.my, d.nmx, d.nmy
  FROM walk w JOIN down d ON d.mx = w.cx AND d.my = w.cy
),
lab AS (
  SELECT w.mx, w.my, w.cx AS pmx, w.cy AS pmy
  FROM walk w
  WHERE NOT EXISTS (
    SELECT 1 FROM down d WHERE d.mx = w.cx AND d.my = w.cy)
)
SELECT mx, my, pmx, pmy,
       CAST(count(*) OVER (PARTITION BY pmx, pmy) AS BIGINT) AS basin_n
FROM lab
"""


_FL_CELL_M = 200.0  # macro cell side = RES 10 m × factor 20


def _flow_length_oracle() -> str:
    from .operators.hydro import D8_DIRS

    npx = city.NPX
    vq = (
        "CAST(round(("
        + city.NDVI_SQL.format(
            px_x=f"{city.X0} + (ix + 0.5) * {city.RES}",
            px_y=f"{city.Y0} + (iy + 0.5) * {city.RES}",
        )
        + ") * 1000000.0) AS BIGINT)"
    )
    dirs = ", ".join(f"({c}, {dx}, {dy}, {w})" for c, dx, dy, w in D8_DIRS)
    return f"""
WITH RECURSIVE px AS (
  SELECT i % {npx} AS ix, i // {npx} AS iy
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
),
blk AS (
  SELECT ix // {_FA_FACTOR} AS mx, iy // {_FA_FACTOR} AS my,
         sum({vq}) AS zq
  FROM px GROUP BY 1, 2
),
dirs(code, dx, dy, w) AS (VALUES {dirs}),
cand AS (
  SELECT b.mx, b.my, d.code, d.w, n.mx AS nmx, n.my AS nmy,
         b.zq - n.zq AS dz
  FROM blk b JOIN dirs d ON true
  JOIN blk n ON n.mx = b.mx + d.dx AND n.my = b.my + d.dy
  WHERE b.zq - n.zq > 0
),
down AS (
  SELECT mx, my, nmx, nmy FROM (
    SELECT c.*, row_number() OVER (
        PARTITION BY mx, my ORDER BY dz * dz * w DESC, code ASC) AS rn
    FROM cand c) WHERE rn = 1
),
walk AS (
  SELECT mx, my, mx AS cx, my AS cy,
         CAST(0 AS BIGINT) AS st, CAST(0 AS BIGINT) AS dg
  FROM blk
  UNION ALL
  SELECT w.mx, w.my, d.nmx, d.nmy, w.st + 1,
         w.dg + CASE WHEN abs(d.nmx - w.cx) + abs(d.nmy - w.cy) = 2
                     THEN 1 ELSE 0 END
  FROM walk w JOIN down d ON d.mx = w.cx AND d.my = w.cy
),
term AS (
  SELECT w.mx, w.my, w.st AS n_steps, w.dg AS n_diag
  FROM walk w
  WHERE NOT EXISTS (
    SELECT 1 FROM down d WHERE d.mx = w.cx AND d.my = w.cy)
)
SELECT mx, my, n_steps, n_diag,
       (CAST(n_steps - n_diag AS DOUBLE)
        + CAST(n_diag AS DOUBLE) * sqrt(2.0)) * {_FL_CELL_M} AS flow_len_m
FROM term
"""


@register("q_flow_length", _flow_length_oracle())
def q_flow_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downslope flow-path length to the terminal pit over the same
    macro D8 pointer graph as q_flow_accum / q_watershed (GRASS
    r.flow's length readout): EXACT integer step + diagonal counts by
    pointer squaring with accumulators (paths are functional so sums
    compose; ⌈log₂ L⌉ self-joins, never an L-step walk), metres
    assembled as (orth + diag·√2)·cell through the identical FP chain
    in both engines.  The oracle's recursive walk accumulates the same
    two integers to exhaustion.  Raster-only, fixture-constant."""
    from .operators.hydro import d8_downstream, flow_path_length, macro_cells

    cells = macro_cells(
        city.tiles_df(spark, "ndvi"), city.grid(), factor=_FA_FACTOR
    ).localCheckpoint()
    fl = flow_path_length(cells, d8_downstream(cells))
    return fl.select(
        "mx", "my", "n_steps", "n_diag",
        (
            (
                (F.col("n_steps") - F.col("n_diag")).cast("double")
                + F.col("n_diag").cast("double") * F.sqrt(F.lit(2.0))
            )
            * F.lit(_FL_CELL_M)
        ).alias("flow_len_m"),
    )


@register("q_watershed", _watershed_oracle())
def q_watershed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watershed delineation over the same macro D8 pointer graph as
    q_flow_accum: every cell labelled with its terminal pit by pointer
    SQUARING (pt ← pt∘pt with pits as fixed points — ⌈log₂ L⌉
    self-joins, never an L-step walk; operators/hydro.py
    ``watershed_labels``), plus the basin size via a window over the
    pit label.  The oracle's recursive walk follows the same pointers
    to exhaustion and keeps each cell's terminal row (the one with no
    downstream pointer) — GRASS r.watershed semantics at macro scale.
    Raster-only, fixture-constant across SFs."""
    from pyspark.sql import Window

    from .operators.hydro import d8_downstream, macro_cells, watershed_labels

    cells = macro_cells(
        city.tiles_df(spark, "ndvi"), city.grid(), factor=_FA_FACTOR
    ).localCheckpoint()
    lab = watershed_labels(cells, d8_downstream(cells))
    wb = Window.partitionBy("pmx", "pmy")
    return lab.select(
        "mx", "my", "pmx", "pmy",
        F.count(F.lit(1)).over(wb).alias("basin_n"),
    )


# ---------------------------------------------------------------------------
# q_holt_forecast — Holt linear smoothing of per-type daily volumes
# ---------------------------------------------------------------------------


def _holt_oracle() -> str:
    from .functions.timeseries import (
        HOLT_ALPHA, HOLT_BETA, HOLT_OMA, HOLT_OMB,
    )

    ln = f"{HOLT_ALPHA!r} * CAST(c.y AS DOUBLE) + {HOLT_OMA!r} * (h.l + h.b)"
    return f"""
WITH RECURSIVE e AS (
  SELECT event_type AS g, date_trunc('day', ts) AS d FROM events
),
d0 AS (SELECT min(d) AS dmin,
              date_diff('day', min(d), max(d)) AS tmax FROM e),
cnt AS (
  SELECT g, date_diff('day', d0.dmin, d) AS t,
         CAST(count(*) AS BIGINT) AS y
  FROM e, d0 GROUP BY 1, 2
),
grid AS (
  SELECT gs.g, i.t, coalesce(c.y, 0) AS y
  FROM (SELECT DISTINCT g FROM e) gs
  CROSS JOIN (SELECT unnest(generate_series(0, (SELECT tmax FROM d0))) AS t) i
  LEFT JOIN cnt c ON c.g = gs.g AND c.t = i.t
),
hw(t, g, l, b, sse) AS (
  SELECT 0, g0.g, CAST(g0.y AS DOUBLE),
         CAST(g1.y AS DOUBLE) - CAST(g0.y AS DOUBLE),
         CAST(0.0 AS DOUBLE)
  FROM grid g0 JOIN grid g1 ON g1.g = g0.g AND g0.t = 0 AND g1.t = 1
  UNION ALL
  SELECT h.t + 1, h.g,
         {ln},
         {HOLT_BETA!r} * (({ln}) - h.l) + {HOLT_OMB!r} * h.b,
         h.sse + (CAST(c.y AS DOUBLE) - (h.l + h.b))
               * (CAST(c.y AS DOUBLE) - (h.l + h.b))
  FROM hw h JOIN grid c ON c.g = h.g AND c.t = h.t + 1
)
SELECT g, CAST(t + 1 AS BIGINT) AS n_days,
       round(l, 6) AS level, round(b, 6) AS trend,
       round(l + b, 6) AS forecast1, round(sse, 6) AS sse
FROM hw WHERE t = (SELECT tmax FROM d0)
"""


@register("q_holt_forecast", _holt_oracle())
def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-day volume forecast per event stream: per-day counting is
    an ordinary two-phase aggregate over the dense calendar grid
    (gaps filled with 0 on BOTH sides), then Holt's linear recursion
    runs inside one Arrow kernel per series
    (functions/timeseries.py) — thousands of series smooth in
    parallel with per-task state bounded by the calendar.  The oracle
    replays the identical recursion (shared α/1−α/β/1−β literals,
    same operation order) as a DuckDB recursive CTE advancing all
    series in lockstep, so level/trend/forecast/SSE agree to the
    round-6 hash."""
    from .functions.timeseries import holt_linear

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(
        F.col("event_type").alias("g"),
        F.date_trunc("day", F.col("ts")).alias("d"),
    )
    bounds = e.agg(
        F.min("d").alias("dmin"),
        F.datediff(F.max("d"), F.min("d")).alias("tmax"),
    )
    cnt = (
        e.crossJoin(F.broadcast(bounds))
        .select("g", F.datediff(F.col("d"), F.col("dmin")).alias("t"))
        .groupBy("g", "t")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    grid = (
        e.select("g").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "g",
            F.explode(F.sequence(F.lit(0), F.col("tmax"))).alias("t"),
        )
        .join(cnt, ["g", "t"], "left")
        .select("g", "t", F.coalesce(F.col("y"), F.lit(0)).alias("y"))
    )
    return holt_linear(grid)


# ---------------------------------------------------------------------------
# q_acf_volume — lag-k autocorrelation of per-type daily event volumes
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 7


def _acf_oracle() -> str:
    ks = range(1, _ACF_MAX_LAG + 1)
    lag_cols = ",\n         ".join(f"lag(y, {k}) OVER w AS l{k}" for k in ks)
    agg_cols = ",\n         ".join(
        f"CAST(sum(y * l{k}) AS BIGINT) AS sp{k},\n         "
        f"CAST(sum(CASE WHEN l{k} IS NOT NULL THEN y END) AS BIGINT) AS h{k},\n         "
        f"CAST(sum(l{k}) AS BIGINT) AS tl{k}"
        for k in ks
    )
    unions = "\n  UNION ALL ".join(
        f"SELECT g, n, s, syy, CAST({k} AS BIGINT) AS k, "
        f"sp{k} AS sp, h{k} AS h, tl{k} AS tl FROM agg"
        for k in ks
    )
    return f"""
WITH e AS (
  SELECT event_type AS g, date_trunc('day', ts) AS d FROM events
),
d0 AS (SELECT min(d) AS dmin,
              date_diff('day', min(d), max(d)) AS tmax FROM e),
cnt AS (
  SELECT g, date_diff('day', d0.dmin, d) AS t,
         CAST(count(*) AS BIGINT) AS y
  FROM e, d0 GROUP BY 1, 2
),
grid AS (
  SELECT gs.g, i.t, coalesce(c.y, 0) AS y
  FROM (SELECT DISTINCT g FROM e) gs
  CROSS JOIN (SELECT unnest(generate_series(0, (SELECT tmax FROM d0))) AS t) i
  LEFT JOIN cnt c ON c.g = gs.g AND c.t = i.t
),
lg AS (
  SELECT g, y,
         {lag_cols}
  FROM grid WINDOW w AS (PARTITION BY g ORDER BY t)
),
agg AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s,
         CAST(sum(y * y) AS BIGINT) AS syy,
         {agg_cols}
  FROM lg GROUP BY g
),
ks AS (
  {unions}
)
SELECT g, k AS lag_k, n AS n_days, n - k AS n_pairs,
       round(CASE WHEN n * (n * syy - s * s) <> 0
                  THEN CAST(n * n * sp - n * s * (h + tl)
                            + (n - k) * s * s AS DOUBLE)
                       / CAST(n * (n * syy - s * s) AS DOUBLE)
             END + 0.0, 6) AS acf
FROM ks WHERE n > k
"""


@register("q_acf_volume", _acf_oracle())
def q_acf_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation of per-type daily event volume (the
    weekly-seasonality / burst-persistence readout next to
    q_cusum_drift and q_holt_forecast).  Same dense zero-filled
    calendar grid as q_holt_forecast on BOTH sides; the estimator is
    kept all-integer (n²-scaled centering, functions/timeseries.py
    ``acf_lags``) so the two engines divide the same two int64s —
    one round-6, no Python kernels, one per-series window pass."""
    from .functions.timeseries import acf_lags

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(
        F.col("event_type").alias("g"),
        F.date_trunc("day", F.col("ts")).alias("d"),
    )
    bounds = e.agg(
        F.min("d").alias("dmin"),
        F.datediff(F.max("d"), F.min("d")).alias("tmax"),
    )
    cnt = (
        e.crossJoin(F.broadcast(bounds))
        .select("g", F.datediff(F.col("d"), F.col("dmin")).alias("t"))
        .groupBy("g", "t")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    grid = (
        e.select("g").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "g",
            F.explode(F.sequence(F.lit(0), F.col("tmax"))).alias("t"),
        )
        .join(cnt, ["g", "t"], "left")
        .select("g", "t", F.coalesce(F.col("y"), F.lit(0)).alias("y"))
    )
    return acf_lags(grid, max_lag=_ACF_MAX_LAG)


# ---------------------------------------------------------------------------
# q_volume_anomaly — same-weekday z-score anomalies on daily volumes
# ---------------------------------------------------------------------------


@register(
    "q_volume_anomaly",
    """
WITH e AS (
  SELECT event_type AS g, date_trunc('day', ts) AS d FROM events
),
d0 AS (SELECT min(d) AS dmin,
              date_diff('day', min(d), max(d)) AS tmax FROM e),
cnt AS (
  SELECT g, date_diff('day', d0.dmin, d) AS t,
         CAST(count(*) AS BIGINT) AS y
  FROM e, d0 GROUP BY 1, 2
),
grid AS (
  SELECT gs.g, i.t, coalesce(c.y, 0) AS y,
         strftime(d0.dmin + INTERVAL (i.t) DAY, '%Y-%m-%d') AS day,
         (date_diff('day', DATE '1970-01-01', d0.dmin) + i.t) % 7 AS dow
  FROM (SELECT DISTINCT g FROM e) gs
  CROSS JOIN (SELECT unnest(generate_series(0, (SELECT tmax FROM d0))) AS t) i
  CROSS JOIN d0
  LEFT JOIN cnt c ON c.g = gs.g AND c.t = i.t
),
ww AS (
  SELECT g, day, y,
         CAST(count(*) OVER w AS BIGINT) AS c,
         CAST(sum(y) OVER w AS BIGINT) AS s,
         CAST(sum(y * y) OVER w AS BIGINT) AS ss
  FROM grid WINDOW w AS (PARTITION BY g, dow)
)
SELECT g, day, y AS n_events,
       CASE WHEN c * ss - s * s > 0
            THEN CAST(y * c - s AS DOUBLE)
                 / sqrt(CAST(c * ss - s * s AS DOUBLE))
       END AS z,
       CAST((y * c - s) * (y * c - s) > 4 * (c * ss - s * s)
            AS BIGINT) AS is_anomaly
FROM ww
""",
)
def q_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-weekday z-score on per-type daily event volume (the
    ingest-ops anomaly alarm beside q_cusum_drift: a Tuesday is judged
    only against Tuesdays, so weekly seasonality never trips it).
    Same dense zero-filled calendar grid as q_acf_volume on BOTH sides
    — a silent day IS the anomaly; the estimator is all-integer until
    one final division (functions/timeseries.dow_volume_anomaly) and
    the |z|>2 flag is decided entirely in integers."""
    from .functions.timeseries import dow_volume_anomaly

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(
        F.col("event_type").alias("g"),
        F.date_trunc("day", F.col("ts")).alias("d"),
    )
    bounds = e.agg(
        F.min("d").alias("dmin"),
        F.datediff(F.max("d"), F.min("d")).alias("tmax"),
    )
    cnt = (
        e.crossJoin(F.broadcast(bounds))
        .select("g", F.datediff(F.col("d"), F.col("dmin")).alias("t"))
        .groupBy("g", "t")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    grid = (
        e.select("g").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "g", "dmin",
            F.explode(F.sequence(F.lit(0), F.col("tmax"))).alias("t"),
        )
        .join(cnt, ["g", "t"], "left")
        .select(
            "g",
            F.date_format(
                F.date_add(F.col("dmin"), F.col("t")), "yyyy-MM-dd"
            ).alias("day"),
            (
                (F.datediff(F.col("dmin"), F.lit("1970-01-01")) + F.col("t"))
                % 7
            ).alias("dow"),
            F.coalesce(F.col("y"), F.lit(0)).alias("y"),
        )
    )
    return dow_volume_anomaly(grid, z_thresh=2)


# ---------------------------------------------------------------------------
# q_geohash — base32 geohash binning of geocoded documents
# ---------------------------------------------------------------------------

_GH_PRECISION = 6


def _geohash_oracle() -> str:
    from .engine.layout import geohash_chars_sql, geohash_key_sql

    key = geohash_key_sql("lon", "lat", _GH_PRECISION)
    chars = geohash_chars_sql("ghk", _GH_PRECISION)
    return f"""{_CTE},
ll AS (
  SELECT doc_id,
         4.0 + (x - {city.X0}) / 66000.0 AS lon,
         52.0 + (y - {city.Y0}) / 111000.0 AS lat
  FROM pts
),
k AS (SELECT doc_id, {key} AS ghk FROM ll)
SELECT {chars} AS gh, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS first_doc
FROM k GROUP BY gh
"""


@register("q_geohash", _geohash_oracle())
def q_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash-6 binning of the geocoded corpus on WGS84 (same city →
    lat/lon mapping as q_geodesic_area): quantize → the SAME Morton
    interleave as q_zorder_layout (geohash IS a Z-order key read 5
    bits at a time, engine/layout.py) → base32 chunks, all pure
    codegen, then a two-phase count per bin.  Validated against
    published geohashes (NYC → dr5regw); the oracle renders the same
    masks/alphabet from the shared module so the two sides cannot
    drift."""
    from .engine.layout import (
        geohash_from_key, geohash_quantize, zorder_key,
    )

    pts = city.points_df(spark, sf_dir)
    ll = pts.select(
        "doc_id",
        (F.lit(4.0) + (F.col("x") - city.X0) / 66000.0).alias("lon"),
        (F.lit(52.0) + (F.col("y") - city.Y0) / 111000.0).alias("lat"),
    )
    lon_q, lat_q = geohash_quantize(
        F.col("lon"), F.col("lat"), _GH_PRECISION
    )
    k = ll.withColumn("ghk", zorder_key(lon_q, lat_q))
    return (
        k.select("doc_id", geohash_from_key(F.col("ghk"), _GH_PRECISION).alias("gh"))
        .groupBy("gh")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
    )


# ---------------------------------------------------------------------------
# q_map_match — HMM (Viterbi) map matching of GPS tracks to the lattice
# ---------------------------------------------------------------------------

_MM_TRACKS = 8


def _map_match_oracle() -> str:
    from .operators.mapmatch import PACK, TRANS_PENALTY

    x0, y0 = city.X0, city.Y0
    packed = (
        f"min((f.cost + CASE WHEN f.edge = c.edge_id THEN 0 "
        f"ELSE {TRANS_PENALTY} END) * {PACK} + f.edge)"
    )
    return f"""
WITH RECURSIVE p AS (
  SELECT doc_id, doc_id % {_MM_TRACKS} AS track, doc_id // {_MM_TRACKS} AS t,
         {x0} + (doc_id // {_MM_TRACKS} * 40) % 9800 + 20
              + ((doc_id * 131) % 41 - 20) AS x,
         {y0} + ((doc_id % {_MM_TRACKS}) * 6 + 2) * 200
              + ((doc_id * 211) % 81 - 40) AS y
  FROM documents
),
ids AS (SELECT CAST(range AS BIGINT) AS i FROM range(2601)),
ed AS (SELECT i AS src, i + 1 AS dst FROM ids WHERE i % 51 < 50
       UNION ALL
       SELECT i AS src, i + 51 AS dst FROM ids WHERE i // 51 < 50),
seg AS (SELECT src * 100000 + dst AS edge_id,
               {x0} + (src % 51) * 200.0 AS x1,
               {y0} + (src // 51) * 200.0 AS y1,
               {x0} + (dst % 51) * 200.0 AS x2,
               {y0} + (dst // 51) * 200.0 AS y2
        FROM ed),
c1 AS (SELECT p.track, p.t, s.edge_id, p.x, p.y, s.x1, s.y1,
              s.x2 - s.x1 AS dx, s.y2 - s.y1 AS dy
       FROM p, seg s),
c2 AS (SELECT track, t, edge_id, x, y, x1, y1, dx, dy,
              CASE WHEN dx * dx + dy * dy = 0 THEN 0.0
                   ELSE least(greatest(((x - x1) * dx + (y - y1) * dy)
                                       / (dx * dx + dy * dy), 0.0), 1.0)
              END AS tt
       FROM c1),
cc AS (SELECT track, t, edge_id,
              CAST(floor(((x - (x1 + tt * dx)) * (x - (x1 + tt * dx))
                        + (y - (y1 + tt * dy)) * (y - (y1 + tt * dy)))
                         * 100.0 + 0.5) AS BIGINT) AS emis
       FROM c2),
cand AS MATERIALIZED (SELECT track, t, edge_id, emis FROM
         (SELECT *, row_number() OVER (PARTITION BY track, t
                                       ORDER BY emis, edge_id) AS rn
          FROM cc) WHERE rn <= 3),
fwd(track, t, edge, cost, prev) AS (
  SELECT track, t, edge_id, emis, CAST(-1 AS BIGINT) FROM cand WHERE t = 0
  UNION ALL
  SELECT c.track, c.t, c.edge_id,
         {packed} // {PACK} + c.emis,
         {packed} % {PACK}
  FROM fwd f JOIN cand c ON c.track = f.track AND c.t = f.t + 1
  GROUP BY c.track, c.t, c.edge_id, c.emis
),
fwd2 AS MATERIALIZED (SELECT * FROM fwd),
best AS (SELECT track, t, edge, prev FROM
         (SELECT *, row_number() OVER (PARTITION BY track
                                       ORDER BY t DESC, cost, edge) AS rn
          FROM fwd2) WHERE rn = 1),
bt(track, t, edge, prev) AS (
  SELECT track, t, edge, prev FROM best
  UNION ALL
  SELECT f.track, f.t, f.edge, f.prev
  FROM bt JOIN fwd2 f
    ON f.track = bt.track AND f.t = bt.t - 1 AND f.edge = bt.prev
  WHERE bt.t > 0
)
SELECT track, t, CAST(edge AS BIGINT) AS edge_id FROM bt
"""


@register("q_map_match", _map_match_oracle())
def q_map_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HMM map matching (Newson–Krumm shape, constant edge-switch
    transition penalty) of 8 deterministic GPS tracks — each walks an
    E-W lattice row with ±20/±40 m LCG jitter, so near intersections
    the crossing street is momentarily NEARER and pointwise snapping
    flaps; Viterbi continuity recovers the row.  Candidates: top-3
    segments per fix via the bounded cell join (provably exact on a
    200 m lattice, operators/snap.candidate_edges), emission = exact
    0.1 m² integer d²; the per-track DP and its DuckDB twin share the
    packed-argmin key (cost·PACK + prev_edge) so every
    tie resolves identically — a dynamic program hash-checked across
    engines (forward recursive CTE + backtrace recursive CTE).
    Kernel: operators/mapmatch.viterbi_match, one Arrow task per
    track."""
    from .data.city_fixture import network_dfs
    from .operators.mapmatch import viterbi_match
    from .operators.snap import candidate_edges

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    did = F.col("doc_id")
    pts = docs.select(
        "doc_id",
        (did % _MM_TRACKS).alias("track"),
        (did / _MM_TRACKS).cast("long").alias("t"),
        (F.lit(city.X0) + ((did / _MM_TRACKS).cast("long") * 40) % 9800
         + 20 + ((did * 131) % 41 - 20)).cast("double").alias("x"),
        (F.lit(city.Y0) + ((did % _MM_TRACKS) * 6 + 2) * 200
         + ((did * 211) % 81 - 40)).cast("double").alias("y"),
    )
    _, edges = network_dfs(spark)
    seg = edges.filter(F.col("src") < F.col("dst")).select(
        (F.col("src") * 100000 + F.col("dst")).alias("edge_id"),
        F.col("geom_xs")[0].alias("x1"),
        F.col("geom_ys")[0].alias("y1"),
        F.col("geom_xs")[1].alias("x2"),
        F.col("geom_ys")[1].alias("y2"),
    )
    cand = candidate_edges(pts, seg, id_col="doc_id", k=3,
                           max_snap_dist=300.0)
    cand = cand.join(pts.select("doc_id", "track", "t"), "doc_id").select(
        "track", "t", F.col("edge_id").alias("edge"), "emis"
    )
    out = viterbi_match(cand)
    return out.select("track", "t", F.col("edge").alias("edge_id"))


# ---------------------------------------------------------------------------
# q_promo_revenue / q_disjunctive_revenue — TPC-H Q14/Q19 shapes
# (conditional-share aggregate; multi-band disjunctive join predicate)
# ---------------------------------------------------------------------------

_Q14_START, _Q14_END = "1996-09-01", "1996-10-01"


@register(
    "q_promo_revenue",
    f"""
WITH j AS (
  SELECT CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0)
              AS BIGINT) AS cents,
         p.p_type
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_shipdate >= TIMESTAMP '{_Q14_START}'
    AND l.l_shipdate < TIMESTAMP '{_Q14_END}'
)
SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS BIGINT)
         AS promo_cents,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)
             / CAST(sum(cents) AS DOUBLE), 6) AS promo_pct
FROM j
""",
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): one-month shipdate slice of
    lineitem⋈part, promo share of revenue as a conditional aggregate.
    Proves the scan-level timestamp-range pushdown (the month filter
    reaches the parquet scan) + dim broadcast; revenue quantizes to
    cents per line so the share is one exact int64/int64 division."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= _Q14_START) & (F.col("l_shipdate") < _Q14_END)
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey", "p_type")
    cents = F.round(
        F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100.0
    ).cast("long")
    promo = F.when(F.col("p_type") == "PROMO", F.col("cents")).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select(cents.alias("cents"), "p_type")
        .agg(
            F.sum(promo).cast("long").alias("promo_cents"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.round(
                F.lit(100.0) * F.sum(promo) / F.sum("cents").cast("double"), 6
            ).alias("promo_pct"),
        )
    )


_Q19_BANDS = (
    ("Brand#12", 1, 11, 25),
    ("Brand#13", 10, 20, 30),
    ("Brand#25", 20, 30, 35),
)


@register(
    "q_disjunctive_revenue",
    f"""
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       CAST(coalesce(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount)
                                    * 100.0) AS BIGINT)), 0) AS BIGINT)
         AS revenue_cents
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE {" OR ".join(
    f"(p.p_brand = '{b}' AND l.l_quantity BETWEEN {lo} AND {hi}"
    f" AND p.p_size BETWEEN 1 AND {sz})" for b, lo, hi, sz in _Q19_BANDS)}
""",
)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): a three-band disjunction of
    conjunctive brand×quantity×size predicates across the join — the
    classic test that the optimizer still pushes the common join key
    through an OR-of-ANDs filter instead of falling back to a cross
    product.  Quantity bounds are integral so no FP boundary exists;
    revenue quantizes to cents per line."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    cond = None
    for b, lo, hi, sz in _Q19_BANDS:
        c = (
            (F.col("p_brand") == b)
            & F.col("l_quantity").between(lo, hi)
            & F.col("p_size").between(1, sz)
        )
        cond = c if cond is None else (cond | c)
    cents = F.round(
        F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100.0
    ).cast("long")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.coalesce(F.sum(cents), F.lit(0)).cast("long").alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# q_scd2 — slowly-changing-dimension Type-2 history from the event log
# ---------------------------------------------------------------------------

@register(
    "q_scd2",
    """
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
),
ch AS (
  SELECT user_id, event_type AS attr, ts, event_id FROM e
  WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, attr,
       CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
       CAST(epoch_us(lead(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id)) AS BIGINT)
         AS valid_to_us,
       CAST(row_number() OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS BIGINT) AS version,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         AS is_current
FROM ch
""",
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension history of each user's event_type attribute
    (Kimball versioning / Delta MERGE close-old-row shape): consecutive
    duplicates collapse, each change opens a version with exact
    epoch-microsecond validity bounds and an is_current flag."""
    from .engine.cdc import scd2_history

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return scd2_history(ev)


# ---------------------------------------------------------------------------
# q_ndcg — NDCG@10 of the BM25 ranking per source slice
# ---------------------------------------------------------------------------

def _ndcg_oracle() -> str:
    from .functions.retrieval import ndcg_oracle_sql

    return ndcg_oracle_sql(_BM25_TERMS, k=10)


@register("q_ndcg")
def q_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the BM25 ranking against md5-derived graded relevance,
    one row per source slice — the standard graded ranking-quality gate
    beside the set-based ones (q_rbo, q_ann_recall).  DCG/IDCG are
    exact int64 micro-sums (driver-literal discount weights); FP enters
    only at the final division."""
    from .functions.retrieval import bm25_scores, ndcg_at_k

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = bm25_scores(docs, _BM25_TERMS).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return ndcg_at_k(scored, k=10)


ORACLES["q_ndcg"] = _ndcg_oracle()


# ---------------------------------------------------------------------------
# q_merge_upsert — MERGE INTO apply of a CDC batch, hash-proven against
# the directly-built new snapshot (merge(old, diff(old,new)) == new)
# ---------------------------------------------------------------------------

@register(
    "q_merge_upsert",
    f"""
SELECT doc_id,
       md5(CASE WHEN doc_id % 5 = 0 THEN text || '{_CDC_UPDATE_SUFFIX}'
                ELSE text END) AS h
FROM documents WHERE doc_id % 11 != 0
""",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta/Iceberg MERGE semantics: snapshot_diff's CDC rows (the
    q_snapshot_diff synthesis) applied back onto the old snapshot must
    reproduce the new snapshot byte-for-byte — the oracle builds the
    new snapshot directly, so the hash match proves the round trip."""
    from .engine.cdc import merge_apply, snapshot_diff

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    old = docs.filter(did % 7 != 0).select("doc_id", "text")
    new = docs.filter(did % 11 != 0).select(
        "doc_id",
        F.when(did % 5 == 0, F.concat(F.col("text"), F.lit(_CDC_UPDATE_SUFFIX)))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    batch = snapshot_diff(old, new).join(new, "doc_id", "left").select(
        "doc_id", "status", "text"
    )
    merged = merge_apply(old, batch)
    return merged.select("doc_id", F.md5("text").alias("h"))


# ---------------------------------------------------------------------------
# q_langid_prf — per-class precision/recall/F1 of the language-ID heuristic
# ---------------------------------------------------------------------------

def _langid_prf_oracle() -> str:
    return f"""
WITH pred AS ({_langid_sql()}),
j AS (SELECT d.lang AS l, p.pred_lang AS p
      FROM pred p JOIN documents d USING (doc_id)),
cm AS (SELECT l, p, count(*) AS c FROM j GROUP BY l, p),
cls AS (SELECT l AS class FROM cm UNION SELECT p FROM cm),
tp AS (SELECT l AS class, c AS tp FROM cm WHERE l = p),
pt AS (SELECT p AS class, sum(c) AS np FROM cm GROUP BY p),
lt AS (SELECT l AS class, sum(c) AS nl FROM cm GROUP BY l),
x AS (
  SELECT cls.class,
         CAST(coalesce(tp.tp, 0) AS BIGINT) AS tp,
         CAST(coalesce(pt.np, 0) - coalesce(tp.tp, 0) AS BIGINT) AS fp,
         CAST(coalesce(lt.nl, 0) - coalesce(tp.tp, 0) AS BIGINT) AS fn
  FROM cls LEFT JOIN tp USING (class)
           LEFT JOIN pt USING (class)
           LEFT JOIN lt USING (class)
)
SELECT class, tp, fp, fn,
       round(tp / nullif(CAST(tp + fp AS DOUBLE), 0.0), 6) AS precision,
       round(tp / nullif(CAST(tp + fn AS DOUBLE), 0.0), 6) AS recall,
       round((2 * tp) / nullif(CAST(2 * tp + fp + fn AS DOUBLE), 0.0), 6) AS f1
FROM x
"""


@register("q_langid_prf")
def q_langid_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest precision/recall/F1 of the stopword language-ID
    against the corpus lang label — the per-class companion to
    q_cohens_kappa's single agreement number.  Exact int64 confusion
    counts; every ratio is one integer division (F1 via 2tp/(2tp+fp+fn),
    never 2pr/(p+r))."""
    from .functions.stats import classification_prf
    from .functions.text import language_id

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pred = language_id(docs).join(docs.select("doc_id", "lang"), "doc_id")
    return classification_prf(pred, label_col="lang", pred_col="pred_lang")


ORACLES["q_langid_prf"] = _langid_prf_oracle()


# ---------------------------------------------------------------------------
# q_wilson_quality — Wilson-LB host reputation from classifier keep rates
# ---------------------------------------------------------------------------

def _wilson_oracle() -> str:
    from .functions.stats import WILSON_Z, WILSON_Z2

    return f"""
WITH c AS ({_classifier_oracle()}),
j AS (SELECT d.source, c.keep FROM c JOIN documents d USING (doc_id)),
g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS k
      FROM j GROUP BY source)
SELECT source, n, k,
       ((k / CAST(n AS DOUBLE)) + {WILSON_Z2!r} / (2.0 * CAST(n AS DOUBLE))
        - {WILSON_Z!r} * sqrt(((k / CAST(n AS DOUBLE))
                               * (1.0 - (k / CAST(n AS DOUBLE)))
                               + {WILSON_Z2!r} / (4.0 * CAST(n AS DOUBLE)))
                              / CAST(n AS DOUBLE)))
       / (1.0 + {WILSON_Z2!r} / CAST(n AS DOUBLE)) AS wilson_lb
FROM g
"""


@register("q_wilson_quality")
def q_wilson_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson-score lower bound (z=1.96) on each source's classifier
    keep rate — the small-sample-robust host-reputation ranking (a 2/2
    host must not outrank a 95/100 one).  n and k are exact int64; the
    bound is the same fixed IEEE expression tree in both engines and
    ships unrounded (the rrf_score convention)."""
    from .functions.stats import wilson_lower_bound
    from .functions.text import hashed_classifier_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = hashed_classifier_score(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return wilson_lower_bound(scored, group_col="source", success_col="keep")


ORACLES["q_wilson_quality"] = _wilson_oracle()


# ---------------------------------------------------------------------------
# q_calibration_bins — reliability diagram of the rule-based quality score
# against the hashed classifier's keep decision
# ---------------------------------------------------------------------------

def _calibration_grouped_sql(n_bins: int = 10) -> str:
    # score = the 3-dp rule-based quality (micro-quantization is exact:
    # round(qm/1000·1e6) == qm·1000); label = the classifier keep flag.
    # Shared WITH-prefix ending at g(bin, n, ssum, pos) — used by BOTH
    # the q_calibration_bins and q_ece oracles so the binning cannot
    # drift between diagram and scalar.
    width = (1.0 - 0.0) / n_bins
    return f"""
WITH c AS ({_classifier_oracle()}),
t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n,
         CAST(len(list_filter(toks, x -> x IN {_STOP_SQL})) AS DOUBLE) AS nstop,
         (length(text) - len(toks) + 1) / CAST(len(toks) AS DOUBLE) AS mean_len
  FROM t
),
q AS (
  SELECT doc_id,
         round(least(n / 64.0, 1.0)
               * (1.0 - least(nstop / n * 4.0, 1.0))
               * (CASE WHEN mean_len >= 3.0 AND mean_len <= 10.0
                       THEN 1.0 ELSE 0.5 END), 3) AS quality
  FROM s
),
j AS (
  SELECT least({n_bins - 1},
               greatest(0, CAST(floor((q.quality - 0.0) / {width!r}) AS INT)))
           AS bin,
         CAST(round(q.quality * 1000000.0) AS BIGINT) AS sm,
         CASE WHEN c.keep THEN 1 ELSE 0 END AS y
  FROM q JOIN c USING (doc_id)
),
g AS (
  SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(sm) AS BIGINT) AS ssum, CAST(sum(y) AS BIGINT) AS pos
  FROM j GROUP BY bin
)"""


def _calibration_oracle(n_bins: int = 10) -> str:
    return _calibration_grouped_sql(n_bins) + """
SELECT bin, n,
       ssum / (n * 1000000.0) AS mean_score,
       pos / CAST(n AS DOUBLE) AS pos_rate,
       abs(ssum / (n * 1000000.0) - pos / CAST(n AS DOUBLE)) AS gap
FROM g
"""


def _ece_oracle(n_bins: int = 10) -> str:
    return _calibration_grouped_sql(n_bins) + """
SELECT CAST(sum(n) AS BIGINT) AS n_total,
       CAST(count(*) AS BIGINT) AS n_bins_occupied,
       round(CAST(sum(abs(ssum - 1000000 * pos)) AS DOUBLE) / 1000000.0
             / CAST(sum(n) AS DOUBLE) + 0.0, 6) AS ece
FROM g
"""


@register("q_calibration_bins")
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram (the ECE ingredients): decile bins of the
    rule-based quality score vs the hashed classifier's empirical keep
    rate — "is the cheap heuristic calibrated against the model?", the
    standard check before a pipeline swaps one filter for the other.
    The 3-dp score micro-quantizes exactly, so per-bin means are single
    divisions of int64 sums."""
    from .functions.stats import calibration_bins
    from .functions.text import hashed_classifier_score, quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = quality_score(docs).join(
        hashed_classifier_score(docs).select("doc_id", "keep"), "doc_id"
    )
    return calibration_bins(df, score_col="quality", label_col="keep",
                            n_bins=10, lo=0.0, hi=1.0)


ORACLES["q_calibration_bins"] = _calibration_oracle()


@register("q_ece")
def q_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected calibration error — q_calibration_bins collapsed to
    the headline scalar, EXACT-RATIONALLY: each bin's weighted gap is
    |ssum − 1e6·pos| / (1e6·N) so the cross-bin sum is one exact
    integer sum and the only FP is the final division (no per-bin
    doubles ever sum across bins).  Shares the binning CTE prefix with
    the diagram oracle so the two cannot drift."""
    from .functions.stats import expected_calibration_error
    from .functions.text import hashed_classifier_score, quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = quality_score(docs).join(
        hashed_classifier_score(docs).select("doc_id", "keep"), "doc_id"
    )
    return expected_calibration_error(
        df, score_col="quality", label_col="keep", n_bins=10, lo=0.0, hi=1.0
    )


ORACLES["q_ece"] = _ece_oracle()


# ---------------------------------------------------------------------------
# q_anova — one-way ANOVA F across the five event types (welch scaled to G)
# ---------------------------------------------------------------------------

def _anova_tail_sql(gs: list) -> str:
    """The fixed-lexical-order ANOVA sum assembly over a CTE named
    ``e (g, vq)`` — shared by the q_anova and q_brown_forsythe oracles
    so the F chain cannot drift between them."""
    cols = []
    for i, name in enumerate(gs):
        cols += [
            f"CAST(sum(CASE WHEN g = '{name}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{i}",
            f"CAST(sum(CASE WHEN g = '{name}' THEN vq ELSE 0 END) AS BIGINT) AS s_{i}",
            f"CAST(sum(CASE WHEN g = '{name}' THEN vq * vq ELSE 0 END) AS BIGINT) AS q_{i}",
        ]
    idx = range(len(gs))
    n_tot = " + ".join(f"CAST(n_{i} AS DOUBLE)" for i in idx)
    s_tot = " + ".join(f"CAST(s_{i} AS DOUBLE)" for i in idx)
    q_tot = " + ".join(f"CAST(q_{i} AS DOUBLE)" for i in idx)
    sb = " + ".join(
        f"CAST(s_{i} AS DOUBLE) * CAST(s_{i} AS DOUBLE) / CAST(n_{i} AS DOUBLE)"
        for i in idx
    )
    g_cnt = len(gs)
    return f"""a AS (SELECT {', '.join(cols)} FROM e),
d AS (SELECT ({n_tot}) AS n_tot, ({s_tot}) AS s_tot,
             ({q_tot}) AS q_tot, ({sb}) AS sb
      FROM a)
SELECT CAST(n_tot AS BIGINT) AS n_total,
       CAST({g_cnt - 1} AS BIGINT) AS df_between,
       CAST(n_tot - {g_cnt} AS BIGINT) AS df_within,
       sb - s_tot * s_tot / n_tot AS ss_between,
       q_tot - sb AS ss_within,
       ((sb - s_tot * s_tot / n_tot) / {float(g_cnt - 1)!r})
         / ((q_tot - sb) / (n_tot - {float(g_cnt)!r})) AS f_stat
FROM d
"""


def _anova_oracle() -> str:
    gs = sorted(_EVENT_TYPES)
    return f"""
WITH e AS (SELECT event_type AS g, CAST(round(value * 100.0) AS BIGINT) AS vq
           FROM events WHERE event_type IN {tuple(gs)!r}),
""" + _anova_tail_sql(gs)


@register("q_anova")
def q_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F across the five event types' cent-quantized
    values — the G-group generalization of q_welch_ttest: 15 exact int64
    conditional sums in one aggregation row, the cross-group Σ assembled
    in fixed lexical order so no distributed FP reorder exists.  SS and
    F ship unrounded (magnitudes exceed the safe-rounding envelope)."""
    from .functions.stats import anova_oneway

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100.0).cast("long").alias("vq"),
    )
    return anova_oneway(ev, "g", "vq", list(_EVENT_TYPES))


ORACLES["q_anova"] = _anova_oracle()


# ---------------------------------------------------------------------------
# q_pq_ann — product-quantization ADC search (the compressed-corpus path)
# ---------------------------------------------------------------------------

_PQ_M, _PQ_KSUB, _PQ_DIM = 4, 16, 64
_PQ_SUB = _PQ_DIM // _PQ_M
_PQ_D2 = (
    "round(list_sum(list_transform(list_zip({a}, {b}), "
    "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) "
    "* (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), 6)"
)


@register(
    "q_pq_ann",
    f"""
WITH js AS (SELECT CAST(r.range AS INT) AS j FROM range({_PQ_M}) r),
c AS (SELECT vec_id AS c_id, embedding AS cv FROM embeddings
      WHERE vec_id < {_PQ_KSUB}),
cs AS (SELECT c.c_id, js.j,
              list_slice(c.cv, js.j * {_PQ_SUB} + 1,
                         js.j * {_PQ_SUB} + {_PQ_SUB}) AS cv
       FROM c, js),
vs AS (SELECT v.vec_id AS n_id, js.j,
              list_slice(v.embedding, js.j * {_PQ_SUB} + 1,
                         js.j * {_PQ_SUB} + {_PQ_SUB}) AS sv
       FROM embeddings v, js),
asg0 AS (
  SELECT vs.n_id, vs.j, cs.c_id,
         {_PQ_D2.format(a='vs.sv', b='cs.cv')} AS d2
  FROM vs JOIN cs USING (j)
),
asg1 AS (
  SELECT n_id, j, c_id,
         row_number() OVER (PARTITION BY n_id, j
                            ORDER BY d2 ASC, c_id ASC) AS r
  FROM asg0
),
codes AS (SELECT n_id, j, c_id AS code FROM asg1 WHERE r = 1),
q AS (SELECT vec_id AS q_id, embedding FROM embeddings WHERE vec_id < 10),
qs AS (SELECT q.q_id, js.j,
              list_slice(q.embedding, js.j * {_PQ_SUB} + 1,
                         js.j * {_PQ_SUB} + {_PQ_SUB}) AS sv
       FROM q, js),
lut AS (
  SELECT qs.q_id, qs.j, cs.c_id AS code,
         CAST(round({_PQ_D2.format(a='qs.sv', b='cs.cv')} * 1000000.0)
              AS BIGINT) AS lm
  FROM qs JOIN cs USING (j)
),
adc AS (
  SELECT lut.q_id, codes.n_id, CAST(sum(lut.lm) AS BIGINT) AS adc_micro
  FROM codes JOIN lut ON lut.j = codes.j AND lut.code = codes.code
  WHERE lut.q_id <> codes.n_id
  GROUP BY lut.q_id, codes.n_id
),
r AS (
  SELECT q_id, n_id, adc_micro,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY adc_micro ASC, n_id ASC) AS rank
  FROM adc
)
SELECT q_id, n_id, adc_micro / 1000000.0 AS adc, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 10
""",
)
def q_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (ADC): m=4 subspaces × 16 deterministic
    sub-centroids, corpus compressed to codes, queries scored via a
    broadcast lookup table of exact micro-int distances — the
    compressed-memory scale path beside IVF (q_ivf_ann) and sign-LSH
    (q_lsh_ann), completing the quantized-search family with sq8."""
    from .functions.similarity import pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return pq_topk(
        emb.filter(F.col("vec_id") < 10), emb,
        k=10, m=_PQ_M, ksub=_PQ_KSUB, dim=_PQ_DIM,
    )


# ---------------------------------------------------------------------------
# q_stream_enrich — stream-static enrichment join + windowed aggregate
# ---------------------------------------------------------------------------

@register(
    "q_stream_enrich",
    """
WITH cutoff AS (SELECT max(ts) - INTERVAL 2 DAY AS wm FROM events),
seg AS (SELECT DISTINCT user_id,
               CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                    AS UBIGINT) % 4 AS BIGINT) AS segment
        FROM events),
w AS (SELECT date_trunc('day', e.ts) AS ws, s.segment
      FROM events e JOIN seg s USING (user_id))
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
       strftime(ws + INTERVAL 1 DAY, '%Y-%m-%d %H:%M:%S') AS win_end,
       segment, CAST(count(*) AS BIGINT) AS n_events
FROM w, cutoff
WHERE ws + INTERVAL 1 DAY <= wm
GROUP BY ws, segment
""",
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC enrichment join (the uncovered streaming join
    shape beside q_stream_join's stream-stream one): the event stream
    joins a broadcast user→segment dimension before the watermarked
    tumbling-window count; same two-drain AvailableNow harness and
    append-mode closure rule as q_window_stream, oracle = the batch
    twin with the identical md5 segment derivation."""
    import atexit
    import os
    import shutil
    import tempfile

    from .streaming.ingest import enriched_windowed_counts
    from .streaming.stage import (
        append_empty_delta,
        drain_shuffle_partitions,
        stage_events,
    )

    base = os.path.join(tempfile.gettempdir(), f"q_stream_enrich_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    src, sink, ckpt = (os.path.join(base, d) for d in ("src", "sink", "ckpt"))
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    dim = ev.select("user_id").distinct().withColumn(
        "segment",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
            ).cast("long"),
            F.lit(4),
        ).cast("long"),
    )
    stage_events(sf_dir, src)
    with drain_shuffle_partitions(spark):
        enriched_windowed_counts(spark, src, sink, ckpt, dim)
        append_empty_delta(src)
        enriched_windowed_counts(spark, src, sink, ckpt, dim)
    out = spark.read.parquet(sink)
    return out.select(
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        F.date_format("win_end", "yyyy-MM-dd HH:mm:ss").alias("win_end"),
        F.col("segment").cast("long").alias("segment"),
        F.col("n_events").cast("long").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# q_json_extract — typed JSON field extraction + per-group profile
# ---------------------------------------------------------------------------

@register(
    "q_json_extract",
    """
WITH e AS (SELECT event_type AS grp,
                  CAST(json_extract_string(props, '$.k') AS INT) AS k
           FROM events)
SELECT grp, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(coalesce(sum(k), 0) AS BIGINT) AS sum_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k
FROM e GROUP BY grp
""",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the semi-structured props column
    (from_json with an explicit schema — JVM-side, fused into the
    column-pruned scan, never schema inference) profiled per event
    type, with malformed/missing extractions counted as n_null rather
    than dropped — the semi-structured surface every crawl-metadata
    pipeline needs."""
    from .functions.semistructured import json_field_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return json_field_stats(ev, json_col="props", field="k",
                            group_col="event_type")


# ---------------------------------------------------------------------------
# q_mase — seasonal-naive vs naive forecastability (MASE) per event type
# ---------------------------------------------------------------------------

@register(
    "q_mase",
    """
WITH e AS (
  SELECT event_type AS g, date_trunc('day', ts) AS d FROM events
),
d0 AS (SELECT min(d) AS dmin,
              date_diff('day', min(d), max(d)) AS tmax FROM e),
cnt AS (
  SELECT g, date_diff('day', d0.dmin, d) AS t,
         CAST(count(*) AS BIGINT) AS y
  FROM e, d0 GROUP BY 1, 2
),
grid AS (
  SELECT gs.g, i.t, coalesce(c.y, 0) AS y
  FROM (SELECT DISTINCT g FROM e) gs
  CROSS JOIN (SELECT unnest(generate_series(0, (SELECT tmax FROM d0))) AS t) i
  LEFT JOIN cnt c ON c.g = gs.g AND c.t = i.t
),
l AS (
  SELECT g, y,
         lag(y, 1) OVER (PARTITION BY g ORDER BY t) AS y1,
         lag(y, 7) OVER (PARTITION BY g ORDER BY t) AS ys
  FROM grid
),
a AS (
  SELECT g AS series, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(CASE WHEN ys IS NOT NULL THEN abs(y - ys) ELSE 0 END)
              AS BIGINT) AS sae_seasonal,
         CAST(sum(CASE WHEN ys IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS cs,
         CAST(sum(CASE WHEN y1 IS NOT NULL THEN abs(y - y1) ELSE 0 END)
              AS BIGINT) AS sae_naive,
         CAST(sum(CASE WHEN y1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS cn
  FROM l GROUP BY g
)
SELECT series, n_days, sae_seasonal, sae_naive,
       CASE WHEN sae_naive > 0
            THEN (CAST(sae_seasonal AS DOUBLE) / CAST(cs AS DOUBLE))
                 / (CAST(sae_naive AS DOUBLE) / CAST(cn AS DOUBLE))
       END AS mase
FROM a
""",
)
def q_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE (Hyndman & Koehler) of the seasonal-naive weekly forecast
    against the one-step naive baseline per event-type daily volume —
    the scale-free forecastability eval that closes the forecasting
    loop opened by q_holt_forecast.  Same dense zero-filled calendar as
    q_volume_anomaly on both sides; both error sums are exact int64."""
    from .functions.timeseries import mase_seasonal_naive

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(
        F.col("event_type").alias("g"),
        F.date_trunc("day", F.col("ts")).alias("d"),
    )
    bounds = e.agg(
        F.min("d").alias("dmin"),
        F.datediff(F.max("d"), F.min("d")).alias("tmax"),
    )
    cnt = (
        e.crossJoin(F.broadcast(bounds))
        .select("g", F.datediff(F.col("d"), F.col("dmin")).alias("t"))
        .groupBy("g", "t")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    grid = (
        e.select("g").distinct()
        .crossJoin(F.broadcast(bounds))
        .select("g", F.explode(F.sequence(F.lit(0), F.col("tmax"))).alias("t"))
        .join(cnt, ["g", "t"], "left")
        .select("g", "t", F.coalesce(F.col("y"), F.lit(0)).alias("y"))
    )
    return mase_seasonal_naive(grid, series_col="g", t_col="t", y_col="y",
                               season=7)


# ---------------------------------------------------------------------------
# q_dq_audit — dbt-style data-quality expectation suite over the fixtures
# ---------------------------------------------------------------------------

@register(
    "q_dq_audit",
    """
SELECT 'orders_custkey_ri' AS check, CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations,
       sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) = 0 AS pass
FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
UNION ALL
SELECT 'lineitem_orderkey_ri', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) = 0
FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
UNION ALL
SELECT 'customer_custkey_unique', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT),
       count(*) - count(DISTINCT c_custkey) = 0
FROM customer
UNION ALL
SELECT 'events_value_nonneg', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN value IS NULL OR NOT (value >= 0.0)
                     THEN 1 ELSE 0 END) AS BIGINT),
       sum(CASE WHEN value IS NULL OR NOT (value >= 0.0)
                THEN 1 ELSE 0 END) = 0
FROM events
UNION ALL
SELECT 'documents_text_nonempty', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN text IS NULL OR length(text) = 0
                     THEN 1 ELSE 0 END) AS BIGINT),
       sum(CASE WHEN text IS NULL OR length(text) = 0
                THEN 1 ELSE 0 END) = 0
FROM documents
""",
)
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt/great-expectations-style data-quality gate: five
    expectations (two referential-integrity left-join probes, one
    uniqueness, one range, one non-empty) each as a single
    map-side-combinable aggregate — the suite a 100 TB ingest runs
    before promoting a snapshot; a NULL expectation counts as a
    violation rather than vanishing."""
    from pyspark.sql import Window

    from .functions.audit import dq_check

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    checks = [
        dq_check(
            o.join(c.select("c_custkey"), o.o_custkey == c.c_custkey, "left"),
            F.col("c_custkey").isNull(), "orders_custkey_ri",
        ),
        dq_check(
            li.join(o.select("o_orderkey"),
                    li.l_orderkey == o.o_orderkey, "left"),
            F.col("o_orderkey").isNull(), "lineitem_orderkey_ri",
        ),
        dq_check(
            # row-level extras: count(*) − count(distinct key) violations
            c.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("c_custkey").orderBy("c_custkey")
                ),
            ),
            F.col("_rn") > 1, "customer_custkey_unique",
        ),
        dq_check(ev, F.col("value").isNull() | ~(F.col("value") >= 0.0),
                 "events_value_nonneg"),
        dq_check(docs, F.col("text").isNull() | (F.length("text") == 0),
                 "documents_text_nonempty"),
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out.unionByName(ch)
    return out


# ---------------------------------------------------------------------------
# q_equidepth_hist — exact equi-depth histogram (ANALYZE-statistics shape)
# ---------------------------------------------------------------------------

@register(
    "q_equidepth_hist",
    """
WITH e AS (SELECT CAST(round(value * 100.0) AS BIGINT) AS v, event_id AS s
           FROM events),
r AS (SELECT v, row_number() OVER (ORDER BY v, s) AS rk,
             count(*) OVER () AS n
      FROM e)
SELECT CAST((rk - 1) * 8 // n AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(v) AS BIGINT) AS lo,
       CAST(max(v) AS BIGINT) AS hi
FROM r GROUP BY 1
""",
)
def q_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 8-bucket equi-depth histogram of the cent-quantized event
    values — the ANALYZE-TABLE optimizer-statistics shape, built on the
    two-phase global rank (no single-task sort); bucket assignment is
    pure int64 ``(rank−1)·B div N``."""
    from .functions.sketches import equidepth_histogram

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.round(F.col("value") * 100.0).cast("long").alias("v"),
        F.col("event_id").alias("s"),
    )
    return equidepth_histogram(ev, "v", "s", n_buckets=8)


# ---------------------------------------------------------------------------
# q_rolling_median — exact trailing-window median per event-type volume
# ---------------------------------------------------------------------------

@register(
    "q_rolling_median",
    """
WITH e AS (
  SELECT event_type AS g, date_trunc('day', ts) AS d FROM events
),
d0 AS (SELECT min(d) AS dmin,
              date_diff('day', min(d), max(d)) AS tmax FROM e),
cnt AS (
  SELECT g, date_diff('day', d0.dmin, d) AS t,
         CAST(count(*) AS BIGINT) AS y
  FROM e, d0 GROUP BY 1, 2
),
grid AS (
  SELECT gs.g, i.t, coalesce(c.y, 0) AS y
  FROM (SELECT DISTINCT g FROM e) gs
  CROSS JOIN (SELECT unnest(generate_series(0, (SELECT tmax FROM d0))) AS t) i
  LEFT JOIN cnt c ON c.g = gs.g AND c.t = i.t
),
l AS (
  SELECT g AS series, CAST(t AS BIGINT) AS t, y,
         list_sort(list(y) OVER (PARTITION BY g ORDER BY t
                                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
           AS arr
  FROM grid
)
SELECT series, t, y,
       CAST(len(arr) AS BIGINT) AS n_win,
       CAST(arr[CAST((len(arr) + 1) // 2 AS INT)] AS BIGINT) AS roll_median
FROM l
""",
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 7-day trailing median of per-type daily volume over the
    dense zero-filled calendar (the spike-proof ops smoother beside
    q_volume_anomaly's z-alarm) — all-integer lower median, identical
    element both engines."""
    from .functions.timeseries import rolling_median

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(
        F.col("event_type").alias("g"),
        F.date_trunc("day", F.col("ts")).alias("d"),
    )
    bounds = e.agg(
        F.min("d").alias("dmin"),
        F.datediff(F.max("d"), F.min("d")).alias("tmax"),
    )
    cnt = (
        e.crossJoin(F.broadcast(bounds))
        .select("g", F.datediff(F.col("d"), F.col("dmin")).alias("t"))
        .groupBy("g", "t")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    grid = (
        e.select("g").distinct()
        .crossJoin(F.broadcast(bounds))
        .select("g", F.explode(F.sequence(F.lit(0), F.col("tmax"))).alias("t"))
        .join(cnt, ["g", "t"], "left")
        .select("g", "t", F.coalesce(F.col("y"), F.lit(0)).alias("y"))
    )
    return rolling_median(grid, series_col="g", t_col="t", y_col="y", window=7)


# ---------------------------------------------------------------------------
# q_rfm — recency/frequency/monetary segmentation of purchasers
# ---------------------------------------------------------------------------

@register(
    "q_rfm",
    """
WITH p AS (SELECT user_id, date_trunc('day', ts) AS d,
                  CAST(round(value * 100.0) AS BIGINT) AS cents
           FROM events WHERE event_type = 'purchase'),
ref AS (SELECT max(d) AS rd FROM p),
base AS (
  SELECT user_id,
         CAST(date_diff('day', max(d), (SELECT rd FROM ref)) AS BIGINT)
           AS recency_days,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(cents) AS BIGINT) AS monetary_cents
  FROM p GROUP BY user_id
),
n AS (SELECT count(*) AS n FROM base),
r AS (SELECT user_id,
             5 - (row_number() OVER (ORDER BY recency_days, user_id) - 1)
                 * 5 // (SELECT n FROM n) AS r_score
      FROM base),
f AS (SELECT user_id,
             5 - (row_number() OVER (ORDER BY -frequency, user_id) - 1)
                 * 5 // (SELECT n FROM n) AS f_score
      FROM base),
m AS (SELECT user_id,
             5 - (row_number() OVER (ORDER BY -monetary_cents, user_id) - 1)
                 * 5 // (SELECT n FROM n) AS m_score
      FROM base)
SELECT b.user_id, b.recency_days, b.frequency, b.monetary_cents,
       CAST(r.r_score AS BIGINT) AS r_score,
       CAST(f.f_score AS BIGINT) AS f_score,
       CAST(m.m_score AS BIGINT) AS m_score,
       CAST(r.r_score AS VARCHAR) || CAST(f.f_score AS VARCHAR)
         || CAST(m.m_score AS VARCHAR) AS segment
FROM base b JOIN r USING (user_id) JOIN f USING (user_id)
            JOIN m USING (user_id)
""",
)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation of purchasers (recency vs the stream's own
    max-day reference, cent-exact monetary) with equi-depth quintile
    scores via the two-phase global rank — int64 tile arithmetic, total
    orders tie-broken by user id, 5 = best on every axis."""
    from .operators.funnel import rfm_segments

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return rfm_segments(ev)


# ---------------------------------------------------------------------------
# q_stream_upsert — foreachBatch copy-on-write MERGE sink (CDC stream)
# ---------------------------------------------------------------------------

@register(
    "q_stream_upsert",
    f"""
SELECT doc_id,
       md5(CASE WHEN doc_id % 5 = 0 THEN text || '{_CDC_UPDATE_SUFFIX}'
                ELSE text END) AS h
FROM documents WHERE doc_id % 11 != 0
""",
)
def q_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q_merge_upsert CDC applied THROUGH the streaming MERGE sink:
    the diff lands as two disjoint-key batch files, foreachBatch
    (maxFilesPerTrigger=1) merges each copy-on-write into the snapshot
    table — the Delta streaming-MERGE pattern and the last uncovered
    Structured-Streaming sink surface.  Oracle = the directly-built new
    snapshot, so the hash proves stream-merge(old, diff) == new."""
    import atexit
    import os
    import shutil
    import tempfile

    from .engine.cdc import snapshot_diff
    from .streaming.upsert import stream_merge_apply

    base = os.path.join(tempfile.gettempdir(), f"q_stream_upsert_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    src, table, ckpt = (os.path.join(base, d) for d in ("src", "table", "ckpt"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    old = docs.filter(did % 7 != 0).select("doc_id", "text")
    new = docs.filter(did % 11 != 0).select(
        "doc_id",
        F.when(did % 5 == 0, F.concat(F.col("text"), F.lit(_CDC_UPDATE_SUFFIX)))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    old.write.parquet(table)
    batch = snapshot_diff(old, new).join(new, "doc_id", "left").select(
        "doc_id", "status", "text"
    ).localCheckpoint()  # two parity writes consume it (no-CSE rule)
    batch.filter(did % 2 == 0).coalesce(1).write.parquet(src)
    batch.filter(did % 2 != 0).coalesce(1).write.mode("append").parquet(src)
    stream_merge_apply(
        spark, src, table, ckpt,
        schema="doc_id long, status string, text string",
    )
    return spark.read.parquet(table).select("doc_id", F.md5("text").alias("h"))


# ---------------------------------------------------------------------------
# q_mad — per-type robust location/spread (exact median + MAD)
# ---------------------------------------------------------------------------

@register(
    "q_mad",
    """
WITH e AS (SELECT event_type AS grp, CAST(round(value * 100.0) AS BIGINT) AS v
           FROM events),
h AS (SELECT grp, v, count(*) AS c FROM e GROUP BY grp, v),
x AS (SELECT grp, v,
             sum(c) OVER (PARTITION BY grp ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(c) OVER (PARTITION BY grp) AS n
      FROM h),
med AS (SELECT grp, CAST(min(n) AS BIGINT) AS n, CAST(min(v) AS BIGINT)
               AS median
        FROM x WHERE cum >= (n + 1) // 2 GROUP BY grp),
d AS (SELECT h.grp, abs(h.v - med.median) AS v, h.c
      FROM h JOIN med USING (grp)),
h2 AS (SELECT grp, v, sum(c) AS c FROM d GROUP BY grp, v),
x2 AS (SELECT grp, v,
              sum(c) OVER (PARTITION BY grp ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS cum,
              sum(c) OVER (PARTITION BY grp) AS n
       FROM h2),
mad AS (SELECT grp, CAST(min(v) AS BIGINT) AS mad
        FROM x2 WHERE cum >= (n + 1) // 2 GROUP BY grp)
SELECT med.grp, med.n, med.median, mad.mad
FROM med JOIN mad USING (grp)
""",
)
def q_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type median and median absolute deviation of the
    cent-quantized event values — the robust location/spread readout a
    single outlier cannot wreck; both medians run the value-histogram
    shape (corpus-sized groupBy once, dim-sized windows after),
    all-integer lower medians identical in both engines."""
    from .functions.stats import grouped_median_mad

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("event_type").alias("grp"),
        F.round(F.col("value") * 100.0).cast("long").alias("v"),
    )
    return grouped_median_mad(ev, "grp", "v")


# ---------------------------------------------------------------------------
# q_theilsen — robust daily-volume trend (median of pairwise slopes)
# ---------------------------------------------------------------------------

@register(
    "q_theilsen",
    """
WITH e AS (SELECT date_trunc('day', ts) AS d FROM events),
d0 AS (SELECT min(d) AS dmin,
              date_diff('day', min(d), max(d)) AS tmax FROM e),
cnt AS (SELECT date_diff('day', d0.dmin, d) AS t,
               CAST(count(*) AS BIGINT) AS y
        FROM e, d0 GROUP BY 1),
grid AS (
  SELECT i.t, coalesce(c.y, 0) AS y
  FROM (SELECT unnest(generate_series(0, (SELECT tmax FROM d0))) AS t) i
  LEFT JOIN cnt c ON c.t = i.t
),
p AS (
  SELECT a.t AS ti, b.t AS tj,
         CAST(b.y - a.y AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS sl
  FROM grid a JOIN grid b ON a.t < b.t
),
r AS (SELECT sl,
             count(*) OVER (ORDER BY sl, ti, tj
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             count(*) OVER () AS np
      FROM p),
s AS (SELECT min(sl) AS slope, CAST(min(np) AS BIGINT) AS n_pairs
      FROM r WHERE cum >= (np + 1) // 2),
res AS (SELECT CAST(g.y AS DOUBLE) - s.slope * CAST(g.t AS DOUBLE) AS b,
               g.t, s.slope, s.n_pairs
        FROM grid g, s),
r2 AS (SELECT b, slope, n_pairs,
              count(*) OVER (ORDER BY b, t
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS cum,
              count(*) OVER () AS n
       FROM res)
SELECT CAST(min(n) AS BIGINT) AS n_points, min(n_pairs) AS n_pairs,
       min(slope) AS slope, min(b) AS intercept
FROM r2 WHERE cum >= (n + 1) // 2
""",
)
def q_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of global daily event volume over the
    dense calendar: median pairwise slope + median intercept (29%
    breakdown — the trend line q_cusum_drift's level shifts cannot
    bend).  The O(days²) pair join is dim×dim; every slope is one
    exact-int division and both medians are total-order lower medians."""
    from .functions.stats import theil_sen_trend

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(F.date_trunc("day", F.col("ts")).alias("d"))
    bounds = e.agg(
        F.min("d").alias("dmin"),
        F.datediff(F.max("d"), F.min("d")).alias("tmax"),
    )
    cnt = (
        e.crossJoin(F.broadcast(bounds))
        .select(F.datediff(F.col("d"), F.col("dmin")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    grid = (
        bounds.select(
            F.explode(F.sequence(F.lit(0), F.col("tmax"))).alias("t")
        )
        .join(cnt, ["t"], "left")
        .select("t", F.coalesce(F.col("y"), F.lit(0)).alias("y"))
    )
    return theil_sen_trend(grid)


# ---------------------------------------------------------------------------
# q_order_count_dist — TPC-H Q13 shape (outer-join count distribution)
# ---------------------------------------------------------------------------

@register(
    "q_order_count_dist",
    """
WITH per_cust AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
""",
)
def q_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    join with a join-side predicate (priority excluded INSIDE the join,
    so zero-order customers survive with c_count = 0), then the
    aggregate-of-an-aggregate histogram.  Exercises the outer-join
    null-preserving count path Q3/Q5 shapes never touch.  At 100 TB
    both aggregations are partial-agg friendly; the second groupBy's
    key space is tiny (max orders per customer) so the final shuffle
    is negligible."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# q_large_orders — TPC-H Q18 shape (group-having semi join on the fact side)
# ---------------------------------------------------------------------------

_Q18_QTY = 300


@register(
    "q_large_orders",
    f"""
WITH big AS (
  SELECT l_orderkey
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > {_Q18_QTY}
)
SELECT c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(round(o.o_totalprice * 100.0) AS BIGINT) AS totalprice_cents,
       CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM orders o
JOIN big ON big.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
""",
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): HAVING-thresholded
    aggregate of the fact table used as a SEMI filter back onto the
    same fact — the group-then-rejoin pattern where the aggregate's
    key set (orders over {_Q18_QTY} units) is tiny, so Spark/AQE can
    broadcast it against lineitem instead of re-shuffling the fact.
    Quantities in the fixture are integral doubles; they are cast to
    int64 BEFORE summing so threshold and output are exact."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", F.col("l_quantity").cast("long").alias("qty")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("qty").alias("total_qty"))
        .filter(F.col("total_qty") > _Q18_QTY)
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey")
    return (
        o.join(F.broadcast(big), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round(F.col("o_totalprice") * 100.0).cast("long").alias(
                "totalprice_cents"
            ),
            "total_qty",
        )
    )


# ---------------------------------------------------------------------------
# q_top_supplier — TPC-H Q15 shape (aggregate view + global-max select)
# ---------------------------------------------------------------------------

_Q15_LO, _Q15_HI = "1997-01-01", "1997-04-01"


@register(
    "q_top_supplier",
    f"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
                       AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_Q15_LO}'
    AND l_shipdate < TIMESTAMP '{_Q15_HI}'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.revenue_cents
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.revenue_cents = (SELECT max(revenue_cents) FROM rev)
""",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarterly revenue view + select
    the rows equal to the view's own global max — the scalar-subquery-
    on-an-aggregate pattern.  The engine computes the max with an
    unpartitioned window over the ALREADY-AGGREGATED dim-sized frame
    (100 suppliers, one task) instead of a join-back, so the expensive
    fact scan is evaluated exactly once (no-CSE rule, CLAUDE.md).
    Cent-exact revenue makes 'equals max' deterministic — the FP-sum
    tie hazard the official query carries is engineered out."""
    from pyspark.sql import Window

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= _Q15_LO) & (F.col("l_shipdate") < _Q15_HI)
    )
    cents = F.round(
        F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100.0
    ).cast("long")
    rev = li.groupBy("l_suppkey").agg(F.sum(cents).alias("revenue_cents"))
    mx = F.max("revenue_cents").over(Window.partitionBy())
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_name"
    )
    return (
        rev.withColumn("mx", mx)
        .filter(F.col("revenue_cents") == F.col("mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "revenue_cents")
    )


# ---------------------------------------------------------------------------
# q_returned_revenue — TPC-H Q10 shape (returned-item revenue top 20)
# ---------------------------------------------------------------------------

_Q10_LO, _Q10_HI = "1998-01-01", "1998-04-01"


@register(
    "q_returned_revenue",
    f"""
WITH g AS (
  SELECT c.c_custkey, c.c_name, n.n_name,
         CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount)
                             * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  WHERE o.o_orderdate >= TIMESTAMP '{_Q10_LO}'
    AND o.o_orderdate < TIMESTAMP '{_Q10_HI}'
    AND l.l_returnflag = 'R'
  GROUP BY c.c_custkey, c.c_name, n.n_name
)
SELECT c_custkey, c_name, n_name, revenue_cents
FROM (SELECT *, row_number() OVER (ORDER BY revenue_cents DESC, c_custkey)
             AS rn FROM g)
WHERE rn <= 20
""",
)
def q_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): quarter-windowed
    customer⋈orders⋈lineitem restricted to returned lines, revenue per
    customer with the nation dim broadcast, exact top-20.  The date and
    returnflag predicates push into both parquet scans; ranking runs
    over the already-aggregated per-customer frame (≤ |customer| rows)
    so the single-task top-k window is dim-sized, not fact-sized."""
    from pyspark.sql import Window

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate") >= _Q10_LO) & (F.col("o_orderdate") < _Q10_HI)
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_returnflag") == "R"
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cents = F.round(
        F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100.0
    ).cast("long")
    g = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(cents).alias("revenue_cents"))
    )
    w = Window.orderBy(F.col("revenue_cents").desc(), F.col("c_custkey"))
    return (
        g.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("c_custkey", "c_name", "n_name", "revenue_cents")
    )


# ---------------------------------------------------------------------------
# q_patch_sizes — connected-component patch-size distribution (FRAGSTATS)
# ---------------------------------------------------------------------------


def _patch_sizes_oracle(quant: float = 1e6) -> str:
    npx = city.NPX
    x = f"{city.X0} + ((i % {npx}) + 0.5) * {city.RES}"
    y = f"{city.Y0} + ((i // {npx}) + 0.5) * {city.RES}"
    q = (
        "CAST(round(("
        + city.NDVI_SQL.format(px_x=x, px_y=y)
        + f") * {quant}) AS BIGINT)"
    )
    # closed-form component key: sin(x/500) keeps one sign per
    # half-period u = floor(x/(500π)), cos(y/500) per
    # v = floor((y+250π)/(500π)); the quantized product is > 0 only
    # where u+v is even, and each such (u,v) box holds exactly ONE
    # 4-connected patch (superlevel set of a product of functions
    # single-signed on the box) — verified against an independent BFS
    # flood fill in tests/test_operators.test_patch_sizes_random_masks
    # (generic masks) and at pin time for this fixture.  The ENGINE
    # never sees this closed form: it runs the generic tile-CCL merge.
    return f"""
WITH g AS (
  SELECT CAST(floor(({x}) / (500.0 * pi())) AS BIGINT) AS u,
         CAST(floor((({y}) + 250.0 * pi()) / (500.0 * pi())) AS BIGINT) AS v
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
  WHERE ({q}) > 0
),
patches AS (SELECT u, v, CAST(count(*) AS BIGINT) AS patch_px
            FROM g GROUP BY u, v)
SELECT patch_px, CAST(count(*) AS BIGINT) AS n_patches
FROM patches GROUP BY patch_px
"""


@register("q_patch_sizes", None)  # generated oracle attached below
def q_patch_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Patch-size distribution of the green mask (quantized NDVI > 0)
    by GENERIC distributed connected-component labelling: tile-local
    run-length union-find (one mapInPandas, labels = min global pixel
    index), border-pixel groupBy stitching (edges bounded by border
    length), global merge through the adaptive component solver shared
    with dissolve.  Completes the FRAGSTATS triple (q_euler_green
    topology, q_edge_density perimeter, per-patch AREA here) — the
    mean-patch-size / largest-patch-index inputs of landscape-ecology
    fragmentation.  The oracle keys each patch by its closed-form
    sign-box of the periodic fixture field; the engine never sees that
    shortcut."""
    from .operators.patches import patch_size_histogram

    return patch_size_histogram(city.tiles_df(spark, "ndvi"), city.grid())


ORACLES["q_patch_sizes"] = _patch_sizes_oracle()


# ---------------------------------------------------------------------------
# q_ktruss — k-truss cohesion backbone of the host graph
# ---------------------------------------------------------------------------

_KTRUSS_K = 3
_KTRUSS_ROUNDS = 6  # measured peeling depth ≤ 2 at every SF; 3× margin
                    # (over-unrolling is idempotent once converged)


def _ktruss_oracle() -> str:
    from .functions.graph import ktruss_oracle_tail

    return (
        "WITH "
        + _LINK_GRAPH_CTE
        + """,
e0 AS MATERIALIZED (
  SELECT DISTINCT least(src_host, dst_host) AS a,
                  greatest(src_host, dst_host) AS b
  FROM r WHERE src_host <> dst_host
),
"""
        + ktruss_oracle_tail("e0", k=_KTRUSS_K, rounds=_KTRUSS_ROUNDS)
    )


@register("q_ktruss", None)  # generated oracle attached below
def q_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{k}-truss of the undirected host graph: the maximal subgraph
    where every edge closes ≥ {k}−2 triangles inside it, each
    surviving edge reported with its in-truss support — the
    community-backbone filter one notch above q_kcore (vertex degree)
    and q_triangles (global count).  The engine peels with
    once-per-triangle oriented enumeration (Suri–Vassilvitskii
    out-degree bound); the oracle peels the SAME fixpoint with the
    naive |N(a)∩N(b)| join, unrolled past the measured depth —
    structurally independent formulations of every round."""
    from .functions.graph import ktruss_edges
    from .functions.links import host_link_graph

    edges = host_link_graph(_link_pages_df(spark, sf_dir))
    return ktruss_edges(
        edges, k=_KTRUSS_K, src_col="src_host", dst_col="dst_host"
    )


ORACLES["q_ktruss"] = _ktruss_oracle()


# ---------------------------------------------------------------------------
# q_kruskal — Kruskal–Wallis rank-sum omnibus test across sources
# ---------------------------------------------------------------------------


def _kruskal_oracle() -> str:
    from .functions.stats import kruskal_wallis_sql

    return kruskal_wallis_sql("documents", "source", "n_chars")


@register("q_kruskal", None)  # generated oracle attached below
def q_kruskal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H across sources on document length — the
    rank-based omnibus shift test beside q_anova (means), q_welch_ttest
    (two-sample), q_ks_test (sup-distance) and q_js_divergence
    (distributional).  Ranks come off a value histogram (doubled
    average ranks stay integer), per-group H terms 1e-6-quantize
    before the cross-group sum, and the tie correction is exact
    integer arithmetic — no per-row rank materialization anywhere."""
    from .functions.stats import kruskal_wallis

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return kruskal_wallis(docs, "source", "n_chars")


ORACLES["q_kruskal"] = _kruskal_oracle()


# ---------------------------------------------------------------------------
# q_nation_volume / q_market_share — TPC-H Q7/Q8 shapes
# ---------------------------------------------------------------------------

# pair chosen bilateral (rows in BOTH directions) at every SF
_Q7_N1, _Q7_N2 = "NATION_12", "NATION_13"


@register(
    "q_nation_volume",
    f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE ((sn.n_name = '{_Q7_N1}' AND cn.n_name = '{_Q7_N2}')
    OR (sn.n_name = '{_Q7_N2}' AND cn.n_name = '{_Q7_N1}'))
GROUP BY sn.n_name, cn.n_name, l_year
""",
)
def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): bilateral trade between two
    nations by ship year — the disjunctive cross-dimension predicate
    over a 4-way fact join with BOTH nation dims broadcast.  The OR
    pair filter applies after the dim joins (it references both
    sides), but each dim join itself prunes to the two named nations
    first — the selective-dim pushdown AQE relies on at 100 TB."""
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").filter(
        F.col("n_name").isin(_Q7_N1, _Q7_N2)
    )
    sn = n.select(F.col("n_nationkey").alias("sn_key"),
                  F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"),
                  F.col("n_name").alias("cust_nation"))
    cents = F.round(
        F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100.0
    ).cast("long")
    return (
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .filter(
            ((F.col("supp_nation") == _Q7_N1) & (F.col("cust_nation") == _Q7_N2))
            | ((F.col("supp_nation") == _Q7_N2) & (F.col("cust_nation") == _Q7_N1))
        )
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(cents).alias("revenue_cents"))
    )


_Q8_NATION, _Q8_REGION, _Q8_TYPE = "NATION_3", "EUROPE", "PROMO"


@register(
    "q_market_share",
    f"""
WITH vol AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0)
              AS BIGINT) AS cents,
         sn.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = cn.n_regionkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  WHERE r.r_name = '{_Q8_REGION}' AND p.p_type = '{_Q8_TYPE}'
)
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = '{_Q8_NATION}' THEN cents ELSE 0 END)
            AS BIGINT) AS nation_cents,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       round(CAST(sum(CASE WHEN supp_nation = '{_Q8_NATION}' THEN cents
                           ELSE 0 END) AS DOUBLE)
             / CAST(sum(cents) AS DOUBLE) + 0.0, 6) AS mkt_share
FROM vol GROUP BY o_year
""",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): one nation's slice of a
    region's market for one part type, by order year — the
    conditional-sum-ratio pattern (sum(CASE)/sum) over a 7-way star.
    Both numerator and denominator stay exact int64 cents; the single
    double division is the same IEEE expression in both engines."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        F.col("p_type") == _Q8_TYPE
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    reg = spark.read.parquet(f"{sf_dir}/region.parquet").filter(
        F.col("r_name") == _Q8_REGION
    )
    cn = nat.select(F.col("n_nationkey").alias("cn_key"),
                    F.col("n_regionkey").alias("cn_reg"))
    sn = nat.select(F.col("n_nationkey").alias("sn_key"),
                    F.col("n_name").alias("supp_nation"))
    cents = F.round(
        F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100.0
    ).cast("long")
    vol = (
        p.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(reg), F.col("r_regionkey") == F.col("cn_reg"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            cents.alias("cents"),
            "supp_nation",
        )
    )
    nat_cents = F.sum(
        F.when(F.col("supp_nation") == _Q8_NATION, F.col("cents")).otherwise(0)
    )
    return vol.groupBy("o_year").agg(
        nat_cents.cast("long").alias("nation_cents"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.round(
            nat_cents.cast("double") / F.sum("cents").cast("double")
            + F.lit(0.0),
            6,
        ).alias("mkt_share"),
    )


# ---------------------------------------------------------------------------
# q_stream_session — NATIVE session_window streaming aggregate
# ---------------------------------------------------------------------------

@register(
    "q_stream_session",
    """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess,
         event_id
  FROM events
), s AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_no
  FROM g
), sess AS (
  SELECT user_id, sess_no,
         CAST(count(*) AS BIGINT) AS n_events,
         min(ts) AS st, max(ts) + INTERVAL 30 MINUTE AS en
  FROM s GROUP BY user_id, sess_no
), wm AS (SELECT max(ts) - INTERVAL 2 DAY AS w FROM events)
SELECT strftime(st, '%Y-%m-%d %H:%M:%S.%f') AS sess_start,
       strftime(en, '%Y-%m-%d %H:%M:%S.%f') AS sess_end,
       user_id, n_events
FROM sess, wm WHERE en <= w
""",
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BUILT-IN ``session_window`` streaming aggregate (vs the
    custom applyInPandasWithState sessionizer of q_sessionize_stream):
    two AvailableNow drains (the empty delta advances the watermark
    and flushes closed sessions), append mode — a session reaches the
    sink iff its end (last event + gap) ≤ final watermark.  NOTE the
    native merge rule differs from the batch sessionizer at the exact
    boundary: windows merge only when they strictly OVERLAP, so a gap
    of exactly 30 min starts a NEW session (oracle uses ``>=`` where
    q_sessionize uses ``>``)."""
    import atexit
    import os
    import shutil
    import tempfile

    from .streaming.ingest import session_window_counts
    from .streaming.stage import (
        append_empty_delta,
        drain_shuffle_partitions,
        stage_events,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"q_stream_session_{os.getpid()}"
    )
    shutil.rmtree(base, ignore_errors=True)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    src, sink, ckpt = (os.path.join(base, d) for d in ("src", "sink", "ckpt"))
    stage_events(sf_dir, src)
    with drain_shuffle_partitions(spark):
        session_window_counts(spark, src, sink, ckpt)
        append_empty_delta(src)
        session_window_counts(spark, src, sink, ckpt)
    return spark.read.parquet(sink).select(
        F.date_format("sess_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "sess_start"
        ),
        F.date_format("sess_end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "sess_end"
        ),
        "user_id", "n_events",
    )


# ---------------------------------------------------------------------------
# q_trimmed_mean — robust per-source location (symmetric 10% trim)
# ---------------------------------------------------------------------------


def _trimmed_mean_oracle() -> str:
    from .functions.stats import trimmed_mean_sql

    return trimmed_mean_sql("documents", "source", "n_chars", trim_pct=10)


@register("q_trimmed_mean", None)  # generated oracle attached below
def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source 10%-trimmed mean of document length — the robust
    location estimate beside q_mad's median/MAD: the ⌊n/10⌋ shortest
    and longest docs per source drop before the mean.  Value-histogram
    shape (one shuffle keyed by (source, value), per-GROUP cumulative
    window); the kept mass per value is an exact integer interval
    overlap, the numerator an exact int64."""
    from .functions.stats import trimmed_mean

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return trimmed_mean(docs, "source", "n_chars", trim_pct=10)


ORACLES["q_trimmed_mean"] = _trimmed_mean_oracle()


# ---------------------------------------------------------------------------
# q_harmonic — harmonic centrality of the host graph
# ---------------------------------------------------------------------------

_HARMONIC_ROUNDS = 6  # min-plus doubling reaches diameter 2^6 = 64;
                      # the planted host graph's diameter is far below
                      # (over-unrolling is idempotent once converged)


def _harmonic_oracle() -> str:
    from .functions.graph import harmonic_oracle_tail

    return (
        "WITH "
        + _LINK_GRAPH_CTE
        + """,
e0 AS MATERIALIZED (
  SELECT DISTINCT least(src_host, dst_host) AS a,
                  greatest(src_host, dst_host) AS b
  FROM r WHERE src_host <> dst_host
),
"""
        + harmonic_oracle_tail("e0", rounds=_HARMONIC_ROUNDS)
    )


@register("q_harmonic", None)  # generated oracle attached below
def q_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact harmonic centrality per host (Σ 1/d to every reachable
    host) — the disconnection-robust closeness, completing the
    host-graph centrality family (PageRank/TrustRank/HITS/k-core/
    k-truss).  All-pairs min-plus DOUBLING (⌈log₂ diam⌉ rounds, never
    diam sweeps) on the dim-sized host graph; a billion-node webgraph
    would swap in HyperBall sketches (documented in
    functions/graph.py).  Each 1/d is the same IEEE double both
    sides, 1e-9-quantized before the integer sum."""
    from .functions.graph import harmonic_centrality
    from .functions.links import host_link_graph

    edges = host_link_graph(_link_pages_df(spark, sf_dir))
    return harmonic_centrality(
        edges, src_col="src_host", dst_col="dst_host",
        max_rounds=_HARMONIC_ROUNDS,
    )


ORACLES["q_harmonic"] = _harmonic_oracle()


def _hyperball_oracle() -> str:
    from .functions.graph import hyperball_oracle_sql

    return (
        "WITH "
        + _LINK_GRAPH_CTE
        + ",\n"
        + hyperball_oracle_sql(
            "SELECT src_host AS src, dst_host AS dst FROM r", rounds=6
        )
    )


@register("q_hyperball", None)  # generated oracle attached below
def q_hyperball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall approximate harmonic centrality (Boldi–Vigna 2013) —
    the billion-node swap q_harmonic's docstring promises, now
    implemented and oracle-locked: per-node m=16 HLL ball sketches,
    one register-max groupBy per round (state m·|V| integers instead
    of the exact closure's |V|²), linear-counting small-range
    correction, fixed-order harmonic fold over micro-quantized
    per-round estimates.  Same undirected host graph and round budget
    as q_harmonic, so the two queries are directly comparable
    (tests pin rank correlation between them)."""
    from .functions.graph import hyperball_harmonic
    from .functions.links import host_link_graph

    edges = host_link_graph(_link_pages_df(spark, sf_dir))
    return hyperball_harmonic(
        edges, src_col="src_host", dst_col="dst_host", rounds=6
    )


ORACLES["q_hyperball"] = _hyperball_oracle()


# ---------------------------------------------------------------------------
# q_louvain — deterministic synchronous Louvain communities of the host graph
# ---------------------------------------------------------------------------

_LOUVAIN_R1, _LOUVAIN_R2 = 6, 4


def _louvain_oracle() -> str:
    from .functions.graph import louvain_oracle_tail

    return (
        "WITH "
        + _LINK_EDGE_CTE
        + ",\nu0 AS MATERIALIZED (SELECT ua AS a, ub AS b FROM und),\n"
        + louvain_oracle_tail("u0", _LOUVAIN_R1, _LOUVAIN_R2)
    )


@register("q_louvain", None)  # generated oracle attached below
def q_louvain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level deterministic SYNCHRONOUS Louvain over the undirected
    host graph — the community-detection surface ROADMAP triaged out
    twice as "only worth it if a deterministic synchronous variant
    with an oracle can be designed"; this is that variant.  All
    modularity-gain comparisons are exact integers (2m·w_{i→c} −
    k_i·Σtot_c; strict-improvement move rule, smallest-label
    tie-break), every node moves simultaneously per round (visit-order
    independence — the property sequential Louvain lacks), level 1's
    partition contracts to a weighted supernode graph (intra weight →
    self-loops riding in degrees only), level 2 refines it.  The
    oracle unrolls the SAME integer rounds as MATERIALIZED CTEs
    (functions/graph.louvain_oracle_tail)."""
    from .functions.graph import louvain_sync
    from .functions.links import host_link_graph

    edges = host_link_graph(_link_pages_df(spark, sf_dir))
    return louvain_sync(
        edges, _LOUVAIN_R1, _LOUVAIN_R2,
        src_col="src_host", dst_col="dst_host",
    )


ORACLES["q_louvain"] = _louvain_oracle()


# ---------------------------------------------------------------------------
# q_boilerplate — jusText-style line-block main-content extraction
# ---------------------------------------------------------------------------

# five newline-delimited blocks: link-dense nav (density rule), first
# content half, a too-short block (length rule), second content half
# carrying an inline anchor (mixed block must SURVIVE), link-dense
# footer long enough to pass the length rule (density rule alone kills
# it).  Fixture text is single-line, so the block count is exactly 5.
_BP_NAV = (
    '<div class="nav"><a href="/">Home</a> <a href="/about">About</a> '
    '<a href="/contact">Contact</a></div>'
)
_BP_SHORT = "<p>OK</p>"
_BP_FOOTER = (
    '<div class="footer"><a href="/tos">Terms of service</a> '
    '<a href="/privacy">Privacy policy</a> '
    '<a href="/imprint">Imprint notice</a></div>'
)
_BP_MORE = ' <a href="/more">read more</a>'


def _boilerplate_oracle() -> str:
    from .functions.text import boilerplate_sql

    def q(s: str) -> str:
        return s.replace("'", "''")

    return (
        f"""WITH pages AS (
  SELECT doc_id,
         '{q(_BP_NAV)}' || chr(10)
         || '<p>' || substr(text, 1, n_chars // 2) || '</p>' || chr(10)
         || '{q(_BP_SHORT)}' || chr(10)
         || '<p>' || substr(text, n_chars // 2 + 1, n_chars)
         || '{q(_BP_MORE)}' || '</p>' || chr(10)
         || '{q(_BP_FOOTER)}' AS page
  FROM documents
),
"""
        + boilerplate_sql("pages")
    )


@register("q_boilerplate", None)  # generated oracle attached below
def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-block boilerplate removal (jusText/readability class): nav
    and footer blocks die by the INTEGER link-density test
    (3·link_chars < text_len), a too-short block by the length rule,
    and the two paragraph halves — one carrying an inline anchor —
    survive and concatenate in document order.  The curation step
    between q_html_extract's tag-strip and a DOM-aware trafilatura
    swap-in; pure codegen per block."""
    from .functions.text import boilerplate_blocks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit(_BP_NAV + "\n<p>"),
            F.expr("substring(text, 1, CAST(floor(n_chars / 2) AS INT))"),
            F.lit("</p>\n" + _BP_SHORT + "\n<p>"),
            F.expr(
                "substring(text, CAST(floor(n_chars / 2) AS INT) + 1, "
                "CAST(n_chars AS INT))"
            ),
            F.lit(_BP_MORE + "</p>\n" + _BP_FOOTER),
        ).alias("page"),
    )
    return boilerplate_blocks(pages)


ORACLES["q_boilerplate"] = _boilerplate_oracle()


# ---------------------------------------------------------------------------
# q_cost_distance — multi-source weighted distance transform to greenspace
# ---------------------------------------------------------------------------

_CD_FACTOR = 125   # 8×8 macro grid over the 1000-px city
_CD_ROUNDS = 24    # ≥ max hop count of an optimal path on 8×8 (diameter
                   # ~14); over-unrolling is idempotent once converged


def _cost_distance_oracle() -> str:
    from .operators.hydro import COST_BUCKET

    npx = city.NPX
    vq = (
        "CAST(round(("
        + city.NDVI_SQL.format(
            px_x=f"{city.X0} + (ix + 0.5) * {city.RES}",
            px_y=f"{city.Y0} + (iy + 0.5) * {city.RES}",
        )
        + ") * 1000000.0) AS BIGINT)"
    )
    dirs = ", ".join(
        f"({dx}, {dy}, {2 if dx * dy == 0 else 3})"
        for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)
    )
    parts = [
        f"""WITH px AS (
  SELECT i % {npx} AS ix, i // {npx} AS iy
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
),
blk AS (
  SELECT ix // {_CD_FACTOR} AS mx, iy // {_CD_FACTOR} AS my,
         CAST(sum({vq}) AS BIGINT) AS zq
  FROM px GROUP BY 1, 2
),
cc AS MATERIALIZED (
  SELECT mx, my, zq,
         CASE WHEN zq > 0 THEN 1
              ELSE 2 + least(3, (-zq) // {COST_BUCKET}) END AS c
  FROM blk
),
dirs(dx, dy, sw) AS (VALUES {dirs}),
e AS MATERIALIZED (
  SELECT a.mx, a.my, b.mx AS nmx, b.my AS nmy, (a.c + b.c) * d.sw AS w
  FROM cc a JOIN dirs d ON true
  JOIN cc b ON b.mx = a.mx + d.dx AND b.my = a.my + d.dy
),
d0 AS MATERIALIZED (
  SELECT mx, my, CAST(0 AS BIGINT) AS d FROM cc WHERE zq > 0
)"""
    ]
    for i in range(_CD_ROUNDS):
        parts.append(
            f"""d{i + 1} AS MATERIALIZED (
  SELECT mx, my, min(d) AS d FROM (
    SELECT mx, my, d FROM d{i}
    UNION ALL
    SELECT e.nmx, e.nmy, p.d + e.w
    FROM d{i} p JOIN e ON e.mx = p.mx AND e.my = p.my
  ) GROUP BY mx, my
)"""
        )
    return (
        ",\n".join(parts)
        + f"""
SELECT c.mx, c.my, CAST(d.d AS BIGINT) AS cost
FROM cc c LEFT JOIN d{_CD_ROUNDS} d USING (mx, my)"""
    )


@register("q_cost_distance", None)  # generated oracle attached below
def q_cost_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effort-weighted distance to the nearest green macro block —
    the cost-surface accessibility metric (ArcGIS CostDistance /
    GRASS r.cost) beside Euclidean q_accessibility and network
    q_greenspace_iso: multi-source Bellman–Ford over the 8-connected
    macro grid with integer edge weights (c(u)+c(v))·{2,3}, every
    path cost exact int64.  The distributed stage is the factor-125
    macro coarsening of the full raster; the relaxation is one keyed
    hash join + min-agg per round with monotone convergence."""
    from .operators.hydro import cost_distance, macro_cells

    cells = macro_cells(
        city.tiles_df(spark, "ndvi"), city.grid(), factor=_CD_FACTOR
    )
    return cost_distance(cells)


ORACLES["q_cost_distance"] = _cost_distance_oracle()


# ---------------------------------------------------------------------------
# q_brown_forsythe — variance-homogeneity test (Levene, median centres)
# ---------------------------------------------------------------------------


def _brown_forsythe_oracle() -> str:
    gs = sorted(_EVENT_TYPES)
    return f"""
WITH e0 AS (SELECT event_type AS g, CAST(round(value * 100.0) AS BIGINT) AS v
            FROM events WHERE event_type IN {tuple(gs)!r}),
h AS (SELECT g, v, count(*) AS c FROM e0 GROUP BY g, v),
x AS (SELECT g, v,
             sum(c) OVER (PARTITION BY g ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             sum(c) OVER (PARTITION BY g) AS n
      FROM h),
med AS (SELECT g, CAST(min(v) AS BIGINT) AS median
        FROM x WHERE cum >= (n + 1) // 2 GROUP BY g),
e AS (SELECT e0.g, abs(e0.v - med.median) AS vq
      FROM e0 JOIN med USING (g)),
""" + _anova_tail_sql(gs)


@register("q_brown_forsythe", None)  # generated oracle attached below
def q_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe variance-homogeneity F across the five event
    types (Levene with MEDIAN centres — the robust default): per-group
    lower medians off the value histogram, z = |v − median| stays
    exact int64, then the SAME fixed-lexical-order ANOVA assembly as
    q_anova (the oracle tail is literally shared).  Completes the
    omnibus family: means (ANOVA), location (Kruskal–Wallis),
    spread (here)."""
    from .functions.stats import brown_forsythe

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100.0).cast("long").alias("vq"),
    )
    return brown_forsythe(ev, "g", "vq", list(_EVENT_TYPES))


ORACLES["q_brown_forsythe"] = _brown_forsythe_oracle()


# ---------------------------------------------------------------------------
# q_filtered_revenue — TPC-H Q6 shape (pure scan-filter-agg pushdown probe)
# ---------------------------------------------------------------------------

_Q6_LO, _Q6_HI = "1997-01-01", "1998-01-01"


@register(
    "q_filtered_revenue",
    f"""
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100.0) AS BIGINT))
            AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{_Q6_LO}'
  AND l_shipdate < TIMESTAMP '{_Q6_HI}'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q_filtered_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): the pure
    scan-filter-aggregate — date range + discount band + quantity cap
    all push into the parquet scan, one map-side-combinable global
    sum, zero joins and zero shuffles beyond the final single-row
    combine.  ALL 22 TPC-H query shapes now have gate entries — the
    six that reference partsupp / shipmode / commit-receipt dates
    (Q2, 9, 11, 12, 20, 21) run over a lineitem-DERIVED supply
    relation and schema stand-ins that preserve their plan shapes;
    see the Q2/Q11/Q12 and Q9/Q20/Q21 sections below."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= _Q6_LO)
        & (F.col("l_shipdate") < _Q6_HI)
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    cents = F.round(
        F.col("l_extendedprice") * F.col("l_discount") * 100.0
    ).cast("long")
    return li.agg(
        F.sum(cents).alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q_wetness — topographic wetness index ln(a / tan β) (TOPMODEL)
# ---------------------------------------------------------------------------


def _wetness_oracle() -> str:
    from .operators.hydro import D8_DIRS, TWI_TAN_MIN

    npx = city.NPX
    f = _FA_FACTOR
    zq_scale = float(f) * float(f) * 1e6
    cell_m = float(city.RES) * float(f)
    vq = (
        "CAST(round(("
        + city.NDVI_SQL.format(
            px_x=f"{city.X0} + (ix + 0.5) * {city.RES}",
            px_y=f"{city.Y0} + (iy + 0.5) * {city.RES}",
        )
        + ") * 1000000.0) AS BIGINT)"
    )
    dirs = ", ".join(f"({c}, {dx}, {dy}, {w})" for c, dx, dy, w in D8_DIRS)
    return f"""
WITH RECURSIVE px AS (
  SELECT i % {npx} AS ix, i // {npx} AS iy
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
),
blk AS (
  SELECT ix // {f} AS mx, iy // {f} AS my, sum({vq}) AS zq
  FROM px GROUP BY 1, 2
),
dirs(code, dx, dy, w) AS (VALUES {dirs}),
cand AS (
  SELECT b.mx, b.my, d.code, d.w, n.mx AS nmx, n.my AS nmy,
         b.zq - n.zq AS dz
  FROM blk b JOIN dirs d ON true
  JOIN blk n ON n.mx = b.mx + d.dx AND n.my = b.my + d.dy
  WHERE b.zq - n.zq > 0
),
down AS (
  SELECT mx, my, nmx, nmy FROM (
    SELECT c.*, row_number() OVER (
        PARTITION BY mx, my ORDER BY dz * dz * w DESC, code ASC) AS rn
    FROM cand c) WHERE rn = 1
),
walk AS (
  SELECT mx AS smx, my AS smy, mx, my FROM blk
  UNION ALL
  SELECT w.smx, w.smy, d.nmx, d.nmy
  FROM walk w JOIN down d ON d.mx = w.mx AND d.my = w.my
),
acc AS (SELECT mx, my, CAST(count(*) AS BIGINT) AS acc
        FROM walk GROUP BY mx, my),
tanb AS (
  SELECT b.mx, b.my,
         CASE WHEN d.nmx IS NULL THEN {TWI_TAN_MIN!r}
              ELSE (CAST(b.zq - n.zq AS DOUBLE) / {zq_scale!r})
                   / ({cell_m!r} * CASE WHEN abs(d.nmx - b.mx)
                                            + abs(d.nmy - b.my) = 2
                                        THEN sqrt(2.0) ELSE 1.0 END)
         END AS tanb
  FROM blk b LEFT JOIN down d ON d.mx = b.mx AND d.my = b.my
             LEFT JOIN blk n ON n.mx = d.nmx AND n.my = d.nmy
)
SELECT a.mx, a.my, a.acc,
       round(ln(CAST(a.acc AS DOUBLE) * {cell_m!r} / t.tanb) + 0.0, 6)
         AS twi
FROM acc a JOIN tanb t ON t.mx = a.mx AND t.my = a.my
"""


@register("q_wetness", None)  # generated oracle attached below
def q_wetness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topographic wetness index ln(a / tan β) per macro cell
    (TOPMODEL / GRASS r.topidx): the hydrology COMPOSITE built from
    the oracle-green D8 pointers + pointer-doubling accumulation +
    block-sum surface, with the r.topidx minimum-slope convention for
    pits.  dz and acc stay exact int64; the only FP is one fixed
    lexical chain (√2 via correctly-rounded sqrt) rounded 6 dp with
    the −0.0 flush."""
    from .operators.hydro import macro_cells, wetness_index

    cells = macro_cells(
        city.tiles_df(spark, "ndvi"), city.grid(), factor=_FA_FACTOR
    ).localCheckpoint()
    return wetness_index(cells, res_m=city.RES, factor=_FA_FACTOR)


ORACLES["q_wetness"] = _wetness_oracle()


# ---------------------------------------------------------------------------
# q_holt_winters — additive weekly-seasonal smoothing per event stream
# ---------------------------------------------------------------------------


def _hw_oracle() -> str:
    from .functions.timeseries import (
        HW_ALPHA, HW_BETA, HW_GAMMA, HW_OMA, HW_OMB, HW_OMG, HW_SEASON,
    )

    m = HW_SEASON
    # seasonal slot of the step being absorbed (t = h.t + 1)
    so = "CASE (h.t + 1) % 7 " + " ".join(
        f"WHEN {j} THEN h.s{j}" for j in range(m)
    ) + " END"
    ln = (
        f"{HW_ALPHA!r} * (CAST(c.y AS DOUBLE) - ({so})) "
        f"+ {HW_OMA!r} * (h.l + h.b)"
    )
    sn = (
        f"{HW_GAMMA!r} * (CAST(c.y AS DOUBLE) - ({ln})) "
        f"+ {HW_OMG!r} * ({so})"
    )
    s_cols = ",\n         ".join(
        f"CASE WHEN (h.t + 1) % 7 = {j} THEN {sn} ELSE h.s{j} END"
        for j in range(m)
    )
    sum1 = "CAST(sum(CASE WHEN t <= 6 THEN y ELSE 0 END) AS DOUBLE) / 7.0"
    sum2 = (
        "CAST(sum(CASE WHEN t BETWEEN 7 AND 13 THEN y ELSE 0 END) "
        "AS DOUBLE) / 7.0"
    )
    seeds = ",\n         ".join(
        f"CAST(max(CASE WHEN t = {j} THEN y END) AS DOUBLE) - ({sum1})"
        f" AS s{j}"
        for j in range(m)
    )
    s_next = "CASE (t + 1) % 7 " + " ".join(
        f"WHEN {j} THEN s{j}" for j in range(m)
    ) + " END"
    return f"""
WITH RECURSIVE e AS (
  SELECT event_type AS g, date_trunc('day', ts) AS d FROM events
),
d0 AS (SELECT min(d) AS dmin,
              date_diff('day', min(d), max(d)) AS tmax FROM e),
cnt AS (
  SELECT g, date_diff('day', d0.dmin, d) AS t,
         CAST(count(*) AS BIGINT) AS y
  FROM e, d0 GROUP BY 1, 2
),
grid AS (
  SELECT gs.g, i.t, coalesce(c.y, 0) AS y
  FROM (SELECT DISTINCT g FROM e) gs
  CROSS JOIN (SELECT unnest(generate_series(0, (SELECT tmax FROM d0))) AS t) i
  LEFT JOIN cnt c ON c.g = gs.g AND c.t = i.t
),
seed AS (
  SELECT g, {sum1} AS l0,
         (({sum2}) - ({sum1})) / 7.0 AS b0,
         {seeds}
  FROM grid WHERE t < 14 GROUP BY g
),
hw(t, g, l, b, {', '.join(f's{j}' for j in range(m))}, sse) AS (
  SELECT 6, g, l0, b0, {', '.join(f's{j}' for j in range(m))},
         CAST(0.0 AS DOUBLE)
  FROM seed
  UNION ALL
  SELECT h.t + 1, h.g,
         {ln},
         {HW_BETA!r} * (({ln}) - h.l) + {HW_OMB!r} * h.b,
         {s_cols},
         h.sse + (CAST(c.y AS DOUBLE) - (h.l + h.b + ({so})))
               * (CAST(c.y AS DOUBLE) - (h.l + h.b + ({so})))
  FROM hw h JOIN grid c ON c.g = h.g AND c.t = h.t + 1
)
SELECT g, CAST(t + 1 AS BIGINT) AS n_days,
       round(l, 6) AS level, round(b, 6) AS trend,
       round({s_next}, 6) AS s_next,
       round(l + b + ({s_next}), 6) AS forecast1,
       round(sse, 6) AS sse
FROM hw WHERE t = (SELECT tmax FROM d0)
"""


@register("q_holt_winters", None)  # generated oracle attached below
def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt–Winters ADDITIVE weekly-seasonal next-day forecast per
    event stream — the seasonal completion of q_holt_forecast, whose
    linear recursion a weekday-periodic volume systematically lags.
    Classic two-season init, recursion from t = m, one-step-ahead SSE;
    the heavy work is the per-day count, the recursion runs in one
    Arrow kernel per series, and the oracle replays the identical
    operation order (shared α/β/γ literals, per-slot CASE seasonal
    state) as a DuckDB recursive CTE — round-6 hash-portable."""
    from .functions.timeseries import holt_winters_additive

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(
        F.col("event_type").alias("g"),
        F.date_trunc("day", F.col("ts")).alias("d"),
    )
    bounds = e.agg(
        F.min("d").alias("dmin"),
        F.datediff(F.max("d"), F.min("d")).alias("tmax"),
    )
    cnt = (
        e.crossJoin(F.broadcast(bounds))
        .select("g", F.datediff(F.col("d"), F.col("dmin")).alias("t"))
        .groupBy("g", "t")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    grid = (
        e.select("g").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "g",
            F.explode(F.sequence(F.lit(0), F.col("tmax"))).alias("t"),
        )
        .join(cnt, ["g", "t"], "left")
        .select("g", "t", F.coalesce(F.col("y"), F.lit(0)).alias("y"))
    )
    return holt_winters_additive(grid)


ORACLES["q_holt_winters"] = _hw_oracle()


# ---------------------------------------------------------------------------
# q_otsu — automatic NDVI binarization threshold (Otsu's method)
# ---------------------------------------------------------------------------

_OTSU_QUANT = 100.0


def _otsu_oracle() -> str:
    npx = city.NPX
    lvl = (
        "CAST(round(("
        + city.NDVI_SQL.format(
            px_x=f"{city.X0} + (ix + 0.5) * {city.RES}",
            px_y=f"{city.Y0} + (iy + 0.5) * {city.RES}",
        )
        + f") * {_OTSU_QUANT!r}) AS BIGINT)"
    )
    return f"""
WITH px AS (
  SELECT i % {npx} AS ix, i // {npx} AS iy
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
),
lv AS (SELECT {lvl} AS level FROM px),
h AS (SELECT level, CAST(count(*) AS BIGINT) AS c FROM lv GROUP BY level),
g AS (SELECT level, c,
             CAST(sum(c) OVER (ORDER BY level
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cc,
             CAST(sum(level * c) OVER (ORDER BY level
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sc,
             CAST(sum(c) OVER () AS BIGINT) AS n,
             CAST(sum(level * c) OVER () AS BIGINT) AS s
      FROM h),
sel AS (SELECT CAST(level AS BIGINT) AS thr_level,
               cc AS n_below, n - cc AS n_above,
               round(CAST(sc AS DOUBLE) / CAST(cc AS DOUBLE)
                     / {_OTSU_QUANT!r} + 0.0, 6) AS mean_below,
               round(CAST(s - sc AS DOUBLE) / CAST(n - cc AS DOUBLE)
                     / {_OTSU_QUANT!r} + 0.0, 6) AS mean_above,
               CAST(s * cc - n * sc AS DOUBLE)
                 * CAST(s * cc - n * sc AS DOUBLE)
                 / CAST(cc * (n - cc) AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                 / ({_OTSU_QUANT!r} * {_OTSU_QUANT!r}) AS between_var
        FROM g WHERE cc >= 1 AND cc <= n - 1)
SELECT * FROM sel ORDER BY between_var DESC, thr_level LIMIT 1
"""


@register("q_otsu", None)  # generated oracle attached below
def q_otsu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Otsu automatic binarization threshold of the NDVI raster —
    the standard unsupervised vegetated/built-up cutoff upstream of
    patch metrics and greenspace masks: argmax of between-class
    variance over the 1e-2-quantized level histogram.  The corpus-
    sized work is ONE mapInPandas pass reducing each tile to its
    (level, count) rows (no pixel crosses the shuffle); cumulative and
    total sums ride value-domain-sized windows, every product stays
    exact int64, and the variance assembles identically in both
    engines — the argmax over bit-identical doubles needs no rounding.
    Oracle expands the closed-form NDVI per pixel; the two sides share
    no code path."""
    from .operators.threshold import otsu_threshold

    return otsu_threshold(
        city.tiles_df(spark, "ndvi"), city.grid(), quant=_OTSU_QUANT
    )


ORACLES["q_otsu"] = _otsu_oracle()


# ---------------------------------------------------------------------------
# q_local_clustering — per-host local clustering coefficient
# ---------------------------------------------------------------------------


@register(
    "q_local_clustering",
    "WITH " + _LINK_EDGE_CTE + """,
o AS (SELECT CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND ua < ub)
                  THEN ua ELSE ub END AS x,
             CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND ua < ub)
                  THEN ub ELSE ua END AS y,
             CASE WHEN da.dg < db.dg OR (da.dg = db.dg AND ua < ub)
                  THEN db.dg ELSE da.dg END AS yd
      FROM und JOIN deg da ON da.a = ua JOIN deg db ON db.a = ub),
tr AS (SELECT w1.x AS p, w1.y AS v1, w2.y AS v2
       FROM o w1 JOIN o w2 ON w1.x = w2.x
        AND (w1.yd < w2.yd OR (w1.yd = w2.yd AND w1.y < w2.y))
       JOIN o oc ON oc.x = w1.y AND oc.y = w2.y),
tv AS (SELECT v, count(*) AS t FROM (
         SELECT p AS v FROM tr
         UNION ALL SELECT v1 AS v FROM tr
         UNION ALL SELECT v2 AS v FROM tr) u GROUP BY v)
SELECT deg.a AS node, CAST(deg.dg AS BIGINT) AS degree,
       CAST(coalesce(tv.t, 0) AS BIGINT) AS n_tri,
       round(2.0 * CAST(coalesce(tv.t, 0) AS DOUBLE)
             / CAST(deg.dg * (deg.dg - 1) AS DOUBLE), 6) AS local_cc
FROM deg LEFT JOIN tv ON tv.v = deg.a
WHERE deg.dg >= 2
""",
)
def q_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host LOCAL clustering coefficient 2T(v)/(d(v)(d(v)−1)) —
    the vertex-level companion to q_triangles' global count (same
    degree-ordered once-per-triangle orientation, Suri–Vassilvitskii
    oriented-out-degree bound), with the closed wedge keeping its full
    vertex triple and exploding to the three corners.  Spam-farm
    neighbourhoods ring-fence as near-cliques (cc→1) while organic
    hubs stay sparse — a standard webgraph curation feature."""
    from .functions.graph import local_clustering
    from .functions.links import host_link_graph

    edges = host_link_graph(_link_pages_df(spark, sf_dir)).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    return local_clustering(edges)


# ---------------------------------------------------------------------------
# q_avg_precision — PR-AUC (average precision) of length vs English label
# ---------------------------------------------------------------------------


@register(
    "q_avg_precision",
    """
WITH s AS (SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS score,
                  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           FROM documents),
r AS (SELECT y,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rk,
             sum(y) OVER (ORDER BY score DESC, doc_id
                          ROWS UNBOUNDED PRECEDING) AS pc
      FROM s),
t AS (SELECT CAST(sum(CASE WHEN y = 1
                           THEN (CAST(pc AS BIGINT) * 1000000000000) // rk
                      END) AS BIGINT) AS sc,
             CAST(sum(y) AS BIGINT) AS p, CAST(count(*) AS BIGINT) AS n
      FROM r)
SELECT p AS n_pos, n AS n_docs,
       CAST(sc AS DOUBLE) / (CAST(p AS DOUBLE) * 1000000000000.0)
         AS avg_precision
FROM t
""",
)
def q_avg_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (exact PR-AUC at the observed operating
    points) of document length against the English label — the
    head-weighted rank eval beside q_auc's global Mann–Whitney: AP =
    (1/P)·Σ_positives pos_cum/rank under the deterministic
    (score DESC, doc_id ASC) total order (AP is tie-order-sensitive,
    so the id tie-break is part of the contract).  Both rank and
    positive-rank are two-phase global_rank passes — no single-task
    sort — and every precision term ships as the exact integer
    (j·10¹²) div r, so the only FP step is one final division."""
    from .functions.audit import average_precision

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
    )
    return average_precision(s, "score", "label", "doc_id")


# ---------------------------------------------------------------------------
# q_wilcoxon — Wilcoxon signed-rank over paired daily click/view volumes
# ---------------------------------------------------------------------------


@register(
    "q_wilcoxon",
    """
WITH e AS (SELECT date_trunc('day', ts) AS d, event_type FROM events),
d0 AS (SELECT min(d) AS dmin, date_diff('day', min(d), max(d)) AS tmax FROM e),
cnt AS (SELECT date_diff('day', d0.dmin, d) AS t,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS y
        FROM e, d0 GROUP BY 1),
grid AS (SELECT i.t, coalesce(c.x, 0) AS x, coalesce(c.y, 0) AS y
         FROM (SELECT unnest(generate_series(0, (SELECT tmax FROM d0))) AS t) i
         LEFT JOIN cnt c ON c.t = i.t),
dd AS (SELECT CAST(x - y AS BIGINT) AS d FROM grid WHERE x <> y),
g AS (SELECT abs(d) AS ad, count(*) AS c,
             sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS p
      FROM dd GROUP BY 1),
r AS (SELECT ad, c, p,
             coalesce(sum(c) OVER (ORDER BY ad
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b
      FROM g),
t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(CAST(p AS HUGEINT) * (2 * b + c + 1)) AS DOUBLE) AS w2,
             CAST(sum(CAST(c AS HUGEINT) * c * c - c) AS DOUBLE) AS tie
      FROM r)
SELECT n AS n_pairs,
       w2 / 2.0 AS w_plus,
       (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) - w2) / 2.0 AS w_minus,
       (2.0 * w2 - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
       / (4.0 * nullif(sqrt((2.0 * CAST(n AS DOUBLE)
            * (CAST(n AS DOUBLE) + 1.0)
            * (2.0 * CAST(n AS DOUBLE) + 1.0) - tie) / 48.0), 0.0))
         AS z_value
FROM t
""",
)
def q_wilcoxon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test of paired daily click-vs-view volumes
    over the dense event calendar (gaps zero-filled on BOTH sides) —
    the non-parametric PAIRED companion to q_welch_ttest (unpaired)
    and q_auc (two-sample ranks).  Doubled average ranks keep W+/W−
    exact halves, the Σ(c³−c) tie correction is an exact integer, and
    z ships UNROUNDED as one identical-IEEE assembly (the round-6
    …5-boundary lesson from BENCH/SCALE_AUDIT.md)."""
    from .functions.stats import wilcoxon_signed_rank

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(
        F.date_trunc("day", F.col("ts")).alias("d"), "event_type"
    )
    bounds = e.agg(
        F.min("d").alias("dmin"),
        F.datediff(F.max("d"), F.min("d")).alias("tmax"),
    )
    cnt = (
        e.crossJoin(F.broadcast(bounds))
        .select(F.datediff(F.col("d"), F.col("dmin")).alias("t"), "event_type")
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .alias("y"),
        )
    )
    grid = (
        bounds.select(F.explode(F.sequence(F.lit(0), F.col("tmax"))).alias("t"))
        .join(cnt, ["t"], "left")
        .select(
            "t",
            F.coalesce(F.col("x"), F.lit(0)).alias("x"),
            F.coalesce(F.col("y"), F.lit(0)).alias("y"),
        )
    )
    return wilcoxon_signed_rank(grid, "x", "y")


# ---------------------------------------------------------------------------
# q_min_cost_supplier / q_important_stock / q_line_priority — TPC-H
# Q2 / Q11 / Q12 shapes.  The fixture has no partsupp table, so the
# Q2/Q11 "supply" relation is DERIVED from lineitem (per-(part,supplier)
# aggregates) — which preserves exactly the plan shapes those queries
# exist to exercise: correlated-min decorrelation (Q2), scalar-subquery
# HAVING against a global total (Q11), conditional aggregation over a
# fact-fact join (Q12).  With these, the relational-shape family covers
# Q1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,18,19,20,21,22 — the full
# TPC-H decorrelation/pushdown taxonomy.
# ---------------------------------------------------------------------------

_Q2_TYPE, _Q2_REGION = "STANDARD", "EUROPE"


@register(
    "q_min_cost_supplier",
    f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS cost_cents
  FROM lineitem GROUP BY 1, 2
),
eu AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = '{_Q2_REGION}'
),
offers AS (
  SELECT p.p_partkey, eu.s_suppkey, eu.s_name, eu.s_acctbal, eu.n_name,
         ps.cost_cents
  FROM part p
  JOIN ps ON ps.l_partkey = p.p_partkey
  JOIN eu ON eu.s_suppkey = ps.l_suppkey
  WHERE p.p_type = '{_Q2_TYPE}'
),
best AS (SELECT p_partkey, min(cost_cents) AS min_cost FROM offers GROUP BY 1)
SELECT o.p_partkey, o.s_suppkey, o.s_name, o.n_name, o.s_acctbal,
       o.cost_cents
FROM offers o JOIN best b
  ON b.p_partkey = o.p_partkey AND b.min_cost = o.cost_cents
""",
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for every STANDARD part,
    the EUROPE supplier(s) offering the minimum derived supply cost.
    The correlated `cost = (SELECT min ...)` subquery is decorrelated
    the way Catalyst wants it: aggregate once per part, join back on
    (part, cost) equality — two shuffles on p_partkey that AQE can
    co-locate, with the supplier×nation×region dim chain broadcast.
    Cost is an exact integer (min of price-cents per (part, supplier)
    pair), so the equality join-back is FP-safe at any scale.  Ties
    (two suppliers at the minimum) are all kept, as in the reference
    query before its LIMIT."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        F.col("p_type") == _Q2_TYPE
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet").filter(
        F.col("r_name") == _Q2_REGION
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.round(F.col("l_extendedprice") * 100.0).cast("long")).alias(
            "cost_cents"
        )
    )
    eu = (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        ps.join(p.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name",
                "cost_cents")
    )
    best = offers.groupBy(F.col("p_partkey").alias("bp")).agg(
        F.min("cost_cents").alias("min_cost")
    )
    return (
        offers.join(
            best,
            (F.col("bp") == F.col("p_partkey"))
            & (F.col("min_cost") == F.col("cost_cents")),
        )
        .select("p_partkey", "s_suppkey", "s_name", "n_name", "s_acctbal",
                "cost_cents")
    )


_Q11_NATION = "NATION_8"


@register(
    "q_important_stock",
    f"""
WITH v AS (
  SELECT l.l_partkey,
         CAST(sum(CAST(round(l.l_extendedprice * 100.0) AS BIGINT))
              AS BIGINT) AS value_cents
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = '{_Q11_NATION}'
  GROUP BY 1
),
tot AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents,
               CAST(count(*) AS BIGINT) AS n_parts FROM v)
SELECT v.l_partkey AS p_partkey, v.value_cents
FROM v, tot
WHERE v.value_cents * tot.n_parts > 2 * tot.total_cents
""",
)
def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part traded value for one
    nation's suppliers, HAVING value above a threshold derived from a
    global aggregate.  The scalar subquery is a 1-row broadcast cross
    join — the per-part aggregate is computed ONCE and reused for
    both the total and the filter (no second scan).  Canonical Q11's
    fixed fraction is scale-dependent (it returns 0 rows as the part
    count grows), so the shape uses the self-normalizing form
    `value > 2 × avg part value`, kept in exact int64 space
    (`value * n_parts > 2 * total`, no doubles): at sf0.1 that is
    ~1e9 × 2e4 ≈ 2e13 — far below int64 overflow."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").filter(
        F.col("n_name") == _Q11_NATION
    )
    sn = s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
    v = (
        li.join(F.broadcast(sn.select("s_suppkey")),
                F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100.0).cast("long"))
            .alias("value_cents")
        )
    )
    tot = v.agg(
        F.sum("value_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(
            F.col("value_cents") * F.col("n_parts")
            > 2 * F.col("total_cents")
        )
        .select(F.col("l_partkey").alias("p_partkey"), "value_cents")
    )


_Q12_YEAR = 1998


@register(
    "q_line_priority",
    f"""
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE EXTRACT(year FROM l.l_shipdate) = {_Q12_YEAR}
  AND l.l_shipdate > o.o_orderdate
GROUP BY 1
""",
)
def q_line_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / order priority): one ship-year
    slice of the lineitem×orders fact-fact join, conditionally counting
    high- vs low-priority orders per return flag (the fixture's
    3-valued stand-in for l_shipmode).  The year predicate prunes on
    the big fact BEFORE the join; the cross-table `shipdate >
    orderdate` filter can only run after it — the canonical Q12 split
    between pushable and join-resident predicates.  Counts are exact
    integers; no FP anywhere."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.year("l_shipdate") == _Q12_YEAR
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# q_product_profit / q_promotion_suppliers / q_waiting_suppliers —
# TPC-H Q9 / Q20 / Q21 shapes.  Q9's supply cost and Q20's available
# stock come from the same derived-from-lineitem partsupp relation as
# Q2/Q11 above; Q21's nested EXISTS / NOT-EXISTS pair is decorrelated
# into a single per-order grouped aggregate (one shuffle) instead of
# the textbook triple self-join of the 100-TB fact table.
# ---------------------------------------------------------------------------

_Q9_NAME_FRAG = "red"


@register(
    "q_product_profit",
    f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(round(l_extendedprice / l_quantity * 100.0) AS BIGINT))
           AS unit_cost_cents
  FROM lineitem GROUP BY 1, 2
)
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0)
                     AS BIGINT)
                - ps.unit_cost_cents * CAST(round(l.l_quantity) AS BIGINT))
            AS BIGINT) AS profit_cents
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN ps ON ps.l_partkey = l.l_partkey AND ps.l_suppkey = l.l_suppkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%{_Q9_NAME_FRAG}%'
GROUP BY 1, 2
""",
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): per supplier-nation ×
    order-year profit over parts whose name contains 'red', where the
    supply cost joins back from the derived partsupp (best unit price
    in cents per (part, supplier) — exact int).  This is the 6-way
    join Q9 exists to stress: fact × part-dim × DERIVED ps (shuffle
    join on the compound key — vocabulary-scale, deliberately NOT
    broadcast) × supplier × orders × nation, with the name filter
    pruning the part side before anything shuffles.  Profit is an
    exact int64 cents difference, so the nation/year re-aggregation
    is order-insensitive at any parallelism."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        F.col("p_name").contains(_Q9_NAME_FRAG)
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(
            F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100.0)
            .cast("long")
        ).alias("unit_cost_cents")
    )
    sn = s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
    rev = F.round(
        F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100.0
    ).cast("long")
    qty = F.round(F.col("l_quantity")).cast("long")
    return (
        li.join(F.broadcast(p.select("p_partkey")),
                F.col("p_partkey") == F.col("l_partkey"))
        .join(ps, (F.col("ps_partkey") == F.col("l_partkey"))
              & (F.col("ps_suppkey") == F.col("l_suppkey")))
        .join(F.broadcast(sn.select("s_suppkey", "n_name")),
              F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.sum(rev - F.col("unit_cost_cents") * qty).alias("profit_cents")
        )
    )


_Q20_PREFIX, _Q20_NATION, _Q20_YEAR = "small", "NATION_13", 1999


@register(
    "q_promotion_suppliers",
    f"""
WITH stock AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS avail_qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_name LIKE '{_Q20_PREFIX}%')
  GROUP BY 1, 2
),
demand AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS year_qty
  FROM lineitem
  WHERE EXTRACT(year FROM l_shipdate) = {_Q20_YEAR}
    AND l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_name LIKE '{_Q20_PREFIX}%')
  GROUP BY 1
)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN stock st ON st.l_suppkey = s.s_suppkey
JOIN demand d ON d.l_partkey = st.l_partkey
WHERE n.n_name = '{_Q20_NATION}' AND st.avail_qty * 2 > d.year_qty
""",
)
def q_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers in one
    nation whose derived per-part stock exceeds half of that part's
    one-year shipped demand, restricted to name-prefixed parts.  The
    textbook nested `IN (… WHERE qty > 0.5 * (SELECT sum …))` pair is
    decorrelated into two aggregates over the SAME prefixed-part slice
    joined on l_partkey, with the half test kept integer-exact
    (`2*avail > demand`).  The part-prefix semi filter is broadcast
    into BOTH aggregate scans so each prunes before shuffling; the
    final DISTINCT collapses multi-part qualification per supplier —
    at 100 TB each piece shuffles only the prefixed slice, never the
    whole fact."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").filter(
        F.col("n_name") == _Q20_NATION
    )
    parts = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .filter(F.col("p_name").startswith(_Q20_PREFIX))
        .select("p_partkey")
    )
    qty = F.round(F.col("l_quantity")).cast("long")
    sliced = li.join(F.broadcast(parts),
                     F.col("p_partkey") == F.col("l_partkey"))
    stock = sliced.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(qty).alias("avail_qty")
    )
    demand = (
        sliced.filter(F.year("l_shipdate") == _Q20_YEAR)
        .groupBy(F.col("l_partkey").alias("d_partkey"))
        .agg(F.sum(qty).alias("year_qty"))
    )
    qualified = (
        stock.join(demand, F.col("d_partkey") == F.col("l_partkey"))
        .filter(F.col("avail_qty") * 2 > F.col("year_qty"))
        .select("l_suppkey")
        .distinct()
    )
    sn = s.join(F.broadcast(n.select("n_nationkey")),
                F.col("n_nationkey") == F.col("s_nationkey"))
    return (
        sn.join(qualified, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


_Q21_NATION, _Q21_LATE_DAYS = "NATION_3", 60


@register(
    "q_waiting_suppliers",
    f"""
WITH flags AS (
  SELECT l.l_orderkey, l.l_suppkey,
         max(CASE WHEN l.l_shipdate >
                       o.o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY
                  THEN 1 ELSE 0 END) AS is_late
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY 1, 2
),
per_order AS (
  SELECT l_orderkey,
         count(*) AS n_supp,
         CAST(sum(is_late) AS BIGINT) AS n_late,
         max(CASE WHEN is_late = 1 THEN l_suppkey END) AS late_supp
  FROM flags GROUP BY 1
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_order po
JOIN supplier s ON s.s_suppkey = po.late_supp
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE po.n_supp >= 2 AND po.n_late = 1 AND n.n_name = '{_Q21_NATION}'
GROUP BY 1
""",
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): for
    finished orders, the supplier who was the ONLY late one on a
    multi-supplier order ("late" = shipped more than 60 days after
    the order date — the fixture has no commit/receipt dates), counted
    per supplier for one nation.  The textbook EXISTS(other supplier)
    / NOT-EXISTS(other LATE supplier) correlated pair would be two
    self-joins of the fact table; here it is decorrelated into ONE
    grouped pass — per-(order, supplier) late flags, then per-order
    counts — so the 100-TB plan is two keyed aggregations and a
    broadcast dim join, no fact×fact self-join at all.  `max(CASE …
    suppkey)` is well-defined exactly because rows with n_late != 1
    are discarded."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderstatus") == "F"
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").filter(
        F.col("n_name") == _Q21_NATION
    )
    late = F.when(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {_Q21_LATE_DAYS} DAY"),
        1,
    ).otherwise(0)
    flags = (
        li.join(o.select("o_orderkey", "o_orderdate"),
                F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    per_order = flags.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("is_late").alias("n_late"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
            "late_supp"
        ),
    )
    sn = s.join(F.broadcast(n.select("n_nationkey")),
                F.col("n_nationkey") == F.col("s_nationkey"))
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(sn.select("s_suppkey", "s_name")),
              F.col("s_suppkey") == F.col("late_supp"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# q_dtw_profile — banded-free exact DTW of per-user activity profiles
# against the global profile, as a pure window-function DP
# ---------------------------------------------------------------------------

_DTW_T = 30  # fixture calendar length (days) — the DP unroll constant


def _dtw_grid_sql() -> str:
    return f"""
WITH e AS (SELECT user_id AS u, date_trunc('day', ts) AS d FROM events),
d0 AS (SELECT min(d) AS dmin FROM e),
cnt AS (SELECT u, date_diff('day', d0.dmin, d) AS t,
               CAST(count(*) AS BIGINT) AS y
        FROM e, d0 GROUP BY 1, 2),
grid0 AS (
  SELECT us.u AS g, i.t, coalesce(c.y, 0) AS y
  FROM (SELECT DISTINCT u FROM e) us
  CROSS JOIN (SELECT unnest(generate_series(0, {_DTW_T - 1})) AS t) i
  LEFT JOIN cnt c ON c.u = us.u AND c.t = i.t)
SELECT g, t + 1 AS j,
       CAST(round(1000000.0 * y / (sum(y) OVER (PARTITION BY g)))
            AS BIGINT) AS q
FROM grid0
"""


def _dtw_ref_sql() -> str:
    return f"""
WITH e AS (SELECT date_trunc('day', ts) AS d FROM events),
d0 AS (SELECT min(d) AS dmin FROM e),
cnt AS (SELECT date_diff('day', d0.dmin, d) AS t,
               CAST(count(*) AS BIGINT) AS y
        FROM e, d0 GROUP BY 1),
grid0 AS (
  SELECT i.t, coalesce(c.y, 0) AS y
  FROM (SELECT unnest(generate_series(0, {_DTW_T - 1})) AS t) i
  LEFT JOIN cnt c ON c.t = i.t)
SELECT t + 1 AS i,
       CAST(round(1000000.0 * y / (sum(y) OVER ())) AS BIGINT) AS r
FROM grid0
"""


def _dtw_oracle() -> str:
    from .functions.timeseries import dtw_sql

    return dtw_sql(_dtw_grid_sql(), _dtw_ref_sql(), _DTW_T)


@register("q_dtw_profile", None)  # generated oracle attached below
def q_dtw_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dynamic-time-warping cost of every user's ppm-quantized
    daily-activity profile against the global corpus profile — the
    shift-tolerant "activity shape" segmentation a behavioural
    pipeline wants where plain correlation punishes phase lag.  The
    O(T²) DP is re-expressed as T chained window scans (cumulative
    sum + running min per DP row — see functions/timeseries.py
    ``dtw_to_reference`` for the min-plus prefix-scan derivation), so
    the plan is ONE shuffle on user and T in-partition Window stages:
    no Python kernel, no T-step join chain, per-task state bounded by
    the calendar.  Profiles are integer ppm shares, so every DP cell
    is an exact int64 and the DuckDB twin (same decomposition,
    unrolled MATERIALIZED CTEs per the house rule) is bit-equal at
    any parallelism.  The gate runs the Arrow hot-path twin
    (``dtw_to_reference_arrow`` — same exact DP, one stage instead of
    ~90 window operators, ×5 wall-clock at sf0.1); the zero-Python
    window form stays value-equal-tested in test_operators."""
    from pyspark.sql import Window

    from .functions.timeseries import dtw_to_reference_arrow

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(
        F.col("user_id").alias("g"),
        F.date_trunc("day", F.col("ts")).alias("d"),
    )
    bounds = e.agg(F.min("d").alias("dmin"))
    cnt = (
        e.crossJoin(F.broadcast(bounds))
        .select("g", F.datediff(F.col("d"), F.col("dmin")).alias("t"))
        .filter((F.col("t") >= 0) & (F.col("t") < _DTW_T))
        .groupBy("g", "t")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    grid = (
        e.select("g").distinct()
        .select(
            "g",
            F.explode(
                F.sequence(F.lit(0), F.lit(_DTW_T - 1))
            ).alias("t"),
        )
        .join(cnt, ["g", "t"], "left")
        .select("g", "t", F.coalesce(F.col("y"), F.lit(0)).alias("y"))
    )
    prof = grid.select(
        "g",
        (F.col("t") + 1).alias("j"),
        F.round(
            (F.lit(1000000.0) * F.col("y"))
            / F.sum("y").over(W.partitionBy("g"))
        ).cast("long").alias("q"),
    )
    ref = (
        grid.groupBy("t")
        .agg(F.sum("y").alias("Y"))
        .select(
            "t",
            F.round(
                (F.lit(1000000.0) * F.col("Y"))
                / F.sum("Y").over(W.partitionBy())
            ).cast("long").alias("rq"),
        )
    )
    refrow = ref.agg(
        *[
            F.max(F.when(F.col("t") == i - 1, F.col("rq"))).alias(f"r{i}")
            for i in range(1, _DTW_T + 1)
        ]
    )
    return dtw_to_reference_arrow(
        prof.crossJoin(F.broadcast(refrow)), _DTW_T
    ).select(F.col("g").alias("user_id"), "dtw_cost")


ORACLES["q_dtw_profile"] = (
    _dtw_oracle()
    .replace("SELECT g, CAST(d AS BIGINT) AS dtw_cost",
             "SELECT g AS user_id, CAST(d AS BIGINT) AS dtw_cost")
)


# ---------------------------------------------------------------------------
# q_permutation_test — deterministic sign-flip permutation test on the
# paired daily click/view volumes (the resampling companion to
# q_wilcoxon / q_welch_ttest / q_bootstrap_ci)
# ---------------------------------------------------------------------------

_PERM_PAIRS_SQL = """
SELECT t, CAST(x - y AS BIGINT) AS d FROM (
  WITH e AS (SELECT date_trunc('day', ts) AS dd, event_type FROM events),
  d0 AS (SELECT min(dd) AS dmin,
                date_diff('day', min(dd), max(dd)) AS tmax FROM e),
  cnt AS (SELECT date_diff('day', d0.dmin, dd) AS t,
                 sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
                 sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS y
          FROM e, d0 GROUP BY 1)
  SELECT i.t, coalesce(c.x, 0) AS x, coalesce(c.y, 0) AS y
  FROM (SELECT unnest(generate_series(0, (SELECT tmax FROM d0))) AS t) i
  LEFT JOIN cnt c ON c.t = i.t
)
"""


def _perm_oracle() -> str:
    from .functions.stats import signflip_permutation_sql

    return signflip_permutation_sql(_PERM_PAIRS_SQL)


@register("q_permutation_test", None)  # generated oracle attached below
def q_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired sign-flip permutation test of daily click-vs-view volume
    (B = 200 deterministic md5 replicates) over the same dense
    zero-filled calendar as q_wilcoxon — the exact-arithmetic
    resampling member of the paired-test family.  Everything up to
    the final p-value is int64 (functions/stats.py
    ``signflip_permutation_test``); the replicate dim broadcasts, so
    the only corpus-sized work is the upstream per-day count."""
    from .functions.stats import signflip_permutation_test

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(
        F.date_trunc("day", F.col("ts")).alias("dd"), "event_type"
    )
    bounds = e.agg(
        F.min("dd").alias("dmin"),
        F.datediff(F.max("dd"), F.min("dd")).alias("tmax"),
    )
    cnt = (
        e.crossJoin(F.broadcast(bounds))
        .select(F.datediff(F.col("dd"), F.col("dmin")).alias("t"),
                "event_type")
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .alias("y"),
        )
    )
    pairs = (
        bounds.select(
            F.explode(F.sequence(F.lit(0), F.col("tmax"))).alias("t")
        )
        .join(cnt, ["t"], "left")
        .select(
            "t",
            (F.coalesce(F.col("x"), F.lit(0))
             - F.coalesce(F.col("y"), F.lit(0))).alias("d"),
        )
    )
    return signflip_permutation_test(pairs, "d", "t")


ORACLES["q_permutation_test"] = _perm_oracle()


# ---------------------------------------------------------------------------
# q_ar2_fit — Yule-Walker AR(2) coefficients from the exact lag-1/2
# autocorrelations of the global daily volume series
# ---------------------------------------------------------------------------


@register(
    "q_ar2_fit",
    """
WITH e AS (SELECT date_trunc('day', ts) AS d FROM events),
d0 AS (SELECT min(d) AS dmin,
              date_diff('day', min(d), max(d)) AS tmax FROM e),
cnt AS (SELECT date_diff('day', d0.dmin, d) AS t,
               CAST(count(*) AS BIGINT) AS y FROM e, d0 GROUP BY 1),
grid AS (
  SELECT i.t, coalesce(c.y, 0) AS y
  FROM (SELECT unnest(generate_series(0, (SELECT tmax FROM d0))) AS t) i
  LEFT JOIN cnt c ON c.t = i.t),
lg AS (
  SELECT y, lag(y, 1) OVER (ORDER BY t) AS l1,
            lag(y, 2) OVER (ORDER BY t) AS l2
  FROM grid),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(y * l1) AS BIGINT) AS sp1,
         CAST(sum(CASE WHEN l1 IS NOT NULL THEN y END) AS BIGINT) AS h1,
         CAST(sum(l1) AS BIGINT) AS tl1,
         CAST(sum(y * l2) AS BIGINT) AS sp2,
         CAST(sum(CASE WHEN l2 IS NOT NULL THEN y END) AS BIGINT) AS h2,
         CAST(sum(l2) AS BIGINT) AS tl2
  FROM lg),
rr AS (
  SELECT n,
         round(CAST(n * n * sp1 - n * s * (h1 + tl1) + (n - 1) * s * s
                    AS DOUBLE)
               / CAST(n * (n * syy - s * s) AS DOUBLE) + 0.0, 6) AS r1,
         round(CAST(n * n * sp2 - n * s * (h2 + tl2) + (n - 2) * s * s
                    AS DOUBLE)
               / CAST(n * (n * syy - s * s) AS DOUBLE) + 0.0, 6) AS r2
  FROM agg)
SELECT n AS n_days, r1, r2,
       round(CASE WHEN 1.0 - r1 * r1 <> 0.0
                  THEN r1 * (1.0 - r2) / (1.0 - r1 * r1) END + 0.0, 6)
         AS phi1,
       round(CASE WHEN 1.0 - r1 * r1 <> 0.0
                  THEN (r2 - r1 * r1) / (1.0 - r1 * r1) END + 0.0, 6)
         AS phi2
FROM rr
""",
)
def q_ar2_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule-Walker AR(2) fit of the global daily event volume: exact
    integer autocovariance numerators (the acf_lags n²-scaled
    centering), one round-6 per autocorrelation, then φ₁ =
    r₁(1−r₂)/(1−r₁²), φ₂ = (r₂−r₁²)/(1−r₁²) assembled from the SAME
    rounded r's in the SAME operation order in both engines — the
    forecasting-model companion to q_acf_volume (which stops at the
    correlogram) and q_holt_forecast (fixed smoothing weights)."""
    from .functions.timeseries import acf_lags

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(F.date_trunc("day", F.col("ts")).alias("d"))
    bounds = e.agg(
        F.min("d").alias("dmin"),
        F.datediff(F.max("d"), F.min("d")).alias("tmax"),
    )
    cnt = (
        e.crossJoin(F.broadcast(bounds))
        .select(F.datediff(F.col("d"), F.col("dmin")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    grid = (
        bounds.select(
            F.explode(F.sequence(F.lit(0), F.col("tmax"))).alias("t")
        )
        .join(cnt, ["t"], "left")
        .select(
            F.lit("all").alias("g"), "t",
            F.coalesce(F.col("y"), F.lit(0)).alias("y"),
        )
    )
    acf = acf_lags(grid, max_lag=2)
    piv = acf.groupBy().agg(
        F.max("n_days").alias("n_days"),
        F.max(F.when(F.col("lag_k") == 1, F.col("acf"))).alias("r1"),
        F.max(F.when(F.col("lag_k") == 2, F.col("acf"))).alias("r2"),
    )
    den = F.lit(1.0) - F.col("r1") * F.col("r1")
    return piv.select(
        "n_days", "r1", "r2",
        F.round(
            F.when(den != 0.0,
                   F.col("r1") * (F.lit(1.0) - F.col("r2")) / den)
            + F.lit(0.0), 6,
        ).alias("phi1"),
        F.round(
            F.when(den != 0.0,
                   (F.col("r2") - F.col("r1") * F.col("r1")) / den)
            + F.lit(0.0), 6,
        ).alias("phi2"),
    )


# ---------------------------------------------------------------------------
# q_eb_shrinkage — beta-binomial empirical-Bayes smoothing of
# per-source quality pass rates (method of moments)
# ---------------------------------------------------------------------------

_EB_MIN_CHARS = 300


@register(
    "q_eb_shrinkage",
    f"""
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN n_chars >= {_EB_MIN_CHARS} THEN 1 ELSE 0 END)
              AS BIGINT) AS k_pass
  FROM documents GROUP BY 1),
pq AS (
  SELECT source, n_docs, k_pass,
         CAST(round(1000000.0 * k_pass / n_docs) AS BIGINT) AS raw_ppm
  FROM per),
sc AS (
  SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(raw_ppm) AS BIGINT) AS sp,
         CAST(sum(raw_ppm * raw_ppm) AS BIGINT) AS spp
  FROM pq),
ab AS (
  SELECT nd, sp, spp,
         CAST(sp AS DOUBLE) / (nd * 1000000.0) AS mu,
         CAST(nd * spp - sp * sp AS DOUBLE)
           / CAST(nd * (nd - 1) AS DOUBLE) / 1000000000000.0 AS v
  FROM sc)
SELECT p.source, p.n_docs, p.k_pass, p.raw_ppm,
       round(CASE WHEN ab.v > 0.0 AND ab.mu > 0.0 AND ab.mu < 1.0
                   AND ab.mu * (1.0 - ab.mu) / ab.v - 1.0 > 0.0
                  THEN (p.k_pass + ab.mu
                          * (ab.mu * (1.0 - ab.mu) / ab.v - 1.0))
                       / (p.n_docs + (ab.mu * (1.0 - ab.mu) / ab.v - 1.0))
             END + 0.0, 6) AS shrunk_rate
FROM pq p, ab
""",
)
def q_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes (beta-binomial, method-of-moments) smoothing of
    per-source quality pass rates (n_chars ≥ 300) — the standard cure
    for small-source rate noise before curation decisions rank
    sources (q_wilson_quality is the per-row-confidence member of
    this family; this one borrows strength ACROSS sources).  Per-
    source rates are ppm-quantized ints BEFORE the cross-source
    moments, so μ and s² come from exact integer sums in both engines
    (no FP summation-order hazard); the prior strength K =
    μ(1−μ)/s² − 1 and the shrunk rate (k + μK)/(n + K) are assembled
    in one identical-IEEE expression per engine and rounded once.
    Scale: per-source aggregate is the only corpus-sized work; the
    moment pass runs over the source dim (1-row broadcast back)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("n_chars") >= _EB_MIN_CHARS, 1).otherwise(0)
        ).alias("k_pass"),
    )
    pq = per.select(
        "source", "n_docs", "k_pass",
        F.round(
            (F.lit(1000000.0) * F.col("k_pass")) / F.col("n_docs")
        ).cast("long").alias("raw_ppm"),
    )
    sc = pq.agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("raw_ppm").alias("sp"),
        F.sum(F.col("raw_ppm") * F.col("raw_ppm")).alias("spp"),
    )
    mu = F.col("sp").cast("double") / (F.col("nd") * F.lit(1000000.0))
    v = (
        (F.col("nd") * F.col("spp") - F.col("sp") * F.col("sp"))
        .cast("double")
        / (F.col("nd") * (F.col("nd") - 1)).cast("double")
        / F.lit(1000000000000.0)
    )
    k_prior = mu * (F.lit(1.0) - mu) / v - F.lit(1.0)
    ok = (v > 0.0) & (mu > 0.0) & (mu < 1.0) & (k_prior > 0.0)
    return (
        pq.crossJoin(F.broadcast(sc))
        .select(
            "source", "n_docs", "k_pass", "raw_ppm",
            F.round(
                F.when(
                    ok,
                    (F.col("k_pass") + mu * k_prior)
                    / (F.col("n_docs") + k_prior),
                )
                + F.lit(0.0), 6,
            ).alias("shrunk_rate"),
        )
    )


# ---------------------------------------------------------------------------
# q_late_audit — watermark-lateness audit over a deterministic
# out-of-order ingest replay (two-phase global running max, no
# single-task window)
# ---------------------------------------------------------------------------

_LATE_WM_MIN = 10


@register(
    "q_late_audit",
    f"""
WITH a AS (SELECT ts, md5(CAST(event_id AS VARCHAR)) AS h FROM events),
r AS (SELECT ts,
             max(ts) OVER (ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m
      FROM a)
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN m IS NOT NULL
                      AND ts < m - INTERVAL {_LATE_WM_MIN} MINUTE
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM r GROUP BY 1
""",
)
def q_late_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-lateness audit: how many events arrive more than
    10 minutes behind the running event-time high-water mark, per
    event-time hour — the sizing study every Structured-Streaming
    watermark policy starts from.  The fixture's event_id is
    time-ordered, so arrival is replayed through the deterministic
    md5 shuffle (q_shard_shuffle's trick) to exercise real
    out-of-orderness.  The global strictly-prior running max — a
    single-task window in naive form — runs as the two-phase scan in
    engine/rank.py ``hex_prefix_running_max``: hash-prefix buckets
    are lexicographically ordered by construction, so per-bucket
    maxima + a broadcast prefix over the 256-row bucket dim + one
    in-bucket ordered window give the exact scan at any scale.
    Timestamp comparisons are exact microsecond arithmetic."""
    from .engine.rank import hex_prefix_running_max

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = ev.select(
        "ts", F.md5(F.col("event_id").cast("string")).alias("h")
    )
    r = hex_prefix_running_max(a, "h", "ts", "m")
    late = (
        F.col("m").isNotNull()
        & (F.col("ts")
           < F.col("m") - F.expr(f"INTERVAL {_LATE_WM_MIN} MINUTE"))
    )
    return (
        r.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")),
                          "yyyy-MM-dd HH:00").alias("hour")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(late, 1).otherwise(0)).alias("n_late"),
        )
    )


# ---------------------------------------------------------------------------
# q_km_survival — Kaplan-Meier time-to-first-purchase with
# administrative censoring
# ---------------------------------------------------------------------------

_KM_TAU = 3  # administrative follow-up horizon (days)


@register(
    "q_km_survival",
    f"""
WITH e AS (SELECT user_id AS u, date_trunc('day', ts) AS d, event_type
           FROM events),
d0 AS (SELECT min(d) AS dmin,
              date_diff('day', min(d), max(d)) AS tmax FROM e),
per AS (
  SELECT u, min(date_diff('day', d0.dmin, d)) AS f,
         min(CASE WHEN event_type = 'purchase'
                  THEN date_diff('day', d0.dmin, d) END) AS p,
         max(d0.tmax) AS tmax
  FROM e, d0 GROUP BY u),
obs AS (
  SELECT u,
         CASE WHEN p IS NOT NULL
               AND p - f <= least({_KM_TAU}, tmax - f)
              THEN 1 ELSE 0 END AS ev,
         CASE WHEN p IS NOT NULL
               AND p - f <= least({_KM_TAU}, tmax - f)
              THEN p - f ELSE least({_KM_TAU}, tmax - f) END AS dur
  FROM per),
g AS (
  SELECT dur AS t_day, CAST(count(*) AS BIGINT) AS n_at,
         CAST(sum(ev) AS BIGINT) AS d_events,
         CAST(sum(1 - ev) AS BIGINT) AS c_censored
  FROM obs GROUP BY 1),
k AS (
  SELECT t_day, d_events, c_censored,
         sum(n_at) OVER (ORDER BY t_day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
  FROM g)
SELECT t_day, CAST(n_risk AS BIGINT) AS n_risk, d_events, c_censored,
       round(product(1.0 - CAST(d_events AS DOUBLE)
                           / CAST(n_risk AS DOUBLE))
               OVER (ORDER BY t_day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             + 0.0, 6) AS survival
FROM k
""",
)
def q_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival of time-to-first-purchase per user, with
    administrative right-censoring at min(τ = 3 days, calendar end) —
    the survival-analysis member of the behavioural family
    (q_retention counts fixed cohort offsets; KM handles censoring
    correctly).  The corpus-sized work is one per-user aggregate;
    the risk table is dim-sized (≤ τ+1 rows), n_risk is a reverse
    cumulative window sum, and the product-limit estimator is an
    ORDERED cumulative product over that dim — both engines evaluate
    the growing frame as a left fold over identical (1 − d/n)
    doubles, verified hash-identical tri-scale."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(
        F.col("user_id").alias("u"),
        F.date_trunc("day", F.col("ts")).alias("d"),
        "event_type",
    )
    bounds = e.agg(
        F.min("d").alias("dmin"),
        F.datediff(F.max("d"), F.min("d")).alias("tmax"),
    )
    per = (
        e.crossJoin(F.broadcast(bounds))
        .select(
            "u",
            F.datediff(F.col("d"), F.col("dmin")).alias("t"),
            "event_type", "tmax",
        )
        .groupBy("u")
        .agg(
            F.min("t").alias("f"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("t"))
            ).alias("p"),
            F.max("tmax").alias("tmax"),
        )
    )
    follow = F.least(F.lit(_KM_TAU), F.col("tmax") - F.col("f"))
    is_ev = F.col("p").isNotNull() & (F.col("p") - F.col("f") <= follow)
    obs = per.select(
        F.when(is_ev, 1).otherwise(0).alias("ev"),
        F.when(is_ev, F.col("p") - F.col("f")).otherwise(follow)
        .alias("dur"),
    )
    g = obs.groupBy(F.col("dur").alias("t_day")).agg(
        F.count(F.lit(1)).alias("n_at"),
        F.sum("ev").alias("d_events"),
        F.sum(1 - F.col("ev")).alias("c_censored"),
    )
    w_rev = Window.orderBy("t_day").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    w_cum = Window.orderBy("t_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    k = g.select(
        "t_day", "d_events", "c_censored",
        F.sum("n_at").over(w_rev).alias("n_risk"),
    )
    factor = F.lit(1.0) - (
        F.col("d_events").cast("double") / F.col("n_risk").cast("double")
    )
    return k.select(
        "t_day", "n_risk", "d_events", "c_censored",
        F.round(F.product(factor).over(w_cum) + F.lit(0.0), 6)
        .alias("survival"),
    )


# ---------------------------------------------------------------------------
# q_stl_decompose — classical additive seasonal decomposition
# (centered 7-day MA trend, weekday seasonal means, exact rationals)
# ---------------------------------------------------------------------------


@register(
    "q_stl_decompose",
    """
WITH e AS (SELECT date_trunc('day', ts) AS d FROM events),
d0 AS (SELECT min(d) AS dmin,
              date_diff('day', min(d), max(d)) AS tmax FROM e),
cnt AS (SELECT date_diff('day', d0.dmin, d) AS t,
               CAST(count(*) AS BIGINT) AS y FROM e, d0 GROUP BY 1),
grid AS (
  SELECT i.t, coalesce(c.y, 0) AS y
  FROM (SELECT unnest(generate_series(0, (SELECT tmax FROM d0))) AS t) i
  LEFT JOIN cnt c ON c.t = i.t),
tr AS (
  SELECT t, y,
         CASE WHEN count(*) OVER w7 = 7
              THEN sum(y) OVER w7 END AS s7
  FROM grid
  WINDOW w7 AS (ORDER BY t ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
se AS (
  SELECT t, y, s7,
         CAST(sum(CASE WHEN s7 IS NOT NULL THEN 7 * y - s7 END)
              OVER (PARTITION BY t % 7) AS BIGINT) AS s_num,
         CAST(count(CASE WHEN s7 IS NOT NULL THEN 1 END)
              OVER (PARTITION BY t % 7) AS BIGINT) AS c_w
  FROM tr)
SELECT t, y,
       round(s7 / 7.0 + 0.0, 6) AS trend,
       round(CASE WHEN c_w > 0 THEN s_num / (7.0 * c_w) END + 0.0, 6)
         AS seasonal,
       round(CASE WHEN s7 IS NOT NULL AND c_w > 0
                  THEN (7 * c_w * y - c_w * s7 - s_num) / (7.0 * c_w)
             END + 0.0, 6) AS resid
FROM se
""",
)
def q_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the global daily volume:
    trend = centered 7-day moving average (null at the edges),
    seasonal = per-weekday mean of the detrended series, residual =
    the exact remainder — the decomposition member of the
    time-series family (q_holt_winters SMOOTHS seasonality; this one
    EXPLAINS it).  Exactness: detrended values are kept as the
    integer 7y − S₇ (never y − S₇/7), so the weekday means are exact
    integer ratios and the residual is one rational
    (7c·y − c·S₇ − Σd₇)/(7c) — every division happens once,
    identically, in both engines; +0.0 kills −0.0 before round-6.
    All windows run over the dim-sized calendar; the corpus-sized
    work is the per-day count."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(F.date_trunc("day", F.col("ts")).alias("d"))
    bounds = e.agg(
        F.min("d").alias("dmin"),
        F.datediff(F.max("d"), F.min("d")).alias("tmax"),
    )
    cnt = (
        e.crossJoin(F.broadcast(bounds))
        .select(F.datediff(F.col("d"), F.col("dmin")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    grid = (
        bounds.select(
            F.explode(F.sequence(F.lit(0), F.col("tmax"))).alias("t")
        )
        .join(cnt, ["t"], "left")
        .select("t", F.coalesce(F.col("y"), F.lit(0)).alias("y"))
    )
    w7 = Window.orderBy("t").rowsBetween(-3, 3)
    tr = grid.select(
        "t", "y",
        F.when(F.count(F.lit(1)).over(w7) == 7, F.sum("y").over(w7))
        .alias("s7"),
    )
    ww = Window.partitionBy(F.col("t") % 7)
    se = tr.select(
        "t", "y", "s7",
        F.sum(
            F.when(F.col("s7").isNotNull(), 7 * F.col("y") - F.col("s7"))
        ).over(ww).alias("s_num"),
        F.count(
            F.when(F.col("s7").isNotNull(), F.lit(1))
        ).over(ww).alias("c_w"),
    )
    return se.select(
        "t", "y",
        F.round(F.col("s7") / F.lit(7.0) + F.lit(0.0), 6).alias("trend"),
        F.round(
            F.when(F.col("c_w") > 0,
                   F.col("s_num") / (F.lit(7.0) * F.col("c_w")))
            + F.lit(0.0), 6,
        ).alias("seasonal"),
        F.round(
            F.when(
                F.col("s7").isNotNull() & (F.col("c_w") > 0),
                (7 * F.col("c_w") * F.col("y")
                 - F.col("c_w") * F.col("s7") - F.col("s_num"))
                / (F.lit(7.0) * F.col("c_w")),
            )
            + F.lit(0.0), 6,
        ).alias("resid"),
    )


# ---------------------------------------------------------------------------
# q_scc — strongly connected components of the host link graph
# ---------------------------------------------------------------------------

@register(
    "q_scc",
    "WITH RECURSIVE " + _LINK_GRAPH_CTE + """,
de AS MATERIALIZED (SELECT DISTINCT src_host AS u, dst_host AS v
       FROM r WHERE src_host <> dst_host),
nodes AS MATERIALIZED (SELECT u AS n FROM de UNION SELECT v AS n FROM de),
reach(u, v) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT rr.u, de.v FROM reach rr JOIN de ON de.u = rr.v
),
m AS (SELECT f.u, f.v FROM reach f JOIN reach b ON b.u = f.v AND b.v = f.u),
sid AS (SELECT u AS host, min(v) AS scc_id FROM m GROUP BY u)
SELECT host, scc_id,
       CAST(count(*) OVER (PARTITION BY scc_id) AS BIGINT) AS scc_size
FROM sid
""",
)
def q_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components of the directed host graph: the
    planted cross-host anchor host(d) → host((7d+3) mod 97) is an
    affine permutation, so the 97 content hosts decompose into one
    96-host cycle plus the map's fixed point (host48), and the 11 CDN
    hosts (in-links only) are singleton SCCs — the link-farm /
    crawl-cycle detector beside k-core and k-truss.  The engine
    (functions/graph.py ``scc_components``) squares the reflexive
    transitive closure — R ← R ∪ R∘R doubles reach per round, so the
    95-hop cycle diameter converges in 7 self-joins — then one
    transpose semi-join keeps mutual pairs and min-agg labels each
    node with its smallest mutually-reachable id.  The oracle walks
    the SAME reachability one edge per recursive-CTE iteration; both
    include identity pairs so singletons label themselves."""
    from .functions.graph import scc_components
    from .functions.links import host_link_graph

    edges = host_link_graph(_link_pages_df(spark, sf_dir))
    out = scc_components(edges, src_col="src_host", dst_col="dst_host")
    return out.select(F.col("node").alias("host"), "scc_id", "scc_size")


# ---------------------------------------------------------------------------
# q_radius_gyration — per-user mobility summaries over the home/work model
# ---------------------------------------------------------------------------

_RG_SITE_Q = 100  # site snap, integer metres


@register(
    "q_radius_gyration",
    f"""
WITH e AS (
  SELECT user_id, ts, event_id,
         (CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
               THEN (user_id * 48271) % 9000
               ELSE (user_id * 7919 + 211) % 9000 END)
           + ((event_id * 131) % 41 - 20) AS qx,
         (CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
               THEN (user_id * 16807) % 9000
               ELSE (user_id * 104729 + 57) % 9000 END)
           + ((event_id * 211) % 41 - 20) AS qy
  FROM events
),
s AS (
  SELECT user_id,
         CAST(floor(qx / {_RG_SITE_Q}.0) AS BIGINT) AS gx,
         CAST(floor(qy / {_RG_SITE_Q}.0) AS BIGINT) AS gy,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(qx) AS BIGINT) AS sx,
         CAST(sum(qy) AS BIGINT) AS sy,
         CAST(sum(qx * qx + qy * qy) AS BIGINT) AS sq
  FROM e GROUP BY 1, 2, 3
),
g AS (
  SELECT user_id,
         CAST(sum(n) AS BIGINT) AS n_fixes,
         CAST(sum(sx) AS BIGINT) AS tsx,
         CAST(sum(sy) AS BIGINT) AS tsy,
         CAST(sum(sq) AS BIGINT) AS tsq,
         CAST(count(*) AS BIGINT) AS n_sites,
         CAST(max(n) AS BIGINT) AS top
  FROM s GROUP BY user_id
)
SELECT user_id, n_fixes,
       n_fixes * tsq - tsx * tsx - tsy * tsy AS rg2_num,
       round(sqrt(CAST(n_fixes * tsq - tsx * tsx - tsy * tsy AS DOUBLE))
             / CAST(n_fixes AS DOUBLE), 3) AS rg_m,
       n_sites,
       round(CAST(top AS DOUBLE) / CAST(n_fixes AS DOUBLE), 6) AS top_share
FROM g
""",
)
def q_radius_gyration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius of gyration + location predictability (González et al.
    2008) per user over the SAME deterministic home/work mobility
    model as q_staypoints (int64 LCG sites ± 20 m jitter, so every
    moment is exact): rg ships as the exact integer numerator
    n·Σ(x²+y²) − (Σx)² − (Σy)² — the cancellation-free assembly the
    slab-union centroids taught (BENCH/SCALE_AUDIT) — plus one
    correctly-rounded sqrt/division; sites snap to a 100 m grid for
    the distinct-site count and modal-site share.  The operator
    (operators/spacetime.py ``radius_of_gyration``) is a two-phase
    combine — (user, site) partials first, so the exchange carries
    site-level rows, then a user-level reduce; no windows, no
    join-backs."""
    from .operators.spacetime import radius_of_gyration

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    uid, eid = F.col("user_id"), F.col("event_id")
    at_home = F.expr(
        "(unix_micros(cast(ts as timestamp)) div 3600000000) % 24 < 12"
    )
    e = ev.select(
        "user_id",
        (
            F.when(at_home, (uid * 48271) % 9000)
            .otherwise((uid * 7919 + 211) % 9000)
            + ((eid * 131) % 41 - 20)
        ).alias("qx"),
        (
            F.when(at_home, (uid * 16807) % 9000)
            .otherwise((uid * 104729 + 57) % 9000)
            + ((eid * 211) % 41 - 20)
        ).alias("qy"),
    )
    out = radius_of_gyration(e, site_q=_RG_SITE_Q)
    return out.select(
        F.col("entity").alias("user_id"), "n_fixes", "rg2_num", "rg_m",
        "n_sites", "top_share",
    )


# ---------------------------------------------------------------------------
# q_segregation — Duncan dissimilarity + isolation of language communities
# ---------------------------------------------------------------------------

@register(
    "q_segregation",
    _CTE + f"""
, pg AS (
  SELECT {city.cell_expr_sql('p.x', 'p.y')} AS cell, d.lang AS grp
  FROM pts p JOIN documents d ON d.doc_id = p.doc_id
),
cl AS (SELECT cell, grp, CAST(count(*) AS BIGINT) AS a FROM pg GROUP BY 1, 2),
w AS (
  SELECT grp, a,
         CAST(sum(a) OVER (PARTITION BY cell) AS BIGINT) AS ct,
         CAST(sum(a) OVER (PARTITION BY grp) AS BIGINT) AS ga,
         CAST(sum(a) OVER () AS BIGINT) AS nn
  FROM cl
),
g AS (
  SELECT grp, max(ga) AS n_members, CAST(count(*) AS BIGINT) AS n_cells,
         max(nn) AS nn,
         CAST(sum(abs(a * (nn - ga) - (ct - a) * ga)) AS BIGINT) AS dsum,
         CAST(sum(ct) AS BIGINT) AS tsum,
         CAST(sum((a * a * CAST(1000000000 AS BIGINT)) // ct) AS BIGINT)
           AS isum
  FROM w GROUP BY grp
)
SELECT grp AS lang, n_members, n_cells,
       round(CAST(dsum + (nn - tsum) * n_members AS DOUBLE)
             / (2.0 * CAST(n_members AS DOUBLE)
                    * CAST(nn - n_members AS DOUBLE)), 6) AS dissimilarity,
       round(CAST(isum AS DOUBLE) / 1000000000.0
             / CAST(n_members AS DOUBLE), 6) AS isolation
FROM g
""",
)
def q_segregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duncan dissimilarity D + isolation P* of each language
    community across the geocoded grid cells — the classic
    segregation pair (Duncan & Duncan 1955; Bell 1954) over the
    webtext×geo cross, beside q_join_counts (adjacency) and
    q_lang_entropy (diversity).  D's numerator Σ|a_i·B − b_i·A| stays
    an exact integer with absent (cell, lang) rows folded in as
    (N − Σ_present t_i)·A; P* terms quantize a_i²/t_i to 1e-9 by
    integer division so the per-group sum is order-free
    (operators/spatial_stats.py ``segregation_indices``).  The oracle
    runs the identical assembly over the identical (cell, lang)
    frame."""
    from .operators.spatial_stats import segregation_indices

    pts = city.with_cell(city.points_df(spark, sf_dir))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    pg = pts.join(docs, "doc_id").select("cell", F.col("lang").alias("grp"))
    out = segregation_indices(pg, cell_col="cell", grp_col="grp")
    return out.select(
        F.col("grp").alias("lang"), "n_members", "n_cells",
        "dissimilarity", "isolation",
    )


# ---------------------------------------------------------------------------
# q_stream_left_join — LEFT-OUTER watermarked stream-stream join
# ---------------------------------------------------------------------------

@register(
    "q_stream_left_join",
    """
WITH v AS (SELECT * FROM events WHERE event_type = 'view'),
p AS (SELECT * FROM events WHERE event_type = 'purchase'),
j AS (
  SELECT v.ts AS vts, p.event_id AS pid,
         epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
  FROM v LEFT JOIN p
    ON v.user_id = p.user_id
   AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
)
SELECT strftime(date_trunc('day', vts), '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(pid) AS BIGINT) AS n_conv,
       CAST(sum(CASE WHEN pid IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphans,
       CAST(coalesce(sum(gap_us), 0) AS BIGINT) AS sum_gap_us
FROM j GROUP BY day
""",
)
def q_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER watermarked stream-stream join — the one streaming
    join shape where results are emitted by the WATERMARK, not by
    data: views with no purchase inside [view_ts, view_ts + 1 h] must
    surface as null-padded rows only after the global watermark proves
    no match can still arrive.  The feeds get a sentinel FLUSH event
    (ids −1, ts = max + 40 days) appended to BOTH directories so the
    final AvailableNow no-data batch pushes the watermark past every
    real view and evicts the remaining outer state
    (streaming/join.py ``stream_stream_left_join``); the sentinel is
    dropped in the rollup.  Oracle: the identical batch LEFT range
    join — matched pair count, orphan count, and exact µs gap sums
    per view-day all hash-checked, so both the eager match path and
    the watermark-driven null path are verified end-to-end."""
    import atexit
    import os
    import shutil
    import tempfile

    from .streaming.join import stream_stream_left_join
    from .streaming.stage import (
        drain_shuffle_partitions,
        flush_row_after,
        stage_events,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"q_stream_left_join_{os.getpid()}"
    )
    shutil.rmtree(base, ignore_errors=True)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    srcl, srcr, sink, ckpt = (
        os.path.join(base, d) for d in ("views", "purchases", "sink", "ckpt")
    )
    flush = flush_row_after(sf_dir, days=40)
    stage_events(sf_dir, srcl, event_type="view", flush_after=flush)
    stage_events(sf_dir, srcr, event_type="purchase", flush_after=flush)
    with drain_shuffle_partitions(spark):
        stream_stream_left_join(spark, srcl, srcr, sink, ckpt)
    out = spark.read.parquet(sink).filter(F.col("k") >= 0)
    return out.groupBy(
        F.date_format(F.date_trunc("day", "l_ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("r_id").alias("n_conv"),
        F.sum(
            F.when(F.col("r_id").isNull(), F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("n_orphans"),
        F.coalesce(
            F.sum(F.unix_micros("r_ts") - F.unix_micros("l_ts")), F.lit(0)
        ).cast("long").alias("sum_gap_us"),
    )


# ---------------------------------------------------------------------------
# q_anderson_darling — k-sample Anderson–Darling test across sources
# ---------------------------------------------------------------------------


def _anderson_darling_oracle() -> str:
    from .functions.stats import anderson_darling_k_sql

    return anderson_darling_k_sql("documents", "source", "n_chars")


@register("q_anderson_darling", _anderson_darling_oracle())
def q_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-sample Anderson–Darling A²akN (tie-adjusted, Scholz &
    Stephens 1987) of the per-source document-length distributions —
    the tail-weighted omnibus equality test completing the shift
    family beside q_kruskal (rank location), q_ks_test (2-sample sup)
    and q_js_divergence.  Same value-histogram machinery as Kruskal–
    Wallis plus the completed (source × length) grid — a group's
    cumulative keeps counting at values it never attains — with
    two-level integer quantization so no FP sum ever crosses rows
    (functions/stats.py ``anderson_darling_k``, oracle generated by
    ``anderson_darling_k_sql`` from the same module so the two sides
    cannot drift)."""
    from .functions.stats import anderson_darling_k

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return anderson_darling_k(docs, "source", "n_chars")


# ---------------------------------------------------------------------------
# q_core_area — 3×3-erosion core-area metric of the green mask per tile
# ---------------------------------------------------------------------------


def _core_area_oracle(quant: float = 1e6) -> str:
    npx = city.NPX

    def mq(x_expr: str, y_expr: str) -> str:
        q = (
            "CAST(round(("
            + city.NDVI_SQL.format(
                px_x=f"{city.X0} + (({x_expr}) + 0.5) * {city.RES}",
                px_y=f"{city.Y0} + (({y_expr}) + 0.5) * {city.RES}",
            )
            + f") * {quant}) AS BIGINT)"
        )
        return (
            f"(CASE WHEN ({x_expr}) BETWEEN 0 AND {npx - 1}"
            f" AND ({y_expr}) BETWEEN 0 AND {npx - 1}"
            f" AND ({q}) > 0 THEN 1 ELSE 0 END)"
        )

    nine = " + ".join(
        mq(f"ix + {dx}", f"iy + {dy}")
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    )
    return f"""
WITH px AS (
  SELECT i % {npx} AS ix, i // {npx} AS iy
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
),
agg AS (
  SELECT ix // {city.TILE_PX} AS tx, iy // {city.TILE_PX} AS ty,
         CAST(count(*) FILTER (WHERE {mq('ix', 'iy')} = 1) AS BIGINT)
           AS n_mask,
         CAST(count(*) FILTER (WHERE ({nine}) = 9) AS BIGINT) AS n_core
  FROM px GROUP BY tx, ty
)
SELECT tx, ty, n_mask, n_core,
       CASE WHEN n_mask > 0
            THEN round(CAST(n_core AS DOUBLE) / CAST(n_mask AS DOUBLE), 6)
       END AS core_pct
FROM agg
"""


@register("q_core_area", _core_area_oracle())
def q_core_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core-area landscape metric (FRAGSTATS CORE): green-mask pixels
    that survive one 3×3 morphological erosion — the edge-depth-1
    interior habitat measure that completes the fragmentation triple
    beside q_euler_green (topology) and q_edge_density (perimeter).
    The engine runs the SAME single halo exchange as every
    focal-family operator and erodes each padded tile in NumPy
    (operators/focal.py ``core_area_tile_stats``); the oracle
    re-evaluates the closed-form mask at all nine window positions
    per pixel, out-of-raster = background on both sides."""
    from .operators.focal import core_area_tile_stats

    return core_area_tile_stats(city.tiles_df(spark, "ndvi"), city.grid())


# ---------------------------------------------------------------------------
# q_ewma_chart — EWMA control chart over daily event volumes per stream
# ---------------------------------------------------------------------------


def _ewma_oracle() -> str:
    from .functions.timeseries import EWMA_LAM_DEN, EWMA_LAM_NUM, EWMA_Q

    q = EWMA_Q
    keep = EWMA_LAM_DEN - EWMA_LAM_NUM
    return f"""
WITH RECURSIVE e AS (
  SELECT event_type AS g, date_trunc('day', ts) AS d FROM events
),
d0 AS (SELECT min(d) AS dmin,
              date_diff('day', min(d), max(d)) AS tmax FROM e),
cnt AS (
  SELECT g, date_diff('day', d0.dmin, d) AS t,
         CAST(count(*) AS BIGINT) AS y
  FROM e, d0 GROUP BY 1, 2
),
grid AS MATERIALIZED (
  SELECT gs.g, i.t, coalesce(c.y, 0) AS y
  FROM (SELECT DISTINCT g FROM e) gs
  CROSS JOIN (SELECT unnest(generate_series(0, (SELECT tmax FROM d0))) AS t) i
  LEFT JOIN cnt c ON c.g = gs.g AND c.t = i.t
),
st AS MATERIALIZED (
  SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s,
         CAST(sum(y * y) AS BIGINT) AS s2
  FROM grid GROUP BY g
),
rec(g, t, ev) AS (
  SELECT g, CAST(0 AS BIGINT), CAST({q} * y AS BIGINT) FROM grid WHERE t = 0
  UNION ALL
  SELECT r.g, r.t + 1,
         CAST(({q} * c.y + {keep} * r.ev) // {EWMA_LAM_DEN} AS BIGINT)
  FROM rec r JOIN grid c ON c.g = r.g AND c.t = r.t + 1
),
fl AS (
  SELECT rec.g, rec.t, rec.ev,
         CASE WHEN (CAST(rec.ev AS HUGEINT) * st.n
                    - CAST(st.s AS HUGEINT) * {q})
                  * (CAST(rec.ev AS HUGEINT) * st.n
                     - CAST(st.s AS HUGEINT) * {q})
                  > CAST({q} AS HUGEINT) * {q}
                    * (st.n * st.s2 - st.s * st.s)
              THEN 1 ELSE 0 END AS flag
  FROM rec JOIN st ON st.g = rec.g
)
SELECT g, CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(flag) AS BIGINT) AS n_flags,
       CAST(coalesce(min(t) FILTER (WHERE flag = 1), -1) AS BIGINT)
         AS first_flag_t,
       round(CAST(max(ev) FILTER (WHERE t = (SELECT tmax FROM d0))
                  AS DOUBLE) / {q}, 6) AS ewma_last
FROM fl GROUP BY g
"""


@register("q_ewma_chart", _ewma_oracle())
def q_ewma_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart (λ = 1/5, L = 3σ) over each event stream's
    daily volume — the sustained-drift watchdog beside q_cusum_drift
    (single change point) and q_volume_anomaly (pointwise z-score).
    The (λ, L) pair is chosen so the asymptotic control-band test
    collapses to the EXACT integer comparison d² > σ² — the whole
    flag history is FP-free (functions/timeseries.py ``ewma_chart``),
    and the oracle replays the identical integer recursion as a
    lockstep recursive CTE over the same dense zero-filled calendar
    (MATERIALIZED per the iterative-oracle rule)."""
    from .functions.timeseries import ewma_chart

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(
        F.col("event_type").alias("g"),
        F.date_trunc("day", F.col("ts")).alias("d"),
    )
    bounds = e.agg(
        F.min("d").alias("dmin"),
        F.datediff(F.max("d"), F.min("d")).alias("tmax"),
    )
    cnt = (
        e.crossJoin(F.broadcast(bounds))
        .select("g", F.datediff(F.col("d"), F.col("dmin")).alias("t"))
        .groupBy("g", "t")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    grid = (
        e.select("g").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "g",
            F.explode(F.sequence(F.lit(0), F.col("tmax"))).alias("t"),
        )
        .join(cnt, ["g", "t"], "left")
        .select("g", "t", F.coalesce(F.col("y"), F.lit(0)).alias("y"))
    )
    return ewma_chart(grid)


# ---------------------------------------------------------------------------
# q_gwr — geographically weighted regression of greenness on density
# ---------------------------------------------------------------------------

_GWR_QW = 10**4   # kernel weight quantum
_GWR_H2x2 = 8.0   # 2·h², h = 2 cells (Gaussian bandwidth)


def _gwr_offsets() -> list[tuple[int, int, int]]:
    """5×5 k-ring Gaussian kernel, weights pre-quantized to integers —
    one literal per relative offset, shared verbatim by the engine
    array and the oracle VALUES so the two sides cannot drift."""
    import math

    return [
        (dx, dy, int(round(_GWR_QW * math.exp(-(dx * dx + dy * dy)
                                              / _GWR_H2x2))))
        for dx in range(-2, 3)
        for dy in range(-2, 3)
    ]


def _gwr_oracle() -> str:
    vals = ", ".join(f"({dx}, {dy}, {w})" for dx, dy, w in _gwr_offsets())
    yv = (
        "CAST(round(("
        + city.NDVI_SQL.format(
            px_x=f"{city.X0} + (gx + 0.5) * {city.CELL}",
            px_y=f"{city.Y0} + (gy + 0.5) * {city.CELL}",
        )
        + ") * 1000000.0) AS BIGINT)"
    )
    return f"""{_CTE},
cg AS (
  SELECT CAST(floor((x - {city.X0}) / {city.CELL}) AS BIGINT) AS gx,
         CAST(floor((y - {city.Y0}) / {city.CELL}) AS BIGINT) AS gy,
         CAST(count(*) AS BIGINT) AS xv
  FROM pts GROUP BY 1, 2
),
cv AS (SELECT gx, gy, xv, {yv} AS yv FROM cg),
off(dx, dy, w) AS (VALUES {vals}),
nb AS (
  SELECT c.gx + o.dx AS gx, c.gy + o.dy AS gy,
         CAST(o.w AS HUGEINT) AS w, c.xv AS nx, c.yv AS ny
  FROM cv c CROSS JOIN off o
),
m AS (
  SELECT n.gx, n.gy,
         sum(n.w) AS sw, sum(n.w * n.nx) AS swx, sum(n.w * n.ny) AS swy,
         sum(n.w * n.nx * n.nx) AS swxx, sum(n.w * n.nx * n.ny) AS swxy
  FROM nb n JOIN (SELECT gx, gy FROM cv) t ON t.gx = n.gx AND t.gy = n.gy
  GROUP BY n.gx, n.gy
)
SELECT gx, gy, CAST(sw AS BIGINT) AS sw,
       round(CAST(sw * swxy - swx * swy AS DOUBLE)
             / nullif(CAST(sw * swxx - swx * swx AS DOUBLE), 0.0), 6)
         AS beta,
       round(CAST(swxx * swy - swx * swxy AS DOUBLE)
             / nullif(CAST(sw * swxx - swx * swx AS DOUBLE), 0.0), 6)
         AS alpha
FROM m
"""


@register("q_gwr", _gwr_oracle())
def q_gwr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geographically weighted regression: at every occupied 100 m
    cell, a LOCAL weighted fit of quantized greenness (NDVI at the
    cell centre) on corpus density (documents per cell) over a 5×5
    Gaussian kernel — "where does density buy greenness?", the local
    complement of q_slx_regression's single global coefficient and
    the regression sibling of q_bivariate_moran.  Kernel weights are
    integer literals per relative offset, every WLS moment is exact
    DECIMAL(38,0), and β/α are Cramer ratios with one double division
    each (operators/spatial_stats.py ``gwr_local``); constant-x
    neighbourhoods yield null on both sides."""
    from .operators.spatial_stats import gwr_local

    pts = city.points_df(spark, sf_dir)
    cg = pts.groupBy(
        F.floor((F.col("x") - city.X0) / city.CELL).cast("long").alias("gx"),
        F.floor((F.col("y") - city.Y0) / city.CELL).cast("long").alias("gy"),
    ).agg(F.count(F.lit(1)).alias("xv"))
    yv = F.round(
        F.expr(
            city.NDVI_SQL.format(
                px_x=f"{city.X0} + (gx + 0.5) * {city.CELL}",
                px_y=f"{city.Y0} + (gy + 0.5) * {city.CELL}",
            )
        )
        * 1000000.0,
        0,
    ).cast("long")
    cv = cg.select("gx", "gy", "xv", yv.alias("yv"))
    return gwr_local(cv, _gwr_offsets(), x_col="xv", y_col="yv")


# ---------------------------------------------------------------------------
# q_diameter — per-district farthest-pair diameter via hull + pair scan
# ---------------------------------------------------------------------------

@register(
    "q_diameter",
    f"""{_CTE},
q AS (
  SELECT doc_id,
         CAST(floor((x - {city.X0}) / 1000.0) AS BIGINT) AS blk_x,
         CAST(floor((y - {city.Y0}) / 1000.0) AS BIGINT) AS blk_y,
         CAST(round((x - {city.X0}) * 100.0) AS BIGINT) AS qx,
         CAST(round((y - {city.Y0}) * 100.0) AS BIGINT) AS qy
  FROM pts
),
r AS (
  SELECT *, row_number() OVER (
      PARTITION BY blk_x, blk_y
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM q
),
s AS (SELECT DISTINCT blk_x, blk_y, qx, qy FROM r WHERE rn <= {_HULL_CAP}),
d AS (
  SELECT a.blk_x, a.blk_y,
         CAST(max((a.qx - b.qx) * (a.qx - b.qx)
                  + (a.qy - b.qy) * (a.qy - b.qy)) AS BIGINT) AS diam2
  FROM s a JOIN s b ON a.blk_x = b.blk_x AND a.blk_y = b.blk_y
  GROUP BY a.blk_x, a.blk_y
),
n AS (
  SELECT blk_x, blk_y, CAST(count(*) AS BIGINT) AS n_pts
  FROM s GROUP BY blk_x, blk_y
)
SELECT n.blk_x, n.blk_y, n.n_pts, d.diam2,
       floor(sqrt(CAST(d.diam2 AS DOUBLE)) * 1000.0 + 0.5) / 1000.0
         AS diam_q
FROM d JOIN n ON d.blk_x = n.blk_x AND d.blk_y = n.blk_y
""",
)
def q_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-district farthest-pair DIAMETER of the geocoded documents
    (same 1-km blocks, hash-ranked 48-point cap, and exact 1-cm
    integer quantization as q_convex_hull): the engine reduces each
    block to its monotone-chain hull and scans pairs only among hull
    vertices — the diameter of a finite set is attained there, so the
    pair scan is O(h²) with h ≪ n (operators/hull.py
    ``district_diameter``) — while the oracle brute-forces ALL pairs
    of the capped sample, proving the hull reduction loses nothing.
    Self-pairs included, so singleton blocks report 0; diam2 is exact
    int64, diam_q half-up at 3 dp."""
    from .operators.hull import district_diameter

    pts = city.points_df(spark, sf_dir)
    q = pts.select(
        "doc_id",
        F.floor((F.col("x") - city.X0) / 1000.0).cast("long").alias("blk_x"),
        F.floor((F.col("y") - city.Y0) / 1000.0).cast("long").alias("blk_y"),
        F.round((F.col("x") - city.X0) * 100.0).cast("long").alias("qx"),
        F.round((F.col("y") - city.Y0) * 100.0).cast("long").alias("qy"),
    )
    w = Window.partitionBy("blk_x", "blk_y").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    s = (
        q.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _HULL_CAP)
        .select("blk_x", "blk_y", "qx", "qy")
        .dropDuplicates()
    )
    return district_diameter(s, ["blk_x", "blk_y"], "qx", "qy")


# ---------------------------------------------------------------------------
# q_mor_audit — deletion-vector merge-on-read reconstructs the logical table
# ---------------------------------------------------------------------------

_MOR_FILES = 8
_MOR_SUFFIX = " [v2]"


@register(
    "q_mor_audit",
    f"""
SELECT doc_id,
       md5(CASE WHEN doc_id % 11 = 0 THEN text || '{_MOR_SUFFIX}'
                ELSE text END) AS h
FROM documents
WHERE doc_id % 7 != 0 OR doc_id % 11 = 0
""",
)
def q_mor_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-vector merge-on-read: the corpus is laid out as
    {_MOR_FILES} immutable files with deterministic row positions,
    docs ≡ 0 (mod 7) are deleted and docs ≡ 0 (mod 11) are updated the
    DV way (positional delete + append delta — never a file rewrite),
    and the READ is one broadcast hash ANTI-join of the position dim
    plus a union (engine/cdc.py ``mor_read``).  The oracle constructs
    the logical end state directly from the source table, so the hash
    match proves the positional read path — the lakehouse surface
    keyed MERGE (q_merge_upsert) cannot exercise, since DVs address
    physical (file, position), not keys."""
    from .engine.cdc import mor_read

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    w = Window.partitionBy("file_id").orderBy("doc_id")
    base = (
        docs.select((did % _MOR_FILES).alias("file_id"), "doc_id", "text")
        .withColumn("pos", F.row_number().over(w))
    )
    dv = base.filter((did % 7 == 0) | (did % 11 == 0)).select(
        "file_id", "pos"
    )
    appends = base.filter(did % 11 == 0).select(
        "file_id",
        "doc_id",
        F.concat(F.col("text"), F.lit(_MOR_SUFFIX)).alias("text"),
        F.lit(-1).alias("pos"),
    )
    out = mor_read(base, dv, appends)
    return out.select("doc_id", F.md5("text").alias("h"))


# ---------------------------------------------------------------------------
# q_rake — top RAKE keyword phrase per source
# ---------------------------------------------------------------------------


def _rake_oracle() -> str:
    from .functions.text import RAKE_Q, STOPWORDS_EN

    stops = ", ".join(f"'{s}'" for s in STOPWORDS_EN)
    return f"""
WITH toks AS (
  SELECT grp, did, i.range AS pos, tk[i.range] AS tok
  FROM (SELECT source AS grp, doc_id AS did,
               string_split_regex(lower(text), '[^a-z]+') AS tk
        FROM documents) t, range(1, 1001) i
  WHERE i.range <= len(tk) AND tk[i.range] <> ''
),
mem AS (
  SELECT * FROM (
    SELECT grp, did, pos, tok, stop,
           sum(stop) OVER (PARTITION BY did ORDER BY pos
                           ROWS UNBOUNDED PRECEDING) AS island
    FROM (SELECT *, CASE WHEN tok IN ({stops}) THEN 1 ELSE 0 END AS stop
          FROM toks)
  ) WHERE stop = 0
),
plen AS (SELECT did, island, CAST(count(*) AS BIGINT) AS plen
         FROM mem GROUP BY 1, 2),
m AS (SELECT mem.*, plen.plen FROM mem JOIN plen USING (did, island)),
wdim AS (
  SELECT tok,
         CAST((CAST(sum(plen) AS BIGINT) * {RAKE_Q}) // count(*) AS BIGINT)
           AS sq
  FROM m GROUP BY tok
),
phr AS (
  SELECT grp, did, island,
         string_agg(m.tok, ' ' ORDER BY m.pos) AS phrase,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(w.sq) AS BIGINT) AS score_q
  FROM m JOIN wdim w USING (tok)
  GROUP BY grp, did, island
),
dp AS (SELECT DISTINCT grp, phrase, n_words, score_q FROM phr),
r AS (SELECT *, row_number() OVER (PARTITION BY grp
          ORDER BY score_q DESC, phrase ASC) AS rn FROM dp)
SELECT grp, phrase, n_words,
       round(CAST(score_q AS DOUBLE) / {float(RAKE_Q)!r}, 6) AS score
FROM r WHERE rn = 1
"""


@register("q_rake", _rake_oracle())
def q_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top RAKE keyword phrase per source (Rose et al. 2010):
    stopword/punctuation-delimited candidate phrases via
    gaps-and-islands over the token stream, corpus-wide word scores
    deg/freq quantized to integer micro-units, phrase score = exact
    member sum, lexicographic tie-break — the phrase-level keyword
    extractor beside q_salient_terms (tf-idf unigrams) and
    q_pmi_bigrams (collocation pairs).  The oracle replays the same
    islands / degree / pricing chain under the documented 1000-token
    position cap (functions/text.py ``rake_top_phrases``)."""
    from .functions.text import rake_top_phrases

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return rake_top_phrases(docs)


# ---------------------------------------------------------------------------
# q_cochran_armitage — purchase-rate trend across ordered weekdays
# ---------------------------------------------------------------------------


def _ca_oracle() -> str:
    from .functions.stats import cochran_armitage_sql

    inner = (
        "(SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,"
        " CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv"
        " FROM events)"
    )
    return cochran_armitage_sql(inner, "dow", "conv")


@register("q_cochran_armitage", _ca_oracle())
def q_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Armitage trend: does the purchase share of events rise
    or fall monotonically across the ordered weekday score 0..6? —
    the directional categorical test beside q_chi2 (unordered
    independence) and q_volume_anomaly (pointwise).  Weekday is
    derived from epoch days ((days + 4) mod 7 — portable, unlike the
    engines' differing dayofweek conventions); every moment is an
    exact DECIMAL(38,0)/HUGEINT integer and the statistic is one
    division + round-6 (functions/stats.py ``cochran_armitage``,
    oracle generated by ``cochran_armitage_sql``)."""
    from .functions.stats import cochran_armitage

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    d = ev.select(
        F.expr(
            "(unix_micros(cast(ts as timestamp)) div 86400000000 + 4) % 7"
        ).alias("dow"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "conv"
        ),
    )
    return cochran_armitage(d, "dow", "conv")


# ---------------------------------------------------------------------------
# q_isotonic — PAV monotone calibration of English share on length bins
# ---------------------------------------------------------------------------


def _isotonic_oracle() -> str:
    from .functions.stats import isotonic_oracle_sql

    inner = (
        "(SELECT source, n_chars // 64 AS bin,"
        " CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents)"
    )
    return isotonic_oracle_sql(inner, "source", "bin", "y")


@register("q_isotonic", _isotonic_oracle())
def q_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (pool-adjacent-violators) calibration per source: the
    monotone non-decreasing fit of the English-share outcome on
    ordered 64-char length bins — the calibration map beside
    q_calibration_bins (fixed-width reliability) and
    q_score_percentiles (rank map).  The engine runs exact PAV with
    integer cross-multiplied merge decisions in one Arrow kernel per
    source (functions/stats.py ``isotonic_fit``); the oracle
    evaluates the INDEPENDENT minimax characterization
    max_{j≤i} min_{k≥j} mean(y[j..k]) over prefix-sum interval pairs —
    the PAV theorem says the two must agree, and the hash proves they
    do on every fitted value."""
    from .functions.stats import isotonic_fit

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = docs.select(
        "source",
        F.expr("n_chars div 64").alias("bin"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    return isotonic_fit(d, "source", "bin", "y")


# ---------------------------------------------------------------------------
# q_cocitation — top co-cited host pairs of the link graph
# ---------------------------------------------------------------------------

_COCIT_K = 20


@register(
    "q_cocitation",
    "WITH " + _LINK_GRAPH_CTE + f""",
de AS (SELECT DISTINCT src_host, dst_host FROM r
       WHERE src_host <> dst_host),
pr AS (
  SELECT a.dst_host AS h1, b.dst_host AS h2,
         CAST(count(*) AS BIGINT) AS n_common
  FROM de a JOIN de b
    ON a.src_host = b.src_host AND a.dst_host < b.dst_host
  GROUP BY 1, 2
),
rk AS (SELECT *, row_number() OVER (
          ORDER BY n_common DESC, h1 ASC, h2 ASC) AS rn FROM pr)
SELECT h1, h2, n_common FROM rk WHERE rn <= {_COCIT_K}
""",
)
def q_cocitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_COCIT_K} co-cited host pairs (Small 1973 / SALSA's
    authority-side projection): hosts linked by the most common
    source hosts — the DIRECTED in-neighbour overlap, distinct from
    q_adamic_adar's undirected weighted prediction and q_hits'
    eigenvector authorities.  Shape: distinct edges, one self-join
    keyed on the source host (bounded per-source out-degree, the
    once-per-wedge enumeration triangle counting uses), one pair
    aggregate, deterministic (count, pair) tie-break."""
    from .functions.links import host_link_graph

    e = (
        host_link_graph(_link_pages_df(spark, sf_dir))
        .filter(F.col("src_host") != F.col("dst_host"))
        .select("src_host", "dst_host")
        .distinct()
    )
    a = e.select(F.col("src_host").alias("s"), F.col("dst_host").alias("h1"))
    b = e.select(F.col("src_host").alias("s"), F.col("dst_host").alias("h2"))
    pr = (
        a.join(b, "s")
        .filter(F.col("h1") < F.col("h2"))
        .groupBy("h1", "h2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    w = Window.orderBy(
        F.col("n_common").desc(), F.col("h1").asc(), F.col("h2").asc()
    )
    return (
        pr.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _COCIT_K)
        .select("h1", "h2", "n_common")
    )


# ---------------------------------------------------------------------------
# q_tree_rollup — hierarchical dimension rollup over a category tree
# ---------------------------------------------------------------------------

_TREE_N = 63     # complete binary tree, depth 0..5: parent(c) = (c-1) div 2
_TREE_DEPTH = 6  # levels (root = 0)


@register(
    "q_tree_rollup",
    f"""
WITH dc AS (
  SELECT doc_id % {_TREE_N} AS cat,
         CAST(count(*) AS BIGINT) AS n, CAST(sum(n_chars) AS BIGINT) AS ch
  FROM documents GROUP BY 1
),
anc AS (
  SELECT ((dc.cat + 1) // (1 << k.range)) - 1 AS node, dc.n, dc.ch,
         CASE WHEN k.range = 0 THEN dc.n ELSE 0 END AS n_dir
  FROM dc, range(0, {_TREE_DEPTH}) k
  WHERE ((dc.cat + 1) // (1 << k.range)) - 1 >= 0
)
SELECT node,
       CAST(floor(log2(node + 1)) AS BIGINT) AS depth,
       CAST(sum(n_dir) AS BIGINT) AS n_direct,
       CAST(sum(n) AS BIGINT) AS n_subtree,
       CAST(sum(ch) AS BIGINT) AS chars_subtree
FROM anc GROUP BY node
""",
)
def q_tree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical dimension rollup — the OLAP surface GROUPING SETS
    cannot express: documents hang off a {_TREE_N}-node category tree
    (complete binary, parent(c) = (c−1) div 2) and every NODE reports
    its direct and whole-SUBTREE document/char totals.  The ancestor
    set of a complete-binary-tree node is CLOSED FORM —
    anc_k(c) = (c+1) div 2^k − 1 — so the engine explodes ≤ 6
    ancestor keys per category partial and aggregates once: zero
    iteration, zero self-joins, the scale plan for any
    fixed-fanout taxonomy (general DAGs would swap in the pointer-
    doubling closure q_flow_length uses).  Leaf counting happens on
    the category PARTIALS (one row per category, never per doc), so
    the explode cost is dimension-sized."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dc = docs.groupBy((F.col("doc_id") % _TREE_N).alias("cat")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("ch")
    )
    anc = dc.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (
                            F.expr(f"(cat + 1) div {1 << k}") - 1
                        ).alias("node"),
                        F.lit(k).alias("k"),
                    )
                    for k in range(_TREE_DEPTH)
                ]
            )
        ).alias("a"),
        "n",
        "ch",
    ).select(
        F.col("a.node").alias("node"),
        F.col("a.k").alias("k"),
        "n",
        "ch",
    ).filter(F.col("node") >= 0)
    return anc.groupBy("node").agg(
        F.floor(F.log2(F.col("node") + 1)).cast("long").alias("depth"),
        F.sum(F.when(F.col("k") == 0, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_direct"),
        F.sum("n").cast("long").alias("n_subtree"),
        F.sum("ch").cast("long").alias("chars_subtree"),
    )


# ---------------------------------------------------------------------------
# q_hausdorff — directed Hausdorff distance from each trajectory to a path
# ---------------------------------------------------------------------------

_HD_PATH = [(0, 0, 3000, 3000), (3000, 3000, 6000, 2000),
            (6000, 2000, 9000, 9000)]  # reference polyline segments


@register(
    "q_hausdorff",
    f"""
WITH e AS (
  SELECT user_id, ts, event_id,
         (CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
               THEN (user_id * 48271) % 9000
               ELSE (user_id * 7919 + 211) % 9000 END)
           + ((event_id * 131) % 41 - 20) AS qx,
         (CASE WHEN (epoch_us(ts) // 3600000000) % 24 < 12
               THEN (user_id * 16807) % 9000
               ELSE (user_id * 104729 + 57) % 9000 END)
           + ((event_id * 211) % 41 - 20) AS qy
  FROM events
),
seg(x1, y1, x2, y2) AS (VALUES {", ".join(f"({a}, {b}, {c}, {d})" for a, b, c, d in _HD_PATH)}),
d AS (
  SELECT user_id, event_id,
         min(round(sqrt(ddx * ddx + ddy * ddy), 6)) AS dmin
  FROM (
    SELECT user_id, event_id,
           qx - (x1 + t * (x2 - x1)) AS ddx,
           qy - (y1 + t * (y2 - y1)) AS ddy
    FROM (
      SELECT e.user_id, e.event_id, e.qx, e.qy, s.x1, s.y1, s.x2, s.y2,
             least(greatest(
               ((e.qx - s.x1) * (s.x2 - s.x1)
                + (e.qy - s.y1) * (s.y2 - s.y1))
               / CAST((s.x2 - s.x1) * (s.x2 - s.x1)
                      + (s.y2 - s.y1) * (s.y2 - s.y1) AS DOUBLE),
               0.0), 1.0) AS t
      FROM e CROSS JOIN seg s
    )
  )
  GROUP BY user_id, event_id
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_fixes,
       max(dmin) AS hausdorff_m
FROM d GROUP BY user_id
""",
)
def q_hausdorff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed Hausdorff distance from each user's trajectory (the
    q_staypoints home/work fixes) to a fixed reference polyline —
    max-over-fixes of min-over-segments, the set-based route-adherence
    metric beside q_dtw_profile's order-aware alignment and
    q_map_match's per-fix snap.  The point→segment distance reuses
    nearest_edge's clamped-projection codegen chain verbatim
    (operators/snap.py docstring math), round-6 BEFORE the min per
    the FP-total-order rule; the segment dim is literal VALUES on
    both sides and broadcast in the engine — O(fixes·|path|), never
    a shuffle beyond the per-user aggregate."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    uid, eid = F.col("user_id"), F.col("event_id")
    at_home = F.expr(
        "(unix_micros(cast(ts as timestamp)) div 3600000000) % 24 < 12"
    )
    e = ev.select(
        "user_id", "event_id",
        (
            F.when(at_home, (uid * 48271) % 9000)
            .otherwise((uid * 7919 + 211) % 9000)
            + ((eid * 131) % 41 - 20)
        ).alias("qx"),
        (
            F.when(at_home, (uid * 16807) % 9000)
            .otherwise((uid * 104729 + 57) % 9000)
            + ((eid * 211) % 41 - 20)
        ).alias("qy"),
    )
    seg = spark.createDataFrame(_HD_PATH, "x1 long, y1 long, x2 long, y2 long")
    dx = F.col("x2") - F.col("x1")
    dy = F.col("y2") - F.col("y1")
    len2 = (dx * dx + dy * dy).cast("double")
    traw = (
        (F.col("qx") - F.col("x1")) * dx + (F.col("qy") - F.col("y1")) * dy
    ) / len2
    t = F.least(F.greatest(traw, F.lit(0.0)), F.lit(1.0))
    px = F.col("x1") + t * dx
    py = F.col("y1") + t * dy
    ddx = F.col("qx") - px
    ddy = F.col("qy") - py
    dist = F.round(F.sqrt(ddx * ddx + ddy * ddy), 6)
    d = (
        e.crossJoin(F.broadcast(seg))
        .groupBy("user_id", "event_id")
        .agg(F.min(dist).alias("dmin"))
    )
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_fixes"),
        F.max("dmin").alias("hausdorff_m"),
    )


# ---------------------------------------------------------------------------
# q_hist_equalize — global histogram equalization of the NDVI raster
# ---------------------------------------------------------------------------


def _hist_equalize_oracle(quant: float = 1e4, levels: int = 256) -> str:
    npx = city.NPX
    vq = (
        "CAST(round(("
        + city.NDVI_SQL.format(
            px_x=f"{city.X0} + (ix + 0.5) * {city.RES}",
            px_y=f"{city.Y0} + (iy + 0.5) * {city.RES}",
        )
        + f") * {quant}) AS BIGINT)"
    )
    return f"""
WITH px AS (
  SELECT i % {npx} AS ix, i // {npx} AS iy
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
),
pv AS (SELECT ix // {city.TILE_PX} AS tx, iy // {city.TILE_PX} AS ty,
              {vq} AS v
       FROM px),
h AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM pv GROUP BY v),
cd AS (SELECT v, CAST(sum(c) OVER (ORDER BY v
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cdf FROM h),
st AS (SELECT CAST(min_by(cdf, v) AS BIGINT) AS cmin,
              CAST(max(cdf) AS BIGINT) AS n FROM cd)
SELECT pv.tx, pv.ty, CAST(count(*) AS BIGINT) AS n_px,
       CAST(sum(((cd.cdf - st.cmin) * {levels - 1}) // (st.n - st.cmin))
            AS BIGINT) AS sum_eq
FROM pv JOIN cd USING (v), st
GROUP BY pv.tx, pv.ty
"""


@register("q_hist_equalize", _hist_equalize_oracle())
def q_hist_equalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global histogram equalization (the OpenCV/GDAL contrast
    normalization) of the quantized NDVI raster, per-tile exact sums
    of the equalized 0..255 values: the ONE raster operator that
    needs the global value distribution, solved with the same
    two-phase value-histogram + range-partitioned cumulative sum the
    zonal quantiles and equi-depth histogram use — shuffle volume is
    O(distinct values), no global sort task, and the per-pixel remap
    is integer division end-to-end (operators/zonal.py
    ``histogram_equalize_stats``).  The oracle recomputes cdf / cmin
    over the same closed-form pixels."""
    from .operators.zonal import histogram_equalize_stats

    return histogram_equalize_stats(city.tiles_df(spark, "ndvi"))


# ---------------------------------------------------------------------------
# q_growth_accounting — daily new / retained / resurrected / churned users
# ---------------------------------------------------------------------------

@register(
    "q_growth_accounting",
    """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
  FROM events
),
l AS (
  SELECT user_id, d,
         lag(d) OVER (PARTITION BY user_id ORDER BY d) AS pd,
         lead(d) OVER (PARTITION BY user_id ORDER BY d) AS nd
  FROM ud
),
act AS (
  SELECT d,
         CAST(sum(CASE WHEN pd IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
         CAST(sum(CASE WHEN pd = d - 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_retained,
         CAST(sum(CASE WHEN pd IS NOT NULL AND pd < d - 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_resurrected
  FROM l GROUP BY d
),
ch AS (
  SELECT d + 1 AS d, CAST(count(*) AS BIGINT) AS n_churned
  FROM l, (SELECT max(d) AS dmax FROM ud) mx
  WHERE (nd IS NULL OR nd > d + 1) AND d + 1 <= mx.dmax
  GROUP BY d + 1
)
SELECT coalesce(act.d, ch.d) AS d,
       coalesce(act.n_new, 0) AS n_new,
       coalesce(act.n_retained, 0) AS n_retained,
       coalesce(act.n_resurrected, 0) AS n_resurrected,
       coalesce(ch.n_churned, 0) AS n_churned
FROM act FULL OUTER JOIN ch ON act.d = ch.d
""",
)
def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting (the Social-Capital framework): every
    active user-day is NEW (first ever), RETAINED (also active the
    previous day) or RESURRECTED (returning after a gap), and a
    CHURN row charges users active on d−1 but not d to day d —
    identities n_active = new + retained + resurrected hold by
    construction.  The state machine is two windows (lag/lead) over
    the distinct user-day frame — one exchange keyed by user, the
    same gaps-and-islands discipline as q_staypoints — then a day
    rollup and one day-keyed outer join of the churn ledger; days
    come from exact epoch-µs integer division."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ud = ev.select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
            "d"
        ),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    l = ud.select(
        "user_id", "d",
        F.lag("d").over(w).alias("pd"),
        F.lead("d").over(w).alias("nd"),
    ).localCheckpoint()  # consumed by both the activity and churn branches
    act = l.groupBy("d").agg(
        F.sum(F.when(F.col("pd").isNull(), 1).otherwise(0))
        .cast("long").alias("n_new"),
        F.sum(F.when(F.col("pd") == F.col("d") - 1, 1).otherwise(0))
        .cast("long").alias("n_retained"),
        F.sum(
            F.when(
                F.col("pd").isNotNull() & (F.col("pd") < F.col("d") - 1), 1
            ).otherwise(0)
        ).cast("long").alias("n_resurrected"),
    )
    mx = ud.agg(F.max("d").alias("dmax"))
    ch = (
        l.crossJoin(F.broadcast(mx))
        .filter(
            (F.col("nd").isNull() | (F.col("nd") > F.col("d") + 1))
            & (F.col("d") + 1 <= F.col("dmax"))
        )
        .groupBy((F.col("d") + 1).alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
    )
    return (
        act.join(ch, "d", "full_outer")
        .select(
            "d",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
            F.coalesce("n_resurrected", F.lit(0)).alias("n_resurrected"),
            F.coalesce("n_churned", F.lit(0)).alias("n_churned"),
        )
    )


# ---------------------------------------------------------------------------
# q_mutual_information — MI / marginal entropies / NMI of source × lang
# ---------------------------------------------------------------------------

@register(
    "q_mutual_information",
    """
WITH d AS (SELECT source AS a, lang AS b FROM documents),
ab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY a, b),
w AS (SELECT a, b, c,
             CAST(sum(c) OVER (PARTITION BY a) AS BIGINT) AS na,
             CAST(sum(c) OVER (PARTITION BY b) AS BIGINT) AS nb,
             CAST(sum(c) OVER () AS BIGINT) AS nn
      FROM ab),
j AS (SELECT CAST(max(nn) AS BIGINT) AS n,
             CAST(sum(CAST(floor(
               (CAST(c AS DOUBLE) / CAST(nn AS DOUBLE))
               * ln((CAST(c AS DOUBLE) * CAST(nn AS DOUBLE))
                    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
               * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS miq
      FROM w),
ma AS (SELECT a, max(nn) AS nn, max(na) AS nm FROM w GROUP BY a),
ha AS (SELECT CAST(sum(CAST(floor(
         (CAST(nm AS DOUBLE) / CAST(nn AS DOUBLE))
         * ln(CAST(nm AS DOUBLE) / CAST(nn AS DOUBLE))
         * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS hq_a FROM ma),
mb AS (SELECT b, max(nn) AS nn, max(nb) AS nm FROM w GROUP BY b),
hb AS (SELECT CAST(sum(CAST(floor(
         (CAST(nm AS DOUBLE) / CAST(nn AS DOUBLE))
         * ln(CAST(nm AS DOUBLE) / CAST(nn AS DOUBLE))
         * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS hq_b FROM mb)
SELECT n,
       CAST(miq AS DOUBLE) / 1000000000.0 + 0.0 AS mi_nats,
       -(CAST(hq_a AS DOUBLE) / 1000000000.0) + 0.0 AS h_a,
       -(CAST(hq_b AS DOUBLE) / 1000000000.0) + 0.0 AS h_b,
       CASE WHEN greatest(hq_a, hq_b) = 0 THEN NULL
            ELSE CAST(miq AS DOUBLE)
                 / (-CAST(greatest(hq_a, hq_b) AS DOUBLE)) + 0.0
       END AS nmi
FROM j, ha, hb
""",
)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between document source and language (plus
    both marginal entropies and min-normalized NMI) — "how much does
    the crawl source tell you about the language mix?", the
    information-theoretic complement of q_chi2 (significance) and
    q_js_divergence (pairwise distance) over the same categorical
    frame.  Every p·ln(·) term is 1e-9-quantized on the identical IEEE
    expression in both engines and summed as exact integers
    (functions/stats.py ``mutual_information``); the outputs are
    ratios of those exact longs, shipped unrounded."""
    from .functions.stats import mutual_information

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return mutual_information(docs, "source", "lang")


# ---------------------------------------------------------------------------
# q_stream_complete — COMPLETE-mode streaming aggregate to the memory sink
# ---------------------------------------------------------------------------

@register(
    "q_stream_complete",
    """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 1000000.0) AS BIGINT)) AS BIGINT)
         AS value_q
FROM events GROUP BY event_type
""",
)
def q_stream_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPLETE output mode — the last uncovered writeStream contract
    (append covers the file sinks and joins, update-shaped state
    lives in foreachBatch MERGE and applyInPandasWithState): an
    unwatermarked global aggregate whose ENTIRE dim-sized result is
    re-emitted to the memory sink every trigger, so the final swap after
    an AvailableNow drain must equal the batch groupBy — which is
    exactly what the oracle computes.  Values are µ-quantized to
    exact longs before summing (streaming/complete.py
    ``complete_type_counts``)."""
    import atexit
    import os
    import shutil
    import tempfile

    from .streaming.complete import complete_type_counts

    base = os.path.join(
        tempfile.gettempdir(), f"q_stream_complete_{os.getpid()}"
    )
    shutil.rmtree(base, ignore_errors=True)
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    src, ckpt = os.path.join(base, "src"), os.path.join(base, "ckpt")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    ev.coalesce(4).write.parquet(src)
    out = complete_type_counts(
        spark, src, ckpt, query_name=f"tc_{os.getpid()}"
    )
    return out.select("event_type", "n", "value_q")


# ---------------------------------------------------------------------------
# q_heaps_law — vocabulary-growth (Heaps' law) fit over crawl order
# ---------------------------------------------------------------------------

_HEAPS_CKPTS = 10


@register(
    "q_heaps_law",
    f"""
WITH ranked AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rk,
         CAST(count(*) OVER () AS BIGINT) AS nd
  FROM documents
), dd AS (
  SELECT toks,
         CAST(floor(CAST((rk - 1) * {_HEAPS_CKPTS} AS DOUBLE)
              / CAST(nd AS DOUBLE)) AS BIGINT) AS dec,
         CAST(len(toks) AS BIGINT) AS n_tok
  FROM ranked
), fo AS (
  SELECT tok, CAST(min(dec) AS BIGINT) AS fd
  FROM (SELECT dec, unnest(toks) AS tok FROM dd) GROUP BY tok
), vc AS (SELECT fd AS dec, CAST(count(*) AS BIGINT) AS v FROM fo GROUP BY fd),
tc AS (SELECT dec, CAST(sum(n_tok) AS BIGINT) AS tk FROM dd GROUP BY dec),
pts AS (
  SELECT CAST(sum(tk) OVER (ORDER BY tc.dec
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_n,
         CAST(sum(COALESCE(v, 0)) OVER (ORDER BY tc.dec
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_v
  FROM tc LEFT JOIN vc ON tc.dec = vc.dec
), qz AS (
  SELECT cum_n, cum_v,
         CAST(floor(log10(CAST(cum_n AS DOUBLE)) * 1000000.0 + 0.5)
              AS BIGINT) AS xq,
         CAST(floor(log10(CAST(cum_v AS DOUBLE)) * 1000000.0 + 0.5)
              AS BIGINT) AS yq
  FROM pts
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS dpts,
         CAST(sum(xq) AS BIGINT) AS sx, CAST(sum(yq) AS BIGINT) AS sy,
         CAST(sum(xq * yq) AS BIGINT) AS sxy,
         CAST(sum(xq * xq) AS BIGINT) AS sxx,
         CAST(max(cum_n) AS BIGINT) AS token_total,
         CAST(max(cum_v) AS BIGINT) AS vocab_total
  FROM qz
), nd2 AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
SELECT n_docs, dpts AS n_points, token_total, vocab_total,
       CAST(dpts * sxy - sx * sy AS DOUBLE)
         / CAST(dpts * sxx - sx * sx AS DOUBLE) AS heaps_beta,
       (CAST(sy AS DOUBLE)
        - (CAST(dpts * sxy - sx * sy AS DOUBLE)
           / CAST(dpts * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
         / (CAST(dpts AS DOUBLE) * 1000000.0) AS heaps_logk
FROM s, nd2
""",
)
def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit V(N)=k·N^β over crawl order
    (doc_id ascending, 10 rank-decile checkpoints) — the saturation
    diagnostic for "does another crawl snapshot still add lexical
    value?".  Checkpointing uses the two-phase global rank (never a
    single-task window); first-appearance decile per token is a
    map-side-combinable min; the log10 regression inputs are
    1e-6-quantized to exact longs on the identical IEEE expression in
    both engines, so slope and intercept divide the same integers
    (functions/text.py ``heaps_law``).  The oracle's flat global
    row_number window is exactly what the operator must NOT do at
    scale."""
    from .functions.text import heaps_law

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return heaps_law(docs, "doc_id", "text", _HEAPS_CKPTS)


# ---------------------------------------------------------------------------
# q_mcnemar — paired McNemar test: heuristic language-ID vs majority baseline
# ---------------------------------------------------------------------------

@register("q_mcnemar", None)  # generated oracle attached below
def q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test of the heuristic language-ID classifier
    against the majority-class baseline (modal corpus lang, ties by
    lang ascending) on the SAME documents — the correct "is the model
    actually better than predicting the mode?" eval where the unpaired
    q_chi2 wastes the pairing.  b/c discordant counts are exact int64;
    both the plain (b−c)²/(b+c) and Edwards' continuity-corrected
    statistic are one integer/integer double division shipped
    unrounded (functions/stats.py ``mcnemar_paired``); the oracle
    recomputes the prediction through the generated stopword-score SQL
    and the modal baseline independently."""
    from .functions.stats import mcnemar_paired
    from .functions.text import language_id

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pred = language_id(docs).select("doc_id", "pred_lang")
    base = (
        docs.groupBy("lang")
        .count()
        .orderBy(F.desc("count"), F.asc("lang"))
        .limit(1)
        .select(F.col("lang").alias("base_lang"))
    )
    j = (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .crossJoin(F.broadcast(base))
    )
    return mcnemar_paired(j, "lang", "pred_lang", "base_lang")


ORACLES["q_mcnemar"] = f"""
WITH p AS ({_langid_sql()}),
base AS (
  SELECT lang AS base_lang FROM documents
  GROUP BY lang ORDER BY count(*) DESC, lang ASC LIMIT 1
),
j AS (
  SELECT d.lang AS truth, p.pred_lang AS pa, bs.base_lang AS pb
  FROM documents d JOIN p ON p.doc_id = d.doc_id CROSS JOIN base bs
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN truth = pa AND truth <> pb THEN 1 ELSE 0 END)
              AS BIGINT) AS b,
         CAST(sum(CASE WHEN truth <> pa AND truth = pb THEN 1 ELSE 0 END)
              AS BIGINT) AS c
  FROM j
)
SELECT n, b + c AS n_discordant, b, c,
       CASE WHEN b + c = 0 THEN NULL
            ELSE CAST((b - c) * (b - c) AS DOUBLE) / CAST(b + c AS DOUBLE)
       END AS mcnemar,
       CASE WHEN b + c = 0 THEN NULL
            ELSE CAST(greatest(abs(b - c) - 1, 0)
                      * greatest(abs(b - c) - 1, 0) AS DOUBLE)
                 / CAST(b + c AS DOUBLE)
       END AS mcnemar_cc
FROM s
"""


# ---------------------------------------------------------------------------
# q_variant_hist — Spark-4 VARIANT open-schema field histogram
# ---------------------------------------------------------------------------

_VARIANT_BIN_W = 10


@register(
    "q_variant_hist",
    f"""
WITH e AS (
  SELECT CASE WHEN json_valid(props)
              THEN CAST(json_extract_string(props, '$.k') AS INT)
         END AS k,
         event_type, value
  FROM events
), b AS (
  SELECT CASE WHEN k IS NULL THEN -1
              ELSE CAST(floor(CAST(k AS DOUBLE) / {_VARIANT_BIN_W}.0)
                        AS BIGINT)
         END AS bin,
         k, event_type,
         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vq
  FROM e
)
SELECT bin, CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
       CAST(coalesce(sum(k), 0) AS BIGINT) AS sum_k,
       CAST(sum(vq) AS BIGINT) AS value_q
FROM b GROUP BY bin
""",
)
def q_variant_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of the props.k field extracted through Spark 4's
    VARIANT type (try_parse_json → try_variant_get) — the open-schema
    semi-structured path beside q_json_extract's closed from_json
    schema: VARIANT keeps the parsed document in a binary columnar
    encoding so key drift across crawl snapshots costs a probe, not a
    re-parse.  Missing/malformed fields land in the observable bin=-1
    bucket; the value companion is 1e-6-quantized to exact longs on
    the identical floor(x·1e6+0.5) in both engines
    (functions/semistructured.py ``variant_field_hist``)."""
    from .functions.semistructured import variant_field_hist

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return variant_field_hist(ev, "props", "k", _VARIANT_BIN_W, "value")


# ---------------------------------------------------------------------------
# q_mcc — multi-class Matthews correlation of the language-ID classifier
# ---------------------------------------------------------------------------

@register("q_mcc", None)  # generated oracle attached below
def q_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-class Matthews correlation (Gorodkin's R_K) of the
    heuristic language-ID prediction against the corpus lang label —
    the skew-honest single number beside q_cohens_kappa (chance
    agreement) and q_langid_prf (per-class detail) over the same
    confusion frame.  All Σp_k t_k / Σp² / Σt² terms are exact int64;
    each engine runs one identical cast–multiply–sqrt–divide IEEE
    chain, shipped unrounded (functions/stats.py ``matthews_corr``)."""
    from .functions.stats import matthews_corr
    from .functions.text import language_id

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pred = language_id(docs).select("doc_id", "pred_lang")
    j = docs.select("doc_id", "lang").join(pred, "doc_id")
    return matthews_corr(j, "lang", "pred_lang")


ORACLES["q_mcc"] = f"""
WITH j AS (
  SELECT d.lang AS t, p.pred_lang AS p
  FROM documents d JOIN ({_langid_sql()}) p ON p.doc_id = d.doc_id
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS s,
         CAST(sum(CASE WHEN t = p THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM j
),
pk AS (SELECT p AS cls, CAST(count(*) AS BIGINT) AS pcnt FROM j GROUP BY p),
tk AS (SELECT t AS cls, CAST(count(*) AS BIGINT) AS tcnt FROM j GROUP BY t),
x AS (
  SELECT CAST(coalesce(sum(coalesce(pcnt, 0) * coalesce(tcnt, 0)), 0)
              AS BIGINT) AS spt,
         CAST(coalesce(sum(coalesce(pcnt, 0) * coalesce(pcnt, 0)), 0)
              AS BIGINT) AS spp,
         CAST(coalesce(sum(coalesce(tcnt, 0) * coalesce(tcnt, 0)), 0)
              AS BIGINT) AS stt
  FROM pk FULL OUTER JOIN tk USING (cls)
)
SELECT s AS n, c AS n_correct,
       CASE WHEN sqrt(CAST(s * s - spp AS DOUBLE)
                      * CAST(s * s - stt AS DOUBLE)) = 0 THEN NULL
            ELSE CAST(c * s - spt AS DOUBLE)
                 / sqrt(CAST(s * s - spp AS DOUBLE)
                        * CAST(s * s - stt AS DOUBLE))
       END AS mcc
FROM tot, x
"""


# ---------------------------------------------------------------------------
# q_naive_bayes — multinomial NB trained + scored distributed (confusion)
# ---------------------------------------------------------------------------

# per-document NB prediction as a reusable subquery (also feeds the
# q_fleiss multi-rater agreement oracle)
_NB_PRED_SQL = """
WITH docs AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
),
toks AS (SELECT doc_id, lang, unnest(toks) AS tok FROM docs),
c AS (SELECT tok, lang AS cls, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY tok, lang),
model AS (
  SELECT tok, cls,
         CAST(floor(ln(CAST(c + 1 AS DOUBLE)) * 1000000000.0 + 0.5)
              AS BIGINT) AS qc
  FROM c
),
vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM c),
tl AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS t_l
       FROM toks GROUP BY lang),
nl AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS n_l
       FROM docs GROUP BY lang),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM docs),
cls AS (
  SELECT tl.cls,
         CAST(floor(ln(CAST(n_l AS DOUBLE) / CAST(n AS DOUBLE))
              * 1000000000.0 + 0.5) AS BIGINT) AS prior_q,
         CAST(floor(ln(CAST(t_l + v AS DOUBLE)) * 1000000000.0 + 0.5)
              AS BIGINT) AS qden
  FROM tl JOIN nl USING (cls), vocab, nn
),
dtok AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS m
         FROM toks GROUP BY doc_id, tok),
part AS (
  SELECT doc_id, cls, CAST(sum(m * qc) AS BIGINT) AS sum_q
  FROM dtok JOIN model USING (tok) GROUP BY doc_id, cls
),
base AS (SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tok FROM docs),
scored AS (
  SELECT b.doc_id, b.lang, c2.cls,
         c2.prior_q + COALESCE(p.sum_q, 0) - b.n_tok * c2.qden AS score_q
  FROM base b CROSS JOIN cls c2
  LEFT JOIN part p ON p.doc_id = b.doc_id AND p.cls = c2.cls
),
pred AS (
  SELECT doc_id, lang, cls AS pred_lang,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_q DESC, cls ASC) AS rn
  FROM scored
)
SELECT doc_id, lang, pred_lang FROM pred WHERE rn = 1
"""


@register(
    "q_naive_bayes",
    f"""
SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
FROM ({_NB_PRED_SQL}) GROUP BY lang, pred_lang
""",
)
def q_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes language classifier trained AND scored
    distributed on the corpus (Laplace-smoothed per-class token
    likelihoods + class priors, resubstitution confusion matrix) — the
    model-fitting surface beside q_classifier_score's fixed-weight
    scorer: one explode shuffle builds the vocab×L model, scoring
    joins per-doc token counts to the model with a SHUFFLE hash join
    (the model grows with corpus vocabulary — deliberately NOT
    broadcast, the q_bigram_logprob lesson), and the per-class argmax
    compares exact 1e-9-quantized integer log scores with ties broken
    by class ascending (functions/text.py ``naive_bayes_confusion``)."""
    from .functions.text import naive_bayes_confusion

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return naive_bayes_confusion(docs, "doc_id", "text", "lang")


# ---------------------------------------------------------------------------
# q_mst_backbone — Borůvka minimum spanning tree of the densest crawl cells
# ---------------------------------------------------------------------------

_MST_TOP = 80


@register(
    "q_mst_backbone",
    f"""
WITH RECURSIVE pts AS ({{points_sql}}),
cl AS (SELECT {{cell_sql}} AS cell FROM pts),
cnt AS (SELECT cell, CAST(count(*) AS BIGINT) AS n FROM cl GROUP BY cell),
top AS (SELECT cell, n,
               row_number() OVER (ORDER BY n DESC, cell ASC) - 1 AS idx
        FROM cnt ORDER BY n DESC, cell ASC LIMIT {_MST_TOP}),
xy AS (SELECT idx,
              CAST({{x0_2}} + (cell % {{cell_base}}) * 200 + 100 AS BIGINT)
                AS x2,
              CAST({{y0_2}} + (cell // {{cell_base}}) * 200 + 100 AS BIGINT)
                AS y2
       FROM top),
ek AS MATERIALIZED (
  SELECT a.idx AS u, b.idx AS v,
         (a.x2 - b.x2) * (a.x2 - b.x2)
           + (a.y2 - b.y2) * (a.y2 - b.y2) AS w4,
         ((a.x2 - b.x2) * (a.x2 - b.x2)
           + (a.y2 - b.y2) * (a.y2 - b.y2)) * 16384
           + least(a.idx, b.idx) * 128 + greatest(a.idx, b.idx) AS wkey
  FROM xy a JOIN xy b ON a.idx <> b.idx
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM top),
prim(step, intree, total_w4, total_len_q) AS (
  SELECT 0, [CAST(0 AS BIGINT)], CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  UNION ALL
  SELECT p.step + 1,
         list_append(p.intree, arg_min(k.v, k.wkey)),
         p.total_w4 + arg_min(k.w4, k.wkey),
         p.total_len_q
           + CAST(floor(sqrt(CAST(arg_min(k.w4, k.wkey) AS DOUBLE)) / 2.0
                        * 1000000.0 + 0.5) AS BIGINT)
  FROM prim p JOIN ek k
    ON list_contains(p.intree, k.u) AND NOT list_contains(p.intree, k.v)
  GROUP BY p.step, p.intree, p.total_w4, p.total_len_q
),
fin AS (SELECT step, total_w4, total_len_q
        FROM prim ORDER BY step DESC LIMIT 1)
SELECT n_nodes, CAST(step AS BIGINT) AS n_edges, total_w4, total_len_q
FROM fin, nn
""".format(
        points_sql=city.points_sql(),
        cell_sql=city.cell_expr_sql("x", "y"),
        x0_2=int(2 * city.X0),
        y0_2=int(2 * city.Y0),
        cell_base=city.CELL_BASE,
    ),
)
def q_mst_backbone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum spanning tree of the 80 densest geocoded crawl cells
    (Euclidean complete graph on the exact doubled-integer cell
    centers) by DISTRIBUTED Borůvka — the connectivity backbone a
    crawl planner uses to wire its hottest regions with least total
    distance.  Edge weights are exact int64 squared distances with the
    (w, u, v) total order, so the MST is unique and Borůvka (engine,
    O(log n) DataFrame rounds — functions/graph.py ``boruvka_mst``)
    provably equals the oracle's sequential Prim (a 79-step recursive
    CTE with arg_min per step — exactly what the operator must NOT do
    at scale).  Per-edge lengths are quantized
    floor(sqrt(w4)/2·1e6+0.5) on the identical IEEE chain; the top-80
    selection is a distributed TakeOrdered (n DESC, cell ASC), never a
    global sort."""
    from .functions.graph import boruvka_mst

    pts = city.with_cell(city.points_df(spark, sf_dir))
    cnt = pts.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    top = cnt.orderBy(F.desc("n"), F.asc("cell")).limit(_MST_TOP)
    w = Window.orderBy(F.desc("n"), F.asc("cell"))
    nodes = top.select(
        (F.row_number().over(w) - 1).cast("long").alias("idx"),
        (F.lit(int(2 * city.X0)) + (F.col("cell") % city.CELL_BASE) * 200
         + 100).cast("long").alias("x2"),
        (F.lit(int(2 * city.Y0))
         + F.expr(f"cell DIV {city.CELL_BASE}") * 200
         + 100).cast("long").alias("y2"),
    )
    a, b = nodes.alias("a"), nodes.alias("b")
    dx = F.col("a.x2") - F.col("b.x2")
    dy = F.col("a.y2") - F.col("b.y2")
    edges = a.join(b, F.col("a.idx") < F.col("b.idx")).select(
        F.col("a.idx").alias("u"),
        F.col("b.idx").alias("v"),
        (dx * dx + dy * dy).cast("long").alias("w4"),
    )
    mst = boruvka_mst(edges)
    res = mst.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.coalesce(F.sum("w4"), F.lit(0)).cast("long").alias("total_w4"),
        F.coalesce(
            F.sum(
                F.floor(
                    F.sqrt(F.col("w4").cast("double")) / 2.0 * 1000000.0
                    + 0.5
                ).cast("long")
            ),
            F.lit(0),
        ).cast("long").alias("total_len_q"),
    )
    nn = top.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    return res.crossJoin(F.broadcast(nn)).select(
        "n_nodes", "n_edges", "total_w4", "total_len_q"
    )


# ---------------------------------------------------------------------------
# q_green_quality_corr — ecological NDVI × document-quality correlation
# ---------------------------------------------------------------------------


def _green_quality_oracle() -> str:
    npx, cb = city.NPX, city.CELL_BASE
    ndvi = city.NDVI_SQL.format(
        px_x=f"{city.X0} + ((i % {npx}) + 0.5) * {city.RES}",
        px_y=f"{city.Y0} + ((i // {npx}) + 0.5) * {city.RES}",
    )
    return f"""
WITH pts AS ({city.points_sql()}),
ql AS (
  SELECT doc_id,
         CAST(floor(round(least(CAST(len(toks) AS DOUBLE) / 64.0, 1.0)
           * (1.0 - least(CAST(len(list_filter(toks, x -> x IN {_STOP_SQL}))
                               AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 4.0,
                          1.0))
           * (CASE WHEN (length(text) - len(toks) + 1)
                        / CAST(len(toks) AS DOUBLE) >= 3.0
                   AND (length(text) - len(toks) + 1)
                        / CAST(len(toks) AS DOUBLE) <= 10.0
                   THEN 1.0 ELSE 0.5 END), 3) * 1000.0 + 0.5) AS BIGINT)
           AS q1000
  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
),
dc AS (
  SELECT {city.cell_expr_sql('p.x', 'p.y')} AS cell, q.q1000
  FROM pts p JOIN ql q ON q.doc_id = p.doc_id
),
cq AS (
  SELECT cell, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(q1000) AS BIGINT) AS qsum
  FROM dc GROUP BY cell
),
nd AS (
  SELECT ((i // {npx}) // 10) * {cb} + ((i % {npx}) // 10) AS cell,
         CAST(sum(CAST(round(({ndvi}) * 10000.0) AS BIGINT)) AS BIGINT) AS x
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
  GROUP BY 1
),
j AS (
  SELECT nd.x, cq.qsum // cq.n_docs AS y
  FROM cq JOIN nd ON nd.cell = cq.cell
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM j
)
SELECT n AS n_cells, sx AS sum_x, sy AS sum_y,
       CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <= 0
            THEN NULL
            ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       END AS pearson_r
FROM s
"""


@register("q_green_quality_corr", _green_quality_oracle())
def q_green_quality_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ecological correlation between greenness and content quality:
    Pearson r across 100 m join-grid cells of (exact quantized NDVI
    pixel sum, floor-mean quantized document quality) — "do greener
    blocks host better pages?", the raster × webtext cross that joins
    the zonal raster path to the curation quality signal.  The raster
    side is `operators/focal.cell_value_sums` (per-tile exact int64
    partials, straddle cells re-summed by one cell-keyed shuffle — no
    halo, shuffle sized by cells not pixels); the document side
    reuses the shared quality formula.  All five Σ terms are exact
    int64; both engines run one identical cast-multiply-sqrt-divide
    IEEE chain, shipped unrounded (NULL on a degenerate margin)."""
    from .functions.text import quality_score
    from .operators.focal import cell_value_sums

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pts = city.with_cell(city.points_df(spark, sf_dir))
    q = quality_score(docs)
    dq = (
        pts.join(q, "doc_id")
        .select(
            "cell",
            F.floor(F.col("quality") * 1000.0 + 0.5).cast("long")
            .alias("q1000"),
        )
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("q1000").cast("long").alias("qsum"),
        )
    )
    nd = cell_value_sums(
        city.tiles_df(spark, "ndvi"), city.grid(), cell_px=10, quant=1e4
    ).select(
        (F.col("gy") * city.CELL_BASE + F.col("gx")).alias("cell"),
        F.col("vsum_q").alias("x"),
    )
    j = dq.join(nd, "cell").select(
        "x", F.expr("qsum DIV n_docs").cast("long").alias("y")
    )
    s = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    nd_, sx_, sy_ = (F.col("n").cast("double"), F.col("sx").cast("double"),
                     F.col("sy").cast("double"))
    d1 = nd_ * F.col("sxx").cast("double") - sx_ * sx_
    d2 = nd_ * F.col("syy").cast("double") - sy_ * sy_
    num = nd_ * F.col("sxy").cast("double") - sx_ * sy_
    return s.select(
        F.col("n").alias("n_cells"),
        F.col("sx").alias("sum_x"),
        F.col("sy").alias("sum_y"),
        F.when(d1 * d2 <= 0, F.lit(None).cast("double"))
        .otherwise(num / F.sqrt(d1 * d2)).alias("pearson_r"),
    )


# ---------------------------------------------------------------------------
# q_contagion — O'Neill landscape contagion of the language territory map
# ---------------------------------------------------------------------------

@register(
    "q_contagion",
    _CTE + f""",
{_DOM_LANG_SQL.strip()},
sh AS (SELECT gx + 1 AS gx, gy, cat FROM dom
       UNION ALL SELECT gx, gy + 1, cat FROM dom),
up AS (SELECT s.cat AS a, d.cat AS b FROM sh s JOIN dom d USING (gx, gy)),
ord_p AS (SELECT a, b FROM up UNION ALL SELECT b, a FROM up),
obs AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(count(*)) OVER () AS BIGINT) AS tot
        FROM ord_p GROUP BY a, b),
ent AS (
  SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_ordered,
         CAST(coalesce(sum(CAST(floor(
           (CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
           * ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
           * 1000000000.0 + 0.5) AS BIGINT)), 0) AS BIGINT) AS ent_q
  FROM obs
),
st AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
              CAST(count(DISTINCT cat) AS BIGINT) AS m_classes FROM dom)
SELECT n_cells, n_ordered // 2 AS n_pairs, m_classes,
       CASE WHEN m_classes <= 1 OR n_ordered = 0 THEN NULL
            ELSE 1.0 + (CAST(ent_q AS DOUBLE) / 1000000000.0)
                 / (2.0 * ln(CAST(m_classes AS DOUBLE)))
       END AS contagion
FROM st, ent
""",
)
def q_contagion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O'Neill (1988) relative contagion of the per-cell dominant
    document-language map — the single interspersion number ("how
    clumped are the language territories?") that aggregates
    q_join_counts' per-pair detail, applying the landscape-ecology
    metric to the webtext surface.  Ordered rook-adjacent pair
    distribution Q_ij; each Q·ln(Q) term 1e-9-quantized on the
    identical IEEE chain and summed as exact int64; final
    1 + (Σ/1e9)/(2·ln m), NULL when m ≤ 1
    (operators/spatial_stats.py ``contagion``)."""
    from .operators.spatial_stats import contagion

    return contagion(_dom_lang_df(spark, sf_dir))


# ---------------------------------------------------------------------------
# q_range_frame — event-time RANGE-frame trailing-window burst stats
# ---------------------------------------------------------------------------

@register(
    "q_range_frame",
    """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vq
  FROM events
),
t AS (
  SELECT user_id,
         CAST(count(*) OVER w AS BIGINT) AS n_win,
         CAST(sum(vq) OVER w AS BIGINT) AS vsum_q
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN 7200000000 PRECEDING AND CURRENT ROW)
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(n_win) AS BIGINT) AS max_n_win,
       CAST(max(vsum_q) AS BIGINT) AS max_vsum_q
FROM t GROUP BY user_id
""",
)
def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user peak trailing-2-hour event count and µ-quantized value
    sum via an EVENT-TIME RANGE window frame (value-based bounds over
    epoch microseconds — the burst/velocity feature of rate limiting
    and abuse scoring).  The one windowed surface every other engine
    window leaves uncovered: a ROWS frame would be wrong whenever
    timestamps tie, a RANGE frame includes all ties so the result is
    order-independent and engine-exact
    (functions/timeseries.py ``trailing_range_stats``)."""
    from .functions.timeseries import trailing_range_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return trailing_range_stats(ev, "user_id", "ts", "value", 7200)


# ---------------------------------------------------------------------------
# q_ppjoin — exact prefix-filtered set-similarity self-join (AllPairs/PPJoin)
# ---------------------------------------------------------------------------

@register(
    "q_ppjoin",
    f"WITH {_CORPUS_SQL.strip()},\n{_SHINGLE_SQL.strip()},\n"
    """
freq AS (SELECT sh AS g, count(*) AS cnt FROM sh GROUP BY sh),
rkt AS (SELECT g, CAST(row_number() OVER (ORDER BY cnt, g) AS BIGINT) AS rk
        FROM freq),
dr AS (SELECT id, list_sort(list(rk)) AS arr, CAST(count(*) AS BIGINT) AS n
       FROM sh JOIN rkt ON rkt.g = sh.sh GROUP BY id),
pre AS (SELECT id, n,
               unnest(list_slice(arr, 1,
                      CAST(n - (n * 4 + 4) // 5 + 1 AS INT))) AS rk
        FROM dr),
cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         FROM pre a JOIN pre b ON a.rk = b.rk AND a.id < b.id
         WHERE 4 * greatest(a.n, b.n) <= 5 * least(a.n, b.n)),
v AS (SELECT c.id_a, c.id_b,
             CAST(len(list_intersect(da.arr, db.arr)) AS BIGINT) AS inter,
             da.n + db.n AS ssum
      FROM cand c JOIN dr da ON da.id = c.id_a
                  JOIN dr db ON db.id = c.id_b)
SELECT id_a, id_b, inter, CAST(ssum - inter AS BIGINT) AS union_sz,
       CAST(inter AS DOUBLE) / CAST(ssum - inter AS DOUBLE) AS jaccard
FROM v WHERE 5 * inter >= 4 * (ssum - inter)
""",
)
def q_ppjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join (shingle Jaccard ≥ 4/5) on the
    clone-planted corpus by prefix filtering (AllPairs/PPJoin): each
    document joins only on its globally RAREST n−⌈t·n⌉+1 shingles, so
    hot shingles never build candidate buckets — the exact-answer
    counterpart of q_minhash_lsh and the asymptotically cheaper twin
    of q_ngram_jaccard's every-shingle inverted index.  Global rarity
    order by the two-phase rank; the threshold is integer
    cross-multiplication (5·inter ≥ 4·union, no FP); the reported
    ratio is one identical double division
    (functions/dedup.py ``prefix_filter_join``)."""
    from .functions.dedup import prefix_filter_join

    return prefix_filter_join(_corpus_df(spark, sf_dir), 4, 5, 3)


# ---------------------------------------------------------------------------
# q_friedman — Friedman rank test of event types over daily blocks
# ---------------------------------------------------------------------------

@register(
    "q_friedman",
    """
WITH e AS (SELECT event_type AS t, date_trunc('day', ts) AS d FROM events),
days AS (SELECT DISTINCT d FROM e),
ty AS (SELECT DISTINCT t FROM e),
cnt AS (SELECT d, t, CAST(count(*) AS BIGINT) AS y FROM e GROUP BY d, t),
grid AS (SELECT days.d, ty.t, coalesce(cnt.y, 0) AS y
         FROM days CROSS JOIN ty
         LEFT JOIN cnt ON cnt.d = days.d AND cnt.t = ty.t),
r AS (SELECT d, t,
             CAST(2 * rank() OVER (PARTITION BY d ORDER BY y)
                  + count(*) OVER (PARTITION BY d, y) - 1 AS BIGINT) AS r2
      FROM grid),
pt AS (SELECT t, CAST(sum(r2) AS BIGINT) AS rsum2 FROM r GROUP BY t),
s AS (SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(rsum2 * rsum2) AS BIGINT) AS s4 FROM pt),
nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM days)
SELECT n AS n_blocks, k AS k_treatments,
       CASE WHEN k <= 1 OR n = 0 THEN NULL
            ELSE 3.0 * (CAST(s4 AS DOUBLE)
                        / CAST(n * k * (k + 1) AS DOUBLE))
                 - CAST(3 * n * (k + 1) AS DOUBLE)
       END AS friedman_q,
       CASE WHEN k <= 1 OR n = 0 THEN NULL
            ELSE (3.0 * (CAST(s4 AS DOUBLE)
                         / CAST(n * k * (k + 1) AS DOUBLE))
                  - CAST(3 * n * (k + 1) AS DOUBLE))
                 / CAST(n * (k - 1) AS DOUBLE)
       END AS kendall_w
FROM s, nb
""",
)
def q_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman's rank test of the k event types over daily volume
    blocks (zero-filled dense day × type grid, each day its own
    control) plus Kendall's W effect size — the repeated-measures
    complement of q_kruskal's independent-groups test.  Doubled
    midranks are exact integers; Σ(ΣR)² is exact int64; both engines
    finish on one identical IEEE chain, shipped unrounded
    (functions/stats.py ``friedman_test``)."""
    from .functions.stats import friedman_test

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select("event_type", F.date_trunc("day", F.col("ts")).alias("d"))
    days = e.select("d").distinct()
    ty = e.select("event_type").distinct()
    cnt = e.groupBy("d", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    grid = (
        days.crossJoin(F.broadcast(ty))
        .join(cnt, ["d", "event_type"], "left")
        .select(
            F.col("d").alias("b"),
            F.col("event_type").alias("t"),
            F.coalesce("y", F.lit(0)).cast("long").alias("y"),
        )
    )
    return friedman_test(grid, "b", "t", "y")


# ---------------------------------------------------------------------------
# q_collocations — Dunning G² log-likelihood bigram collocations
# ---------------------------------------------------------------------------

@register(
    "q_collocations",
    """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
bi AS (SELECT tk[i.range] AS w1, tk[i.range + 1] AS w2
       FROM t, range(1, 1001) i WHERE i.range <= len(tk) - 1),
c AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n11 FROM bi GROUP BY w1, w2),
rw AS (SELECT w1, CAST(sum(n11) AS BIGINT) AS r1 FROM c GROUP BY w1),
cl AS (SELECT w2, CAST(sum(n11) AS BIGINT) AS c1 FROM c GROUP BY w2),
j AS (SELECT c.w1, c.w2, c.n11, rw.r1, cl.c1,
             CAST(sum(c.n11) OVER () AS BIGINT) AS nn
      FROM c JOIN rw ON rw.w1 = c.w1 JOIN cl ON cl.w2 = c.w2),
g AS (
  SELECT w1, w2, n11,
    (CASE WHEN n11 > 0 THEN CAST(floor(CAST(n11 AS DOUBLE)
       * ln(CAST(n11 AS DOUBLE)
            / (CAST(r1 AS DOUBLE) * CAST(c1 AS DOUBLE) / CAST(nn AS DOUBLE)))
       * 1000000000.0 + 0.5) AS BIGINT) ELSE 0 END)
    + (CASE WHEN r1 - n11 > 0 THEN CAST(floor(CAST(r1 - n11 AS DOUBLE)
       * ln(CAST(r1 - n11 AS DOUBLE)
            / (CAST(r1 AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(c1 AS DOUBLE))
               / CAST(nn AS DOUBLE)))
       * 1000000000.0 + 0.5) AS BIGINT) ELSE 0 END)
    + (CASE WHEN c1 - n11 > 0 THEN CAST(floor(CAST(c1 - n11 AS DOUBLE)
       * ln(CAST(c1 - n11 AS DOUBLE)
            / ((CAST(nn AS DOUBLE) - CAST(r1 AS DOUBLE)) * CAST(c1 AS DOUBLE)
               / CAST(nn AS DOUBLE)))
       * 1000000000.0 + 0.5) AS BIGINT) ELSE 0 END)
    + (CASE WHEN nn - r1 - c1 + n11 > 0
       THEN CAST(floor(CAST(nn - r1 - c1 + n11 AS DOUBLE)
       * ln(CAST(nn - r1 - c1 + n11 AS DOUBLE)
            / ((CAST(nn AS DOUBLE) - CAST(r1 AS DOUBLE))
               * (CAST(nn AS DOUBLE) - CAST(c1 AS DOUBLE))
               / CAST(nn AS DOUBLE)))
       * 1000000000.0 + 0.5) AS BIGINT) ELSE 0 END) AS g2q
  FROM j
)
SELECT w1, w2, n11, CAST(g2q AS DOUBLE) * 2.0 / 1000000000.0 AS g2
FROM g ORDER BY g2q DESC, w1, w2 LIMIT 20
""",
)
def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigram collocations by Dunning's log-likelihood ratio G²
    (Dunning 1993) — the tie-robust phrase extractor beside
    q_pmi_bigrams: each adjacent pair's 2×2 contingency scored
    2·Σ O·ln(O/E) with every term 1e-9-quantized on the identical IEEE
    chain and summed as exact int64, so the top-20 order compares
    integers.  Bigrams via posexplode + lead (never nested
    interpreted HOFs); margins are vocab-bounded aggregates with no
    broadcast hint (functions/text.py ``dunning_collocations``).
    Oracle bigram positions share the documented 1000-token cap
    invariant with the shingle oracles."""
    from .functions.text import dunning_collocations

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dunning_collocations(docs, "doc_id", "text", 20)


# ---------------------------------------------------------------------------
# q_patch_shape — per-patch area + perimeter joint distribution (FRAGSTATS)
# ---------------------------------------------------------------------------


def _patch_shape_oracle(quant: float = 1e6) -> str:
    npx = city.NPX

    def q(ix: str, iy: str) -> str:
        expr = city.NDVI_SQL.format(
            px_x=f"{city.X0} + (({ix}) + 0.5) * {city.RES}",
            px_y=f"{city.Y0} + (({iy}) + 0.5) * {city.RES}",
        )
        return f"CAST(round(({expr}) * {quant}) AS BIGINT)"

    def green(ix: str, iy: str) -> str:
        return (
            f"(CASE WHEN ({ix}) BETWEEN 0 AND {npx - 1}"
            f" AND ({iy}) BETWEEN 0 AND {npx - 1}"
            f" AND ({q(ix, iy)}) > 0 THEN 1 ELSE 0 END)"
        )

    x = f"{city.X0} + ((i % {npx}) + 0.5) * {city.RES}"
    y = f"{city.Y0} + ((i // {npx}) + 0.5) * {city.RES}"
    return f"""
WITH g AS (
  SELECT CAST(floor(({x}) / (500.0 * pi())) AS BIGINT) AS u,
         CAST(floor((({y}) + 250.0 * pi()) / (500.0 * pi())) AS BIGINT) AS v,
         4 - {green('i % ' + str(npx) + ' - 1', 'i // ' + str(npx))}
           - {green('i % ' + str(npx) + ' + 1', 'i // ' + str(npx))}
           - {green('i % ' + str(npx), 'i // ' + str(npx) + ' - 1')}
           - {green('i % ' + str(npx), 'i // ' + str(npx) + ' + 1')} AS sides
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
  WHERE ({q('i % ' + str(npx), 'i // ' + str(npx))}) > 0
),
patches AS (SELECT u, v, CAST(count(*) AS BIGINT) AS patch_px,
                   CAST(sum(sides) AS BIGINT) AS perim_px
            FROM g GROUP BY u, v)
SELECT patch_px, perim_px, CAST(count(*) AS BIGINT) AS n_patches,
       CAST(perim_px AS DOUBLE) * 0.25 / sqrt(CAST(patch_px AS DOUBLE))
         AS shape
FROM patches GROUP BY patch_px, perim_px
"""


@register("q_patch_shape", _patch_shape_oracle())
def q_patch_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint per-patch (area, 4-boundary perimeter) distribution of the
    green mask with the FRAGSTATS raster shape index 0.25·P/√A — the
    boundary-complexity metric q_patch_sizes (area only) and
    q_edge_density (global perimeter, unattributed) cannot give: shape
    needs BOTH numbers on the SAME patch.  The engine extends the
    tile-CCL partials with tile-local zero-padded perimeter sums and
    repairs each green↔green tile-border adjacency by −2 through the
    existing n==2 border groups (operators/patches.py
    ``patch_shape_stats``) — still two shuffles, no halo.  The oracle
    keys patches by the fixture's closed-form sign boxes and counts
    exposed sides per pixel; the engine never sees that shortcut."""
    from .operators.patches import patch_shape_histogram

    return patch_shape_histogram(city.tiles_df(spark, "ndvi"), city.grid())


# ---------------------------------------------------------------------------
# q_fleiss — Fleiss' kappa agreement among the three language classifiers
# ---------------------------------------------------------------------------

@register("q_fleiss", None)  # generated oracle attached below
def q_fleiss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' κ agreement among the three in-engine language raters —
    the stopword heuristic (q_lang_id), the trained naive Bayes
    (q_naive_bayes) and the majority-class baseline — on the SAME
    documents: the multi-rater generalisation of q_cohens_kappa that
    answers "do independent classifiers even agree with each other?"
    before any of them is trusted against truth.  Σn² and category
    sums are exact int64; both engines run one identical IEEE chain
    (functions/stats.py ``fleiss_kappa``)."""
    from .functions.stats import fleiss_kappa
    from .functions.text import language_id, naive_bayes_predict

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p1 = language_id(docs).select("doc_id", F.col("pred_lang").alias("r1"))
    p2 = naive_bayes_predict(docs).select(
        "doc_id", F.col("pred_lang").alias("r2")
    )
    base = (
        docs.groupBy("lang")
        .count()
        .orderBy(F.desc("count"), F.asc("lang"))
        .limit(1)
        .select(F.col("lang").alias("r3"))
    )
    j = p1.join(p2, "doc_id").crossJoin(F.broadcast(base))
    return fleiss_kappa(j, "doc_id", ["r1", "r2", "r3"])


ORACLES["q_fleiss"] = f"""
WITH l AS ({_langid_sql()}),
nbp AS (SELECT doc_id, pred_lang FROM ({_NB_PRED_SQL})),
base AS (SELECT lang AS bl FROM documents
         GROUP BY lang ORDER BY count(*) DESC, lang LIMIT 1),
st AS (SELECT l.doc_id AS i, l.pred_lang AS cat FROM l
       UNION ALL SELECT doc_id, pred_lang FROM nbp
       UNION ALL SELECT d.doc_id, b.bl FROM documents d CROSS JOIN base b),
nij AS (SELECT i, cat, CAST(count(*) AS BIGINT) AS n FROM st GROUP BY i, cat),
s2 AS (SELECT CAST(sum(n * n) AS BIGINT) AS s2,
              CAST(count(DISTINCT i) AS BIGINT) AS n_items FROM nij),
c2 AS (SELECT CAST(sum(cj * cj) AS BIGINT) AS c2
       FROM (SELECT CAST(sum(n) AS BIGINT) AS cj FROM nij GROUP BY cat)),
f AS (SELECT n_items,
             CAST(s2 - n_items * 3 AS DOUBLE)
               / CAST(n_items * 3 * 2 AS DOUBLE) AS p_bar,
             CAST(c2 AS DOUBLE)
               / (CAST(n_items * 3 AS DOUBLE) * CAST(n_items * 3 AS DOUBLE))
               AS p_e
      FROM s2, c2)
SELECT n_items, CAST(3 AS BIGINT) AS n_raters, p_bar, p_e,
       CASE WHEN p_e = 1.0 THEN NULL
            ELSE (p_bar - p_e) / (1.0 - p_e) END AS fleiss_kappa
FROM f
"""


# ---------------------------------------------------------------------------
# q_assoc_rules — pairwise association rules over document attributes
# ---------------------------------------------------------------------------

@register(
    "q_assoc_rules",
    """
WITH it AS (
  SELECT doc_id AS i, unnest(['lang=' || lang, 'src=' || source,
                              'len=' || CAST(n_chars // 200 AS VARCHAR)])
           AS x
  FROM documents
),
pairs AS (
  SELECT a.x AS item_a, b.x AS item_b, CAST(count(*) AS BIGINT) AS n_ab
  FROM it a JOIN it b ON a.i = b.i AND a.x < b.x
  GROUP BY a.x, b.x HAVING count(*) >= 2
),
freq AS (SELECT x, CAST(count(*) AS BIGINT) AS nx FROM it GROUP BY x),
nn AS (SELECT CAST(count(DISTINCT i) AS BIGINT) AS n FROM it)
SELECT p.item_a, p.item_b, p.n_ab, fa.nx AS n_a, fb.nx AS n_b,
       CAST(p.n_ab AS DOUBLE) / CAST(nn.n AS DOUBLE) AS support,
       CAST(p.n_ab AS DOUBLE) / CAST(fa.nx AS DOUBLE) AS conf_ab,
       CAST(p.n_ab AS DOUBLE) / CAST(fb.nx AS DOUBLE) AS conf_ba,
       CAST(p.n_ab AS DOUBLE) * CAST(nn.n AS DOUBLE)
         / (CAST(fa.nx AS DOUBLE) * CAST(fb.nx AS DOUBLE)) AS lift
FROM pairs p
JOIN freq fa ON fa.x = p.item_a
JOIN freq fb ON fb.x = p.item_b, nn
""",
)
def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise association rules (support / confidence both ways /
    lift) over per-document attribute items {lang, source, length
    bucket} — the market-basket audit ("which corpus attributes travel
    together?") a mixture planner runs before reweighting; lift > 1
    exposes e.g. a source that over-ships one language.  Item sets are
    3 per document so the pair explode is map-side; counts exact
    int64, each ratio one identical double chain
    (functions/rules.py ``association_rules``)."""
    from .functions.rules import association_rules

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    items = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(
            F.array(
                F.concat(F.lit("lang="), F.col("lang")),
                F.concat(F.lit("src="), F.col("source")),
                F.concat(F.lit("len="),
                         F.expr("CAST(n_chars DIV 200 AS STRING)")),
            )
        ).alias("item"),
    )
    return association_rules(items, "id", "item", 2)


# ---------------------------------------------------------------------------
# q_haar_energy — level-1 Haar wavelet detail energies per tile
# ---------------------------------------------------------------------------


def _haar_oracle(quant: float = 1e6) -> str:
    npx, tile_px = city.NPX, city.TILE_PX
    q = (
        "CAST(round(("
        + city.NDVI_SQL.format(
            px_x=f"{city.X0} + (ix + 0.5) * {city.RES}",
            px_y=f"{city.Y0} + (iy + 0.5) * {city.RES}",
        )
        + f") * {quant}) AS BIGINT)"
    )
    return f"""
WITH px AS (
  SELECT i % {npx} AS ix, i // {npx} AS iy
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
),
qv AS (SELECT ix, iy, {q} AS q FROM px),
blk AS (
  SELECT ix // 2 AS bx, iy // 2 AS by,
         CAST(sum(q * (CASE WHEN ix % 2 = 0 THEN 1 ELSE -1 END))
              AS BIGINT) AS hc,
         CAST(sum(q * (CASE WHEN iy % 2 = 0 THEN 1 ELSE -1 END))
              AS BIGINT) AS vc,
         CAST(sum(q * (CASE WHEN ix % 2 = iy % 2 THEN 1 ELSE -1 END))
              AS BIGINT) AS dc
  FROM qv GROUP BY 1, 2
)
SELECT (bx * 2) // {tile_px} AS tx, (by * 2) // {tile_px} AS ty,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(hc * hc) AS BIGINT) AS e_h,
       CAST(sum(vc * vc) AS BIGINT) AS e_v,
       CAST(sum(dc * dc) AS BIGINT) AS e_d
FROM blk GROUP BY 1, 2
"""


@register("q_haar_energy", _haar_oracle())
def q_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-1 Haar wavelet detail energies (H/V/D bands) per raster
    tile — the texture/compressibility audit beside q_raster_pyramid's
    mass conservation: how much signal a 2× downsample would discard,
    and in which direction it is oriented.  Un-normalized integer Haar
    coefficients over 2×2 blocks of the shared round-half-away
    quantization, energies as exact int64 Σcoeff² — zero shuffles, no
    halo (blocks never straddle the even-dimension tiles)
    (operators/focal.py ``haar_energy_tile_stats``).  The oracle
    enumerates pixels and assembles coefficients by parity signs."""
    from .operators.focal import haar_energy_tile_stats

    return haar_energy_tile_stats(city.tiles_df(spark, "ndvi"), city.grid())


# ---------------------------------------------------------------------------
# q_betweenness — exact Brandes betweenness of the host graph
# ---------------------------------------------------------------------------

_BETW_ROUNDS = 8  # measured host-graph diameter ≤ 5 at every SF; margin
                  # (over-unrolling is idempotent once levels go empty)


def _betweenness_oracle() -> str:
    from .functions.graph import betweenness_oracle_tail

    return (
        "WITH "
        + _LINK_GRAPH_CTE
        + """,
e0 AS MATERIALIZED (
  SELECT DISTINCT least(src_host, dst_host) AS a,
                  greatest(src_host, dst_host) AS b
  FROM r WHERE src_host <> dst_host
),
"""
        + betweenness_oracle_tail("e0", rounds=_BETW_ROUNDS)
    )


@register("q_betweenness", None)  # generated oracle attached below
def q_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shortest-path betweenness centrality of the undirected
    host graph by a distributed all-sources Brandes sweep — the
    broker/bridge metric that completes the centrality family
    (q_pagerank flow, q_harmonic closeness, q_hits authority):
    level-synchronous BFS over a (source, node) frontier with exact
    int64 path counts, then the dependency fold back down the
    shortest-path DAG, every (σ_v/σ_w)(1+δ_w) term 1e-9-quantized on
    one fixed IEEE chain BEFORE its sum so the result is
    summation-order free (functions/graph.py
    ``betweenness_centrality``).  The oracle unrolls the SAME rounds
    as MATERIALIZED CTEs past the measured diameter."""
    from .functions.graph import betweenness_centrality
    from .functions.links import host_link_graph

    edges = host_link_graph(_link_pages_df(spark, sf_dir))
    return betweenness_centrality(
        edges, src_col="src_host", dst_col="dst_host",
        max_depth=_BETW_ROUNDS,
    )


ORACLES["q_betweenness"] = _betweenness_oracle()


# ---------------------------------------------------------------------------
# q_golden_record — survivorship over near-duplicate groups
# ---------------------------------------------------------------------------

@register(
    "q_golden_record",
    f"WITH RECURSIVE {_CORPUS_SQL.strip()},\n"
    f"gr AS ({_NEAR_DUP_GROUPS_SQL}),\n"
    """
gj AS (SELECT g.rep_id, g.doc_id, CAST(length(c.text) AS BIGINT) AS len
       FROM gr g JOIN corpus c ON c.doc_id = g.doc_id),
k AS (SELECT rep_id, doc_id AS keep_id, len AS keep_len,
             row_number() OVER (PARTITION BY rep_id
                                ORDER BY len DESC, doc_id ASC) AS rn
      FROM gj),
s AS (SELECT rep_id, CAST(count(*) AS BIGINT) AS n_members,
             CAST(sum(len) AS BIGINT) AS total_len
      FROM gj GROUP BY rep_id)
SELECT s.rep_id, s.n_members, k.keep_id,
       CAST(k.keep_len AS BIGINT) AS keep_len, s.total_len
FROM s JOIN k ON k.rep_id = s.rep_id AND k.rn = 1
""",
)
def q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship over the near-duplicate groups: per
    cluster the surviving document under the longest-text rule (ties
    by smallest id) plus merged member statistics — the
    entity-resolution step after q_near_dup_groups that decides which
    copy the curated corpus keeps.  Exact integer keep rule and
    outputs (functions/dedup.py ``golden_records``); the oracle
    re-resolves the groups through the recursive transitive closure
    and applies the same window rule."""
    from .functions.dedup import golden_records, near_dup_groups

    corpus = _corpus_df(spark, sf_dir)
    groups = near_dup_groups(corpus, threshold=0.6)
    return golden_records(groups, corpus)


# ---------------------------------------------------------------------------
# q_focal_entropy — 3×3 focal Shannon entropy of the NDVI class raster
# ---------------------------------------------------------------------------


def _focal_entropy_oracle(quant: float = 1e6, bins: int = 5) -> str:
    npx, tile_px = city.NPX, city.TILE_PX
    q = (
        "CAST(round(("
        + city.NDVI_SQL.format(
            px_x=f"{city.X0} + ((i % {npx}) + 0.5) * {city.RES}",
            px_y=f"{city.Y0} + ((i // {npx}) + 0.5) * {city.RES}",
        )
        + f") * {quant}) AS BIGINT)"
    )
    offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    joins = "\n".join(
        f"  JOIN pc p{j} ON p{j}.i = c.i + ({dy * npx + dx})"
        for j, (dy, dx) in enumerate(offs)
    )
    ksel = ", ".join(f"p{j}.cls AS k{j}" for j in range(9))
    cnt = " + ".join
    terms = []
    for k in range(bins):
        ck = cnt(f"(CASE WHEN k{j} = {k} THEN 1 ELSE 0 END)"
                 for j in range(9))
        terms.append(
            f"(CASE WHEN ({ck}) > 0 THEN CAST(floor("
            f"-(CAST(({ck}) AS DOUBLE) / 9.0)"
            f" * ln(CAST(({ck}) AS DOUBLE) / 9.0)"
            f" * 1000000000.0 + 0.5) AS BIGINT) ELSE 0 END)"
        )
    ent = "\n       + ".join(terms)
    return f"""
WITH pc AS MATERIALIZED (
  SELECT i, least(greatest((({q}) + 1000000) * {bins} // 2000000, 0),
                  {bins - 1}) AS cls
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
),
w AS (
  SELECT c.i, {ksel}
  FROM pc c
{joins}
  WHERE c.i % {npx} BETWEEN 1 AND {npx - 2}
    AND c.i // {npx} BETWEEN 1 AND {npx - 2}
),
e AS (
  SELECT (i % {npx}) // {tile_px} AS tx, (i // {npx}) // {tile_px} AS ty,
         {ent} AS ent_q
  FROM w
)
SELECT tx, ty, CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(ent_q) AS BIGINT) AS ent_q_sum,
       round(CAST(sum(ent_q) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             / 1000000000.0 + 0.0, 6) AS mean_entropy
FROM e GROUP BY tx, ty
"""


@register("q_focal_entropy", _focal_entropy_oracle())
def q_focal_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3×3 focal Shannon entropy of the 5-class NDVI value raster per
    tile — the local-heterogeneity texture metric (GRASS r.neighbors
    entropy) beside the focal mean (smoothness) and Haar energies
    (orientation): interior windows only, each −(c/9)·ln(c/9) term
    1e-9-quantized on the shared libm expression and summed exact
    int64 over the SAME halo exchange as q_focal_mean
    (operators/focal.py ``focal_entropy_tile_stats``).  The oracle
    rebuilds every window with nine positional self-joins of the
    closed-form class raster."""
    from .operators.focal import focal_entropy_tile_stats

    return focal_entropy_tile_stats(
        city.tiles_df(spark, "ndvi"), city.grid()
    )


# ---------------------------------------------------------------------------
# q_burrows_delta — stylometric distance between crawl sources
# ---------------------------------------------------------------------------

@register(
    "q_burrows_delta",
    f"""
WITH toks AS (SELECT source AS src, unnest(string_split(text, ' ')) AS w
              FROM documents),
tot AS (SELECT src, CAST(count(*) AS BIGINT) AS t FROM toks GROUP BY src),
mk AS (SELECT unnest(['the','a','of','to','and','in','for','on','with',
                      'at','by','from']) AS w),
cnts AS (SELECT src, w, CAST(count(*) AS BIGINT) AS c
         FROM toks WHERE w IN {_STOP_SQL} GROUP BY src, w),
grid AS (
  SELECT tot.src, mk.w,
         CAST(floor(CAST(COALESCE(cnts.c, 0) AS DOUBLE)
              / CAST(tot.t AS DOUBLE) * 100000000.0 + 0.5) AS BIGINT) AS fq
  FROM tot CROSS JOIN mk
  LEFT JOIN cnts ON cnts.src = tot.src AND cnts.w = mk.w
),
z AS (SELECT src, w, fq,
             CAST(count(*) OVER (PARTITION BY w) AS BIGINT) AS n,
             CAST(sum(fq) OVER (PARTITION BY w) AS BIGINT) AS s,
             CAST(sum(fq * fq) OVER (PARTITION BY w) AS BIGINT) AS qq
      FROM grid),
zq AS (SELECT src, w,
              CAST(floor((CASE WHEN n * qq - s * s <= 0 THEN 0.0
                    ELSE CAST(n * fq - s AS DOUBLE)
                         / sqrt(CAST(n * qq - s * s AS DOUBLE)) END)
                   * 1000000.0 + 0.5) AS BIGINT) AS zq
       FROM z)
SELECT a.src AS src_a, b.src AS src_b,
       CAST(sum(abs(a.zq - b.zq)) AS DOUBLE) / (12 * 1000000.0) AS delta
FROM zq a JOIN zq b ON a.w = b.w AND a.src < b.src
GROUP BY a.src, b.src
""",
)
def q_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta stylometric distance between every pair of crawl
    sources — mean |z| difference of function-word rates z-scored
    against the cross-source population (Burrows 2002), the
    authorship/provenance attribution standard ("do two sources share
    a house style?") beside q_js_divergence's topical distance.
    Rates 1e-8-quantized to exact int64, z one fixed int-ratio/sqrt
    chain 1e-6-quantized, Delta an exact |Δz| integer sum with one
    final division (functions/text.py ``burrows_delta``)."""
    from .functions.text import burrows_delta

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return burrows_delta(docs, "source", "text")


# ---------------------------------------------------------------------------
# q_rich_club — rich-club coefficient curve of the host graph
# ---------------------------------------------------------------------------

@register("q_rich_club", None)  # generated oracle attached below
def q_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient curve φ(k) of the undirected host graph —
    the density of the subgraph induced by hubs of degree > k, for
    every observed threshold: "do the hubs wire to each other?", the
    elite-interconnection diagnostic that q_degree_assortativity
    collapses to one number.  Exact int64 suffix sums over the degree
    and min-endpoint-degree histograms (never a per-k subgraph scan),
    one division per row (functions/graph.py ``rich_club``)."""
    from .functions.graph import rich_club
    from .functions.links import host_link_graph

    edges = host_link_graph(_link_pages_df(spark, sf_dir))
    return rich_club(edges, src_col="src_host", dst_col="dst_host")


ORACLES["q_rich_club"] = (
    "WITH "
    + _LINK_GRAPH_CTE
    + """,
e0 AS (SELECT DISTINCT least(src_host, dst_host) AS a,
                       greatest(src_host, dst_host) AS b
       FROM r WHERE src_host <> dst_host),
deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0)
        GROUP BY n),
ks AS (SELECT DISTINCT d AS k FROM deg
       UNION SELECT CAST(0 AS BIGINT)),
dh AS (SELECT d, CAST(count(*) AS BIGINT) AS nd FROM deg GROUP BY d),
em AS (SELECT least(da.d, db.d) AS m, CAST(count(*) AS BIGINT) AS ne
       FROM e0 JOIN deg da ON da.n = e0.a JOIN deg db ON db.n = e0.b
       GROUP BY least(da.d, db.d)),
ng AS (SELECT k, CAST(sum(nd) AS BIGINT) AS n_nodes
       FROM ks JOIN dh ON dh.d > ks.k GROUP BY k),
eg AS (SELECT k, CAST(sum(ne) AS BIGINT) AS n_edges
       FROM ks JOIN em ON em.m > ks.k GROUP BY k)
SELECT ng.k, ng.n_nodes, CAST(COALESCE(eg.n_edges, 0) AS BIGINT) AS n_edges,
       CAST(2 * COALESCE(eg.n_edges, 0) AS DOUBLE)
         / CAST(ng.n_nodes * (ng.n_nodes - 1) AS DOUBLE) AS phi
FROM ng LEFT JOIN eg ON eg.k = ng.k
WHERE ng.n_nodes >= 2
"""
)


# ---------------------------------------------------------------------------
# q_ccf — lead-lag cross-correlation of two event-type volume series
# ---------------------------------------------------------------------------

_CCF_MAX_LAG = 7


@register(
    "q_ccf",
    f"""
WITH e AS (SELECT event_type AS ty, date_trunc('day', ts) AS d
           FROM events WHERE event_type IN ('view', 'click')),
d0 AS (SELECT min(d) AS dmin,
              CAST(date_diff('day', min(d), max(d)) AS BIGINT) AS tmax
       FROM e),
cnt AS (SELECT ty, d, CAST(count(*) AS BIGINT) AS y FROM e GROUP BY ty, d),
cal AS (SELECT dmin, unnest(generate_series(0, tmax)) AS t FROM d0),
sa AS (SELECT cal.t, CAST(COALESCE(c.y, 0) AS BIGINT) AS a
       FROM cal LEFT JOIN cnt c
         ON c.ty = 'view' AND date_diff('day', cal.dmin, c.d) = cal.t),
sb AS (SELECT cal.t, CAST(COALESCE(c.y, 0) AS BIGINT) AS b
       FROM cal LEFT JOIN cnt c
         ON c.ty = 'click' AND date_diff('day', cal.dmin, c.d) = cal.t),
st AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(a) AS BIGINT) AS suma,
              CAST(sum(a * a) AS BIGINT) AS sqa FROM sa),
sbt AS (SELECT CAST(sum(b) AS BIGINT) AS sumb,
               CAST(sum(b * b) AS BIGINT) AS sqb FROM sb),
lags AS (SELECT CAST(unnest(generate_series(-{_CCF_MAX_LAG},
                                            {_CCF_MAX_LAG})) AS BIGINT)
           AS lag),
ov AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_overlap,
              CAST(sum(a * b) AS BIGINT) AS sab,
              CAST(sum(a) AS BIGINT) AS soa,
              CAST(sum(b) AS BIGINT) AS sob
       FROM lags, sa JOIN sb ON sb.t = sa.t + lag
       GROUP BY lag)
SELECT lag, n_overlap,
       CASE WHEN n * sqa - suma * suma <= 0
              OR n * sqb - sumb * sumb <= 0 THEN NULL
            ELSE CAST(n * n * sab - n * suma * sob - n * sumb * soa
                      + n_overlap * suma * sumb AS DOUBLE)
                 / (CAST(n AS DOUBLE)
                    * sqrt(CAST(n * sqa - suma * suma AS DOUBLE))
                    * sqrt(CAST(n * sqb - sumb * sumb AS DOUBLE)))
       END AS ccf
FROM ov, st, sbt
""",
)
def q_ccf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation r(ℓ), ℓ ∈ [−7, 7], between the view
    and click daily-volume series (full-series means/stds, dense
    zero-filled shared calendar) — "does one stream lead the other,
    and by how many days?", the causal-direction screen
    q_acf_volume's single series cannot answer.  The numerator is
    cleared to ONE exact int64; the denominator is one fixed IEEE
    sqrt chain (functions/timeseries.py ``cross_correlation``)."""
    from .functions.timeseries import cross_correlation

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return cross_correlation(ev, "view", "click", _CCF_MAX_LAG)


# ---------------------------------------------------------------------------
# q_neyman — Neyman-optimal stratified sampling allocation per source
# ---------------------------------------------------------------------------

_NEYMAN_B = 10_000


@register(
    "q_neyman",
    f"""
WITH s AS (
  SELECT source AS k, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(n_chars) AS BIGINT) AS sx,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
  FROM documents GROUP BY source
),
w AS (
  SELECT k, n,
         CAST(floor(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
              * 1000.0 + 0.5) AS BIGINT) AS wq
  FROM s
),
t AS (
  SELECT k, n, wq,
         CAST(sum(wq) OVER () AS BIGINT) AS tot
  FROM w
),
u AS (
  SELECT k, n, wq,
         (CAST({_NEYMAN_B} AS BIGINT) * wq) // tot AS base,
         (CAST({_NEYMAN_B} AS BIGINT) * wq) % tot AS rem
  FROM t
),
v AS (
  SELECT k, n, wq, base,
         CAST({_NEYMAN_B} AS BIGINT) - sum(base) OVER () AS lft,
         row_number() OVER (ORDER BY rem DESC, k ASC) AS rk
  FROM u
)
SELECT k AS source, n, wq,
       CAST(base + (CASE WHEN rk <= lft THEN 1 ELSE 0 END) AS BIGINT)
         AS quota
FROM v
""",
)
def q_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation over sources:
    stratum budget ∝ N_h·σ_h(n_chars) — the minimum-variance survey
    design that upgrades q_budget_allocation's proportional split when
    strata differ in spread.  N_h·σ_h = √(nΣx²−S²) exact under one
    IEEE sqrt, ×1000-quantized to integer weights, then the exact
    integer Hamilton largest-remainder rule (ties by key) — the quota
    column sums to the budget exactly
    (functions/sampling.py ``neyman_allocation``)."""
    from .functions.sampling import neyman_allocation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return neyman_allocation(docs, "source", "n_chars", _NEYMAN_B)


# ---------------------------------------------------------------------------
# q_capture_recapture — Lincoln–Petersen/Chapman corpus-size estimate
# ---------------------------------------------------------------------------

@register(
    "q_capture_recapture",
    """
WITH t AS (
  SELECT
    CASE WHEN CAST(CAST('0x' || substr(md5('cap1|' || CAST(doc_id AS VARCHAR)), 1, 15)
              AS UBIGINT) AS BIGINT) % 100 < 40 THEN 1 ELSE 0 END AS c1,
    CASE WHEN CAST(CAST('0x' || substr(md5('cap2|' || CAST(doc_id AS VARCHAR)), 1, 15)
              AS UBIGINT) AS BIGINT) % 100 < 30 THEN 1 ELSE 0 END AS c2
  FROM documents
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS true_n,
         CAST(sum(c1) AS BIGINT) AS n1,
         CAST(sum(c2) AS BIGINT) AS n2,
         CAST(sum(c1 * c2) AS BIGINT) AS m_both
  FROM t
)
SELECT n1, n2, m_both,
       CAST((n1 + 1) * (n2 + 1) AS DOUBLE) / CAST(m_both + 1 AS DOUBLE)
         - 1.0 AS n_hat,
       true_n
FROM s
""",
)
def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lincoln–Petersen (Chapman) capture-recapture estimate of corpus
    size from two independent deterministic md5 captures (40% / 30%)
    — how crawl-coverage estimation infers the unseen-web size from
    two snapshots' overlap; the true size rides along so the gate also
    witnesses the estimator's accuracy at every SF.  Exact integer
    capture counts, one double division
    (functions/sampling.py ``capture_recapture``)."""
    from .functions.sampling import capture_recapture

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return capture_recapture(docs, "doc_id", 40, 30)


# ---------------------------------------------------------------------------
# q_yules_k — Yule's characteristic K vocabulary-richness per source
# ---------------------------------------------------------------------------

@register(
    "q_yules_k",
    """
WITH toks AS (SELECT source AS src, unnest(string_split(text, ' ')) AS w
              FROM documents),
tf AS (SELECT src, w, CAST(count(*) AS BIGINT) AS tf
       FROM toks GROUP BY src, w),
s AS (SELECT src, CAST(sum(tf) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(tf * tf) AS BIGINT) AS s2
      FROM tf GROUP BY src)
SELECT src, n AS n_tokens, n_types,
       CAST(s2 - n AS DOUBLE) * 10000.0
         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS yules_k
FROM s
""",
)
def q_yules_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's characteristic K per source — the length-robust
    repetitiveness constant 10⁴·(Σtf²−N)/N² over the token frequency
    spectrum, beside q_lexical_diversity (bigram rate) and
    q_heaps_law (growth exponent): boilerplate-heavy sources score
    high regardless of volume.  Σtf² exact int64, one fixed IEEE
    chain (functions/text.py ``yules_k``)."""
    from .functions.text import yules_k

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return yules_k(docs, "source", "text")


# ---------------------------------------------------------------------------
# q_powerlaw_alpha — degree-distribution power-law exponent (host graph)
# ---------------------------------------------------------------------------

@register("q_powerlaw_alpha", None)  # generated oracle attached below
def q_powerlaw_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-MLE power-law exponent α = 1 + n/Σln(d) (d_min = 1,
    Clauset-Shalizi-Newman eq. 3.1) of the host-graph degree
    distribution — the scale-free-ness single number that frames the
    rich-club curve and degree assortativity.  Each ln(d)
    1e-9-quantized before the order-free integer sum
    (functions/graph.py ``powerlaw_alpha``)."""
    from .functions.graph import powerlaw_alpha
    from .functions.links import host_link_graph

    edges = host_link_graph(_link_pages_df(spark, sf_dir))
    return powerlaw_alpha(edges, src_col="src_host", dst_col="dst_host")


ORACLES["q_powerlaw_alpha"] = (
    "WITH "
    + _LINK_GRAPH_CTE
    + """,
e0 AS (SELECT DISTINCT least(src_host, dst_host) AS a,
                       greatest(src_host, dst_host) AS b
       FROM r WHERE src_host <> dst_host),
deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0)
        GROUP BY n),
s AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(CAST(floor(ln(CAST(d AS DOUBLE)) * 1000000000.0
                                 + 0.5) AS BIGINT)) AS BIGINT) AS sum_lnq
      FROM deg)
SELECT n_nodes, sum_lnq,
       CASE WHEN sum_lnq <= 0 THEN NULL
            ELSE 1.0 + CAST(n_nodes AS DOUBLE)
                 / (CAST(sum_lnq AS DOUBLE) / 1000000000.0)
       END AS alpha
FROM s
"""
)


# ---------------------------------------------------------------------------
# q_pysource_scan — Spark-4 Python DataSource raster scan
# ---------------------------------------------------------------------------


def _pysource_oracle(quant: float = 1e6) -> str:
    npx, tile_px = city.NPX, city.TILE_PX
    q = (
        "CAST(round(("
        + city.NDVI_SQL.format(
            px_x=f"{city.X0} + ((i % {npx}) + 0.5) * {city.RES}",
            px_y=f"{city.Y0} + ((i // {npx}) + 0.5) * {city.RES}",
        )
        + f") * {quant}) AS BIGINT)"
    )
    return f"""
WITH px AS (
  SELECT (i % {npx}) // {tile_px} AS tx, (i // {npx}) // {tile_px} AS ty,
         {q} AS q
  FROM (SELECT unnest(generate_series(0, {npx * npx - 1})) AS i)
)
SELECT tx, ty, CAST(count(*) AS BIGINT) AS n_px,
       CAST(sum(q) AS BIGINT) AS vsum_q,
       CAST(min(q) AS BIGINT) AS vmin_q,
       CAST(max(q) AS BIGINT) AS vmax_q
FROM px GROUP BY tx, ty
"""


@register("q_pysource_scan", _pysource_oracle())
def q_pysource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster scan through a CUSTOM PYTHON DATASOURCE (the Spark-4
    DataSource API, SPARK-44076): the synthetic sin·cos raster exposed
    as spark.read.format("sincos_tiles") with one InputPartition per
    tile and Arrow RecordBatch emission — the first-class source
    surface the mapInPandas ingest job becomes when promoted into
    Spark's scan machinery (scheduling, AQE, and partition parallelism
    all apply).  Every grid constant travels as a reader option
    (sources/pysource.py is fixture-free); per-tile exact quantized
    sums/extrema are hash-checked against the closed-form pixel
    enumeration, proving the DataSource path is bit-identical to the
    mapInPandas ingest (smoke-proven equal in test_sources)."""
    from .sources.pysource import SinCosTileSource

    spark.dataSource.register(SinCosTileSource)
    tiles = (
        spark.read.format("sincos_tiles")
        .options(
            x0=str(city.X0), y0=str(city.Y0), res=str(city.RES),
            tile_px=str(city.TILE_PX), npx=str(city.NPX),
            x_scale="500", y_scale="500",
        )
        .load()
    )
    v = tiles.select(
        "tx", "ty",
        F.explode("px").alias("v"),
    ).select(
        F.col("tx").cast("long").alias("tx"),
        F.col("ty").cast("long").alias("ty"),
        F.round(F.col("v") * 1000000.0).cast("long").alias("q"),
    )
    return v.groupBy("tx", "ty").agg(
        F.count(F.lit(1)).cast("long").alias("n_px"),
        F.sum("q").cast("long").alias("vsum_q"),
        F.min("q").cast("long").alias("vmin_q"),
        F.max("q").cast("long").alias("vmax_q"),
    )


# ---------------------------------------------------------------------------
# q_kulldorff — spatial scan statistic: top hotspot windows
# ---------------------------------------------------------------------------

@register(
    "q_kulldorff",
    _CTE + f""",
{_COUNT_CELLS_SQL.strip()},
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS nn FROM c),
offs AS (
  SELECT r.r, dx.dx, dy.dy
  FROM (SELECT unnest([1, 2, 3]) AS r) r,
       (SELECT unnest(generate_series(-3, 3)) AS dx) dx,
       (SELECT unnest(generate_series(-3, 3)) AS dy) dy
  WHERE abs(dx.dx) <= r.r AND abs(dy.dy) <= r.r
),
sh AS (
  SELECT c.gx + o.dx AS cgx, c.gy + o.dy AS cgy, o.r,
         CAST(sum(c.cnt) AS BIGINT) AS n_in
  FROM c, offs o GROUP BY 1, 2, 3
),
win AS (
  SELECT sh.cgx AS gx, sh.cgy AS gy, sh.r, sh.n_in,
         CAST((least(sh.cgx + sh.r, 99) - greatest(sh.cgx - sh.r, 0) + 1)
              * (least(sh.cgy + sh.r, 99) - greatest(sh.cgy - sh.r, 0) + 1)
              AS BIGINT) AS a_cells,
         tot.nn
  FROM sh JOIN c ON c.gx = sh.cgx AND c.gy = sh.cgy, tot
),
sc AS (
  SELECT gx, gy, r, n_in, a_cells,
         CAST(floor((CASE
           WHEN CAST(n_in AS DOUBLE) <=
                CAST(nn AS DOUBLE) * CAST(a_cells AS DOUBLE) / 10000.0
           THEN 0.0
           ELSE CAST(n_in AS DOUBLE)
                * ln(CAST(n_in AS DOUBLE)
                     / (CAST(nn AS DOUBLE) * CAST(a_cells AS DOUBLE)
                        / 10000.0))
                + (CASE WHEN CAST(nn - n_in AS DOUBLE) = 0.0 THEN 0.0
                   ELSE CAST(nn - n_in AS DOUBLE)
                        * ln(CAST(nn - n_in AS DOUBLE)
                             / (CAST(nn AS DOUBLE)
                                - CAST(nn AS DOUBLE)
                                  * CAST(a_cells AS DOUBLE) / 10000.0))
                   END)
           END) * 1000000.0 + 0.5) AS BIGINT) AS llr_q
  FROM win
)
SELECT gx, gy, r, n_in, a_cells,
       CAST(llr_q AS DOUBLE) / 1000000.0 AS llr
FROM sc ORDER BY llr_q DESC, r ASC, gx ASC, gy ASC LIMIT 10
""",
)
def q_kulldorff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kulldorff spatial scan statistic over the geocoded corpus: the
    top-10 square hotspot windows (half-widths 1–3 cells, occupied
    centres) by Poisson log-likelihood ratio against the area-CSR
    null — the detection statistic that LOCALIZES what q_getis_ord
    scores per cell and q_quadrat_csr tests globally (the urban core
    dominates by construction).  Window counts/areas exact int64; the
    LLR is one fixed IEEE chain 1e-6-quantized BEFORE the integer
    top-10 ranking (operators/spatial_stats.py ``kulldorff_scan``)."""
    from .operators.spatial_stats import kulldorff_scan

    return kulldorff_scan(
        _count_cells_df(spark, sf_dir), n_gx=100, n_gy=100,
        radii=(1, 2, 3), top_n=10,
    )


# ---------------------------------------------------------------------------
# q_mrr — mean-reciprocal-rank of the true NN inside the IVF ANN list
# ---------------------------------------------------------------------------

@register(
    "q_mrr",
    f"""
WITH approx AS ({_IVF_ANN_SQL}),
exact AS ({_COSINE_TOPK_SQL})
SELECT e.q_id, e.n_id AS true_nn,
       CAST(COALESCE(a.rank, 0) AS BIGINT) AS found_rank,
       CASE WHEN a.rank IS NULL THEN 0.0
            ELSE 1.0 / CAST(a.rank AS DOUBLE) END AS rr
FROM exact e
LEFT JOIN approx a ON a.q_id = e.q_id AND a.n_id = e.n_id
WHERE e.rank = 1
""",
)
def q_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank of each query's TRUE nearest neighbour (exact
    top-1) inside the IVF ANN's returned list — the position-sensitive
    serving metric beside q_ann_recall's set overlap: recall@10 can
    hide a true-NN buried at rank 10, MRR cannot.  Composed verbatim
    from the two gate-verified searches; rr is one exact integer
    reciprocal (missing → 0)."""
    from .functions.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    exact1 = cosine_topk(q, emb, k=10).filter(F.col("rank") == 1)
    appr = ivf_topk(q, emb, k=10, nprobe=4).select(
        "q_id", F.col("n_id").alias("a_nid"), F.col("rank").alias("a_rank")
    )
    j = exact1.join(
        appr,
        (exact1["q_id"] == appr["q_id"])
        & (exact1["n_id"] == appr["a_nid"]),
        "left",
    )
    return j.select(
        exact1["q_id"].alias("q_id"),
        exact1["n_id"].alias("true_nn"),
        F.coalesce("a_rank", F.lit(0)).cast("long").alias("found_rank"),
        F.when(F.col("a_rank").isNull(), F.lit(0.0))
        .otherwise(F.lit(1.0) / F.col("a_rank").cast("double")).alias("rr"),
    )


# ---------------------------------------------------------------------------
# q_edge_betweenness — Girvan–Newman edge betweenness of the host graph
# ---------------------------------------------------------------------------


def _edge_betweenness_oracle() -> str:
    from .functions.graph import edge_betweenness_oracle_tail

    return (
        "WITH "
        + _LINK_GRAPH_CTE
        + """,
e0 AS MATERIALIZED (
  SELECT DISTINCT least(src_host, dst_host) AS a,
                  greatest(src_host, dst_host) AS b
  FROM r WHERE src_host <> dst_host
),
"""
        + edge_betweenness_oracle_tail("e0", rounds=_BETW_ROUNDS)
    )


@register("q_edge_betweenness", None)  # generated oracle attached below
def q_edge_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact EDGE betweenness of the undirected host graph — the
    Girvan–Newman community-splitting criterion that completes the
    Brandes family beside q_betweenness's node scores: the same
    distributed all-sources sweep, with each dependency term credited
    to the shortest-path-DAG edge it flows through; bridges between
    host communities carry the crossing pair mass, intra-clique edges
    score low (functions/graph.py ``edge_betweenness``).  Exact int64
    σ, per-term 1e-9 quantization before every sum; the oracle
    unrolls the same rounds and credits the same edges."""
    from .functions.graph import edge_betweenness
    from .functions.links import host_link_graph

    edges = host_link_graph(_link_pages_df(spark, sf_dir))
    return edge_betweenness(
        edges, src_col="src_host", dst_col="dst_host",
        max_depth=_BETW_ROUNDS,
    )


ORACLES["q_edge_betweenness"] = _edge_betweenness_oracle()


# ---------------------------------------------------------------------------
# pinned-VALUES oracles for the queries with no closed-form SQL twin
# (q_stream_ingest / q_multimodal_gvi / q_lsh_ann / q_viewshed_gvi):
# expected rows computed by independent mirrors and cross-checked against
# the engine at pin time (scripts/pin_oracles.py), keyed by a content
# marker so one SQL string serves the whole tri-scale sweep.
# ---------------------------------------------------------------------------

try:
    from .data.pinned_oracles import SQLS as _PINNED_SQLS

    for _name, _sql in _PINNED_SQLS.items():
        if _name in QUERIES:
            ORACLES[_name] = _sql
except ImportError:  # pragma: no cover — regenerate with scripts/pin_oracles.py
    pass


# ---------------------------------------------------------------------------
# entry() flagship: geocode → cell assignment → PiP join (sf0.001)
# ---------------------------------------------------------------------------

def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    from .operators.spatial_join import point_in_rect_join

    pts = city.with_cell(city.points_df(spark, sf_dir))
    greens = city.greenspace_df(spark)
    joined = point_in_rect_join(pts, greens, point_key="doc_id")
    return joined.select("doc_id", "x", "y", "cell", "gs_id")


# ---------------------------------------------------------------------------
# q_wasserstein — per-source W1 transport distance of the length
# distribution vs the whole corpus
# ---------------------------------------------------------------------------

from .functions.stats import wasserstein_1d_sql as _w1_sql  # noqa: E402


@register("q_wasserstein", _w1_sql("documents", "source", "n_chars"))
def q_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D earth-mover (Wasserstein-1) distance between each
    source's document-length distribution and the whole corpus — the
    transport-cost source-shift detector beside q_ks_test (sup metric)
    and q_js_divergence (content): KS sees only the worst point, W1
    integrates the entire CDF gap.  Numerator exact int64 on the
    value-domain grid; one corpus-sized groupBy, dim-sized windows."""
    from .functions.stats import wasserstein_1d

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return wasserstein_1d(docs, "source", "n_chars")


# ---------------------------------------------------------------------------
# q_jarque_bera — per-source normality of document lengths
# ---------------------------------------------------------------------------

from .functions.stats import jarque_bera_sql as _jb_sql  # noqa: E402


@register("q_jarque_bera", _jb_sql("documents", "source", "n_chars"))
def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque–Bera normality test of each source's length
    distribution — completes the distribution-shape family
    (q_ks_test / q_anderson_darling compare groups to each other; JB
    tests each group against normality itself, the standard residual
    check before the parametric tests are trusted).  Four exact int64
    power sums per source, one map-side-combinable aggregation, one
    identical IEEE assembly chain shipped unrounded."""
    from .functions.stats import jarque_bera

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return jarque_bera(docs, "source", "n_chars")


# ---------------------------------------------------------------------------
# q_bleu — corpus BLEU-4 of a 4-char-stem normalization vs the original
# ---------------------------------------------------------------------------

from .functions.text import corpus_bleu4_sql as _bleu_sql  # noqa: E402

_STEM4_SQL = r"regexp_replace(text, '(\S{4})\S*', '\1', 'g')"


@register("q_bleu", _bleu_sql(_STEM4_SQL, "text"))
def q_bleu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level BLEU-4 per source between an aggressive 4-char
    stemming of the text and the original — the machine-translation
    metric turned curation eval: how much n-gram structure does a lossy
    vocabulary compression destroy?  The stem is token-count-preserving
    (pure regexp per token), so the brevity penalty is exactly 1 and
    the whole score stays in exact IEEE arithmetic (int64 clipped
    counts, four ratio products, two sqrts — no exp/ln).  Clip join is
    co-partitioned with its counts' groupBy key."""
    from .functions.text import corpus_bleu4

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prepared = docs.select(
        "source", "doc_id",
        F.regexp_replace(F.col("text"), r"(\S{4})\S*", "$1").alias("cand"),
        F.col("text").alias("ref"),
    )
    return corpus_bleu4(prepared, "source", "doc_id", "cand", "ref")


# ---------------------------------------------------------------------------
# q_rouge — ROUGE-1/2 recall of the lead-20 extractive baseline
# ---------------------------------------------------------------------------

from .functions.text import rouge_n_sql as _rouge_sql  # noqa: E402

_LEAD20_SQL = "array_to_string(string_split(text, ' ')[1:20], ' ')"


@register("q_rouge", _rouge_sql(_LEAD20_SQL, "text", 2))
def q_rouge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus ROUGE-1/ROUGE-2 recall per source of the lead-20
    extractive baseline (the classic lead-N summarizer) against the
    full document — the recall-side summarization eval beside
    q_bleu's precision view.  Clipped int64 matches over reference
    n-gram counts; one division, portable unrounded."""
    from .functions.text import rouge_n_recall

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prepared = docs.select(
        "source", "doc_id",
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 20), " ").alias("cand"),
        F.col("text").alias("ref"),
    )
    return rouge_n_recall(prepared, "source", "doc_id", "cand", "ref", 2)


# ---------------------------------------------------------------------------
# q_krippendorff — Krippendorff's alpha among the three language raters
# ---------------------------------------------------------------------------

@register("q_krippendorff", None)  # generated oracle attached below
def q_krippendorff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal) among the same three language
    raters as q_fleiss — stopword heuristic, trained naive Bayes,
    majority baseline.  Alpha's chance disagreement is drawn WITHOUT
    replacement from the pooled ratings (vs Fleiss' with-replacement
    P̄_e), the reliability convention content-analysis pipelines
    expect; same two exact int64 sums, one identical IEEE chain
    (functions/stats.py ``krippendorff_alpha``)."""
    from .functions.stats import krippendorff_alpha
    from .functions.text import language_id, naive_bayes_predict

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p1 = language_id(docs).select("doc_id", F.col("pred_lang").alias("r1"))
    p2 = naive_bayes_predict(docs).select(
        "doc_id", F.col("pred_lang").alias("r2")
    )
    base = (
        docs.groupBy("lang")
        .count()
        .orderBy(F.desc("count"), F.asc("lang"))
        .limit(1)
        .select(F.col("lang").alias("r3"))
    )
    j = p1.join(p2, "doc_id").crossJoin(F.broadcast(base))
    return krippendorff_alpha(j, "doc_id", ["r1", "r2", "r3"])


ORACLES["q_krippendorff"] = f"""
WITH l AS ({_langid_sql()}),
nbp AS (SELECT doc_id, pred_lang FROM ({_NB_PRED_SQL})),
base AS (SELECT lang AS bl FROM documents
         GROUP BY lang ORDER BY count(*) DESC, lang LIMIT 1),
st AS (SELECT l.doc_id AS i, l.pred_lang AS cat FROM l
       UNION ALL SELECT doc_id, pred_lang FROM nbp
       UNION ALL SELECT d.doc_id, b.bl FROM documents d CROSS JOIN base b),
nij AS (SELECT i, cat, CAST(count(*) AS BIGINT) AS n FROM st GROUP BY i, cat),
s2 AS (SELECT CAST(sum(n * n) AS BIGINT) AS s2,
              CAST(count(DISTINCT i) AS BIGINT) AS n_items FROM nij),
c2 AS (SELECT CAST(sum(cj * cj) AS BIGINT) AS c2
       FROM (SELECT CAST(sum(n) AS BIGINT) AS cj FROM nij GROUP BY cat)),
f AS (SELECT n_items,
             CAST(n_items * 9 - s2 AS DOUBLE)
               / CAST(n_items * 6 AS DOUBLE) AS d_o,
             CAST((n_items * 3) * (n_items * 3) - c2 AS DOUBLE)
               / CAST((n_items * 3) * ((n_items * 3) - 1) AS DOUBLE) AS d_e
      FROM s2, c2)
SELECT n_items, CAST(3 AS BIGINT) AS n_raters, d_o, d_e,
       CASE WHEN d_e = 0.0 THEN NULL
            ELSE 1.0 - d_o / d_e END AS alpha
FROM f
"""


# ---------------------------------------------------------------------------
# q_bh_fdr — Benjamini–Hochberg FDR hotspot screen over crawl cells
# ---------------------------------------------------------------------------

@register(
    "q_bh_fdr",
    _CTE + f""",
{_COUNT_CELLS_SQL.strip()},
d AS (
  SELECT gx, gy, CAST(cnt AS BIGINT) AS cnt,
         CAST(count(*) OVER () AS BIGINT) AS m,
         CAST(sum(cnt) OVER () AS BIGINT) AS t
  FROM c
),
pq AS (
  SELECT gx, gy, cnt, m,
         CAST(floor(least(1.0, 2.0 * (CASE WHEN cnt = 0
              THEN exp(-1.0 * (CAST(t AS DOUBLE) / CAST(m AS DOUBLE)))
              ELSE exp(-1.0 * (CAST(t AS DOUBLE) / CAST(m AS DOUBLE))
                * ((CAST(cnt AS DOUBLE)
                    / (CAST(t AS DOUBLE) / CAST(m AS DOUBLE))
                    * ln(CAST(cnt AS DOUBLE)
                         / (CAST(t AS DOUBLE) / CAST(m AS DOUBLE))))
                   - CAST(cnt AS DOUBLE)
                     / (CAST(t AS DOUBLE) / CAST(m AS DOUBLE)) + 1.0))
              END)) * 1000000000.0 + 0.5) AS BIGINT) AS p_q
  FROM d
),
r AS (
  SELECT gx, gy, cnt, m, p_q,
         CAST(row_number() OVER (ORDER BY p_q ASC, gx ASC, gy ASC) AS BIGINT)
           AS pos
  FROM pq
),
x AS (
  SELECT r.*, max(CASE WHEN p_q * m * 4 <= pos * 1000000000 THEN pos
                       ELSE 0 END) OVER () AS imax
  FROM r
)
SELECT gx, gy, cnt, p_q, pos, pos <= imax AS rejected
FROM x
""",
)
def q_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR screen (q = 1/4) over per-cell document
    counts with conservative two-sided Chernoff (KL) p-values
    against the uniform null — the family-wise control layer between
    q_getis_ord's raw per-cell scores and q_kulldorff's single best
    window; the step-up rule runs on exact integers after the one
    1e-9 exp quantization (operators/spatial_stats.py
    ``bh_fdr_screen``)."""
    from .operators.spatial_stats import bh_fdr_screen

    return bh_fdr_screen(_count_cells_df(spark, sf_dir), q_num=1, q_den=4)


# ---------------------------------------------------------------------------
# q_hurst — rescaled-range (R/S) Hurst exponent of hourly event volume
# ---------------------------------------------------------------------------

_HURST_SIZES = (8, 16, 32, 64)


def _hurst_oracle() -> str:
    per_s = []
    for s in _HURST_SIZES:
        per_s.append(f"""
blk{s} AS (
  SELECT CAST(t // {s} AS BIGINT) AS b, t, y,
         CAST(sum(y) OVER (PARTITION BY (t // {s}) ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c,
         CAST(row_number() OVER (PARTITION BY (t // {s}) ORDER BY t)
              AS BIGINT) AS i,
         CAST(sum(y) OVER (PARTITION BY (t // {s})) AS BIGINT) AS sb,
         CAST(sum(y * y) OVER (PARTITION BY (t // {s})) AS BIGINT) AS qb
  FROM grid, nn WHERE t < n - n % {s}
),
pb{s} AS (
  SELECT b, sb, qb,
         CAST(max({s} * c - i * sb) - min({s} * c - i * sb) AS BIGINT)
           AS r_scaled
  FROM blk{s} GROUP BY b, sb, qb
),
rs{s} AS (
  SELECT CAST({s} AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n_blocks,
         CAST(sum(CAST(floor((CAST(r_scaled AS DOUBLE) / {s}.0)
              / sqrt((CAST(qb AS DOUBLE)
                      - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / {s}.0)
                     / {s}.0)
              * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_rs_q
  FROM pb{s} WHERE qb * {s} > sb * sb
)""")
    unions = "\n  UNION ALL ".join(
        f"SELECT * FROM rs{s}" for s in _HURST_SIZES
    )
    return f"""
WITH e AS (SELECT date_trunc('hour', ts) AS h FROM events),
d0 AS (SELECT min(h) AS hmin,
              date_diff('hour', min(h), max(h)) AS tmax FROM e),
cnt AS (SELECT date_diff('hour', d0.hmin, h) AS t,
               CAST(count(*) AS BIGINT) AS y
        FROM e, d0 GROUP BY 1),
grid AS (
  SELECT i.t, coalesce(c.y, 0) AS y
  FROM (SELECT unnest(generate_series(0, (SELECT tmax FROM d0))) AS t) i
  LEFT JOIN cnt c ON c.t = i.t
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM grid),
{",".join(per_s)},
pts AS (
  {unions}
),
q AS (
  SELECT s, n_blocks, sum_rs_q,
         CAST(sum_rs_q AS DOUBLE)
           / (CAST(n_blocks AS DOUBLE) * 1000000000.0) AS mean_rs,
         CAST(floor(ln(CAST(sum_rs_q AS DOUBLE)
              / (CAST(n_blocks AS DOUBLE) * 1000000000.0))
              * 1000000.0 + 0.5) AS BIGINT) AS ly,
         CAST(floor(ln(CAST(s AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS lx
  FROM pts
)
SELECT s, n_blocks, sum_rs_q, mean_rs,
       CAST(count(*) OVER () * sum(lx * ly) OVER ()
            - sum(lx) OVER () * sum(ly) OVER () AS DOUBLE)
         / CAST(count(*) OVER () * sum(lx * lx) OVER ()
                - sum(lx) OVER () * sum(lx) OVER () AS DOUBLE) AS hurst
FROM q
"""


@register("q_hurst", _hurst_oracle())
def q_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent (rescaled-range) of the hourly event-volume
    series on the dense zero-filled calendar grid — the long-memory
    diagnostic beside q_acf_volume's fixed lags: H≈0.5 means volume
    increments forget, H>0.5 means bursts persist (capacity planning
    must over-provision).  Exact int64 centred cumulative ranges,
    per-block 1e-9 quantization before the cross-block mean, heaps-law
    quantized log-log slope (functions/timeseries.py ``hurst_rs``)."""
    from .functions.timeseries import hurst_rs

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(F.date_trunc("hour", F.col("ts")).alias("h"))
    bounds = e.agg(
        F.min("h").alias("hmin"),
        (
            (F.unix_timestamp(F.max("h")) - F.unix_timestamp(F.min("h"))) / 3600
        ).cast("long").alias("tmax"),
    )
    cnt = (
        e.crossJoin(F.broadcast(bounds))
        .select(
            (
                (F.unix_timestamp(F.col("h")) - F.unix_timestamp(F.col("hmin")))
                / 3600
            ).cast("long").alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    grid = (
        bounds.select(F.explode(F.sequence(F.lit(0), F.col("tmax"))).alias("t"))
        .join(cnt, ["t"], "left")
        .select("t", F.coalesce(F.col("y"), F.lit(0)).alias("y"))
    )
    return hurst_rs(grid, "t", "y", _HURST_SIZES)


# ---------------------------------------------------------------------------
# q_nfc_normalize — Unicode NFC canonicalization via mapInArrow
# ---------------------------------------------------------------------------

@register(
    "q_nfc_normalize",
    """
SELECT doc_id, nfc_normalize(text) AS norm,
       nfc_normalize(text) != text AS changed
FROM documents
""",
)
def q_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC canonicalization of every document (Arrow
    mapInPandas kernel over pandas' unicodedata-backed normalizer —
    pyarrow 16.1's own utf8_normalize NFC fails to compose, see the
    operator docstring) — the canonical-equivalence dedup precondition
    beside q_normalize_text's accent fold and q_fix_mojibake's byte
    repair; the LCG fixture is ASCII so the invariant here is byte
    identity (changed = false), proven per row by the oracle's own
    nfc_normalize (functions/text.py ``nfc_normalize_arrow``)."""
    from .functions.text import nfc_normalize_arrow

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return nfc_normalize_arrow(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# q_utf8_audit — byte/codepoint audit via the raw mapInArrow surface
# ---------------------------------------------------------------------------

@register(
    "q_utf8_audit",
    """
SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(length(text) AS BIGINT) AS n_chars,
       strlen(text) = length(text) AS is_ascii
FROM documents
""",
)
def q_utf8_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTF-8 byte vs codepoint audit of every document through the raw
    ``mapInArrow`` surface — zero-copy RecordBatches into vectorized
    pyarrow C++ kernels, no pandas boxing — the template for plugging
    any Arrow compute kernel into a plan, and the cheap mojibake-risk
    flag (multi-byte share) a crawl pipeline reads before charset
    repair (functions/text.py ``utf8_audit_arrow``)."""
    from .functions.text import utf8_audit_arrow

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return utf8_audit_arrow(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# q_linear_svm — distributed hinge-loss classifier trained on the corpus
# ---------------------------------------------------------------------------

def _svm_feats_sql() -> str:
    from .functions.text import LANG_STOPWORDS

    sw = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
    return f"""
SELECT doc_id AS i,
       [CAST(1 AS BIGINT),
        CAST(len(list_filter(string_split(text, ' '),
                             t -> t IN ({sw}))) AS BIGINT),
        CAST(len(string_split(text, ' ')) // 10 AS BIGINT),
        CAST(least(n_chars // 100, 20) AS BIGINT),
        CAST((length(text) - length(replace(text, 'e', ''))) // 10
             AS BIGINT)] AS x,
       CAST(CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS BIGINT) AS y
FROM documents
"""


def _svm_oracle() -> str:
    from .functions.svm import svm_oracle_sql

    return svm_oracle_sql(_svm_feats_sql(), n_dims=5, iters=3)


@register("q_linear_svm", None)  # generated oracle attached below
def q_linear_svm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear SVM (hinge loss, full-batch subgradient, η=1/2, λ=1/8)
    trained DISTRIBUTED on the corpus to separate English documents
    from the rest on five cheap integer text features — the
    discriminative trainer beside q_naive_bayes (generative) and
    q_kmeans (unsupervised), i.e. the quality-classifier-training
    shape crawl curation runs at scale.  Micro-unit integer weights
    make the margin test and every round exactly reproducible across
    engines; per round one weight broadcast + one dim-sized gradient
    shuffle (functions/svm.py ``svm_train``).  The LCG fixture's text
    is label-independent word salad (aggregate features carry ~no lang
    signal — resubstitution accuracy sits near the class prior), so
    the GATE proves the trainer's cross-engine exactness while
    test_svm_separable proves it converges on a separable set."""
    from .functions.svm import svm_train

    from .functions.text import LANG_STOPWORDS

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sw = LANG_STOPWORDS["en"]
    feats = docs.withColumn("_toks", F.split(F.col("text"), " ")).select(
        F.col("doc_id"),
        F.array(
            F.lit(1).cast("long"),
            F.size(F.filter("_toks", lambda t: t.isin(*sw))).cast("long"),
            F.floor(F.size("_toks") / 10).cast("long"),
            F.least(F.floor(F.col("n_chars") / 100), F.lit(20)).cast("long"),
            F.floor(
                (
                    F.length(F.col("text"))
                    - F.length(F.expr("replace(text, 'e', '')"))
                ) / 10
            ).cast("long"),
        ).alias("x"),
        F.when(F.col("lang") == "en", F.lit(1))
        .otherwise(F.lit(-1)).cast("long").alias("y"),
    )
    return svm_train(feats, n_dims=5, iters=3)


ORACLES["q_linear_svm"] = _svm_oracle()


# ---------------------------------------------------------------------------
# q_rocchio — pseudo-relevance-feedback query expansion + re-rank
# ---------------------------------------------------------------------------


def _rocchio_oracle() -> str:
    dim = _embedding_dim()
    return f"""
WITH orig AS ({_COSINE_TOPK_SQL}),
fb AS (
  SELECT o.q_id, i.range AS pos,
         round(avg(CAST(c.embedding[i.range] AS DOUBLE)), 6) AS fval
  FROM orig o JOIN embeddings c ON c.vec_id = o.n_id,
       range(1, {dim + 1}) i
  GROUP BY o.q_id, i.range
),
qv AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
qe AS (
  SELECT q.vec_id AS q_id,
         list(round(1.0 * CAST(q.embedding[f.pos] AS DOUBLE)
                    + 0.75 * f.fval, 6) ORDER BY f.pos) AS e
  FROM qv q JOIN fb f ON f.q_id = q.vec_id GROUP BY q.vec_id
),
p AS (
  SELECT qe.q_id, c.vec_id AS n_id,
         round({_DOT.format(a='qe.e', b='c.embedding')}
               / ({_NRM.format(a='qe.e')} * {_NRM.format(a='c.embedding')}),
               6) AS sim
  FROM qe, embeddings c WHERE c.vec_id <> qe.q_id
),
r AS (
  SELECT q_id, n_id, sim,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY sim DESC, n_id ASC) AS rank
  FROM p
)
SELECT r.q_id, r.n_id, r.sim, CAST(r.rank AS BIGINT) AS rank,
       (o2.n_id IS NOT NULL) AS was_feedback
FROM r LEFT JOIN orig o2 ON o2.q_id = r.q_id AND o2.n_id = r.n_id
WHERE r.rank <= 10
"""


@register("q_rocchio", None)  # generated oracle attached below
def q_rocchio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rocchio pseudo-relevance feedback (α=1, β=0.75) over the
    embedding corpus: each query's exact top-10 becomes its feedback
    set, the expanded query re-ranks the corpus, and was_feedback
    marks which hits the expansion genuinely pulled in — the classic
    query-expansion serving stage beside q_mmr_rerank (diversity) and
    q_rrf_fusion (ensembling) that completes the rerank family
    (functions/retrieval.py ``rocchio_rerank``)."""
    from .functions.retrieval import rocchio_rerank

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    return rocchio_rerank(q, emb, k=10)


ORACLES["q_rocchio"] = _rocchio_oracle()


# ---------------------------------------------------------------------------
# q_udtf_tf — per-document term frequencies through a Python UDTF
# ---------------------------------------------------------------------------

@register(
    "q_udtf_tf",
    """
SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cnt
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id < 200)
GROUP BY doc_id, tok
""",
)
def q_udtf_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token frequencies computed by a PYTHON UDTF invoked
    through SQL LATERAL (Arrow transport enabled) — the row→table
    Python-integration surface beside q_pysource_scan's DataSource;
    hash-proven equal to the relational explode+groupBy the oracle
    runs (functions/udtfs.py ``TermFreq``)."""
    from .functions.udtfs import register_term_freq

    register_term_freq(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 200
    )
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.tok, CAST(t.cnt AS BIGINT) AS cnt "
        "FROM _udtf_docs d, LATERAL term_freq(d.text) t"
    )


# ---------------------------------------------------------------------------
# q_jl_audit — Johnson–Lindenstrauss projection distortion audit
# ---------------------------------------------------------------------------


def _jl_oracle() -> str:
    dim = _embedding_dim()
    from .functions.similarity import JL_BITS, JL_Q

    return f"""
WITH pairs AS (SELECT q_id, n_id FROM ({_COSINE_TOPK_SQL})),
ids AS (SELECT DISTINCT vid FROM (
  SELECT q_id AS vid FROM pairs UNION ALL SELECT n_id FROM pairs)),
vecs AS (
  SELECT e.vec_id AS vid, CAST(i.range - 1 AS BIGINT) AS i,
         CAST(e.embedding[i.range] AS DOUBLE) AS val
  FROM embeddings e JOIN ids ON ids.vid = e.vec_id,
       range(1, {dim + 1}) i
),
proj AS (
  SELECT vid, b.range AS b,
         CAST(sum(CAST(floor(
           ((CAST((b.range * 1315423911 + i * 2654435761 + 97531)
                  % 1000003 AS DOUBLE) / 1000003.0) * 2.0 - 1.0)
           * val * {JL_Q}.0 + 0.5) AS BIGINT)) AS BIGINT) AS p
  FROM vecs, range(0, {JL_BITS}) b GROUP BY vid, b.range
),
vq AS (SELECT vid, i,
              CAST(floor(val * {JL_Q}.0 + 0.5) AS BIGINT) AS vq FROM vecs),
dt AS (
  SELECT p.q_id, p.n_id,
         CAST(sum((a.vq - c.vq) * (a.vq - c.vq)) AS BIGINT) AS d_true_q
  FROM pairs p JOIN vq a ON a.vid = p.q_id
  JOIN vq c ON c.vid = p.n_id AND c.i = a.i
  GROUP BY p.q_id, p.n_id
),
dp AS (
  SELECT p.q_id, p.n_id,
         CAST(sum((a.p - c.p) * (a.p - c.p)) AS BIGINT) AS d_proj_q
  FROM pairs p JOIN proj a ON a.vid = p.q_id
  JOIN proj c ON c.vid = p.n_id AND c.b = a.b
  GROUP BY p.q_id, p.n_id
)
SELECT dt.q_id, dt.n_id, dt.d_true_q, dp.d_proj_q,
       CASE WHEN dt.d_true_q = 0 THEN NULL
            ELSE CAST(dp.d_proj_q AS DOUBLE) / CAST(dt.d_true_q AS DOUBLE)
       END AS ratio,
       (CASE WHEN dt.d_true_q = 0 THEN NULL
             ELSE CAST(dp.d_proj_q AS DOUBLE) / CAST(dt.d_true_q AS DOUBLE)
        END) * 3.0 / {JL_BITS}.0 AS distortion
FROM dt JOIN dp ON dp.q_id = dt.q_id AND dp.n_id = dt.n_id
"""


@register("q_jl_audit", None)  # generated oracle attached below
def q_jl_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality-reduction audit: squared
    distances of the exact top-10 pairs after a deterministic 16-dim
    hash-mix projection, over the true squared distances — distortion
    near 1 is the acceptance test before an embedding pipeline swaps
    full vectors for sketches.  Both distances exact int64 (per-term
    1e-6 quantization), two divisions at the end
    (functions/similarity.py ``jl_distortion_audit``)."""
    from .functions.similarity import jl_distortion_audit

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    return jl_distortion_audit(q, emb, k=10)


ORACLES["q_jl_audit"] = _jl_oracle()


# ---------------------------------------------------------------------------
# q_textrank — TextRank keywords via weighted PageRank on co-occurrence
# ---------------------------------------------------------------------------

_TEXTRANK_EDGES_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
           WHERE len(string_split(text, ' ')) >= 2),
bi AS (SELECT tk[i.range] AS a, tk[i.range + 1] AS b
       FROM t, range(1, 1001) i WHERE i.range <= len(tk) - 1),
und AS (SELECT a AS src, b AS dst FROM bi WHERE a <> b
        UNION ALL SELECT b, a FROM bi WHERE a <> b)
SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM und GROUP BY src, dst
"""


def _textrank_oracle() -> str:
    from .functions.graph import weighted_pagerank_oracle_sql

    inner = weighted_pagerank_oracle_sql(
        f"SELECT * FROM ({_TEXTRANK_EDGES_SQL})", n_iters=3
    )
    return f"""
SELECT node AS token, rank
FROM ({inner})
ORDER BY rank DESC, token ASC LIMIT 20
"""


@register("q_textrank", None)  # generated oracle attached below
def q_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction: weighted PageRank (3 quantized
    rounds) over the corpus token co-occurrence graph (adjacent-token
    pairs, both directions, weight = pair count), top-20 tokens — the
    graph-centrality keyword scorer beside q_rake (phrase heuristics)
    and q_salient_terms (tf-idf): a token ranks high when its
    NEIGHBOURS rank high, not merely when it is frequent.  The graph
    is vocabulary-sized (never corpus-sized) — the one corpus-sized
    pass is the bigram count (functions/graph.py
    ``weighted_pagerank``)."""
    from .functions.graph import weighted_pagerank

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bi = (
        toks.withColumn("nxt", F.lead("tok").over(w))
        .filter(F.col("nxt").isNotNull() & (F.col("tok") != F.col("nxt")))
        .select(F.col("tok").alias("a"), F.col("nxt").alias("b"))
    )
    und = bi.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        bi.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    edges = und.groupBy("src", "dst").agg(F.count(F.lit(1)).cast("long").alias("w"))
    pr = weighted_pagerank(edges, n_iters=3)
    return (
        pr.orderBy(F.desc("rank"), F.asc("node"))
        .limit(20)
        .select(F.col("node").alias("token"), "rank")
    )


ORACLES["q_textrank"] = _textrank_oracle()


# ---------------------------------------------------------------------------
# q_bot_cadence — inter-arrival regularity (bot) screen per user
# ---------------------------------------------------------------------------

@register(
    "q_bot_cadence",
    """
WITH d AS (
  SELECT user_id,
         (epoch_us(ts) - epoch_us(lag(ts) OVER (
            PARTITION BY user_id ORDER BY ts, event_id))) // 1000000 AS d
  FROM events
),
g AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(d) AS BIGINT) AS span_s,
         CAST(sum(d * d) AS BIGINT) AS sd2
  FROM d WHERE d IS NOT NULL GROUP BY user_id
)
SELECT user_id, n_gaps, span_s,
       CAST(n_gaps AS DOUBLE) * CAST(sd2 AS DOUBLE)
         / (CAST(span_s AS DOUBLE) * CAST(span_s AS DOUBLE)) - 1.0 AS cv2,
       4 * (n_gaps * sd2 - span_s * span_s) < span_s * span_s AS is_bot
FROM g WHERE n_gaps >= 4
""",
)
def q_bot_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival CV² bot screen: scripted clients fire on
    a timer (CV² → 0), humans are bursty — the abuse-detection signal
    beside q_sessionize; gaps exact int64 seconds, the flag decided by
    a pure integer inequality (functions/audit.py ``bot_cadence``)."""
    from .functions.audit import bot_cadence

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return bot_cadence(ev, "user_id", "ts", min_gaps=4)


# ---------------------------------------------------------------------------
# q_periodogram — Fourier periodogram of hourly event volume
# ---------------------------------------------------------------------------

_PGRAM_K = 8


@register(
    "q_periodogram",
    f"""
WITH e AS (SELECT date_trunc('hour', ts) AS h FROM events),
d0 AS (SELECT min(h) AS hmin,
              date_diff('hour', min(h), max(h)) AS tmax FROM e),
cnt AS (SELECT date_diff('hour', d0.hmin, h) AS t,
               CAST(count(*) AS BIGINT) AS y
        FROM e, d0 GROUP BY 1),
grid AS (
  SELECT i.t, coalesce(c.y, 0) AS y
  FROM (SELECT unnest(generate_series(0, (SELECT tmax FROM d0))) AS t) i
  LEFT JOIN cnt c ON c.t = i.t
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM grid),
terms AS (
  SELECT k.range AS k, nn.n,
         CAST(floor(CAST(y AS DOUBLE)
              * cos(2.0 * pi() * CAST(k.range AS DOUBLE) * CAST(t AS DOUBLE)
                    / CAST(nn.n AS DOUBLE))
              * 1000000000.0 + 0.5) AS BIGINT) AS cq,
         CAST(floor(CAST(y AS DOUBLE)
              * sin(2.0 * pi() * CAST(k.range AS DOUBLE) * CAST(t AS DOUBLE)
                    / CAST(nn.n AS DOUBLE))
              * 1000000000.0 + 0.5) AS BIGINT) AS sq
  FROM grid, range(1, {_PGRAM_K + 1}) k, nn
),
a AS (SELECT k, max(n) AS n, CAST(sum(cq) AS BIGINT) AS c_q,
             CAST(sum(sq) AS BIGINT) AS s_q
      FROM terms GROUP BY k),
p AS (
  SELECT CAST(k AS BIGINT) AS k,
         CAST(n AS DOUBLE) / CAST(k AS DOUBLE) AS period, c_q, s_q,
         (CAST(c_q AS DOUBLE) / 1000000000.0)
           * (CAST(c_q AS DOUBLE) / 1000000000.0)
         + (CAST(s_q AS DOUBLE) / 1000000000.0)
           * (CAST(s_q AS DOUBLE) / 1000000000.0) AS power
  FROM a
)
SELECT k, period, c_q, s_q, power,
       row_number() OVER (ORDER BY power DESC, k ASC) = 1 AS dominant
FROM p
""",
)
def q_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete Fourier periodogram (harmonics 1–8) of the hourly
    event-volume grid — the seasonality detector that MEASURES the
    dominant period q_acf_volume and q_holt_winters must be told;
    per-term 1e-9 quantization absorbs the cross-engine libm ulp, the
    sums are exact int64 (functions/timeseries.py ``periodogram``)."""
    from .functions.timeseries import periodogram

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(F.date_trunc("hour", F.col("ts")).alias("h"))
    bounds = e.agg(
        F.min("h").alias("hmin"),
        (
            (F.unix_timestamp(F.max("h")) - F.unix_timestamp(F.min("h"))) / 3600
        ).cast("long").alias("tmax"),
    )
    cnt = (
        e.crossJoin(F.broadcast(bounds))
        .select(
            (
                (F.unix_timestamp(F.col("h")) - F.unix_timestamp(F.col("hmin")))
                / 3600
            ).cast("long").alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    grid = (
        bounds.select(F.explode(F.sequence(F.lit(0), F.col("tmax"))).alias("t"))
        .join(cnt, ["t"], "left")
        .select("t", F.coalesce(F.col("y"), F.lit(0)).alias("y"))
    )
    return periodogram(grid, "t", "y", _PGRAM_K)


# ---------------------------------------------------------------------------
# q_squares — exact 4-cycle motif count of the host graph
# ---------------------------------------------------------------------------

@register(
    "q_squares",
    "WITH " + _LINK_EDGE_CTE + """,
w AS (SELECT b1.b AS u, b2.b AS w
      FROM bo b1 JOIN bo b2 ON b1.a = b2.a AND b1.b < b2.b),
cn AS (SELECT u, w, CAST(count(*) AS BIGINT) AS cn FROM w GROUP BY u, w),
st AS (SELECT CAST(count(*) AS BIGINT) AS n_diag_pairs,
              CAST(sum(cn * (cn - 1)) // 4 AS BIGINT) AS n_squares
       FROM cn),
sz AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und),
nd AS (SELECT CAST(count(DISTINCT a) AS BIGINT) AS n_nodes FROM bo)
SELECT nd.n_nodes, sz.n_edges, st.n_diag_pairs, st.n_squares
FROM nd, sz, st
""",
)
def q_squares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 4-cycle (square) count of the undirected host graph —
    the motif one past q_triangles: bipartite link farms are
    triangle-free but square-heavy, so C4/C3 separates organic graphs
    from mutual-promotion rings.  ½·Σ C(common-neighbours, 2) over
    vertex pairs, pure integer counting (functions/graph.py
    ``square_count``)."""
    from .functions.graph import square_count
    from .functions.links import host_link_graph

    edges = host_link_graph(_link_pages_df(spark, sf_dir)).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    return square_count(edges)


# ---------------------------------------------------------------------------
# q_attr_assortativity — categorical (host-class) assortativity
# ---------------------------------------------------------------------------

@register(
    "q_attr_assortativity",
    "WITH " + _LINK_GRAPH_CTE + """,
le AS (SELECT DISTINCT src_host AS s, dst_host AS d FROM r
       WHERE src_host <> dst_host),
ec AS (SELECT coalesce(TRY_CAST(regexp_extract(s, '([0-9]+)', 1) AS BIGINT),
                       -1) % 5 AS ci,
              coalesce(TRY_CAST(regexp_extract(d, '([0-9]+)', 1) AS BIGINT),
                       -1) % 5 AS cj
       FROM le),
m AS (SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(CASE WHEN ci = cj THEN 1 ELSE 0 END) AS BIGINT)
               AS same_cat
      FROM ec),
a AS (SELECT ci AS c, CAST(count(*) AS BIGINT) AS ai FROM ec GROUP BY ci),
b AS (SELECT cj AS c, CAST(count(*) AS BIGINT) AS bi FROM ec GROUP BY cj),
ab AS (SELECT CAST(sum(coalesce(ai, 0) * coalesce(bi, 0)) AS BIGINT) AS sab
       FROM a FULL JOIN b USING (c))
SELECT m.m AS n_edges, m.same_cat,
       CASE WHEN CAST(m.m * m.m - ab.sab AS DOUBLE) = 0.0 THEN NULL
            ELSE CAST(m.m * m.same_cat - ab.sab AS DOUBLE)
                 / CAST(m.m * m.m - ab.sab AS DOUBLE) END AS r
FROM m, ab
""",
)
def q_attr_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman categorical assortativity of the host graph by host
    class (host-number mod 5 — the synthetic stand-in for a language
    or TLD label): do same-class hosts link to each other more than
    chance?  Mixing-matrix diagonal vs row·column products, exact
    integers, one division (functions/graph.py
    ``attribute_assortativity``)."""
    from .functions.graph import attribute_assortativity
    from .functions.links import host_link_graph

    edges = (
        host_link_graph(_link_pages_df(spark, sf_dir))
        .select(
            F.col("src_host").alias("s"), F.col("dst_host").alias("d")
        )
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )

    def _cat(c):
        return (
            F.coalesce(
                F.regexp_extract(F.col(c), "([0-9]+)", 1).cast("long"),
                F.lit(-1),
            ) % 5
        )

    ec = edges.select(_cat("s").alias("src_cat"), _cat("d").alias("dst_cat"))
    return attribute_assortativity(ec)


# ---------------------------------------------------------------------------
# q_contrastive_pairs — anchor/positive/negative mining for training
# ---------------------------------------------------------------------------

@register(
    "q_contrastive_pairs",
    f"""
WITH top1 AS (SELECT q_id, n_id AS pos_id, sim AS pos_sim
              FROM ({_COSINE_TOPK_SQL}) WHERE rank = 1),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
cand AS (
  SELECT t.q_id, t.pos_id, t.pos_sim, CAST(j.range AS BIGINT) AS slot,
         CASE j.range WHEN 1 THEN (t.q_id * 31 + 7) % nn.n
                      WHEN 2 THEN (t.q_id * 17 + 3) % nn.n
                      ELSE (t.q_id * 53 + 11) % nn.n END AS neg_id
  FROM top1 t, range(1, 4) j, nn
),
f AS (SELECT * FROM cand WHERE neg_id <> q_id AND neg_id <> pos_id)
SELECT f.q_id, f.pos_id, f.pos_sim, f.slot, f.neg_id,
       round({_DOT.format(a='q.embedding', b='c.embedding')}
             / ({_NRM.format(a='q.embedding')}
                * {_NRM.format(a='c.embedding')}), 6) AS neg_sim
FROM f JOIN embeddings q ON q.vec_id = f.q_id
JOIN embeddings c ON c.vec_id = f.neg_id
""",
)
def q_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair mining: every anchor (vec_id < 10)
    with its exact top-1 positive and three deterministic affine-hash
    negatives, plus the round-6 cosine margins a triplet/InfoNCE loss
    would see — the embedding-training data op beside q_hash_split
    (splits) and q_pack_sequences (batching); collisions with the
    anchor/positive are dropped (functions/similarity.py
    ``contrastive_pairs``)."""
    from .functions.similarity import contrastive_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    return contrastive_pairs(q, emb)


# ---------------------------------------------------------------------------
# q_walk_entropy — entropy rate of the damped random walk on the host graph
# ---------------------------------------------------------------------------


def _walk_entropy_oracle() -> str:
    from .functions.graph import weighted_pagerank_oracle_sql

    edges_sub = (
        "SELECT * FROM (WITH "
        + _LINK_GRAPH_CTE
        + """,
g AS (SELECT src_host AS src, dst_host AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM r GROUP BY 1, 2)
SELECT * FROM g)"""
    )
    pr_chain = weighted_pagerank_oracle_sql(edges_sub, n_iters=3)
    return f"""
WITH pr AS MATERIALIZED ({pr_chain}),
lg AS MATERIALIZED (SELECT * FROM (WITH {_LINK_GRAPH_CTE},
g AS (SELECT src_host AS src, dst_host AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM r GROUP BY 1, 2)
SELECT * FROM g)),
n AS (SELECT src, dst, w, sum(w) OVER (PARTITION BY src) AS n FROM lg),
h AS (SELECT src AS node,
             CAST(sum(CAST(floor((CAST(w AS DOUBLE) / n)
                  * ln(CAST(w AS DOUBLE) / n) * 1000000000.0 + 0.5)
                  AS BIGINT)) AS BIGINT) AS sumtq
      FROM n GROUP BY src),
j AS (
  SELECT CAST(floor(pr.rank
              * (-(CAST(coalesce(h.sumtq, 0) AS DOUBLE) / 1000000000.0))
              * 1000000000.0 + 0.5) AS BIGINT) AS t,
         CASE WHEN h.node IS NOT NULL THEN 1 ELSE 0 END AS l
  FROM pr LEFT JOIN h ON h.node = pr.node
)
SELECT CAST(count(*) AS BIGINT) AS n_hosts,
       CAST(sum(l) AS BIGINT) AS n_linking_hosts,
       round(CAST(sum(t) AS BIGINT) / 1000000000.0 + 0.0, 6) AS entropy_rate
FROM j
"""


@register("q_walk_entropy", None)  # generated oracle attached below
def q_walk_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the damped random walk on the weighted host
    graph — Σ π_i·H_i composing the quantized weighted PageRank with
    per-host outlink entropy: the one-number "how surprising is the
    next click" health metric (mirror chains → 0, hub economy → high)
    (functions/links.py ``walk_entropy_rate``)."""
    from .functions.links import host_link_graph, walk_entropy_rate

    edges = host_link_graph(_link_pages_df(spark, sf_dir))
    return walk_entropy_rate(edges)


ORACLES["q_walk_entropy"] = _walk_entropy_oracle()


# ---------------------------------------------------------------------------
# q_ushape_attribution — position-based (40/20/40) conversion credit
# ---------------------------------------------------------------------------

@register(
    "q_ushape_attribution",
    """
WITH s AS (
  SELECT user_id, event_type, event_id, ts,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS pc
  FROM events
),
np AS (SELECT CAST(max(pc) OVER (PARTITION BY user_id) AS BIGINT) AS u_conv,
              s.* FROM s),
t AS (
  SELECT user_id, event_type, pc + 1 AS path_id,
         CAST(row_number() OVER (PARTITION BY user_id, pc
                                 ORDER BY ts, event_id) AS BIGINT) AS rn,
         CAST(count(*) OVER (PARTITION BY user_id, pc) AS BIGINT) AS k
  FROM np WHERE event_type <> 'purchase' AND pc < u_conv
),
c AS (
  SELECT event_type,
         CAST(floor((CASE WHEN k = 1 THEN 1.0
                          WHEN k = 2 THEN 0.5
                          WHEN rn = 1 OR rn = k THEN 0.4
                          ELSE 0.2 / (CAST(k AS DOUBLE) - 2.0) END)
              * 1000000000.0 + 0.5) AS BIGINT) AS cq
  FROM t
)
SELECT event_type AS touch, CAST(count(*) AS BIGINT) AS n_touches,
       round(CAST(sum(cq) AS BIGINT) / 1000000000.0 + 0.0, 6) AS credit
FROM c GROUP BY event_type
""",
)
def q_ushape_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped, 40/20/40) attribution: every
    non-purchase event before a user's next purchase forms that
    conversion's touch path; first and last touch get 40% credit
    each, middles split 20% (k=1 → 100%, k=2 → 50/50) — the
    multi-touch companion of q_attribution's last-touch.  Paths are
    gaps-and-islands on the purchase cumulative count; per-touch
    credits quantize to 1e-9 before the sum (the exact-division
    shares make both engines' doubles identical)."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id", "event_type", "event_id", "ts",
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long").alias("pc"),
    )
    s = s.withColumn(
        "u_conv", F.max("pc").over(Window.partitionBy("user_id")).cast("long")
    )
    wp = Window.partitionBy("user_id", "pc").orderBy("ts", "event_id")
    t = (
        s.filter((F.col("event_type") != "purchase")
                 & (F.col("pc") < F.col("u_conv")))
        .select(
            "event_type",
            F.row_number().over(wp).cast("long").alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("user_id", "pc"))
            .cast("long").alias("k"),
        )
    )
    share = (
        F.when(F.col("k") == 1, F.lit(1.0))
        .when(F.col("k") == 2, F.lit(0.5))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("k")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("k").cast("double") - F.lit(2.0)))
    )
    c = t.select(
        "event_type",
        F.floor(share * F.lit(1000000000.0) + F.lit(0.5))
        .cast("long").alias("cq"),
    )
    return c.groupBy(F.col("event_type").alias("touch")).agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.round(
            F.sum("cq").cast("double") / F.lit(1000000000.0) + F.lit(0.0), 6
        ).alias("credit"),
    )


# ---------------------------------------------------------------------------
# q_bowtie — Broder bow-tie macro-structure of the host graph
# ---------------------------------------------------------------------------

@register(
    "q_bowtie",
    "WITH RECURSIVE " + _LINK_GRAPH_CTE + """,
de AS MATERIALIZED (SELECT DISTINCT src_host AS u, dst_host AS v
       FROM r WHERE src_host <> dst_host),
nodes AS MATERIALIZED (SELECT u AS n FROM de UNION SELECT v AS n FROM de),
reach(u, v) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT rr.u, de.v FROM reach rr JOIN de ON de.u = rr.v
),
m AS (SELECT f.u, f.v FROM reach f JOIN reach b ON b.u = f.v AND b.v = f.u),
sid AS (SELECT u AS host, min(v) AS scc_id FROM m GROUP BY u),
core AS (SELECT scc_id AS core_id, CAST(count(*) AS BIGINT) AS core_size
         FROM sid GROUP BY scc_id
         ORDER BY count(*) DESC, scc_id ASC LIMIT 1),
cm AS (SELECT sid.host AS c FROM sid, core WHERE sid.scc_id = core.core_id),
fc AS (SELECT DISTINCT reach.v AS node
       FROM reach JOIN cm ON cm.c = reach.u),
tc AS (SELECT DISTINCT reach.u AS node
       FROM reach JOIN cm ON cm.c = reach.v)
SELECT sid.host,
       CASE WHEN sid.scc_id = core.core_id THEN 'CORE'
            WHEN tc.node IS NOT NULL THEN 'IN'
            WHEN fc.node IS NOT NULL THEN 'OUT'
            ELSE 'OTHER' END AS region,
       core.core_id, core.core_size
FROM sid CROSS JOIN core
LEFT JOIN tc ON tc.node = sid.host
LEFT JOIN fc ON fc.node = sid.host
""",
)
def q_bowtie(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broder bow-tie decomposition of the directed host graph: the
    largest SCC is the CORE, IN reaches it, OUT is reachable from it,
    everything else (tendrils/tubes/islands) is OTHER — the
    macro-structure readout of a crawl snapshot (a seed list stuck in
    OUT can never crawl back); shares the closure-squaring
    reachability with q_scc (functions/graph.py
    ``bowtie_decomposition``)."""
    from .functions.graph import bowtie_decomposition
    from .functions.links import host_link_graph

    edges = host_link_graph(_link_pages_df(spark, sf_dir))
    return bowtie_decomposition(
        edges, src_col="src_host", dst_col="dst_host"
    )


@register(
    "q_bowtie_full",
    "WITH RECURSIVE " + _LINK_GRAPH_CTE + """,
de AS MATERIALIZED (SELECT DISTINCT src_host AS u, dst_host AS v
       FROM r WHERE src_host <> dst_host),
nodes AS MATERIALIZED (SELECT u AS n FROM de UNION SELECT v AS n FROM de),
reach(u, v) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT rr.u, de.v FROM reach rr JOIN de ON de.u = rr.v
),
cl AS MATERIALIZED (SELECT u, v FROM reach),
m AS (SELECT f.u, f.v FROM cl f JOIN cl b ON b.u = f.v AND b.v = f.u),
sid AS MATERIALIZED (SELECT u AS host, min(v) AS scc_id FROM m GROUP BY u),
core AS MATERIALIZED (
  SELECT scc_id AS core_id, CAST(count(*) AS BIGINT) AS core_size
  FROM sid GROUP BY scc_id
  ORDER BY count(*) DESC, scc_id ASC LIMIT 1),
cm AS MATERIALIZED (SELECT sid.host AS c FROM sid, core
                    WHERE sid.scc_id = core.core_id),
fc AS MATERIALIZED (SELECT DISTINCT cl.v AS node
       FROM cl JOIN cm ON cm.c = cl.u),
tc AS MATERIALIZED (SELECT DISTINCT cl.u AS node
       FROM cl JOIN cm ON cm.c = cl.v),
inn AS MATERIALIZED (SELECT node AS n FROM tc
                     WHERE node NOT IN (SELECT c FROM cm)),
outn AS MATERIALIZED (SELECT node AS n FROM fc
                      WHERE node NOT IN (SELECT c FROM cm)),
fi AS MATERIALIZED (SELECT DISTINCT cl.v AS node
       FROM cl JOIN inn ON inn.n = cl.u),
t_o AS MATERIALIZED (SELECT DISTINCT cl.u AS node
       FROM cl JOIN outn ON outn.n = cl.v)
SELECT sid.host,
       CASE WHEN sid.scc_id = core.core_id THEN 'CORE'
            WHEN tc.node IS NOT NULL THEN 'IN'
            WHEN fc.node IS NOT NULL THEN 'OUT'
            WHEN fi.node IS NOT NULL AND t_o.node IS NOT NULL THEN 'TUBE'
            WHEN fi.node IS NOT NULL THEN 'TENDRIL_IN'
            WHEN t_o.node IS NOT NULL THEN 'TENDRIL_OUT'
            ELSE 'DISC' END AS region,
       core.core_id, core.core_size
FROM sid CROSS JOIN core
LEFT JOIN tc ON tc.node = sid.host
LEFT JOIN fc ON fc.node = sid.host
LEFT JOIN fi ON fi.node = sid.host
LEFT JOIN t_o ON t_o.node = sid.host
""",
)
def q_bowtie_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete Broder taxonomy (VERDICT r03 #6): OTHER sub-split into
    TUBE (on a core-avoiding IN→OUT path), TENDRIL_IN (hangs off IN),
    TENDRIL_OUT (feeds OUT) and DISC — two extra semi-joins against
    the same transitive closure (an OTHER node's witness path can
    never cross the CORE, so plain reachability is exact; see
    functions/graph.py bowtie_decomposition full=True)."""
    from .functions.graph import bowtie_decomposition
    from .functions.links import host_link_graph

    edges = host_link_graph(_link_pages_df(spark, sf_dir))
    return bowtie_decomposition(
        edges, src_col="src_host", dst_col="dst_host", full=True
    )


# ---------------------------------------------------------------------------
# q_ips_offpolicy — inverse-propensity off-policy value estimate
# ---------------------------------------------------------------------------

@register(
    "q_ips_offpolicy",
    """
WITH e AS (
  SELECT event_type AS arm,
         CAST(round(value * 100.0) AS BIGINT) AS r_q
  FROM events
),
a AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(r_q) AS BIGINT) AS sum_cents
  FROM e GROUP BY arm
),
k AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n_total
      FROM a),
t AS (
  SELECT arm, n, sum_cents, k.k, k.n_total,
         CAST(floor((CAST(sum_cents AS DOUBLE) / CAST(n AS DOUBLE))
              / CAST(k.k AS DOUBLE) * 1000000000.0 + 0.5) AS BIGINT) AS tq
  FROM a, k
)
SELECT arm, n, sum_cents,
       CAST(sum_cents AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean_reward,
       round(CAST(sum(tq) OVER () AS BIGINT) / 1000000000.0 / 100.0 + 0.0, 6)
         AS ips_uniform
FROM t
""",
)
def q_ips_offpolicy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation by inverse propensity scoring: treating
    event_type as the logged policy's arm and value as the reward, the
    IPS estimate of a UNIFORM target policy collapses to the uniform
    average of per-arm mean rewards (weights (1/K)/(n_a/N) telescope) —
    the counterfactual "what if we served all arms equally" readout an
    experimentation pipeline runs before an A/B test.  Rewards
    quantize to exact cents; per-arm terms quantize to 1e-9 before the
    K-term sum; two divisions ship unrounded/round-6."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(
        F.col("event_type").alias("arm"),
        F.round(F.col("value") * 100.0).cast("long").alias("r_q"),
    )
    a = e.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r_q").cast("long").alias("sum_cents"),
    )
    k = a.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("n_total"),
    )
    t = a.crossJoin(F.broadcast(k)).select(
        "arm", "n", "sum_cents",
        F.floor(
            (F.col("sum_cents").cast("double") / F.col("n").cast("double"))
            / F.col("k").cast("double") * F.lit(1000000000.0) + F.lit(0.5)
        ).cast("long").alias("tq"),
    )
    w = Window.partitionBy()
    return t.select(
        "arm", "n", "sum_cents",
        (F.col("sum_cents").cast("double") / F.col("n").cast("double")
         / F.lit(100.0)).alias("mean_reward"),
        F.round(
            F.sum("tq").over(w).cast("double") / F.lit(1000000000.0)
            / F.lit(100.0) + F.lit(0.0), 6
        ).alias("ips_uniform"),
    )


# ---------------------------------------------------------------------------
# q_em_mixture — two-component Poisson-mixture EM on document lengths
# ---------------------------------------------------------------------------


def _em_oracle() -> str:
    from .functions.clustering import em_poisson2_oracle_sql

    return em_poisson2_oracle_sql(
        "SELECT CAST(n_chars AS BIGINT) AS x FROM documents", iters=3
    )


@register("q_em_mixture", None)  # generated oracle attached below
def q_em_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-component Poisson-mixture EM on document lengths — the
    latent-variable trainer beside q_kmeans (hard assignments),
    q_naive_bayes (supervised) and q_linear_svm (discriminative): the
    classic "two populations in one crawl" length diagnostic, with
    responsibilities floored to integer nanoshares so every E/M round
    is exactly reproducible across engines (functions/clustering.py
    ``em_poisson2``)."""
    from .functions.clustering import em_poisson2

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("n_chars").alias("x")
    )
    return em_poisson2(docs, "x", iters=3)


ORACLES["q_em_mixture"] = _em_oracle()


# ---------------------------------------------------------------------------
# q_err — Expected Reciprocal Rank @10 of the BM25 ranking
# ---------------------------------------------------------------------------


def _err_oracle() -> str:
    from .functions.retrieval import err_oracle_sql

    return err_oracle_sql(_BM25_TERMS, k=10)


@register("q_err", None)  # generated oracle attached below
def q_err(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Reciprocal Rank @10 of the BM25 ranking per source —
    the CASCADE ranking metric beside q_ndcg (position discounts):
    a rank is discounted by the probability the user already stopped
    at a relevant document above it.  Survival products exact int64,
    per-rank terms 1e-9-quantized (functions/retrieval.py
    ``err_at_k``)."""
    from .functions.retrieval import bm25_scores, err_at_k

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = bm25_scores(docs, _BM25_TERMS).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return err_at_k(scored, k=10)


ORACLES["q_err"] = _err_oracle()


# ---------------------------------------------------------------------------
# q_nelson_aalen — cumulative-hazard estimator on the same risk table
# ---------------------------------------------------------------------------

@register(
    "q_nelson_aalen",
    f"""
WITH e AS (SELECT user_id AS u, date_trunc('day', ts) AS d, event_type
           FROM events),
d0 AS (SELECT min(d) AS dmin,
              date_diff('day', min(d), max(d)) AS tmax FROM e),
per AS (
  SELECT u, min(date_diff('day', d0.dmin, d)) AS f,
         min(CASE WHEN event_type = 'purchase'
                  THEN date_diff('day', d0.dmin, d) END) AS p,
         max(d0.tmax) AS tmax
  FROM e, d0 GROUP BY u),
obs AS (
  SELECT u,
         CASE WHEN p IS NOT NULL
               AND p - f <= least({_KM_TAU}, tmax - f)
              THEN 1 ELSE 0 END AS ev,
         CASE WHEN p IS NOT NULL
               AND p - f <= least({_KM_TAU}, tmax - f)
              THEN p - f ELSE least({_KM_TAU}, tmax - f) END AS dur
  FROM per),
g AS (
  SELECT dur AS t_day, CAST(count(*) AS BIGINT) AS n_at,
         CAST(sum(ev) AS BIGINT) AS d_events,
         CAST(sum(1 - ev) AS BIGINT) AS c_censored
  FROM obs GROUP BY 1),
k AS (
  SELECT t_day, d_events, c_censored,
         CAST(sum(n_at) OVER (ORDER BY t_day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
           AS n_risk
  FROM g),
q AS (
  SELECT t_day, n_risk, d_events, c_censored,
         CAST(floor(CAST(d_events AS DOUBLE) / CAST(n_risk AS DOUBLE)
              * 1000000000.0 + 0.5) AS BIGINT) AS hq,
         CAST(floor(CAST(d_events AS DOUBLE)
              / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE))
              * 1000000000.0 + 0.5) AS BIGINT) AS vq
  FROM k)
SELECT t_day, n_risk, d_events, c_censored,
       round(CAST(sum(hq) OVER (ORDER BY t_day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             / 1000000000.0 + 0.0, 6) AS cum_hazard,
       round(CAST(sum(vq) OVER (ORDER BY t_day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             / 1000000000.0 + 0.0, 6) AS var_hazard
FROM q
""",
)
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative hazard H(t) = Σ d_i/n_i (+ its Poisson
    variance Σ d_i/n_i²) on the SAME time-to-first-purchase risk table
    as q_km_survival — the hazard-scale view survival analysts pair
    with the product-limit curve (KM ≈ exp(−H) when hazards are
    small); per-step hazards quantize to 1e-9 before the cumulative
    sums, so unlike KM's ordered product the estimator is summation-
    order-free."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(
        F.col("user_id").alias("u"),
        F.date_trunc("day", F.col("ts")).alias("d"),
        "event_type",
    )
    bounds = e.agg(
        F.min("d").alias("dmin"),
        F.datediff(F.max("d"), F.min("d")).alias("tmax"),
    )
    per = (
        e.crossJoin(F.broadcast(bounds))
        .select(
            "u",
            F.datediff(F.col("d"), F.col("dmin")).alias("t"),
            "event_type", "tmax",
        )
        .groupBy("u")
        .agg(
            F.min("t").alias("f"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("t"))
            ).alias("p"),
            F.max("tmax").alias("tmax"),
        )
    )
    follow = F.least(F.lit(_KM_TAU), F.col("tmax") - F.col("f"))
    is_ev = F.col("p").isNotNull() & (F.col("p") - F.col("f") <= follow)
    obs = per.select(
        F.when(is_ev, 1).otherwise(0).alias("ev"),
        F.when(is_ev, F.col("p") - F.col("f")).otherwise(follow)
        .alias("dur"),
    )
    g = obs.groupBy(F.col("dur").alias("t_day")).agg(
        F.count(F.lit(1)).alias("n_at"),
        F.sum("ev").cast("long").alias("d_events"),
        F.sum(1 - F.col("ev")).cast("long").alias("c_censored"),
    )
    w_rev = Window.orderBy("t_day").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    w_cum = Window.orderBy("t_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    k = g.select(
        "t_day", "d_events", "c_censored",
        F.sum("n_at").over(w_rev).cast("long").alias("n_risk"),
    )
    hq = F.floor(
        F.col("d_events").cast("double") / F.col("n_risk").cast("double")
        * F.lit(1000000000.0) + F.lit(0.5)
    ).cast("long")
    vq = F.floor(
        F.col("d_events").cast("double")
        / (F.col("n_risk").cast("double") * F.col("n_risk").cast("double"))
        * F.lit(1000000000.0) + F.lit(0.5)
    ).cast("long")
    q = k.select("t_day", "n_risk", "d_events", "c_censored",
                 hq.alias("hq"), vq.alias("vq"))
    return q.select(
        "t_day", "n_risk", "d_events", "c_censored",
        F.round(
            F.sum("hq").over(w_cum).cast("double") / F.lit(1000000000.0)
            + F.lit(0.0), 6
        ).alias("cum_hazard"),
        F.round(
            F.sum("vq").over(w_cum).cast("double") / F.lit(1000000000.0)
            + F.lit(0.0), 6
        ).alias("var_hazard"),
    )


# ---------------------------------------------------------------------------
# q_conformal — split-conformal interval around an OLS length model
# ---------------------------------------------------------------------------

@register(
    "q_conformal",
    f"""
WITH d AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
         CAST(n_chars AS BIGINT) AS y,
         {_BUCKET_SQL} AS bkt
  FROM documents
),
tr AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM d WHERE bkt >= 5000
),
p AS (
  SELECT n AS n_train,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
         (CAST(sy AS DOUBLE)
          - (CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE))
            * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
  FROM tr
),
cal AS (
  SELECT CAST(floor(abs(CAST(y AS DOUBLE)
              - (p.intercept + p.slope * CAST(x AS DOUBLE)))
              * 1000000.0 + 0.5) AS BIGINT) AS rq
  FROM d, p WHERE bkt < 2500
),
nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
cnt AS (SELECT rq, CAST(count(*) AS BIGINT) AS c FROM cal GROUP BY rq),
qh AS (
  SELECT min(rq) AS qhat_q, max(n_cal) AS n_cal
  FROM (SELECT rq,
               CAST(sum(c) OVER (ORDER BY rq
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum
        FROM cnt) s, nc
  WHERE s.cum >= ((nc.n_cal + 1) * 9 + 9) // 10
),
te AS (
  SELECT CAST(count(*) AS BIGINT) AS n_test,
         CAST(sum(CASE WHEN CAST(floor(abs(CAST(y AS DOUBLE)
              - (p.intercept + p.slope * CAST(x AS DOUBLE)))
              * 1000000.0 + 0.5) AS BIGINT) <= qh.qhat_q
              THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
         max(qh.qhat_q) AS qhat_q, max(qh.n_cal) AS n_cal
  FROM d, p, qh WHERE bkt >= 2500 AND bkt < 5000
)
SELECT p.n_train, te.n_cal, te.n_test, p.slope, p.intercept,
       CAST(te.qhat_q AS DOUBLE) / 1000000.0 AS q_hat,
       te.n_covered,
       CAST(te.n_covered AS DOUBLE) / CAST(te.n_test AS DOUBLE) AS coverage
FROM p, te
""",
)
def q_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval (α = 0.1) around the OLS
    fit of n_chars on token count: train / calibration / test by
    md5-bucket thirds, half-width = the ⌈(n_cal+1)·0.9⌉-th smallest
    calibration residual, empirical test coverage reported — the
    distribution-free uncertainty layer beside the probability
    recalibrators (q_calibration_bins / q_isotonic / q_ece)
    (functions/stats.py ``conformal_interval``)."""
    from .functions.sampling import _bucket
    from .functions.stats import conformal_interval

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = docs.select(
        F.size(F.split(F.col("text"), " ")).cast("long").alias("x"),
        F.col("n_chars").alias("y"),
        _bucket("doc_id").alias("bkt"),
    )
    return conformal_interval(d, "x", "y", "bkt")


# ---------------------------------------------------------------------------
# q_knn_degree — average-neighbour-degree curve of the host graph
# ---------------------------------------------------------------------------

@register(
    "q_knn_degree",
    "WITH " + _LINK_EDGE_CTE + """,
nb AS (
  SELECT bo.a, da.dg AS k,
         CAST(sum(db.dg) AS BIGINT) AS snd,
         CAST(count(*) AS BIGINT) AS nn
  FROM bo JOIN deg da ON da.a = bo.a JOIN deg db ON db.a = bo.b
  GROUP BY bo.a, da.dg
),
pn AS (
  SELECT k,
         CAST(floor(CAST(snd AS DOUBLE) / CAST(nn AS DOUBLE)
              * 1000000000.0 + 0.5) AS BIGINT) AS mq
  FROM nb
)
SELECT CAST(k AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_nodes,
       round(CAST(sum(mq) AS BIGINT) / CAST(count(*) AS DOUBLE)
             / 1000000000.0 + 0.0, 6) AS knn
FROM pn GROUP BY k
""",
)
def q_knn_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average-neighbour-degree curve knn(k) of the undirected host
    graph — the degree-resolved view of q_degree_assortativity's
    single coefficient (decreasing knn(k) = disassortative hub
    structure, the normal web shape).  Per-node neighbour-degree means
    quantize to 1e-9 before the per-k average; all counts exact."""
    from pyspark.sql import Window  # noqa: F401

    from .functions.links import host_link_graph

    edges = host_link_graph(_link_pages_df(spark, sf_dir))
    und = (
        edges.select(
            F.least("src_host", "dst_host").alias("ua"),
            F.greatest("src_host", "dst_host").alias("ub"),
        )
        .filter(F.col("ua") != F.col("ub"))
        .distinct()
    )
    bo = und.select(F.col("ua").alias("a"), F.col("ub").alias("b")).unionByName(
        und.select(F.col("ub").alias("a"), F.col("ua").alias("b"))
    )
    deg = bo.groupBy("a").agg(F.count(F.lit(1)).alias("dg"))
    nb = (
        bo.join(deg.select(F.col("a"), F.col("dg").alias("k")), "a")
        .join(deg.select(F.col("a").alias("b"), F.col("dg").alias("nd")), "b")
        .groupBy("a", "k")
        .agg(
            F.sum("nd").cast("long").alias("snd"),
            F.count(F.lit(1)).cast("long").alias("nn"),
        )
    )
    pn = nb.select(
        "k",
        F.floor(
            F.col("snd").cast("double") / F.col("nn").cast("double")
            * F.lit(1000000000.0) + F.lit(0.5)
        ).cast("long").alias("mq"),
    )
    return pn.groupBy(F.col("k").cast("long").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.round(
            F.sum("mq").cast("double") / F.count(F.lit(1)).cast("double")
            / F.lit(1000000000.0) + F.lit(0.0), 6
        ).alias("knn"),
    )


# ---------------------------------------------------------------------------
# q_lorenz — per-source Lorenz curve deciles of document length
# ---------------------------------------------------------------------------

@register(
    "q_lorenz",
    """
WITH r AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents
),
d AS (
  SELECT source, CAST(((rn - 1) * 10) // n AS BIGINT) AS decile,
         n_chars
  FROM r
),
g AS (
  SELECT source, decile, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS chars
  FROM d GROUP BY source, decile
)
SELECT source, decile, n_docs,
       CAST(sum(chars) OVER (PARTITION BY source ORDER BY decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_chars,
       CAST(sum(chars) OVER (PARTITION BY source ORDER BY decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         / CAST(sum(chars) OVER (PARTITION BY source) AS DOUBLE) AS cum_share
FROM g
""",
)
def q_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Lorenz curve at decile resolution — the
    curve-level view of q_length_gini's single inequality number
    (cum_share(d) far below d/10 = a few giant documents dominate the
    source's bytes, the dedup/pricing signal).  Deterministic
    (n_chars, doc_id) ranking, exact integer cumulative sums, one
    division."""
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wr = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("source")
    d = docs.select(
        "source", "n_chars",
        F.floor(
            ((F.row_number().over(wr) - 1) * 10)
            / F.count(F.lit(1)).over(wn)
        ).cast("long").alias("decile"),
    )
    g = d.groupBy("source", "decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars"),
    )
    wc = Window.partitionBy("source").orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return g.select(
        "source", "decile", "n_docs",
        F.sum("chars").over(wc).cast("long").alias("cum_chars"),
        (
            F.sum("chars").over(wc).cast("double")
            / F.sum("chars").over(wn).cast("double")
        ).alias("cum_share"),
    )
