"""Registry of driver-checkable queries (the CORRECTNESS gate).

Each entry pairs a Spark implementation (an engine operator run over the
deterministic driver-city inputs, see data/driver_city.py) with the
equivalent DuckDB SQL over the same parquet tables.  Column names/aliases
match exactly; all formulas come from the shared driver_city module so
the two sides cannot drift.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
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
    return zonal_mean_std(pts, tiles, radius=_NDVI_R, id_col="doc_id", out_prefix="NDVI")


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
        pts, tiles, radius=_LC_R, class_values=list(city.LC_CLASSES), id_col="doc_id"
    )


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


# ---------------------------------------------------------------------------
# entry() flagship: geocode → cell assignment → PiP join (sf0.001)
# ---------------------------------------------------------------------------

def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    from .operators.spatial_join import point_in_rect_join

    pts = city.with_cell(city.points_df(spark, sf_dir))
    greens = city.greenspace_df(spark)
    joined = point_in_rect_join(pts, greens, point_key="doc_id")
    return joined.select("doc_id", "x", "y", "cell", "gs_id")
