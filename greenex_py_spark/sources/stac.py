"""STAC catalog-table selection (S5/S6 in SURVEY.md §2.1).

The reference queries Planetary Computer for Sentinel-2 items over the
AoI bbox/date range with ``eo:cloud_cover < 20`` and loads the item
with the LOWEST cloud cover (GreenExp/availability.py:156-177; ties
resolved by taking the first item, :173-175).  The HTTP fetch is an
external service (out of engine scope per SURVEY); the in-scope part is
the *catalog-table* model and the selection relational logic: a STAC
search result is just a table of items, and at 100 TB the catalog IS a
table (an Iceberg metadata-style listing), so selection is a filter +
order + limit Catalyst owns end-to-end.

Item-table contract: ``[item_id, minx, miny, maxx, maxy (WGS84 bbox),
datetime, cloud_cover, asset_href]``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_items(
    items: DataFrame,
    minx: float, miny: float, maxx: float, maxy: float,
    start: str | None = None,
    end: str | None = None,
    max_cloud: float = 20.0,
) -> DataFrame:
    """Items whose footprint CONTAINS the whole AoI bbox, within the
    date range and under the cloud threshold — the reference first
    searches by intersection (availability.py:158-163,
    ``eo:cloud_cover lt 20``) and then keeps only items whose geometry
    ``contains`` the AoI box (availability.py:169), so a low-cloud item
    covering half the AoI must NOT win."""
    f = items.filter(
        (F.col("minx") <= minx) & (F.col("maxx") >= maxx)
        & (F.col("miny") <= miny) & (F.col("maxy") >= maxy)
        & (F.col("cloud_cover") < max_cloud)
    )
    if start is not None:
        f = f.filter(F.col("datetime") >= F.lit(start).cast("timestamp"))
    if end is not None:
        f = f.filter(F.col("datetime") <= F.lit(end).cast("timestamp"))
    return f


def least_cloudy_item(
    items: DataFrame,
    minx: float, miny: float, maxx: float, maxy: float,
    start: str | None = None,
    end: str | None = None,
    max_cloud: float = 20.0,
) -> DataFrame:
    """THE item the reference loads (availability.py:170-175): lowest
    cloud cover among matches, first on ties (item_id order makes the
    tie-break deterministic — the reference takes pandas row 0)."""
    return (
        filter_items(items, minx, miny, maxx, maxy, start, end, max_cloud)
        .orderBy(F.col("cloud_cover").asc(), F.col("item_id").asc())
        .limit(1)
    )
