"""Toponym geoparsing — the webtext → geospatial bridge.

A greenness-exposure pipeline over web text needs to go from *place
mentions in prose* to *coordinates it can join against rasters and
greenspace layers* (the reference resolves addresses through a geocoder
before every availability/accessibility computation; here the same
resolution step runs corpus-wide as a relational plan).

`geoparse` is deliberately fixture-free (AST-guarded): the caller
supplies the gazetteer DataFrame and the mention regex; composition with
grid cells / NDVI happens in the gate query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def geoparse(
    df: DataFrame,
    gazetteer: DataFrame,
    pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    name_col: str = "name",
) -> DataFrame:
    """[doc_id, name, *gazetteer columns] — one row per RESOLVED place
    mention: all regex matches of ``pattern`` in the text, equi-joined
    against the gazetteer on the mention string.  Mentions absent from
    the gazetteer drop out (the resolution gap is visible as missing
    rows; callers needing recall stats left-join instead).

    Shape: extraction is a codegen ``regexp_extract_all`` + explode (no
    Python in the loop); the gazetteer — even a planet-scale OSM place
    list is ~10⁷ short rows — is the canonical broadcast dim, so
    resolution is a BroadcastHashJoin on the mention string and the
    corpus never shuffles.  Per-doc mention counts stay bounded by text
    length; there is no corpus-wide state.
    """
    mentions = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)
        ).alias(name_col),
    )
    return mentions.join(F.broadcast(gazetteer), name_col, "inner").select(
        id_col, name_col, *[c for c in gazetteer.columns if c != name_col]
    )
