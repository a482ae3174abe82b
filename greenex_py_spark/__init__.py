"""greenex_py_spark — a from-scratch PySpark-native greenness-exposure engine.

Re-expresses the query/data-processing capabilities of the reference
``Spatial-Data-Science-and-GEO-AI-Lab/GreenEx_Py`` (a single-process
geopandas/OSMnx/rasterio pipeline) as a distributed spatial-join + tiling
pipeline over Spark DataFrames:

- availability  : zonal raster stats (mean NDVI, landcover %, canopy %,
                  greenspace %) over Euclidean / network buffers
- accessibility : distance-to-nearest greenspace (kNN join + clamp semantics)
- visibility    : viewshed GVI over DSM/DTM tiles, streetview GVI aggregation

plus the web-scale text/data-pipeline operators a 100 TB training-data
pipeline needs (dedup families, ANN similarity, language-ID/quality/token
stats, multimodal binary-column plumbing).

All geometry/raster math is pure NumPy inside Arrow-vectorized pandas UDFs
(no shapely/rasterio/geopandas dependency); all relational shape is plain
DataFrame API so Catalyst/AQE optimize it.
"""

__version__ = "0.1.0"
