"""Skew diagnosis + salting plan (north-star "salted broadcast/shuffle
hybrid").

Urban-core cells concentrate a large share of geocoded points (the
synthetic city plants 60% in 1% of the area, matching real crawl
geodata).  AQE's skew-join splitting handles moderately hot *partitions*
but cannot split a single giant *key*; for those the engine salts:

1. :func:`cell_histogram` — one cheap count per cell (map-side combine);
2. :func:`hot_cells`     — keys above ``threshold`` rows;
3. :func:`spatial_join.salt_join` — probe rows on hot keys get a salt
   from a row hash, build rows are replicated ×n_salt; cold keys keep
   salt 0 on both sides, so results are exactly the unsalted join's.

The hybrid: cold cells ride the broadcast join; hot cells take the
salted shuffle.  ``plan_salted_cell_join`` wires the split + union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cell_histogram(points: DataFrame, cell_col: str = "cell") -> DataFrame:
    return points.groupBy(cell_col).agg(F.count("*").alias("n_rows"))


def hot_cells(points: DataFrame, threshold: int, cell_col: str = "cell") -> DataFrame:
    return (
        cell_histogram(points, cell_col)
        .filter(F.col("n_rows") > threshold)
        .select(cell_col)
    )


def plan_salted_cell_join(
    probe: DataFrame,
    build: DataFrame,
    threshold: int,
    n_salt: int = 8,
    cell_col: str = "cell",
) -> DataFrame:
    """Hybrid cell join: hot-cell probe rows through the salted shuffle
    path, cold-cell rows through the broadcast path; union of both is
    row-identical to the plain equi-join."""
    from ..operators.spatial_join import salt_join

    hot = hot_cells(probe, threshold, cell_col)
    hot_b = F.broadcast(hot.withColumn("_is_hot", F.lit(True)))
    p = probe.join(hot_b, cell_col, "left")
    p_hot = p.filter(F.col("_is_hot").isNotNull()).drop("_is_hot")
    p_cold = p.filter(F.col("_is_hot").isNull()).drop("_is_hot")
    cold_joined = p_cold.join(F.broadcast(build), cell_col)
    hot_joined = salt_join(p_hot, build, cell_col, hot, n_salt=n_salt)
    return cold_joined.unionByName(hot_joined, allowMissingColumns=True)
