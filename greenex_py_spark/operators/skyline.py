"""Skyline (Pareto-frontier) query — the maximal points under
coordinate-wise dominance.

The classic multi-criteria selection operator (Börzsönyi et al., ICDE
2001): a row is on the skyline iff no other row is >= on BOTH metrics
and > on at least one.  A crawl-curation pipeline uses it to shortlist
documents that are not dominated on (quality, length) — no weighting
parameter to tune, unlike a scored top-k.

2-D skylines need no pairwise join: group rows by x, keep each group's
max y, then a single ordered window over the DISTINCT x values marks
the groups whose ymax strictly exceeds every ymax at larger x.  That is
two map-side-combinable aggregates + one window over |distinct x| rows
— the same shape at 10^12 rows as at 10^3, because everything after the
first groupBy is frontier-sized.  Ties: duplicate (x, y) points neither
dominate each other, so all of them stay (NOT-EXISTS semantics).

Integer metrics only (the engine's exactness contract): dominance
compares are then identical on every engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["skyline_2d"]


def skyline_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Rows of ``df`` on the maximise-(x, y) Pareto frontier.

    A row survives iff ``y == max(y | same x)`` and that group maximum
    strictly exceeds ``max(y | x' > x)`` — together equivalent to "no
    row is >= in both coordinates and > in one".
    """
    g = (
        df.groupBy(x_col)
        .agg(F.max(y_col).alias("_ymax"))
        # frontier-sized (one row per distinct x); checkpoint so the
        # join back to the full table doesn't re-run the base scan
        .localCheckpoint()
    )
    w = (
        Window.orderBy(F.col(x_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fronts = (
        g.withColumn("_prev", F.max("_ymax").over(w))
        .filter(F.col("_prev").isNull() | (F.col("_ymax") > F.col("_prev")))
        .select(x_col, "_ymax")
    )
    return (
        df.join(F.broadcast(fronts), x_col)
        .filter(F.col(y_col) == F.col("_ymax"))
        .drop("_ymax")
    )
