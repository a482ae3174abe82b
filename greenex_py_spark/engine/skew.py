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


def hot_cells(
    points: DataFrame,
    threshold: int,
    cell_col: str = "cell",
    sample_frac: float | None = None,
) -> DataFrame:
    """Cells with more than ``threshold`` rows.  ``sample_frac`` switches
    to SAMPLED detection (seeded, threshold scaled by the fraction):
    hotness only routes rows between two exact join paths, so a
    borderline cell flipping sides changes cost, never results — and the
    full-corpus histogram was the single most expensive stage of the
    hybrid (an extra full pass + shuffle over the probe, measured 1.8 s
    of the 3.3 s hybrid at 1M rows).  Truly hot keys (the reason salting
    exists) are orders of magnitude above threshold and never flip."""
    src = points
    thr: float = threshold
    if sample_frac is not None and sample_frac < 1.0:
        src = points.sample(fraction=sample_frac, seed=42)
        thr = threshold * sample_frac
    return (
        cell_histogram(src, cell_col)
        .filter(F.col("n_rows") > thr)
        .select(cell_col)
    )


def plan_salted_cell_join(
    probe: DataFrame,
    build: DataFrame,
    threshold: int,
    n_salt: int = 8,
    cell_col: str = "cell",
    sample_frac: float | None = 0.05,
) -> DataFrame:
    """Hybrid cell join: hot-cell probe rows through the salted shuffle
    path, cold-cell rows through the broadcast path; union of both is
    row-identical to the plain equi-join (tests/test_skew.py).

    Cost envelope (measured at 1M probe rows, BENCH/SALTED.md): the
    hybrid re-evaluates the probe subtree once per branch (union of two
    filters — no automatic subtree reuse) plus once for hot-cell
    detection, so its floor is ~3× the probe scan plus one shuffle of
    the hot share.  Sampled detection (default 5%) removes most of the
    detection pass; build-side replication is negligible (×n_salt on
    hot cells only — 15 of 952 cover rows in the bench city)."""
    from ..operators.spatial_join import salt_join

    # The hot set is referenced at three join sites (route split + both
    # salt_join sides) but is evaluated ONCE per action: the three
    # broadcasts are the identical subtree and ReuseExchange dedupes
    # them (a localCheckpoint here measured SLOWER — it breaks exchange
    # reuse and adds an eager materialization job per plan build).
    hot = hot_cells(probe, threshold, cell_col, sample_frac=sample_frac)
    hot_b = F.broadcast(hot.withColumn("_is_hot", F.lit(True)))
    p = probe.join(hot_b, cell_col, "left")
    p_hot = p.filter(F.col("_is_hot").isNotNull()).drop("_is_hot")
    p_cold = p.filter(F.col("_is_hot").isNull()).drop("_is_hot")
    cold_joined = p_cold.join(F.broadcast(build), cell_col)
    hot_joined = salt_join(p_hot, build, cell_col, hot, n_salt=n_salt)
    return cold_joined.unionByName(hot_joined, allowMissingColumns=True)
