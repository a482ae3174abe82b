"""Z-order (Morton) data layout for write-time spatial clustering.

The reference is single-machine and never thinks about file layout; at
100 TB the dominant cost of every spatial query is how many parquet
files a cell-range predicate has to open.  Clustering rows by a
space-filling curve before writing (Delta/Iceberg ``OPTIMIZE ZORDER``
style) turns a 2-D cell-range scan into a handful of contiguous file
ranges, because Morton order preserves 2-D locality: a k x k cell block
spans O(k) curve ranges instead of O(k^2) scattered files.

``zorder_key`` is the pure-codegen Column twin of the NumPy
``geo/cells.morton_cell`` (same bit-spread, same key space) — the NumPy
one serves write-time pandas batches, this one lets the ENGINE sort /
range-partition with Catalyst so the layout job itself is a shuffle-free
projection plus Spark's own range exchange.

``zorder_layout_stats`` bins keys into fixed-width curve ranges
(``file_id = zkey >> shift`` — purely map-side, no global sort, the
static-binning variant; Spark's ``repartitionByRange(zkey)`` is the
balanced-file alternative when a sampled sort is acceptable) and reports
per-file locality: how many distinct cells and how tight a bbox each
file covers.  Everything is integer-exact — bit ops both engines share.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_layout_stats", "ZORDER_SQL"]

_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread(col: Column) -> Column:
    """Interleave-ready bit spread: abcd -> 0a0b0c0d (codegen twin of
    geo/cells.morton_cell's ``_part``; input must be in [0, 2^32))."""
    v = col.cast("long")
    for shift, mask in _MASKS:
        v = v.bitwiseOR(F.shiftleft(v, shift)).bitwiseAND(F.lit(mask))
    return v


def zorder_key(gx: Column, gy: Column) -> Column:
    """Morton key of non-negative grid coords (gx in even bits, gy in
    odd — same convention as geo/cells.morton_cell, so keys computed at
    ingest and by the engine agree bit-for-bit)."""
    return _spread(gx).bitwiseOR(F.shiftleft(_spread(gy), 1))


def _spread_sql(expr: str) -> str:
    v = f"CAST({expr} AS BIGINT)"
    for shift, mask in _MASKS:
        v = f"(({v} | ({v} << {shift})) & {mask})"
    return v


# SQL twin of zorder_key (DuckDB and Spark SQL share <<, &, | on BIGINT)
# — rendered from the same _MASKS table so the two cannot drift.  NOTE
# the naive textual expansion would nest the whole subtree once per
# stage; callers must bind {gx}/{gy} to simple column references.
ZORDER_SQL = "({sgx} | ({sgy} << 1))"


def zorder_sql(gx_expr: str, gy_expr: str) -> str:
    """Render the Morton-key SQL for two simple column references."""
    return ZORDER_SQL.format(sgx=_spread_sql(gx_expr), sgy=_spread_sql(gy_expr))


def zorder_layout_stats(
    rows: DataFrame,
    shift: int,
    gx_col: str = "gx",
    gy_col: str = "gy",
) -> DataFrame:
    """[file_id, n_rows, n_cells, gx_span, gy_span, zmin, zmax] — assign
    every row to the fixed-width curve range ``zkey >> shift`` and
    report per-file locality (distinct cells, bbox side lengths).

    The assignment is a map-side projection — no shuffle until the
    per-file aggregate, which is two-phase on the (bounded) file-id key.
    """
    z = zorder_key(F.col(gx_col), F.col(gy_col))
    keyed = rows.select(
        F.col(gx_col).alias("gx"), F.col(gy_col).alias("gy"), z.alias("zkey")
    )
    return (
        keyed.withColumn("file_id", F.shiftright(F.col("zkey"), shift))
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.count_distinct("gx", "gy").alias("n_cells"),
            (F.max("gx") - F.min("gx") + 1).alias("gx_span"),
            (F.max("gy") - F.min("gy") + 1).alias("gy_span"),
            F.min("zkey").alias("zmin"),
            F.max("zkey").alias("zmax"),
        )
    )
