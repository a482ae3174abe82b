"""Small-file compaction planning (Iceberg ``rewrite_data_files`` shape).

The reference never thinks about files; a 100 TB table accumulates
millions of undersized data files (streaming ingest, per-shard writes)
and every scan pays an open() per file.  Compaction planning — group
small files into target-sized output bins WITHOUT moving any data —
is a pure metadata query over the file manifest, and that is exactly
how Iceberg's binpack planner and Spark's own
``spark.sql.files.maxPartitionBytes`` coalescer work: order files
within a partition, accumulate sizes, cut a new output bin every
``target_bytes``.

``compaction_plan`` is the closed-form variant: ``bin_id =
floor(exclusive_cumsum / target)`` — a file that straddles a boundary
joins the bin it started in (the FileScan coalescer's rule), so the
plan is a single window cumsum per table partition.  No greedy loop,
no driver state, deterministic for any input order of the manifest.

Scale shape: the window is partitioned by the TABLE partition column —
one task per partition, no global sort, no shuffle wider than the
manifest itself (which is metadata: ~1e6 rows per 100 TB).  Everything
is integer-exact until the final double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["compaction_plan"]


def compaction_plan(
    files: DataFrame,
    target_bytes: float,
    partition_col: str = "source",
    file_col: str = "file_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """files[partition, file_id, bytes] → one row per planned output bin:

    [partition_col, bin_id, n_files, bin_bytes, first_file, last_file]

    Files are taken in ``file_col`` order within each partition (the
    manifest's deterministic order); ``bin_id = floor(excl_cumsum /
    target_bytes)`` with the straddling file kept in its starting bin.
    ``bin_bytes`` is an exact integer sum; bins therefore may overshoot
    ``target_bytes`` by at most one file — the binpack contract.
    """
    w = (
        Window.partitionBy(partition_col)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(bytes_col).over(w), F.lit(0)).cast("double")
    binned = files.withColumn(
        "bin_id", F.floor(cum / F.lit(float(target_bytes))).cast("long")
    )
    return (
        binned.groupBy(partition_col, "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(bytes_col).alias("bin_bytes"),
            F.min(file_col).alias("first_file"),
            F.max(file_col).alias("last_file"),
        )
    )
