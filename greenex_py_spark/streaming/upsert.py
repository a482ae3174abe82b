"""Streaming MERGE sink — foreachBatch copy-on-write upserts.

The one Structured-Streaming sink surface the append-mode gates don't
cover: a CDC stream applied transactionally to a keyed snapshot table
(the Delta/Iceberg ``MERGE`` streaming pattern).  Each micro-batch runs
:func:`greenex_py_spark.engine.cdc.merge_apply` against the current
table version, writes the merged result to a NEW version directory,
then swaps the table pointer — copy-on-write, so a crash mid-write
never corrupts the readable version, and replaying a batch after a
checkpoint recovery is idempotent (same keys upserted/deleted again).

Scale shape: each batch is one anti-join + union sliver against the
snapshot (see merge_apply); the stream's state store holds nothing —
exactly-once comes from the checkpoint's batch-id fencing plus the
idempotent merge.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType


def stream_merge_apply(
    spark: SparkSession,
    source_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    schema: StructType | str,
    key_col: str = "doc_id",
    value_col: str = "text",
    status_col: str = "status",
) -> None:
    """Drain all available CDC batch files (one micro-batch per file —
    ``maxFilesPerTrigger=1``) and MERGE each into the parquet table at
    ``table_dir``.  Blocking; AvailableNow semantics."""
    from ..engine.cdc import merge_apply

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )

    def apply_batch(batch_df, batch_id: int) -> None:
        target = spark.read.parquet(table_dir)
        merged = merge_apply(
            target, batch_df, key_col=key_col,
            value_col=value_col, status_col=status_col,
        )
        staged = f"{table_dir}__v{batch_id}"
        merged.write.mode("overwrite").parquet(staged)  # reads old version
        shutil.rmtree(table_dir)
        os.rename(staged, table_dir)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
