"""Complete-output-mode streaming aggregation (memory sink).

The engine's streaming surface covers append mode everywhere (file
sinks, watermarked joins/windows) and update-shaped state via
foreachBatch MERGE and applyInPandasWithState; COMPLETE mode is the
remaining writeStream contract: the sink receives the ENTIRE result
table every trigger, which is only sane when the aggregate is
dimension-sized — exactly the "live leaderboard" shape (top event
types, top hosts) a crawl dashboard keeps.

Semantics under ``Trigger.AvailableNow``: the final micro-batch's
emission IS the full aggregate over everything drained, so the last
table state equals the batch groupBy — which is what the gate oracle
checks.  Complete mode needs no watermark (state is the whole result
by definition) and pairs with the in-memory sink, the one sink that
can swap its contents atomically per trigger.

Scale note: complete mode re-emits the whole table per trigger, so it
is ONLY for dim-sized aggregates (the result here is |event types|
rows); anything keyed by user/document belongs in update/append with
a watermark instead — that contract is the point of this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sessionize import EVENT_SCHEMA

__all__ = ["complete_type_counts"]


def complete_type_counts(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    query_name: str = "type_counts",
) -> DataFrame:
    """Drain the event feed through an unwatermarked global aggregate
    in COMPLETE mode to the memory sink and return the final table:
    one row per event_type with its total count and exact value sum
    (µ-quantized long).  Blocking AvailableNow run; the returned
    DataFrame reads the sink's last swap."""
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(source_dir)
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("value_q"),
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
