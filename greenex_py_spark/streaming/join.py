"""Watermarked stream-stream event-time joins.

The last Structured Streaming join shape the engine's streaming surface
lacked: two live event feeds joined on a key plus an event-time range,
with watermarks on BOTH sides so the join state store is bounded by the
time-range horizon instead of growing with stream length (the
unbounded-state trap of an unwatermarked stream-stream join).

Semantics (inner join): a match is emitted in the micro-batch where
both rows have arrived; completeness under ``Trigger.AvailableNow``
needs no closing empty delta because inner-join emission is eager —
watermarks here exist purely for state eviction.  The batch twin is the
identical range join on the static tables, which is what the gate
oracle runs (reference has no streaming at all; this extends the
north-rule resumability surface, SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .sessionize import EVENT_SCHEMA


def stream_stream_join(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    key: str = "user_id",
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """Drain two event-file feeds through a watermarked inner
    stream-stream join: ``l.key = r.key AND r.ts in [l.ts,
    l.ts + max_gap]``.  State on the left side lives ``max_gap`` past
    the right watermark and is then evicted — bounded by the join
    horizon.  Emits one row per matched pair (ids, key, both
    timestamps) to an append parquet sink; blocking AvailableNow run.
    """
    lf = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(left_dir)
        .select(
            F.col("event_id").alias("l_id"),
            F.col(key).alias("k"),
            F.col("ts").alias("l_ts"),
        )
        .withWatermark("l_ts", watermark)
    )
    rf = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(right_dir)
        .select(
            F.col("event_id").alias("r_id"),
            F.col(key).alias("rk"),
            F.col("ts").alias("r_ts"),
        )
        .withWatermark("r_ts", watermark)
    )
    joined = lf.join(
        rf,
        (F.col("k") == F.col("rk"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_gap}")),
        "inner",
    ).select("l_id", "r_id", "k", "l_ts", "r_ts")
    q = (
        joined.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_stream_left_join(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    key: str = "user_id",
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """LEFT-OUTER watermarked stream-stream join — the shape inner
    joins cannot express: a left row that finds no right match within
    the event-time horizon is emitted WITH NULLS, but only once the
    global watermark has passed its state-eviction point (until then
    a match could still arrive), so null emission is a watermark
    side-effect, not an eager result.  This is the
    abandoned-view / unconverted-session detector of the funnel
    family, now as a live stream.

    Completeness under ``Trigger.AvailableNow``: unmatched state for
    rows near the end of the feed is only flushed if the final
    watermark passes them — callers must append a FLUSH row (sentinel
    key) with a timestamp beyond max(ts) + watermark + gap to BOTH
    feeds (the global watermark is the min across inputs); Spark's
    no-data micro-batch then evicts and emits the remaining outer
    rows.  State is bounded by the horizon exactly as in
    :func:`stream_stream_join`."""
    lf = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(left_dir)
        .select(
            F.col("event_id").alias("l_id"),
            F.col(key).alias("k"),
            F.col("ts").alias("l_ts"),
        )
        .withWatermark("l_ts", watermark)
    )
    rf = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(right_dir)
        .select(
            F.col("event_id").alias("r_id"),
            F.col(key).alias("rk"),
            F.col("ts").alias("r_ts"),
        )
        .withWatermark("r_ts", watermark)
    )
    joined = lf.join(
        rf,
        (F.col("k") == F.col("rk"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_gap}")),
        "leftOuter",
    ).select("l_id", "r_id", "k", "l_ts", "r_ts")
    q = (
        joined.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
