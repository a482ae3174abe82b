"""Incremental ingest of the web-pages table (Structured Streaming).

The reference is batch-only; the engine's streaming obligations come
from the north rule's resumability requirement (SURVEY.md §2.10).  This
module gives the idiomatic incremental path: ``readStream`` over the
documents table directory with ``Trigger.AvailableNow`` — each run
drains exactly the files not yet recorded in the checkpoint, geocodes
and cell-assigns them, and appends to the points sink.  Re-runs after
new crawl batches land process only the delta; the checkpoint directory
IS the resume state.

``windowed_counts`` adds the watermarked event-time path (late-arriving
crawl batches): counts per cell per 1-hour ``warc_ts`` window, 2-hour
watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data.synth import DOC_SCHEMA, geocode


def geocode_stream(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain all currently-available document files → geocoded points
    parquet sink.  Blocking (awaitTermination); AvailableNow semantics
    make this an incremental batch."""
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(source_dir)
    pts = geocode(stream).select("url", "warc_ts", "lang", "x", "y", "cell")
    q = (
        pts.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_counts(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """Watermarked per-cell/per-window page counts (late-data path)."""
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(source_dir)
    pts = geocode(stream)
    agg = (
        pts.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), F.col("cell"))
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "cell", "n_pages",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_event_stream(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    key_cols: list[str] | None = None,
    watermark: str = "30 days",
) -> None:
    """Streaming exactly-once key dedup: ``dropDuplicatesWithinWatermark``
    over the event stream — the at-least-once→exactly-once repair stage
    every replayed/overlapping crawl or event feed needs.  State holds
    one entry per key only until the watermark passes its event time +
    delay, so memory is bounded by the duplicate horizon, not stream
    length (the unbounded-state trap of plain ``dropDuplicates`` on a
    stream).  Duplicates inside one micro-batch and across batches
    within the horizon are both collapsed; the batch twin is DISTINCT
    on the key, which is exactly what the gate oracle runs."""
    from .sessionize import EVENT_SCHEMA

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(source_dir)
    deduped = (
        stream.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(key_cols or ["event_id"])
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_event_counts(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    window: str = "1 day",
    watermark: str = "2 days",
    slide: str | None = None,
) -> None:
    """Watermarked tumbling-window counts per event type over the
    event stream (append mode): only windows the final watermark has
    CLOSED reach the sink — late events inside the 2-day horizon still
    land in their true window, later ones are dropped.  This is the
    canonical Structured-Streaming windowed aggregate (partial aggs in
    the state store, one shuffle on the window/type key); the batch
    twin is a date_trunc GROUP BY, which is exactly what the gate
    oracle runs plus the watermark closure rule.

    ``slide`` < ``window`` turns the tumbling aggregate into SLIDING
    (hopping) windows: each event lands in window/slide overlapping
    windows (Spark plans this as one generator expand before the same
    stateful agg — state grows by the overlap factor, which is why
    production slides are coarse).  The batch twin replicates the
    expansion with an explicit offset cross join.
    """
    from .sessionize import EVENT_SCHEMA

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(source_dir)
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(win, F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type", "n_events",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def enriched_windowed_counts(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    dim: DataFrame,
    dim_key: str = "user_id",
    dim_attr: str = "segment",
    window: str = "1 day",
    watermark: str = "2 days",
) -> None:
    """Stream-STATIC enrichment join + watermarked windowed aggregate:
    the event stream joins a static dimension table (user → segment)
    before the stateful count — the most common production streaming
    shape (enrich-then-aggregate) and the one join surface the
    stream-stream gate (q_stream_join) doesn't cover.

    Spark plans the static side as a broadcast re-evaluated per
    micro-batch, so no state accrues for the dim; only the windowed
    counts live in the state store.  Append mode — a (window, segment)
    row reaches the sink iff the final watermark closed it, which is
    exactly the closure predicate the batch-twin oracle applies.
    """
    from .sessionize import EVENT_SCHEMA

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(source_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .join(F.broadcast(dim.select(dim_key, dim_attr)), dim_key)
        .groupBy(F.window("ts", window), F.col(dim_attr))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            dim_attr, "n_events",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def session_window_counts(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 days",
) -> None:
    """NATIVE session-window aggregate per user (append mode) — the
    built-in ``F.session_window`` state machine, as opposed to the
    custom ``applyInPandasWithState`` sessionizer in
    streaming/sessionize.py: Spark merges an event into an open
    session iff its window [t, t+gap) OVERLAPS the session (strictly
    — a gap of exactly ``gap`` starts a NEW session, unlike the
    ``>``-gap batch sessionizer), sets session end = last event time
    + gap, and emits a session iff the final watermark has passed its
    end.  State is one merged window per open (user, session); the
    shuffle is keyed by user only."""
    from .sessionize import EVENT_SCHEMA

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(source_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("sess_start"),
            F.col("session_window.end").alias("sess_end"),
            "user_id", "n_events",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
