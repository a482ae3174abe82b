"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY.md §2.10 "custom stateful operators"
— the streaming twin of the batch window-function q_sessionize).

Semantics (identical to the batch definition): a user's events belong
to one session while consecutive gaps stay ≤ ``gap``; a session CLOSES
when the event-time watermark passes ``session_end + gap`` (no more
in-order events can extend it) and is emitted exactly once as
``[user_id, sess_start, sess_end, n_events]``.

State per user = the open session (start, end, count) plus a buffer-free
design: events inside a micro-batch are sorted and folded in pandas;
cross-batch continuation lives in GroupState.  An event-time timeout
fires when the watermark passes the open session's expiry, closing it
even if the user never appears again — the property that makes this a
true stateful operator rather than a windowed agg.

Caveat shared with every gap-session implementation on streams: events
arriving later than the watermark delay are dropped by Spark before the
operator (the watermark contract); the batch twin sees them.  The
equivalence test therefore compares CLOSED sessions against the batch
result on in-watermark data (tests/test_engine.py).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

_OUT_SCHEMA = "user_id long, sess_start timestamp, sess_end timestamp, n_events long"
_STATE_SCHEMA = "start long, end long, n long"  # epoch-us


def _fold(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState, gap_us: int
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    closed: list[tuple] = []
    if state.hasTimedOut:
        if state.exists:
            s, e, n = state.get
            closed.append((user_id, s, e, n))
            state.remove()
    else:
        ts_list: list[int] = []
        for pdf in pdf_iter:
            # timestamps arrive as datetime64; fold in int64 epoch-µs
            ts_list.extend(pdf["ts"].astype("datetime64[us]").astype("int64").tolist())
        # Interval sort-merge of {open session} ∪ {new events}: because a
        # session's interior consecutive gaps are ≤ gap by construction,
        # merging intervals whose boundary gap is ≤ gap is EXACTLY
        # re-sessionizing the union of the underlying points.  This
        # handles cross-batch out-of-order arrivals (in-watermark events
        # earlier than the open session's start): within gap they extend
        # the session backward (sess_start moves down); beyond gap they
        # form their own earlier session, emitted closed below because a
        # successor session exists.
        items: list[tuple[int, int, int]] = [(t, t, 1) for t in ts_list]
        if state.exists:
            s, e, n = state.get
            items.append((int(s), int(e), int(n)))
        items.sort()
        merged: list[list[int]] = []
        for a, b, cnt in items:
            if merged and a - merged[-1][1] <= gap_us:
                merged[-1][1] = max(merged[-1][1], b)
                merged[-1][2] += cnt
            else:
                merged.append([a, b, cnt])
        # every session with a successor in the drain is closed (the
        # oracle's `sess_no < last_sess` rule)
        closed.extend((user_id, a, b, cnt) for a, b, cnt in merged[:-1])
        if merged:
            s, e, n = merged[-1]
            # timeout fires when the watermark strictly passes end + gap
            timeout_ms = (int(e) + gap_us) // 1000 + 1
            if state.getCurrentWatermarkMs() > timeout_ms:
                # expiry already behind the watermark: no in-watermark
                # event can extend it (any future t ≥ wm > e+gap), and
                # setTimeoutTimestamp(≤ wm) would throw — close now
                closed.append((user_id, s, e, n))
                if state.exists:
                    state.remove()
            else:
                state.update((int(s), int(e), int(n)))
                state.setTimeoutTimestamp(timeout_ms)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "sess_start": pd.to_datetime([c[1] for c in closed], unit="us"),
                "sess_end": pd.to_datetime([c[2] for c in closed], unit="us"),
                "n_events": [c[3] for c in closed],
            }
        )


def sessionize_stream(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    watermark: str = "1 minute",
    state_partitions: int | None = 8,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain available event files → closed-session parquet sink
    (AvailableNow incremental batch; re-runs process only new files and
    carry open sessions in the checkpointed state store).

    ``state_partitions`` pins the stateful-operator partition count for
    the stream's FIRST run (the checkpoint freezes it thereafter): each
    state partition costs a state-store instance + an Arrow python
    worker per micro-batch, so size it to the keyspace, not the
    cluster default (32 stores over 150 users measured 2× slower than
    8).  None keeps the session's shuffle-partition setting.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    prev_parts = None
    if state_partitions is not None:
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        # rate-limit the AvailableNow drain to one file per micro-batch:
        # with the timeout delta staged up front (mtime-ordered LAST,
        # streaming/stage.append_empty_delta) a SINGLE drain plans
        # events → watermark advance → timeout batch, replacing the old
        # two-drain restart at identical state/watermark semantics
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(source_dir)

    def fold(key, pdf_iter, state):
        yield from _fold(key, pdf_iter, state, gap_us)

    sessions = (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    try:
        q = (
            sessions.writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def sessionize_batch_reference(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """The batch twin (same window-function chain as q_sessionize),
    reduced to the streaming operator's output columns — the
    equivalence oracle for closed sessions."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts") - F.lag(F.col("ts")).over(w)
    flagged = events.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > F.expr(f"INTERVAL {gap_minutes} MINUTES")), 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "sess_no", F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "sess_no").agg(
        F.min("ts").alias("sess_start"),
        F.max("ts").alias("sess_end"),
        F.count("*").alias("n_events"),
    ).select("user_id", "sess_start", "sess_end", "n_events")
