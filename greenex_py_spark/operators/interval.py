"""Interval (range-containment) join — match events to every interval
containing their timestamp, without a cross join.

The reference has no temporal machinery at all (its closest analogue is
the pandas nearest-date scene pick, /root/reference/GreenExp/
availability.py:156-181); a web-scale event pipeline needs the general
``point-in-interval`` join (campaign windows, maintenance windows,
crawl freezes).  Spark's naive plan for ``ON ts BETWEEN s AND e`` is a
BroadcastNestedLoopJoin — O(|events|·|intervals|) and a driver OOM the
moment the interval side stops being tiny.

This module uses the classic **time-bucketing** shape instead:

1. each interval explodes to the fixed-width buckets it overlaps
   (bounded fan-out: ceil(span/bucket) + 1 rows — pick ``bucket``
   near the typical interval span),
2. each event maps to exactly ONE bucket (so a (event, interval) pair
   can only meet once — no post-join dedup),
3. equi-join on the bucket + residual range predicate.

The join is a plain hash equi-join on an integer key: shuffles
partition by time, skew is bounded by events-per-bucket, and Catalyst
broadcasts the exploded interval side when it is small.  100 TB of
events joined to a year of intervals is |buckets| ~ 10^4 keys of
map-side-combinable work, not a nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "s",
    end_col: str = "e",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Inner-join ``events`` to every ``intervals`` row with
    ``start <= ts < end`` (end-exclusive).  Returns all event columns
    plus all interval columns.

    ``bucket_seconds`` is the equi-join granularity: fan-out per
    interval is ``span / bucket + 1`` rows, so size it near the typical
    interval length (default 1 day).
    """
    b_us = int(bucket_seconds) * 1_000_000

    def us(c: str):
        # NTZ columns are read as wall-clock; the session is pinned to
        # UTC (session.py) so the cast is value-preserving
        return F.unix_micros(F.col(c).cast("timestamp"))

    ev = events.withColumn("_bkt", F.floor(us(ts_col) / b_us))
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(us(start_col) / b_us),
                F.floor((us(end_col) - 1) / b_us),
            )
        ),
    )
    joined = ev.join(iv, "_bkt").filter(
        (us(ts_col) >= us(start_col)) & (us(ts_col) < us(end_col))
    )
    return joined.drop("_bkt")
