"""As-of (temporal) join — match each left row to the most recent
right row at-or-before its timestamp, per key.

The reference engine has no temporal join (its event handling is the
pandas nearest-date scene selection in
/root/reference/GreenExp/availability.py:156-181); this is the general
operator a web-scale event/session pipeline needs (attribution: "which
page view preceded this click?").

Spark lacks ASOF JOIN natively (SPARK-22947 open since 2017).  A naive
realization is a range join (l.ts >= r.ts) + argmax — O(n·m) per key.
This module uses the **union + ordered window** shape instead:

1. tag both sides, union by name,
2. one window per key ordered by (ts, side, tiebreak);
   ``last(struct(...), ignorenulls=True)`` carries the latest
   right-side row forward — the payload travels as ONE struct so a
   null payload field can never be back-filled from an older right
   row,
3. keep left rows.

Cost: ONE shuffle on the key (no join at all), per-task carried state
= one struct; the sort is the window's, which Spark spills.
Parallelism = #keys; a pathologically hot key serializes its own
partition (inherent to exact per-key ordering — same envelope as
sessionization).  At equal timestamps the right row is visible to the
left row (ASOF ``l.ts >= r.ts`` semantics); duplicate right rows on
(key, ts) resolve deterministically to the largest tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    payload_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``<ts>_asof`` (the
    matched right timestamp) and ``<c>_asof`` for each payload column,
    all taken from the latest ``right`` row with ``right.ts <= left.ts``
    and the same key — all null when no such row exists.

    ``left`` keeps all its columns; ``right`` contributes only
    ``payload_cols``.  ``tiebreak_col`` (right side, default the first
    payload column) makes duplicate (key, ts) right rows deterministic:
    the largest tiebreak wins.
    """
    if tiebreak_col is None:
        tiebreak_col = payload_cols[0]
    lcols = list(left.columns)
    rp = F.struct(
        F.col(ts_col).alias("_rts"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    null_rp = F.lit(None).cast(right.select(rp).schema[0].dataType)
    l = left.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[tiebreak_col].dataType).alias("_tb"),
        null_rp.alias("_rp"),
        F.struct(*lcols).alias("_row"),
    )
    r = right.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tiebreak_col).alias("_tb"),
        rp.alias("_rp"),
        F.lit(None).cast(left.select(F.struct(*lcols)).schema[0].dataType).alias("_row"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l.unionByName(r)
        .select("_side", "_row", F.last("_rp", ignorenulls=True).over(w).alias("_m"))
        .filter(F.col("_side") == 1)
    )
    return carried.select(
        *[F.col("_row")[c].alias(c) for c in lcols],
        F.col("_m")["_rts"].alias(f"{ts_col}_asof"),
        *[F.col("_m")[c].alias(f"{c}_asof") for c in payload_cols],
    )
