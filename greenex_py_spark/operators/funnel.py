"""Event-stream product analytics: ordered funnels and retention.

The events table is the streaming/asof/sessionize family's home; this
module adds the two classic whole-stream aggregates — an ORDERED,
windowed conversion funnel (view → click → purchase with per-step
deadlines) and first-touch retention cohorts.  Both are exact-integer
computations: timestamps travel as epoch microseconds (``unix_micros``
/ ``epoch_us`` — the sessionize-gate convention), step deadlines are
integer µs addition, and the only FP anywhere is the final
conversion/retention division (round-6).

Scale shape: the funnel is ONE shuffle — every per-user step time is a
window aggregate over the same user partitioning (no join-backs, the
anti-join re-evaluation rule); retention is one per-user aggregate
plus one user-key equi-join back to events (co-partitioned), with
cohort sizes riding along as window sums.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["funnel_counts", "retention_cohorts", "markov_transition_entropy"]


def funnel_counts(
    events: DataFrame,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
    max_gap_us: tuple[int, int] = (6 * 3600 * 1_000_000, 24 * 3600 * 1_000_000),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """One row [n_users, s1, s2, s3, conv_12, conv_23, conv_13] —
    first-touch ordered funnel: step k+1 counts only if it happens at
    or after the user's step-k time and within ``max_gap_us[k]``."""
    w = Window.partitionBy(user_col)
    # parquet ts is TIMESTAMP_NTZ; the cast may shift by the session tz
    # but the funnel only compares within-user DIFFERENCES and null-ness,
    # both shift-invariant (same convention as spacetime.knox_statistic)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    a, b, c = steps
    e = events.select(user_col, F.col(type_col).alias("_et"), us.alias("_us"))
    e = e.withColumn(
        "t1", F.min(F.when(F.col("_et") == a, F.col("_us"))).over(w)
    )
    e = e.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("_et") == b)
                & (F.col("_us") >= F.col("t1"))
                & (F.col("_us") <= F.col("t1") + F.lit(max_gap_us[0])),
                F.col("_us"),
            )
        ).over(w),
    )
    e = e.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("_et") == c)
                & (F.col("_us") >= F.col("t2"))
                & (F.col("_us") <= F.col("t2") + F.lit(max_gap_us[1])),
                F.col("_us"),
            )
        ).over(w),
    )
    per_user = e.groupBy(user_col).agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    s1 = F.sum(F.when(F.col("t1").isNotNull(), 1).otherwise(0)).cast("long")
    s2 = F.sum(F.when(F.col("t2").isNotNull(), 1).otherwise(0)).cast("long")
    s3 = F.sum(F.when(F.col("t3").isNotNull(), 1).otherwise(0)).cast("long")
    t = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        s1.alias("s1"), s2.alias("s2"), s3.alias("s3"),
    )
    def rate(num, den):
        return F.round(
            F.col(num).cast("double")
            / F.nullif(F.col(den).cast("double"), F.lit(0.0)),
            6,
        )
    return t.select(
        "n_users", "s1", "s2", "s3",
        rate("s2", "s1").alias("conv_12"),
        rate("s3", "s2").alias("conv_23"),
        rate("s3", "s1").alias("conv_13"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    epoch_date: str = "2024-01-01",
) -> DataFrame:
    """[cohort_day, day_offset, n_active, cohort_n, retention] — classic
    triangle retention: cohort = a user's first active day (index from
    ``epoch_date``), one row per (cohort, offset ≥ 0) with the distinct
    users active that day and the rate against the cohort size."""
    day = F.datediff(F.to_date(F.col(ts_col)), F.lit(epoch_date))
    e = events.select(F.col(user_col).alias("u"), day.alias("d"))
    first = e.groupBy("u").agg(F.min("d").alias("c0"))
    act = (
        e.join(first, "u")
        .select("u", "c0", (F.col("d") - F.col("c0")).alias("off"))
        .distinct()
    )
    per = act.groupBy("c0", "off").agg(
        F.count(F.lit(1)).cast("long").alias("n_active")
    )
    wc = Window.partitionBy("c0")
    cohort_n = F.max(
        F.when(F.col("off") == 0, F.col("n_active"))
    ).over(wc)
    return per.withColumn("cohort_n", cohort_n).select(
        F.col("c0").alias("cohort_day"),
        F.col("off").alias("day_offset"),
        "n_active",
        F.col("cohort_n").cast("long").alias("cohort_n"),
        F.round(
            F.col("n_active").cast("double") / F.col("cohort_n"), 6
        ).alias("retention"),
    )


def markov_transition_entropy(
    events: DataFrame,
    states: tuple[str, ...],
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """[state, n_trans, entropy] — per-state Shannon entropy of the
    next-event distribution over a FIXED state alphabet (behavioural
    predictability: a state whose successor entropy collapses is a
    scripted/bot flow; ln(|states|) means uniform).

    Transitions come from one per-user lag window under a (ts, unique
    id) total order (the od_flows convention).  Because ``states`` is a
    fixed ordered tuple, the entropy is a FIXED-LENGTH expression chain
    over the conditional-sum pivot (the grid_category_entropy
    precedent) — both engines evaluate the identical IEEE chain; zero
    counts contribute an exact 0 term and -0.0 is flushed before
    round-6.
    """
    w = Window.partitionBy(user_col).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    tr = (
        events.select(user_col, F.col(type_col).alias("_to"), *order_cols)
        .withColumn("_from", F.lag(F.col("_to")).over(w))
        .filter(F.col("_from").isNotNull())
    )
    aggs = [
        F.sum(F.when(F.col("_to") == s, 1).otherwise(0)).alias(f"_n{i}")
        for i, s in enumerate(states)
    ]
    g = tr.groupBy(F.col("_from").alias("state")).agg(
        F.count(F.lit(1)).alias("n_trans"), *aggs
    )
    n = F.col("n_trans").cast("double")
    h = None
    for i in range(len(states)):
        nc = F.col(f"_n{i}")
        p = nc.cast("double") / n
        t = F.when(nc == 0, F.lit(0.0)).otherwise(p * F.log(p))
        h = t if h is None else h + t
    return g.select(
        "state",
        F.col("n_trans").cast("long").alias("n_trans"),
        F.round(-h + F.lit(0.0), 6).alias("entropy"),
    )


def rfm_segments(
    events: DataFrame,
    ref_ts=None,
    event_filter: str = "purchase",
    n_tiles: int = 5,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """[user_id, recency_days, frequency, monetary_cents, r_score,
    f_score, m_score, segment] — classic RFM segmentation over the
    purchase stream: per-user recency (days since last purchase,
    against the stream's own max-ts reference so the result is
    time-invariant), frequency, cent-exact monetary sum, each scored
    into ``n_tiles`` equi-depth tiles (5 = best) via the two-phase
    global rank — no single-task window.

    Determinism: every tile assignment is pure int64 arithmetic
    (the equidepth_histogram formula ``score = T − (rank−1)·T div N``)
    over a total order with user-id tie-break; recency ranks ascending
    (fresher = better), frequency/monetary on the negated value
    (bigger = better).
    """
    from ..engine.rank import global_rank

    p = events.filter(F.col("event_type") == event_filter)
    ref = p.agg(F.max(F.date_trunc("day", F.col(ts_col))).alias("_ref"))
    base = (
        p.groupBy(user_col)
        .agg(
            F.max(F.date_trunc("day", F.col(ts_col))).alias("_last"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.round(F.col(value_col) * 100.0).cast("long"))
            .alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            user_col,
            F.datediff(F.col("_ref"), F.col("_last")).cast("long")
            .alias("recency_days"),
            "frequency", "monetary_cents",
        )
    ).localCheckpoint()  # three rank branches consume it (no-CSE rule)
    n = base.agg(F.count(F.lit(1)).cast("long").alias("_n"))

    def tile(df, order_col, out):
        ranked = global_rank(
            df.select(user_col, order_col),
            [order_col, user_col],
            out_col="_rk",
        )
        return ranked.crossJoin(F.broadcast(n)).select(
            user_col,
            (F.lit(n_tiles)
             - F.expr(f"((_rk - 1) * {n_tiles}) div _n")).cast("long")
            .alias(out),
        )

    r = tile(base, "recency_days", "r_score")
    f_ = tile(base.withColumn("_negf", -F.col("frequency")), "_negf", "f_score")
    m = tile(
        base.withColumn("_negm", -F.col("monetary_cents")), "_negm", "m_score"
    )
    return (
        base.join(r, user_col)
        .join(f_, user_col)
        .join(m, user_col)
        .withColumn(
            "segment",
            F.concat_ws(
                "",
                F.col("r_score").cast("string"),
                F.col("f_score").cast("string"),
                F.col("m_score").cast("string"),
            ),
        )
    )
