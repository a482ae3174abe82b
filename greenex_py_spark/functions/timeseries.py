"""Per-series exponential smoothing (Holt's linear trend).

Forecasting the next day's crawl/event volume per stream is the
capacity-planning readout a large ingest pipeline runs nightly.  The
distributed shape: the heavy part (per-day counting over the raw
stream) is an ordinary two-phase aggregate; the smoothing recursion is
O(days) per series and runs inside one Arrow ``applyInPandas`` kernel
partitioned BY SERIES — thousands of independent series smooth in
parallel, and per-task state is one series' daily vector (bounded by
the calendar, not the corpus).

Exactness contract: the recursion

    l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
    b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

is evaluated in the SAME operation order in the kernel and in the
DuckDB recursive-CTE oracle, with 1−α / 1−β passed as shared literals
(never recomputed), so the doubles agree bit-for-bit and round-6 at
the end is portable.  Initialization: l₀ = y₀, b₀ = y₁ − y₀ (classic
two-point init); one-step-ahead SSE accumulates from t = 1.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "HOLT_ALPHA", "HOLT_OMA", "HOLT_BETA", "HOLT_OMB",
    "HW_ALPHA", "HW_OMA", "HW_BETA", "HW_OMB", "HW_GAMMA", "HW_OMG",
    "HW_SEASON", "holt_linear", "holt_winters_additive", "acf_lags",
    "EWMA_LAM_NUM", "EWMA_LAM_DEN", "EWMA_Q", "ewma_chart",
    "dow_volume_anomaly", "DTW_INF", "dtw_to_reference", "dtw_sql",
]

HOLT_ALPHA = 0.3
HOLT_OMA = 0.7   # 1 − α as its own literal (shared with the oracle)
HOLT_BETA = 0.2
HOLT_OMB = 0.8   # 1 − β

# Holt–Winters additive (weekly season): same shared-literal contract
HW_ALPHA = 0.5
HW_OMA = 0.5
HW_BETA = 0.25
HW_OMB = 0.75
HW_GAMMA = 0.25
HW_OMG = 0.75
HW_SEASON = 7


def holt_linear(
    df: DataFrame,
    series_col: str = "g",
    t_col: str = "t",
    y_col: str = "y",
) -> DataFrame:
    """[series, n_days, level, trend, forecast1, sse] — Holt's linear
    smoothing per series over a DENSE integer time index (callers fill
    calendar gaps with 0 upstream so both engines see the same grid).
    Series with fewer than 2 points emit nothing (the two-point init
    needs y₀ and y₁ — mirrored by the oracle's anchor join)."""
    schema = (
        f"{series_col} string, n_days long, level double, trend double, "
        "forecast1 double, sse double"
    )

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(t_col)
        ys = [float(v) for v in pdf[y_col]]
        if len(ys) < 2:
            return pd.DataFrame(
                columns=[series_col, "n_days", "level", "trend",
                         "forecast1", "sse"]
            )
        level = ys[0]
        trend = ys[1] - ys[0]
        sse = 0.0
        for y in ys[1:]:
            prev = level
            pred = level + trend
            err = y - pred
            sse = sse + err * err
            level = HOLT_ALPHA * y + HOLT_OMA * pred
            trend = HOLT_BETA * (level - prev) + HOLT_OMB * trend
        return pd.DataFrame(
            [[pdf[series_col].iloc[0], len(ys), round(level, 6),
              round(trend, 6), round(level + trend, 6), round(sse, 6)]],
            columns=[series_col, "n_days", "level", "trend",
                     "forecast1", "sse"],
        )

    return df.groupBy(series_col).applyInPandas(_kernel, schema=schema)


def holt_winters_additive(
    df: DataFrame,
    series_col: str = "g",
    t_col: str = "t",
    y_col: str = "y",
    season: int = HW_SEASON,
) -> DataFrame:
    """[series, n_days, level, trend, s_next, forecast1, sse] —
    Holt–Winters ADDITIVE seasonal smoothing per series over a dense
    integer time index: the weekly-seasonality completion of
    :func:`holt_linear` (whose linear recursion a weekday-periodic
    volume series systematically lags).

        l_t = α·(y_t − s_{t−m}) + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
        s_t = γ·(y_t − l_t) + (1−γ)·s_{t−m}

    Classic first-two-seasons init: l₀ = mean(y₀..y_{m−1}),
    b₀ = (mean of season 2 − mean of season 1)/m, s_i = y_i − l₀;
    the recursion starts at t = m, one-step-ahead SSE accumulates from
    there, and ``forecast1 = l + b + s`` for the next day's weekday
    slot.  Series shorter than 2·m emit nothing.

    Same exactness contract as Holt: the kernel and the DuckDB
    recursive-CTE oracle evaluate the IDENTICAL operation order with
    α/1−α/β/1−β/γ/1−γ as shared literals (integer day volumes make the
    seed means exact), so round-6 at the end is portable.  Same
    distributed shape too: one Arrow ``applyInPandas`` kernel per
    series, per-task state bounded by the calendar.
    """
    m = int(season)
    schema = (
        f"{series_col} string, n_days long, level double, trend double, "
        "s_next double, forecast1 double, sse double"
    )

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(t_col)
        ys = [float(v) for v in pdf[y_col]]
        n = len(ys)
        cols = [series_col, "n_days", "level", "trend", "s_next",
                "forecast1", "sse"]
        if n < 2 * m:
            return pd.DataFrame(columns=cols)
        sum1 = 0.0
        sum2 = 0.0
        for v in ys[:m]:
            sum1 += v
        for v in ys[m:2 * m]:
            sum2 += v
        level = sum1 / float(m)
        trend = (sum2 / float(m) - sum1 / float(m)) / float(m)
        s = [ys[i] - level for i in range(m)]
        sse = 0.0
        for t in range(m, n):
            y = ys[t]
            so = s[t % m]
            err = y - (level + trend + so)
            sse = sse + err * err
            lnew = HW_ALPHA * (y - so) + HW_OMA * (level + trend)
            bnew = HW_BETA * (lnew - level) + HW_OMB * trend
            s[t % m] = HW_GAMMA * (y - lnew) + HW_OMG * so
            level, trend = lnew, bnew
        s_next = s[n % m]
        return pd.DataFrame(
            [[pdf[series_col].iloc[0], n, round(level, 6), round(trend, 6),
              round(s_next, 6), round(level + trend + s_next, 6),
              round(sse, 6)]],
            columns=cols,
        )

    return df.groupBy(series_col).applyInPandas(_kernel, schema=schema)


def acf_lags(
    df: DataFrame,
    max_lag: int = 7,
    series_col: str = "g",
    t_col: str = "t",
    y_col: str = "y",
) -> DataFrame:
    """[series, lag_k, n_days, n_pairs, acf] — sample autocorrelation
    r_k of each DENSE integer series for k = 1..max_lag (weekly
    seasonality / burst persistence readout over daily ingest volumes).

    Exactness contract: with S = Σy, SP_k = Σ y_t·y_{t−k},
    H_k = Σ_{t≥k} y_t and T_k = Σ_{t≥k} y_{t−k}, the standard
    full-series-mean estimator scales to the all-integer pair

        A_k = n²·SP_k − n·S·(H_k+T_k) + (n−k)·S²     (n² × numerator)
        B   = n·(n·Σy² − S²)                          (n² × denominator)

    so both engines divide the SAME two int64s and round-6 once
    (CUSUM's scaled-centering convention).  int64 envelope:
    n²·SP_k ≤ n³·ymax² — safe through ~1500 days × 1M events/day;
    beyond that promote the sums to decimal, the shape is unchanged.

    Distributed shape: the only corpus-sized work is the upstream
    per-day count; here each series' calendar vector flows through ONE
    per-series window (lag 1..K in a single pass, no self-join) and a
    grouped integer aggregate — days × series is dim-sized at any
    corpus scale.  Pure codegen, no Python kernels.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(series_col).orderBy(t_col)
    ks = range(1, max_lag + 1)
    d = df.select(
        F.col(series_col).alias("g"),
        F.col(t_col).alias("t"),
        F.col(y_col).cast("long").alias("y"),
    )
    d = d.select(
        "g", "y", *[F.lag("y", k).over(w).alias(f"l{k}") for k in ks]
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ]
    for k in ks:
        lk = F.col(f"l{k}")
        aggs += [
            F.sum(F.col("y") * lk).alias(f"sp{k}"),
            F.sum(F.when(lk.isNotNull(), F.col("y"))).alias(f"h{k}"),
            F.sum(lk).alias(f"tl{k}"),
        ]
    a = d.groupBy("g").agg(*aggs)
    per_k = F.array(*[
        F.struct(
            F.lit(k).cast("long").alias("k"),
            F.col(f"sp{k}").alias("sp"),
            F.col(f"h{k}").alias("h"),
            F.col(f"tl{k}").alias("tl"),
        )
        for k in ks
    ])
    e = a.select(
        "g", "n", "s", "syy", F.explode(per_k).alias("kk")
    ).select("g", "n", "s", "syy", "kk.k", "kk.sp", "kk.h", "kk.tl")
    num = (
        F.col("n") * F.col("n") * F.col("sp")
        - F.col("n") * F.col("s") * (F.col("h") + F.col("tl"))
        + (F.col("n") - F.col("k")) * F.col("s") * F.col("s")
    )
    den = F.col("n") * (F.col("n") * F.col("syy") - F.col("s") * F.col("s"))
    return e.where(F.col("n") > F.col("k")).select(
        "g",
        F.col("k").alias("lag_k"),
        F.col("n").alias("n_days"),
        (F.col("n") - F.col("k")).alias("n_pairs"),
        F.round(
            F.when(den != 0, num.cast("double") / den.cast("double"))
            + F.lit(0.0),
            6,
        ).alias("acf"),
    )


def dow_volume_anomaly(
    df: DataFrame,
    series_col: str = "g",
    day_col: str = "day",
    dow_col: str = "dow",
    y_col: str = "y",
    z_thresh: int = 2,
) -> DataFrame:
    """[series, day, n_events, z, is_anomaly] — same-weekday volume
    z-score per daily observation (the ingest-ops anomaly readout: a
    Tuesday is judged against the distribution of Tuesdays, so weekly
    seasonality never trips the alarm).  Callers supply the DENSE
    zero-filled calendar (a missing day IS the anomaly) plus the
    weekday key; this function owns only the estimator.

    Exactness contract: with per-(series, weekday) ints c = #days,
    s = Σy, ss = Σy², the population z-score scales to

        z = (y·c − s) / sqrt(c·ss − s²)

    — one division of an exact int64 by the sqrt of an exact int64,
    identical in both engines (the acf_lags scaled-centering
    convention), NULL when the weekday group is constant (variance 0).
    ``is_anomaly`` (|z| > z_thresh) is decided entirely in integers:
    (y·c − s)² > z_thresh²·(c·ss − s²) — no FP boundary exists.

    Distributed shape: the corpus-sized work is the upstream per-day
    count; here one window pass over the dim-sized calendar table
    (series × days), partitioned by (series, weekday) — no join-back.
    int64 envelope: c·ss ≤ days·(days·ymax²) — safe through ~1500 days
    × 1M events/day.  Pure codegen, no Python kernels.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(series_col, dow_col)
    d = df.select(
        F.col(series_col).alias("g"),
        F.col(day_col).alias("day"),
        F.col(dow_col).alias("dow"),
        F.col(y_col).cast("long").alias("y"),
    ).select(
        "g", "day", "y",
        F.count(F.lit(1)).over(w).cast("long").alias("c"),
        F.sum("y").over(w).alias("s"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("ss"),
    )
    num = F.col("y") * F.col("c") - F.col("s")
    var_n = F.col("c") * F.col("ss") - F.col("s") * F.col("s")
    return d.select(
        F.col("g"),
        F.col("day"),
        F.col("y").alias("n_events"),
        F.when(
            var_n > 0, num.cast("double") / F.sqrt(var_n.cast("double"))
        ).alias("z"),
        (num * num > F.lit(z_thresh * z_thresh) * var_n)
        .cast("long")
        .alias("is_anomaly"),
    )


def mase_seasonal_naive(
    grid: DataFrame,
    series_col: str = "g",
    t_col: str = "t",
    y_col: str = "y",
    season: int = 7,
) -> DataFrame:
    """[series, n_days, sae_seasonal, sae_naive, mase] — mean absolute
    scaled error of the seasonal-naive forecast (ŷ_t = y_{t−season})
    against the one-step naive baseline (ŷ_t = y_{t−1}) per series:
    the standard scale-free forecastability readout (MASE < 1 ⇔ weekly
    seasonality beats persistence).  Hyndman & Koehler 2006.

    Callers supply the DENSE zero-filled calendar grid (the
    q_volume_anomaly convention — a missing day is a real zero, and
    integer lags stay aligned).  Volumes are int64 counts, so both
    absolute-error sums are exact integers; MASE is the fixed chain
    (sae_s/cnt_s)/(sae_n/cnt_n), identical in both engines.  One window
    sort per series over the dim-sized calendar table.
    """
    from pyspark.sql import Window

    d = grid.select(
        F.col(series_col).alias("series"),
        F.col(t_col).alias("_t"),
        F.col(y_col).alias("_y"),
    ).select(
        "series", "_t", "_y",
        F.lag("_y", 1).over(
            Window.partitionBy("series").orderBy("_t")
        ).alias("_y1"),
        F.lag("_y", season).over(
            Window.partitionBy("series").orderBy("_t")
        ).alias("_ys"),
    )
    agg = d.groupBy("series").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.when(F.col("_ys").isNotNull(),
                     F.abs(F.col("_y") - F.col("_ys"))).otherwise(0))
        .cast("long").alias("sae_seasonal"),
        F.sum(F.when(F.col("_ys").isNotNull(), 1).otherwise(0))
        .cast("long").alias("_cs"),
        F.sum(F.when(F.col("_y1").isNotNull(),
                     F.abs(F.col("_y") - F.col("_y1"))).otherwise(0))
        .cast("long").alias("sae_naive"),
        F.sum(F.when(F.col("_y1").isNotNull(), 1).otherwise(0))
        .cast("long").alias("_cn"),
    )
    mase = (
        F.col("sae_seasonal").cast("double") / F.col("_cs").cast("double")
    ) / (
        F.col("sae_naive").cast("double") / F.col("_cn").cast("double")
    )
    return agg.select(
        "series", "n_days", "sae_seasonal", "sae_naive",
        F.when(F.col("sae_naive") > 0, mase).alias("mase"),
    )


def rolling_median(
    grid: DataFrame,
    series_col: str = "g",
    t_col: str = "t",
    y_col: str = "y",
    window: int = 7,
) -> DataFrame:
    """[series, t, y, n_win, roll_median] — exact rolling lower-median
    of an integer series over a trailing ``window`` (the ops-dashboard
    smoother that, unlike a rolling mean, a single spike day cannot
    drag).  Warm-up rows use the partial window (n_win < window).

    Exactness: the window's values are collected, sorted, and indexed
    at (n+1) div 2 — all-integer, no interpolation, so both engines
    pick the identical element.  collect_list's nondeterministic
    arrival order is normalized by sort_array before indexing.  One
    window sort per series over the dim-sized calendar grid (the
    side-statistics convention) — the corpus-sized work happened in the
    upstream per-day count.
    """
    from pyspark.sql import Window

    d = grid.select(
        F.col(series_col).alias("series"),
        F.col(t_col).cast("long").alias("t"),
        F.col(y_col).cast("long").alias("y"),
    ).withColumn("_arr", F.sort_array(F.collect_list("y").over(
        Window.partitionBy("series").orderBy("t")
        .rowsBetween(-(window - 1), 0)
    )))
    return d.select(
        "series", "t", "y",
        F.size("_arr").cast("long").alias("n_win"),
        F.expr("element_at(_arr, cast((size(_arr) + 1) div 2 as int))")
        .cast("long").alias("roll_median"),
    )


DTW_INF = 1 << 60  # integer "infinity" for the DP boundary (shared literal)


def dtw_to_reference(
    profiles: DataFrame,
    t_len: int,
    series_col: str = "g",
    j_col: str = "j",
    q_col: str = "q",
    ref_cols_prefix: str = "r",
) -> DataFrame:
    """[series, dtw_cost] — exact integer dynamic-time-warping cost of
    each series' quantized profile against ONE reference profile that
    has been pivoted onto every row as columns ``r1..r{t_len}``
    (dim-sized: crossJoin-broadcast a 1-row pivot upstream).

    The classic O(T²) DP

        D[i][j] = c_ij + min(D[i−1][j], D[i−1][j−1], D[i][j−1])

    has a sequential intra-row term (D[i][j−1]) that looks
    window-hostile, but each row unrolls to a min-plus PREFIX SCAN:
    with S_i[j] = Σ_{m≤j} c_im and A_i[j] = min(D[i−1][j], D[i−1][j−1]),

        D[i][j] = S_i[j] + min_{k≤j} (A_i[k] − S_i[k−1])

    so every DP row is one cumulative sum + one running min — pure
    codegen window functions, NO Python kernel and NO T-step join
    chain.  All T rows share one partitioning (series, ordered j):
    a single shuffle, then T chained in-partition Window stages.

    Exactness: costs |r_i − q_j| are int64 (callers pre-quantize
    profiles, e.g. ppm shares), so every D cell is an exact integer —
    bit-equal to the DuckDB twin (:func:`dtw_sql`) at any parallelism.
    Scale: rows = series × T; series is corpus-scaled but T is a
    constant calendar, and per-task state is one window frame."""
    from pyspark.sql import Window

    w = Window.partitionBy(series_col).orderBy(j_col)
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    df = profiles
    for i in range(1, t_len + 1):
        c = F.abs(F.col(f"{ref_cols_prefix}{i}") - F.col(q_col))
        df = df.withColumn("_S", F.sum(c).over(wcum))
        if i == 1:
            df = df.withColumn("_D", F.col("_S"))
        else:
            df = (
                df.withColumn(
                    "_A",
                    F.least(
                        F.col("_D"),
                        F.lag("_D", 1, DTW_INF).over(w),
                    ),
                )
                .withColumn("_AmS", F.col("_A") - F.lag("_S", 1, 0).over(w))
                .withColumn("_D", F.col("_S") + F.min("_AmS").over(wcum))
            )
    return (
        df.filter(F.col(j_col) == t_len)
        .select(F.col(series_col), F.col("_D").alias("dtw_cost"))
    )


def dtw_sql(
    grid_sql: str,
    ref_sql: str,
    t_len: int,
) -> str:
    """DuckDB twin of :func:`dtw_to_reference`, generated from the same
    window-scan decomposition (one MATERIALIZED CTE per DP row — the
    unrolled-iterative-oracle house rule).  ``grid_sql`` must yield
    (g, j, q) with j = 1..t_len dense per series; ``ref_sql`` must
    yield (i, r) for i = 1..t_len."""
    parts = [
        f"WITH grid AS MATERIALIZED ({grid_sql}),",
        f"ref AS MATERIALIZED ({ref_sql}),",
        "d1 AS MATERIALIZED (",
        "  SELECT g, j, q,",
        "         sum(abs((SELECT r FROM ref WHERE i = 1) - q))",
        "           OVER (PARTITION BY g ORDER BY j) AS s,",
        "         sum(abs((SELECT r FROM ref WHERE i = 1) - q))",
        "           OVER (PARTITION BY g ORDER BY j) AS d",
        "  FROM grid),",
    ]
    for i in range(2, t_len + 1):
        prev = f"d{i - 1}"
        parts.append(f"""d{i} AS MATERIALIZED (
  SELECT g, j, q, s,
         s + min(ams) OVER (PARTITION BY g ORDER BY j) AS d
  FROM (
    SELECT g, j, q, s, a - lag(s, 1, 0) OVER (PARTITION BY g ORDER BY j)
             AS ams
    FROM (
      SELECT g, j, q,
             sum(abs((SELECT r FROM ref WHERE i = {i}) - q))
               OVER (PARTITION BY g ORDER BY j) AS s,
             least(d, lag(d, 1, {DTW_INF}) OVER
                      (PARTITION BY g ORDER BY j)) AS a
      FROM {prev}
    )
  )),""")
    parts[-1] = parts[-1].rstrip(",")  # last CTE: no trailing comma
    parts.append(
        f"SELECT g, CAST(d AS BIGINT) AS dtw_cost FROM d{t_len}"
        f" WHERE j = {t_len}"
    )
    return "\n".join(parts)


EWMA_LAM_NUM = 1   # λ = 1/5 — with L = 3 the flag test reduces to
EWMA_LAM_DEN = 5   # d² > σ² exactly (L²·λ/(2−λ) = 9·(1/9) = 1)
EWMA_Q = 10**6     # integer smoothing quantum


def ewma_chart(
    df: DataFrame,
    series_col: str = "g",
    t_col: str = "t",
    y_col: str = "y",
) -> DataFrame:
    """[series, n_days, n_flags, first_flag_t, ewma_last] — EWMA
    control chart (Roberts 1959) per series over a DENSE integer time
    index: e_t = λ·y_t + (1−λ)·e_{t−1} with λ = 1/5, flagged when the
    smoothed value leaves the ±L·σ·√(λ/(2−λ)) asymptotic control band
    (L = 3) around the series mean — the drift detector that beats
    Shewhart charts on small sustained shifts (the crawl-volume /
    quality-drift watchdog beside q_cusum_drift's single change
    point).

    Exactness: the recursion runs in integer micro-units,
    e_t = (Q·y_t + 4·e_{t−1}) div 5 (floor division, non-negative
    counts), and the chosen (λ, L) make the band test EXACTLY
    d² > σ²: flag ⟺ (e_t·n − S·Q)² > Q²·(n·ΣY² − S²) — pure integer
    comparison, no FP anywhere in the decision (Python ints in the
    kernel, HUGEINT in the oracle).  Only ewma_last is FP: one
    division + round-6.

    Shape: per-day counting is the usual two-phase aggregate; the
    O(days) recursion runs in one Arrow kernel per series, per-task
    state bounded by the calendar — same contract as holt_linear."""
    schema = (
        f"{series_col} string, n_days long, n_flags long, "
        "first_flag_t long, ewma_last double"
    )
    q = EWMA_Q
    keep = EWMA_LAM_DEN - EWMA_LAM_NUM

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(t_col)
        ys = [int(v) for v in pdf[y_col]]
        n = len(ys)
        s = sum(ys)
        s2 = sum(y * y for y in ys)
        var_num = q * q * (n * s2 - s * s)
        e = q * ys[0]
        flags = []
        for t, y in enumerate(ys):
            if t > 0:
                e = (q * y + keep * e) // EWMA_LAM_DEN
            d = e * n - s * q
            if d * d > var_num:
                flags.append(t)
        return pd.DataFrame(
            [[pdf[series_col].iloc[0], n, len(flags),
              flags[0] if flags else -1, round(e / q, 6)]],
            columns=[series_col, "n_days", "n_flags",
                     "first_flag_t", "ewma_last"],
        )

    return df.groupBy(series_col).applyInPandas(_kernel, schema=schema)


def trailing_range_stats(
    df,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_s: int = 7200,
):
    """[user_id, n_events, max_n_win, max_vsum_q] — per-entity peak
    trailing-window activity: for every event, the count and
    µ-quantized value sum of that entity's events in the trailing
    ``window_s`` seconds (EVENT-TIME RANGE frame, not a row frame — tied
    timestamps all join the frame, so the result is order-independent),
    then the per-entity maxima: the burst/velocity feature rate
    limiters and abuse scoring build on event tables.

    This is the ``Window.rangeBetween`` surface (value-based frame
    bounds over epoch microseconds) — every other window in the engine
    uses row frames; a rows-frame would be wrong here whenever events
    carry duplicate timestamps.

    Scale: one shuffle partitioned by entity; the in-partition sort is
    per-entity event history, the standard sessionization shape.
    Values are floor(v·1e6+0.5) exact longs, so the maxima compare
    integers in both engines."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    e = df.select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.floor(F.col(value_col) * 1000000.0 + 0.5).cast("long").alias("vq"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-window_s * 1_000_000, 0)
    )
    t = e.select(
        "user_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_win"),
        F.sum("vq").over(w).cast("long").alias("vsum_q"),
    )
    return t.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max("n_win").cast("long").alias("max_n_win"),
        F.max("vsum_q").cast("long").alias("max_vsum_q"),
    )


def cross_correlation(
    df: DataFrame,
    type_a: str = "view",
    type_b: str = "click",
    max_lag: int = 7,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """[lag, n_overlap, ccf] — lead-lag cross-correlation of two event
    types' daily volumes: r(ℓ) correlates a_t against b_{t+ℓ} for
    ℓ ∈ [−max_lag, max_lag] with FULL-series means and population
    stds (the standard biased CCF) — "does type A lead type B, and by
    how many days?", the causal-direction screen q_acf_volume's single
    series cannot answer.

    Exactness: daily counts are exact int64 over the dense zero-filled
    shared calendar [0..tmax]; the numerator is cleared to one exact
    int64, N²·Σab − N·S_a·ΣB_over − N·S_b·ΣA_over + n_over·S_a·S_b,
    and the denominator N·√(N·Σa²−S_a²)·√(N·Σb²−S_b²) is one fixed
    IEEE chain shared with the oracle; a degenerate (constant) series
    → NULL.

    Scale: one shuffle builds the daily counts; the lag join and all
    sums run on the dim-sized calendar."""
    e = df.filter(F.col(type_col).isin(type_a, type_b)).select(
        F.col(type_col).alias("ty"),
        F.date_trunc("day", F.col(ts_col)).alias("d"),
    )
    d0 = e.agg(
        F.min("d").alias("dmin"),
        F.datediff(F.max("d"), F.min("d")).cast("long").alias("tmax"),
    )
    cnt = e.groupBy("ty", "d").agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    cal = d0.select(
        "dmin", F.explode(F.sequence(F.lit(0), F.col("tmax"))).alias("t")
    )

    def series(ty: str, tcol: str, ycol: str) -> DataFrame:
        return (
            cal.join(
                cnt.filter(F.col("ty") == ty),
                F.datediff(cnt["d"], cal["dmin"]) == cal["t"],
                "left",
            )
            .select(
                F.col("t").alias(tcol),
                F.coalesce("y", F.lit(0)).cast("long").alias(ycol),
            )
        )

    sa = series(type_a, "t", "a").localCheckpoint()
    sb = series(type_b, "t", "b").localCheckpoint()
    stats_a = sa.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("a").cast("long").alias("suma"),
        F.sum(F.col("a") * F.col("a")).cast("long").alias("sqa"),
    )
    stats_b = sb.agg(
        F.sum("b").cast("long").alias("sumb"),
        F.sum(F.col("b") * F.col("b")).cast("long").alias("sqb"),
    )
    lags = sa.sparkSession.range(-max_lag, max_lag + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    ov = (
        lags.join(sa, F.lit(True))
        .join(sb.withColumnRenamed("t", "tb"),
              F.col("tb") == F.col("t") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_overlap"),
            F.sum(F.col("a") * F.col("b")).cast("long").alias("sab"),
            F.sum("a").cast("long").alias("soa"),
            F.sum("b").cast("long").alias("sob"),
        )
    )
    j = ov.crossJoin(F.broadcast(stats_a)).crossJoin(F.broadcast(stats_b))
    num = (
        F.col("n") * F.col("n") * F.col("sab")
        - F.col("n") * F.col("suma") * F.col("sob")
        - F.col("n") * F.col("sumb") * F.col("soa")
        + F.col("n_overlap") * F.col("suma") * F.col("sumb")
    ).cast("double")
    va = (F.col("n") * F.col("sqa") - F.col("suma") * F.col("suma"))
    vb = (F.col("n") * F.col("sqb") - F.col("sumb") * F.col("sumb"))
    den = (
        F.col("n").cast("double")
        * F.sqrt(va.cast("double")) * F.sqrt(vb.cast("double"))
    )
    return j.select(
        "lag", "n_overlap",
        F.when((va <= 0) | (vb <= 0), F.lit(None).cast("double"))
        .otherwise(num / den).alias("ccf"),
    )


def hurst_rs(
    grid: DataFrame,
    t_col: str = "t",
    y_col: str = "y",
    block_sizes: Sequence[int] = (8, 16, 32, 64),
) -> DataFrame:
    """[s, n_blocks, sum_rs_q, mean_rs, hurst] — rescaled-range (R/S)
    Hurst-exponent estimate of a dense integer series: for each block
    size s the series splits into full blocks, each block's range of
    mean-centred cumulative deviations divides its population std,
    and H is the log-log slope of mean(R/S) against s (H≈0.5 random
    walk increments, >0.5 long-range persistence — the crawl-traffic
    long-memory diagnostic beside q_acf_volume's fixed lags).

    Exactness: within a block the centred cumulative deviation scaled
    by s, s·C_t − (i+1)·S_b, is exact int64, so R_scaled = max−min is
    exact; each block's R/S double is 1e-9-quantized BEFORE the
    cross-block mean (summation order can't move it), and the final
    regression follows the heaps_law convention — ln inputs quantized
    to 1e-6 longs, slope a ratio of exact int64 products, shipped
    unrounded.  Scale shape: one window pass per block size over the
    calendar-sized grid; nothing is corpus-sized here (the heavy
    per-hour count happens upstream)."""
    from pyspark.sql import Window

    outs = []
    for s in block_sizes:
        d = grid.select(
            F.col(t_col).alias("t"), F.col(y_col).cast("long").alias("y")
        )
        n = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
        d = d.crossJoin(F.broadcast(n)).filter(
            F.col("t") < (F.col("n") - F.col("n") % s)
        )
        d = d.withColumn("b", (F.col("t") / s).cast("long"))
        wb = Window.partitionBy("b")
        wc = Window.partitionBy("b").orderBy("t").rowsBetween(
            Window.unboundedPreceding, 0
        )
        d = d.select(
            "b", "t", "y",
            F.sum("y").over(wc).alias("c"),
            F.row_number().over(Window.partitionBy("b").orderBy("t")).alias("i"),
            F.sum("y").over(wb).alias("sb"),
            F.sum(F.col("y") * F.col("y")).over(wb).alias("qb"),
        )
        z = (F.lit(s) * F.col("c") - F.col("i") * F.col("sb")).cast("long")
        per_b = (
            d.withColumn("z", z)
            .groupBy("b", "sb", "qb")
            .agg((F.max("z") - F.min("z")).cast("long").alias("r_scaled"))
        )
        sd = F.sqrt(
            (
                F.col("qb").cast("double")
                - F.col("sb").cast("double") * F.col("sb").cast("double")
                / F.lit(float(s))
            )
            / F.lit(float(s))
        )
        rs = (F.col("r_scaled").cast("double") / F.lit(float(s))) / sd
        per_b = per_b.filter(
            F.col("qb") * s > F.col("sb") * F.col("sb")
        ).withColumn(
            "rs_q", F.floor(rs * F.lit(1000000000.0) + F.lit(0.5)).cast("long")
        )
        outs.append(
            per_b.agg(
                F.lit(s).cast("long").alias("s"),
                F.count(F.lit(1)).cast("long").alias("n_blocks"),
                F.sum("rs_q").cast("long").alias("sum_rs_q"),
            )
        )
    pts = outs[0]
    for o in outs[1:]:
        pts = pts.unionByName(o)
    mean_rs = F.col("sum_rs_q").cast("double") / (
        F.col("n_blocks").cast("double") * F.lit(1000000000.0)
    )
    pts = pts.select(
        "s", "n_blocks", "sum_rs_q",
        mean_rs.alias("mean_rs"),
        F.floor(
            F.log(mean_rs) * F.lit(1000000.0) + F.lit(0.5)
        ).cast("long").alias("_ly"),
        F.floor(
            F.log(F.col("s").cast("double")) * F.lit(1000000.0) + F.lit(0.5)
        ).cast("long").alias("_lx"),
    )
    wa = Window.partitionBy()
    dd = F.count(F.lit(1)).over(wa).cast("long")
    sx = F.sum("_lx").over(wa)
    sy = F.sum("_ly").over(wa)
    sxx = F.sum(F.col("_lx") * F.col("_lx")).over(wa)
    sxy = F.sum(F.col("_lx") * F.col("_ly")).over(wa)
    return pts.select(
        "s", "n_blocks", "sum_rs_q", "mean_rs",
        (
            (dd * sxy - sx * sy).cast("double")
            / (dd * sxx - sx * sx).cast("double")
        ).alias("hurst"),
    )


def periodogram(
    grid: DataFrame,
    t_col: str = "t",
    y_col: str = "y",
    max_k: int = 8,
) -> DataFrame:
    """[k, period, c_q, s_q, power, dominant] — discrete Fourier
    periodogram of a dense integer series at harmonics k = 1..max_k:
    c_k = Σ y_t·cos(2πkt/n), s_k = Σ y_t·sin(2πkt/n), power = c²+s² —
    the seasonality detector that finds the period q_acf_volume and
    q_holt_winters must be TOLD (their lags/period are parameters;
    the dominant harmonic here is measured).  ``period`` = n/k in the
    series' own time unit; ``dominant`` marks the max-power harmonic
    (tie → smallest k).

    Exactness: each y·cos / y·sin term quantizes to 1e-9 ints before
    the sum (libm cos/sin may differ by 1 ulp between engines — the
    established quantization convention absorbs it, and summation
    order is then immaterial); power is one identical IEEE chain off
    the two exact int64 sums.  Shape: one explode of the
    calendar-sized grid × max_k — never corpus-sized."""
    import math

    from pyspark.sql import Window

    n = grid.agg(F.count(F.lit(1)).cast("long").alias("n"))
    spark = grid.sparkSession
    ks = spark.range(1, max_k + 1).select(F.col("id").cast("long").alias("k"))
    base = (
        grid.select(F.col(t_col).alias("t"), F.col(y_col).cast("long").alias("y"))
        .crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(n))
    )
    ang = (
        F.lit(2.0) * F.lit(math.pi) * F.col("k").cast("double")
        * F.col("t").cast("double") / F.col("n").cast("double")
    )
    cq = F.floor(
        F.col("y").cast("double") * F.cos(ang) * F.lit(1000000000.0) + F.lit(0.5)
    ).cast("long")
    sq = F.floor(
        F.col("y").cast("double") * F.sin(ang) * F.lit(1000000000.0) + F.lit(0.5)
    ).cast("long")
    agg = (
        base.withColumn("_c", cq)
        .withColumn("_s", sq)
        .groupBy("k")
        .agg(
            F.max(F.col("n")).alias("n"),
            F.sum("_c").cast("long").alias("c_q"),
            F.sum("_s").cast("long").alias("s_q"),
        )
    )
    c = F.col("c_q").cast("double") / F.lit(1000000000.0)
    s = F.col("s_q").cast("double") / F.lit(1000000000.0)
    power = c * c + s * s
    out = agg.select(
        "k",
        (F.col("n").cast("double") / F.col("k").cast("double")).alias("period"),
        "c_q", "s_q",
        power.alias("power"),
    )
    w = Window.partitionBy()
    return out.withColumn(
        "dominant",
        F.row_number().over(w.orderBy(F.desc("power"), F.asc("k"))) == 1,
    )


def dtw_to_reference_arrow(
    profiles: DataFrame,
    t_len: int,
    series_col: str = "g",
    j_col: str = "j",
    q_col: str = "q",
    ref_cols_prefix: str = "r",
    n_buckets: int = 64,
) -> DataFrame:
    """[series, dtw_cost] — the Arrow hot-path twin of
    :func:`dtw_to_reference`: identical inputs, identical exact-int64
    DP values, restructured for Arrow-stage efficiency.  Three
    findings drove the shape (all measured at sf0.1, 1500 series):

    - one applyInPandas GROUP PER SERIES costs ~12 ms/group of Arrow
      batch + schema overhead (18 s total — slower than the chained
      window form!), so series are hashed into ``n_buckets`` coarse
      groups and the kernel runs the DP VECTORIZED across its whole
      bucket (matrix rows = series);
    - the reference profile is collected once on the driver (a 1-row
      dim, the cosine_topk precedent) instead of riding every Arrow
      row as {t_len} broadcast columns;
    - each DP row uses the same min-plus prefix-scan identity as the
      window form (cumsum + shifted min + minimum.accumulate), never a
      per-cell Python loop.

    The window form remains the zero-Python reference implementation,
    value-equality-tested against this kernel."""
    import numpy as np
    import pandas as pd

    ref_cols = [f"{ref_cols_prefix}{i}" for i in range(1, t_len + 1)]
    ref_row = profiles.select(*ref_cols).limit(1).collect()[0]
    r = np.array([int(ref_row[c]) for c in ref_cols], dtype=np.int64)
    INF = np.int64(2**62)

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([series_col, j_col])
        q = pdf[q_col].to_numpy(np.int64).reshape(-1, t_len)
        g = pdf[series_col].to_numpy()[:: t_len]
        prev = np.cumsum(np.abs(r[0] - q), axis=1)
        zero = np.zeros((q.shape[0], 1), dtype=np.int64)
        inf = np.full((q.shape[0], 1), INF, dtype=np.int64)
        for i in range(1, t_len):
            s = np.cumsum(np.abs(r[i] - q), axis=1)
            a = np.minimum(prev, np.concatenate([inf, prev[:, :-1]], axis=1))
            b = a - np.concatenate([zero, s[:, :-1]], axis=1)
            prev = s + np.minimum.accumulate(b, axis=1)
        return pd.DataFrame({series_col: g, "dtw_cost": prev[:, -1]})

    first = profiles.schema[series_col].dataType.simpleString()
    d = profiles.select(series_col, j_col, q_col).withColumn(
        "_b", F.pmod(F.xxhash64(series_col), F.lit(n_buckets))
    )
    return d.groupBy("_b").applyInPandas(
        _kernel, f"{series_col} {first}, dtw_cost long"
    )
