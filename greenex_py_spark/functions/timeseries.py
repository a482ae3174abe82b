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

__all__ = ["HOLT_ALPHA", "HOLT_OMA", "HOLT_BETA", "HOLT_OMB", "holt_linear"]

HOLT_ALPHA = 0.3
HOLT_OMA = 0.7   # 1 − α as its own literal (shared with the oracle)
HOLT_BETA = 0.2
HOLT_OMB = 0.8   # 1 − β


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
