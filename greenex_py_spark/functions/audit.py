"""Data-quality audits over numeric columns.

``benford_digits`` — first-significant-digit distribution vs Benford's
law.  Scraped/aggregated numeric feeds (prices, counters, event values
in a crawl corpus) that arise from multiplicative processes follow
P(d) = log10(1 + 1/d); strong deviation flags synthetic, truncated, or
unit-mangled data before it poisons a training mixture — the classic
forensic-accounting screen applied as a pipeline health check.

Exactness: values are quantised to integer units first
(``round(v * scale)``), and the leading digit comes from a FIXED
integer CASE/division chain — no ``log10`` anywhere on the digit path,
because ``floor(log10(10^k))`` is one ULP away from disaster and the
two engines' libm need not agree at exact powers.  Counts are exact;
the expected share is a per-digit ``log10(1 + 1/d)`` evaluated on the
9-row output only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["benford_digits", "leading_digit_expr", "LEADING_DIGIT_LEVELS"]

# thresholds for the log-free leading-digit chain: ints < 10^10
LEADING_DIGIT_LEVELS = (
    1_000_000_000,
    100_000_000,
    10_000_000,
    1_000_000,
    100_000,
    10_000,
    1_000,
    100,
    10,
)


def leading_digit_expr(c: Column) -> Column:
    """Leading decimal digit of a positive integer column via a fixed
    CASE chain of integer divisions (no floating point, no log)."""
    out = None
    for lvl in LEADING_DIGIT_LEVELS:
        branch = (c / F.lit(lvl)).cast("long")
        out = F.when(c >= lvl, branch) if out is None else out.when(c >= lvl, branch)
    return out.otherwise(c)


def leading_digit_sql(col: str) -> str:
    """The DuckDB twin of :func:`leading_digit_expr` — rendered from
    the same level table so the two cannot drift."""
    branches = " ".join(
        f"WHEN {col} >= {lvl} THEN {col} // {lvl}" for lvl in LEADING_DIGIT_LEVELS
    )
    return f"(CASE {branches} ELSE {col} END)"


def benford_digits(
    df: DataFrame, value_col: str = "value", scale: float = 100.0
) -> DataFrame:
    """[digit, n, obs_pct, exp_pct, dev_pct] — one row per leading digit
    1..9 of the positive values of ``value_col`` (quantised to
    ``round(v * scale)`` integer units); percentages round-6.

    Shape: one map-side-combinable groupBy(digit) over a scan
    projection — 9 output rows regardless of corpus size; the total for
    the shares is an unpartitioned window over those 9 rows (the
    side-statistics rule).
    """
    from pyspark.sql import Window

    v = F.col(value_col)
    c = F.round(v * F.lit(float(scale))).cast("long")
    per = (
        df.filter(v > 0)
        .select(leading_digit_expr(c).alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy())
    obs = F.col("n").cast("double") / total.cast("double")
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    return per.select(
        "digit",
        "n",
        F.round(obs * F.lit(100.0), 6).alias("obs_pct"),
        F.round(exp * F.lit(100.0), 6).alias("exp_pct"),
        F.round((obs - exp) * F.lit(100.0), 6).alias("dev_pct"),
    )
