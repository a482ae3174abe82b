"""Classical statistical tests as exact relational plans.

Chi-square independence over two categorical columns: observed counts,
margin totals via unpartitioned window sums (one pass, no join-back —
the side-statistics convention from BENCH/SCALE_AUDIT.md), expected
counts, per-cell contributions, and the global statistic as an exact
integer sum of 1e-6-quantized terms (FP summation order can never move
the rounded total).  The contingency table is completed with zero-
observation cells (distinct-levels cross join) so expected mass is
conserved — a groupBy over observed pairs alone would drop them.

Scale: the only corpus-sized operation is the first groupBy; every
window then runs over the |levels_a| × |levels_b| grid (dim-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chi2_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    quant: float = 1e6,
) -> DataFrame:
    """[a, b, obs, exp, contrib, chi2, dof] — full contingency table
    with the shared test statistic and degrees of freedom on each row."""
    obs = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count("*").alias("obs"))
    grid = (
        obs.select("a").distinct()
        .crossJoin(obs.select("b").distinct())
        .join(obs, ["a", "b"], "left")
        .select("a", "b", F.coalesce("obs", F.lit(0)).alias("obs"))
    )
    rt = F.sum("obs").over(Window.partitionBy("a"))
    ct = F.sum("obs").over(Window.partitionBy("b"))
    nn = F.sum("obs").over(Window.partitionBy())
    exp = (rt * ct).cast("double") / nn.cast("double")
    t = grid.select(
        "a", "b", "obs",
        exp.alias("exp"),
        rt.alias("_rt"), ct.alias("_ct"), nn.alias("_n"),
    )
    d = F.col("obs").cast("double") - F.col("exp")
    contrib = d * d / F.col("exp")
    cq = F.floor(contrib * quant + 0.5).cast("long")
    n_a = F.size(F.collect_set("a").over(Window.partitionBy()))
    n_b = F.size(F.collect_set("b").over(Window.partitionBy()))
    return t.select(
        "a", "b", "obs",
        F.round(F.col("exp"), 6).alias("exp"),
        (cq / quant).alias("contrib"),
        (F.sum(cq).over(Window.partitionBy()) / quant).alias("chi2"),
        ((n_a - 1) * (n_b - 1)).cast("long").alias("dof"),
    )
