"""Association-rule mining over per-entity item sets.

The market-basket primitive (Agrawal & Srikant, VLDB'94) applied to
document curation: each document contributes a small set of categorical
items (language, source, length bucket, ...) and the miner reports
pairwise co-occurrence rules with support / confidence / lift — the
"which corpus attributes travel together?" audit every mixture planner
runs before reweighting.

Scale shape: item sets are tiny per document (here 3), so the pair
explode is O(items²/2) per doc — a map-side operation; everything after
is one groupBy on the (pair)-dim and two broadcast joins of the
item-frequency dim.  All counts exact int64; support / confidence /
lift are single double divisions on the identical expression in both
engines, shipped unrounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    items: DataFrame,
    id_col: str = "id",
    item_col: str = "item",
    min_support_n: int = 2,
) -> DataFrame:
    """[item_a, item_b, n_ab, n_a, n_b, support, conf_ab, conf_ba,
    lift] — all unordered item pairs co-occurring in ≥ ``min_support_n``
    entities.  ``items`` holds one row per (entity, item), items
    distinct within an entity.

    support = n_ab/N, conf(a→b) = n_ab/n_a, conf(b→a) = n_ab/n_b,
    lift = (n_ab·N)/(n_a·n_b) — exact int64 numerators, one double
    division each (lift: double product then divide, identical op
    order in both engines)."""
    it = items.select(F.col(id_col).alias("i"), F.col(item_col).alias("x"))
    a = it.select("i", F.col("x").alias("item_a"))
    b = it.select("i", F.col("x").alias("item_b"))
    pairs = (
        a.join(b, "i")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= min_support_n)
    )
    freq = it.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("nx"))
    nn = it.select("i").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    j = (
        pairs.join(
            F.broadcast(freq.select(F.col("x").alias("item_a"),
                                    F.col("nx").alias("n_a"))), "item_a")
        .join(
            F.broadcast(freq.select(F.col("x").alias("item_b"),
                                    F.col("nx").alias("n_b"))), "item_b")
        .crossJoin(F.broadcast(nn))
    )
    return j.select(
        "item_a", "item_b", "n_ab", "n_a", "n_b",
        (F.col("n_ab").cast("double") / F.col("n").cast("double"))
        .alias("support"),
        (F.col("n_ab").cast("double") / F.col("n_a").cast("double"))
        .alias("conf_ab"),
        (F.col("n_ab").cast("double") / F.col("n_b").cast("double"))
        .alias("conf_ba"),
        (F.col("n_ab").cast("double") * F.col("n").cast("double")
         / (F.col("n_a").cast("double") * F.col("n_b").cast("double")))
        .alias("lift"),
    )
