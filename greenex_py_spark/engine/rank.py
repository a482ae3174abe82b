"""Distributed global ranking — row_number over a TOTAL order without
the single-task trap.

``Window.orderBy(...)`` with no partition key funnels the whole table
through one task; the scalable form is the classic two-phase rank:
range-partition on the order key, rank locally within each (sorted,
non-overlapping) partition, and add broadcast cumulative partition
offsets.  Ranks are boundary-independent — whatever boundaries the
range partitioner samples, a total order gives every row exactly one
global position — so the result is deterministic even though the
sampled boundaries are not part of the contract.

The caller MUST pass a total order (include a unique id as the last
key); with duplicate keys the split across a partition boundary would
otherwise be sampler-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """+ ``out_col`` — 1-based global row_number under the total order
    ``order_cols``.  Two range shuffles, no global sort task.

    ``with_pid`` is localCheckpoint'd because BOTH branches (the
    offset counts and the local ranks) consume it: without the
    materialization Catalyst may evaluate the range exchange twice,
    and the two RangePartitioners can sample DIFFERENT boundaries
    (AQE re-plans each subtree independently), silently skewing ranks
    past n — caught by the tri-scale sweep at sf0.1 (q_dedup_yield
    emitted an 11th decile); the one-evaluation guarantee is part of
    this function's contract, not an optimization.
    """
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parts = df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
    with_pid = parts.withColumn(
        "_pid", F.spark_partition_id()
    ).localCheckpoint()
    local_w = Window.partitionBy("_pid").orderBy(*order_cols)
    counts = with_pid.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(off_w), F.lit(0)).alias("_off")
    )
    return (
        with_pid.withColumn("_lr", F.row_number().over(local_w))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_lr") + F.col("_off")).cast("long"))
        .drop("_pid", "_lr", "_off")
    )


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    val_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """+ ``out_col`` — inclusive prefix sum of ``val_col`` under the
    total order ``order_cols``, by the same two-phase shape as
    :func:`global_rank`: per-range-partition local cumsum + broadcast
    partition-total offsets.  Exact for integer values (the intended
    use); no single-task global window anywhere.  ``with_pid`` is
    localCheckpoint'd for the same double-evaluation reason as
    :func:`global_rank` — offsets and local cumsums must see the SAME
    sampled range boundaries."""
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parts = df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
    with_pid = parts.withColumn(
        "_pid", F.spark_partition_id()
    ).localCheckpoint()
    local_w = (
        Window.partitionBy("_pid").orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    totals = with_pid.groupBy("_pid").agg(F.sum(val_col).alias("_tot"))
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_tot").over(off_w), F.lit(0)).alias("_off")
    )
    return (
        with_pid.withColumn("_lc", F.sum(val_col).over(local_w))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_lc") + F.col("_off")).cast("long"))
        .drop("_pid", "_lc", "_off")
    )


def spearman_rho(
    df: DataFrame,
    col_a: str,
    col_b: str,
    id_col: str,
) -> DataFrame:
    """[n, sum_d2, rho] — Spearman rank correlation between two columns
    under deterministic total orders (ties broken by ``id_col``, the
    standard competition-free convention that keeps every rank distinct
    so the closed form ``rho = 1 − 6Σd²/(n(n²−1))`` is exact).

    Both rankings use the two-phase :func:`global_rank`; Σd² is an
    exact int64 sum (order-free), and the single FP step — one division
    — is the identical expression in both engines."""
    ra = global_rank(df.select(id_col, col_a), [col_a, id_col], "ra")
    rb = global_rank(df.select(id_col, col_b), [col_b, id_col], "rb")
    j = ra.select(id_col, "ra").join(rb.select(id_col, "rb"), id_col)
    d = F.col("ra") - F.col("rb")
    agg = j.agg(
        F.count("*").alias("n"),
        F.sum(d * d).alias("sum_d2"),
    )
    n = F.col("n")
    rho = 1.0 - (6 * F.col("sum_d2")).cast("double") / (n * (n * n - 1)).cast("double")
    return agg.select("n", "sum_d2", F.round(rho, 6).alias("rho"))


def hex_prefix_running_max(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "run_max_prior",
    prefix_chars: int = 2,
) -> DataFrame:
    """+ ``out_col`` — running max of ``value_col`` over all rows
    STRICTLY BEFORE the current one in the total order of
    ``order_col`` (a fixed-width hex string, e.g. an md5), without a
    single-task global window.

    Two-phase scan: bucket on the first ``prefix_chars`` hex chars
    (buckets are lexicographically ordered BY CONSTRUCTION — no
    sampled range boundaries to depend on, unlike global_rank), take
    per-bucket maxima, prefix-max them over the tiny bucket dim, and
    broadcast the offsets back; within each bucket one ordered window
    computes the strictly-prior max.  16^prefix_chars buckets bound
    both the dim table and the per-task frame.  NULL when no prior
    row exists (global first row)."""
    b = F.substring(F.col(order_col), 1, prefix_chars)
    d = df.withColumn("_bk", b)
    per = d.groupBy("_bk").agg(F.max(value_col).alias("_bmax"))
    off_w = Window.orderBy("_bk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per.select(
        "_bk", F.max("_bmax").over(off_w).alias("_prev_max")
    )
    in_w = (
        Window.partitionBy("_bk")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.join(F.broadcast(offsets), "_bk")
        .withColumn("_wmax", F.max(value_col).over(in_w))
        .withColumn(
            out_col,
            F.when(
                F.col("_wmax").isNull() & F.col("_prev_max").isNull(),
                F.lit(None),
            ).otherwise(
                F.greatest(
                    F.coalesce("_wmax", "_prev_max"),
                    F.coalesce("_prev_max", "_wmax"),
                )
            ),
        )
        .drop("_bk", "_bmax", "_prev_max", "_wmax")
    )
