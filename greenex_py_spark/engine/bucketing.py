"""Bucketed (co-located) joins — the shuffle-elimination storage layout
for repeated big×big joins (SURVEY.md scale notes; the Iceberg
bucket-partition-transform analogue on the plain-parquet catalog).

A 100 TB pipeline joins the documents table against per-doc side tables
(scores, dedup verdicts, embeddings) on ``doc_id`` many times.  Writing
both sides bucketed on the join key makes every subsequent join a
zero-exchange sort-merge: each task reads matching bucket files from
both tables and merges locally — no shuffle of either table, ever
again.  This module is the thin write/read convention wrapper; the
plan-level guarantee (no Exchange above either scan) is pinned by
tests/test_engine.test_bucketed_join_eliminates_shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort_by: str | None = "key",
) -> None:
    """Persist df bucketed by ``key`` into the session catalog.
    ``sort_by``: column to sort within buckets — the default sentinel
    ``"key"`` sorts by the bucket key (lets the join skip its sort
    stages too); pass ``None`` to skip the sort entirely (append-heavy
    staging where sort cost dominates the write).  ``buckets`` should
    match the downstream join's parallelism appetite (fixed at write
    time — choose for the CLUSTER, e.g. a few buckets per executor
    core)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort_by is not None:
        w = w.sortBy(key if sort_by == "key" else sort_by)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def plan_has_exchange(df: DataFrame) -> bool:
    """True iff the physical plan contains any shuffle Exchange —
    the predicate the co-location guarantee is asserted with."""
    txt = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in txt or "Exchange rangepartitioning" in txt
