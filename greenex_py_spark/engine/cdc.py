"""Snapshot diff — change-data-capture between two table snapshots.

A recrawl pipeline re-lands the same URL keyspace every snapshot; the
downstream curation run wants only the CHANGES (CommonCrawl CDX "new
capture" semantics, Iceberg's ``create_changelog_view``).  Diffing two
keyed snapshots is one full-outer equi-join on the key plus a content
hash compare:

    added    — key only in the new snapshot
    deleted  — key only in the old snapshot
    updated  — key in both, content hash differs
    (unchanged rows are dropped — they are the ~99% at recrawl scale)

The content compare uses md5 (engine-portable per the house hashing
rule) computed ON EACH SIDE'S SCAN — the join carries two 32-char
digests per key, never the payloads, so a 100 TB text column never
moves through the shuffle (same hash-first discipline as
functions/dedup.py:38 exact dedup).

Scale shape: one sort-merge full-outer join keyed by the table key; on
bucketed snapshot tables (engine/bucketing.py) the join is co-located
and shuffle-free.  Output is change-only, so sinks are tiny relative
to inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    value_col: str = "text",
) -> DataFrame:
    """[key_col, status, new_hash] — change rows between two snapshots.

    ``status`` in ('added', 'updated', 'deleted'); ``new_hash`` is the
    md5 of the new content (NULL for deletes) so a downstream
    incremental dedup can consume the diff without rereading the
    snapshot.  Unchanged keys are filtered out before the sink.
    """
    o = old.select(F.col(key_col), F.md5(F.col(value_col)).alias("_oh"))
    n = new.select(F.col(key_col), F.md5(F.col(value_col)).alias("_nh"))
    j = o.join(n, key_col, "full_outer")
    status = (
        F.when(F.col("_oh").isNull(), F.lit("added"))
        .when(F.col("_nh").isNull(), F.lit("deleted"))
        .when(F.col("_oh") != F.col("_nh"), F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status") != "unchanged")
        .select(key_col, "status", F.col("_nh").alias("new_hash"))
    )
