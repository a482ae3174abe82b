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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["snapshot_diff", "incremental_rollup", "scd2_history"]


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


def incremental_rollup(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    group_col: str = "source",
    weight_col: str = "n_chars",
    value_col: str = "text",
) -> DataFrame:
    """[group, n_docs, tot_weight] — the NEW snapshot's per-group
    rollup computed INCREMENTALLY: base rollup over the old snapshot
    plus contributions from change rows only (incremental view
    maintenance, the Iceberg-changelog consumer pattern).  At recrawl
    scale ~99% of keys are unchanged, so the delta aggregation touches
    the diff, not the corpus; the gate's oracle recomputes the rollup
    from scratch on the new snapshot, so the hash match PROVES
    base + delta == scratch.

    Change detection hashes ``value_col`` on each side's scan (digests
    join, payloads don't); a key whose group changes contributes -1 to
    the old group and +1 to the new one.  All aggregates are exact
    integer sums.  The change-row frame is localCheckpoint-materialized
    (it feeds the -old and +new branches — the no-CSE rule).
    """
    o = old.select(
        F.col(key_col),
        F.col(group_col).alias("_go"),
        F.col(weight_col).cast("long").alias("_wo"),
        F.md5(F.col(value_col)).alias("_oh"),
    )
    n = new.select(
        F.col(key_col),
        F.col(group_col).alias("_gn"),
        F.col(weight_col).cast("long").alias("_wn"),
        F.md5(F.col(value_col)).alias("_nh"),
    )
    ch = (
        o.join(n, key_col, "full_outer")
        .filter(
            F.col("_oh").isNull()
            | F.col("_nh").isNull()
            | (F.col("_oh") != F.col("_nh"))
            | (F.col("_go") != F.col("_gn"))
            | (F.col("_wo") != F.col("_wn"))
        )
        .localCheckpoint()
    )
    neg = ch.filter(F.col("_oh").isNotNull()).select(
        F.col("_go").alias("grp"), F.lit(-1).alias("dn"), (-F.col("_wo")).alias("dw")
    )
    pos = ch.filter(F.col("_nh").isNotNull()).select(
        F.col("_gn").alias("grp"), F.lit(1).alias("dn"), F.col("_wn").alias("dw")
    )
    delta = neg.unionByName(pos).groupBy("grp").agg(
        F.sum("dn").alias("dn"), F.sum("dw").alias("dw")
    )
    base = old.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.col(weight_col).cast("long")).alias("w0"),
    )
    merged = base.join(delta, "grp", "full_outer").select(
        F.col("grp").alias(group_col),
        (F.coalesce(F.col("n0"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0)))
        .cast("long")
        .alias("n_docs"),
        (F.coalesce(F.col("w0"), F.lit(0)) + F.coalesce(F.col("dw"), F.lit(0)))
        .cast("long")
        .alias("tot_weight"),
    )
    return merged.filter(F.col("n_docs") > 0)


def scd2_history(
    df: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    seq_col: str = "event_id",
) -> DataFrame:
    """[key, attr, valid_from_us, valid_to_us, version, is_current] —
    slowly-changing-dimension Type-2 history built from an event log.

    The warehouse-standard dimension-versioning shape (Kimball SCD2 /
    Delta MERGE ``whenMatchedUpdate`` + close-old-row): consecutive
    duplicate attribute values collapse into one validity interval;
    each change opens a new version whose ``valid_from`` is the change
    event's timestamp and whose ``valid_to`` is the next change's
    (NULL + ``is_current`` for the open row).  Validity bounds ship as
    exact epoch-microsecond int64s (the spacetime.py convention) so no
    timestamp formatting crosses engines.

    Determinism: event order within a key is (ts, seq) — the unique
    sequence column breaks timestamp ties, so change detection is
    total-ordered.  Scale shape: two windows over the SAME
    (key)(ts, seq) sort — one shuffle by key, the change-row frame is
    |changes| ≪ |events|.  No reference analogue (the reference has no
    event-log surface); semantics follow Kimball's SCD Type-2.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(seq_col))
    ch = (
        df.select(key_col, ts_col, seq_col, attr_col)
        .withColumn("_prev", F.lag(attr_col).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr_col)))
    )
    w2 = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(seq_col))
    nxt = F.lead(ts_col).over(w2)
    return ch.select(
        F.col(key_col),
        F.col(attr_col).alias("attr"),
        us.alias("valid_from_us"),
        F.unix_micros(nxt.cast("timestamp")).alias("valid_to_us"),
        F.row_number().over(w2).cast("long").alias("version"),
        nxt.isNull().alias("is_current"),
    )


def merge_apply(
    target: DataFrame,
    batch: DataFrame,
    key_col: str = "doc_id",
    value_col: str = "text",
    status_col: str = "status",
) -> DataFrame:
    """[key, value] — MERGE INTO semantics: apply a CDC batch to a
    snapshot (Delta/Iceberg ``MERGE`` / ``whenMatchedUpdate`` +
    ``whenNotMatchedInsert`` + ``whenMatchedDelete``).

    ``batch`` rows are [key, status, value] with status in
    ('added','updated','deleted'); added/updated carry the new payload,
    deleted rows need none.  Result = target rows whose key is absent
    from the batch, plus the batch's upserts — so
    ``merge_apply(old, snapshot_diff(old,new)⋈new) == new`` exactly,
    which is how the gate hash-proves it.

    Scale shape: one anti-join on the key (co-located and shuffle-free
    on bucketed snapshots, engine/bucketing.py) + a union with the
    change sliver.  The batch feeds two branches (anti + upserts), so
    it is localCheckpoint-materialized per the no-CSE rule.
    """
    b = batch.select(key_col, status_col, value_col).localCheckpoint()
    kept = target.select(key_col, value_col).join(
        b.select(key_col), key_col, "left_anti"
    )
    ups = b.filter(F.col(status_col) != "deleted").select(key_col, value_col)
    return kept.unionByName(ups)


def mor_read(
    base: DataFrame,
    deletes: DataFrame,
    appends: DataFrame,
    file_col: str = "file_id",
    pos_col: str = "pos",
) -> DataFrame:
    """Merge-on-read with DELETION VECTORS (Delta DVs / Iceberg
    positional delete files): the physical table is immutable ``base``
    files plus a small (file, position) delete dim plus append deltas,
    and the READ reconstructs the logical table as

        (base  ANTI JOIN  deletes ON (file, pos))  UNION ALL  appends

    — the position-based semantic that distinguishes DVs from keyed
    MERGE (:func:`merge_apply` rewrites files eagerly; DVs defer the
    rewrite to compaction and pay one anti-join per read instead).
    Updates are modelled the standard way: delete the old position,
    append the new row.

    Scale shape: the delete dim is delete-fraction-sized — broadcast
    it (Spark plans the anti-join as BroadcastNestedLoop only without
    the equi-keys; with (file, pos) keys it is a broadcast hash
    anti-join), so the read adds zero shuffles over the base scan.
    Appends are unioned, never joined."""
    d = F.broadcast(
        deletes.select(
            F.col(file_col).alias("_df"), F.col(pos_col).alias("_dp")
        )
    )
    kept = base.join(
        d,
        (F.col(file_col) == F.col("_df")) & (F.col(pos_col) == F.col("_dp")),
        "left_anti",
    )
    return kept.unionByName(appends)
