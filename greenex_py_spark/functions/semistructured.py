"""Semi-structured (JSON) column operators.

Web-scale event/page tables carry JSON payload columns (crawler
metadata, page props); the engine extracts them with
``from_json`` + an EXPLICIT schema — typed, JVM-side, codegen — never
schema inference (a second scan) and never Python parsing.  Malformed
documents yield NULL fields (Spark's PERMISSIVE default), which the
aggregates count rather than drop, so payload corruption is observable
instead of silent.

Scale shape: extraction is a pure map stage fused into the scan
(column-pruned to the JSON column); only the dim-sized per-group
aggregate shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def json_field_stats(
    df: DataFrame,
    json_col: str = "props",
    field: str = "k",
    field_type: str = "INT",
    group_col: str = "event_type",
) -> DataFrame:
    """[grp, n, n_null, sum_k, min_k, max_k] — extract one typed field
    from a JSON string column and profile it per group.  ``n_null``
    counts missing/malformed extractions (the data-quality signal)."""
    k = F.from_json(F.col(json_col), f"{field} {field_type}")[field]
    g = df.select(F.col(group_col).alias("grp"), k.alias("_k"))
    return g.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("_k").isNull(), 1).otherwise(0)).cast("long")
        .alias("n_null"),
        F.coalesce(F.sum("_k"), F.lit(0)).cast("long").alias("sum_k"),
        F.min("_k").cast("long").alias("min_k"),
        F.max("_k").cast("long").alias("max_k"),
    )
