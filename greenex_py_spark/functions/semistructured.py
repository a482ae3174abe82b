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


def variant_field_hist(
    df: DataFrame,
    json_col: str = "props",
    field: str = "k",
    bin_width: int = 10,
    value_col: str = "value",
) -> DataFrame:
    """[bin, n, n_types, sum_k, value_q] — histogram of one integer
    field extracted through Spark 4's VARIANT type (``try_parse_json``
    → ``try_variant_get``): the open-schema semi-structured path where
    :func:`json_field_stats`'s ``from_json`` is the closed-schema one.
    VARIANT keeps the parsed document in a binary columnar encoding,
    so repeated field probes don't re-parse the JSON text — the shape
    Spark 4 ships for crawl-metadata columns whose keys drift across
    snapshots.  Malformed documents or missing fields land in the
    ``bin = -1`` bucket (observable, never dropped); the companion
    ``value`` sum is 1e-6-quantized to exact longs in both engines.

    Scale: parse + probe fuse into the column-pruned scan; only the
    dim-sized (value-range / bin_width) histogram shuffles."""
    v = F.try_parse_json(F.col(json_col))
    k = F.try_variant_get(v, f"$.{field}", "int")
    b = F.when(k.isNull(), F.lit(-1)).otherwise(
        F.floor(k.cast("double") / F.lit(float(bin_width)))
    ).cast("long")
    g = df.select(
        b.alias("bin"),
        k.alias("_k"),
        F.col("event_type").alias("_t"),
        F.floor(F.col(value_col) * 1000000.0 + 0.5).cast("long").alias("_vq"),
    )
    return g.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("_t").cast("long").alias("n_types"),
        F.coalesce(F.sum("_k"), F.lit(0)).cast("long").alias("sum_k"),
        F.sum("_vq").cast("long").alias("value_q"),
    )
