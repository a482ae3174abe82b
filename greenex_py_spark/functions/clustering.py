"""Distributed quantized k-means over embedding columns.

Lloyd's algorithm with two determinism devices that make the *iterative*
computation exactly reproducible across engines (and therefore
SQL-oracle-checkable — rare for iterative ML):

- **quantized updates**: every centroid coordinate is rounded to 6 dp
  after each mean update, and every point-centroid distance is rounded
  to 6 dp before the argmin (ties break by centroid id) — FP summation
  order can no longer flip an assignment;
- **deterministic init**: centroids start as the vectors with
  ``id < k`` (the same device the IVF coarse quantizer uses).

Shapes: the centroid table is k rows — it broadcasts; assignment is a
map-side crossJoin + windowless argmin per point (row_number over a
k-row partition); the update is one posexplode→groupBy(avg) per round
(partial aggregation, single shuffle of (cluster, dim) partials).  The
driver collects nothing.  Empty clusters keep their previous centroid.

At 100 TB the per-point k×dim distance arithmetic moves into the BLAS
``mapInPandas`` kernel exactly like similarity.cosine_topk — the
relational form here is the oracle-parity reference implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sqdist(vcol, ccol):
    return F.round(
        F.aggregate(
            F.zip_with(vcol, ccol, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def kmeans_fit_predict(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """[id, cluster] — assignment after ``iters`` quantized Lloyd rounds
    (a final assignment pass runs against the last updated centroids)."""
    v = df.select(
        id_col, F.transform(F.col(vec_col), lambda e: e.cast("double")).alias("v")
    )
    cents = v.filter(F.col(id_col) < k).select(
        F.col(id_col).alias("cid"), F.col("v").alias("cv")
    )

    def assign(cents_df: DataFrame) -> DataFrame:
        w = Window.partitionBy(id_col).orderBy(F.col("_d").asc(), F.col("cid").asc())
        return (
            v.crossJoin(F.broadcast(cents_df))
            .withColumn("_d", _sqdist(F.col("v"), F.col("cv")))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(id_col, "cid", "v")
        )

    for _ in range(iters):
        asg = assign(cents)
        dims = asg.select("cid", F.posexplode("v").alias("pos", "val"))
        upd = (
            dims.groupBy("cid", "pos")
            .agg(F.round(F.avg("val"), 6).alias("cval"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                    lambda s: s["cval"],
                ).alias("cv_new")
            )
        )
        cents = (
            cents.join(upd, "cid", "left")
            .select("cid", F.coalesce(F.col("cv_new"), F.col("cv")).alias("cv"))
            # k rows — truncate lineage per round or Catalyst re-analysis
            # grows super-linearly with iters (same failure mode the CC
            # loop hit; BENCH/SCALE_AUDIT.md)
            .localCheckpoint()
        )
    return assign(cents).select(id_col, F.col("cid").alias("cluster"))


def kmeans_oracle_sql(
    k: int = 4, iters: int = 2, dim: int = 64, table: str = "embeddings"
) -> str:
    """The identical quantized Lloyd rounds as one DuckDB SQL string
    (CTE per round, unrolled) — exact-match oracle for
    :func:`kmeans_fit_predict`."""
    sq = (
        "round(list_sum(list_transform(list_zip(v.v, c.cv), "
        "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) "
        "* (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), 6)"
    )

    def assign_cte(name: str, cents: str) -> str:
        return f"""{name} AS (
  SELECT vec_id, cid, v FROM (
    SELECT v.vec_id, c.cid, v.v,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY {sq} ASC, c.cid ASC) AS rn
    FROM v, {cents} c) WHERE rn = 1
)"""

    parts = [
        f"WITH v AS (SELECT vec_id, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v FROM {table})",
        f"c0 AS (SELECT vec_id AS cid, v AS cv FROM v WHERE vec_id < {k})",
    ]
    for it in range(iters):
        parts.append(assign_cte(f"a{it}", f"c{it}"))
        parts.append(
            f"""d{it} AS (
  SELECT cid, i.range AS pos, round(avg(v[i.range]), 6) AS cval
  FROM a{it}, range(1, {dim + 1}) i GROUP BY cid, i.range
)"""
        )
        parts.append(
            f"u{it} AS (SELECT cid, list(cval ORDER BY pos) AS cv FROM d{it} GROUP BY cid)"
        )
        parts.append(
            f"""c{it + 1} AS (
  SELECT c.cid, coalesce(u.cv, c.cv) AS cv
  FROM c{it} c LEFT JOIN u{it} u ON u.cid = c.cid
)"""
        )
    parts.append(assign_cte("afinal", f"c{iters}"))
    return ",\n".join(parts) + "\nSELECT vec_id, cid AS cluster FROM afinal"
