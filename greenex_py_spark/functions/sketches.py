"""Distinct-count sketching + vocabulary heavy hitters — the corpus
statistics a 100 TB pipeline computes without ever holding a dictionary
in memory.

KMV (k-minimum-values) distinct estimator: hash every value to (0,1],
keep the k smallest hashes per group (one partial-aggregable top-k),
estimate ``distinct ≈ (k−1)/h_(k)``.  Unlike HLL implementations the
whole sketch is plain relational arithmetic over a PORTABLE hash
(md5→24-bit-normalized), so the estimator — not just its inputs — has
an exact DuckDB oracle; merging sketches = merging sorted min-lists
(associative, partial-agg friendly: the shuffle carries k doubles per
group, never the value set).

Heavy hitters: exact per-group top-k by count with deterministic
tie-break — the vocabulary-building primitive (two-phase count then a
per-group window over the ALREADY-aggregated counts, so the window
shuffles one row per distinct token, not per occurrence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 24 hex chars = 96 bits is overkill; 12 chars = 48 bits keeps the
# uniform-(0,1] mapping exact in a double while collisions stay ~n²/2⁴⁹
_HEX_DIGITS = 12
_DENOM = float(16 ** _HEX_DIGITS)


def _unit_hash(col):
    """md5-derived uniform (0, 1] hash — identical in Spark and DuckDB."""
    return (
        F.conv(F.substring(F.md5(col), 1, _HEX_DIGITS), 16, 10).cast("double") + 1.0
    ) / _DENOM


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """[*group_cols, n_seen, est_distinct] — KMV estimate per group.

    ``n_seen`` counts rows (not distinct); ``est_distinct`` is the KMV
    estimate rounded to 3 dp, exact-equal to the true distinct count
    when a group has fewer than k distinct values (the sketch then
    holds every hash).

    Shape: the estimator needs only the k-th smallest distinct hash and
    the under-k count, so the plan is distinct → per-group rank →
    filter ≤ k → tiny agg — per-task state stays bounded and the window
    sort spills; no group ever materializes its value set in one agg
    buffer (a collect_set formulation would).  For extreme per-group
    cardinality where even the distinct shuffle is unwanted, the
    partial-sketch swap is a mapInPandas per-partition k-min pass
    merged by a second k-min — same estimate, sketch-sized shuffle.
    """
    gcols = group_cols or []
    hashed = df.select(*gcols, _unit_hash(F.col(value_col)).alias("_h"))
    n_rows = hashed.groupBy(*gcols).agg(F.count("*").alias("n_seen"))
    w = Window.partitionBy(*gcols).orderBy(F.col("_h").asc())
    topk = (
        hashed.dropDuplicates([*gcols, "_h"])
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
    )
    sk = topk.groupBy(*gcols).agg(
        F.count("*").alias("_nmin"), F.max("_h").alias("_kth")
    )
    est = F.when(F.col("_nmin") < k, F.col("_nmin").cast("double")).otherwise(
        (F.lit(k) - 1.0) / F.col("_kth")
    )
    joined = n_rows.join(sk, gcols) if gcols else n_rows.crossJoin(sk)
    return joined.select(*gcols, "n_seen", F.round(est, 3).alias("est_distinct"))


def kmv_distinct_sql(
    table_sql: str, value_expr: str, group_cols: list[str], k: int = 256
) -> str:
    """The identical estimator as DuckDB SQL (generated — same hash,
    same top-k, same estimate arithmetic)."""
    g = ", ".join(group_cols)
    uh = (
        f"(CAST(CAST(('0x' || substr(md5({value_expr}), 1, {_HEX_DIGITS})) AS UBIGINT) AS DOUBLE)"
        f" + 1.0) / {_DENOM!r}"
    )
    return f"""
WITH h AS (SELECT {g}, {uh} AS _h FROM {table_sql}),
n AS (SELECT {g}, count(*) AS n_seen FROM h GROUP BY {g}),
d AS (SELECT DISTINCT {g}, _h FROM h),
r AS (
  SELECT {g}, _h, row_number() OVER (PARTITION BY {g} ORDER BY _h ASC) AS rn
  FROM d
),
sk AS (
  SELECT {g}, count(*) AS nmin, max(_h) AS kth FROM r WHERE rn <= {k} GROUP BY {g}
)
SELECT {g}, n_seen,
       round(CASE WHEN nmin < {k} THEN CAST(nmin AS DOUBLE)
                  ELSE ({k} - 1.0) / kth END, 3) AS est_distinct
FROM n JOIN sk USING ({g})
"""


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 20,
) -> DataFrame:
    """[*group_cols, value, n, rank] — exact per-group top-k by count,
    ties broken by value asc (deterministic vocabulary order)."""
    gcols = group_cols or []
    counts = df.groupBy(*gcols, F.col(value_col).alias("value")).agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy(*gcols).orderBy(F.col("n").desc(), F.col("value").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
