"""Deterministic sampling / dataset splitting for the corpus pipeline.

Production training-data pipelines never use RNG sampling for splits —
they hash a stable key so the same document lands in the same split on
every run, on any engine, at any scale (no shuffled state, no seed
coordination across executors).  Both operators here are pure codegen
and DuckDB-oracle-exact:

- :func:`hash_split` — train/val/test assignment from md5(key) mod N;
- :func:`stratified_sample` — per-stratum (e.g. per-language) keep
  rates, same hash-mod mechanism.

``pmod(md5-int, 10000)`` gives a uniform 0..9999 bucket; rates are
expressed in basis points so thresholds are exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(key_col: str) -> "F.Column":
    """Stable 0..9999 bucket from the md5 of the key (portable: DuckDB
    reproduces it with ``CAST('0x'||substr(md5(k),1,8) AS UBIGINT)``)."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10).cast("long"),
        F.lit(10000),
    )


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    val_bp: int = 500,
    test_bp: int = 500,
) -> DataFrame:
    """+ ``split`` ∈ {train, val, test} — deterministic per key.

    val gets buckets [0, val_bp), test [val_bp, val_bp+test_bp), train
    the rest — basis points of 10 000.
    """
    b = _bucket(key_col)
    return df.withColumn(
        "split",
        F.when(b < val_bp, F.lit("val"))
        .when(b < val_bp + test_bp, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def stratified_sample(
    df: DataFrame,
    rates_bp: dict[str, int],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    default_bp: int = 0,
) -> DataFrame:
    """Rows whose bucket falls under their stratum's keep-rate (basis
    points) — the deterministic analogue of ``df.sampleBy``."""
    b = _bucket(key_col)
    thr = F.lit(default_bp)
    for stratum, bp in sorted(rates_bp.items()):
        thr = F.when(F.col(stratum_col) == stratum, F.lit(bp)).otherwise(thr)
    return df.filter(b < thr)


def group_sample(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic uniform k-per-group sample: rank rows by the md5
    hash of their key within each group, keep the k smallest — the
    same per-key stability contract as hash_split (same rows survive
    across runs/engines/scales; adding rows to a group only swaps
    members whose hash rank crosses k).  The distributed reservoir-
    sampling equivalent, minus the nondeterminism."""
    from pyspark.sql import Window

    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10).cast("long")
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
