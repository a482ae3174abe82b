"""Global spatial autocorrelation (Moran's I) over a regular grid.

The reference computes per-location greenness indicators but never a
corpus-level spatial statistic; Moran's I is the standard "is exposure
spatially clustered?" summary a geospatial analytics engine needs
(Moran 1950; the form here is the usual row-raw rook-adjacency global
I, e.g. PySAL's ``esda.Moran`` with binary contiguity weights).

    I = (n / W) * sum_pairs (vi - mu)(vj - mu) / sum_i (vi - mu)^2

with W = number of DIRECTED rook-adjacent pairs and mu = mean(v).

Engine-exactness: the input value must be integer-valued (the callers
pass micro-unit-scaled round-6 values).  With S = sum(v),
P = sum_pairs (vi + vj), the centered sums multiply out to

    n^2 * num = n^2 * sum(vi*vj) - n*S*P + W*S^2      (= A)
    n   * den = n   * sum(vi^2)  - S^2                (= B)
    I = A / (W * B)

A and B are computed in DECIMAL(38,0) — exact integers in any engine —
so the only FP step is one final double division: bit-identical across
Spark and DuckDB, no rounding escape hatch needed.

Spark shape: adjacency is an equi-join — each cell explodes its 4
rook-neighbor keys and joins back on (gx, gy); never an all-pairs or a
theta join, so the pair count is O(cells), not O(cells^2).  Both
reductions are two-phase partial aggregates; the two 1-row aggregates
cross-join at the end (broadcast by construction).  The shape is
scale-free: a continental grid just means more cells through the same
equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["morans_i", "getis_ord_gi"]

_DEC = "decimal(38,0)"


def morans_i(
    cells: DataFrame,
    gx_col: str = "gx",
    gy_col: str = "gy",
    val_col: str = "v",
) -> DataFrame:
    """One row [n_cells, w_pairs, morans_i] — global Moran's I of the
    integer-valued ``val_col`` over rook (4-neighbour) adjacency.

    ``cells`` must hold one row per occupied cell; cells with no
    occupied neighbour contribute to n and the denominator but no
    pairs (standard binary-weights behaviour).  ``morans_i`` is null
    when the variance is zero or no pairs exist.
    """
    c = cells.select(
        F.col(gx_col).alias("gx"),
        F.col(gy_col).alias("gy"),
        F.col(val_col).cast("long").alias("v"),
    )
    vd = F.col("v").cast(_DEC)
    s = c.agg(
        F.count("*").alias("n"),
        F.sum(vd).alias("sv"),
        F.sum(vd * F.col("v")).alias("svv"),
    )
    nb = c.select(
        F.explode(
            F.array(
                F.struct((F.col("gx") + 1).alias("gx"), F.col("gy").alias("gy")),
                F.struct((F.col("gx") - 1).alias("gx"), F.col("gy").alias("gy")),
                F.struct(F.col("gx").alias("gx"), (F.col("gy") + 1).alias("gy")),
                F.struct(F.col("gx").alias("gx"), (F.col("gy") - 1).alias("gy")),
            )
        ).alias("k"),
        F.col("v").alias("av"),
    ).select(F.col("k.gx").alias("gx"), F.col("k.gy").alias("gy"), "av")
    avd = F.col("av").cast(_DEC)
    p = nb.join(c, ["gx", "gy"]).agg(
        F.count("*").alias("w"),
        F.coalesce(F.sum(avd * F.col("v")), F.lit(0).cast(_DEC)).alias("spp"),
        F.coalesce(F.sum(avd + vd), F.lit(0).cast(_DEC)).alias("sab"),
    )
    nd = F.col("n").cast(_DEC)
    wd = F.col("w").cast(_DEC)
    a = nd * nd * F.col("spp") - nd * F.col("sv") * F.col("sab") + wd * F.col("sv") * F.col("sv")
    b = nd * F.col("svv") - F.col("sv") * F.col("sv")
    return s.crossJoin(p).select(
        F.col("n").alias("n_cells"),
        F.col("w").alias("w_pairs"),
        (
            a.cast("double")
            / F.nullif(wd.cast("double") * b.cast("double"), F.lit(0.0))
        ).alias("morans_i"),
    )


def getis_ord_gi(
    cells: DataFrame,
    gx_col: str = "gx",
    gy_col: str = "gy",
    val_col: str = "v",
    hot_z: float = 1.96,
) -> DataFrame:
    """[gx, gy, w_i, gi_z, hot] — local Getis-Ord Gi* hotspot z-score per
    occupied cell (Getis & Ord 1992, the star variant: the 3x3 queen
    neighbourhood INCLUDES the cell itself), binary weights.

    The local complement of :func:`morans_i`: Moran's I says "is exposure
    clustered at all?", Gi* says "*which* cells are the hot spots?".

    Same engine-exactness strategy as morans_i — with integer ``val_col``
    and W_i = occupied neighbours (incl. self), L_i = their value sum,

        A_i = n*L_i - Sv*W_i        (numerator, exact DECIMAL(38,0))
        B   = n*Svv - Sv^2          (global variance term, exact)
        C_i = n*W_i - W_i^2         (weight variance term, exact)
        z_i = A_i * sqrt(n-1) / sqrt(B * C_i)

    so the only FP steps are correctly-rounded IEEE casts / one multiply /
    one sqrt / one divide in a fixed order — bit-identical across Spark
    and DuckDB (gi_z is still rounded to 6 dp per house convention).
    C_i = 0 (every cell in every neighbourhood) yields null.

    Spark shape: each cell explodes its 9 neighbour keys and equi-joins
    back on (gx, gy) — O(cells), never all-pairs; the two 1-row global
    aggregates broadcast via the final cross join.
    """
    c = cells.select(
        F.col(gx_col).alias("gx"),
        F.col(gy_col).alias("gy"),
        F.col(val_col).cast("long").alias("v"),
    )
    vd = F.col("v").cast(_DEC)
    s = c.agg(
        F.count("*").alias("n"),
        F.sum(vd).alias("sv"),
        F.sum(vd * F.col("v")).alias("svv"),
    )
    nb = c.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("gx") + dx).alias("gx"), (F.col("gy") + dy).alias("gy")
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("k"),
        F.col("v").alias("av"),
    ).select(F.col("k.gx").alias("gx"), F.col("k.gy").alias("gy"), "av")
    loc = (
        nb.join(c.select("gx", "gy"), ["gx", "gy"])
        .groupBy("gx", "gy")
        .agg(
            F.count("*").alias("w_i"),
            F.sum(F.col("av").cast(_DEC)).alias("li"),
        )
    )
    nd = F.col("n").cast(_DEC)
    wd = F.col("w_i").cast(_DEC)
    a = nd * F.col("li") - F.col("sv") * wd
    b = nd * F.col("svv") - F.col("sv") * F.col("sv")
    ci = nd * wd - wd * wd
    z = F.round(
        a.cast("double")
        * F.sqrt((F.col("n") - 1).cast("double"))
        / F.nullif(F.sqrt(b.cast("double") * ci.cast("double")), F.lit(0.0)),
        6,
    )
    return loc.crossJoin(s).select(
        "gx",
        "gy",
        "w_i",
        z.alias("gi_z"),
        F.coalesce(z >= F.lit(hot_z), F.lit(False)).alias("hot"),
    )

