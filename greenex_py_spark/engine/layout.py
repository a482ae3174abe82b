"""Z-order (Morton) data layout for write-time spatial clustering.

The reference is single-machine and never thinks about file layout; at
100 TB the dominant cost of every spatial query is how many parquet
files a cell-range predicate has to open.  Clustering rows by a
space-filling curve before writing (Delta/Iceberg ``OPTIMIZE ZORDER``
style) turns a 2-D cell-range scan into a handful of contiguous file
ranges, because Morton order preserves 2-D locality: a k x k cell block
spans O(k) curve ranges instead of O(k^2) scattered files.

``zorder_key`` is the pure-codegen Column twin of the NumPy
``geo/cells.morton_cell`` (same bit-spread, same key space) — the NumPy
one serves write-time pandas batches, this one lets the ENGINE sort /
range-partition with Catalyst so the layout job itself is a shuffle-free
projection plus Spark's own range exchange.

``zorder_layout_stats`` bins keys into fixed-width curve ranges
(``file_id = zkey >> shift`` — purely map-side, no global sort, the
static-binning variant; Spark's ``repartitionByRange(zkey)`` is the
balanced-file alternative when a sampled sort is acceptable) and reports
per-file locality: how many distinct cells and how tight a bbox each
file covers.  Everything is integer-exact — bit ops both engines share.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zorder_key", "zorder_layout_stats", "ZORDER_SQL",
    "with_hilbert_key", "hilbert_sql_ctes", "hilbert_layout_stats",
    "zonemap_prune_stats",
]

_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread(col: Column) -> Column:
    """Interleave-ready bit spread: abcd -> 0a0b0c0d (codegen twin of
    geo/cells.morton_cell's ``_part``; input must be in [0, 2^32))."""
    v = col.cast("long")
    for shift, mask in _MASKS:
        v = v.bitwiseOR(F.shiftleft(v, shift)).bitwiseAND(F.lit(mask))
    return v


def zorder_key(gx: Column, gy: Column) -> Column:
    """Morton key of non-negative grid coords (gx in even bits, gy in
    odd — same convention as geo/cells.morton_cell, so keys computed at
    ingest and by the engine agree bit-for-bit)."""
    return _spread(gx).bitwiseOR(F.shiftleft(_spread(gy), 1))


def _spread_sql(expr: str) -> str:
    v = f"CAST({expr} AS BIGINT)"
    for shift, mask in _MASKS:
        v = f"(({v} | ({v} << {shift})) & {mask})"
    return v


# SQL twin of zorder_key (DuckDB and Spark SQL share <<, &, | on BIGINT)
# — rendered from the same _MASKS table so the two cannot drift.  NOTE
# the naive textual expansion would nest the whole subtree once per
# stage; callers must bind {gx}/{gy} to simple column references.
ZORDER_SQL = "({sgx} | ({sgy} << 1))"


def zorder_sql(gx_expr: str, gy_expr: str) -> str:
    """Render the Morton-key SQL for two simple column references."""
    return ZORDER_SQL.format(sgx=_spread_sql(gx_expr), sgy=_spread_sql(gy_expr))


def zorder_layout_stats(
    rows: DataFrame,
    shift: int,
    gx_col: str = "gx",
    gy_col: str = "gy",
) -> DataFrame:
    """[file_id, n_rows, n_cells, gx_span, gy_span, zmin, zmax] — assign
    every row to the fixed-width curve range ``zkey >> shift`` and
    report per-file locality (distinct cells, bbox side lengths).

    The assignment is a map-side projection — no shuffle until the
    per-file aggregate, which is two-phase on the (bounded) file-id key.
    """
    z = zorder_key(F.col(gx_col), F.col(gy_col))
    keyed = rows.select(
        F.col(gx_col).alias("gx"), F.col(gy_col).alias("gy"), z.alias("zkey")
    )
    return (
        keyed.withColumn("file_id", F.shiftright(F.col("zkey"), shift))
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.count_distinct("gx", "gy").alias("n_cells"),
            (F.max("gx") - F.min("gx") + 1).alias("gx_span"),
            (F.max("gy") - F.min("gy") + 1).alias("gy_span"),
            F.min("zkey").alias("zmin"),
            F.max("zkey").alias("zmax"),
        )
    )


# ---------------------------------------------------------------------------
# Hilbert curve — the locality-tighter sibling of the Morton key
# ---------------------------------------------------------------------------
#
# Morton order has worst-case locality breaks at power-of-two seams (the
# curve jumps a quadrant); the Hilbert curve never jumps, so curve-range
# files cover tighter bboxes — Iceberg 1.4+ OPTIMIZE supports exactly
# this swap.  The classic per-bit rotate/reflect walk (Wikipedia's
# xy2d) is a FIXED ``order``-round integer state machine.  The engine
# side runs it as a VECTORIZED Arrow kernel (geo/cells.hilbert_xy2d —
# the morton_cell NumPy-twin pattern): a chained-column codegen version
# was measured 40x slower because Catalyst's CollapseProject merges the
# per-round projections into ONE exponentially-expanded expression tree
# (each round's x/y reference the previous round's twice — 2^order
# blowup; BENCH note).  The DuckDB oracle keeps the chained-CTE form
# (hilbert_sql_ctes), which materializes per level and stays linear.
# All integer ops — exact everywhere.  Inputs must lie in [0, 2^order).


def with_hilbert_key(
    df: DataFrame,
    gx_col: str = "gx",
    gy_col: str = "gy",
    out: str = "hkey",
    order: int = 7,
) -> DataFrame:
    """Append ``out`` = Hilbert index of (gx, gy) — one Arrow batch
    kernel per partition, all other columns pass through untouched."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    from ..geo.cells import hilbert_xy2d

    # fresh StructType — StructType.add would MUTATE the DataFrame's
    # cached schema and desync it from the JVM plan
    schema = StructType(list(df.schema.fields) + [StructField(out, LongType())])

    def kernel(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out] = hilbert_xy2d(
                order,
                pdf[gx_col].to_numpy(np.int64),
                pdf[gy_col].to_numpy(np.int64),
            )
            yield pdf

    return df.mapInPandas(kernel, schema=schema)


def hilbert_sql_ctes(
    base_cte: str, order: int = 7, carry: tuple[str, ...] = ()
) -> str:
    """Chained-CTE SQL twin of ``with_hilbert_key`` (same state
    machine, same round constants): ``base_cte`` must expose (gx, gy)
    plus any ``carry`` passthrough columns; the last CTE ``h{order}``
    exposes (carry..., gx, gy, hd) with hd = the Hilbert index of the
    ORIGINAL coords."""
    cols = "".join(f"{c}, " for c in carry)
    lines = [
        f"h0 AS (SELECT {cols}gx, gy, gx AS hx, gy AS hy, "
        f"CAST(0 AS BIGINT) AS hd FROM {base_cte})"
    ]
    for i in range(order):
        s = 1 << (order - 1 - i)
        rx = f"(CASE WHEN (hx & {s}) <> 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) <> 0 THEN 1 ELSE 0 END)"
        q = (
            f"CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
            f"WHEN {rx} = 0 THEN 1 WHEN {ry} = 0 THEN 3 ELSE 2 END"
        )
        new_x = (
            f"CASE WHEN {ry} = 1 THEN hx "
            f"WHEN {rx} = 1 THEN {s - 1} - hy ELSE hy END"
        )
        new_y = (
            f"CASE WHEN {ry} = 1 THEN hy "
            f"WHEN {rx} = 1 THEN {s - 1} - hx ELSE hx END"
        )
        lines.append(
            f"h{i + 1} AS (SELECT {cols}gx, gy, {new_x} AS hx, {new_y} AS hy, "
            f"hd + {s * s} * ({q}) AS hd FROM h{i})"
        )
    return ",\n".join(lines)


def hilbert_layout_stats(
    rows: DataFrame,
    shift: int,
    gx_col: str = "gx",
    gy_col: str = "gy",
    order: int = 7,
) -> DataFrame:
    """[file_id, n_rows, n_cells, gx_span, gy_span, hmin, hmax] — the
    Hilbert twin of ``zorder_layout_stats`` (same static curve-range
    binning, same per-file locality report)."""
    keyed = with_hilbert_key(
        rows.select(F.col(gx_col).alias("gx"), F.col(gy_col).alias("gy")),
        order=order,
    )
    return (
        keyed.withColumn("file_id", F.shiftright(F.col("hkey"), shift))
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.count_distinct("gx", "gy").alias("n_cells"),
            (F.max("gx") - F.min("gx") + 1).alias("gx_span"),
            (F.max("gy") - F.min("gy") + 1).alias("gy_span"),
            F.min("hkey").alias("hmin"),
            F.max("hkey").alias("hmax"),
        )
    )


# ---------------------------------------------------------------------------
# geohash: the base32 rendering of the SAME Morton key space
# ---------------------------------------------------------------------------

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_quantize(lon: Column, lat: Column, precision: int = 7):
    """(lon_q, lat_q) integer cells for a ``precision``-char geohash.
    Standard geohash bit budget: ⌈5p/2⌉ lon bits, ⌊5p/2⌋ lat bits; the
    quantizer floor((v − min)/range · 2^bits) is ONE shared FP chain
    (division before multiply) mirrored by :func:`geohash_sql`."""
    lon_bits = (5 * precision + 1) // 2
    lat_bits = (5 * precision) // 2
    lon_q = F.floor((lon + 180.0) / 360.0 * float(1 << lon_bits)).cast("long")
    lat_q = F.floor((lat + 90.0) / 180.0 * float(1 << lat_bits)).cast("long")
    return lon_q, lat_q


def geohash_from_key(key: Column, precision: int = 7) -> Column:
    """Base32 geohash string from the interleaved key (lon in even LSB
    positions, lat in odd — exactly :func:`zorder_key`(lon_q, lat_q):
    geohash IS a Morton code read 5 bits at a time).  ``key`` must be a
    materialized column reference, not a deep expression — the 5-bit
    chunks reference it ``precision`` times."""
    chars = [
        F.substring(
            F.lit(GEOHASH_ALPHABET),
            (F.shiftrightunsigned(key, 5 * (precision - 1 - i))
             .bitwiseAND(F.lit(31)) + 1).cast("int"),
            1,
        )
        for i in range(precision)
    ]
    return F.concat(*chars)


def geohash_key_sql(lon_expr: str, lat_expr: str, precision: int = 7) -> str:
    """DuckDB twin of quantize + interleave: the geohash integer key.
    ``lon_expr``/``lat_expr`` must be simple column references (the
    spread expansion repeats them textually)."""
    lon_bits = (5 * precision + 1) // 2
    lat_bits = (5 * precision) // 2
    lon_q = (f"CAST(floor((({lon_expr}) + 180.0) / 360.0 * "
             f"{float(1 << lon_bits)!r}) AS BIGINT)")
    lat_q = (f"CAST(floor((({lat_expr}) + 90.0) / 180.0 * "
             f"{float(1 << lat_bits)!r}) AS BIGINT)")
    return zorder_sql(lon_q, lat_q)


def geohash_chars_sql(key_ref: str, precision: int = 7) -> str:
    """Base32 rendering given a SIMPLE reference to the key column
    (bind the key in a prior CTE — the chunks reference it
    ``precision`` times)."""
    return "(" + " || ".join(
        f"substr('{GEOHASH_ALPHABET}', "
        f"CAST((({key_ref} >> {5 * (precision - 1 - i)}) & 31) + 1 "
        f"AS INTEGER), 1)"
        for i in range(precision)
    ) + ")"


def zonemap_prune_stats(
    rows: DataFrame,
    bbox: tuple[int, int, int, int],
    shift: int = 6,
    rows_per_file: int = 64,
    id_col: str = "doc_id",
    gx_col: str = "gx",
    gy_col: str = "gy",
) -> DataFrame:
    """[layout, n_files, n_touched, rows_scanned, rows_matched,
    read_amplification] — file-skipping (zone-map) effectiveness of a
    cell-range query under two write layouts: ``arrival`` (file =
    insertion order, id // rows_per_file — the default un-clustered
    ingest) vs ``zorder`` (file = Morton-curve range, zkey >> shift —
    OPTIMIZE ZORDER).  Per file the min/max of gx and gy stand in for
    parquet column statistics; a file is touched iff its bbox overlaps
    the query range — exactly the pruning decision a lakehouse scan
    makes before opening a file.  ``read_amplification`` =
    rows_scanned / rows_matched quantifies what clustering buys: on an
    arrival layout every file overlaps a geographically-uniform query
    range, on a curve layout only O(perimeter) files do.

    All counts are exact int64 (touch is an integer interval test);
    the amplification divides two exact int64s once (NULL when the
    query matches nothing).  Shape: one map-side projection per
    layout + a two-phase per-file aggregate + a 1-row rollup — the
    file table is bounded by the file count, never the corpus.
    """
    qx0, qx1, qy0, qy1 = bbox
    gx, gy = F.col(gx_col), F.col(gy_col)
    matched = (
        (gx >= qx0) & (gx <= qx1) & (gy >= qy0) & (gy <= qy1)
    ).cast("long")
    keyed = rows.select(
        F.col(id_col).alias("_id"),
        gx.alias("gx"), gy.alias("gy"), matched.alias("m"),
        zorder_key(gx, gy).alias("zkey"),
    )

    def per_layout(file_id: Column, name: str) -> DataFrame:
        files = (
            keyed.withColumn("file_id", file_id)
            .groupBy("file_id")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("m").alias("n_match"),
                F.min("gx").alias("x0"), F.max("gx").alias("x1"),
                F.min("gy").alias("y0"), F.max("gy").alias("y1"),
            )
            .withColumn(
                "touched",
                (
                    (F.col("x0") <= qx1) & (F.col("x1") >= qx0)
                    & (F.col("y0") <= qy1) & (F.col("y1") >= qy0)
                ).cast("long"),
            )
        )
        return files.agg(
            F.lit(name).alias("layout"),
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("touched").cast("long").alias("n_touched"),
            F.sum(F.col("touched") * F.col("n_rows"))
            .cast("long")
            .alias("rows_scanned"),
            F.sum("n_match").cast("long").alias("rows_matched"),
        )

    arrival = per_layout(
        F.expr(f"CAST(_id DIV {rows_per_file} AS BIGINT)"), "arrival"
    )
    zord = per_layout(F.shiftright(F.col("zkey"), shift), "zorder")
    out = arrival.unionByName(zord)
    return out.select(
        "layout", "n_files", "n_touched", "rows_scanned", "rows_matched",
        F.when(
            F.col("rows_matched") > 0,
            F.col("rows_scanned").cast("double")
            / F.col("rows_matched").cast("double"),
        ).alias("read_amplification"),
    )
