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


# Count-Min sketch: depth × width counter matrix over a portable
# md5-derived row hash; point estimate = min over rows (Cormode &
# Muthukrishnan 2005).  Deterministic hashing makes the OVERestimate
# itself exactly reproducible, so the sketch — not just the exact
# counts — has a DuckDB oracle.
CMS_DEPTH = 3
CMS_WIDTH = 256


def _cms_bucket(value_col, r: int, width: int):
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(str(r)), F.col(value_col))), 1, 8),
            16, 10,
        ).cast("long"),
        F.lit(width),
    )


def count_min_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """[r, b, c] — the CMS counter matrix (depth·width rows, total).

    Scale shape: each value row map-side explodes to ``depth`` (row,
    bucket) pairs and the groupBy's partial aggregation collapses them
    to ≤ depth·width partials per task before the shuffle — the sketch
    build never carries vocabulary-sized state (the whole point vs an
    exact count at 100 TB: no per-token shuffle, a 768-row result)."""
    arr = F.array(*[
        F.struct(F.lit(r).cast("int").alias("r"),
                 _cms_bucket(value_col, r, width).alias("b"))
        for r in range(depth)
    ])
    rb = df.select(F.explode(arr).alias("e")).select("e.r", "e.b")
    return rb.groupBy("r", "b").agg(F.count("*").alias("c"))


def count_min_estimate(
    df: DataFrame,
    probes: DataFrame,
    value_col: str = "value",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """[value, est] — CMS point estimates for each probe value.

    ``est = min over rows r of sketch[r][h_r(value)]`` — an upper bound
    on the true count, exact when no collision hits all rows.  The
    sketch (depth·width rows) is broadcast; probes stay distributed."""
    sketch = count_min_sketch(df, value_col, depth, width)
    parr = F.array(*[
        F.struct(F.lit(r).cast("int").alias("r"),
                 _cms_bucket(value_col, r, width).alias("b"))
        for r in range(depth)
    ])
    prb = probes.select(F.col(value_col).alias("value"),
                        F.explode(parr).alias("e")).select("value", "e.r", "e.b")
    return (
        prb.join(F.broadcast(sketch), ["r", "b"])
        .groupBy("value")
        .agg(F.min("c").alias("est"))
    )


def count_min_sql(
    toks_sql: str,
    value_expr: str = "value",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    top_k: int = 20,
) -> str:
    """DuckDB twin: same md5 row-hash, same min-over-rows estimate, with
    the probe set = exact global top-``top_k`` tokens."""
    bucket = (
        f"CAST(CAST(('0x' || substr(md5(CAST(cr.range AS VARCHAR) || ':' || {value_expr}),"
        f" 1, 8)) AS UBIGINT) % {width} AS BIGINT)"
    )
    return f"""
WITH toks AS ({toks_sql}),
rb AS (
  SELECT CAST(cr.range AS INT) AS r, {bucket} AS b
  FROM toks, range({depth}) cr
),
sketch AS (SELECT r, b, CAST(count(*) AS BIGINT) AS c FROM rb GROUP BY r, b),
cnt AS (SELECT {value_expr} AS value, CAST(count(*) AS BIGINT) AS n
        FROM toks GROUP BY {value_expr}),
top AS (
  SELECT value, n, row_number() OVER (ORDER BY n DESC, value ASC) AS rnk
  FROM cnt QUALIFY rnk <= {top_k}
),
pe AS (
  SELECT t.value, t.n, CAST(cr.range AS INT) AS r,
         CAST(CAST(('0x' || substr(md5(CAST(cr.range AS VARCHAR) || ':' || t.value),
              1, 8)) AS UBIGINT) % {width} AS BIGINT) AS b
  FROM top t, range({depth}) cr
)
SELECT pe.value, CAST(max(pe.n) AS BIGINT) AS exact_n,
       CAST(min(s.c) AS BIGINT) AS est,
       CAST(min(s.c) - max(pe.n) AS BIGINT) AS overcount
FROM pe JOIN sketch s ON s.r = pe.r AND s.b = pe.b
GROUP BY pe.value
"""


# HLL: m = 2^8 buckets from the first 2 md5 hex chars; rho from the next
# 13 hex chars (52 bits).  All arithmetic below is integer-exact until
# ONE final double division/log, so the estimator itself (not just its
# inputs) is engine-portable.
HLL_M = 256
_HLL_SCALE = 1 << 53  # per-bucket term 2^(53 - rho); sum <= 2^61, int64-safe
# alpha_m * m^2 * 2^53, precomputed as one double literal so both engines
# perform exactly one multiplication-free division by the exact int sum
_HLL_C = 4.2399330249068963e+20
# leading zero bits of the first NONZERO hex digit
_HLL_LZ4 = {"1": 3, "2": 2, "3": 2, "4": 1, "5": 1, "6": 1, "7": 1}


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """[*group_cols, est_distinct] — deterministic HyperLogLog distinct
    count (Flajolet et al. 2007, with the standard linear-counting
    small-range correction).  Unlike `approx_count_distinct` (whose HLL++
    is JVM-internal and engine-specific), every step here is portable:
    bucket = first 2 md5 hex chars, rho = leading-zero count of the next
    52 bits extracted by HEX-STRING arithmetic (run of '0 'chars x 4 +
    a 7-way CASE on the first nonzero digit — no log2, no bit_length
    dialect), and the register sum is SUM(2^(53-rho)) in exact int64,
    so the one final division is bit-identical on any IEEE engine.

    Scale shape vs `kmv_distinct`: NO distinct shuffle and NO window —
    the sketch is a partial-aggregable max per (group, bucket), so the
    shuffle carries at most m=256 rows per group regardless of group
    cardinality; merging sketches = max of maxes (the property that
    makes HLL the 100 TB unique-URL/vocabulary counter).
    """
    gcols = group_cols or []
    h = F.md5(F.col(value_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("long")
    hex13 = F.substring(h, 3, 13)
    z = F.length(F.regexp_extract(hex13, "^0*", 0))
    d = F.substring(hex13, (z + 1).cast("int"), 1)
    lz4 = F.lit(0)
    for dig, n in _HLL_LZ4.items():
        lz4 = F.when(d == dig, n).otherwise(lz4)
    rho = F.when(z == 13, F.lit(53)).otherwise(z * 4 + lz4 + 1)
    regs = (
        df.select(*gcols, bucket.alias("_b"), rho.alias("_rho"))
        .groupBy(*gcols, "_b")
        .agg(F.max("_rho").alias("_mr"))
    )
    sk = regs.groupBy(*gcols).agg(
        F.count("*").alias("_nz"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), 53 - _mr)")).alias("_snz"),
    )
    sum_z = (F.lit(HLL_M) - F.col("_nz")) * F.lit(_HLL_SCALE) + F.col("_snz")
    v_empty = F.lit(HLL_M) - F.col("_nz")
    raw = F.lit(_HLL_C) / sum_z
    est = F.when(
        (raw <= 2.5 * HLL_M) & (v_empty > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v_empty),
    ).otherwise(raw)
    return sk.select(*gcols, F.round(est, 3).alias("est_distinct"))


def hll_distinct_sql(
    table_sql: str, value_expr: str, group_cols: list[str]
) -> str:
    """The identical estimator as DuckDB SQL (generated from the same
    constants — same bucket, same hex-run rho, same exact int sum)."""
    g = ", ".join(group_cols)
    case = " ".join(f"WHEN '{dig}' THEN {n}" for dig, n in _HLL_LZ4.items())
    return f"""
WITH h AS (
  SELECT {g},
         CAST(CAST('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 2)
              AS UBIGINT) AS BIGINT) AS b,
         substr(md5(CAST({value_expr} AS VARCHAR)), 3, 13) AS hex13
  FROM {table_sql}
), r AS (
  SELECT {g}, b,
         CASE WHEN length(regexp_extract(hex13, '^0*', 0)) = 13 THEN 53
              ELSE length(regexp_extract(hex13, '^0*', 0)) * 4
                   + CASE substr(hex13, length(regexp_extract(hex13, '^0*', 0)) + 1, 1)
                     {case} ELSE 0 END + 1
         END AS rho
  FROM h
), regs AS (
  SELECT {g}, b, max(rho) AS mr FROM r GROUP BY {g}, b
), sk AS (
  SELECT {g}, count(*) AS nz,
         sum(CAST(1 AS BIGINT) << (53 - mr)) AS snz
  FROM regs GROUP BY {g}
)
SELECT {g},
       round(CASE WHEN {_HLL_C!r} / (({HLL_M} - nz) * {_HLL_SCALE} + snz)
                       <= {2.5 * HLL_M}
                  AND {HLL_M} - nz > 0
             THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / ({HLL_M} - nz))
             ELSE {_HLL_C!r} / (({HLL_M} - nz) * {_HLL_SCALE} + snz)
             END, 3) AS est_distinct
FROM sk
"""


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    seq_col: str,
    n_buckets: int = 8,
) -> DataFrame:
    """[bucket, n, lo, hi] — exact equi-depth histogram of an integer
    column: the optimizer-statistics shape (ANALYZE TABLE bucket
    boundaries) built on the two-phase global rank (engine/rank.py — no
    single-task global sort anywhere).

    Bucket assignment is pure int64 arithmetic,
    ``(rank−1)·B div N``, so no FP boundary exists; ``seq_col`` breaks
    value ties into a total order, making the histogram deterministic
    even on heavily duplicated columns (a tied value may legitimately
    straddle two buckets — equi-DEPTH, not equi-width).
    """
    from ..engine.rank import global_rank

    r = global_rank(
        df.select(F.col(value_col).alias("_v"), F.col(seq_col).alias("_s")),
        ["_v", "_s"],
        out_col="_rk",
    )
    n = r.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    b = r.crossJoin(F.broadcast(n)).withColumn(
        "bucket", F.expr(f"(( _rk - 1) * {n_buckets}) div _n").cast("long")
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("_v").cast("long").alias("lo"),
        F.max("_v").cast("long").alias("hi"),
    )


def hll_rolling_distinct(
    df: DataFrame,
    value_col: str,
    date_col: str,
    window_days: int = 7,
) -> DataFrame:
    """[day, est_1d, est_win] — per-day distinct AND trailing
    ``window_days``-day distinct of ``value_col``, both from ONE pass of
    daily HLL registers: the window estimate never touches the raw
    values again, it max-merges the daily register tables (each daily
    register row replicates to the ≤ window_days days it serves, then
    groupBy(day, bucket).max — registers in, registers out).  This is
    the MERGEABILITY property that makes sketches the lakehouse answer
    to "rolling 7-day unique users over 100 TB of events": daily
    sketches are tiny (≤ m=256 rows), persistable, and any window /
    backfill / partition union is a max-merge — no re-scan of history,
    no exact-distinct shuffle, no window over raw data.  Same
    deterministic portable estimator as :func:`hll_distinct` (md5
    buckets, hex-run rho, exact int64 register sums).  Days appear in
    the output iff they have events; a window covers whatever subset of
    its trailing days exists (ragged starts included — day 1's "window"
    is just day 1)."""
    day = F.date_trunc("day", F.col(date_col)).cast("date")
    h = F.md5(F.col(value_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("long")
    hex13 = F.substring(h, 3, 13)
    z = F.length(F.regexp_extract(hex13, "^0*", 0))
    d = F.substring(hex13, (z + 1).cast("int"), 1)
    lz4 = F.lit(0)
    for dig, n in _HLL_LZ4.items():
        lz4 = F.when(d == dig, n).otherwise(lz4)
    rho = F.when(z == 13, F.lit(53)).otherwise(z * 4 + lz4 + 1)
    daily = (
        df.select(day.alias("day"), bucket.alias("_b"), rho.alias("_rho"))
        .groupBy("day", "_b")
        .agg(F.max("_rho").alias("_mr"))
        # daily sketch table: consumed by the 1-day estimate AND the
        # window replication — materialize once (the lineage rule)
        .localCheckpoint()
    )
    days = daily.select("day").distinct()
    served = (
        daily.withColumn(
            "_off", F.explode(F.sequence(F.lit(0), F.lit(window_days - 1)))
        )
        .withColumn("day", F.date_add(F.col("day"), F.col("_off")))
        .join(days, "day", "leftsemi")  # only days that actually exist
        .groupBy("day", "_b")
        .agg(F.max("_mr").alias("_mr"))
    )

    def estimate(regs: DataFrame, out: str) -> DataFrame:
        sk = regs.groupBy("day").agg(
            F.count("*").alias("_nz"),
            F.sum(F.expr("shiftleft(cast(1 as bigint), 53 - _mr)")).alias("_snz"),
        )
        sum_z = (F.lit(HLL_M) - F.col("_nz")) * F.lit(_HLL_SCALE) + F.col("_snz")
        v_empty = F.lit(HLL_M) - F.col("_nz")
        raw = F.lit(_HLL_C) / sum_z
        est = F.when(
            (raw <= 2.5 * HLL_M) & (v_empty > 0),
            F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v_empty),
        ).otherwise(raw)
        return sk.select("day", F.round(est, 3).alias(out))

    return (
        estimate(daily, "est_1d")
        .join(estimate(served, "est_win"), "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "est_1d", "est_win",
        )
    )


def hll_rolling_sql(
    table_sql: str, value_expr: str, date_expr: str, window_days: int = 7
) -> str:
    """DuckDB twin of :func:`hll_rolling_distinct` — same registers,
    same replication, same estimator."""
    case = " ".join(f"WHEN '{dig}' THEN {n}" for dig, n in _HLL_LZ4.items())
    def est(p: str) -> str:
        return (
            f"round(CASE WHEN {_HLL_C!r} / (({HLL_M} - {p}.nz) * {_HLL_SCALE} + {p}.snz)"
            f" <= {2.5 * HLL_M}"
            f" AND {HLL_M} - {p}.nz > 0"
            f" THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / ({HLL_M} - {p}.nz))"
            f" ELSE {_HLL_C!r} / (({HLL_M} - {p}.nz) * {_HLL_SCALE} + {p}.snz)"
            f" END, 3)"
        )
    return f"""
WITH src AS MATERIALIZED (
  SELECT CAST(date_trunc('day', {date_expr}) AS DATE) AS day,
         CAST(CAST('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 2)
              AS UBIGINT) AS BIGINT) AS b,
         substr(md5(CAST({value_expr} AS VARCHAR)), 3, 13) AS hex13
  FROM {table_sql}
), rh AS (
  SELECT day, b,
         CASE WHEN length(regexp_extract(hex13, '^0*', 0)) = 13 THEN 53
              ELSE length(regexp_extract(hex13, '^0*', 0)) * 4
                   + CASE substr(hex13, length(regexp_extract(hex13, '^0*', 0)) + 1, 1)
                     {case} ELSE 0 END + 1
         END AS rho
  FROM src
), daily AS MATERIALIZED (
  SELECT day, b, max(rho) AS mr FROM rh GROUP BY day, b
), days AS MATERIALIZED (SELECT DISTINCT day FROM daily),
served AS (
  SELECT d2.day, daily.b, max(daily.mr) AS mr
  FROM daily
  CROSS JOIN range({window_days}) t(off)
  JOIN days d2 ON d2.day = daily.day + CAST(t.off AS INTEGER) * INTERVAL 1 DAY
  GROUP BY d2.day, daily.b
), sk1 AS (
  SELECT day, count(*) AS nz,
         sum(CAST(1 AS BIGINT) << (53 - mr)) AS snz
  FROM daily GROUP BY day
), skw AS (
  SELECT day, count(*) AS nz,
         sum(CAST(1 AS BIGINT) << (53 - mr)) AS snz
  FROM served GROUP BY day
)
SELECT strftime(sk1.day, '%Y-%m-%d') AS day,
       {est("sk1")} AS est_1d,
       {est("skw")} AS est_win
FROM sk1 JOIN skw ON skw.day = sk1.day
"""


def kmv_intersection(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: int = 256,
) -> DataFrame:
    """[src_a, src_b, k_used, k_inter, est_union, est_inter, jaccard_q]
    — KMV set-operation estimates for every unordered pair of groups
    (Beyer et al. 2007): estimated distinct-value overlap and Jaccard
    between e.g. two crawl sources' vocabularies.  The set-operation
    companion to HLL's union-only merge — KMV sketches support
    INTERSECTION because membership of a union-sketch element in each
    side is decidable from the side sketches alone: the union's k-th
    smallest hash is ≤ either side's k-th smallest (the union has more
    elements), so every union-sketch element that belongs to side A
    provably sits inside A's own k-min sketch.  The pair stage
    therefore fans out only k-row sketches, never value sets:
    per-group sketches once (bounded window over distinct hashes, the
    kmv_distinct shape), then per pair rank the ≤2k union rows, keep k,
    flag membership with two sketch semi-joins,
    est_union = (k−1)/h_(k), ρ = k∩/k, est_inter = ρ·est_union —
    exact (not approximate) whenever |A∪B| < k, which the hand test
    pins.  All arithmetic is md5-derived doubles identical on both
    engines; estimates round 3 dp, ρ ships as an exact 1e-6 integer.
    """
    hashed = (
        df.select(
            F.col(group_col).alias("g"),
            _unit_hash(F.col(value_col).cast("string")).alias("_h"),
        )
        .dropDuplicates(["g", "_h"])
    )
    w = Window.partitionBy("g").orderBy(F.col("_h").asc())
    sk = (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("g", "_h")
        # per-group sketch table: ≤ k rows per group, consumed by the
        # pair fan-out AND both membership joins (the lineage rule)
        .localCheckpoint()
    )
    groups = sk.select("g").distinct()
    pairs = (
        groups.select(F.col("g").alias("src_a"))
        .join(groups.select(F.col("g").alias("src_b")))
        .filter(F.col("src_a") < F.col("src_b"))
    )
    u = (
        pairs.join(sk.withColumnRenamed("g", "src_a"), "src_a")
        .unionByName(pairs.join(sk.withColumnRenamed("g", "src_b"), "src_b"))
        .dropDuplicates(["src_a", "src_b", "_h"])
    )
    wu = Window.partitionBy("src_a", "src_b").orderBy(F.col("_h").asc())
    kept = u.withColumn("_rn", F.row_number().over(wu)).filter(F.col("_rn") <= k)
    ina = sk.select(F.col("g").alias("src_a"), "_h", F.lit(1).alias("_ia"))
    inb = sk.select(F.col("g").alias("src_b"), "_h", F.lit(1).alias("_ib"))
    flagged = (
        kept.join(ina, ["src_a", "_h"], "left")
        .join(inb, ["src_b", "_h"], "left")
    )
    agg = flagged.groupBy("src_a", "src_b").agg(
        F.count("*").cast("long").alias("k_used"),
        F.sum(
            F.when(F.col("_ia").isNotNull() & F.col("_ib").isNotNull(), 1).otherwise(0)
        ).cast("long").alias("k_inter"),
        F.max("_h").alias("_kth"),
    )
    est_union = F.when(
        F.col("k_used") < k, F.col("k_used").cast("double")
    ).otherwise((F.lit(k) - 1.0) / F.col("_kth"))
    rho = F.col("k_inter").cast("double") / F.col("k_used")
    return agg.select(
        "src_a", "src_b", "k_used", "k_inter",
        F.round(est_union, 3).alias("est_union"),
        F.round(rho * est_union, 3).alias("est_inter"),
        F.floor(rho * 1_000_000 + F.lit(0.5)).cast("long").alias("jaccard_q"),
    )


def kmv_intersection_sql(
    table_sql: str, value_expr: str, group_expr: str, k: int = 256
) -> str:
    """DuckDB twin of :func:`kmv_intersection` — same hash, sketches,
    pair fan-out and estimator.  ``value_expr`` is cast to VARCHAR
    before hashing to mirror the Spark side's ``cast("string")`` —
    without it a non-string expression would hit DuckDB md5's implicit
    cast, which need not match Spark's string rendering."""
    uh = (
        f"(CAST(CAST(('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, {_HEX_DIGITS})) AS UBIGINT) AS DOUBLE)"
        f" + 1.0) / {_DENOM!r}"
    )
    return f"""
WITH h AS (SELECT DISTINCT {group_expr} AS g, {uh} AS _h FROM {table_sql}),
r AS (SELECT g, _h, row_number() OVER (PARTITION BY g ORDER BY _h ASC) AS rn
      FROM h),
sk AS MATERIALIZED (SELECT g, _h FROM r WHERE rn <= {k}),
gs AS (SELECT DISTINCT g FROM sk),
pr AS (SELECT a.g AS src_a, b.g AS src_b FROM gs a, gs b WHERE a.g < b.g),
u AS (
  SELECT DISTINCT src_a, src_b, _h FROM (
    SELECT pr.src_a, pr.src_b, sk._h FROM pr JOIN sk ON sk.g = pr.src_a
    UNION ALL
    SELECT pr.src_a, pr.src_b, sk._h FROM pr JOIN sk ON sk.g = pr.src_b
  )
),
kept AS (
  SELECT * FROM (
    SELECT src_a, src_b, _h,
           row_number() OVER (PARTITION BY src_a, src_b ORDER BY _h ASC) AS rn
    FROM u
  ) WHERE rn <= {k}
),
fl AS (
  SELECT kept.src_a, kept.src_b, kept._h,
         CASE WHEN ia._h IS NOT NULL AND ib._h IS NOT NULL THEN 1 ELSE 0 END AS in_both
  FROM kept
  LEFT JOIN sk ia ON ia.g = kept.src_a AND ia._h = kept._h
  LEFT JOIN sk ib ON ib.g = kept.src_b AND ib._h = kept._h
),
ag AS (
  SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS k_used,
         CAST(sum(in_both) AS BIGINT) AS k_inter, max(_h) AS kth
  FROM fl GROUP BY src_a, src_b
)
SELECT src_a, src_b, k_used, k_inter,
       round(CASE WHEN k_used < {k} THEN CAST(k_used AS DOUBLE)
                  ELSE ({k} - 1.0) / kth END, 3) AS est_union,
       round(CAST(k_inter AS DOUBLE) / k_used
             * CASE WHEN k_used < {k} THEN CAST(k_used AS DOUBLE)
                    ELSE ({k} - 1.0) / kth END, 3) AS est_inter,
       CAST(floor(CAST(k_inter AS DOUBLE) / k_used * 1000000 + 0.5) AS BIGINT)
         AS jaccard_q
FROM ag
"""
