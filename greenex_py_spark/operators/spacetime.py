"""Space-time interaction statistics (Knox test).

The engine has pure-space statistics (Moran/Geary/Ripley over the cell
grid) and pure-time operators (sessionization, event windows); the
classic SPACE-TIME question — "do events that happen close together in
space also happen close together in time?" (disease-cluster /
burst-detection shape, Knox 1964) — needs both at once:

    X    = # unordered event pairs with  d <= delta  AND  |dt| <= tau
    E[X] = Ns * Nt / Np      (independence expectation)
    Np   = n(n-1)/2,  Ns = space-close pairs,  Nt = time-close pairs

``knox_statistic`` computes all four counts EXACTLY (integers), so the
only FP step is the final ratio X/E — one multiply/divide chain +
round-6, engine-portable.

Scale shape — never all-pairs:
- time-close pairs come from a TIME-BUCKET equi-join (bucket width =
  tau; a qualifying pair is at most one bucket apart, so each event
  joins buckets b and b+1 only) — O(n * rate * tau), the 1-D twin of
  the spatial cell join;
- space-close pairs never touch the event table: events are located at
  their entity's (user's) coordinates, so Ns aggregates per-entity
  event counts n_u against the ENTITY-pair distance table (entities
  are dimension-sized; for point-located events the spatial cell join
  takes over) — Ns = sum n_u*n_v over close entity pairs
  + sum C(n_u, 2) within-entity (d = 0);
- X reuses the time-bucket pair stream with the entity-distance test
  applied via two broadcast joins of the (entity, x, y) dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["knox_statistic", "od_flows", "staypoints", "radius_of_gyration"]


def knox_statistic(
    events: DataFrame,
    entities: DataFrame,
    delta: float,
    tau_us: int,
    id_col: str = "event_id",
    entity_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """One row: [n_events, np_pairs, ns_pairs, nt_pairs, x_pairs,
    knox_ratio] over events located at their entity's coordinates.

    ``events``: [id, entity, ts]; ``entities``: [entity, x, y]
    (broadcast dim).  ``tau_us`` in microseconds of the raw timestamp;
    closeness is ``<= delta`` / ``<= tau_us`` inclusive; pairs are
    unordered and distinct by (id_a < id_b).
    """
    # unix_micros is an exact integer (a double round-trip through
    # seconds would be off-by-one-microsecond at the band edge).  The
    # NTZ→TZ cast may shift by the session timezone, but the statistic
    # only ever uses DIFFERENCES of t, which any constant shift cancels
    # (bucket boundaries move, yet a |dt|<=tau pair is at most one
    # bucket apart under any offset, and pairs dedup by id).
    ev = events.select(
        F.col(id_col).alias("eid"),
        F.col(entity_col).alias("ent"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
    )

    # ---- per-entity event counts (the only corpus-wide aggregate) ----
    # localCheckpoint materializes the two entity-sized dims so their
    # many consumers below re-read ~1e3 rows instead of re-scanning the
    # event table per reference (the no-CSE rule; without this the plan
    # carries 24 parquet scans)
    per = ev.groupBy("ent").agg(F.count(F.lit(1)).alias("n_ev")).localCheckpoint()
    ents = entities.localCheckpoint()

    # ---- entity-pair distance dim (entities << events) ----
    a = ents.select(
        F.col(entity_col).alias("ent_a"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = ents.select(
        F.col(entity_col).alias("ent_b"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    close = (dx * dx + dy * dy) <= F.lit(float(delta) ** 2)
    epairs = (
        a.join(F.broadcast(b), F.col("ent_a") < F.col("ent_b"))
        .filter(close)
        .select("ent_a", "ent_b")
    )

    # Ns: cross-entity close pairs weighted by event-count products,
    # plus within-entity pairs (distance 0 <= delta always)
    na = per.select(F.col("ent").alias("ent_a"), F.col("n_ev").alias("n_a"))
    nb = per.select(F.col("ent").alias("ent_b"), F.col("n_ev").alias("n_b"))
    ns_cross = (
        epairs.join(F.broadcast(na), "ent_a")
        .join(F.broadcast(nb), "ent_b")
        .agg(F.coalesce(F.sum(F.col("n_a") * F.col("n_b")), F.lit(0)).alias("v"))
    )
    ns_within = per.agg(
        F.coalesce(
            F.sum(F.col("n_ev") * (F.col("n_ev") - 1)), F.lit(0)
        ).alias("v2")
    )

    # ---- time-bucket pair stream: |dt| <= tau pairs, each exactly once
    # (no-CSE rule: the banded join is evaluated ONCE — the space flag
    # rides along as a column and nt/x come from a single aggregate)
    tau = int(tau_us)
    eb = ev.withColumn("bkt", F.floor(F.col("t") / F.lit(tau)).cast("long"))
    left = eb.select(
        F.col("eid").alias("eid_a"), F.col("ent").alias("ent_a"),
        F.col("t").alias("ta"), F.col("bkt"),
    )
    # the right side fans out to its own bucket and both neighbours via
    # ONE explode (id order is independent of time order, so a
    # qualifying pair can sit one bucket apart in either direction);
    # a pair matching through two copies collapses in the dedup.
    right = eb.select(
        F.col("eid").alias("eid_b"), F.col("ent").alias("ent_b"),
        F.col("t").alias("tb"),
        F.explode(
            F.array(F.col("bkt") - 1, F.col("bkt"), F.col("bkt") + 1)
        ).alias("bkt"),
    )
    tp = (
        left.join(right, "bkt")
        .filter(
            (F.col("eid_a") < F.col("eid_b"))
            & (F.abs(F.col("ta") - F.col("tb")) <= F.lit(tau))
        )
    )
    tpairs = tp.select("eid_a", "eid_b", "ent_a", "ent_b").dropDuplicates(
        ["eid_a", "eid_b"]
    )

    # space flag: same entity, or a close entity pair in either
    # orientation (epairs is distinct, so the left join has multiplicity 1)
    ek = epairs.select(
        F.concat_ws("|", "ent_a", "ent_b").alias("ck")
    ).unionByName(
        epairs.select(F.concat_ws("|", "ent_b", "ent_a").alias("ck"))
    ).withColumn("sp", F.lit(1))
    counts = (
        tpairs.withColumn("ck", F.concat_ws("|", "ent_a", "ent_b"))
        .join(F.broadcast(ek), "ck", "left")
        .agg(
            F.count(F.lit(1)).alias("nt"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("ent_a") == F.col("ent_b")) | (F.col("sp") == 1),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("xx"),
        )
    )

    n_tot = per.agg(F.sum("n_ev").alias("n"))

    row = n_tot.crossJoin(ns_cross).crossJoin(ns_within).crossJoin(counts)
    n = F.col("n").cast("long")
    np_pairs = (n * (n - 1) / F.lit(2)).cast("long")
    ns = (F.col("v") + (F.col("v2") / F.lit(2)).cast("long")).cast("long")
    ratio = F.round(
        F.col("x_pairs").cast("double")
        * F.col("np_pairs").cast("double")
        / F.col("ns_pairs").cast("double")
        / F.col("nt_pairs").cast("double"),
        6,
    )
    return (
        row.select(
            n.alias("n_events"),
            np_pairs.alias("np_pairs"),
            ns.alias("ns_pairs"),
            F.col("nt").cast("long").alias("nt_pairs"),
            F.col("xx").cast("long").alias("x_pairs"),
        )
        .select(
            "n_events", "np_pairs", "ns_pairs", "nt_pairs", "x_pairs",
            ratio.alias("knox_ratio"),
        )
    )


def od_flows(
    df,
    entity_col: str = "user_id",
    cell_col: str = "cell",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
):
    """[o_cell, d_cell, n_moves] — origin→destination flow matrix over
    per-entity trajectories: consecutive positions under the TOTAL
    order ``order_cols`` (include a unique id after the timestamp —
    equal-ts ties must break identically everywhere) become one move,
    counted per directed cell pair.  Stationary moves (o == d) are
    kept; flow-mapping consumers decide their own diagonal policy.

    Shape: one shuffle partitions trajectories by entity for the lag
    window (per-task state = one entity's trajectory — bounded by
    session length, not corpus size), one two-phase aggregate on the
    (o, d) pair.  Hot pairs (commuter corridors) are absorbed by
    map-side combine.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(entity_col).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    return (
        df.select(entity_col, cell_col, *order_cols)
        .withColumn("_o", F.lag(F.col(cell_col)).over(w))
        .filter(F.col("_o").isNotNull())
        .groupBy(
            F.col("_o").alias("o_cell"), F.col(cell_col).alias("d_cell")
        )
        .agg(F.count(F.lit(1)).alias("n_moves"))
    )


def staypoints(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    x_col: str = "qx",
    y_col: str = "qy",
    id_col: str = "event_id",
    dist_q: int = 60,
    max_gap_us: int = 48 * 3600 * 1_000_000,
    min_pts: int = 2,
) -> DataFrame:
    """[entity, stay_start, stay_end, n_events, sum_qx, sum_qy] —
    stay-point (dwell) segmentation of per-entity trajectories: a stay
    is a maximal run of consecutive fixes (under the (ts, id) total
    order) in which each step moves at most ``dist_q`` integer units
    AND arrives within ``max_gap_us`` of the previous fix; runs shorter
    than ``min_pts`` are discarded.  The consecutive-step criterion is
    the streaming-friendly variant of Li et al. 2008's anchor scan
    (which needs an O(window²) lookahead); both segment dense GPS
    tracks identically when the sampling interval is below the gap.

    Exactness: coordinates must be integers (quantize upstream), so the
    step test is an int64 squared-distance compare and the centroid
    numerators (sum_qx / sum_qy) are exact — consumers divide by
    n_events at display time.  Timestamps pass through untouched.

    Shape: one shuffle partitions fixes by entity for the lag window
    (per-task state = one entity's trajectory), then the island
    aggregation reuses the SAME partitioning — Catalyst collapses both
    windows and the groupBy into a single exchange.  Gaps-and-islands:
    ``island = running sum of break flags``, the standard
    no-self-join segmentation.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(entity_col).orderBy(ts_col, id_col)
    dx = F.col(x_col) - F.lag(x_col).over(w)
    dy = F.col(y_col) - F.lag(y_col).over(w)
    ust = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = ust - F.unix_micros(F.lag(ts_col).over(w).cast("timestamp"))
    brk = F.when(
        F.lag(ts_col).over(w).isNull()
        | (dx * dx + dy * dy > dist_q * dist_q)
        | (gap > max_gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    wcum = (
        Window.partitionBy(entity_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = df.withColumn("_brk", brk).withColumn(
        "_island", F.sum("_brk").over(wcum)
    )
    return (
        seg.groupBy(entity_col, "_island")
        .agg(
            F.min(ts_col).alias("stay_start"),
            F.max(ts_col).alias("stay_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(x_col).alias("sum_qx"),
            F.sum(y_col).alias("sum_qy"),
        )
        .filter(F.col("n_events") >= min_pts)
        .drop("_island")
    )


def radius_of_gyration(
    df: DataFrame,
    entity_col: str = "user_id",
    x_col: str = "qx",
    y_col: str = "qy",
    site_q: int = 100,
) -> DataFrame:
    """[entity, n_fixes, rg2_num, rg_m, n_sites, top_share] — the two
    canonical human-mobility summaries (González et al. 2008) per
    entity:

    - radius of gyration  rg = sqrt(Σ‖p_i − p̄‖² / n), shipped as the
      EXACT integer numerator  rg2_num = n·Σ(x²+y²) − (Σx)² − (Σy)²
      (so rg = sqrt(rg2_num)/n — the only FP is one correctly-rounded
      sqrt + one division, engine-portable at round-3);
    - location predictability: fixes are snapped to ``site_q``-unit
      sites; n_sites = distinct sites visited, top_share = share of
      fixes at the modal site (one division, round-6).

    Coordinates must be integers (quantize upstream, the staypoints
    contract).  Shape: one partial aggregate on (entity, site) — map-
    side combinable, so the shuffle carries site-level rows, not fixes
    — then a second aggregate on entity alone; both exchanges hash the
    same leading key.  No windows, no join-backs, per-task state O(1):
    the 100 TB plan is the same two-phase combine."""
    sx = F.col(x_col).cast("long")
    sy = F.col(y_col).cast("long")
    per_site = df.groupBy(
        F.col(entity_col).alias("entity"),
        F.floor(sx / site_q).alias("_gx"),
        F.floor(sy / site_q).alias("_gy"),
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(sx).alias("_sx"),
        F.sum(sy).alias("_sy"),
        F.sum(sx * sx + sy * sy).alias("_sq"),
    )
    agg = per_site.groupBy("entity").agg(
        F.sum("_n").cast("long").alias("n_fixes"),
        F.sum("_sx").alias("_tsx"),
        F.sum("_sy").alias("_tsy"),
        F.sum("_sq").alias("_tsq"),
        F.count(F.lit(1)).cast("long").alias("n_sites"),
        F.max("_n").cast("long").alias("_top"),
    )
    num = (
        F.col("n_fixes") * F.col("_tsq")
        - F.col("_tsx") * F.col("_tsx")
        - F.col("_tsy") * F.col("_tsy")
    )
    return agg.select(
        "entity",
        "n_fixes",
        num.cast("long").alias("rg2_num"),
        F.round(
            F.sqrt(num.cast("double")) / F.col("n_fixes").cast("double"), 3
        ).alias("rg_m"),
        "n_sites",
        F.round(
            F.col("_top").cast("double") / F.col("n_fixes").cast("double"), 6
        ).alias("top_share"),
    )
