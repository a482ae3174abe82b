"""Classical statistical tests as exact relational plans.

Chi-square independence over two categorical columns: observed counts,
margin totals via unpartitioned window sums (one pass, no join-back —
the side-statistics convention from BENCH/SCALE_AUDIT.md), expected
counts, per-cell contributions, and the global statistic as an exact
integer sum of 1e-6-quantized terms (FP summation order can never move
the rounded total).  The contingency table is completed with zero-
observation cells (distinct-levels cross join) so expected mass is
conserved — a groupBy over observed pairs alone would drop them.

Scale: the only corpus-sized operation is the first groupBy; every
window then runs over the |levels_a| × |levels_b| grid (dim-sized).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# Poisson(1) inverse-CDF thresholds (cumulative P(X <= k)), k = 0..8;
# u above the last threshold maps to 9.  Driver-computed literals shared
# verbatim with the generated SQL so both engines draw identical counts.
POISSON1_CDF = (
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253, 0.9999988835468463,
)
_BOOT_HEX = 12
_BOOT_DENOM = float(16 ** _BOOT_HEX)


def poisson_bootstrap_mean(
    df: DataFrame,
    value_q_col: str,
    id_col: str,
    n_replicates: int = 32,
) -> DataFrame:
    """[b, n_eff, mean_v, ci_lo, ci_hi] — deterministic Poisson
    bootstrap of the mean of a pre-quantized integer value column: the
    standard resampling scheme at cluster scale (per-row independent
    Poisson(1) multiplicities ≈ multinomial resampling, so no global
    coordination — one map-side weight per (row, replicate), exact
    int64 Σw and Σw·v per replicate).  Randomness is an md5 unit hash
    of (replicate, id) pushed through driver-literal Poisson(1)
    thresholds, so both engines draw the identical resample.  ci_lo/hi
    are the nearest-rank 5th/95th percentile replicate means (ranked on
    the 6-dp-rounded mean with replicate tie-break)."""
    reps = df.sparkSession.range(n_replicates).select(
        F.col("id").alias("b")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("b").cast("string"),
                                  F.col(id_col).cast("string"))),
                1, _BOOT_HEX,
            ),
            16, 10,
        ).cast("double") + 1.0
    ) / _BOOT_DENOM
    w = F.lit(len(POISSON1_CDF))
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u <= POISSON1_CDF[k], k).otherwise(w)
    x = df.select(id_col, value_q_col).crossJoin(F.broadcast(reps))
    agg = (
        x.withColumn("_w", w.cast("long"))
        .groupBy("b")
        .agg(
            F.sum("_w").alias("n_eff"),
            F.sum(F.col("_w") * F.col(value_q_col)).alias("_sv"),
        )
        .select(
            "b", "n_eff",
            F.round(
                F.col("_sv").cast("double") / F.col("n_eff").cast("double"), 6
            ).alias("mean_v"),
        )
    )
    w_all = Window.partitionBy()
    rn = F.row_number().over(Window.orderBy(F.col("mean_v"), F.col("b")))
    k_lo = max(1, int(0.05 * n_replicates))
    k_hi = max(1, int(0.95 * n_replicates))
    ranked = agg.withColumn("_rn", rn)
    return ranked.select(
        "b", "n_eff", "mean_v",
        F.min(F.when(F.col("_rn") == k_lo, F.col("mean_v"))).over(w_all)
        .alias("ci_lo"),
        F.min(F.when(F.col("_rn") == k_hi, F.col("mean_v"))).over(w_all)
        .alias("ci_hi"),
    )


def poisson_bootstrap_sql(
    table_sql: str,
    value_q_expr: str,
    id_expr: str,
    n_replicates: int = 32,
) -> str:
    """DuckDB twin of :func:`poisson_bootstrap_mean` (generated from
    the same threshold literals)."""
    whens = " ".join(
        f"WHEN u <= {t!r} THEN {k}" for k, t in enumerate(POISSON1_CDF)
    )
    k_lo = max(1, int(0.05 * n_replicates))
    k_hi = max(1, int(0.95 * n_replicates))
    return f"""
WITH src AS ({table_sql}),
reps AS (SELECT CAST(r.range AS BIGINT) AS b FROM range({n_replicates}) r),
x AS (
  SELECT b,
         (CAST(CAST(('0x' || substr(md5(CAST(b AS VARCHAR) || ':' ||
               CAST({id_expr} AS VARCHAR)), 1, {_BOOT_HEX})) AS UBIGINT)
           AS DOUBLE) + 1.0) / {_BOOT_DENOM!r} AS u,
         {value_q_expr} AS vq
  FROM src, reps
),
agg AS (
  SELECT b,
         CAST(sum(CASE {whens} ELSE {len(POISSON1_CDF)} END) AS BIGINT)
           AS n_eff,
         CAST(sum((CASE {whens} ELSE {len(POISSON1_CDF)} END) * vq)
              AS BIGINT) AS sv
  FROM x GROUP BY b
),
m AS (
  SELECT b, n_eff,
         round(CAST(sv AS DOUBLE) / CAST(n_eff AS DOUBLE), 6) AS mean_v
  FROM agg
),
r AS (SELECT *, row_number() OVER (ORDER BY mean_v, b) AS rn FROM m)
SELECT b, n_eff, mean_v,
       min(CASE WHEN rn = {k_lo} THEN mean_v END) OVER () AS ci_lo,
       min(CASE WHEN rn = {k_hi} THEN mean_v END) OVER () AS ci_hi
FROM r
"""


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
) -> DataFrame:
    """[n_a, n_b, d_scaled, v_at_max, d_stat] — two-sample Kolmogorov–
    Smirnov distance between group ``group_a`` and the rest over an
    INTEGER value column, exact end to end: per-value conditional
    counts (one corpus-sized groupBy), cumulative counts over the
    value-domain-sized table, and the sup-distance kept scaled as
    ``D·n_a·n_b = max|n_b·cum_a − n_a·cum_b|`` in int64 — the single
    division happens once at the end.  ``v_at_max`` is the smallest
    value attaining the sup (deterministic tie-break)."""
    g = F.col(group_col)
    counts = df.groupBy(F.col(value_col).alias("v")).agg(
        F.sum(F.when(g == group_a, 1).otherwise(0)).alias("c_a"),
        F.sum(F.when(g != group_a, 1).otherwise(0)).alias("c_b"),
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    c = counts.select(
        "v",
        F.sum("c_a").over(w_cum).alias("cum_a"),
        F.sum("c_b").over(w_cum).alias("cum_b"),
        F.sum("c_a").over(w_all).alias("n_a"),
        F.sum("c_b").over(w_all).alias("n_b"),
    )
    d = F.abs(F.col("n_b") * F.col("cum_a") - F.col("n_a") * F.col("cum_b"))
    c = c.withColumn("_d", d).withColumn("_mx", F.max("_d").over(w_all))
    return (
        c.filter(F.col("_d") == F.col("_mx"))
        .groupBy("n_a", "n_b")
        .agg(
            F.max("_d").alias("d_scaled"),
            F.min("v").alias("v_at_max"),
        )
        .select(
            "n_a", "n_b", "d_scaled", "v_at_max",
            F.round(
                F.col("d_scaled").cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double"),
                6,
            ).alias("d_stat"),
        )
    )


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_q_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """[n_a, n_b, mean_a, mean_b, t_stat, dof] — Welch's unequal-
    variance t-test between two groups over a PRE-QUANTIZED integer
    value column (the caller fixes the measurement precision, e.g.
    cents): every aggregate is an exact int64 sum (n, Σv, Σv²), so the
    one expression that assembles t and the Welch–Satterthwaite dof
    from those six integers is identical in both engines.  Sample
    variance is ddof=1 via the cancellation-safe form
    (Σv² − (Σv)²/n)/(n−1).  Single map-side-combinable aggregation —
    the continuous-outcome companion to :func:`chi2_independence`.
    """
    g = F.col(group_col)
    agg = df.filter(g.isin([group_a, group_b])).agg(
        F.sum(F.when(g == group_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(g == group_b, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(g == group_a, F.col(value_q_col)).otherwise(0)).alias("s_a"),
        F.sum(F.when(g == group_b, F.col(value_q_col)).otherwise(0)).alias("s_b"),
        F.sum(F.when(g == group_a, F.col(value_q_col) * F.col(value_q_col))
              .otherwise(0)).alias("q_a"),
        F.sum(F.when(g == group_b, F.col(value_q_col) * F.col(value_q_col))
              .otherwise(0)).alias("q_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    sa, sb = F.col("s_a").cast("double"), F.col("s_b").cast("double")
    qa, qb = F.col("q_a").cast("double"), F.col("q_b").cast("double")
    ma, mb = sa / na, sb / nb
    va = (qa - sa * sa / na) / (na - 1.0)
    vb = (qb - sb * sb / nb) / (nb - 1.0)
    ua, ub = va / na, vb / nb
    t = (ma - mb) / F.sqrt(ua + ub)
    dof = (ua + ub) * (ua + ub) / (
        ua * ua / (na - 1.0) + ub * ub / (nb - 1.0)
    )
    return agg.select(
        "n_a", "n_b",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 3).alias("dof"),
    )


def wilcoxon_signed_rank(
    df: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """One row [n_pairs, w_plus, w_minus, z_value] — Wilcoxon
    signed-rank test over PAIRED integer observations (x_i, y_i): the
    non-parametric paired companion to :func:`welch_ttest` (which is
    unpaired) and the rank twin of the Mann–Whitney AUC.

    Standard construction: d = x − y, zero differences dropped, |d|
    ranked with AVERAGE ranks, W+ = Σ ranks of positive d.  Everything
    stays integer via the same doubled-rank identity as
    ``auc_mann_whitney`` — per |d| group g with c_g members (p_g
    positive) and B_g members ranking below,

        2·W+ = Σ_g p_g · (2·B_g + c_g + 1)          (exact)

    — so W+ and W− are exact halves and the normal-approximation z
    (with the standard tie correction Σ(c³−c)/48) assembles from four
    integers in one identical-IEEE expression, shipped UNROUNDED:

        z = (2·w2 − n(n+1)) / (4 · sqrt((2n(n+1)(2n+1) − Σ(c³−c))/48))

    Shape: one groupBy(|d|) over the pairs frame, then a cumsum window
    over the DISTINCT-|d| frame (value-domain-sized, never the corpus)
    — the same two-level rank discipline as the AUC operator.
    """
    dd = df.select(
        (F.col(x_col).cast("long") - F.col(y_col).cast("long")).alias("d")
    ).filter(F.col("d") != 0)
    g = dd.groupBy(F.abs(F.col("d")).alias("ad")).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).alias("p"),
    )
    w_below = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    r = g.withColumn("b", F.coalesce(F.sum("c").over(w_below), F.lit(0)))
    t = r.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(
            F.col("p").cast("decimal(38,0)")
            * (F.lit(2) * F.col("b") + F.col("c") + F.lit(1))
        ).cast("decimal(38,0)").alias("w2"),
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("c") * F.col("c")
            - F.col("c")
        ).cast("decimal(38,0)").alias("tie"),
    )
    n = F.col("n").cast("double")
    w2 = F.col("w2").cast("double")
    tie = F.col("tie").cast("double")
    var48 = F.lit(2.0) * n * (n + 1.0) * (2.0 * n + 1.0) - tie
    return t.select(
        F.col("n").alias("n_pairs"),
        (w2 / F.lit(2.0)).alias("w_plus"),
        ((n * (n + 1.0) - w2) / F.lit(2.0)).alias("w_minus"),
        (
            (F.lit(2.0) * w2 - n * (n + 1.0))
            / (F.lit(4.0) * F.nullif(F.sqrt(var48 / F.lit(48.0)), F.lit(0.0)))
        ).alias("z_value"),
    )


def chi2_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    quant: float = 1e6,
) -> DataFrame:
    """[a, b, obs, exp, contrib, chi2, dof] — full contingency table
    with the shared test statistic and degrees of freedom on each row."""
    obs = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count("*").alias("obs"))
    grid = (
        obs.select("a").distinct()
        .crossJoin(obs.select("b").distinct())
        .join(obs, ["a", "b"], "left")
        .select("a", "b", F.coalesce("obs", F.lit(0)).alias("obs"))
    )
    rt = F.sum("obs").over(Window.partitionBy("a"))
    ct = F.sum("obs").over(Window.partitionBy("b"))
    nn = F.sum("obs").over(Window.partitionBy())
    exp = (rt * ct).cast("double") / nn.cast("double")
    t = grid.select(
        "a", "b", "obs",
        exp.alias("exp"),
        rt.alias("_rt"), ct.alias("_ct"), nn.alias("_n"),
    )
    d = F.col("obs").cast("double") - F.col("exp")
    contrib = d * d / F.col("exp")
    cq = F.floor(contrib * quant + 0.5).cast("long")
    n_a = F.size(F.collect_set("a").over(Window.partitionBy()))
    n_b = F.size(F.collect_set("b").over(Window.partitionBy()))
    return t.select(
        "a", "b", "obs",
        F.round(F.col("exp"), 6).alias("exp"),
        (cq / quant).alias("contrib"),
        (F.sum(cq).over(Window.partitionBy()) / quant).alias("chi2"),
        ((n_a - 1) * (n_b - 1)).cast("long").alias("dof"),
    )


def kendall_tau_b(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """One row [n_docs, n_concordant, n_discordant, tau_b] — Kendall's
    rank correlation with the tie correction (tau-b) between two
    QUANTIZED integer columns.

    The scale design is the point: a naive Kendall is O(n²) pairs (or
    a sequential Fenwick sweep) — infeasible and un-Spark-like at
    corpus scale.  With bucketed inputs the statistic only depends on
    the joint histogram, so ONE corpus-sized groupBy produces the
    (x, y, count) grid and every pair count comes from an O(k²)
    histogram self-join (k = distinct combos, bounded by the bucket
    grids, so the non-equi join is a broadcast nested loop over a
    dim-sized table at any corpus size):

        C = Σ c₁c₂ over x₁<x₂ ∧ y₁<y₂     (concordant)
        D = Σ c₁c₂ over x₁<x₂ ∧ y₁>y₂     (discordant)
        tau_b = 2(C−D) / sqrt((N0−N1)(N0−N2))

    with N0 = n(n−1), N1 = Σ_x t_x(t_x−1), N2 = Σ_y t_y(t_y−1) kept at
    2× the textbook values so everything stays integer (t(t−1) is
    even; no halving ever happens).  All sums are exact
    DECIMAL(38,0)/HUGEINT (the assortativity convention); one sqrt +
    one division, round-6.
    """
    dec = "decimal(38,0)"
    cell = (
        df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast(dec).alias("c"))
    )
    a = cell.select(
        F.col("x").alias("x1"), F.col("y").alias("y1"), F.col("c").alias("c1")
    )
    b = cell.select(
        F.col("x").alias("x2"), F.col("y").alias("y2"), F.col("c").alias("c2")
    )
    cd = (
        a.join(F.broadcast(b), F.col("x1") < F.col("x2"))
        .agg(
            F.sum(
                F.when(F.col("y1") < F.col("y2"), F.col("c1") * F.col("c2"))
            ).alias("cc"),
            F.sum(
                F.when(F.col("y1") > F.col("y2"), F.col("c1") * F.col("c2"))
            ).alias("dd"),
        )
        .select(
            F.coalesce(F.col("cc"), F.lit(0).cast(dec)).alias("cc"),
            F.coalesce(F.col("dd"), F.lit(0).cast(dec)).alias("dd"),
        )
    )
    tot = cell.agg(F.sum("c").alias("n")).select(
        "n", (F.col("n") * (F.col("n") - 1)).alias("n0")
    )
    tx = (
        cell.groupBy("x").agg(F.sum("c").alias("t"))
        .agg(F.sum(F.col("t") * (F.col("t") - 1)).alias("n1"))
    )
    ty = (
        cell.groupBy("y").agg(F.sum("c").alias("t"))
        .agg(F.sum(F.col("t") * (F.col("t") - 1)).alias("n2"))
    )
    j = cd.crossJoin(tot).crossJoin(tx).crossJoin(ty)
    den = F.sqrt((F.col("n0") - F.col("n1")).cast("double")) * F.sqrt(
        (F.col("n0") - F.col("n2")).cast("double")
    )
    return j.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("cc").cast("long").alias("n_concordant"),
        F.col("dd").cast("long").alias("n_discordant"),
        F.round(
            F.lit(2.0) * (F.col("cc") - F.col("dd")).cast("double")
            / F.nullif(den, F.lit(0.0))
            + F.lit(0.0),
            6,
        ).alias("tau_b"),
    )


def cohens_kappa(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """[n_rows, n_agree, kappa] — Cohen's κ chance-corrected agreement
    between two categorical labelings of the same rows (the standard
    classifier-vs-truth or annotator-vs-annotator eval; here it closes
    the language-ID loop: heuristic prediction vs the corpus label).

    Exactness contract: with N = #rows, A = #agreements and
    S = Σ_class row_margin·col_margin (all exact int64),

        κ = (p_o − p_e) / (1 − p_e) = (A·N − S) / (N² − S)

    — one division of two exact int64s, identical in both engines;
    NULL when p_e = 1 (both sides constant, κ undefined).

    Distributed shape: three corpus-sized aggregates (total + the two
    margin groupBys — each a two-phase partial agg); the margin
    product join runs over |classes| rows.  The margins are joined
    inner on class name: a class absent from either side contributes
    0 to S by construction.  int64 envelope: A·N ≤ N² — safe through
    3·10⁹ rows; beyond that promote the two products to decimal.
    """
    base = df.select(F.col(col_a).alias("ca"), F.col(col_b).alias("cb"))
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("ca") == F.col("cb"), 1).otherwise(0))
        .cast("long")
        .alias("agree"),
    )
    rm = base.groupBy(F.col("ca").alias("cls")).agg(
        F.count(F.lit(1)).cast("long").alias("ra")
    )
    cm = base.groupBy(F.col("cb").alias("cls")).agg(
        F.count(F.lit(1)).cast("long").alias("cbn")
    )
    pe = rm.join(cm, "cls").agg(
        F.coalesce(F.sum(F.col("ra") * F.col("cbn")), F.lit(0))
        .cast("long")
        .alias("s")
    )
    nn = F.col("n") * F.col("n")
    return tot.crossJoin(F.broadcast(pe)).select(
        F.col("n").alias("n_rows"),
        F.col("agree").alias("n_agree"),
        F.when(
            nn != F.col("s"),
            (F.col("agree") * F.col("n") - F.col("s")).cast("double")
            / (nn - F.col("s")).cast("double"),
        ).alias("kappa"),
    )


WILSON_Z = 1.96
WILSON_Z2 = WILSON_Z * WILSON_Z  # literal shared with the oracle SQL


def wilson_lower_bound(
    df: DataFrame,
    group_col: str,
    success_col: str,
) -> DataFrame:
    """[group, n, k, wilson_lb] — Wilson-score lower bound (z = 1.96) on
    each group's success rate: the ranking statistic that damps
    small-sample groups (the classic host-reputation / review-sort
    correction — a 2/2 host must not outrank a 95/100 one).

    lb = (p̂ + z²/2n − z·√((p̂(1−p̂) + z²/4n)/n)) / (1 + z²/n)

    FP-portability: n and k are exact int64 counts and the bound is the
    SAME fixed expression tree in both engines over them — each op
    (÷, ×, √) is IEEE-correctly-rounded, so the result is bit-identical
    and ships unrounded (the rrf_score convention).
    """
    g = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col(success_col), 1).otherwise(0)).cast("long").alias("k"),
    )
    n = F.col("n").cast("double")
    p = F.col("k") / n
    lb = (
        p
        + F.lit(WILSON_Z2) / (2.0 * n)
        - F.lit(WILSON_Z)
        * F.sqrt((p * (1.0 - p) + F.lit(WILSON_Z2) / (4.0 * n)) / n)
    ) / (1.0 + F.lit(WILSON_Z2) / n)
    return g.withColumn("wilson_lb", lb)


def classification_prf(
    df: DataFrame,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """[class, tp, fp, fn, precision, recall, f1] — one-vs-rest
    per-class precision/recall/F1 between a prediction column and a
    label column (multi-class, classes = union of observed values).

    All counts are exact int64; each ratio is ONE division of two
    integers (F1 uses the 2·tp/(2·tp+fp+fn) form, never 2pr/(p+r), so
    no intermediate FP composition exists).  Zero denominators yield
    NULL.  Scale shape: one groupBy over (label, pred) — a dim-sized
    confusion grid — then per-class sums over that grid.
    """
    cm = (
        df.select(F.col(label_col).alias("_l"), F.col(pred_col).alias("_p"))
        .groupBy("_l", "_p")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint()  # feeds three branches below (no-CSE rule)
    )
    classes = (
        cm.select(F.col("_l").alias("class"))
        .union(cm.select(F.col("_p").alias("class")))
        .distinct()
    )
    tp = cm.filter(F.col("_l") == F.col("_p")).select(
        F.col("_l").alias("class"), F.col("c").alias("tp")
    )
    pred_tot = cm.groupBy(F.col("_p").alias("class")).agg(F.sum("c").alias("np"))
    lab_tot = cm.groupBy(F.col("_l").alias("class")).agg(F.sum("c").alias("nl"))
    j = (
        classes.join(tp, "class", "left")
        .join(pred_tot, "class", "left")
        .join(lab_tot, "class", "left")
        .select(
            "class",
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
            (F.coalesce("np", F.lit(0)) - F.coalesce("tp", F.lit(0)))
            .cast("long").alias("fp"),
            (F.coalesce("nl", F.lit(0)) - F.coalesce("tp", F.lit(0)))
            .cast("long").alias("fn"),
        )
    )
    return j.select(
        "class", "tp", "fp", "fn",
        F.round(F.col("tp") / F.nullif((F.col("tp") + F.col("fp")).cast("double"), F.lit(0.0)), 6).alias("precision"),
        F.round(F.col("tp") / F.nullif((F.col("tp") + F.col("fn")).cast("double"), F.lit(0.0)), 6).alias("recall"),
        F.round(
            (2 * F.col("tp"))
            / F.nullif((2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"), F.lit(0.0)),
            6,
        ).alias("f1"),
    )


def _calibration_grouped(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int,
    lo: float,
    hi: float,
) -> DataFrame:
    """[bin, n, _ssum, _pos] — the shared per-bin exact-int partials of
    calibration_bins / expected_calibration_error."""
    width = (hi - lo) / n_bins
    b = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0), F.floor((F.col(score_col) - lo) / F.lit(width)).cast("int")
        ),
    )
    smicro = F.round(F.col(score_col) * 1_000_000.0).cast("long")
    return (
        df.select(
            b.cast("long").alias("bin"),
            smicro.alias("_sm"),
            F.when(F.col(label_col), 1).otherwise(0).alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_sm").alias("_ssum"),
            F.sum("_y").cast("long").alias("_pos"),
        )
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    lo: float = -1.0,
    hi: float = 1.0,
) -> DataFrame:
    """[bin, n, mean_score, pos_rate, gap] — reliability diagram for a
    real-valued score against a boolean outcome: equal-width bins over
    [lo, hi], per-bin mean score vs empirical positive rate (the ECE
    ingredients; Σ n·gap/N is one further exact step for the caller).

    FP discipline: the bin index floors the SAME double in both engines
    (identical inputs → identical floor); per-bin score mass accumulates
    as 1e-6-quantized int64 (order-free), so mean_score and pos_rate are
    each ONE division of exact integers.  They ship UNROUNDED (the
    rrf_score convention): a round-6 here once landed exactly on …5 and
    split Spark's decimal HALF_UP from DuckDB's binary rounding
    (BENCH/SCALE_AUDIT.md), while the raw doubles are bit-identical.
    """
    g = _calibration_grouped(df, score_col, label_col, n_bins, lo, hi)
    mean_s = F.col("_ssum") / (F.col("n") * 1_000_000.0)
    rate = F.col("_pos") / F.col("n").cast("double")
    return g.select(
        "bin", "n",
        mean_s.alias("mean_score"),
        rate.alias("pos_rate"),
        F.abs(mean_s - rate).alias("gap"),
    )


def anova_oneway(
    df: DataFrame,
    group_col: str,
    value_q_col: str,
    groups: list,
) -> DataFrame:
    """[n_total, df_between, df_within, ss_between, ss_within, f_stat] —
    one-way ANOVA F over a pre-quantized integer value column across an
    EXPLICIT literal group list (the welch_ttest convention scaled to
    G groups).

    Per-group n/Σv/Σv² are exact int64 conditional sums gathered in ONE
    map-side-combinable aggregation row; the sums over groups
    (Σ_g s_g²/n_g etc.) are then assembled in FIXED lexical group order
    as one expression tree, so no distributed FP reordering exists and
    the oracle evaluates the identical chain.  SS terms and F ship
    unrounded (they are bit-identical doubles; magnitudes here exceed
    the O(1e9) safe-rounding envelope — BENCH/SCALE_AUDIT.md).
    """
    gs = sorted(groups)
    g = F.col(group_col)
    v = F.col(value_q_col)
    aggs = []
    for i, name in enumerate(gs):
        cond = g == name
        aggs += [
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"n_{i}"),
            F.sum(F.when(cond, v).otherwise(0)).cast("long").alias(f"s_{i}"),
            F.sum(F.when(cond, v * v).otherwise(0)).cast("long").alias(f"q_{i}"),
        ]
    a = df.filter(g.isin(gs)).agg(*aggs)
    nd = [F.col(f"n_{i}").cast("double") for i in range(len(gs))]
    sd = [F.col(f"s_{i}").cast("double") for i in range(len(gs))]
    qd = [F.col(f"q_{i}").cast("double") for i in range(len(gs))]
    n_tot = nd[0]
    for x in nd[1:]:
        n_tot = n_tot + x
    s_tot = sd[0]
    for x in sd[1:]:
        s_tot = s_tot + x
    q_tot = qd[0]
    for x in qd[1:]:
        q_tot = q_tot + x
    sb = sd[0] * sd[0] / nd[0]
    for i in range(1, len(gs)):
        sb = sb + sd[i] * sd[i] / nd[i]
    ss_between = sb - s_tot * s_tot / n_tot
    ss_within = q_tot - sb
    df_b = float(len(gs) - 1)
    f_stat = (ss_between / F.lit(df_b)) / (ss_within / (n_tot - F.lit(float(len(gs)))))
    return a.select(
        n_tot.cast("long").alias("n_total"),
        F.lit(len(gs) - 1).cast("long").alias("df_between"),
        (n_tot - len(gs)).cast("long").alias("df_within"),
        ss_between.alias("ss_between"),
        ss_within.alias("ss_within"),
        f_stat.alias("f_stat"),
    )


def grouped_median_mad(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """[grp, n, median, mad] — exact per-group lower median and median
    absolute deviation of an INTEGER value column: the robust
    location/spread profile (a MAD survives the outliers that wreck a
    stddev).

    Both medians use the value-histogram shape (the zonal-quantile /
    KS convention): one corpus-sized groupBy to per-(group, value)
    counts, then cumulative windows over the dim-sized histogram —
    never a per-row sort.  Lower median = smallest v with
    cum ≥ (n+1) div 2, all-integer, so both engines pick the identical
    element; deviations |v − median| are again integers, and the second
    median runs the same machinery over the deviation histogram.
    """
    h = (
        df.select(F.col(group_col).alias("grp"), F.col(value_col).alias("v"))
        .groupBy("grp", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()  # feeds the median AND the deviation pass
    )

    def lower_median(hist, out):
        wc = (
            Window.partitionBy("grp").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wa = Window.partitionBy("grp")
        x = hist.select(
            "grp", "v",
            F.sum("c").over(wc).alias("cum"),
            F.sum("c").over(wa).alias("n"),
        )
        return (
            x.filter(F.col("cum") >= F.expr("(n + 1) div 2"))
            .groupBy("grp")
            .agg(
                F.min("v").cast("long").alias(out),
                F.min(F.col("n")).cast("long").alias("n"),
            )
        )

    med = lower_median(h, "median")
    dev = (
        h.join(med.select("grp", "median"), "grp")
        .select("grp", F.abs(F.col("v") - F.col("median")).alias("v"), "c")
        .groupBy("grp", "v")
        .agg(F.sum("c").alias("c"))
    )
    mad = lower_median(dev, "mad").select("grp", "mad")
    return med.join(mad, "grp").select("grp", "n", "median", "mad")


def theil_sen_trend(
    grid: DataFrame,
    t_col: str = "t",
    y_col: str = "y",
) -> DataFrame:
    """[n_points, n_pairs, slope, intercept] — Theil–Sen robust trend
    of an integer daily series: the median of all pairwise slopes
    (breakdown point 29%, the robust alternative to OLS a single
    anomalous day cannot bend), intercept = median of y − slope·t.

    The series is the DENSE daily calendar — a dim-sized table (the
    side-statistics convention), so the O(days²) pair self-join is a
    dim×dim product, never corpus-sized; the corpus-scale work happened
    in the upstream per-day count.  Each slope is ONE division of exact
    ints (identical double both engines); medians are lower medians
    under total orders tie-broken by the pair/time key.
    """
    a = grid.select(F.col(t_col).alias("ti"), F.col(y_col).alias("yi"))
    b = grid.select(F.col(t_col).alias("tj"), F.col(y_col).alias("yj"))
    pairs = a.join(b, F.col("ti") < F.col("tj")).select(
        "ti", "tj",
        ((F.col("yj") - F.col("yi")).cast("double")
         / (F.col("tj") - F.col("ti")).cast("double")).alias("sl"),
    )
    wc = Window.orderBy("sl", "ti", "tj").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wa = Window.partitionBy()
    ranked = pairs.select(
        "sl",
        F.count(F.lit(1)).over(wc).alias("cum"),
        F.count(F.lit(1)).over(wa).alias("np"),
    )
    slope = (
        ranked.filter(F.col("cum") >= F.expr("(np + 1) div 2"))
        .agg(F.min("sl").alias("slope"), F.min("np").cast("long").alias("n_pairs"))
    )
    resid = grid.crossJoin(F.broadcast(slope)).select(
        (F.col(y_col).cast("double")
         - F.col("slope") * F.col(t_col).cast("double")).alias("b"),
        F.col(t_col).alias("t"), "slope", "n_pairs",
    )
    wc2 = Window.orderBy("b", "t").rowsBetween(Window.unboundedPreceding, 0)
    wa2 = Window.partitionBy()
    r2 = resid.select(
        "b", "slope", "n_pairs",
        F.count(F.lit(1)).over(wc2).alias("cum"),
        F.count(F.lit(1)).over(wa2).alias("n"),
    )
    return (
        r2.filter(F.col("cum") >= F.expr("(n + 1) div 2"))
        .agg(
            F.min("n").cast("long").alias("n_points"),
            F.min("n_pairs").alias("n_pairs"),
            F.min("slope").alias("slope"),
            F.min("b").alias("intercept"),
        )
    )


def kruskal_wallis(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """One row [n_groups, n, h_stat, h_tie_corrected] — the
    Kruskal–Wallis rank-sum omnibus test (does at least one group's
    value distribution sit higher?), the nonparametric sibling of
    ``anova_oneway`` that completes the shift-test family
    (KS / Welch / ANOVA / JS-divergence).

    Exactness: ranks never materialize per row.  Doubled average ranks
    are integers (2·r̄(v) = 2·#smaller + #equal + 1), computed off a
    VALUE HISTOGRAM — one shuffle keyed by value, one dim-sized
    cumulative window over the distinct values (the zonal-quantile
    trick), so the per-group rank sums R2ⱼ = Σ gcnt·2r̄ are exact
    int64.  Each group's H term R2ⱼ²/(4nⱼ) is evaluated as the same
    IEEE expression in both engines and 1e-6-quantized BEFORE the
    cross-group sum (summation order can never move the rounded
    statistic); the tie correction Σ(t³−t)/(N³−N) is exact integer
    arithmetic until one final division.  H = 12·S/(N(N+1)) − 3(N+1),
    tie-corrected H' = H/(1 − T/(N³−N)), both round-6 with the −0.0
    flush."""
    d = df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
    gv = d.groupBy("g", "v").agg(F.count(F.lit(1)).alias("gcnt"))
    vc = gv.groupBy("v").agg(F.sum("gcnt").alias("cnt"))
    w = (
        Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    vr = vc.select(
        "v", "cnt",
        (2 * F.coalesce(F.sum("cnt").over(w), F.lit(0))
         + F.col("cnt") + 1).alias("r2"),
    )
    grp = (
        gv.join(vr, "v")
        .groupBy("g")
        .agg(
            F.sum("gcnt").alias("n_g"),
            F.sum(F.col("gcnt") * F.col("r2")).alias("r2_sum"),
        )
    )
    term = (
        F.col("r2_sum").cast("double") * F.col("r2_sum").cast("double")
        / (4.0 * F.col("n_g").cast("double"))
    )
    s = grp.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum(F.floor(term * 1e6 + F.lit(0.5)).cast("long")).alias("sq"),
    )
    ties = vc.agg(
        (F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt"))
         - F.sum("cnt")).cast("long").alias("t3t")
    )
    nn = F.col("n").cast("double")
    h = (
        12.0 * (F.col("sq").cast("double") / 1e6) / (nn * (nn + 1.0))
        - 3.0 * (nn + 1.0)
    )
    corr = 1.0 - F.col("t3t").cast("double") / (nn * nn * nn - nn)
    return s.crossJoin(F.broadcast(ties)).select(
        "n_groups", "n",
        F.round(h + F.lit(0.0), 6).alias("h_stat"),
        F.round(h / corr + F.lit(0.0), 6).alias("h_tie_corrected"),
    )


def kruskal_wallis_sql(table: str, group_col: str, value_col: str) -> str:
    """DuckDB twin of :func:`kruskal_wallis` (same histogram-rank
    construction, same quantization points, same lexical float order)."""
    return f"""
WITH d AS (SELECT {group_col} AS g, {value_col} AS v FROM {table}),
gv AS (SELECT g, v, count(*) AS gcnt FROM d GROUP BY g, v),
vc AS (SELECT v, sum(gcnt) AS cnt FROM gv GROUP BY v),
vr AS (SELECT v, cnt,
              2 * coalesce(sum(cnt) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + cnt + 1 AS r2
       FROM vc),
grp AS (SELECT g, sum(gcnt) AS n_g, sum(gcnt * vr.r2) AS r2_sum
        FROM gv JOIN vr USING (v) GROUP BY g),
s AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(n_g) AS BIGINT) AS n,
             CAST(sum(CAST(floor(
               (CAST(r2_sum AS DOUBLE) * CAST(r2_sum AS DOUBLE)
                / (4.0 * CAST(n_g AS DOUBLE))) * 1000000.0 + 0.5)
               AS BIGINT)) AS BIGINT) AS sq
      FROM grp),
t AS (SELECT CAST(sum(cnt * cnt * cnt) - sum(cnt) AS BIGINT) AS t3t FROM vc)
SELECT n_groups, n,
       round((12.0 * (CAST(sq AS DOUBLE) / 1000000.0)
              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
              - 3.0 * (CAST(n AS DOUBLE) + 1.0)) + 0.0, 6) AS h_stat,
       round(((12.0 * (CAST(sq AS DOUBLE) / 1000000.0)
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
               - 3.0 * (CAST(n AS DOUBLE) + 1.0))
              / (1.0 - CAST(t3t AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    - CAST(n AS DOUBLE)))) + 0.0, 6) AS h_tie_corrected
FROM s, t
"""


def trimmed_mean(
    df: DataFrame, group_col: str, value_col: str, trim_pct: int = 10
) -> DataFrame:
    """[g, n, n_trim, trimmed_mean] — per-group symmetric trimmed mean
    (drop the ⌊n·pct/100⌋ lowest and highest values, average the
    rest): the robust location estimate curation pipelines use where a
    plain mean is hostage to outlier documents.

    Same value-histogram shape as kruskal_wallis / grouped_median_mad:
    one shuffle keyed by (group, value), a per-GROUP cumulative window
    over the distinct values, and the kept mass per value is an exact
    integer interval overlap — rank span [cum+1, cum+cnt] clipped to
    [k+1, n−k].  The numerator Σ v·kept is exact int64 (integer
    values); the single division is the same IEEE expression in both
    engines, round-6."""
    k_expr = (F.col("n_g") * trim_pct) / 100  # int division below
    d = df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
    gv = d.groupBy("g", "v").agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wg = Window.partitionBy("g")
    t = (
        gv.withColumn("cum", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
        .withColumn("n_g", F.sum("cnt").over(wg))
        .withColumn("k", F.floor(k_expr).cast("long"))
    )
    lo, hi = F.col("k") + 1, F.col("n_g") - F.col("k")
    r0, r1 = F.col("cum") + 1, F.col("cum") + F.col("cnt")
    kept = F.greatest(
        F.lit(0),
        F.least(hi, r1) - F.greatest(lo, r0) + 1,
    )
    return (
        t.withColumn("kept", kept)
        .groupBy("g")
        .agg(
            F.max("n_g").cast("long").alias("n"),
            F.max("k").cast("long").alias("n_trim"),
            F.round(
                F.sum(F.col("v") * F.col("kept")).cast("double")
                / (F.max("n_g") - 2 * F.max("k")).cast("double")
                + F.lit(0.0),
                6,
            ).alias("trimmed_mean"),
        )
    )


def trimmed_mean_sql(
    table: str, group_col: str, value_col: str, trim_pct: int = 10
) -> str:
    """DuckDB twin of :func:`trimmed_mean` (same histogram, same
    integer interval-overlap, same lexical float order)."""
    return f"""
WITH d AS (SELECT {group_col} AS g, {value_col} AS v FROM {table}),
gv AS (SELECT g, v, count(*) AS cnt FROM d GROUP BY g, v),
t AS (SELECT g, v, cnt,
             coalesce(sum(cnt) OVER (PARTITION BY g ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
             sum(cnt) OVER (PARTITION BY g) AS n_g
      FROM gv),
kp AS (SELECT g, v, cnt, cum, n_g,
              CAST(floor((n_g * {trim_pct}) / 100) AS BIGINT) AS k
       FROM t),
ov AS (SELECT g, v, n_g, k,
              greatest(0, least(n_g - k, cum + cnt)
                          - greatest(k + 1, cum + 1) + 1) AS kept
       FROM kp)
SELECT g, CAST(max(n_g) AS BIGINT) AS n,
       CAST(max(k) AS BIGINT) AS n_trim,
       round(CAST(sum(v * kept) AS DOUBLE)
             / CAST(max(n_g) - 2 * max(k) AS DOUBLE) + 0.0, 6)
         AS trimmed_mean
FROM ov GROUP BY g
"""


def brown_forsythe(
    df: DataFrame,
    group_col: str,
    value_q_col: str,
    groups: list,
) -> DataFrame:
    """[n_total, df_between, df_within, ss_between, ss_within, f_stat]
    — the Brown–Forsythe test of VARIANCE homogeneity (Levene with
    median centres, the robust default): does at least one group
    spread wider?  The companion to anova_oneway (means) and
    kruskal_wallis (location shift) that completes the omnibus family
    — and the guard that decides whether pooled-variance tests apply.

    Composition of two already-exact pieces: per-group LOWER medians
    off the value histogram (grouped_median_mad's shape — integer in,
    integer out), then z = |v − median_g| stays integer and feeds the
    fixed-lexical-order ANOVA sum assembly unchanged.  The median dim
    (one row per group) broadcasts."""
    med = grouped_median_mad(df, group_col, value_q_col).select(
        F.col("grp").alias(group_col), F.col("median")
    )
    z = df.join(F.broadcast(med), group_col).select(
        F.col(group_col),
        F.abs(F.col(value_q_col) - F.col("median")).alias("z"),
    )
    return anova_oneway(z, group_col, "z", groups)


def expected_calibration_error(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    lo: float = -1.0,
    hi: float = 1.0,
) -> DataFrame:
    """One row [n_total, n_bins_occupied, ece] — the expected
    calibration error Σ (nᵦ/N)·|mean_scoreᵦ − pos_rateᵦ| collapsing
    calibration_bins to the headline scalar.

    EXACT-RATIONAL assembly: with per-bin int64 partials (n, ssum =
    Σ round(score·1e6), pos), each weighted gap is
    |ssum − 1e6·pos| / (1e6·N) — so the cross-bin sum is one exact
    integer sum and the ONLY floating point is the final division,
    round-6 with the −0.0 flush.  No per-bin double ever sums across
    bins."""
    g = _calibration_grouped(df, score_col, label_col, n_bins, lo, hi)
    num = F.abs(F.col("_ssum") - 1_000_000 * F.col("_pos"))
    return g.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.count(F.lit(1)).cast("long").alias("n_bins_occupied"),
        F.round(
            F.sum(num).cast("double") / 1_000_000.0
            / F.sum("n").cast("double")
            + F.lit(0.0),
            6,
        ).alias("ece"),
    )


_PERM_B = 200  # sign-flip replicates (shared with the SQL twin)


def signflip_permutation_test(
    df: DataFrame,
    d_col: str,
    t_col: str,
    n_replicates: int = _PERM_B,
) -> DataFrame:
    """[n_pairs, obs_diff, n_ge, p_value] — exact-arithmetic paired
    permutation (sign-flip) test of H0: median paired difference = 0,
    the resampling companion to the Wilcoxon signed-rank test (same
    paired frame) and the Poisson bootstrap (same deterministic-md5
    replicate scheme).  For replicate b each pair's integer difference
    d_t keeps or flips sign by the parity of md5(b ":" t)'s first hex
    digit; the statistic |Σ s·d| and the observed |Σ d| are exact
    int64, so the only float is the final Monte-Carlo p-value
    (1 + #{b: stat_b ≥ obs}) / (B + 1), rounded once.

    Distributed shape: pairs × B via a broadcast replicate dim (the
    bootstrap's map-side pattern — no global coordination), one
    groupBy(b), one tiny cross join against the 1-row observed
    aggregate.  Pairs are dim-sized (a calendar) at any corpus scale;
    the corpus-sized work happened upstream in the per-day counting.
    """
    reps = df.sparkSession.range(n_replicates).select(
        F.col("id").alias("b")
    )
    d = df.select(
        F.col(t_col).alias("t"), F.col(d_col).cast("long").alias("d")
    )
    obs = d.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.abs(F.sum("d")).alias("obs_diff"),
    )
    parity = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("b").cast("string"),
                                  F.col("t").cast("string"))),
                1, 1,
            ),
            16, 10,
        ).cast("long") % 2
    )
    s = F.when(parity == 0, F.lit(1)).otherwise(F.lit(-1))
    stats = (
        d.crossJoin(F.broadcast(reps))
        .groupBy("b")
        .agg(F.abs(F.sum(s * F.col("d"))).alias("stat"))
    )
    return (
        stats.crossJoin(F.broadcast(obs))
        .groupBy("n_pairs", "obs_diff")
        .agg(
            F.sum(
                F.when(F.col("stat") >= F.col("obs_diff"), 1).otherwise(0)
            ).alias("n_ge")
        )
        .select(
            "n_pairs", "obs_diff", "n_ge",
            F.round(
                (F.col("n_ge") + 1).cast("double")
                / F.lit(float(n_replicates + 1)),
                6,
            ).alias("p_value"),
        )
    )


def signflip_permutation_sql(
    pairs_sql: str,
    n_replicates: int = _PERM_B,
) -> str:
    """DuckDB twin of :func:`signflip_permutation_test`.  ``pairs_sql``
    must yield (t, d) with d already an integer difference."""
    return f"""
WITH pairs AS MATERIALIZED ({pairs_sql}),
reps AS (SELECT CAST(r.range AS BIGINT) AS b FROM range({n_replicates}) r),
obs AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               abs(CAST(sum(d) AS BIGINT)) AS obs_diff FROM pairs),
stats AS (
  SELECT b,
         abs(CAST(sum(
           (CASE WHEN CAST(('0x' || substr(md5(CAST(b AS VARCHAR) || ':' ||
                 CAST(t AS VARCHAR)), 1, 1)) AS BIGINT) % 2 = 0
                 THEN 1 ELSE -1 END) * d) AS BIGINT)) AS stat
  FROM pairs, reps GROUP BY b
)
SELECT o.n_pairs, o.obs_diff,
       CAST(sum(CASE WHEN s.stat >= o.obs_diff THEN 1 ELSE 0 END)
            AS BIGINT) AS n_ge,
       round(CAST(sum(CASE WHEN s.stat >= o.obs_diff THEN 1 ELSE 0 END) + 1
                  AS DOUBLE) / {float(n_replicates + 1)!r}, 6) AS p_value
FROM stats s, obs o
GROUP BY o.n_pairs, o.obs_diff
"""


_AD_QA = 10**6   # per-(group, value) term quantum
_AD_QB = 10**3   # per-group component quantum


def anderson_darling_k(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """One row [n_groups, n, a2_akn] — the k-sample Anderson–Darling
    test in its tie-adjusted (midrank) form A²akN (Scholz & Stephens
    1987, eq. 6): the omnibus distribution-equality test that weights
    the TAILS, catching shifts Kruskal–Wallis (location only) and KS
    (sup metric, 2 groups) miss — the last member of the shift-test
    family.

        A²akN = (N−1)/N Σ_i (1/n_i) Σ_j (l_j/N)
                · (N·M_ij − n_i·B_j)² / (B_j(N−B_j) − N·l_j/4)

    with l_j the pooled count at distinct value j, M_ij / B_j the
    midrank-adjusted group / pooled cumulative counts.  Exactness:
    doubled cumulatives m2 = 2F_ij − f_ij and b2 = 2C_j − l_j are
    integers, so each inner term is the exact rational
    l_j·(N·m2 − n_i·b2)² / (N·(b2(2N−b2) − N·l_j)) — quantized to
    1/QA by DECIMAL(38,0) integer division (the numerator reaches
    ~1e22), summed order-free per group, then each 1/n_i weight is a
    second integer division by QB before the cross-group sum.  The
    only FP is the final (N−1)/N scaling + round-6.  Zero-fill
    matters: values a group never attains still contribute (its
    cumulative keeps counting), so the (group × value) grid is
    completed before the windows — same completed-grid rule as chi².

    Shape: one shuffle keyed by (group, value); a per-group cumulative
    window + pooled windows over the dim-sized completed grid
    (k·L rows, L = distinct values); one 1-row reduce."""
    d = df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
    gv = d.groupBy("g", "v").agg(F.count(F.lit(1)).alias("f"))
    vc = gv.groupBy("v").agg(F.sum("f").alias("l"))
    groups = gv.select("g").distinct()
    grid = (
        groups.crossJoin(vc)
        .join(gv, ["g", "v"], "left")
        .select("g", "v", "l", F.coalesce("f", F.lit(0)).alias("f"))
    )
    wg = (
        Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wv = (
        Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = (
        grid.withColumn("fc", F.sum("f").over(wg))
        .withColumn("m2", 2 * F.col("fc") - F.col("f"))
        .withColumn("ng", F.sum("f").over(Window.partitionBy("g")))
        .withColumn("nn", F.sum("f").over(Window.partitionBy()))
    )
    # pooled doubled cumulative: b2 = 2C_j − l_j is group-independent;
    # recover it from any group's frame via the pooled window on vc
    cb = vc.withColumn("cum", F.sum("l").over(wv)).select(
        "v", (2 * F.col("cum") - F.col("l")).alias("b2")
    )
    t = t.join(cb, "v")
    pw = F.col("nn") * F.col("m2") - F.col("ng") * F.col("b2")
    d4 = F.col("b2") * (2 * F.col("nn") - F.col("b2")) - F.col("nn") * F.col("l")
    term = F.expr(
        f"CAST((CAST({_AD_QA} AS DECIMAL(38,0)) * CAST(l AS DECIMAL(38,0))"
        " * CAST(pw AS DECIMAL(38,0)) * CAST(pw AS DECIMAL(38,0)))"
        " div (CAST(nn AS DECIMAL(38,0)) * CAST(d4 AS DECIMAL(38,0)))"
        " AS BIGINT)"
    )
    per_g = (
        t.withColumn("pw", pw.cast("long"))
        .withColumn("d4", d4.cast("long"))
        .withColumn("tq", term)
        .groupBy("g")
        .agg(
            F.max("ng").cast("long").alias("ng"),
            F.max("nn").cast("long").alias("nn"),
            F.sum("tq").cast("long").alias("s"),
        )
    )
    comp = F.expr(f"(s * CAST({_AD_QB} AS BIGINT)) div ng")
    out = per_g.select("nn", comp.alias("cq")).groupBy("nn").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("cq").cast("long").alias("aq"),
    )
    nnD = F.col("nn").cast("double")
    return out.select(
        "n_groups",
        F.col("nn").cast("long").alias("n"),
        F.round(
            (nnD - 1.0) / nnD
            * (F.col("aq").cast("double") / F.lit(float(_AD_QA * _AD_QB)))
            + F.lit(0.0),
            6,
        ).alias("a2_akn"),
    )


def anderson_darling_k_sql(table: str, group_col: str, value_col: str) -> str:
    """DuckDB twin of :func:`anderson_darling_k` — same completed
    grid, same doubled cumulatives, same two-level integer
    quantization (HUGEINT numerators mirror the DECIMAL(38,0) path)."""
    qa, qb = _AD_QA, _AD_QB
    return f"""
WITH d AS (SELECT {group_col} AS g, {value_col} AS v FROM {table}),
gv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS f FROM d GROUP BY g, v),
vc AS (SELECT v, CAST(sum(f) AS BIGINT) AS l FROM gv GROUP BY v),
cb AS (SELECT v, l,
              CAST(2 * sum(l) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - l
                AS BIGINT) AS b2
       FROM vc),
grid AS (
  SELECT gr.g, cb.v, cb.l, cb.b2, coalesce(gv.f, 0) AS f
  FROM (SELECT DISTINCT g FROM gv) gr
  CROSS JOIN cb
  LEFT JOIN gv ON gv.g = gr.g AND gv.v = cb.v
),
t AS (
  SELECT g, l, b2, f,
         CAST(2 * sum(f) OVER (PARTITION BY g ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - f
           AS BIGINT) AS m2,
         CAST(sum(f) OVER (PARTITION BY g) AS BIGINT) AS ng,
         CAST(sum(f) OVER () AS BIGINT) AS nn
  FROM grid
),
pg AS (
  SELECT g, max(ng) AS ng, max(nn) AS nn,
         CAST(sum((CAST({qa} AS HUGEINT) * l
                   * (nn * m2 - ng * b2) * (nn * m2 - ng * b2))
                  // (nn * (b2 * (2 * nn - b2) - nn * l))) AS BIGINT) AS s
  FROM t GROUP BY g
),
o AS (
  SELECT max(nn) AS nn, CAST(count(*) AS BIGINT) AS n_groups,
         CAST(sum((s * {qb}) // ng) AS BIGINT) AS aq
  FROM pg
)
SELECT n_groups, CAST(nn AS BIGINT) AS n,
       round((CAST(nn AS DOUBLE) - 1.0) / CAST(nn AS DOUBLE)
             * (CAST(aq AS DOUBLE) / {float(qa * qb)!r}) + 0.0, 6) AS a2_akn
FROM o
"""


def cochran_armitage(
    df: DataFrame, score_col: str, outcome_col: str
) -> DataFrame:
    """One row [k_groups, n, r, ca_z2] — the Cochran–Armitage trend
    test (Cochran 1954; Armitage 1955): is a binary outcome rate
    monotonically associated with an ORDERED integer dose/score? —
    the directional complement of q_chi2's unordered independence
    test (chi² spends its power on any deviation; CA concentrates it
    on the linear trend).

        Z² = N·(N·T − R·P1)² / (R·(N−R)·(N·P2 − P1²))

    with T = Σ sᵢrᵢ, P1 = Σ sᵢnᵢ, P2 = Σ sᵢ²nᵢ over score groups —
    every moment an exact integer (DECIMAL(38,0): the squared
    numerator reaches ~1e26), one final double division + round-6.

    Shape: one map-side-combinable aggregate over (score) groups, one
    1-row reduce — the cheapest test in the family."""
    dec = "decimal(38,0)"
    d = df.select(
        F.col(score_col).cast("long").alias("s"),
        F.col(outcome_col).cast("long").alias("o"),
    )
    g = d.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_i"), F.sum("o").alias("r_i")
    )
    sd = F.col("s").cast(dec)
    a = g.agg(
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum("n_i").cast(dec).alias("nn"),
        F.sum("r_i").cast(dec).alias("rr"),
        F.sum(sd * F.col("r_i").cast(dec)).alias("t"),
        F.sum(sd * F.col("n_i").cast(dec)).alias("p1"),
        F.sum(sd * sd * F.col("n_i").cast(dec)).alias("p2"),
    )
    num = F.col("nn") * F.col("t") - F.col("rr") * F.col("p1")
    den = (
        F.col("rr")
        * (F.col("nn") - F.col("rr"))
        * (F.col("nn") * F.col("p2") - F.col("p1") * F.col("p1"))
    )
    return a.select(
        "k_groups",
        F.col("nn").cast("long").alias("n"),
        F.col("rr").cast("long").alias("r"),
        F.round(
            (F.col("nn") * num * num).cast("double")
            / F.nullif(den.cast("double"), F.lit(0.0)),
            6,
        ).alias("ca_z2"),
    )


def cochran_armitage_sql(table_expr: str, score: str, outcome: str) -> str:
    """DuckDB twin of :func:`cochran_armitage` (HUGEINT moments mirror
    the DECIMAL(38,0) path; identical final expression)."""
    return f"""
WITH d AS (SELECT CAST({score} AS HUGEINT) AS s,
                  CAST({outcome} AS HUGEINT) AS o FROM {table_expr}),
g AS (SELECT s, CAST(count(*) AS HUGEINT) AS n_i, sum(o) AS r_i
      FROM d GROUP BY s),
a AS (
  SELECT CAST(count(*) AS BIGINT) AS k_groups,
         sum(n_i) AS nn, sum(r_i) AS rr,
         sum(s * r_i) AS t, sum(s * n_i) AS p1, sum(s * s * n_i) AS p2
  FROM g
)
SELECT k_groups, CAST(nn AS BIGINT) AS n, CAST(rr AS BIGINT) AS r,
       round(CAST(nn * (nn * t - rr * p1) * (nn * t - rr * p1) AS DOUBLE)
             / nullif(CAST(rr * (nn - rr) * (nn * p2 - p1 * p1) AS DOUBLE),
                      0.0), 6) AS ca_z2
FROM a
"""


def isotonic_fit(
    df: DataFrame,
    group_col: str,
    bin_col: str,
    y_col: str,
) -> DataFrame:
    """[grp, bin, n, fitted] — isotonic (monotone non-decreasing)
    regression of the binary/integer outcome on the ordered ``bin``
    per group, by pool-adjacent-violators — the calibration step
    (Zadrozny & Elkan 2002) that turns a ranking score into monotone
    probabilities, beside q_calibration_bins' fixed-width reliability
    read-out and q_score_percentiles' rank map.

    Exactness: the PAV merge decision compares block means by integer
    CROSS-MULTIPLICATION (s_prev·c_cur ≥ s_cur·c_prev — never FP), so
    the pooled blocks are exact; each fitted value is one double
    division sum/count + round-6.  The oracle never runs PAV: it
    evaluates the minimax characterization

        fitted(i) = max_{j≤i} min_{k≥j} mean(y[j..k])

    over prefix-sum pairs — O(B²) on the dim-sized bin frame — which
    the PAV theorem proves identical, so the two sides are
    independent algorithms agreeing on the same rationals (distinct
    small-denominator fractions stay distinct as doubles, so the SQL
    max/min picks the exact pooled-block value).

    Shape: one (group, bin) partial aggregate — the shuffle carries
    bin-level rows — then one Arrow kernel per group over its ≤ B
    bins; per-task state is the PAV stack, bounded by B."""
    schema = "grp string, bin long, n long, fitted double"

    b = (
        df.select(
            F.col(group_col).cast("string").alias("grp"),
            F.col(bin_col).cast("long").alias("bin"),
            F.col(y_col).cast("long").alias("y"),
        )
        .groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("y").alias("s"))
    )

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bin")
        # PAV stack of blocks [start_idx, count, ysum]
        blocks: list[list[int]] = []
        for c, s in zip(pdf["c"], pdf["s"]):
            blocks.append([1, int(c), int(s)])
            while (
                len(blocks) >= 2
                and blocks[-2][2] * blocks[-1][1]
                >= blocks[-1][2] * blocks[-2][1]
            ):
                b2 = blocks.pop()
                blocks[-1][0] += b2[0]
                blocks[-1][1] += b2[1]
                blocks[-1][2] += b2[2]
        fitted = []
        for nb, cb, sb in blocks:
            # half-up at 6 dp (floor(x*1e6 + 0.5) house convention —
            # Python round() is half-even and diverges on exact ties)
            f = int(sb / cb * 1e6 + 0.5) / 1e6
            fitted += [f] * nb
        return pd.DataFrame(
            {
                "grp": pdf["grp"].iloc[0],
                "bin": pdf["bin"].to_numpy(),
                "n": pdf["c"].to_numpy(),
                "fitted": fitted,
            }
        )

    return b.groupBy("grp").applyInPandas(_kernel, schema=schema)


def isotonic_oracle_sql(table_expr: str, grp: str, bin_: str, y: str) -> str:
    """DuckDB twin of :func:`isotonic_fit` via the minimax formula
    (max-over-j≤i of min-over-k≥j of the interval mean) — an
    independent characterization, not a PAV transliteration."""
    return f"""
WITH raw AS (SELECT {grp} AS grp, {bin_} AS bin, {y} AS y
             FROM {table_expr}),
b AS (SELECT grp, bin, CAST(count(*) AS BIGINT) AS c,
             CAST(sum(y) AS BIGINT) AS s
      FROM raw GROUP BY grp, bin),
p AS (SELECT grp, bin, c, s,
             CAST(sum(c) OVER w AS BIGINT) AS cc,
             CAST(sum(s) OVER w AS BIGINT) AS ss
      FROM b WINDOW w AS (PARTITION BY grp ORDER BY bin
                          ROWS UNBOUNDED PRECEDING)),
iv AS (
  SELECT j.grp, j.bin AS jb, k.bin AS kb,
         CAST(k.ss - j.ss + j.s AS DOUBLE)
           / CAST(k.cc - j.cc + j.c AS DOUBLE) AS m
  FROM p j JOIN p k ON k.grp = j.grp AND k.bin >= j.bin
),
mj AS (SELECT grp, jb, min(m) AS mn FROM iv GROUP BY grp, jb),
fit AS (
  SELECT p.grp, p.bin, p.c,
         max(mj.mn) OVER (PARTITION BY p.grp ORDER BY p.bin
                          ROWS UNBOUNDED PRECEDING) AS f
  FROM p JOIN mj ON mj.grp = p.grp AND mj.jb = p.bin
)
SELECT grp, bin, c AS n,
       floor(f * 1000000.0 + 0.5) / 1000000.0 AS fitted
FROM fit
"""


def mutual_information(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """One row [n, mi_nats, h_a, h_b, nmi] — mutual information
    between two categorical columns plus both marginal entropies and
    the min-normalized NMI ∈ [0, 1]: "how much does knowing the
    source tell you about the language?" — the information-theoretic
    complement of q_chi2's significance test and q_js_divergence's
    pairwise distribution distance.

    Exactness: every p·ln(·) term is 1e-9-quantized with the
    outlink-entropy convention (floor(x·1e9 + 0.5) on the identical
    IEEE expression in both engines) and summed as exact integers, so
    FP order can never move the rounded totals; NMI is one ratio of
    two quantized longs.  Joint terms with negative pointwise MI
    quantize the same way (floor(x + 0.5) is half-up for negatives
    too).

    Shape: one (a, b) partial aggregate, margins via windows over the
    dim-sized joint frame (never a join-back), two scalar entropy
    aggregates broadcast into the final 1-row select."""
    d = df.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    ab = d.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
    w = (
        ab.withColumn("na", F.sum("c").over(Window.partitionBy("a")))
        .withColumn("nb", F.sum("c").over(Window.partitionBy("b")))
        .withColumn("nn", F.sum("c").over(Window.partitionBy()))
    )
    cd = F.col("c").cast("double")
    nad, nbd, nnd = (F.col(x).cast("double") for x in ("na", "nb", "nn"))
    mi_term = (cd / nnd) * F.log((cd * nnd) / (nad * nbd))
    joint = w.agg(
        F.max("nn").cast("long").alias("n"),
        F.sum(F.floor(mi_term * 1e9 + F.lit(0.5)).cast("long")).alias("miq"),
    )

    def _marg(col: str):
        m = w.groupBy(col).agg(F.max("nn").alias("nn"),
                               F.max("n" + col).alias("nm"))
        pm = F.col("nm").cast("double") / F.col("nn").cast("double")
        return m.agg(
            F.sum(F.floor(pm * F.log(pm) * 1e9 + F.lit(0.5)).cast("long"))
            .alias("hq_" + col)
        )

    out = joint.crossJoin(F.broadcast(_marg("a"))).crossJoin(
        F.broadcast(_marg("b"))
    )
    # Ship the quantized totals UNROUNDED (k/1e9 and a ratio of two
    # exact longs are the identical IEEE result in both engines;
    # round-6 of a 9-dp value can land on …5 where Spark's decimal
    # HALF_UP and DuckDB's binary rounding split — the mmr_rerank
    # lesson).  + 0.0 flushes the -0.0 that -(0/1e9) would produce.
    mi = F.col("miq").cast("double") / F.lit(1e9)
    ha = -(F.col("hq_a").cast("double") / F.lit(1e9))
    hb = -(F.col("hq_b").cast("double") / F.lit(1e9))
    return out.select(
        "n",
        (mi + F.lit(0.0)).alias("mi_nats"),
        (ha + F.lit(0.0)).alias("h_a"),
        (hb + F.lit(0.0)).alias("h_b"),
        (
            F.col("miq").cast("double")
            # hq sums are ≤ 0, so min entropy = −max(hq_a, hq_b)
            / F.nullif(
                -F.greatest("hq_a", "hq_b").cast("double"), F.lit(0.0)
            )
            + F.lit(0.0)
        ).alias("nmi"),
    )


def mcnemar_paired(
    df: DataFrame, truth_col: str, a_col: str, b_col: str
) -> DataFrame:
    """One row [n, n_discordant, b, c, mcnemar, mcnemar_cc] — McNemar's
    paired test on the SAME documents for two classifiers against one
    truth label: b = A right where B is wrong, c = the reverse; the
    statistic (b−c)²/(b+c) (and Edwards' continuity-corrected
    (|b−c|−1)²/(b+c), clamped at 0) asks whether the two disagree
    asymmetrically — the right test when both classifiers score the
    same rows, where the unpaired q_chi2 wastes the pairing.

    Exactness: b and c are exact int64 counts; both statistics are one
    integer-numerator / integer-denominator double division, shipped
    unrounded (identical IEEE op in both engines).  Zero discordant
    pairs → NULL statistics."""
    flags = df.select(
        (F.col(a_col) == F.col(truth_col)).cast("int").alias("ra"),
        (F.col(b_col) == F.col(truth_col)).cast("int").alias("rb"),
    )
    s = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(((F.col("ra") == 1) & (F.col("rb") == 0)).cast("long"))
        .cast("long").alias("b"),
        F.sum(((F.col("ra") == 0) & (F.col("rb") == 1)).cast("long"))
        .cast("long").alias("c"),
    )
    bc = F.col("b") + F.col("c")
    diff = F.col("b") - F.col("c")
    absm1 = F.greatest(F.abs(diff) - 1, F.lit(0).cast("long"))
    return s.select(
        "n",
        bc.alias("n_discordant"),
        "b",
        "c",
        ((diff * diff).cast("double")
         / F.nullif(bc.cast("double"), F.lit(0.0))).alias("mcnemar"),
        ((absm1 * absm1).cast("double")
         / F.nullif(bc.cast("double"), F.lit(0.0))).alias("mcnemar_cc"),
    )


def matthews_corr(df: DataFrame, truth_col: str, pred_col: str) -> DataFrame:
    """One row [n, n_correct, mcc] — multi-class Matthews correlation
    (Gorodkin's R_K) of a classifier against truth labels:
    MCC = (c·s − Σ_k p_k·t_k) / sqrt((s² − Σ_k p_k²)(s² − Σ_k t_k²))
    over the per-class predicted counts p_k and true counts t_k — the
    single balanced-accuracy number that stays honest under skewed
    label mixes where accuracy and even F1 flatter the majority class.

    Exactness: c, s, p_k, t_k and all three Σ terms are exact int64;
    the two engines evaluate one identical IEEE chain — an int64→double
    cast, two multiplies, one sqrt (correctly rounded by IEEE-754 in
    both JVMs and DuckDB), one division — shipped unrounded.  A
    degenerate margin (all rows one class on either side) → NULL."""
    j = df.select(
        F.col(truth_col).alias("t"), F.col(pred_col).alias("p")
    )
    tot = j.agg(
        F.count(F.lit(1)).cast("long").alias("s"),
        F.sum((F.col("t") == F.col("p")).cast("long")).cast("long")
        .alias("c"),
    )
    pk = j.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    tk = j.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    cross = (
        pk.select(F.col("p").alias("cls"), F.col("cnt").alias("pcnt"))
        .join(
            tk.select(F.col("t").alias("cls"), F.col("cnt").alias("tcnt")),
            "cls",
            "full_outer",
        )
        .agg(
            F.coalesce(
                F.sum(F.coalesce("pcnt", F.lit(0))
                      * F.coalesce("tcnt", F.lit(0))), F.lit(0)
            ).cast("long").alias("spt"),
            F.coalesce(F.sum(F.coalesce("pcnt", F.lit(0))
                             * F.coalesce("pcnt", F.lit(0))), F.lit(0))
            .cast("long").alias("spp"),
            F.coalesce(F.sum(F.coalesce("tcnt", F.lit(0))
                             * F.coalesce("tcnt", F.lit(0))), F.lit(0))
            .cast("long").alias("stt"),
        )
    )
    num = (F.col("c") * F.col("s") - F.col("spt")).cast("double")
    den = F.sqrt(
        (F.col("s") * F.col("s") - F.col("spp")).cast("double")
        * (F.col("s") * F.col("s") - F.col("stt")).cast("double")
    )
    return tot.crossJoin(F.broadcast(cross)).select(
        F.col("s").alias("n"),
        F.col("c").alias("n_correct"),
        (num / F.nullif(den, F.lit(0.0))).alias("mcc"),
    )


def friedman_test(
    df: DataFrame, block_col: str, treat_col: str, y_col: str
) -> DataFrame:
    """One row [n_blocks, k_treatments, friedman_q, kendall_w] —
    Friedman's rank test for k related treatments over n blocks (the
    repeated-measures ANOVA-by-ranks: "do event types differ in daily
    volume once each day serves as its own control?").  Ranks within a
    block use midrank ties; the plain (uncorrected) statistic is
    Q = 12/(n·k·(k+1)) · Σ_j R_j² − 3·n·(k+1), and Kendall's W =
    Q / (n·(k−1)) is the matching effect size.

    Exactness: doubled midranks r2 = 2·rank_min + ties − 1 are exact
    integers (rank_min = RANK(), ties = a same-value count over the
    block), Σ_j (Σ_b r2)² is an exact int64 (= 4·Σ R_j²), and both
    engines finish with one identical IEEE chain
    3·(S4/ (n·k·(k+1))) − 3·n·(k+1), shipped unrounded.  k ≤ 1 or
    n = 0 → NULL.

    Scale: one shuffle on block (in-block windows are k-row), one
    treatment-keyed aggregation (dim-sized), one scalar assembly."""
    g = df.select(
        F.col(block_col).alias("b"),
        F.col(treat_col).alias("t"),
        F.col(y_col).alias("y"),
    )
    wb = Window.partitionBy("b").orderBy("y")
    we = Window.partitionBy("b", "y")
    r = g.select(
        "b", "t",
        (2 * F.rank().over(wb) + F.count(F.lit(1)).over(we) - 1)
        .cast("long").alias("r2"),
    )
    per_t = r.groupBy("t").agg(F.sum("r2").cast("long").alias("rsum2"))
    s = per_t.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("rsum2") * F.col("rsum2")).cast("long").alias("s4"),
    )
    nb = g.select("b").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    j = s.crossJoin(F.broadcast(nb))
    q = (
        F.lit(3.0) * (F.col("s4").cast("double")
                      / (F.col("n") * F.col("k") * (F.col("k") + 1))
                      .cast("double"))
        - (3 * F.col("n") * (F.col("k") + 1)).cast("double")
    )
    return j.select(
        F.col("n").alias("n_blocks"),
        F.col("k").alias("k_treatments"),
        F.when((F.col("k") <= 1) | (F.col("n") == 0),
               F.lit(None).cast("double")).otherwise(q)
        .alias("friedman_q"),
        F.when((F.col("k") <= 1) | (F.col("n") == 0),
               F.lit(None).cast("double"))
        .otherwise(q / (F.col("n") * (F.col("k") - 1)).cast("double"))
        .alias("kendall_w"),
    )


def fleiss_kappa(df: DataFrame, item_col: str, rating_cols: list) -> DataFrame:
    """One row [n_items, n_raters, p_bar, p_e, fleiss_kappa] — Fleiss'
    κ agreement among r ≥ 2 raters assigning categories to the same
    items (here: independent classifiers labelling the same documents)
    — the multi-rater generalisation of q_cohens_kappa's two-rater
    chance correction.

    P_i = (Σ_j n_ij² − r)/(r(r−1)) per item, P̄ its mean, and
    P̄_e = Σ_j (Σ_i n_ij)²/(N·r)²; κ = (P̄ − P̄_e)/(1 − P̄_e).

    Exactness: Σ_i Σ_j n_ij² and the category column sums are exact
    int64 (n_ij built by unpivoting the rating columns and counting),
    so both engines evaluate one identical IEEE chain —
    P̄ = (S2 − N·r)/(N·r·(r−1)), P̄_e = C2/((N·r)·(N·r)) — shipped
    unrounded; perfect chance agreement (P̄_e = 1) → NULL."""
    r = len(rating_cols)
    stacked = None
    for c in rating_cols:
        part = df.select(F.col(item_col).alias("i"),
                         F.col(c).cast("string").alias("cat"))
        stacked = part if stacked is None else stacked.unionByName(part)
    nij = stacked.groupBy("i", "cat").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    s2 = nij.agg(
        F.sum(F.col("n") * F.col("n")).cast("long").alias("s2"),
        F.countDistinct("i").cast("long").alias("n_items"),
    )
    c2 = (
        nij.groupBy("cat")
        .agg(F.sum("n").cast("long").alias("cj"))
        .agg(F.sum(F.col("cj") * F.col("cj")).cast("long").alias("c2"))
    )
    j = s2.crossJoin(F.broadcast(c2))
    nr = (F.col("n_items") * r).cast("double")
    p_bar = (F.col("s2") - F.col("n_items") * r).cast("double") / (
        (F.col("n_items") * r * (r - 1)).cast("double")
    )
    p_e = F.col("c2").cast("double") / (nr * nr)
    return j.select(
        "n_items",
        F.lit(r).cast("long").alias("n_raters"),
        p_bar.alias("p_bar"),
        p_e.alias("p_e"),
        F.when(p_e == 1.0, F.lit(None).cast("double"))
        .otherwise((p_bar - p_e) / (F.lit(1.0) - p_e))
        .alias("fleiss_kappa"),
    )


def wasserstein_1d(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """[source, n_g, n_total, w1_scaled, w1] — exact 1-D earth-mover
    (Wasserstein-1) distance between EACH group's distribution of an
    INTEGER value column and the whole corpus's: W1 = ∫|F_g − F_all| dv,
    evaluated on the value-domain grid as
    Σ_i |cum_g(v_i)·N − cum_all(v_i)·n_g| · (v_{i+1} − v_i), kept as an
    exact int64 numerator (``w1_scaled``); the single division by
    n_g·N happens once at the end and ships unrounded (identical IEEE
    both engines).  The transport-cost companion to
    :func:`ks_two_sample` (sup metric) and JS divergence (content): KS
    sees only the worst point, W1 integrates the whole shift.  Scale
    shape: one corpus-sized groupBy to (group, v) counts, then every
    window runs over the value-DOMAIN-sized grid (bounded by the
    measurement range, not the corpus), with the group×grid cross join
    a dim×dim broadcast."""
    counts = df.groupBy(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    grid = (
        counts.groupBy("v")
        .agg(F.sum("c").cast("long").alias("c_all"))
        .select(
            "v", "c_all",
            F.sum("c_all").over(
                Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
            ).alias("cum_all"),
            (F.lead("v").over(Window.orderBy("v")) - F.col("v"))
            .cast("long").alias("gap"),
            F.sum("c_all").over(Window.partitionBy()).alias("n_total"),
        )
    )
    groups = counts.groupBy("g").agg(F.sum("c").cast("long").alias("n_g"))
    full = F.broadcast(groups).crossJoin(grid.drop("c_all")).join(
        counts, ["g", "v"], "left"
    ).withColumn("c", F.coalesce("c", F.lit(0)))
    cum_g = F.sum("c").over(
        Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    term = (
        F.abs(cum_g * F.col("n_total") - F.col("cum_all") * F.col("n_g"))
        * F.coalesce("gap", F.lit(0))
    )
    return (
        full.withColumn("_t", term)
        .groupBy(F.col("g").alias("source"), "n_g", "n_total")
        .agg(F.sum("_t").cast("long").alias("w1_scaled"))
        .select(
            "source", "n_g", "n_total", "w1_scaled",
            (
                F.col("w1_scaled").cast("double")
                / (F.col("n_g") * F.col("n_total")).cast("double")
            ).alias("w1"),
        )
    )


def wasserstein_1d_sql(table: str, group_col: str, value_col: str) -> str:
    """DuckDB twin of :func:`wasserstein_1d` (same grid, same exact
    int64 numerator, same single division)."""
    return f"""
WITH cnt AS (
  SELECT {group_col} AS g, CAST({value_col} AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM {table} GROUP BY 1, 2
),
grid AS (
  SELECT v, CAST(sum(c) AS BIGINT) AS c_all FROM cnt GROUP BY v
),
grid2 AS (
  SELECT v,
         CAST(sum(c_all) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_all,
         CAST(lead(v) OVER (ORDER BY v) - v AS BIGINT) AS gap,
         CAST(sum(c_all) OVER () AS BIGINT) AS n_total
  FROM grid
),
gs AS (
  SELECT g, CAST(sum(c) AS BIGINT) AS n_g FROM cnt GROUP BY g
),
full_grid AS (
  SELECT gs.g, gs.n_g, grid2.v, grid2.cum_all, grid2.gap, grid2.n_total,
         CAST(coalesce(cnt.c, 0) AS BIGINT) AS c
  FROM gs CROSS JOIN grid2
  LEFT JOIN cnt ON cnt.g = gs.g AND cnt.v = grid2.v
),
cum AS (
  SELECT g, n_g, n_total,
         abs(CAST(sum(c) OVER (PARTITION BY g ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             * n_total - cum_all * n_g) * coalesce(gap, 0) AS t
  FROM full_grid
)
SELECT g AS source, n_g, n_total,
       CAST(sum(t) AS BIGINT) AS w1_scaled,
       CAST(CAST(sum(t) AS BIGINT) AS DOUBLE)
         / CAST(n_g * n_total AS DOUBLE) AS w1
FROM cum GROUP BY g, n_g, n_total
"""


def jarque_bera(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """[source, n, s1, s2, s3, s4, skewness, kurtosis_excess, jb] —
    Jarque–Bera normality test per group over an INTEGER value column:
    the four raw power sums are exact int64 (one map-side-combinable
    aggregation), and the single IEEE chain that assembles the central
    moments (mu = S1/n; m_k via the raw-moment expansion), skewness
    m3/(m2·√m2), excess kurtosis m4/m2² − 3 and
    JB = n/6·(skew² + kurt_ex²/4) is written identically in both
    engines and shipped UNROUNDED (round-N of a shared double is the
    only portability hazard; identical doubles hash identically).
    Completes the distribution-shape family beside q_ks_test /
    q_anderson_darling (vs another sample) — JB tests each group
    against normality itself."""
    v = F.col(value_col).cast("long")
    agg = df.groupBy(F.col(group_col).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).cast("long").alias("s1"),
        F.sum(v * v).cast("long").alias("s2"),
        F.sum(v * v * v).cast("long").alias("s3"),
        F.sum(v * v * v * v).cast("long").alias("s4"),
    )
    nd = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    s3 = F.col("s3").cast("double")
    s4 = F.col("s4").cast("double")
    mu = s1 / nd
    m2 = s2 / nd - mu * mu
    m3 = s3 / nd - F.lit(3.0) * mu * (s2 / nd) + F.lit(2.0) * mu * mu * mu
    m4 = (
        s4 / nd
        - F.lit(4.0) * mu * (s3 / nd)
        + F.lit(6.0) * (mu * mu) * (s2 / nd)
        - F.lit(3.0) * (mu * mu) * (mu * mu)
    )
    skew = m3 / (m2 * F.sqrt(m2))
    kurt_ex = m4 / (m2 * m2) - F.lit(3.0)
    jb = nd / F.lit(6.0) * (skew * skew + kurt_ex * kurt_ex / F.lit(4.0))
    return agg.select(
        "source", "n", "s1", "s2", "s3", "s4",
        skew.alias("skewness"),
        kurt_ex.alias("kurtosis_excess"),
        jb.alias("jb"),
    )


def jarque_bera_sql(table: str, group_col: str, value_col: str) -> str:
    """DuckDB twin of :func:`jarque_bera` — identical IEEE chain over
    the same four exact int64 power sums."""
    return f"""
WITH s AS (
  SELECT {group_col} AS source,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS BIGINT) AS s1,
         CAST(sum(v*v) AS BIGINT) AS s2,
         CAST(sum(v*v*v) AS BIGINT) AS s3,
         CAST(sum(v*v*v*v) AS BIGINT) AS s4
  FROM (SELECT {group_col}, CAST({value_col} AS BIGINT) AS v FROM {table})
  GROUP BY 1
),
m AS (
  SELECT source, n, s1, s2, s3, s4,
         CAST(n AS DOUBLE) AS nd,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu
  FROM s
),
c AS (
  SELECT source, n, s1, s2, s3, s4, nd, mu,
         CAST(s2 AS DOUBLE) / nd - mu * mu AS m2,
         CAST(s3 AS DOUBLE) / nd - 3.0 * mu * (CAST(s2 AS DOUBLE) / nd)
           + 2.0 * mu * mu * mu AS m3,
         CAST(s4 AS DOUBLE) / nd - 4.0 * mu * (CAST(s3 AS DOUBLE) / nd)
           + 6.0 * (mu * mu) * (CAST(s2 AS DOUBLE) / nd)
           - 3.0 * (mu * mu) * (mu * mu) AS m4
  FROM m
),
k AS (
  SELECT source, n, s1, s2, s3, s4, nd,
         m3 / (m2 * sqrt(m2)) AS skewness,
         m4 / (m2 * m2) - 3.0 AS kurtosis_excess
  FROM c
)
SELECT source, n, s1, s2, s3, s4, skewness, kurtosis_excess,
       nd / 6.0 * (skewness * skewness
                   + kurtosis_excess * kurtosis_excess / 4.0) AS jb
FROM k
"""


def krippendorff_alpha(
    df: DataFrame, item_col: str, rating_cols: list
) -> DataFrame:
    """[n_items, n_raters, d_o, d_e, alpha] — Krippendorff's alpha
    (nominal metric, no missing ratings) over R rating columns: the
    reliability coefficient that differs from Fleiss' κ in its chance
    model — expected disagreement is drawn WITHOUT replacement from the
    pooled ratings, making alpha the small-sample-honest choice.

    With n_ij the unit×category counts, r raters, N units, n = N·r,
    S2 = Σ n_ij², C2 = Σ_j n_j² (the same two exact int64 sums Fleiss
    uses):  D_o = (N·r² − S2)/(N·r·(r−1)),
    D_e = (n² − C2)/(n·(n−1)),  alpha = 1 − D_o/D_e.  One identical
    IEEE chain per engine, shipped unrounded; D_e = 0 (single observed
    category) → NULL."""
    r = len(rating_cols)
    stacked = None
    for c in rating_cols:
        part = df.select(F.col(item_col).alias("i"),
                         F.col(c).cast("string").alias("cat"))
        stacked = part if stacked is None else stacked.unionByName(part)
    nij = stacked.groupBy("i", "cat").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    s2 = nij.agg(
        F.sum(F.col("n") * F.col("n")).cast("long").alias("s2"),
        F.countDistinct("i").cast("long").alias("n_items"),
    )
    c2 = (
        nij.groupBy("cat")
        .agg(F.sum("n").cast("long").alias("cj"))
        .agg(F.sum(F.col("cj") * F.col("cj")).cast("long").alias("c2"))
    )
    j = s2.crossJoin(F.broadcast(c2))
    big_n = F.col("n_items") * r
    d_o = (F.col("n_items") * (r * r) - F.col("s2")).cast("double") / (
        (F.col("n_items") * (r * (r - 1))).cast("double")
    )
    d_e = (big_n * big_n - F.col("c2")).cast("double") / (
        (big_n * (big_n - 1)).cast("double")
    )
    return j.select(
        "n_items",
        F.lit(r).cast("long").alias("n_raters"),
        d_o.alias("d_o"),
        d_e.alias("d_e"),
        F.when(d_e == 0.0, F.lit(None).cast("double"))
        .otherwise(F.lit(1.0) - d_o / d_e)
        .alias("alpha"),
    )


def conformal_interval(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bucket_col: str = "bkt",
    alpha_num: int = 1,
    alpha_den: int = 10,
) -> DataFrame:
    """[n_train, n_cal, n_test, slope, intercept, q_hat, n_covered,
    coverage] — split-conformal prediction interval around a simple
    OLS fit: train on buckets ≥ 5000, take the
    ⌈(n_cal+1)(1−α)⌉-th smallest absolute residual on the calibration
    buckets [0, 2500) as the interval half-width q̂, and report the
    EMPIRICAL coverage of pred ± q̂ on the held-out test buckets
    [2500, 5000).  Split-conformal's finite-sample guarantee
    (coverage ≥ 1−α on exchangeable data, Vovk et al.) is the modern
    uncertainty layer the calibration family (q_calibration_bins /
    q_ece / q_isotonic) lacks — those recalibrate probabilities, this
    wraps point predictions in a distribution-free interval.

    Exactness: OLS comes from five exact int64 sums (integer-numerator
    Cramer form); residuals quantize to 1e-6 micro-units BEFORE the
    order statistic (a value-histogram cumulative window, never a
    single-task sort) and before the coverage comparison, which is
    then pure integer.  The rank k = ⌈(n_cal+1)(1−α)⌉ is computed by
    integer ceiling-division.  Shape: one aggregation per split, one
    value-domain window."""
    b = F.col(bucket_col)
    d = df.select(
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
        b.alias("bkt"),
    )
    tr = d.filter(F.col("bkt") >= 5000).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    params = tr.select(
        F.col("n").alias("n_train"),
        slope.alias("slope"), intercept.alias("intercept"),
    )
    rq = F.floor(
        F.abs(
            F.col("y").cast("double")
            - (F.col("intercept") + F.col("slope") * F.col("x").cast("double"))
        ) * F.lit(1000000.0) + F.lit(0.5)
    ).cast("long")
    cal = (
        d.filter(F.col("bkt") < 2500)
        .crossJoin(F.broadcast(params))
        .select(rq.alias("rq"))
    )
    ncal = cal.agg(F.count(F.lit(1)).cast("long").alias("n_cal"))
    counts = cal.groupBy("rq").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wcum = Window.orderBy("rq").rowsBetween(Window.unboundedPreceding, 0)
    k = (
        ((F.col("n_cal") + 1) * (alpha_den - alpha_num) + alpha_den - 1)
        / alpha_den
    ).cast("long")
    qhat = (
        counts.select("rq", F.sum("c").over(wcum).alias("cum"))
        .crossJoin(F.broadcast(ncal))
        .filter(F.col("cum") >= k)
        .agg(F.min("rq").alias("qhat_q"), F.max("n_cal").alias("n_cal"))
    )
    test = (
        d.filter((F.col("bkt") >= 2500) & (F.col("bkt") < 5000))
        .crossJoin(F.broadcast(params))
        .select(rq.alias("rq"))
        .crossJoin(F.broadcast(qhat))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(F.when(F.col("rq") <= F.col("qhat_q"), 1).otherwise(0))
            .cast("long").alias("n_covered"),
            F.max("qhat_q").alias("qhat_q"),
            F.max("n_cal").alias("n_cal"),
        )
    )
    return test.crossJoin(F.broadcast(params)).select(
        "n_train", "n_cal", "n_test", "slope", "intercept",
        (F.col("qhat_q").cast("double") / F.lit(1000000.0)).alias("q_hat"),
        "n_covered",
        (F.col("n_covered").cast("double") / F.col("n_test").cast("double"))
        .alias("coverage"),
    )
