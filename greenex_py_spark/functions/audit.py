"""Data-quality audits over numeric columns.

``benford_digits`` — first-significant-digit distribution vs Benford's
law.  Scraped/aggregated numeric feeds (prices, counters, event values
in a crawl corpus) that arise from multiplicative processes follow
P(d) = log10(1 + 1/d); strong deviation flags synthetic, truncated, or
unit-mangled data before it poisons a training mixture — the classic
forensic-accounting screen applied as a pipeline health check.

Exactness: values are quantised to integer units first
(``round(v * scale)``), and the leading digit comes from a FIXED
integer CASE/division chain — no ``log10`` anywhere on the digit path,
because ``floor(log10(10^k))`` is one ULP away from disaster and the
two engines' libm need not agree at exact powers.  Counts are exact;
the expected share is a per-digit ``log10(1 + 1/d)`` evaluated on the
9-row output only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"

__all__ = ["benford_digits", "leading_digit_expr", "LEADING_DIGIT_LEVELS"]

# thresholds for the log-free leading-digit chain: ints < 10^10
LEADING_DIGIT_LEVELS = (
    1_000_000_000,
    100_000_000,
    10_000_000,
    1_000_000,
    100_000,
    10_000,
    1_000,
    100,
    10,
)


def leading_digit_expr(c: Column) -> Column:
    """Leading decimal digit of a positive integer column via a fixed
    CASE chain of integer divisions (no floating point, no log)."""
    out = None
    for lvl in LEADING_DIGIT_LEVELS:
        branch = (c / F.lit(lvl)).cast("long")
        out = F.when(c >= lvl, branch) if out is None else out.when(c >= lvl, branch)
    return out.otherwise(c)


def leading_digit_sql(col: str) -> str:
    """The DuckDB twin of :func:`leading_digit_expr` — rendered from
    the same level table so the two cannot drift."""
    branches = " ".join(
        f"WHEN {col} >= {lvl} THEN {col} // {lvl}" for lvl in LEADING_DIGIT_LEVELS
    )
    return f"(CASE {branches} ELSE {col} END)"


def benford_digits(
    df: DataFrame, value_col: str = "value", scale: float = 100.0
) -> DataFrame:
    """[digit, n, obs_pct, exp_pct, dev_pct] — one row per leading digit
    1..9 of the positive values of ``value_col`` (quantised to
    ``round(v * scale)`` integer units); percentages round-6.

    Shape: one map-side-combinable groupBy(digit) over a scan
    projection — 9 output rows regardless of corpus size; the total for
    the shares is an unpartitioned window over those 9 rows (the
    side-statistics rule).
    """
    from pyspark.sql import Window

    v = F.col(value_col)
    c = F.round(v * F.lit(float(scale))).cast("long")
    per = (
        df.filter(v > 0)
        .select(leading_digit_expr(c).alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy())
    obs = F.col("n").cast("double") / total.cast("double")
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    return per.select(
        "digit",
        "n",
        F.round(obs * F.lit(100.0), 6).alias("obs_pct"),
        F.round(exp * F.lit(100.0), 6).alias("exp_pct"),
        F.round((obs - exp) * F.lit(100.0), 6).alias("dev_pct"),
    )


def auc_mann_whitney(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    bucket_scale: float = 1.0,
) -> DataFrame:
    """One row [n_pos, n_neg, auc] — ROC AUC of ``score_col`` against a
    0/1 ``label_col`` via the Mann-Whitney rank statistic with EXACT
    tie handling: classifier-vs-heuristic agreement checks are a stock
    curation-pipeline evaluation, and ties dominate real quality scores.

        AUC = (R+ - n+(n+ + 1)/2) / (n+ n-)

    where R+ uses AVERAGE ranks for tied scores.  Everything stays
    integer: per score group g with c_g members (p_g positive) below
    which B_g members rank, the doubled rank sum is

        2 R+ = sum_g p_g * (2 B_g + c_g + 1)        (exact)

    so the only FP step is one final division chain, round-6.

    Shape: groupBy(score) then the house TWO-LEVEL rank — per-bucket
    totals cumsum'd over a bucket-count-sized window, bases broadcast
    back, within-bucket window per bucket — no task ever sorts the full
    score domain (``bucket_scale`` controls bucket width).
    """
    from pyspark.sql import Window

    s = F.col(score_col)
    g = df.groupBy(score_col).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(label_col).cast("long")).alias("pos"),
    ).withColumn("_bkt", F.floor(s * F.lit(float(bucket_scale))).cast("long"))
    bt = g.groupBy("_bkt").agg(F.sum("cnt").alias("bc"))
    bw = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    bases = bt.withColumn("base", F.coalesce(F.sum("bc").over(bw), F.lit(0)))
    ww = (
        Window.partitionBy("_bkt")
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    j = (
        g.join(F.broadcast(bases.select("_bkt", "base")), "_bkt")
        .withColumn("cum_in", F.coalesce(F.sum("cnt").over(ww), F.lit(0)))
    )
    contrib = F.col("pos").cast("decimal(38,0)") * (
        F.lit(2) * (F.col("base") + F.col("cum_in")) + F.col("cnt") + F.lit(1)
    )
    t = j.agg(
        F.sum(contrib).alias("r2"),
        F.sum("pos").alias("npos"),
        F.sum("cnt").alias("n"),
    )
    npos = F.col("npos").cast("long")
    nneg = (F.col("n") - F.col("npos")).cast("long")
    u2 = F.col("r2") - F.col("npos").cast("decimal(38,0)") * (F.col("npos") + 1)
    return t.select(
        npos.alias("n_pos"),
        nneg.alias("n_neg"),
        F.round(
            u2.cast("double")
            / F.lit(2.0)
            / npos.cast("double")
            / nneg.cast("double"),
            6,
        ).alias("auc"),
    )


def average_precision(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row [n_pos, n_docs, avg_precision] — area under the
    precision–recall curve of ``score_col`` against a 0/1
    ``label_col``, the rank-eval twin of :func:`auc_mann_whitney`
    (ROC-AUC rewards global ordering; AP weights the head, which is
    what retrieval / curation-threshold choices actually feel):

        AP = (1/P) · Σ_{positives} precision@rank(pos)
           = (1/P) · Σ_j  j / r_j

    under the DETERMINISTIC total order (score DESC, id ASC) — AP is
    order-sensitive under score ties, so the id tie-break is part of
    the operator contract, not a convenience.

    Shape: the overall rank r and the positive-only running count j are
    both house two-phase :func:`~..engine.rank.global_rank` passes (no
    single-task global sort); each term ships as the exact integer
    ``(j · 10^12) div r`` (j ≤ P ≤ 10^6 keeps the product inside
    int64), the sum is an integer, and the final AP is one double
    division — identical IEEE in any engine.
    """
    from ..engine.rank import global_rank

    base = df.select(
        F.col(id_col).alias("_id"),
        (-F.col(score_col).cast("long")).alias("_ns"),
        F.col(label_col).cast("long").alias("_y"),
    )
    ranked = global_rank(base, ["_ns", "_id"], out_col="_r")
    pos = global_rank(
        ranked.filter(F.col("_y") == 1), ["_ns", "_id"], out_col="_j"
    )
    term = F.expr("(_j * 1000000000000L) div _r")
    t = pos.agg(
        F.sum(term).alias("s"), F.count(F.lit(1)).alias("p")
    ).crossJoin(base.agg(F.count(F.lit(1)).alias("n")))
    return t.select(
        F.col("p").cast("long").alias("n_pos"),
        F.col("n").cast("long").alias("n_docs"),
        (
            F.col("s").cast("double")
            / (F.col("p").cast("double") * F.lit(1000000000000.0))
        ).alias("avg_precision"),
    )


def gini_by_group(
    df: DataFrame,
    group_col: str = "source",
    val_col: str = "n_chars",
) -> DataFrame:
    """[group, n, total, gini] — per-group Gini of a non-negative
    integer value (doc-length inequality per domain: the burstiness /
    boilerplate-detection audit — a domain whose length Gini spikes is
    templating or mixing content classes).

    Same exact construction as spatial_stats.gini_exposure, partitioned
    by group: per DISTINCT value a tie block of count c starting at
    rank base contributes c·(2·base + c − n)·v, all DECIMAL(38,0); the
    per-group (n, total) ride along as unpartitioned-within-group
    window sums (no join-back), and the only FP is the final division
    + round-6.  No task ever sorts a full group — only its distinct
    values.
    """
    from pyspark.sql import Window

    c = df.select(
        F.col(group_col).alias("grp"), F.col(val_col).cast("long").alias("v")
    )
    by_v = c.groupBy("grp", "v").agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy("grp")
    cd = F.col("c").cast(_DEC)
    vd = F.col("v").cast(_DEC)
    ranked = by_v.select(
        "grp", "v", "c",
        F.coalesce(F.sum("c").over(wcum), F.lit(0)).alias("base"),
        F.sum("c").over(wall).alias("n"),
        F.sum(cd * vd).over(wall).alias("total"),
    )
    num = ranked.groupBy("grp", "n", "total").agg(
        F.sum(
            cd * (2 * F.col("base").cast(_DEC) + cd - F.col("n").cast(_DEC)) * vd
        ).alias("gnum")
    )
    gini = F.round(
        F.col("gnum").cast("double")
        / F.nullif(
            F.col("n").cast("double") * F.col("total").cast("double"),
            F.lit(0.0),
        )
        + F.lit(0.0),
        6,
    )
    return num.select(
        F.col("grp").alias(group_col),
        F.col("n").cast("long").alias("n"),
        F.col("total").cast("long").alias("total"),
        gini.alias("gini"),
    )


def theil_decomposition(
    df: DataFrame,
    group_col: str = "source",
    val_col: str = "n_chars",
) -> DataFrame:
    """One row [n_docs, t_total, t_within, t_between] — Theil-T
    inequality of a positive integer value with the classic
    between/within-group decomposition (is length inequality a
    between-domain or within-domain phenomenon?):

        T_total   = Σ (x/X) ln(x/μ)
        T_within  = Σ_g Σ_{x∈g} (x/X) ln(x/μ_g)
        T_between = Σ_g (X_g/X) ln(μ_g/μ)     (T_total = within+between)

    Engine exactness: terms are grouped by DISTINCT (group, value) with
    integer counts; every per-term double is rendered from the SAME
    expression tree in both engines and quantized to an integer
    (·1e12, round) BEFORE the sum, so the aggregate is order-free and a
    1-ulp libm ln disagreement moves the sum by ±1e-12 — invisible at
    round-6.  Totals/means ride along as window sums (no join-backs).
    """
    from pyspark.sql import Window

    c = df.select(
        F.col(group_col).alias("g"), F.col(val_col).cast("long").alias("v")
    )
    by = c.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))
    wg = Window.partitionBy("g")
    wall = Window.partitionBy()
    by = (
        by.withColumn("xg", F.sum(F.col("c") * F.col("v")).over(wg))
        .withColumn("ng", F.sum("c").over(wg))
        .withColumn("x", F.sum(F.col("c") * F.col("v")).over(wall))
        .withColumn("n", F.sum("c").over(wall))
    )
    xd = F.col("x").cast("double")
    mu = xd / F.col("n").cast("double")
    mug = F.col("xg").cast("double") / F.col("ng").cast("double")
    share = (F.col("c") * F.col("v")).cast("double") / xd
    q = lambda e: F.round(e * 1.0e12, 0).cast("long")  # noqa: E731
    t = by.agg(
        F.sum(q(share * F.log(F.col("v").cast("double") / mu))).alias("tt"),
        F.sum(q(share * F.log(F.col("v").cast("double") / mug))).alias("tw"),
        F.max("n").alias("n_docs"),
    )
    # between: one term per group, same quantize contract
    gd = by.select("g", "xg", "ng", "x", "n").distinct()
    xgd = F.col("xg").cast("double")
    tb = gd.select(
        q(
            (xgd / F.col("x").cast("double"))
            * F.log(
                (xgd / F.col("ng").cast("double"))
                / (F.col("x").cast("double") / F.col("n").cast("double"))
            )
        ).alias("tb_q")
    ).agg(F.sum("tb_q").alias("tb"))
    dq = lambda cname: F.round(  # noqa: E731
        F.col(cname).cast("double") / 1.0e12 + F.lit(0.0), 6
    )
    return (
        t.crossJoin(tb)
        .select(
            F.col("n_docs").cast("long").alias("n_docs"),
            dq("tt").alias("t_total"),
            dq("tw").alias("t_within"),
            dq("tb").alias("t_between"),
        )
    )


def dq_check(df: DataFrame, violation: Column, name: str) -> DataFrame:
    """[check, n_total, n_violations, pass] — one data-quality
    expectation evaluated over a frame: count rows where ``violation``
    holds (NULL counts as a violation — an unevaluable expectation is a
    failing one).  Compose several with unionByName for a dbt-style
    quality gate; each check is a single map-side-combinable aggregate,
    so a suite over a 100 TB table is one scan per source frame."""
    v = F.when(violation.isNull(), 1).otherwise(
        F.when(violation, 1).otherwise(0)
    )
    return df.agg(
        F.lit(name).alias("check"),
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(v).cast("long").alias("n_violations"),
    ).select(
        "check", "n_total", "n_violations",
        (F.col("n_violations") == 0).alias("pass"),
    )


def bot_cadence(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    min_gaps: int = 4,
) -> DataFrame:
    """[user_id, n_gaps, span_s, cv2, is_bot] — inter-arrival
    regularity screen: per user the coefficient of variation (squared)
    of consecutive event gaps, CV² = n·Σd²/(Σd)² − 1 with d in whole
    seconds (exact µs gap floor-divided — DuckDB's fractional
    epoch() and timestamp ties are both avoided: ordering ties break
    on event_id).  Human browsing is bursty (CV² ≥ 1, exponential-ish);
    scripted clients fire on a timer (CV² → 0) — the classic crawl
    bot/abuse signal next to q_sessionize's gap split.

    Exactness: gaps are exact int64 seconds (epoch floor), Σd
    telescopes to the user's span, and the flag
    ``is_bot`` ⇔ CV² < 1/4 is decided by the pure integer test
    4·(n·Σd² − (Σd)²) < (Σd)² — no FP anywhere near the boundary;
    the reported cv2 double is one identical IEEE chain.  Shape: one
    per-user window pass (lag) + one aggregation; users with fewer
    than ``min_gaps`` gaps are excluded (the estimator is noise
    there)."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    d = (
        events.select(
            user_col,
            (
                us
                - F.unix_micros(F.lag(ts_col).over(w).cast("timestamp"))
            ).alias("d_us"),
        )
        .filter(F.col("d_us").isNotNull())
        .select(
            user_col, F.floor(F.col("d_us") / 1000000).cast("long").alias("d")
        )
    )
    agg = d.groupBy(F.col(user_col).alias("user_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("d").cast("long").alias("span_s"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("sd2"),
    ).filter(F.col("n_gaps") >= min_gaps)
    cv2 = (
        F.col("n_gaps").cast("double") * F.col("sd2").cast("double")
        / (F.col("span_s").cast("double") * F.col("span_s").cast("double"))
        - F.lit(1.0)
    )
    is_bot = (
        4 * (F.col("n_gaps") * F.col("sd2") - F.col("span_s") * F.col("span_s"))
        < F.col("span_s") * F.col("span_s")
    )
    return agg.select(
        "user_id", "n_gaps", "span_s", cv2.alias("cv2"), is_bot.alias("is_bot")
    )
