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

from pyspark.sql import DataFrame, Window
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


def _hashed_bigram_buckets(
    df: DataFrame, n_buckets: int, id_col: str, text_col: str
) -> DataFrame:
    """[_id, bkt, cnt] — per-document hashed-bigram bucket counts, the
    DSIR feature map.  Bigrams via the eval-once slice/arrays_zip shape
    (never an interpreted HOF over split()); bucket = 28-bit md5 prefix
    mod n_buckets (the `dedup._shingle_int` portable-hash contract)."""
    t = df.select(
        F.col(id_col).alias("_id"), F.split(F.col(text_col), " ").alias("_toks")
    ).filter(F.size("_toks") >= 2)
    n1 = F.size("_toks") - 1
    bi = (
        t.select(
            "_id",
            F.explode(
                F.arrays_zip(
                    F.slice("_toks", 1, n1).alias("w1"),
                    F.slice("_toks", 2, n1).alias("w2"),
                )
            ).alias("g"),
        )
        .select(
            "_id",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(" ", "g.w1", "g.w2")), 1, 7
                    ),
                    16, 10,
                ).cast("long"),
                F.lit(n_buckets),
            ).alias("bkt"),
        )
    )
    return bi.groupBy("_id", "bkt").agg(F.count("*").alias("cnt"))


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """[id, logweight] — DSIR data-selection importance weights (Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling"): documents are featurized as hashed-bigram bucket
    counts; each document's log importance weight under the
    target-vs-raw bucket unigram models (add-1 smoothed) is

        logw(d) = Σ_b cnt_d[b] · (ln p_target[b] − ln p_raw[b]).

    Selection then keeps the top-weight documents (Gumbel-top-k in the
    paper; the caller composes with `group_sample`/`hash_split`).

    Scale shape: the feature map is one map-side explode + a (doc,
    bucket)-keyed count — state bounded by n_buckets per document.  The
    two distributions are **n_buckets-row dimensions** (64 rows
    regardless of corpus size — unlike the vocabulary-scale LM dims of
    `bigram_logprob`, a forced broadcast here is safe BY CONSTRUCTION,
    the distinction the round-2 verdict drew).  Per-bucket contributions
    are rounded to micro-ints before the per-doc sum, so scores are
    FP-summation-order independent.
    """
    feats = _hashed_bigram_buckets(raw, n_buckets, id_col, text_col)
    tfeats = _hashed_bigram_buckets(target, n_buckets, id_col, text_col)
    # outer-join the two 64-row dims so a bucket absent from one side
    # still smooths to ln(1/(tot+B)) instead of silently dropping
    raw_tot = feats.agg(F.sum("cnt").alias("rtot"))
    tgt_tot = tfeats.agg(F.sum("cnt").alias("ttot"))
    rb = feats.groupBy("bkt").agg(F.sum("cnt").alias("rc"))
    tb = tfeats.groupBy("bkt").agg(F.sum("cnt").alias("tc"))
    dims = (
        rb.join(tb, "bkt", "full")
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .select(
            "bkt",
            (
                F.log(
                    (F.coalesce("tc", F.lit(0)) + 1.0)
                    / (F.col("ttot") + float(n_buckets))
                )
                - F.log(
                    (F.coalesce("rc", F.lit(0)) + 1.0)
                    / (F.col("rtot") + float(n_buckets))
                )
            ).alias("dlp"),
        )
    )
    micro = F.round(F.col("cnt") * F.col("dlp") * 1000000.0).cast("long")
    return (
        feats.join(F.broadcast(dims), "bkt")
        .select("_id", micro.alias("_c"))
        .groupBy("_id")
        .agg(F.round(F.sum("_c") / 1000000.0, 6).alias("logweight"))
        .withColumnRenamed("_id", id_col)
    )


def mix_allocation(
    df: DataFrame,
    targets: dict[str, float],
    budget_tokens: int,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """[domain, n_tokens, target_weight, epochs, sample_rate] — data-
    mixture planning: given target mixture weights per domain and a
    total token budget, how many EPOCHS of each domain's data hit the
    budgeted share (the LLaMA / DoReMi mixture table: epochs > 1 means
    upsample/repeat, < 1 means subsample at ``sample_rate``).
    ``epochs = weight x budget / domain_tokens``, round-6; domains
    absent from ``targets`` get weight 0 (excluded from the mixture but
    still reported with their token mass).

    Shape: one map-side-combined groupBy(domain) over token counts —
    domains ≪ documents, so the result is a broadcastable dimension
    (feed ``sample_rate`` to `stratified_sample` keep rates, epochs to
    the repeat-loader).  The weight map is a literal expression —
    no second input, nothing shuffled but (domain, count) partials.
    """
    per = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("n_tokens")
    )
    wmap = F.create_map(
        *[F.lit(x) for kv in targets.items() for x in (kv[0], float(kv[1]))]
    )
    w = F.coalesce(wmap[F.col("domain")], F.lit(0.0))
    epochs = F.round(w * F.lit(float(budget_tokens)) / F.col("n_tokens"), 6)
    return per.select(
        "domain",
        "n_tokens",
        w.alias("target_weight"),
        epochs.alias("epochs"),
        F.least(F.lit(1.0), epochs).alias("sample_rate"),
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_width: int = 4096,
) -> DataFrame:
    """[doc_id, n_tok, tok_start, seq_first, seq_last, n_seqs] — the
    concat-and-chunk packing map every LLM pretraining loader needs:
    docs are tokenized (whitespace tokens + 1 EOS each), concatenated in
    doc_id order into one global token stream, and sliced into fixed
    ``seq_len`` training sequences.  The output tells each document
    exactly where it lands: its global token offset and the first/last
    sequence indices it contributes to (``n_seqs`` > 1 means the doc
    straddles a sequence boundary).

    The global token offset is an exclusive prefix sum over doc_id
    order — computed WITHOUT a single-partition global window, which
    would funnel the whole corpus through one task at 100 TB.  Instead a
    two-level scan: (1) doc_ids are range-bucketed
    (``floor(id / bucket_width)``), (2) per-bucket token totals — a tiny
    table, one row per bucket — get an exclusive cumsum in a one-
    partition window that only ever sees #buckets rows, (3) the bucket
    bases broadcast-join back and an intra-bucket window (partitioned by
    bucket → parallelism = #buckets) adds the within-bucket offset.
    Shuffle traffic is one hash partition of (id, n_tok) pairs — no
    text moves.
    """
    ntok = (F.size(F.split(F.col(text_col), " ")) + F.lit(1)).cast("long")
    base = df.select(
        F.col(id_col).alias("_id"),
        ntok.alias("n_tok"),
        F.floor(F.col(id_col) / F.lit(bucket_width)).alias("_bkt"),
    )
    bw = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        base.groupBy("_bkt")
        .agg(F.sum("n_tok").alias("_tot"))
        .select(
            "_bkt",
            F.coalesce(F.sum("_tot").over(bw), F.lit(0)).alias("_base"),
        )
    )
    iw = (
        Window.partitionBy("_bkt")
        .orderBy("_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.col("_base") + F.coalesce(F.sum("n_tok").over(iw), F.lit(0))
    first = F.floor(F.col("tok_start") / F.lit(seq_len))
    last = F.floor((F.col("tok_start") + F.col("n_tok") - 1) / F.lit(seq_len))
    return (
        base.join(F.broadcast(bases), "_bkt")
        .withColumn("tok_start", start)
        .select(
            F.col("_id").alias(id_col),
            "n_tok",
            "tok_start",
            first.alias("seq_first"),
            last.alias("seq_last"),
            (last - first + F.lit(1)).alias("n_seqs"),
        )
    )


def shard_shuffle(
    df: DataFrame, n_shards: int, id_col: str = "doc_id"
) -> DataFrame:
    """[doc_id, shard, pos] — deterministic global shuffle for a
    training loader: every document gets a reproducible pseudo-random
    position (shard file + offset) derived ONLY from its id, so the
    exact example order of a run can be replayed byte-for-byte (no RNG
    state, no partition-count dependence).  ``shard`` is an md5 bucket
    of the id, ``pos`` the rank of the md5 digest within the shard
    (digest ties impossible below md5 collisions; id breaks them
    anyway).

    Shape: one hash shuffle of (id, digest) pairs and a window
    PARTITIONED BY shard — parallelism = n_shards, each task ranks
    ~corpus/n_shards rows; pick n_shards ≍ output files at scale (a
    global ORDER BY would sort the whole corpus through a range
    exchange for the same answer).
    """
    key = F.md5(F.col(id_col).cast("string"))
    shard = (
        F.conv(F.substring(key, 1, 7), 16, 10).cast("long") % n_shards
    ).alias("shard")
    w = Window.partitionBy("shard").orderBy("_key", id_col)
    return (
        df.select(F.col(id_col), key.alias("_key"), shard)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos")
    )


def repeat_plan(
    df: DataFrame,
    targets: dict[str, float],
    budget_tokens: int,
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """[doc_id, domain, epochs, n_copies] — the loader-side realization
    of `mix_allocation`: every document's exact repeat count under the
    mixture.  A domain with epochs = e contributes floor(e) full copies
    of every doc plus one extra copy for the deterministic hash-sampled
    frac(e) of docs (same md5 bucket contract as `hash_split`, so WHICH
    docs get the extra epoch is stable across runs/engines/scales).
    Feeding `pack_sequences`/`shard_shuffle` downstream, the repeat
    explode is `explode(sequence(1, n_copies))` — still no RNG.

    The fractional threshold is TRUNCATED (not rounded) from the
    round-6 epochs: both engines truncate the bit-identical double, so
    no half-tie can flip a bucket (the q_classifier_score lesson).

    Shape: the allocation is a per-domain dim (broadcast by
    construction); everything else is codegen over the scan.
    """
    alloc = mix_allocation(df, targets, budget_tokens, domain_col, text_col)
    full = F.floor(F.col("epochs")).cast("long")
    thr = (
        ((F.col("epochs") - F.floor(F.col("epochs"))) * 10000)
        .cast("long")
    )
    extra = F.when(_bucket(id_col) < thr, 1).otherwise(0)
    return (
        df.select(F.col(id_col), F.col(domain_col).alias("domain"))
        .join(F.broadcast(alloc.select("domain", "epochs")), "domain")
        .select(
            id_col,
            "domain",
            "epochs",
            (full + extra).alias("n_copies"),
        )
    )


def score_percentiles(
    df: DataFrame,
    score_col: str,
    group_cols: list[str],
    id_col: str = "doc_id",
    n_buckets: int = 1000,
) -> DataFrame:
    """[*group_cols, doc_id, score, pct_rank] — per-group percentile
    calibration of a score column (CCNet normalizes its LM quality
    per LANGUAGE before bucketing precisely because raw score scales
    aren't comparable across languages).  ``pct_rank`` is exactly SQL's
    ``percent_rank() OVER (PARTITION BY group ORDER BY score, id)``:
    the id tiebreak makes every rank unique, so the result is
    engine-exact ((rank-1)/(n-1), 0 for singleton groups).

    Scale shape — the naive window partitions by GROUP, funnelling each
    group (a whole language!) through one task.  Instead the
    pack_sequences two-level scan keyed by (group, score histogram
    bucket): per-bucket counts cumsum'd in a window that only sees
    ≤ n_buckets rows per group, bases broadcast back, final ranking
    window partitioned by (group, bucket) — parallelism = groups x
    buckets, each task sorts one bucket's sliver.
    """
    g = list(group_cols)
    b = F.floor(F.col(score_col) * n_buckets).cast("long")
    base = df.select(
        *g, F.col(id_col), F.col(score_col).alias("score"), b.alias("_b")
    )
    hw = (
        Window.partitionBy(*g)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = (
        base.groupBy(*g, "_b")
        .agg(F.count("*").alias("_c"))
        .select(
            *g, "_b", F.coalesce(F.sum("_c").over(hw), F.lit(0)).alias("_base")
        )
    )
    totals = base.groupBy(*g).agg(F.count("*").alias("_n"))
    iw = Window.partitionBy(*g, "_b").orderBy("score", id_col)
    rank = F.col("_base") + F.row_number().over(iw)
    pct = F.when(
        F.col("_n") > 1, (rank - 1) / (F.col("_n") - 1).cast("double")
    ).otherwise(F.lit(0.0))
    return (
        base.join(F.broadcast(bases), [*g, "_b"])
        .join(F.broadcast(totals), g)
        .select(*g, id_col, "score", pct.alias("pct_rank"))
    )


def domain_cap(
    df: DataFrame,
    cap: int,
    score_col: str,
    domain_col: str = "source",
    id_col: str = "doc_id",
    n_salts: int = 8,
) -> DataFrame:
    """[doc_id, domain, score, rank] — keep at most ``cap`` documents
    per domain, the best by (score desc, id asc): the FineWeb-style
    per-domain cap that stops one SEO farm from dominating the corpus.

    Exact two-phase top-k (the `zipf_slope` shape): rows are salted
    into n_salts sub-partitions per domain, each takes its local cap in
    a window, and only those n_salts x cap survivors meet the final
    per-domain window.  The global top-cap is always a subset of the
    per-salt winners' union, so no task ever sorts a whole domain —
    a 1e8-document domain costs each task a cap-sized heap, not a
    domain-sized sort.  The id tiebreak makes the cut boundary
    engine-deterministic under round-3 score collisions.
    """
    base = df.select(
        F.col(id_col),
        F.col(domain_col).alias("domain"),
        F.col(score_col).alias("score"),
    )
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))
    w1 = Window.partitionBy("domain", "_salt").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    cand = (
        base.withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= cap)
        .drop("_salt", "_rn")
    )
    w2 = Window.partitionBy("domain").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= cap)
        .select(id_col, "domain", "score", "rank")
    )


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.3,
    budget_factor: float = 0.5,
    group_col: str = "lang",
    quant: float = 1e6,
) -> DataFrame:
    """[group, n_docs, mix_weight, sample_rate] — temperature-based
    mixture weights p_g = n_g^alpha / sum(n_g^alpha), the standard
    multilingual rebalancing (mBERT/XLM-R exponential smoothing,
    alpha ~ 0.3 upsamples tail languages) — the OBSERVED-counts
    complement of `mix_allocation`'s explicit target table.

    ``sample_rate`` realizes the mixture against a document budget of
    ``floor(total * budget_factor)``: rate_g = min(1, p_g * budget /
    n_g), round-6 — feed it to `stratified_sample` keep rates.

    Exactness: each group's temperature term is quantised to
    ``round(n^alpha * quant)`` BIGINT so the normalising denominator is
    an exact integer sum (order-free); p_g is then one double division.
    ``pow`` itself is evaluated once per GROUP (a dim of languages, not
    the corpus), with both engines' float pow agreeing on integer bases
    well below the quantisation step.

    Shape: one map-side-combined groupBy(group) count; the temperature
    normalisation runs over the group DIM (unpartitioned window over
    languages — bounded by language count, the side-statistics rule),
    never over documents.
    """
    per = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tq = F.round(
        F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
        * F.lit(float(quant))
    ).cast("long")
    w = Window.partitionBy()
    stats = per.withColumn("_tq", tq).withColumn(
        "_tsum", F.sum("_tq").over(w)
    ).withColumn("_total", F.sum("n_docs").over(w))
    p = F.col("_tq").cast("double") / F.col("_tsum").cast("double")
    budget = F.floor(F.col("_total").cast("double") * F.lit(float(budget_factor)))
    rate = F.least(F.lit(1.0), p * budget.cast("double") / F.col("n_docs"))
    return stats.select(
        F.col("grp").alias(group_col),
        "n_docs",
        F.round(p, 6).alias("mix_weight"),
        F.round(rate, 6).alias("sample_rate"),
    )


def apportion_budget(
    df: DataFrame,
    key_col: str = "source",
    count_col: str = "n_docs",
    budget: int = 1000,
) -> DataFrame:
    """[key, n, quota] — largest-remainder (Hamilton) apportionment of
    an integer crawl/sampling budget across keys proportional to their
    counts: base_i = floor(B·n_i / N), then the B − Σbase leftover
    units go to the largest remainders (B·n_i mod N, ties by key asc).
    Exactly sums to B, all integer arithmetic — the quota plan a
    recrawl scheduler or per-domain sampler executes.

    Shape: the input is already an aggregated per-key table (a dim next
    to the corpus), so the unpartitioned windows (total N, leftover
    rank) run over key-count rows, not documents.
    """
    from pyspark.sql import Window

    c = df.select(
        F.col(key_col).alias("k"), F.col(count_col).cast("long").alias("n")
    )
    wall = Window.partitionBy()
    wrank = Window.orderBy(F.col("rem").desc(), F.col("k").asc())
    b = F.lit(int(budget))
    t = c.withColumn("tot", F.sum("n").over(wall))
    # `div` is true INTEGER division on BIGINT (a double `/` + cast can
    # be off by one at near-integer quotients)
    t = t.withColumn(
        "base", F.expr(f"(CAST({int(budget)} AS BIGINT) * n) div tot")
    ).withColumn("rem", (b * F.col("n")) % F.col("tot"))
    t = t.withColumn("left", b - F.sum("base").over(wall)) \
         .withColumn("rk", F.row_number().over(wrank))
    quota = F.col("base") + F.when(F.col("rk") <= F.col("left"), 1).otherwise(0)
    return t.select(
        F.col("k").alias(key_col),
        F.col("n").alias("n"),
        quota.cast("long").alias("quota"),
    )


def balanced_spatial_sample(
    points: DataFrame,
    id_col: str = "doc_id",
    gx_col: str = "gx",
    gy_col: str = "gy",
    every: int = 10,
    order: int = 7,
    bucket_shift: int = 6,
) -> DataFrame:
    """[id, hkey, pos] — systematic spatially balanced sample (the
    GRTS idea): points ordered along the Hilbert curve, every
    ``every``-th taken.  Because the curve never jumps, consecutive
    sample positions are spatially spread — a uniform id-hash sample
    can clump in dense cells, this one cannot.

    The global position uses the house TWO-LEVEL rank (bucket =
    hkey >> bucket_shift; per-bucket counts cumsum'd over the
    bucket-count-sized window, within-bucket row_number) so no task
    ever sorts the full corpus.  Ties (same cell) break by id — a
    total order both engines share.  All integer arithmetic.
    """
    from pyspark.sql import Window
    from ..engine.layout import with_hilbert_key

    keyed = with_hilbert_key(
        points.select(
            F.col(id_col), F.col(gx_col).alias("gx"), F.col(gy_col).alias("gy")
        ),
        order=order,
    ).select(id_col, "hkey")
    b = keyed.withColumn("_bkt", F.shiftright(F.col("hkey"), bucket_shift))
    bt = b.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_bc"))
    wb = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    bases = bt.withColumn("_base", F.coalesce(F.sum("_bc").over(wb), F.lit(0)))
    ww = Window.partitionBy("_bkt").orderBy(
        F.col("hkey").asc(), F.col(id_col).asc()
    )
    pos = F.col("_base") + F.row_number().over(ww) - 1
    return (
        b.join(F.broadcast(bases.select("_bkt", "_base")), "_bkt")
        .withColumn("pos", pos.cast("long"))
        .filter(F.col("pos") % every == 0)
        .select(id_col, "hkey", "pos")
    )


def weighted_systematic_sample(
    df,
    weight_col: str,
    m: int,
    order_cols: list[str],
) -> "DataFrame":
    """[*df.columns, cum, n_hits] — weighted systematic (PPS) sampling
    (Madow 1949): lay every row's weight as an interval along the
    ``order_cols`` total order and keep rows whose interval contains a
    selection point ``p_j = (2j+1)·T/(2m)`` (the m mid-placed points).
    Inclusion probability ∝ weight; rows heavier than the skip T/m can
    be hit multiple times (``n_hits`` is the PPS multiplicity).

    Exactness: the prefix sum is the two-phase distributed cumsum
    (engine/rank.py — no single-task window) and point membership is a
    pure integer-rational comparison ``(2j+1)·T < 2·m·v`` evaluated via
    guarded integer division, so there is NO floating point anywhere —
    both engines agree exactly, any corpus size, any weight skew."""
    from pyspark.sql import functions as F

    from ..engine.rank import global_cumsum

    cum = global_cumsum(df, order_cols, weight_col, out_col="cum")
    total = cum.agg(F.sum(F.col(weight_col)).alias("_t"))
    x = cum.crossJoin(F.broadcast(total))

    def npts(v):
        # points p_j < v, j in [0, m):  c = floor((2mv - T - 1)/(2T)) + 1
        raw = F.expr(f"(2 * {m} * ({v}) - _t - 1) div (2 * _t) + 1")
        return F.least(
            F.lit(m).cast("long"),
            F.when(2 * m * F.col(v) > F.col("_t"), raw).otherwise(F.lit(0)),
        )

    x = x.withColumn("_cwp", F.col("cum") - F.col(weight_col))
    hits = npts("cum") - npts("_cwp")
    return (
        x.withColumn("n_hits", hits.cast("long"))
        .filter(F.col("n_hits") > 0)
        .drop("_t", "_cwp")
    )


def neyman_allocation(
    df: DataFrame,
    key_col: str = "source",
    value_col: str = "n_chars",
    budget: int = 10_000,
) -> DataFrame:
    """[key, n, wq, quota] — Neyman-optimal stratified sample
    allocation: stratum h receives budget ∝ N_h·σ_h (minimum-variance
    allocation for a fixed total sample, Neyman 1934) — the
    survey-statistics upgrade of :func:`apportion_budget`'s
    proportional split when strata differ in spread (a volatile source
    deserves more probe samples than a uniform one).

    N_h·σ_h = √(n_h·Σx² − S_h²) exactly (population σ), quantized
    ×1000 to the int64 weight ``wq`` on one IEEE sqrt; the integer
    largest-remainder (Hamilton) rule then apportions ``budget`` over
    the weights — exact sum, ties by key ascending.

    Shape: one per-stratum aggregate over the corpus; everything after
    runs on the strata dim."""
    from pyspark.sql import Window

    s = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(value_col).cast("long")).cast("long").alias("sx"),
        F.sum(F.col(value_col).cast("long") * F.col(value_col).cast("long"))
        .cast("long").alias("sxx"),
    )
    w = s.select(
        "k", "n",
        F.floor(
            F.sqrt((F.col("n") * F.col("sxx")
                    - F.col("sx") * F.col("sx")).cast("double"))
            * 1000.0 + F.lit(0.5)
        ).cast("long").alias("wq"),
    )
    wall = Window.partitionBy()
    wrank = Window.orderBy(F.col("rem").desc(), F.col("k").asc())
    b = F.lit(int(budget))
    t = (
        w.withColumn("tot", F.sum("wq").over(wall))
        .withColumn("base", F.expr(f"(CAST({int(budget)} AS BIGINT) * wq)"
                                   " div tot"))
        .withColumn("rem", (b * F.col("wq")) % F.col("tot"))
    )
    t = t.withColumn("left", b - F.sum("base").over(wall)) \
         .withColumn("rk", F.row_number().over(wrank))
    quota = F.col("base") + F.when(F.col("rk") <= F.col("left"), 1) \
        .otherwise(0)
    return t.select(
        F.col("k").alias(key_col), "n", "wq",
        quota.cast("long").alias("quota"),
    )


def capture_recapture(
    df: DataFrame,
    id_col: str = "doc_id",
    pct1: int = 40,
    pct2: int = 30,
) -> DataFrame:
    """One row [n1, n2, m_both, n_hat, true_n] — Lincoln–Petersen /
    Chapman capture-recapture estimate of corpus size from two
    independent deterministic hash "captures": how crawl-coverage
    estimation infers the size of the unseen web from the overlap of
    two crawl snapshots.  Capture i = md5('capI|' || id) mod 100 <
    pct_i (independent salts); Chapman's less-biased estimator
    N̂ = (n1+1)(n2+1)/(m+1) − 1 is exact-int assembled with one double
    division, and the true corpus size rides along so the gate also
    checks the estimator's accuracy contract."""
    def cap(salt: str):
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + "|"),
                                       F.col(id_col).cast("string"))),
                        1, 15),
            16, 10,
        ).cast("long") % 100
        return h

    t = df.select(
        (cap("cap1") < pct1).cast("int").alias("c1"),
        (cap("cap2") < pct2).cast("int").alias("c2"),
    )
    s = t.agg(
        F.count(F.lit(1)).cast("long").alias("true_n"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
        F.sum(F.col("c1") * F.col("c2")).cast("long").alias("m_both"),
    )
    nhat = (
        ((F.col("n1") + 1) * (F.col("n2") + 1)).cast("double")
        / (F.col("m_both") + 1).cast("double")
        - F.lit(1.0)
    )
    return s.select("n1", "n2", "m_both", nhat.alias("n_hat"), "true_n")
