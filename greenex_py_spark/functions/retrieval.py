"""Sparse retrieval scoring over the document corpus.

BM25 (Robertson–Spärck Jones / Okapi, the Lucene `k1`/`b`
parameterization with the non-negative `ln(1 + …)` idf) against a fixed
query term set — the classic signal a training-data pipeline uses for
topical filtering ("keep documents that look like math/code/medical")
and the judge-friendly baseline every retrieval stack starts from.

Scale shape: the exploded token stream is filtered to the QUERY TERMS
map-side before any shuffle (a handful of terms — the filter prunes
~100% of the stream at the scan), so the tf aggregation shuffles a
few-terms × docs sliver, never the corpus.  The per-term document
frequencies and the corpus scalars (N, avgdl) are tiny dimension rows
joined by AQE-broadcast.  Everything is codegen; no Python.

Determinism contract: per-(doc, term) contributions are rounded to 6 dp
and summed as exact micro-ints, so the per-doc score cannot depend on
FP summation order — the same trick `domain_stats` uses for its means
(CLAUDE.md: round before anything an FP reorder could flip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """[id, score] — BM25 of each document against ``query_terms``
    (documents matching no term are absent; the caller treats missing
    as 0, mirroring `decontaminate`'s flag-don't-drop contract).

    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf(t) = ln(1 + (N−df+0.5)/(df+0.5)) — Lucene's BM25 flavor.
    """
    t = df.select(
        F.col(id_col).alias("_id"), F.split(F.col(text_col), " ").alias("_toks")
    )
    dl = t.select("_id", F.size("_toks").alias("dl"))
    scalars = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("tot_dl")
    )  # 1 row — broadcast by construction
    toks = t.select(
        "_id", F.explode("_toks").alias("term")
    ).filter(F.col("term").isin(*query_terms))
    tf = toks.groupBy("_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))  # ≤ |query| rows
    joined = (
        tf.join(dl, "_id")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(scalars))
    )
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    avgdl = F.col("tot_dl") / F.col("n_docs")
    contrib = idf * (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    )
    # micro-int per-term contributions -> order-independent integer sum
    micro = F.round(contrib * 1000000.0).cast("long")
    return (
        joined.select("_id", micro.alias("_c"))
        .groupBy("_id")
        .agg(F.round(F.sum("_c") / 1000000.0, 6).alias("score"))
        .withColumnRenamed("_id", id_col)
    )


def bm25_oracle_sql(
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
) -> str:
    """The identical BM25 arithmetic as DuckDB SQL (shared-formula
    convention: generated next to the operator so the two cannot
    drift)."""
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM {table}),
dl AS (SELECT doc_id, len(tk) AS dl FROM t),
sc AS (SELECT count(*) AS n_docs, sum(dl) AS tot_dl FROM dl),
tok AS (
  SELECT doc_id, unnest(tk) AS term FROM t
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ({terms}) GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
j AS (
  SELECT tf.doc_id,
         CAST(round(
           ln(1.0 + (sc.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf * ({k1} + 1.0)
              / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl
                                 / (sc.tot_dl / CAST(sc.n_docs AS DOUBLE)))))
           * 1000000.0) AS BIGINT) AS c
  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN sc
)
SELECT doc_id, round(sum(c) / 1000000.0, 6) AS score
FROM j GROUP BY doc_id
"""


def build_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cap: int = 15,
) -> DataFrame:
    """[term, df, tf_total, posting] — inverted-index build, the
    index-side complement of :func:`bm25_scores`: document frequency,
    total term frequency, and a capped posting list (first ``cap``
    doc ids ascending, comma-joined — the impact-ordered-prefix shape
    real indexes store per block).

    Shape: explode → (term, doc) partial counts (map-side combinable),
    one window + regroup BOTH keyed by term so the second exchange is
    elided (the window's partitioning satisfies the groupBy), and the
    posting cap bounds per-term reducer state — a hot term costs
    O(cap) memory, not O(corpus).
    """
    from pyspark.sql import Window

    toks = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).filter(F.col("term") != "")
    pairs = toks.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))
    w = Window.partitionBy("term").orderBy(F.col(id_col))
    ranked = pairs.withColumn("_rk", F.row_number().over(w))
    return ranked.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("tf_total"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("_rk") <= cap, F.col(id_col))
                    )
                ),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("posting"),
    )


def tfidf_query_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """[id, score] — plain tf·idf query scoring (idf = ln((N+1)/(df+1)),
    no length normalization): the zero-parameter baseline BM25 is
    usually compared against.  Same sliver-shaped plan as
    :func:`bm25_scores` (map-side term filter, dim-sized df table,
    micro-int contribution sums)."""
    t = df.select(
        F.col(id_col).alias("_id"), F.split(F.col(text_col), " ").alias("_toks")
    )
    scalars = t.agg(F.count("*").alias("n_docs"))
    toks = t.select("_id", F.explode("_toks").alias("term")).filter(
        F.col("term").isin(*query_terms)
    )
    tf = toks.groupBy("_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    joined = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(scalars))
    idf = F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
    micro = F.round(F.col("tf") * idf * 1000000.0).cast("long")
    return (
        joined.select("_id", micro.alias("_c"))
        .groupBy("_id")
        .agg(F.round(F.sum("_c") / 1000000.0, 6).alias("score"))
        .withColumnRenamed("_id", id_col)
    )


def tfidf_oracle_sql(query_terms: list[str], table: str = "documents") -> str:
    """DuckDB twin of :func:`tfidf_query_scores` (shared-formula
    convention)."""
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM {table}),
sc AS (SELECT count(*) AS n_docs FROM t),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(tk) AS term FROM t)
  WHERE term IN ({terms}) GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
j AS (
  SELECT tf.doc_id,
         CAST(round(tf.tf * ln((sc.n_docs + 1.0) / (dfreq.df + 1.0))
                    * 1000000.0) AS BIGINT) AS c
  FROM tf JOIN dfreq USING (term) CROSS JOIN sc
)
SELECT doc_id, round(sum(c) / 1000000.0, 6) AS score
FROM j GROUP BY doc_id
"""


def rbo_weights(k: int, p: float) -> list[tuple[int, float]]:
    """[(d, (1−p)·p^(d−1))] computed ONCE on the driver — both engines
    consume the same double literals, so no per-row pow() portability
    risk exists anywhere in the RBO chain."""
    return [(d, (1.0 - p) * p ** (d - 1)) for d in range(1, k + 1)]


def rbo_overlap(
    rank_a: DataFrame,
    rank_b: DataFrame,
    k: int = 20,
    p: float = 0.9,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """[d, x_d, rbo] — truncated rank-biased overlap (Webber, Moffat &
    Zobel 2010) between two top-k rankings: X_d = |A_{1..d} ∩ B_{1..d}|
    and RBO@k = (1−p)·Σ_d p^(d−1)·X_d/d, the top-weighted agreement
    measure for comparing two retrieval/quality orderings.

    Determinism: both inputs carry 6-dp-rounded scores, ranks break
    ties by id, the geometric weights are driver-computed literals, and
    the weighted sum is an exact integer sum of 1e-9-quantized terms —
    engine-portable end to end.  Everything after the two top-k windows
    is dim-sized (≤ k rows)."""
    from pyspark.sql import Window

    spark = rank_a.sparkSession

    def topk(df, out):
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        return (
            df.withColumn(out, F.row_number().over(w))
            .filter(F.col(out) <= k)
            .select(id_col, out)
        )

    j = topk(rank_a, "ra").join(topk(rank_b, "rb"), id_col)
    entries = j.select(F.greatest("ra", "rb").alias("entry"))
    depths = spark.createDataFrame(rbo_weights(k, p), "d int, wd double")
    x = (
        depths.join(F.broadcast(entries), F.col("entry") <= F.col("d"), "left")
        .groupBy("d", "wd")
        .agg(F.count("entry").alias("x_d"))
    )
    term = F.floor(
        F.col("wd") * F.col("x_d").cast("double") / F.col("d").cast("double")
        * 1e9 + 0.5
    ).cast("long")
    w_all = Window.partitionBy()
    return (
        x.withColumn("_t", term)
        .withColumn("rbo", F.sum("_t").over(w_all) / 1e9)
        .select(F.col("d").cast("long").alias("d"), "x_d", "rbo")
    )


def rrf_fusion(
    rank_a: DataFrame,
    rank_b: DataFrame,
    k: int = 20,
    c: int = 60,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """[doc_id, rank_a, rank_b, rrf_score, fused_rank] — reciprocal
    rank fusion (Cormack et al. 2009) of two top-k rankings:
    RRF(d) = Σ_lists 1/(c + rank(d)), missing-from-list contributes 0
    — the standard score-free combiner a retrieval stage uses to merge
    BM25 with a second scorer (here tf·idf) without calibrating their
    score scales.

    Determinism: input scores are 6-dp-rounded upstream and ranks
    break ties by id (the rbo_overlap convention); each RRF score is
    the SAME two-term double expression in both engines (1/(c+ra) +
    1/(c+rb), fixed order, no Σ reordering — only two lists), so the
    fused ordering is engine-portable with ties broken by id.
    Everything after the two top-k windows is ≤ 2k rows."""
    from pyspark.sql import Window

    def topk(df, out):
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        return (
            df.withColumn(out, F.row_number().over(w))
            .filter(F.col(out) <= k)
            .select(F.col(id_col).alias(f"_{out}_id"), out)
        )

    a = topk(rank_a, "ra")
    b = topk(rank_b, "rb")
    j = a.join(b, a["_ra_id"] == b["_rb_id"], "full_outer").select(
        F.coalesce(F.col("_ra_id"), F.col("_rb_id")).alias(id_col),
        F.col("ra").cast("long").alias("rank_a"),
        F.col("rb").cast("long").alias("rank_b"),
        (
            F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("ra")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("rb")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return j.withColumn(
        "fused_rank", F.row_number().over(w).cast("long")
    )


# --- NDCG@k ranking quality -------------------------------------------------

import math as _math

#: integer micro-weights for ranks 1..20: round(1e6 / log2(r+1)).  Shared
#: literals between the Spark expression and the DuckDB oracle so the
#: discount arithmetic is identical int64 on both sides (the rbo_overlap
#: driver-literal-weights convention).
NDCG_WEIGHTS_MICRO = [round(1_000_000 / _math.log2(r + 1)) for r in range(1, 21)]


def graded_relevance(id_col: str = "doc_id", n_grades: int = 4):
    """Deterministic 0..n_grades-1 relevance grade from md5(id) — the
    fixture-side stand-in for editorial judgments (portable: DuckDB
    reproduces it with CAST('0x'||substr(md5(id),1,8) AS UBIGINT) % n)."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("long"),
        F.lit(n_grades),
    )


def ndcg_at_k(
    scored: DataFrame,
    k: int = 10,
    group_col: str = "source",
    id_col: str = "doc_id",
    score_col: str = "score",
    n_grades: int = 4,
) -> DataFrame:
    """[group, dcg_micro, idcg_micro, ndcg] — NDCG@k of a scored ranking
    against md5-derived graded relevance, one row per group slice.

    DCG = Σ_{r<=k} (2^grade − 1) · w_r with w_r the integer micro-weight
    literals above, so both DCG and the ideal DCG are exact int64 sums
    (FP enters only at the final single division).  Ranking ties break
    by id; the ideal ranking orders by (grade DESC, id) — both total
    orders, so engine-portable.

    Scale shape: one shuffle on the group key, two window sorts over the
    same partitioning, one partial-aggregated groupBy — the scored
    input is already the sliver of the corpus that matched the query.
    """
    if k > len(NDCG_WEIGHTS_MICRO):
        raise ValueError(f"k={k} exceeds the {len(NDCG_WEIGHTS_MICRO)} pinned weights")
    warr = F.array(*[F.lit(w) for w in NDCG_WEIGHTS_MICRO[:k]])
    base = scored.select(
        F.col(group_col), F.col(id_col), F.col(score_col)
    ).withColumn("_g", graded_relevance(id_col, n_grades))
    wr = Window.partitionBy(group_col).orderBy(F.col(score_col).desc(), F.col(id_col))
    wi = Window.partitionBy(group_col).orderBy(F.col("_g").desc(), F.col(id_col))
    gain = (F.expr("shiftleft(1L, cast(_g AS int))") - 1).cast("long")
    r = (
        base.withColumn("_rr", F.row_number().over(wr))
        .withColumn("_ri", F.row_number().over(wi))
        .withColumn("_gain", gain)
    )
    agg = r.groupBy(group_col).agg(
        F.sum(
            F.when(F.col("_rr") <= k, F.col("_gain") * F.element_at(warr, F.col("_rr")))
            .otherwise(F.lit(0))
        ).cast("long").alias("dcg_micro"),
        F.sum(
            F.when(F.col("_ri") <= k, F.col("_gain") * F.element_at(warr, F.col("_ri")))
            .otherwise(F.lit(0))
        ).cast("long").alias("idcg_micro"),
    )
    return agg.withColumn(
        "ndcg",
        F.round(
            F.col("dcg_micro") / F.nullif(F.col("idcg_micro").cast("double"), F.lit(0.0)), 6
        ),
    )


def ndcg_oracle_sql(
    query_terms: list[str],
    k: int = 10,
    n_grades: int = 4,
    table: str = "documents",
) -> str:
    """The identical NDCG@k arithmetic as DuckDB SQL over the BM25
    oracle (generated beside the operator so the two cannot drift)."""
    bm25 = bm25_oracle_sql(query_terms, table=table)
    wlist = "[" + ", ".join(str(w) for w in NDCG_WEIGHTS_MICRO[:k]) + "]"
    return f"""
WITH scored AS ({bm25}),
s AS (
  SELECT d.source, sc.doc_id, sc.score,
         CAST(CAST('0x' || substr(md5(CAST(sc.doc_id AS VARCHAR)), 1, 8)
              AS UBIGINT) % {n_grades} AS BIGINT) AS g
  FROM scored sc JOIN {table} d USING (doc_id)
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS rr,
         row_number() OVER (PARTITION BY source ORDER BY g DESC, doc_id) AS ri
  FROM s
),
a AS (
  SELECT source,
         sum(CASE WHEN rr <= {k}
             THEN ((CAST(1 AS BIGINT) << CAST(g AS INT)) - 1) * ({wlist})[rr]
             ELSE 0 END) AS dcg_micro,
         sum(CASE WHEN ri <= {k}
             THEN ((CAST(1 AS BIGINT) << CAST(g AS INT)) - 1) * ({wlist})[ri]
             ELSE 0 END) AS idcg_micro
  FROM r GROUP BY source
)
SELECT source, CAST(dcg_micro AS BIGINT) AS dcg_micro,
       CAST(idcg_micro AS BIGINT) AS idcg_micro,
       round(CAST(dcg_micro AS DOUBLE)
             / nullif(CAST(idcg_micro AS DOUBLE), 0.0), 6) AS ndcg
FROM a
"""


ROCCHIO_ALPHA = 1.0
ROCCHIO_BETA = 0.75


def rocchio_rerank(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """[q_id, n_id, sim, rank, was_feedback] — Rocchio pseudo-relevance
    feedback over the embedding corpus: each query's exact cosine
    top-k becomes its feedback set, the expanded query is
    q′ = α·q + β·centroid(feedback) (α=1, β=0.75, the classic
    parameters), and the corpus is re-ranked against q′.
    ``was_feedback`` marks re-ranked hits that were already in the
    original top-k — the drift readout (false = the expansion pulled
    in a genuinely new neighbour).

    Determinism: the feedback centroid is round-6 per dimension (the
    kmeans device — FP summation order can't move it), the expansion
    is one fixed IEEE expression re-rounded to 6 dp, and the re-rank
    reuses :func:`~greenex_py_spark.functions.similarity.cosine_topk`
    (round-6 sims, id tie-break).  Scale shape: feedback join is
    k-rows-per-query sized; the only corpus-wide pass is the final
    BLAS re-rank — same serving shape as cosine_topk itself."""
    from .similarity import cosine_topk

    orig = cosine_topk(queries, corpus, k=k, id_col=id_col, vec_col=vec_col)
    fb = (
        orig.join(
            corpus.select(
                F.col(id_col).alias("n_id"), F.col(vec_col).alias("_v")
            ),
            "n_id",
        )
        .select("q_id", F.posexplode("_v").alias("pos", "val"))
        .groupBy("q_id", "pos")
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("fval"))
    )
    qd = queries.select(
        F.col(id_col).alias("q_id"), F.posexplode(vec_col).alias("pos", "qval")
    )
    qe = (
        qd.join(fb, ["q_id", "pos"])
        .withColumn(
            "eval",
            F.round(
                F.lit(ROCCHIO_ALPHA) * F.col("qval").cast("double")
                + F.lit(ROCCHIO_BETA) * F.col("fval"),
                6,
            ),
        )
        .groupBy("q_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "eval"))),
                lambda s: s["eval"],
            ).alias(vec_col)
        )
        .select(F.col("q_id").alias(id_col), vec_col)
    )
    rer = cosine_topk(qe, corpus, k=k, id_col=id_col, vec_col=vec_col)
    o2 = orig.select("q_id", "n_id", F.lit(True).alias("was_feedback"))
    return rer.join(o2, ["q_id", "n_id"], "left").select(
        "q_id", "n_id", "sim", F.col("rank").cast("long").alias("rank"),
        F.coalesce("was_feedback", F.lit(False)).alias("was_feedback"),
    )


def err_at_k(
    scored: DataFrame,
    k: int = 10,
    group_col: str = "source",
    id_col: str = "doc_id",
    score_col: str = "score",
    n_grades: int = 4,
) -> DataFrame:
    """[group, n_ranked, err] — Expected Reciprocal Rank @k of a scored
    ranking against the md5 graded relevance (Chapelle et al. 2009):
    the CASCADE ranking metric — ERR = Σ_r (1/r)·R_r·Π_{i<r}(1−R_i)
    with stop probability R = (2^grade − 1)/2^max_grade — that, unlike
    NDCG's position discounts, discounts a rank by how likely the user
    already stopped above it.  Completes the ranking-eval family
    (AP/NDCG/MRR/RBO).

    Exactness: each group's top-k gains pivot onto ONE row, the
    survival products P_r = Π(2^max_grade − gain_i) stay exact int64
    (≤ 8⁹), every per-rank term is one fixed double chain quantized
    to 1e-9 before the k-term sum, and missing ranks contribute gain 0
    (R = 0, survival ×2^max_grade — "no document, user reads on").  Shape: one
    shuffle on the group key, one window sort, one pivot row per
    group."""
    gmax = 1 << (n_grades - 1)   # 2^max_grade (Chapelle et al. eq. 4)
    base = scored.select(
        F.col(group_col), F.col(id_col), F.col(score_col)
    ).withColumn("_g", graded_relevance(id_col, n_grades))
    wr = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    gain = (F.expr("shiftleft(1L, cast(_g AS int))") - 1).cast("long")
    r = (
        base.withColumn("_rr", F.row_number().over(wr))
        .filter(F.col("_rr") <= k)
        .withColumn("_gain", gain)
    )
    piv = r.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_ranked"),
        *[
            F.coalesce(
                F.max(F.when(F.col("_rr") == i, F.col("_gain"))), F.lit(0)
            ).cast("long").alias(f"g{i}")
            for i in range(1, k + 1)
        ],
    )
    piv = piv.select("*", F.lit(1).cast("long").alias("p1"))
    for i in range(2, k + 1):
        piv = piv.select(
            "*",
            (F.col(f"p{i-1}") * (F.lit(gmax) - F.col(f"g{i-1}")))
            .cast("long").alias(f"p{i}"),
        )
    terms = []
    for i in range(1, k + 1):
        pow16 = float(gmax ** (i - 1))
        terms.append(
            F.floor(
                (F.col(f"g{i}").cast("double") / F.lit(float(gmax)))
                * (F.col(f"p{i}").cast("double") / F.lit(pow16))
                / F.lit(float(i))
                * F.lit(1000000000.0)
                + F.lit(0.5)
            ).cast("long")
        )
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return piv.select(
        F.col(group_col),
        "n_ranked",
        F.round(
            total.cast("double") / F.lit(1000000000.0) + F.lit(0.0), 6
        ).alias("err"),
    )


def err_oracle_sql(
    query_terms: list[str], k: int = 10, n_grades: int = 4,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`err_at_k` over the BM25 ranking — same
    pivot, same exact survival products, same quantized term chain."""
    gmax = 1 << (n_grades - 1)
    bm25 = bm25_oracle_sql(query_terms, table=table)
    gcols = ",\n         ".join(
        f"CAST(coalesce(max(CASE WHEN rr = {i} THEN gain END), 0) AS BIGINT)"
        f" AS g{i}"
        for i in range(1, k + 1)
    )
    p_defs = ["CAST(1 AS BIGINT) AS p1"]
    for i in range(2, k + 1):
        prod = " * ".join(f"({gmax} - g{j})" for j in range(1, i))
        p_defs.append(f"CAST({prod} AS BIGINT) AS p{i}")
    term_sql = " + ".join(
        f"CAST(floor((CAST(g{i} AS DOUBLE) / {float(gmax)})"
        f" * (CAST(p{i} AS DOUBLE) / {float(gmax ** (i - 1))})"
        f" / {float(i)} * 1000000000.0 + 0.5) AS BIGINT)"
        for i in range(1, k + 1)
    )
    return f"""
WITH sc AS ({bm25}),
g AS (
  SELECT d.source, sc.doc_id, sc.score,
         CAST((1 << (CAST(CAST('0x' || substr(md5(CAST(sc.doc_id AS VARCHAR)), 1, 8)
              AS UBIGINT) % {n_grades} AS INT))) - 1 AS BIGINT) AS gain,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY sc.score DESC, sc.doc_id) AS rr
  FROM sc JOIN {table} d ON d.doc_id = sc.doc_id
),
piv AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_ranked,
         {gcols}
  FROM g WHERE rr <= {k} GROUP BY source
),
pp AS (
  SELECT piv.*, {", ".join(p_defs)} FROM piv
)
SELECT source, n_ranked,
       round(CAST({term_sql} AS DOUBLE) / 1000000000.0 + 0.0, 6) AS err
FROM pp
"""
