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

from pyspark.sql import DataFrame
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
