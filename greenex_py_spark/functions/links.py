"""Outlink extraction and host-level link-graph construction.

The web-graph side of a crawl pipeline: anchors pulled straight out of
the raw page bytes (the ``html: binary`` column of the crawl table),
resolved to destination hosts, and aggregated to a (src_host, dst_host,
n_links) edge list — the input PageRank / harmonic-centrality / spam
ranking consume (cf. Common Crawl's host-level webgraph releases).

Everything is pure codegen: ``regexp_extract_all`` → ``explode`` → a
CASE resolution chain → two-phase hash aggregate.  No UDFs, so the
whole path stays inside WholeStageCodegen, the explode is map-side, and
the only shuffle is the partial/final agg on (src_host, dst_host) —
hot hosts (every page links to facebook.com) are absorbed by map-side
combine, never by a skewed join.

Reference parity note: GreenEx_Py has no web-graph stage (its inputs
are already geocoded points); this module is part of the
beyond-reference training-data-pipeline surface the build plan adds.
All regexes are RE2-safe so the DuckDB oracle can mirror them
literally.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "HREF_PATTERN", "ANCHOR_PATTERN", "LANG_PATH_PATTERN",
    "extract_outlinks", "host_link_graph", "anchor_text_profile",
    "bitext_candidates",
]

# anchor hrefs out of raw markup: lazy scan to the first href attribute
# of each <a ...> tag; double-quoted values only (the planted corpus and
# the oracle share this contract — single-quoted attrs are a documented
# non-goal of the regex tier, a DOM parser kernel would replace it)
HREF_PATTERN = r'(?i)<a\s[^>]*?href\s*=\s*"([^"]*)"'

# host of an absolute URL (no userinfo/port in the crawl fixture;
# both engines render this same pattern)
_ABS_HOST = r"^https?://([^/]+)"
_DROP = r"(?i)^(#|mailto:|javascript:)"


def extract_outlinks(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """[src_host, dst_host] — one row per anchor in the page bytes.

    Resolution rules (lowercased hosts):
      * ``http://`` / ``https://``  → host of the absolute URL
      * ``//host/...`` (protocol-relative) → that host
      * fragment-only / ``mailto:`` / ``javascript:`` / empty → dropped
      * anything else (root- or page-relative path) → the page's own host
    """
    page = F.decode(F.col(html_col), "UTF-8")
    src = F.lower(F.regexp_extract(F.col(url_col), _ABS_HOST, 1))
    e = df.select(
        src.alias("src_host"),
        F.explode(F.regexp_extract_all(page, F.lit(HREF_PATTERN), F.lit(1))).alias(
            "href"
        ),
    )
    h = F.col("href")
    dst = (
        F.when(h.rlike("(?i)" + _ABS_HOST), F.lower(F.regexp_extract(h, "(?i)" + _ABS_HOST, 1)))
        .when(h.startswith("//"), F.lower(F.regexp_extract(h, r"^//([^/]+)", 1)))
        .otherwise(F.col("src_host"))
    )
    return (
        e.filter(~((h == "") | h.rlike(_DROP)))
        .select("src_host", dst.alias("dst_host"))
    )


def host_link_graph(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """[src_host, dst_host, n_links] — the host-level link graph
    (anchor multiplicity kept; self-loops kept — rank algorithms decide
    their own self-loop policy downstream)."""
    return (
        extract_outlinks(df, url_col=url_col, html_col=html_col)
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


# closed anchors with their visible text: group 1 = href, group 2 =
# the text run up to the first child tag (nested markup inside <a> is a
# documented non-goal of the regex tier, same contract as HREF_PATTERN)
ANCHOR_PATTERN = r'(?i)<a\s[^>]*?href\s*=\s*"([^"]*)"[^>]*>([^<]*)</a>'


def anchor_text_profile(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """[dst_host, n_anchors, n_texts, top_anchor, top_n] — the
    anchor-text index per destination host (the strongest relevance
    signal search/quality pipelines mine from a crawl: what OTHER
    pages call this host).

    One regex run twice for its two capture groups, zipped
    positionally (identical pattern → identical match list, so the
    arrays always align), href-resolution rules shared with
    ``extract_outlinks``; then a two-phase count on
    (dst_host, anchor) and a window argmax — ties broken by anchor
    text ascending so the result is deterministic.  Pure codegen until
    the final window; anchor-text cardinality per host is crawl-bounded
    (map-side combine absorbs hot hosts before the shuffle).
    """
    page = F.decode(F.col(html_col), "UTF-8")
    src = F.lower(F.regexp_extract(F.col(url_col), _ABS_HOST, 1))
    pat = F.lit(ANCHOR_PATTERN)
    e = df.select(
        src.alias("src_host"),
        F.explode(
            F.arrays_zip(
                F.regexp_extract_all(page, pat, F.lit(1)).alias("href"),
                F.regexp_extract_all(page, pat, F.lit(2)).alias("anchor"),
            )
        ).alias("p"),
    ).select(
        "src_host",
        F.col("p.href").alias("href"),
        F.col("p.anchor").alias("anchor"),
    )
    h = F.col("href")
    dst = (
        F.when(
            h.rlike("(?i)" + _ABS_HOST),
            F.lower(F.regexp_extract(h, "(?i)" + _ABS_HOST, 1)),
        )
        .when(h.startswith("//"), F.lower(F.regexp_extract(h, r"^//([^/]+)", 1)))
        .otherwise(F.col("src_host"))
    )
    c = (
        e.filter(~((h == "") | h.rlike(_DROP)))
        .select(dst.alias("dst_host"), "anchor")
        .groupBy("dst_host", "anchor")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("dst_host")
    ranked = c.select(
        "dst_host", "anchor", "cnt",
        F.row_number()
        .over(w.orderBy(F.col("cnt").desc(), F.col("anchor").asc()))
        .alias("rn"),
        F.sum("cnt").over(w).alias("n_anchors"),
        F.count(F.lit(1)).over(w).alias("n_texts"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "dst_host",
        F.col("n_anchors").cast("long").alias("n_anchors"),
        F.col("n_texts").cast("long").alias("n_texts"),
        F.col("anchor").alias("top_anchor"),
        F.col("cnt").cast("long").alias("top_n"),
    )


LANG_PATH_PATTERN = r"^https?://([^/]+)/([a-z]{2})/(.*)$"


def bitext_candidates(
    pages: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    lang_a: str = "en",
    lang_b: str = "fr",
) -> DataFrame:
    """[host, path, id_a, id_b] — bitext mining by URL structure (the
    WMT/ParaCrawl first pass): pages whose URLs differ ONLY in the
    /{lang}/ path segment are translation candidates.  One regexp
    splits (host, lang, tail); the two language slices equi-join on
    (host, tail) — a key join, never a similarity scan; downstream
    alignment (sentence-level) consumes these pairs.

    Duplicate URLs per (host, lang, tail) are collapsed to the min id
    so the join stays 1:1 and deterministic.
    """
    m = pages.select(
        F.col(id_col),
        F.regexp_extract(F.col(url_col), LANG_PATH_PATTERN, 1).alias("host"),
        F.regexp_extract(F.col(url_col), LANG_PATH_PATTERN, 2).alias("lang"),
        F.regexp_extract(F.col(url_col), LANG_PATH_PATTERN, 3).alias("path"),
    ).filter(F.col("host") != "")

    def side(lang, out):
        return (
            m.filter(F.col("lang") == lang)
            .groupBy("host", "path")
            .agg(F.min(id_col).alias(out))
        )

    return side(lang_a, "id_a").join(side(lang_b, "id_b"), ["host", "path"])


def walk_entropy_rate(
    weighted_edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    w_col: str = "n_links",
    n_iters: int = 3,
) -> DataFrame:
    """One row [n_hosts, n_linking_hosts, entropy_rate] — entropy rate
    of the damped random walk on the weighted host graph:
    H = Σ_i π_i·H_i with π the quantized weighted-PageRank stationary
    approximation and H_i each host's outlink-distribution Shannon
    entropy.  The single-number "how surprising is the next click"
    summary that joins the two gate-verified pieces (q_pagerank's walk,
    q_outlink_entropy's per-host diversity): near 0 the graph is
    deterministic mirror chains, near ln(out-degree) it is a genuine
    hub economy.

    Exactness: π comes from :func:`~greenex_py_spark.functions.graph.
    weighted_pagerank` (pico-int rounds, round-9 ranks); each p·ln p
    term and each π·H product is 1e-9-quantized before its sum; hosts
    with no out-links contribute 0 (walk teleports).  Shape: the
    pagerank rounds dominate (one join + one groupBy each); everything
    else is host-dim sized."""
    from pyspark.sql import Window

    from .graph import weighted_pagerank

    pr = weighted_pagerank(
        weighted_edges, n_iters=n_iters,
        src_col=src_col, dst_col=dst_col, w_col=w_col,
    )
    wn = Window.partitionBy(src_col)
    p = F.col(w_col).cast("double") / F.col("_n")
    h = (
        weighted_edges.withColumn("_n", F.sum(w_col).over(wn))
        .select(
            F.col(src_col).alias("node"),
            F.floor(p * F.log(p) * F.lit(1e9) + F.lit(0.5))
            .cast("long").alias("_tq"),
        )
        .groupBy("node")
        .agg(F.sum("_tq").cast("long").alias("_sumtq"))
    )
    j = pr.join(h, "node", "left")
    hpos = -(F.coalesce("_sumtq", F.lit(0)).cast("double") / F.lit(1e9))
    term = F.floor(
        F.col("rank") * hpos * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    return (
        j.select(
            term.alias("_t"),
            F.when(F.col("_sumtq").isNotNull(), 1).otherwise(0).alias("_l"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hosts"),
            F.sum("_l").cast("long").alias("n_linking_hosts"),
            F.round(
                F.sum("_t").cast("double") / F.lit(1e9) + F.lit(0.0), 6
            ).alias("entropy_rate"),
        )
    )
