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
    "HREF_PATTERN", "LANG_PATH_PATTERN",
    "extract_outlinks", "host_link_graph", "bitext_candidates",
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
