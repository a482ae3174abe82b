"""End-to-end web-corpus curation pipeline (the 100 TB product story in
one composition): raw crawl pages → extracted text → quality gate →
URL + exact dedup → language ID → deterministic splits → geocoded
points, every stage a RESUMABLE snapshot (engine/checkpoint or the
Iceberg backend via engine/iceberg.snapshot_store).

Each stage is one of the engine's tested operators; this module only
composes them and threads fingerprints, so a re-run after a crash (or
after new crawl batches land) recomputes exactly the stages whose
input fingerprint changed — everything else is a metadata-only read
(north rule).  Stage order mirrors production curation pipelines:
cheap row-local filters first (extract, quality), then the shuffling
dedups on the reduced corpus, then enrichment.

Outputs per stage (all parquet/Iceberg snapshots):

1. ``extracted``  — doc_id, url, lang, text (HTML→text, row-local)
2. ``quality``    — + quality score, filtered to ≥ min_quality
3. ``url_dedup``  — canonical-URL representatives only
4. ``text_dedup`` — exact-text representatives only (hash-first)
5. ``enriched``   — + pred_lang, split, (x, y, cell) geocode
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_web_corpus_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    store_dir: str,
    input_fingerprint: str,
    min_quality: float = 0.05,
    backend: str = "auto",
) -> tuple[DataFrame, list[dict]]:
    """pages: [doc_id, url, warc_ts, html, text?, lang?] — returns the
    enriched corpus DataFrame and the per-stage resume/latency stats."""
    from ..data.synth import geocode
    from ..engine.checkpoint import Pipeline
    from ..engine.iceberg import snapshot_store
    from ..functions.dedup import canonicalize_url
    from ..functions.sampling import hash_split
    from ..functions.text import html_extract_text, language_id, quality_score

    store = snapshot_store(spark, store_dir, backend)
    pipe = Pipeline(store)
    fp = input_fingerprint

    def s_extract():
        out = html_extract_text(pages, html_col="html", out_col="text_extracted")
        return out.select("doc_id", "url", F.col("text_extracted").alias("text"))

    extracted = pipe.run_stage("extracted", fp, s_extract)

    def s_quality():
        q = quality_score(extracted)
        return extracted.join(q, "doc_id").filter(F.col("quality") >= min_quality)

    quality = pipe.run_stage("quality", fp, s_quality)

    def s_url_dedup():
        canon = quality.withColumn("canonical_url", canonicalize_url(F.col("url")))
        from pyspark.sql import Window as W

        w = W.partitionBy("canonical_url").orderBy("doc_id")
        return (
            canon.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    url_rep = pipe.run_stage("url_dedup", fp, s_url_dedup)

    def s_text_dedup():
        # keep representatives: min-id of each text group survives; all
        # singletons survive (hash-first grouping — the same digest keys
        # exact_duplicates shuffles, never the text itself)
        members = url_rep.select(
            "doc_id", F.md5("text").alias("_d"), F.octet_length("text").alias("_l")
        )
        reps = (
            members.groupBy("_d", "_l").agg(F.min("doc_id").alias("rep_id"))
        )
        return url_rep.join(
            reps.select(F.col("rep_id").alias("doc_id")), "doc_id", "leftsemi"
        )

    text_rep = pipe.run_stage("text_dedup", fp, s_text_dedup)

    def s_enrich():
        lid = language_id(text_rep)
        split = hash_split(text_rep).select("doc_id", "split")
        pts = geocode(text_rep.select("doc_id", "url"))
        return (
            text_rep.join(lid, "doc_id")
            .join(split, "doc_id")
            .join(pts.select("doc_id", "x", "y", "cell"), "doc_id")
        )

    enriched = pipe.run_stage("enriched", fp, s_enrich, partition_by=["split"])
    return enriched, pipe.stats
