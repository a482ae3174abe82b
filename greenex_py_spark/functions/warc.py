"""WARC record-header parsing (Common-Crawl ingest surface).

The crawl table's ``html: binary`` payloads arrive wrapped in WARC
record headers (``WARC/1.0`` + CRLF-delimited ``Name: value`` lines +
a blank line before the body).  This module parses the envelope with
pure-codegen regexps — no UDFs — so header extraction happens at scan
speed during ingest, and the body survives BYTE-IDENTICAL (the
per-row invariant the pipeline carries end-to-end: body_md5 is
compared against the extracted-text column downstream).

Header names are case-insensitive per RFC; values run to the CRLF.
All patterns are RE2-safe so the DuckDB oracle mirrors them literally.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_warc_headers", "WARC_FIELDS"]

# (output column, header name) — the regex template below is rendered
# per field on BOTH engines
WARC_FIELDS: tuple[tuple[str, str], ...] = (
    ("warc_type", "warc-type"),
    ("target_uri", "warc-target-uri"),
    ("content_type", "content-type"),
)


def _hdr(name: str) -> str:
    return r"(?i)\r\n" + name + r": *([^\r\n]*)"


def parse_warc_headers(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "record"
) -> DataFrame:
    """[id, warc_type, target_uri, content_type, content_length,
    body_md5] — envelope fields plus the md5 of the byte-identical
    body (everything after the first blank CRLF line)."""
    s = F.decode(F.col(bin_col), "UTF-8")
    cols = [F.col(id_col)]
    for out, name in WARC_FIELDS:
        cols.append(F.regexp_extract(s, _hdr(name), 1).alias(out))
    cols.append(
        F.regexp_extract(s, _hdr("content-length"), 1)
        .cast("long")
        .alias("content_length")
    )
    cols.append(
        F.md5(F.encode(F.regexp_extract(s, r"(?s)\r\n\r\n(.*)$", 1), "UTF-8")).alias(
            "body_md5"
        )
    )
    return df.select(*cols)
