"""User-defined table functions (the Spark-4 Python UDTF surface,
SPARK-43798).

A UDTF is the row→table expansion primitive SQL users reach for with
``LATERAL`` — the Python-integration tier between a scalar UDF (row→row)
and a DataSource (whole scan).  The engine keeps exactly one, as the
registered template for the family: ``term_freq`` expands a document
into its per-token counts (the per-document inverted-index row, the
same expansion `explode + groupBy` does relationally — which is what
the DuckDB oracle uses, so the UDTF path is hash-provable).

Execution notes:
- Registered per-session and idempotent:
  ``register_term_freq(spark)``.
- ``useArrow=True`` is baked into the decorator (the session conf is
  consulted at DECORATION time, so setting it later is too late —
  verified against the executed plan), making the node
  ArrowEvalPythonUDTF and keeping the
  inventory's zero-BatchEvalPython contract intact in spirit: the per
  ``eval`` work is one Counter over one document, state bounded by the
  document length cap.
- Emission order within one eval is sorted for determinism, though the
  gate's hash compare is order-insensitive anyway.

At 100 TB this shape stays map-side (no shuffle): each task expands its
own documents; downstream aggregation is whatever the query adds.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="tok string, cnt long", useArrow=True)
class TermFreq:
    """(text) → rows of (tok, cnt): whitespace token frequencies of one
    document, sorted by token."""

    def eval(self, text: str):  # noqa: D102 — interface fixed by Spark
        from collections import Counter

        if text is None:
            return
        for tok, cnt in sorted(Counter(text.split(" ")).items()):
            yield tok, cnt


def register_term_freq(spark) -> None:
    """Idempotently register ``term_freq`` for SQL LATERAL use and turn
    on Arrow transport for Python UDTFs."""
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    spark.udtf.register("term_freq", TermFreq)
