"""Stateful streaming Bloom pre-screen: "have we probably crawled this
content in an EARLIER snapshot?" answered incrementally as snapshots
stream in — the streaming twin of the batch
``functions/dedup.bloom_prefilter`` (SURVEY.md §2.10 custom stateful
operators; the recrawl shape: each new crawl batch is screened against
the accumulated digest filter of everything before it, without ever
re-reading earlier batches).

Semantics are defined on an explicit, monotone snapshot label ``lab``
(not on micro-batch boundaries, which are an execution detail):

    prior(probe) = its bit was set by ANY row with a strictly smaller
                   lab (earlier snapshot), in this or any previous
                   micro-batch / previous AvailableNow run.

Inside the operator each micro-batch's rows are folded per shard in
ascending lab order — all of a label's probes are flagged against the
state BEFORE that label's bits are inserted — so the result is
independent of how micro-batches chop the stream, PROVIDED labels
arrive in nondecreasing order across micro-batches (true for a single
AvailableNow drain, and for snapshot-per-run ingestion where each
resumed run carries later labels; the checkpointed GroupState is the
cross-run filter).  Same-label duplicates are deliberately NOT flagged
(intra-snapshot dedup is the batch exact-dedup pass's job).

Scale shape: the filter is sharded by bit range — state per shard is a
sorted bit list bounded by the shard's bit-space slice (total state
<= m_bits across all shards, regardless of corpus size), and the only
shuffle is the groupBy on the shard key.  This is the bounded-state
streaming-dedup design (a per-doc seen-set would grow with the corpus;
the Bloom state does not).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["bloom_flags_stream", "BLOOM_OUT_SCHEMA"]

BLOOM_OUT_SCHEMA = "doc_id long, lab long, bit long, prior boolean"
_STATE_SCHEMA = "bits array<long>"


def _fold(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    pdfs = [p for p in pdf_iter if len(p)]
    if not pdfs:
        return
    rows = pd.concat(pdfs, ignore_index=True)
    bits: set = set(state.get[0]) if state.exists else set()
    out = []
    for lab in sorted(rows["lab"].unique()):
        sub = rows[rows["lab"] == lab]
        out.append(
            pd.DataFrame(
                {
                    "doc_id": sub["doc_id"].to_numpy(),
                    "lab": sub["lab"].to_numpy(),
                    "bit": sub["bit"].to_numpy(),
                    "prior": sub["bit"].isin(list(bits)).to_numpy(),
                }
            )
        )
        bits |= set(int(b) for b in sub["bit"])
    state.update((sorted(bits),))
    yield pd.concat(out, ignore_index=True)


def bloom_flags_stream(
    probes: DataFrame,
    n_shards: int = 64,
) -> DataFrame:
    """Streaming DataFrame [doc_id, lab, bit, prior] from a streaming
    probe frame [doc_id, lab, bit] — one output row per probe, flagged
    against the sharded cross-snapshot Bloom state.  Callers build
    ``bit`` with functions/dedup.bloom_positions (k rows per doc) and
    aggregate downstream: probably_seen = (count of prior) >= k.
    """
    return (
        probes.withColumn("shard", F.col("bit") % n_shards)
        .groupBy("shard")
        .applyInPandasWithState(
            _fold,
            outputStructType=BLOOM_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_bloom_stream(
    spark,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    key_expr: Column,
    schema: str,
    m_bits: int,
    k: int = 3,
    n_shards: int = 64,
) -> None:
    """Drain source_dir (AvailableNow) through the sharded Bloom state
    into a parquet sink of per-probe flags.  Re-running with the same
    checkpoint after new snapshot files land processes only the delta —
    the GroupState in the checkpoint IS the accumulated filter."""
    from ..functions.dedup import bloom_positions

    stream = spark.readStream.schema(schema).parquet(source_dir)
    probes = stream.select(
        "doc_id",
        "lab",
        F.explode(F.array(*bloom_positions(key_expr, m_bits, k))).alias("bit"),
    )
    q = (
        bloom_flags_stream(probes, n_shards=n_shards)
        .writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
