"""Zero-Spark staging for the streaming gate sources (VERDICT r03 #2).

The streaming gate queries must stage their file-source directories
before draining them — that staging is *test-harness plumbing*, not the
operator under test, yet it used to run as full Spark jobs
(read → select → coalesce → write, plus a second job for the empty
watermark-advancing delta).  At sf0.1 those jobs cost 1-2 s per query
across 8 queries — a large slice of the streaming family's bench —
while the fixture parquet is a single ~2 MB file whose columns/types
already equal ``EVENT_SCHEMA`` exactly.

This module stages with pyarrow instead: a straight file copy when the
source is the unmodified events table, an in-memory arrow filter when a
feed is an event-type slice, and a schema-only file for the empty
delta.  Byte-level content differs from a Spark write (footer metadata)
but the ROWS are identical, so every drain sees exactly the same input
and the oracles are unchanged.

Scale note: this is bench/test staging only — a production deployment
streams from a real landing zone and never stages at all.  The engine
operators (streaming/ingest.py etc.) are untouched.
"""

from __future__ import annotations

import os
import shutil
from contextlib import contextmanager

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _events_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "events.parquet")


def stage_events(
    sf_dir: str,
    src: str,
    event_type: str | None = None,
    flush_after: pa.Table | None = None,
) -> pa.Table | None:
    """Stage ``events.parquet`` as a one-file streaming source dir.

    - ``event_type=None`` → direct file copy (the fixture file already
      has exactly EVENT_SCHEMA's columns and types, verified at import
      of the stream: ``readStream.schema(...)`` prunes by name).
    - ``event_type='view'`` → arrow filter, one output file.
    - ``flush_after`` → rows appended after the slice (the left-join
      watermark flush sentinel).

    Returns the staged table when it had to be materialized, else None
    (copy path).  One file per source dir also means the AvailableNow
    drain plans exactly one micro-batch for the initial load.
    """
    os.makedirs(src, exist_ok=True)
    f = _events_path(sf_dir)
    if event_type is None and flush_after is None:
        shutil.copy(f, os.path.join(src, "part-00000.parquet"))
        return None
    t = pq.read_table(f, columns=_EVENT_COLS)
    if event_type is not None:
        t = t.filter(pc.equal(t["event_type"], event_type))
    if flush_after is not None:
        t = pa.concat_tables([t, flush_after.select(t.column_names)])
    pq.write_table(t, os.path.join(src, "part-00000.parquet"))
    return t


def flush_row_after(sf_dir: str, days: int = 40) -> pa.Table:
    """One sentinel event ``days`` after the stream's max event time —
    the watermark flush row the left-join gate appends to both feeds."""
    f = _events_path(sf_dir)
    t = pq.read_table(f, columns=["ts"])
    mx = pc.max(t["ts"]).as_py()
    import datetime

    ts_type = t.schema.field("ts").type
    return pa.table(
        {
            "event_id": pa.array([-1], pa.int64()),
            "ts": pa.array([mx + datetime.timedelta(days=days)], ts_type),
            "user_id": pa.array([-1], pa.int64()),
            "event_type": pa.array(["flush"], pa.string()),
            "value": pa.array([0.0], pa.float64()),
            "props": pa.array([""], pa.string()),
        }
    )


def stage_events_with_replay(sf_dir: str, src: str, mod: int = 3) -> None:
    """Stage the full event feed plus an overlapping replay of every
    ``mod``-th event (by event_id) as a second file — the at-least-once
    input of the streaming dedup gate."""
    os.makedirs(src, exist_ok=True)
    f = _events_path(sf_dir)
    shutil.copy(f, os.path.join(src, "part-00000.parquet"))
    t = pq.read_table(f, columns=_EVENT_COLS)
    mask = t["event_id"].to_numpy() % mod == 0
    pq.write_table(t.filter(pa.array(mask)), os.path.join(src, "replay-00001.parquet"))


def stage_documents_bloom(sf_dir: str, src: str, mod: int = 3) -> None:
    """Stage documents as [doc_id, lab, text] with the snapshot label
    lab = doc_id % ``mod`` — the bloom-prescreen gate's source."""
    os.makedirs(src, exist_ok=True)
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    lab = pa.array(t["doc_id"].to_numpy() % mod)
    t = t.add_column(1, pa.field("lab", pa.int64()), lab)
    pq.write_table(t, os.path.join(src, "part-00000.parquet"))


def append_empty_delta(src: str) -> None:
    """Append a schema-only parquet file to ``src`` — the extra
    micro-batch in which the state store's event-time timeouts fire
    against the watermark advanced by the previous drain.  The schema
    is read from the staged file itself, so the types can never drift
    from what the stream already saw."""
    files = sorted(
        f for f in os.listdir(src) if f.endswith(".parquet")
    )
    schema = pq.read_schema(os.path.join(src, files[0]))
    empty = pa.table(
        {f.name: pa.array([], f.type) for f in schema}
    )
    path = os.path.join(src, f"delta-{len(files):05d}.parquet")
    pq.write_table(empty, path)
    # FileStreamSource orders files by modification time; pin the delta
    # strictly AFTER everything already staged so a rate-limited
    # single-drain run (maxFilesPerTrigger=1) always plans it as the
    # LAST micro-batch — sub-second mtime ties would otherwise make the
    # batch order racy.
    latest = max(os.path.getmtime(os.path.join(src, f)) for f in files)
    os.utime(path, (latest + 10.0, latest + 10.0))


@contextmanager
def drain_shuffle_partitions(spark, n: int = 8):
    """Temporarily shrink ``spark.sql.shuffle.partitions`` around a
    streaming drain.  The state-store partition count is pinned from
    this conf at the checkpoint's first batch; 8 stores instead of 32
    cuts the per-batch state-file and task-launch overhead ~4× on the
    bench box at identical semantics (stateful results are
    partition-count-invariant).  At production scale the caller RAISES
    it — state parallelism is a deployment knob, and the checkpoint
    pins whatever was set when it was created."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
