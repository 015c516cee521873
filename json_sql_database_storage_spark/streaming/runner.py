"""Streaming replay harness: drives Structured Streaming queries from the
static events table (SURVEY.md §5.2.5 — streaming verified by rows-only
replay; aggregate logic verified by the batch twins).

The events table is re-written as K time-ordered parquet chunk files with
increasing mtimes; a file stream with maxFilesPerTrigger=1 then replays them
as K micro-batches — deterministic, self-contained, no external broker.
``late_chunk`` appends an out-of-order chunk (oldest events last) to
exercise watermark late-data semantics.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources import load_table

_EVENTS_SCHEMA = ("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
                  "event_type STRING, value DOUBLE, props STRING")


_STAGE_CACHE: dict[tuple, str] = {}


def stage_chunk_file(df: DataFrame, base: str, seq: int, *,
                     name: str | None = None,
                     mtime_offset: float | None = None) -> str:
    """Write ``df`` as ONE parquet file under ``base`` with a controlled
    mtime — THE staging primitive for file-source streams.  The file
    source orders micro-batches by mtime, so strictly increasing offsets
    ARE the batch order; every exactly-once replay contract in the repo
    (versioned_batch_apply, bm25/ivfpq stream maintenance) keys its
    batch ids on that order.  One definition so an mtime-granularity fix
    lands everywhere at once.

    ``name`` defaults to chunk_{seq:03d}.parquet; ``mtime_offset``
    (seconds added to now) defaults to ``seq``."""
    fname = name or f"chunk_{seq:03d}.parquet"
    off = float(seq if mtime_offset is None else mtime_offset)
    tmp = os.path.join(base, f"__stage_{seq}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    dst = os.path.join(base, fname)
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            shutil.move(os.path.join(tmp, f), dst)
            ts = time.time() + off
            os.utime(dst, (ts, ts))
    shutil.rmtree(tmp)
    return dst


def stage_event_chunks(spark: SparkSession, sf_dir: str, *,
                       n_chunks: int = 4, late_chunk: bool = False) -> str:
    """Write events into n_chunks files ordered by ts (each chunk = one
    micro-batch).  With late_chunk=True the FIRST (oldest) slice is written
    LAST, arriving after the watermark has advanced past it.

    Staged dirs are memoized per (sf_dir, n_chunks, late_chunk): the chunk
    content is a pure function of the static events table, and each replay
    reads it with a fresh query/checkpoint, so every stream query in a
    session reuses one staging pass."""
    key = (os.path.abspath(sf_dir), n_chunks, late_chunk)
    cached = _STAGE_CACHE.get(key)
    if cached is not None and os.path.isdir(cached):
        return cached
    ev = load_table(spark, sf_dir, "events").orderBy("ts")
    rows = ev.count()
    per = rows // n_chunks + 1
    chunked = ev.withColumn(
        "__chunk",
        (F.row_number().over(W.orderBy("ts")) / F.lit(per)).cast("int"))
    base = tempfile.mkdtemp(prefix="events_stream_")
    order = list(range(n_chunks))
    if late_chunk:
        order = order[1:] + order[:1]       # oldest chunk arrives last
    for seq, chunk_id in enumerate(order):
        part = chunked.filter(F.col("__chunk") == chunk_id).drop("__chunk")
        stage_chunk_file(part, base, seq)
    _STAGE_CACHE[key] = base
    return base


def read_event_stream(spark: SparkSession, staged_dir: str) -> DataFrame:
    return (spark.readStream.schema(_EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(staged_dir))


_MEMORY_SINK_SEQ = [0]


def run_stream_to_table(result: DataFrame, *, output_mode: str) -> DataFrame:
    """Execute a streaming DataFrame to completion against a memory sink and
    return the sink contents as a batch DataFrame."""
    _MEMORY_SINK_SEQ[0] += 1
    name = f"stream_sink_{_MEMORY_SINK_SEQ[0]}"
    q = (result.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return result.sparkSession.sql(f"SELECT * FROM {name}")


def cleanup(staged_dir: str) -> None:
    """Memoized staged dirs live for the session (deleted atexit) so later
    stream queries skip restaging; anything unmemoized goes right away."""
    if staged_dir in _STAGE_CACHE.values():
        return
    shutil.rmtree(staged_dir, ignore_errors=True)


@atexit.register
def _cleanup_stage_cache() -> None:
    for d in _STAGE_CACHE.values():
        shutil.rmtree(d, ignore_errors=True)
    _STAGE_CACHE.clear()
