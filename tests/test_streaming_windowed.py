"""Watermarked event-time windows: append-mode emission when the watermark
passes a window's end, and DROPPING of too-late events — pinned with a
one-file-per-micro-batch stream so watermark advancement is observable."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T

SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType(), False),
    T.StructField("ts", T.StringType(), False),  # cast inside the operator
    T.StructField("event_type", T.StringType(), False),
])


def _write_batch(path: str, rows: list[tuple[int, str, str]], mtime: float) -> None:
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.string()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def test_watermark_emits_final_windows_and_drops_late_events(spark, tmp_path):
    from octocode_spark.streaming.windowed import run_windowed_counts_over_files

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    t0 = time.time() - 100
    # batch 0: two 'a' events in window [10:00,10:05) + a 10:30 event that
    # pushes the watermark to 10:20 (threshold 10 min)
    _write_batch(f"{landing}/b1.parquet", [
        (1, "2024-01-01 10:00:00", "a"),
        (2, "2024-01-01 10:02:00", "a"),
        (3, "2024-01-01 10:30:00", "b"),
    ], t0)
    # batch 1 (watermark 10:20): the [10:00,10:05) window finalizes and its
    # state is evicted at the end of this batch
    _write_batch(f"{landing}/b2.parquet", [
        (5, "2024-01-01 10:31:00", "c"),
        (6, "2024-01-01 11:00:00", "d"),
    ], t0 + 10)
    # batch 2: event 4 is LATE for the already-evicted [10:00,10:05) window
    # -> DROPPED (merging it would require re-emitting a finalized window)
    _write_batch(f"{landing}/b3.parquet", [
        (4, "2024-01-01 10:01:00", "a"),
        (7, "2024-01-01 11:30:00", "e"),
    ], t0 + 20)
    # batch 3: advances the watermark so the 11:00/11:30 windows finalize too
    _write_batch(f"{landing}/b4.parquet", [
        (8, "2024-01-01 12:30:00", "f"),
    ], t0 + 30)

    q = run_windowed_counts_over_files(
        spark, landing, SCHEMA, str(tmp_path / "ckpt"), "wmq",
        window="5 minutes", late_threshold="10 minutes",
    )
    q.awaitTermination(180)
    rows = spark.table("wmq").collect()
    got = {(str(r["win_start"]), r["event_type"]): r["n"] for r in rows}
    # the [10:00,10:05) 'a' window finalized with count 2 — the late event 4
    # was DROPPED (count 3, or a duplicate 'a' row, would mean no eviction)
    assert got[("2024-01-01 10:00:00", "a")] == 2
    # on-time events in later windows finalized once the watermark passed
    assert got[("2024-01-01 10:30:00", "b")] == 1
    assert got[("2024-01-01 10:30:00", "c")] == 1
    assert got[("2024-01-01 11:00:00", "d")] == 1
    assert got[("2024-01-01 11:30:00", "e")] == 1
    # every emitted (window, key) appears exactly once (append-mode finality)
    assert len(got) == len(rows)
