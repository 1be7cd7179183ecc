"""Streaming sessionization parity: the stateful streaming assignment
must equal batch `sessionize` over the same corpus, including across a
query restart (state resumes from the checkpoint), and state must be
evicted by the event-time timeout rather than growing forever."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from sagan_spark.ops.sessions import sessionize
from sagan_spark.streaming.sessions import start_session_query

US = 1_000_000
GAP = 120          # seconds
SPAN = 3600 * US   # 1h of synthetic activity


def _corpus(n=600, keys=25):
    rows = []
    for i in range(n):
        h = hashlib.md5(f"ss{i}".encode()).digest()
        rows.append(
            (h[0] % keys, i, int.from_bytes(h[1:5], "big") % SPAN)
        )
    rows.sort(key=lambda r: (r[2], r[1]))  # global event-time order
    return rows


def _table(rows):
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(
                [r[2] for r in rows], pa.timestamp("us")
            ),
        }
    )


def test_streaming_sessionize_equals_batch_with_restart(spark, tmp_path):
    rows = _corpus()
    third = len(rows) // 3
    chunks = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch truth over the full corpus
    full = str(tmp_path / "full.parquet")
    pq.write_table(_table(rows), full)
    batch = {
        r.event_id: (r.user_id, r.event_us, r.session_start_us)
        for r in sessionize(
            spark.read.parquet(full), gap_sec=GAP, bucket_sec=600
        ).collect()
    }

    # stream chunk by chunk, stopping the query between chunks
    for i, chunk in enumerate(chunks):
        pq.write_table(_table(chunk), str(input_dir / f"c{i}.parquet"))
        q = start_session_query(
            spark, str(input_dir), out, ckpt, gap_sec=GAP
        )
        q.awaitTermination(120)

    got = {
        r.event_id: (r.user_id, r.event_us, r.session_start_us)
        for r in spark.read.parquet(out).collect()
    }
    assert got == batch

    # exactly-once on re-run of the drained stream
    n_before = spark.read.parquet(out).count()
    q = start_session_query(spark, str(input_dir), out, ckpt, gap_sec=GAP)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == n_before


def test_streaming_session_state_evicted(spark, tmp_path):
    """A key silent for > gap while the watermark advances must have
    its state removed (timeout fires) — the next event simply starts a
    fresh session, so output parity is unaffected; the observable
    contract is the assignment staying correct across the eviction."""
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    c1 = [(1, 1, 10 * US), (1, 2, 30 * US)]
    # key 1 silent; key 2 pushes the watermark far past 30s + gap
    c2 = [(2, 3, 2000 * US)]
    c3 = [(1, 4, 2500 * US), (2, 5, 2510 * US)]
    for i, chunk in enumerate([c1, c2, c3]):
        pq.write_table(_table(chunk), str(input_dir / f"c{i}.parquet"))
        q = start_session_query(
            spark, str(input_dir), out, ckpt, gap_sec=GAP
        )
        q.awaitTermination(120)

    got = {
        r.event_id: r.session_start_us
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        1: 10 * US,
        2: 10 * US,
        3: 2000 * US,
        4: 2500 * US,
        5: 2510 * US,
    }
