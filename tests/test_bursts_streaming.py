"""Streaming burst-detection parity: the stateful streaming flags must
equal batch `detect_bursts` over the same corpus — including across a
query restart with bucket-aligned chunking (the documented ordering
envelope) — and re-running a drained stream must add nothing."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq

from sagan_spark.ops.bursts import detect_bursts
from sagan_spark.streaming.bursts import start_burst_query

US = 1_000_000
BUCKET = 60           # 1-minute buckets
K = 5                 # trailing buckets
SPAN = 40 * BUCKET * US  # 40 buckets of synthetic activity

KW = dict(bucket_sec=BUCKET, trailing_buckets=K, factor_milli=1500,
          min_count=2)


def _corpus(n=800, keys=12):
    rows = []
    for i in range(n):
        h = hashlib.md5(f"bs{i}".encode()).digest()
        ts = int.from_bytes(h[1:5], "big") % SPAN
        # pile extra events on one key in two hot buckets to force bursts
        if i % 9 == 0:
            ts = (20 + (i % 2)) * BUCKET * US + (i % BUCKET) * US
            rows.append((3, ts))
        else:
            rows.append((h[0] % keys, ts))
    rows.sort(key=lambda r: r[1])
    return rows


def _table(rows):
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )


def _key(r):
    return (r.user_id, r.bucket_start_us)


def _val(r):
    return (r.n_events, r.trailing_sum, r.is_burst)


def test_streaming_bursts_equal_batch_with_restart(spark, tmp_path):
    rows = _corpus()
    # chunk at bucket boundaries (the envelope: a bucket never spans
    # micro-batches) — split at 1/3 and 2/3 of the bucket range
    b1, b2 = 13 * BUCKET * US, 27 * BUCKET * US
    chunks = [
        [r for r in rows if r[1] < b1],
        [r for r in rows if b1 <= r[1] < b2],
        [r for r in rows if r[1] >= b2],
    ]
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    full = str(tmp_path / "full.parquet")
    pq.write_table(_table(rows), full)
    batch = {
        _key(r): _val(r)
        for r in detect_bursts(spark.read.parquet(full), **KW).collect()
    }
    assert any(v[2] == 1 for v in batch.values()), "corpus must burst"
    assert any(v[1] is None for v in batch.values()), "need cold starts"

    for i, chunk in enumerate(chunks):
        pq.write_table(_table(chunk), str(input_dir / f"c{i}.parquet"))
        q = start_burst_query(spark, str(input_dir), out, ckpt, **KW)
        q.awaitTermination(120)

    got = {_key(r): _val(r) for r in spark.read.parquet(out).collect()}
    assert got == batch

    # exactly-once: a re-run of the drained stream appends nothing
    n_before = spark.read.parquet(out).count()
    q = start_burst_query(spark, str(input_dir), out, ckpt, **KW)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == n_before


def test_stale_key_state_evicted_fresh_baseline(spark, tmp_path):
    """A key silent for > k buckets must restart with a NULL baseline
    (eviction == fresh): two bucket-aligned chunks k+2 buckets apart."""
    early = [(1, (2 * BUCKET + j) * US) for j in range(4)]
    late = [(1, (2 + K + 2) * BUCKET * US + j * US) for j in range(3)]
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    for i, chunk in enumerate([early, late]):
        pq.write_table(_table(chunk), str(input_dir / f"c{i}.parquet"))
        q = start_burst_query(spark, str(input_dir), out, ckpt, **KW)
        q.awaitTermination(120)
    got = {r.bucket_start_us: r for r in spark.read.parquet(out).collect()}
    late_bucket = (2 + K + 2) * BUCKET * US
    assert got[late_bucket].trailing_sum is None
    assert got[late_bucket].is_burst == 0
    # batch truth agrees
    full = str(tmp_path / "full.parquet")
    pq.write_table(_table(early + late), full)
    batch = {
        r.bucket_start_us: r
        for r in detect_bursts(spark.read.parquet(full), **KW).collect()
    }
    assert batch[late_bucket].trailing_sum is None
