"""Gap sessionization: the two-phase bucket decomposition must be
bit-equal to the global per-key window definition (which the DuckDB
oracle runs), and its event-level windows must never be partitioned by
the key alone."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from sagan_spark.ops.sessions import session_rollup, session_rollup_native, sessionize

US = 1_000_000


def _twin(rows, gap_sec):
    """Global-definition twin: per key, sort by (us, id); new session
    when prev is None or us - prev > gap."""
    gap = gap_sec * US
    by_key = {}
    for key, eid, us in rows:
        by_key.setdefault(key, []).append((us, eid))
    out = {}
    for key, evs in by_key.items():
        prev = None
        start = None
        for us, eid in sorted(evs):
            if prev is None or us - prev > gap:
                start = us
            out[eid] = (key, us, start)
            prev = us
    return out


def _mk(spark, rows):
    return spark.createDataFrame(
        [(k, e, u) for k, e, u in rows], "user_id long, event_id long, us long"
    ).select(
        "user_id",
        "event_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
    )


def test_sessionize_matches_global_definition(spark):
    """Hand-built chain that exercises every carry path: sessions
    crossing one and several bucket boundaries, a gap exactly == gap
    (same session: strict >), a tie on the timestamp, an empty bucket
    between events of one session-breaking pair, and two keys
    interleaved."""
    gap, bucket = 100, 1000  # seconds
    rows = [
        # key 1: session A spans buckets 0->1 (999s then 1050s, gap 51)
        (1, 10, 999 * US),
        (1, 11, 1050 * US),
        # exactly gap later: STILL session A (strict >)
        (1, 12, 1150 * US),
        # gap+1 later: session B
        (1, 13, 1251 * US),
        (1, 14, 1999 * US + 999_999),  # 749s later -> session C
        (1, 15, 2050 * US),            # 50s after, bucket 2 -> still C
        (1, 16, 4020 * US),            # bucket 4 (3 empty), session D
        # tie on timestamp (ordered by event_id, same session)
        (1, 17, 4020 * US),
        # key 2 interleaved in the same buckets
        (2, 20, 1000 * US),
        (2, 21, 1099 * US),
        (2, 22, 1300 * US),
    ]
    got = {
        r.event_id: (r.user_id, r.event_us, r.session_start_us)
        for r in sessionize(
            _mk(spark, rows), gap_sec=gap, bucket_sec=bucket
        ).collect()
    }
    assert got == _twin(rows, gap)


def test_sessionize_fuzz_and_rollup(spark):
    """200 hash-placed events over 40 keys and ~20 buckets (forces
    many bucket-first carries and multi-bucket sessions), twin-checked
    event-by-event; the rollup must agree with the twin's session
    groups."""
    gap, bucket = 50, 300
    rows = []
    for i in range(200):
        h = hashlib.md5(f"sess{i}".encode()).digest()
        key = h[0] % 40
        us = (int.from_bytes(h[1:5], "big") % (6000 * US))
        rows.append((key, i, us))
    df = _mk(spark, rows)
    want = _twin(rows, gap)
    got = {
        r.event_id: (r.user_id, r.event_us, r.session_start_us)
        for r in sessionize(df, gap_sec=gap, bucket_sec=bucket).collect()
    }
    assert got == want

    sessions = {}
    for key, us, start in want.values():
        k = (key, start)
        sessions.setdefault(k, []).append(us)
    want_roll = {
        k: (len(v), max(v) - k[1]) for k, v in sessions.items()
    }
    got_roll = {
        (r.user_id, r.session_start_us): (r.n_events, r.duration_us)
        for r in session_rollup(df, gap_sec=gap, bucket_sec=bucket).collect()
    }
    assert got_roll == want_roll

    # engine-native spelling: Spark's session_window must agree on the
    # same fuzz corpus (incl. its <=-gap merge boundary)
    got_native = {
        (r.user_id, r.session_start_us): (r.n_events, r.duration_us)
        for r in session_rollup_native(df, gap_sec=gap).collect()
    }
    assert got_native == want_roll


def test_sessionize_event_windows_bucketed(spark):
    """Skew pin: every window that orders raw events (`_sg_us` in its
    ordering) must be partitioned by (key, bucket) — a key-alone
    partition over the corpus is the hot-key funnel VERDICT r3
    flagged.  Key-alone windows are allowed only on the bucket-stats
    frames (ordering by `_sg_b`)."""
    df = sessionize(_mk(spark, [(1, 1, 5 * US)]), gap_sec=10, bucket_sec=60)
    plan = df._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "no windows found — plan changed shape?"
    event_specs = [s for s in specs if re.search(r"_sg_us#\d+L ASC", s)]
    bucket_specs = [s for s in specs if s not in event_specs]
    assert event_specs, "event-level windows missing"
    for s in event_specs:
        assert "_sg_b#" in s, f"event window not bucket-partitioned: {s}"
    for s in bucket_specs:
        assert re.search(r"_sg_b#\d+L ASC", s), f"unexpected window: {s}"
