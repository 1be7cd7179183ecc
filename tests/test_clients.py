"""A9 track-clients transitions: the event-time form must emit exactly
one DOWN per silence gap (at last_seen + timeout) and one UP per
return (reference src/processors/track-clients.c:232-290)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sagan_spark.pipeline.clients import client_stats, track_client_transitions


def _frame(spark, rows):
    df = spark.createDataFrame(rows, "event_key string, ts string, host string, message string")
    return df.select(
        "event_key", F.col("ts").cast("timestamp").alias("ts"), "host",
        F.lit("p").alias("program"), F.lit("").alias("facility"),
        F.lit("").alias("level"), F.lit("").alias("tag"),
        F.lit("").alias("priority"), "message",
    )


def test_transitions_down_up_down(spark):
    rows = [
        ("e1", "2026-01-01 00:00:00", "h1", "m"),
        ("e2", "2026-01-01 00:01:00", "h1", "m"),   # still up
        # silence 00:01 -> 00:20 (gap 19m > 5m): DOWN at 00:06, UP at 00:20
        ("e3", "2026-01-01 00:20:00", "h1", "m"),
        # trailing silence to horizon 01:00: final DOWN at 00:25
        ("e4", "2026-01-01 01:00:00", "h2", "m"),   # horizon setter, other host
    ]
    tr = track_client_transitions(_frame(spark, rows), timeout_minutes=5)
    got = {(r.host, r.change, str(r.at_ts)) for r in tr.collect()}
    assert ("h1", "down", "2026-01-01 00:06:00") in got
    assert ("h1", "up", "2026-01-01 00:20:00") in got
    assert ("h1", "down", "2026-01-01 00:25:00") in got
    # h1 emitted exactly 2 downs + 1 up; h2 never went down (it IS the horizon)
    assert len([g for g in got if g[0] == "h1"]) == 3
    assert not [g for g in got if g[0] == "h2"]


def test_transitions_steady_host(spark):
    rows = [(f"e{i}", f"2026-01-01 00:0{i}:00", "h1", "m") for i in range(5)]
    frame = _frame(spark, rows)
    # default horizon == last event: a steadily-logging host never flips
    assert track_client_transitions(frame, timeout_minutes=5).count() == 0
    # explicit later horizon: exactly one trailing DOWN at last_seen+5m
    tr = track_client_transitions(
        frame, timeout_minutes=5,
        horizon=F.lit("2026-01-01 01:00:00").cast("timestamp"),
    ).collect()
    assert len(tr) == 1
    assert tr[0].change == "down" and str(tr[0].at_ts) == "2026-01-01 00:09:00"


def test_client_stats_sample_and_bytes(spark):
    rows = [
        ("e1", "2026-01-01 00:00:00", "h1", "first"),
        ("e2", "2026-01-01 00:05:00", "h1", "longer message"),
    ]
    st = {r.host: r for r in client_stats(_frame(spark, rows)).collect()}
    assert st["h1"].n_events == 2
    assert st["h1"].bytes_total == len("first") + len("longer message")
    assert st["h1"].sample_message == "first"
    assert str(st["h1"].first_seen) == "2026-01-01 00:00:00"
