"""Burst detection: trailing-baseline RANGE-window semantics pinned by
hand-computed cases (cold start, window-gap reset, empty-bucket
dilution, min_count gate, exact >= boundary)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sagan_spark.ops.bursts import bucket_counts, detect_bursts

US = 1_000_000
B = 10 * US  # bucket_sec=10 in the tests


def _mk(spark, rows):
    return spark.createDataFrame(rows, "user_id long, us long").select(
        "user_id", F.timestamp_micros(F.col("us")).alias("ts")
    )


def _spread(bucket, n):
    """n events inside one bucket (distinct offsets, all < bucket_sec)."""
    return [bucket * B + i for i in range(n)]


def test_detect_bursts_hand_cases(spark):
    rows = []
    # key 1: cold start, burst vs small baseline, min_count gate,
    # empty-bucket dilution, full-gap reset
    for us in _spread(0, 2):   # b0: trailing NULL -> 0
        rows.append((1, us))
    for us in _spread(1, 4):   # b1: trail=2, 4*3000 >= 2000*2 -> burst
        rows.append((1, us))
    for us in _spread(2, 1):   # b2: n < min_count -> 0
        rows.append((1, us))
    for us in _spread(5, 5):   # b5: window [b2,b4] -> trail=1 -> burst
        rows.append((1, us))   #     (b0/b1 aged out of the k=3 frame)
    for us in _spread(9, 3):   # b9: window [b6,b8] empty -> NULL -> 0
        rows.append((1, us))
    # key 2: exact boundary, >= fires: 2*3000 == 2000*3
    for us in _spread(0, 3):
        rows.append((2, us))
    for us in _spread(1, 2):
        rows.append((2, us))

    out = detect_bursts(
        _mk(spark, rows), bucket_sec=10, trailing_buckets=3,
        factor_milli=2000, min_count=2,
    )
    got = {
        (r.user_id, r.bucket_start_us // B):
            (r.n_events, r.trailing_sum, r.is_burst)
        for r in out.collect()
    }
    assert got == {
        (1, 0): (2, None, 0),
        (1, 1): (4, 2, 1),
        (1, 2): (1, 6, 0),
        (1, 5): (5, 1, 1),
        (1, 9): (3, None, 0),
        (2, 0): (3, None, 0),
        (2, 1): (2, 3, 1),
    }


def test_bucket_counts_drops_null_ts(spark):
    df = spark.createDataFrame(
        [(1, 5 * US), (1, None), (2, 15 * US)], "user_id long, us long"
    ).select(
        "user_id", F.timestamp_micros(F.col("us")).alias("ts")
    )
    got = {
        (r.user_id, r.bucket_start_us): r.n_events
        for r in bucket_counts(df, bucket_sec=10).collect()
    }
    assert got == {(1, 0): 1, (2, B): 1}


def test_bursts_window_only_the_counts_frame(spark):
    """The RANGE window must sit ABOVE the (key, bucket) aggregation —
    its partition is a key's non-empty-bucket count, never its event
    count — and partial_count must partial-aggregate map-side below
    the shuffle.  No Python anywhere."""
    df = _mk(spark, [(1, 0), (1, 1)])
    qe = detect_bursts(df, bucket_sec=10)._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "partial_count" in plan, "map-side partial count missing"
    assert "Window" in plan
    # the Window's child chain must contain the aggregate: everything
    # AFTER the Window marker must NOT introduce another aggregation
    # input scan — cheap proxy: exactly one Window, one shuffle for it
    assert plan.count("Window") == 1
    assert "Python" not in plan and "BatchEval" not in plan
    # window frame is RANGE-based on the bucket index, not ROWS
    opt = qe.optimizedPlan().toString()
    assert "RangeFrame" in opt, "trailing frame must be a RANGE frame"


def test_bucket_division_matches_duckdb_pre_1970(spark):
    """Bucket-index rounding must agree between engines even for
    negative epoch micros (pre-1970 = corrupt log timestamps).  Both
    Spark's cast('long') and DuckDB's `//` truncate toward zero
    (DuckDB does NOT floor: -1 // 10 = 0) — pin that parity so neither
    side gets 'fixed' to floor semantics alone."""
    rows = [(1, -1), (1, -B), (1, -B - 1), (1, 0), (1, B - 1)]
    out = bucket_counts(_mk(spark, rows), bucket_sec=10).collect()
    # bucket_start_us is exactly index*B, so Python floor-div recovers
    # the index losslessly
    got = {r.bucket_start_us // B: r.n_events for r in out}
    import duckdb

    want = {
        r[0]: r[1]
        for r in duckdb.sql(
            "SELECT us // 10000000 AS b, count(*) FROM (VALUES (-1), "
            "(-10000000), (-10000001), (0), (9999999)) t(us) GROUP BY b"
        ).fetchall()
    }
    assert got == want
    # truncation semantics explicitly: -1us joins bucket 0, -B-1 joins -1
    assert got[0] == 3 and got[-1] == 2
