"""As-of join (ops/asof.py): both execution shapes equal a pure-Python
twin of the max(struct(ts, payload)) spec (ties, no-match, NULL ts,
cross-bucket carry, tolerance), agree with each other across bucket
widths, and carry the right plan shapes (broadcast scan-level for the
compact mode; bucket-partitioned event windows for the general one)."""

from __future__ import annotations

import datetime as dt
import re

from sagan_spark.ops.asof import asof_join, asof_join_compact

US = 1_000_000


def _t(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


LEFT = [
    (1, 10, _t("2026-01-05 12:00:00")),   # match middle snapshot
    (2, 10, _t("2026-01-01 00:00:00")),   # exactly equal ts counts
    (3, 10, _t("2025-12-31 23:59:59")),   # before all snapshots
    (4, 11, _t("2026-02-01 00:00:00")),   # carry from weeks earlier
    (5, 12, _t("2026-01-02 00:00:00")),   # key without snapshots
    (6, 11, None),                        # NULL ts never matches
    (7, 10, _t("2026-01-10 00:00:00")),   # equal-ts snapshot tie
]
RIGHT = [
    (10, _t("2026-01-01 00:00:00"), "a"),
    (10, _t("2026-01-04 08:00:00"), "b"),
    (10, _t("2026-01-08 00:00:00"), "t1"),
    (10, _t("2026-01-08 00:00:00"), "t2"),
    (11, _t("2026-01-03 00:00:00"), "z"),
]


def _py_asof(left, right, max_age_sec=None):
    out = []
    for eid, k, ts in left:
        best = None
        if ts is not None:
            cands = [
                (int(rts.timestamp() * US), p)
                for rk, rts, p in right
                if rk == k and rts <= ts
            ]
            if max_age_sec is not None:
                cands = [
                    c for c in cands
                    if int(ts.timestamp() * US) - c[0] <= max_age_sec * US
                ]
            best = max(cands) if cands else None
        out.append((eid, best[0] if best else None, best[1] if best else None))
    return sorted(out)


def _frames(spark):
    l = spark.createDataFrame(LEFT, "event_id long, user_id long, ts timestamp")
    r = spark.createDataFrame(RIGHT, "user_id long, ts timestamp, snapshot string")
    return l, r


def test_asof_modes_match_python_twin(spark):
    l, r = _frames(spark)
    want = _py_asof(LEFT, RIGHT)
    for fn in (asof_join_compact, asof_join):
        got = sorted(
            (x.event_id, x.right_ts_us, x.snapshot) for x in fn(l, r).collect()
        )
        assert got == want, fn.__name__


def test_asof_bucket_width_invariance(spark):
    l, r = _frames(spark)
    ref = sorted(
        (x.event_id, x.right_ts_us, x.snapshot)
        for x in asof_join_compact(l, r).collect()
    )
    for bucket in (3600, 86400, 7 * 86400, 10**9):
        got = sorted(
            (x.event_id, x.right_ts_us, x.snapshot)
            for x in asof_join(l, r, bucket_sec=bucket).collect()
        )
        assert got == ref, f"bucket_sec={bucket}"


def test_asof_tolerance(spark):
    l, r = _frames(spark)
    want = _py_asof(LEFT, RIGHT, max_age_sec=3 * 86400)
    for fn in (asof_join_compact, asof_join):
        got = sorted(
            (x.event_id, x.right_ts_us, x.snapshot)
            for x in fn(l, r, max_age_sec=3 * 86400).collect()
        )
        assert got == want, fn.__name__
    # event 1 (age 1.2d) survives, event 4 (age 29d) goes stale-NULL
    d = dict((e, s) for e, _, s in want)
    assert d[1] == "b" and d[4] is None


def test_asof_compact_plan_scan_level(spark):
    """The event side must not shuffle or sort: dimension broadcast,
    per-row array probe, no Window, no SortMergeJoin, no Python."""
    l, r = _frames(spark)
    plan = (
        asof_join_compact(l, r)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan
    assert "EvalPython" not in plan


def test_asof_bucketed_event_windows_bucketed(spark):
    """Skew pin (the sessionize discipline): every window ordering raw
    timestamps must be partitioned by (key, bucket); key-alone windows
    may only ride the bucket-stats frame (ordered by _sg_b)."""
    l, r = _frames(spark)
    plan = asof_join(l, r)._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "no windows found — plan changed shape?"
    event_specs = [s for s in specs if re.search(r"_sg_us#\d+L ASC", s)]
    bucket_specs = [s for s in specs if s not in event_specs]
    assert event_specs, "event-level window missing"
    for s in event_specs:
        assert "_sg_b#" in s, f"event window not bucket-partitioned: {s}"
    for s in bucket_specs:
        assert re.search(r"_sg_b#\d+L ASC", s), f"unexpected window: {s}"
    assert "EvalPython" not in plan
