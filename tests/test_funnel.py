"""Funnel + cohort retention: window-free aggregation chains must
match a literal global-definition twin."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sagan_spark.ops.funnel import cohort_retention, funnel_counts, funnel_stages

US = 1_000_000
DAY = 86_400_000_000


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, us long"
    ).select(
        "user_id", "event_type", F.timestamp_micros(F.col("us")).alias("ts")
    )


def test_funnel_stages_chain(spark):
    """Per-user chained minima: out-of-order stage events don't count
    (a click BEFORE the first view is ignored), same-microsecond
    counts (>=), and the chain breaks independently per user."""
    rows = [
        # user 1: click before first view ignored; full funnel later
        (1, "click", 10 * US),
        (1, "view", 20 * US),
        (1, "click", 30 * US),
        (1, "purchase", 25 * US),   # before click -> not after stage2
        (1, "purchase", 40 * US),
        # user 2: view only
        (2, "view", 5 * US),
        (2, "purchase", 50 * US),   # no click: chain broken at stage 2
        # user 3: same-microsecond view+click (>= counts)
        (3, "view", 7 * US),
        (3, "click", 7 * US),
        # user 4: no view at all -> absent from output
        (4, "click", 1 * US),
    ]
    got = {
        r.user_id: (r.view_us, r.click_us, r.purchase_us)
        for r in funnel_stages(
            _mk(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {
        1: (20 * US, 30 * US, 40 * US),
        2: (5 * US, None, None),
        3: (7 * US, 7 * US, None),
    }
    counts = {
        (r.stage_idx, r.stage): r.keys_reached
        for r in funnel_counts(
            _mk(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert counts == {
        (1, "view"): 3,
        (2, "click"): 2,
        (3, "purchase"): 1,
    }


def test_funnel_fuzz_vs_twin(spark):
    """300 hash-placed events, twin = literal per-user scan."""
    stages = ["view", "click", "purchase"]
    types = stages + ["error", "signup"]
    rows = []
    for i in range(300):
        h = hashlib.md5(f"fun{i}".encode()).digest()
        rows.append(
            (h[0] % 25, types[h[1] % 5], int.from_bytes(h[2:6], "big") % (10**9))
        )
    by_user = {}
    for u, t, us in rows:
        by_user.setdefault(u, []).append((us, t))
    want = {}
    for u, evs in by_user.items():
        evs.sort()
        ts = [None, None, None]
        for i, s in enumerate(stages):
            prev = 0 if i == 0 else ts[i - 1]
            if prev is None:
                break
            cand = [us for us, t in evs if t == s and us >= prev]
            ts[i] = min(cand) if cand else None
        if ts[0] is not None:
            want[u] = tuple(ts)
    got = {
        r.user_id: (r.view_us, r.click_us, r.purchase_us)
        for r in funnel_stages(_mk(spark, rows), stages).collect()
    }
    assert got == want


def test_cohort_retention(spark):
    """Integer epoch-day cohorts; repeat events on one day count once;
    the midnight boundary is exact (us = k*DAY belongs to day k)."""
    rows = [
        (1, "view", 0),                 # day 0 (cohort 0)
        (1, "click", DAY - 1),          # still day 0
        (1, "view", DAY),               # exactly midnight -> day 1
        (1, "view", DAY + 5),           # same day, counts once
        (2, "view", 3 * DAY + 7),       # cohort 3
        (2, "error", 5 * DAY),          # offset 2
    ]
    got = {
        (r.cohort_day, r.day_offset): r.active_keys
        for r in cohort_retention(_mk(spark, rows)).collect()
    }
    assert got == {
        (0, 0): 1,
        (0, 1): 1,
        (3, 0): 1,
        (3, 2): 1,
    }


def test_active_users_twin(spark):
    """DAU/WAU equal a set-based python twin, including the
    carry-forward day (wau > 0, dau = 0) and NULL-ts drop."""
    import datetime as dt

    from sagan_spark.ops.funnel import active_users

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 10, base),
        (2, 11, base),
        (3, 10, base),                              # same-day dup key
        (4, 10, base + dt.timedelta(days=1)),
        (5, 12, base + dt.timedelta(days=9)),       # gap: days 2..8 empty
        (6, 13, None),                              # dropped
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    got = {r.day: (r.dau, r.wau) for r in active_users(ev, 3).collect()}
    days = {}
    for _, k, ts in rows:
        if ts is None:
            continue
        d = int(ts.timestamp()) // 86400
        days.setdefault(d, set()).add(k)
    want = {}
    all_days = set()
    maxd = max(days)
    for d in days:
        # report range clamps at the last observed day (no phantom
        # trailing wau>0/dau=0 days past the end of the data)
        all_days.update(range(d, min(d + 3, maxd + 1)))
    for rd in all_days:
        w = set().union(*[days.get(d, set()) for d in range(rd - 2, rd + 1)])
        if w:
            want[rd] = (len(days.get(rd, set())), len(w))
    assert got == want
    assert max(got) == maxd  # the day-9 event emits no day-10/11 rows
    d0 = int(base.timestamp()) // 86400
    assert got[d0 + 2] == (0, 2)  # pure carry-forward day

    import pytest as _pytest
    with _pytest.raises(ValueError):
        active_users(ev, 0)


def test_funnel_windowed_twin(spark):
    """Conversion-window funnel equals a greedy python twin; the
    unbounded default is unchanged and validation fails loud."""
    import datetime as dt

    from sagan_spark.ops.funnel import funnel_stages

    base = dt.datetime(2024, 1, 1)

    def T(m):
        return base + dt.timedelta(minutes=m)

    rows = [
        # u1: view 0, click 30 (inside 1h), purchase 200 (outside 1h of 30)
        (1, 1, "view", T(0)), (2, 1, "click", T(30)), (3, 1, "purchase", T(200)),
        # u2: full chain inside windows
        (4, 2, "view", T(0)), (5, 2, "click", T(10)), (6, 2, "purchase", T(50)),
        # u3: greedy trap — earliest click at +30 breaks the purchase
        # window even though click at +120 would have connected
        (7, 3, "view", T(0)), (8, 3, "click", T(30)), (9, 3, "click", T(120)),
        (10, 3, "purchase", T(170)),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    got = {
        r.user_id: (r.view_us is not None, r.click_us is not None,
                    r.purchase_us is not None)
        for r in funnel_stages(
            ev, ["view", "click", "purchase"], max_gap_sec=3600
        ).collect()
    }
    assert got == {
        1: (True, True, False),
        2: (True, True, True),
        3: (True, True, False),  # greedy: click@30 pins the window
    }
    # unbounded: all three complete
    got_u = {
        r.user_id: r.purchase_us is not None
        for r in funnel_stages(ev, ["view", "click", "purchase"]).collect()
    }
    assert got_u == {1: True, 2: True, 3: True}

    import pytest as _pytest
    with _pytest.raises(ValueError):
        funnel_stages(ev, ["view"], max_gap_sec=-1)
