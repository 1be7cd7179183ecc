"""Exact histogram quantiles: hand-computed lower-empirical-quantile
cases (duplicate values, exact ceil boundaries, single-value keys) and
the plan pin that windows only touch the histogram frame."""

from __future__ import annotations

from sagan_spark.ops.quantiles import quantile_rollup


def _mk(spark, rows):
    return spark.createDataFrame(rows, "event_type string, value double")


def test_quantile_hand_cases(spark):
    rows = (
        # key a: values 1..10 once each -> p50=5 (cum 5 >= 0.5*10),
        # p95=10 (cum 10 >= 9.5), p99=10
        [("a", float(v)) for v in range(1, 11)]
        # key b: heavy duplicates: 1 x9, 100 x1 -> n=10,
        # p50=1 (cum 9 >= 5), p95=100 (need cum >= 9.5 -> 100), p99=100
        + [("b", 1.0)] * 9 + [("b", 100.0)]
        # key c: single value
        + [("c", 7.0)]
        # NULLs dropped entirely
        + [("d", None)]
    )
    got = {
        (r.event_type, r.q_ppm): (r.n_events, r.q_value)
        for r in quantile_rollup(_mk(spark, rows)).collect()
    }
    assert got == {
        ("a", 500000): (10, 5.0),
        ("a", 950000): (10, 10.0),
        ("a", 990000): (10, 10.0),
        ("b", 500000): (10, 1.0),
        ("b", 950000): (10, 100.0),
        ("b", 990000): (10, 100.0),
        ("c", 500000): (1, 7.0),
        ("c", 950000): (1, 7.0),
        ("c", 990000): (1, 7.0),
    }


def test_quantile_exact_ceil_boundary(spark):
    # n=4, p50: cum*1e6 >= 500000*4 -> cum >= 2 -> the 2nd value
    # (lower quantile, no interpolation); p75 would need cum >= 3
    rows = [("k", 1.0), ("k", 2.0), ("k", 3.0), ("k", 4.0)]
    got = {
        r.q_ppm: r.q_value
        for r in quantile_rollup(
            _mk(spark, rows), quantiles_ppm=(500000, 750000, 1000000)
        ).collect()
    }
    assert got == {500000: 2.0, 750000: 3.0, 1000000: 4.0}


def test_quantiles_window_only_the_histogram(spark):
    """Windows must sit above the (key, value) histogram aggregation
    (partial_count below the shuffle), the quantile list must arrive
    as a broadcast join, and nothing runs in Python."""
    qe = quantile_rollup(_mk(spark, [("k", 1.0)]))._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "partial_count" in plan, "map-side partial count missing"
    assert "Window" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Python" not in plan and "BatchEval" not in plan


# ---------------------------------------------------------------------------
# multi-resolution time rollup (ops/rollup.py) — same events family
# ---------------------------------------------------------------------------


def test_time_rollup_cascade_equals_direct(spark):
    """The cascaded coarse levels equal a direct python aggregation of
    raw events at every resolution (the nesting-grid exactness
    argument), including NULL ts drop and NULL value semantics."""
    import datetime as dt
    import math
    from collections import defaultdict

    from sagan_spark.ops.rollup import time_rollup

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(500):
        rows.append(
            (i, "a" if i % 3 else "b",
             base + dt.timedelta(seconds=37 * i),
             (i % 17) - 5 + 0.25 * (i % 4))
        )
    rows.append((1000, "a", None, 1.0))           # NULL ts dropped
    rows.append((1001, "a", base, None))          # NULL value counted
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    got = sorted(
        (r.resolution_sec, r.key, r.bucket_us, r.n_events, r.sum_milli,
         r.min_milli, r.max_milli)
        for r in time_rollup(ev).collect()
    )
    want = []
    for res in (60, 3600, 86400):
        agg = defaultdict(list)
        cnt = defaultdict(int)
        for _, k, ts, v in rows:
            if ts is None:
                continue
            us = int(ts.timestamp() * 1_000_000)
            b = (us // (res * 1_000_000)) * (res * 1_000_000)
            cnt[(k, b)] += 1
            if v is not None:
                agg[(k, b)].append(math.floor(v * 1000))
        for (k, b), n in cnt.items():
            ms = agg.get((k, b), [])
            want.append(
                (res, k, b, n, sum(ms) if ms else None,
                 min(ms) if ms else None, max(ms) if ms else None)
            )
    assert got == sorted(want)


def test_time_rollup_validation(spark):
    import pytest as _pytest

    from sagan_spark.ops.rollup import time_rollup

    ev = spark.createDataFrame(
        [(1, "a", None, 1.0)],
        "event_id long, event_type string, ts timestamp, value double",
    )
    with _pytest.raises(ValueError):
        time_rollup(ev, resolutions=(60, 90))  # 90 not a multiple
    with _pytest.raises(ValueError):
        time_rollup(ev, resolutions=())


def test_time_rollup_single_scan(spark):
    """The cascade must scan the corpus exactly ONCE: coarse levels
    ride an explode over the finest rollup, never their own scan (an
    AQE union would compile per-level stages with no exchange
    reuse)."""
    import datetime as dt

    from sagan_spark.ops.rollup import time_rollup

    ev = spark.createDataFrame(
        [(1, "a", dt.datetime(2024, 1, 1), 1.0)],
        "event_id long, event_type string, ts timestamp, value double",
    )
    plan = time_rollup(ev)._jdf.queryExecution().executedPlan().toString()
    scans = plan.count("Scan ExistingRDD") + plan.count("FileScan")
    assert scans == 1, f"corpus scanned {scans}x:\n{plan[:2000]}"
    assert "Union" not in plan, "cascade must not be a per-level union"
    assert "partial_count" in plan
    assert "EvalPython" not in plan and "Window" not in plan


def test_percentile_features_twin_and_plan(spark):
    """pct_ppm equals the brute-force strict-below count (ties share a
    value; singleton group 0; NULL scores dropped) and the only window
    rides the (group, score) histogram, never the raw rows."""
    from sagan_spark.ops.quantiles import percentile_features

    rows = [
        (1, "en", 10), (2, "en", 20), (3, "en", 20), (4, "en", 40),
        (5, "de", 7), (6, "zz", None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, score long")
    got = {
        r.doc_id: (r.n_below, r.pct_ppm)
        for r in percentile_features(docs, "score").collect()
    }
    want = {}
    for i, g, s in rows:
        if s is None:
            continue
        grp = [x for _, gg, x in rows if gg == g and x is not None]
        nb = sum(1 for x in grp if x < s)
        n = len(grp)
        want[i] = (nb, (1_000_000 * nb) // (n - 1) if n > 1 else 0)
    assert got == want
    assert 6 not in got  # NULL dropped
    assert got[2] == got[3]  # ties share

    plan = (
        percentile_features(docs, "score")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the window input must be the aggregated histogram (partial_count
    # below it), not raw rows
    assert "Window" in plan and "partial_count" in plan
    assert "EvalPython" not in plan
