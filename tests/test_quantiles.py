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
