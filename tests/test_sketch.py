"""Count-min sketch spec: one-sided error (estimate >= exact, always),
exact estimates at collision-free widths, forced-collision
overestimates at width 1, absent-key behavior, and a pure-Python twin
of the md5 cell function."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sagan_spark.ops.sketch import cm_build, cm_estimate, cm_heavy_hitters


def py_cell(key: str, d: int, width: int) -> int:
    return int(hashlib.md5(f"cm{d}|{key}".encode()).hexdigest()[:8], 16) % width


def _items(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


def test_cells_match_python_twin(spark):
    items = _items(spark, ["alpha", "beta"])
    rows = cm_build(items, width=64, depth=3).collect()
    want = {}
    for k in ["alpha", "beta"]:
        for d in range(3):
            want[(d, py_cell(k, d, 64))] = want.get((d, py_cell(k, d, 64)), 0) + 1
    got = {(r["d"], r["cell"]): r["n"] for r in rows}
    assert got == want


def test_one_sided_error_and_exactness(spark):
    keys = ["a"] * 5 + ["b"] * 3 + ["c"] * 1 + ["d"] * 7
    items = _items(spark, keys)
    probes = _items(spark, ["a", "b", "c", "d", "absent"])
    got = {
        r["key"]: (r["est"], r["exact"])
        for r in cm_heavy_hitters(items, probes, width=4096, depth=4).collect()
    }
    for k, n in [("a", 5), ("b", 3), ("c", 1), ("d", 7)]:
        est, exact = got[k]
        assert exact == n
        assert est >= exact  # one-sided, always
        # at width 4096 with 4 keys, collisions in ALL 4 rows are
        # astronomically unlikely — estimates are exact
        assert est == n
    assert got["absent"][1] == 0 and got["absent"][0] >= 0


def test_width_one_forces_total_collision(spark):
    items = _items(spark, ["x"] * 2 + ["y"] * 3)
    probes = _items(spark, ["x"])
    sk = cm_build(items, width=1, depth=2)
    est = cm_estimate(sk, probes, width=1, depth=2).collect()[0]
    assert est["est"] == 5  # every key lands in the single cell


def test_sketch_size_is_bounded(spark):
    items = _items(spark, [f"k{i}" for i in range(500)])
    n_cells = cm_build(items, width=16, depth=3).count()
    assert n_cells <= 16 * 3


def test_plan_probe_join_broadcasts(spark):
    items = _items(spark, ["a", "b"])
    probes = _items(spark, ["a"])
    sk = cm_build(items, width=8, depth=2)
    plan = (
        cm_estimate(sk, probes, width=8, depth=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, "sketch join must broadcast"
    assert "EvalPython" not in plan
