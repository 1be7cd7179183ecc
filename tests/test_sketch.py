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


def py_hll_rank(key: str, p: int = 10):
    h = int(hashlib.md5(f"hll|{key}".encode()).hexdigest()[:15], 16)
    w = 60 - p
    bucket = h >> w
    rem = h & ((1 << w) - 1)
    rank = (w + 1) if rem == 0 else w - rem.bit_length() + 1
    return bucket, rank


def test_hll_registers_match_python_twin(spark):
    from sagan_spark.ops.sketch import hll_distinct

    keys = [f"tok{i}" for i in range(200)]
    items = spark.createDataFrame(
        [("g", k) for k in keys], "grp string, key string"
    )
    row = hll_distinct(items, p=10).collect()[0]
    # python replay of the estimate
    regs = {}
    for k in keys:
        b, r = py_hll_rank(k)
        regs[b] = max(regs.get(b, 0), r)
    m, w = 1 << 10, 50
    alpha_ppm = int(1_000_000 * 0.7213 / (1 + 1.079 / m))
    num = alpha_ppm * m * m * (1 << (w + 1))
    s = sum(1 << (w + 1 - mx) for mx in regs.values()) + (
        m - len(regs)
    ) * (1 << (w + 1))
    assert row["est"] == num // (s * 1_000_000)
    assert row["exact"] == 200
    assert row["n_zero_buckets"] == m - len(regs)


def test_hll_estimate_accuracy(spark):
    from sagan_spark.ops.sketch import hll_distinct

    n = 5000
    items = spark.createDataFrame(
        [("g", f"k{i % n}") for i in range(2 * n)], "grp string, key string"
    )
    row = hll_distinct(items, p=10).collect()[0]
    # standard error ~ 1.04/sqrt(1024) ~ 3.3%; allow 4 sigma
    assert abs(row["est"] - n) < 0.14 * n
    assert row["exact"] == n
