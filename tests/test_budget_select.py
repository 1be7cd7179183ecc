"""budget_select: token-budget greedy fill.  A pure-Python twin
replays the naive global rule (score desc, md5-hash asc, id asc;
keep while cum <= budget); the decomposed histogram+boundary-cell
form must match it exactly for every budget and cell width.  Edge
cases: zero budget with zero-token docs, an over-budget giant up
front, exact cell boundaries, fail-loud NULL validation, and a plan
pin that the only corpus-row window is partitioned by (score, cell)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from sagan_spark.ops.sampling import budget_select

ROWS = [
    # (doc_id, score, n_tokens)
    (1, 3, 100), (2, 3, 50), (3, 3, 0), (4, 2, 75), (5, 2, 25),
    (6, 1, 10), (7, 1, 10), (8, 3, 200), (9, 0, 5), (10, 2, 0),
    (11, 3, 40), (12, 1, 999),
]


def _h(i, salt="budget"):
    return hashlib.md5(f"{salt}|{i}".encode()).hexdigest()[:8]


def _py_select(rows, budget):
    # the naive SQL rule: running sum over the full total order,
    # keep while cum-through-doc <= budget
    order = sorted(rows, key=lambda r: (-r[1], _h(r[0]), r[0]))
    kept_sql, cum = [], 0
    for r in order:
        cum += r[2]
        if cum <= budget:
            kept_sql.append(r[0])
    return set(kept_sql)


@pytest.mark.parametrize("budget", [0, 5, 100, 155, 300, 10**6])
@pytest.mark.parametrize("cell_chars", [1, 2])
def test_budget_select_matches_naive(spark, budget, cell_chars):
    df = spark.createDataFrame(ROWS, "doc_id long, score long, n_tokens long")
    got = {r["doc_id"] for r in
           budget_select(df, budget, cell_chars=cell_chars).collect()}
    assert got == _py_select(ROWS, budget)


def test_budget_zero_keeps_zero_token_docs_at_front(spark):
    # the positive-token doc scores lower, so it sorts after both
    # zero-token docs regardless of hash order
    rows = [(1, 5, 0), (2, 5, 0), (3, 4, 7)]
    df = spark.createDataFrame(rows, "doc_id long, score long, n_tokens long")
    got = {r["doc_id"] for r in budget_select(df, 0).collect()}
    # the zero-token docs survive a zero budget (cum stays 0 <= 0);
    # the positive-token doc cannot
    assert got == _py_select(rows, 0) == {1, 2}


def test_budget_giant_first_doc_blocks_nothing_later(spark):
    rows = [(1, 9, 10**9), (2, 1, 5)]
    df = spark.createDataFrame(rows, "doc_id long, score long, n_tokens long")
    assert {r["doc_id"] for r in budget_select(df, 100).collect()} == set()


def test_budget_select_rejects_null_and_negative(spark):
    bad_null = spark.createDataFrame(
        [(1, 1, None)], "doc_id long, score long, n_tokens long")
    with pytest.raises(Exception, match="budget_select"):
        budget_select(bad_null, 10).collect()
    bad_neg = spark.createDataFrame(
        [(1, 1, -4)], "doc_id long, score long, n_tokens long")
    with pytest.raises(Exception, match="budget_select"):
        budget_select(bad_neg, 10).collect()
    bad_score = spark.createDataFrame(
        [(1, None, 4)], "doc_id long, score long, n_tokens long")
    with pytest.raises(Exception, match="budget_select"):
        budget_select(bad_score, 10).collect()


def test_budget_select_plan_windows_are_bounded(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, score long, n_tokens long")
    plan = (budget_select(df, 100)._jdf.queryExecution()
            .executedPlan().toString())
    # corpus rows flow only through the (score, cell)-partitioned
    # window; the unpartitioned cumulative window runs on the
    # aggregated cells frame (post-HashAggregate), never raw rows
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Window" in line and "windowspecdefinition" in line:
            if "_sg_cell" not in line:
                # the cells-frame window: must sit above an aggregate
                assert any("HashAggregate" in l for l in lines[i:]), line
