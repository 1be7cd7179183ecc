"""snapshot_diff spec: verdict semantics, multi-capture collapse,
NULL-text digests; minhash_calibration deciles spot-checked here too
(shares the dedup candidate core)."""

from __future__ import annotations

from sagan_spark.ops.crawldiff import diff_counts, snapshot_diff


def _diff(spark, old_rows, new_rows):
    old = spark.createDataFrame(old_rows, "url string, text string")
    new = spark.createDataFrame(new_rows, "url string, text string")
    return {r["url"]: r for r in snapshot_diff(old, new).collect()}


def test_verdicts(spark):
    got = _diff(
        spark,
        [("u1", "same"), ("u2", "old text"), ("u3", "gone")],
        [("u1", "same"), ("u2", "new text"), ("u4", "fresh")],
    )
    assert got["u1"]["verdict"] == "unchanged"
    assert got["u2"]["verdict"] == "changed"
    assert got["u3"]["verdict"] == "removed"
    assert got["u4"]["verdict"] == "added"
    assert got["u3"]["new_digest"] is None
    assert got["u4"]["old_digest"] is None


def test_multicapture_collapse_is_deterministic(spark):
    # duplicate captures collapse to the min digest on BOTH sides:
    # same multiset of texts -> unchanged regardless of row order
    got = _diff(
        spark,
        [("u", "a"), ("u", "b")],
        [("u", "b"), ("u", "a")],
    )
    assert got["u"]["verdict"] == "unchanged"


def test_null_text_digests_as_empty(spark):
    got = _diff(spark, [("u", None)], [("u", "")])
    assert got["u"]["verdict"] == "unchanged"


def test_counts_rollup(spark):
    old = spark.createDataFrame(
        [("a", "1"), ("b", "2")], "url string, text string"
    )
    new = spark.createDataFrame(
        [("b", "2x"), ("c", "3")], "url string, text string"
    )
    got = {r["verdict"]: r["n_urls"] for r in diff_counts(old, new).collect()}
    assert got == {"removed": 1, "changed": 1, "added": 1}


def test_minhash_calibration_deciles(spark):
    from sagan_spark.ops.dedup import minhash_calibration

    # identical docs -> decile 10 with all bands shared
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps")],
        "doc_id long, text string",
    )
    rows = minhash_calibration(docs, k=8, n_bands=4).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_shared_bands"] == 4
    assert r["jaccard_decile"] == 10
    assert r["n_pairs"] == 1
