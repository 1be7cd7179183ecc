"""soft_dedup_weights: exact-digest mode vs a Counter twin, and
cluster mode (docs absent from the cluster frame weigh as
singletons; integer ppm division)."""

from __future__ import annotations

from collections import Counter

from sagan_spark.ops.dedup import soft_dedup_weights

DOCS = [
    (1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "ccc"), (5, "aaa"),
    (6, "bbb"), (7, "unique"),
]


def test_exact_mode_matches_counter_twin(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_copies"], r["weight_ppm"])
           for r in soft_dedup_weights(df).collect()}
    counts = Counter(t for _, t in DOCS)
    want = {i: (counts[t], 1_000_000 // counts[t]) for i, t in DOCS}
    assert got == want
    assert got[1] == (3, 333_333)   # integer ppm, floor division
    assert got[7] == (1, 1_000_000)


def test_cluster_mode_singletons_default_to_one(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    # verified near-dup clusters: {1,3,5,7} under comp 1; {2,6} under 2
    comps = spark.createDataFrame(
        [(1, 1), (3, 1), (5, 1), (7, 1), (2, 2), (6, 2)],
        "node long, comp long",
    )
    got = {r["doc_id"]: (r["n_copies"], r["weight_ppm"])
           for r in soft_dedup_weights(df, clusters=comps).collect()}
    assert got[1] == got[3] == got[5] == got[7] == (4, 250_000)
    assert got[2] == got[6] == (2, 500_000)
    assert got[4] == (1, 1_000_000)   # absent from clusters -> singleton
    # expected total training mass == number of distinct clusters (x1e6)
    assert sum(w for _, w in got.values()) == 3 * 1_000_000
