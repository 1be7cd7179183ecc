"""pmi_collocations spec: hand-computed lift on a tiny corpus, clamp
behavior, and min_count pruning.  Containment (ops/dedup) spot-checks
live here too — both are corpus-pair statistics."""

from __future__ import annotations

import math

from sagan_spark.ops.collocations import pmi_collocations


def test_pmi_hand_computed(spark):
    # corpus: "a b" x3 docs, "a c" x1 doc
    # tokens: a=4, b=3, c=1, N=8; pairs: (a,b)=3, (a,c)=1, P=4
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c")],
        "doc_id long, text string",
    )
    out = {
        (r["tok_left"], r["tok_right"]): r
        for r in pmi_collocations(docs, min_count=1).collect()
    }
    ab = out[("a", "b")]
    assert ab["pair_count"] == 3
    # lift = (3/4) / ((4/8)*(3/8)) = 4.0 -> 4000 milli
    assert ab["lift_milli"] == 4000
    ac = out[("a", "c")]
    # lift = (1/4) / ((4/8)*(1/8)) = 4.0
    assert ac["lift_milli"] == 4000
    assert len(out) == 2  # no other adjacent pairs


def test_min_count_prunes(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )
    out = pmi_collocations(docs, min_count=2).collect()
    assert [(r["tok_left"], r["tok_right"]) for r in out] == [("a", "b")]


def test_lift_floor_matches_float_chain(spark):
    # uneven counts so lift is non-integral: check the pinned floor
    docs = spark.createDataFrame(
        [(1, "x y z x y"), (2, "x y x")], "doc_id long, text string"
    )
    # tokens: x=4 y=3 z=1 N=8; pairs: (x,y)=3 (y,z)=1 (z,x)=1 (y,x)=1 P=6
    out = {
        (r["tok_left"], r["tok_right"]): r["lift_milli"]
        for r in pmi_collocations(docs, min_count=1).collect()
    }
    want_xy = math.floor(1000.0 * 3 * 8 * 8 / (6 * 4 * 3))
    assert out[("x", "y")] == want_xy
    want_yz = math.floor(1000.0 * 1 * 8 * 8 / (6 * 3 * 1))
    assert out[("y", "z")] == want_yz


def test_containment_asymmetric_pair(spark):
    from sagan_spark.ops.dedup import containment_pairs

    short = "the quick brown fox jumps over the lazy dog"
    long = (
        "unrelated preamble text here. "
        + short
        + " and a long unrelated tail that keeps jaccard low for sure."
    )
    docs = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string"
    )
    rows = containment_pairs(docs, k=8, n_bands=4, threshold=0.9).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    # every shingle of the short doc appears in the long doc
    assert r["containment_a"] == 1.0
    assert r["containment_b"] < 0.75
