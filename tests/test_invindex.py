"""inverted_index spec: exact postings on a tiny corpus, hot-term cap
with true df preserved, and salt-bucket invariance of the capped list."""

from __future__ import annotations

from sagan_spark.ops.invindex import inverted_index


def _index(spark, rows, **kw):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["token"]: r for r in inverted_index(docs, **kw).collect()}


def test_exact_postings_and_order(spark):
    out = _index(
        spark,
        [(1, "a a b"), (2, "a b b b"), (3, "c")],
        max_postings=10,
    )
    # tf DESC then doc_id ASC
    assert out["a"]["postings"] == "1:2,2:1"
    assert out["b"]["postings"] == "2:3,1:1"
    assert out["c"]["postings"] == "3:1"
    assert out["a"]["df_count"] == 2 and out["a"]["n_postings"] == 2


def test_cap_keeps_true_df(spark):
    rows = [(i, "hot " * (i + 1)) for i in range(20)]
    out = _index(spark, rows, max_postings=5)
    hot = out["hot"]
    assert hot["df_count"] == 20
    assert hot["n_postings"] == 5
    # highest tf docs are the last ids (tf = doc_id + 1)
    assert hot["postings"] == "19:20,18:19,17:18,16:17,15:16"


def test_salt_bucket_invariance(spark):
    from pyspark.sql import functions as F

    from sagan_spark.ops.textstats import TOKEN_RE
    from sagan_spark.ops.topk import topk_per_group

    docs = spark.createDataFrame(
        [(i, f"w{i % 3} w{i % 5} common") for i in range(40)],
        "doc_id long, text string",
    )
    tf = (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), F.lit(0))
            ).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    order = [F.col("tf").desc(), F.col("doc_id").asc()]
    got = {
        b: sorted(
            (r["token"], r["doc_id"], r["rank"])
            for r in topk_per_group(
                tf, ["token"], order, k=4, salt_on="doc_id", salt_buckets=b
            ).collect()
        )
        for b in (1, 7, 64)
    }
    assert got[1] == got[7] == got[64]
