"""Substantiates the repeated 100 TB-posture claim that co-located
(bucketed) table layouts remove the join/aggregation exchanges: the
same operators that shuffle on plain parquet plan WITHOUT an Exchange
on the join keys when both sides are bucketed by that key — the local
stand-in for an Iceberg bucket-partitioned warehouse."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
    )
    seen = spark.range(0, 2000, 3).select(
        F.col("id").alias("doc_id"), F.lit("seen").alias("src")
    )
    for name, df in (("b_docs", docs), ("b_seen", seen)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(8, "doc_id")
            .sortBy("doc_id")
            .option("path", str(wh / name))
            .format("parquet")
            .saveAsTable(name)
        )
    # force the non-broadcast join path: at test scale Spark would
    # otherwise broadcast (and mark the bucketing "disabled by query
    # planner"); at warehouse scale both sides are far past the
    # broadcast threshold and the bucketed sort-merge path is the one
    # that matters
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield "b_docs", "b_seen"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    for name in ("b_docs", "b_seen"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_anti_join_plans_without_exchange(spark, bucketed_tables):
    """The incremental-dedup anti-join (novel_docs' shape) keyed on the
    bucket column: bucketed sides co-locate, so the executed plan
    carries NO Exchange — on plain parquet the same join shuffles
    both sides."""
    d, s = bucketed_tables
    docs, seen = spark.table(d), spark.table(s)
    out = docs.join(seen, "doc_id", "left_anti")
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    assert "Bucketed: true" in plan
    # sanity: the same join over unbucketed frames DOES shuffle
    plain = docs.limit(10**9).join(seen.limit(10**9), "doc_id", "left_anti")
    plain.count()
    assert "Exchange hashpartitioning" in (
        plain._jdf.queryExecution().executedPlan().toString()
    )


def test_bucketed_aggregation_plans_without_exchange(spark, bucketed_tables):
    """A groupBy on the bucket key (the exact-dedup digest-agg shape
    when the corpus is laid out by its dedup key) needs no exchange
    either."""
    d, _ = bucketed_tables
    agg = spark.table(d).groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    agg.count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
