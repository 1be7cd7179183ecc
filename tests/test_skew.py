"""Hot-key skew machinery (north_rule): salted counts, hot-key
detection, isolation, and result-invariance of the engine under
isolation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sagan_spark.pipeline.engine import SaganSparkEngine
from sagan_spark.pipeline.skew import detect_hot_keys, isolate_hot_keys, salted_count
from sagan_spark.rules.compiler import EngineConfig
from sagan_spark.rules.parser import parse_rules


@pytest.fixture(scope="module")
def skewed(spark):
    # one key owns ~70% of rows
    df = spark.range(2000).select(
        F.when(F.col("id") % 10 < 7, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 97).cast("string"))
        ).alias("key"),
        F.col("id"),
    )
    return df


def test_salted_count_equals_plain(spark, skewed):
    plain = {r.key: r.n for r in skewed.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r.key: r.n for r in salted_count(skewed, ["key"]).collect()}
    assert salted == plain


def test_detect_hot_keys(spark, skewed):
    hot = detect_hot_keys(skewed, ["key"], sample_fraction=0.5, hot_share=0.3)
    assert ("hot",) in hot
    assert len(hot) == 1


def test_isolation_preserves_key_grouping(spark, skewed):
    out = isolate_hot_keys(skewed, ["key"], 8, [("hot",)])
    # every key's rows land in exactly one partition
    pid = out.withColumn("pid", F.spark_partition_id())
    per_key = pid.groupBy("key").agg(F.count_distinct("pid").alias("np")).collect()
    assert all(r.np == 1 for r in per_key)
    assert out.count() == skewed.count()


def test_engine_result_invariant_under_isolation(spark, pages_path, fixture_rules):
    pages = spark.read.parquet(pages_path)
    base = SaganSparkEngine(fixture_rules)
    iso = SaganSparkEngine(fixture_rules, EngineConfig(hot_key_isolation=True))
    frame = base.frame_from_pages(pages)
    a = {(r.event_key, r.sid) for r in base.run(frame).alerts().select("event_key", "sid").collect()}
    b = {(r.event_key, r.sid) for r in iso.run(frame).alerts().select("event_key", "sid").collect()}
    assert a == b and len(a) > 0
