"""Per-key event-rate burst detection with a trailing adaptive baseline.

The reference's rate primitives are fixed-threshold: ``threshold`` /
``after`` fire when a key accumulates N events inside T seconds
(`/root/reference/src/rules.h:262-285`, counter walk
`/root/reference/src/processor.c`).  The log-analytics generalization
is an ADAPTIVE baseline: flag a (key, time-bucket) whose event count
is >= ``factor`` x that key's own trailing average rate — a scanner
ramping up, a bot account waking, a sudden crawl of one host — without
hand-picking N per key.

Scale shape (the whole point at 100 TB):

1. events collapse to one row per (key, non-empty bucket) via a
   map-side-combining ``groupBy().count()`` — hot keys are absorbed
   by partial aggregation before the shuffle, and the counts frame is
   bounded by ``keys x (time-range / bucket)``, orders of magnitude
   smaller than the corpus;
2. the ONLY window runs over that counts frame, ordered by the
   integer bucket index with ``RANGE BETWEEN k PRECEDING AND 1
   PRECEDING`` — empty buckets are naturally zero (they are simply
   not rows, and the RANGE frame is an index interval, not a row
   count), and the biggest per-key partition is the key's count of
   non-empty buckets, never its event count.

All arithmetic is integer (counts, micros, milli-scaled factor), so
the DuckDB oracle replays bit-for-bit: a bucket is a burst iff

    n * 1000 * k >= factor_milli * trailing_sum   (k = trailing_buckets)

i.e. this bucket's count >= factor x (trailing_sum / k), the trailing
mean treating empty buckets as zero.  Cold-start buckets (no earlier
non-empty bucket within k) have a NULL baseline and are never flagged
— there is nothing to compare against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trunc_div_long(x, d: int):
    """Integer division truncating toward zero — deliberately the SAME
    rounding on both engines: Spark's ``cast('long')`` of the quotient
    and DuckDB's ``//`` BOTH truncate toward zero (``-1 // 10 = 0`` in
    DuckDB — it does NOT floor), so bucket indices agree bit-for-bit
    even for negative (pre-1970, corrupt) epochs.  Pinned by
    ``test_bucket_division_matches_duckdb_pre_1970``; spelled as a
    named helper so nobody "fixes" one side to floor semantics."""
    return (x / F.lit(d)).cast("long")


def bucket_counts(events: DataFrame, bucket_sec: int = 3600,
                  key_col: str = "user_id",
                  ts_col: str = "ts") -> DataFrame:
    """One row per (key, non-empty bucket): (key, bucket_start_us,
    n_events).  Pure map-side-combining aggregation; NULL timestamps
    are dropped (an unordered event has no rate)."""
    bucket_us = int(bucket_sec) * 1_000_000
    return (
        events.filter(F.col(ts_col).isNotNull())
        .select(
            key_col,
            trunc_div_long(
                F.unix_micros(F.col(ts_col).cast("timestamp")), bucket_us
            ).alias("_sg_b"),
        )
        .groupBy(key_col, "_sg_b")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            (F.col("_sg_b") * F.lit(bucket_us)).alias("bucket_start_us"),
            "_sg_b",
            "n_events",
        )
    )


def detect_bursts(events: DataFrame, bucket_sec: int = 3600,
                  trailing_buckets: int = 24, factor_milli: int = 3000,
                  min_count: int = 5, key_col: str = "user_id",
                  ts_col: str = "ts") -> DataFrame:
    """Every (key, non-empty bucket) with its trailing-baseline stats
    and an integer burst flag.

    Output: (key, bucket_start_us, n_events, trailing_sum, is_burst)
    where ``trailing_sum`` is the key's event count over the previous
    ``trailing_buckets`` bucket indices (NULL when none are
    non-empty) and ``is_burst`` = 1 iff ``n_events >= min_count`` AND
    ``n_events * 1000 * trailing_buckets >= factor_milli *
    trailing_sum`` — count at least ``factor`` x the trailing mean
    rate (empty buckets counting as zero)."""
    k = int(trailing_buckets)
    w = (
        Window.partitionBy(key_col)
        .orderBy("_sg_b")
        .rangeBetween(-k, -1)
    )
    n = F.col("n_events")
    trail = F.sum("n_events").over(w)
    return (
        bucket_counts(
            events, bucket_sec=bucket_sec, key_col=key_col, ts_col=ts_col
        )
        .withColumn("trailing_sum", trail)
        .withColumn(
            "is_burst",
            F.when(
                F.col("trailing_sum").isNotNull()
                & (n >= F.lit(int(min_count)))
                & (n * F.lit(1000 * k)
                   >= F.lit(int(factor_milli)) * F.col("trailing_sum")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .select(
            key_col, "bucket_start_us", "n_events", "trailing_sum",
            "is_burst",
        )
    )
