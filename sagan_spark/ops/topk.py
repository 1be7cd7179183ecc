"""Skew-safe grouped top-k: the salted two-stage rank.

``row_number() OVER (PARTITION BY group ORDER BY ...) <= k`` funnels a
hot group's entire candidate set into one sorting task — the
stratified_sample / dedup_paragraphs anti-pattern, fatal when a group
matches 10^11 rows at corpus scale.  This helper ranks in two
provably-equivalent stages instead:

1. rank within (group, salt) where salt = hash(tiebreak id) mod
   ``salt_buckets`` — every sort partition is bounded to ~1/buckets of
   the group's candidates, and Spark's WindowGroupLimit pushes the
   k-limit below both sorts;
2. rank the <= k*buckets stage-1 survivors per group globally.

Any global top-k row is top-k within its salt bucket, so the survivor
set always contains the global top-k: the result is IDENTICAL to the
single global window (pinned across bucket counts in
tests/test_tfidf.py), which is also exactly what the DuckDB oracles
run.  The ordering must be made total by including a unique tiebreak
column (``salt_on``), or ranks are nondeterministic in ANY spelling.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(df: DataFrame, group_cols: Sequence[str],
                   order_by: Sequence[Column], k: int, salt_on: str,
                   salt_buckets: int = 64,
                   rank_col: str = "rank") -> DataFrame:
    """Append ``rank_col`` (1-based, dense in each group) and keep only
    rows ranked <= ``k`` under ``order_by`` within each ``group_cols``
    group.  ``order_by`` must be a total order (include ``salt_on`` or
    another unique column as the final tiebreak); ``salt_on`` names the
    column whose hash spreads a hot group across stage-1 buckets."""
    order_by = list(order_by)
    w_local = Window.partitionBy(*group_cols, "_sg_salt").orderBy(*order_by)
    survivors = (
        df.withColumn(
            "_sg_salt", F.pmod(F.xxhash64(F.col(salt_on)), F.lit(salt_buckets))
        )
        .withColumn("_sg_r", F.row_number().over(w_local))
        .filter(F.col("_sg_r") <= F.lit(int(k)))
        .drop("_sg_salt", "_sg_r")
    )
    w_final = Window.partitionBy(*group_cols).orderBy(*order_by)
    return survivors.withColumn(
        rank_col, F.row_number().over(w_final)
    ).filter(F.col(rank_col) <= F.lit(int(k)))
