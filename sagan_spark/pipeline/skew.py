"""Hot-key skew handling (north_rule: "skewed rule-hit keys — hot SIDs,
hot source IPs — handled with salted repartitioning and explicit
AQE-aware shuffle tuning").

Three mechanisms, applied at different plan points:

1. **Two-phase aggregation** — free: every `groupBy().agg()` in the
   engine uses Spark's partial (map-side) aggregation, so a hot key's
   rows pre-combine inside each input partition before one combined row
   per partition shuffles.  This is the exact analog of the reference's
   per-thread counters merged in shared memory.

2. **Salted aggregation** (`salted_count`) — for explicit two-phase
   counting when a downstream consumer needs the salt to spread the
   FINAL combine as well (useful when one key's partials still swamp a
   reducer at extreme cardinality ratios).

3. **Hot-key isolation** (`isolate_hot_keys`) — for the correlation
   shuffle, where a (sid, track-key) group is an ordered state-machine
   replay that CANNOT be split (order dependence; the reference
   serializes it behind the same key's mutex).  Salting would break the
   semantics, so instead: sample the key histogram, and give each key
   above the threshold a DEDICATED shuffle partition, so a hot key
   slows only itself and never co-schedules behind unrelated keys.
   Normal keys hash into the remaining partitions.

AQE knobs (`spark.sql.adaptive.skewJoin.enabled`,
`adaptive.coalescePartitions`) are set in session.build_spark and cover
join-side skew (the verdict/assembly joins) at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, keys: list[str], n_salts: int = 16,
                 count_col: str = "n") -> DataFrame:
    """Two-phase count with an explicit salt: count per (key, salt),
    then sum per key — the classic hot-key aggregation split."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(*keys).agg(F.sum("_c").alias(count_col))


def detect_hot_keys(df: DataFrame, keys: list[str], sample_fraction: float = 0.05,
                    hot_share: float = 0.2, seed: int = 42) -> list[tuple]:
    """Sample the key histogram; return key tuples whose sampled share
    exceeds ``hot_share`` of the sampled rows (candidates for dedicated
    partitions).  One small job over a sample — never a full scan."""
    s = df.sample(fraction=sample_fraction, seed=seed)
    total = s.count()
    if total == 0:
        return []
    rows = (
        s.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= hot_share * total)
        .collect()
    )
    return [tuple(r[k] for k in keys) for r in rows]


def partition_assignment(keys: list[str], n_partitions: int,
                         hot_keys: list[tuple]) -> Column:
    """Partition-id column: hot keys get reserved trailing slots (one
    each), normal keys hash over the remaining range."""
    n_hot = len(hot_keys)
    n_normal = max(1, n_partitions - n_hot)
    expr = F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_normal))
    for i, hk in enumerate(hot_keys):
        cond = F.lit(True)
        for k, v in zip(keys, hk):
            cond = cond & (F.col(k) == F.lit(v))
        expr = F.when(cond, F.lit(n_normal + i)).otherwise(expr)
    return expr


def isolate_hot_keys(df: DataFrame, keys: list[str], n_partitions: int,
                     hot_keys: list[tuple]) -> DataFrame:
    """Repartition such that every hot key gets its own shuffle-key slot.
    Semantics-preserving for per-key ordered replays: all rows of a key
    stay together; only the partition→key assignment changes.  The final
    slot→partition mapping is Spark hash partitioning over the slot id,
    so isolation is probabilistic at the partition level (a normal slot
    may land beside a hot one) but a hot key never splits and never
    shares a SLOT — the scheduler's critical path shrinks to the hot
    key's own replay either way."""
    if not hot_keys:
        return df.repartition(n_partitions, *[F.col(k) for k in keys])
    pid = partition_assignment(keys, n_partitions, hot_keys)
    return df.withColumn("_pid", pid).repartition(n_partitions, F.col("_pid")).drop("_pid")
