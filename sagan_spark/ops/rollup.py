"""Multi-resolution time-bucket rollup (continuous-aggregate
cascade): per-key count/sum/min/max at minute/hour/day granularities,
every coarser level aggregated FROM the finest rollup, never from raw.

The hypertable/continuous-aggregate pattern (TimescaleDB real-time
aggregates, Druid rollup segments): a metrics pipeline serves "events
per minute today, per hour this month, per day this year" without
rescanning the event corpus per resolution.  The reference engine's
analog is its periodic stats rollup (src/sagan-stats.c EVE stats
intervals).  Because the bucket grids NEST (every coarser resolution
is a multiple of the finest — enforced), aggregating the finest
rollup upward is EXACTLY equal to aggregating raw events at each
level; the DuckDB oracle recomputes every level from raw, so the gate
proves the cascade exact.

Determinism: event values are quantized ONCE to integer milli-units
(``floor(value * 1000)`` — double multiply is correctly rounded and
floor is the portable cast, the ops/sampling.py discipline); all
aggregates after that are 64-bit integer count/sum/min/max — exact in
any aggregation order, bit-identical across partitionings, engines,
and cluster sizes.

100 TB shape: the raw corpus is scanned ONCE into the finest
(key, bucket) aggregation — map-side combining, so a hot key's 10^9
events collapse per task before the exchange; every coarser level
aggregates the previous level's output (orders of magnitude smaller,
one extra tiny shuffle each).  NULL timestamps are dropped (an
unplaceable event has no bucket); NULL values are ignored by
sum/min/max but still counted in ``n_events`` — standard SQL
aggregate semantics, identical on both engines (an all-NULL bucket
reports NULL sum/min/max).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sagan_spark.ops.bursts import trunc_div_long


def check_resolutions(resolutions: Sequence[int]) -> list[int]:
    """Validated ascending resolution list (every coarser level must
    be a multiple of the finest for the cascade to be exact)."""
    res = sorted(int(r) for r in resolutions)
    if not res or res[0] <= 0:
        raise ValueError(f"resolutions must be positive, got {resolutions}")
    off = [r for r in res[1:] if r % res[0] != 0]
    if off:
        raise ValueError(
            f"every resolution must be a multiple of the finest ({res[0]}s) "
            f"for the cascade to be exact; offending: {off}"
        )
    return res


def fine_rollup(events: DataFrame, base_sec: int,
                key_col: str = "event_type", ts_col: str = "ts",
                value_col: str = "value") -> DataFrame:
    """The finest-resolution partial: (key, _sg_fb, n_events,
    sum_milli, min_milli, max_milli) — every field DECOMPOSABLE
    (count/sum add, min/max fold), so partials from disjoint event
    subsets merge exactly via :func:`merge_fine` — the property the
    streaming ledger (streaming/rollup.py) is built on."""
    base_us = int(base_sec) * 1_000_000
    milli = F.floor(F.col(value_col).cast("double") * F.lit(1000.0)).cast("long")
    return (
        events.filter(F.col(ts_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            trunc_div_long(
                F.unix_micros(F.col(ts_col).cast("timestamp")), base_us
            ).alias("_sg_fb"),
            milli.alias("_sg_m"),
        )
        .groupBy("key", "_sg_fb")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_sg_m").alias("sum_milli"),
            F.min("_sg_m").alias("min_milli"),
            F.max("_sg_m").alias("max_milli"),
        )
    )


def merge_fine(partials: DataFrame) -> DataFrame:
    """Merge fine partials from disjoint event subsets — exact
    (integer adds / min / max in any order)."""
    return partials.groupBy("key", "_sg_fb").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_milli").alias("sum_milli"),
        F.min("min_milli").alias("min_milli"),
        F.max("max_milli").alias("max_milli"),
    )


def time_rollup(events: DataFrame,
                resolutions: Sequence[int] = (60, 3600, 86400),
                key_col: str = "event_type", ts_col: str = "ts",
                value_col: str = "value") -> DataFrame:
    """(resolution_sec, key, bucket_us, n_events, sum_milli,
    min_milli, max_milli) for every resolution — one raw scan, coarser
    levels cascaded from the finest."""
    res = check_resolutions(resolutions)
    fine = fine_rollup(events, res[0], key_col, ts_col, value_col)
    return cascade(fine, res)


def cascade(fine: DataFrame, res: Sequence[int]) -> DataFrame:
    """Cascade a finest-level frame (the :func:`fine_rollup` schema)
    up through every resolution in ``res`` (ascending, validated)."""
    res = list(res)
    base = res[0]
    # one row per (fine bucket, resolution) via explode — NOT a union
    # of per-level plans: AQE compiles union branches as independent
    # query stages (no exchange reuse), which would rescan the corpus
    # once per resolution.  The explode rides the already-aggregated
    # fine frame (|resolutions| × small), so the whole cascade is ONE
    # corpus scan + one fine exchange + one tiny re-aggregation
    # (plan-pinned: a single Scan node).
    lev = fine.select(
        F.explode(
            F.array(*[F.lit(r).cast("long") for r in res])
        ).alias("resolution_sec"),
        "key", "_sg_fb", "n_events", "sum_milli", "min_milli", "max_milli",
    ).withColumn(
        # same truncation contract as trunc_div_long, column divisor
        # (factor = resolution div base is an exact small integer)
        "_sg_b",
        (F.col("_sg_fb") / F.expr(f"resolution_sec div {base}")).cast("long"),
    )
    return (
        lev.groupBy("resolution_sec", "key", "_sg_b")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_milli").alias("sum_milli"),
            F.min("min_milli").alias("min_milli"),
            F.max("max_milli").alias("max_milli"),
        )
        .select(
            "resolution_sec",
            "key",
            (F.col("_sg_b") * F.col("resolution_sec") * F.lit(1_000_000))
            .alias("bucket_us"),
            "n_events", "sum_milli", "min_milli", "max_milli",
        )
    )
