"""Window-free funnel and cohort-retention analytics over an event log.

Two classic log-pipeline rollups the reference's correlation layer
gestures at (ordered per-key event chains — the `after`/xbit-chain
machinery of `/root/reference/src/rules.h:189-285` is a funnel whose
stages are rule hits) expressed in the shape that survives 100 TB:

- **Funnel** (:func:`funnel_stages` / :func:`funnel_counts`): the
  textbook spelling sorts each user's events and walks them — a
  per-key window over the raw corpus, the hot-key funnel VERDICT r3
  flagged.  But "earliest stage-i event at-or-after the user's
  stage-(i-1) time" needs no ordering at all: it is a chain of
  min-aggregations, each a map-side-combining groupBy on the key,
  stitched by co-partitioned equi-joins.  A bot account with 10^9
  click events combines to one row per stage BEFORE any shuffle.
- **Cohort retention** (:func:`cohort_retention`): first-activity-day
  cohorts × day offset — two aggregations (per-user first day, then
  distinct user-day activity) and one co-partitioned join.  Day
  arithmetic is integer day indexes (epoch-us div 86.4e9), never
  date/tz types, so the DuckDB oracle replays it exactly.

All timestamp math is integer microseconds (`unix_micros` / DuckDB
`epoch_us`); NULL-timestamp events are dropped on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAY_US = 86_400_000_000


def _us_events(events: DataFrame, key_col: str, ts_col: str,
               type_col: str) -> DataFrame:
    return events.filter(F.col(ts_col).isNotNull()).select(
        key_col,
        type_col,
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_sg_us"),
    )


def funnel_stages(events: DataFrame, stages: list[str],
                  key_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type",
                  max_gap_sec: int | None = None) -> DataFrame:
    """Per-key stage-completion times: one row per key that completed
    stage 1, with ``<stage>_us`` columns for each stage (NULL once the
    chain breaks).  Stage i counts when its earliest event at-or-after
    the key's stage-(i-1) time exists (``>=``: a same-microsecond
    event of the next type satisfies the order — documented choice,
    replayed in the oracle).

    ``max_gap_sec`` adds the CONVERSION-WINDOW constraint product
    funnels ship with: stage i must land within that many seconds of
    stage i-1 or the chain breaks.  The walk stays GREEDY from each
    stage's earliest qualifying event (the standard product-analytics
    definition) — a later stage-(i-1) occurrence is never revisited,
    so a chain the greedy walk misses is reported broken even if a
    non-greedy pairing would connect it (documented, and exactly what
    the oracle replays).

    Plan: one aggregation + one equi-join per stage, all keyed on
    ``key_col`` — the first shuffle establishes the partitioning and
    every later stage reuses it; no window ever touches the corpus.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    if max_gap_sec is not None and max_gap_sec < 0:
        raise ValueError(f"max_gap_sec must be >= 0, got {max_gap_sec}")
    gap_us = None if max_gap_sec is None else int(max_gap_sec) * 1_000_000
    e = _us_events(events, key_col, ts_col, type_col)
    cols = [f"{s}_us" for s in stages]
    frame = (
        e.filter(F.col(type_col) == stages[0])
        .groupBy(key_col)
        .agg(F.min("_sg_us").alias(cols[0]))
    )
    out = frame
    for stage, col, prev in zip(stages[1:], cols[1:], cols):
        cond = F.col("_sg_us") >= F.col(prev)
        if gap_us is not None:
            cond = cond & (F.col("_sg_us") <= F.col(prev) + F.lit(gap_us))
        frame = (
            e.filter(F.col(type_col) == stage)
            .join(frame.select(key_col, prev), key_col)
            .filter(cond)
            .groupBy(key_col)
            .agg(F.min("_sg_us").alias(col))
        )
        out = out.join(frame.select(key_col, col), key_col, "left")
    return out


def funnel_counts(events: DataFrame, stages: list[str],
                  key_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type",
                  max_gap_sec: int | None = None) -> DataFrame:
    """Funnel summary: (stage_idx, stage, keys_reached) — the count of
    keys whose chain survived through each stage.  A single pass over
    :func:`funnel_stages`' one-row-per-key output (tiny relative to
    the corpus), unpivoted via an inline stack."""
    st = funnel_stages(
        events, stages, key_col=key_col, ts_col=ts_col, type_col=type_col,
        max_gap_sec=max_gap_sec,
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("stage_idx"),
                F.lit(s).alias("stage"),
                F.col(f"{s}_us").isNotNull().alias("hit"),
            )
            for i, s in enumerate(stages)
        ]
    )
    x = st.select(F.explode(pairs).alias("p")).select("p.*")
    return (
        x.filter(F.col("hit"))
        .groupBy("stage_idx", "stage")
        .agg(F.count(F.lit(1)).alias("keys_reached"))
    )


def cohort_retention(events: DataFrame, key_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Retention triangle: (cohort_day, day_offset, active_keys) where
    cohort_day is the key's first-ever activity day (integer epoch-day
    index) and each (key, active day) pair counts once.  Both inputs
    are aggregations of the raw log (map-side combine absorbs hot
    keys); the stitch is one co-partitioned join on the key."""
    e = (
        events.filter(F.col(ts_col).isNotNull())
        .select(
            key_col,
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_sg_us"),
        )
        # integer `div`, not float division + cast: a double quotient
        # landing epsilon across a midnight boundary would move the
        # row a day; DuckDB's `//` on BIGINT is the exact twin.
        .select(key_col, F.expr(f"_sg_us div {DAY_US}").alias("_sg_day"))
    )
    firsts = e.groupBy(key_col).agg(F.min("_sg_day").alias("cohort_day"))
    days = e.distinct()
    return (
        days.join(firsts, key_col)
        .groupBy(
            "cohort_day",
            (F.col("_sg_day") - F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_keys"))
    )


def active_users(events: DataFrame, window_days: int = 7,
                 key_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Daily/rolling active-user rollup: per epoch day, the exact
    count of distinct keys active that day (DAU) and over the trailing
    ``window_days`` ending that day (WAU for 7) — the engagement
    denominators (and their DAU/WAU stickiness ratio) every telemetry
    pipeline reports; the reference's analog is its per-interval
    client-count stats (src/processors/stats-json.c).

    Exact and skew-safe WITHOUT countDistinct over raw events: events
    collapse FIRST to the distinct (day, key) frame (map-side
    combinable — a key's 10^9 same-day events become one row per
    task); the rolling count then explodes each (day, key) row to the
    <= ``window_days`` report days it contributes to (bounded
    inflation of the small distinct frame, never of raw events) and
    re-collapses to distinct (report_day, key) before the final
    count.  Integer epoch-day arithmetic (``div``, the funnel/cohort
    discipline); NULL timestamps are dropped.  Only report days with
    at least one active day in range appear — including pure
    carry-forward days inside a gap (a day with WAU > 0 but DAU 0) —
    and the report range ends at the LAST OBSERVED day: trailing
    windows never extend past the end of the data.

    Returns (day, dau, wau) with ``day`` = epoch-day index.
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    return actives_from_daykeys(daykeys(events, key_col, ts_col), window_days)


def daykeys(events: DataFrame, key_col: str = "user_id",
            ts_col: str = "ts") -> DataFrame:
    """The distinct (day, key) frame active_users runs on — exposed so
    the streaming ledger (streaming/actives.py) can accumulate it
    per batch (distinct-of-union == union-of-distincts, the property
    that makes the ledger exact)."""
    return (
        events.filter(F.col(ts_col).isNotNull())
        .select(
            F.expr(
                f"unix_micros(cast({ts_col} as timestamp)) div {DAY_US}"
            ).alias("_sg_day"),
            F.col(key_col).alias("_sg_k"),
        )
        .distinct()
    )


def actives_from_daykeys(dk: DataFrame, window_days: int) -> DataFrame:
    """The DAU/WAU tail over a distinct (_sg_day, _sg_k) frame (shared
    by the batch op and the streaming ledger reader)."""
    dau = dk.groupBy(F.col("_sg_day").alias("day")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    # report days are clamped to the last OBSERVED day: without the
    # clamp every (day, key) row extends up to window_days-1 phantom
    # report days past the end of the data (wau > 0, dau = 0 days
    # that never happened).  Single-row broadcast join, the shared
    # totals idiom.
    last = dk.agg(F.max("_sg_day").alias("_sg_last"))
    span = (
        dk.join(F.broadcast(last))
        .select(
            F.explode(
                F.sequence(
                    F.col("_sg_day"),
                    F.least(
                        F.col("_sg_day") + F.lit(window_days - 1),
                        F.col("_sg_last"),
                    ),
                )
            ).alias("day"),
            "_sg_k",
        )
        .distinct()
    )
    wau = span.groupBy("day").agg(F.count(F.lit(1)).alias("wau"))
    return (
        wau.join(dau, "day", "left")
        .withColumn("dau", F.coalesce("dau", F.lit(0).cast("long")))
        .select("day", "dau", "wau")
    )
