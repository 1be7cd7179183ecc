"""As-of (temporal latest-snapshot) join — an operator Spark's join
menu lacks, re-expressed in two Spark-first shapes.

``ASOF JOIN`` semantics (kdb aj / pandas merge_asof / QuestDB): each
left event (key, ts) is enriched with the right-side snapshot of the
same key having the greatest ``ts_r <= ts`` — the "what did the
dimension look like WHEN THIS HAPPENED" join behind slowly-changing
enrichment tables.  The reference engine does exactly this statically:
its GeoIP / Bluedot / blacklist lookups resolve each event against the
latest loaded database snapshot (src/processors/blacklist.c,
bluedot.c reload paths); this operator makes the snapshot axis a real
column instead of a process restart.

Tie/determinism spec (both shapes, and the oracle): the winning
snapshot is ``max(struct(ts_r, payload...))`` over candidates — latest
timestamp first, then the lexicographically greatest payload among
equal timestamps (dimension tables should not carry duplicate
(key, ts) rows, but when they do the result is still deterministic and
engine-independent).  Payload columns must be NON-NULL on the
dimension side: NULLs inside the tie-break struct order differently
across engines (Spark sorts struct-field NULLs first, SQL ``ORDER BY
... DESC`` puts them last), so a NULL payload forfeits the
cross-engine tie guarantee — coalesce dimension payloads to a
sentinel first.  ``max_age_sec`` (optional) voids matches older
than the tolerance — the enrichment answer becomes NULL, matching the
"stale dimension row is no dimension row" reading.  NULL left
timestamps never match.  All timestamp math is integer microseconds.

Two execution shapes:

- :func:`asof_join_compact` — the dimension fits the broadcast budget
  (the overwhelmingly common enrichment case: reputation lists,
  pricing tables, config snapshots).  The dimension collapses to ONE
  sorted struct-array row per key (`collect_list` bounded by
  snapshots-per-key), broadcasts, and each event picks
  ``array_max(filter(arr, s -> s.us <= ev))`` — scan-level codegen,
  NO shuffle on the event side at all.  At 10^12 events this is a
  map-only pass.
- :func:`asof_join` — both sides large: the sessionize two-phase
  bucket decomposition (ops/sessions.py).  Events and snapshots union
  into one (key, time-bucket) frame; the ONLY event-level window is
  partitioned by (key, bucket) — a hot key's biggest sort task is one
  bucket, never its corpus lifetime — and snapshots reach later
  buckets through a per-key running max over the BUCKET-STATS frame
  (<= one row per (key, non-empty bucket)).  In-bucket candidates
  always beat carried ones (their timestamps are strictly later), so
  ``coalesce(in_bucket, carry)`` equals the global maximum — the same
  bit-equality argument as sessionize, and the DuckDB oracle replays
  the GLOBAL definition.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sagan_spark.ops.bursts import trunc_div_long


def _us(col) -> F.Column:
    return F.unix_micros(col.cast("timestamp"))


def _snap_struct(payload_cols: Sequence[str]):
    return F.struct(
        F.col("_sg_rus").alias("us"),
        *[F.col(c).alias(c) for c in payload_cols],
    )


def _emit(left_cols, best, payload_cols: Sequence[str], max_age_us):
    """Project the winning snapshot struct (already tolerance-aware)
    into right_ts_us + payload columns."""
    ok = best.isNotNull()
    if max_age_us is not None:
        ok = ok & (F.col("_sg_us") - best["us"] <= F.lit(max_age_us))
    return left_cols + [
        F.when(ok, best["us"]).alias("right_ts_us"),
        *[F.when(ok, best[c]).alias(c) for c in payload_cols],
    ]


def asof_join_compact(left: DataFrame, right: DataFrame,
                      key_col: str = "user_id", ts_col: str = "ts",
                      right_ts_col: str = "ts",
                      payload_cols: Sequence[str] = ("snapshot",),
                      max_age_sec: int | None = None) -> DataFrame:
    """Broadcast-dimension as-of join (see module docstring).  Returns
    the left rows (all columns) + ``right_ts_us`` + the payload
    columns, NULL when no snapshot qualifies."""
    payload_cols = list(payload_cols)
    max_age_us = None if max_age_sec is None else int(max_age_sec) * 1_000_000
    dim = (
        right.filter(F.col(right_ts_col).isNotNull())
        .select(
            F.col(key_col),
            _us(F.col(right_ts_col)).alias("_sg_rus"),
            *payload_cols,
        )
        .groupBy(key_col)
        .agg(F.sort_array(F.collect_list(_snap_struct(payload_cols))).alias("_sg_arr"))
    )
    ev = left.withColumn("_sg_us", _us(F.col(ts_col)))
    joined = ev.join(F.broadcast(dim), key_col, "left")
    best = F.array_max(
        F.filter(
            F.coalesce(F.col("_sg_arr"), F.array().cast(dim.schema["_sg_arr"].dataType)),
            lambda s: s["us"] <= F.col("_sg_us"),
        )
    )
    return joined.select(
        *_emit([F.col(c) for c in left.columns], best, payload_cols, max_age_us)
    ).drop("_sg_arr")


def asof_join(left: DataFrame, right: DataFrame,
              key_col: str = "user_id", ts_col: str = "ts",
              right_ts_col: str = "ts",
              payload_cols: Sequence[str] = ("snapshot",),
              bucket_sec: int = 86400,
              max_age_sec: int | None = None) -> DataFrame:
    """Bucketed two-phase as-of join for large dimensions (see module
    docstring).  Bit-equal to the global definition; the per-key-alone
    window runs over the bucket-stats frame only (plan-pinned in
    tests/test_asof.py)."""
    payload_cols = list(payload_cols)
    max_age_us = None if max_age_sec is None else int(max_age_sec) * 1_000_000
    bucket_us = int(bucket_sec) * 1_000_000

    snaps = right.filter(F.col(right_ts_col).isNotNull()).select(
        F.col(key_col),
        _us(F.col(right_ts_col)).alias("_sg_rus"),
        *payload_cols,
    )
    snap_struct = _snap_struct(payload_cols)
    s = snaps.select(
        key_col,
        F.col("_sg_rus").alias("_sg_us"),
        F.lit(0).alias("_sg_kind"),
        snap_struct.alias("_sg_snap"),
    ).withColumn("_sg_b", trunc_div_long(F.col("_sg_us"), bucket_us))

    ev = left.withColumn("_sg_us", _us(F.col(ts_col))).withColumn(
        "_sg_b", trunc_div_long(F.col("_sg_us"), bucket_us)
    )
    e = ev.select(
        key_col,
        "_sg_us",
        F.lit(1).alias("_sg_kind"),
        F.lit(None).cast(s.schema["_sg_snap"].dataType).alias("_sg_snap"),
        "_sg_b",
        *[F.col(c).alias(f"_sg_l_{c}") for c in left.columns],
    )
    # NULL-ts left rows never match but must survive: route them around
    # the union (their bucket is NULL)
    e_null = e.filter(F.col("_sg_us").isNull())
    u = s.select(
        key_col, "_sg_us", "_sg_kind", "_sg_snap", "_sg_b",
        *[F.lit(None).cast(dict(e.dtypes)[f"_sg_l_{c}"]).alias(f"_sg_l_{c}")
          for c in left.columns],
    ).unionByName(e.filter(F.col("_sg_us").isNotNull()))

    # bucket-stats: each (key, bucket)'s best snapshot, then the
    # per-key running max over EARLIER buckets.  The stats frame must
    # cover EVERY non-empty (key, bucket) — event-only buckets carry a
    # NULL best of their own but still need the running max from
    # earlier snapshot buckets (max() ignores their NULL)
    w_kb = Window.partitionBy(key_col).orderBy("_sg_b")
    carry = (
        u.groupBy(key_col, "_sg_b")
        .agg(F.max("_sg_snap").alias("_sg_bbest"))
        .withColumn(
            "_sg_carry",
            F.max("_sg_bbest").over(
                w_kb.rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .drop("_sg_bbest")
    )

    # the ONLY event-level window: running max of in-bucket snapshots,
    # snapshots sorting before events at equal timestamps so `<=` holds
    w_eb = (
        Window.partitionBy(key_col, "_sg_b")
        .orderBy(F.col("_sg_us").asc(), F.col("_sg_kind").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    f = (
        u.join(carry, [key_col, "_sg_b"], "left")
        .withColumn("_sg_in", F.max("_sg_snap").over(w_eb))
        .filter(F.col("_sg_kind") == 1)
    )
    best = F.coalesce(F.col("_sg_in"), F.col("_sg_carry"))
    matched = f.select(
        *_emit(
            [F.col(f"_sg_l_{c}").alias(c) for c in left.columns],
            best,
            payload_cols,
            max_age_us,
        )
    )
    unmatched = e_null.select(
        *[F.col(f"_sg_l_{c}").alias(c) for c in left.columns],
        F.lit(None).cast("long").alias("right_ts_us"),
        *[
            F.lit(None).cast(dict(snaps.dtypes)[c]).alias(c)
            for c in payload_cols
        ],
    )
    return matched.unionByName(unmatched)
