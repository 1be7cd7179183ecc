"""A9/A10: client tracking — per-source liveness transitions + stats.

The reference's track-clients processor (src/processors/track-clients.c)
keeps a per-host last-seen table and a monitor thread that flips a
status bit: DOWN once ``now - last_seen >= timeout`` (emits
TRACK-CLIENT-NOLOGS once, :281-290), UP at the first log after a down
period (emits TRACK-CLIENT-LOGS once, :232-245).

Batch event-time form: a DOWN transition exists at ``ts + timeout``
for every event whose gap to the NEXT event of the same host exceeds
the timeout (or that is the host's last event before the horizon); an
UP transition exists at every event whose gap to the PREVIOUS event
exceeds the timeout.  One window pass per host — no state, no loop,
deterministic, and the transition set equals what the reference's
minute-poll would have emitted (up to its 60 s poll quantization,
which the event-time form does not suffer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def track_client_transitions(
    frame: DataFrame,
    timeout_minutes: int = 5,
    horizon: Column | None = None,
    host_col: str = "host",
) -> DataFrame:
    """(host, change down|up, at_ts, last_seen) transition stream.

    ``horizon``: the end-of-data instant for the trailing DOWN check
    (defaults to the corpus max ts — on a stream, the watermark)."""
    secs = timeout_minutes * 60
    w = Window.partitionBy(host_col).orderBy("ts")
    ev = frame.select(F.col(host_col).alias("host"), F.col("ts"))
    ev = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "next_ts", F.lead("ts").over(w)
    )
    if horizon is None:
        horizon = ev.agg(F.max("ts")).first()[0]
        horizon = F.lit(horizon)

    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    next_epoch = F.unix_timestamp(F.col("next_ts").cast("timestamp"))
    prev_epoch = F.unix_timestamp(F.col("prev_ts").cast("timestamp"))
    horizon_epoch = F.unix_timestamp(horizon.cast("timestamp"))

    downs = (
        ev.filter(
            (F.col("next_ts").isNull() & (horizon_epoch - epoch >= secs))
            | (F.col("next_ts").isNotNull() & (next_epoch - epoch >= secs))
        )
        .select(
            "host",
            F.lit("down").alias("change"),
            F.timestamp_seconds(epoch + secs).alias("at_ts"),
            F.col("ts").alias("last_seen"),
        )
    )
    ups = (
        ev.filter(F.col("prev_ts").isNotNull() & (epoch - prev_epoch >= secs))
        .select(
            "host",
            F.lit("up").alias("change"),
            F.col("ts").alias("at_ts"),
            F.col("prev_ts").alias("last_seen"),
        )
    )
    return downs.unionByName(ups)


def client_stats(frame: DataFrame, host_col: str = "host") -> DataFrame:
    """A10 client-stats (reference src/processors/client-stats.c):
    per-client event count, byte total, first/last seen, and a sample
    message — one groupBy, map-side combined."""
    return frame.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.length("message")).cast("long").alias("bytes_total"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.min_by("message", "ts").alias("sample_message"),
    )
