"""Stateful correlation: after / threshold / xbits — batch (event-time) form.

The reference keeps per-(rule, track-key) counters in mmap'd shared
arrays updated in arrival order (reference src/threshold.c:54-234,
src/after.c:51-229, src/xbit-mmap.c).  Here the same state machines run
distributed: hits shuffle once on (sid, group_key) and each group is
replayed in canonical event-time order ``(ts, event_key)`` inside an
Arrow-batched ``applyInPandas``.  Canonical ordering makes the result
deterministic under any partitioning/parallelism (SURVEY §7.5).

Exact semantics replicated:

- threshold type **limit**: window anchored at FIRST event (utime never
  slides, threshold.c:132-135); count resets when an event arrives more
  than T seconds after the anchor (threshold.c:141-146); suppress once
  count exceeds N (threshold.c:148-150).
- threshold type **suppress**: utime slides on EVERY event
  (threshold.c:126-130) so suppression persists while the inter-event
  gap stays <= T.
- **after**: suppress UNTIL count exceeds N within T of the anchor;
  once exceeded, the anchor slides with each alerting event
  (after.c:125-144).  Evaluated BEFORE threshold; a suppressed-by-after
  event never updates threshold state (engine.c:1377-1389).
- **xbits**: set/unset happen only for events that survived
  after+threshold (engine.c:1415-1427); isset/isnotset conditions are
  part of routing (checked before after/threshold) honoring expiry
  (xbit-mmap.c:181-264).

Scale note: one group = one (sid, track-key) — the same serialization
the reference imposes via its mutex; groups are independent so the
shuffle parallelizes across keys.  Rules carrying BOTH after and
threshold collapse to one group per sid (the two state machines are
coupled), which is also the reference's behavior (single shared array).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sagan_spark.rules.ir import RuleIR

FLAG_FIELDS = ["suppressed_after", "suppressed_threshold"]


def _corr_spec_map(rules: list[RuleIR]) -> dict[int, dict]:
    out: dict[int, dict] = {}
    for r in rules:
        if r.after or r.threshold:
            out[r.sid] = {
                "after": (r.after.count, r.after.seconds) if r.after else None,
                "threshold": (
                    r.threshold.ttype,
                    r.threshold.count,
                    r.threshold.seconds,
                )
                if r.threshold
                else None,
            }
    return out


def _replay_group(pdf: pd.DataFrame, specs: dict[int, dict]) -> pd.DataFrame:
    """Replay one (sid, group_key) partition in canonical order."""
    # canonical order: full-precision event time, event_key tiebreak;
    # state arithmetic uses whole seconds like the reference (strftime %s)
    pdf = pdf.sort_values(["ts", "event_key"], kind="mergesort")
    sid = int(pdf["sid"].iloc[0])
    spec = specs.get(sid)
    n = len(pdf)
    sup_after = [False] * n
    sup_thresh = [False] * n
    if spec is None:
        pdf["suppressed_after"] = sup_after
        pdf["suppressed_threshold"] = sup_thresh
        return pdf

    after_spec = spec["after"]
    thr_spec = spec["threshold"]
    a_state: dict[str, list] = {}  # key -> [count, utime]
    t_state: dict[str, list] = {}

    ts = pdf["ts_epoch"].to_numpy()
    a_keys = pdf["track_after"].to_numpy()
    t_keys = pdf["track_threshold"].to_numpy()

    for i in range(n):
        t = int(ts[i])
        suppressed = False

        if after_spec is not None:
            a_count, a_secs = after_spec
            st = a_state.get(a_keys[i])
            if st is None:
                a_state[a_keys[i]] = [1, t]
                suppressed = True  # after.c:78 default true until count > N
            else:
                st[0] += 1
                oldtime = t - st[1]
                flag = True
                if oldtime > a_secs:  # gap reset (after.c:132-137)
                    st[0], st[1] = 1, t
                    flag = True
                if a_count < st[0]:  # exceeded: alert + slide (after.c:140-144)
                    st[1] = t
                    flag = False
                suppressed = flag
            sup_after[i] = suppressed

        if thr_spec is not None and not suppressed:  # engine.c:1386 gate
            ttype, t_count, t_secs = thr_spec
            st = t_state.get(t_keys[i])
            if st is None:
                t_state[t_keys[i]] = [1, t]
            else:
                st[0] += 1
                oldtime = t - st[1]
                if ttype == "suppress":  # utime slides (threshold.c:126-130)
                    st[1] = t
                if oldtime > t_secs:  # window reset (threshold.c:141-146)
                    st[0], st[1] = 1, t
                if t_count < st[0]:  # (threshold.c:148-150)
                    sup_thresh[i] = True

    pdf["suppressed_after"] = sup_after
    pdf["suppressed_threshold"] = sup_thresh
    return pdf


def apply_after_threshold(hits: DataFrame, rules: list[RuleIR]) -> DataFrame:
    """Add suppressed_after / suppressed_threshold booleans to the hits DF.

    hits must carry: sid, event_key, ts (timestamp), track_after,
    track_threshold.  Hits of rules with no correlation skip the shuffle
    entirely (narrow path, flags = false).
    """
    specs = _corr_spec_map(rules)
    if not specs:
        return hits.withColumn("suppressed_after", F.lit(False)).withColumn(
            "suppressed_threshold", F.lit(False)
        )

    corr_sids = list(specs)
    plain = hits.filter(~F.col("sid").isin(corr_sids))
    corr = hits.filter(F.col("sid").isin(corr_sids))

    # one group per (sid, track-key) when only one machine is active;
    # coupled machines (both after+threshold) collapse to per-sid groups
    both_sids = [s for s, v in specs.items() if v["after"] and v["threshold"]]
    after_only = [s for s, v in specs.items() if v["after"] and not v["threshold"]]
    group_key = (
        F.when(F.col("sid").isin(both_sids), F.lit(""))
        .when(F.col("sid").isin(after_only), F.col("track_after"))
        .otherwise(F.col("track_threshold"))
    )

    corr = corr.withColumn("corr_group", group_key).withColumn(
        "ts_epoch", F.col("ts").cast("long")
    )

    base_fields = [f for f in corr.schema.fields if f.name != "corr_group"]
    from pyspark.sql import types as T

    out_struct = T.StructType(
        base_fields
        + [
            T.StructField("suppressed_after", T.BooleanType()),
            T.StructField("suppressed_threshold", T.BooleanType()),
        ]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop(columns=["corr_group"])
        return _replay_group(pdf, specs)

    replayed = corr.groupBy("sid", "corr_group").applyInPandas(fn, schema=out_struct)
    replayed = replayed.drop("ts_epoch")

    plain = plain.withColumn("suppressed_after", F.lit(False)).withColumn(
        "suppressed_threshold", F.lit(False)
    )
    return replayed.unionByName(plain)


# ---------------------------------------------------------------------------
# xbits / flexbits (A4-A6): batch event-time replay per (bit name, key)
# ---------------------------------------------------------------------------


def xbit_key_expr(track: str) -> F.Column:
    """xbit_direction key (reference src/xbit.c:76-105):
    ip_src -> src, ip_dst -> dst, ip_pair -> 'src:dst'."""
    if track == "ip_src":
        return F.col("src_ip")
    if track == "ip_dst":
        return F.col("dst_ip")
    return F.format_string("%s:%s", F.col("src_ip"), F.col("dst_ip"))


def apply_xbits(
    hits: DataFrame,
    rules: list[RuleIR],
    survived: DataFrame | None = None,
) -> DataFrame:
    """Evaluate isset/isnotset conditions for rules that carry them.

    ``hits``: candidate hits of condition rules (pre-routing).
    ``survived``: alerts (post after/threshold) of setter rules — the only
    events allowed to set/unset bits (reference engine.c:1415-1427).

    Returns hits with an ``xbit_ok`` boolean.  Exact event-time replay per
    (bit name, key): set/unset/check events merge-sorted on
    (ts, event_key); a check sees a bit as set iff the latest set before
    it is not unset and not expired (reference src/xbit-mmap.c:181-264).
    """
    cond_rules = [r for r in rules if any(x.action in ("isset", "isnotset") for x in r.xbits)]
    if not cond_rules:
        return hits.withColumn("xbit_ok", F.lit(True))

    set_rules = [r for r in rules if any(x.action in ("set", "unset") for x in r.xbits)]

    # build set/unset event stream from surviving setter alerts
    spark_events = []
    src = survived if survived is not None else hits
    for r in set_rules:
        for x in r.xbits:
            if x.action not in ("set", "unset"):
                continue
            ev = (
                src.filter(F.col("sid") == r.sid)
                .select(
                    F.lit(x.name).alias("bit_name"),
                    xbit_key_expr(x.track).alias("bit_key"),
                    F.col("ts").cast("double").alias("ts_d"),
                    F.col("event_key"),
                    F.lit(x.action).alias("kind"),
                    F.lit(x.expire).alias("expire"),
                    F.lit(None).cast("string").alias("hit_id"),
                    F.lit(False).alias("want_set"),
                )
            )
            spark_events.append(ev)

    # explode condition entries of candidate hits
    for r in cond_rules:
        for x in r.xbits:
            if x.action not in ("isset", "isnotset"):
                continue
            ev = (
                hits.filter(F.col("sid") == r.sid)
                .select(
                    F.lit(x.name).alias("bit_name"),
                    xbit_key_expr(x.track).alias("bit_key"),
                    F.col("ts").cast("double").alias("ts_d"),
                    F.col("event_key"),
                    F.lit("check").alias("kind"),
                    F.lit(0).alias("expire"),
                    F.concat_ws("#", F.col("event_key"), F.col("sid").cast("string")).alias("hit_id"),
                    F.lit(x.action == "isset").alias("want_set"),
                )
            )
            spark_events.append(ev)

    if not spark_events:
        return hits.withColumn("xbit_ok", F.lit(True))

    events = spark_events[0]
    for e in spark_events[1:]:
        events = events.unionByName(e)

    from pyspark.sql import types as T

    out_struct = T.StructType(
        [
            T.StructField("hit_id", T.StringType()),
            T.StructField("ok", T.BooleanType()),
        ]
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_d", "event_key"], kind="mergesort")
        set_ts = None  # active set timestamp
        set_expire = 0
        out_ids, out_ok = [], []
        for row in pdf.itertuples(index=False):
            if row.kind == "set":
                set_ts, set_expire = row.ts_d, row.expire
            elif row.kind == "unset":
                set_ts = None
            else:  # check
                active = set_ts is not None and (
                    set_expire == 0 or (row.ts_d - set_ts) < set_expire
                )
                out_ids.append(row.hit_id)
                out_ok.append(active == row.want_set)
        return pd.DataFrame({"hit_id": out_ids, "ok": out_ok})

    verdicts = events.groupBy("bit_name", "bit_key").applyInPandas(walk, schema=out_struct)
    # all condition entries of a hit must hold (xbit-mmap.c:181-264)
    agg = verdicts.groupBy("hit_id").agg(F.min("ok").alias("xbit_ok"))

    hits_with_id = hits.withColumn(
        "hit_id", F.concat_ws("#", F.col("event_key"), F.col("sid").cast("string"))
    )
    cond_sids = [r.sid for r in cond_rules]
    # verdict set scales with the alert volume — regular (shuffle) join,
    # not broadcast; AQE picks broadcast when it is actually small
    joined = hits_with_id.join(agg, "hit_id", "left").withColumn(
        "xbit_ok",
        F.when(~F.col("sid").isin(cond_sids), F.lit(True)).otherwise(
            F.coalesce(F.col("xbit_ok"), F.lit(False))
        ),
    )
    return joined.drop("hit_id")
