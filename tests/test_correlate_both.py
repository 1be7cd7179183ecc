"""Both-after+threshold rules: shared-track grouping keeps the
correlation shuffle parallel (VERDICT r1 #3) with results identical to
the pure-Python oracle's per-event replay.

The reference serializes correlation state only per (hash, sid) slot
(reference src/threshold.c:111-113, src/after.c:108-110); when a rule's
after and threshold share the same track key both machines key
identically, so grouping by that key is safe — only the rare
mixed-track rule needs the per-sid funnel.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sagan_spark.pipeline.correlate import _corr_spec_map
from sagan_spark.pipeline.engine import SaganSparkEngine
from sagan_spark.rules.parser import parse_rules
from tests.oracle import Oracle

BOTH_SHARED = (
    'alert any any any -> any any (msg:"both shared"; content:"login"; '
    "parse_src_ip: 1; "
    "after: track by_src, count 2, seconds 3600; "
    "threshold: type limit, track by_src, count 3, seconds 3600; "
    "sid:9200001;)"
)

BOTH_MIXED = (
    'alert any any any -> any any (msg:"both mixed"; content:"login"; '
    "parse_src_ip: 1; "
    "after: track by_src, count 2, seconds 3600; "
    "threshold: type limit, track by_dstport, count 3, seconds 3600; "
    "sid:9200002;)"
)


def _mk_events(n_keys: int = 8, per_key: int = 10):
    """per_key bursty login events for each of n_keys source IPs."""
    rows = []
    i = 0
    for k in range(n_keys):
        ip = f"10.0.{k}.1"
        for j in range(per_key):
            i += 1
            rows.append(
                (
                    f"e{i:04d}",
                    f"2026-01-01 00:{j:02d}:{k:02d}",
                    f"login from {ip} attempt {j}",
                )
            )
    return rows


@pytest.fixture()
def frame(spark):
    df = spark.createDataFrame(
        _mk_events(), "event_key string, ts string, message string"
    )
    return df.select(
        "event_key", F.col("ts").cast("timestamp").alias("ts"),
        F.lit("h").alias("host"), F.lit("p").alias("program"),
        F.lit("").alias("facility"), F.lit("").alias("level"),
        F.lit("").alias("tag"), F.lit("").alias("priority"), "message",
    )


def _oracle_set(rules, frame):
    events = [
        {
            "event_key": r.event_key,
            "ts": r.ts,
            "host": "h",
            "program": "p",
            "facility": "",
            "level": "",
            "tag": "",
            "message": r.message,
        }
        for r in frame.select("event_key", "ts", "message").collect()
    ]
    alerts, _ = Oracle(rules).run(events)
    return {(a["url"], a["sid"]) for a in alerts}


def test_shared_track_groups_per_key_not_per_sid():
    rules = parse_rules(BOTH_SHARED + "\n" + BOTH_MIXED)
    specs = _corr_spec_map(rules)
    # shared-track rule partitions per key; mixed-track funnels per sid
    assert specs[9200001]["after_track"] == specs[9200001]["thr_track"]
    assert specs[9200002]["after_track"] != specs[9200002]["thr_track"]


def test_both_shared_matches_oracle(spark, frame):
    rules = parse_rules(BOTH_SHARED)
    got = {
        (r.event_key, r.sid)
        for r in SaganSparkEngine(rules).run(frame).alerts().select("event_key", "sid").collect()
    }
    assert got == _oracle_set(rules, frame)
    assert got  # non-vacuous: after passes some, threshold caps them


def test_both_mixed_matches_oracle(spark, frame):
    rules = parse_rules(BOTH_MIXED)
    got = {
        (r.event_key, r.sid)
        for r in SaganSparkEngine(rules).run(frame).alerts().select("event_key", "sid").collect()
    }
    assert got == _oracle_set(rules, frame)
    assert got


def test_shared_track_replay_uses_multiple_slots(spark, frame):
    """The replay shuffle for a shared-track both-rule must spread
    across (sid, track-key) — assert >1 partition receives rows."""
    from sagan_spark.pipeline.correlate import FLAG_FIELDS  # noqa: F401

    rules = parse_rules(BOTH_SHARED)
    eng = SaganSparkEngine(rules)
    hits = eng.match_hits(frame)
    specs = _corr_spec_map(rules)
    both_sids = [s for s, v in specs.items() if v["after"] and v["threshold"]]
    both_mixed = [
        s for s in both_sids if specs[s]["after_track"] != specs[s]["thr_track"]
    ]
    assert both_mixed == []
    group_key = F.col("track_after")
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    used = (
        hits.select("sid", group_key.alias("corr_group"))
        .repartition(n_parts, "sid", "corr_group")
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert used > 1
