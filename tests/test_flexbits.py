"""A6 flexbits: positional grammar, direction shapes, noalert flag
(reference src/flexbit-mmap.c:106-258, doc/source/rule-keywords.rst:297-336)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sagan_spark.pipeline.engine import SaganSparkEngine
from sagan_spark.rules.parser import parse_rule, parse_rules


@pytest.fixture()
def frame(spark):
    # set events: "reboot from A to B"; check events: "av-off from X to Y"
    rows = [
        ("e1", "2026-01-01 00:00:01", "reboot started from 10.0.0.1 to 10.0.0.9 now"),
        ("e2", "2026-01-01 00:00:10", "av-off alert from 10.0.0.1 to 10.0.0.9 bad"),   # same src, same pair
        ("e3", "2026-01-01 00:00:11", "av-off alert from 10.0.0.9 to 10.0.0.1 bad"),   # reverse pair
        ("e4", "2026-01-01 00:00:12", "av-off alert from 10.0.0.7 to 10.0.0.9 bad"),   # different src
        ("e5", "2026-01-01 00:02:00", "av-off alert from 10.0.0.1 to 10.0.0.9 late"),  # after expire
    ]
    df = spark.createDataFrame(rows, "event_key string, ts string, message string")
    return df.select(
        "event_key", F.col("ts").cast("timestamp").alias("ts"),
        F.lit("h").alias("host"), F.lit("p").alias("program"),
        F.lit("").alias("facility"), F.lit("").alias("level"), F.lit("").alias("tag"),
        "message",
    )


SET_RULE = ('alert any any any -> any any (msg:"reboot"; content:"reboot"; '
            "parse_src_ip: 1; parse_dst_ip: 2; flexbits: set, win_reboot, 60; sid:9100001;)")


def _alerts_for(spark, cond_rule, frame):
    rules = parse_rules(SET_RULE + "\n" + cond_rule)
    eng = SaganSparkEngine(rules)
    return {
        r.event_key
        for r in eng.run(frame).alerts().filter(F.col("sid") == 9100002).select("event_key").collect()
    }


def test_flexbit_isset_by_src(spark, frame):
    cond = ('alert any any any -> any any (msg:"avoff"; content:"av-off"; '
            "parse_src_ip: 1; parse_dst_ip: 2; flexbits: isset, by_src, win_reboot; sid:9100002;)")
    # e2 shares src 10.0.0.1 within 60s; e3/e4 different src; e5 expired
    assert _alerts_for(spark, cond, frame) == {"e2"}


def test_flexbit_isset_reverse(spark, frame):
    cond = ('alert any any any -> any any (msg:"avoff"; content:"av-off"; '
            "parse_src_ip: 1; parse_dst_ip: 2; flexbits: isset, reverse, win_reboot; sid:9100002;)")
    # stored pair (1->9); reverse matches a check with (9->1) = e3
    assert _alerts_for(spark, cond, frame) == {"e3"}


def test_flexbit_isnotset_both(spark, frame):
    cond = ('alert any any any -> any any (msg:"avoff"; content:"av-off"; '
            "parse_src_ip: 1; parse_dst_ip: 2; flexbits: isnotset, both, win_reboot; sid:9100002;)")
    # pair (1->9) is set: e2 suppressed; e3 (9->1), e4 (7->9) alert; e5 expired -> alert
    assert _alerts_for(spark, cond, frame) == {"e3", "e4", "e5"}


def test_flexbit_parse_and_noalert():
    r = parse_rule(
        'alert any any any -> any any (msg:"x"; flexbits: set, b1, 2h; '
        "flexbits: noalert; sid:1;)"
    )
    assert r.xbits[0].action == "set"
    assert r.xbits[0].name == "b1"
    assert r.xbits[0].track == "flex_auto"
    assert r.xbits[0].expire == 7200
    assert "noalert" in r.flags


def test_flexbit_noalert_suppresses_setter(spark, frame):
    rules = parse_rules(
        SET_RULE.replace("sid:9100001;", "flexbits: noalert; sid:9100001;")
        + "\n"
        + 'alert any any any -> any any (msg:"avoff"; content:"av-off"; '
        "parse_src_ip: 1; flexbits: isset, by_src, win_reboot; sid:9100002;)"
    )
    eng = SaganSparkEngine(rules)
    sids = {r.sid for r in eng.run(frame).alerts().select("sid").collect()}
    # setter still sets the bit (condition fires) but emits no alert itself
    assert sids == {9100002}
